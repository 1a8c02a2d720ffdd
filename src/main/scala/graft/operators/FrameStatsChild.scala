package graft.operators

/** Demo worker binary for [[WorkerPool]]'s CHILD-INITIATED opcode
  * surface (the reference's pipes children send INCR_COUNTER / LOG
  * traffic of their own accord, `MessageType.java:25-32`, over the
  * framed stream `BinaryProtocol.java:50`): each request frame is a
  * packed float64 vector; before answering, the child emits one
  * INCR_COUNTER frame crediting the "components" counter with the
  * vector's length (and a LOG frame on the first request), then the
  * RESPONSE frame carrying the float64 component sum. Frame layout
  * child→parent: 4-byte big-endian length, then 1 opcode byte
  * ([[WorkerPool.OpResponse]]/[[WorkerPool.OpIncrCounter]]/
  * [[WorkerPool.OpLog]]), then the opcode's payload. Exits cleanly on
  * EOF. */
object FrameStatsChild {
  def main(args: Array[String]): Unit = {
    val in = new java.io.BufferedInputStream(System.in)
    val out = new java.io.BufferedOutputStream(System.out)
    def frame(opcode: Byte, payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(5)
        .putInt(payload.length + 1).put(opcode).array())
      out.write(payload)
    }
    var first = true
    var hdr = in.readNBytes(4)
    while (hdr.length == 4) {
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      val payload = in.readNBytes(n)
      if (payload.length != n) sys.error(s"truncated frame: ${payload.length} of $n")
      val bb = java.nio.ByteBuffer.wrap(payload)
      var s = 0.0
      var c = 0L
      while (bb.remaining() >= 8) { s += bb.getDouble(); c += 1 }
      if (first) {
        frame(WorkerPool.OpLog, s"stats child up, pid ${ProcessHandle.current().pid()}"
          .getBytes("UTF-8"))
        first = false
      }
      val name = "components".getBytes("UTF-8")
      frame(WorkerPool.OpIncrCounter,
        java.nio.ByteBuffer.allocate(8 + name.length).putLong(c).put(name).array())
      frame(WorkerPool.OpResponse,
        java.nio.ByteBuffer.allocate(8).putDouble(s).array())
      out.flush()
      hdr = in.readNBytes(4)
    }
  }
}
