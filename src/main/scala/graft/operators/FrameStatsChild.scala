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
    var first = true
    ChildProtocol.foreachFrame { (conn, payload) =>
      val bb = java.nio.ByteBuffer.wrap(payload)
      var s = 0.0
      var c = 0L
      while (bb.remaining() >= 8) { s += bb.getDouble(); c += 1 }
      if (first) {
        conn.log(s"stats child up, pid ${ProcessHandle.current().pid()}")
        first = false
      }
      conn.counter("components", c)
      conn.respond(java.nio.ByteBuffer.allocate(8).putDouble(s).array())
    }
  }
}
