package graft.operators

/** Demo worker binary for [[WorkerPool.Worker.driveLoop]] — the child
  * that OWNS its IO loop, the reference's pipes execution model
  * (`BinaryProtocol.java` children run the whole BSP loop, pulling
  * input and pushing output through READ_KEYVALUE / WRITE_KEYVALUE
  * opcodes, `MessageType.java:25-32`): on each start-of-chunk frame it
  * repeatedly REQUESTS records (OpReadNext), upper-cases each UTF-8
  * record and EMITS it (OpWrite), and on end-of-input credits the
  * "records" counter and closes the chunk with RESPONSE — one chunk
  * exchange per superstep, the SYNC analogue. Exits cleanly on EOF. */
object LoopUpperChild {
  def main(args: Array[String]): Unit = {
    val in = new java.io.BufferedInputStream(System.in)
    val out = new java.io.BufferedOutputStream(System.out)
    def send(opcode: Byte, payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(5)
        .putInt(payload.length + 1).put(opcode).array())
      out.write(payload)
      out.flush()
    }
    def recv(): Array[Byte] = {
      val hdr = in.readNBytes(4)
      if (hdr.length < 4) sys.exit(0) // parent closed mid-protocol
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      val p = in.readNBytes(n)
      if (p.length != n) sys.error(s"truncated frame: ${p.length} of $n")
      p
    }
    var hdr = in.readNBytes(4)
    while (hdr.length == 4) { // each parent frame opens one chunk
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      in.readNBytes(n): Unit // start-of-chunk payload (unused)
      var records = 0L
      var done = false
      while (!done) {
        send(WorkerPool.OpReadNext, Array.emptyByteArray)
        val reply = recv()
        if (reply.nonEmpty && reply(0) == 1) {
          records += 1
          val rec = new String(reply, 1, reply.length - 1, "UTF-8")
          send(WorkerPool.OpWrite, rec.toUpperCase(java.util.Locale.ROOT)
            .getBytes("UTF-8"))
        } else done = true
      }
      val name = "records".getBytes("UTF-8")
      send(WorkerPool.OpIncrCounter,
        java.nio.ByteBuffer.allocate(8 + name.length).putLong(records)
          .put(name).array())
      send(WorkerPool.OpResponse, Array.emptyByteArray)
      hdr = in.readNBytes(4)
    }
  }
}
