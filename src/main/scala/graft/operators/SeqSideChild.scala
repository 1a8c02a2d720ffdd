package graft.operators

/** Demo worker binary for the SIDE-FILE opcode family — the reference's
  * `SEQFILE_OPEN` / `SEQFILE_READNEXT` / `SEQFILE_APPEND` /
  * `SEQFILE_CLOSE` surface (`core/.../pipes/protocol/MessageType.java:
  * 25-28`, codes 25-28), where a pipes child does record file IO
  * THROUGH the parent rather than touching storage itself:
  *
  * each chunk's start payload is `[1B phase][UTF-8 side-file path]` —
  *   - phase 'w' (the produce superstep): open the side file for
  *     writing, pull every input record via READ_NEXT, upper-case it,
  *     SEQFILE_APPEND it, then CLOSE (awaiting the durability ack),
  *     credit the "records" counter and RESPOND;
  *   - phase 'r' (the consume superstep): open the same path for
  *     reading, SEQFILE_READNEXT until EOF counting records, CLOSE,
  *     credit the "side_records" counter and RESPOND.
  * Exits cleanly on EOF. */
object SeqSideChild {
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
    def counter(name: String, delta: Long): Unit = {
      val nb = name.getBytes("UTF-8")
      send(WorkerPool.OpIncrCounter,
        java.nio.ByteBuffer.allocate(8 + nb.length).putLong(delta).put(nb).array())
    }
    var hdr = in.readNBytes(4)
    while (hdr.length == 4) { // each parent frame opens one superstep
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      val start = in.readNBytes(n)
      require(start.length == n && n >= 2, s"bad start frame ($n bytes)")
      val phase = start(0).toChar
      val path = java.util.Arrays.copyOfRange(start, 1, start.length)
      def seqOpen(mode: Char): Int = {
        val p = new Array[Byte](path.length + 1)
        p(0) = mode.toByte
        System.arraycopy(path, 0, p, 1, path.length)
        send(WorkerPool.OpSeqOpen, p)
        java.nio.ByteBuffer.wrap(recv()).getInt
      }
      def seqClose(h: Int): Unit = {
        send(WorkerPool.OpSeqClose,
          java.nio.ByteBuffer.allocate(4).putInt(h).array())
        recv(): Unit // durability ack
      }
      val hb = (h: Int) => java.nio.ByteBuffer.allocate(4).putInt(h).array()
      if (phase == 'w') {
        val h = seqOpen('w')
        var records = 0L
        var done = false
        while (!done) {
          send(WorkerPool.OpReadNext, Array.emptyByteArray)
          val reply = recv()
          if (reply.nonEmpty && reply(0) == 1) {
            records += 1
            val rec = new String(reply, 1, reply.length - 1, "UTF-8")
              .toUpperCase(java.util.Locale.ROOT).getBytes("UTF-8")
            val p = new Array[Byte](rec.length + 4)
            System.arraycopy(hb(h), 0, p, 0, 4)
            System.arraycopy(rec, 0, p, 4, rec.length)
            send(WorkerPool.OpSeqAppend, p)
          } else done = true
        }
        seqClose(h)
        counter("records", records)
      } else { // 'r': consume the side file back through the parent
        val h = seqOpen('r')
        var records = 0L
        var done = false
        while (!done) {
          send(WorkerPool.OpSeqRead, hb(h))
          val reply = recv()
          if (reply.nonEmpty && reply(0) == 1) records += 1 else done = true
        }
        seqClose(h)
        counter("side_records", records)
      }
      send(WorkerPool.OpResponse, Array.emptyByteArray)
      hdr = in.readNBytes(4)
    }
  }
}
