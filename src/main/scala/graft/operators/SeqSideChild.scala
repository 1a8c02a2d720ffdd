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
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, start) => // one superstep per frame
      require(start.length >= 2, s"bad start frame (${start.length} bytes)")
      val phase = start(0).toChar
      val path = java.util.Arrays.copyOfRange(start, 1, start.length)
      def seqOpen(mode: Char): Int = {
        val p = new Array[Byte](path.length + 1)
        p(0) = mode.toByte
        System.arraycopy(path, 0, p, 1, path.length)
        java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpSeqOpen, p)).getInt
      }
      def hb(h: Int) = java.nio.ByteBuffer.allocate(4).putInt(h).array()
      def seqClose(h: Int): Unit =
        conn.ask(WorkerPool.OpSeqClose, hb(h)): Unit // durability ack
      if (phase == 'w') {
        val h = seqOpen('w')
        var records = 0L
        var done = false
        while (!done) conn.readNext() match {
          case Some(rec0) =>
            records += 1
            val rec = new String(rec0, "UTF-8")
              .toUpperCase(java.util.Locale.ROOT).getBytes("UTF-8")
            val p = new Array[Byte](rec.length + 4)
            System.arraycopy(hb(h), 0, p, 0, 4)
            System.arraycopy(rec, 0, p, 4, rec.length)
            conn.send(WorkerPool.OpSeqAppend, p)
          case None => done = true
        }
        seqClose(h)
        conn.counter("records", records)
      } else { // 'r': consume the side file back through the parent
        val h = seqOpen('r')
        var records = 0L
        var done = false
        while (!done) {
          val reply = conn.ask(WorkerPool.OpSeqRead, hb(h))
          if (reply.nonEmpty && reply(0) == 1) records += 1 else done = true
        }
        seqClose(h)
        conn.counter("side_records", records)
      }
      conn.respond()
    }
}
