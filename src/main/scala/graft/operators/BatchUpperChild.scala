package graft.operators

/** Demo worker binary for the BATCHED record loop (VERDICT r13 #2 —
  * the reference's answer to per-record messaging cost is BUNDLING:
  * `core/src/main/java/org/apache/hama/bsp/BSPMessageBundle.java`
  * byte-packs many messages per transfer, applied per destination at
  * `OutgoingPOJOMessageBundle.java:59`): instead of one READ_NEXT and
  * one WRITE round trip per record (two pipe crossings each — the
  * ~47 µs/record floor PipesScale measured), the child pulls up to
  * `batchN` records per READ_BATCH frame and emits each pulled batch's
  * upper-cased outputs as ONE WRITE_BATCH frame, so the per-frame
  * syscall + context-switch cost divides across the batch.
  *
  * The start frame carries `[4B batchN]` (missing/0 → 64). Credits
  * "records" (total pulled) and "frames" (READ_BATCH requests issued,
  * including the empty end-of-input pull), so a caller can assert the
  * batching is load-bearing: frames == ceil(records/batchN) + 1 per
  * exchange, NOT one per record. Exits cleanly on EOF. */
object BatchUpperChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, startFrame) =>
      val batchN =
        if (startFrame.length >= 4) {
          val n = java.nio.ByteBuffer.wrap(startFrame).getInt
          if (n > 0) n else 64
        } else 64
      var records = 0L
      var frames = 0L
      var done = false
      while (!done) {
        val reply = conn.ask(WorkerPool.OpReadBatch,
          java.nio.ByteBuffer.allocate(4).putInt(batchN).array())
        frames += 1
        val n = java.nio.ByteBuffer.wrap(reply, 0, 4).getInt
        if (n == 0) done = true
        else {
          records += n
          val out = new java.io.ByteArrayOutputStream(reply.length + 4)
          val dos = new java.io.DataOutputStream(out)
          dos.writeInt(n)
          var i = 0
          var off = 4
          while (i < n) {
            val len = java.nio.ByteBuffer.wrap(reply, off, 4).getInt
            val up = new String(reply, off + 4, len, "UTF-8")
              .toUpperCase(java.util.Locale.ROOT).getBytes("UTF-8")
            dos.writeInt(up.length)
            dos.write(up)
            off += 4 + len
            i += 1
          }
          conn.send(WorkerPool.OpWriteBatch, out.toByteArray)
        }
      }
      conn.counter("records", records)
      conn.counter("frames", frames)
      conn.respond()
    }
}
