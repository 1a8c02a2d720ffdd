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
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, _) => // each parent frame opens one chunk
      var records = 0L
      var done = false
      while (!done) conn.readNext() match {
        case Some(rec) =>
          records += 1
          conn.send(WorkerPool.OpWrite,
            new String(rec, "UTF-8").toUpperCase(java.util.Locale.ROOT)
              .getBytes("UTF-8"))
        case None => done = true
      }
      conn.counter("records", records)
      conn.respond()
    }
}
