package graft.operators

/** Demo worker binary for REOPEN_INPUT (`MessageType.java:25-32` code
  * 17) — the reference's two-pass child: algorithms like min-max
  * normalization or count-then-sample need the input split TWICE. Per
  * chunk exchange:
  *
  *   - pass 1: READ_NEXT every record (8-byte big-endian longs),
  *     summing;
  *   - OpReopen — the parent acks and rewinds the exchange's records;
  *   - pass 2: READ_NEXT everything again, re-summing and counting;
  *   - WRITE `[8B pass-1 sum][8B pass-2 sum][8B count]` — the caller
  *     asserts the two sums equal, which only holds if the replay
  *     served the identical records.
  * Closes each exchange with an empty RESPONSE. Exits cleanly on EOF. */
object TwoPassSumChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, _) =>
      def drain(): (Long, Long) = {
        var s = 0L
        var n = 0L
        var done = false
        while (!done) conn.readNext() match {
          case Some(rec) =>
            s += java.nio.ByteBuffer.wrap(rec).getLong
            n += 1
          case None => done = true
        }
        (s, n)
      }
      val (sum1, _) = drain()
      conn.ask(WorkerPool.OpReopen): Unit // ack, records rewound
      val (sum2, n2) = drain()
      conn.send(WorkerPool.OpWrite, java.nio.ByteBuffer.allocate(24)
        .putLong(sum1).putLong(sum2).putLong(n2).array())
      conn.respond()
    }
}
