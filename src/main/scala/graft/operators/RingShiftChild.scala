package graft.operators

/** Demo worker binary for the GENERAL peer-to-peer exchange — where
  * [[MsgSumChild]] is the reference's master-collect shape
  * (`PiEstimator.java`), this is the neighbor exchange of its matrix
  * examples (`TestPipes`' communicating programs): every peer sends to
  * a DIFFERENT destination, so the delivery shuffle routes N distinct
  * (src → dst) pairs, none of them to a single hub.
  *
  * Superstep semantics per chunk exchange — branched on the SUPERSTEP
  * NUMBER ([[WorkerPool.OpSuperstep]], the reference's
  * GET_SUPERSTEP_COUNT: a BSP algorithm's phases are a function of the
  * superstep, not of whether mail happens to have arrived):
  *   - superstep 0 (compute): read the input records (8-byte longs),
  *     sum them, SEND_MSG the partial to the RIGHT NEIGHBOR
  *     `(idx + 1) % count` (both from [[WorkerPool.OpPeerInfo]]),
  *     stamped with the sender index;
  *   - superstep ≥ 1 (receive): drain GET_MSG — exactly one message
  *     in a ring — and WRITE `[8B received partial][4B sender index]`.
  * Every exchange closes with an empty RESPONSE. Exits cleanly on EOF. */
object RingShiftChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, _) =>
      val info = java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpPeerInfo))
      val myIdx = info.getInt
      val count = info.getInt
      val step =
        java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpSuperstep)).getLong
      if (step == 0L) { // compute superstep: sum records, send right
        var local = 0L
        var read = 0L
        var done = false
        while (!done) conn.readNext() match {
          case Some(rec) =>
            local += java.nio.ByteBuffer.wrap(rec).getLong
            read += 1
          case None => done = true
        }
        if (read > 0)
          conn.send(WorkerPool.OpSendMsg, java.nio.ByteBuffer.allocate(20)
            .putLong(((myIdx + 1) % count).toLong).putLong(local)
            .putInt(myIdx).array())
      } else { // receive superstep: exactly one neighbor message
        var out: Array[Byte] = null
        var done = false
        while (!done) conn.getMsg() match {
          case Some(msg) =>
            require(out == null, "a ring peer receives exactly one message")
            out = msg
          case None => done = true
        }
        if (out != null) conn.send(WorkerPool.OpWrite, out)
      }
      conn.respond()
    }
}
