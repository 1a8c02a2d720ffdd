package graft.operators

/** Demo worker binary for the PEER-MESSAGING opcode surface — the
  * reference's communicating pipes BSP program (`SEND_MSG` / `GET_MSG`
  * / `GET_MSG_COUNT` plus `GET_PEER_INDEX`/`GET_PEER_COUNT`,
  * `core/.../pipes/protocol/MessageType.java:26-29`), in the
  * master-collect shape of the reference's own `PiEstimator`
  * (`examples/.../PiEstimator.java:55-95`: local compute, send to
  * master, master sums):
  *
  * each chunk exchange is one superstep; the child first asks who it is
  * ([[WorkerPool.OpPeerInfo]]) and how many messages arrived
  * ([[WorkerPool.OpGetMsgCount]]), then
  *   - with an EMPTY inbox (the compute superstep) it pulls its input
  *     records (8-byte big-endian longs), sums them, and — if it read
  *     any — SEND_MSGs the partial to peer 0 stamped with its OWN peer
  *     index (`[8B partial][4B src index]` — the introspection answer
  *     is load-bearing: the master counts distinct stamps);
  *   - with a NON-EMPTY inbox (the master's collect superstep) it
  *     drains GET_MSG, sums the partials, tracks the distinct sender
  *     stamps, and WRITEs `[8B total][4B distinct senders][4B messages]
  *     [1B all-peers-ok]`.
  * Every exchange ALSO pulls the full roster (GET_ALL_PEERNAME —
  * [[WorkerPool.OpAllPeers]], the reference's `MessageType.java` code
  * 12 / `UplinkReader.java:289-291`) and checks it is exactly
  * [0, peer count); the VERDICT of that check travels ONLY in the
  * master's written stamp, so the declared row's `require` on the
  * stamp is the load-bearing assert (a child-side kill would make the
  * stamp a constant). Every exchange closes with an empty RESPONSE.
  * Exits cleanly on EOF.
  */
object MsgSumChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, _) => // each parent frame = one superstep
      val info = java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpPeerInfo))
      val myIdx = info.getInt
      val nPeers = info.getInt
      // the roster check's VERDICT travels in the master's write (and
      // only there — review r14 #5: a child-side kill would make the
      // stamp a constant and the row's require decorative): the stamp
      // is 1 iff the roster was exactly [0, peer count)
      val roster = java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpAllPeers))
      val rosterN = roster.getInt
      var rosterOk: Byte =
        (if (nPeers < 0 || rosterN == nPeers) 1 else 0).toByte
      var ri = 0
      while (ri < rosterN) {
        if (roster.getInt != ri) rosterOk = 0
        ri += 1
      }
      val inboxN =
        java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpGetMsgCount)).getLong
      if (inboxN == 0L) { // compute superstep: sum records, send to master
        var local = 0L
        var read = 0L
        var done = false
        while (!done) conn.readNext() match {
          case Some(rec) =>
            local += java.nio.ByteBuffer.wrap(rec).getLong
            read += 1
          case None => done = true
        }
        if (read > 0) // idle peers stay silent, so the exchange quiesces
          conn.send(WorkerPool.OpSendMsg, java.nio.ByteBuffer.allocate(20)
            .putLong(0L).putLong(local).putInt(myIdx).array())
      } else { // collect superstep: drain the inbox, write the total
        var total = 0L
        var got = 0L
        val senders = scala.collection.mutable.Set.empty[Int]
        var done = false
        while (!done) conn.getMsg() match {
          case Some(msg) =>
            val bb = java.nio.ByteBuffer.wrap(msg)
            total += bb.getLong
            senders += bb.getInt
            got += 1
          case None => done = true
        }
        conn.send(WorkerPool.OpWrite, java.nio.ByteBuffer.allocate(17)
          .putLong(total).putInt(senders.size).putInt(got.toInt)
          .put(rosterOk).array())
      }
      conn.respond()
    }
}
