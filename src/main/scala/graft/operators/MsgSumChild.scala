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
  *     stamps, and WRITEs `[8B total][4B distinct senders][4B messages]`.
  * Every exchange closes with an empty RESPONSE. Exits cleanly on EOF.
  */
object MsgSumChild {
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
    def ask(opcode: Byte): Array[Byte] = {
      send(opcode, Array.emptyByteArray); recv()
    }
    var hdr = in.readNBytes(4)
    while (hdr.length == 4) { // each parent frame opens one superstep
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      in.readNBytes(n): Unit // start-of-chunk payload (unused)
      val info = java.nio.ByteBuffer.wrap(ask(WorkerPool.OpPeerInfo))
      val myIdx = info.getInt
      info.getInt: Unit // peer count — available, unused by this program
      val inboxN = java.nio.ByteBuffer.wrap(ask(WorkerPool.OpGetMsgCount)).getLong
      if (inboxN == 0L) { // compute superstep: sum records, send to master
        var local = 0L
        var read = 0L
        var done = false
        while (!done) {
          val reply = ask(WorkerPool.OpReadNext)
          if (reply.nonEmpty && reply(0) == 1) {
            local += java.nio.ByteBuffer.wrap(reply, 1, 8).getLong
            read += 1
          } else done = true
        }
        if (read > 0) // idle peers stay silent, so the exchange quiesces
          send(WorkerPool.OpSendMsg, java.nio.ByteBuffer.allocate(20)
            .putLong(0L).putLong(local).putInt(myIdx).array())
      } else { // collect superstep: drain the inbox, write the total
        var total = 0L
        var got = 0L
        val senders = scala.collection.mutable.Set.empty[Int]
        var done = false
        while (!done) {
          val reply = ask(WorkerPool.OpGetMsg)
          if (reply.nonEmpty && reply(0) == 1) {
            val bb = java.nio.ByteBuffer.wrap(reply, 1, reply.length - 1)
            total += bb.getLong
            senders += bb.getInt
            got += 1
          } else done = true
        }
        send(WorkerPool.OpWrite, java.nio.ByteBuffer.allocate(16)
          .putLong(total).putInt(senders.size).putInt(got.toInt).array())
      }
      send(WorkerPool.OpResponse, Array.emptyByteArray)
      hdr = in.readNBytes(4)
    }
  }
}
