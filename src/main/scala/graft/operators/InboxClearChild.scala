package graft.operators

/** Demo worker binary for CLEAR + GET_ALL_PEERNAME (VERDICT r13 #4 —
  * the two straggler opcodes, `core/.../pipes/protocol/MessageType
  * .java` codes 18 and 12): per exchange the child sizes its inbox,
  * drains exactly ONE message, CLEARs the rest (one-way — the pipe's
  * ordering makes the drop visible to the next count), re-sizes, and
  * pulls the full peer roster; it WRITEs
  * `[8B count-before][8B count-after][1B none-after-clear][4B roster
  * size]` so the caller can assert the remaining messages were REALLY
  * dropped (count-after must be 0 with messages left unread — CLEAR is
  * load-bearing, not an ack of emptiness) and the roster matches the
  * peer count. Exits cleanly on EOF. */
object InboxClearChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, _) =>
      val before = java.nio.ByteBuffer
        .wrap(conn.ask(WorkerPool.OpGetMsgCount)).getLong
      conn.getMsg(): Unit // consume exactly one
      conn.send(WorkerPool.OpClear, Array.emptyByteArray) // drop the rest
      val after = java.nio.ByteBuffer
        .wrap(conn.ask(WorkerPool.OpGetMsgCount)).getLong
      val none: Byte = if (conn.getMsg().isEmpty) 1 else 0
      val roster = java.nio.ByteBuffer.wrap(conn.ask(WorkerPool.OpAllPeers))
      val cnt = roster.getInt
      // the roster must be exactly [0, count) — indices are the
      // engine's peer names; a desynced frame fails the exchange
      var i = 0
      while (i < cnt) {
        val idx = roster.getInt
        if (idx != i) sys.error(s"roster out of order: $idx at $i")
        i += 1
      }
      conn.send(WorkerPool.OpWrite, java.nio.ByteBuffer.allocate(21)
        .putLong(before).putLong(after).put(none).putInt(cnt).array())
      conn.respond()
    }
}
