package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the CHILD-INITIATED opcode surface
  * (WorkerPool.callFrameOps / driveLoop — the reference's
  * `MessageType.java:25-32` analogues), beside the declared rows'
  * end-to-end asserts: counter/log frames route to their callbacks and
  * never leak into the response; the child-driven loop pulls exactly
  * the records offered, emits one transformed output per input here,
  * credits the counter with the true pull count, and stays correct
  * across MULTIPLE chunk exchanges on the SAME persistent child (the
  * SYNC-barrier shape). */
class WorkerPoolOpsSpec extends AnyFunSuite {

  test("callFrameOps: counters and logs route out-of-band; response carries the sum") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.FrameStatsChild"))
    var counted = 0L
    var logs = 0
    def call(xs: Double*): Double = {
      val bb = java.nio.ByteBuffer.allocate(8 * xs.length)
      xs.foreach(bb.putDouble)
      val resp = w.callFrameOps(bb.array())(
        (n, d) => if (n == "components") counted += d,
        _ => logs += 1)
      java.nio.ByteBuffer.wrap(resp).getDouble
    }
    assert(call(1.5, 2.5, -1.0) === 3.0)
    assert(call(4.0) === 4.0)
    assert(counted === 4L, "the child must credit one count per component")
    assert(logs === 1, "the startup LOG frame arrives exactly once per child")
  }

  test("driveLoop: the child pulls every record across chunks and credits the pull count") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.LoopUpperChild"))
    var pulled = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val records = (1 to 7).map(i => s"rec$i")
    records.grouped(3).foreach { chunk => // 3 chunk exchanges, one child
      w.driveLoop(chunk.iterator.map(_.getBytes("UTF-8")))(
        r => out += new String(r, "UTF-8"),
        (n, d) => if (n == "records") pulled += d): Unit
    }
    assert(out.toSeq === records.map(_.toUpperCase))
    assert(pulled === records.size.toLong)
  }

  test("driveLoop: an empty chunk quiesces with zero writes and a zero credit") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.LoopUpperChild"))
    var pulled = -1L
    var writes = 0
    w.driveLoop(Iterator.empty)(_ => writes += 1,
      (n, d) => if (n == "records") pulled = d): Unit
    assert(writes === 0 && pulled === 0L)
  }

  private def longRec(x: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(x).array()

  test("peer messaging: SEND_MSG surfaces with its destination and stamped payload") {
    // the compute superstep: empty inbox, so MsgSumChild sums its
    // records and SEND_MSGs the partial to peer 0, stamped with the
    // OpPeerInfo index the parent served
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.MsgSumChild"))
    val sends = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    w.driveLoop(Iterator(longRec(10), longRec(32)), peer = (5, 8))(
      _ => fail("the compute superstep writes nothing"),
      onSend = (dst, p) => sends += ((dst, p))): Unit
    assert(sends.size === 1)
    val (dst, payload) = sends.head
    assert(dst === 0L, "the partial goes to the master peer")
    val bb = java.nio.ByteBuffer.wrap(payload)
    assert(bb.getLong === 42L, "the partial is the record sum")
    assert(bb.getInt === 5, "the payload carries the child's OpPeerInfo index")
  }

  test("peer messaging: GET_MSG_COUNT/GET_MSG drain the inbox; idle peers stay silent") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.MsgSumChild"))
    // master's collect superstep: 3 messages from distinct stamped peers
    def msg(v: Long, src: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(12).putLong(v).putInt(src).array()
    var written: Array[Byte] = null
    w.driveLoop(Iterator.empty,
        inbox = Seq(msg(7, 1), msg(8, 2), msg(9, 1)), peer = (0, 8))(
      r => written = r,
      onSend = (_, _) => fail("the collect superstep sends nothing")): Unit
    val bb = java.nio.ByteBuffer.wrap(written)
    assert(bb.getLong === 24L, "the total is the drained-inbox sum")
    assert(bb.getInt === 2, "distinct sender stamps are counted")
    assert(bb.getInt === 3, "every queued message is drained")
    assert(bb.get() === 1.toByte,
      "the GET_ALL_PEERNAME roster must have named every peer")
    // an idle peer (no inbox, no records) must neither send nor write —
    // the exchange quiesces instead of looping
    w.driveLoop(Iterator.empty, peer = (3, 8))(
      _ => fail("an idle peer writes nothing"),
      onSend = (_, _) => fail("an idle peer sends nothing")): Unit
  }

  test("seqfile opcodes: append through the parent, read back, binary-safe framing") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.SeqSideChild"))
    val dir = GraftSession.tempDirCleanedOnExit("spec-seqside").toString
    val path = s"$dir/side.seq"
    def start(phase: Char) = phase.toByte +: path.getBytes("UTF-8")
    var wrote = 0L
    // produce phase: the child pulls 3 records and appends their
    // upper-cased forms to the side file through SEQFILE_APPEND
    w.driveLoop(Iterator("ab", "cd\nef", "g").map(_.getBytes("UTF-8")),
        start = start('w'))(
      _ => fail("produce phase emits only to the side file"),
      (n, d) => if (n == "records") wrote += d): Unit
    assert(wrote === 3L)
    // the on-disk form is the engine's framed-record format — parseable
    // without the child, newline byte intact (a line protocol would
    // have split record 2)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val recs = operators.WorkerPool.readFramedRecords(bytes)
      .map(new String(_, "UTF-8")).toSeq
    assert(recs === Seq("AB", "CD\nEF", "G"))
    // consume phase: SEQFILE_READNEXT replays every record to the child
    var readBack = 0L
    w.driveLoop(Iterator.empty, start = start('r'))(
      _ => fail("consume phase only counts"),
      (n, d) => if (n == "side_records") readBack += d): Unit
    assert(readBack === 3L)
  }

  test("REOPEN_INPUT: an opted-in exchange replays its records identically") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.TwoPassSumChild"))
    var out: Array[Byte] = null
    w.driveLoop(Iterator(longRec(10), longRec(-3), longRec(35)),
        reopenable = true)(rec => out = rec): Unit
    val bb = java.nio.ByteBuffer.wrap(out)
    assert(bb.getLong === 42L, "pass-1 sum")
    assert(bb.getLong === 42L, "pass-2 sum must match — the replay is exact")
    assert(bb.getLong === 3L, "pass-2 record count")
  }

  test("REOPEN_INPUT: a zero spill bound forces every record through storage, replay exact") {
    // VERDICT r13 #1 acceptance: reopenSpillBytes = 0 spills EVERY
    // served record to the framed side file, so pass-2 is read back
    // from storage, never from heap — the sums agree only if the
    // spill+re-read round trip is byte-exact. 500 records ≫ any
    // buffering, exercising many spill appends per exchange.
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.TwoPassSumChild"))
    val xs = (1 to 500).map(i => (i * 2654435761L) % 1000003L - 500000L)
    var out: Array[Byte] = null
    w.driveLoop(xs.iterator.map(longRec), reopenable = true,
        reopenSpillBytes = 0L)(rec => out = rec): Unit
    val bb = java.nio.ByteBuffer.wrap(out)
    val s1 = bb.getLong
    val s2 = bb.getLong
    assert(s1 === xs.sum, "pass-1 sum")
    assert(s2 === s1, "pass-2 must re-read the spill file byte-exactly")
    assert(bb.getLong === 500L, "pass-2 record count")
  }

  test("REOPEN_INPUT: a mid-exchange spill bound replays the memory/storage seam exactly") {
    // a bound crossed partway through the exchange: the replay serves
    // a spilled prefix from the file and the live suffix from memory —
    // the seam must be invisible to the child
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.TwoPassSumChild"))
    val xs = (1L to 40L).toSeq
    var out: Array[Byte] = null
    w.driveLoop(xs.iterator.map(longRec), reopenable = true,
        reopenSpillBytes = 100L)(rec => out = rec): Unit
    val bb = java.nio.ByteBuffer.wrap(out)
    assert(bb.getLong === 820L)
    assert(bb.getLong === 820L, "the memory/storage seam must not move the replay")
    assert(bb.getLong === 40L)
  }

  test("batched loop: READ_BATCH/WRITE_BATCH move every record, frames divide by the batch") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.BatchUpperChild"))
    val records = (1 to 103).map(i => s"rec$i")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pulled = 0L
    var frames = 0L
    val start = java.nio.ByteBuffer.allocate(4).putInt(16).array()
    w.driveLoop(records.iterator.map(_.getBytes("UTF-8")), start = start)(
      r => out += new String(r, "UTF-8"),
      (n, d) => if (n == "records") pulled += d else if (n == "frames") frames += d): Unit
    assert(out.toSeq === records.map(_.toUpperCase),
      "batched frames must preserve record order and content")
    assert(pulled === 103L)
    // 103 records at batch 16 = 6 full + 1 partial + 1 empty EOF pull
    assert(frames === 8L, "one frame per BATCH, not per record")
    // an empty exchange is one empty pull
    var f2 = 0L
    w.driveLoop(Iterator.empty, start = start)(
      _ => fail("no records to write"),
      (n, d) => if (n == "frames") f2 += d): Unit
    assert(f2 === 1L)
  }

  test("batched loop from a Python child: the wire format is language-neutral") {
    // the same READ_BATCH/WRITE_BATCH exchange as the JVM child, spoken
    // by struct-packed Python stdio — order, content and the frame
    // arithmetic must be identical
    val w = operators.WorkerPool.get(
      Seq("python3", "-u", "-c", operators.Sources.pythonBatchChild))
    val records = (1 to 41).map(i => s"py$i")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pulled = 0L
    var frames = 0L
    val start = java.nio.ByteBuffer.allocate(4).putInt(8).array()
    w.driveLoop(records.iterator.map(_.getBytes("UTF-8")), start = start)(
      r => out += new String(r, "UTF-8"),
      (n, d) => if (n == "records") pulled += d else if (n == "frames") frames += d): Unit
    assert(out.toSeq === records.map(_.toUpperCase))
    assert(pulled === 41L)
    assert(frames === 7L, "5 full + 1 partial + 1 empty EOF pull at batch 8")
  }

  test("CLEAR drops the unread inbox; GET_ALL_PEERNAME answers the roster") {
    val w = operators.WorkerPool.get(
      operators.Sources.childJvmCmd("graft.operators.InboxClearChild"))
    val inbox = Seq("a", "b", "c").map(_.getBytes("UTF-8"))
    var written: Array[Byte] = null
    w.driveLoop(Iterator.empty, inbox = inbox, peer = (1, 4))(
      r => written = r): Unit
    val bb = java.nio.ByteBuffer.wrap(written)
    assert(bb.getLong === 3L, "count before: the full inbox")
    // the child read ONE message then CLEARed — the remaining two must
    // be really dropped, not awaiting a drain
    assert(bb.getLong === 0L, "count after CLEAR must be zero with 2 unread")
    assert(bb.get() === 1.toByte, "GET_MSG after CLEAR must return none")
    assert(bb.getInt === 4, "the roster names all 4 peers")
  }

  test("REOPEN_INPUT: without the caller's opt-in the child's rewind fails loudly") {
    // dedicated argv: the staged failure poisons (and so respawns) only
    // this pool entry
    val cmd = operators.Sources
      .childJvmCmd("graft.operators.TwoPassSumChild") :+ "no-reopen-probe"
    val w = operators.WorkerPool.get(cmd)
    val e = intercept[IllegalArgumentException] {
      w.driveLoop(Iterator(longRec(1)))(_ => ()): Unit
    }
    assert(e.getMessage.contains("reopenable"))
  }

  test("framed side-file format: encode/parse round-trips arbitrary binary records") {
    // the parse side (readFramedRecords) against the format spec the
    // writer implements (4-byte big-endian length + payload): property
    // over adversarial shapes — empty records, single bytes, newline
    // and NUL bytes, lengths near the 4-byte header boundary
    val rnd = new scala.util.Random(20260816L)
    val cases: Seq[Seq[Array[Byte]]] =
      Seq(Seq.empty, Seq(Array.emptyByteArray), Seq(Array[Byte](0, 10, 13))) ++
        (1 to 50).map { _ =>
          (0 to rnd.nextInt(8)).map { _ =>
            val b = new Array[Byte](rnd.nextInt(40))
            rnd.nextBytes(b); b
          }
        }
    for (recs <- cases) {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      recs.foreach { r => dos.writeInt(r.length); dos.write(r) }
      val back = operators.WorkerPool.readFramedRecords(out.toByteArray).toSeq
      assert(back.length === recs.length)
      back.zip(recs).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    // a truncated trailing header (a crash mid-append) stops cleanly
    // instead of over-reading: the final partial frame is not a record
    val good = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(good)
    dos.writeInt(2); dos.write(Array[Byte](7, 8)); dos.write(Array[Byte](0, 0))
    assert(operators.WorkerPool.readFramedRecords(good.toByteArray)
      .map(_.toSeq).toSeq === Seq(Seq[Byte](7, 8)))
    // a poisoned length fails loudly, never allocates past the buffer
    val bad = new java.io.ByteArrayOutputStream()
    new java.io.DataOutputStream(bad).writeInt(999999)
    intercept[IllegalArgumentException] {
      operators.WorkerPool.readFramedRecords(bad.toByteArray).toSeq
    }
  }

  test("peer messaging: an unwired SEND_MSG fails loudly and kills the desynced child") {
    // a DEDICATED child (distinct argv = distinct pool entry) so the
    // staged failure can't interleave with the shared child's traffic
    val cmd =
      operators.Sources.childJvmCmd("graft.operators.MsgSumChild") :+ "desync-probe"
    val w = operators.WorkerPool.get(cmd)
    val deadPid = w.pid
    val e = intercept[RuntimeException] {
      w.driveLoop(Iterator(longRec(1)), peer = (2, 4))(_ => ()): Unit
    }
    assert(e.getMessage.contains("onSend"))
    // the aborted exchange left unread frames in the pipe of a child
    // that was still alive — the pool must NOT hand that child to the
    // retry (it would silently consume stale frames): abnormal exits
    // destroy the worker, so the next acquisition is a fresh respawn
    // with a clean protocol (review r13 #1)
    val w2 = operators.WorkerPool.get(cmd)
    assert(w2.pid !== deadPid,
      "a retry must acquire a respawned child, not the desynced one")
    val sends = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    w2.driveLoop(Iterator(longRec(4), longRec(5)), peer = (1, 4))(
      _ => fail("the compute superstep writes nothing"),
      onSend = (dst, p) => sends += ((dst, p))): Unit
    assert(sends.size === 1 &&
      java.nio.ByteBuffer.wrap(sends.head._2).getLong === 9L,
      "the respawned child must run a clean exchange")
  }
}
