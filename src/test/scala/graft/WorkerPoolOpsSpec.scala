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
}
