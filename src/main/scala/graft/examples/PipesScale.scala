package graft.examples

import graft.GraftSession
import graft.operators.{Sources, WorkerPool}
import org.apache.spark.sql.functions._

/** Scale evidence for the pipes/WorkerPool family (11 declared rows):
  * measures what the family's 100 TB posture actually claims —
  *
  *   - ONE persistent child per executor JVM serves every task of
  *     every job (asserted structurally under a 32-task Spark job: the
  *     distinct pid set is ≤ the JVM count — the reference's per-peer
  *     child lifetime, `BinaryProtocol.java:50`);
  *   - per-record framed round-trip cost and CHUNKED child-driven
  *     throughput (driveLoop, 1024-record exchanges — the SYNC-barrier
  *     amortization: per-exchange overhead divides across the chunk);
  *   - the empty-exchange barrier floor (exchanges/sec at 0 records) —
  *     what a superstep costs before any data moves.
  *
  * Numbers are REPORTED (JSON lines, the probe convention); hard
  * asserts are structural — child lifetime, record conservation —
  * because wall-clock gates flake on this host's documented stall
  * windows. The ONE ratio gate (batched ≥5× unbatched) is made
  * stall-resistant by construction: three interleaved A/B passes,
  * best rate per side.
  *
  * Run: sbt "runMain graft.examples.PipesScale"
  */
object PipesScale {
  def main(args: Array[String]): Unit = {
    val nRecords = sys.env.getOrElse("PIPES_RECORDS", "200000").toInt
    val chunk = sys.env.getOrElse("PIPES_CHUNK", "1024").toInt
    val spark = GraftSession.get()
    import spark.implicits._

    val cmd = Sources.childJvmCmd("graft.operators.LoopUpperChild")

    // (1) child lifetime under a real 32-task job: every task acquires
    // the pool's child and pipes its partition through one exchange
    val pids = spark.sparkContext.collectionAccumulator[Long]("pipesScalePids")
    val out = spark.range(0, nRecords.toLong)
      .select(concat(lit("rec"), col("id")).as("v")).as[String]
      .mapPartitions { it =>
        val w = WorkerPool.get(cmd)
        pids.add(w.pid)
        it.grouped(chunk).flatMap { c =>
          val outRows = scala.collection.mutable.ArrayBuffer.empty[String]
          w.driveLoop(c.iterator.map(_.getBytes("UTF-8")))(
            r => outRows += new String(r, "UTF-8")): Unit
          outRows
        }
      }
    val t0 = System.nanoTime()
    val n = out.count()
    val jobSecs = (System.nanoTime() - t0) / 1e9
    require(n == nRecords.toLong, s"record conservation: $n != $nRecords")
    import scala.jdk.CollectionConverters._
    val distinctPids = pids.value.asScala.toSet
    val nJvms = math.max(1,
      spark.sparkContext.statusTracker.getExecutorInfos.length)
    require(distinctPids.nonEmpty && distinctPids.size <= nJvms,
      s"one child per executor JVM, saw ${distinctPids.size} across $nJvms")

    // (2) single-threaded framed round-trip cost (callFrame, 1 record
    // per frame — the UNAMORTIZED protocol floor)
    val w = WorkerPool.get(Sources.childJvmCmd("graft.operators.FrameSumChild"))
    val payload = java.nio.ByteBuffer.allocate(16).putDouble(1.5).putDouble(2.5).array()
    (1 to 1000).foreach(_ => w.callFrame(payload)) // warm-up
    val t1 = System.nanoTime()
    val rt = 20000
    (1 to rt).foreach(_ => w.callFrame(payload))
    val rtSecs = (System.nanoTime() - t1) / 1e9

    // (3)+(5) chunked child-driven throughput, one-record-per-frame vs
    // BATCHED (VERDICT r13 #2 — READ_BATCH/WRITE_BATCH moving `batchN`
    // records per frame, the reference's message-bundling answer,
    // `BSPMessageBundle.java`). The two sides are measured as THREE
    // INTERLEAVED A/B passes and the per-side BEST rate adjudicates: a
    // host stall can only slow a pass, so max-rate-of-3 is the
    // stall-resistant reading on each side, and interleaving keeps a
    // stall window from landing on one side only (review r14 #3 — a
    // sequential A-then-B layout let a stall deflate just the batched
    // window and fail the bar spuriously). ≥5× at batch 64 is
    // REQUIRED, not just reported — warm runs measure 28-32×.
    val w2 = WorkerPool.get(cmd)
    val batchN = sys.env.getOrElse("PIPES_BATCH", "64").toInt
    val w3 = WorkerPool.get(
      Sources.childJvmCmd("graft.operators.BatchUpperChild"))
    val startB = java.nio.ByteBuffer.allocate(4).putInt(batchN).array()
    val recs = Array.tabulate(chunk)(i => s"record-$i".getBytes("UTF-8"))
    val loops = math.max(1, 100000 / chunk)
    def timeSide(w: WorkerPool.Worker, start: Array[Byte]): Double = {
      val t0 = System.nanoTime()
      var served = 0L
      (1 to loops).foreach { _ =>
        w.driveLoop(recs.iterator, start = start)(_ => served += 1): Unit
      }
      require(served == loops.toLong * chunk, "record conservation")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach { _ => // warm-up both children
      w2.driveLoop(recs.iterator)(_ => ()): Unit
      w3.driveLoop(recs.iterator, start = startB)(_ => ()): Unit
    }
    val passes = (1 to 3).map { _ =>
      (timeSide(w2, Array.emptyByteArray), timeSide(w3, startB))
    }
    val dlSecs = passes.map(_._1).min
    val dbSecs = passes.map(_._2).min
    val speedup = (loops.toLong * chunk / dbSecs) / (loops.toLong * chunk / dlSecs)
    require(speedup >= 5.0,
      f"batching must divide the per-frame floor: measured $speedup%.1f× " +
        f"at batch $batchN (bar: 5×; best-of-3 interleaved per side)")

    // (4) the empty-exchange barrier floor
    val t3 = System.nanoTime()
    val barriers = 5000
    (1 to barriers).foreach(_ => w2.driveLoop(Iterator.empty)(_ => ()): Unit)
    val emptySecs = (System.nanoTime() - t3) / 1e9

    // (6) REOPEN replay: in-memory buffer vs the forced framed spill
    // file (bound 0 — every served record through storage). REPORTED
    // only; the structural assert is the two-pass child's own
    // pass-1 == pass-2 contract, checked per exchange — if the spill
    // round trip dropped or reordered a byte, the sums would differ.
    val w4 = WorkerPool.get(
      Sources.childJvmCmd("graft.operators.TwoPassSumChild"))
    val longRecs = Array.tabulate(chunk)(i =>
      java.nio.ByteBuffer.allocate(8).putLong(i.toLong).array())
    def twoPass(spill: Long): Double = {
      val t = System.nanoTime()
      var counted = 0L
      (1 to loops).foreach { _ =>
        var outB: Array[Byte] = null
        w4.driveLoop(longRecs.iterator, reopenable = true,
          reopenSpillBytes = spill)(r => outB = r): Unit
        val bb = java.nio.ByteBuffer.wrap(outB)
        val s1 = bb.getLong
        val s2 = bb.getLong
        require(s1 == s2, s"REOPEN replay must be exact: $s1 != $s2")
        counted += bb.getLong
      }
      require(counted == loops.toLong * chunk, "replay record conservation")
      (System.nanoTime() - t) / 1e9
    }
    twoPass(Long.MaxValue): Unit // warm-up
    val memSecs = twoPass(Long.MaxValue)
    val spillSecs = twoPass(0L)
    // records served per second across BOTH passes (each exchange
    // serves every record twice)
    val served = 2L * loops * chunk

    println(f"""{"metric":"pipes_scale","records":$nRecords,"chunk":$chunk,""" +
      f""""children":${distinctPids.size},"jvms":$nJvms,""" +
      f""""job_records_per_sec":${n / jobSecs}%.0f,""" +
      f""""framed_roundtrips_per_sec":${rt / rtSecs}%.0f,""" +
      f""""driveloop_records_per_sec":${loops.toLong * chunk / dlSecs}%.0f,""" +
      f""""batch_n":$batchN,""" +
      f""""batched_records_per_sec":${loops.toLong * chunk / dbSecs}%.0f,""" +
      f""""batched_speedup":$speedup%.1f,""" +
      f""""reopen_mem_records_per_sec":${served / memSecs}%.0f,""" +
      f""""reopen_spill_records_per_sec":${served / spillSecs}%.0f,""" +
      f""""empty_exchanges_per_sec":${barriers / emptySecs}%.0f}""")
    spark.stop()
  }
}
