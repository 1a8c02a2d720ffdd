package graft.examples

import graft.{GraftSession, Tables}
import graft.plans.Pregel
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** vertex state for the probe's typed PageRank */
final case class ProbeV(rank: Double, adj: Seq[Long])

/** Shuffle-volume probe for the typed Pregel engine (VERDICT r2 item 4):
  * runs PageRank on the ScaleBench lineitem-derived graph (~600 k edges at
  * sf0.1) and reports wall time plus TOTAL shuffle bytes written, summed
  * over every stage via a listener. Run against the r2 engine (vertex
  * state re-exchanged by the per-superstep join) and the r3 engine
  * (vertices hash-partitioned once, narrow cogroup, messages-only
  * shuffle) to quantify the co-partitioning win — numbers in BASELINE.md.
  *
  * Run: sbt "runMain graft.examples.PregelProbe [nodeMod] [iters]"
  */
object PregelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    import spark.implicits._

    val shufWrite = new AtomicLong
    val shufRecords = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRecords.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
      }
    })

    val e = Tables(spark, sfDir, "lineitem")
      .select((col("l_orderkey") % n).as("src"),
        ((col("l_partkey") * 7 + col("l_suppkey")) % n).as("dst"))
      .distinct()
    val vs = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    val nv = vs.count().toDouble
    val adj = e.groupBy("src").agg(collect_list("dst").as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"), typedLit(Seq.empty[Long])).as("adj"))
      .as[(Long, Seq[Long])]
      .map { case (v, a) => (v, ProbeV(1.0 / nv, a)) }
      .localCheckpoint() // input materialized outside the timed/counted loop

    // count only the loop's shuffle traffic, not graph construction
    shufWrite.set(0L); shufRecords.set(0L)
    val t0 = System.nanoTime()
    var msgsSent = 0L
    val out = Pregel.run[ProbeV, Double, Unit](spark, verts, maxIter = iters + 1,
      combiner = Some((a: Double, b: Double) => a + b),
      onSuperstep = st => msgsSent += st.messagesSent)((_, v, msgs, step, _) =>
      if (step == 0)
        Pregel.ComputeResult(v, messages = v.adj.map(dst => (dst, v.rank / v.adj.size)))
      else {
        val nr = 0.15 / nv + 0.85 * msgs.sum
        if (step < iters)
          Pregel.ComputeResult(v.copy(rank = nr),
            messages = v.adj.map(dd => (dd, nr / v.adj.size)))
        else Pregel.ComputeResult(v.copy(rank = nr), voteToHalt = true)
      })
    val rankSum = out.map(_._2.rank).reduce(_ + _)
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the listener bus drain the final stages
    println(f"""{"metric":"pregel_shuffle_probe","value":$secs%.3f,"unit":"sec",""" +
      f""""vertices":${nv.toLong},"supersteps":${iters + 1},"msgs":$msgsSent,""" +
      f""""shuffle_write_bytes":${shufWrite.get},"shuffle_write_records":${shufRecords.get},""" +
      f""""rank_sum":$rankSum%.6f}""")
    spark.stop()
  }
}
