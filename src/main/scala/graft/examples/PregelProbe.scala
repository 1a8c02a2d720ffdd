package graft.examples

import graft.{GraftSession, Tables}
import graft.plans.{Iterate, Pregel}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** vertex state for the probe's typed PageRank */
final case class ProbeV(rank: Double, adj: Seq[Long])

/** Shuffle-volume probe for the typed Pregel engine (VERDICT r2 item 4;
  * extended per VERDICT r7 item 6 to a ≥10⁷-edge generated graph): runs
  * the SAME fixed-superstep PageRank through BOTH execution shapes and
  * reports wall time plus TOTAL shuffle bytes/records via a stage
  * listener, so the ownership model's headline claim — "messages
  * shuffle every superstep, the graph does NOT" — is a measurement:
  *
  *   - `pregel`: the co-partitioned engine ([[Pregel.run]]) — vertex
  *     state (including adjacency) is hash-partitioned once and stays
  *     put; each superstep shuffles only the messages.
  *   - `reexchange`: the naive declarative loop — every superstep joins
  *     the rank relation against the edge relation by key, so the EDGE
  *     set rides a shuffle every superstep alongside the ranks (Spark
  *     cannot reuse the exchange across separate iteration jobs).
  *
  * Run: sbt "runMain graft.examples.PregelProbe [nodeMod] [iters] [nEdges]"
  *   - no nEdges: lineitem-derived graph from SPARK_GRAFT_SF_DIR (~600 k
  *     edges at sf0.1)
  *   - nEdges given (e.g. 10000000): generated graph — src = i % n,
  *     dst = (i·2654435761) % n, a hash-scattered multigraph
  */
object PregelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val nEdges = args.lift(2).map(_.toLong)
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
    def measured[A](f: => A): (A, Double, Long, Long) = {
      shufWrite.set(0L); shufRecords.set(0L)
      val t0 = System.nanoTime()
      val a = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the listener bus drain the final stages
      (a, secs, shufWrite.get, shufRecords.get)
    }

    val e = (nEdges match {
      case Some(m) => spark.range(m).select((col("id") % n).as("src"),
        ((col("id") * 2654435761L) % n).as("dst"))
      case None => Tables(spark, sfDir, "lineitem")
        .select((col("l_orderkey") % n).as("src"),
          ((col("l_partkey") * 7 + col("l_suppkey")) % n).as("dst"))
        .distinct()
    }).localCheckpoint()
    val ne = e.count()
    val vs = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    val nv = vs.count().toDouble
    val adj = e.groupBy("src").agg(collect_list("dst").as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"), typedLit(Seq.empty[Long])).as("adj"))
      .as[(Long, Seq[Long])]
      .map { case (v, a) => (v, ProbeV(1.0 / nv, a)) }
      .localCheckpoint() // input materialized outside the timed/counted loop

    // --- variant 1: co-partitioned Pregel engine (messages-only shuffle)
    var msgsSent = 0L
    val ((), pSecs, pBytes, pRecs) = measured {
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
      println(f"""{"metric":"pregel_probe_ranksum","engine":"pregel","rank_sum":$rankSum%.6f}""")
    }
    println(f"""{"metric":"pregel_shuffle_probe","engine":"pregel","value":$pSecs%.3f,""" +
      f""""unit":"sec","vertices":${nv.toLong},"edges":$ne,"supersteps":${iters + 1},""" +
      f""""msgs":$msgsSent,"shuffle_write_bytes":$pBytes,"shuffle_write_records":$pRecs,""" +
      f""""bytes_per_superstep":${pBytes / (iters + 1)}}""")

    // --- variant 2: declarative re-exchange loop — the edge relation is
    // joined (and therefore shuffled) against the moving rank state every
    // superstep; this is what the co-partitioned ownership model avoids
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val e2 = e.join(deg, "src").localCheckpoint()
    val zeros = vs.select(col("v"), lit(0.0).as("m")).localCheckpoint()
    val init = vs.select(col("v"), lit(1.0 / nv).as("rank")).localCheckpoint()
    val (rankSum2, rSecs, rBytes, rRecs) = measured {
      val out: DataFrame = Iterate(init, iters, checkpointEvery = 5) { (r, _) =>
        val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
          .select(col("ee.dst").as("v"), (col("rr.rank") / col("ee.outdeg")).as("m"))
        contrib.unionAll(zeros)
          .groupBy("v")
          .agg((lit(0.15 / nv) + lit(0.85) * sum("m")).as("rank"))
      }
      out.agg(sum("rank")).head.getDouble(0)
    }
    println(f"""{"metric":"pregel_shuffle_probe","engine":"reexchange","value":$rSecs%.3f,""" +
      f""""unit":"sec","vertices":${nv.toLong},"edges":$ne,"supersteps":$iters,""" +
      f""""rank_sum":$rankSum2%.6f,"shuffle_write_bytes":$rBytes,""" +
      f""""shuffle_write_records":$rRecs,"bytes_per_superstep":${rBytes / math.max(iters, 1)}}""")
    spark.stop()
  }
}
