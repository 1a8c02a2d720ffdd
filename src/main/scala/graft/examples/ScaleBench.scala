package graft.examples

import graft.{GraftSession, Tables}
import graft.plans.Iterate
import org.apache.spark.sql.functions._

/** Scale-posture check: the SAME PageRank loop shape as `q_graph_pagerank`
  * (one join + one shuffle agg per superstep, zero-contribution rows folded
  * into the aggregate, linear plan growth, checkpoint cadence) on a graph
  * three orders of magnitude larger than the declared query's 200 nodes —
  * derived from lineitem so sf0.1 yields ~600 k edges over ~200 k vertices.
  * If the per-superstep time scales with edges/cores rather than blowing up
  * on plan depth or driver state, the 100 TB posture holds.
  *
  * Run: sbt "runMain graft.examples.ScaleBench [nodeMod] [iters]"
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    val e = Tables(spark, sfDir, "lineitem")
      .select((col("l_orderkey") % n).as("src"), ((col("l_partkey") * 7 + col("l_suppkey")) % n).as("dst"))
      .distinct()
    val vs = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct().cache()
    val nv = vs.count().toDouble
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val e2 = e.join(deg, "src").cache()
    val edgeCount = e2.count() // materialize before timing the loop
    val zeros = vs.select(col("v"), lit(0.0).as("m")).cache()

    val t0 = System.nanoTime()
    val init = vs.select(col("v"), lit(1.0 / nv).as("rank"))
    val out = Iterate(init, iters, checkpointEvery = 4) { (r, _) =>
      val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
        .select(col("ee.dst").as("v"), (col("rr.rank") / col("ee.outdeg")).as("m"))
      contrib.unionAll(zeros)
        .groupBy("v")
        .agg((lit(0.15 / nv) + lit(0.85) * sum("m")).as("rank"))
    }
    val checksum = out.agg(sum("rank")).collect()(0).getDouble(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"pagerank_scale","value":$secs%.3f,"unit":"sec","vertices":${nv.toLong},""" +
      f""""edges":$edgeCount,"iters":$iters,"rank_sum":$checksum%.6f,""" +
      f""""edges_per_sec_per_iter":${edgeCount * iters / secs}%.0f}""")
    spark.stop()
  }
}
