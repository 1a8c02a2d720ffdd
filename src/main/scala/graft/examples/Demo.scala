package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.JoinSpec
import graft.operators.JoinSpec.{Inner, Override, Tbl}
import graft.plans.Pregel
import graft.plans.Pregel.ComputeResult
import org.apache.spark.sql.functions._

/** End-to-end usage sample of the engine's three API layers: declared
  * relational queries, the composite-join DSL, and the typed Pregel engine.
  * Run: sbt "runMain graft.examples.Demo [sfDir]"
  */
object Demo {
  final case class RankV(rank: Double, out: Seq[Long])

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get()
    import spark.implicits._

    // L1: relational — revenue per nation (composite 4-way join + agg)
    val revenue = graft.SparkEntry.queries("q_join_3way")(spark, sfDir)
    println(s"[demo] revenue rows: ${revenue.count()}")
    revenue.show(5, truncate = false)

    // composite-join DSL: override(tbl(customer segments), tbl(order priorities))
    val base = Tables(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val pref = Tables(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(max("o_orderpriority").as("prio"))
    val overridden = JoinSpec.compose(Override(Seq(
      Tbl(base, "c_custkey", "c_mktsegment"), Tbl(pref, "o_custkey", "prio"))))
    println(s"[demo] override-join rows: ${overridden.count()}")

    // L2: typed Pregel — PageRank on a small derived graph; adjacency is
    // built distributively (groupBy collect_list) and lives in vertex state
    // like Hama's Vertex edge list — nothing graph-sized touches the driver
    val e = Tables(spark, sfDir, "orders")
      .select((col("o_orderkey") % 50).as("src"), (col("o_custkey") % 50).as("dst"))
      .distinct()
    val adj = e.groupBy("src").agg(collect_list("dst").as("out"))
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst"))).distinct()
    val n = nodes.count().toDouble
    val verts = nodes.join(adj, nodes("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("out"), array().cast("array<bigint>")).as("out"))
      .as[(Long, Seq[Long])]
      .map { case (v, out) => (v, RankV(1.0 / n, out)) }
    val ranks = Pregel.run[RankV, Double, Unit](spark, verts, maxIter = 10)(
      (_, v, msgs, step, _) => {
        val r = if (step == 0) v.rank else 0.15 / n + 0.85 * msgs.sum
        ComputeResult(RankV(r, v.out),
          messages = if (v.out.nonEmpty) v.out.map(d => (d, r / v.out.size)) else Nil)
      })
    val top = ranks.map { case (id, v) => (id, v.rank) }.orderBy(desc("_2")).take(3)
    println(s"[demo] top-3 pagerank: ${top.mkString(", ")}")
    spark.stop()
  }
}
