package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.RangedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-posture check for the huge-single-group ordered window (VERDICT
  * r5 item 1): a Gini-style Σ i·x over ONE group of ~5.4M rows (sf0.1
  * lineitem × 9 replicas), computed two ways:
  *
  *   - `window`: ROW_NUMBER over a single-partition window — the plan
  *     `q_agg_gini` used to declare, which serializes the whole group
  *     through one task (WindowExec warns; at 100 TB it simply dies);
  *   - `sharded`: RangedRank.withRank — range-sharded rank + O(shards)
  *     offsets; every task holds ~rows/shards.
  *
  * Both must produce the identical aggregate; the probe prints both
  * times and the speedup.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.examples.RankScale [reps]"
  */
object RankScale {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(9)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    // one giant group: every lineitem row replicated `reps` times with a
    // unique (l_orderkey, l_linenumber, rep) tiebreak and a perturbed
    // price so ranks are data-dependent
    val base = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select(lit("all").as("g"),
        (col("l_extendedprice") + col("rep") * 0.01).as("x"),
        col("l_orderkey"), col("l_linenumber"), col("rep"))
      .localCheckpoint() // materialize inputs before timing either plan
    val nRows = base.count()

    def giniAgg(ranked: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = ranked.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("i") * col("x")).as("sixi"))
        .select(col("n"),
          (lit(2.0) * col("sixi") / (col("n") * col("sx")) -
            (col("n") + lit(1.0)) / col("n")).as("gini"))
        .head()
      (r.getLong(0), r.getDouble(1))
    }

    val orderCols = Seq("x", "l_orderkey", "l_linenumber", "rep")

    val t1 = System.nanoTime()
    val (nS, giniS) = giniAgg(RangedRank.withRank(base, Seq("g"), orderCols, "i"))
    val shardedSec = (System.nanoTime() - t1) / 1e9

    val t0 = System.nanoTime()
    val w = Window.partitionBy("g").orderBy(orderCols.map(col): _*)
    val (nW, giniW) = giniAgg(base.withColumn("i", row_number().over(w).cast("long")))
    val windowSec = (System.nanoTime() - t0) / 1e9

    require(nS == nW && nS == nRows, s"row counts diverged: $nS vs $nW vs $nRows")
    require(math.abs(giniS - giniW) < 1e-9, s"gini diverged: $giniS vs $giniW")
    println(f"""{"metric":"ranked_gini_scale","rows":$nRows,"gini":$giniS%.6f,""" +
      f""""window_single_task_sec":$windowSec%.3f,"sharded_sec":$shardedSec%.3f,""" +
      f""""speedup":${windowSec / shardedSec}%.2f}""")
  }
}
