package graft

import graft.operators.RangedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The range-sharded rank/running-sum must be value-identical to the
  * single-partition window it replaces, for any shard count — including
  * shard boundaries that split groups. */
class RangedRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def orders = Tables(spark, TestSpark.sf0, "orders")

  test("sharded rank equals row_number for grouped data at several shard counts") {
    val naive = orders.withColumn("i",
        row_number().over(Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))))
      .select(col("o_orderkey"), col("i"))
    for (shards <- Seq(1, 3, 7, 32)) {
      val sharded = RangedRank.withRank(orders, Seq("o_orderpriority"),
          Seq("o_totalprice", "o_orderkey"), "i", Some(shards))
        .select(col("o_orderkey"), col("i"))
      assert(sharded.join(naive, Seq("o_orderkey", "i")).count() === naive.count(),
        s"rank mismatch at $shards shards")
    }
  }

  test("sharded running totals equal the global ordered window (no group cols)") {
    val cnt = Tables(spark, TestSpark.sf0, "events")
      .groupBy("value").agg(count(lit(1)).cast("long").as("c"))
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = cnt.withColumn("f", sum("c").over(w)).select("value", "f")
    val sharded = RangedRank.withRunningTotals(cnt, Seq.empty, Seq("value"),
        Seq("c" -> "f"), Some(8)).select("value", "f")
    assert(sharded.join(naive, Seq("value", "f")).count() === naive.count())
  }

  test("multiple totals in one pass match independent windows") {
    val df = Seq((1, "a", 2L, 10L), (1, "b", 3L, 20L), (1, "c", 5L, 5L),
      (2, "a", 1L, 1L), (2, "b", 4L, 2L)).toDF("g", "k", "x", "y")
    val w = Window.partitionBy("g").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w)).select("g", "k", "sx", "sy")
    val sharded = RangedRank.withRunningTotals(df, Seq("g"), Seq("k"),
        Seq("x" -> "sx", "y" -> "sy"), Some(4)).select("g", "k", "sx", "sy")
    assert(sharded.orderBy("g", "k").collect().toSeq ===
      naive.orderBy("g", "k").collect().toSeq)
  }

  test("the sharded relation is materialized once: local pass and offsets agree across re-runs") {
    // spark_partition_id is nondeterministic across independent range
    // exchanges — the operator localCheckpoints the sharded relation so
    // the local pass and the subtotal branch read the SAME blocks. If
    // they didn't, repeated runs would disagree with the naive window
    // whenever the two samples picked different bounds.
    val naive = orders.withColumn("i",
        row_number().over(Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))))
      .select(col("o_orderkey"), col("i"))
    for (run <- 1 to 3) {
      val sharded = RangedRank.withRank(orders, Seq("o_orderpriority"),
          Seq("o_totalprice", "o_orderkey"), "i", Some(8))
        .select(col("o_orderkey"), col("i"))
      assert(sharded.join(naive, Seq("o_orderkey", "i")).count() === naive.count(),
        s"run $run diverged from the window rank")
    }
  }

  test("high-cardinality groups take the non-broadcast offsets path and stay exact") {
    // one group per row forces the offsets relation past the (tiny) cap,
    // so the guard must fall back to a shuffle join — and the result must
    // still equal the per-group window exactly
    import spark.implicits._
    val df = (0L until 500L).map(i => (i % 250, i, i * 3 + 1)).toDF("g", "k", "x")
    val naive = df.withColumn("s",
        sum("x").over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("g", "k", "s").orderBy("g", "k").collect().toSeq
    val sharded = RangedRank.withRunningTotals(df, Seq("g"), Seq("k"),
        Seq("x" -> "s"), Some(7), maxBroadcastOffsets = 10L)
      .select("g", "k", "s").orderBy("g", "k").collect().toSeq
    assert(sharded === naive)
  }

  test("no single task ever holds a whole group: max window partition is shard-bounded") {
    // with 8 shards over ~15k orders, each (group, shard) slice must be
    // well under a whole priority class (~3k rows)
    val sharded = orders.repartitionByRange(8,
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("sh", spark_partition_id())
      .groupBy("o_orderpriority", "sh").agg(count(lit(1)).as("c"))
    val maxSlice = sharded.agg(max("c")).head.getLong(0)
    val groupSize = orders.groupBy("o_orderpriority").agg(count(lit(1)).as("c"))
      .agg(max("c")).head.getLong(0)
    assert(maxSlice < groupSize, s"slices ($maxSlice) not smaller than groups ($groupSize)")
  }
}
