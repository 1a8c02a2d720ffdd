package graft

import graft.operators.RangedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: for ANY grouped dataset and shard count, the
  * range-sharded running totals equal the single-partition window.
  * Plain scalacheck Gens from a fixed seed (no scalatestplus bridge in
  * the offline cache — the VecDotPropertySpec pattern). */
class RangedRankPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val caseGen: Gen[(List[(Int, Long)], Int)] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, 2)
      x <- Gen.choose(-50L, 50L)
    } yield (g, x))
    shards <- Gen.choose(1, 9)
  } yield (rows, shards)

  test("sharded running sum == window running sum for random data and shards") {
    var seed = Seed(20260814L)
    for (i <- 1 to 8) {
      val (rows, shards) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = rows.zipWithIndex
        .map { case ((g, x), k) => (g, k.toLong, x) }.toDF("g", "k", "x")
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = df.withColumn("s", sum("x").over(w))
        .select("g", "k", "s").orderBy("g", "k").collect().toSeq
      val sharded = RangedRank.withRunningTotals(df, Seq("g"), Seq("k"),
          Seq("x" -> "s"), Some(shards))
        .select("g", "k", "s").orderBy("g", "k").collect().toSeq
      assert(sharded === naive, s"case $i diverged at $shards shards, ${rows.length} rows")
    }
  }

  test("sharded double running sum tracks the window within 1e-9 relative error") {
    // fractional totals associate additions differently across shards
    // (per-shard partials + prefix offsets), so equality is ulp-level,
    // not bitwise — this pins the documented tolerance with a
    // boundary-heavy generator (values near round(., 4) edges, the
    // q_events_cusum shape; ADVICE r6)
    var seed = Seed(20260814L)
    val dblGen: Gen[(List[(Int, Double)], Int)] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 2)
        base <- Gen.choose(-50000L, 50000L) // x.xxx5 boundary mass
        half <- Gen.oneOf(0L, 5L)
      } yield (g, (base * 10 + half) / 10000.0))
      shards <- Gen.choose(1, 9)
    } yield (rows, shards)
    for (i <- 1 to 8) {
      val (rows, shards) = dblGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = rows.zipWithIndex
        .map { case ((g, x), k) => (g, k.toLong, x) }.toDF("g", "k", "x")
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = df.withColumn("s", sum("x").over(w))
        .select("g", "k", "s").orderBy("g", "k").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      val sharded = RangedRank.withRunningTotals(df, Seq("g"), Seq("k"),
          Seq("x" -> "s"), Some(shards))
        .select("g", "k", "s").orderBy("g", "k").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      assert(naive.length === sharded.length)
      naive.zip(sharded).foreach { case ((g1, k1, s1), (g2, k2, s2)) =>
        assert(g1 === g2 && k1 === k2)
        val tol = 1e-9 * math.max(1.0, math.abs(s1))
        assert(math.abs(s1 - s2) <= tol,
          s"case $i: group $g1 row $k1: $s1 vs $s2 beyond $tol")
      }
    }
  }
}
