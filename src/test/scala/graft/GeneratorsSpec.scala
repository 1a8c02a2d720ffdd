package graft

import graft.operators.Generators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The invariant-oracle style of the reference's generator/Monte-Carlo
  * tests (`PiEstimatorTest`, graph-gen checks in `FastGraphGen`): structure
  * and tolerance, plus partitioning-independence of the hashed randomness. */
class GeneratorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graph generator: ids in range, no self loops, deterministic across repartition") {
    val g = Generators.graphGen(spark).cache()
    val stats = g.agg(min("src"), max("src"), min("dst"), max("dst"),
      sum((col("src") === col("dst")).cast("long")), count(lit(1))).collect()(0)
    assert(stats.getLong(0) >= 0 && stats.getLong(1) < 1000)
    assert(stats.getLong(2) >= 0 && stats.getLong(3) < 1000)
    assert(stats.getLong(4) === 0, "no self loops")
    assert(stats.getLong(5) > 3000, "most of the 5000 draws survive dedup+self-loop filter")
    // same edge set no matter how the input range is partitioned
    val again = Generators.graphGen(spark).repartition(7)
    assert(g.except(again).isEmpty && again.except(g).isEmpty)
  }

  test("symmetric matrix generator produces a symmetric sparse matrix") {
    val m = Generators.symMatrixGen(spark).cache()
    val t = m.select(col("j").as("i"), col("i").as("j"), col("v"))
    assert(m.except(t).isEmpty && t.except(m).isEmpty, "M == M^T")
    assert(m.filter(col("i") === col("j")).count() > 0, "has diagonal entries")
  }

  test("pi estimate lands within 1% of pi") {
    val pi = Generators.piEstimate(spark).collect()(0).getDouble(0)
    assert(math.abs(pi - math.Pi) / math.Pi < 0.01, s"pi_est $pi")
  }
}
