package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs at sf0.001 and yields rows (the driver's
  * t1 gate); the full DuckDB hash-compare is tools/check.py + graft.Verify. */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // candidate-pair mining may legitimately find nothing at tiny scale
  // (q_dedup_jaccard scores those same LSH pairs since r3)
  private val mayBeEmpty = Set("q_dedup_minhash_pairs", "q_dedup_jaccard", "q_join_anti")

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      val n = fn(spark, TestSpark.sf0).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
