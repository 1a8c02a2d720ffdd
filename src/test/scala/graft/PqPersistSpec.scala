package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan + semantics guarantees for the persisted PQ index (VERDICT r7
  * item 3): the search's codes scan must be confined to the probed
  * cells' partition directories via DYNAMIC partition pruning (the
  * probed-cell set is data-derived, so static pruning cannot express
  * it), and the on-disk search must rank identically to the in-memory
  * q_sim_ivfpq composition it persists.
  */
class PqPersistSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("persisted PQ search matches in-memory q_sim_ivfpq ranking") {
    operators.Similarity.pqPersistBuild(spark, TestSpark.sf0)
    val onDisk = operators.Similarity.pqPersistSearch(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val inMem = SparkEntry.queries("q_sim_ivfpq")(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(onDisk.nonEmpty, "persisted search returned no rows")
    assert(onDisk.toSeq == inMem.toSeq,
      "on-disk PQ ranking diverged from the in-memory IVFPQ ranking")
  }

  test("incremental append: a new vector is searchable without rebuild") {
    import org.apache.spark.sql.functions._
    operators.Similarity.pqPersistBuild(spark, TestSpark.sf0)
    // append a copy of query 0's vector under a fresh id: its codes are
    // per-subspace argmaxes of q0's LUT, so its ADC sum is the maximum
    // any candidate can reach — it must surface in q0's top-5
    val q0copy = Tables(spark, TestSpark.sf0, "embeddings")
      .filter(col("vec_id") === 0)
      .select(lit(999000L).as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    operators.Similarity.pqPersistAppend(spark, TestSpark.sf0, q0copy)
    val top = operators.Similarity.pqPersistSearch(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.exists { case (q, _, c) => q == 0L && c == 999000L },
      "the appended perfect-match vector must rank in query 0's top-5")
    // and the appended row's cell partition is the only place it lives:
    // a fresh search still returns exactly 5 rows per query
    assert(top.count(_._1 == 0L) == 5)
  }

  test("codes scan is dynamically pruned to the probed cells") {
    operators.Similarity.pqPersistBuild(spark, TestSpark.sf0)
    val plan = operators.Similarity.pqPersistSearch(spark, TestSpark.sf0)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression on the codes scan, got:\n$plan")
  }
}
