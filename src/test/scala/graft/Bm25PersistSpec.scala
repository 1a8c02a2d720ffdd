package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan + semantics guarantees for the persisted BM25 inverted index:
  * the postings scan must be dynamically pruned to the query terms'
  * buckets, and the on-disk search must rank identically to the
  * in-memory q_text_bm25 it persists. */
class Bm25PersistSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("persisted BM25 search matches the in-memory ranking") {
    operators.TextAnalysis.bm25PersistBuild(spark, TestSpark.sf0)
    val onDisk = operators.TextAnalysis.bm25PersistSearch(spark, TestSpark.sf0, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val inMem = SparkEntry.queries("q_text_bm25")(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(onDisk.nonEmpty)
    assert(onDisk.toSeq == inMem.toSeq,
      "on-disk BM25 ranking diverged from the in-memory one")
  }

  test("postings scan is dynamically pruned to the query-term buckets") {
    operators.TextAnalysis.bm25PersistBuild(spark, TestSpark.sf0)
    val plan = operators.TextAnalysis.bm25PersistSearch(spark, TestSpark.sf0, 5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression on the postings scan, got:\n${plan.take(2000)}")
  }
}
