package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of q_dedup_bloom's pre-filter that the exact-output oracle
  * cannot see: the bloom must actually PRUNE (that is the entire point of
  * the pattern — a no-op bloom would silently degrade to the full join)
  * and must never produce a false negative (a true dup skipping verify
  * would corrupt the declared output, not just waste work).
  */
class BloomDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables(spark, TestSpark.sf0, "documents")
    .select(col("doc_id"), md5(col("text")).as("h"))
  private lazy val delta = docs.filter(col("doc_id") % 10 === 7)
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 7)

  private lazy val bloom =
    corpus.stat.bloomFilter("h", math.max(corpus.count(), 1L), 0.01)

  test("no false negatives: every true dup's hash is bloom-positive") {
    val dupHashes = delta.join(corpus.select("h"), Seq("h"), "left_semi")
      .select("h").distinct().as[String].collect()
    dupHashes.foreach(h => assert(bloom.mightContain(h), s"bloom missed true dup hash $h"))
  }

  test("bloom prunes the delta: candidates well under the delta size") {
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: String) => bc.value.mightContain(h))
    val nDelta = delta.count()
    val nCand = delta.filter(mightContain(col("h"))).count()
    val nTrueDups = delta.join(corpus.select("h"), Seq("h"), "left_semi").count()
    bc.unpersist()
    // candidates = true dups + false positives; at fpp=0.01 the FP count
    // is ~1% of unique delta rows, far below the delta itself
    assert(nCand >= nTrueDups, "candidates must cover every true dup")
    assert(nCand <= nTrueDups + math.max(1L, nDelta / 10),
      s"bloom barely pruned: $nCand candidates of $nDelta delta rows ($nTrueDups true dups)")
  }

  test("declared output equals the exact anti-join verdict") {
    val out = SparkEntry.queries("q_dedup_bloom")(spark, TestSpark.sf0)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    val expected = delta
      .join(corpus.select(col("h"), lit(true).as("seen")).distinct(), Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("seen"), lit(false)))
      .as[(Long, Boolean)].collect().toMap
    assert(out == expected)
  }
}
