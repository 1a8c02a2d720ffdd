package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Blocking-based dedup operators: PPJoin prefix filtering must be
  * COMPLETE (exactly the brute-force result, no false negatives), SNM
  * window pairs must be sound w.r.t. the same brute-force truth. */
class DedupBlockingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  /** brute-force exact 3-gram Jaccard pairs at threshold num/den */
  private def brute(num: Int, den: Int) = {
    val g = Tables(spark, TestSpark.sf0, "documents")
      .select(col("doc_id"),
        explode(functions.TextHash.distinctNGrams(
          operators.TextExprs.toks(col("text")), 3)).as("gram"))
    val n = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("i") * den >= (col("na") + col("nb") - col("i")) * num)
      .select("doc_a", "doc_b")
  }

  test("ppjoin equals the brute-force similarity join (completeness + soundness)") {
    val got = q("q_dedup_ppjoin").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute(3, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("ppjoin pairs are canonical and meet the threshold") {
    val rows = q("q_dedup_ppjoin").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.6 - 1e-9)
    }
  }

  test("snm pairs are sound: every emitted pair is a true >=0.5 pair") {
    val got = q("q_dedup_snm").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = brute(1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth))
    assert(got.nonEmpty)
  }

  test("lsh recall row is internally consistent") {
    val r = SparkEntry.queries("q_dedup_lsh_recall")(spark, TestSpark.sf0).head
    val (t, c, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(h <= math.min(t, c))
    if (t > 0) assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    if (c > 0) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("snm finds the known token-level duplicate families ppjoin finds") {
    // the staged near-dups sort adjacently on their normalized prefix, so
    // single-pass SNM must recover the ppjoin (>=0.6) pairs on this corpus
    val snm = q("q_dedup_snm").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pp = q("q_dedup_ppjoin").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pp.subsetOf(snm))
  }
}
