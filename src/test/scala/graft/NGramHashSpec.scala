package graft

import graft.functions.{TextHash, TextHashUtil}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The byte-level 128-bit n-gram hash kernel (optimization r15, VERDICT
  * r14 #3): `ngram_hashes(tokens, w)` must emit, in first-occurrence
  * order, one (h1, h2) pair per DISTINCT space-joined w-gram, where
  * h1/h2 are xxhash64 of the gram's exact UTF-8 bytes at seeds 0 and 1
  * — verifiable against Spark's own XxHash64 expression applied to the
  * materialized gram strings, which is exactly what the kernel exists
  * to avoid materializing.
  */
class NGramHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def xxh(s: String, seed: Long): Long = {
    val b = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  private def reference(tokens: Seq[String], w: Int): Seq[(Long, Long)] = {
    if (tokens.length < w) return Seq.empty
    val grams = (0 to tokens.length - w)
      .map(p => tokens.slice(p, p + w).mkString(" ")).distinct
    grams.map(g => (xxh(g, 0L), xxh(g, 1L)))
  }

  test("hash pairs equal xxhash64(gram string, seed 0/1) of the distinct grams in order") {
    val cases = Seq(
      Seq("a", "b", "c", "a", "b", "c", "d"),
      Seq("the", "quick", "brown", "fox", "the", "quick", "brown"),
      Seq("solo"),
      Seq.empty[String],
      Seq("α", "β", "γ", "δ"), // multi-byte UTF-8
      Seq("x", "x", "x", "x", "x"), // all-identical: one distinct gram
      Seq("a b", "c", "d")) // a token containing the join char itself
    for (tk <- cases; w <- Seq(2, 3)) {
      import spark.implicits._
      val got = Seq(Tuple1(tk)).toDF("tk")
        .select(explode(TextHash.ngramHashes(col("tk"), w)).as("g"))
        .select(col("g.h1"), col("g.h2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === reference(tk, w), s"diverged on $tk w=$w")
    }
  }

  test("distinctness matches distinct_ngrams on real documents (no drops, no dups)") {
    val docs = Tables(spark, TestSpark.sf0, "documents").limit(200)
      .select(col("doc_id"), operators.TextExprs.toks(col("text")).as("tk"))
    val viaStrings = docs
      .select(size(TextHash.distinctNGrams(col("tk"), 3)).as("n")).collect()
    val viaHashes = docs
      .select(size(TextHash.ngramHashes(col("tk"), 3)).as("n")).collect()
    assert(viaHashes.map(_.get(0).toString).toSeq ===
      viaStrings.map(_.get(0).toString).toSeq)
  }

  test("null tokens are skipped like every other kernel in this family") {
    import spark.implicits._
    val got = Seq(Tuple1(Seq[String]("a", null, "b", "c"))).toDF("tk")
      .select(explode(TextHash.ngramHashes(col("tk"), 2)).as("g"))
      .select(col("g.h1")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq((xxh("a b", 0L)), xxh("b c", 0L)))
  }

  test("hash_pair_intersect_size equals size(array_intersect) on real doc gram arrays") {
    // the verify kernel (optimization r15: array_intersect has no fast
    // path for struct elements — O(n·m) interpreted per pair): on
    // duplicate-free inputs (which the gram kernel guarantees per doc)
    // the primitive open-addressing count must equal array_intersect's
    // distinct-common count, on every pairing, including disjoint docs,
    // self-pairs, and the empty-array short-doc case
    val docs = Tables(spark, TestSpark.sf0, "documents").limit(60)
      .select(col("doc_id"), TextHash.ngramHashes(
        operators.TextExprs.toks(col("text")), 3).as("gs"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(
        TextHash.hashPairIntersectSize(col("a.gs"), col("b.gs")).as("kernel"),
        size(array_intersect(col("a.gs"), col("b.gs"))).cast("long").as("builtin"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("hash_pair_intersect_size handcrafted: empty, disjoint, identical, partial") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("c", "d", "e", "f")), // 3-grams: partial
      (Seq("a", "b", "c"), Seq("a", "b", "c")),           // identical
      (Seq("a", "b", "c"), Seq("x", "y", "z")),           // disjoint
      (Seq("a"), Seq("a", "b", "c")))                      // empty side (< w)
      .toDF("ta", "tb")
      .select(TextHash.ngramHashes(col("ta"), 3).as("ga"),
        TextHash.ngramHashes(col("tb"), 3).as("gb"))
    val got = df.select(
        TextHash.hashPairIntersectSize(col("ga"), col("gb")).as("k"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("bi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall { case (k, bi) => k == bi })
    // {"a b c","b c d"} ∩ {"c d e","d e f"} = ∅; identical docs share
    // their one gram; disjoint and sub-width docs share nothing
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 0L, 0L))
  }

  test("util rejects nothing and allocates nothing visible: direct calls agree with codegen path") {
    // the codegen string calls the same static method; spot-check the
    // util directly so a future codegen change cannot silently diverge
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("p"),
        org.apache.spark.unsafe.types.UTF8String.fromString("q"),
        org.apache.spark.unsafe.types.UTF8String.fromString("p"),
        org.apache.spark.unsafe.types.UTF8String.fromString("q")))
    val out = TextHashUtil.distinctNGramHashes(arr, 2)
    assert(out.numElements() === 2) // "p q", "q p" — the repeat dedups
    val r0 = out.getStruct(0, 2)
    assert(r0.getLong(0) === xxh("p q", 0L) && r0.getLong(1) === xxh("p q", 1L))
  }
}
