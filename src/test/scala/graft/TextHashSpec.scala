package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native one-pass signature expressions must be bit-exact with the
  * portable declarative formulation (explode shingles → md5 → min/vote),
  * which is what the DuckDB oracle states longhand. */
class TextHashSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
    t => org.apache.spark.sql.functions.length(t) > 0)

  test("minhash_sig matches the explode+md5+min formulation") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs right now ok"),
      (3L, "a b c")
    ).toDF("doc_id", "text")

    val native = docs
      .select(col("doc_id"), TextHash.minhashSig(toks, 3).as("sig"))
      .as[(Long, Seq[String])].collect().toMap

    // declarative reference: word 3-grams, two md5s, 8 hex-slice families
    val sh = docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), org.apache.spark.sql.functions.size(toks) - 2),
        p => concat_ws(" ", slice(toks, p, lit(3))))).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("m1"), md5(concat(lit("x"), col("sh"))).as("m2"))
    val mins = (0 until 8).map { j =>
      val m = if (j < 4) col("m1") else col("m2")
      min(substring(m, (j % 4) * 8 + 1, 8)).as(s"h$j")
    }
    val expected = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .as[(Long, String, String, String, String, String, String, String, String)]
      .collect().map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)).toMap

    native shouldBe expected
  }

  test("minhash_sig is null below the shingle width; simhash_sig null on empty") {
    val docs = Seq((1L, "two words"), (2L, "???"), (3L, "one two three")).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"),
        TextHash.minhashSig(toks, 3).isNull.as("mh_null"),
        TextHash.simhashSig(toks).isNull.as("sh_null"))
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows(1L) shouldBe ((true, false)) // 2 tokens < width 3, but has tokens
    rows(2L) shouldBe ((true, true))  // no alnum tokens at all
    rows(3L) shouldBe ((false, false))
  }

  test("null tokens are skipped, not NPE'd (ADVICE r2)") {
    // same text, one as a clean token array, one with nulls interleaved
    val clean = array(lit("a"), lit("b"), lit("c"), lit("d"))
    val holey = array(lit(null).cast("string"), lit("a"), lit("b"),
      lit(null).cast("string"), lit("c"), lit("d"))
    val row = spark.range(1)
      .select(
        (TextHash.minhashSig(clean, 2) === TextHash.minhashSig(holey, 2)).as("mh"),
        (TextHash.simhashSig(clean) === TextHash.simhashSig(holey)).as("sh"),
        (TextHash.distinctNGrams(clean, 2) === TextHash.distinctNGrams(holey, 2)).as("ng"))
      .as[(Boolean, Boolean, Boolean)].head()
    row shouldBe ((true, true, true))
  }

  test("numHashes=64 extends the family: prefix-compatible with 8, k=2 digest checks out") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs right now ok")
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
        TextHash.minhashSig(toks, 3).as("s8"),
        TextHash.minhashSig(toks, 3, 64).as("s64"))
      .as[(Long, Seq[String], Seq[String])].collect()
    sigs.foreach { case (_, s8, s64) =>
      s64.length shouldBe 64
      s64.take(8) shouldBe s8 // families 0-7 are the two-digest config
    }
    // family 8 (= digest k=2, slice 0) against the declarative md5("xx"||sh)
    val expected = docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), org.apache.spark.sql.functions.size(toks) - 2),
        p => concat_ws(" ", slice(toks, p, lit(3))))).as("sh"))
      .groupBy("doc_id")
      .agg(min(substring(md5(concat(lit("xx"), col("sh"))), 1, 8)).as("h8"))
      .as[(Long, String)].collect().toMap
    sigs.foreach { case (id, _, s64) => s64(8) shouldBe expected(id) }
  }

  test("simhash_sig matches the per-bit majority vote formulation") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "entirely different words appear here")
    ).toDF("doc_id", "text")

    val native = docs
      .select(col("doc_id"), TextHash.simhashSig(toks).as("simhash"))
      .as[(Long, String)].collect().toMap

    val votes = (0 until 64).map { j =>
      val m = if (j < 32) col("m1") else col("m2")
      sum(when(substring(m, j % 32 + 1, 1) < "8", 1).otherwise(-1)).as(s"v$j")
    }
    val bits = (0 until 64).map(j => when(col(s"v$j") >= 0, "1").otherwise("0"))
    val expected = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("m1"), md5(concat(lit("x"), col("tok"))).as("m2"))
      .groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
      .as[(Long, String)].collect().toMap

    native shouldBe expected
    native(1L).length shouldBe 64
  }

  test("distinct_ngrams dedups within doc and keeps whole-text coverage") {
    val out = Seq((1L, "a b a b c"))
      .toDF("doc_id", "text")
      .select(TextHash.distinctNGrams(toks, 2).as("g"))
      .as[Seq[String]].head()
    out should contain theSameElementsAs Seq("a b", "b a", "b c")
    // sub-width doc → empty array, not null (explode then drops the doc)
    val empty = Seq((1L, "solo")).toDF("doc_id", "text")
      .select(TextHash.distinctNGrams(toks, 2).as("g")).as[Seq[String]].head()
    empty shouldBe Seq.empty
  }
}
