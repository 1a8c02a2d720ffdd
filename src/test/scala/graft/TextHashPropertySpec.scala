package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over the native text-hash expressions (same style as
  * VecDotPropertySpec: plain scalacheck Gens from fixed seeds, evaluated
  * through the real expression path on a local DataFrame). These pin the
  * ALGEBRA the dedup pipeline relies on, which the fixture specs and the
  * per-query oracles only sample:
  *
  *  - minhash is an elementwise MIN over shingle hashes, so growing a
  *    document can only lower (or keep) each signature slot — the
  *    monotonicity that makes signatures comparable across re-crawls;
  *  - signatures are prefix-stable in numHashes: a production 64-hash
  *    config agrees with the declared 8-hash config on the shared prefix,
  *    so re-hashing at a new width never invalidates stored bands;
  *  - simhash votes are a sum over tokens — token ORDER cannot change
  *    the signature (bag-of-words semantics, the documented contract).
  */
class TextHashPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private val tokensGen: Gen[List[String]] =
    Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7L + i)))

  private def minhashOf(tokenLists: Seq[List[String]], numHashes: Int): Seq[Seq[String]] =
    tokenLists.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "toks")
      .select(col("i"), TextHash.minhashSig(col("toks"), 3, numHashes).as("sig"))
      .orderBy("i").as[(Int, Seq[String])].collect().toSeq.map(_._2)

  private def simhashOf(tokenLists: Seq[List[String]]): Seq[String] =
    tokenLists.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "toks")
      .select(col("i"), TextHash.simhashSig(col("toks")).as("sig"))
      .orderBy("i").as[(Int, String)].collect().toSeq.map(_._2)

  test("minhash monotonicity: extending a document never raises a signature slot") {
    val base = samples(tokensGen, 15)
    val ext = samples(tokensGen, 15)
    val sigs = minhashOf(base ++ base.zip(ext).map { case (b, e) => b ::: e }, 8)
    val (origSigs, extSigs) = sigs.splitAt(15)
    origSigs.zip(extSigs).foreach { case (o, x) =>
      // toHex8 is fixed-width hex, so string order == unsigned numeric order
      o.zip(x).foreach { case (ov, xv) => assert(xv <= ov, s"slot rose: $ov -> $xv") }
    }
  }

  test("minhash prefix stability: 16-hash signature starts with the 8-hash one") {
    val ts = samples(tokensGen, 15)
    val sig8 = minhashOf(ts, 8)
    val sig16 = minhashOf(ts, 16)
    sig8.zip(sig16).foreach { case (s8, s16) =>
      assert(s16.length == 16 && s8.length == 8)
      assert(s16.take(8) == s8)
    }
  }

  test("simhash is token-order invariant and 64 bits of {0,1}") {
    val ts = samples(tokensGen, 15)
    val shuffled = ts.zipWithIndex.map { case (t, i) =>
      new scala.util.Random(99L + i).shuffle(t)
    }
    val a = simhashOf(ts)
    val b = simhashOf(shuffled)
    a.zip(b).foreach { case (x, y) => assert(x == y, "order changed simhash") }
    a.foreach { s =>
      assert(s.length == 64)
      assert(s.forall(c => c == '0' || c == '1'))
    }
  }

  test("BPE pre-tokenizer pattern tiles every string; Spark expression agrees with JVM regex") {
    // the pattern's alternatives cover every character class, so the
    // matches must CONCATENATE BACK to the input — the invariant that
    // makes the token count a partition of the text, with nothing
    // silently dropped between tokens
    val charGen = Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++
      Seq(' ', '\t', '\n', '\'', '.', ',', '!', '-', '(', ')', 'A', 'Z'))
    val strGen = Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val p = java.util.regex.Pattern.compile(graft.operators.TextExprs.bpePattern)
    val strs = samples(strGen, 60)
    val jvmCounts = strs.map { s =>
      val m = p.matcher(s.toLowerCase)
      val sb = new StringBuilder
      var n = 0
      while (m.find()) { sb.append(m.group()); n += 1 }
      assert(sb.toString === s.toLowerCase, s"pattern did not tile: '${s.toLowerCase}'")
      n
    }
    val sparkCounts = strs.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "text")
      .select(col("i"), size(graft.operators.TextExprs.bpeToks(col("text"))).as("n"))
      .orderBy("i").as[(Int, Int)].collect().toSeq.map(_._2)
    assert(sparkCounts === jvmCounts)
  }

  test("hamming_bits equals the SQL substring fold on random bit strings") {
    val bitsGen: Gen[(String, String)] = for {
      n <- Gen.choose(1, 80)
      a <- Gen.listOfN(n, Gen.oneOf('0', '1'))
      b <- Gen.listOfN(n, Gen.oneOf('0', '1'))
    } yield (a.mkString, b.mkString)
    val pairs = samples(bitsGen, 40)
    val got = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), TextHash.hammingBits(col("a"), col("b")).as("h"))
      .orderBy("i").as[(Int, Long)].collect().toSeq.map(_._2)
    val want = pairs.map { case (a, b) =>
      a.zip(b).count { case (x, y) => x != y }.toLong }
    assert(got === want)
    // ragged inputs count the length delta, never under-count
    val ragged = Seq(("0101", "01"), ("1", "111"))
      .zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), TextHash.hammingBits(col("a"), col("b")).as("h"))
      .orderBy("i").as[(Int, Long)].collect().toSeq.map(_._2)
    assert(ragged === Seq(2L, 2L))
  }
}
