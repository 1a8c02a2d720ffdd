package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring span detection on a constructed corpus with KNOWN
  * duplicated runs: spans must start/end exactly at the shared run's
  * boundaries (maximality both ways), within-doc repeats must flag, and
  * unique docs must stay silent. */
class SubstringDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // unique filler tokens: uXdY never collides across docs
  private def uniq(d: Int, n: Int): Seq[String] =
    (1 to n).map(i => s"u${i}d$d")
  private val shared40 = (1 to 40).map(i => s"dup$i")

  test("shared run yields one maximal span per doc at exact boundaries") {
    val W = 16
    // doc 1: 10 unique + shared40 + 10 unique  -> span tokens 11..50
    // doc 2: 25 unique + shared40 + 5 unique   -> span tokens 26..65
    // doc 3: all unique                        -> no span
    val docsDf = Seq(
      (1L, (uniq(1, 10) ++ shared40 ++ uniq(1, 10).map(_ + "b")).mkString(" ")),
      (2L, (uniq(2, 25) ++ shared40 ++ uniq(2, 5).map(_ + "b")).mkString(" ")),
      (3L, uniq(3, 80).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(docsDf, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 11L, 50L, 40L), (2L, 26L, 65L, 40L)))
  }

  test("within-doc repeat flags both occurrences") {
    val W = 16
    val run = (1 to 20).map(i => s"r$i")
    val docsDf = Seq(
      (7L, (run ++ uniq(7, 30) ++ run).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(docsDf, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // occurrences at tokens 1..20 and 51..70, separated by 30 unique
    // tokens — two distinct maximal spans
    assert(got.toSeq === Seq((7L, 1L, 20L, 20L), (7L, 51L, 70L, 20L)))
  }

  test("runs shorter than W are invisible; runs of exactly W are caught") {
    val W = 16
    val run15 = (1 to 15).map(i => s"s$i")
    val run16 = (1 to 16).map(i => s"t$i")
    val docsDf = Seq(
      (1L, (run15 ++ uniq(1, 20) ++ run16).mkString(" ")),
      (2L, (uniq(2, 20) ++ run15 ++ uniq(2, 20).map(_ + "b") ++ run16).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(docsDf, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only the 16-token run is detectable at W=16
    assert(got.toSeq === Seq((1L, 36L, 51L, 16L), (2L, 56L, 71L, 16L)))
  }
}
