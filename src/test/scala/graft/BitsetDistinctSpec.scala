package graft

import graft.functions.BitsetDistinct
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** BitsetDistinct vs Set-based exact counting over randomized ids and
  * partitionings (drives reduce + merge through real Spark partials).
  * Plain scalacheck Gens from fixed seeds — the TextHashPropertySpec
  * style, since scalatestplus is not on the classpath. */
class BitsetDistinctSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val gen = for {
    n <- Gen.choose(1, 400)
    ids <- Gen.listOfN(n, Gen.choose(0L, 1023L))
    parts <- Gen.choose(1, 7)
  } yield (ids, parts)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(11L + i)))

  test("bitmap distinct equals exact distinct across random id sets and partition counts") {
    samples(gen, 12).foreach { case (ids, parts) =>
      val got = ids.toDF("id").repartition(parts)
        .select(BitsetDistinct.bitmapDistinct(1023L)($"id").as("n"))
        .head.getLong(0)
      assert(got === ids.distinct.length.toLong, s"ids=$ids parts=$parts")
    }
  }

  test("out-of-domain ids are ignored, not counted or crashing") {
    val ids = Seq(0L, 5L, 1023L, 1024L, -1L, 999999L, 5L)
    val got = ids.toDF("id")
      .select(BitsetDistinct.bitmapDistinct(1023L)($"id").as("n"))
      .head.getLong(0)
    assert(got === 3L) // 0, 5, 1023
  }
}
