package graft

import graft.functions.VecOps.vecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native vector surface (SURVEY.md §5 plan:
  * scalacheck over the vector-algebra surface). Algebraic laws evaluated
  * through the real codegen path on a local DataFrame; plain scalacheck
  * Gens drawn from a fixed seed (no scalatestplus bridge in the offline
  * cache). */
class VecDotPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[List[Double]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(-100.0, 100.0)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def dots(pairs: Seq[(List[Double], List[Double])]): Seq[Double] =
    pairs.toDF("a", "b").select(vecDot(col("a"), col("b"))).as[Double].collect().toSeq

  test("commutativity: dot(a,b) == dot(b,a)") {
    val as = samples(vecGen, 20); val bs = samples(vecGen, 20).map(_.take(12))
    val fwd = dots(as.zip(bs)); val rev = dots(bs.zip(as))
    fwd.zip(rev).foreach { case (ab, ba) => assert(math.abs(ab - ba) < 1e-9) }
  }

  test("non-negativity and zero identity: dot(a,a) >= 0, dot(a,0) == 0") {
    val as = samples(vecGen, 20)
    val aa = dots(as.map(a => (a, a)))
    val az = dots(as.map(a => (a, List.fill(a.length)(0.0))))
    aa.foreach(v => assert(v >= 0.0))
    az.foreach(v => assert(v === 0.0))
  }

  test("linearity in a scalar: dot(k*a, b) == k * dot(a, b)") {
    val as = samples(vecGen, 20); val bs = samples(vecGen, 20)
    val ks = samples(Gen.choose(-5.0, 5.0), 20)
    val scaled = dots(as.lazyZip(bs).lazyZip(ks).map((a, b, k) => (a.map(_ * k), b)))
    val plain = dots(as.zip(bs))
    scaled.lazyZip(plain).lazyZip(ks).foreach { (kab, ab, k) =>
      assert(math.abs(kab - k * ab) <= 1e-6 * math.max(1.0, math.abs(ab)))
    }
  }
}
