package graft

import graft.functions.VecCovAgg
import org.scalatest.funsuite.AnyFunSuite

/** VecCovAgg vs driver-side brute-force covariance, plus the short-row
  * prefix contract and the PCA query's eigenpair invariants. */
class VecCovSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[Seq[Double]], dim: Int): Array[Double] = {
    val n = rows.length.toDouble
    val padded = rows.map(r => r.padTo(dim, 0.0).toArray)
    val mean = Array.tabulate(dim)(i => padded.map(_(i)).sum / n)
    val out = new Array[Double](dim * dim)
    for (i <- 0 until dim; j <- 0 until dim)
      out(i * dim + j) = padded.map(r => r(i) * r(j)).sum / n - mean(i) * mean(j)
    out
  }

  test("aggregated covariance equals brute force (partial-agg merge path)") {
    val dim = 3
    val rows = Seq(
      Seq(1.0, 2.0, 3.0), Seq(4.0, 0.0, -1.0), Seq(2.5, 2.5, 2.5),
      Seq(-3.0, 1.0, 0.5), Seq(0.0, 0.0, 7.0))
    // repartition(3) forces multiple partial buffers through merge()
    val got = rows.toDF("v").repartition(3)
      .select(VecCovAgg.vecCov(dim)($"v").as("c"))
      .head.getSeq[Double](0)
    val want = brute(rows, dim)
    got.zip(want).zipWithIndex.foreach { case ((g, w), k) =>
      assert(math.abs(g - w) < 1e-9, s"entry $k: $g vs $w")
    }
  }

  test("short rows contribute only their prefix (zero-padded tail)") {
    val dim = 3
    val rows = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0), Seq(2.0, 5.0))
    val got = rows.toDF("v").select(VecCovAgg.vecCov(dim)($"v").as("c"))
      .head.getSeq[Double](0)
    val want = brute(rows, dim) // brute pads with 0.0, matching the contract
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("q_ml_pca returns a unit-norm component with dominant variance") {
    val out = SparkEntry.queries("q_ml_pca")(spark, TestSpark.sf0).collect()
    assert(out.length === 64)
    val v = out.map(_.getDouble(1))
    val eig = out.head.getDouble(2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, "unit norm")
    // canonical sign: first non-negligible loading is positive
    assert(v.find(x => math.abs(x) > 1e-6).forall(_ > 0))
    // the top eigenvalue dominates every single-coordinate variance
    val dim = 64
    val cov = Tables(spark, TestSpark.sf0, "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .select(VecCovAgg.vecCov(dim)($"v").as("c")).head.getSeq[Double](0)
    val maxVar = (0 until dim).map(i => cov(i * dim + i)).max
    assert(eig >= maxVar - 1e-9, s"eigval $eig must dominate max variance $maxVar")
  }
}
