package graft

import org.scalatest.funsuite.AnyFunSuite

/** L2-boosting invariants for q_ml_gbt beyond the oracle hash. */
class GbtSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("each boosting round weakly decreases the train MSE") {
    val rows = SparkEntry.queries("q_ml_gbt")(spark, TestSpark.sf0)
      .orderBy("round").collect()
    assert(rows.length === 2)
    val mses = rows.map(_.getDouble(5))
    assert(mses(1) <= mses(0) + 1e-9,
      s"round 2 MSE ${mses(1)} worse than round 1 ${mses(0)}")
    // a fitted stump's leaves can't both be zero (the split would be
    // pointless) unless the residuals are identically zero
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) + math.abs(r.getDouble(4)) > 0)
    }
  }
}
