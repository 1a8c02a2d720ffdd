package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for farthest-first seeding, Gini, and autocorrelation. */
class SeedsGiniSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("farthest-first selection distances are non-increasing and ids distinct") {
    val rows = q("q_ml_seeds").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    // the max-min-distance objective can only shrink as the set grows
    val d = rows.map(_.getDouble(2)).drop(1) // seed 1 records 0.0
    d.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) case _ => }
    d.foreach(x => assert(x >= 0.0))
  }

  test("elbow inertia is non-increasing in k (more centers never fit worse)") {
    val rows = q("q_ml_elbow").collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    rows.map(_.getDouble(1)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-6, s"inertia rose: $a -> $b")
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(1) >= 0.0))
  }

  test("benford digits cover 1..9 and observed counts conserve") {
    val rows = q("q_agg_benford").collect()
    assert(rows.map(_.getInt(0)).toSet == (1 to 9).toSet)
    val totalObs = rows.map(_.getLong(1)).sum
    val nOrders = Tables(spark, TestSpark.sf0, "orders").count()
    assert(totalObs == nOrders)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("gini is within [0, 1) for the positive order totals") {
    q("q_agg_gini").collect().foreach { r =>
      val g = r.getDouble(2)
      assert(g >= -1e-9 && g < 1.0, s"gini $g out of range")
    }
  }

  test("lag-1 autocorrelation lies in [-1, 1]") {
    q("q_agg_autocorr").collect().foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"r1 $c out of range")
    }
  }
}
