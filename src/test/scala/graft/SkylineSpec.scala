package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Skyline correctness vs the brute-force dominance definition. */
class SkylineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("skyline equals the brute-force Pareto frontier") {
    val per = Tables(spark, TestSpark.sf0, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def dominated(p: (Long, Long, Double)) = per.exists { q =>
      q._1 != p._1 && q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3)
    }
    val want = per.filterNot(dominated).map(_._1).toSet
    val got = SparkEntry.queries("q_agg_skyline")(spark, TestSpark.sf0)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
