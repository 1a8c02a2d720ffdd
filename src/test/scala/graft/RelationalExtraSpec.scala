package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalExtraSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("approx_count_distinct lands within 10% of the exact count") {
    val approx = SparkEntry.queries("q_agg_approx")(spark, TestSpark.sf0).collect()(0)
    val exact = Tables(spark, TestSpark.sf0, "orders")
      .agg(countDistinct(col("o_custkey")), countDistinct(col("o_totalprice")))
      .collect()(0)
    for (i <- 0 to 1) {
      val (a, e) = (approx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e < 0.10, s"col $i: approx $a vs exact $e")
    }
  }

  test("rank-1 ALS factors reconstruct ratings better than the global mean") {
    val mae = SparkEntry.queries("q_ml_cf")(spark, TestSpark.sf0)
      .collect()(0).getDouble(0)
    val r = Tables(spark, TestSpark.sf0, "orders")
      .groupBy(expr("o_custkey % 30").as("u"), expr("o_orderkey % 20").as("i"))
      .agg(avg(expr("o_orderkey % 5 + 1")).as("rt"))
    val meanMae = r.select(avg(abs(col("rt") - r.agg(avg("rt")).collect()(0).getDouble(0))))
      .collect()(0).getDouble(0)
    assert(mae < meanMae, s"ALS MAE $mae must beat global-mean MAE $meanMae")
  }
}
