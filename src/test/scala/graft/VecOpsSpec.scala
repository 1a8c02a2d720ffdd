package graft

import graft.functions.VecOps.{cosine, vecDot}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot matches the higher-order-function result on float arrays") {
    val df = Tables(spark, TestSpark.sf0, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = df.select(
      round(vecDot(col("embedding"), col("embedding")), 6).as("native"),
      round(aggregate(zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x), 6).as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vec_dot handles mixed element types, length mismatch and null elements") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(2L, 3L, 4L, 9L)), // common prefix only
      (Seq(0.5f, -1.5f), Seq(2L, 2L))).toDF("a", "b")
    val out = df.select(vecDot(col("a"), col("b")).as("d")).as[Double].collect()
    assert(out.toSeq === Seq(1 * 2 + 2 * 3 + 3 * 4.0, 0.5 * 2 - 1.5 * 2))

    val nd = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](5.0, 7.0, 11.0)))
      .toDF("a", "b")
      .select(vecDot(col("a"), col("b")).as("d")).as[Double].collect()
    assert(nd.toSeq === Seq(1 * 5 + 3 * 11.0)) // null element counts as 0
  }

  test("cosine of a vector with itself is 1") {
    val ones = Tables(spark, TestSpark.sf0, "embeddings").limit(20)
      .select(round(cosine(col("embedding"), col("embedding")), 6).as("c"))
      .as[Double].collect()
    ones.foreach(c => assert(c === 1.0))
  }
}
