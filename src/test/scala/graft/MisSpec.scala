package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Luby-MIS correctness: independence and maximality (maximality also
  * proves the fixed round budget reaches convergence). */
class MisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def edgesUndirected = {
    val n = 200L
    val e = Tables(spark, TestSpark.sf0, "orders")
      .select((col("o_orderkey") % n).as("src"), (col("o_custkey") % n).as("dst"))
      .distinct()
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().filter(col("src") =!= col("dst"))
  }

  test("MIS is independent: no edge connects two members") {
    val mis = SparkEntry.queries("q_graph_mis")(spark, TestSpark.sf0)
      .filter(col("in_mis")).select("v")
    val viol = edgesUndirected
      .join(mis.withColumnRenamed("v", "src"), Seq("src"))
      .join(mis.select(col("v").as("dst")), Seq("dst"))
      .count()
    assert(viol == 0)
  }

  test("MIS is maximal: every excluded vertex has a member neighbor") {
    val out = SparkEntry.queries("q_graph_mis")(spark, TestSpark.sf0)
    val mis = out.filter(col("in_mis")).select("v")
    val nonMis = out.filter(!col("in_mis")).select("v")
    val covered = edgesUndirected
      .join(mis.withColumnRenamed("v", "dst"), Seq("dst"))
      .select(col("src").as("v")).distinct()
    val uncovered = nonMis.join(covered, Seq("v"), "left_anti").count()
    assert(uncovered == 0, s"$uncovered non-members lack a MIS neighbor: not converged")
  }
}
