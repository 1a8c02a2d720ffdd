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

  test("as-of join matches a brute-force per-purchase max-click scan") {
    val asof = SparkEntry.queries("q_join_asof")(spark, TestSpark.sf0)
      .select("purchase_id", "asof_click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def micros(r: org.apache.spark.sql.Row, i: Int): Long = {
      val ldt = r.getAs[java.time.LocalDateTime](i)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    }
    val e = Tables(spark, TestSpark.sf0, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r, 2)))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts").collect()
    assert(purchases.nonEmpty && asof.size == purchases.length)
    purchases.foreach { p =>
      val (u, pid, pts) = (p.getLong(0), p.getLong(1), micros(p, 2))
      // latest click at-or-before pts; ties broken by max event_id
      val want = clicks.filter(c => c._1 == u && c._3 <= pts)
        .sortBy(c => (c._3, c._2)).lastOption.map(_._2).getOrElse(-1L)
      assert(asof(pid) == want, s"purchase $pid: got ${asof(pid)}, want $want")
    }
  }

  test("as-of join plan shuffles exactly once (no inequality-join blowup)") {
    val plan = SparkEntry.queries("q_join_asof")(spark, TestSpark.sf0)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
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
