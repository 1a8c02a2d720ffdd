package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the events-analytics queries (the DuckDB hash
  * compare is Verify + tools/check.py; these pin the properties that a
  * hash match alone would not explain). */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("retention day 0 counts every cohort member exactly once") {
    // every user is active on their own first day, so summing day_k=0 over
    // cohorts must equal the number of distinct users
    val day0 = q("q_events_retention").filter(col("day_k") === 0)
      .agg(sum("n_users")).head.getLong(0)
    val users = Tables(spark, TestSpark.sf0, "events")
      .select("user_id").distinct().count()
    assert(day0 == users)
  }

  test("retention is non-increasing in day_k within a cohort... at day 0 max") {
    // day 0 is the cohort size; no later offset can exceed it
    val bad = q("q_events_retention")
      .groupBy("cohort_day")
      .agg(max(when(col("day_k") === 0, col("n_users"))).as("c0"),
        max(when(col("day_k") > 0, col("n_users"))).as("later"))
      .filter(col("later") > col("c0"))
      .count()
    assert(bad == 0)
  }

  test("transition probabilities sum to 1 per source type") {
    val sums = q("q_events_transitions")
      .groupBy("from_type").agg(sum("p").as("sp")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"${r.getString(0)} sums to ${r.getDouble(1)}"))
  }

  test("transition counts conserve the event stream (n_events - n_users)") {
    // each user contributes (#events - 1) transitions
    val total = q("q_events_transitions").agg(sum("cnt")).head.getLong(0)
    val ev = Tables(spark, TestSpark.sf0, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected)
  }

  test("ewma equals the plain value on each user's first event") {
    // frame has one row there, so the weighted average is the value itself
    val ev = Tables(spark, TestSpark.sf0, "events")
    val first = ev.groupBy("user_id").agg(min_by(
        struct(col("event_id"), round(col("value"), 6).as("v")),
        struct(col("ts"), col("event_id"))).as("f"))
      .select(col("user_id"), col("f.event_id").as("event_id"), col("f.v").as("v"))
    val joined = q("q_window_ewma").join(first, Seq("user_id", "event_id"))
    assert(joined.count() == first.count())
    assert(joined.filter(abs(col("ewma") - col("v")) > 1e-6).count() == 0)
  }

  test("explicit sessionization agrees with session_window on session count and events") {
    val explicitSess = q("q_events_sessionize")
    val builtin = q("q_stream_session") // session_window(30 min) batch row
    assert(explicitSess.count() == builtin.count())
    val a = explicitSess.agg(sum("n_events")).head.getLong(0)
    val b = builtin.agg(sum("n_events")).head.getLong(0)
    assert(a == b)
  }

  test("stationary distribution sums to ~1 and is a transition fixed point") {
    val pi = q("q_events_stationary").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = pi.values.sum
    assert(math.abs(total - 1.0) < 1e-3, s"pi sums to $total")
    // fixed point: pi * P ~= pi (P from the transitions row)
    val p = q("q_events_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    pi.keys.foreach { to =>
      val next = pi.map { case (from, v) => v * p.getOrElse((from, to), 0.0) }.sum
      assert(math.abs(next - pi(to)) < 1e-3, s"$to: $next vs ${pi(to)}")
    }
  }

  test("robust outliers all exceed the 3.5 modified-z threshold and are rare") {
    val rows = q("q_events_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 3.5))
    val nEvents = Tables(spark, TestSpark.sf0, "events").count()
    assert(rows.length < nEvents / 10, "outliers should be a small minority")
  }

  test("dau/wau: wau dominates dau and stickiness lies in (0, 1]") {
    val rows = q("q_events_dau_wau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(wau >= dau, s"wau $wau < dau $dau")
      assert(st > 0.0 && st <= 1.0 + 1e-9)
    }
  }

  test("resample grid is dense per user and conserves event counts") {
    val rs = q("q_events_resample")
    val span = rs.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("hour_idx") - min("hour_idx") + 1).as("w"))
      .filter(col("n") =!= col("w")).count()
    assert(span == 0, "grid has gaps or duplicates")
    val total = rs.agg(sum("n_events")).head.getLong(0)
    assert(total == Tables(spark, TestSpark.sf0, "events").count())
  }
}
