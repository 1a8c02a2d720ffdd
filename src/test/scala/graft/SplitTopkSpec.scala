package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the hash split, cross-source audit, and live top-k. */
class SplitTopkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("hash split conserves the corpus and lands near 90/5/5") {
    val rows = q("q_text_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    assert(total == Tables(spark, TestSpark.sf0, "documents").count())
    assert(rows("train").toDouble / total > 0.8)
    assert(rows.getOrElse("val", 0L) + rows.getOrElse("test", 0L) > 0)
  }

  test("cross-source pairs are ppjoin pairs whose sources differ") {
    val pp = q("q_dedup_ppjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = q("q_dedup_cross_source").collect()
    rows.foreach { r =>
      assert(pp.contains((r.getLong(0), r.getLong(1))))
      assert(r.getString(2) != r.getString(3))
    }
    assert(rows.nonEmpty)
  }

  test("count-min estimates never undercount (the CMS one-sided guarantee)") {
    val rows = q("q_agg_countmin").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("live top-k is ranked by rounded total descending") {
    val totals = q("q_stream_live_topk")
      .orderBy(desc("total"), asc("user_id")).collect().map(_.getDouble(2))
    totals.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ =>
    }
    assert(totals.length == 10)
  }
}
