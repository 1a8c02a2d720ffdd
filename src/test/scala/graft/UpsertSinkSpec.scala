package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** foreachBatch upsert sink: the merge must actually run across multiple
  * micro-batches and converge to the batch aggregate. */
class UpsertSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("upsert history versions are monotone: counts only grow across versions") {
    val h = SparkEntry.queries("q_stream_live_upsert_history")(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byUser = h.groupBy(_._1._2)
    byUser.foreach { case (_, versions) =>
      val counts = versions.toSeq.sortBy(_._1._1).map(_._2)
      counts.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a, "a later version lost events")
        case _ =>
      }
    }
    assert(byUser.nonEmpty)
  }

  test("multi-batch upsert converges to the batch group-by") {
    val stage = GraftSession.tempDirCleanedOnExit("spec-upsert-in").toString
    Tables(spark, TestSpark.sf0, "events")
      .repartitionByRange(3, col("event_id"))
      .write.parquet(s"$stage/in")
    val stateDir = GraftSession.tempDirCleanedOnExit("spec-upsert-state").toString
    val got = streaming.Streams.runUpsertTotals(spark, s"$stage/in", stateDir,
        Map("maxFilesPerTrigger" -> "1"))
      .select(col("user_id"), col("n_events"), round(col("total"), 2).as("total"))
    val want = Tables(spark, TestSpark.sf0, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
    assert(got.join(want, Seq("user_id", "n_events", "total")).count() == want.count())
    // the merge path ran: at least two superseded state versions exist
    val olds = new java.io.File(stateDir).listFiles().map(_.getName)
      .count(_.startsWith("old"))
    assert(olds >= 2, s"expected >=2 superseded versions, saw $olds — merge path not exercised")
  }
}
