package graft

import graft.streaming.TxLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The TxLog commit protocol: atomicity, conflict detection, snapshot
  * isolation, time travel, crash-orphan invisibility + vacuum. */
class TxLogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshTable(tag: String): String = {
    val t = GraftSession.tempDirCleanedOnExit(s"txlog-$tag").toString
    Files.createDirectories(Paths.get(t))
    t
  }

  private def writePart(table: String, name: String): Unit =
    Files.write(Paths.get(table, name), Array[Byte](80, 65, 82, 49)) // "PAR1"

  test("commits replay to the expected file set; removes hide files") {
    val t = freshTable("replay")
    writePart(t, "a.parquet"); writePart(t, "b.parquet"); writePart(t, "c.parquet")
    assert(TxLog.commit(t, Seq("a.parquet"), Seq.empty, -1L) === Some(0L))
    assert(TxLog.commit(t, Seq("b.parquet"), Seq.empty, 0L) === Some(1L))
    assert(TxLog.commit(t, Seq("c.parquet"), Seq("a.parquet"), 1L) === Some(2L))
    assert(TxLog.snapshot(t).files.sorted === Seq("b.parquet", "c.parquet"))
    assert(TxLog.snapshot(t, Some(1L)).files.sorted === Seq("a.parquet", "b.parquet"))
    assert(TxLog.snapshot(t, Some(0L)).files === Seq("a.parquet"))
  }

  test("conflicting commit at the same version loses; no lost update") {
    val t = freshTable("conflict")
    assert(TxLog.commit(t, Seq("x.parquet"), Seq.empty, -1L) === Some(0L))
    // two writers both read version 0, both try to commit version 1
    assert(TxLog.commit(t, Seq("w1.parquet"), Seq("x.parquet"), 0L) === Some(1L))
    assert(TxLog.commit(t, Seq("w2.parquet"), Seq("x.parquet"), 0L) === None,
      "second writer must get a conflict, not overwrite")
    assert(TxLog.snapshot(t).files === Seq("w1.parquet"))
  }

  test("crash orphan (data file, no log entry) is invisible and vacuumed") {
    val t = freshTable("orphan")
    writePart(t, "live.parquet")
    assert(TxLog.commit(t, Seq("live.parquet"), Seq.empty, -1L) === Some(0L))
    writePart(t, "orphan.parquet") // writer died before its commit rename
    assert(TxLog.snapshot(t).files === Seq("live.parquet"),
      "readers must never see an uncommitted file")
    assert(TxLog.vacuum(t) === Seq("orphan.parquet"))
    assert(!Files.exists(Paths.get(t, "orphan.parquet")))
    // removed-but-logged files survive vacuum: they back time travel
    writePart(t, "v1.parquet")
    assert(TxLog.commit(t, Seq("v1.parquet"), Seq("live.parquet"), 0L) === Some(1L))
    assert(TxLog.vacuum(t) === Seq.empty)
    assert(Files.exists(Paths.get(t, "live.parquet")))
  }

  test("merge sink converges to the batch group-by and time-travels per version") {
    val stage = GraftSession.tempDirCleanedOnExit("txlog-sink-in").toString
    Tables(spark, TestSpark.sf0, "events")
      .repartitionByRange(3, col("event_id"))
      .write.parquet(s"$stage/in")
    val table = GraftSession.tempDirCleanedOnExit("txlog-sink-table").toString
    val got = streaming.Streams.runMergeTotals(spark, s"$stage/in", table,
        Map("maxFilesPerTrigger" -> "1"))
      .select(col("user_id"), col("n_events"), round(col("total"), 2).as("total"))
    val want = Tables(spark, TestSpark.sf0, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
    assert(got.join(want, Seq("user_id", "n_events", "total")).count() === want.count())
    val vs = TxLog.versions(table)
    assert(vs.length >= 3, s"merge path not exercised: versions $vs")
    // per-version counts only grow (cumulative merge)
    val counts = vs.map(v =>
      streaming.Streams.readMergeTable(spark, table, Some(v))
        .agg(sum("n_events")).head.getLong(0))
    assert(counts === counts.sorted, s"a later version lost events: $counts")
  }
}
