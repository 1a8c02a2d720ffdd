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

  /** Build a committed single-version state dir via one real sink run. */
  private def freshState(tag: String): String = {
    val stage = GraftSession.tempDirCleanedOnExit(s"spec-crash-in-$tag").toString
    Tables(spark, TestSpark.sf0, "events").coalesce(1).write.parquet(s"$stage/in")
    val stateDir = GraftSession.tempDirCleanedOnExit(s"spec-crash-state-$tag").toString
    streaming.Streams.runUpsertTotals(spark, s"$stage/in", stateDir)
    stateDir
  }

  private def servingRows(stateDir: String): Array[(Long, Long)] =
    spark.read.parquet(s"$stateDir/current")
      .select(col("user_id"), col("n_events")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("crash between write and swap: recovery promotes the complete version, never half-swaps") {
    val stateDir = freshState("midswap")
    val before = servingRows(stateDir)
    // simulate the next batch crashing BETWEEN step 2 and step 3 of the
    // commit protocol: v1 fully written (with _SUCCESS), current already
    // retired to old1, promotion rename never ran → no serving table
    val root = new java.io.File(stateDir)
    val v1 = new java.io.File(root, "v1")
    spark.read.parquet(s"$stateDir/current")
      .withColumn("n_events", col("n_events") + 1)
      .coalesce(1).write.parquet(v1.getPath)
    assert(new java.io.File(v1, "_SUCCESS").exists(), "commit marker missing")
    assert(new java.io.File(root, "current").renameTo(new java.io.File(root, "old1")))
    assert(!new java.io.File(root, "current").exists()) // the crash window
    streaming.Streams.recoverUpsertState(stateDir)
    // current exists again and holds exactly v1's complete content
    val after = servingRows(stateDir)
    assert(after.toSeq === before.map { case (u, n) => (u, n + 1) }.toSeq)
    assert(!v1.exists(), "promoted version dir must be renamed away")
    assert(new java.io.File(root, "old1").exists(), "retired version retained")
  }

  test("crash mid-write: the half-written version is swept, current untouched") {
    val stateDir = freshState("midwrite")
    val before = servingRows(stateDir)
    val root = new java.io.File(stateDir)
    // a v-dir with data but NO _SUCCESS marker = writer died mid-flight
    val v9 = new java.io.File(root, "v9")
    assert(v9.mkdirs())
    java.nio.file.Files.write(v9.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    streaming.Streams.recoverUpsertState(stateDir)
    assert(!v9.exists(), "stale half-written version must be swept")
    assert(servingRows(stateDir).toSeq === before.toSeq, "current must be untouched")
  }

  test("crash after write before retire: recovery finishes the swap") {
    val stateDir = freshState("prewrite")
    val root = new java.io.File(stateDir)
    val v1 = new java.io.File(root, "v1")
    spark.read.parquet(s"$stateDir/current")
      .withColumn("n_events", col("n_events") + 5)
      .coalesce(1).write.parquet(v1.getPath)
    // crash BEFORE step 2: both current and a complete v1 exist
    streaming.Streams.recoverUpsertState(stateDir)
    assert(!v1.exists())
    assert(new java.io.File(root, "old1").exists(), "old current must be retired as old1")
    val cur = spark.read.parquet(s"$stateDir/current")
      .agg(min(col("n_events"))).head.getLong(0)
    val old = spark.read.parquet(s"$stateDir/old1")
      .agg(min(col("n_events"))).head.getLong(0)
    assert(cur === old + 5, "v1 must now be the serving table")
  }
}
