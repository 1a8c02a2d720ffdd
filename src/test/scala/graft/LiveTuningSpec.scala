package graft

import graft.streaming.Streams
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the optimization-r14 live-stream tuning helper:
  * the state-store partition count must derive from input BYTES with
  * the documented floor and cap, and withLiveTuning must restore both
  * session confs whatever the body does (including throwing) — a leaked
  * override would silently re-shape every later query in the session.
  */
class LiveTuningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def writeBytes(n: Int): String = {
    val dir = GraftSession.tempDirCleanedOnExit("live-tuning").toString
    val f = new java.io.File(dir, "blob.bin")
    val out = new java.io.FileOutputStream(f)
    try out.write(new Array[Byte](n)) finally out.close()
    dir
  }

  test("statePartitions: floor on tiny input, byte-derived in the middle, capped at session parallelism") {
    val pKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(pKey)
    spark.conf.set(pKey, "32")
    try {
      val floor = GraftConf.streamStateMinPartitions
      val per = GraftConf.streamStateBytesPerPartition
      // tiny input → the floor wins
      assert(Streams.statePartitions(spark, Seq(writeBytes(1024))) === floor)
      // missing path sizes as 0 bytes → still the floor, never a crash
      assert(Streams.statePartitions(spark,
        Seq("/nonexistent/graft/path")) === floor)
      // cap: pretend bytes far beyond cap × per by lowering the per-knob
      spark.conf.set("spark.graft.stream.stateBytesPerPartition", "1")
      try {
        val dir = writeBytes(4096) // 4096 partitions' worth at 1 B each
        assert(Streams.statePartitions(spark, Seq(dir)) === 32)
      } finally spark.conf.unset("spark.graft.stream.stateBytesPerPartition")
      // byte-derived between floor and cap
      spark.conf.set("spark.graft.stream.stateBytesPerPartition", "100")
      try {
        val dir = writeBytes(1500) // ceil(1500/100) = 15 ∈ (floor, cap)
        assert(Streams.statePartitions(spark, Seq(dir)) === 15)
        // qualified URI sizes through ITS filesystem, not java.io.File
        // (VERDICT r14 #1: a non-local scheme must not size as 0 bytes
        // and silently land on the floor)
        val uri = new java.io.File(dir).toURI.toString // file:///...
        assert(uri.startsWith("file:/"))
        assert(Streams.statePartitions(spark, Seq(uri)) === 15)
      } finally spark.conf.unset("spark.graft.stream.stateBytesPerPartition")
      assert(per > 0 && floor >= 1) // knobs validate at read time
    } finally spark.conf.set(pKey, prev)
  }

  test("withLiveTuning sets both confs inside the body and restores them after, even on throw") {
    val pKey = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevP = spark.conf.get(pKey)
    val prevNd = spark.conf.getOption(ndKey)
    val dir = writeBytes(10)
    var insideP = ""
    var insideNd = ""
    Streams.withLiveTuning(spark, Seq(dir)) {
      insideP = spark.conf.get(pKey)
      insideNd = spark.conf.get(ndKey)
    }
    // tiny input → floor, but never above the session cap (TestSpark
    // runs small, so the cap can undercut the floor — that IS the rule)
    assert(insideP ===
      math.min(prevP.toInt, GraftConf.streamStateMinPartitions).toString)
    assert(insideNd === "false")
    assert(spark.conf.get(pKey) === prevP)
    assert(spark.conf.getOption(ndKey) === prevNd,
      "the no-data conf must restore to its pre-scope state")
    intercept[RuntimeException] {
      Streams.withLiveTuning(spark, Seq(dir)) { sys.error("boom") }
    }
    assert(spark.conf.get(pKey) === prevP,
      "restore must run on the failure path too")
    assert(spark.conf.getOption(ndKey) === prevNd)
  }
}
