package graft.examples

import graft.GraftSession
import org.apache.spark.sql.functions._

/** A/B probe for the two live-family floor knobs (optimization r14):
  *
  *  1. `spark.sql.shuffle.partitions` AT STREAM START — pins the stateful
  *     operators' state-store count for the query's lifetime. The gate
  *     rows' state is tiny (sf0.1: ≤ a few hundred KB), so 32 stores per
  *     operator per micro-batch is pure task-launch + store-commit
  *     overhead; at 100 TB the same knob must saturate back to the
  *     session parallelism. This probe measures the per-run cost at 32 /
  *     8 / 4 store partitions for the stateful 3-batch shape every live
  *     row pays.
  *  2. `spark.sql.streaming.noDataMicroBatches.enabled` — the extra
  *     empty batch processAllAvailable runs to advance the watermark.
  *     Every live row was designed to evict on DATA batches (the staged
  *     sentinel replays exist precisely because a no-data batch is not
  *     guaranteed), so the extra batch is a full state-store commit
  *     round that buys nothing.
  *
  * Run: sbt "runMain graft.examples.StreamKnobProbe [runs]"
  */
object StreamKnobProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.lift(0).map(_.toInt).getOrElse(4)
    val spark = GraftSession.get()
    val dir3 = GraftSession.tempDirCleanedOnExit("stream-knob3").toString
    for (b <- 0 until 3)
      spark.range(10000).select((col("id") + b * 10000).as("id"),
          (col("id") % 97).as("k"))
        .coalesce(1).write.mode(if (b == 0) "overwrite" else "append").parquet(dir3)
    val schema3 = spark.read.parquet(dir3).schema

    def onceStateful(tag: String): Double = {
      val t0 = System.nanoTime()
      val name = s"knob_${tag}_${System.nanoTime()}"
      val q = spark.readStream.schema(schema3)
        .option("maxFilesPerTrigger", "1").parquet(dir3)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).count(): Unit
      spark.catalog.dropTempView(name)
      (System.nanoTime() - t0) / 1e9
    }

    val pKey = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val basePart = spark.conf.get(pKey)
    // interleaved A/B: each round runs every configuration once, so a
    // host window shift hits all sides equally. try/finally (ADVICE r14):
    // an exception mid-round must not leave the session at the probe's
    // last configuration if this body is ever reused in-session.
    try {
      for (i <- 1 to runs) {
        for (p <- Seq("32", "8", "4"); nd <- Seq("true", "false")) {
          spark.conf.set(pKey, p)
          spark.conf.set(ndKey, nd)
          val s = onceStateful(s"p${p}nd$nd")
          println(f"""{"metric":"stream_knob","run":$i,"partitions":$p,"noData":$nd,"secs":$s%.2f}""")
        }
      }
    } finally {
      spark.conf.set(pKey, basePart)
      spark.conf.unset(ndKey)
    }
    spark.stop()
  }
}
