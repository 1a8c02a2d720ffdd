package graft.examples

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Per-query cost FLOOR of the live streaming family (VERDICT r7 item 5):
  * the 31 `q_stream_live_*` rows each pay micro-batch machinery that has
  * nothing to do with the operator under test — stream-query planning,
  * offset-log/commit-log IO, state-store init, memory-sink table setup.
  * This probe runs the MINIMAL live query (one 10-row staged file →
  * trivial select → memory sink → processAllAvailable) N times in one
  * session and prints each run's seconds: run 1 is the cold floor (JIT +
  * streaming classloading), the later runs are the steady per-row floor
  * every live gate row pays before its operator does any work. The
  * numbers live in BASELINE.md so bench drift in the live family can be
  * read net of floor.
  *
  * Run: sbt "runMain graft.examples.StreamFloorProbe [runs]"
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.lift(0).map(_.toInt).getOrElse(5)
    val spark = GraftSession.get()
    val dir = GraftSession.tempDirCleanedOnExit("stream-floor").toString
    spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val name = s"floor_$i"
      val q = spark.readStream.schema(schema).parquet(dir)
        .select(col("id"), col("v"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table(name).count()
      spark.catalog.dropTempView(name)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"stream_floor","run":$i,"rows":$n,"secs":$secs%.2f}""")
    }

    // the family's typical shape: 3 staged files replayed one per
    // micro-batch into a STATEFUL aggregate — adds offset/commit-log
    // round-trips per batch and a state store to the floor
    val dir3 = GraftSession.tempDirCleanedOnExit("stream-floor3").toString
    for (b <- 0 until 3)
      spark.range(10).select((col("id") + b * 10).as("id"), (col("id") % 3).as("k"))
        .coalesce(1).write.mode(if (b == 0) "overwrite" else "append").parquet(dir3)
    val schema3 = spark.read.parquet(dir3).schema
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val name = s"floor3_$i"
      val q = spark.readStream.schema(schema3)
        .option("maxFilesPerTrigger", "1").parquet(dir3)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table(name).count()
      spark.catalog.dropTempView(name)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"stream_floor_stateful3","run":$i,"rows":$n,"secs":$secs%.2f}""")
    }
    spark.stop()
  }
}
