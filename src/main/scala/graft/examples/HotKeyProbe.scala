package graft.examples

import graft.GraftSession
import graft.operators.RangedRank
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key skew evidence for the round-8 de-windowing (VERDICT r7 items
  * 1-2): measures the MAX records any single task reads, under
  *
  *  A. document frequency over a corpus where ONE token appears in 50%
  *     of documents — `count().over(Window.partitionBy(tok))` (the old
  *     shape) vs `groupBy(tok).count()` + join (the shipped shape). A
  *     window partition is processed by ONE task, so the hot token's
  *     whole group (N/2 rows) serializes through it; the groupBy is
  *     map-side-combined to O(vocab) and the join back broadcasts.
  *
  *  B. per-block row_number over a relation where 80% of rows share one
  *     2-char block — `row_number().over(partitionBy(blk))` (the old
  *     SNM shape) vs [[RangedRank.withRank]] (the shipped shape), which
  *     range-shards the (blk, key) sort so no task holds a whole block.
  *
  * Emits one JSON line per variant: rows processed, max records read by
  * any task, wall secs. The point is the max-task-records ratio —
  * bounded for the shipped shapes, O(corpus) for the window shapes.
  *
  * Run: HOTKEY_DOCS=200000 sbt "runMain graft.examples.HotKeyProbe"
  */
object HotKeyProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("HOTKEY_DOCS", "200000").toLong
    val spark = GraftSession.get()

    val maxTaskRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          maxTaskRead.getAndUpdate(c => math.max(c, m.shuffleReadMetrics.recordsRead)): Unit
      }
    })
    def probe(tag: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      maxTaskRead.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // drain the listener bus
      println(f"""{"metric":"hotkey_$tag","docs":$n,"rows":$rows,""" +
        f""""max_task_records":${maxTaskRead.get},"secs":$secs%.2f}""")
    }

    // --- A: tf relation with a token present in 50% of docs ------------
    // each doc: 8 unique md5 tokens; every even doc also carries "hot"
    val tf = spark.range(n).select(col("id").as("doc_id"),
        explode(concat(
          expr("transform(sequence(1, 8), i -> concat('w', substring(md5(concat(id, '-', i)), 1, 8)))"),
          when(col("id") % 2 === 0, array(lit("hot")))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()

    // AQE partition COALESCING is disabled for the measurement: it
    // merges the probe's small even partitions into bigger ones, which
    // inflates every variant's per-task read by the same even share and
    // buries the skew signal (at corpus scale partitions sit at the
    // advisory size and coalescing is a no-op). Skew-join thresholds are
    // scaled to probe size so the join-back's hot partition splits the
    // way a production-sized one would under the 256 MB default. The
    // WINDOW variant runs under the same settings and still single-tasks
    // the hot group: a window partition cannot be skew-split at any
    // threshold, which is the whole finding.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    probe("df_window") {
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
        .groupBy().agg(sum("df")).head.getLong(0)
    }
    probe("df_groupby_join") {
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(dfreq, "tok").groupBy().agg(sum("df")).head.getLong(0)
    }
    probe("df_groupby_broadcast") {
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), "tok").groupBy().agg(sum("df")).head.getLong(0)
    }
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")

    // --- B: SNM blocking where 80% of rows share one 2-char block ------
    val keyed = spark.range(n).select(col("id").as("doc_id"),
        when(col("id") % 5 =!= 0, lit("aa")).otherwise(lit("zz")).as("blk"),
        md5(col("id").cast("string")).as("k"))
      .localCheckpoint()

    def rnSum(df: DataFrame): Long =
      df.groupBy().agg(sum("rn")).head.getLong(0)

    probe("snm_window") {
      rnSum(keyed.withColumn("rn",
        row_number().over(Window.partitionBy("blk").orderBy("k", "doc_id")).cast("long")))
    }
    probe("snm_rangedrank") {
      rnSum(RangedRank.withRank(keyed, Seq("blk"), Seq("k", "doc_id"), "rn"))
    }
    spark.stop()
  }
}
