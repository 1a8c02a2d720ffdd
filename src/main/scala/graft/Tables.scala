package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * The reference reads typed key-value records via per-job InputFormats
  * (`core/src/main/java/org/apache/hama/bsp/SequenceFileInputFormat.java:28`);
  * here every table is a parquet scan whose schema Catalyst knows statically,
  * so column pruning + predicate pushdown reach the file scan for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark only reads as long
    // (spark.sql.legacy.parquet.nanosAsLong); surface it as timestamp_ntz at
    // microsecond precision — the same truncation DuckDB applies to nanos.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer DIV, not double /: ns epochs (~1.7e18) overflow double mantissa
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    else df
  }
}
