package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name before hashing values. Results must be deterministic:
  * canonical ORDER BY on both sides, doubles rounded on both sides.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[Q]
}
