package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator module's declared queries + DuckDB oracles.
  */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Sources,
    operators.Graph,
    operators.GraphAdvanced,
    operators.ML,
    operators.Dedup,
    operators.Curation,
    operators.Similarity,
    operators.TextAnalysis,
    operators.Multimodal,
    operators.StreamingOps,
    operators.Analytics,
    operators.Generators)

  private lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.defs)
    // `.toMap` below keeps the LAST duplicate silently — a shadowed
    // declaration would sit dead and unchecked while the row count holds.
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query declarations: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_3way")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
