package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline: the composition the L4
  * operators exist for, as ONE declared dataflow —
  *
  *   near-dup clusters (MinHash → LSH pairs → label propagation, keep the
  *   canonical doc) → quality gate (character-class score) → deterministic
  *   hash sample → per-source funnel counts + surviving token volume.
  *
  * Everything is a join/filter/aggregate over the same bounded-key shapes
  * the individual queries use, so the whole funnel is one Spark job with
  * no driver-side loop; at 100 TB each stage keeps its own scale posture
  * (bucketed pair join, doc-keyed label rounds, scan-local scoring). The
  * funnel columns (n_docs ≥ n_dedup ≥ n_quality ≥ n_final) are what a
  * curation run reports to its operator.
  */
object Curation extends QueryModule {

  private val qualityMin = 0.82 // ~median of the corpus quality score
  private val sampleHex = "c0" // 0xc0/0x100 = 75% keep rate after quality

  override val defs: Seq[Q] = Seq(
    Q("q_pipeline_curate",
      (s, d) => {
        val labels = Dedup.clusterLabels(s, d)
          .select(col("doc_id"), col("keep").as("kept_dedup"))
        // cpuPartitioned: the regex/tokenize scoring below is the CPU-bound
        // shape the explicit pre-partition exists for (see Tables); the
        // doc_id clustering also co-locates the labels join
        val staged = Tables.cpuPartitioned(s, d, "documents", "doc_id")
          .join(labels, "doc_id")
          .withColumn("q", TextExprs.qualityScore(col("text")))
          .withColumn("kept_quality", col("kept_dedup") && col("q") >= qualityMin)
          .withColumn("kept_sample", col("kept_quality") &&
            TextExprs.hashDraw(col("doc_id")) < lit(sampleHex))
          .withColumn("n_tokens", size(TextExprs.toks(col("text"))))
        staged.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(col("kept_dedup").cast("long")).as("n_dedup"),
            sum(col("kept_quality").cast("long")).as("n_quality"),
            sum(col("kept_sample").cast("long")).as("n_final"),
            sum(when(col("kept_sample"), col("n_tokens").cast("long")).otherwise(0L))
              .as("tokens_final"))
          .orderBy("source")
      },
      Some(s"""WITH ${Dedup.clustersSqlCtes},
            labels AS (SELECT v AS doc_id, v = lab AS kept_dedup FROM l3),
            staged AS (SELECT d.source, l.kept_dedup,
                ${TextExprs.qualityScoreSql("d.text")} AS q,
                ${TextExprs.hashDrawSql("d.doc_id")} AS draw,
                len(${TextExprs.toksSql("d.text")}) AS n_tokens
              FROM documents d JOIN labels l USING (doc_id)),
            flags AS (SELECT source, kept_dedup,
                kept_dedup AND q >= $qualityMin AS kept_quality,
                kept_dedup AND q >= $qualityMin AND draw < '$sampleHex' AS kept_sample,
                n_tokens
              FROM staged)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN kept_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
              CAST(SUM(CASE WHEN kept_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
              CAST(SUM(CASE WHEN kept_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
              CAST(SUM(CASE WHEN kept_sample THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_final
            FROM flags GROUP BY source ORDER BY source"""))
  )
}
