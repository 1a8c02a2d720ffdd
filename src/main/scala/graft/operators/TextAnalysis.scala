package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text analysis for training-data curation: token statistics, heuristic
  * language ID, quality scoring, and content fingerprinting. All
  * map/aggregate-parallel with no cross-document state — each stays one
  * scan + one hash aggregate at any scale.
  */
object TextAnalysis extends QueryModule {

  /** documents pre-partitioned by doc_id for the CPU-bound regex/tokenize
    * stages — see [[graft.Tables.cpuPartitioned]]. */
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.cpuPartitioned(s, d, "documents", "doc_id")

  private def toks(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), explode(TextExprs.toks(col("text"))).as("tok"))

  private val toksSql =
    s"""toks AS (SELECT doc_id, unnest(${TextExprs.toksSql("text")}) AS tok
         FROM documents)"""

  /** tiny stopword lexicons per language (n-gram heuristic stand-in) */
  private val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "est", "fr" -> "un")

  private val lexiconSql = lexicon.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  override val defs: Seq[Q] = Seq(

    // token counting (whitespace/punct tokenizer). Two-level aggregate:
    // a single countDistinct mixed with plain aggregates would plan as an
    // Expand (row duplication ×2) over the exploded token relation — the
    // r2 driver bench showed that amplification at 16 s. Instead reduce
    // (doc_id, tok) first (map-side partial combine shrinks the explode
    // output before any shuffle), then roll up per doc: n_uniq is a plain
    // count, n_tokens/avg_len are exact integer sums — no Expand anywhere.
    Q("q_text_tokens",
      (s, d) => toks(s, d)
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_uniq"),
          round((sum(col("c") * length(col("tok"))) * 1.0 / sum(col("c"))), 4).as("avg_len"))
        .orderBy("doc_id"),
      Some(s"""WITH $toksSql
               SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_uniq,
                 ROUND(AVG(CAST(length(tok) AS DOUBLE)), 4) AS avg_len
               FROM toks GROUP BY doc_id ORDER BY doc_id""")),

    // language ID: stopword-hit argmax per document
    Q("q_text_langid",
      (s, d) => {
        val lex = s.createDataFrame(lexicon).toDF("lang", "w")
        val hits = toks(s, d).join(broadcast(lex), col("tok") === col("w"))
          .groupBy("doc_id", "lang").agg(count(lit(1)).as("score"))
        val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), asc("lang"))
        val best = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("score"))
        Tables(s, d, "documents").select(col("doc_id"))
          .join(best, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("lang"), lit("unknown")).as("pred_lang"),
            coalesce(col("score"), lit(0L)).as("score"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $toksSql,
               lex(lang, w) AS (VALUES $lexiconSql),
               hits AS (SELECT doc_id, lang, COUNT(*) AS score
                 FROM toks JOIN lex ON tok = w GROUP BY doc_id, lang),
               best AS (SELECT doc_id, lang, score FROM hits
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang) = 1)
               SELECT d.doc_id, COALESCE(b.lang, 'unknown') AS pred_lang,
                 COALESCE(b.score, 0) AS score
               FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
               ORDER BY d.doc_id""")),

    // quality scoring: character-class ratios. Denominators are
    // greatest(len, 1) — Spark 4's default ANSI mode would otherwise
    // throw DIVIDE_BY_ZERO on an empty document (see TextExprs).
    Q("q_text_quality",
      (s, d) => {
        val den = greatest(length(col("text")), lit(1))
        docs(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          round(length(regexp_replace(col("text"), "[^a-z]", "")) * 1.0 / den, 6).as("alpha_ratio"),
          round(length(regexp_replace(col("text"), "[^ ]", "")) * 1.0 / den, 6).as("space_ratio"),
          round(length(regexp_replace(col("text"), "[^0-9]", "")) * 1.0 / den, 6).as("digit_ratio"),
          round(TextExprs.qualityScore(col("text")), 6).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
              ROUND(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / greatest(length(text), 1), 6) AS alpha_ratio,
              ROUND(length(regexp_replace(text, '[^ ]', '', 'g')) * 1.0 / greatest(length(text), 1), 6) AS space_ratio,
              ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1), 6) AS digit_ratio,
              ROUND(${TextExprs.qualityScoreSql("text")}, 6) AS quality
              FROM documents ORDER BY doc_id""")),

    // TF-IDF (SURVEY.md §7 step 8): tf × ln(N/df), top-3 terms per doc.
    // All shuffle-parallel; the N-docs scalar rides a broadcast cross join.
    Q("q_text_tfidf",
      (s, d) => {
        val tf = toks(s, d).groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        // document frequency as a count window over the tf relation — the
        // r2 shape re-derived tf twice (once for dfreq's groupBy, once for
        // the join), i.e. two explodes + two aggregates + a join shuffle;
        // the window is the same shuffle-by-tok but computes tf exactly once
        val dfW = Window.partitionBy(col("tok"))
        val nDf = Tables(s, d, "documents").agg(count(lit(1)).cast("double").as("nd"))
        val scored = tf
          .withColumn("df", count(lit(1)).over(dfW).cast("double"))
          .crossJoin(broadcast(nDf))
          .select(col("doc_id"), col("tok"),
            round(col("tf") * log(col("nd") / col("df")), 6).as("tfidf"))
        val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), asc("tok"))
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn"), col("tok"), col("tfidf"))
          .orderBy("doc_id", "rn")
      },
      Some(s"""WITH $toksSql,
               tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
               dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
               nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
               scored AS (SELECT doc_id, tok, ROUND(tf * LN(nd.nd / df), 6) AS tfidf
                 FROM tf JOIN dfreq USING (tok) CROSS JOIN nd)
               SELECT doc_id, rn, tok, tfidf FROM (
                 SELECT doc_id, tok, tfidf,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY tfidf DESC, tok) AS BIGINT) AS rn
                 FROM scored) t
               WHERE rn <= 3 ORDER BY doc_id, rn""")),

    // deterministic stratified sampling (training-data mixture control):
    // per-stratum keep rates decided by a PORTABLE hash draw — the first
    // two md5 hex chars of the doc id compared against a per-stratum
    // threshold. Hash-based sampling is reproducible across engines,
    // partitionings and reruns (rand(seed) fixes only per-partition
    // streams), which is what makes a 100 TB sample auditable: any engine
    // can re-derive exactly which rows were kept. Strata here: source
    // index % 3 → 25% / 50% / 75% target rates.
    Q("q_text_sample",
      (s, d) => {
        val draw = TextExprs.hashDraw(col("doc_id"))
        val thr = when(substring(col("source"), 4, 10).cast("int") % 3 === 0, lit("40"))
          .when(substring(col("source"), 4, 10).cast("int") % 3 === 1, lit("80"))
          .otherwise(lit("c0"))
        docs(s, d)
          .select(col("doc_id"), col("source"), (draw < thr).as("kept"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, source,
              ${TextExprs.hashDrawSql("doc_id")} <
                CASE CAST(substr(source, 4) AS INT) % 3
                  WHEN 0 THEN '40' WHEN 1 THEN '80' ELSE 'c0' END AS kept
              FROM documents ORDER BY doc_id""")),

    // document fingerprint: md5 of normalized content + duplicate-cluster size
    Q("q_text_fingerprint",
      (s, d) => {
        val fp = docs(s, d).select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fp"))
        val w = Window.partitionBy(col("fp"))
        fp.withColumn("cluster_size", count(lit(1)).over(w))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, fp, cluster_size FROM (
                SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
                       COUNT(*) OVER (PARTITION BY
                         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS cluster_size
                FROM documents) t ORDER BY doc_id"""))
  )
}
