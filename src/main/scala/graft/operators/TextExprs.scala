package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column expressions shared by the text-analysis queries, the dedup
  * pipeline, and the curation funnel — ONE definition per concept (with
  * its DuckDB twin beside it), so `q_pipeline_curate` cannot silently
  * drift from the stage queries it composes.
  *
  * Every denominator is guarded with `greatest(len, 1)`: Spark 4 runs
  * ANSI mode by default, so an empty document would otherwise turn a
  * quality score into a DIVIDE_BY_ZERO error — and a curation quality
  * gate exists precisely to survive degenerate input. The guard maps
  * empty text to score 0 (filtered), identically in both engines.
  */
private[graft] object TextExprs {

  /** lowercase word tokens, empties dropped (split on non-alnum runs) */
  def toks(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  def toksSql(t: String): String =
    s"list_filter(string_split_regex(lower($t), '[^a-z0-9]+'), t -> length(t) > 0)"

  /** GPT-2-style pre-tokenizer regex (contractions | space-prefixed word |
    * space-prefixed number | space-prefixed punct run | whitespace run) —
    * the "BPE-ish" token count that tracks what a real BPE tokenizer
    * yields far closer than whitespace words (space-prefix merging is the
    * BPE vocab's dominant structure). Deliberately RE2/Java-compatible
    * (no lookaround, no \p classes) so Spark and DuckDB run the SAME
    * pattern. */
  private[graft] val bpePattern =
    // the punct run must INCLUDE the apostrophe (as GPT-2's does via
    // [^\s\p{L}\p{N}]): excluding it left a bare non-contraction '
    // matching nothing — the tiling property test caught the dropped
    // character. Contraction alternatives still win by first-match order.
    "'(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+"

  def bpeToks(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  def bpeToksSql(t: String): String =
    s"regexp_extract_all(lower($t), '${bpePattern.replace("'", "''")}')"

  /** character-class quality score: letters minus half-weighted digits,
    * per character (the q_text_quality / curation gate formula) */
  def qualityScore(text: Column): Column =
    (length(regexp_replace(text, "[^a-z]", "")) * 1.0 -
      lit(0.5) * length(regexp_replace(text, "[^0-9]", ""))) /
      greatest(length(text), lit(1))

  def qualityScoreSql(t: String): String =
    s"""(length(regexp_replace($t, '[^a-z]', '', 'g')) * 1.0
        - 0.5 * length(regexp_replace($t, '[^0-9]', '', 'g')))
        / greatest(length($t), 1)"""

  /** portable uniform draw for hash sampling: first two md5 hex chars of
    * the id — reproducible across engines, partitionings, and reruns */
  def hashDraw(id: Column): Column =
    substring(md5(id.cast("string")), 1, 2)

  def hashDrawSql(id: String): String =
    s"substring(md5(CAST($id AS VARCHAR)), 1, 2)"
}
