package graft.examples

import graft.{GraftSession, SparkEntry}
import graft.functions.TextHash
import graft.operators.TextExprs
import org.apache.spark.sql.functions._

/** Scale evidence for the text/dedup family PAST the sf0.1 testdata (r6
  * verdict #3): a generated million-document corpus with deliberately
  * hostile skew — one boilerplate sentence shared by EVERY document (the
  * hot-gram shape LLM corpora actually have: templated headers, license
  * blocks) plus injected subset-duplication pairs (every 1000th doc
  * wrapped in padding as a second doc). A raw gram-gram join would pay
  * C(1M, 2) ≈ 5·10^11 candidates for the boilerplate family alone; the
  * df-ordered prefix filters must keep candidates proportional to the
  * injected dup volume instead of corpus².
  *
  * Bodies are derived from md5(doc_id, position), so non-injected docs
  * share nothing but the boilerplate — dup volume is controlled
  * entirely by the injection rate, which is what lets the probe state
  * "candidates grow with dups, not docs²" as a measurement.
  *
  * Emits one JSON line per measured stage:
  *   docs, gram_rows, brute candidate-pair universe (Σ df·(df−1)/2),
  *   containment prefix-candidates + result pairs + secs,
  *   ppjoin result pairs + secs, snm/span/boilerplate rows + secs.
  *
  * Run: DEDUP_SCALE_DOCS=1000000 sbt "runMain graft.examples.DedupScale"
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("DEDUP_SCALE_DOCS", "1000000").toLong
    // injection rate: every Nth doc gets a wrapped duplicate — sweeping
    // this at fixed corpus size measures "candidates grow with dup
    // volume" directly (r6 verdict #3's acceptance shape)
    val dupEvery = sys.env.getOrElse("DEDUP_SCALE_DUP_EVERY", "1000").toLong
    val spark = GraftSession.get()

    // --- corpus: boilerplate + unique md5-derived body, schema matches
    // the testdata documents table so the declared rows run unmodified
    val boiler = "this document is provided under the standard license terms"
    val body = "array_join(transform(sequence(1, 24), " +
      "i -> concat('w', substring(md5(concat(id, '-', i)), 1, 6))), ' ')"
    val dir = GraftSession.tempDirCleanedOnExit("dedup-scale").toString
    val base = spark.range(nBase).select(
      col("id").as("doc_id"),
      concat(lit(boiler + " "), expr(body)).as("text"),
      lit("en").as("lang"),
      concat(lit("s"), pmod(col("id"), lit(5))).as("source"))
    // injected containment: every `dupEvery`-th doc re-appears wrapped
    // in pad tokens — the TRUE pairs the filters must not lose
    val wrapped = spark.range(0, nBase, dupEvery).select(
      (col("id") + 100000000L).as("doc_id"),
      concat(lit("padx pady padz "), lit(boiler + " "), expr(body),
        lit(" padp padq padr")).as("text"),
      lit("en").as("lang"),
      concat(lit("s"), pmod(col("id"), lit(5))).as("source"))
    base.unionByName(wrapped)
      .withColumn("n_chars", length(col("text")))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    // hashed grams — the element type the containment pipeline (and its
    // verify kernel) now requires
    val g = docs.select(col("doc_id"),
        explode(TextHash.ngramHashes(TextExprs.toks(col("text")), 3)).as("gram"))
      .localCheckpoint()
    val nGrams = g.count()
    val brutePairs = g.groupBy("gram").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2)).head.getDouble(0).toLong
    val hotDf = g.groupBy("gram").agg(count(lit(1)).as("df"))
      .agg(max("df")).head.getLong(0)

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"dedup_scale_$tag","docs":$nDocs,"rows":$n,"secs":$secs%.2f}""")
    }

    println(s"""{"metric":"dedup_scale_corpus","docs":$nDocs,"gram_rows":$nGrams,""" +
      s""""dup_every":$dupEvery,"brute_pairs":$brutePairs,"hot_gram_df":$hotDf}""")

    timed("containment_candidates") {
      graft.operators.Dedup.containmentCandidates(g, 0.8).count()
    }
    timed("containment_pairs") {
      graft.operators.Dedup.containmentPairs(g, 0.8).count()
    }
    graft.plans.Iterate.release(g)
    timed("ppjoin") { SparkEntry.queries("q_dedup_ppjoin")(spark, dir).count() }
    timed("snm") {
      SparkEntry.queries("q_dedup_snm")(spark, dir).count()
    }
    timed("span") { SparkEntry.queries("q_dedup_span")(spark, dir).count() }
    timed("boilerplate") {
      SparkEntry.queries("q_dedup_boilerplate")(spark, dir).count()
    }
    // exact-substring spans at corpus scale: the 9-token boilerplate sits
    // BELOW the 16-token window, so the df=1M hot sentence contributes
    // ZERO dup windows (every window crosses into a unique body); the
    // only duplicated runs are the injected base↔wrapped pairs' 33-token
    // boiler+body block — expected spans = exactly 2 per pair, all 33
    // tokens, at token-linear cost over 1M docs
    timed("substring_spans") {
      val spans = graft.operators.Dedup.maximalDupSpans(
        spark.read.parquet(s"$dir/documents.parquet"), 16)
        .localCheckpoint()
      val nSpans = spans.count()
      val nWrapped = (nBase + dupEvery - 1) / dupEvery
      val offLen = spans.filter(col("span_toks") =!= 33L).count()
      require(nSpans == 2 * nWrapped && offLen == 0,
        s"expected ${2 * nWrapped} spans of 33 tokens, got $nSpans with $offLen off-length")
      nSpans
    }
    spark.stop()
  }
}
