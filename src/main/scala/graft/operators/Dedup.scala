package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Everything is expressed with portable primitives (md5, substring,
  * sequence/explode) so each stage has an exact DuckDB oracle: a MinHash
  * value is the lexicographic MIN of salted md5 hex strings over character
  * shingles — identical in any engine with md5 — rather than an
  * engine-specific integer hash.
  *
  * Scale posture: every stage is a map + hash-aggregate on (doc, band/bit)
  * keys — shuffle width bounded by docs × bands, never docs². Candidate
  * pairs come only from equal LSH band signatures (the standard
  * shingle→minhash→band→bucket-join pipeline), so the pair join is sparse.
  */
object Dedup extends QueryModule {

  private val shingleLen = 8
  private val prefixLen = 160 // shingle window: first 160 normalized chars
  private val numHashes = 8
  private val bandRows = 4 // → 2 bands

  /** (doc_id, p, t): one row per shingle start position */
  private def shingleBase(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(col("doc_id"), lower(substring(col("text"), 1, prefixLen)).as("t"))
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - (shingleLen - 1))).as("p"), col("t"))

  /** (doc_id, j, minh): MinHash signature rows. One md5 yields 32 hex chars
    * = four independent 8-hex (32-bit) hash values, so the 8 hash families
    * need only TWO md5 calls per shingle (md5(sh), md5('x'||sh)) instead of
    * 8 salted ones — 4× less hashing on the dominant path, same oracle
    * portability. */
  private def minhashes(s: SparkSession, d: String): DataFrame = {
    // all 8 family-mins as ONE wide aggregate over the shingle rows — no 8×
    // row explode before the shuffle; the per-doc signature is unpivoted
    // afterwards from docs×1 wide rows (tiny)
    val mins = (0 until numHashes).map { j =>
      val m = if (j < 4) col("m1") else col("m2")
      min(substring(m, (j % 4) * 8 + 1, 8)).as(s"h$j")
    }
    val sig = shingleBase(s, d)
      .select(col("doc_id"), expr(s"substring(t, p, $shingleLen)").as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("m1"), md5(concat(lit("x"), col("sh"))).as("m2"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
    val pairs = (0 until numHashes).map(j => struct(lit(j).as("j"), col(s"h$j").as("minh")))
    sig.select(col("doc_id"), explode(array(pairs: _*)).as("jm"))
      .select(col("doc_id"), col("jm.j").cast("long").as("j"), col("jm.minh").as("minh"))
  }

  private val minhashSql =
    s"""sh AS (SELECT doc_id, substring(t, p, $shingleLen) AS sh FROM (
         SELECT doc_id, lower(substring(text, 1, $prefixLen)) AS t,
                unnest(generate_series(1, length(lower(substring(text, 1, $prefixLen))) - ${shingleLen - 1})) AS p
         FROM documents) b),
       shh AS (SELECT doc_id, md5(sh) AS m1, md5('x' || sh) AS m2 FROM sh),
       mh AS (SELECT doc_id, j,
         MIN(substring(CASE WHEN j < 4 THEN m1 ELSE m2 END, (j % 4) * 8 + 1, 8)) AS minh
         FROM shh CROSS JOIN (SELECT unnest(generate_series(0, ${numHashes - 1})) AS j) js
         GROUP BY doc_id, j)"""

  /** (doc_id, band, band_sig): LSH band signatures */
  private def bands(s: SparkSession, d: String): DataFrame =
    minhashes(s, d)
      .groupBy(col("doc_id"), (col("j") / bandRows).cast("long").as("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("j"), col("minh")))),
        x => x.getField("minh")), ",")).as("band_sig"))

  private val bandsSql =
    s"""bands AS (SELECT doc_id, j // $bandRows AS band,
         md5(string_agg(minh, ',' ORDER BY j)) AS band_sig
         FROM mh GROUP BY doc_id, j // $bandRows)"""

  override val defs: Seq[Q] = Seq(

    // exact dedup: content-hash groupBy per source
    Q("q_dedup_exact",
      (s, d) => Tables(s, d, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), countDistinct(md5(col("text"))).as("n_unique"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
              FROM documents GROUP BY source ORDER BY source""")),

    Q("q_dedup_minhash",
      (s, d) => bands(s, d).orderBy("doc_id", "band"),
      Some(s"""WITH $minhashSql, $bandsSql
               SELECT doc_id, band, band_sig FROM bands ORDER BY doc_id, band""")),

    // candidate near-dup pairs = docs sharing any band signature
    Q("q_dedup_minhash_pairs",
      (s, d) => {
        // materialize signatures once: the self-join otherwise recomputes
        // the full shingle→md5 pipeline for each side (AQE exchange reuse
        // does not apply across the differing band/sig join aliases)
        val b = bands(s, d).cache()
        b.as("a").join(b.as("b"),
            col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $minhashSql, $bandsSql
               SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
               ORDER BY doc_a, doc_b""")),

    // SimHash: 16-bit signature, per-bit majority vote over token hashes.
    // ONE md5 per token: hex char j of md5(tok) is an independent 4-bit
    // draw, so bit j votes on substring(md5, j+1, 1) < '8' — 16× less
    // hashing than salting md5 per (token, bit).
    Q("q_dedup_simhash",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("doc_id"), md5(col("tok")).as("m"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("j"), col("m"))
        .groupBy("doc_id", "j")
        .agg(sum(when(expr("substring(m, j + 1, 1)") < "8", 1).otherwise(-1)).as("vote"))
        .groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("j"),
          when(col("vote") >= 0, "1").otherwise("0").as("bit")))),
          x => x.getField("bit")), "").as("simhash"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, md5(tok) AS m FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
                FROM documents) t WHERE length(tok) > 0),
              votes AS (SELECT doc_id, j,
                SUM(CASE WHEN substring(m, j + 1, 1) < '8' THEN 1 ELSE -1 END) AS vote
                FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) js
                GROUP BY doc_id, j)
              SELECT doc_id,
                string_agg(CASE WHEN vote >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
              FROM votes GROUP BY doc_id ORDER BY doc_id""")),

    // n-gram Jaccard similarity of consecutive doc pairs (3-grams, first 120 chars)
    Q("q_dedup_jaccard",
      (s, d) => {
        val g = Tables(s, d, "documents")
          .select(col("doc_id"), lower(substring(col("text"), 1, 120)).as("t"))
          .select(col("doc_id"), explode(sequence(lit(1), length(col("t")) - 2)).as("p"), col("t"))
          .select(col("doc_id"), expr("substring(t, p, 3)").as("gram"))
          .distinct()
        val n = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = g.as("a").join(g.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 && col("a.gram") === col("b.gram"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("inter"))
        // no broadcast hint on n: it scales with the corpus — AQE picks
        // broadcast at small SF and shuffle join at scale
        inter
          .join(n.as("na"), col("doc_a") === col("na.doc_id"))
          .join(n.as("nb"), col("doc_b") === col("nb.doc_id"))
          .select(col("doc_a"), col("doc_b"),
            round(col("inter") * 1.0 / (col("na.n") + col("nb.n") - col("inter")), 6).as("jaccard"))
          .orderBy("doc_a")
      },
      Some("""WITH g AS (SELECT DISTINCT doc_id, substring(t, p, 3) AS gram FROM (
                SELECT doc_id, lower(substring(text, 1, 120)) AS t,
                       unnest(generate_series(1, length(lower(substring(text, 1, 120))) - 2)) AS p
                FROM documents) b),
              n AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
              i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 AND a.gram = b.gram
                GROUP BY a.doc_id, b.doc_id)
              SELECT doc_a, doc_b,
                ROUND(inter * 1.0 / (na.n + nb.n - inter), 6) AS jaccard
              FROM i JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
              ORDER BY doc_a"""))
  )
}
