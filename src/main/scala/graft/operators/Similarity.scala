package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the small query set, scan
  * candidates once, dot products via codegen'd higher-order functions, rank
  * with a per-query window. At 100 TB the same plan holds: queries are tiny
  * (broadcast), the candidate scan is embarrassingly parallel, and the
  * top-k window shuffles only (query × k) rows after partial aggregation.
  *
  * Scale path: LSH bucketing by random-hyperplane signs — deterministic
  * integer hyperplanes so the bucket assignment is reproducible in SQL.
  * Bucket join turns ANN into an equi-join on (bucket) instead of a cross
  * product.
  */
object Similarity extends QueryModule {

  private val topK = 10
  private val numPlanes = 8

  /** exploded (vec_id, pos [0-based], ev double) */
  private def exploded(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("ev").cast("double").as("ev"))

  override val defs: Seq[Q] = Seq(

    // brute-force cosine top-k: queries = vec_id < 5, candidates = the rest
    Q("q_sim_topk",
      (s, d) => {
        val e = exploded(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("pos"), col("ev").as("qv"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("pos"), col("ev").as("cv"))
        val sims = c.join(broadcast(q), "pos")
          .groupBy("q_id", "cand_id")
          .agg(round(sum(col("qv") * col("cv")) /
            (sqrt(sum(col("qv") * col("qv"))) * sqrt(sum(col("cv") * col("cv")))), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos FROM embeddings),
               q AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
               c AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= 5),
               sims AS (SELECT q_id, cand_id,
                 ROUND(SUM(qv * cv) / (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
                 FROM c JOIN q USING (pos) GROUP BY q_id, cand_id)
               SELECT q_id, rank, cand_id, sim FROM (
                 SELECT q_id, cand_id, sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
                 FROM sims) t
               WHERE rank <= $topK ORDER BY q_id, rank""")),

    // LSH bucketing: sign bits against deterministic integer hyperplanes
    // h_j[pos] = ((pos*31 + j*17) % 13) - 6
    Q("q_sim_lsh_bucket",
      (s, d) => {
        val e = exploded(s, d)
          .select(col("vec_id"), col("pos"), col("ev"),
            explode(sequence(lit(0), lit(numPlanes - 1))).as("j"))
          .withColumn("w", (col("pos") * 31 + col("j") * 17) % 13 - 6)
        e.groupBy("vec_id", "j")
          .agg(sum(col("ev") * col("w")).as("dot"))
          .groupBy("vec_id")
          .agg(array_join(transform(array_sort(collect_list(struct(col("j"),
            when(round(col("dot"), 6) >= 0, "1").otherwise("0").as("bit")))),
            x => x.getField("bit")), "").as("bucket"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos FROM embeddings),
               dots AS (SELECT vec_id, j, SUM(ev * ((pos * 31 + j * 17) % 13 - 6)) AS dot
                 FROM e CROSS JOIN (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS j) js
                 GROUP BY vec_id, j)
               SELECT vec_id,
                 string_agg(CASE WHEN ROUND(dot, 6) >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
               FROM dots GROUP BY vec_id ORDER BY vec_id""")),

    // embedding-cosine near-dup: pairs above threshold within same label
    // (label as a cheap blocking key — the IVF-style scale path)
    Q("q_sim_neardup",
      (s, d) => {
        val e = exploded(s, d)
        val lbl = Tables(s, d, "embeddings").select(col("vec_id"), col("label"))
        val el = e.join(lbl, "vec_id")
        val sims = el.as("a").join(el.as("b"),
            col("a.label") === col("b.label") && col("a.pos") === col("b.pos") &&
              col("a.vec_id") < col("b.vec_id"))
          .groupBy(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .agg(round(sum(col("a.ev") * col("b.ev")) /
            (sqrt(sum(col("a.ev") * col("a.ev"))) * sqrt(sum(col("b.ev") * col("b.ev")))), 6).as("sim"))
        sims.filter(col("sim") > 0.2).orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev,
                CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos FROM embeddings),
              el AS (SELECT e.vec_id, e.pos, e.ev, emb.label
                FROM e JOIN embeddings emb ON emb.vec_id = e.vec_id),
              sims AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                ROUND(SUM(a.ev * b.ev) / (SQRT(SUM(a.ev * a.ev)) * SQRT(SUM(b.ev * b.ev))), 6) AS sim
                FROM el a JOIN el b ON a.label = b.label AND a.pos = b.pos
                  AND a.vec_id < b.vec_id
                GROUP BY a.vec_id, b.vec_id)
              SELECT id_a, id_b, sim FROM sims WHERE sim > 0.2 ORDER BY id_a, id_b"""))
  )
}
