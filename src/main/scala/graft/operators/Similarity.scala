package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.VecOps.{cosine, vecDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column (`Array[Float]`).
  *
  * All three operators are ARRAY-NATIVE: vectors stay packed per row and dot
  * products run through the codegen'd `graft.functions.VecDot` loop. The
  * alternative (explode to (vec_id, pos, ev) rows and equi-join on pos)
  * multiplies the shuffled row count by the embedding dimension — 64× here,
  * fatal at 100 TB. Here:
  *
  *  - brute-force top-k: broadcast the tiny query set, one scan over
  *    candidates, per-query top-k window — candidate side never shuffles
  *    more than (queries × k) rows after partial ranking;
  *  - LSH buckets: 8 native dots per row against deterministic integer
  *    hyperplanes, zero shuffle until the final order;
  *  - near-dup: blocked on (label, LSH bucket) → equi-join with bounded
  *    block size, pairwise cosine inside each block.
  */
object Similarity extends QueryModule {

  private val topK = 10
  private val numPlanes = 8
  // product quantization: 64-dim embeddings → pqM subspaces of pqSub dims,
  // pqK codewords per subspace sampled deterministically (vec_id < pqK)
  private val pqM = 4
  private val pqSub = 16
  private val pqK = 8

  // cell-blocked DBSCAN: ε as a cosine floor, minPts counting the point
  // itself (so core ⇔ ≥ minPts−1 neighbors), and the unroll depth of the
  // oracle's min-label propagation — the engine side runs to fixpoint and
  // ASSERTS it converged within this many rounds (measured 8 at gate data)
  private val dbscanEps = 0.30
  private val dbscanMinPts = 4
  private val dbscanCcRounds = 10

  /** l1..l{dbscanCcRounds} min-label CTEs over `cedges` (the oracle half
    * of the q_ml_dbscan fixpoint loop; Dedup.clustersSqlCtes shape,
    * MATERIALIZED so DuckDB evaluates each round once, not re-inlined). */
  private val dbscanCcSql: String = (1 to dbscanCcRounds).map { i =>
    s"""l$i AS MATERIALIZED (SELECT v, MIN(lab) AS lab FROM (
         SELECT v, lab FROM l${i - 1}
         UNION ALL SELECT ce.v, l.lab FROM cedges ce JOIN l${i - 1} l ON ce.n = l.v) u
       GROUP BY v)"""
  }.mkString(",\n")

  /** Full DBSCAN oracle chain ending in roles(vec_id, role, cluster) —
    * shared by q_ml_dbscan and its per-cluster size readout so the two
    * can never drift. Parameterized on the cell-assignment CTEs (which
    * must end in cells(vec_id, cell)): the declared row blocks by the
    * seed quantizer, q_ml_dbscan_trained by the TRAINED one. */
  private def dbscanChain(cellsCtes: String): String =
    s"""$eSql, $cellsCtes,
       el AS (SELECT e.vec_id, e.pos, e.ev, c.cell
         FROM e JOIN cells c USING (vec_id)),
       dpairs AS (SELECT a.vec_id AS va, b.vec_id AS vb,
           ROUND(SUM(a.ev * b.ev) /
             (SQRT(SUM(a.ev * a.ev)) * SQRT(SUM(b.ev * b.ev))), 6) AS sim
         FROM el a JOIN el b ON a.cell = b.cell AND a.pos = b.pos
           AND a.vec_id < b.vec_id
         GROUP BY 1, 2 HAVING sim >= $dbscanEps),
       dedges AS MATERIALIZED (SELECT va AS v, vb AS n FROM dpairs
         UNION ALL SELECT vb, va FROM dpairs),
       score AS (SELECT v, COUNT(*) AS nb FROM dedges GROUP BY v),
       score_core AS MATERIALIZED (SELECT v FROM score
         WHERE nb >= ${dbscanMinPts - 1}),
       cedges AS MATERIALIZED (SELECT e.v, e.n FROM dedges e
         JOIN score_core a ON e.v = a.v JOIN score_core b ON e.n = b.v),
       l0 AS (SELECT v, v AS lab FROM score_core),
       $dbscanCcSql,
       brd AS (SELECT e.v, MIN(l.lab) AS blab FROM dedges e
         JOIN l$dbscanCcRounds l ON e.n = l.v
         WHERE e.v NOT IN (SELECT v FROM score_core) GROUP BY e.v),
       roles AS (SELECT c.vec_id,
           CASE WHEN l.lab IS NOT NULL THEN 'core'
                WHEN b.blab IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           COALESCE(l.lab, b.blab) AS cluster
         FROM cells c
         LEFT JOIN l$dbscanCcRounds l ON l.v = c.vec_id
         LEFT JOIN brd b ON b.v = c.vec_id)"""

  private lazy val dbscanSqlCtes: String = dbscanChain(ivfCellsSql)
  private lazy val dbscanTrainedSqlCtes: String = dbscanChain(trainedCellsSql)

  /** per-JVM scratch for the persisted IVF index (overwrite mode, removed
    * on exit — the Sources scratch pattern) */
  private lazy val ivfIndexDir: String =
    graft.GraftSession.tempDirCleanedOnExit("graft-ivf").resolve("idx").toString

  /** per-JVM scratch for the persisted PQ index: codes partitioned by
    * IVF cell + the codebook side relation (VERDICT r7 item 3). */
  private lazy val pqIndexDir: String =
    graft.GraftSession.tempDirCleanedOnExit("graft-pq").resolve("codes").toString
  private lazy val pqCbDir: String =
    graft.GraftSession.tempDirCleanedOnExit("graft-pq-cb").resolve("cb").toString

  /** Sign-bit LSH bucket string against deterministic integer hyperplanes
    * h_j[pos] = ((pos*31 + j*17) % 13) - 6 — one codegen'd dot per plane. */
  private def lshBucket(embCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dim = size(embCol)
    val bits = (0 until numPlanes).map { j =>
      val plane = transform(sequence(lit(0), dim - 1),
        p => (p * 31 + j * 17) % 13 - 6)
      when(round(vecDot(embCol, plane), 6) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Shared DuckDB CTE fragments (module convention, as in Dedup.scala's
    * minhashSql/bandsSql/pairsSql): every similarity oracle composes these
    * vals instead of re-typing the chains, so a later tweak to rounding,
    * tie-breaks, or centroid count cannot silently leave a composed
    * oracle (q_sim_recall) scoring against a stale formulation. */

  /** unnest embeddings to (vec_id, pos, ev) rows. */
  private[operators] val eSql =
    """e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos FROM embeddings)"""

  /** brute-force cosine sims for every (query, candidate) pair → bsims. */
  private[operators] val bruteSimsSql =
    """q AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
       c AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= 5),
       bsims AS (SELECT q_id, cand_id,
         ROUND(SUM(qv * cv) / (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
         FROM c JOIN q USING (pos) GROUP BY q_id, cand_id)"""

  /** seed centroids + argmax-dot cell assignment → cells (shared with the
    * live vector-ingest row's oracle in StreamingOps). */
  private[operators] val ivfCellsSql =
    """cen AS (SELECT vec_id AS c_id, pos, ev AS cv FROM e WHERE vec_id < 4),
       dots AS (SELECT e.vec_id, cen.c_id, ROUND(SUM(e.ev * cen.cv), 6) AS cdot
         FROM e JOIN cen USING (pos) GROUP BY e.vec_id, cen.c_id),
       cells AS (SELECT vec_id, c_id AS cell FROM dots
         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY cdot DESC, c_id) = 1)"""

  /** TRAINED-quantizer oracle chain (the SQL half of
    * [[trainedCentroids]]) ending in td2(vec_id, c_id, cdot) — shared
    * verbatim by q_sim_ivf_trained and q_ml_dbscan_trained so the two
    * rows can never score against different quantizers. */
  private[operators] val trainedQuantSql =
    """tseeds AS (SELECT vec_id AS c_id, pos, ev AS cv FROM e WHERE vec_id < 4),
       td1 AS (SELECT e.vec_id, s.c_id, ROUND(SUM(e.ev * s.cv), 6) AS cdot
         FROM e JOIN tseeds s USING (pos) GROUP BY e.vec_id, s.c_id),
       tcells1 AS (SELECT vec_id, c_id AS cell FROM td1
         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY cdot DESC, c_id) = 1),
       tcent AS (SELECT c.cell AS c_id, e.pos, ROUND(AVG(e.ev), 4) AS cv
         FROM e JOIN tcells1 c USING (vec_id) GROUP BY c.cell, e.pos),
       td2 AS MATERIALIZED (SELECT e.vec_id, tcent.c_id,
           ROUND(SUM(e.ev * tcent.cv), 6) AS cdot
         FROM e JOIN tcent USING (pos) GROUP BY e.vec_id, tcent.c_id)"""

  /** trained-quantizer assignment of EVERY vector, as a `cells` CTE —
    * the drop-in replacement for ivfCellsSql's seed assignment. */
  private val trainedCellsSql =
    s"""$trainedQuantSql,
       cells AS (SELECT vec_id, c_id AS cell FROM td2
         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY cdot DESC, c_id) = 1)"""

  /** single-probe IVF: cells + same-cell cosine sims → isims. */
  private val ivfSimsSql =
    s"""$ivfCellsSql,
       iq AS (SELECT e.vec_id AS q_id, e.pos, e.ev AS qv, cells.cell
         FROM e JOIN cells USING (vec_id) WHERE e.vec_id < 5),
       ic AS (SELECT e.vec_id AS cand_id, e.pos, e.ev AS cv, cells.cell
         FROM e JOIN cells USING (vec_id) WHERE e.vec_id >= 5),
       isims AS (SELECT iq.q_id, ic.cand_id,
         ROUND(SUM(iq.qv * ic.cv) / (SQRT(SUM(iq.qv * iq.qv)) * SQRT(SUM(ic.cv * ic.cv))), 6) AS sim
         FROM ic JOIN iq ON iq.cell = ic.cell AND iq.pos = ic.pos
         GROUP BY iq.q_id, ic.cand_id)"""

  /** PQ building blocks shared by q_sim_pq / q_sim_pq_recall / q_sim_ivfpq:
    * candidate codes (per (cand, subspace): nearest codeword by dot) and
    * per-query LUT (subspace dots vs every codeword, exact micro-units),
    * plus the ADC score join. Codebook = subvectors of vec_id < pqK. */
  /** Greedy k-center (Gonzalez) shared by q_sim_kcenter and its coverage
    * readout: returns the 5 expansion picks (rank, vec_id, radius at pick
    * time) and the (vec_id, center, dd) distance relation to ALL 6
    * selected centers for downstream assignment. Each round: one
    * broadcast join of the new center against the corpus + a LEAST fold
    * + an O(1) argmax collect — O(k·N·dim) work, O(N) state. */
  /** JL projected-space sims + 50-wide shortlist CTEs (expects prior
    * `pr` from [[jlPrSql]]) — shared by q_sim_jl_rerank and its recall
    * eval so the shortlist definition cannot drift between them. */
  private lazy val jlShortSql: String =
    s"""jq AS (SELECT vec_id AS q_id, ps AS qp FROM pr WHERE vec_id < 5),
       jc AS (SELECT vec_id AS cand_id, ps AS cp FROM pr WHERE vec_id >= 5),
       jsims AS (SELECT q_id, cand_id,
         ROUND(list_aggregate(list_transform(generate_series(1, $jlK),
             t -> qp[t] * cp[t]), 'sum') /
           GREATEST(sqrt(list_aggregate(list_transform(qp, p -> p * p), 'sum')) *
             sqrt(list_aggregate(list_transform(cp, p -> p * p), 'sum')),
             1e-12), 6) AS sim
         FROM jc CROSS JOIN jq),
       jshort AS (SELECT q_id, cand_id FROM (
           SELECT q_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS r0
           FROM jsims) t WHERE r0 <= 50)"""

  /** k-center greedy oracle scaffolding, shared by q_sim_kcenter and
    * q_sim_kcenter_assign (one definition of the recurrence — a tweak to
    * the distance rounding or the argmax tie-break cannot leave one row
    * scoring against a stale formulation). */
  private def kcenterDistSql(k: Int, centerSel: String): String =
    s"""d$k AS (SELECT a.vec_id,
         ROUND(1 - SUM(a.ev * b.ev) /
           (SQRT(SUM(a.ev * a.ev)) * SQRT(SUM(b.ev * b.ev))), 6) AS dd
       FROM e a JOIN ($centerSel) b USING (pos) GROUP BY a.vec_id)"""

  private val kcenterRoundsSql: String = (2 to 6).map { t =>
    s"""p$t AS (SELECT vec_id, mind FROM m${t - 1}
         ORDER BY mind DESC, vec_id LIMIT 1),
       ${kcenterDistSql(t, s"SELECT e.pos, e.ev FROM e JOIN p$t ON e.vec_id = p$t.vec_id")},
       m$t AS (SELECT m${t - 1}.vec_id, LEAST(m${t - 1}.mind, d$t.dd) AS mind
         FROM m${t - 1} JOIN d$t USING (vec_id))"""
  }.mkString(",\n")

  /** When `withAssign`, also materializes and returns the (vec_id,
    * center, dd) relation to ALL 6 centers — the CALLER owns that
    * checkpoint and must `Iterate.release` it after consuming (the
    * picks-only path skips the O(6N) materialization entirely). */
  private def kcenterGreedy(s: SparkSession, d: String, withAssign: Boolean)
      : (Seq[(Long, Long, Double)], DataFrame) = {
    val emb = Tables(s, d, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    def distTo(centerId: Long): DataFrame = emb.crossJoin(broadcast(
        emb.filter(col("vec_id") === centerId)
          .select(col("embedding").as("cemb"))))
      .select(col("vec_id"),
        round(lit(1.0) - cosine(col("embedding"), col("cemb")), 6).as("dd"))
    // one corpus pass per center: the seed relation is checkpointed and
    // reused for BOTH the running minimum and the assignment output
    // (two separate distTo(0) calls used to run the pass twice), and
    // each round's relation likewise computes once for both consumers
    val d0 = distTo(0L).localCheckpoint()
    val spent = scala.collection.mutable.ArrayBuffer[DataFrame](d0)
    var mind = d0.withColumnRenamed("dd", "mind")
    var allD = d0.select(col("vec_id"), lit(0L).as("center"), col("dd"))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (t <- 2L to 6L) {
      val p = mind.orderBy(desc("mind"), asc("vec_id")).limit(1).collect()(0)
      picks += ((t, p.getLong(0), p.getDouble(1)))
      val dNew = distTo(p.getLong(0)).localCheckpoint()
      spent += dNew
      allD = allD.unionByName(
        dNew.select(col("vec_id"), lit(p.getLong(0)).as("center"), col("dd")))
      val nextMind = mind.join(dNew, "vec_id")
        .select(col("vec_id"), least(col("mind"), col("dd")).as("mind"))
        .localCheckpoint() // bounded rounds; the argmax materialized it
      if (t > 2L) spent += mind // t == 2's mind IS d0, already tracked
      mind = nextMind
    }
    spent += mind
    // when requested, materialize the assignment relation BEFORE
    // dropping the cache — unpersisting first made the later consumer
    // recompute all six distance passes against the cold table — then
    // free the per-round pins it was built from
    val out = if (withAssign) allD.localCheckpoint() else null
    emb.unpersist()
    spent.foreach(graft.plans.Iterate.release)
    (picks.toSeq, out)
  }

  /** (vec_id, v: array<double>) relation the PQ chains consume. */
  private def embOf(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** DETERMINISTIC clustered embedding relation (r6 verdict #6): a
    * seeded mixture-of-centers transform of the real vectors —
    * v' = center(vec_id % 8) + v, center_j[pos] = ((pos·7 + j·13) % 11) − 5.
    * The 8 centers have norm ≈ 26 vs the unit-ish source vectors, so the
    * derived corpus has REAL cluster structure (the thing the testdata's
    * isotropic embeddings lack, which kept every PQ/IVF recall row at an
    * honest ~0.1-0.2). Declared as a query-local transform in BOTH
    * engines, so the recall comparison below runs on identical inputs. */
  private def clusteredEmb(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings").select(col("vec_id"),
      expr("transform(embedding, (x, p) -> " +
        "CAST((p*7 + (vec_id % 8)*13) % 11 - 5 AS DOUBLE) + CAST(x AS DOUBLE))").as("v"))

  private val clusteredESql =
    """e0 AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS ev,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos FROM embeddings),
       e AS (SELECT vec_id, pos, ((pos*7 + (vec_id % 8)*13) % 11) - 5 + ev AS ev FROM e0)"""

  /** per-subspace subvector projection over any (vec_id, v) relation:
    * id column name → (id, m, sv). */
  private def pqSubsOf(emb: DataFrame)(idCol: String): DataFrame = {
    val ms = (0 until pqM).map(m => lit(m))
    emb
      .select(col("vec_id").as(idCol), explode(array(ms: _*)).as("m"), col("v"))
      .select(col(idCol), col("m"),
        slice(col("v"), col("m") * pqSub + 1, lit(pqSub)).as("sv"))
  }

  private def pqSubs(s: SparkSession, d: String)(idCol: String): DataFrame =
    pqSubsOf(embOf(s, d))(idCol)

  /** seed codebook: subvectors of vec_id < pqK as (k, m, cbv). */
  private def pqSeedCb(s: SparkSession, d: String): DataFrame =
    pqSubs(s, d)("k").filter(col("k") < pqK)
      .select(col("k"), col("m"), col("sv").as("cbv"))

  /** candidate codes + query LUT against a given codebook (cb must have
    * columns (k, m, cbv)) over any (vec_id, v) relation. */
  private def pqCodesAndLutOf(emb: DataFrame,
      cb: DataFrame): (DataFrame, DataFrame) = {
    val subs = pqSubsOf(emb) _
    // ENCODE: per (candidate, subspace), nearest codeword by dot
    val codes = subs("cand_id").filter(col("cand_id") >= pqK)
      .join(broadcast(cb), "m")
      .withColumn("dot", round(vecDot(col("sv"), col("cbv")), 6))
      .groupBy(col("cand_id"), col("m"))
      .agg(max_by(col("k"), struct(col("dot"), -col("k"))).as("code_k"))
    // LUT: per (query, subspace, codeword), dot in exact micro-units
    val lut = subs("q_id").filter(col("q_id") < 5)
      .join(broadcast(cb), "m")
      .select(col("q_id"), col("m").as("lm"), col("k"),
        floor(vecDot(col("sv"), col("cbv")) * 1e6 + 0.5).cast("long").as("lut_u"))
    (codes, lut)
  }

  private def pqCodesAndLutVs(s: SparkSession, d: String,
      cb: DataFrame): (DataFrame, DataFrame) =
    pqCodesAndLutOf(embOf(s, d), cb)

  private def pqCodesAndLut(s: SparkSession, d: String): (DataFrame, DataFrame) =
    pqCodesAndLutVs(s, d, pqSeedCb(s, d))

  /** BUILD phase of the persisted PQ index (VERDICT r7 item 3 — the
    * build-once/query-many deployment the compute-only PQ rows lacked):
    * every candidate's pqM one-byte codes, tagged with its IVF cell and
    * written PARTITIONED BY CELL, plus the codebook as a small side
    * relation. At corpus scale the index is 16× smaller than the raw
    * vectors and encoding runs ONCE, not per query batch. */
  /** Memo: CONTENT fingerprint (Tables.fingerprint — path, sizes,
    * mtimes) of the corpus the on-disk PQ index currently serves, so a
    * dataset regenerated at the same path rebuilds instead of serving
    * a stale index (ADVICE r8). Build is idempotent per corpus per
    * JVM — exactly the build-once contract the rows gate — and an
    * APPEND invalidates it, so the next build call reconstructs a
    * clean index (PqPersistSpec's append test relies on rebuild
    * clearing appended vectors). */
  private val pqBuiltFor =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  private[graft] def pqPersistBuild(s: SparkSession, d: String): Unit = {
    val fp = Tables.fingerprint(d, "embeddings")
    if (pqBuiltFor.get == fp) return
    val emb = Tables(s, d, "embeddings")
    val cen = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
    val (codes, _) = pqCodesAndLut(s, d)
    val cCells = nearestCell(cen, emb.filter(col("vec_id") >= pqK)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")),
        "cand_id", "cemb2")
      .select(col("cand_id").as("cc_id"), col("cell"))
    codes.join(cCells, col("cand_id") === col("cc_id"))
      .select(col("cand_id"), col("m"), col("code_k"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(pqIndexDir)
    pqSeedCb(s, d).write.mode("overwrite").parquet(pqCbDir)
    pqBuiltFor.set(fp)
  }

  /** INCREMENTAL index maintenance: encode ONLY the new vectors against
    * the PERSISTED codebook and coarse centroids, and append their
    * (cand_id, codes, cell) rows to the existing cell partitions — no
    * rebuild, no touch of the already-encoded corpus. The ingest cost
    * is O(new vectors); search is unchanged (PqPersistSpec proves
    * append ≡ rebuild-on-union). This is what makes the persisted index
    * viable under continuous ingest at 100 TB: the codebook is frozen
    * at build time (the standard FAISS deployment contract — retrain
    * and rebuild only on drift). */
  private[graft] def pqPersistAppend(s: SparkSession, d: String,
      newEmb: DataFrame): Unit = {
    pqBuiltFor.set(null) // the index diverges from a clean build
    val emb = Tables(s, d, "embeddings")
    val cen = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
    val cb = s.read.parquet(pqCbDir)
    val codes = pqSubsOf(newEmb)("cand_id")
      .join(broadcast(cb), "m")
      .withColumn("dot", round(vecDot(col("sv"), col("cbv")), 6))
      .groupBy(col("cand_id"), col("m"))
      .agg(max_by(col("k"), struct(col("dot"), -col("k"))).as("code_k"))
    val cells = nearestCell(cen,
        newEmb.select(col("vec_id").as("cand_id"), col("v").as("cemb2")),
        "cand_id", "cemb2")
      .select(col("cand_id").as("cc_id"), col("cell"))
    codes.join(cells, col("cand_id") === col("cc_id"))
      .select(col("cand_id"), col("m"), col("code_k"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(pqIndexDir)
  }

  /** SEARCH phase over the on-disk PQ index: the probed cell set
    * (broadcast) DYNAMICALLY prunes the codes scan to the queries'
    * partition directories, and the ADC sum runs against a LUT built
    * from the LOADED codebook — the corpus is touched only as (cell,
    * pqM bytes) per surviving candidate. Kept separate from build so
    * PqPersistSpec can audit `dynamicpruning` on the codes scan plan. */
  private[graft] def pqPersistSearch(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    val cen = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
    val cb = s.read.parquet(pqCbDir)
    val qCells = nearestCell(cen, emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb")
      .select(col("q_id"), col("cell"))
    val lut = pqSubs(s, d)("q_id").filter(col("q_id") < 5)
      .join(broadcast(cb), "m")
      .select(col("q_id").as("lq_id"), col("m").as("lm"), col("k"),
        floor(vecDot(col("sv"), col("cbv")) * 1e6 + 0.5).cast("long").as("lut_u"))
    val scores = s.read.parquet(pqIndexDir)
      .join(broadcast(qCells), "cell")
      .join(broadcast(lut), col("lm") === col("m") &&
        col("k") === col("code_k") && col("lq_id") === col("q_id"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("lut_u")).as("adot_u"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("adot_u"), asc("cand_id"))
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("cand_id"), col("adot_u"))
      .orderBy("q_id", "rank")
  }

  /** seed codebook over any (vec_id, v) relation. */
  private def pqSeedCbOf(emb: DataFrame): DataFrame =
    pqSubsOf(emb)("k").filter(col("k") < pqK)
      .select(col("k"), col("m"), col("sv").as("cbv"))

  /** ONE Lloyd refinement of the seed codebook, per subspace: assign every
    * vector's subvector to its nearest seed codeword, recompute per-
    * (subspace, codeword, position) means (rounded at 4 like the IVF
    * trained quantizer — this value feeds another rounded compare).
    * Codewords that attract no vectors drop out, identically in the
    * oracle (group-by absence). */
  private def pqTrainedCb(s: SparkSession, d: String): DataFrame = {
    val subs = pqSubs(s, d) _
    val all = subs("vec_id")
    val a1 = all.join(broadcast(pqSeedCb(s, d)), "m")
      .withColumn("dot", round(vecDot(col("sv"), col("cbv")), 6))
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("k"), struct(col("dot"), -col("k"))).as("k"))
    a1.join(all, Seq("vec_id", "m"))
      .select(col("m"), col("k"), posexplode(col("sv")))
      .groupBy(col("m"), col("k"), col("pos"))
      .agg(round(avg(col("col")), 4).as("cv"))
      .groupBy(col("m"), col("k"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("cbv"))
      .select(col("k"), col("m"), col("cbv"))
  }

  /** ADC scores + top-5 ranking over a (codes, lut) pair — the one
    * definition of the join condition, the micro-unit sum, and the
    * (adot_u DESC, cand_id) tie-break, shared by the seed and trained PQ
    * rows so they cannot diverge from the shared SQL chain. */
  private def pqAdcTop(codes: DataFrame, lut: DataFrame): DataFrame = {
    // ADC: approximate dot = Σ_m lut[q, m, code[cand, m]], every query
    // against every candidate (the LUT join fans codes out per query)
    val scores = codes
      .join(broadcast(lut), col("lm") === col("m") && col("k") === col("code_k"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("lut_u")).as("adot_u"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("adot_u"), asc("cand_id"))
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("cand_id"), col("adot_u"))
      .orderBy("q_id", "rank")
  }

  /** IVF-RESIDUAL PQ top-5 (the FAISS IVFPQ default encoding): each
    * vector is split into coarse + fine parts — cell centroid (the IVF
    * quantizer, same argmax-dot assignment as q_sim_ivf) plus a PQ code
    * of the RESIDUAL v − centroid. Scoring is dot(q, centroid) EXACT
    * (4 cells × 5 queries of micro-unit dots) plus the residual's ADC
    * sum from a LUT of raw query subvectors against residual codewords:
    * dot(q, v) ≈ dot(q, c) + Σ_m lut[q, m, code_m(v−c)]. The residual
    * codebook samples vec_id ∈ [4, 4+pqK) — the centroid vectors
    * themselves (vec_id < 4) have zero residuals and would waste half
    * the codewords. Candidates stay vec_id ≥ pqK, so the recall
    * evaluator compares against q_sim_pq on the SAME candidate set. */
  private def pqResidualTop(s: SparkSession, d: String): DataFrame =
    pqResidualTopOf(embOf(s, d))

  private def pqResidualTopOf(emb: DataFrame): DataFrame = {
    val cen = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    // cell + that cell's centroid vector, per vector (ivfCellsSql recipe)
    val cells = emb.crossJoin(broadcast(cen))
      .withColumn("cdot", round(vecDot(col("v"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"),
        max_by(struct(col("c_id"), col("cv")),
          struct(col("cdot"), -col("c_id"))).as("cc"))
      .select(col("vec_id"), col("v"),
        col("cc.c_id").as("cell"), col("cc.cv").as("ccv"))
    val rsd = cells.select(col("vec_id"), col("cell"),
      zip_with(col("v"), col("ccv"), (a, b) => a - b).as("rv"))
    val ms = (0 until pqM).map(m => lit(m))
    val rsub = rsd.select(col("vec_id"), explode(array(ms: _*)).as("m"), col("rv"))
      .select(col("vec_id"), col("m"),
        slice(col("rv"), col("m") * pqSub + 1, lit(pqSub)).as("rsv"))
    val rcb = rsub.filter(col("vec_id") >= 4 && col("vec_id") < 4 + pqK)
      .select(col("vec_id").as("k"), col("m"), col("rsv").as("cbv"))
    val codes = rsub.filter(col("vec_id") >= pqK)
      .select(col("vec_id").as("cand_id"), col("m"), col("rsv"))
      .join(broadcast(rcb), "m")
      .withColumn("dot", round(vecDot(col("rsv"), col("cbv")), 6))
      .groupBy(col("cand_id"), col("m"))
      .agg(max_by(col("k"), struct(col("dot"), -col("k"))).as("code_k"))
    val qsub = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), explode(array(ms: _*)).as("m"), col("v"))
      .select(col("q_id"), col("m"),
        slice(col("v"), col("m") * pqSub + 1, lit(pqSub)).as("qsv"))
    val lut = qsub.join(broadcast(rcb), "m")
      .select(col("q_id"), col("m").as("lm"), col("k"),
        floor(vecDot(col("qsv"), col("cbv")) * 1e6 + 0.5).cast("long").as("lut_u"))
    val qcd = emb.filter(col("vec_id") < 5).crossJoin(broadcast(cen))
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"),
        floor(vecDot(col("v"), col("cv")) * 1e6 + 0.5).cast("long").as("qc_u"))
    val rsum = codes
      .join(broadcast(lut), col("lm") === col("m") && col("k") === col("code_k"))
      .groupBy(col("q_id"), col("cand_id")).agg(sum(col("lut_u")).as("r_u"))
    val scores = rsum
      .join(cells.select(col("vec_id").as("cand_id"), col("cell")), "cand_id")
      .join(broadcast(qcd), Seq("q_id", "cell"))
      .select(col("q_id"), col("cand_id"), (col("r_u") + col("qc_u")).as("adot_u"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("adot_u"), asc("cand_id"))
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("cand_id"), col("adot_u"))
      .orderBy("q_id", "rank")
  }

  /** residual-PQ chain (expects prior e + ivfCellsSql CTEs) → rpqtop. */
  private val pqResidualSql =
    s"""rsd AS (SELECT e.vec_id, e.pos, e.ev - cen.cv AS rv
         FROM e JOIN cells ON cells.vec_id = e.vec_id
         JOIN cen ON cen.c_id = cells.cell AND cen.pos = e.pos),
       rsub AS (SELECT vec_id, pos // $pqSub AS m, pos % $pqSub AS sp, rv FROM rsd),
       rcb AS (SELECT vec_id AS k, m, sp, rv AS cbv FROM rsub
         WHERE vec_id >= 4 AND vec_id < ${4 + pqK}),
       rcd AS (SELECT s.vec_id AS cand_id, s.m, c.k,
         ROUND(SUM(s.rv * c.cbv), 6) AS dot
         FROM rsub s JOIN rcb c ON s.m = c.m AND s.sp = c.sp
         WHERE s.vec_id >= $pqK GROUP BY cand_id, s.m, c.k),
       rcodes AS (SELECT cand_id, m, k AS code_k FROM rcd
         QUALIFY ROW_NUMBER() OVER (PARTITION BY cand_id, m
           ORDER BY dot DESC, k) = 1),
       qsb AS (SELECT vec_id, pos // $pqSub AS m, pos % $pqSub AS sp, ev
         FROM e WHERE vec_id < 5),
       rlut AS (SELECT s.vec_id AS q_id, s.m, c.k,
         CAST(FLOOR(SUM(s.ev * c.cbv) * 1e6 + 0.5) AS BIGINT) AS lut_u
         FROM qsb s JOIN rcb c ON s.m = c.m AND s.sp = c.sp
         GROUP BY q_id, s.m, c.k),
       qcd AS (SELECT e.vec_id AS q_id, cen.c_id AS cell,
         CAST(FLOOR(SUM(e.ev * cen.cv) * 1e6 + 0.5) AS BIGINT) AS qc_u
         FROM e JOIN cen USING (pos) WHERE e.vec_id < 5 GROUP BY q_id, cen.c_id),
       rsum AS (SELECT l.q_id, rc.cand_id, CAST(SUM(l.lut_u) AS BIGINT) AS r_u
         FROM rcodes rc JOIN rlut l ON l.m = rc.m AND l.k = rc.code_k
         GROUP BY l.q_id, rc.cand_id),
       rscores AS (SELECT r.q_id, r.cand_id, r.r_u + q.qc_u AS adot_u
         FROM rsum r JOIN cells cc ON cc.vec_id = r.cand_id
         JOIN qcd q ON q.q_id = r.q_id AND q.cell = cc.cell),
       rpqtop AS (SELECT q_id, cand_id, adot_u,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY adot_u DESC, cand_id) AS BIGINT) AS rank
         FROM rscores)"""

  /** round-6 cosine of every (query, candidate) pair — the bsims relation
    * both q_sim_topk and ML's q_ml_knn rank (SQL twin: bruteSimsSql). */
  private[operators] def bruteSims(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qemb"))
    val c = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cemb"))
    c.crossJoin(broadcast(q))
      .select(col("q_id"), col("cand_id"),
        round(cosine(col("qemb"), col("cemb")), 6).as("sim"))
  }

  /** product-quantization chain: subspace split → codebook → candidate
    * codes → per-query LUT (micro-units) → ADC scores. Shared by the
    * q_sim_pq oracle and the PQ recall evaluator's oracle. */
  private[operators] val pqScoresSql =
    s"""sub AS (SELECT vec_id, pos // $pqSub AS m, pos % $pqSub AS sp, ev FROM e),
       cb AS (SELECT vec_id AS k, m, sp, ev AS cbv FROM sub WHERE vec_id < $pqK),
       cd AS (SELECT s.vec_id AS cand_id, s.m, cb.k,
         ROUND(SUM(s.ev * cb.cbv), 6) AS dot
         FROM sub s JOIN cb ON s.m = cb.m AND s.sp = cb.sp
         WHERE s.vec_id >= $pqK GROUP BY cand_id, s.m, cb.k),
       codes AS (SELECT cand_id, m, k AS code_k FROM cd
         QUALIFY ROW_NUMBER() OVER (PARTITION BY cand_id, m
           ORDER BY dot DESC, k) = 1),
       lut AS (SELECT s.vec_id AS q_id, s.m, cb.k,
         CAST(FLOOR(SUM(s.ev * cb.cbv) * 1e6 + 0.5) AS BIGINT) AS lut_u
         FROM sub s JOIN cb ON s.m = cb.m AND s.sp = cb.sp
         WHERE s.vec_id < 5 GROUP BY q_id, s.m, cb.k),
       pqscores AS (SELECT q_id, cand_id, CAST(SUM(lut_u) AS BIGINT) AS adot_u
         FROM codes JOIN lut ON lut.m = codes.m AND lut.k = codes.code_k
         GROUP BY q_id, cand_id),
       pqtop AS (SELECT q_id, cand_id, adot_u,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY adot_u DESC, cand_id) AS BIGINT) AS rank
         FROM pqscores)"""

  /** trained-PQ chain on top of pqScoresSql's sub/cb: one Lloyd
    * refinement per subspace (assign all vectors to seed codewords,
    * per-(m,k,pos) means rounded at 4), then codes/LUT/ADC vs the
    * trained codebook → tpqtop. */
  private val pqTrainedSql =
    s"""ta1 AS (SELECT s.vec_id, s.m, cb.k, ROUND(SUM(s.ev * cb.cbv), 6) AS dot
         FROM sub s JOIN cb ON s.m = cb.m AND s.sp = cb.sp
         GROUP BY s.vec_id, s.m, cb.k),
       tasg AS (SELECT vec_id, m, k FROM ta1
         QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m
           ORDER BY dot DESC, k) = 1),
       tcb AS (SELECT a.m, a.k, s.sp, ROUND(AVG(s.ev), 4) AS cbv
         FROM tasg a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
         GROUP BY a.m, a.k, s.sp),
       tcd AS (SELECT s.vec_id AS cand_id, s.m, t.k,
         ROUND(SUM(s.ev * t.cbv), 6) AS dot
         FROM sub s JOIN tcb t ON s.m = t.m AND s.sp = t.sp
         WHERE s.vec_id >= $pqK GROUP BY cand_id, s.m, t.k),
       tcodes AS (SELECT cand_id, m, k AS code_k FROM tcd
         QUALIFY ROW_NUMBER() OVER (PARTITION BY cand_id, m
           ORDER BY dot DESC, k) = 1),
       tlut AS (SELECT s.vec_id AS q_id, s.m, t.k,
         CAST(FLOOR(SUM(s.ev * t.cbv) * 1e6 + 0.5) AS BIGINT) AS lut_u
         FROM sub s JOIN tcb t ON s.m = t.m AND s.sp = t.sp
         WHERE s.vec_id < 5 GROUP BY q_id, s.m, t.k),
       tscores AS (SELECT q_id, cand_id, CAST(SUM(lut_u) AS BIGINT) AS adot_u
         FROM tcodes JOIN tlut ON tlut.m = tcodes.m AND tlut.k = tcodes.code_k
         GROUP BY q_id, cand_id),
       tpqtop AS (SELECT q_id, cand_id, adot_u,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY adot_u DESC, cand_id) AS BIGINT) AS rank
         FROM tscores)"""

  /** exact-dot top-5 ground truth over the PQ candidate set → truth. */
  private val pqTruthSql =
    s"""xq AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
       xc AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= $pqK),
       xdots AS (SELECT q_id, cand_id, ROUND(SUM(qv * cv), 6) AS dot
         FROM xc JOIN xq USING (pos) GROUP BY q_id, cand_id),
       truth AS (SELECT q_id, cand_id FROM xdots
         QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY dot DESC, cand_id) <= 5)"""

  /** shared recall@5 tail: a pq top CTE LEFT-joined against truth. */
  private def pqRecallSql(topCte: String): String =
    s"""SELECT t.q_id, COUNT(p.cand_id) AS n_hits,
        ROUND(COUNT(p.cand_id) * 1.0 / COUNT(*), 6) AS recall
        FROM truth t LEFT JOIN (SELECT q_id, cand_id FROM $topCte WHERE rank <= 5) p
          ON p.q_id = t.q_id AND p.cand_id = t.cand_id
        GROUP BY t.q_id ORDER BY t.q_id"""

  /** recall@5 of a declared PQ search row against the exact-dot top-5
    * ground truth over the same candidate set. */
  private def pqRecallOf(s: SparkSession, d: String, pqQuery: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = emb.filter(col("vec_id") >= pqK)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val exact = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("cand_id"),
        round(vecDot(col("qv"), col("cv")), 6).as("dot"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("dot"), asc("cand_id"))
    val truth = exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select(col("q_id"), col("cand_id"))
    val pq = graft.SparkEntry.queries(pqQuery)(s, d)
      .select(col("q_id").as("pqq"), col("cand_id").as("pqc"))
    truth.join(pq, col("q_id") === col("pqq") && col("cand_id") === col("pqc"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(when(col("pqq").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        round(col("n_hits") * 1.0 / col("k"), 6).as("recall"))
      .orderBy("q_id")
  }

  /** JL projection shared by q_sim_jl_projection / q_sim_jl_recall:
    * (vec_id, embedding, pv = 16-dim ±1-projected vector / √16). The
    * sign matrix derives from the md5 draw stated longhand in the
    * oracle ([[jlPrSql]]), computed once and folded into codegen'd
    * VecDot literals. */
  private val jlK = 16
  private val jlD = 64
  private def jlProjected(s: SparkSession, d: String): DataFrame = {
    val signs = s.range(jlD.toLong * jlK)
      .selectExpr(s"id DIV $jlK AS i", s"id % $jlK AS j",
        s"""CAST(CASE WHEN CAST(conv(substring(md5(concat(
              CAST(id DIV $jlK AS STRING), '_',
              CAST(id % $jlK AS STRING))), 1, 8), 16, 10) AS BIGINT)
            % 2 = 0 THEN 1.0 ELSE -1.0 END AS DOUBLE) AS sgn""")
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2)))
      .toMap
    val rowsJ: Seq[Array[Double]] =
      (0 until jlK).map(j => (0 until jlD).map(i => signs((i, j))).toArray)
    val emb = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val withP = rowsJ.zipWithIndex.foldLeft(emb) { case (df, (row, j)) =>
      df.withColumn(s"p$j",
        vecDot(col("embedding"), typedLit(row)) / math.sqrt(jlK.toDouble))
    }
    withP.select(col("vec_id"), col("embedding"),
      array((0 until jlK).map(j => col(s"p$j")): _*).as("pv"))
  }

  /** the same projection as a DuckDB CTE `pr(vec_id, ne, ps)` */
  private val jlPrSql =
    s"""pr AS (SELECT vec_id,
         sqrt(list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS ne,
         list_transform(generate_series(0, ${jlK - 1}), j ->
           list_aggregate(list_transform(generate_series(1, $jlD), i ->
             CAST(embedding[i] AS DOUBLE) *
             (CASE WHEN CAST('0x' || substring(md5(
                 CAST(i - 1 AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                 1, 8) AS BIGINT) % 2 = 0
               THEN 1.0 ELSE -1.0 END)), 'sum') / sqrt($jlK.0)) AS ps
       FROM embeddings)"""

  /** rank a sims CTE per q_id by (sim DESC, cand_id) and keep the top k. */
  private def rankSql(simsCte: String, k: Int): String =
    s"""SELECT q_id, rank, cand_id, sim FROM (
          SELECT q_id, cand_id, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
          FROM $simsCte) t
        WHERE rank <= $k ORDER BY q_id, rank"""

  /** blocked (label, bucket) self-join cosine pairs → nsims(id_a, id_b,
    * sim) — shared by q_sim_neardup's oracle and the cross-modal
    * q_dedup_semantic composition in Dedup.scala. Expects prior `e` and
    * `buckets` CTEs ([[eSql]], [[lshBucketSql]]). */
  private[operators] val neardupSimsSql =
    """el AS (SELECT e.vec_id, e.pos, e.ev, emb.label, b.bucket
         FROM e JOIN embeddings emb ON emb.vec_id = e.vec_id
                JOIN buckets b ON b.vec_id = e.vec_id),
       nsims AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(SUM(a.ev * b.ev) / (SQRT(SUM(a.ev * a.ev)) * SQRT(SUM(b.ev * b.ev))), 6) AS sim
         FROM el a JOIN el b ON a.label = b.label AND a.bucket = b.bucket
           AND a.pos = b.pos AND a.vec_id < b.vec_id
         GROUP BY a.vec_id, b.vec_id)"""

  /** DuckDB CTEs computing the same bucket per vec_id (expects a prior
    * `e(vec_id, pos, ev)` unnested CTE, [[eSql]]). */
  private[operators] val lshBucketSql =
    s"""lshdots AS (SELECT vec_id, j, SUM(ev * ((pos * 31 + j * 17) % 13 - 6)) AS dot
         FROM e CROSS JOIN (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS j) js
         GROUP BY vec_id, j),
       buckets AS (SELECT vec_id,
         string_agg(CASE WHEN ROUND(dot, 6) >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
         FROM lshdots GROUP BY vec_id)"""

  /** Nearest-cell assignment (argmax dot over broadcast centroids) as ONE
    * hash aggregate: `max_by` keyed on (cdot, -c_id) replaces a
    * row_number window — the window shuffles AND SORTS centroids×corpus
    * rows, while the aggregate partial-combines map-side down to one row
    * per vector before any exchange. Ties break to the lowest c_id,
    * exactly like the window's (desc cdot, asc c_id) order. */
  private def nearestCell(cen: DataFrame, v: DataFrame,
      idCol: String, embCol: String): DataFrame =
    v.crossJoin(broadcast(cen))
      .withColumn("cdot", round(vecDot(col(embCol), col("cemb")), 6))
      .groupBy(col(idCol))
      .agg(first(col(embCol)).as(embCol), // constant within each id group
        max_by(col("c_id"), struct(col("cdot"), -col("c_id"))).as("cell"))
      .select(col(idCol), col(embCol), col("cell"))

  /** TRAINED coarse quantizer — one Lloyd refinement of the 4 seed
    * centroids over the full corpus, shared by q_sim_ivf_trained and
    * q_ml_dbscan_trained (one definition; the gate's density clustering
    * exercises the SAME quantizer the search row certifies).
    * Centroid means round at 4 decimals (not the usual 6): this value
    * feeds ANOTHER rounded-compare layer (the second assignment pass),
    * and the coarser grid keeps the engines' ~1-ulp summation-order
    * differences far from any rounding boundary.
    * Residual risk (ADVICE r2, accepted + documented): a mean landing
    * within ~1 ulp of a 1e-4 grid line could still round differently
    * per engine and flip a second-pass assignment — data-dependent,
    * not eliminated by any finite grid. Sized: cell means over ≥100s
    * of uniform draws land on a grid line with probability ~1e-12 per
    * (cell, pos); at 4×64 positions that is ~1e-9 per run, and a flip
    * additionally needs the two nearest centroids within the same ulp.
    * The bit-exact check is kept (it pins the full quantizer math,
    * which a recall-invariant would not); if a future SF ever trips
    * the boundary, demote to a recall-vs-brute-force invariant row. */
  private def trainedCentroids(s: SparkSession, d: String): DataFrame = {
    val emb = Tables(s, d, "embeddings")
    val seeds0 = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
    val a1 = nearestCell(seeds0, emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding")
    a1.select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("col")), 4).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cemb"))
      .select(col("cell").as("c_id"), col("cemb"))
  }

  override val defs: Seq[Q] = Seq(

    // brute-force cosine top-k: queries = vec_id < 5, candidates = the rest
    Q("q_sim_topk",
      (s, d) => {
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        bruteSims(s, d).withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $bruteSimsSql
               ${rankSql("bsims", topK)}""")),

    // LATE-INTERACTION retrieval (ColBERT-style MaxSim): treat each
    // vector's 4 subspace slices as its "token embeddings" and score a
    // (query, candidate) pair as Σ over query slices of the MAX dot
    // against any candidate slice — the multi-vector ranking that
    // preserves per-token matching where single-vector cosine averages
    // it away. Shares the PQ chain's subvector projection; dots are
    // codegen'd VecDot over 16-dim slices, rounded at 6 before the max
    // so every argmax is decided identically. The query side is an
    // O(queries·slices) broadcast; at corpus scale the candidate set
    // comes from a first-stage retriever (the IVF/PQ rows) exactly as
    // the rerank rows stage it.
    Q("q_sim_late_interaction",
      (s, d) => {
        val qsubs = pqSubs(s, d)("q_id").filter(col("q_id") < 5)
          .select(col("q_id"), col("m").as("mq"), col("sv").as("qv"))
        val csubs = pqSubs(s, d)("cand_id").filter(col("cand_id") >= 5)
          .select(col("cand_id"), col("m").as("mc"), col("sv").as("cv"))
        csubs.crossJoin(broadcast(qsubs))
          .withColumn("dot", round(vecDot(col("qv"), col("cv")), 6))
          .groupBy("q_id", "cand_id", "mq").agg(max("dot").as("best"))
          .groupBy("q_id", "cand_id").agg(round(sum("best"), 6).as("score"))
          .withColumn("rank", row_number().over(Window.partitionBy("q_id")
            .orderBy(desc("score"), asc("cand_id"))).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("rank"), col("cand_id"), col("score"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql,
              sub AS (SELECT vec_id, pos // $pqSub AS m, pos % $pqSub AS sp, ev
                FROM e),
              qs AS (SELECT vec_id AS q_id, m AS mq, sp, ev AS qv FROM sub
                WHERE vec_id < 5),
              cs AS (SELECT vec_id AS cand_id, m AS mc, sp, ev AS cv FROM sub
                WHERE vec_id >= 5),
              dots AS (SELECT q_id, cand_id, mq, mc,
                  ROUND(SUM(qv * cv), 6) AS dot
                FROM cs JOIN qs USING (sp) GROUP BY 1, 2, 3, 4),
              best AS (SELECT q_id, cand_id, mq, MAX(dot) AS best
                FROM dots GROUP BY 1, 2, 3),
              sc AS (SELECT q_id, cand_id, ROUND(SUM(best), 6) AS score
                FROM best GROUP BY 1, 2)
              SELECT q_id, rank, cand_id, score FROM (
                SELECT q_id, cand_id, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY score DESC, cand_id) AS BIGINT) AS rank
                FROM sc) r
              WHERE rank <= 3 ORDER BY q_id, rank""")),

    // RANGE (fixed-radius) search: every candidate within cosine >= 0.3
    // of each query — the radius API beside top-k (vector stores expose
    // both; dedup-by-similarity wants radius, retrieval wants top-k).
    // Same broadcast-query scan; the threshold compares the ROUNDED
    // similarity, so the boundary decision is identical in both engines.
    // At corpus scale the brute scan swaps for the IVF/PQ candidate
    // generators exactly as the top-k rows do.
    Q("q_sim_range",
      (s, d) => bruteSims(s, d).filter(col("sim") >= 0.3)
        .select(col("q_id"), col("cand_id"), col("sim"))
        .orderBy("q_id", "cand_id"),
      Some(s"""WITH $eSql, $bruteSimsSql
               SELECT q_id, cand_id, sim FROM bsims WHERE sim >= 0.3
               ORDER BY q_id, cand_id""")),

    // GREEDY K-CENTER coreset selection (Gonzalez farthest-point): seed
    // at vec_id 0, then 5 rounds of "pick the point farthest from every
    // selected center" under rounded cosine distance — the diversity
    // subset selector training-data pipelines run to cover an embedding
    // space with a budget (the k-center objective bounds the covering
    // radius within 2× of optimal). Each round is ONE broadcast join of
    // the single new center against the corpus + a LEAST fold of the
    // running min-distance + an O(1) argmax collect: O(k·N·dim) total
    // work, O(N) state, k constant — the shape that survives 100×.
    // Output = the 5 expansion picks with the covering radius of the
    // previously-selected set at pick time (monotonically shrinking).
    // Distances round at 6 on both engines so every argmax tie-break
    // (DESC dist, ASC vec_id) is decided identically.
    Q("q_sim_kcenter",
      (s, d) => {
        import s.implicits._
        kcenterGreedy(s, d, withAssign = false)._1
          .toDF("rank", "vec_id", "radius").orderBy("rank")
      },
      Some {
        val out = (2 to 6).map(t =>
          s"SELECT CAST($t AS BIGINT) AS rank, vec_id, mind AS radius FROM p$t")
          .mkString(" UNION ALL ")
        s"""WITH $eSql,
            ${kcenterDistSql(1, "SELECT pos, ev FROM e WHERE vec_id = 0")},
            m1 AS (SELECT vec_id, dd AS mind FROM d1),
            $kcenterRoundsSql
            $out ORDER BY rank"""
      }),

    // K-CENTER COVERAGE readout: assign every vector to its nearest of
    // the 6 selected centers and report per-center population and
    // mean/max distance — the balance-and-coverage audit run after a
    // diversity selection (a center owning half the corpus or a max
    // distance near the pick-time radius both read directly off this).
    // Same greedy as q_sim_kcenter; assignment is an argmin window over
    // the O(k·N) distance relation the greedy already computed.
    Q("q_sim_kcenter_assign",
      (s, d) => {
        val allD = kcenterGreedy(s, d, withAssign = true)._2
        // checkpoint the O(k) aggregate, then release the O(6N)
        // assignment relation it folded from — nothing stays pinned
        val out = allD.withColumn("rk",
            row_number().over(Window.partitionBy("vec_id")
              .orderBy(asc("dd"), asc("center"))))
          .filter(col("rk") === 1)
          .groupBy("center")
          .agg(count(lit(1)).as("n"),
            round(avg("dd"), 6).as("avg_dist"),
            round(max("dd"), 6).as("max_dist"))
          .orderBy("center")
          .localCheckpoint()
        graft.plans.Iterate.release(allD)
        out
      },
      Some {
        val unioned = (2 to 6).map(t =>
          s"SELECT d$t.vec_id, p$t.vec_id AS center, dd FROM d$t CROSS JOIN p$t")
          .mkString(" UNION ALL ")
        s"""WITH $eSql,
            ${kcenterDistSql(1, "SELECT pos, ev FROM e WHERE vec_id = 0")},
            m1 AS (SELECT vec_id, dd AS mind FROM d1),
            $kcenterRoundsSql,
            ad AS (SELECT vec_id, CAST(0 AS BIGINT) AS center, dd FROM d1
              UNION ALL $unioned),
            assigned AS (SELECT vec_id, center, dd FROM ad
              QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dd, center) = 1)
            SELECT center, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(AVG(dd), 6) AS avg_dist, ROUND(MAX(dd), 6) AS max_dist
            FROM assigned GROUP BY center ORDER BY center"""
      }),

    // MMR DIVERSIFIED re-ranking (maximal marginal relevance, λ = 0.7):
    // from each query's top-10 cosine candidates, greedily pick 5 that
    // balance relevance against redundancy — score = 0.7·sim(q,c) −
    // 0.3·max_{s∈selected} sim(c,s). The retrieval dedup that keeps a
    // RAG context window from quoting the same passage five times. The
    // candidate pool and its pairwise similarity matrix are computed
    // DISTRIBUTED (per-query top-k window + an O(q·k²) bounded
    // self-join); only the O(q·k) greedy fold runs on the driver — k is
    // a constant, so the driver work is scale-free. Every similarity
    // rounds at 6 and the 0.7/0.3 decimal literals are stated
    // identically on both engines, so the greedy path is exactly
    // reproducible; the oracle unrolls all 5 selection steps.
    Q("q_sim_mmr",
      (s, d) => {
        import s.implicits._
        import graft.functions.VecOps
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("cand_id"))
        val cand = bruteSims(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).select("q_id", "cand_id", "sim")
          .localCheckpoint()
        val emb = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val ce = cand.join(emb, col("cand_id") === col("vec_id"))
          .select(col("q_id"), col("cand_id"), col("embedding"))
        val cc = ce.as("a").join(ce.as("b"),
            col("a.q_id") === col("b.q_id") && col("a.cand_id") =!= col("b.cand_id"))
          .select(col("a.q_id").as("q_id"), col("a.cand_id").as("c1"),
            col("b.cand_id").as("c2"),
            round(VecOps.cosine(col("a.embedding"), col("b.embedding")), 6).as("ccsim"))
        val candRows = cand.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val ccMap = cc.collect()
          .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
        graft.plans.Iterate.release(cand)
        // 7, not 6: the score is an EXACT 7-decimal value (0.7/0.3 times
        // 6-decimal sims), so rounding at 6 hits .5 half-boundaries
        // constantly and binary noise makes the half-round engine-divergent;
        // at 7 the nearest boundary is 5e-8 away — unambiguous
        def r7(x: Double) = BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
        val out = candRows.groupBy(_._1).toSeq.flatMap { case (q, cs0) =>
          var remaining = cs0.map(c => (c._2, c._3)).toList
          var selected = List.empty[Long]
          (1 to 5).map { rank =>
            val scored = remaining.map { case (cid, sim) =>
              val pen = if (selected.isEmpty) 0.0
                else selected.map(sid => ccMap((q, cid, sid))).max
              (cid, r7(0.7 * sim - 0.3 * pen))
            }
            val (bestId, bestScore) = scored.minBy { case (cid, sc) => (-sc, cid) }
            selected ::= bestId
            remaining = remaining.filterNot(_._1 == bestId)
            (q, rank.toLong, bestId, bestScore)
          }
        }
        out.toDF("q_id", "rank", "cand_id", "score").orderBy("q_id", "rank")
      },
      Some(mmrSql)),

    // Hard-NEGATIVE mining (contrastive-training data prep): for each
    // anchor, the top-k most-similar candidates with a DIFFERENT label —
    // the negatives that actually move an embedding model, vs random ones.
    // Same broadcast-anchor / top-k-window shape as q_sim_topk with a
    // label anti-predicate; at corpus scale the brute pass swaps for the
    // IVF/PQ candidate generators declared above, the ranking is unchanged.
    Q("q_sim_hardneg",
      (s, d) => {
        val lbl = Tables(s, d, "embeddings").select(col("vec_id"), col("label"))
        val sims = bruteSims(s, d)
          .join(broadcast(lbl.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("label").as("q_lbl"))), Seq("q_id"))
          .join(lbl.select(col("vec_id").as("cand_id"), col("label").as("c_lbl")),
            Seq("cand_id"))
          .filter(col("q_lbl") =!= col("c_lbl"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("cand_id"),
            col("c_lbl").cast("long").as("neg_label"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $bruteSimsSql,
               ql AS (SELECT vec_id AS q_id, label AS q_lbl FROM embeddings WHERE vec_id < 5),
               cl AS (SELECT vec_id AS cand_id, label AS c_lbl FROM embeddings WHERE vec_id >= 5),
               hs AS (SELECT b.q_id, b.cand_id, b.sim, cl.c_lbl
                      FROM bsims b JOIN ql USING (q_id) JOIN cl USING (cand_id)
                      WHERE ql.q_lbl <> cl.c_lbl)
               SELECT q_id, rank, cand_id, CAST(c_lbl AS BIGINT) AS neg_label, sim FROM (
                 SELECT q_id, cand_id, sim, c_lbl,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
                 FROM hs) t
               WHERE rank <= $topK ORDER BY q_id, rank""")),

    // INT8 scalar-quantized top-k — the memory/bandwidth scale path for
    // 100 TB embedding corpora: per-vector symmetric quantization
    // (s = max|v|/127, q_i = floor(v_i/s + 0.5) ∈ [-127,127]) shrinks the
    // candidate side 4× vs float32, and every quantized dot/norm is EXACT
    // integer arithmetic (|q_i|≤127 → 64-term dot ≤ 2^20, exactly
    // representable) — bit-identical across engines by construction, with
    // floor(x+0.5) as the rounding both sides so no half-even ambiguity.
    // Same broadcast-query/top-k-window shape as q_sim_topk.
    Q("q_sim_quantized",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val qz = emb
          .withColumn("s",
            greatest(array_max(transform(col("v"), x => abs(x))) / 127.0, lit(1e-12)))
          .select(col("vec_id"),
            transform(col("v"), x => floor(x / col("s") + lit(0.5))).as("qv"))
        val q = qz.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("qv").as("qq"))
        val c = qz.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("qv").as("cq"))
        val sims = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("cand_id"),
            round(vecDot(col("qq"), col("cq")) /
              (sqrt(vecDot(col("qq"), col("qq"))) * sqrt(vecDot(col("cq"), col("cq")))),
              6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql,
               sc AS (SELECT vec_id, GREATEST(MAX(ABS(ev)) / 127, 1e-12) AS s
                 FROM e GROUP BY vec_id),
               qt AS (SELECT e.vec_id, e.pos, FLOOR(e.ev / sc.s + 0.5) AS qv
                 FROM e JOIN sc USING (vec_id)),
               q AS (SELECT vec_id AS q_id, pos, qv AS qq FROM qt WHERE vec_id < 5),
               c AS (SELECT vec_id AS cand_id, pos, qv AS cq FROM qt WHERE vec_id >= 5),
               sims AS (SELECT q_id, cand_id,
                 ROUND(SUM(qq * cq) / (SQRT(SUM(qq * qq)) * SQRT(SUM(cq * cq))), 6) AS sim
                 FROM c JOIN q USING (pos) GROUP BY q_id, cand_id)
               ${rankSql("sims", topK)}""")),

    // JOHNSON-LINDENSTRAUSS RANDOM PROJECTION — the dimensionality-
    // reduction leg of the compression family (int8 shrinks the
    // ELEMENTS, PQ the CODES; JL shrinks the DIMENSION): 64-dim
    // embeddings × a deterministic ±1 Rademacher matrix / √k → 16-dim,
    // norms preserved in expectation (Achlioptas 2003 — sign matrices
    // suffice; no Gaussian needed). The matrix derives from the SAME
    // md5 draw both engines state longhand (the ANF register recipe),
    // computed ONCE (1,024 rows collected to the driver) and folded
    // into k codegen'd VecDot literals — per row the projection is 16
    // native dot products, no explode, no shuffle. Output: exact vs
    // projected norm per vector, the distortion a JL consumer monitors.
    Q("q_sim_jl_projection",
      (s, d) => {
        val pr = jlProjected(s, d)
        val normJl = sqrt(vecDot(col("pv"), col("pv")))
        val normEx = sqrt(vecDot(col("embedding"), col("embedding")))
        pr.select(col("vec_id"),
            round(normEx, 6).as("norm_exact"),
            round(normJl, 6).as("norm_jl"),
            round(when(normEx === 0, 1.0).otherwise(normJl / normEx), 6)
              .as("norm_ratio"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $jlPrSql
              SELECT vec_id, ROUND(ne, 6) AS norm_exact,
                ROUND(sqrt(list_aggregate(list_transform(ps, p -> p * p), 'sum')), 6)
                  AS norm_jl,
                ROUND(CASE WHEN ne = 0 THEN 1.0 ELSE
                  sqrt(list_aggregate(list_transform(ps, p -> p * p), 'sum')) / ne
                  END, 6) AS norm_ratio
              FROM pr ORDER BY vec_id""")),

    // JL RECALL — what the projection BUYS as an ANN pre-filter:
    // cosine top-10 ranked in the 16-dim JL space vs the exact 64-dim
    // top-10 (q_sim_topk's relation), recall@10 per query. The search
    // itself runs 4× less arithmetic and 4× less candidate IO per pair;
    // this row measures the accuracy that costs — the
    // distortion-vs-speed dial a 100 TB embedding sweep tunes (project
    // once, shortlist in JL space at a widened k', exact-rerank the
    // shortlist). The isotropic testdata is the ADVERSARIAL case
    // (near-uniform cosines scramble under any distortion), so the
    // measured recall is the floor a clustered real corpus improves on.
    Q("q_sim_jl_recall",
      (s, d) => {
        val pr = jlProjected(s, d).select(col("vec_id"), col("pv"))
        val q = pr.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("pv").as("qp"))
        val c = pr.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("pv").as("cp"))
        val sims = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("cand_id"),
            round(vecDot(col("qp"), col("cp")) /
              greatest(sqrt(vecDot(col("qp"), col("qp"))) *
                sqrt(vecDot(col("cp"), col("cp"))), lit(1e-12)), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        val jlTop = sims.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= topK)
          .select(col("q_id").as("jq"), col("cand_id").as("jc"))
        val wx = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        val truth = bruteSims(s, d).withColumn("rank", row_number().over(wx))
          .filter(col("rank") <= topK).select(col("q_id"), col("cand_id"))
        truth.join(jlTop,
            col("q_id") === col("jq") && col("cand_id") === col("jc"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"),
            sum(when(col("jq").isNotNull, 1L).otherwise(0L)).as("n_hits"))
          .select(col("q_id"), col("n_hits"),
            round(col("n_hits") * 1.0 / col("k"), 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $jlPrSql, $eSql, $bruteSimsSql,
               jq AS (SELECT vec_id AS q_id, ps AS qp FROM pr WHERE vec_id < 5),
               jc AS (SELECT vec_id AS cand_id, ps AS cp FROM pr WHERE vec_id >= 5),
               jsims AS (SELECT q_id, cand_id,
                 ROUND(list_aggregate(list_transform(generate_series(1, $jlK),
                     t -> qp[t] * cp[t]), 'sum') /
                   GREATEST(sqrt(list_aggregate(list_transform(qp, p -> p * p), 'sum')) *
                     sqrt(list_aggregate(list_transform(cp, p -> p * p), 'sum')),
                     1e-12), 6) AS sim
                 FROM jc CROSS JOIN jq),
               jltop AS (SELECT q_id, cand_id FROM (
                   SELECT q_id, cand_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
                   FROM jsims) t WHERE rank <= $topK),
               truth AS (SELECT q_id, cand_id FROM (
                   SELECT q_id, cand_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
                   FROM bsims) t WHERE rank <= $topK)
               SELECT t.q_id, CAST(COUNT(j.cand_id) AS BIGINT) AS n_hits,
                 ROUND(COUNT(j.cand_id) * 1.0 / COUNT(*), 6) AS recall
               FROM truth t LEFT JOIN jltop j
                 ON j.q_id = t.q_id AND j.cand_id = t.cand_id
               GROUP BY t.q_id ORDER BY t.q_id""")),

    // TWO-STAGE JL serving (shortlist + exact rerank — the q_sim_pq_refined
    // pattern on the dimension axis): rank ALL candidates in the cheap
    // 16-dim JL space, keep a 5×-widened top-50 shortlist, exact-rerank
    // only those in full 64-dim precision. The corpus-wide pass runs 4×
    // less arithmetic per pair and the full-precision reads are bounded
    // by queries × 50 — the deployment that makes JL's low DIRECT
    // ranking fidelity (q_sim_jl_recall) usable. Measured at sf0.01 on
    // the adversarial isotropic corpus: direct recall@10 mean 0.20 →
    // two-stage 0.46 at a 10%-of-candidates shortlist (the width is
    // the reads-for-recall knob, same as q_sim_pq_refined's).
    Q("q_sim_jl_rerank",
      (s, d) => {
        val pr = jlProjected(s, d).select(col("vec_id"), col("pv"))
        val jq = pr.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("pv").as("qp"))
        val jc = pr.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("pv").as("cp"))
        val jsims = jc.crossJoin(broadcast(jq))
          .select(col("q_id"), col("cand_id"),
            round(vecDot(col("qp"), col("cp")) /
              greatest(sqrt(vecDot(col("qp"), col("qp"))) *
                sqrt(vecDot(col("cp"), col("cp"))), lit(1e-12)), 6).as("sim"))
        val w0 = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        val short = jsims.withColumn("r0", row_number().over(w0))
          .filter(col("r0") <= 50).select("q_id", "cand_id")
        val emb = Tables(s, d, "embeddings")
        val q64 = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb"))
        val rr = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cemb"))
          .join(broadcast(short), Seq("cand_id"))
          .join(broadcast(q64), Seq("q_id"))
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb")), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        rr.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= topK)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $jlPrSql, $eSql, $bruteSimsSql,
               $jlShortSql,
               rr AS (SELECT b.q_id, b.cand_id, b.sim
                 FROM bsims b JOIN jshort s2
                   ON s2.q_id = b.q_id AND s2.cand_id = b.cand_id)
               ${rankSql("rr", topK)}""")),

    // ... and the measured effect: recall@10 of the two-stage result vs
    // the exact truth — the number that justifies the shortlist width
    // (vs q_sim_jl_recall's direct top-10).
    Q("q_sim_jl_rerank_recall",
      (s, d) => {
        val truth = bruteSims(s, d)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))))
          .filter(col("rank") <= topK).select(col("q_id"), col("cand_id"))
        val rt = graft.SparkEntry.queries("q_sim_jl_rerank")(s, d)
          .select(col("q_id").as("rq"), col("cand_id").as("rc"))
        truth.join(rt, col("q_id") === col("rq") && col("cand_id") === col("rc"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"),
            sum(when(col("rq").isNotNull, 1L).otherwise(0L)).as("n_hits"))
          .select(col("q_id"), col("n_hits"),
            round(col("n_hits") * 1.0 / col("k"), 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $jlPrSql, $eSql, $bruteSimsSql,
               $jlShortSql,
               rrt AS (SELECT q_id, cand_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
                 FROM (SELECT b.q_id, b.cand_id, b.sim
                       FROM bsims b JOIN jshort s2
                         ON s2.q_id = b.q_id AND s2.cand_id = b.cand_id) x),
               truth AS (SELECT q_id, cand_id FROM (
                   SELECT q_id, cand_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
                   FROM bsims) t WHERE rank <= $topK)
               SELECT t.q_id, CAST(COUNT(r.cand_id) AS BIGINT) AS n_hits,
                 ROUND(COUNT(r.cand_id) * 1.0 / COUNT(*), 6) AS recall
               FROM truth t LEFT JOIN (SELECT q_id, cand_id FROM rrt
                 WHERE rank <= $topK) r
                 ON r.q_id = t.q_id AND r.cand_id = t.cand_id
               GROUP BY t.q_id ORDER BY t.q_id""")),

    // PRODUCT-QUANTIZED ANN (PQ + asymmetric distance): the compression
    // scale path past int8 — each candidate vector is stored as pqM=4
    // one-byte codes (16× smaller than float32), and search never touches
    // the original vectors: per query, a pqM×pqK lookup table of
    // subspace dots is built against the codebook (pqM*pqK tiny dots),
    // broadcast, and each candidate's approximate dot is just pqM table
    // lookups summed. Encoding is one broadcast-join pass (no shuffle
    // before the per-(cand,m) argmax partial agg); the LUT sum is exact
    // integer arithmetic in micro-units, so ranking is deterministic in
    // both engines. Codebook = subvectors of vec_id < pqK (deterministic
    // sample, like the IVF seed centroids); candidates = vec_id >= pqK.
    Q("q_sim_pq",
      (s, d) => (pqAdcTop _).tupled(pqCodesAndLut(s, d)),
      Some(s"""WITH $eSql, $pqScoresSql
               SELECT q_id, rank, cand_id, adot_u FROM pqtop
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // PQ quality EVALUATION: recall@5 of the ADC ranking against the
    // exact-dot ground truth over the SAME candidate set — quantifies
    // what the 16× compression costs, next to q_sim_recall's IVF number.
    // (On this synthetic corpus the embeddings are isotropic random, the
    // hardest case for PQ — 8 sampled codewords per subspace recover
    // ~0.2-0.4 recall@5; real clustered embeddings and a trained codebook
    // sit far higher. The row's value is that the knob is MEASURED.)
    Q("q_sim_pq_recall",
      (s, d) => pqRecallOf(s, d, "q_sim_pq"),
      Some(s"""WITH $eSql, $pqScoresSql, $pqTruthSql
               ${pqRecallSql("pqtop")}""")),

    // PQ with a TRAINED codebook — the quantizer-quality knob beside the
    // IVF family's q_sim_ivf_trained: one Lloyd refinement per subspace
    // (assign every vector's subvector to its nearest seed codeword,
    // recompute per-(subspace, codeword, position) means), then the
    // standard codes/LUT/ADC search against the trained codewords.
    // Training is one broadcast-assign pass + one (m, k, pos)-keyed
    // aggregate — data-parallel, no driver loop, same shape at any
    // corpus size.
    Q("q_sim_pq_trained",
      (s, d) => (pqAdcTop _).tupled(pqCodesAndLutVs(s, d, pqTrainedCb(s, d))),
      Some(s"""WITH $eSql, $pqScoresSql, $pqTrainedSql
               SELECT q_id, rank, cand_id, adot_u FROM tpqtop
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // ... and its measured recall@5 — the number that justifies (or
    // rejects) spending the training pass at deployment time. On THIS
    // corpus it rejects it: isotropic random embeddings have no cluster
    // structure, so the Lloyd step pulls codewords toward the global mean
    // and measured recall is flat-to-worse vs the sampled codebook
    // (0.16 vs 0.20 mean at sf0.01) — exactly the deployment decision
    // the evaluator row exists to surface.
    Q("q_sim_pq_trained_recall",
      (s, d) => pqRecallOf(s, d, "q_sim_pq_trained"),
      Some(s"""WITH $eSql, $pqScoresSql, $pqTrainedSql, $pqTruthSql
               ${pqRecallSql("tpqtop")}""")),

    // IVF-RESIDUAL PQ (VERDICT r5 item 7 — the FAISS IVFPQ default):
    // coarse centroid dot EXACT + PQ-encoded residual via ADC. The
    // residual's variance is what the codebook has to cover, and the
    // exact coarse term re-injects the signal the pure-ADC ranking
    // loses — see q_sim_pq_residual_recall for the measured effect on
    // the same candidate set as q_sim_pq.
    Q("q_sim_pq_residual",
      (s, d) => pqResidualTop(s, d),
      Some(s"""WITH $eSql, $ivfCellsSql, $pqResidualSql
               SELECT q_id, rank, cand_id, adot_u FROM rpqtop
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // ... and its measured recall@5 vs the exact-dot truth on the SAME
    // candidate set as q_sim_pq_recall — the number that decides whether
    // residual encoding pays for itself on this corpus. MEASURED NEGATIVE
    // (sf0.01): 0.08 mean vs plain PQ's 0.20. On isotropic random
    // embeddings the 4 sampled coarse centroids barely correlate with any
    // vector (E[max cos] ≈ √(2·ln4/64) ≈ 0.2), so the residual carries
    // MORE variance than the vector itself (~2×) and the residual
    // codebook quantizes worse than the direct one — the same
    // no-cluster-structure failure the trained-codebook row records.
    // On real clustered embeddings (where trained IVF centroids absorb
    // most of the norm) the inequality flips; the row's value is that
    // the deployment decision is MEASURED, not assumed.
    Q("q_sim_pq_residual_recall",
      (s, d) => pqRecallOf(s, d, "q_sim_pq_residual"),
      Some(s"""WITH $eSql, $ivfCellsSql, $pqResidualSql, $pqTruthSql
               ${pqRecallSql("rpqtop")}""")),

    // The DEPLOYMENT-POSITIVE case the residual operator was built for
    // (r6 verdict #6): the same plain-PQ and residual-PQ chains run over
    // the clusteredEmb mixture relation — 8 well-separated centers, so
    // coarse structure dominates each vector's norm. Plain PQ's seed
    // codewords are whole clustered vectors: every member of a cluster
    // encodes to the SAME codeword per subspace, ADC collapses to a
    // per-cluster constant, and within-cluster ranking degenerates to
    // the cand_id tie-break. Residual PQ subtracts the coarse part
    // first, so its codes quantize the fine structure that actually
    // ranks the top-5 — the FAISS IVFPQ argument, here as a measured
    // side-by-side on identical inputs, truth, and candidate set.
    Q("q_sim_clustered_recall",
      (s, d) => {
        val emb = clusteredEmb(s, d).localCheckpoint()
        val (codes, lut) = pqCodesAndLutOf(emb, pqSeedCbOf(emb))
        val pqTop = pqAdcTop(codes, lut)
        val rpqTop = pqResidualTopOf(emb)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val c = emb.filter(col("vec_id") >= pqK)
          .select(col("vec_id").as("cand_id"), col("v").as("cv"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("dot"), asc("cand_id"))
        val truth = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("cand_id"),
            round(vecDot(col("qv"), col("cv")), 6).as("dot"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
          .select("q_id", "cand_id").localCheckpoint()
        def recallOf(m: String, top: DataFrame): DataFrame =
          truth.join(top.select(col("q_id").as("tq"), col("cand_id").as("tc")),
              col("q_id") === col("tq") && col("cand_id") === col("tc"), "left")
            .agg(count(lit(1)).as("n"),
              sum(when(col("tq").isNotNull, 1L).otherwise(0L)).as("h"))
            .select(lit(m).as("method"), col("h").as("n_hits"),
              round(col("h") * 1.0 / col("n"), 6).as("recall"))
        recallOf("pq", pqTop).unionAll(recallOf("rpq", rpqTop)).orderBy("method")
      },
      Some(s"""WITH $clusteredESql, $ivfCellsSql, $pqScoresSql, $pqResidualSql, $pqTruthSql
              SELECT method, n_hits, recall FROM (
                SELECT 'pq' AS method,
                  CAST(COUNT(p.cand_id) AS BIGINT) AS n_hits,
                  ROUND(COUNT(p.cand_id) * 1.0 / COUNT(*), 6) AS recall
                FROM truth t LEFT JOIN
                  (SELECT q_id, cand_id FROM pqtop WHERE rank <= 5) p
                  ON p.q_id = t.q_id AND p.cand_id = t.cand_id
                UNION ALL
                SELECT 'rpq' AS method,
                  CAST(COUNT(r.cand_id) AS BIGINT) AS n_hits,
                  ROUND(COUNT(r.cand_id) * 1.0 / COUNT(*), 6) AS recall
                FROM truth t LEFT JOIN
                  (SELECT q_id, cand_id FROM rpqtop WHERE rank <= 5) r
                  ON r.q_id = t.q_id AND r.cand_id = t.cand_id
              ) ORDER BY method""")),

    // IVF+PQ — the production-scale composition (FAISS's IVFPQ shape):
    // the inverted file prunes the candidate list to the query's cell,
    // and the pruned candidates are ranked by their PQ codes via the
    // broadcast LUT — the corpus is touched only as (cell, 4 bytes of
    // codes) per vector. Composes the two declared operators (same cell
    // assignment as q_sim_ivf, same codes/LUT as q_sim_pq); the rank is
    // recomputed within the cell-filtered pair set.
    Q("q_sim_ivfpq",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val cen = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
        val qCells = nearestCell(cen, emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb")
          .select(col("q_id"), col("cell"))
        val cCells = nearestCell(cen, emb.filter(col("vec_id") >= pqK)
            .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")),
            "cand_id", "cemb2")
          .select(col("cand_id").as("cc_id"), col("cell").as("ccell"))
        // prune BEFORE scoring: codes pick up their candidate's cell, fan
        // out only over the queries probing that cell, and the LUT join +
        // ADC sum run on the surviving (query, candidate) pairs alone —
        // the cost shrink the inverted file exists for
        val (codes, lut) = pqCodesAndLut(s, d)
        val prunedCodes = codes
          .join(cCells, col("cand_id") === col("cc_id"))
          .join(broadcast(qCells), col("ccell") === col("cell"))
          .select(col("q_id").as("pq_id"), col("cand_id"), col("m"), col("code_k"))
        val pruned = prunedCodes
          .join(broadcast(lut), col("lm") === col("m") &&
            col("k") === col("code_k") && col("q_id") === col("pq_id"))
          .groupBy(col("q_id"), col("cand_id"))
          .agg(sum(col("lut_u")).as("adot_u"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("adot_u"), asc("cand_id"))
        pruned.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("adot_u"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $ivfCellsSql, $pqScoresSql,
               prn AS (SELECT p.q_id, p.cand_id, p.adot_u
                 FROM pqscores p
                 JOIN cells qc ON qc.vec_id = p.q_id
                 JOIN cells cc ON cc.vec_id = p.cand_id AND cc.cell = qc.cell)
               SELECT q_id, rank, cand_id, adot_u FROM (
                 SELECT q_id, cand_id, adot_u,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY adot_u DESC, cand_id) AS BIGINT) AS rank
                 FROM prn) t
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // TWO-STAGE PQ serving (shortlist + refine — the production ANN
    // pattern FAISS/ScaNN deploy): the compressed codes produce a cheap
    // ADC top-20 SHORTLIST, and only those 20 candidates per query are
    // re-scored with exact dots against the raw vectors. The expensive
    // exact stage touches O(queries × 20) vectors instead of the corpus,
    // and the shortlist stage never touches a raw vector at all — at
    // 100 TB the full-precision reads are bounded by the shortlist, not
    // the candidate set. Recall vs the ADC-only top-5 is measured by the
    // _recall twin below.
    Q("q_sim_pq_refined",
      (s, d) => {
        val (codes, lut) = pqCodesAndLut(s, d)
        val scores = codes
          .join(broadcast(lut), col("lm") === col("m") && col("k") === col("code_k"))
          .groupBy(col("q_id"), col("cand_id"))
          .agg(sum(col("lut_u")).as("adot_u"))
        val wA = Window.partitionBy(col("q_id")).orderBy(desc("adot_u"), asc("cand_id"))
        val short = scores.withColumn("r0", row_number().over(wA))
          .filter(col("r0") <= 20).select("q_id", "cand_id")
        val emb = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val rr = emb.select(col("vec_id").as("cand_id"), col("v").as("cv"))
          .join(broadcast(short), Seq("cand_id"))
          .join(broadcast(q), Seq("q_id"))
          .select(col("q_id"), col("cand_id"),
            round(vecDot(col("qv"), col("cv")), 6).as("dot"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("dot"), asc("cand_id"))
        rr.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("dot"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $pqScoresSql,
               short AS (SELECT q_id, cand_id FROM pqtop WHERE rank <= 20),
               rq AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
               rc AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= $pqK),
               rr AS (SELECT s.q_id, s.cand_id, ROUND(SUM(rq.qv * rc.cv), 6) AS dot
                 FROM short s JOIN rq ON rq.q_id = s.q_id
                 JOIN rc ON rc.cand_id = s.cand_id AND rc.pos = rq.pos
                 GROUP BY s.q_id, s.cand_id)
               SELECT q_id, rank, cand_id, dot FROM (
                 SELECT q_id, cand_id, dot,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY dot DESC, cand_id) AS BIGINT) AS rank FROM rr) t
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // ... and the measured effect of the refinement stage: recall@5 vs
    // the exact-dot truth, same evaluator as the other PQ rows. On this
    // corpus: ADC-only 0.20 mean (q_sim_pq_recall) → refined 0.64 mean
    // at sf0.01 — the exact stage recovers every truth vector the 4×
    // shortlist caught, and the residual miss is truth vectors the ADC
    // ranking pushed below rank 20 (widen the shortlist to trade reads
    // for recall — the classic knob, here priced).
    Q("q_sim_pq_refined_recall",
      (s, d) => pqRecallOf(s, d, "q_sim_pq_refined"),
      Some(s"""WITH $eSql, $pqScoresSql,
               short AS (SELECT q_id, cand_id FROM pqtop WHERE rank <= 20),
               rq AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
               rc AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= $pqK),
               rr AS (SELECT s.q_id, s.cand_id, ROUND(SUM(rq.qv * rc.cv), 6) AS dot
                 FROM short s JOIN rq ON rq.q_id = s.q_id
                 JOIN rc ON rc.cand_id = s.cand_id AND rc.pos = rq.pos
                 GROUP BY s.q_id, s.cand_id),
               rft AS (SELECT q_id, cand_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY dot DESC, cand_id) AS BIGINT) AS rank FROM rr),
               $pqTruthSql
               ${pqRecallSql("rft")}""")),

    // PERSISTED IVFPQ (VERDICT r7 item 3): the build-once/query-many
    // deployment of q_sim_ivfpq — codes live on disk partitioned by
    // cell, the codebook is a small side relation, and the search
    // touches only the probed cells' directories (dynamic partition
    // pruning via the broadcast probed-cell set; PqPersistSpec audits
    // `dynamicpruning` in the codes scan plan). Same search semantics
    // as q_sim_ivfpq → same oracle.
    Q("q_sim_pq_persisted",
      (s, d) => {
        pqPersistBuild(s, d)
        pqPersistSearch(s, d)
      },
      Some(s"""WITH $eSql, $ivfCellsSql, $pqScoresSql,
               prn AS (SELECT p.q_id, p.cand_id, p.adot_u
                 FROM pqscores p
                 JOIN cells qc ON qc.vec_id = p.q_id
                 JOIN cells cc ON cc.vec_id = p.cand_id AND cc.cell = qc.cell)
               SELECT q_id, rank, cand_id, adot_u FROM (
                 SELECT q_id, cand_id, adot_u,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY adot_u DESC, cand_id) AS BIGINT) AS rank
                 FROM prn) t
               WHERE rank <= 5 ORDER BY q_id, rank""")),

    // LSH bucketing: sign bits against deterministic integer hyperplanes
    // h_j[pos] = ((pos*31 + j*17) % 13) - 6, one native dot per plane
    Q("q_sim_lsh_bucket",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        emb.select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $eSql,
               dots AS (SELECT vec_id, j, SUM(ev * ((pos * 31 + j * 17) % 13 - 6)) AS dot
                 FROM e CROSS JOIN (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS j) js
                 GROUP BY vec_id, j)
               SELECT vec_id,
                 string_agg(CASE WHEN ROUND(dot, 6) >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
               FROM dots GROUP BY vec_id ORDER BY vec_id""")),

    // IVF-style ANN: assign every vector to its nearest of 4 data-derived
    // centroids (argmax dot, the coarse quantizer), then search ONLY the
    // query's own cell — the classic inverted-file scale path: the
    // candidate scan shrinks by the number of cells, and the cell
    // assignment is one broadcast + native dots per row, no shuffle until
    // the final per-query top-k.
    Q("q_sim_ivf",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val cen = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
        val q = nearestCell(cen, emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb")
        val c = nearestCell(cen, emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")), "cand_id", "cemb2")
        val sims = c.join(broadcast(q), "cell")
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb2")), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $ivfSimsSql
               ${rankSql("isims", 5)}""")),

    // PERSISTED inverted file: the build-once / query-many deployment —
    // cell assignments are written as a parquet index PARTITIONED BY CELL,
    // and the search reads the index back with the probed cell as a join
    // key, so partition pruning (dynamic, via the broadcast cell set)
    // confines the scan to the probed cells' directories. At corpus scale
    // this is the difference between re-assigning 100 TB of vectors per
    // query batch and listing one directory per probe. Same search
    // semantics as q_sim_ivf → same oracle.
    Q("q_sim_ivf_persisted",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val cen = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
        val idxDir = ivfIndexDir
        // BUILD: one assignment pass over the corpus, inverted file on disk
        nearestCell(cen, emb.filter(col("vec_id") >= 5)
            .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")),
            "cand_id", "cemb2")
          .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
        // SEARCH: load the index, probe only the queries' cells
        val q = nearestCell(cen, emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb")
        val sims = s.read.parquet(idxDir).join(broadcast(q), "cell")
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb2")), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $ivfSimsSql
               ${rankSql("isims", 5)}""")),

    // IVF with a TRAINED coarse quantizer: one Lloyd refinement of the 4
    // seed centroids over the full corpus — assign every vector to its
    // nearest seed by dot, recompute per-cell position means (rounded so
    // the oracle's doubles agree exactly), then run the standard
    // inverted-file search against the trained centroids. Training is two
    // broadcast-assign scans + one (cell, pos)-keyed aggregate: fully
    // data-parallel, no driver loop, and the same shape at any corpus
    // size. This is the quantizer-quality knob alongside q_sim_ivf_probe's
    // recall knob.
    Q("q_sim_ivf_trained",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val trained = trainedCentroids(s, d)
        val q = nearestCell(trained, emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb")
        val c = nearestCell(trained, emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")), "cand_id", "cemb2")
        val sims = c.join(broadcast(q), "cell")
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb2")), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql, $trainedQuantSql,
              qcells AS (SELECT vec_id, c_id AS cell FROM td2 WHERE vec_id < 5
                QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cdot DESC, c_id) = 1),
              ccells AS (SELECT vec_id, c_id AS cell FROM td2 WHERE vec_id >= 5
                QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cdot DESC, c_id) = 1),
              q AS (SELECT e.vec_id AS q_id, e.pos, e.ev AS qv, qcells.cell
                FROM e JOIN qcells USING (vec_id)),
              c AS (SELECT e.vec_id AS cand_id, e.pos, e.ev AS cv, ccells.cell
                FROM e JOIN ccells USING (vec_id)),
              sims AS (SELECT q.q_id, c.cand_id,
                ROUND(SUM(q.qv * c.cv) / (SQRT(SUM(q.qv * q.qv)) * SQRT(SUM(c.cv * c.cv))), 6) AS sim
                FROM c JOIN q ON q.cell = c.cell AND q.pos = c.pos
                GROUP BY q.q_id, c.cand_id)
              ${rankSql("sims", 5)}""")),

    // IVF multi-probe: the recall knob the single-probe variant lacks.
    // Candidates still index into exactly ONE cell (the inverted-file
    // invariant — list sizes stay disjoint and bounded); each QUERY probes
    // its nProbe=2 nearest cells, trading a 2× candidate scan for the
    // recall lost at cell boundaries. Each (query, candidate) pair arises
    // at most once since probed cells are distinct and a candidate lives
    // in one cell, so no dedup stage is needed.
    Q("q_sim_ivf_probe",
      (s, d) => {
        val nProbe = 2
        val emb = Tables(s, d, "embeddings")
        val cen = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
        // query side keeps a window (top-nProbe cells, not an argmax);
        // the query set is tiny, so the sort is over queries×4 rows only
        def probe(v: DataFrame, idCol: String, embCol: String, n: Int): DataFrame = {
          val w = Window.partitionBy(col(idCol))
            .orderBy(desc("cdot"), asc("c_id"))
          v.crossJoin(broadcast(cen))
            .withColumn("cdot", round(vecDot(col(embCol), col("cemb")), 6))
            .withColumn("crn", row_number().over(w))
            .filter(col("crn") <= n)
            .select(col(idCol), col(embCol), col("c_id").as("cell"))
        }
        val q = probe(emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb")), "q_id", "qemb", nProbe)
        val c = nearestCell(cen, emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cemb2")), "cand_id", "cemb2")
        val sims = c.join(broadcast(q), "cell")
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb2")), 6).as("sim"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        sims.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql,
              cen AS (SELECT vec_id AS c_id, pos, ev AS cv FROM e WHERE vec_id < 4),
              dots AS (SELECT e.vec_id, cen.c_id, ROUND(SUM(e.ev * cen.cv), 6) AS cdot
                FROM e JOIN cen USING (pos) GROUP BY e.vec_id, cen.c_id),
              qcells AS (SELECT vec_id, c_id AS cell FROM dots WHERE vec_id < 5
                QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cdot DESC, c_id) <= 2),
              ccells AS (SELECT vec_id, c_id AS cell FROM dots WHERE vec_id >= 5
                QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cdot DESC, c_id) = 1),
              q AS (SELECT e.vec_id AS q_id, e.pos, e.ev AS qv, qcells.cell
                FROM e JOIN qcells USING (vec_id)),
              c AS (SELECT e.vec_id AS cand_id, e.pos, e.ev AS cv, ccells.cell
                FROM e JOIN ccells USING (vec_id)),
              sims AS (SELECT q.q_id, c.cand_id,
                ROUND(SUM(q.qv * c.cv) / (SQRT(SUM(q.qv * q.qv)) * SQRT(SUM(c.cv * c.cv))), 6) AS sim
                FROM c JOIN q ON q.cell = c.cell AND q.pos = c.pos
                GROUP BY q.q_id, c.cand_id)
              ${rankSql("sims", 5)}""")),

    // embedding-cosine near-dup: pairs above threshold blocked on
    // (label, LSH bucket). Label alone leaves block size unbounded — one
    // hot label at 100× data is a quadratic stage and a skew bomb; the
    // 8-bit hyperplane bucket as a second key caps every block (true
    // near-dups share sign bits with high probability), so pair count
    // grows linearly with corpus size at fixed block width.
    Q("q_sim_neardup",
      (s, d) => {
        val el = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"),
            lshBucket(col("embedding")).as("bucket"))
        el.as("a").join(el.as("b"),
            col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
            round(cosine(col("a.embedding"), col("b.embedding")), 6).as("sim"))
          .filter(col("sim") > 0.2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $eSql,
              $lshBucketSql,
              $neardupSimsSql
              SELECT id_a, id_b, sim FROM nsims WHERE sim > 0.2 ORDER BY id_a, id_b""")),

    // DENSITY-BASED CLUSTERING (cell-blocked DBSCAN): every vector gets a
    // role — core (≥ minPts−1 ε-neighbors), border (non-core touching a
    // core), or noise — plus a cluster id (min core vec_id of its
    // density-connected component). ε-edges are exact cosine ≥ 0.30 but
    // computed only WITHIN an IVF cell (the q_sim_ivf seed-centroid
    // assignment, oracle CTEs shared verbatim): the cell block is what
    // keeps the neighbor search linear-per-cell instead of corpus² — the
    // same blocked-exactness recipe as SemDeDup's cluster-then-pair, and
    // at 100 TB the cell count simply grows with the corpus while the
    // per-cell pairing stays bounded. Cluster labels are min-label
    // propagation over core-core edges run to FIXPOINT on the engine
    // side, with an in-row guard that convergence fit inside the
    // oracle's 10 unrolled rounds — a depth change fails loudly rather
    // than hash-mismatching. Degrees, roles, and the border attachment
    // are one hash aggregate each over the O(ε-edges) relation.
    Q("q_ml_dbscan",
      (s, d) => dbscanSeedShared(s, d),
      Some(s"""WITH $dbscanSqlCtes
              SELECT vec_id, role, cluster FROM roles ORDER BY vec_id""")),

    // DBSCAN over the TRAINED quantizer's cells (VERDICT r11 #6): the
    // same density clustering, blocked by the one-Lloyd-round centroids
    // q_sim_ivf_trained searches with — and the same two-level-quantizer
    // shape examples/DbscanScale certifies at 200k vectors — instead of
    // the 4 raw seed vectors. The centroid relation is ONE shared
    // definition ([[trainedCentroids]] / $trainedQuantSql) on each side,
    // so the gate's clustering and search rows can never quantize
    // differently.
    Q("q_ml_dbscan_trained",
      (s, d) => dbscanRun(s, d, trainedCentroids(s, d)),
      Some(s"""WITH $dbscanTrainedSqlCtes
              SELECT vec_id, role, cluster FROM roles ORDER BY vec_id""")),


    // Per-cluster DBSCAN readout: size and composition of every density
    // cluster — the triage table an operator actually reads (which
    // pockets are big, how much of each is core mass vs attached border).
    // Composes the DECLARED q_ml_dbscan output (one aggregate over its
    // O(N) role relation), so the readout can never drift from the
    // clustering it summarizes.
    Q("q_ml_dbscan_sizes",
      (s, d) => {
        // the declared row ends in an eager checkpoint: materialize our
        // own O(clusters) aggregate, then release the interior roles pin
        // (checkpoint-then-release, the linkPredParts caller pattern)
        val roles = graft.SparkEntry.queries("q_ml_dbscan")(s, d)
        val out = roles.filter(col("cluster").isNotNull)
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("role") === "core", 1L).otherwise(0L)).as("n_core"),
            sum(when(col("role") === "border", 1L).otherwise(0L)).as("n_border"))
          .orderBy(desc("n_total"), asc("cluster"))
          .localCheckpoint()
        graft.plans.Iterate.release(roles)
        out
      },
      Some(s"""WITH $dbscanSqlCtes
              SELECT cluster, COUNT(*) AS n_total,
                CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
                CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS BIGINT) AS n_border
              FROM roles WHERE cluster IS NOT NULL
              GROUP BY cluster ORDER BY n_total DESC, cluster""")),

    // DBSCAN quality EVALUATION against the corpus labels: per-cluster
    // majority label and purity, plus the member count — the measurement
    // loop beside silhouette (k-means) and recall@k (ANN): density
    // clusters are only useful if they track real structure, and the
    // label column is the ground truth this testdata carries. Composes
    // the DECLARED q_ml_dbscan output with one broadcast label join and
    // one two-level aggregate; ties in the majority vote break to the
    // smaller label on both engines.
    Q("q_ml_dbscan_eval",
      (s, d) => {
        val lbl = Tables(s, d, "embeddings").select("vec_id", "label")
        val roles = graft.SparkEntry.queries("q_ml_dbscan")(s, d)
        val mem = roles.filter(col("cluster").isNotNull)
          .join(lbl, "vec_id")
        val byLab = mem.groupBy("cluster", "label")
          .agg(count(lit(1)).as("cnt"))
        // checkpoint the O(clusters) readout, release the interior pin
        val out = byLab.groupBy("cluster")
          .agg(sum("cnt").as("n_members"),
            min_by(col("label"), struct(-col("cnt"), col("label")))
              .as("majority_label"),
            max("cnt").as("majority_cnt"))
          .select(col("cluster"), col("n_members"),
            col("majority_label").cast("int").as("majority_label"),
            round(col("majority_cnt") * lit(1.0) / col("n_members"), 6)
              .as("purity"))
          .orderBy(desc("n_members"), asc("cluster"))
          .localCheckpoint()
        graft.plans.Iterate.release(roles)
        out
      },
      Some(s"""WITH $dbscanSqlCtes,
              mem AS (SELECT r.cluster, emb.label FROM roles r
                JOIN embeddings emb ON emb.vec_id = r.vec_id
                WHERE r.cluster IS NOT NULL),
              bylab AS (SELECT cluster, label, COUNT(*) AS cnt
                FROM mem GROUP BY 1, 2),
              top AS (SELECT cluster, label AS majority_label, cnt
                FROM bylab QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster
                  ORDER BY cnt DESC, label) = 1)
              SELECT b.cluster, CAST(SUM(b.cnt) AS BIGINT) AS n_members,
                MIN(t.majority_label) AS majority_label,
                ROUND(MIN(t.cnt) * 1.0 / SUM(b.cnt), 6) AS purity
              FROM bylab b JOIN top t USING (cluster)
              GROUP BY b.cluster
              ORDER BY n_members DESC, cluster""")),

    // ANN quality EVALUATION: recall@5 of the single-probe IVF search
    // against the brute-force ground truth — the measurement loop any
    // production ANN deployment runs before trading accuracy for cost.
    // Composes the two DECLARED queries (q_sim_topk truncated to k=5 and
    // q_sim_ivf, both deterministic: sims rounded to 6, ties broken by
    // cand_id), so the evaluator can never drift from the operators it
    // scores. Both inputs are O(queries × k) rows; the join and rollup
    // are trivial at any corpus size — the cost IS the two searches.
    Q("q_sim_recall",
      (s, d) => {
        val bf = graft.SparkEntry.queries("q_sim_topk")(s, d)
          .filter(col("rank") <= 5).select(col("q_id"), col("cand_id"))
        val ivf = graft.SparkEntry.queries("q_sim_ivf")(s, d)
          .select(col("q_id").as("iq"), col("cand_id").as("ic"))
        bf.join(ivf, col("q_id") === col("iq") && col("cand_id") === col("ic"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"),
            sum(when(col("iq").isNotNull, 1L).otherwise(0L)).as("n_hits"))
          .select(col("q_id"), col("n_hits"),
            round(col("n_hits") * 1.0 / col("k"), 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $eSql, $bruteSimsSql, $ivfSimsSql,
              bf AS (SELECT q_id, cand_id FROM (${rankSql("bsims", 5)}) bft),
              ivf AS (SELECT q_id, cand_id FROM (${rankSql("isims", 5)}) ivft)
              SELECT bf.q_id,
                CAST(SUM(CASE WHEN ivf.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                ROUND(SUM(CASE WHEN ivf.cand_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS recall
              FROM bf LEFT JOIN ivf ON ivf.q_id = bf.q_id AND ivf.cand_id = bf.cand_id
              GROUP BY bf.q_id ORDER BY bf.q_id""")),

    // FILTERED vector search — THE production ANN feature beside plain
    // top-k: per query, the top-3 among only the candidates sharing the
    // query's label (metadata predicate ∧ vector similarity). The
    // filter applies BEFORE ranking (post-filtering a fixed top-k can
    // return < k survivors — the classic filtered-search bug), and at
    // corpus scale it is a partition/index predicate: the persisted
    // layouts here already partition by cell, and a label-partitioned
    // variant prunes the same way. Candidates join the query's label
    // through a broadcast of the tiny query relation.
    Q("q_sim_filtered_topk",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qemb"),
            col("label").as("qlab"))
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cemb"),
            col("label"))
        val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), asc("cand_id"))
        c.join(broadcast(q), col("label") === col("qlab"))
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("qemb"), col("cemb")), 6).as("sim"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql,
              lab AS (SELECT vec_id, label FROM embeddings),
              qe AS (SELECT e.vec_id AS q_id, pos, ev AS qv, lab.label AS qlab
                     FROM e JOIN lab ON lab.vec_id = e.vec_id WHERE e.vec_id < 5),
              ce AS (SELECT e.vec_id AS cand_id, pos, ev AS cv, lab.label AS clab
                     FROM e JOIN lab ON lab.vec_id = e.vec_id WHERE e.vec_id >= 5),
              fsims AS (SELECT q_id, cand_id,
                  ROUND(SUM(qv * cv) /
                    (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
                FROM qe JOIN ce ON qe.pos = ce.pos AND qe.qlab = ce.clab
                GROUP BY q_id, cand_id)
              SELECT q_id, rank, cand_id, sim FROM (
                SELECT q_id, cand_id, sim, CAST(ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
                FROM fsims) t
              WHERE rank <= 3 ORDER BY q_id, rank""")),

    // TWO-STAGE TRUNCATED-PREFIX search (the operator the eval row
    // below measures the knob of): coarse top-20 by cosine over the
    // first 16 components — at corpus scale a scan of 1/4 of the
    // vector bytes, or a 16-dim index — then exact full-dimension
    // rerank of only that shortlist to the final top-5. Candidates
    // never meet the full vectors except through the shortlist join,
    // which is the entire point. Output is the reranked top-5 with
    // full-precision sims, hash-checked against the oracle running the
    // same two stages.
    Q("q_sim_truncated_rerank",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("cand_id"))
        val coarse = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("cand_id"),
            round(cosine(slice(col("cv"), 1, 16), slice(col("qv"), 1, 16)), 6).as("sim"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
          .select(col("q_id").as("sq"), col("cand_id").as("sc"))
        coarse
          .join(c, col("sc") === col("cand_id"))
          .join(broadcast(q), col("sq") === col("q_id"))
          .select(col("q_id"), col("cand_id"),
            round(cosine(col("cv"), col("qv")), 6).as("sim"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("cand_id"), col("sim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $eSql,
              qe AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
              ce AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= 5),
              coarse AS (SELECT q_id, cand_id,
                  ROUND(SUM(qv * cv) /
                    (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
                FROM qe JOIN ce USING (pos) WHERE pos < 16 GROUP BY q_id, cand_id),
              short AS (SELECT q_id, cand_id FROM (
                  SELECT q_id, cand_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, cand_id) AS rn FROM coarse) t
                WHERE rn <= 20),
              fullsim AS (SELECT s.q_id, s.cand_id,
                  ROUND(SUM(qv * cv) /
                    (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
                FROM short s JOIN qe ON qe.q_id = s.q_id
                JOIN ce ON ce.cand_id = s.cand_id AND ce.pos = qe.pos
                GROUP BY s.q_id, s.cand_id)
              SELECT q_id, rank, cand_id, sim FROM (
                SELECT q_id, cand_id, sim, CAST(ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
                FROM fullsim) t
              WHERE rank <= 5 ORDER BY q_id, rank""")),

    // DIMENSION-TRUNCATION retrieval eval (the Matryoshka/MRL
    // deployment question): recall@5 of cosine search over the first
    // d' embedding components vs the full-dimension truth, for d' ∈
    // {8, 16, 32} — the measurement that decides how short a prefix a
    // coarse first-stage search can run on. At corpus scale the payoff
    // is the same shape as PQ's: a d'=8 prefix scan reads 1/8 of the
    // vector bytes (or an 8-dim IVF probes cheaper cells) and the full
    // vector only reranks a shortlist; this row measures what that
    // truncation costs in recall, per dim, oracle-checked. Sims round
    // at 6 with cand_id tie-break (the family's determinism contract).
    Q("q_sim_truncated_recall",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("cand_id"))
        def top5(dp: Int): DataFrame = c.crossJoin(broadcast(q))
          .select(col("q_id"), col("cand_id"),
            round(cosine(slice(col("cv"), 1, dp), slice(col("qv"), 1, dp)), 6).as("sim"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .select(col("q_id"), col("cand_id"))
        val truth = top5(64)
          .select(col("q_id").as("tq"), col("cand_id").as("tc"))
          .localCheckpoint()
        Seq(8, 16, 32).map { dp =>
          top5(dp)
            .join(truth, col("q_id") === col("tq") && col("cand_id") === col("tc"),
              "left")
            .agg(lit(dp.toLong).as("dim"),
              sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_hits"),
              round(sum(when(col("tc").isNotNull, 1L).otherwise(0L)) * 1.0 /
                count(lit(1)), 6).as("recall"))
        }.reduce(_ unionAll _).orderBy("dim")
      },
      Some(s"""WITH $eSql,
              qe AS (SELECT vec_id AS q_id, pos, ev AS qv FROM e WHERE vec_id < 5),
              ce AS (SELECT vec_id AS cand_id, pos, ev AS cv FROM e WHERE vec_id >= 5),
              dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
              sims AS (SELECT dim, q_id, cand_id,
                  ROUND(SUM(qv * cv) /
                    (SQRT(SUM(qv * qv)) * SQRT(SUM(cv * cv))), 6) AS sim
                FROM qe JOIN ce USING (pos) CROSS JOIN dims
                WHERE pos < dim GROUP BY dim, q_id, cand_id),
              top AS (SELECT dim, q_id, cand_id FROM (
                  SELECT dim, q_id, cand_id, ROW_NUMBER() OVER (
                    PARTITION BY dim, q_id ORDER BY sim DESC, cand_id) AS rn
                  FROM sims) t WHERE rn <= 5),
              truth AS (SELECT q_id, cand_id FROM top WHERE dim = 64)
              SELECT CAST(t.dim AS BIGINT) AS dim,
                CAST(SUM(CASE WHEN tr.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                ROUND(SUM(CASE WHEN tr.cand_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                  / COUNT(*), 6) AS recall
              FROM top t LEFT JOIN truth tr
                ON tr.q_id = t.q_id AND tr.cand_id = t.cand_id
              WHERE t.dim < 64 GROUP BY t.dim ORDER BY dim"""))
  )

  /** Cell-blocked DBSCAN dataflow shared by q_ml_dbscan (seed centroids)
    * and q_ml_dbscan_trained (trained centroids): ε-edges are exact
    * cosine ≥ dbscanEps computed only WITHIN a cell of `cen`'s argmax
    * assignment, roles/labels per the declared row's contract. */
  /** Memoized seed-quantizer DBSCAN roles per corpus fingerprint (the
    * ppjoinCache/lpaShared pattern, optimization r15): THREE declared
    * rows consume this exact clustering — q_ml_dbscan itself and the
    * sizes/eval readouts, which compose the declared row and previously
    * re-ran the whole ~70-job clustering each. The O(vectors) role
    * relation is collected once (capped — beyond the cap callers pay
    * the full pipeline, bounded driver memory beats a saved
    * re-execution) and replayed as a local relation. Keyed by the
    * embeddings parquet's content fingerprint, so a regenerated dataset
    * can never serve stale roles. */
  private val dbscanCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String, Option[Long])]]()
  private val dbscanCacheCap = 200000

  private def dbscanSeedShared(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key = Tables.fingerprint(d, "embeddings")
    val cached = dbscanCache.get(key)
    if (cached != null) return cached.toDF("vec_id", "role", "cluster")
    val emb = Tables(s, d, "embeddings")
    val cen = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cemb"))
    val out = dbscanRun(s, d, cen)
    val head = out.head(dbscanCacheCap + 1)
    if (head.length <= dbscanCacheCap) {
      val rows = head.map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      dbscanCache.put(key, rows)
      rows.toDF("vec_id", "role", "cluster")
    } else out
  }

  private def dbscanRun(s: SparkSession, d: String,
      cen: DataFrame): DataFrame = {
        val emb = Tables(s, d, "embeddings")
        val cells = nearestCell(cen,
          emb.select(col("vec_id"), col("embedding").as("vemb")),
          "vec_id", "vemb").localCheckpoint() // reused by pairs + assembly
        val pairs = cells.as("a").join(cells.as("b"),
            col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
            round(cosine(col("a.vemb"), col("b.vemb")), 6).as("sim"))
          .filter(col("sim") >= dbscanEps)
        val edges = pairs.select(col("va").as("v"), col("vb").as("n"))
          .unionByName(pairs.select(col("vb").as("v"), col("va").as("n")))
          .localCheckpoint()
        val core = edges.groupBy("v").agg(count(lit(1)).as("nb"))
          .filter(col("nb") >= dbscanMinPts - 1).select("v")
          .localCheckpoint()
        val cedges = edges
          .join(core.withColumnRenamed("v", "cv"), col("v") === col("cv"))
          .join(core.withColumnRenamed("v", "cn"), col("n") === col("cn"))
          .select("v", "n").localCheckpoint()
        // min-label fixpoint over the core-core graph (clusterLabels
        // shape). FRONTIER propagation with the changed flag IN the
        // state row (optimization r14, guide §2.4): labels are monotone
        // non-increasing, so only a vertex whose label dropped last
        // round can drop a neighbour's — the per-round state sequence
        // (hence the round count the oracle-unroll guard checks) is
        // identical to the previous full re-propagation, while each
        // round joins O(frontier degree) and the old next-vs-previous
        // join collapses into a narrow count over checkpointed blocks.
        var lab = core.select(col("v"), col("v").as("lab"), lit(true).as("chg"))
          .localCheckpoint()
        var rounds = 0
        var changed = 1L
        while (changed > 0) {
          rounds += 1
          // +1: the final iteration only CONFIRMS changed == 0 — data
          // needing exactly dbscanCcRounds productive rounds still
          // matches the oracle's unroll (propagation is idempotent at
          // the fixpoint), and must not trip the guard
          require(rounds <= dbscanCcRounds + 1,
            s"DBSCAN label propagation needs > $dbscanCcRounds rounds; " +
              "the oracle unrolls exactly that many — raise both together")
          val prop = cedges.join(
              lab.filter(col("chg")).select(col("v").as("nv"), col("lab").as("nl")),
              col("n") === col("nv"))
            .groupBy("v").agg(min("nl").as("cand"))
          // changed-count observed during the checkpoint job (r15):
          // one job per round instead of two
          val (next, nChanged) = graft.plans.Iterate.pinCountTrue(
            lab.select("v", "lab").join(prop, Seq("v"), "left")
              .select(col("v"),
                least(col("lab"), coalesce(col("cand"), lit(Long.MaxValue))).as("lab"),
                (coalesce(col("cand"), lit(Long.MaxValue)) < col("lab")).as("chg")),
            col("chg"))
          changed = nChanged
          graft.plans.Iterate.release(lab)
          lab = next
        }
        val border = edges
          .join(core.withColumnRenamed("v", "cv"), col("v") === col("cv"), "left_anti")
          .join(lab.withColumnRenamed("v", "nv"), col("n") === col("nv"))
          .groupBy("v").agg(min("lab").as("blab"))
        val out = cells.select(col("vec_id"))
          .join(lab.withColumnRenamed("v", "vid").withColumnRenamed("lab", "clab"),
            col("vec_id") === col("vid"), "left")
          .join(border.withColumnRenamed("v", "bid"),
            col("vec_id") === col("bid"), "left")
          .select(col("vec_id"),
            when(col("clab").isNotNull, "core")
              .when(col("blab").isNotNull, "border")
              .otherwise("noise").as("role"),
            coalesce(col("clab"), col("blab")).as("cluster"))
          .orderBy("vec_id")
          .localCheckpoint()
        Seq(cells, edges, core, cedges, lab).foreach(graft.plans.Iterate.release)
        out
  }

  /** unrolled MMR oracle: candidate pool + pairwise-sim matrix, then 5
    * greedy selection steps as CTEs (scored_t excludes selu_{t-1},
    * penalty = max pairwise sim to the selected set; all sims and scores
    * round at 6, ties to the smaller cand_id). A def: referenced from
    * defs's initializer. */
  private def mmrSql: String = {
    val steps = (1 to 5).map { t =>
      s"""scored$t AS (SELECT c.q_id, c.cand_id,
           ROUND(0.7 * c.sim - 0.3 * COALESCE((SELECT MAX(cc.ccsim) FROM cc
             WHERE cc.q_id = c.q_id AND cc.c1 = c.cand_id
               AND cc.c2 IN (SELECT s.cand_id FROM selu${t - 1} s
                             WHERE s.q_id = c.q_id)), 0.0), 7) AS score
           FROM cand c WHERE NOT EXISTS (SELECT 1 FROM selu${t - 1} s
             WHERE s.q_id = c.q_id AND s.cand_id = c.cand_id)),
         sel$t AS MATERIALIZED (SELECT q_id, cand_id, score FROM scored$t
           QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY score DESC, cand_id) = 1),
         selu$t AS MATERIALIZED (SELECT q_id, cand_id FROM selu${t - 1}
           UNION ALL SELECT q_id, cand_id FROM sel$t)"""
    }.mkString(",\n")
    val union = (1 to 5)
      .map(t => s"SELECT q_id, CAST($t AS BIGINT) AS rank, cand_id, score FROM sel$t")
      .mkString(" UNION ALL ")
    s"""WITH $eSql, $bruteSimsSql,
       cand AS MATERIALIZED (SELECT q_id, cand_id, sim FROM bsims
         QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY sim DESC, cand_id) <= 10),
       ce AS (SELECT c.q_id, c.cand_id, e.pos, e.ev
              FROM cand c JOIN e ON e.vec_id = c.cand_id),
       cc AS MATERIALIZED (SELECT a.q_id, a.cand_id AS c1, b.cand_id AS c2,
         ROUND(SUM(a.ev * b.ev) / (SQRT(SUM(a.ev * a.ev)) * SQRT(SUM(b.ev * b.ev))), 6) AS ccsim
         FROM ce a JOIN ce b ON a.q_id = b.q_id AND a.pos = b.pos
           AND a.cand_id <> b.cand_id
         GROUP BY 1, 2, 3),
       selu0 AS (SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS cand_id
                 WHERE FALSE),
       $steps
       SELECT * FROM ($union) u ORDER BY q_id, rank"""
  }
}
