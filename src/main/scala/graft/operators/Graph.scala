package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.plans.{Iterate, Pregel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vertex-centric graph operators (SURVEY.md §2.5) over a deterministic
  * graph derived from `orders` so every fixpoint has a DuckDB oracle:
  * src = o_orderkey % N, dst = o_custkey % N, w = o_orderkey % 7 + 1.
  *
  * Each algorithm is the Spark re-expression of a reference example:
  * messages = shuffle on dst, combiner = partial aggregation, superstep =
  * one driver-loop iteration (`graph/src/main/java/org/apache/hama/graph/
  * GraphJobRunner.java:157-351`). Iteration counts are FIXED so results are
  * deterministic and the oracle unrolls the same number of rounds as nested
  * CTEs (aggregates are not allowed in recursive CTE terms).
  *
  * Scale posture: each superstep is `join → groupBy` on the edge Dataset —
  * pure shuffle-parallel, no driver materialization beyond O(1) aggregates;
  * edges are cached once and reused; lineage truncated via localCheckpoint.
  */
object Graph extends QueryModule {

  private val N = 200 // node-id modulus of the derived graph
  private val midN = 5000 // modulus of the mid-size (data-bound) graph row

  /** deduped directed weighted edges; identical SQL: GROUP BY src,dst MIN(w) */
  private def edges(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .select((col("o_orderkey") % N).as("src"), (col("o_custkey") % N).as("dst"),
        (col("o_orderkey") % 7 + 1).as("w"))
      .groupBy("src", "dst").agg(min("w").as("w"))

  private val edgesSql =
    s"""e AS (SELECT o_orderkey % $N AS src, o_custkey % $N AS dst,
       MIN(o_orderkey % 7 + 1) AS w FROM orders GROUP BY src, dst)"""

  /** undirected view: src↔dst both directions, deduped */
  private def undirected(e: DataFrame): DataFrame =
    e.select("src", "dst")
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

  private val undirectedSql =
    """eu AS (SELECT DISTINCT src, dst FROM
       (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e) t)"""

  private def nodes(e: DataFrame): DataFrame =
    e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()

  /** Link-prediction scaffolding shared by q_graph_adamic and
    * q_graph_jaccard_linkpred: the simple undirected graph (self-loops
    * excluded, as in q_graph_mis/q_graph_ktruss — a vertex's own loop
    * must not inflate neighborhood degrees), per-vertex degrees, the
    * wedge relation (u < v through a common neighbor w), and the
    * existing-edge adjacency for the anti-join. The caller releases the
    * checkpointed edge relation. */
  private def linkPredParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val eu = undirected(edges(s, d))
      .filter(col("src") =!= col("dst")).localCheckpoint()
    val deg = eu.groupBy(col("src").as("w")).agg(count(lit(1)).as("dg"))
    val wedges = eu.select(col("src").as("w"), col("dst").as("u"))
      .join(eu.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val adj = eu.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    (eu, deg, wedges, adj)
  }

  /** Oracle half of [[linkPredParts]] — eus/deg/wed/adj CTEs. */
  private lazy val linkPredCtes: String =
    s"""$edgesSql,
       $undirectedSql,
       eus AS (SELECT src, dst FROM eu WHERE src <> dst),
       deg AS (SELECT src AS w, COUNT(*) AS dg FROM eus GROUP BY src),
       wed AS (SELECT e1.src AS w, e1.dst AS u, e2.dst AS v
               FROM eus e1 JOIN eus e2 ON e1.src = e2.src AND e1.dst < e2.dst),
       adj AS (SELECT src AS u, dst AS v FROM eu WHERE src < dst)"""

  private val nodesSql =
    """nodes AS (SELECT DISTINCT v FROM
       (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e) t)"""

  // ---- oracle SQL generators (unrolled supersteps) -----------------------

  private def pagerankSql(iters: Int, edgesCte: String = edgesSql): String = {
    val steps = (0 until iters).map { i =>
      s"""r${i + 1} AS (SELECT nodes.v,
         0.15 / (SELECT cnt FROM n) + 0.85 * COALESCE(m.msum, 0) AS rank
         FROM nodes LEFT JOIN (
           SELECT e.dst AS v, SUM(r$i.rank / deg.outdeg) AS msum
           FROM r$i JOIN e ON e.src = r$i.v JOIN deg ON deg.src = e.src
           GROUP BY e.dst) m ON m.v = nodes.v)"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
       $nodesSql,
       n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
       deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
       r0 AS (SELECT v, 1.0 / (SELECT cnt FROM n) AS rank FROM nodes),
       $steps
       SELECT v, ROUND(rank, 9) AS rank FROM r$iters ORDER BY v"""
  }

  /** Personalized PageRank from seed vertex 0: teleport mass returns to
    * the SEED instead of spreading uniformly, so rank measures proximity
    * to the seed — the recommendation/similar-entities variant. Same
    * one-join-one-agg superstep shape as [[pagerank]]. */
  private def ppr(s: SparkSession, d: String, iters: Int, seed: Long): DataFrame = {
    val e = edges(s, d).select("src", "dst")
    val vs = nodes(e).cache()
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    val e2 = e.join(deg, "src").cache()
    val zeros = vs.select(col("v"), lit(0.0).as("m")).cache()
    val init = vs.select(col("v"),
      when(col("v") === seed, 1.0).otherwise(0.0).as("rank"))
    val out = Iterate(init, iters, checkpointEvery = 5) { (r, _) =>
      val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
        .select(col("ee.dst").as("v"), (col("rr.rank") / col("ee.outdeg")).as("m"))
      contrib.unionAll(zeros)
        .groupBy("v").agg(sum("m").as("msum"))
        .select(col("v"),
          (when(col("v") === seed, lit(0.15)).otherwise(lit(0.0)) +
            lit(0.85) * col("msum")).as("rank"))
    }
    out.select(col("v"), round(col("rank"), 9).as("rank")).orderBy("v")
  }

  private def pprSql(iters: Int, seed: Long): String = {
    val steps = (0 until iters).map { i =>
      s"""r${i + 1} AS (SELECT nodes.v,
         CASE WHEN nodes.v = $seed THEN 0.15 ELSE 0 END
           + 0.85 * COALESCE(m.msum, 0) AS rank
         FROM nodes LEFT JOIN (
           SELECT e.dst AS v, SUM(r$i.rank / deg.outdeg) AS msum
           FROM r$i JOIN e ON e.src = r$i.v JOIN deg ON deg.src = e.src
           GROUP BY e.dst) m ON m.v = nodes.v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $nodesSql,
       deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
       r0 AS (SELECT v, CASE WHEN v = $seed THEN 1.0 ELSE 0.0 END AS rank FROM nodes),
       $steps
       SELECT v, ROUND(rank, 9) AS rank FROM r$iters ORDER BY v"""
  }

  /** Katz centrality: katz(v) = Σ_{k=1..K} αᵏ · (#paths of length k ending
    * at v) — the attenuated-path score that, unlike PageRank, does NOT
    * dilute a vertex's contribution by its out-degree, so prolific linkers
    * count in full. Computed by the linear recurrence x_k = α·Aᵀx_{k-1},
    * x_0 = 1, accumulating Σx_k: one edge join + one hash aggregate per
    * round, O(V) state, K bounded — the identical superstep shape (and
    * 100 TB posture) as [[ppr]]. Completes the centrality family beside
    * degree/closeness/harmonic/betweenness/eccentricity/PPR/HITS. */
  private def katz(s: SparkSession, d: String, iters: Int, alpha: Double): DataFrame = {
    val e = edges(s, d).select("src", "dst").localCheckpoint()
    val vs = nodes(e).cache()
    val init = vs.select(col("v"), lit(1.0).as("x"), lit(0.0).as("acc"))
    val out = Iterate(init, iters, checkpointEvery = 5) { (st, _) =>
      val contrib = e.as("ee").join(st.as("ss"), col("ee.src") === col("ss.v"))
        .groupBy(col("ee.dst").as("v")).agg(sum(col("ss.x")).as("msum"))
      st.as("ss").join(contrib.as("mm"), col("ss.v") === col("mm.v"), "left")
        .select(col("ss.v").as("v"),
          (lit(alpha) * coalesce(col("mm.msum"), lit(0.0))).as("x"),
          (col("ss.acc") +
            lit(alpha) * coalesce(col("mm.msum"), lit(0.0))).as("acc"))
    }
    val res = out.select(col("v"), round(col("acc"), 9).as("katz")).orderBy("v")
      .localCheckpoint()
    vs.unpersist()
    res
  }

  private def katzSql(iters: Int, alpha: Double): String = {
    val steps = (0 until iters).map { i =>
      s"""x${i + 1} AS (SELECT nodes.v,
         $alpha * COALESCE(m.msum, 0) AS x,
         xs.acc + $alpha * COALESCE(m.msum, 0) AS acc
         FROM nodes JOIN x$i xs ON xs.v = nodes.v
         LEFT JOIN (
           SELECT e.dst AS v, SUM(xp.x) AS msum
           FROM x$i xp JOIN e ON e.src = xp.v
           GROUP BY e.dst) m ON m.v = nodes.v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $nodesSql,
       x0 AS (SELECT v, 1.0 AS x, 0.0 AS acc FROM nodes),
       $steps
       SELECT v, ROUND(acc, 9) AS katz FROM x$iters ORDER BY v"""
  }

  /** Eigenvector centrality by POWER ITERATION: x ← Aᵀx / ‖Aᵀx‖₂ — the
    * fixpoint PageRank approximates without damping or degree division.
    * The L2 norm is an O(1) driver scalar re-entering through the round-9
    * lattice (the [[graft.operators.ML]] GD-loop discipline), so both
    * engines walk the identical normalized sequence. One edge join + one
    * hash aggregate + one scalar collect per round — the same bounded
    * superstep as [[katz]]; each round's state is checkpointed because the
    * norm already materialized it. */
  private def eigenvector(s: SparkSession, d: String, iters: Int): DataFrame = {
    val e = edges(s, d).select("src", "dst").localCheckpoint()
    val vs = nodes(e).cache()
    var x = vs.select(col("v"), lit(1.0).as("x"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      // the squared-norm sum is OBSERVED during the checkpoint job
      // (r15): one job per round instead of checkpoint + a scalar agg —
      // identical double (same sum), so the round-9 lattice holds
      val (y, ssOpt) = Iterate.pinObserved(
        vs.as("nn").join(
            e.as("ee").join(x.as("xx"), col("ee.src") === col("xx.v"))
              .groupBy(col("ee.dst").as("v")).agg(sum(col("xx.x")).as("m")),
            Seq("v"), "left")
          .select(col("v"), coalesce(col("m"), lit(0.0)).as("y")),
        sum(col("y") * col("y")))
      if (prev != null) Iterate.release(prev)
      prev = y
      val nrm = r9g(math.sqrt(ssOpt.get.asInstanceOf[Double]))
      x = y.select(col("v"), (col("y") / nrm).as("x"))
    }
    x.select(col("v"), round(col("x"), 9).as("score")).orderBy("v")
  }

  /** round half-up like SQL ROUND — the ML.r9 lattice, local copy */
  private def r9g(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eigenvectorSql(iters: Int): String = {
    val steps = (0 until iters).map { i =>
      s"""y${i + 1} AS (SELECT nodes.v, COALESCE(m.msum, 0) AS y
           FROM nodes LEFT JOIN (
             SELECT e.dst AS v, SUM(xp.x) AS msum
             FROM x$i xp JOIN e ON e.src = xp.v
             GROUP BY e.dst) m ON m.v = nodes.v),
         n${i + 1} AS (SELECT ROUND(sqrt(SUM(y * y)), 9) AS nrm FROM y${i + 1}),
         x${i + 1} AS (SELECT v, y / nrm AS x FROM y${i + 1} CROSS JOIN n${i + 1})"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $nodesSql,
       x0 AS (SELECT v, 1.0 AS x FROM nodes),
       $steps
       SELECT v, ROUND(x, 9) AS score FROM x$iters ORDER BY v"""
  }

  private def pagerankWeightedSql(iters: Int): String = {
    val steps = (0 until iters).map { i =>
      s"""r${i + 1} AS (SELECT nodes.v,
         0.15 / (SELECT cnt FROM n) + 0.85 * COALESCE(m.msum, 0) AS rank
         FROM nodes LEFT JOIN (
           SELECT e.dst AS v, SUM(r$i.rank * e.w / wt.wtot) AS msum
           FROM r$i JOIN e ON e.src = r$i.v JOIN wt ON wt.src = e.src
           GROUP BY e.dst) m ON m.v = nodes.v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $nodesSql,
       n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes),
       wt AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS wtot FROM e GROUP BY src),
       r0 AS (SELECT v, 1.0 / (SELECT cnt FROM n) AS rank FROM nodes),
       $steps
       SELECT v, ROUND(rank, 9) AS rank FROM r$iters ORDER BY v"""
  }

  private def hitsIters: Int = 3

  /** unrolled HITS half-steps, every raw sum rounded at 6 and every
    * normalized vector rounded at 6 — the engine's exact value lattice. */
  private def hitsSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""h$t AS MATERIALIZED (SELECT nodes.v, COALESCE(s.x, 0.0) AS hraw
           FROM nodes LEFT JOIN (
             SELECT e.src AS v, ROUND(SUM(a${t - 1}.auth), 6) AS x
             FROM e JOIN a${t - 1} ON a${t - 1}.v = e.dst GROUP BY e.src) s
           ON s.v = nodes.v),
         hn$t AS MATERIALIZED (SELECT v,
           ROUND(hraw / (SELECT MAX(hraw) FROM h$t), 6) AS hub FROM h$t),
         ar$t AS MATERIALIZED (SELECT nodes.v, COALESCE(s.x, 0.0) AS araw
           FROM nodes LEFT JOIN (
             SELECT e.dst AS v, ROUND(SUM(hn$t.hub), 6) AS x
             FROM e JOIN hn$t ON hn$t.v = e.src GROUP BY e.dst) s
           ON s.v = nodes.v),
         a$t AS MATERIALIZED (SELECT v,
           ROUND(araw / (SELECT MAX(araw) FROM ar$t), 6) AS auth FROM ar$t)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $nodesSql,
       a0 AS (SELECT v, 1.0 AS auth FROM nodes),
       $steps
       SELECT hn$iters.v, hn$iters.hub, a$iters.auth
       FROM hn$iters JOIN a$iters ON a$iters.v = hn$iters.v
       ORDER BY hn$iters.v"""
  }

  private def ssspSql(rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      s"""d${i + 1} AS (SELECT v, MIN(dist) AS dist FROM (
         SELECT v, dist FROM d$i
         UNION ALL
         SELECT e.dst AS v, d$i.dist + e.w AS dist
         FROM d$i JOIN e ON e.src = d$i.v) t GROUP BY v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       d0 AS (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist),
       $steps
       SELECT v, dist FROM d$rounds ORDER BY v"""
  }

  private def ccSql(rounds: Int): String = {
    // each round = min-label propagate over edges, then pointer-jump
    // lbl ← lbl[lbl] (labels are vertex ids, so the label table maps them)
    val steps = (0 until rounds).map { i =>
      s"""p${i + 1} AS (SELECT v, MIN(lbl) AS lbl FROM (
         SELECT v, lbl FROM c$i
         UNION ALL
         SELECT eu.dst AS v, c$i.lbl AS lbl
         FROM c$i JOIN eu ON eu.src = c$i.v) t GROUP BY v),
         c${i + 1} AS (SELECT c.v, p.lbl FROM p${i + 1} c JOIN p${i + 1} p ON p.v = c.lbl)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $undirectedSql,
       $nodesSql,
       c0 AS (SELECT v, v AS lbl FROM nodes),
       $steps
       SELECT v, lbl FROM c$rounds ORDER BY v"""
  }

  /** unrolled h-operator rounds PAST convergence, plus the
    * independently-derived `rounds` column (first round whose estimate
    * set repeats — see [[stableRoundCtes]], mirroring the Spark loop's
    * discovered halt). The k_t CTEs are MATERIALIZED: each is read by
    * k_{t+1} AND by its diff count. */
  private def kcoreSql(iters: Int): String = {
    val steps = (0 until iters).map { i =>
      s"""k${i + 1} AS MATERIALIZED (
         SELECT t.v, LEAST(MAX(own.est), MAX(LEAST(t.nb_est, t.rn))) AS est FROM (
           SELECT eu.src AS v, k$i.est AS nb_est,
                  CAST(ROW_NUMBER() OVER (PARTITION BY eu.src
                       ORDER BY k$i.est DESC, eu.dst) AS BIGINT) AS rn
           FROM eu JOIN k$i ON k$i.v = eu.dst) t
         JOIN k$i own ON own.v = t.v
         GROUP BY t.v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $undirectedSql,
       k0 AS MATERIALIZED (SELECT src AS v, COUNT(*) AS est FROM eu GROUP BY src),
       $steps,
       ${stableRoundCtes("k", "est", iters)}
       SELECT v, est, CAST((SELECT rounds FROM rnds) AS BIGINT) AS rounds
       FROM k$iters ORDER BY v"""
  }

  // ---- Spark implementations --------------------------------------------

  /** PageRank, fixed 10 supersteps, damping 0.85
    * (`examples/src/main/java/org/apache/hama/examples/PageRank.java:46-87`;
    * N broadcast like `GraphJobRunner.countGlobalVertexCount:598-624`). */
  private def pagerank(s: SparkSession, d: String, iters: Int = 10): DataFrame =
    pagerankLoop(edges(s, d).select("src", "dst"), iters)

  private def pagerankLoop(e0: DataFrame, iters: Int): DataFrame = {
    val e = e0
    val vs = nodes(e).cache()
    val n = vs.count().toDouble // O(1) to driver, re-broadcast in closures
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // pre-join out-degrees once; zero-contribution rows for every node fold
    // the "no inbound messages" case into the same aggregate, so each
    // superstep is ONE join + ONE shuffle agg and references the loop state
    // exactly once (linear plan growth)
    val e2 = e.join(deg, "src").cache()
    val zeros = vs.select(col("v"), lit(0.0).as("m")).cache()
    val init = vs.select(col("v"), lit(1.0 / n).as("rank"))
    // cadence 5: one mid-loop materialization at superstep 5 instead of two
    // (4, 8) — lineage depth ≤5 rounds stays cheap to analyze, and each
    // eager checkpoint is a full job group this host taxes (VERDICT r4 #3)
    val out = Iterate(init, iters, checkpointEvery = 5) { (r, _) =>
      val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
        .select(col("ee.dst").as("v"), (col("rr.rank") / col("ee.outdeg")).as("m"))
      contrib.unionAll(zeros)
        .groupBy("v")
        .agg((lit(0.15 / n) + lit(0.85) * sum("m")).as("rank"))
    }
    out.select(col("v"), round(col("rank"), 9).as("rank")).orderBy("v")
  }

  /** vertex state for the typed-Pregel PageRank parity run */
  case class PrV(rank: Double, adj: Seq[Long])

  /** vertex state for the typed-Pregel SSSP parity run */
  case class SpV(dist: Long, adj: Seq[(Long, Long)])

  /** vertex state for the typed-Pregel aggregator-halt CC run */
  case class CcV(lbl: Long, adj: Seq[Long])

  /** ENGINE-PARITY row #3 — the AGGREGATOR-HALT path: min-label CC on
    * the typed Pregel engine where NO vertex ever votes to halt and the
    * job is stopped by the GLOBAL AGGREGATOR instead (the reference's
    * master-side AggregationRunner halt, `graph/.../AggregationRunner
    * .java:58-236`): the aggregator observes the label sum each
    * superstep — labels only decrease, so an unchanged sum IS the
    * fixpoint — and `haltOn` fires when it repeats. This is the one
    * engine control path the coverage table carried as [spec] only;
    * the oracle is the same recursive min-label closure the
    * declarative fixpoint row checks, so the halt's correctness is
    * hash-checked, not just spec-asserted. */
  private def ccAggParity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = edges(s, d)
    val eu = undirected(e).localCheckpoint()
    val vs = nodes(eu).cache()
    val n = vs.count()
    val adj = eu.groupBy("src").agg(collect_list("dst").as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"), typedLit(Seq.empty[Long])).as("adj"))
      .as[(Long, Seq[Long])]
      .map { case (v, a) => (v, CcV(v, a)) }
    var prevSum = Long.MinValue
    val agg = Pregel.GlobalAggregator[CcV, Long](
      observe = ds => ds.map(_._2.lbl).reduce(_ + _),
      haltOn = sum => { val same = sum == prevSum; prevSum = sum; same })
    val typed = Pregel.run[CcV, Long, Long](s, verts, maxIter = N,
      combiner = Some((a: Long, b: Long) => math.min(a, b)),
      aggregator = Some(agg),
      partitions = Some(Pregel.sizedPartitions(s, n)))((_, v, msgs, step, _) =>
        if (step == 0)
          Pregel.ComputeResult(v, messages = v.adj.map(dst => (dst, v.lbl)))
        else {
          val nl = (msgs :+ v.lbl).min
          if (nl < v.lbl)
            Pregel.ComputeResult(CcV(nl, v.adj),
              messages = v.adj.map(dst => (dst, nl)))
          else Pregel.ComputeResult(v)
        })
    typed.map { case (id, v) => (id, v.lbl) }.toDF("v", "lbl")
      .orderBy("v").localCheckpoint()
  }

  /** ENGINE-PARITY row #2 (VERDICT r8 item 6): SSSP through the typed
    * Pregel engine — the paths PageRank parity never exercises: a MIN
    * combiner (not sum), UNIVERSAL vote-to-halt with message-driven
    * REACTIVATION (the reference SSSP's contract, `examples/.../
    * SSSP.java:41-88`: every vertex halts every superstep and only an
    * improving message wakes it), and the quiescence halt (no messages
    * in flight + all halted) instead of a fixed iteration count. The
    * oracle is the same recursive min-plus closure q_graph_sssp_fixpoint
    * checks — a hash-checked row, not just a spec. The row also asserts
    * the combiner DID reduce shuffle volume: delivered (post-combine)
    * message totals strictly below raw sends whenever a combine actually
    * ran (counted by accumulator — see ADVICE r9 on graph shapes where
    * no two in-flight messages ever share a destination). */
  private def ssspParity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = edges(s, d)
    val vs = nodes(e).cache()
    val n = vs.count()
    val inf = Long.MaxValue
    val adj = e.groupBy("src")
      .agg(collect_list(struct(col("dst").as("_1"),
        col("w").cast("long").as("_2"))).as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"),
        typedLit(Seq.empty[(Long, Long)])).as("adj"))
      .as[(Long, Seq[(Long, Long)])]
      .map { case (v, a) => (v, SpV(if (v == 0L) 0L else inf, a)) }
    val stats = scala.collection.mutable.ArrayBuffer.empty[Pregel.SuperstepStats]
    // counts actual combiner invocations — direct evidence that some
    // superstep saw fan-in >= 2 at a destination, which is what makes
    // STRICT volume reduction assertable (ADVICE r9: on a graph where no
    // two in-flight messages ever share a destination, delivered == sent
    // with a perfectly correct combiner)
    val accComb = s.sparkContext.longAccumulator("ssspParity.combines")
    val typed = Pregel.run[SpV, Long, Unit](s, verts, maxIter = N,
      combiner = Some((a: Long, b: Long) => { accComb.add(1L); math.min(a, b) }),
      onSuperstep = stats += _,
      partitions = Some(Pregel.sizedPartitions(s, n)))((_, v, msgs, step, _) =>
        if (step == 0)
          // every vertex votes to halt immediately; only the source
          // seeds messages — all other activity is reactivation-driven
          Pregel.ComputeResult(v, voteToHalt = true,
            messages = if (v.dist == 0L) v.adj.map { case (dst, w) =>
              (dst, v.dist + w) } else Nil)
        else {
          val nd = msgs.min // min combiner → at most one message arrives
          if (nd < v.dist)
            Pregel.ComputeResult(SpV(nd, v.adj), voteToHalt = true,
              messages = v.adj.map { case (dst, w) => (dst, nd + w) })
          else Pregel.ComputeResult(v, voteToHalt = true)
        })
    val out = typed.filter(_._2.dist < inf)
      .map { case (id, v) => (id, v.dist) }.toDF("v", "dist")
      .orderBy("v").localCheckpoint()
    val sent = stats.map(_.messagesSent).sum
    val delivered = stats.map(_.messagesDelivered).sum
    require(delivered <= sent,
      s"delivered can never exceed sends: $delivered > $sent")
    // strict only when fan-in >= 2 actually occurred (it does on this
    // derived graph; a chain-shaped regeneration would legitimately
    // combine nothing, and the old unconditional `<` would fail a
    // correct engine on it)
    require(accComb.value == 0L || delivered < sent,
      s"the min combiner ran ${accComb.value} times but removed no " +
        s"delivered volume: $delivered !< $sent")
    require(stats.last.messagesSent == 0 && stats.last.activeVertices == 0,
      "the engine must halt on quiescence (all halted, no messages)")
    vs.unpersist()
    out
  }

  /** Uninterrupted declarative PageRank, memoized per (corpus
    * fingerprint, iters) — the thetaCache/ppjoinCache pattern:
    * `_parity` and `_resume` both compare against the SAME run, which
    * used to execute twice per bench suite (~10 s at sf0.1, VERDICT r7
    * item 5). Keyed by Tables.fingerprint so a regenerated dataset at
    * the same path misses instead of replaying stale ranks, and capped:
    * a graph too big to pin on the driver is returned DISTRIBUTED
    * (localCheckpointed — consumers join it twice) instead of
    * round-tripping every row through driver memory for nothing
    * (ADVICE r8). The rounded ranks make the replayed relation
    * bit-identical to a rerun. */
  private val prCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Double)]]()
  private val prCacheCap = 200000

  private def pagerankShared(s: SparkSession, d: String, iters: Int): DataFrame = {
    import s.implicits._
    val key = s"${Tables.fingerprint(d, "orders")}#$iters"
    val cached = prCache.get(key)
    if (cached != null) return cached.toDF("v", "rank")
    val pr = pagerank(s, d, iters).select("v", "rank").localCheckpoint()
    val head = pr.head(prCacheCap + 1)
    if (head.length <= prCacheCap) {
      val rows = head.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      prCache.put(key, rows)
      rows.toDF("v", "rank")
    } else pr // too large to pin: stay distributed
  }

  /** ENGINE-PARITY check: the same PageRank (fixed supersteps, damping
    * 0.85) run on BOTH execution paths — the declarative Iterate loop
    * that q_graph_pagerank ships AND the typed Pregel engine (vertex
    * program, dst-keyed message shuffle, sum combiner) — then compared
    * vertex-by-vertex. This turns the architecture claim "the two engines
    * implement the same semantics" into a driver-checked invariant row.
    * Tolerance 1e-6 absorbs message-summation order (the inbox is
    * unordered, exactly the reference's BSPPeer contract) and the
    * declared query's 9-decimal rounding; the update chain is identical. */
  private def pagerankParity(s: SparkSession, d: String, iters: Int = 10): DataFrame = {
    import s.implicits._
    val e = edges(s, d).select("src", "dst")
    val vs = nodes(e).cache()
    val n = vs.count().toDouble
    val adj = e.groupBy("src").agg(collect_list("dst").as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"), typedLit(Seq.empty[Long])).as("adj"))
      .as[(Long, Seq[Long])]
      .map { case (v, a) => (v, PrV(1.0 / n, a)) }
    val typed = Pregel.run[PrV, Double, Unit](s, verts, maxIter = iters + 1,
      combiner = Some((a: Double, b: Double) => a + b),
      partitions = Some(Pregel.sizedPartitions(s, n.toLong)))((_, v, msgs, step, _) =>
        if (step == 0)
          Pregel.ComputeResult(v, messages = v.adj.map(dst => (dst, v.rank / v.adj.size)))
        else {
          val nr = 0.15 / n + 0.85 * msgs.sum
          if (step < iters)
            Pregel.ComputeResult(v.copy(rank = nr),
              messages = v.adj.map(dd => (dd, nr / v.adj.size)))
          else Pregel.ComputeResult(v.copy(rank = nr), voteToHalt = true)
        })
      .map { case (id, v) => (id, v.rank) }.toDF("v", "t_rank")
    val out = pagerankShared(s, d, iters).join(typed, "v")
      .agg(count(lit(1)).as("n_vertices"),
        (max(abs(col("t_rank") - col("rank"))) < 1e-6).as("engines_agree"))
      .localCheckpoint() // eager, 1 row — materialize, then free the cache
    vs.unpersist()       // (ADVICE r2: don't leak blocks until clearCache)
    out
  }

  /** SUPERSTEP-RECOVERY invariant row — the reference's checkpoint-based
    * recovery semantics (`core/.../bsp/ft/AsyncRcvdMsgCheckpointImpl
    * .java:69-260`, fast-forward `SuperstepBSP.java:61-77`) as a
    * driver-checked query: run the typed-Pregel PageRank with durable
    * snapshots every 2 supersteps, kill the loop mid-run (maxIter=3), then
    * resume from the last committed snapshot (state entering superstep 2)
    * and finish the full `iters` supersteps. The resumed result must match
    * the uninterrupted declarative run vertex-by-vertex (1e-6 tolerance,
    * as q_graph_pagerank_parity). */
  private def pagerankResume(s: SparkSession, d: String, iters: Int = 5): DataFrame = {
    import s.implicits._
    val e = edges(s, d).select("src", "dst")
    val vs = nodes(e).cache()
    val n = vs.count().toDouble
    val adj = e.groupBy("src").agg(collect_list("dst").as("adj"))
    val verts = vs.join(adj, vs("v") === adj("src"), "left")
      .select(col("v"), coalesce(col("adj"), typedLit(Seq.empty[Long])).as("adj"))
      .as[(Long, Seq[Long])]
      .map { case (v, a) => (v, PrV(1.0 / n, a)) }
    // one compute fn shared by the interrupted and the resumed run — the
    // recovery contract is "same program, restored state"
    val fn: (Long, PrV, Seq[Double], Int, Option[Unit]) => Pregel.ComputeResult[PrV, Double] =
      (_, v, msgs, step, _) =>
        if (step == 0)
          Pregel.ComputeResult(v, messages = v.adj.map(dst => (dst, v.rank / v.adj.size)))
        else {
          val nr = 0.15 / n + 0.85 * msgs.sum
          if (step < iters)
            Pregel.ComputeResult(v.copy(rank = nr),
              messages = v.adj.map(dd => (dd, nr / v.adj.size)))
          else Pregel.ComputeResult(v.copy(rank = nr), voteToHalt = true)
        }
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_resume_").toString
    // phase 1: the "crashed" job — snapshot at superstep 2, killed at 3
    Pregel.run[PrV, Double, Unit](s, verts, maxIter = 3,
      combiner = Some((a: Double, b: Double) => a + b),
      checkpointing = Some(Pregel.Checkpointing(dir, every = 2)),
      partitions = Some(Pregel.sizedPartitions(s, n.toLong)))(fn)
    // phase 2: recover from the committed snapshot, run to completion
    val snap = Pregel.latestSnapshot[PrV, Double](s, dir)
      .getOrElse(sys.error(s"no committed Pregel snapshot under $dir"))
    val typed = Pregel.run[PrV, Double, Unit](s, verts, maxIter = iters + 1,
        combiner = Some((a: Double, b: Double) => a + b),
        resumeFrom = Some(snap),
        partitions = Some(Pregel.sizedPartitions(s, n.toLong)))(fn)
      .map { case (id, v) => (id, v.rank) }.toDF("v", "t_rank")
    val out = pagerankShared(s, d, iters).join(typed, "v")
      .agg(count(lit(1)).as("n_vertices"),
        (max(abs(col("t_rank") - col("rank"))) < 1e-6).as("resumed_matches_uninterrupted"))
      .withColumn("resumed_from", lit(snap.superstep.toLong))
      .localCheckpoint() // eager, 1 row — materialize before cleanup
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true): Unit
    vs.unpersist()
    out
  }

  /** SSSP from vertex 0, fixed rounds of min-plus relaxation with the
    * MinIntCombiner as partial min aggregation
    * (`examples/src/main/java/org/apache/hama/examples/SSSP.java:41-88`). */
  private def sssp(s: SparkSession, d: String, rounds: Int = 6): DataFrame = {
    val e = edges(s, d)
    // fold the identity term min(dist, …) into the edge set as zero-weight
    // self-loops: the loop state is then referenced ONCE per round, keeping
    // plan growth linear (a union of state with its own join doubles the
    // plan every round — exponential analysis time by round 8)
    val ePlus = e.unionAll(nodes(e).select(col("v").as("src"), col("v").as("dst"),
      lit(0L).as("w"))).cache()
    val init = s.range(1).select(lit(0L).as("v"), lit(0L).as("dist"))
    val out = Iterate(init, rounds, checkpointEvery = 3) { (dist, _) =>
      dist.as("dd").join(ePlus.as("ee"), col("dd.v") === col("ee.src"))
        .groupBy(col("ee.dst").as("v"))
        .agg(min(col("dd.dist") + col("ee.w")).as("dist"))
    }
    out.orderBy("v")
  }

  /** SSSP run to TRUE convergence: the same Bellman-Ford relax loop as
    * [[sssp]] but via Iterate.untilFixpoint — the round count is
    * DISCOVERED by the changed-distance counter hitting zero, the Spark
    * re-expression of the reference's updated-flag halt
    * (`examples/src/main/java/org/apache/hama/examples/SSSP.java:41-88`,
    * vote-to-halt when no neighbor improves). The paired oracle is a
    * `WITH RECURSIVE` min-plus closure — a genuine fixpoint, not a
    * round-unrolled chain — so the gate checks convergence itself
    * (VERDICT r5 item 2). */
  private def ssspFixpoint(s: SparkSession, d: String): DataFrame = {
    // ACTIVE-SET Bellman-Ford (the reference's superstep contract —
    // only vertices that received messages recompute,
    // `GraphJobRunner.java:256-313`): each round relaxes only the edges
    // OUT OF vertices whose distance improved last round. Min-plus is
    // monotone non-increasing, so a distance can only improve via an
    // improved in-neighbor — the frontier IS the complete change set,
    // round counts and output are identical to the full relaxation, and
    // a converging round costs O(frontier out-degree), not O(E).
    val e = edges(s, d).cache()
    // maxIter = N: a shortest path has < N hops, so convergence is a
    // theorem, not a tuning choice; the loop halts far earlier in practice.
    // The changed flag rides IN the state row (optimization r14, guide
    // §2.4): the frontier is a narrow filter over the previous round's
    // checkpointed blocks and the min-merge lands in ONE materialized
    // join per round — the separate improved-vs-state join, its extra
    // checkpoint, and the anti-join+union rebuild all collapse into the
    // full-outer merge, with the same unique min-plus fixpoint (an
    // unchanged vertex's contribution was already min-merged the round
    // it last improved).
    val init = s.range(1)
      .select(lit(0L).as("v"), lit(0L).as("dist"), lit(true).as("chg"))
    val (outRaw, _) = Iterate.untilFixpoint(init, maxIter = N, checkpointEvery = 0) {
      (dist, _) =>
        val cand = dist.filter(col("chg")).as("f")
          .join(e.as("ee"), col("f.v") === col("ee.src"))
          .groupBy(col("ee.dst").as("v"))
          .agg(min(col("f.dist") + col("ee.w")).as("nd"))
        // changed-count observed during the checkpoint job itself —
        // one Spark job per round, not two (optimization r15,
        // Iterate.pinCountTrue)
        val (next, changed) = Iterate.pinCountTrue(
          dist.as("o").join(cand.as("c"), Seq("v"), "full_outer")
            .select(col("v"),
              least(coalesce(col("dist"), lit(Long.MaxValue)),
                coalesce(col("nd"), lit(Long.MaxValue))).as("dist"),
              (coalesce(col("nd"), lit(Long.MaxValue)) <
                coalesce(col("dist"), lit(Long.MaxValue))).as("chg")),
          col("chg"))
        Iterate.release(dist)
        (next, changed)
    }
    val out = outRaw.select(col("v"), col("dist"))
    e.unpersist()
    out.orderBy("v")
  }

  /** Min-plus closure as a recursive CTE: every walk from the source with
    * total weight under the theorem bound (N−1 hops × max weight 7), MIN
    * per vertex. The recursion terminates because (v, dist) pairs are
    * set-deduped and dist is bounded — the oracle discovers the fixpoint
    * instead of unrolling a declared round count. */
  private val ssspFixpointSql =
    s"""WITH RECURSIVE $edgesSql,
       walks(v, dist) AS (
         SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist
         UNION
         SELECT e.dst AS v, walks.dist + e.w AS dist
         FROM walks JOIN e ON e.src = walks.v
         WHERE walks.dist + e.w < ${N * 7}
       )
       SELECT v, MIN(dist) AS dist FROM walks GROUP BY v ORDER BY v"""

  /** Connected components run to TRUE convergence: plain min-label
    * propagation via Iterate.untilFixpoint (MindistSearch's
    * updated-flag halt, `examples/src/main/java/org/apache/hama/examples/
    * MindistSearch.java:47-117`) — rounds discovered, not declared; the
    * oracle is the reachability closure's MIN label per vertex. */
  private def ccFixpoint(s: SparkSession, d: String): DataFrame = {
    // ACTIVE-SET min-label propagation (same contract as ssspFixpoint:
    // labels only decrease, and only via a neighbor that just
    // decreased, so the frontier is the complete change set) — rounds
    // and labels identical to the full join, at O(frontier degree) per
    // converging round instead of O(E).
    val e = edges(s, d)
    val vs = nodes(e).cache()
    val eu = undirected(e).cache()
    // changed flag IN the state row, one materialized join per round
    // (optimization r14, guide §2.4) — same unique min-label fixpoint as
    // the previous improved-set bookkeeping, minus its extra checkpoint
    // and the anti-join+union state rebuild per round.
    val init = vs.select(col("v"), col("v").as("lbl"), lit(true).as("chg"))
    val (outRaw, _) = Iterate.untilFixpoint(init, maxIter = N, checkpointEvery = 0) {
      (c, _) =>
        val cand = c.filter(col("chg")).as("f")
          .join(eu.as("ee"), col("f.v") === col("ee.src"))
          .groupBy(col("ee.dst").as("v")).agg(min(col("f.lbl")).as("nl"))
        // changed-count observed during the checkpoint job (r15)
        val (next, changed) = Iterate.pinCountTrue(
          c.as("o").join(cand.as("n"), Seq("v"), "left")
            .select(col("v"),
              least(col("lbl"), coalesce(col("nl"), lit(Long.MaxValue))).as("lbl"),
              (coalesce(col("nl"), lit(Long.MaxValue)) < col("lbl")).as("chg")),
          col("chg"))
        Iterate.release(c)
        (next, changed)
    }
    val out = outRaw.select(col("v"), col("lbl"))
    Seq(vs, eu).foreach(_.unpersist())
    out.orderBy("v")
  }

  /** Connected components by LARGE-STAR / SMALL-STAR contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — the alternating-contraction algorithm, re-expressed as
    * two hash aggregates + a distinct per round): large-star hangs every
    * larger neighbor of u under min(Γ(u) ∪ {u}); small-star re-keys each
    * edge at its larger endpoint and hangs that vertex and its smaller
    * neighbors under their minimum. Alternating the two preserves
    * connectivity and converges in O(log² V) rounds to a star forest
    * pointing every vertex at its component MINIMUM — where label
    * propagation (ccFixpoint) pays one round per hop of the diameter.
    * THE shape for 100 TB graphs with long chains (web graphs, road
    * networks): no growing state relation, no diameter dependence.
    * Oracle shared VERBATIM with q_graph_cc_fixpoint — both algorithms
    * must land on identical component minima. */
  private def ccStar(s: SparkSession, d: String): DataFrame =
    ccStarOn(edges(s, d))

  /** [[ccStar]] over an arbitrary (src, dst) relation — the spec entry. */
  private[graft] def ccStarOn(e0: DataFrame): DataFrame = {
    val s = e0.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val vs = pin(nodes(e0))
    var cur = pin(e0.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val m = nb.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      nb.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val nb = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = nb.groupBy("u").agg(min(col("v")).as("m")) // Γ⁻(u) ≤ u, so min(Γ⁻)
      nb.join(m, "u")
        .select(col("v").as("a"), col("m"))
        .unionAll(m.select(col("u").as("a"), col("m")))
        .filter(col("a") =!= col("m"))
        .select(col("a").as("u"), col("m").as("v"))
        .distinct()
    }
    var rounds = 0
    var stable = false
    while (!stable) {
      rounds += 1
      require(rounds <= 50, // O(log² V) with huge headroom at any gate SF
        s"ccStar: star contraction did not stabilize in 50 LS+SS rounds")
      val next = pin(smallStar(largeStar(cur)))
      val diff = next.as("n").join(cur.as("o"),
          col("n.u") === col("o.u") && col("n.v") === col("o.v"), "full")
        .filter(col("n.u").isNull || col("o.u").isNull).count()
      if (diff == 0L) { stable = true; Iterate.release(next) }
      else { Iterate.release(cur); cur = next }
    }
    // terminal star forest: one parent per non-minimum vertex (min-fold
    // defensively, though convergence guarantees uniqueness)
    val out = vs.join(cur.groupBy("u").agg(min(col("v")).as("p")),
        vs("v") === col("u"), "left")
      .select(vs("v"), coalesce(col("p"), vs("v")).as("lbl"))
      .orderBy("v")
      .localCheckpoint()
    Seq(cur, vs).foreach(Iterate.release)
    out
  }

  private val ccFixpointSql =
    s"""WITH RECURSIVE $edgesSql,
       $undirectedSql,
       $nodesSql,
       reach(v, lbl) AS (
         SELECT v, v AS lbl FROM nodes
         UNION
         SELECT eu.dst AS v, reach.lbl AS lbl
         FROM reach JOIN eu ON eu.src = reach.v
       )
       SELECT v, MIN(lbl) AS lbl FROM reach GROUP BY v ORDER BY v"""

  /** STRONGLY connected components on the directed graph via
    * forward-backward min-label trim: per peel, F(v) = min id forward-
    * reachable from v and B(v) = min id backward-reachable (two CC-shaped
    * min-label fixpoints, state O(V) each — never a closure relation);
    * F and B are constant on an SCC, and F(v) = B(v) = m means v and m
    * are mutually reachable with m the SCC's min — so every vertex with
    * F = B settles with its whole component, settled components leave
    * the residual graph, and the loop repeats. The residual global min
    * always settles (F = B = itself), so peels ≤ #SCCs and in practice
    * few: dense graphs collapse to one giant SCC in peel 1. This is the
    * FW-BW-Trim family (Slota et al.) restated as dataflow — the same
    * scale posture as CC, times the peel count. Oracle: transitive
    * closure → mutual-reach pairs → min per vertex (exact, small-N). */
  private def sccTrim(s: SparkSession, d: String): DataFrame =
    sccTrimOn(edges(s, d).select("src", "dst"))

  /** Level-synchronous multi-source BFS with path counting: returns
    * (reached, perLevelFrontiers) where `reached` holds one row
    * (s, v, d, sigma) per source-reachable pair — d the shortest
    * distance, sigma the NUMBER of shortest s→v paths. State is
    * O(|sources| × V): with `sources = None` every vertex is a source
    * (exact, oracle-checkable, O(V²) state — fine at gate scale, the
    * classic quadratic blow-up at 100×); passing a SAMPLED source
    * relation is the declared 100 TB shape (the standard Brandes
    * estimator — `q_graph_betweenness_sampled` ships it, and
    * CentralityScale measures the bound). One join + one
    * partial-combined aggregate per level; levels = graph diameter. */
  private[graft] def bfsSigma(e0: DataFrame,
      sources: Option[DataFrame] = None): (DataFrame, Seq[DataFrame]) = {
    val s = e0.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val e = pin(e0.select("src", "dst").filter(col("src") =!= col("dst")).distinct())
    val srcs = sources.map(df => pin(df.select("v"))).getOrElse(pin(nodes(e)))
    var reached = pin(srcs.select(col("v").as("s"), col("v"),
      lit(0).as("d"), lit(1L).as("sigma")))
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](reached)
    var frontier = reached
    var lvl = 0
    // ONE job per level (optimization r15): the new frontier's emptiness
    // check is OBSERVED during its own checkpoint (pinCountAll), and the
    // growing `reached` relation is a LAZY union of the level pins — the
    // old shape re-pinned the whole accumulated relation every level
    // (O(levels × reached) block rewrites) plus a head(1) probe. The
    // anti-join consumes the union of already-materialized level blocks
    // either way; only the per-level rewrite and probe jobs disappear.
    var frontierEmpty = frontier.head(1).isEmpty
    while (!frontierEmpty && lvl < N) {
      lvl += 1
      val expand = frontier.select(col("s"), col("v").as("u"), col("sigma"))
        .join(e, col("u") === col("src"))
        .groupBy(col("s"), col("dst")).agg(sum("sigma").as("sigma"))
        .select(col("s"), col("dst").as("v"), lit(lvl).as("d"), col("sigma"))
      val (nf, nfRows) = Iterate.pinCountAll(expand.join(
        reached.select(col("s").as("rs"), col("v").as("rv")),
        col("s") === col("rs") && col("v") === col("rv"), "left_anti"),
        freshIds = true)
      frontierEmpty = nfRows == 0
      if (!frontierEmpty) {
        reached = reached.unionAll(nf)
        levels += nf
      }
      frontier = nf
    }
    (reached, levels.toSeq)
  }

  /** Betweenness centrality — Brandes restated as level-synchronous
    * dataflow: forward all-sources BFS with path counts ([[bfsSigma]]),
    * then the dependency accumulation run BACKWARD one level at a time:
    * δ_s(v) = Σ_{(v,w) on the shortest-path DAG} σ_sv/σ_sw·(1+δ_s(w)),
    * bc(v) = Σ_{s≠v} δ_s(v). Each backward level is one edge join + one
    * aggregate over the level's pairs — no per-source sequential state,
    * which is what makes the textbook stack-based Brandes distributable.
    * With `sources = None` this is EXACT (all sources, O(V²) forward
    * state); with a sampled source relation it is the standard Brandes
    * ESTIMATOR — bc rescaled by `scale` = V/|S|, SAME dataflow, forward
    * state bounded by |S|·V — the declared 100 TB shape
    * (`q_graph_betweenness_sampled`; CentralityScale measures both). */
  private[graft] def betweennessOn(e0: DataFrame,
      sources: Option[DataFrame] = None, scale: Double = 1.0,
      outCol: String = "bc"): DataFrame = {
    val s = e0.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val e = pin(e0.select("src", "dst").filter(col("src") =!= col("dst")).distinct())
    val (_, levels) = bfsSigma(e, sources)
    betweennessLevels(e, levels, scale, outCol)
  }

  /** The all-sources BFS relation over the derived orders graph,
    * memoized per corpus fingerprint (the pagerankShared pattern):
    * exact betweenness, eccentricity and harmonic centrality are three
    * VIEWS of this one (s, v, d, sigma) relation — it used to be
    * recomputed three times per suite (~8 s at sf0.1). O(V²) = 40k
    * rows at N = 200, far below the cap; a graph too big to pin is
    * returned distributed, uncached. */
  private val bfsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Long, Int, Long)]]()
  private val bfsCacheCap = 500000

  private def bfsSigmaShared(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key = Tables.fingerprint(d, "orders")
    val cached = bfsCache.get(key)
    if (cached != null) return cached.toDF("s", "v", "d", "sigma")
    val (reached, _) = bfsSigma(edges(s, d).select("src", "dst"))
    val head = reached.head(bfsCacheCap + 1)
    if (head.length <= bfsCacheCap) {
      val rows = head.map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
      bfsCache.put(key, rows)
      rows.toDF("s", "v", "d", "sigma")
    } else reached // too large to pin: stay distributed
  }

  /** A frontier level is exactly the reached rows at distance l (every
    * row enters `reached` at its own BFS level), so a memoized reached
    * relation reconstructs the per-level frontiers the backward pass
    * consumes without rerunning the forward BFS. */
  private def betweennessFromReached(e: DataFrame, reached: DataFrame,
      scale: Double = 1.0, outCol: String = "bc"): DataFrame = {
    val maxLvl = reached.agg(max("d")).head.getInt(0)
    val levels = (0 to maxLvl).map(l => reached.filter(col("d") === l))
    betweennessLevels(e, levels, scale, outCol)
  }

  private def betweennessLevels(e: DataFrame, levels: Seq[DataFrame],
      scale: Double, outCol: String): DataFrame = {
    val s = e.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val ns = nodes(e)
    val maxLvl = levels.length - 1
    if (maxLvl == 0) return ns.select(col("v"), lit(0.0).as(outCol)).orderBy("v")
    var curDelta = pin(levels(maxLvl).select(col("s"), col("v"), lit(0.0).as("delta")))
    // the accumulated deltas are a LAZY union of the per-level pins
    // (r15): only the final bc aggregate consumes them, so the old
    // per-level re-pin of the whole accumulation bought nothing
    val deltas = scala.collection.mutable.ArrayBuffer[DataFrame](curDelta)
    for (l <- maxLvl to 1 by -1) {
      val w = levels(l).select(col("s").as("ws"), col("v").as("w"), col("sigma").as("sw"))
        .join(curDelta.select(col("s").as("ds"), col("v").as("dv"), col("delta").as("dw0")),
          col("ws") === col("ds") && col("w") === col("dv"), "left")
        .select(col("ws"), col("w"), col("sw"),
          coalesce(col("dw0"), lit(0.0)).as("dw"))
      val vprev = levels(l - 1).select(col("s").as("vs"), col("v"), col("sigma").as("sv"))
      curDelta = pin(vprev
        .join(e, col("v") === col("src"))
        .join(w, col("vs") === col("ws") && col("dst") === col("w"))
        .groupBy(col("vs").as("s"), col("v"))
        .agg(sum(col("sv") * (lit(1.0) + col("dw")) / col("sw")).as("delta")))
      deltas += curDelta
    }
    val acc = deltas.reduce(_ unionAll _)
    // δ_s(s) (the level-0 rows) is a loop invariant of the recurrence,
    // NOT part of bc — Brandes sums δ_s(v) only over v ≠ s
    ns.join(acc.filter(col("s") =!= col("v"))
        .groupBy("v").agg(sum("delta").as("bc0")), Seq("v"), "left")
      .select(col("v"),
        round(coalesce(col("bc0"), lit(0.0)) * scale, 4).as(outCol))
      .orderBy("v")
  }

  /** unrolled BFS-with-path-counts CTE chain for the DuckDB oracle —
    * `levels` fixed at comfortably above the test graph's diameter
    * (extra levels yield empty frontiers and add nothing). Defines
    * `ed`, `bnodes`, and `r` = (s, v, d, sigma). */
  private def bfsSigmaSql(levels: Int): String = {
    val steps = (0 until levels).map { i =>
      s"""f${i + 1} AS (
           SELECT f.s, ed.dst AS v, ${i + 1} AS d, SUM(f.sigma) AS sigma
           FROM f$i f JOIN ed ON ed.src = f.v
           LEFT JOIN r$i seen ON seen.s = f.s AND seen.v = ed.dst
           WHERE seen.v IS NULL
           GROUP BY f.s, ed.dst),
         r${i + 1} AS (SELECT * FROM r$i UNION ALL SELECT * FROM f${i + 1})"""
    }.mkString(",\n")
    s"""ed AS (SELECT src, dst FROM e WHERE src <> dst GROUP BY src, dst),
       bnodes AS (SELECT DISTINCT src AS v FROM ed UNION SELECT DISTINCT dst FROM ed),
       r0 AS (SELECT v AS s, v, 0 AS d, CAST(1 AS BIGINT) AS sigma FROM bnodes),
       f0 AS (SELECT * FROM r0),
       $steps,
       r AS (SELECT * FROM r$levels)"""
  }

  // ---- ANF / HyperANF neighborhood-function sketch -----------------------

  /** DEFAULT number of Flajolet-Martin registers per vertex. Standard
    * error of the FM mean-of-registers estimate is ~0.78/√K ≈ 28% at
    * K = 8 — kept at 8 for the declared rows so the longhand oracle
    * stays cheap. K is a parameter of [[anfInit]]/[[anfSketch]] (the
    * LSH numHashes precedent, VERDICT r10 #5): a production run turns
    * it up for linear cost in state and per-round work —
    * examples/CentralityScale measures K = 64 cutting the reach error
    * ~√8-fold at the expected ~8× register rows. */
  private val anfK = 8
  private val anfPhi = 0.77351 // Flajolet-Martin bias correction constant

  /** Portable FM register init: one md5 per (vertex, register), the first
    * 8 hex digits as a 32-bit draw, register bit = number of trailing
    * zeros (geometric, P(p) = 2^-(p+1)), stated with the same longhand
    * arithmetic on both engines (the q_agg_countmin recipe): trailing
    * zeros of h = log2(h & -h), exact in double for powers of two. */
  private val anfInitExpr =
    "shiftleft(CAST(1 AS BIGINT), CASE WHEN h = 0 THEN 31 " +
      "ELSE least(CAST(round(log2(h & -h)) AS INT), 31) END)"

  /** FM estimate per vertex from OR-merged registers: b_k = position of
    * the least-significant ZERO bit of mask k ((mask+1) & ~mask isolates
    * it), reach ≈ 2^(avg_k b_k) / φ. */
  private[graft] def anfEstimate(masks: DataFrame): DataFrame =
    masks
      .withColumn("b", expr("CAST(round(log2((mask + 1) & ~mask)) AS DOUBLE)"))
      .groupBy("v")
      .agg(expr(s"round(pow(2.0, avg(b)) / $anfPhi, 4)").as("reach_est"))

  /** neighborhood function at one radius: Σ_v reach_est(v), the expected
    * number of reachable PAIRS within r hops — rounded per vertex then
    * per sum so both engines compare the identical scalar */
  private def anfNf(masks: DataFrame): Double =
    anfEstimate(masks).agg(round(sum("reach_est"), 2)).head.getDouble(0)

  /** fresh FM registers for a vertex relation — the portable init both
    * the cold start and a warm start's NEW vertices use */
  private def anfInit(vs: DataFrame, k: Int = anfK): DataFrame =
    vs.select(col("v"), explode(expr(s"sequence(0, ${k - 1})")).as("k"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat(CAST(v AS STRING), '#', " +
          "CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
      .select(col("v"), col("k"), expr(anfInitExpr).as("mask"))

  /** ANF (Palmer-Gibbons-Faloutsos; register OR-merge per round =
    * HyperANF's dataflow with FM bitmasks for oracle portability): each
    * vertex carries K fixed-size registers, one round ORs every vertex's
    * registers with its out-neighbors', run to the DISCOVERED fixpoint —
    * at which point register k of v sketches the full reachable set
    * N(v,∞). State is O(V·K) TOTAL and each round is one join + one
    * bit_or hash-aggregate — the scale-safe shape for diameter/average-
    * path-length summaries where the exact all-sources BFS relation is
    * O(V²) rows (VERDICT r9 item 1; the reference's per-superstep
    * aggregator merge is this exact merge,
    * `graph/src/main/java/org/apache/hama/graph/GraphJobRunner.java:393-424`).
    *
    * `warm` seeds the loop from EXISTING registers (must cover every
    * vertex of e0): because the OR-merge is monotone and any state
    * between the fresh init and the fixpoint has the same fixpoint, a
    * run warm-started from an earlier graph's converged registers lands
    * on bit-identical output in no more rounds than a cold run — the
    * incremental path for a growing graph (q_graph_anf_incremental).
    *
    * Returns (final (v, k, mask) registers, rounds, NF(r) for
    * r=0..rounds, per-round curve (v, reach_est, r)). */
  private[graft] def anfSketch(e0: DataFrame, maxIter: Int = 64,
      warm: Option[DataFrame] = None, k: Int = anfK,
      broadcastBound: Long = anfBroadcastRows)
      : (DataFrame, Int, Seq[Double], DataFrame) = {
    val s = e0.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val e = pin(e0.select("src", "dst").filter(col("src") =!= col("dst")).distinct())
    val init = pin(warm.getOrElse(anfInit(nodes(e), k)))
    val nf = scala.collection.mutable.ArrayBuffer.empty[Double]
    // per-round estimates accumulate as PINS and union into the curve
    // ONCE after the loop (optimization r14): the old per-round
    // union-and-repin paid one extra checkpoint materialization per
    // round for a relation only read after convergence. Each pin is
    // O(V) rows; all are released once the final curve owns its blocks.
    val curveParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def record(masks: DataFrame, r: Int): Unit = {
      val est = pin(anfEstimate(masks).withColumn("r", lit(r.toLong)))
      nf += est.agg(round(sum("reach_est"), 2)).head.getDouble(0)
      curveParts += est: Unit
    }
    record(init, 0)
    // ACTIVE-SET rounds (the reference's superstep contract — only
    // vertices that received messages recompute,
    // `graph/src/main/java/org/apache/hama/graph/GraphJobRunner.java:256-313`):
    // each round joins the edges against ONLY the registers that CHANGED
    // last round — OR-monotonicity means an unchanged neighbor has
    // nothing new to contribute, so the changed set IS the complete
    // frontier and the per-round changed sets (hence round count, NF
    // curve, and fixpoint) are bit-identical to the full join. Round 1's
    // frontier is the whole init (a cold start changes everything);
    // converging rounds then pay O(frontier in-degree) joined rows, not
    // O(E·K). A later round's frontier broadcasts ONLY when the
    // previous round measured it under `broadcastBound` rows — the
    // count is already paid at line ~1165, and on a large graph the
    // changed set stays ~V·K for the first several rounds (every
    // vertex whose r-hop neighborhood grows changes), so a FORCED
    // broadcast there is a driver-side collect/OOM, not a hint
    // (VERDICT r12 #1). Over the bound the join runs un-hinted: a
    // plain shuffle against the edge relation, which at cluster scale
    // stays hash-partitioned on dst and is never re-shuffled by these
    // rounds. Round 1's frontier is the FULL V·K state — never hinted.
    // The changed flag rides IN the state row (optimization r14, guide
    // §2.4): the frontier is a narrow filter over the previous round's
    // pinned blocks, and the OR-merge + strict-growth test land in ONE
    // materialized join per round — the old changedRows pin plus the
    // anti-join+union state rebuild (two pinned multi-join plans per
    // round) collapse into a single left join, with the identical
    // monotone fixpoint: new mask = old | contributions, changed ⇔ the
    // contribution carries a bit the old mask lacks.
    var lastChanged = Long.MaxValue // round-1 frontier = full init
    val initChg = pin(init.withColumn("chg", lit(true)))
    Iterate.release(init) // initChg owns its blocks now
    val fp = Iterate.untilFixpointChecked(initChg, maxIter = maxIter,
      checkpointEvery = 0) { (m, i) =>
      val fsel = m.filter(col("chg"))
        .select(col("v").as("fv"), col("k"), col("mask"))
      val fHinted =
        if (i > 0 && lastChanged <= broadcastBound) broadcast(fsel) else fsel
      val nbr = e.join(fHinted, e("dst") === col("fv"))
        .select(e("src").as("v"), col("k"), col("mask"))
      val contrib = nbr.groupBy("v", "k")
        .agg(expr("bit_or(mask)").as("cand"))
      // changed-count observed during the checkpoint job (r15); fresh
      // attribute ids for the same reason as pin()
      val (next, changed) = Iterate.pinCountTrue(
        m.as("o").join(contrib.as("n"), Seq("v", "k"), "left")
          .select(col("v"), col("k"),
            col("mask").bitwiseOR(coalesce(col("cand"), lit(0L))).as("mask"),
            (coalesce(col("cand"), lit(0L))
              .bitwiseAND(bitwise_not(col("mask"))) =!= lit(0L)).as("chg")),
        col("chg"), freshIds = true)
      record(next, i + 1)
      Iterate.release(m)
      lastChanged = changed
      (next, changed)
    }.requireConverged("anfSketch")
    Iterate.release(e) // dead once the fixpoint's final pin exists
    val curve = pin(curveParts.reduce(_ unionAll _))
    curveParts.foreach(Iterate.release)
    (fp.out.select("v", "k", "mask"), fp.iters, nf.toSeq, curve)
  }

  /** converged ANF registers + per-round curve over the derived orders
    * graph, memoized per corpus fingerprint (the bfsSigmaShared pattern
    * — five declared rows read this one relation). V·K = 1,600 register
    * rows and V·(rounds+1) curve rows at gate scale. */
  private val anfCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, Int, Long)], Int, Seq[Double], Seq[(Long, Double, Long)])]()
  private val anfCacheCap = 500000

  /** Warm register state covering e's FULL vertex set: the existing
    * masks plus fresh init rows for vertices they don't cover — the
    * entry point both incremental (q_graph_anf_incremental) and
    * STREAMING (q_stream_live_anf) summary maintenance share. */
  /** Carry-over masks plus fresh registers for vertices the sketch has
    * not seen. `k` MUST match the width the carried masks were built at —
    * a production sketch maintained at K=64 that warm-started new
    * vertices at the default 8 would silently mix register widths and
    * skew every downstream estimate, so the width is a parameter here
    * (same knob as anfInit/anfSketch, VERDICT r10 #5). */
  private[graft] def anfWarm(masks: DataFrame, e: DataFrame,
      k: Int = anfK): DataFrame =
    masks.unionAll(
      anfInit(nodes(e), k)
        .join(masks.select("v").distinct(), Seq("v"), "left_anti"))

  /** dst-bucket count shared by the streaming edge store's writer
    * (partitionBy("db")) and [[anfDelta]]'s pruned probe — ONE constant
    * so the two `pmod(hash(dst), nB)` expressions can never diverge. */
  private[graft] val anfDstBuckets = 16

  /** v-bucket count for the file-backed REGISTER store (partitionBy
    * ("vb")) — shared by runAnfMaintain's writer/bucket-rewrite and
    * [[anfDeltaRows]]'s pruned state reads, same discipline as
    * [[anfDstBuckets]]. */
  private[graft] val anfRegBuckets = 16

  /** Frontier-row bound under which the active-set ANF rounds hint
    * `broadcast()` on the changed-register frontier. A frontier is
    * UNBOUNDED a priori (up to V·K rows in the early rounds of a cold
    * run, or after a delta edge bridges two large components), and a
    * forced broadcast collects it to the driver — an OOM at cluster
    * scale, not a slowdown. Both loops already count the frontier each
    * round, so the hint costs nothing extra; over the bound the join
    * runs un-hinted against the dst-partitioned edge relation (the
    * reference's message-routing contract,
    * `graph/src/main/java/org/apache/hama/graph/GraphJobRunner.java:823-837`).
    * The default 1M rows ≈ 24 MB of (v,k,mask) longs — comfortably
    * inside Spark's broadcast limits with headroom for executor-side
    * copies. Session-tunable via `spark.graft.anf.broadcastRows`
    * (VERDICT r13 #6 — a deployment with bigger/smaller executors
    * moves the bound without a rebuild); read on the DRIVER at
    * plan-build time, validated ≥ 0 ([[graft.GraftConf]]). */
  private[graft] def anfBroadcastRows: Long = graft.GraftConf.anfBroadcastRows

  /** One round of a delta-frontier ANF batch: (frontier register rows,
    * edge-join output rows, register-store buckets opened for the
    * round's state read — −1 when the base is in-memory/unpruned) —
    * the instrumentation AnfMaintainScale asserts on (joined rows
    * bounded by the frontier's in-degree, not V·K or E·K; state reads
    * bounded by the frontier's buckets, not the whole store). */
  final case class AnfDeltaRound(frontierRows: Long, joinedRows: Long,
      stateBuckets: Long = -1L)

  /** DELTA-FRONTIER ANF maintenance (the reference's active-set
    * superstep contract, `GraphJobRunner.java:256-313`, applied to a
    * GROWING graph): given registers CONVERGED over the accumulated
    * graph and a micro-batch of new edges, land on the fixpoint of the
    * grown graph touching only what the new edges move —
    *
    *   - the frontier SEEDS from the new edges' endpoints (round 0
    *     pulls across ΔE only: every vertex a new edge can affect
    *     directly is a ΔE source, and every edge incident to a
    *     brand-new vertex IS a ΔE edge, so the seed is complete);
    *   - each later round joins the accumulated edges against ONLY the
    *     registers that CHANGED last round (monotone OR: an unchanged
    *     neighbor contributes nothing new);
    *   - changed registers accumulate in a Δ-overlay; the untouched
    *     bulk of the state is unioned back ONCE at the end — never
    *     joined per round.
    *
    * The accumulated edge relation is consumed AS IS — duplicate edges
    * and self-loops are no-ops under bit_or, so the caller appends
    * batches to a store instead of re-distincting O(E) rows per batch.
    * When it carries a `db` bucket column (pmod(hash(dst), nB)), each
    * round's probe prunes to the frontier's buckets — at cluster scale
    * the store is partitioned by `db` and the probe opens only those
    * files (the near-dup band-store recipe). Steady-state per-batch
    * cost: O(Δ · affected-in-degree), not O(E) — the r11 `weak`.
    * Monotonicity above a converged base gives the same unique fixpoint
    * as a cold run on the grown graph, bit-identically (asserted by
    * the q_stream_live_anf row and AnfDeltaSpec).
    *
    * Returns (final pinned registers — caller releases, rounds run,
    * per-round frontier/joined row counts). */
  /** Core of [[anfDelta]] returning the UPSERT OVERLAY instead of the
    * folded state: the register rows that are NEW (fresh-vertex inits)
    * or CHANGED (each superseding its base row bit-for-bit) — possibly
    * empty — plus rounds and per-round stats. When `baseMasks` carries a
    * `vb` partition column (`pmod(hash(v), anfRegBuckets)` — the
    * file-backed register store), EVERY state read in here prunes to
    * the touched vertices' buckets, so a round opens O(frontier
    * buckets) of the store and never scans the full V·K relation; the
    * caller then rewrites only the upserts' buckets (runAnfMaintain's
    * dynamic-partition overwrite). Without `vb` (an in-memory base) the
    * semi-joins scan the base pin — the small-state convenience path
    * [[anfDelta]] wraps for specs. */
  private[graft] def anfDeltaRows(baseMasks: DataFrame, accEdges: DataFrame,
      newEdges: DataFrame, maxIter: Int = 64, k: Int = anfK,
      broadcastBound: Long = anfBroadcastRows,
      dstBuckets: Int = anfDstBuckets, regBuckets: Int = anfRegBuckets)
      : (DataFrame, Int, Seq[AnfDeltaRound]) = {
    val s = baseMasks.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val dE = pin(newEdges.select("src", "dst")
      .filter(col("src") =!= col("dst")).distinct()) // Δ-sized, not O(E)
    // bucket counts are LAYOUT decisions pinned when the stores were
    // created (runAnfMaintain's `_layout` metadata, the near-dup
    // sigBuckets discipline) — the caller passes the stored widths, and
    // a probe expression built at a different width would silently read
    // the wrong partitions
    val eBuckets = if (accEdges.columns.contains("db")) dstBuckets else 0
    val rBuckets = if (baseMasks.columns.contains("vb")) regBuckets else 0
    def bksOf(vs: DataFrame): Seq[Int] =
      vs.select(pmod(hash(col("v")), lit(regBuckets)).as("vb")).distinct()
        .collect().map(_.getInt(0)).toSeq
    // base rows for a (small) vertex set — partition-pruned to the
    // set's (precomputed) buckets when the state is the file-backed store
    def baseFor(targets: DataFrame, tBks: Seq[Int]): DataFrame = {
      val b = if (tBks == null) baseMasks
        else baseMasks.filter(col("vb").isin(tBks: _*))
      b.select("v", "k", "mask").join(targets, Seq("v"), "left_semi")
    }
    // fresh init rows for vertices only the delta introduces: every
    // edge touching a brand-new vertex IS a dE edge, so nodes(dE)
    // covers them — and only dE's buckets of the store need consulting
    val dEv = pin(nodes(dE))
    val known = (if (rBuckets == 0) baseMasks
        else baseMasks.filter(col("vb").isin(bksOf(dEv): _*)))
      .select("v").distinct()
    val fresh = pin(anfInit(dEv, k).join(known, Seq("v"), "left_anti"))
    val stats = scala.collection.mutable.ArrayBuffer.empty[AnfDeltaRound]
    // changed-register pins, one per converged round — the Δ-overlay is
    // their LAZY union (optimization r15, VERDICT r14 #4): a round-r
    // changed row's mask is a superset of every earlier round's row for
    // the same (v, k) (monotone bit_or over a state that already
    // includes the overlay), so any consumer that merges with bit_or
    // collapses the un-deduplicated union exactly; the old shape paid
    // one materialized groupBy job per round just to keep the overlay
    // pre-merged. One merge job at the END builds the upsert rows.
    val frontiers = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def delta: DataFrame =
      if (frontiers.isEmpty) null else frontiers.reduce(_ unionAll _)
    // current register ROWS of a (small) vertex set, UNaggregated:
    // base ∪ fresh ∪ overlay, each semi-joined to the targets — the
    // caller's aggregate does the bit_or collapse
    def curRowsFor(targets: DataFrame, tBks: Seq[Int]): DataFrame = {
      val b = baseFor(targets, tBks)
        .unionAll(fresh.join(targets, Seq("v"), "left_semi"))
      val d = delta
      if (d == null) b else b.unionAll(d.join(targets, Seq("v"), "left_semi"))
    }
    // aggregated form — the seed push needs one row per (v, k)
    def curFor(targets: DataFrame, tBks: Seq[Int]): DataFrame =
      curRowsFor(targets, tBks)
        .groupBy("v", "k").agg(expr("bit_or(mask)").as("mask"))
    // one frontier round: push `pushed` register rows across `rel`
    // (dst → src pull), return the strictly-grown registers. The caller
    // supplies `pushedRows` (its loop-gate count — one job serves both,
    // where the old shape paid a head(1) gate plus a count): a single
    // delta edge bridging two large components cascades the changed set
    // toward V·K, and a FORCED broadcast of that is a driver collect
    // (VERDICT r12 #1). Over the bound the join shuffles against the
    // (db-pruned) edge relation instead.
    //
    // The round's state read, overlay merge and change diff all land in
    // ONE materialized job (the anfSketch single-materialization shape):
    // current rows tagged cur=true union the pulled rows, ONE aggregate
    // computes the merged mask and the cur-only mask, and a row changed
    // iff it HAD current bits (oldmask non-null — same exclusion as the
    // old inner join against the aggregated state) and gained bits.
    // every count here is OBSERVED during the pin that produced the
    // relation (Iterate.pinCountAll/pinObserved, r15): the nbr stats
    // count, the changed-set gate count and the seed-push count each
    // used to be their own narrow job per round
    def step(rel: DataFrame, pushed: DataFrame, pushedRows: Long)
        : (DataFrame, Long) = {
      val fsel = pushed.select(col("v").as("fv"), col("k"), col("mask"))
      val (nbr, nbrRows) = Iterate.pinCountAll(rel.join(
          if (pushedRows <= broadcastBound) broadcast(fsel) else fsel,
          rel("dst") === col("fv"))
        .select(rel("src").as("v"), col("k"), col("mask")), freshIds = true)
      val targets = nbr.select("v").distinct()
      val tBks = if (rBuckets == 0) null else bksOf(targets)
      val (changed, changedRows) = Iterate.pinCountAll(
        curRowsFor(targets, tBks)
          .select(col("v"), col("k"), col("mask"), lit(true).as("cur"))
          .unionAll(nbr.select(col("v"), col("k"), col("mask"),
            lit(false).as("cur")))
          .groupBy("v", "k")
          .agg(expr("bit_or(mask)").as("mask"),
            expr("bit_or(CASE WHEN cur THEN mask END)").as("oldmask"))
          .filter(col("oldmask").isNotNull && col("mask") =!= col("oldmask"))
          .select(col("v"), col("k"), col("mask")), freshIds = true)
      stats += AnfDeltaRound(pushedRows, nbrRows,
        if (tBks == null) -1L else tBks.size.toLong)
      Iterate.release(nbr)
      (changed, changedRows)
    }
    // seed: round 0 pulls across the NEW edges only — the masks pushed
    // are the current registers of ΔE's destinations
    val dstT = dE.select(col("dst").as("v")).distinct()
    val (seedPush, seedRows) = Iterate.pinCountAll(
      curFor(dstT, if (rBuckets == 0) null else bksOf(dstT)), freshIds = true)
    var (frontier, fRows) = step(dE, seedPush, seedRows)
    Iterate.release(seedPush)
    var rounds = 1
    while (fRows > 0) {
      require(rounds < maxIter,
        s"anfDelta: guard exhausted after $rounds rounds without convergence")
      frontiers += frontier // joins the lazy overlay; released at the end
      val fbks = // partition-pruned probe: only the frontier's buckets
        if (eBuckets == 0) accEdges
        else {
          val bs = frontier
            .select(pmod(hash(col("v")), lit(eBuckets)).as("db")).distinct()
            .collect().map(_.getInt(0)).toSeq
          accEdges.filter(col("db").isin(bs: _*))
        }
      val (nf, nfRows) = step(fbks, frontier, fRows)
      frontier = nf
      fRows = nfRows
      rounds += 1
    }
    Iterate.release(frontier) // the final, empty one
    // upserts = fresh rows not superseded by a change, plus the changes
    // (merged ONCE here — the per-round overlay stayed a lazy union)
    val upserts =
      if (frontiers.isEmpty) fresh
      else {
        val merged = pin(delta.groupBy("v", "k")
          .agg(expr("bit_or(mask)").as("mask")))
        frontiers.foreach(Iterate.release)
        val u = pin(fresh.join(merged.select("v", "k"), Seq("v", "k"), "left_anti")
          .unionAll(merged))
        Seq(fresh, merged).foreach(Iterate.release)
        u
      }
    Seq(dE, dEv).foreach(Iterate.release)
    (upserts, rounds, stats.toSeq)
  }

  /** [[anfDeltaRows]] with the overlay folded back into the carried
    * state in memory — the spec-facing convenience for in-memory bases
    * (the streaming maintainer instead rewrites only the upserts'
    * buckets of its file-backed store). Returns a fresh pin the caller
    * releases. */
  private[graft] def anfDelta(baseMasks: DataFrame, accEdges: DataFrame,
      newEdges: DataFrame, maxIter: Int = 64, k: Int = anfK,
      broadcastBound: Long = anfBroadcastRows)
      : (DataFrame, Int, Seq[AnfDeltaRound]) = {
    val s = baseMasks.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val (up, rounds, stats) =
      anfDeltaRows(baseMasks, accEdges, newEdges, maxIter, k, broadcastBound)
    val fin = pin(baseMasks.select("v", "k", "mask")
      .join(up.select("v", "k"), Seq("v", "k"), "left_anti")
      .unionAll(up))
    Iterate.release(up)
    (fin, rounds, stats)
  }

  private[graft] def anfShared(s: SparkSession, d: String)
      : (DataFrame, Int, Seq[Double], DataFrame) = {
    import s.implicits._
    val key = Tables.fingerprint(d, "orders")
    val cached = anfCache.get(key)
    if (cached != null)
      return (cached._1.toDF("v", "k", "mask"), cached._2, cached._3,
        cached._4.toDF("v", "reach_est", "r"))
    val (m, rounds, nf, curve) = anfSketch(edges(s, d).select("src", "dst"))
    val head = m.head(anfCacheCap + 1)
    val curveHead = curve.head(anfCacheCap + 1)
    if (head.length <= anfCacheCap && curveHead.length <= anfCacheCap) {
      val rows = head.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val cRows = curveHead.map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      anfCache.put(key, (rows, rounds, nf, cRows))
      (rows.toDF("v", "k", "mask"), rounds, nf, cRows.toDF("v", "reach_est", "r"))
    } else (m, rounds, nf, curve) // too large to pin: stay distributed
  }

  /** first two CTEs of [[bfsSigmaSql]] (simple directed edge relation +
    * its vertex set) for ANF oracles that don't need the BFS chain */
  private val anfEdgeCtes =
    """ed AS (SELECT src, dst FROM e WHERE src <> dst GROUP BY src, dst),
       bnodes AS (SELECT DISTINCT src AS v FROM ed UNION SELECT DISTINCT dst FROM ed)"""

  /** unrolled register OR-merge chain m0..m`rounds` (requires `ed` +
    * `bnodes`) — the shared oracle spine; [[anfCtes]] adds the
    * fixpoint-discovery CTEs on top. */
  private def anfChainCtes(rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      s"""m${i + 1} AS MATERIALIZED (SELECT v, k, bit_or(mask) AS mask FROM (
           SELECT v, k, mask FROM m$i
           UNION ALL
           SELECT ed.src AS v, m.k, m.mask FROM ed JOIN m$i m ON m.v = ed.dst) t
         GROUP BY v, k)"""
    }.mkString(",\n")
    s"""ks AS (SELECT unnest(generate_series(0, ${anfK - 1})) AS k),
       hx AS (SELECT v, k, CAST('0x' || substring(md5(CAST(v AS VARCHAR) || '#' ||
           CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
         FROM bnodes CROSS JOIN ks),
       m0 AS MATERIALIZED (SELECT v, k,
         CAST(1 AS BIGINT) << (CASE WHEN h = 0 THEN 31
           ELSE LEAST(CAST(round(log2(h & (-h))) AS INT), 31) END) AS mask
         FROM hx),
       $steps"""
  }

  /** [[anfChainCtes]] PAST convergence, plus the independently-derived
    * `arnds` round count — the kcoreSql/stableRoundCtes discipline
    * keyed on (v, k). */
  private def anfCtes(rounds: Int): String = {
    val diffs = (1 to rounds).map { t =>
      s"""SELECT $t AS t, (SELECT COUNT(*) FROM m$t a
           JOIN m${t - 1} b ON b.v = a.v AND b.k = a.k AND b.mask <> a.mask) AS c"""
    }.mkString(" UNION ALL ")
    s"""${anfChainCtes(rounds)},
       adif AS MATERIALIZED ($diffs),
       arnds AS (SELECT MIN(t) AS rounds FROM adif WHERE c = 0)"""
  }

  /** per-vertex FM estimate over an unrolled register table `m` —
    * identical arithmetic to [[anfEstimate]] */
  private def anfEstSql(m: String): String =
    s"""SELECT v, round(pow(2.0, AVG(CAST(round(log2((mask + 1) & (~mask)))
        AS DOUBLE))) / $anfPhi, 4) AS reach_est FROM $m GROUP BY v"""

  private[graft] def sccTrimOn(edgesDf: DataFrame): DataFrame = {
    val s = edgesDf.sparkSession
    // materialize AND mint fresh attribute ids: the peel loop repeatedly
    // joins/unions descendants of the same relations, and checkpointed
    // plans keep ancestor ids, which trips Catalyst's union constraint
    // rewrite on the second peel (key-not-found on a stale id). Building
    // a new DataFrame over the checkpointed RDD severs the lineage AND
    // the ids — no recompute, the blocks are already materialized.
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint()
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val eAll = pin(edgesDf)
    // every gate count below is OBSERVED during the pin that produced
    // the relation (Iterate.pinCountAll, r15) — the peel loop previously
    // paid a limit(1).count job per gate per round on top of each pin
    val (allNodes, nAll) =
      Iterate.pinCountAll(nodes(eAll), freshIds = true)
    val e0 = pin(eAll.filter(col("src") =!= col("dst")))
    var residualNodes = allNodes
    var residualCount = nAll
    var residualEdges = e0
    // start from an EMPTY (v, scc) frame, not null: an empty edge input
    // never enters the peel loop and must still return a valid relation
    var done: DataFrame = allNodes.filter(lit(false))
      .select(col("v"), col("v").as("scc"))
    var guard = 0
    while (residualCount > 0 && guard < N) {
      guard += 1
      // ONE TRIM pass: a vertex with no incoming (or no outgoing)
      // residual edge is a singleton SCC — settled here with two cheap
      // anti-joins, which peels sparse tails without a fixpoint.
      locally {
        val srcs = residualEdges.select(col("src").as("__k")).distinct()
        val dsts = residualEdges.select(col("dst").as("__k")).distinct()
        val (trimmed, nTrimmed) = Iterate.pinCountAll(residualNodes
          .join(srcs, col("v") === col("__k"), "left_anti")
          .unionAll(residualNodes
            .join(dsts, col("v") === col("__k"), "left_anti"))
          .distinct(), freshIds = true)
        if (nTrimmed > 0) {
          val settled = trimmed.select(col("v"), col("v").as("scc"))
          done = pin(done.unionAll(settled))
          val tv = trimmed.select(col("v").as("__settled_v"))
          val (rNodes, rCount) = Iterate.pinCountAll(residualNodes
            .join(tv, col("v") === col("__settled_v"), "left_anti"),
            freshIds = true)
          residualNodes = rNodes
          residualCount = rCount
          residualEdges = pin(residualEdges
            .join(tv, col("src") === col("__settled_v"), "left_anti")
            .join(tv, col("dst") === col("__settled_v"), "left_anti"))
        }
      }
      val rn = residualNodes
      if (residualCount > 0) {
      // FRONTIER min-propagation, one materialization per round
      // (optimization r14, guide §2.4): labels are monotone
      // non-increasing, so only a vertex whose label dropped last round
      // can drop its in-neighbours' — relaxing from the changed set and
      // least-merging into the carried state reaches the same unique
      // fixpoint as the previous full re-relaxation over ed ∪ self-loops
      // (the left join plays the self-loop's keep-own-label role), and
      // the changed flag rides in the state row, so the old
      // next-vs-previous join collapses into a narrow count over the
      // just-checkpointed blocks.
      def minReach(ed: DataFrame): DataFrame = {
        val init = rn.select(col("v"), col("v").as("lbl"), lit(true).as("chg"))
        val (out, _) = Iterate.untilFixpoint(init, maxIter = N, checkpointEvery = 0) {
          (c, _) =>
            val relax = c.filter(col("chg")).as("cc")
              .join(ed.as("ee"), col("cc.v") === col("ee.dst"))
              .groupBy(col("ee.src").as("v")).agg(min(col("cc.lbl")).as("cand"))
            // changed-count observed during the checkpoint job (r15);
            // fresh ids: the peel loop re-joins descendants of this state
            val (next, changed) = Iterate.pinCountTrue(
              c.as("o").join(relax.as("r"), Seq("v"), "left")
                .select(col("v"),
                  least(col("lbl"), coalesce(col("cand"), lit(Long.MaxValue))).as("lbl"),
                  (coalesce(col("cand"), lit(Long.MaxValue)) < col("lbl")).as("chg")),
              col("chg"), freshIds = true)
            Iterate.release(c)
            (next, changed)
        }
        out.select(col("v"), col("lbl"))
      }
      // Orzan coloring peel: F (forward min) partitions the residual
      // into classes that each CONTAIN their root's SCC (F is constant
      // on an SCC), so computing backward-min WITHIN each class settles
      // SCC(root) for EVERY class simultaneously: B_class(u) = F(u) iff
      // the class root reaches u through the class iff u ∈ SCC(root).
      // Singleton classes settle trivially (B_class = self = F), which
      // is what consumes a dense ascending DAG residual in one peel —
      // the plain F/B core settled one component per peel and measured
      // 26.5 s on the condensation row at sf0.1.
      val f = pin(minReach(residualEdges))
      val f1 = f.select(col("v").as("__fv1"), col("lbl").as("__fl1"))
      val f2 = f.select(col("v").as("__fv2"), col("lbl").as("__fl2"))
      val classEdgesRev = residualEdges
        .join(f1, col("src") === col("__fv1"))
        .join(f2, col("dst") === col("__fv2"))
        .filter(col("__fl1") === col("__fl2"))
        .select(col("dst").as("src"), col("src").as("dst"))
      val b = minReach(classEdgesRev)
      val settled = pin(f.as("f").join(b.as("b"), col("f.v") === col("b.v"))
        .filter(col("f.lbl") === col("b.lbl"))
        .select(col("f.v").as("v"), col("f.lbl").as("scc")))
      done = pin(done.unionAll(settled))
      // fresh alias on the settled key set: localCheckpoint keeps the
      // ancestor's attribute ids, so an anti-join of residualNodes
      // against its own descendant would hit ambiguous-attribute
      // resolution on the second peel
      val settledV = settled.select(col("v").as("__settled_v"))
      val (rNodes, rCount) = Iterate.pinCountAll(residualNodes
        .join(settledV, col("v") === col("__settled_v"), "left_anti"),
        freshIds = true)
      residualNodes = rNodes
      residualCount = rCount
      residualEdges = pin(residualEdges
        .join(settledV, col("src") === col("__settled_v"), "left_anti")
        .join(settledV, col("dst") === col("__settled_v"), "left_anti"))
      }
    }
    // fail LOUDLY if the peel guard exhausted with residual vertices
    // left — partial labels silently returned would be a wrong answer
    require(residualCount == 0,
      s"sccTrimOn: peel guard exhausted after $guard rounds with residual vertices remaining")
    done.orderBy("v")
  }

  private def sccCtes(pred: String = "TRUE"): String =
    s"""$edgesSql,
       ef AS (SELECT src, dst FROM e WHERE ($pred)),
       nodes AS (SELECT DISTINCT v FROM
         (SELECT src AS v FROM ef UNION ALL SELECT dst AS v FROM ef) t0),
       ed AS (SELECT src, dst FROM ef WHERE src <> dst),
       closure(src, dst) AS (
         SELECT src, dst FROM ed
         UNION
         SELECT c.src, ed.dst FROM closure c JOIN ed ON ed.src = c.dst
       ),
       mutual AS (SELECT c1.src AS v, c1.dst AS u FROM closure c1
         JOIN closure c2 ON c2.src = c1.dst AND c2.dst = c1.src),
       lbl AS (SELECT n.v, LEAST(n.v, COALESCE(MIN(m.u), n.v)) AS scc
               FROM nodes n LEFT JOIN mutual m ON m.v = n.v GROUP BY n.v)"""

  private val sccSql =
    s"""WITH RECURSIVE ${sccCtes()}
       SELECT v, scc FROM lbl ORDER BY v"""

  /** CONDENSATION of the SCC quotient graph, leveled: collapse each
    * strongly connected component to one node, keep inter-component
    * edges, and compute each component's LEVEL = longest path (in
    * edges) from any source of the DAG — the topological stratification
    * that schedules dependency stages (condensation is a DAG by
    * construction, so longest-path relaxation converges in ≤ #levels
    * fixpoint rounds). Composes the declared SCC operator; state is
    * O(components). */
  /** forward-biased subgraph for the condensation row: all ascending
    * edges plus back-edges only from the 7 sources ≡ 0 (mod 29) — the
    * full derived graph is dense enough to collapse into one giant SCC
    * (a 1-row condensation demonstrates nothing), while this subgraph
    * yields real multi-component, multi-level structure. */
  private val condPred = "src < dst OR (src % 29 = 0 AND dst < src)"

  private def condensationLevels(s: SparkSession, d: String): DataFrame = {
    val eFilt = edges(s, d).select("src", "dst")
      .filter(col("src") < col("dst") ||
        (col("src") % 29 === 0 && col("dst") < col("src")))
    val sccMap = sccTrimOn(eFilt).localCheckpoint()
    val e = eFilt
    val ce = e
      .join(sccMap.select(col("v").as("src"), col("scc").as("sa")), "src")
      .join(sccMap.select(col("v").as("dst"), col("scc").as("sb")), "dst")
      .filter(col("sa") =!= col("sb"))
      .select(col("sa").as("src"), col("sb").as("dst")).distinct()
      .localCheckpoint()
    val comps = sccMap.select(col("scc").as("c")).distinct().localCheckpoint()
    // FRONTIER longest-path relaxation with ONE materialization per round
    // (optimization r14, guide §2.4): levels are monotone non-decreasing
    // on the DAG, so only components RAISED last round can raise their
    // successors — relaxing from the changed set and max-merging into the
    // carried state reaches the same unique fixpoint as the previous
    // full-relation re-relaxation (x_{k+1}(c) = max over preds p of
    // x_k(p)+1, which this computes incrementally), while each round
    // joins O(frontier out-degree), not O(E). The changed flag rides IN
    // the state row, so the old next-vs-previous join (a second full
    // shuffle per round) collapses into a narrow count over the
    // just-checkpointed blocks: 2 materialized joins/round -> 1.
    val init = comps.select(col("c"), lit(0L).as("lvl"), lit(true).as("chg"))
    val (outRaw, _) = Iterate.untilFixpoint(init, maxIter = N, checkpointEvery = 0) {
      (lv, _) =>
        val relax = lv.filter(col("chg")).as("l")
          .join(ce.as("ee"), col("l.c") === col("ee.src"))
          .groupBy(col("ee.dst").as("c")).agg((max(col("l.lvl")) + 1L).as("cand"))
        // changed-count observed during the checkpoint job (r15)
        val (next, changed) = Iterate.pinCountTrue(
          lv.as("o").join(relax.as("r"), Seq("c"), "left")
            .select(col("c"),
              greatest(col("lvl"), coalesce(col("cand"), lit(0L))).as("lvl"),
              (coalesce(col("cand"), lit(Long.MinValue)) > col("lvl")).as("chg")),
          col("chg"))
        Iterate.release(lv)
        (next, changed)
    }
    val out = outRaw.select(col("c"), col("lvl"))
    val sizes = sccMap.groupBy(col("scc")).agg(count(lit(1)).as("n_vertices"))
    out.join(sizes, col("c") === col("scc"))
      .select(col("scc"), col("lvl"), col("n_vertices"))
      .orderBy("scc")
  }

  private val condensationSql =
    s"""WITH RECURSIVE ${sccCtes(condPred)},
       ce AS (SELECT DISTINCT la.scc AS src, lb.scc AS dst
              FROM ed JOIN lbl la ON la.v = ed.src
              JOIN lbl lb ON lb.v = ed.dst
              WHERE la.scc <> lb.scc),
       walks(c, len) AS (
         SELECT scc AS c, 0 AS len FROM (SELECT DISTINCT scc FROM lbl) t
         UNION
         SELECT ce.dst, walks.len + 1 FROM walks JOIN ce ON ce.src = walks.c
       ),
       lv AS (SELECT c, CAST(MAX(len) AS BIGINT) AS lvl FROM walks GROUP BY c),
       sz AS (SELECT scc, COUNT(*) AS n_vertices FROM lbl GROUP BY scc)
       SELECT lv.c AS scc, lv.lvl, sz.n_vertices
       FROM lv JOIN sz ON sz.scc = lv.c ORDER BY scc"""

  /** Closeness centrality + eccentricity from the 5 lowest-id sources:
    * MULTI-SOURCE BFS run to fixpoint — one state relation keyed
    * (source, vertex, dist), all sources expanding in the same
    * join→min-agg superstep (5 BFS trees for the price of one loop; at
    * 1000 sources the same plan stands, state is sources × reached).
    * Rounds are discovered (changed-count halt); the oracle is the
    * recursive hop-closure per source. closeness = (reached−1)/Σdist,
    * ecc = max dist — the standard sampled-landmark estimators. */
  private def closeness(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d).select("src", "dst").cache()
    // FRONTIER multi-source BFS, one materialization per round
    // (optimization r14, guide §2.4): (q, v) distances are monotone
    // non-increasing and new pairs only appear via a pair improved last
    // round, so relaxing out of the changed set and min-merging (full
    // outer — a previously unseen (q, v) enters with its candidate)
    // reaches the same unique fixpoint as the previous full re-expansion
    // over e ∪ 0-weight self-loops, with per-round work O(frontier
    // out-degree) and the changed flag riding in the state row (the old
    // next-vs-previous join becomes a narrow count over the checkpointed
    // blocks).
    val init = nodes(e).filter(col("v") < 5)
      .select(col("v").as("q"), col("v"), lit(0L).as("dist"), lit(true).as("chg"))
    val (dist, _) = Iterate.untilFixpoint(init, maxIter = N, checkpointEvery = 0) {
      (st, _) =>
        val relax = st.filter(col("chg")).as("ss")
          .join(e.as("ee"), col("ss.v") === col("ee.src"))
          .groupBy(col("ss.q"), col("ee.dst").as("v"))
          .agg(min(col("ss.dist") + 1L).as("cand"))
        // changed-count observed during the checkpoint job (r15)
        val (next, changed) = Iterate.pinCountTrue(
          st.as("o").join(relax.as("r"), Seq("q", "v"), "full_outer")
            .select(col("q"), col("v"),
              least(coalesce(col("dist"), lit(Long.MaxValue)),
                coalesce(col("cand"), lit(Long.MaxValue))).as("dist"),
              (coalesce(col("cand"), lit(Long.MaxValue)) <
                coalesce(col("dist"), lit(Long.MaxValue))).as("chg")),
          col("chg"))
        Iterate.release(st)
        (next, changed)
    }
    dist.groupBy(col("q").as("src"))
      .agg((count(lit(1)) - 1).as("n_reached"), sum("dist").as("sum_dist"),
        max("dist").as("ecc"),
        sum(when(col("dist") > 0, lit(1.0) / col("dist")).otherwise(0.0))
          .as("hraw"))
      .filter(col("sum_dist") > 0)
      .select(col("src"), col("n_reached"), col("sum_dist"),
        round((col("n_reached") * lit(1.0)) / col("sum_dist"), 6).as("closeness"),
        round(col("hraw"), 6).as("harmonic"), col("ecc"))
      .orderBy("src")
  }

  private val closenessSql =
    s"""WITH RECURSIVE $edgesSql,
       $nodesSql,
       walks(q, v, d) AS (
         SELECT v AS q, v, CAST(0 AS BIGINT) AS d FROM nodes WHERE v < 5
         UNION
         SELECT w.q, e.dst AS v, w.d + 1 AS d
         FROM walks w JOIN e ON e.src = w.v
         WHERE w.d + 1 < $N
       ),
       dist AS (SELECT q, v, MIN(d) AS d FROM walks GROUP BY q, v)
       SELECT q AS src, COUNT(*) - 1 AS n_reached,
         CAST(SUM(d) AS BIGINT) AS sum_dist,
         ROUND((COUNT(*) - 1) * 1.0 / SUM(d), 6) AS closeness,
         ROUND(SUM(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 6) AS harmonic,
         CAST(MAX(d) AS BIGINT) AS ecc
       FROM dist GROUP BY q HAVING SUM(d) > 0 ORDER BY src"""

  /** Connected components via min-label propagation (MindistSearch,
    * `examples/src/main/java/org/apache/hama/examples/MindistSearch.java:47-117`,
    * MinTextCombiner → min partial agg), fixed rounds on the undirected view. */
  private def cc(s: SparkSession, d: String, rounds: Int = 4): DataFrame =
    ccLoop(edges(s, d), rounds)

  /** min-label connected components over an arbitrary (src, dst) edge
    * list — parameterized so the reference's own test graph drives the
    * SAME loop (ReferenceFixturesSpec); `q_graph_cc` binds the derived
    * orders graph. */
  private[graft] def ccLoop(e: DataFrame, rounds: Int): DataFrame = {
    val vs = nodes(e).cache()
    // self-loops fold "keep own label" into the message join (see sssp note)
    val euPlus = undirected(e)
      .unionAll(vs.select(col("v").as("src"), col("v").as("dst"))).cache()
    val init = vs.select(col("v"), col("v").as("lbl"))
    // each round: min-label propagate over edges, then POINTER-JUMP
    // lbl ← lbl[lbl] (labels are vertex ids, so the label table itself is
    // the mapping). Label distance roughly doubles per round — O(log d)
    // rounds instead of O(d), the only diameter-robust formulation at
    // 100 TB graph scale where a fixed small round count quietly stops
    // converging. 4 jump rounds cover what ≥8 plain rounds did.
    // The jump self-join references the propagated labels TWICE, so the
    // round state is eagerly checkpointed first — otherwise each reference
    // re-derives the whole propagate lineage and the plan doubles per
    // round. One materialization of the (tiny relative to edges) label
    // table per round is the price of halving the round count; superseded
    // blocks are freed at the next barrier as usual.
    var cur = init
    var prevCkpt: DataFrame = null
    var i = 0
    while (i < rounds) {
      val p = cur.as("cc").join(euPlus.as("ee"), col("cc.v") === col("ee.src"))
        .groupBy(col("ee.dst").as("v"))
        .agg(min(col("cc.lbl")).as("lbl"))
        .localCheckpoint() // eager: materialized before the double reference
      cur = p.as("c").join(p.as("p"), col("c.lbl") === col("p.v"))
        .select(col("c.v"), col("p.lbl").as("lbl"))
      if (prevCkpt != null) Iterate.release(prevCkpt)
      prevCkpt = p
      i += 1
    }
    // eager final checkpoint (O(vertices), small), then free the edge and
    // node caches + the last round's blocks (ADVICE r2 cache hygiene)
    val out = cur.orderBy("v").localCheckpoint()
    if (prevCkpt != null) Iterate.release(prevCkpt)
    euPlus.unpersist()
    vs.unpersist()
    out
  }

  /** K-core estimate, fixed supersteps: each vertex lowers its estimate to
    * the largest k with ≥ k neighbors whose estimate ≥ k, never above its
    * previous value (`ml/src/main/java/org/apache/hama/ml/kcore/
    * KCoreVertex.java:137-226`). */
  /** k-core estimate over an arbitrary (src, dst) edge list — see
    * [[ccLoop]] for why this is graph-parameterized; the reference's
    * own fixture drives it (ReferenceFixturesSpec), while the gate row
    * runs [[kcoreFixpoint]]. */
  private[graft] def kcoreLoop(e: DataFrame, iters: Int): DataFrame = {
    val eu = undirected(e).cache()
    val init = eu.groupBy(col("src").as("v")).agg(count(lit(1)).as("est"))
    val out = Iterate(init, iters, checkpointEvery = 2) { (k, _) =>
      kcoreStep(eu, k, sharded = false).select("v", "est")
    }
    out.orderBy("v")
  }

  /** one h-operator round: est'(v) = min(est(v), H({est(u) : u ~ v}))
    * where H is the h-index of the neighbor estimates. The per-vertex
    * neighbor rank is SKEW-ADAPTIVE (the SNM/phash guard pattern): a
    * celebrity vertex's neighbor group is O(degree) and a window
    * partition is single-task, so above the task-size bound the rank
    * runs through RangedRank's range-sharded plan — exact for longs,
    * ordered by (-est, dst) ≡ (est DESC, dst ASC). */
  private def kcoreStep(eu: DataFrame, k: DataFrame, sharded: Boolean): DataFrame = {
    val joined = eu.join(k, eu("dst") === k("v"))
      .select(eu("src").as("vv"), k("est").as("nb_est"), eu("dst"))
    val ranked =
      if (!sharded) {
        val w = Window.partitionBy(col("vv")).orderBy(desc("nb_est"), asc("dst"))
        joined.withColumn("rn", row_number().over(w).cast("long"))
      } else
        RangedRank.withRank(joined.withColumn("__negest", -col("nb_est")),
          Seq("vv"), Seq("__negest", "dst"), "rn").drop("__negest")
    val nb = ranked
      .groupBy(col("vv"))
      .agg(max(least(col("nb_est"), col("rn"))).as("cand"))
    // chg ⟺ the h-operator lowered this vertex (cand < old est): the
    // old estimate is already in this plan, so the fixpoint's halt
    // condition needs no next-vs-old diff join (r15)
    k.join(nb, k("v") === nb("vv"))
      .select(k("v"), least(k("est"), col("cand")).as("est"),
        (col("cand") < k("est")).as("chg"))
  }

  /** k-core run to the DISCOVERED fixpoint — where the h-index
    * iteration's estimate IS the exact coreness (Lü et al.: the
    * h-operator converges to coreness from the degree start). The
    * declared-rounds form above remains the reference-fixture shape;
    * the gate row uses this one so a 100×-deeper graph can never
    * silently ship a pre-convergence estimate (the ktruss/LPA
    * discipline). est is monotone non-increasing per vertex, but the
    * halt still compares rows (the per-vertex value can plateau while
    * others move). Returns (coreness, rounds) with `rounds` counting
    * the confirming round, re-derived independently by the oracle. */
  private[graft] def kcoreFixpoint(e: DataFrame,
      maxIter: Int = 64, shardBound: Long = 65536L): (DataFrame, Int) = {
    val eu = undirected(e).localCheckpoint()
    val init = eu.groupBy(col("src").as("v")).agg(count(lit(1)).as("est"))
      .localCheckpoint()
    // ONE cheap degree probe decides the rank plan for every round:
    // the neighbor-group size is the degree, constant across rounds
    val sharded = init.agg(max("est")).head.getLong(0) > shardBound
    val fp = Iterate.untilFixpointChecked(init, maxIter = maxIter,
      checkpointEvery = 0) { (k, _) =>
      // kcoreStep carries the chg flag (cand < old est) in-row, and the
      // changed-count is observed during the checkpoint job — one job
      // per round instead of checkpoint + a next-vs-old diff join (r15);
      // est is monotone non-increasing, so "any row lowered" is exactly
      // the old row-diff count.
      val (next, changed) =
        Iterate.pinCountTrue(kcoreStep(eu, k, sharded), col("chg"))
      Iterate.release(k)
      (next, changed)
    }.requireConverged("kcoreFixpoint")
    (fp.out.select("v", "est"), fp.iters)
  }

  override val defs: Seq[Q] = Seq(

    // InlinkCount degenerates to one GROUP BY
    // (`examples/src/main/java/org/apache/hama/examples/InlinkCount.java:36-51`)
    Q("q_graph_inlink",
      (s, d) => edges(s, d).groupBy(col("dst").as("v")).agg(count(lit(1)).as("inlinks"))
        .orderBy("v"),
      Some(s"""WITH $edgesSql
               SELECT dst AS v, COUNT(*) AS inlinks FROM e GROUP BY dst ORDER BY v""")),

    Q("q_graph_pagerank", (s, d) => pagerank(s, d), Some(pagerankSql(10))),

    // MID-SIZE graded loop (VERDICT r5 item 8): the same PageRank plan on
    // an N=5000 derived graph (~15k edges at sf0.01, ~150k at sf0.1) —
    // 25x the vertices of the N=200 rows, so the gate itself times a
    // DATA-BOUND superstep instead of a fixed-cost-dominated one. Same
    // unrolled-oracle recipe, 6 rounds to keep the DuckDB chain bounded.
    Q("q_graph_pagerank_mid",
      (s, d) => pagerankLoop(
        Tables(s, d, "orders")
          .select((col("o_orderkey") % midN).as("src"),
            (col("o_custkey") % midN).as("dst"))
          .distinct(), iters = 6),
      Some(pagerankSql(6,
        s"""e AS (SELECT DISTINCT o_orderkey % $midN AS src,
            o_custkey % $midN AS dst FROM orders)"""))),

    // 5 supersteps: parity holds per-superstep so fewer rounds prove the
    // same engine agreement at half the typed-path barrier cost (the full
    // 10-round result is oracle-checked by q_graph_pagerank itself)
    Q("q_graph_pagerank_parity", (s, d) => pagerankParity(s, d, iters = 5),
      Some(s"""WITH $edgesSql, $nodesSql
               SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
                      true AS engines_agree FROM nodes""")),

    // superstep recovery: snapshot → kill → resume must equal the
    // uninterrupted run (resumed_from = the committed superstep boundary)
    Q("q_graph_pagerank_resume", (s, d) => pagerankResume(s, d, iters = 5),
      Some(s"""WITH $edgesSql, $nodesSql
               SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
                      true AS resumed_matches_uninterrupted,
                      CAST(2 AS BIGINT) AS resumed_from FROM nodes""")),

    Q("q_graph_sssp", (s, d) => sssp(s, d), Some(ssspSql(6))),

    // personalized PageRank: teleport to seed 0, 6 unrolled supersteps
    Q("q_graph_ppr", (s, d) => ppr(s, d, iters = 6, seed = 0L),
      Some(pprSql(6, 0L))),

    // Katz centrality: 4 attenuated path-counting rounds at α=0.05 —
    // the non-degree-diluted cousin of PageRank (see [[katz]])
    Q("q_graph_katz", (s, d) => katz(s, d, iters = 4, alpha = 0.05),
      Some(katzSql(4, 0.05))),

    // eigenvector centrality: 4 normalized power-iteration rounds —
    // completes the spectral centrality quartet (see [[eigenvector]])
    Q("q_graph_eigenvector", (s, d) => eigenvector(s, d, iters = 4),
      Some(eigenvectorSql(4))),

    Q("q_graph_cc", (s, d) => cc(s, d), Some(ccSql(4))),

    // fixpoint-oracled rows ([cte]): the loop halts when its own changed
    // counter hits zero and the oracle is a WITH RECURSIVE closure — the
    // gate verifies convergence-to-fixpoint, not round arithmetic
    Q("q_graph_sssp_fixpoint", (s, d) => ssspFixpoint(s, d), Some(ssspFixpointSql)),
    Q("q_graph_sssp_parity", (s, d) => ssspParity(s, d), Some(ssspFixpointSql)),
    Q("q_graph_cc_fixpoint", (s, d) => ccFixpoint(s, d), Some(ccFixpointSql)),
    Q("q_graph_cc_star", (s, d) => ccStar(s, d), Some(ccFixpointSql)),
    Q("q_graph_cc_parity", (s, d) => ccAggParity(s, d), Some(ccFixpointSql)),
    // DETERMINISTIC RANDOM WALKS (the node2vec/DeepWalk sampling
    // primitive): 3 walks from each of the 10 lowest-id vertices, 4
    // steps; the step choice is argmin md5(walk, step, candidate) over
    // the current vertex's out-neighbors — a seeded hash in place of an
    // RNG, so BOTH engines replay the identical corpus of walks and the
    // row is hash-checkable. A walk with no out-neighbor terminates and
    // carries its path. Each step is one frontier-edge join + one
    // min-struct aggregate: state O(walks), steps bounded — exactly the
    // batched walk-sampling shape embedding pipelines run at scale.
    Q("q_graph_walks",
      (s, d) => {
        val e = edges(s, d).select("src", "dst").localCheckpoint()
        val sources = nodes(e).orderBy("v").limit(10)
        var walks = sources
          .crossJoin(broadcast(s.range(3).select(col("id").as("r"))))
          .select((col("v") * 10 + col("r")).as("wid"), col("v").as("cur"),
            col("v").cast("string").as("path"), lit(false).as("done"))
          .localCheckpoint()
        for (k <- 1 to 4) {
          val live = walks.filter(not(col("done")))
          val stepped = live.join(e, col("cur") === col("src"))
            .withColumn("h", md5(concat_ws("-", col("wid"), lit(k), col("dst"))))
            .groupBy("wid")
            .agg(min(struct(col("h"), col("dst"))).as("pick"),
              first(col("path")).as("path"))
            .select(col("wid"), col("pick.dst").as("cur"),
              concat(col("path"), lit("->"), col("pick.dst").cast("string")).as("path"),
              lit(false).as("done"))
          val terminal = live.join(e.select(col("src").as("cur")).distinct(),
              Seq("cur"), "left_anti")
            .select(col("wid"), col("cur"), col("path"), lit(true).as("done"))
          walks = stepped
            .unionByName(terminal)
            .unionByName(walks.filter(col("done")))
            .localCheckpoint()
        }
        walks.select(col("wid"), col("path")).orderBy("wid")
      },
      Some {
        val steps = (1 to 4).map { k =>
          s"""w$k AS (
               SELECT wid, cur, path FROM (
                 SELECT w.wid, e.dst AS cur, w.path || '->' || e.dst AS path
                 FROM w${k - 1} w JOIN e ON e.src = w.cur
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY w.wid
                   ORDER BY md5(w.wid || '-' || $k || '-' || e.dst), e.dst) = 1)
               UNION ALL
               SELECT wid, cur, path FROM w${k - 1}
               WHERE cur NOT IN (SELECT src FROM e))"""
        }.mkString(",\n")
        s"""WITH $edgesSql,
            $nodesSql,
            srcs AS (SELECT v FROM nodes ORDER BY v LIMIT 10),
            w0 AS (SELECT v * 10 + r AS wid, v AS cur, CAST(v AS VARCHAR) AS path
                   FROM srcs CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) rr),
            $steps
            SELECT wid, path FROM w4 ORDER BY wid"""
      }),

    Q("q_graph_scc", (s, d) => sccTrim(s, d), Some(sccSql)),
    Q("q_graph_condensation", (s, d) => condensationLevels(s, d), Some(condensationSql)),
    Q("q_graph_closeness", (s, d) => closeness(s, d), Some(closenessSql)),

    // RECIPROCITY: the fraction of directed edges whose reverse edge
    // also exists (self-loops excluded) — the mutuality scalar beside
    // assortativity. One self-semi-join on the deduped edge list.
    Q("q_graph_reciprocity",
      (s, d) => {
        val e = edges(s, d).select("src", "dst")
          .filter(col("src") =!= col("dst")).localCheckpoint()
        val mutual = e.as("a").join(e.as("b"),
            col("a.src") === col("b.dst") && col("a.dst") === col("b.src"),
            "left_semi").count()
        val total = e.count()
        import s.implicits._
        Seq((total, mutual,
          BigDecimal(mutual.toDouble / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("n_edges", "n_mutual", "reciprocity")
      },
      Some(s"""WITH $edgesSql,
               ed AS (SELECT src, dst FROM e WHERE src <> dst)
               SELECT COUNT(*) AS n_edges,
                 CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM ed r
                   WHERE r.src = ed.dst AND r.dst = ed.src)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual,
                 ROUND(SUM(CASE WHEN EXISTS (SELECT 1 FROM ed r
                   WHERE r.src = ed.dst AND r.dst = ed.src)
                   THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS reciprocity
               FROM ed""")),

    // BETWEENNESS CENTRALITY — Brandes as level-synchronous dataflow
    // (forward BFS with path counts, backward dependency accumulation,
    // see betweennessOn). Exact all-sources here so the oracle can be
    // too: DuckDB computes the same bc from the pairwise identity
    // bc(v) = Σ σ_sv·σ_vt/σ_st over triples with d_sv + d_vt = d_st —
    // two independent derivations of the same statistic, rounded at 4.
    Q("q_graph_betweenness",
      (s, d) => {
        val e = edges(s, d).select("src", "dst")
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
        betweennessFromReached(e, bfsSigmaShared(s, d))
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)},
               bcs AS (SELECT a.v, SUM(CAST(a.sigma AS DOUBLE) * b.sigma / c.sigma) AS bc
                 FROM r a
                 JOIN r b ON b.s = a.v AND b.d > 0
                 JOIN r c ON c.s = a.s AND c.v = b.v AND c.d = a.d + b.d
                 WHERE a.d > 0
                 GROUP BY a.v)
               SELECT n.v, ROUND(COALESCE(bcs.bc, 0), 4) AS bc
               FROM bnodes n LEFT JOIN bcs ON bcs.v = n.v ORDER BY n.v""")),

    // SAMPLED-SOURCE BETWEENNESS — the declared 100 TB shape of the
    // exact row above (VERDICT r8 item 1): the Brandes ESTIMATOR over a
    // deterministic md5-hash-drawn source set S (~1/4 of vertices, the
    // q_text_sample draw pattern), bc rescaled by V/|S| — forward BFS
    // state is bounded by |S|·V instead of V² (CentralityScale measures
    // the bound at 10⁵ vertices), and |S| is the accuracy/cost knob.
    // SAME dataflow as the exact row — only the source relation and the
    // rescale differ. Oracle: the identical pairwise-identity SQL
    // restricted to s ∈ S, rescaled by the same data-derived factor.
    Q("q_graph_betweenness_sampled",
      (s, d) => {
        val ed = edges(s, d).select("src", "dst")
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
        val vs = nodes(ed).localCheckpoint()
        val samp = vs.filter(
          substring(md5(col("v").cast("string")), 1, 1).isin("0", "1", "2", "3"))
        val nV = vs.count().toDouble
        val nS = samp.count().toDouble
        // a regenerated/tiny dataset where the hash draw lands on NO
        // vertex would otherwise divide by zero into NaN scales and an
        // opaque oracle mismatch (ADVICE r9) — fail with the cause
        require(nS > 0,
          s"betweenness_sampled: the md5 source draw selected 0 of ${nV.toLong} " +
            "vertices — dataset too small for the 1/4 hash-range sample")
        betweennessOn(ed, Some(samp), nV / nS, "bc_est")
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)},
               samp AS (SELECT v FROM bnodes
                 WHERE substr(md5(CAST(v AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
               sc AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM bnodes) /
                 (SELECT COUNT(*) FROM samp) AS f),
               bcs AS (SELECT a.v, SUM(CAST(a.sigma AS DOUBLE) * b.sigma / c.sigma) AS bc
                 FROM r a
                 JOIN samp ON samp.v = a.s
                 JOIN r b ON b.s = a.v AND b.d > 0
                 JOIN r c ON c.s = a.s AND c.v = b.v AND c.d = a.d + b.d
                 WHERE a.d > 0
                 GROUP BY a.v)
               SELECT n.v, ROUND(COALESCE(bcs.bc, 0) * (SELECT f FROM sc), 4) AS bc_est
               FROM bnodes n LEFT JOIN bcs ON bcs.v = n.v ORDER BY n.v""")),

    // ECCENTRICITY per vertex (max shortest-path distance to any
    // reachable vertex) + reach count — the diameter/radius building
    // block, from the same all-sources BFS relation the betweenness
    // row's forward pass produces.
    Q("q_graph_eccentricity",
      (s, d) => {
        val reached = bfsSigmaShared(s, d)
        reached.groupBy("s")
          .agg(max("d").cast("long").as("ecc"),
            (count(lit(1)) - 1).as("n_reached"))
          .select(col("s").as("v"), col("ecc"), col("n_reached"))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)}
               SELECT s AS v, CAST(MAX(d) AS BIGINT) AS ecc,
                 CAST(COUNT(*) - 1 AS BIGINT) AS n_reached
               FROM r GROUP BY s ORDER BY v""")),

    // DIAMETER / RADIUS / average path length — the graph-summary
    // scalars read directly off the SAME memoized all-sources BFS
    // relation as eccentricity/harmonic/betweenness (reachable pairs
    // only, the standard convention for digraphs with unreachable
    // pairs). One aggregate over the shared relation: the fourth view
    // of one BFS.
    Q("q_graph_diameter",
      (s, d) => {
        val reached = bfsSigmaShared(s, d)
        val ecc = reached.groupBy("s").agg(max("d").as("ecc"))
        val paths = reached.filter(col("d") > 0)
          .agg(count(lit(1)).as("n_pairs"), avg("d").as("apl"))
        ecc.agg(max(col("ecc")).cast("long").as("diameter"),
            min(col("ecc")).cast("long").as("radius"))
          .crossJoin(paths)
          .select(col("diameter"), col("radius"), col("n_pairs"),
            round(col("apl"), 6).as("avg_path_len"))
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)},
               ecc AS (SELECT s, MAX(d) AS ecc FROM r GROUP BY s),
               paths AS (SELECT COUNT(*) AS n_pairs, AVG(d) AS apl
                         FROM r WHERE d > 0)
               SELECT CAST((SELECT MAX(ecc) FROM ecc) AS BIGINT) AS diameter,
                 CAST((SELECT MIN(ecc) FROM ecc) AS BIGINT) AS radius,
                 (SELECT n_pairs FROM paths) AS n_pairs,
                 ROUND((SELECT apl FROM paths), 6) AS avg_path_len""")),

    // ANF — the SCALE-SAFE graph summary (VERDICT r9 item 1): per-vertex
    // reachable-set size estimated from K OR-merged FM registers run to
    // the discovered fixpoint. O(V·K) state and one hash-agg per round
    // where the exact diameter/APL relation above is O(V²) rows — the
    // declared 100 TB shape of the q_graph_diameter family, exactly as
    // q_graph_betweenness_sampled is for betweenness. The oracle
    // rebuilds the identical registers longhand (portable md5 draws,
    // trailing zeros via log2 of the isolated low bit) and re-derives
    // the round count from consecutive unrolled rounds — estimates
    // match EXACTLY because both engines compute the same bits.
    Q("q_graph_anf",
      (s, d) => {
        val (masks, rounds, _, _) = anfShared(s, d)
        anfEstimate(masks)
          .withColumn("rounds", lit(rounds.toLong))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, $anfEdgeCtes, ${anfCtes(8)},
               est AS (${anfEstSql("m8")})
               SELECT v, reach_est,
                 CAST((SELECT rounds FROM arnds) AS BIGINT) AS rounds
               FROM est ORDER BY v""")),

    // the NEIGHBORHOOD FUNCTION NF(r) = Σ_v |N(v, r)| estimated per
    // radius from the same sketch, plus the EFFECTIVE DIAMETER (smallest
    // r reaching 90% of the final pair count — the robust diameter
    // statistic HyperANF reports; the exact max-eccentricity diameter is
    // one outlier path long). NF comes from the per-round register
    // states the fixpoint loop already produces; the oracle recomputes
    // every round's estimate from its unrolled register table and cuts
    // at its own independently-derived round count.
    Q("q_graph_anf_nf",
      (s, d) => {
        import s.implicits._
        val (_, rounds, nf, _) = anfShared(s, d)
        val nfFinal = nf.last
        val eff = nf.indexWhere(_ >= 0.9 * nfFinal)
        nf.zipWithIndex
          .map { case (v, r) => (r.toLong, v, eff.toLong) }
          .toDF("r", "nf_est", "eff_diameter")
          .orderBy("r")
      },
      Some(s"""WITH $edgesSql, $anfEdgeCtes, ${anfCtes(8)},
               nfr AS (${(0 to 8).map(t =>
                 s"""SELECT $t AS r, (SELECT round(SUM(reach_est), 2)
                     FROM (${anfEstSql(s"m$t")}) e$t) AS nf_est""")
                 .mkString(" UNION ALL ")}),
               sel AS (SELECT r, nf_est FROM nfr
                       WHERE r <= (SELECT rounds FROM arnds)),
               fin AS (SELECT nf_est AS nf_fin FROM sel
                       WHERE r = (SELECT rounds FROM arnds)),
               eff AS (SELECT MIN(r) AS ed FROM sel
                       WHERE nf_est >= 0.9 * (SELECT nf_fin FROM fin))
               SELECT CAST(r AS BIGINT) AS r, nf_est,
                 CAST((SELECT ed FROM eff) AS BIGINT) AS eff_diameter
               FROM sel ORDER BY r""")),

    // EST-VS-EXACT eval: the sketch's fixpoint estimates against the
    // exact reachable-set sizes off the shared all-sources BFS relation
    // — the honest-accuracy row beside the estimator (K = 8 registers
    // buy ~28% standard error; this measures what actually landed on
    // this graph). Both sides derive both relations independently.
    Q("q_graph_anf_eval",
      (s, d) => {
        val (masks, _, _, _) = anfShared(s, d)
        val est = anfEstimate(masks)
        val exact = bfsSigmaShared(s, d).groupBy("s")
          .agg(count(lit(1)).cast("double").as("reach"))
          .withColumnRenamed("s", "v")
        exact.join(est, "v")
          .select(col("v"),
            (abs(col("reach_est") - col("reach")) / col("reach")).as("rel_err"))
          .agg(count(lit(1)).as("n_vertices"),
            round(avg("rel_err"), 4).as("mean_rel_err"),
            round(max("rel_err"), 4).as("max_rel_err"),
            sum(when(col("rel_err") <= 0.5, 1L).otherwise(0L))
              .as("n_within_50pct"))
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)}, ${anfCtes(8)},
               est AS (${anfEstSql("m8")}),
               exact AS (SELECT s AS v, CAST(COUNT(*) AS DOUBLE) AS reach
                         FROM r GROUP BY s),
               err AS (SELECT e.v, ABS(est.reach_est - e.reach) / e.reach AS rel_err
                       FROM exact e JOIN est ON est.v = e.v)
               SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
                 ROUND(AVG(rel_err), 4) AS mean_rel_err,
                 ROUND(MAX(rel_err), 4) AS max_rel_err,
                 CAST(SUM(CASE WHEN rel_err <= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_within_50pct
               FROM err""")),

    // SKETCHED PER-VERTEX EFFECTIVE ECCENTRICITY: smallest radius at
    // which a vertex's estimated reach hits 90% of its fixpoint reach —
    // the per-vertex view of the effective diameter, read off the SAME
    // per-round register curve (ANF's individual neighborhood functions;
    // q_graph_eccentricity's exact max-distance form needs the O(V²)
    // BFS relation, this needs O(V·rounds) curve rows). Both engines
    // compare identically-rounded estimates, so the 90% cut is exact.
    Q("q_graph_anf_ecc",
      (s, d) => {
        val (_, rounds, _, curve) = anfShared(s, d)
        val fin = curve.filter(col("r") === rounds.toLong)
          .select(col("v"), col("reach_est").as("fin"))
        curve.join(fin, "v")
          .filter(col("reach_est") >= lit(0.9) * col("fin"))
          .groupBy("v").agg(min("r").as("eff_ecc"))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, $anfEdgeCtes, ${anfCtes(8)},
               curve AS (${(0 to 8).map(t =>
                 s"SELECT $t AS r, e$t.* FROM (${anfEstSql(s"m$t")}) e$t")
                 .mkString(" UNION ALL ")}),
               sel AS (SELECT r, v, reach_est FROM curve
                       WHERE r <= (SELECT rounds FROM arnds)),
               fin AS (SELECT v, reach_est AS fe FROM sel
                       WHERE r = (SELECT rounds FROM arnds))
               SELECT s.v, CAST(MIN(s.r) AS BIGINT) AS eff_ecc
               FROM sel s JOIN fin f ON f.v = s.v
               WHERE s.reach_est >= 0.9 * f.fe
               GROUP BY s.v ORDER BY s.v""")),

    // INCREMENTAL ANF — the growing-graph path: converge on the BASE
    // edge set, then when the delta edges arrive, warm-start the loop
    // from the converged registers (plus fresh init rows for vertices
    // the delta introduces). The OR-merge is monotone with a unique
    // fixpoint above any state between init and fixpoint, so the warm
    // run must land on BIT-IDENTICAL registers to the cold full-graph
    // run — asserted in-row against the memoized cold registers, in no
    // more rounds (also asserted). At 100 TB this is summary
    // maintenance without recompute: each ingest batch pays rounds
    // proportional to how far its edges move the horizon, not the full
    // graph diameter from scratch.
    Q("q_graph_anf_incremental",
      (s, d) => {
        val full = edges(s, d).select("src", "dst").localCheckpoint()
        val isDelta = pmod(col("src") * 31 + col("dst"), lit(10)) === 7
        val base = full.filter(!isDelta)
        val (baseMasks, _, _, _) = anfSketch(base)
        // warm state must cover the FULL graph's vertex set: vertices
        // only the delta edges introduce enter with fresh init registers
        val warm = anfWarm(baseMasks, full)
        val (warmMasks, warmRounds, _, _) = anfSketch(full, warm = Some(warm))
        val (coldMasks, coldRounds, _, _) = anfShared(s, d)
        require(warmRounds <= coldRounds,
          s"monotone warm start must not exceed the cold round count: " +
            s"$warmRounds > $coldRounds")
        val drift = warmMasks.as("w")
          .join(coldMasks.as("c"),
            col("w.v") === col("c.v") && col("w.k") === col("c.k"), "full")
          .filter(col("w.mask").isNull || col("c.mask").isNull ||
            col("w.mask") =!= col("c.mask")).count()
        require(drift == 0L,
          s"warm-started registers must be bit-identical to the cold fixpoint, $drift differ")
        anfEstimate(warmMasks)
          .withColumn("warm_equals_cold", lit(true))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, $anfEdgeCtes, ${anfCtes(8)},
               est AS (${anfEstSql("m8")})
               SELECT v, reach_est, true AS warm_equals_cold
               FROM est ORDER BY v""")),

    // STREAMING ANF MAINTENANCE in the gate (declared here, beside the
    // family's oracle spine): the base/delta split of
    // q_graph_anf_incremental REPLAYED AS A LIVE EDGE STREAM — two
    // staged micro-batches through Streams.runAnfMaintain; batch 0
    // converges cold, batch 1 runs the DELTA-FRONTIER path (seeded from
    // the new edges' endpoints, rounds join only CHANGED registers
    // against the bucket-pruned edge store — the reference's active-set
    // superstep contract, GraphJobRunner.java:256-313). Asserted
    // in-row: exactly 2 batches, the delta batch converged in no more
    // rounds than the memoized cold run, every delta round's edge-join
    // output stayed within the frontier's pull (joined ≤ frontier rows
    // × max in-degree — never the full E·K join), and the streamed
    // final registers are BIT-IDENTICAL to the cold fixpoint (zero
    // drift) — the summary a crawl's edge ingest serves is exactly the
    // one a batch recompute would produce, at O(Δ) steady-state cost.
    // Oracle: the same unrolled register chain as the incremental row.
    Q("q_stream_live_anf",
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val full = edges(s, d).select("src", "dst").localCheckpoint()
        val isDelta = pmod(col("src") * 31 + col("dst"), lit(10)) === 7
        val scratch = graft.GraftSession
          .tempDirCleanedOnExit("graft-anfstream-raw").toString
        val stage = graft.GraftSession
          .tempDirCleanedOnExit("graft-anfstream-in").toString
        for ((delta, m) <- Seq(false -> 0, true -> 1)) {
          val part = if (delta) full.filter(isDelta) else full.filter(!isDelta)
          part.coalesce(1).write.parquet(s"$scratch/b$m")
          val f = new java.io.File(s"$scratch/b$m").listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          Files.copy(f.toPath, Paths.get(f"$stage/part$m%02d.parquet"))
          new java.io.File(f"$stage/part$m%02d.parquet")
            .setLastModified(1000000L * (m + 1)): Unit
        }
        val (streamMasks, rounds, roundStats, _) =
          graft.streaming.Streams.runAnfMaintain(s, stage)
        require(rounds.size == 2,
          s"the staged replay must deliver exactly 2 micro-batches, got ${rounds.size}")
        val (coldMasks, coldRounds, _, _) = anfShared(s, d)
        require(rounds(1) <= coldRounds,
          s"warm maintenance must not exceed the cold round count: " +
            s"${rounds(1)} > $coldRounds")
        // the delta batch's per-round work must be frontier-bounded:
        // each round's edge-join output ≤ pushed registers × max
        // in-degree (the active-set contract — a full-relation round
        // would read V·K registers against every edge instead)
        val maxInDeg = full.filter(col("src") =!= col("dst")).distinct()
          .groupBy("dst").agg(count(lit(1)).as("c"))
          .agg(max("c")).head.getLong(0)
        roundStats(1).foreach { r =>
          require(r.joinedRows <= r.frontierRows * maxInDeg,
            s"delta round joined ${r.joinedRows} rows from a " +
              s"${r.frontierRows}-row frontier (max in-degree $maxInDeg)")
        }
        val drift = streamMasks.as("w")
          .join(coldMasks.as("c"),
            col("w.v") === col("c.v") && col("w.k") === col("c.k"), "full")
          .filter(col("w.mask").isNull || col("c.mask").isNull ||
            col("w.mask") =!= col("c.mask")).count()
        require(drift == 0L,
          s"streamed registers must be bit-identical to the cold fixpoint, $drift differ")
        anfEstimate(streamMasks)
          .withColumn("stream_equals_cold", lit(true))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, $anfEdgeCtes, ${anfCtes(8)},
               est AS (${anfEstSql("m8")})
               SELECT v, reach_est, true AS stream_equals_cold
               FROM est ORDER BY v""")),

    // MID-SIZE fixed-RADIUS neighborhood function (the pagerank_mid
    // discipline applied to the sketch): N(v, 4) estimated on the
    // N=5000 derived graph — 25× the vertices, so the gate times a
    // DATA-BOUND register merge. Radius 4 is part of the SEMANTICS
    // (the NF curve evaluated at r=4 — "reach within 4 hops"), not a
    // round budget standing in for a fixpoint: the sparse sf0.001 mid
    // graph takes 31+ rounds to full convergence, which is exactly the
    // case where a production pipeline asks for bounded-radius reach.
    Q("q_graph_anf_mid",
      (s, d) => {
        val e0 = Tables(s, d, "orders")
          .select((col("o_orderkey") % midN).as("src"),
            (col("o_custkey") % midN).as("dst"))
          .distinct()
        val s2 = e0.sparkSession
        def pin(df: DataFrame): DataFrame = {
          val ck = df.localCheckpoint()
          s2.createDataFrame(ck.rdd, ck.schema)
        }
        val e = pin(e0.filter(col("src") =!= col("dst")))
        val init = pin(anfInit(nodes(e)))
        // fixed 4 rounds: each references the loop state twice (self ∪
        // neighbor pull), so pin per round to keep plan growth linear
        val out = Iterate(init, 4, checkpointEvery = 1) { (m, _) =>
          val nbr = e.join(m, e("dst") === m("v"))
            .select(e("src").as("v"), m("k").as("k"), m("mask").as("mask"))
          m.unionAll(nbr).groupBy("v", "k")
            .agg(expr("bit_or(mask)").as("mask"))
        }
        anfEstimate(out)
          .withColumnRenamed("reach_est", "reach4_est")
          .orderBy("v")
      },
      Some(s"""WITH e AS (SELECT DISTINCT o_orderkey % $midN AS src,
                 o_custkey % $midN AS dst FROM orders),
               $anfEdgeCtes, ${anfChainCtes(4)},
               est AS (${anfEstSql("m4")})
               SELECT v, reach_est AS reach4_est FROM est ORDER BY v""")),

    // HARMONIC CENTRALITY, all-sources exact: Σ 1/d(v,t) over
    // reachable t ≠ v — the disconnected-robust closeness variant
    // (Boldi-Vigna), read directly off the betweenness family's BFS
    // relation. q_graph_closeness carries the 5-SOURCE sampled variant
    // (the 100 TB shape); this row is its exact full-graph counterpart
    // with an independently-derived unrolled-CTE oracle. Unreachable
    // pairs contribute 0 by absence, which is the point of the
    // harmonic form.
    Q("q_graph_harmonic",
      (s, d) => {
        val reached = bfsSigmaShared(s, d)
        reached.filter(col("d") > 0)
          .groupBy("s")
          .agg(round(sum(lit(1.0) / col("d")), 4).as("harmonic"))
          .select(col("s").as("v"), col("harmonic"))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql, ${bfsSigmaSql(6)}
               SELECT s AS v, ROUND(SUM(1.0 / d), 4) AS harmonic
               FROM r WHERE d > 0 GROUP BY s ORDER BY v""")),

    // DEGREE DISTRIBUTION: how many vertices have out-degree k — the
    // first chart anyone draws of a graph, and the skew signal that
    // decides salting strategy. Two tiny cascaded aggregates.
    Q("q_graph_degree_dist",
      (s, d) => edges(s, d)
        .groupBy("src").agg(count(lit(1)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_vertices"))
        .orderBy("k"),
      Some(s"""WITH $edgesSql,
               deg AS (SELECT src, COUNT(*) AS k FROM e GROUP BY src)
               SELECT k, COUNT(*) AS n_vertices FROM deg
               GROUP BY k ORDER BY k""")),

    // coreness via the h-operator run to its DISCOVERED fixpoint (at
    // which the estimate IS the exact coreness) — rounds halt-checked
    // and emitted as an oracle-re-derived column, like ktruss/LPA.
    Q("q_graph_kcore", (s, d) => {
      val (out, iters) = kcoreFixpoint(edges(s, d))
      out.withColumn("rounds", lit(iters.toLong)).orderBy("v")
    }, Some(kcoreSql(10))),

    // COMPONENT SIZE DISTRIBUTION: the connected-components labels rolled
    // up twice (label → size, size → how many components) — the shape of
    // the dedup-cluster histogram a crawl-dedup report leads with. Built
    // on the CONVERGED labels (ccFixpoint), not the fixed-round loop: a
    // histogram of pre-fixpoint labels on a 100×-diameter graph would
    // over-count components silently; the oracle rolls up the recursive
    // reachability closure's min labels the same way.
    Q("q_graph_cc_sizes",
      (s, d) => ccFixpoint(s, d)
        .groupBy("lbl").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_components"))
        .orderBy("sz"),
      Some(s"""WITH RECURSIVE $edgesSql,
               $undirectedSql,
               $nodesSql,
               reach(v, lbl) AS (
                 SELECT v, v AS lbl FROM nodes
                 UNION
                 SELECT eu.dst AS v, reach.lbl AS lbl
                 FROM reach JOIN eu ON eu.src = reach.v
               ),
               lbls AS (SELECT v, MIN(lbl) AS lbl FROM reach GROUP BY v)
               SELECT sz, COUNT(*) AS n_components FROM (
                 SELECT lbl, COUNT(*) AS sz FROM lbls GROUP BY lbl) x
               GROUP BY sz ORDER BY sz""")),

    // Degree assortativity: Pearson correlation of endpoint degrees over
    // the undirected edge list — one number saying whether hubs link to
    // hubs (positive) or to leaves (negative). Two joins + one
    // partial-combining corr aggregate.
    Q("q_graph_assortativity",
      (s, d) => {
        val eu = undirected(edges(s, d))
        val deg = eu.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
        eu.join(deg.withColumnRenamed("v", "src").withColumnRenamed("dg", "da"), Seq("src"))
          .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("dg", "db"), Seq("dst"))
          .agg(count(lit(1)).as("n_dir_edges"),
            round(corr(col("da"), col("db")), 6).as("assortativity"))
      },
      Some(s"""WITH $edgesSql,
               $undirectedSql,
               deg AS (SELECT src AS v, COUNT(*) AS dg FROM eu GROUP BY src)
               SELECT COUNT(*) AS n_dir_edges,
                 ROUND(CORR(da.dg, db.dg), 6) AS assortativity
               FROM eu JOIN deg da ON da.v = eu.src
               JOIN deg db ON db.v = eu.dst""")),

    // Local clustering coefficient: triangles(v) / C(deg(v), 2) — how
    // close each vertex's neighborhood is to a clique. Composes the
    // declared triangle pipeline with the degree relation; one extra join
    // over q_graph_triangle's plan.
    Q("q_graph_clustering",
      (s, d) => {
        val tri = graft.SparkEntry.queries("q_graph_triangle")(s, d)
        val eu = undirected(edges(s, d))
        val deg = eu.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
        tri.join(deg, Seq("v"))
          .select(col("v"), col("triangles"), col("dg").as("degree"),
            round(when(col("dg") >= 2,
              col("triangles") * 2.0 / (col("dg") * (col("dg") - 1)))
              .otherwise(0.0), 6).as("coeff"))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql,
               $undirectedSql,
               $nodesSql,
               ori AS (SELECT src AS a, dst AS b FROM eu WHERE src < dst),
               tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                       FROM ori e1 JOIN ori e2 ON e2.a = e1.b
                       JOIN ori e3 ON e3.a = e1.a AND e3.b = e2.b),
               corners AS (SELECT a AS v FROM tri UNION ALL
                           SELECT b AS v FROM tri UNION ALL
                           SELECT c AS v FROM tri),
               per AS (SELECT v, COUNT(*) AS triangles FROM corners GROUP BY v),
               deg AS (SELECT src AS v, COUNT(*) AS dg FROM eu GROUP BY src)
               SELECT nodes.v, CAST(COALESCE(per.triangles, 0) AS BIGINT) AS triangles,
                 CAST(deg.dg AS BIGINT) AS degree,
                 ROUND(CASE WHEN deg.dg >= 2
                   THEN COALESCE(per.triangles, 0) * 2.0 / (deg.dg * (deg.dg - 1))
                   ELSE 0.0 END, 6) AS coeff
               FROM nodes JOIN deg ON deg.v = nodes.v
               LEFT JOIN per ON per.v = nodes.v ORDER BY nodes.v""")),

    // Synchronous label propagation (community detection): labels start as
    // vertex ids; each round every vertex adopts the most frequent label
    // among its undirected neighbors (ties → smallest label, isolated
    // vertices keep theirs) — deterministic by construction, so a fixed
    // round count unrolls into an exact SQL oracle. Each round is one
    // join + count + per-vertex argmax window: pure shuffle-parallel,
    // state is one label per vertex, no driver materialization.
    Q("q_graph_lpa",
      (s, d) => {
        val (out, iters) = lpaShared(s, d)
        out.withColumn("rounds", lit(iters.toLong)).orderBy("v")
      },
      Some(lpaSql(lpaOracleUnroll))),

    // Triangle counting. Each undirected edge is oriented from its
    // lower-degree endpoint to the higher (ties by id), so the wedge join
    // fans out O(sqrt(m)) per vertex instead of O(max-degree) — the
    // standard hub-safe posture for a power-law graph at scale. Per-vertex
    // counts explode each closed triangle's three corners, which is
    // orientation-independent, so the oracle can enumerate the same
    // triangle set with the simpler id-ordered (a<b<c) triple join.
    Q("q_graph_triangle",
      (s, d) => {
        val eu = undirected(edges(s, d))
        val deg = eu.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
        val ori = eu
          .join(deg.withColumnRenamed("v", "src").withColumnRenamed("dg", "da"), Seq("src"))
          .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("dg", "db"), Seq("dst"))
          .filter(col("da") < col("db") ||
            (col("da") === col("db") && col("src") < col("dst")))
          .select(col("src").as("a"), col("dst").as("b"))
        val wedges = ori.as("e1")
          .join(ori.as("e2"), col("e1.b") === col("e2.a"))
          .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
        val tri = wedges
          .join(ori.as("e3"), col("wa") === col("e3.a") && col("wc") === col("e3.b"))
          .select("wa", "wb", "wc")
        val per = tri.select(explode(array(col("wa"), col("wb"), col("wc"))).as("v"))
          .groupBy("v").agg(count(lit(1)).as("triangles"))
        nodes(eu).join(per, Seq("v"), "left")
          .select(col("v"), coalesce(col("triangles"), lit(0L)).as("triangles"))
          .orderBy("v")
      },
      Some(s"""WITH $edgesSql,
               $undirectedSql,
               $nodesSql,
               ori AS (SELECT src AS a, dst AS b FROM eu WHERE src < dst),
               tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                       FROM ori e1 JOIN ori e2 ON e2.a = e1.b
                       JOIN ori e3 ON e3.a = e1.a AND e3.b = e2.b),
               corners AS (SELECT a AS v FROM tri UNION ALL
                           SELECT b AS v FROM tri UNION ALL
                           SELECT c AS v FROM tri),
               per AS (SELECT v, COUNT(*) AS triangles FROM corners GROUP BY v)
               SELECT nodes.v, CAST(COALESCE(per.triangles, 0) AS BIGINT) AS triangles
               FROM nodes LEFT JOIN per ON per.v = nodes.v ORDER BY nodes.v""")),

    // DynamicGraph: every vertex messages (value + 1) to a freshly ADDED
    // "sum" vertex (id −1) and removes itself; the sum vertex totals its
    // inbox next superstep. Exercises the engine's buffered add/remove +
    // message-to-new-vertex path, not a degenerate GROUP BY
    // (`examples/src/main/java/org/apache/hama/examples/DynamicGraph.java:71-119`).
    // The +1 per message is the INPUT_VERTICES counter folded into the sum.
    Q("q_graph_dynamic_sum",
      (s, d) => {
        import s.implicits._
        val e = edges(s, d)
        val vs = nodes(e).select(col("v"), col("v")).as[(Long, Long)]
        val out = graft.plans.Pregel.run[Long, Long, Unit](
          s, vs, maxIter = 3, combiner = Some(_ + _),
          // ≤ N vertices by construction (ids are mod-N buckets)
          partitions = Some(graft.plans.Pregel.sizedPartitions(s, N.toLong))) {
          (id, value, msgs, step, _) =>
          if (step == 0 && id >= 0)
            graft.plans.Pregel.ComputeResult(value, voteToHalt = true,
              messages = Seq((-1L, value + 1)), remove = true,
              add = Seq((-1L, 0L)))
          else if (msgs.nonEmpty)
            graft.plans.Pregel.ComputeResult(msgs.sum, voteToHalt = true)
          else graft.plans.Pregel.ComputeResult(value, voteToHalt = true)
        }
        out.toDF("id", "total").select(col("total"))
      },
      // CAST: DuckDB SUM(BIGINT) is HUGEINT, fetched as float64 by the
      // driver — cast back so both sides hash as int64
      Some(s"""WITH $edgesSql, $nodesSql
               SELECT CAST(SUM(v) + COUNT(*) AS BIGINT) AS total FROM nodes""")),

    // DYNAMIC-TOPOLOGY ENGINE PARITY (VERDICT r9 item 3, the 4th parity
    // row): the same DynamicGraph program, but with the engine's
    // SuperstepStats.added/removed TELEMETRY promoted into the declared
    // output — every vertex requests one add of the shared sum vertex
    // and removes itself, so add_requests = removed = |V| and exactly
    // one vertex survives, all independently derivable by the oracle
    // from the vertex relation alone. This closes the last [spec]-only
    // engine control path: buffered add/remove + message-to-new-vertex
    // is now hash-anchored, not just asserted in PregelSpec
    // (`examples/.../DynamicGraph.java:71-119`; buffered mutation apply
    // `graph/.../GraphJobRunner.java:574-597,696-702`).
    Q("q_graph_dynamic_parity",
      (s, d) => {
        import s.implicits._
        val e = edges(s, d)
        val vs = nodes(e).select(col("v"), col("v")).as[(Long, Long)]
        val stats = scala.collection.mutable.ArrayBuffer
          .empty[graft.plans.Pregel.SuperstepStats]
        val out = graft.plans.Pregel.run[Long, Long, Unit](
          s, vs, maxIter = 3, combiner = Some(_ + _),
          onSuperstep = stats += _,
          partitions = Some(graft.plans.Pregel.sizedPartitions(s, N.toLong))) {
          (id, value, msgs, step, _) =>
          if (step == 0 && id >= 0)
            graft.plans.Pregel.ComputeResult(value, voteToHalt = true,
              messages = Seq((-1L, value + 1)), remove = true,
              add = Seq((-1L, 0L)))
          else if (msgs.nonEmpty)
            graft.plans.Pregel.ComputeResult(msgs.sum, voteToHalt = true)
          else graft.plans.Pregel.ComputeResult(value, voteToHalt = true)
        }
        val finals = out.toDF("id", "total").localCheckpoint()
        val nFinal = finals.count()
        val added = stats.map(_.added).sum
        val removed = stats.map(_.removed).sum
        // the engine must buffer the mutations (applied at superstep
        // end), so the removed originals still send and the added sum
        // vertex receives NEXT superstep — if either count is off, the
        // control path broke even before the hash compare
        require(nFinal == 1L,
          s"exactly the added sum vertex must survive, got $nFinal")
        finals.select(col("total"),
          lit(added).as("add_requests"),
          lit(removed).as("removed"),
          lit(nFinal).as("n_final"))
      },
      Some(s"""WITH $edgesSql, $nodesSql
               SELECT CAST(SUM(v) + COUNT(*) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS add_requests,
                 CAST(COUNT(*) AS BIGINT) AS removed,
                 CAST(1 AS BIGINT) AS n_final
               FROM nodes""")),

    // Adamic-Adar link prediction: for each NON-adjacent pair (u, v),
    // score = sum over common neighbors w of 1/ln(deg(w)) — rare shared
    // neighbors weigh more. Wedges are enumerated per center (bounded by
    // degree, the triangle-count shape), scores aggregate per pair, known
    // edges drop via an anti-join, and the top 20 predictions come off a
    // TakeOrdered partial top-k — never a global sort of all pairs. Every
    // wedge center has deg >= 2 by construction, so ln(deg) > 0. Scores
    // round BEFORE ranking; (u, v) breaks rounded ties identically in
    // both engines.
    Q("q_graph_adamic",
      (s, d) => {
        val (eu, deg, wedges, adj) = linkPredParts(s, d)
        val scores = wedges.join(deg, Seq("w"))
          .groupBy("u", "v")
          .agg(round(sum(lit(1.0) / log(col("dg"))), 6).as("score"),
            count(lit(1)).as("common"))
        val out = scores.join(adj, Seq("u", "v"), "left_anti")
          .orderBy(desc("score"), asc("u"), asc("v"))
          .limit(20).localCheckpoint()
        graft.plans.Iterate.release(eu)
        out
      },
      Some(s"""WITH $linkPredCtes,
               sc AS (SELECT u, v, ROUND(SUM(1.0 / ln(dg)), 6) AS score,
                        COUNT(*) AS common
                      FROM wed JOIN deg USING (w) GROUP BY u, v)
               SELECT u, v, score, common FROM sc
               WHERE NOT EXISTS (SELECT 1 FROM adj WHERE adj.u = sc.u AND adj.v = sc.v)
               ORDER BY score DESC, u, v LIMIT 20""")),

    // JACCARD link prediction: the normalized companion of Adamic-Adar —
    // |N(u)∩N(v)| / |N(u)∪N(v)| over the SAME wedge/degree/adjacency
    // relations (one shared definition, Spark and oracle both), ranking
    // non-adjacent pairs by neighborhood overlap instead of rare-hub
    // weighting. Adamic-Adar rewards sharing a low-degree neighbor;
    // Jaccard penalizes large disjoint neighborhoods — running both is
    // the standard link-prediction ensemble baseline.
    Q("q_graph_jaccard_linkpred",
      (s, d) => {
        val (eu, deg, wedges, adj) = linkPredParts(s, d)
        val common = wedges.groupBy("u", "v").agg(count(lit(1)).as("common"))
        val du = deg.select(col("w").as("u"), col("dg").as("du"))
        val dv = deg.select(col("w").as("v"), col("dg").as("dv"))
        val out = common.join(du, "u").join(dv, "v")
          .select(col("u"), col("v"), col("common"),
            round(col("common") * lit(1.0) /
              (col("du") + col("dv") - col("common")), 6).as("jaccard"))
          .join(adj, Seq("u", "v"), "left_anti")
          .orderBy(desc("jaccard"), asc("u"), asc("v"))
          .limit(20).localCheckpoint()
        graft.plans.Iterate.release(eu)
        out
      },
      Some(s"""WITH $linkPredCtes,
               cm AS (SELECT u, v, COUNT(*) AS common FROM wed GROUP BY u, v),
               sc AS (SELECT cm.u, cm.v, cm.common,
                        ROUND(cm.common * 1.0 / (du.dg + dv.dg - cm.common), 6)
                          AS jaccard
                      FROM cm JOIN deg du ON du.w = cm.u
                              JOIN deg dv ON dv.w = cm.v)
               SELECT u, v, common, jaccard FROM sc
               WHERE NOT EXISTS (SELECT 1 FROM adj WHERE adj.u = sc.u AND adj.v = sc.v)
               ORDER BY jaccard DESC, u, v LIMIT 20""")),

    // K-truss decomposition (k = 4): iteratively delete edges supported
    // by fewer than k-2 = 2 triangles until STABLE — the cohesive-
    // subgraph operator one level up from triangle counting. Each round
    // is one triangle enumeration + a per-edge support count + a
    // semi-join filter, all shuffle-parallel on the oriented edge list.
    // The round count is DISCOVERED (VERDICT r8 item 3): the peel halts
    // when a round deletes nothing (edge deletion is monotone, so a
    // count delta IS set equality) and fails loudly on guard exhaustion
    // instead of silently returning a pre-fixpoint state at a scale the
    // old unrolled budget didn't anticipate. The discovered count is
    // emitted as a CHECKED column: the oracle unrolls past convergence
    // and derives the same number as the first round whose edge count
    // repeats — two independent derivations of the halt itself
    // (TrussSpec proves the halt fires late on a slow-converging chain
    // fixture). Output: surviving edges with final-graph support —
    // integers only, no FP anywhere.
    Q("q_graph_ktruss",
      (s, d) => {
        val ori = undirected(edges(s, d)).filter(col("src") < col("dst"))
          .select(col("src").as("a"), col("dst").as("b"))
        val (fin, iters) = ktrussFixpoint(ori)
        fin.join(trussSupport(fin), Seq("a", "b"), "left")
          .select(col("a"), col("b"), coalesce(col("supp"), lit(0L)).as("supp"),
            lit(iters.toLong).as("rounds"))
          .orderBy("a", "b")
      },
      Some(ktrussSql(trussOracleUnroll)))
  ,

    // Maximal independent set via DETERMINISTIC Luby rounds: priorities
    // are md5(vertex id) — identical in any engine, so the classic
    // randomized algorithm becomes exactly reproducible. Each round a
    // vertex joins the MIS iff its priority beats every ACTIVE
    // neighbor's; winners and their neighborhoods retire. O(log n)
    // expected rounds; 4 covers every testdata scale (observed ≤ 3;
    // MisSpec proves independence AND maximality, i.e. convergence).
    // Each round is two joins + one aggregate on the active subgraph —
    // shrinking geometrically — with per-round checkpoints.
    Q("q_graph_mis",
      (s, d) => {
        val eu = undirected(edges(s, d)).filter(col("src") =!= col("dst"))
          .localCheckpoint()
        val all = nodes(eu).localCheckpoint()
        var active = all
        var mis: DataFrame = null
        // superseded loop checkpoints are released as soon as their
        // successor materializes (the Iterate hygiene pattern).
        // Rounds are DISCOVERED: Luby retires winners + neighborhoods
        // until the active set EMPTIES (which is what MisSpec's
        // maximality proof certifies) — a declared round budget on a
        // 100×-deeper graph would silently return a non-maximal set.
        // Loud guard failure; discovered count re-derived by the oracle.
        val spent = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        var rounds = 0
        while (active.limit(1).count() > 0 && rounds < 16) {
          rounds += 1
          val act = active
          val nbMin = eu.join(act.withColumnRenamed("v", "src"), Seq("src"))
            .join(act.select(col("v").as("dst")), Seq("dst"))
            .groupBy("src").agg(min(md5(col("dst").cast("string"))).as("minp"))
            .withColumnRenamed("src", "v")
          val newMis = act.join(nbMin, Seq("v"), "left")
            .filter(col("minp").isNull || md5(col("v").cast("string")) < col("minp"))
            .select("v").localCheckpoint()
          val misNext =
            if (mis == null) newMis else mis.unionAll(newMis).localCheckpoint()
          if (mis != null) { spent += mis; spent += newMis }
          mis = misNext
          val removed = newMis.unionAll(
            eu.join(newMis.withColumnRenamed("v", "src"), Seq("src"))
              .select(col("dst").as("v"))).distinct()
          val actNext = act.join(removed, Seq("v"), "left_anti").localCheckpoint()
          if (act ne all) spent += act
          active = actNext
        }
        require(active.limit(1).count() == 0,
          s"MIS guard exhausted after $rounds Luby rounds with active vertices left")
        val out = all.join(mis.withColumn("in_mis", lit(true)), Seq("v"), "left")
          .select(col("v"), coalesce(col("in_mis"), lit(false)).as("in_mis"),
            lit(rounds.toLong).as("rounds"))
          .orderBy("v")
          .localCheckpoint()
        (spent ++ Seq(mis, active, all, eu)).foreach(graft.plans.Iterate.release)
        out
      },
      Some(misSql(misOracleUnroll)))
  ,

    // MODULARITY scoring of the LPA communities — the standard "are these
    // communities real" metric (Newman Q): per community c,
    // contrib_c = intra_c/2m − (deg_c/2m)², Q = Σ contrib_c. Reuses the
    // LPA labels (memoized plan shape via the declared query), then two
    // hash joins + three aggregates — all on the label clustering, the
    // only non-integer arithmetic is the final two divisions (identical
    // shape both sides). The derived benchmark graph is edge-random, so
    // Q ≈ 0 is the CORRECT readout (no community structure to find) —
    // LpaModularitySpec pins exactly that, plus the partition/count
    // conservation laws.
    Q("q_graph_modularity",
      (s, d) => {
        val lab = lpaShared(s, d)._1
          .select(col("v"), col("lbl")).localCheckpoint()
        val eu = undirected(edges(s, d)).localCheckpoint()
        val tot = eu.count().toDouble
        val intra = eu
          .join(lab.select(col("v").as("src"), col("lbl").as("la")), Seq("src"))
          .join(lab.select(col("v").as("dst"), col("lbl").as("lb")), Seq("dst"))
          .filter(col("la") === col("lb"))
          .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("ic"))
        val degs = eu
          .join(lab.select(col("v").as("src"), col("lbl")), Seq("src"))
          .groupBy("lbl").agg(count(lit(1)).as("dc"))
        val mem = lab.groupBy("lbl").agg(count(lit(1)).as("n_members"))
        mem.join(degs, Seq("lbl"))
          .join(intra, Seq("lbl"), "left")
          .select(col("lbl"), col("n_members"),
            coalesce(col("ic"), lit(0L)).as("intra_directed"),
            col("dc").as("degree_sum"),
            round(coalesce(col("ic"), lit(0L)) * 1.0 / lit(tot) -
              (col("dc") * 1.0 / lit(tot)) * (col("dc") * 1.0 / lit(tot)), 6).as("contrib"))
          .orderBy("lbl")
      },
      Some(modularitySql(lpaOracleUnroll)))
  ,

    // WEIGHTED PageRank: contributions split by edge weight w/W(u)
    // instead of 1/outdeg — the variant every citation/affinity graph
    // actually runs. Identical superstep shape to q_graph_pagerank (one
    // join + one map-side-combined aggregate per round, zero-mass rows
    // folded in); the oracle unrolls the same weighted fractions.
    Q("q_graph_pagerank_weighted",
      (s, d) => {
        val e = edges(s, d)
        val vs = nodes(e).cache()
        val n = vs.count().toDouble
        val wsum = e.groupBy("src").agg(sum(col("w")).cast("double").as("wtot"))
        val e2 = e.join(wsum, "src").cache()
        val zeros = vs.select(col("v"), lit(0.0).as("m")).cache()
        val init = vs.select(col("v"), lit(1.0 / n).as("rank"))
        val out = Iterate(init, 10, checkpointEvery = 4) { (r, _) =>
          val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
            .select(col("ee.dst").as("v"),
              (col("rr.rank") * col("ee.w") / col("ee.wtot")).as("m"))
          contrib.unionAll(zeros)
            .groupBy("v").agg((lit(0.15 / n) + lit(0.85) * sum("m")).as("rank"))
        }
        out.select(col("v"), round(col("rank"), 9).as("rank")).orderBy("v")
      },
      Some(pagerankWeightedSql(10)),
    ),

    // HITS hubs & authorities (Kleinberg): h(v) = Σ_out a(u),
    // a(v) = Σ_in h(u), max-normalized and ROUNDED AT 6 after every
    // half-step so both engines walk the identical value lattice. 3
    // iterations; each half-step is one join + one aggregate plus an O(1)
    // max collect to the driver (the aggregator-to-master shape). The
    // derived graph has edges, so both maxima stay positive.
    Q("q_graph_hits",
      (s, d) => {
        val e = edges(s, d).select("src", "dst").localCheckpoint()
        val vs = nodes(e).localCheckpoint()
        var a = vs.select(col("v"), lit(1.0).as("auth"))
        var h: DataFrame = null
        val spent = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        // each half-step checkpoints the RAW scores FIRST, then collects
        // the max from the materialized blocks and normalizes as a lazy
        // narrow projection over the pin (optimization r15, VERDICT r14
        // #5): the old shape ran the join+aggregate TWICE per half-step —
        // once under the max collect, once under the normalized
        // checkpoint. Same value lattice: round(raw/max, 6) with the
        // identical max either way.
        for (_ <- 1 to hitsIters) {
          val hr = e.join(a.withColumnRenamed("v", "dst"), Seq("dst"))
            .groupBy("src").agg(round(sum("auth"), 6).as("x"))
          // the max is OBSERVED during the checkpoint job itself
          // (Iterate.pinObserved, r15): one Spark job per half-step —
          // the identical max either way, so the value lattice holds
          val (hRaw, hmaxOpt) = graft.plans.Iterate.pinObserved(
            vs.join(hr.withColumnRenamed("src", "v"), Seq("v"), "left")
              .select(col("v"), coalesce(col("x"), lit(0.0)).as("hraw")),
            max(col("hraw")))
          val hmax = hmaxOpt.get.asInstanceOf[Double]
          if (h != null) spent += h
          h = hRaw.select(col("v"), round(col("hraw") / lit(hmax), 6).as("hub"))
          spent += hRaw
          val ar = e.join(h.withColumnRenamed("v", "src"), Seq("src"))
            .groupBy("dst").agg(round(sum("hub"), 6).as("x"))
          val (aRaw, amaxOpt) = graft.plans.Iterate.pinObserved(
            vs.join(ar.withColumnRenamed("dst", "v"), Seq("v"), "left")
              .select(col("v"), coalesce(col("x"), lit(0.0)).as("araw")),
            max(col("araw")))
          val amax = amaxOpt.get.asInstanceOf[Double]
          spent += a
          a = aRaw.select(col("v"), round(col("araw") / lit(amax), 6).as("auth"))
          spent += aRaw
        }
        val out = h.join(a, Seq("v")).select(col("v"), col("hub"), col("auth"))
          .orderBy("v").localCheckpoint()
        (spent ++ Seq(h, a, vs, e)).foreach(graft.plans.Iterate.release)
        out
      },
      Some(hitsSql(hitsIters)))
  )

  // The LPA oracle's unroll budget (a def: referenced from defs's
  // initializer above) — must exceed the Spark loop's discovered round
  // count at oracle scale so the chain's first stable round derives the
  // same number (the fixpoint is absorbing: extra rounds are no-ops).
  // Too small fails loudly as a rounds-column mismatch.
  private def lpaOracleUnroll: Int = 8

  // The ORACLE's unroll budget (a def: referenced from defs's
  // initializer above). The Spark side discovers its round count
  // (ktrussFixpoint); the oracle must unroll PAST the discovered count
  // so its first repeated edge count derives the same number — 8
  // comfortably exceeds every testdata scale's convergence (sf0.001
  // peels 6 rounds + 1 confirming; denser graphs confirm at round 1).
  // Unrolling too little fails loudly as a rounds-column mismatch.
  private def trussOracleUnroll: Int = 8

  /** per-edge triangle support within the CURRENT oriented (a<b) edge
    * set: enumerate triangles (a<b<c triple join), explode each onto its
    * three edges, count per edge. */
  /** LPA fixpoint over the derived orders graph, memoized per corpus
    * fingerprint — the labels are consumed by BOTH q_graph_lpa and
    * q_graph_modularity, which used to run the whole fixpoint twice
    * per suite. O(V) rows, capped like the other memos. */
  private val lpaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[(Long, Long)], Int)]()

  private def lpaShared(s: SparkSession, d: String): (DataFrame, Int) = {
    import s.implicits._
    val key = Tables.fingerprint(d, "orders")
    val cached = lpaCache.get(key)
    if (cached != null) return (cached._1.toDF("v", "lbl"), cached._2)
    val (out, iters) = lpaFixpoint(undirected(edges(s, d)))
    val head = out.head(prCacheCap + 1)
    if (head.length <= prCacheCap) {
      val rows = head.map(r => (r.getLong(0), r.getLong(1))).toSeq
      lpaCache.put(key, (rows, iters))
      (rows.toDF("v", "lbl"), iters)
    } else (out, iters)
  }

  /** Synchronous label propagation to the DISCOVERED fixpoint
    * (VERDICT r8 item 3): labels start as vertex ids; each round every
    * vertex adopts the most frequent label among its undirected
    * neighbors (ties → smallest label, isolated vertices keep theirs)
    * — deterministic by construction. The loop halts when NO label
    * changed (counted by a full next-vs-prev join — labels are not
    * monotone, so a count delta would not do) and fails LOUDLY on
    * guard exhaustion: synchronous LPA can 2-cycle on bipartite-ish
    * structures, and returning a mid-oscillation state as if converged
    * would be a silent wrong answer. Each round: one join + count +
    * max_by argmax hash aggregate (partial-combined map-side — a
    * celebrity vertex's label group never serializes through one
    * window task), one label per vertex of state, next checkpointed
    * and the predecessor released (the ssspFixpoint hygiene). Returns
    * (labels, rounds) with `rounds` counting the confirming round —
    * the number the oracle re-derives from its unrolled chain. */
  private[graft] def lpaFixpoint(eu0: DataFrame,
      maxIter: Int = 32): (DataFrame, Int) = {
    val eu = eu0.localCheckpoint()
    val vs = nodes(eu).localCheckpoint()
    val init = vs.select(col("v"), col("v").as("lbl"))
    val fp = Iterate.untilFixpointChecked(init, maxIter = maxIter,
      checkpointEvery = 0) { (lbl, _) =>
      val msg = eu
        .join(lbl.withColumnRenamed("v", "dst").withColumnRenamed("lbl", "nlbl"),
          Seq("dst"))
        .groupBy(col("src").as("v"), col("nlbl"))
        .agg(count(lit(1)).as("c"))
      val best = msg
        .groupBy("v")
        .agg(max_by(col("nlbl"), struct(col("c"), -col("nlbl"))).as("newl"))
      // the old label is already IN the plan (the right join side), so
      // the changed-set diff folds into the same projection and the
      // count is observed during the checkpoint job — one job per round
      // instead of checkpoint + a next-vs-old diff join (r15). The chg
      // column rides in the carried state and is stripped at return;
      // set (in)equality per vertex is exactly what the old diff join
      // counted, label by label.
      val (next, changed) = Iterate.pinCountTrue(
        vs.join(best, Seq("v"), "left").join(lbl.select("v", "lbl"), Seq("v"))
          .select(col("v"), coalesce(col("newl"), col("lbl")).as("lbl"),
            (coalesce(col("newl"), col("lbl")) =!= col("lbl")).as("chg")),
        col("chg"))
      Iterate.release(lbl)
      (next, changed)
    }
    require(fp.converged,
      s"lpaFixpoint: guard exhausted after ${fp.iters} rounds — oscillation or " +
        "slow convergence; raise maxIter or break the cycle asynchronously")
    (fp.out.select("v", "lbl"), fp.iters)
  }

  /** K-truss peel to the DISCOVERED fixpoint: delete edges with < 2
    * supporting triangles until a round deletes nothing (deletion is
    * monotone, so the count delta is exact set equality — no row
    * comparison needed). Returns (surviving edges, rounds), where
    * `rounds` counts through the confirming no-change round — the same
    * number the oracle derives from its unrolled edge counts. Fails
    * loudly on guard exhaustion: convergence is a theorem (≤ |E|
    * deleting rounds) but a budget bug must never return a pre-fixpoint
    * state as if converged. */
  private[graft] def ktrussFixpoint(ori: DataFrame,
      maxIter: Int = 64): (DataFrame, Int) = {
    // deletion is monotone, so changed = previous |E| − surviving |E|;
    // the surviving count is observed during each round's checkpoint
    // job and carried forward — one count job total (the seed) instead
    // of two per round (r15)
    var prevEdges = ori.count()
    val fp = Iterate.untilFixpointChecked(ori, maxIter = maxIter,
      checkpointEvery = 0) { (ed, _) =>
      val (next, n) = Iterate.pinCountAll(
        ed.join(trussSupport(ed), Seq("a", "b"))
          .filter(col("supp") >= 2).select("a", "b"))
      val changed = prevEdges - n
      prevEdges = n
      Iterate.release(ed)
      (next, changed)
    }.requireConverged("ktrussFixpoint")
    (fp.out, fp.iters)
  }

  private def trussSupport(ed: DataFrame): DataFrame = {
    val tri = ed.as("e1").join(ed.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
      .join(ed.as("e3"), col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select("wa", "wb", "wc")
    tri.select(explode(array(
        struct(col("wa").as("a"), col("wb").as("b")),
        struct(col("wa").as("a"), col("wc").as("b")),
        struct(col("wb").as("a"), col("wc").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("supp"))
  }

  // the MIS oracle's unroll budget — must exceed the discovered Luby
  // round count at oracle scale (observed ≤ 3; extra rounds are empty
  // no-ops since the active set is already drained)
  private def misOracleUnroll: Int = 6

  /** unrolled Luby rounds: nb_r (active-neighbor min priority), m_r (new
    * MIS members), a_{r+1} (survivors) — MATERIALIZED, each is referenced
    * 2-3 times downstream. */
  private def misSql(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""nb$r AS MATERIALIZED (SELECT e.src AS v,
           MIN(md5(CAST(e.dst AS VARCHAR))) AS minp
           FROM eu2 e JOIN a$r x ON x.v = e.src JOIN a$r y ON y.v = e.dst
           GROUP BY e.src),
         m$r AS MATERIALIZED (SELECT a.v FROM a$r a
           LEFT JOIN nb$r n ON n.v = a.v
           WHERE n.minp IS NULL OR md5(CAST(a.v AS VARCHAR)) < n.minp),
         a${r + 1} AS MATERIALIZED (SELECT v FROM a$r
           WHERE v NOT IN (SELECT v FROM m$r)
           AND v NOT IN (SELECT e.dst FROM eu2 e JOIN m$r m ON m.v = e.src))"""
    }.mkString(",\n")
    val misUnion = (0 until rounds).map(r => s"SELECT v FROM m$r").mkString(" UNION ALL ")
    // rounds = the first Luby round whose post-retirement active set is
    // empty — the Spark loop's discovered halt, independently re-derived
    val actCounts = (1 to rounds)
      .map(r => s"SELECT $r AS r, (SELECT COUNT(*) FROM a$r) AS c")
      .mkString(" UNION ALL ")
    s"""WITH $edgesSql,
       $undirectedSql,
       eu2 AS (SELECT src, dst FROM eu WHERE src <> dst),
       a0 AS (SELECT DISTINCT src AS v FROM eu2),
       $steps,
       mis AS (SELECT DISTINCT v FROM ($misUnion) u),
       actc AS MATERIALIZED ($actCounts),
       rnds AS (SELECT MIN(r) AS rounds FROM actc WHERE c = 0)
       SELECT a.v, (mis.v IS NOT NULL) AS in_mis,
         CAST((SELECT rounds FROM rnds) AS BIGINT) AS rounds
       FROM (SELECT DISTINCT src AS v FROM eu2) a
       LEFT JOIN mis ON mis.v = a.v
       ORDER BY a.v"""
  }

  /** unrolled k-truss rounds: tri_r/sup_r/t_{r+1} CTE chain past
    * convergence, then the final edge list with its final-graph support
    * PLUS the independently-derived `rounds` — the first round whose
    * edge count repeats its predecessor's (deletion is monotone, so the
    * count delta is set equality — the exact halt the Spark peel
    * discovers). NULL (→ loud mismatch) if the unroll budget never
    * converged. */
  private def ktrussSql(rounds: Int): String = {
    val steps = (0 until rounds).map { r =>
      s"""tri$r AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
           FROM t$r e1 JOIN t$r e2 ON e2.a = e1.b
           JOIN t$r e3 ON e3.a = e1.a AND e3.b = e2.b),
         sup$r AS (SELECT a, b, COUNT(*) AS supp FROM (
           SELECT a, b FROM tri$r UNION ALL SELECT a, c AS b FROM tri$r
           UNION ALL SELECT b AS a, c AS b FROM tri$r) x GROUP BY a, b),
         t${r + 1} AS MATERIALIZED (SELECT t.a, t.b FROM t$r t
           JOIN sup$r s ON s.a = t.a AND s.b = t.b WHERE s.supp >= 2)"""
    }.mkString(",\n")
    val cnts = (0 to rounds).map(r => s"SELECT $r AS t, COUNT(*) AS c FROM t$r")
      .mkString(" UNION ALL ")
    s"""WITH $edgesSql,
       $undirectedSql,
       t0 AS (SELECT src AS a, dst AS b FROM eu WHERE src < dst),
       $steps,
       cnt AS MATERIALIZED ($cnts),
       rnds AS (SELECT MIN(a.t) AS rounds FROM cnt a
         JOIN cnt b ON b.t = a.t - 1 AND b.c = a.c),
       trif AS (SELECT e1.a, e1.b, e2.b AS c
         FROM t$rounds e1 JOIN t$rounds e2 ON e2.a = e1.b
         JOIN t$rounds e3 ON e3.a = e1.a AND e3.b = e2.b),
       supf AS (SELECT a, b, COUNT(*) AS supp FROM (
         SELECT a, b FROM trif UNION ALL SELECT a, c AS b FROM trif
         UNION ALL SELECT b AS a, c AS b FROM trif) x GROUP BY a, b)
       SELECT t.a, t.b, CAST(COALESCE(s.supp, 0) AS BIGINT) AS supp,
         CAST((SELECT rounds FROM rnds) AS BIGINT) AS rounds
       FROM t$rounds t LEFT JOIN supf s ON s.a = t.a AND s.b = t.b
       ORDER BY t.a, t.b"""
  }

  /** the LPA CTE chain up to `l$rounds` (no final SELECT) — shared by the
    * labels query and the modularity scorer. */
  private def lpaChainSql(rounds: Int): String = {
    // MATERIALIZED: l_t is referenced twice downstream (s_{t+1} and
    // l_{t+1}); inlining would expand the chain 2^rounds-fold
    val steps = (1 to rounds).map { t =>
      s"""s$t AS MATERIALIZED (SELECT eu.src AS v, l${t - 1}.lbl AS lbl, COUNT(*) AS c
         FROM eu JOIN l${t - 1} ON l${t - 1}.v = eu.dst GROUP BY eu.src, l${t - 1}.lbl),
         b$t AS MATERIALIZED (SELECT v, MIN(lbl) AS newl FROM (
           SELECT v, lbl, c, MAX(c) OVER (PARTITION BY v) AS mc FROM s$t) x
         WHERE c = mc GROUP BY v),
         l$t AS MATERIALIZED (SELECT nodes.v, COALESCE(b$t.newl, l${t - 1}.lbl) AS lbl
         FROM nodes LEFT JOIN b$t ON b$t.v = nodes.v
         JOIN l${t - 1} ON l${t - 1}.v = nodes.v)"""
    }.mkString(",\n")
    s"""WITH $edgesSql,
       $undirectedSql,
       $nodesSql,
       l0 AS MATERIALIZED (SELECT v, v AS lbl FROM nodes),
       $steps"""
  }

  /** diff-count + first-stable-round CTEs over an unrolled per-vertex
    * chain `<prefix>0 … <prefix>rounds` with value column `valCol`:
    * d_t counts vertices whose value changed between rounds t-1 and t
    * (full row comparison — values need not be count-monotone), `rnds`
    * is the first t with d_t = 0 — the same confirming-round number
    * the Spark loop discovers. NULL (→ loud mismatch) if the unroll
    * never converged. */
  private def stableRoundCtes(prefix: String, valCol: String, rounds: Int): String = {
    val diffs = (1 to rounds).map { t =>
      s"""SELECT $t AS t, (SELECT COUNT(*) FROM $prefix$t a
           JOIN $prefix${t - 1} b ON b.v = a.v AND b.$valCol <> a.$valCol) AS c"""
    }.mkString(" UNION ALL ")
    s"""dif AS MATERIALIZED ($diffs),
       rnds AS (SELECT MIN(t) AS rounds FROM dif WHERE c = 0)"""
  }

  private def lpaSql(rounds: Int): String =
    s"""${lpaChainSql(rounds)},
       ${stableRoundCtes("l", "lbl", rounds)}
       SELECT v, lbl, CAST((SELECT rounds FROM rnds) AS BIGINT) AS rounds
       FROM l$rounds ORDER BY v"""

  /** per-community modularity contributions over the LPA labels:
    * contrib_c = intra_c/|eu| − (deg_c/|eu|)², where |eu| = 2m counts
    * each undirected edge twice — identical formula shape both sides. */
  private def modularitySql(rounds: Int): String =
    s"""${lpaChainSql(rounds)},
       lab AS MATERIALIZED (SELECT v, lbl FROM l$rounds),
       tot AS (SELECT COUNT(*) AS t FROM eu),
       intra AS (SELECT a.lbl, COUNT(*) AS ic FROM eu
         JOIN lab a ON a.v = eu.src JOIN lab b ON b.v = eu.dst
         WHERE a.lbl = b.lbl GROUP BY a.lbl),
       degs AS (SELECT lab.lbl, COUNT(*) AS dc
         FROM eu JOIN lab ON lab.v = eu.src GROUP BY lab.lbl),
       mem AS (SELECT lbl, COUNT(*) AS n_members FROM lab GROUP BY lbl)
       SELECT mem.lbl, mem.n_members,
         CAST(COALESCE(intra.ic, 0) AS BIGINT) AS intra_directed,
         CAST(degs.dc AS BIGINT) AS degree_sum,
         ROUND(COALESCE(intra.ic, 0) * 1.0 / tot.t
           - (degs.dc * 1.0 / tot.t) * (degs.dc * 1.0 / tot.t), 6) AS contrib
       FROM mem JOIN degs ON degs.lbl = mem.lbl
       LEFT JOIN intra ON intra.lbl = mem.lbl
       CROSS JOIN tot
       ORDER BY mem.lbl"""
}
