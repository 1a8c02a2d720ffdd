package graft.examples

import graft.GraftSession
import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-posture probe for the centrality family (VERDICT r8 item 1):
  * the all-sources `bfsSigma` behind the exact betweenness/
  * eccentricity/harmonic rows carries O(V²) forward state — correct
  * and oracle-checkable at gate scale, the classic quadratic blow-up
  * at 100×. The declared large-graph shape is the SAMPLED Brandes
  * estimator (`q_graph_betweenness_sampled`): source set S drawn by
  * hash, bc rescaled by V/|S|, per-level state bounded by |S|·V.
  *
  * The probe measures both claims on generated graphs:
  *
  *   1. **bound** — on a 10⁵-vertex / 6·10⁵-edge random graph, run the
  *      forward BFS from a hash-drawn S and assert the MEASURED total
  *      reached state ≤ |S|·V (and report the largest per-level
  *      frontier). All-sources state on the same graph would be
  *      reach·V ≈ V²/|S| × the measured rows — printed as the
  *      extrapolated blow-up factor, not run (that is the point).
  *   2. **blow-up + estimator quality** — on a 2,000-vertex subgraph
  *      where all-sources IS runnable, measure exact vs sampled state
  *      rows and wall time, and the estimator's mean |error| relative
  *      to the exact bc range (the accuracy the V/|S| rescale buys).
  *
  * Run: sbt "runMain graft.examples.CentralityScale [V] [S]"
  */
object CentralityScale {
  def main(args: Array[String]): Unit = {
    val bigV = args.lift(0).map(_.toLong).getOrElse(100000L)
    val nSrc = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = GraftSession.get()

    // deterministic random graph: out-degree 6, dst by xxhash64
    def randGraph(v: Long, deg: Int): DataFrame =
      spark.range(v * deg).select(
        (col("id") / deg).cast("long").as("src"),
        pmod(xxhash64(col("id"), lit(42)), lit(v)).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))

    // ---- 1. the bound at 10^5 vertices --------------------------------
    val e = randGraph(bigV, 6).localCheckpoint()
    val srcs = spark.range(bigV).select(col("id").as("v"))
      .filter(pmod(xxhash64(col("v"), lit(7)), lit(bigV / nSrc)) === 0)
      .localCheckpoint()
    val sCount = srcs.count()
    val t0 = System.nanoTime()
    val (reached, levels) = Graph.bfsSigma(e, Some(srcs))
    val totalRows = reached.count()
    val maxFrontier = levels.map(_.count()).max
    val sampledSec = (System.nanoTime() - t0) / 1e9
    val bound = sCount * bigV
    require(totalRows <= bound,
      s"sampled BFS state $totalRows exceeded the |S|*V bound $bound")
    // all-sources forward state on the same graph = (avg reach) * V rows;
    // the sampled run measures (avg reach over S) * |S| rows, so the
    // extrapolation is exactly V/|S| — the quadratic term made visible
    val blowup = bigV.toDouble / sCount

    // the WHOLE estimator end-to-end at 10^5 (forward σ-BFS + backward
    // per-level dependency joins + V/|S| rescale) — the bound above is
    // the state claim, this is the operator running at that scale
    val tBc = System.nanoTime()
    val bcEst = Graph.betweennessOn(e, Some(srcs),
      bigV.toDouble / sCount, "bc")
    val bcRows = bcEst.count()
    val bcTop = bcEst.agg(org.apache.spark.sql.functions.max("bc")).head.getDouble(0)
    val bcSec = (System.nanoTime() - tBc) / 1e9

    // ---- 1b. the ANF register sketch at 10^5 (VERDICT r9 item 1) ------
    // the graph-SUMMARY analogue of the sampled-source bound: per-vertex
    // reach / effective diameter / NF(r) from O(V·K) register state where
    // the exact all-sources relation is one row per reachable PAIR —
    // NF(fixpoint) estimates exactly that row count, so the blow-up the
    // sketch avoids is measured by the sketch itself
    val tAnf = System.nanoTime()
    val (anfMasks, anfRounds, anfNf, _) = Graph.anfSketch(e)
    val anfRows = anfMasks.count()
    val anfSec = (System.nanoTime() - tAnf) / 1e9
    require(anfRows <= bigV * 8,
      s"ANF register state $anfRows exceeded the V*K bound ${bigV * 8}")
    val nfFinal = anfNf.last
    val anfEffD = anfNf.indexWhere(_ >= 0.9 * nfFinal)
    val exactPairBlowup = nfFinal / anfRows

    // ---- 1c. ANF at production K (VERDICT r10 #5): the K knob buys
    // accuracy at LINEAR cost — K = 64 at the same 10^5 graph must stay
    // within the V·K state bound and roughly 8× the K = 8 register rows
    val tAnf64 = System.nanoTime()
    val (anf64Masks, anf64Rounds, _, _) = Graph.anfSketch(e, k = 64)
    val anf64Rows = anf64Masks.count()
    val anf64Sec = (System.nanoTime() - tAnf64) / 1e9
    require(anf64Rows <= bigV * 64,
      s"ANF K=64 register state $anf64Rows exceeded the V*K bound ${bigV * 64}")

    // ---- 2. all-sources runnable only at toy scale --------------------
    val smallV = 2000L
    val eS = randGraph(smallV, 6).localCheckpoint()
    val tEx = System.nanoTime()
    val (rEx, _) = Graph.bfsSigma(eS, None)
    val exactRows = rEx.count()
    val exactSec = (System.nanoTime() - tEx) / 1e9
    val srcsS = spark.range(smallV).select(col("id").as("v"))
      .filter(pmod(xxhash64(col("v"), lit(7)), lit(smallV / 250)) === 0)
      .localCheckpoint()
    val sCountS = srcsS.count()
    val tSm = System.nanoTime()
    val (rSm, _) = Graph.bfsSigma(eS, Some(srcsS))
    val sampledRowsS = rSm.count()
    val sampledSecS = (System.nanoTime() - tSm) / 1e9

    // ANF estimator quality vs K, against the EXACT per-vertex reach
    // (computable on the toy graph from the all-sources closure): the
    // FM theory says mean |rel err| ~ 0.78/√K, so 8 → 64 should cut it
    // ~2.8× — measured, because this is the knob a production run turns
    val exactReach = rEx.groupBy(col("s").as("v"))
      .agg(count(lit(1)).cast("double").as("reach"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def anfRelErr(k: Int): Double = {
      val (m, _, _, _) = Graph.anfSketch(eS, k = k)
      val est = Graph.anfEstimate(m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val errs = exactReach.collect { case (v, ex) if ex > 0 =>
        math.abs(est.getOrElse(v, 0.0) - ex) / ex }
      errs.sum / errs.size
    }
    val anfErr8 = anfRelErr(8)
    val anfErr64 = anfRelErr(64)

    // estimator quality: exact bc vs V/|S|-rescaled sampled bc
    val exact = Graph.betweennessOn(eS)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val est = Graph.betweennessOn(eS, Some(srcsS),
        smallV.toDouble / sCountS, "bc")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bcMax = exact.values.max
    val mae = exact.map { case (v, bc) =>
      math.abs(est.getOrElse(v, 0.0) - bc) }.sum / exact.size
    val relErr = mae / bcMax

    println(f"""{"metric":"centrality_scale","v":$bigV,"edges":${bigV * 6},""" +
      f""""sources":$sCount,"sampled_state_rows":$totalRows,""" +
      f""""state_bound":$bound,"max_frontier_rows":$maxFrontier,""" +
      f""""sampled_sec":$sampledSec%.1f,"allsources_blowup_x":$blowup%.0f,""" +
      f""""bc_end_to_end_sec":$bcSec%.1f,"bc_rows":$bcRows,"bc_max":$bcTop%.1f,""" +
      f""""anf_register_rows":$anfRows,"anf_state_bound":${bigV * 8},""" +
      f""""anf_rounds":$anfRounds,"anf_sec":$anfSec%.1f,""" +
      f""""anf_nf_final":$nfFinal%.0f,"anf_eff_diameter":$anfEffD,""" +
      f""""anf_exact_pair_rows_avoided_x":$exactPairBlowup%.0f,""" +
      f""""anf64_register_rows":$anf64Rows,"anf64_state_bound":${bigV * 64},""" +
      f""""anf64_rounds":$anf64Rounds,"anf64_sec":$anf64Sec%.1f,""" +
      f""""anf_rel_err_k8":$anfErr8%.4f,"anf_rel_err_k64":$anfErr64%.4f,""" +
      f""""small_v":$smallV,"small_exact_rows":$exactRows,""" +
      f""""small_exact_sec":$exactSec%.1f,"small_sources":$sCountS,""" +
      f""""small_sampled_rows":$sampledRowsS,"small_sampled_sec":$sampledSecS%.1f,""" +
      f""""estimator_mae_over_bcmax":$relErr%.4f}""")
    spark.stop()
  }
}
