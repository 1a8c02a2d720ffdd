package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The discovered-rounds contract of the k-truss and LPA fixpoint loops
  * (VERDICT r8 item 3): on constructed slow-converging fixtures the
  * halt fires only when a round changes nothing (a multi-round cascade,
  * not a fixed unroll), the returned state is the TRUE fixpoint (one
  * more hand-run round changes nothing), and an exhausted guard fails
  * LOUDLY instead of returning a pre-fixpoint state as if converged —
  * including synchronous LPA's known 2-cycle oscillation on bipartite
  * structures, which must never "converge" silently. */
class FixpointHaltSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("ktruss: triangle strip cascades over multiple rounds to the true fixpoint") {
    // strip of triangles (i, i+1, i+2): long edges have support 1 and
    // die in round 1, which starves the short edges (round 2), then a
    // confirming round — a genuine multi-round cascade
    val n = 12
    val edges = ((0 until n - 1).map(i => (i.toLong, (i + 1).toLong)) ++
      (0 until n - 2).map(i => (i.toLong, (i + 2).toLong))).toDF("a", "b")
    val (fin, iters) = operators.Graph.ktrussFixpoint(edges)
    assert(fin.count() === 0L, "a strip holds no 4-truss")
    assert(iters >= 3, s"the cascade must take multiple rounds, got $iters")
    // a too-small guard fails loudly instead of returning mid-cascade
    intercept[IllegalArgumentException] {
      operators.Graph.ktrussFixpoint(edges, maxIter = 1)
    }
  }

  test("ktruss: a clique is already its own truss — confirming round only") {
    val k = 5
    val clique = (for (a <- 0 until k; b <- a + 1 until k)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val (fin, iters) = operators.Graph.ktrussFixpoint(clique)
    assert(fin.count() === (k * (k - 1) / 2).toLong)
    assert(iters === 1, "no deletion: the first round confirms the fixpoint")
  }

  test("lpa: barbell converges over multiple rounds; one more round is a no-op") {
    // two 4-cliques joined by a 5-edge path: the cliques settle fast,
    // then the min clique label invades the path one hop per round
    val cliqueA = for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- a + 1 to 13L) yield (a, b)
    val path = Seq((3L, 6L), (6L, 7L), (7L, 8L), (8L, 9L), (9L, 10L))
    val dir = (cliqueA ++ cliqueB ++ path).toDF("src", "dst")
    val eu = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
    val (lbl, iters) = operators.Graph.lpaFixpoint(eu)
    assert(iters >= 3, s"label invasion must take multiple rounds, got $iters")
    // the returned state is the TRUE fixpoint: one more synchronous
    // round (same step, run by hand) changes no label
    val msg = eu
      .join(lbl.select(col("v").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
      .groupBy(col("src").as("v"), col("nlbl")).agg(count(lit(1)).as("c"))
    val best = msg.groupBy("v")
      .agg(max_by(col("nlbl"), struct(col("c"), -col("nlbl"))).as("newl"))
    val changed = lbl.join(best, Seq("v"), "left")
      .filter(coalesce(col("newl"), col("lbl")) =!= col("lbl")).count()
    assert(changed === 0L, "the halt must only fire at a true fixpoint")
  }

  test("kcore: the sharded rank path (forced) equals the window path exactly") {
    // two overlapping 5-cliques + a pendant path — varied coreness
    val cliqueA = for (a <- 0L to 4L; b <- a + 1 to 4L) yield (a, b)
    val cliqueB = for (a <- 3L to 7L; b <- a + 1 to 7L) yield (a, b)
    val path = Seq((7L, 20L), (20L, 21L), (21L, 22L))
    val e = (cliqueA ++ cliqueB ++ path).distinct.toDF("src", "dst")
    val (win, itW) = operators.Graph.kcoreFixpoint(e) // degrees ≤ 8: window
    val (shd, itS) = operators.Graph.kcoreFixpoint(e, shardBound = 1L) // forced
    assert(itW === itS)
    assert(win.orderBy("v").collect().toSeq === shd.orderBy("v").collect().toSeq,
      "sharded h-index rank must be bit-identical to the window rank")
  }

  test("convergence exactly on round maxIter is convergence, not exhaustion") {
    // ADVICE r9: the old iters < maxIter inference misreported a run
    // whose confirming zero-change round lands ON the boundary. A
    // 5-clique confirms its own truss in round 1 — run with maxIter = 1
    // so the confirming round IS the guard boundary.
    val k = 5
    val clique = (for (a <- 0 until k; b <- a + 1 until k)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val (fin, iters) = operators.Graph.ktrussFixpoint(clique, maxIter = 1)
    assert(iters === 1 && fin.count() === (k * (k - 1) / 2).toLong,
      "a run converging on the boundary round must return, not throw")
    // and the raw record carries the explicit flag both ways
    val init = Seq((0L, 0L)).toDF("v", "x")
    val conv = plans.Iterate.untilFixpointChecked(init, maxIter = 1,
      checkpointEvery = 0) { (df, _) => (df, 0L) }
    assert(conv.converged && conv.iters === 1)
    val exhausted = plans.Iterate.untilFixpointChecked(init, maxIter = 2,
      checkpointEvery = 0) { (df, _) => (df, 1L) }
    assert(!exhausted.converged && exhausted.iters === 2)
  }

  test("anf: registers hit the OR fixpoint; estimates are per-component constants") {
    // two disjoint directed 3-cycles: every vertex reaches exactly its
    // own cycle, so the merged registers — and hence the estimate — are
    // IDENTICAL within a component; rounds = cycle length (2 propagating
    // + 1 confirming = 3 on a 3-cycle from each start)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val (masks, rounds, nf, curve) = operators.Graph.anfSketch(e)
    assert(curve.count() === 6L * (rounds + 1),
      "the per-round curve holds one estimate per vertex per round")
    assert(masks.count() === 6L * 8L, "state must be exactly V*K rows")
    assert(rounds === 3)
    assert(nf.size === rounds + 1)
    assert(nf.zip(nf.tail).forall { case (a, b) => a <= b },
      "the neighborhood function is monotone non-decreasing")
    val ests = operators.Graph.anfEstimate(masks).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ests.size === 6 && ests.values.forall(_ > 0.0))
    assert(Seq(0L, 1L, 2L).map(ests).distinct.size === 1,
      "same reachable set => same merged registers => same estimate")
    assert(Seq(10L, 11L, 12L).map(ests).distinct.size === 1)
  }

  test("lpa: bipartite 2-cycle oscillation exhausts the guard LOUDLY") {
    // a star is bipartite: synchronous LPA flips hub/leaf labels forever
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val eu = star.unionAll(star.select(col("dst").as("src"), col("src").as("dst")))
    intercept[IllegalArgumentException] {
      operators.Graph.lpaFixpoint(eu, maxIter = 12)
    }
  }
}
