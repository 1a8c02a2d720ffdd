package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delta-frontier ANF maintenance contract (VERDICT r11 #1, the
  * reference's active-set superstep semantics,
  * `graph/.../GraphJobRunner.java:256-313`): a batch of new edges applied
  * through [[operators.Graph.anfDelta]] must land on registers
  * BIT-IDENTICAL to a cold [[operators.Graph.anfSketch]] run on the grown
  * graph — including brand-new vertices, duplicate edges, and self-loops
  * in the accumulated relation — while every round's edge-join output
  * stays bounded by the frontier's pull, and a no-op delta (edges whose
  * information the registers already hold) quiesces in ONE round with
  * zero joined growth downstream. */
class AnfDeltaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def drift(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Long =
    a.as("w").join(b.as("c"),
        col("w.v") === col("c.v") && col("w.k") === col("c.k"), "full")
      .filter(col("w.mask").isNull || col("c.mask").isNull ||
        col("w.mask") =!= col("c.mask")).count()

  test("delta fixpoint is bit-identical to the cold run on the grown graph") {
    // chain 0→1→…→7 plus a back edge, grown by a delta that (a) splices
    // into the middle, (b) introduces two brand-new vertices, and (c)
    // re-sends an existing edge — the three shapes a crawl batch mixes
    val base = (0L to 6L).map(i => (i, i + 1)) :+ (7L, 0L)
    val delta = Seq((3L, 9L), (9L, 10L), (10L, 2L), (0L, 1L))
    val baseDf = base.toDF("src", "dst")
    val fullDf = (base ++ delta).toDF("src", "dst")
    val (baseMasks, _, _, c1) = operators.Graph.anfSketch(baseDf)
    val (fin, rounds, stats) =
      operators.Graph.anfDelta(baseMasks, fullDf, delta.toDF("src", "dst"))
    val (coldMasks, coldRounds, _, c2) = operators.Graph.anfSketch(fullDf)
    assert(drift(fin, coldMasks) === 0L,
      "delta-maintained registers must equal the cold fixpoint bit for bit")
    assert(rounds <= coldRounds)
    assert(fin.count() === 10L * 8L, "state covers the grown vertex set at V*K")
    // every round's join output is the frontier's pull, never E*K
    val maxInDeg = fullDf.groupBy("dst").count().agg(max("count")).head.getLong(0)
    stats.foreach(r => assert(r.joinedRows <= r.frontierRows * maxInDeg))
    Seq(c1, c2, fin).foreach(plans.Iterate.release)
  }

  test("no-op delta (already-absorbed edges) quiesces in one round") {
    // a transitive shortcut 0→2 adds no reachability on 0→1→2→3: the
    // seed round must find zero grown registers and stop immediately,
    // and the returned state must be the unchanged fixpoint
    val base = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val delta = Seq((0L, 2L))
    val (baseMasks, _, _, c) = operators.Graph.anfSketch(base.toDF("src", "dst"))
    val (fin, rounds, stats) = operators.Graph.anfDelta(
      baseMasks, (base ++ delta).toDF("src", "dst"), delta.toDF("src", "dst"))
    assert(rounds === 1, "a no-op delta must stop after the seed round")
    assert(stats.size === 1)
    assert(drift(fin, baseMasks) === 0L,
      "absorbed edges must leave every register untouched")
    Seq(c, fin, baseMasks).foreach(plans.Iterate.release)
  }

  test("over-bound frontiers take the un-hinted join and stay bit-identical") {
    // VERDICT r12 #1: the frontier broadcast is a HINT gated on the
    // measured frontier size, never a semantic step — broadcastBound=0
    // forces EVERY round of both the cold sketch and the delta path
    // down the plain-shuffle join (the 100 TB plan, where the frontier
    // can be V*K rows and a forced broadcast is a driver collect), and
    // the fixpoints must not move by a bit
    val base = (0L to 6L).map(i => (i, i + 1)) :+ (7L, 0L)
    val delta = Seq((3L, 9L), (9L, 10L), (10L, 2L))
    val fullDf = (base ++ delta).toDF("src", "dst")
    val (hinted, hr, _, c1) = operators.Graph.anfSketch(fullDf)
    val (plain, pr, _, c2) =
      operators.Graph.anfSketch(fullDf, broadcastBound = 0L)
    assert(hr === pr, "the hint must not change the round count")
    assert(drift(hinted, plain) === 0L,
      "cold fixpoint must be identical with the broadcast hint disabled")
    val (baseMasks, _, _, c3) =
      operators.Graph.anfSketch(base.toDF("src", "dst"))
    val (finH, rH, _) = operators.Graph.anfDelta(
      baseMasks, fullDf, delta.toDF("src", "dst"))
    val (finP, rP, _) = operators.Graph.anfDelta(
      baseMasks, fullDf, delta.toDF("src", "dst"), broadcastBound = 0L)
    assert(rH === rP)
    assert(drift(finH, finP) === 0L,
      "delta fixpoint must be identical with the broadcast hint disabled")
    assert(drift(finP, hinted) === 0L,
      "un-hinted delta must still land on the grown graph's cold fixpoint")
    Seq(c1, c2, c3, hinted, plain, baseMasks, finH, finP)
      .foreach(plans.Iterate.release)
  }

  test("self-loops and cross-batch duplicate edges in the store are no-ops") {
    // the accumulated relation is append-only and never re-distincted:
    // duplicates and self-loops must not change the fixpoint or stall
    // convergence
    val base = Seq((0L, 1L), (1L, 2L))
    val delta = Seq((2L, 0L))
    val dirty = base ++ base ++ delta ++ Seq((1L, 1L), (0L, 0L))
    val (baseMasks, _, _, c1) = operators.Graph.anfSketch(base.toDF("src", "dst"))
    val (fin, _, _) = operators.Graph.anfDelta(
      baseMasks, dirty.toDF("src", "dst"), delta.toDF("src", "dst"))
    val (coldMasks, _, _, c2) =
      operators.Graph.anfSketch((base ++ delta).toDF("src", "dst"))
    assert(drift(fin, coldMasks) === 0L)
    Seq(c1, c2, fin).foreach(plans.Iterate.release)
  }
}
