package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the selection/ensemble/retrieval additions: k-center
  * greedy + its coverage audit, tf-idf topic bucketing, the Poisson
  * bootstrap, the bagged forest pair, and late-interaction MaxSim. */
class SelectionEnsembleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("k-center radii shrink monotonically and coverage conserves the corpus") {
    val radii = q("q_sim_kcenter").collect().map(_.getDouble(2))
    radii.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9,
      s"covering radius grew: $a -> $b") }
    val cov = q("q_sim_kcenter_assign").collect()
    assert(cov.length == 6, "exactly the 6 selected centers")
    val n = cov.map(_.getLong(1)).sum
    val total = Tables(spark, TestSpark.sf0, "embeddings").count()
    assert(n == total, s"assigned $n of $total vectors")
    cov.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9, "avg_dist > max_dist")
    }
    // adding the last center only shrinks coverage: the post-selection
    // assignment distance is bounded by the final pick-time radius
    // (pick 6 WAS the farthest point under the first 5 centers)
    assert(cov.map(_.getDouble(3)).max <= radii.last + 1e-6)
  }

  test("topic bucketing assigns every doc sharing a term with a seed, sims in [-1,1]") {
    val rows = q("q_text_cluster_assign").collect()
    assert(rows.nonEmpty)
    val clusters = rows.map(_.getLong(1)).distinct.sorted
    clusters.foreach(c => assert(c >= 0 && c < 4, s"cluster $c not a seed"))
    rows.foreach { r =>
      val sim = r.getDouble(2)
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9)
      assert(r.getLong(0) >= 4, "seeds must not self-assign")
    }
  }

  test("bootstrap interval brackets the point estimate with positive spread") {
    val r = q("q_agg_bootstrap").collect()(0)
    val (mean, se, lo, hi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi)
    assert(se > 0.0)
    // the plug-in mean lies inside (or at worst within 3 SE of) the interval
    assert(mean >= lo - 3 * se && mean <= hi + 3 * se)
  }

  test("forest splits are valid and inference conserves the event count") {
    val model = q("q_ml_forest").collect()
    assert(model.length == 5, "one split per tree")
    model.foreach { r =>
      assert(Set("hour", "dow")(r.getString(1)))
      assert(r.getDouble(3) >= 0.0, "info gain cannot be negative at the argmax")
      assert(Set(0L, 1L)(r.getLong(4)) && Set(0L, 1L)(r.getLong(5)))
    }
    val acc = q("q_ml_forest_acc").collect()(0)
    val n = acc.getLong(0)
    assert(n == Tables(spark, TestSpark.sf0, "events").count())
    assert(acc.getLong(2) + acc.getLong(3) + acc.getLong(4) + acc.getLong(5) == n)
    val a = acc.getDouble(1)
    assert(a >= 0.0 && a <= 1.0)
    // majority vote of stumps can never do worse than predicting the
    // minority class everywhere
    assert(a >= math.min(acc.getLong(2) + acc.getLong(4),
      acc.getLong(3) + acc.getLong(5)).toDouble / n - 1e-9)
  }

  test("late-interaction MaxSim dominates the single-vector dot per pair") {
    // sum over query slices of MAX candidate-slice dot >= the aligned
    // (m,m) slice dots, whose sum IS the full-vector dot product
    import org.apache.spark.sql.Row
    val sc = q("q_sim_late_interaction").collect()
    assert(sc.nonEmpty && sc.forall(_.getLong(1) <= 3))
    val emb = Tables(spark, TestSpark.sf0, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byId = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    sc.foreach { case Row(qid: Long, _, cid: Long, score: Double) =>
      val full = byId(qid).zip(byId(cid)).map { case (a, b) => a * b }.sum
      assert(score >= full - 1e-4,
        s"MaxSim $score below full dot $full for ($qid,$cid)")
    }
  }
}
