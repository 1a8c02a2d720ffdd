package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantees for the similarity operators: the near-dup pair
  * join must be blocked on (label, LSH bucket) — a single-key all-pairs
  * self-join is quadratic in the hottest label block at scale. */
class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q_sim_neardup joins on (label, bucket), not label alone") {
    val df = SparkEntry.queries("q_sim_neardup")(spark, TestSpark.sf0)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected a join in the near-dup plan")
    val pairJoin = joins.filter(_.condition.exists(_.references.exists(
      _.name.startsWith("vec_id"))))
    assert(pairJoin.nonEmpty, "expected the vec_id-pair join")
    pairJoin.foreach { j =>
      val cond = j.condition.get.toString
      assert(cond.contains("label"), s"pair join lost the label key: $cond")
      assert(cond.contains("bucket"), s"pair join lost the bucket key: $cond")
    }
  }

  test("q_sim_neardup block sizes are bounded below the label-only blocks") {
    import org.apache.spark.sql.functions._
    val el = Tables(spark, TestSpark.sf0, "embeddings")
    val labelOnly = el.groupBy("label").count().agg(max("count")).head.getLong(0)
    // recompute blocking cardinality the query uses: (label, bucket)
    val withBucket = SparkEntry.queries("q_sim_lsh_bucket")(spark, TestSpark.sf0)
      .join(el.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("label", "bucket").count().agg(max("count")).head.getLong(0)
    assert(withBucket <= labelOnly)
  }
}
