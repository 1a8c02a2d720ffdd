package graft

import graft.operators.ML
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecKmeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("VecMeanAgg: element-wise mean survives the partition-merge path") {
    val mean = graft.functions.VecMeanAgg.vecMean(3)
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0)), (0L, Seq(3.0, 2.0, 1.0)),
      (0L, Seq(2.0, 2.0, 2.0)), (1L, Seq(10.0, 0.0, 0.0)))
      .toDF("c", "v").repartition(4) // force non-trivial merge()
    val got = df.groupBy("c").agg(mean(col("v")).as("m"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(0L) === Seq(2.0, 2.0, 2.0))
    assert(got(1L) === Seq(10.0, 0.0, 0.0))
  }

  test("pluggable measure: cosine clusters by direction where Euclidean cannot") {
    // p is large along x, q is small along y; with a small x-seed and a
    // large y-seed, Euclidean lumps both onto the near seed while cosine
    // separates them by angle — CosineDistance.java:22-56's reason to exist
    val emb = Seq((10L, Seq(3.0, 1.0)), (11L, Seq(0.1, 0.3)))
      .toDF("vec_id", "v")
    val seeds = Seq((0L, Seq(1.0, 0.0): Seq[Double]), (1L, Seq(0.0, 4.0): Seq[Double]))

    val eu = ML.assignVec(emb, seeds, ML.Euclidean)
      .select("vec_id", "c").as[(Long, Long)].collect().toMap
    assert(eu === Map(10L -> 0L, 11L -> 0L))

    val cos = ML.assignVec(emb, seeds, ML.Cosine)
      .select("vec_id", "c").as[(Long, Long)].collect().toMap
    assert(cos === Map(10L -> 0L, 11L -> 1L))
  }

  test("cosine Lloyd iteration on the embeddings corpus converges to stable cells") {
    val emb = spark.read.parquet(s"${TestSpark.sf0}/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val seeds = emb.filter(col("vec_id") < 3).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    val (assign, cen) = ML.vectorKmeans(emb, seeds, iters = 2, ML.Cosine)
    val sizes = assign.groupBy("c").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.sum === emb.count())
    assert(cen.forall(_._2.length === seeds.head._2.length))
    // every final centroid is the (rounded) mean of its members
    val mean = graft.functions.VecMeanAgg.vecMean(seeds.head._2.length)
    val recomputed = assign.groupBy("c")
      .agg(mean(col("v")).as("cv"))
      .select(col("c"), transform(col("cv"), x => round(x, 4)).as("cv"))
      .as[(Long, Seq[Double])].collect().toMap
    cen.foreach { case (c, cv) => assert(recomputed(c) === cv) }
  }
}
