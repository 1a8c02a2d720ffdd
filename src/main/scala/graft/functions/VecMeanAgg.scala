package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** running element-wise sum + count */
final case class VecMeanBuf(sum: Array[Double], n: Long)

/** Element-wise vector mean as a typed `Aggregator` — the one custom
  * aggregate SURVEY.md §7 budgets, for the d-dimensional k-means center
  * update (the reference sums `DenseDoubleVector`s per center in
  * `ml/src/main/java/org/apache/hama/ml/kmeans/KMeansBSP.java:130-224`
  * and divides by the member count). As a Spark `Aggregator` it
  * participates in partial aggregation: each task reduces its rows into
  * ONE (sum, n) buffer of O(d), so the per-center shuffle traffic is
  * buffers, not vectors — the map-side-combine posture that holds at any
  * corpus size. Mismatched/short input rows contribute only their prefix
  * (same tolerant contract as VecDot).
  */
final class VecMeanAgg(dim: Int)
    extends Aggregator[Seq[Double], VecMeanBuf, Seq[Double]] {
  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Seq[Double]): VecMeanBuf = {
    val s = b.sum
    var i = 0
    val n = math.min(dim, a.length)
    while (i < n) { s(i) += a(i); i += 1 }
    VecMeanBuf(s, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    val s = x.sum
    var i = 0
    while (i < dim) { s(i) += y.sum(i); i += 1 }
    VecMeanBuf(s, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0L) Vector.fill(dim)(0.0)
    else b.sum.iterator.map(_ / b.n).toVector

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

object VecMeanAgg {
  /** column form: `vecMean(dim)(col)` over an `array<double>` column */
  def vecMean(dim: Int): Column => Column = {
    val fn = udaf(new VecMeanAgg(dim), ExpressionEncoder[Seq[Double]]())
    c => fn(c)
  }
}
