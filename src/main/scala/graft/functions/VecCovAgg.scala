package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** gram upper-triangle + element sum + row count */
final case class VecCovBuf(gram: Array[Double], sum: Array[Double], n: Long)

/** Population covariance matrix of an `array<double>` column as ONE typed
  * `Aggregator` (the `VecMeanAgg` pattern, one level up): each task folds
  * its rows into a single O(d²/2) upper-triangle gram buffer, so the
  * shuffle moves merged buffers — never row vectors — and the driver
  * receives exactly one d×d matrix regardless of corpus size. That is the
  * posture that makes PCA viable at 100 TB: the only O(n) work is the
  * map-side fold. `finish` returns the row-major d² covariance
  * C[i][j] = E[x_i·x_j] − E[x_i]·E[x_j].
  *
  * Rows shorter than `dim` contribute only their prefix (the tolerant
  * contract shared with VecDot/VecMeanAgg).
  */
final class VecCovAgg(dim: Int)
    extends Aggregator[Seq[Double], VecCovBuf, Seq[Double]] {

  private val triLen = dim * (dim + 1) / 2

  override def zero: VecCovBuf =
    VecCovBuf(new Array[Double](triLen), new Array[Double](dim), 0L)

  override def reduce(b: VecCovBuf, a: Seq[Double]): VecCovBuf = {
    val x = a.toArray
    val n = math.min(dim, x.length)
    var i = 0
    var t = 0
    while (i < dim) {
      if (i < n) {
        b.sum(i) += x(i)
        var j = i
        while (j < n) { b.gram(t + j - i) += x(i) * x(j); j += 1 }
      }
      t += dim - i
      i += 1
    }
    VecCovBuf(b.gram, b.sum, b.n + 1)
  }

  override def merge(x: VecCovBuf, y: VecCovBuf): VecCovBuf = {
    var i = 0
    while (i < triLen) { x.gram(i) += y.gram(i); i += 1 }
    i = 0
    while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
    VecCovBuf(x.gram, x.sum, x.n + y.n)
  }

  override def finish(b: VecCovBuf): Seq[Double] = {
    val out = new Array[Double](dim * dim)
    if (b.n > 0L) {
      val n = b.n.toDouble
      var i = 0
      var t = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val c = b.gram(t + j - i) / n - (b.sum(i) / n) * (b.sum(j) / n)
          out(i * dim + j) = c
          out(j * dim + i) = c
          j += 1
        }
        t += dim - i
        i += 1
      }
    }
    out.toVector
  }

  override def bufferEncoder: Encoder[VecCovBuf] = Encoders.product[VecCovBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

object VecCovAgg {
  /** column form: `vecCov(dim)(col)` → row-major d² covariance array */
  def vecCov(dim: Int): Column => Column = {
    val fn = udaf(new VecCovAgg(dim), ExpressionEncoder[Seq[Double]]())
    c => fn(c)
  }
}
