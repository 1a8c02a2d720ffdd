package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** EXACT distinct count of dense non-negative integer ids as a fixed-size
  * bitmap `Aggregator` — the roaring-bitmap idea specialized to a declared
  * dense domain. Where HLL (`q_agg_hll_merge`) trades exactness for O(kB)
  * state, this keeps exactness with O(domain/8) state that is constant in
  * the ROW count: each task folds its rows into one word array, merges
  * OR the arrays, and the per-group shuffle traffic never grows with the
  * corpus — the right tool when ids are dense (order keys, user ids after
  * dictionary encoding) and the domain is known. Out-of-domain ids are
  * ignored (callers bound them with a modulus).
  */
final class BitsetDistinct(maxId: Long)
    extends Aggregator[Long, Array[Long], Long] {

  // a negative maxId would silently count 0 forever (the reduce guard
  // never admits an id); a domain past 2^36 overflows the word count /
  // allocates multi-GB buffers — both are config errors that must fail
  // loudly at construction (the bands() require convention, ADVICE r3)
  require(maxId >= 0L && maxId < (1L << 36),
    s"maxId must be in [0, 2^36): $maxId")

  private val words = ((maxId >> 6) + 1).toInt

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    if (a >= 0L && a <= maxId) b((a >> 6).toInt) |= 1L << (a & 63L)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitsetDistinct {
  /** column form: `bitmapDistinct(maxId)(col)` over a LONG id column */
  def bitmapDistinct(maxId: Long): Column => Column = {
    val fn = udaf(new BitsetDistinct(maxId), Encoders.scalaLong)
    c => fn(c)
  }
}
