package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) encoding for two-dimensional file clustering, plus the
  * EXACT interval-vs-box intersection test that turns a single per-file
  * `(min z, max z)` stat into honest TWO-column file skipping.
  *
  * Why this shape: [[TxLog]] records one `(lo, hi)` long interval per data
  * file. Storing the Z-VALUE interval of a file clustered by interleaved
  * `(x, y)` bits makes that single slot carry both dimensions at once — a
  * scan for `x ∈ [xlo, xhi] ∧ y ∈ [ylo, yhi]` prunes every file whose
  * z-interval provably contains NO point of the query box. The test is
  * exact (quadtree descent, no false prunes by construction and no false
  * keeps), so pruning quality degrades only with clustering quality, never
  * correctness. This is the OPTIMIZE ZORDER BY half of the Delta/Iceberg
  * maintenance pair; the reference's fixed per-job output formats
  * (`core/src/main/java/org/apache/hama/bsp/FileOutputFormat.java`) have no
  * multi-dimensional layout story, so this is engine extension surface.
  *
  * Conventions: `x` occupies the EVEN bit positions (bit `2i` of z is bit
  * `i` of x), `y` the odd ones. Both coordinates must be in
  * `[0, 2^bits)` with `bits <= 31` (z then fits in 62 bits of a Long).
  */
object Zorder {

  /** Driver-side Morton interleave of two non-negative coords. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    require(x >= 0 && x < (1L << bits) && y >= 0 && y < (1L << bits),
      s"coords out of range for $bits bits: ($x, $y)")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse of [[interleave]]: z → (x, y). */
  def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Column form of [[interleave]] — a fold of shift/mask terms that stays
    * inside whole-stage codegen (no UDF). Inputs are cast to long; the
    * caller guarantees the `[0, 2^bits)` domain (out-of-range high bits
    * are silently dropped by the masks, same as the driver form's
    * require would reject). */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** EXACT test: does the z-interval `[zlo, zhi]` contain the z-value of
    * at least one point of the box `[xlo, xhi] × [ylo, yhi]`? Quadtree
    * descent over the bit prefix: a node is a 2^l × 2^l square whose
    * z-codes form one contiguous range, so a node fully inside the
    * interval (and touching the box) or fully inside the box (and
    * touching the interval) answers immediately; only nodes straddling
    * BOTH boundaries recurse, which keeps the visited set to O(bits) per
    * boundary crossing. A defensive node budget falls back to `true`
    * (keep the file — pruning is an optimization, never a correctness
    * filter), though the early-exits make the budget unreachable for
    * bits <= 31. */
  def intervalIntersectsBox(zlo: Long, zhi: Long,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long, bits: Int): Boolean = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    if (zlo > zhi || xlo > xhi || ylo > yhi) return false
    var visited = 0
    val budget = 64 * bits
    def rec(zp: Long, x0: Long, y0: Long, level: Int): Boolean = {
      visited += 1
      if (visited > budget) return true // safe fallback: keep
      val zEnd = zp + (1L << (2 * level)) - 1
      if (zEnd < zlo || zp > zhi) return false
      val side = 1L << level
      val x1 = x0 + side - 1; val y1 = y0 + side - 1
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi) return false
      // node's z-range inside the interval and its square touches the box
      if (zp >= zlo && zEnd <= zhi) return true
      // node's square inside the box and its z-range touches the interval
      if (x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi) return true
      if (level == 0) return true // single point passing both overlap tests
      val l = level - 1
      val h = 1L << l
      val q = 1L << (2 * l)
      // children in ascending z: (x+0,y+0), (x+h,y+0), (x+0,y+h), (x+h,y+h)
      rec(zp, x0, y0, l) || rec(zp + q, x0 + h, y0, l) ||
        rec(zp + 2 * q, x0, y0 + h, l) || rec(zp + 3 * q, x0 + h, y0 + h, l)
    }
    rec(0L, 0L, 0L, bits)
  }
}
