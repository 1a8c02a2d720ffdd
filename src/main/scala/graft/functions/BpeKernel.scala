package graft.functions

/** Production-shape BPE ENCODER (VERDICT r11 #5): applies a ranked merge
  * table to one document's token sequence in a single in-memory priority
  * scan — O(tokens) per applied merge with O(1) hash lookups per
  * adjacent pair, so throughput is FLAT in the table size (a 30k-merge
  * production table costs the same per token as a 10-merge one), where
  * the column-algebra encoder (q_text_bpe_encode) pays one plan node per
  * merge.
  *
  * Semantics: the standard BPE encode loop — repeatedly find the
  * LOWEST-RANK table pair present among adjacent tokens and merge every
  * occurrence canonically greedily (left-to-right, non-overlapping,
  * resume after the merged token — BpeSemanticsSpec's pinned contract),
  * until no table pair applies. Merged tokens join with chr(30), so a
  * merged token can never re-match a table pair (table pairs come from
  * the base tokenization, whose tokens never contain chr(30)); since
  * merging also never creates a NEW adjacency of two plain tokens, each
  * table pair's occurrence set only shrinks as others apply — which
  * makes this priority loop EXACTLY equal to applying the merges
  * sequentially in rank order, the form the DuckDB oracle unrolls. */
object BpeKernel {
  val Join = "\u001e"
  private val D = "\u001f" // rank-key delimiter: never appears in a token

  /** A ranked merge table prepared for O(1) pair lookups — build ONCE
    * per partition from the broadcast pair list (rebuilding the hash map
    * per document would charge O(table) per doc and break the
    * flat-in-table-size property TextScale certifies). Index in `pairs`
    * IS the rank (lower = earlier-learned = higher priority); a
    * duplicated pair keeps its lowest rank. */
  final class Table(val pairs: Array[(String, String)]) {
    private[BpeKernel] val rank = {
      val m = new java.util.HashMap[String, Integer](pairs.length * 2)
      var i = pairs.length - 1
      while (i >= 0) { m.put(pairs(i)._1 + D + pairs(i)._2, i); i -= 1 }
      m
    }
  }

  def encode(tokens: Array[String], pairs: Array[(String, String)]): Array[String] =
    encode(tokens, new Table(pairs))

  /** encode one token sequence against a prepared merge table */
  def encode(tokens: Array[String], table: Table): Array[String] = {
    if (tokens.length < 2 || table.pairs.isEmpty) return tokens
    val rank = table.rank
    val pairs = table.pairs
    var cur = tokens
    var done = false
    while (!done && cur.length >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j < cur.length - 1) {
        val r = rank.get(cur(j) + D + cur(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (t1, t2) = pairs(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](cur.length)
        var p = 0
        while (p < cur.length) {
          if (p + 1 < cur.length && cur(p) == t1 && cur(p + 1) == t2) {
            out += t1 + Join + t2; p += 2
          } else { out += cur(p); p += 1 }
        }
        cur = out.toArray
      }
    }
    cur
  }
}
