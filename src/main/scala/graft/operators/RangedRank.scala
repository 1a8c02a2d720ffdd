package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-partitioned decomposition of ordered-window primitives
  * (`row_number`, running SUM) so that NO task ever holds an entire
  * group — the scale fix for the "huge single group" window, where
  * `Window.partitionBy(g).orderBy(x)` serializes a whole group (or, with
  * no partition spec, the whole relation) through one task.
  *
  * The decomposition (the sequence-packing offset pattern,
  * `TextAnalysis.q_text_pack`):
  *
  *   1. `repartitionByRange(shards, group ++ order)` +
  *      `sortWithinPartitions` — each shard holds a contiguous slice of
  *      the global (group, order) sort, so within a group every row of
  *      shard k precedes every row of shard k+1;
  *   2. shard-local running totals in ONE zero-shuffle `mapPartitions`
  *      pass over the already-sorted partitions (accumulators reset at
  *      group boundaries) — a linear scan, no second full shuffle and no
  *      group-sized window partition anywhere;
  *   3. an O(groups × shards) per-shard subtotal relation, prefix-summed
  *      over the shard axis (per-group O(shards) window rows) and
  *      broadcast-joined back as each shard's starting offset.
  *
  * The sharded relation is `localCheckpoint`ed before fan-out:
  * `spark_partition_id()` is nondeterministic across plan re-evaluations
  * (two independent range exchanges may sample different bounds), so the
  * local pass and the subtotal branch MUST read the same materialized
  * blocks — the checkpoint freezes the shard assignment. At lake scale
  * that materialization is the same order of IO as the range shuffle
  * itself; it is the price of a consistent diamond over a
  * nondeterministic node (RangedRankSpec pins the mutual consistency).
  *
  * Determinism contract: `orderCols` must be a within-group unique key
  * (every declared consumer adds a primary-key tiebreaker) — the same
  * requirement any reproducible `row_number` already has. Input total
  * columns must be non-null (running SUM treats null as 0, unlike the
  * SQL window which skips them).
  *
  * Reference scale posture: Hama partitions BSP peers and streams each
  * partition's records in sorted runs rather than per-key monoliths
  * (`core/src/main/java/org/apache/hama/bsp/PartitioningRunner.java:66-214`);
  * this operator is the Spark-native equivalent for ordered prefix
  * aggregates.
  */
object RangedRank {

  /** Append running-SUM columns (cumulative, inclusive of the current
    * row, ordered by `orderCols` within each `groupCols` group) without
    * ever materializing a group in one task.
    *
    * @param totals  (input numeric column, output column name) pairs;
    *                each output is `SUM(input) OVER (PARTITION BY group
    *                ORDER BY order ROWS UNBOUNDED PRECEDING)`. Integral
    *                inputs accumulate as long, fractional as double.
    * @param shards  range-shard count; defaults to the session's
    *                `spark.sql.shuffle.partitions`.
    * @param maxBroadcastOffsets  the offsets relation is O(groups ×
    *                shards); up to this many rows it is broadcast-joined
    *                back (the declared consumers have groups ≤ corpus/5,
    *                well inside), above it the join falls back to a
    *                regular shuffle join so high-cardinality groups
    *                cannot OOM the driver/executors on the broadcast
    *                (RangedRankSpec exercises the fallback path).
    *
    * Fractional totals: sharded accumulation (per-shard partial sums +
    * prefix offsets + local scan) associates double additions differently
    * from a strictly sequential window, so fractional results may differ
    * from the single-task window by ulp-level error (integral totals are
    * exact). RangedRankPropertySpec pins both: exact equality for longs,
    * 1e-9-relative agreement for doubles. Consumers that ROUND a
    * fractional cumulative (q_events_cusum rounds at 4) accept the
    * boundary risk knowingly; at round-scale 1e-4 vs error 1e-12 a
    * boundary hit needs a value within 1e-12 of a .00005 edge.
    */
  def withRunningTotals(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], totals: Seq[(String, String)],
      shards: Option[Int] = None,
      maxBroadcastOffsets: Long = 4000000L): DataFrame = {
    require(totals.nonEmpty, "at least one running total required")
    val session = df.sparkSession
    val n = shards.getOrElse(session.sessionState.conf.numShufflePartitions)
    val rangeKeys = (groupCols ++ orderCols).map(col)
    val sharded = df.repartitionByRange(n, rangeKeys: _*)
      .sortWithinPartitions(rangeKeys: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint()

    val baseSchema = sharded.schema
    val inIdx = totals.map { case (in, _) => baseSchema.fieldIndex(in) }.toArray
    val isFloat = totals.map { case (in, _) =>
      baseSchema(baseSchema.fieldIndex(in)).dataType match {
        case DoubleType | FloatType => true
        case ByteType | ShortType | IntegerType | LongType => false
        case dt => throw new IllegalArgumentException(
          s"running total over unsupported type $dt")
      }
    }.toArray
    val gIdx = groupCols.map(baseSchema.fieldIndex).toArray
    val outSchema = StructType(baseSchema.fields ++
      totals.zip(isFloat.toSeq).map { case ((_, out), f) =>
        StructField(out, if (f) DoubleType else LongType, nullable = false)
      })
    val k = totals.size
    val width = baseSchema.length

    // stage 2: shard-local running totals — a single sorted linear scan,
    // manual array row-building (no per-row Seq concat allocations)
    val local = sharded.mapPartitions { rows =>
      val accL = new Array[Long](k)
      val accD = new Array[Double](k)
      var cur: Array[Any] = null
      rows.map { r =>
        var boundary = cur == null
        var j = 0
        while (!boundary && j < gIdx.length) {
          if (r.get(gIdx(j)) != cur(j)) boundary = true
          j += 1
        }
        if (boundary) {
          cur = Array.tabulate[Any](gIdx.length)(j => r.get(gIdx(j)))
          java.util.Arrays.fill(accL, 0L); java.util.Arrays.fill(accD, 0.0)
        }
        val out = new Array[Any](width + k)
        var c = 0
        while (c < width) { out(c) = r.get(c); c += 1 }
        var i = 0
        while (i < k) {
          val v = r.get(inIdx(i))
          if (isFloat(i)) {
            if (v != null) accD(i) += v.asInstanceOf[Number].doubleValue()
            out(width + i) = accD(i)
          } else {
            if (v != null) accL(i) += v.asInstanceOf[Number].longValue()
            out(width + i) = accL(i)
          }
          i += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    // stage 3: per-shard subtotals → exclusive prefix over the shard
    // axis → broadcast back as each shard's starting offset
    val shardKey = groupCols :+ "__shard"
    val sums = totals.map { case (in, out) => sum(col(in)).as(s"__t_$out") }
    // materialized: counted for the broadcast guard, then re-read by the
    // offsets window — one execution of the aggregate either way
    val subtotals = sharded.groupBy(shardKey.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .localCheckpoint()
    val nOffsets = subtotals.count()
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.foldLeft(subtotals) { case (acc, (_, out)) =>
      acc.withColumn(s"__off_$out",
        coalesce(sum(col(s"__t_$out")).over(wOff), lit(0)))
    }.select(shardKey.map(col) ++
      totals.map { case (_, out) => col(s"__off_$out") }: _*)

    // fallback is an UNHINTED join: at guard-tripping cardinality the
    // safe plan is whatever AQE picks from real sizes (usually sort-merge,
    // which spills; a forced hash build would just move the OOM)
    val joined =
      if (nOffsets <= maxBroadcastOffsets) local.join(broadcast(offsets), shardKey)
      else local.join(offsets, shardKey)
    totals.foldLeft(joined) { case (acc, (_, out)) =>
      acc.withColumn(out, col(out) + col(s"__off_$out")).drop(s"__off_$out")
    }.drop("__shard")
  }

  /** `ROW_NUMBER() OVER (PARTITION BY groupCols ORDER BY orderCols)` as
    * a range-sharded plan — rank is the running count of rows. */
  def withRank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      rankCol: String, shards: Option[Int] = None): DataFrame =
    withRunningTotals(df.withColumn("__one", lit(1L)), groupCols, orderCols,
      Seq("__one" -> rankCol), shards).drop("__one")
}
