package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Batch MERGE INTO over a [[TxLog]] table with BUCKET-FILE PRUNING —
  * the piece that makes a serving-table merge viable at 100 TB: the
  * table's data files are hash-bucketed by key (`b<k>-v<version>-*`),
  * and a merge rewrites ONLY the buckets that contain a changed key,
  * committing `{adds: new bucket files, removes: superseded bucket
  * files}`. Untouched buckets keep their exact files across versions —
  * a merge touching 1% of keys rewrites ~1% of the table, not all of
  * it. Snapshot isolation, time travel and conflict detection come
  * from the TxLog protocol unchanged.
  *
  * (The streaming `runMergeTotals` full-rewrite is the degenerate
  * K=1 case; this is the shape a real lakehouse MERGE takes.)
  */
object MergeTable {

  /** Initial load: write one parquet file per key bucket, commit v0.
    * All non-empty buckets land in ONE partitionBy job; only buckets
    * with no rows fall back to a per-bucket empty-file write (they need
    * a schema-bearing file for lookup(), and partitionBy creates no dir
    * for absent values). Returns the committed version. */
  def load(spark: SparkSession, table: String, df: DataFrame,
      keyCol: String, buckets: Int): Long = {
    Files.createDirectories(Paths.get(table))
    val written = writeBuckets(spark, table, df, keyCol, buckets,
      (0 until buckets).toSeq, version = 0L)
    val adds = (0 until buckets).map { k =>
      written.getOrElse(k,
        writeBucket(spark, table, df.filter(pmod(col(keyCol), lit(buckets)) === k),
          k, version = 0L))
    }
    TxLog.commit(table, adds, Seq.empty, expectedCurrent = -1L)
      .getOrElse(sys.error(s"initial load conflict on $table"))
  }

  /** MERGE INTO (key-replacement upsert): rows of `updates` replace
    * same-key rows, new keys insert. Only buckets containing an updated
    * key are rewritten. Returns (committed version, rewritten buckets).
    * `primitive` is the storage commit seam (TxLogSpec's concurrent
    * merge test injects a racing one to force the retry path). Every
    * `checkpointEvery` commits a log CHECKPOINT is written so reader
    * replay stays O(commits since checkpoint) over the table's life —
    * 0 disables. */
  def mergeInto(spark: SparkSession, table: String, updates: DataFrame,
      keyCol: String, buckets: Int,
      primitive: CommitPrimitive = TxLog.LocalFs,
      checkpointEvery: Int = 10): (Long, Seq[Int]) = {
    var result: Option[(Long, Seq[Int])] = None
    while (result.isEmpty) {
      val snap = TxLog.snapshot(table)
      val byBucket = snap.files.groupBy(bucketOfFile)
      val touched = updates
        .select(pmod(col(keyCol), lit(buckets)).cast("int").as("__b"))
        .distinct().collect().map(_.getInt(0)).sorted.toSeq
      val next = snap.version + 1
      // ONE read of every touched bucket's files + ONE partitionBy write
      // for every touched bucket — job count per merge is O(1), not
      // O(touched buckets) (the per-bucket write loop measured 48 s for
      // the 3-batch streaming gate row at sf0.1; this shape runs it in
      // one pass). Buckets are key-disjoint, so the global anti-join is
      // exactly the per-bucket key replacement.
      val oldFiles = touched.flatMap(k => byBucket.getOrElse(k, Seq.empty))
      val old =
        if (oldFiles.nonEmpty)
          spark.read.option("mergeSchema", "true")
            .parquet(oldFiles.map(f => s"$table/$f"): _*)
        else updates.limit(0)
      // allowMissingColumns = schema evolution: an update batch may
      // carry NEW columns (old rows null-fill) or omit columns the
      // table already has — the additive-evolution contract a serving
      // table needs across application versions
      val merged = old.join(updates.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(updates, allowMissingColumns = true)
      val written = writeBuckets(spark, table, merged, keyCol, buckets, touched, next)
      val adds = touched.map(k => written.getOrElse(k,
        writeBucket(spark, table,
          merged.filter(pmod(col(keyCol), lit(buckets)) === k), k, next)))
      val removes = touched.flatMap(k => byBucket.getOrElse(k, Seq.empty))
      TxLog.commit(table, adds, removes, expectedCurrent = snap.version,
          primitive = primitive) match {
        case Some(v) =>
          if (checkpointEvery > 0 && v > 0 && v % checkpointEvery == 0)
            TxLog.writeCheckpoint(table, primitive): Unit
          result = Some((v, touched))
        case None => // lost the race: orphan our files, re-read, retry
          adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
      }
    }
    result.get
  }

  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame =
    Streams.readMergeTable(spark, table, asOf)

  /** Row-level DELETE (the third lakehouse verb beside mergeInto's
    * upsert and append's blind insert): drop every row whose key is in
    * `keys`, rewriting ONLY the buckets that contain one — a delete of
    * 1% of keys rewrites ~1% of the table. Same optimistic-concurrency
    * retry as mergeInto; the change data feed classifies the dropped
    * rows as `delete` from the file diff alone. Returns (version,
    * rewritten buckets). */
  def deleteKeys(spark: SparkSession, table: String, keys: DataFrame,
      keyCol: String, buckets: Int,
      primitive: CommitPrimitive = TxLog.LocalFs): (Long, Seq[Int]) = {
    var result: Option[(Long, Seq[Int])] = None
    while (result.isEmpty) {
      val snap = TxLog.snapshot(table)
      val byBucket = snap.files.groupBy(bucketOfFile)
      val touched = keys
        .select(pmod(col(keyCol), lit(buckets)).cast("int").as("__b"))
        .distinct().collect().map(_.getInt(0)).sorted.toSeq
        .filter(byBucket.contains) // a key in an empty bucket deletes nothing
      if (touched.isEmpty) return (snap.version, Seq.empty)
      val oldFiles = touched.flatMap(byBucket)
      val old = spark.read.option("mergeSchema", "true")
        .parquet(oldFiles.map(f => s"$table/$f"): _*)
      val remaining = old.join(keys.select(keyCol), Seq(keyCol), "left_anti")
      val written = writeBuckets(spark, table, remaining, keyCol, buckets,
        touched, snap.version + 1)
      val adds = touched.map(k => written.getOrElse(k,
        // bucket fully emptied by the delete: it still needs one
        // schema-bearing file for lookup()
        writeBucket(spark, table,
          remaining.filter(pmod(col(keyCol), lit(buckets)) === k),
          k, snap.version + 1)))
      TxLog.commit(table, adds, oldFiles, expectedCurrent = snap.version,
          primitive = primitive) match {
        case Some(v) => result = Some((v, touched))
        case None => adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
      }
    }
    result.get
  }

  /** CHANGE DATA FEED between two committed versions (the Delta CDF
    * read path): row-level changes derived from the log's file-level
    * diff, so only files ADDED or REMOVED between the versions are ever
    * opened — untouched buckets contribute nothing, and a pure-metadata
    * rewrite (compaction) yields an EMPTY feed because its rewritten
    * rows cancel in the content diff. Emits the table's columns plus
    * `_change`:
    *   - `insert`  — key absent at `fromV`, present at `toV` (post-image)
    *   - `update`  — key present in both with a different row (post-image)
    *   - `delete`  — key present at `fromV`, absent at `toV` (pre-image)
    * Both versions must share a schema (columns are aligned by name;
    * a diverged schema fails loudly rather than null-filling a diff). */
  def changes(spark: SparkSession, table: String, keyCol: String,
      fromV: Long, toV: Long): DataFrame = {
    val sa = TxLog.snapshot(table, Some(fromV))
    val sb = TxLog.snapshot(table, Some(toV))
    val removed = (sa.files.toSet -- sb.files.toSet).toSeq.sorted
    val added = (sb.files.toSet -- sa.files.toSet).toSeq.sorted
    val empty = Streams.readMergeTable(spark, table, Some(toV)).limit(0)
    def rd(fs: Seq[String]): DataFrame =
      if (fs.isEmpty) empty
      else spark.read.option("mergeSchema", "true")
        .parquet(fs.map(f => s"$table/$f"): _*)
    val cols = rd(added).columns.sorted
    val old = rd(removed).select(cols.map(col): _*)
    val neu = rd(added).select(cols.map(col): _*)
    val oldKeys = old.select(col(keyCol)).distinct()
    val newKeys = neu.select(col(keyCol)).distinct()
    val post = neu.exceptAll(old) // inserts + update post-images
    val pre = old.exceptAll(neu)  // deletes + update pre-images
    val inserts = post.join(oldKeys, Seq(keyCol), "left_anti")
      .withColumn("_change", lit("insert"))
    val updates = post.join(oldKeys, Seq(keyCol), "left_semi")
      .withColumn("_change", lit("update"))
    val deletes = pre.join(newKeys, Seq(keyCol), "left_anti")
      .withColumn("_change", lit("delete"))
    inserts.unionAll(updates).unionAll(deletes)
  }

  /** CDC consumer cursor: every change committed AFTER `sinceVersion`,
    * plus the new cursor to store for the next poll — the poll-based
    * consumption loop a downstream sync job runs against the feed. */
  def changesSince(spark: SparkSession, table: String, keyCol: String,
      sinceVersion: Long): (DataFrame, Long) = {
    val cur = TxLog.snapshot(table).version
    (changes(spark, table, keyCol, sinceVersion, cur), cur)
  }

  /** Blind APPEND ingest (no key replacement — the fact-table path
    * beside mergeInto's upsert): stage one file per non-empty touched
    * bucket, commit adds-only. Each batch leaves one small file per
    * touched bucket in the live snapshot, which is exactly the
    * small-files debt [[compact]] exists to fold — the standard
    * append-then-OPTIMIZE lakehouse ingest pair. */
  def append(spark: SparkSession, table: String, rows: DataFrame,
      keyCol: String, buckets: Int,
      primitive: CommitPrimitive = TxLog.LocalFs,
      statsCols: Seq[String] = Seq.empty): Long =
    appendStaged(spark, table, rows, keyCol, buckets, primitive,
      batchMeta(rows, keyCol, buckets, statsCols, bloomCol = None)._1)

  /** ONE metadata pass per ingest batch (optimization r15, VERDICT r14
    * #6): per-bucket column stats and — for bloom appends — sidecar bit
    * positions come from a SINGLE groupBy job over the batch, where the
    * old shape scanned the batch once per concern (stats aggregate,
    * bloom-bit aggregate, touched-bucket distinct). The touched-bucket
    * set is no longer collected at all: [[writeBuckets]] discovers it
    * from the staged partition directories its own (mandatory) write
    * produced. Determinism contract unchanged: `rows` is scanned once
    * here and once by the write, so it must be deterministic across
    * re-evaluation — the same contract every writer here already places
    * on its input (a batch that changed between scans could record
    * stats, or a bloom filter, that miss a written value).
    *
    * Stats semantics are identical to the old two-pass shape: when a
    * bloom column is present the batch is exploded ×k (one row per
    * bloom probe position) BEFORE the aggregate, which leaves min/max
    * untouched (duplication never moves an extremum) and feeds
    * collect_set exactly the per-bucket position multiset it deduped
    * before. try_cast, not cast: under ANSI a malformed value must mean
    * "no interval for this column" (always read), never a failed
    * ingest; a column whose long-cast produced only nulls records NO
    * interval — the file is then always read, never wrongly pruned. */
  private def batchMeta(rows: DataFrame, keyCol: String, buckets: Int,
      statsCols: Seq[String], bloomCol: Option[String])
      : (Map[Int, Map[String, (Long, Long)]], Map[Int, Seq[Int]]) = {
    if (statsCols.isEmpty && bloomCol.isEmpty) return (Map.empty, Map.empty)
    val withB = rows.withColumn("__b",
      pmod(col(keyCol), lit(buckets)).cast("int"))
    val exploded = bloomCol match {
      case Some(bc) =>
        withB.withColumn("__p", explode(array(bloomPosCols(col(bc)): _*)))
      case None => withB
    }
    val statAggs = statsCols.flatMap(c => Seq(
      min(expr(s"try_cast(`$c` AS BIGINT)")).as(s"lo_$c"),
      max(expr(s"try_cast(`$c` AS BIGINT)")).as(s"hi_$c")))
    val aggs =
      bloomCol.map(_ => collect_set(col("__p")).as("__ps")).toSeq ++ statAggs
    val collected = exploded.groupBy("__b").agg(aggs.head, aggs.tail: _*).collect()
    val statsAt = if (bloomCol.isDefined) 2 else 1 // first stats column index
    val stats = collected.map { r =>
      r.getInt(0) -> statsCols.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(statsAt + 2 * i) || r.isNullAt(statsAt + 2 * i + 1)) None
        else Some(c -> (r.getLong(statsAt + 2 * i), r.getLong(statsAt + 2 * i + 1)))
      }.toMap
    }.toMap
    val bits =
      if (bloomCol.isEmpty) Map.empty[Int, Seq[Int]]
      else collected.map(r => r.getInt(0) -> r.getSeq[Int](1).toSeq).toMap
    (stats, bits)
  }

  /** The append commit loop shared by [[append]] and
    * [[appendWithBloom]]: stage one file per non-empty touched bucket
    * (the touched set falls out of the staged write itself), commit
    * adds-only with the precomputed per-bucket stats attached to this
    * attempt's files. */
  private def appendStaged(spark: SparkSession, table: String,
      rows: DataFrame, keyCol: String, buckets: Int,
      primitive: CommitPrimitive,
      bucketStats: Map[Int, Map[String, (Long, Long)]]): Long = {
    var result: Option[Long] = None
    while (result.isEmpty) {
      val snap = TxLog.snapshot(table)
      val next = snap.version + 1
      val written =
        writeBuckets(spark, table, rows, keyCol, buckets, next)
      val adds = written.keys.toSeq.sorted.map(written)
      val stats = adds.flatMap(f =>
        bucketStats.get(bucketOfFile(f)).map(f -> _)).toMap
      TxLog.commit(table, adds, Seq.empty, expectedCurrent = snap.version,
          primitive = primitive, stats = stats) match {
        case Some(v) => result = Some(v)
        case None => adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
      }
    }
    result.get
  }

  // ---- per-file BLOOM sidecars: point-lookup skipping on a NON-key
  // column (the Delta bloom-filter-index analogue). The filter is an
  // m-bit / k-hash bloom whose position i for a value is
  // floorMod(xxhash64(value, i), m) — computed with the NATIVE
  // codegen'd xxhash64 on both the build and probe sides, so no hash
  // is reimplemented anywhere. Sidecars are `<datafile>.bloom`, written
  // ATOMICALLY (staged + ATOMIC_MOVE — a direct write could expose a
  // zero-length or truncated prefix whose unset bits read as "absent",
  // a silent FALSE NEGATIVE, ADVICE r8) right after the commit that
  // references the data file: a reader that races the sidecar (or a
  // crash that orphans one) just reads the file unskipped — absence of
  // a sidecar is always safe. The sidecar RECORDS WHICH COLUMN it
  // indexes ([len][colName][bits]); a probe on any other column, or a
  // sidecar whose length doesn't parse, is treated as absent — so
  // mixed-column appends can never skip a file against the wrong
  // filter. Vacuum sweeps sidecars whose data file is gone. One
  // sidecar is m/8 bytes + a few name bytes (≈512 B at the default
  // 4096 bits); a point scan reads O(live files) sidecars on the
  // driver — the same metadata-scale cost as the stats map. False
  // positives cost a wasted file read; false negatives are impossible
  // (BloomSkipSpec pins the contract).
  private[streaming] val bloomBits = 4096
  private[streaming] val bloomHashes = 5

  private def bloomPosCols(value: Column): Seq[Column] =
    (0 until bloomHashes).map(i =>
      pmod(xxhash64(value, lit(i)), lit(bloomBits.toLong)).cast("int"))

  /** Stage + ATOMIC_MOVE a sidecar `[nameLen u8][colName utf8][bits]`
    * into place — readers never observe a partial file. */
  private def writeSidecar(table: String, dataFile: String,
      bloomCol: String, bits: Array[Byte]): Unit = {
    val nb = bloomCol.getBytes("UTF-8")
    require(nb.length <= 255, s"bloom column name too long: $bloomCol")
    val payload = Array(nb.length.toByte) ++ nb ++ bits
    val tmp = Files.createTempFile(Paths.get(table), ".tmp-bloom-", "")
    Files.write(tmp, payload)
    Files.move(tmp, Paths.get(table, dataFile + ".bloom"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Parse a sidecar → (column, bit array); None when the sidecar is
    * missing, truncated, or malformed — the caller must then read the
    * data file unskipped (absence is always safe). */
  private def readSidecar(table: String, dataFile: String): Option[(String, Array[Byte])] = {
    val p = Paths.get(table, dataFile + ".bloom")
    if (!Files.exists(p)) return None
    val raw = Files.readAllBytes(p)
    if (raw.length < 1) return None
    val n = raw(0) & 0xff
    if (raw.length != 1 + n + bloomBits / 8) return None
    Some((new String(raw, 1, n, "UTF-8"), raw.drop(1 + n)))
  }

  /** Append with an additional BLOOM sidecar per written file over
    * `bloomCol`. Same commit semantics as [[append]]; `statsCol` still
    * supported. The per-bucket bit sets are computed DISTRIBUTED inside
    * [[batchMeta]]'s single metadata pass (explode bounded by bloomBits
    * per bucket, never by rows) — only the <= m set positions per
    * bucket reach the driver. `rows` must be deterministic across
    * re-evaluation (it is scanned once for the combined stats+bloom
    * metadata and once by the write, the same contract every writer
    * here places on its input): a batch that changes between scans
    * could write a filter missing a value, silently voiding the
    * no-false-negative guarantee. */
  def appendWithBloom(spark: SparkSession, table: String, rows: DataFrame,
      keyCol: String, buckets: Int, bloomCol: String,
      primitive: CommitPrimitive = TxLog.LocalFs,
      statsCols: Seq[String] = Seq.empty): Long = {
    // stats + bloom bits in ONE batch scan ([[batchMeta]]) — the old
    // shape paid three metadata jobs per streaming append (bloom,
    // stats, touched-buckets), a fixed per-micro-batch tax
    val (bucketStats, bits) =
      batchMeta(rows, keyCol, buckets, statsCols, Some(bloomCol))
    val v = appendStaged(spark, table, rows, keyCol, buckets, primitive,
      bucketStats)
    // sidecars for the files THIS commit added (their names carry v)
    TxLog.snapshot(table).files
      .filter(f => f.contains(s"-v$v-"))
      .foreach { f =>
        bits.get(bucketOfFile(f)).foreach { ps =>
          val arr = new Array[Byte](bloomBits / 8)
          ps.foreach(p => arr(p / 8) = (arr(p / 8) | (1 << (p % 8))).toByte)
          writeSidecar(table, f, bloomCol, arr)
        }
      }
    v
  }

  /** COMBINED metadata-pruned scan — the general Delta-shaped read
    * path the single-predicate scans wrap: a file survives only if
    * EVERY stated range predicate's recorded interval FOR THAT COLUMN
    * intersects its `[lo, hi]`, AND (when a bloom point probe is
    * given) its sidecar — if present, valid, and indexing the probed
    * column — has all k probe bits set. Any missing/foreign/mangled
    * metadata keeps the file: pruning is an optimization, never a
    * correctness filter, and every real predicate is still applied to
    * the surviving rows. Multi-predicate pruning composes because each
    * interval is keyed by its column — intervals recorded by different
    * appends (or by Z-ORDER) can never be read against the wrong
    * predicate. */
  def scanWhere(spark: SparkSession, table: String,
      ranges: Seq[(String, Long, Long)],
      point: Option[(String, Column)] = None,
      asOf: Option[Long] = None): DataFrame = {
    val snap = TxLog.snapshot(table, asOf)
    // the k probe positions, evaluated once driver-side through the
    // same native xxhash64 the build side used
    val ps = point.map { case (_, value) =>
      val row = spark.range(1)
        .select(bloomPosCols(value).zipWithIndex.map {
          case (c, i) => c.as(s"p$i") }: _*).head
      (0 until bloomHashes).map(row.getInt)
    }
    val keep = snap.files.filter { f =>
      val cols = snap.stats.getOrElse(f, Map.empty)
      val rangesOk = ranges.forall { case (c, lo, hi) =>
        cols.get(c) match {
          case Some((l, h)) => h >= lo && l <= hi
          case None => true // no interval for THIS column: must read
        }
      }
      val bloomOk = (point, ps) match {
        case (Some((bloomCol, _)), Some(probe)) =>
          readSidecar(table, f) match {
            case Some((c, arr)) if c == bloomCol =>
              probe.forall(p => (arr(p / 8) & (1 << (p % 8))) != 0)
            case _ => true // absent, malformed, or foreign-column sidecar
          }
        case _ => true
      }
      rangesOk && bloomOk
    }
    val base =
      if (keep.nonEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(keep.map(f => s"$table/$f"): _*)
      else // every file pruned: empty relation with the table's schema
        Streams.readMergeTable(spark, table, asOf).limit(0)
    val ranged = ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      // try_cast: a malformed value is NULL → excluded by the range
      // predicate, matching the stats side's no-interval degradation
      df.filter(expr(s"try_cast(`$c` AS BIGINT)").between(lo, hi))
    }
    point.fold(ranged) { case (c, v) => ranged.filter(col(c) === v) }
  }

  /** Point scan on the bloom column: opens only live files whose
    * sidecar might contain `value` (files without a valid same-column
    * sidecar are always read — skipping is an optimization, never a
    * correctness filter), then applies the real predicate. `value`
    * must be a literal-like Column. */
  def scanPoint(spark: SparkSession, table: String, bloomCol: String,
      value: Column, asOf: Option[Long] = None): DataFrame =
    scanWhere(spark, table, Seq.empty, Some((bloomCol, value)), asOf)

  /** Range scan with FILE SKIPPING: prunes live files whose recorded
    * (min, max) interval on `statsCol` misses [lo, hi] before the scan
    * opens anything — the Delta data-skipping read path for
    * time/sequence-partitioned ingest. Files without recorded stats
    * FOR THIS COLUMN (initial load, pre-stats appends, foreign-column
    * intervals) are always read. */
  def scanRange(spark: SparkSession, table: String, statsCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame =
    scanWhere(spark, table, Seq((statsCol, lo, hi)), None, asOf)

  /** OPTIMIZE / compaction (VERDICT r7 item 4): every bucket that has
    * accumulated >= `minFiles` live files is rewritten into ONE file,
    * and the rewrite commits `{adds: compacted files, removes: all
    * superseded parts}` atomically through the standard TxLog entry —
    * so the snapshot's CONTENT is identical across the compaction
    * commit (no rows added or removed), older versions still see the
    * small files (time travel is untouched), and [[TxLog.vacuum]]
    * reclaims the superseded parts once they age out. This is the
    * maintenance half a bucket-pruned MERGE needs: long-running merge
    * sinks accrue one small file per touched-bucket version; Delta/
    * Iceberg pair MERGE with OPTIMIZE for exactly this reason. Loses
    * races like mergeInto does — a concurrent merge's commit wins the
    * version and compaction retries against the fresh snapshot
    * (MergeTableSpec's concurrent compaction-vs-merge case).
    *
    * Returns Some(committed version, compacted buckets), or None when
    * no bucket met the threshold. */
  def compact(spark: SparkSession, table: String, keyCol: String,
      buckets: Int, minFiles: Int = 2,
      primitive: CommitPrimitive = TxLog.LocalFs): Option[(Long, Seq[Int])] = {
    var result: Option[Option[(Long, Seq[Int])]] = None
    while (result.isEmpty) {
      val snap = TxLog.snapshot(table)
      val byBucket = snap.files.groupBy(bucketOfFile)
      val todo = byBucket.filter(_._2.size >= minFiles).keys.toSeq.sorted
      if (todo.isEmpty) result = Some(None)
      else {
        val next = snap.version + 1
        val oldFiles = todo.flatMap(byBucket)
        val df = spark.read.option("mergeSchema", "true")
          .parquet(oldFiles.map(f => s"$table/$f"): _*)
        val written = writeBuckets(spark, table, df, keyCol, buckets, todo, next)
        val adds = todo.map(k => written.getOrElse(k,
          // bucket whose live files hold zero rows: partitionBy made no
          // dir; it still needs one schema-bearing file for lookup()
          writeBucket(spark, table,
            df.filter(pmod(col(keyCol), lit(buckets)) === k), k, next)))
        // folded stats, PER COLUMN: a column's union interval survives
        // the fold only when ALL constituents carry an interval for
        // that column (a file without one is unbounded on it, so the
        // fold must stay so); columns fold independently
        val stats = adds.flatMap { f =>
          val parts = byBucket(bucketOfFile(f))
            .map(p => snap.stats.getOrElse(p, Map.empty[String, (Long, Long)]))
          val commonCols =
            if (parts.isEmpty) Set.empty[String]
            else parts.map(_.keySet).reduce(_ intersect _)
          if (commonCols.isEmpty) None
          else Some(f -> commonCols.map { c =>
            val ivs = parts.map(_(c))
            c -> (ivs.map(_._1).min, ivs.map(_._2).max)
          }.toMap)
        }.toMap
        TxLog.commit(table, adds, oldFiles, expectedCurrent = snap.version,
            primitive = primitive, stats = stats) match {
          case Some(v) =>
            adds.foreach(f => foldSidecars(table, f, byBucket(bucketOfFile(f))))
            result = Some(Some((v, todo)))
          case None => // lost to a concurrent merge: orphan ours, retry
            adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
        }
      }
    }
    result.get
  }

  /** The stats-map key a z-order rewrite records its curve interval
    * under: encoding the COLUMN PAIR AND BIT WIDTH in the key means a
    * scan can only ever prune against the exact curve it asks for — a
    * table z-ordered with different columns or more bits simply has no
    * matching interval and is read unskipped (the mirror of the
    * stat-less always-read rule). */
  private[streaming] def zStatsKey(xCol: String, yCol: String, bits: Int): String =
    s"__z:$xCol:$yCol:$bits"

  /** OPTIMIZE ZORDER BY (xCol, yCol): rewrite every bucket's live rows
    * into `chunks` files clustered by the MORTON CODE of the two
    * columns, recording per file the (min z, max z) curve interval
    * (under [[zStatsKey]]) PLUS the plain per-column (min, max) of
    * xCol and yCol — so a later [[scanBox]] prunes through the exact
    * quadtree interval-vs-box test AND ordinary [[scanRange]]s on
    * either column keep pruning on the same rewritten files. This is
    * the multi-dimensional half of the maintenance pair next to
    * [[compact]]'s bin-packing. Content is identical across the commit
    * (pure rewrite); time travel and vacuum behave as for compact;
    * bloom sidecars fold per bucket like compact's (OR over the
    * bucket's constituents — a chunk's rows are a subset of its
    * bucket's union). Coordinates are VERIFIED to lie in [0, 2^bits)
    * in the same pass that computes the stats — out-of-range values
    * alias under the interleave's masks and would record intervals
    * that describe the aliased curve, so the rewrite fails loudly
    * instead of committing misleading metadata (ADVICE r8). Rows are
    * chunked by per-bucket z-rank (a bucket is already one write task
    * in every writer here, so the per-bucket rank window sits inside
    * the same task-size envelope the table's bucket count declares).
    * Loses races like mergeInto and retries. Returns (version,
    * rewritten buckets). */
  def optimizeZorder(spark: SparkSession, table: String, keyCol: String,
      buckets: Int, xCol: String, yCol: String, bits: Int, chunks: Int,
      primitive: CommitPrimitive = TxLog.LocalFs): (Long, Seq[Int]) = {
    import org.apache.spark.sql.expressions.Window
    var result: Option[(Long, Seq[Int])] = None
    while (result.isEmpty) {
      val snap = TxLog.snapshot(table)
      if (snap.files.isEmpty) return (snap.version, Seq.empty)
      val byBucket = snap.files.groupBy(bucketOfFile)
      val todo = byBucket.keys.toSeq.sorted
      val next = snap.version + 1
      val df = spark.read.option("mergeSchema", "true")
        .parquet(snap.files.map(f => s"$table/$f"): _*)
      val zd = df
        .withColumn("__b", pmod(col(keyCol), lit(buckets)).cast("int"))
        .withColumn("__z", Zorder.zvalue(col(xCol), col(yCol), bits))
        .withColumn("__c",
          ntile(chunks).over(Window.partitionBy("__b").orderBy("__z")))
        .drop("__z")
      val written = writeChunks(spark, table, zd, next)
      val adds = written.values.toSeq.sorted ++
        // a bucket whose live files hold zero rows still needs one
        // schema-bearing file for lookup()
        todo.filterNot(k => written.keys.exists(_._1 == k)).map(k =>
          writeBucket(spark, table, df.limit(0), k, next))
      // stats from the WRITTEN bytes (one job over the new files), so the
      // recorded intervals provably cover what each file holds — immune to
      // any nondeterminism in the rank's tie-breaking between passes. The
      // same pass carries the coordinate-domain check: zvalue()'s masks
      // silently alias out-of-range coords, so fail loudly BEFORE the
      // commit rather than record intervals of the aliased curve.
      val stats: Map[String, Map[String, (Long, Long)]] =
        if (written.isEmpty) Map.empty
        else {
          val zk = zStatsKey(xCol, yCol, bits)
          val rows = spark.read.parquet(written.values.toSeq.map(f => s"$table/$f"): _*)
            .withColumn("__z", Zorder.zvalue(col(xCol), col(yCol), bits))
            .groupBy(input_file_name().as("__f"))
            .agg(min("__z").as("zlo"), max("__z").as("zhi"),
              min(col(xCol).cast("long")).as("xlo"), max(col(xCol).cast("long")).as("xhi"),
              min(col(yCol).cast("long")).as("ylo"), max(col(yCol).cast("long")).as("yhi"))
            .collect()
          val lim = 1L << bits
          rows.find(r => !(r.getLong(3) >= 0 && r.getLong(4) < lim &&
              r.getLong(5) >= 0 && r.getLong(6) < lim)).foreach { r =>
            // orphan the staged files (vacuum-sweepable) before failing:
            // nothing is committed, the table is untouched
            adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
            sys.error(
              s"optimizeZorder: $xCol/$yCol values outside [0, $lim) — " +
                s"x[${r.getLong(3)},${r.getLong(4)}] y[${r.getLong(5)},${r.getLong(6)}] " +
                "would alias on the curve; widen `bits` or pre-clamp")
          }
          rows.map { r =>
            r.getString(0).split('/').last -> Map(
              zk -> (r.getLong(1), r.getLong(2)),
              xCol -> (r.getLong(3), r.getLong(4)),
              yCol -> (r.getLong(5), r.getLong(6)))
          }.toMap
        }
      TxLog.commit(table, adds, snap.files, expectedCurrent = snap.version,
          primitive = primitive, stats = stats) match {
        case Some(v) =>
          // fold bloom sidecars per bucket (buckets are key-disjoint, so
          // a chunk's rows come only from its own bucket's files)
          written.foreach { case ((k, _), f) =>
            foldSidecars(table, f, byBucket.getOrElse(k, Seq.empty))
          }
          result = Some((v, todo))
        case None =>
          adds.foreach(f => Files.deleteIfExists(Paths.get(table, f)))
      }
    }
    result.get
  }

  /** 2-D box scan with Z-ORDER FILE SKIPPING: prunes live files whose
    * recorded z-interval provably contains no point of
    * `[xlo, xhi] × [ylo, yhi]` (exact quadtree test — see [[Zorder]]),
    * AND whose plain per-column intervals (when recorded) miss the box
    * — the two tests compose because every interval is keyed by the
    * column (or curve) it describes, so a table z-ordered with other
    * columns or a different bit width simply contributes no z-interval
    * here and falls back to the per-column prunes. Files without any
    * matching stats are always read: pruning is an optimization, never
    * a correctness filter. */
  def scanBox(spark: SparkSession, table: String, xCol: String, yCol: String,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long, bits: Int,
      asOf: Option[Long] = None): DataFrame = {
    val snap = TxLog.snapshot(table, asOf)
    val zk = zStatsKey(xCol, yCol, bits)
    val keep = snap.files.filter { f =>
      val cols = snap.stats.getOrElse(f, Map.empty)
      val zOk = cols.get(zk) match {
        case Some((zlo, zhi)) =>
          Zorder.intervalIntersectsBox(zlo, zhi, xlo, xhi, ylo, yhi, bits)
        case None => true // no interval for THIS curve: must read
      }
      def colOk(c: String, lo: Long, hi: Long) = cols.get(c) match {
        case Some((l, h)) => h >= lo && l <= hi
        case None => true
      }
      zOk && colOk(xCol, xlo, xhi) && colOk(yCol, ylo, yhi)
    }
    val base =
      if (keep.nonEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(keep.map(f => s"$table/$f"): _*)
      else Streams.readMergeTable(spark, table, asOf).limit(0)
    base.filter(col(xCol).cast("long").between(xlo, xhi) &&
      col(yCol).cast("long").between(ylo, yhi))
  }

  /** Point lookup with FILE SKIPPING: the key's hash bucket names the
    * only file(s) that can hold it, so the scan opens 1/buckets of the
    * table (MergeTableSpec asserts `inputFiles` is the single bucket
    * file) — the metadata-pruned read path a serving table needs. */
  def lookup(spark: SparkSession, table: String, keyCol: String, key: Long,
      buckets: Int): DataFrame = {
    val b = java.lang.Math.floorMod(key, buckets.toLong).toInt
    val files = TxLog.snapshot(table).files.filter(bucketOfFile(_) == b)
    require(files.nonEmpty, s"no file for bucket $b in $table")
    spark.read.parquet(files.map(f => s"$table/$f"): _*)
      .filter(col(keyCol) === key)
  }

  /** Fold a rewrite's constituent sidecars onto `newFile`: the new
    * filter is the bitwise OR of the constituents' — valid because the
    * rewritten file's rows are a subset of the constituents' union, so
    * the OR covers every value (false positives only, never negatives).
    * Folds ONLY when every constituent carries a valid sidecar for the
    * SAME column (a sidecar-less or foreign-column part is unbounded,
    * so the fold must stay so — the new file gets no sidecar and is
    * always read). */
  private def foldSidecars(table: String, newFile: String,
      constituents: Seq[String]): Unit = {
    val parts = constituents.map(readSidecar(table, _))
    if (parts.nonEmpty && parts.forall(_.isDefined)) {
      val cols = parts.flatten.map(_._1).distinct
      if (cols.length == 1) {
        val folded = parts.flatten.map(_._2).reduce { (a, b) =>
          a.zip(b).map { case (x, y) => (x | y).toByte }
        }
        writeSidecar(table, newFile, cols.head, folded)
      }
    }
  }

  private def bucketOfFile(name: String): Int =
    name.stripPrefix("b").takeWhile(_.isDigit).toInt

  /** Write every requested bucket's rows in ONE partitionBy("__b") job;
    * returns bucket → committed file name for the buckets that produced
    * a partition dir (buckets with zero rows produce none — callers
    * fall back to [[writeBucket]] for those). `repartition(__b)` puts
    * each bucket in exactly one task, so each partition dir holds one
    * file. */
  private def writeBuckets(spark: SparkSession, table: String, df: DataFrame,
      keyCol: String, buckets: Int, wanted: Seq[Int],
      version: Long): Map[Int, String] =
    writeBucketsImpl(spark, table, df, keyCol, buckets, Some(wanted), version)

  /** [[writeBuckets]] discovering the touched-bucket set from the staged
    * partition directories (every distinct `__b` the write produced) —
    * append ingest needs no separate distinct-collect job over the batch
    * just to learn which buckets it wrote (optimization r15). */
  private def writeBuckets(spark: SparkSession, table: String, df: DataFrame,
      keyCol: String, buckets: Int, version: Long): Map[Int, String] =
    writeBucketsImpl(spark, table, df, keyCol, buckets, None, version)

  private def writeBucketsImpl(spark: SparkSession, table: String, df: DataFrame,
      keyCol: String, buckets: Int, wanted: Option[Seq[Int]],
      version: Long): Map[Int, String] = {
    val stage = Files.createTempDirectory("graft-mergetbl")
    try {
      df.withColumn("__b", pmod(col(keyCol), lit(buckets)).cast("int"))
        .repartition(col("__b"))
        .write.partitionBy("__b").mode(SaveMode.Overwrite).parquet(stage.toString)
      val staged = wanted.getOrElse(
        Option(new java.io.File(stage.toString).listFiles())
          .getOrElse(Array.empty).toSeq
          .filter(d => d.isDirectory && d.getName.startsWith("__b="))
          .map(_.getName.stripPrefix("__b=").toInt).sorted)
      staged.flatMap { k =>
        val dir = new java.io.File(s"$stage/__b=$k")
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet")).toSeq match {
          case Seq(part) =>
            val name = s"b$k-v$version-${part.getName.stripPrefix("part-")}"
            Files.move(part.toPath, Paths.get(table, name))
            Some(k -> name)
          case Seq() => None
          case many => // hash-collision split across tasks: keep them all?
            // repartition by __b guarantees one task per value; if Spark
            // ever changes that, fail loudly rather than lose files
            sys.error(s"bucket $k split into ${many.size} files")
        }
      }.toMap
    } finally deleteRecursively(stage) // a long-running merge stream
    // stages once per micro-batch; leaving the _SUCCESS marker and
    // partition dirs behind accrues one orphan temp tree per batch
  }

  /** Write z-chunked rows (`__b`, `__c` columns present) in ONE
    * partitionBy job; returns (bucket, chunk) → committed file name.
    * Chunk files parse through [[bucketOfFile]] like any bucket file, so
    * every existing reader (merge, compact, CDF, lookup) sees them as
    * ordinary per-bucket parts. */
  private def writeChunks(spark: SparkSession, table: String, df: DataFrame,
      version: Long): Map[(Int, Int), String] = {
    val stage = Files.createTempDirectory("graft-mergetbl")
    try {
      df.repartition(col("__b"), col("__c"))
        .write.partitionBy("__b", "__c").mode(SaveMode.Overwrite)
        .parquet(stage.toString)
      val out = scala.collection.mutable.Map.empty[(Int, Int), String]
      Option(new java.io.File(stage.toString).listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("__b=")).foreach { bd =>
          val k = bd.getName.stripPrefix("__b=").toInt
          Option(bd.listFiles()).getOrElse(Array.empty)
            .filter(d => d.isDirectory && d.getName.startsWith("__c=")).foreach { cd =>
              val c = cd.getName.stripPrefix("__c=").toInt
              cd.listFiles().filter(_.getName.endsWith(".parquet")).toSeq match {
                case Seq(part) =>
                  val name = s"b$k-v$version-zc$c-${part.getName.stripPrefix("part-")}"
                  Files.move(part.toPath, Paths.get(table, name))
                  out((k, c)) = name
                case Seq() => ()
                case many =>
                  sys.error(s"chunk ($k,$c) split into ${many.size} files")
              }
            }
        }
      out.toMap
    } finally deleteRecursively(stage)
  }

  private def writeBucket(spark: SparkSession, table: String, df: DataFrame,
      bucket: Int, version: Long): String = {
    val stage = Files.createTempDirectory("graft-mergetbl")
    try {
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val name = s"b$bucket-v$version-${part.getName.stripPrefix("part-")}"
      Files.move(part.toPath, Paths.get(table, name))
      name
    } finally deleteRecursively(stage)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(q => Files.deleteIfExists(q))
      }
}
