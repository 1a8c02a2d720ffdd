package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** The ONE storage primitive the TxLog commit protocol needs: atomically
  * publish `content` at `target` IF AND ONLY IF nothing exists there,
  * returning whether this writer won. Everything else in the protocol
  * (JSON entries, log replay, snapshot isolation, vacuum) is plain reads
  * and writes of immutable files, so porting the table format to a new
  * store means implementing exactly this method:
  *
  *   - POSIX / HDFS: stage + hard link (below) or `create(..., CREATE_NEW)`;
  *   - S3: conditional PUT with `If-None-Match: *`;
  *   - GCS: PUT with `x-goog-if-generation-match: 0`;
  *   - ABFS: create with ETag `If-None-Match: *`;
  *   - anything without conditional writes: a DynamoDB-style lock table
  *     keyed by (table, version) — the Delta-on-S3 commit-service shape.
  *
  * The contract is strict: on `false` the target was ALREADY committed by
  * another writer and this writer's content must not be visible anywhere.
  */
trait CommitPrimitive {
  def createExclusive(target: Path, content: Array[Byte]): Boolean
}

/** Minimal log-based transactional table format (the lake-scale MERGE
  * sink the upsert rows defer to): a table is a directory of immutable
  * parquet part files plus a `_txlog/` of versioned JSON commit entries
  * `{version, adds[], removes[]}`. The CURRENT table state is the log
  * replay — data files are never read unless a committed entry
  * references them, which gives:
  *
  *   - **atomic commits**: an entry is published through a
  *     [[CommitPrimitive]] (create-exclusive), so concurrent writers get
  *     optimistic-concurrency conflicts instead of lost updates;
  *   - **crash safety**: a writer dying after writing data files but
  *     before the commit leaves ORPHANS that no reader ever sees;
  *     [[vacuum]] sweeps them once they age past the in-flight window;
  *   - **snapshot isolation + time travel**: [[snapshot]] replays the
  *     log to any version; readers pin a file set, never a directory
  *     listing of mutable state.
  *
  * This is deliberately the smallest shape of the Delta/Iceberg commit
  * protocol that the engine's streaming upsert needs — single-table,
  * JSON entries, last-writer-wins per key via full-state rewrite. The
  * reference's own sink story is a fixed output format per job
  * (`core/src/main/java/org/apache/hama/bsp/FileOutputFormat.java`);
  * versioned commits are the engine extension a serving table requires.
  */
object TxLog {

  /** `stats` maps a live file to PER-COLUMN (min, max) intervals the
    * committing writer recorded — the Delta/Iceberg-style file-skipping
    * metadata. Keying intervals by COLUMN NAME (not one anonymous slot
    * per file) is what lets appends with different stats columns,
    * Z-ORDER's curve intervals, and plain column intervals coexist in
    * one table's commits without a reader ever interpreting an interval
    * against the wrong column (ADVICE r8: a (0,23) hour interval read
    * as a z-interval can prune a file whose rows match — silent row
    * loss). A scan prunes only on intervals recorded FOR ITS column; a
    * file without a matching interval is always kept (safe degradation
    * for pre-stats files, expired entries, and foreign columns). */
  final case class Snapshot(version: Long, files: Seq[String],
      stats: Map[String, Map[String, (Long, Long)]] = Map.empty)

  /** POSIX-local [[CommitPrimitive]]: stage a temp file beside the
    * target, then HARD-LINK it in — link creation is atomic and fails if
    * the target exists (a rename would silently replace it). */
  object LocalFs extends CommitPrimitive {
    def createExclusive(target: Path, content: Array[Byte]): Boolean = {
      val tmp = Files.createTempFile(target.getParent, ".tmp-", ".json")
      Files.write(tmp, content)
      try { Files.createLink(target, tmp); Files.deleteIfExists(tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); false
      }
    }
  }

  /** Data files younger than this survive [[vacuum]] by default: a
    * concurrent writer stages bucket/part files BEFORE its commit entry
    * lands (MergeTable.writeBucket, runMergeTotals), so an age-blind
    * sweep could delete files an in-flight commit is about to reference.
    * 10 minutes comfortably exceeds any single commit's write window;
    * pass `minAgeMs = 0` only when no writer can be live (tests, offline
    * maintenance). */
  val defaultVacuumMinAgeMs: Long = 10 * 60 * 1000L

  private def logDir(table: String) = Paths.get(table, "_txlog")

  /** Committed versions present in the log, ascending. */
  def versions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.exists(d)) Seq.empty
    else Using.resource(Files.list(d)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("\\d+\\.json"))
        .map(_.stripSuffix(".json").toLong)
        .toSeq.sorted
    }
  }

  /** Checkpoint versions present in the log, ascending. */
  def checkpointVersions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.exists(d)) Seq.empty
    else Using.resource(Files.list(d)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("\\d+\\.checkpoint\\.json"))
        .map(_.stripSuffix(".checkpoint.json").toLong)
        .toSeq.sorted
    }
  }

  /** Replay the log up to (and including) `asOf` (latest if None),
    * starting from the newest CHECKPOINT at or below the target — so a
    * reader's cost is O(commits since last checkpoint), not O(all
    * versions), and entries older than a checkpoint may be aged out
    * (after which time travel below the checkpoint is gone, by
    * declared retention, and fails loudly here). */
  def snapshot(table: String, asOf: Option[Long] = None): Snapshot = {
    val all = versions(table)
    val upTo = asOf.fold(all)(a => all.filter(_ <= a))
    val base = asOf.fold(checkpointVersions(table))(
      a => checkpointVersions(table).filter(_ <= a)).lastOption
    require(asOf.isEmpty || upTo.nonEmpty || base.nonEmpty || all.isEmpty,
      s"no committed version <= ${asOf.get} in $table")
    val fromV = base.getOrElse(-1L)
    var files = base.fold(Vector.empty[String])(v => readCheckpoint(table, v).toVector)
    var stats = base.fold(Map.empty[String, Map[String, (Long, Long)]])(
      v => readStats(table, s"$v.checkpoint.json"))
    val replay = upTo.filter(_ > fromV)
    // versions are always committed consecutively, so the replayed
    // suffix must be exactly fromV+1, fromV+2, … — a hole means entries
    // were deleted past the newest checkpoint and replay would silently
    // skip commits; refuse instead
    require(replay == ((fromV + 1) to (fromV + replay.length)),
      s"log gap after checkpoint $fromV in $table: ${replay.mkString(",")}")
    replay.foreach { v =>
      val (adds, removes) = readEntry(table, v)
      files = files.filterNot(removes.toSet) ++ adds
      stats = (stats -- removes) ++ readStats(table, s"$v.json")
    }
    Snapshot(replay.lastOption.orElse(base).getOrElse(-1L), files, stats)
  }

  /** Write a checkpoint of the CURRENT snapshot: one JSON file holding
    * the fully-replayed live file set at that version. Idempotent and
    * concurrency-safe (create-exclusive through `primitive`; a loser
    * means someone else checkpointed the same version — fine). Returns
    * the checkpointed version, None if the table is empty or the
    * checkpoint already exists. Entries at or below a checkpoint may
    * then be deleted by retention policy — doing so gives up time
    * travel below the checkpoint, nothing else. */
  def writeCheckpoint(table: String,
      primitive: CommitPrimitive = LocalFs): Option[Long] = {
    val snap = snapshot(table)
    if (snap.version < 0) return None
    snap.files.foreach { n =>
      require(!n.contains('"') && !n.contains(','),
        s"file name must not contain '\"' or ',': $n")
    }
    val entry =
      s"""{"version":${snap.version},"files":[${
        snap.files.map("\"" + _ + "\"").mkString(",")}]${statsJson(snap.stats)}}"""
    val target = logDir(table).resolve(s"${snap.version}.checkpoint.json")
    if (primitive.createExclusive(target, entry.getBytes("UTF-8"))) Some(snap.version)
    else None
  }

  /** `,"stats":{"f|col":[lo,hi],…}` — empty string when no stats. The
    * nested file→column→interval map is FLATTENED to `file|col` keys so
    * the object stays brace-free inside and the regex replay stays
    * exact (file and column names are validated at commit time to
    * contain no `"`, `,`, or `|`). Placed LAST in the entry so the
    * adds/removes array regexes (which stop at the first `]`) never see
    * the stats brackets. */
  private def statsJson(stats: Map[String, Map[String, (Long, Long)]]): String = {
    val flat = for ((f, cols) <- stats.toSeq; (c, (lo, hi)) <- cols.toSeq)
      yield (s"$f|$c", lo, hi)
    if (flat.isEmpty) ""
    else flat.sortBy(_._1)
      .map { case (k, lo, hi) => s""""$k":[$lo,$hi]""" }
      .mkString(""","stats":{""", ",", "}")
  }

  /** Parse the `stats` object of a log/checkpoint file (empty when the
    * field is absent — pre-stats entries stay readable). A key without
    * the `|` column separator (the pre-multi-column format) is DROPPED:
    * an interval whose column is unknown cannot be safely matched to
    * any scan, and a stat-less file is always read — safe degradation
    * in the only direction the contract allows. */
  private def readStats(table: String,
      fileName: String): Map[String, Map[String, (Long, Long)]] = {
    val p = logDir(table).resolve(fileName)
    if (!Files.exists(p)) return Map.empty
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    """"stats":\{([^}]*)\}""".r.findFirstMatchIn(txt) match {
      case None => Map.empty
      case Some(m) =>
        """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r.findAllMatchIn(m.group(1))
          .flatMap { g =>
            val k = g.group(1)
            val cut = k.lastIndexOf('|')
            if (cut < 0) None // legacy single-interval key: column unknown
            else Some((k.substring(0, cut), k.substring(cut + 1),
              (g.group(2).toLong, g.group(3).toLong)))
          }.toSeq.groupBy(_._1)
          .map { case (f, rows) => f -> rows.map(r => r._2 -> r._3).toMap }
    }
  }

  /** Retention: delete entry files AT OR BELOW the newest checkpoint.
    * Readers then start from the checkpoint; time travel below it is
    * deliberately given up (snapshot refuses loudly). Returns the
    * expired versions. No-op without a checkpoint. */
  def expireEntriesBelowCheckpoint(table: String): Seq[Long] = {
    checkpointVersions(table).lastOption match {
      case None => Seq.empty
      case Some(cp) =>
        val old = versions(table).filter(_ <= cp)
        old.foreach(v => Files.deleteIfExists(logDir(table).resolve(s"$v.json")))
        old
    }
  }

  private def readCheckpoint(table: String, v: Long): Seq[String] = {
    val txt = new String(
      Files.readAllBytes(logDir(table).resolve(s"$v.checkpoint.json")), "UTF-8")
    val m = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
    m.map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
      .getOrElse(Seq.empty)
  }

  /** Parse one committed entry → (adds, removes). The JSON is written by
    * [[commit]] with a fixed field order, no nesting, and file names
    * VALIDATED to contain no `"` or `,` (enforced at commit time), so a
    * regex-based parse is exact (no JSON library in the engine deps). */
  private[streaming] def readEntry(table: String, v: Long): (Seq[String], Seq[String]) = {
    val txt = new String(Files.readAllBytes(logDir(table).resolve(s"$v.json")), "UTF-8")
    def arr(field: String): Seq[String] = {
      val m = s""""$field":\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
      m.map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }
    (arr("adds"), arr("removes"))
  }

  /** Atomically commit `version` = current + 1 through `primitive`.
    * Returns the committed version, or None on a CONFLICT (someone else
    * committed that version first — re-read the snapshot and retry).
    * File names are relative to the table root; names containing `"` or
    * `,` would corrupt the regex replay, so they are rejected HERE, at
    * write time, instead of corrupting every later read. */
  def commit(table: String, adds: Seq[String], removes: Seq[String],
      expectedCurrent: Long, primitive: CommitPrimitive = LocalFs,
      stats: Map[String, Map[String, (Long, Long)]] = Map.empty): Option[Long] = {
    (adds ++ removes).foreach { n =>
      require(!n.contains('"') && !n.contains(',') && !n.contains('|'),
        s"file name must not contain '\"', ',' or '|': $n")
    }
    stats.valuesIterator.flatMap(_.keysIterator).foreach { c =>
      require(!c.contains('"') && !c.contains(',') && !c.contains('|'),
        s"stats column name must not contain '\"', ',' or '|': $c")
    }
    require(stats.keySet.subsetOf(adds.toSet),
      s"stats may only cover this commit's adds: ${stats.keySet -- adds.toSet}")
    val next = expectedCurrent + 1
    val d = logDir(table)
    Files.createDirectories(d)
    val entry =
      s"""{"version":$next,"adds":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]${statsJson(stats)},""" +
        s""""ts":${System.currentTimeMillis()}}"""
    if (primitive.createExclusive(d.resolve(s"$next.json"), entry.getBytes("UTF-8")))
      Some(next)
    else None
  }

  /** Commit wall-clock time of a version, for timestamp time travel:
    * the entry's recorded `ts` field, falling back to the entry FILE's
    * modification time for pre-`ts` entries (close enough — both are
    * the committing writer's clock at publish time). */
  def commitTimeMillis(table: String, v: Long): Long = {
    val p = logDir(table).resolve(s"$v.json")
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    """"ts":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong)
      .getOrElse(Files.getLastModifiedTime(p).toMillis)
  }

  /** TIMESTAMP AS OF: the newest version whose commit time is at or
    * before `tsMillis` — `snapshot(table, Some(versionAt(...)))` is the
    * Delta-style timestamp read. Commit times come from each WRITER's
    * clock, so they are not guaranteed monotone across writers; the max
    * over the qualifying set (not a binary search) keeps the answer
    * well-defined under skew. Fails loudly when `tsMillis` predates
    * every retained entry — including entries aged out below a
    * checkpoint, matching version-based time travel's retention
    * contract. */
  def versionAt(table: String, tsMillis: Long): Long = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed entries in $table")
    val ok = vs.filter(v => commitTimeMillis(table, v) <= tsMillis)
    require(ok.nonEmpty,
      s"no version committed at or before $tsMillis in $table " +
        s"(earliest retained: ${commitTimeMillis(table, vs.head)})")
    ok.max
  }

  /** Delete data files no committed log entry references (crash orphans)
    * and stale `.tmp-` entries, SKIPPING anything modified within the
    * last `minAgeMs` — an unreferenced-but-young file is most likely a
    * concurrent writer's staged part whose commit has not landed yet
    * (TxLogSpec: vacuum-during-write). Returns the swept file names.
    * Files REMOVED by some version stay on disk — they back time
    * travel. */
  def vacuum(table: String, minAgeMs: Long = defaultVacuumMinAgeMs): Seq[String] = {
    val referenced = (versions(table)
      .flatMap { v => val (a, r) = readEntry(table, v); a ++ r } ++
      checkpointVersions(table).flatMap(v => readCheckpoint(table, v))).toSet
    val root = Paths.get(table)
    if (!Files.exists(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - minAgeMs
    val orphans = Using.resource(Files.list(root)) { st =>
      st.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
        .map(_.getFileName.toString)
        .filterNot(referenced)
        .toSeq
    }
    orphans.foreach(f => Files.deleteIfExists(root.resolve(f)))
    // bloom sidecars ride beside their data file outside the log; sweep
    // any whose data file is gone (swept above, or vacuumed earlier)
    Using.resource(Files.list(root)) { st =>
      st.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".bloom"))
        .filter(p => !Files.exists(Paths.get(
          p.toString.stripSuffix(".bloom"))))
        .toSeq
    }.foreach(p => Files.deleteIfExists(p))
    // stale staged files: commit-entry temps in _txlog, sidecar temps in
    // the table root (a crash between stage and ATOMIC_MOVE orphans one)
    (Seq(logDir(table)).filter(Files.exists(_)) :+ root).foreach { dir =>
      Using.resource(Files.list(dir)) { st =>
        st.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith(".tmp-") &&
            Files.getLastModifiedTime(p).toMillis <= cutoff)
          .toSeq
      }.foreach(p => Files.deleteIfExists(p))
    }
    orphans
  }
}
