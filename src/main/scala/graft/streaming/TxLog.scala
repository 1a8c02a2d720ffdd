package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Minimal log-based transactional table format (the lake-scale MERGE
  * sink the upsert rows defer to): a table is a directory of immutable
  * parquet part files plus a `_txlog/` of versioned JSON commit entries
  * `{version, adds[], removes[]}`. The CURRENT table state is the log
  * replay — data files are never read unless a committed entry
  * references them, which gives:
  *
  *   - **atomic commits**: an entry is staged as `_txlog/.tmp-*` and
  *     promoted by HARD-LINKING it to `_txlog/<version>.json` — link
  *     creation is atomic and fails if the version exists, so
  *     concurrent writers get optimistic-concurrency conflicts instead
  *     of lost updates (a rename would silently replace);
  *   - **crash safety**: a writer dying after writing data files but
  *     before the link leaves ORPHANS that no reader ever sees;
  *     [[vacuum]] sweeps them;
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

  final case class Snapshot(version: Long, files: Seq[String])

  private def logDir(table: String) = Paths.get(table, "_txlog")

  /** Committed versions present in the log, ascending. */
  def versions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d+\\.json"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  /** Replay the log up to (and including) `asOf` (latest if None). */
  def snapshot(table: String, asOf: Option[Long] = None): Snapshot = {
    val all = versions(table)
    val upTo = asOf.fold(all)(a => all.filter(_ <= a))
    require(asOf.isEmpty || upTo.nonEmpty || all.isEmpty,
      s"no committed version <= ${asOf.get} in $table")
    var files = Vector.empty[String]
    upTo.foreach { v =>
      val (adds, removes) = readEntry(table, v)
      files = files.filterNot(removes.toSet) ++ adds
    }
    Snapshot(upTo.lastOption.getOrElse(-1L), files)
  }

  /** Parse one committed entry → (adds, removes). The JSON is written by
    * [[commit]] with a fixed field order and no nesting, so a
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

  /** Atomically commit `version` = current + 1. Returns the committed
    * version, or None on a CONFLICT (someone else committed that version
    * first — re-read the snapshot and retry). File names are relative to
    * the table root and must not contain `"` or `,`. */
  def commit(table: String, adds: Seq[String], removes: Seq[String],
      expectedCurrent: Long): Option[Long] = {
    val next = expectedCurrent + 1
    val d = logDir(table)
    Files.createDirectories(d)
    val entry =
      s"""{"version":$next,"adds":[${adds.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""removes":[${removes.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = Files.createTempFile(d, ".tmp-", ".json")
    Files.write(tmp, entry.getBytes("UTF-8"))
    val target = d.resolve(s"$next.json")
    try {
      // hard-link creation is the atomic CREATE-EXCLUSIVE primitive: it
      // fails if the target exists (rename() would silently replace it),
      // which is exactly optimistic concurrency control
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
      Some(next)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); None
    }
  }

  /** Delete data files no committed log entry references (crash orphans)
    * and stale `.tmp-` entries. Returns the swept file names. Files
    * REMOVED by some version stay on disk — they back time travel. */
  def vacuum(table: String): Seq[String] = {
    val referenced = versions(table)
      .flatMap { v => val (a, r) = readEntry(table, v); a ++ r }.toSet
    val root = Paths.get(table)
    if (!Files.exists(root)) return Seq.empty
    val orphans = Files.list(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(_.getFileName.toString)
      .filterNot(referenced)
      .toSeq
    orphans.foreach(f => Files.deleteIfExists(root.resolve(f)))
    val d = logDir(table)
    if (Files.exists(d)) Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".tmp-"))
      .foreach(p => Files.deleteIfExists(p))
    orphans
  }
}
