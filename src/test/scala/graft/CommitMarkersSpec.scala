package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the streaming sinks' commit-marker ledger
  * ([[graft.streaming.CommitMarkers]], VERDICT r13 #3 + ADVICE r13
  * medium): replay-skip is exact before AND after the census folds
  * markers into the `_committed_upto` watermark, the census stays
  * O(bound) while ids grow without bound, a replayed id whose input
  * fingerprint differs fails loudly (a shifted file→batch mapping must
  * never silently skip the wrong batch), and the watermark write is
  * marker-last-durable (a crash between the watermark rename and the
  * marker deletes leaves duplicates, never a lost commit). */
class CommitMarkersSpec extends AnyFunSuite {
  private val CM = streaming.CommitMarkers

  private def freshDir(tag: String): String =
    GraftSession.tempDirCleanedOnExit(s"spec-cm-$tag").toString

  private def markerCensus(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("_committed_"))
      .map(_.getName).toSeq.sorted

  test("census folds into the watermark; replay-skip stays exact across it") {
    val dir = freshDir("census")
    val n = 3 * CM.censusBound
    for (id <- 0 until n) {
      assert(!CM.isCommitted(dir, id.toLong, s"fp$id"),
        s"batch $id must not read committed before its commit")
      CM.commit(dir, id.toLong, s"fp$id")
      assert(CM.isCommitted(dir, id.toLong, s"fp$id"))
    }
    // the file census is bounded by the fold: ≤ censusBound individual
    // markers + the one watermark — never the 48 files 48 batches wrote
    val census = markerCensus(dir)
    assert(census.contains("_committed_upto"),
      s"expected a watermark after $n commits, saw $census")
    assert(census.size <= CM.censusBound + 1,
      s"marker census must stay O(bound): ${census.size} files for $n batches")
    // EVERY id replay-skips, subsumed or not, with its fingerprint intact
    for (id <- 0 until n)
      assert(CM.isCommitted(dir, id.toLong, s"fp$id"),
        s"batch $id must stay committed across the watermark fold")
    assert(CM.committedIds(dir) === (0 until n).map(_.toLong).toSet)
    assert(!CM.isCommitted(dir, n.toLong, "fresh"))
  }

  test("a replayed id with a different fingerprint fails loudly — marker and watermark") {
    val dir = freshDir("shift")
    CM.commit(dir, 0L, "fp-original")
    // marker-backed: the mismatch must throw, not skip
    val e1 = intercept[IllegalArgumentException] {
      CM.isCommitted(dir, 0L, "fp-shifted")
    }
    assert(e1.getMessage.contains("mapping"))
    // fold id 0 into the watermark, then mismatch again: same contract
    for (id <- 1 to CM.censusBound + 1) CM.commit(dir, id.toLong, s"fp$id")
    assert(markerCensus(dir).contains("_committed_upto"))
    assert(!new java.io.File(dir, "_committed_0").exists(),
      "id 0 must have been subsumed by the watermark")
    val e2 = intercept[IllegalArgumentException] {
      CM.isCommitted(dir, 0L, "fp-shifted")
    }
    assert(e2.getMessage.contains("mapping"))
    // a LEGACY bare marker (no fingerprint — pre-r14 stores) stays
    // accepted: validation is vacuous, not a failure
    java.nio.file.Files.write(
      new java.io.File(dir, "_committed_99").toPath, Array.emptyByteArray)
    assert(CM.isCommitted(dir, 99L, "anything"))
  }

  test("a crash between the watermark rename and the marker deletes loses nothing") {
    val dir = freshDir("crash")
    for (id <- 0 until 4) CM.commit(dir, id.toLong, s"fp$id")
    // forge the crash window: the watermark landed (subsuming 0..3) but
    // the individual markers were never deleted — both records live
    java.nio.file.Files.write(
      new java.io.File(dir, "_committed_upto").toPath,
      (0 until 4).map(id => s"$id\tfp$id").mkString("\n").getBytes("UTF-8"))
    for (id <- 0 until 4)
      assert(CM.isCommitted(dir, id.toLong, s"fp$id"),
        "duplicate commit records must agree, never conflict")
    // the next fold re-subsumes the leftovers and drops them
    for (id <- 4 to CM.censusBound + 4) CM.commit(dir, id.toLong, s"fp$id")
    assert(markerCensus(dir).size <= CM.censusBound + 1)
    for (id <- 0 to CM.censusBound + 4)
      assert(CM.isCommitted(dir, id.toLong, s"fp$id"))
  }
}
