package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the span-dedup and token-entropy queries:
  * a crafted corpus written as a parquet `documents` table, expected
  * values derived by hand rather than by re-running the engine's own
  * formula (the DuckDB oracle covers the real corpus; this pins the
  * semantics on cases the corpus may not contain, e.g. sub-window docs).
  */
class TextPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-textpipe").toString
    val sixteen = (1 to 16).map(i => s"tok$i").mkString(" ")
    val unique16 = (1 to 16).map(i => s"only$i").mkString(" ")
    Seq(
      (0L, sixteen, "en", "web", sixteen.length.toLong),
      (1L, sixteen, "en", "web", sixteen.length.toLong),
      (2L, unique16, "en", "web", unique16.length.toLong),
      (3L, "a a b b", "en", "web", 7L),
      (4L, "z z z z", "en", "web", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q_dedup_span flags the shared 16-token span and nothing else") {
    val rows = SparkEntry.queries("q_dedup_span")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq(
      (0L, 1L, 1L, 1.0), // identical to doc 1 → its one window is duplicated
      (1L, 1L, 1L, 1.0),
      (2L, 1L, 0L, 0.0), // 16 unique tokens: one window, no twin
      (3L, 0L, 0L, 0.0), // 4 tokens < W: no window at all (the left-join path)
      (4L, 0L, 0L, 0.0)))
  }

  test("q_text_chunk: 100 tokens chunk to 64/52/4 at stride 48") {
    val d2 = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val hundred = (1 to 100).map(i => s"w$i").mkString(" ")
    Seq((0L, hundred, "en", "web", hundred.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = SparkEntry.queries("q_text_chunk")(spark, d2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // starts 0/48/96: full chunk, tail-overlapping chunk, 4-token stub
    assert(rows === Seq((0L, 64L), (1L, 52L), (2L, 4L)))
  }

  test("q_text_entropy matches hand-computed entropy and TTR") {
    val rows = SparkEntry.queries("q_text_entropy")(spark, dir)
      .filter($"doc_id" >= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(rows === Seq(
      (3L, 4L, 2L, 1.0, 0.5), // "a a b b": H = log2(4) - (1·2 + 1·2)/4 = 1
      (4L, 4L, 1L, 0.0, 0.25))) // "z z z z": single type → H = 0
  }
}
