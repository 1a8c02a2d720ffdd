package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.TextHash
import graft.operators.TextExprs
import org.apache.spark.sql.functions._

/** Micro-attribution for the containment gram stage (optimization r15):
  * how much of the stage is the regex tokenizer vs the gram kernel vs
  * the hash. Each variant runs the same documents scan into a noop-style
  * count over a narrow projection, interleaved twice.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.TokProbe"
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val docs = Tables(spark, d, "documents")
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"""{"probe":"tok_$tag","secs":${(System.nanoTime() - t0) / 1e9}%.2f,"n":$n}""")
    }
    for (round <- 1 to 2) {
      timed(s"scan_only_r$round") {
        docs.select(length(col("text")).as("n")).agg(sum("n")).head.getLong(0)
      }
      timed(s"tokenize_r$round") {
        docs.select(size(TextExprs.toks(col("text"))).as("n"))
          .agg(sum("n")).head.getLong(0)
      }
      timed(s"grams_string_r$round") {
        docs.select(size(TextHash.distinctNGrams(
            TextExprs.toks(col("text")), 3)).as("n"))
          .agg(sum("n")).head.getLong(0)
      }
      timed(s"grams_hash_r$round") {
        docs.select(size(TextHash.ngramHashes(
            TextExprs.toks(col("text")), 3)).as("n"))
          .agg(sum("n")).head.getLong(0)
      }
    }
    spark.stop()
  }
}
