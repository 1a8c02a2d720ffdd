package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.TextHash
import graft.operators.{Dedup, TextExprs}
import org.apache.spark.sql.functions._

/** Stage timing for the prefix-filtered containment row on the real
  * testdata corpus: gram build, candidate generation, end-to-end — the
  * numbers that attribute the row's wall time to its stages.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.ContainmentProbe"
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"probe":"containment_$tag","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val g = timed("grams") {
      // the query's own gram kernel (hashed since r15) — one definition
      val g0 = Tables(spark, sfDir, "documents").select(col("doc_id"),
          explode(Dedup.containmentGramCol(col("text"))).as("gram"))
        .localCheckpoint()
      println(s"""{"probe":"containment_gram_rows","rows":${g0.count()}}""")
      g0
    }
    val nCand = timed("candidates") { Dedup.containmentCandidates(g, 0.8).count() }
    println(s"""{"probe":"containment_candidates","rows":$nCand}""")
    val nOut = timed("end_to_end") { Dedup.containmentPairs(g, 0.8).count() }
    println(s"""{"probe":"containment_pairs","rows":$nOut}""")
    spark.stop()
  }
}
