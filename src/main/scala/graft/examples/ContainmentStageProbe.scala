package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Sub-stage attribution for the containment row (optimization r15):
  * time and size every internal relation of the candidate generator and
  * the verify pipeline on the gate corpus, so the optimization targets
  * the stage that actually costs.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.ContainmentStageProbe"
  */
object ContainmentStageProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"probe":"cstage_$tag","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val g = timed("gram_checkpoint") {
      Tables(spark, d, "documents").select(col("doc_id"),
          explode(Dedup.containmentGramCol(col("text"))).as("gram"))
        .localCheckpoint()
    }
    val t = 0.8
    val den = 1000
    val num = 800
    val dfreq = timed("dfreq") {
      g.groupBy("gram").agg(count(lit(1)).as("df")).localCheckpoint()
    }
    println(s"""{"probe":"cstage_dfreq_rows","rows":${dfreq.count()}}""")
    val sorted = g.join(dfreq, Seq("gram"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(df, gram))), x -> x.gram)").as("gs"))
      .select(col("doc_id"), col("gs"), size(col("gs")).as("n"))
      .withColumn("plen", expr(s"n - ($num*n + ${den - 1}) DIV $den + 2"))
    val pos = timed("pos_checkpoint") {
      sorted
        .select(col("doc_id"), col("n"), col("plen"), posexplode(col("gs")))
        .select(col("doc_id"), col("n"), col("plen"),
          (col("pos") + 1).as("p"), col("col").as("gram"))
        .localCheckpoint()
    }
    println(s"""{"probe":"cstage_pos_rows","rows":${pos.count()}}""")
    val prefix = pos.filter(col("p") <= col("plen"))
    println(s"""{"probe":"cstage_prefix_rows","rows":${prefix.count()}}""")
    val rawPairs = timed("gram_match_join") {
      prefix.as("a").join(pos.as("b"),
          col("a.gram") === col("b.gram") &&
            (col("a.n") < col("b.n") ||
              (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))))
        .count()
    }
    println(s"""{"probe":"cstage_gram_match_pairs","rows":$rawPairs}""")
    val cand = timed("candidates_full") { Dedup.containmentCandidates(g, t) }
    println(s"""{"probe":"cstage_cand_rows","rows":${cand.count()}}""")
    timed("verify") {
      Dedup.containmentPairs(g, t).foreach(_ => ())
    }
    spark.stop()
  }
}
