package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.TextHash
import graft.operators.TextExprs
import org.apache.spark.sql.functions._

/** Scratch profiler for q_dedup_ppjoin stage costs (builder tooling). */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val g = Tables(spark, sfDir, "documents")
      .repartition(32, col("doc_id"))
      .select(col("doc_id"),
        explode(TextHash.distinctNGrams(TextExprs.toks(col("text")), 3)).as("gram"))
    time("explode count")(g.count())
    val dfreq = g.groupBy("gram").agg(count(lit(1)).as("df"))
    time("dfreq count")(dfreq.count())
    val sorted = g.join(dfreq, Seq("gram"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(df, gram))), x -> x.gram)").as("gs"))
      .select(col("doc_id"), col("gs"), size(col("gs")).as("n"))
      .withColumn("plen", expr("n - (3*n + 4) DIV 5 + 1"))
    val sortedC = time("sorted checkpoint")(sorted.localCheckpoint())
    val prefix = sortedC.select(col("doc_id"), col("n"),
      explode(expr("slice(gs, 1, plen)")).as("pg"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.pg") === col("b.pg") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * 5 >= greatest(col("a.n"), col("b.n")) * 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates count")(cand.count())
    val out = cand
      .join(sortedC.select(col("doc_id").as("doc_a"), col("gs").as("ga"), col("n").as("na")), Seq("doc_a"))
      .join(sortedC.select(col("doc_id").as("doc_b"), col("gs").as("gb"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("i", size(array_intersect(col("ga"), col("gb"))))
      .filter(col("i") * 5 >= (col("na") + col("nb") - col("i")) * 3)
      .select(col("doc_a"), col("doc_b"),
        round(col("i") * 1.0 / (col("na") + col("nb") - col("i")), 6).as("jac"))
    time("verify+collect")(out.orderBy("doc_a", "doc_b").count())
    spark.stop()
  }
}
