package graft.examples

import graft._
import org.apache.spark.sql.functions._

/** scratch stage-profiler for perf work (not part of the API surface) */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val docs = Tables(spark, d, "documents")
    time("docs.count")(docs.count())
    val base = docs
      .select(col("doc_id"), lower(substring(col("text"), 1, 160)).as("t"))
      .select(col("doc_id"), explode(sequence(lit(1), length(col("t")) - 7)).as("p"), col("t"))
    time("shingleBase")(base.count())
    val sh = base.select(col("doc_id"), expr("substring(t, p, 8)").as("sh"))
    val md = sh.select(col("doc_id"), md5(col("sh")).as("m1"), md5(concat(lit("x"), col("sh"))).as("m2"))
    time("md5x2")(md.count())
    val mins = (0 until 8).map { j =>
      val m = if (j < 4) col("m1") else col("m2")
      min(substring(m, (j % 4) * 8 + 1, 8)).as(s"h$j") }
    val sig = md.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    time("wide agg")(sig.count())
    time("full minhash again")(sig.count())
    spark.stop()
  }
}
