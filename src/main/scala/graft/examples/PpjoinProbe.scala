package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.TextHash
import graft.operators.TextExprs
import org.apache.spark.sql.functions._

/** Scratch profiler for q_dedup_ppjoin stage costs (builder tooling):
  * times every stage of the hashed-gram pipeline AND the two verify
  * shapes (exploded thin-row probe vs array-intersect carry) in one warm
  * JVM, interleaved, so the shapes are compared inside one window. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rnd <- 1 to (if (args.isEmpty) 2 else args(0).toInt)) {
      println(s"[probe] ===== round $rnd =====")
      val useHash = rnd % 2 == 1
      val gramCol =
        if (useHash) explode(TextHash.ngramHashes(TextExprs.toks(col("text")), 3))
        else explode(TextHash.distinctNGrams(TextExprs.toks(col("text")), 3))
      println(s"[probe] grams = ${if (useHash) "HASHED" else "STRING"}")
      // ---- shared front end ----
      val g = time("g pin")(Tables(spark, sfDir, "documents")
        .select(col("doc_id"), gramCol.as("gram"))
        .localCheckpoint())
      val dfreq = g.groupBy("gram").agg(count(lit(1)).as("df"))
      val docGrams = time("docGrams pin")(g.join(dfreq, Seq("gram"))
        .groupBy("doc_id")
        .agg(expr("transform(array_sort(collect_list(struct(df, gram))), x -> x.gram)").as("gs"))
        .select(col("doc_id"), col("gs"), size(col("gs")).as("n"))
        .withColumn("plen", expr("n - (3*n + 4) DIV 5 + 1"))
        .localCheckpoint())
      val pos = docGrams.select(col("doc_id"), col("n"),
          posexplode(expr("slice(gs, 1, plen)")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"), col("col").as("pg"))
      val candLazy = pos.as("a").join(pos.as("b"),
          col("a.pg") === col("b.pg") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")) * 5 >= greatest(col("a.n"), col("b.n")) * 3 &&
            lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
              expr("(3 * (a.n + b.n) + 7) DIV 8"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val cand = time("cand pin")(candLazy.localCheckpoint())
      println(s"[probe] candidates: ${cand.count()}")
      // ---- verify shape A: exploded thin-row probe (the r14 shape) ----
      time("verify EXPLODED") {
        val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val gb = g.join(
          cand.select(col("doc_b").as("doc_id")).distinct(), Seq("doc_id"))
        val inter = cand
          .join(g.as("ga"), col("doc_a") === col("ga.doc_id"))
          .join(gb.as("gb").hint("shuffle_hash"),
            col("doc_b") === col("gb.doc_id") && col("ga.gram") === col("gb.gram"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
        inter
          .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
          .filter(col("i") * 5 >= (col("na") + col("nb") - col("i")) * 3)
          .select(col("doc_a"), col("doc_b"),
            round(col("i") * 1.0 / (col("na") + col("nb") - col("i")), 6).as("jac"))
          .orderBy("doc_a", "doc_b").count()
      }
      // ---- verify shape B: array-intersect carry (the containment shape) ----
      time("verify ARRAY") {
        def side(idCol: String, pre: String) = docGrams
          .join(cand.select(col(idCol).as("doc_id")).distinct(), Seq("doc_id"))
          .select(col("doc_id").as(idCol), col("gs").as(s"${pre}gs"),
            col("n").as(s"${pre}n"))
        cand
          .join(side("doc_a", "a").hint("shuffle_hash"), Seq("doc_a"))
          .join(side("doc_b", "b").hint("shuffle_hash"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("ags"), col("bgs"))).cast("long").as("i"),
            col("an").as("na"), col("bn").as("nb"))
          .filter(col("i") * 5 >= (col("na") + col("nb") - col("i")) * 3)
          .select(col("doc_a"), col("doc_b"),
            round(col("i") * 1.0 / (col("na") + col("nb") - col("i")), 6).as("jac"))
          .orderBy("doc_a", "doc_b").count()
      }
      // ---- verify shape C: array carry + codegen'd intersect kernel ----
      if (useHash) time("verify ARRAY KERNEL") {
        def side(idCol: String, pre: String) = docGrams
          .join(cand.select(col(idCol).as("doc_id")).distinct(), Seq("doc_id"))
          .select(col("doc_id").as(idCol), col("gs").as(s"${pre}gs"),
            col("n").as(s"${pre}n"))
        cand
          .join(side("doc_a", "a").hint("shuffle_hash"), Seq("doc_a"))
          .join(side("doc_b", "b").hint("shuffle_hash"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            TextHash.hashPairIntersectSize(col("ags"), col("bgs")).as("i"),
            col("an").as("na"), col("bn").as("nb"))
          .filter(col("i") * 5 >= (col("na") + col("nb") - col("i")) * 3)
          .select(col("doc_a"), col("doc_b"),
            round(col("i") * 1.0 / (col("na") + col("nb") - col("i")), 6).as("jac"))
          .orderBy("doc_a", "doc_b").count()
      }
      Seq(g, docGrams, cand).foreach(graft.plans.Iterate.release)
    }
    spark.stop()
  }
}
