package graft.examples

import graft.GraftSession
import graft.functions.VecOps.vecDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale evidence for the ANN serving path PAST the sf0.1 embeddings
  * table: a generated MILLION-vector clustered corpus (64 well-separated
  * centers + per-(id, pos) xxhash noise, all deterministic) pushed
  * through the same build-once / append-delta / query-many IVF-PQ shape
  * the q_sim_pq_persisted row gates:
  *
  *   - BUILD once: residual-PQ-encode every vector against a frozen
  *     codebook, write (vec_id, codes[]) parquet PARTITIONED BY CELL;
  *   - APPEND a 1% delta: encode only the new vectors — cost must track
  *     the delta, not the corpus;
  *   - SEARCH many: per query batch, probe NPROBE cells (partition
  *     pruning on the codes scan), ADC against the broadcast LUT,
  *     exact-rerank the ADC shortlist (the two-stage serving shape of
  *     q_sim_pq_refined);
  *   - BRUTE baseline: exact top-k over all N for the same queries —
  *     the recall oracle AND the cost the index exists to avoid.
  *
  * Emits one JSON line per stage: wall seconds, bytes (index vs raw),
  * scanned-file counts (pruning evidence), and recall@10 of ADC and of
  * the reranked shortlist vs brute.
  *
  * Run: ANN_SCALE_VECS=1000000 sbt "runMain graft.examples.AnnScale"
  */
object AnnScale {
  private val DIM = 64
  private val CELLS = 64
  private val M = 16         // subspaces
  private val SUB = DIM / M  // dims per subspace
  private val K = 64         // codewords per subspace (48-bit code)
  private val NPROBE = 4
  private val TOPK = 10
  private val SHORTLIST = 200 // ADC survivors per query that get reranked

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("ANN_SCALE_VECS", "1000000").toLong
    val nq = sys.env.getOrElse("ANN_SCALE_QUERIES", "100").toInt
    val spark = GraftSession.get()
    import spark.implicits._

    def emit(stage: String, kv: (String, Any)*): Unit =
      println(s"""{"probe":"AnnScale","stage":"$stage",${
        kv.map { case (k, v) => v match {
          case s: String => s""""$k":"$s""""
          case d: Double => f""""$k":$d%.3f"""
          case x => s""""$k":$x"""
        }}.mkString(",")}}""")

    // center c, pos p: two coprime lattices — distinct vectors for every
    // c < 77 (the single-lattice form collides at c ≡ c' mod 11), norm
    // ~26, far above the noise's ~5.4; noise is xxhash64-derived per
    // (salt, id, pos), continuous enough that exact top-k has no tie
    // plateaus. Noise quantum 1/500000: real embeddings have full-
    // entropy mantissas, and a coarse lattice would let the columnar
    // codec compress float64 to float32 size, hiding the storage ratio
    // the float32 segment below exists to measure.
    def centerExpr(cCol: String): String =
      s"CAST((p*7 + ($cCol)*13) % 11 - 5 AS DOUBLE) + " +
        s"CAST(((($cCol)*31 + p*3) % 7 - 3) * 1.5 AS DOUBLE)"
    def vecExpr(idCol: String, salt: Long): String =
      s"transform(sequence(0, ${DIM - 1}), p -> " +
        s"${centerExpr(s"$idCol % $CELLS")} + " +
        s"CAST(pmod(xxhash64($salt, $idCol, p), 1000000) AS DOUBLE) / 500000.0 - 1.0)"

    val dir = GraftSession.tempDirCleanedOnExit("ann-scale").toString
    val rawDir = s"$dir/raw"; val idxDir = s"$dir/idx"; val cbDir = s"$dir/cb"

    // ---- corpus --------------------------------------------------------
    var t0 = System.nanoTime()
    spark.range(n).select(col("id").as("vec_id"),
        expr(vecExpr("id", 1L)).as("v"))
      .write.mode("overwrite").parquet(rawDir)
    val tGen = (System.nanoTime() - t0) / 1e9
    val rawBytes = duBytes(rawDir)
    emit("corpus", "n" -> n, "dim" -> DIM, "secs" -> tGen, "bytes" -> rawBytes)

    val emb = spark.read.parquet(rawDir)
    val centers = spark.range(CELLS).select(col("id").cast("int").as("c"),
        expr(s"transform(sequence(0, ${DIM - 1}), p -> " +
          s"${centerExpr("id")})").as("cv"))
      .localCheckpoint()

    def cellOf(df: DataFrame, idCol: String, vCol: String): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(desc("cdot"), asc("c"))
      df.crossJoin(broadcast(centers))
        .withColumn("cdot", vecDot(col(vCol), col("cv")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col(idCol), col("c").as("cell"), col("cv"))
    }

    // frozen codebook: residual subvectors of K stride-sampled vectors
    // per subspace (FAISS-style: train once, reuse for every append)
    def residuals(df: DataFrame, idCol: String): DataFrame =
      cellOf(df, idCol, "v").join(df.withColumnRenamed("vec_id", idCol), idCol)
        .select(col(idCol), col("cell"),
          expr("zip_with(v, cv, (a, b) -> a - b)").as("r"))

    t0 = System.nanoTime()
    val seedR = residuals(emb.filter(col("vec_id") < K * 37)
        .filter(pmod(col("vec_id"), lit(37)) === 0), "vec_id")
      .withColumn("k", (col("vec_id") / 37).cast("int"))
    val cb = seedR.select(col("k"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> " +
          s"struct(m AS m, slice(r, m * $SUB + 1, $SUB) AS cbv))")).as("s"))
      .select(col("k"), col("s.m").as("m"), col("s.cbv").as("cbv"))
    cb.write.mode("overwrite").parquet(cbDir)
    val cbLoaded = spark.read.parquet(cbDir)

    // ---- BUILD: encode all N, one row per vector, partitioned by cell --
    def encode(df: DataFrame): DataFrame =
      residuals(df, "vec_id")
        .select(col("vec_id"), col("cell"), explode(expr(
          s"transform(sequence(0, ${M - 1}), m -> " +
            s"struct(m AS m, slice(r, m * $SUB + 1, $SUB) AS sv))")).as("s"))
        .select(col("vec_id"), col("cell"), col("s.m").as("m"), col("s.sv").as("sv"))
        .join(broadcast(cbLoaded), "m")
        .withColumn("dot", vecDot(col("sv"), col("cbv")))
        .groupBy("vec_id", "cell", "m")
        .agg(max_by(col("k"), struct(col("dot"), -col("k"))).as("ck"))
        .groupBy("vec_id", "cell")
        .agg(expr("transform(array_sort(collect_list(struct(m, ck))), x -> x.ck)").as("codes"))

    encode(emb).repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(idxDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val idxBytes = duBytes(idxDir)
    emit("build", "secs" -> tBuild, "index_bytes" -> idxBytes,
      "raw_bytes" -> rawBytes,
      "compression" -> (rawBytes.toDouble / idxBytes))

    // ---- APPEND a 1% delta against the frozen codebook -----------------
    t0 = System.nanoTime()
    val delta = spark.range(n, n + n / 100).select(col("id").as("vec_id"),
      expr(vecExpr("id", 1L)).as("v"))
    encode(delta).repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(idxDir)
    val tAppend = (System.nanoTime() - t0) / 1e9
    emit("append", "delta" -> (n / 100), "secs" -> tAppend,
      "frac_of_build" -> (tAppend / tBuild))

    // ---- SEARCH: nq queries, NPROBE cells each, ADC + exact rerank -----
    val queries = spark.range(nq).select(col("id").as("q_id"),
      expr(vecExpr("id", 2L)).as("qv")).localCheckpoint()
    t0 = System.nanoTime()
    val qCellW = Window.partitionBy("q_id").orderBy(desc("cdot"), asc("c"))
    val qCells = queries.crossJoin(broadcast(centers))
      .withColumn("cdot", vecDot(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(qCellW)).filter(col("rn") <= NPROBE)
      .select(col("q_id"), col("c").as("cell"),
        col("cdot").as("qcdot")).localCheckpoint()
    val probedCells = qCells.select("cell").distinct().count()
    // per-query LUT as a NESTED ARRAY (M x K doubles, ~100 KB for the
    // whole batch), broadcast and indexed per candidate row — the tight
    // ADC loop real servers run, instead of a 16x-row-exploding hash
    // join + shuffle per (candidate, subspace)
    val lutArr = queries.select(col("q_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> " +
          s"struct(m AS m, slice(qv, m * $SUB + 1, $SUB) AS qs))")).as("s"))
      .select(col("q_id").as("lq"), col("s.m").as("lm"), col("s.qs").as("qs"))
      .join(broadcast(cbLoaded), col("lm") === col("m"))
      .select(col("lq"), col("lm"), col("k"), vecDot(col("qs"), col("cbv")).as("lv"))
      .groupBy("lq", "lm")
      .agg(expr("transform(array_sort(collect_list(struct(k, lv))), x -> x.lv)").as("krow"))
      .groupBy("lq")
      .agg(expr("transform(array_sort(collect_list(struct(lm, krow))), x -> x.krow)").as("lut"))
      .localCheckpoint()
    val idx = spark.read.parquet(idxDir).join(broadcast(qCells), "cell")
    val scannedFiles = idx.inputFiles.length
    val totalFiles = spark.read.parquet(idxDir).inputFiles.length
    val adc = idx
      .join(broadcast(lutArr), col("lq") === col("q_id"))
      .withColumn("adc", col("qcdot") + expr(
        s"aggregate(sequence(0, ${M - 1}), 0D, (acc, m) -> acc + lut[m][codes[m]])"))
      .select("q_id", "vec_id", "adc")
    val shortW = Window.partitionBy("q_id").orderBy(desc("adc"), asc("vec_id"))
    val shortlist = adc.withColumn("rn", row_number().over(shortW))
      .filter(col("rn") <= SHORTLIST)
      .select("q_id", "vec_id", "adc").localCheckpoint()
    // exact rerank of the shortlist: nq*SHORTLIST true dots, not nq*N
    val rerank = shortlist.join(emb, "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("xdot", vecDot(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("xdot"), asc("vec_id"))))
      .filter(col("rn") <= TOPK)
      .select("q_id", "vec_id", "rn").localCheckpoint()
    val tSearch = (System.nanoTime() - t0) / 1e9
    emit("search", "queries" -> nq, "secs" -> tSearch,
      "secs_per_query" -> (tSearch / nq),
      "files_scanned" -> scannedFiles, "files_total" -> totalFiles,
      "cells_probed" -> probedCells)

    // ---- small-batch search: the per-query pruning evidence a big
    // batch legitimately hides (100 queries probe most cells; 3 probe
    // <= 12 of 64, and the scan must open only those partitions) -------
    val sq = queries.filter(col("q_id") < 3)
    val sqCells = sq.crossJoin(broadcast(centers))
      .withColumn("cdot", vecDot(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(qCellW)).filter(col("rn") <= NPROBE)
      .select(col("q_id"), col("c").as("cell"))
    // the probed cell set is known BEFORE the scan (an O(nq*NPROBE)
    // driver value), so serving opens ONLY those partition directories
    // — the manifest-pruned read a real index server does. (A filter on
    // the partition column prunes identically at execution time, but
    // DataFrame.inputFiles reports the unpruned listing, so the probe
    // constructs the pruned file set explicitly to make the claim
    // measurable.)
    val sqCellIds = sqCells.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val smallScan = spark.read.option("basePath", idxDir)
      .parquet(sqCellIds.map(c => s"$idxDir/cell=$c"): _*)
    emit("search_small", "queries" -> 3,
      "files_scanned" -> smallScan.inputFiles.length,
      "files_total" -> totalFiles,
      "cells_probed" -> sqCellIds.length)

    // ---- BRUTE baseline + recall ---------------------------------------
    t0 = System.nanoTime()
    val brute = spark.read.parquet(rawDir).crossJoin(broadcast(queries))
      .withColumn("xdot", vecDot(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("xdot"), asc("vec_id"))))
      .filter(col("rn") <= TOPK)
      .select("q_id", "vec_id").localCheckpoint()
    val tBrute = (System.nanoTime() - t0) / 1e9
    val hits = brute.join(rerank.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
      .count()
    val adcHits = brute.join(
      shortlist.withColumn("rn", row_number().over(shortW))
        .filter(col("rn") <= TOPK).select("q_id", "vec_id"),
      Seq("q_id", "vec_id")).count()
    emit("recall", "brute_secs" -> tBrute,
      "brute_secs_per_query" -> (tBrute / nq),
      "speedup_vs_brute" -> (tBrute / tSearch),
      "recall_at_10_adc" -> (adcHits.toDouble / (nq * TOPK)),
      "recall_at_10_reranked" -> (hits.toDouble / (nq * TOPK)))

    // ---- FLOAT32 serving artifacts (VERDICT r8 item 4): the reference
    // carries a full float family (commons/.../math/DenseFloatVector
    // .java:34, FloatVectorWritable.java) — at serving scale float64
    // vectors double the rerank read and the codebook broadcast for
    // precision ANN never uses. Persist the rerank store AND the
    // codebook as array<float>, run the SAME two-stage search reading
    // only float32 artifacts (VecDot reads float elements natively —
    // no up-cast copy, the VecDotCastElision seam), and require
    // recall@10 unchanged. The gate rows stay float64 because their
    // oracles recompute integer-unit LUTs from doubles; this segment
    // is the declared 100 TB deployment shape. ---------------------------
    t0 = System.nanoTime()
    val raw32Dir = s"$dir/raw32"; val cb32Dir = s"$dir/cb32"
    emb.select(col("vec_id"), col("v").cast("array<float>").as("v"))
      .write.mode("overwrite").parquet(raw32Dir)
    cbLoaded.select(col("k"), col("m"), col("cbv").cast("array<float>").as("cbv"))
      .write.mode("overwrite").parquet(cb32Dir)
    val raw32Bytes = duBytes(raw32Dir)
    val emb32 = spark.read.parquet(raw32Dir)
    val cb32 = spark.read.parquet(cb32Dir)
    // float32 LUT: double queries against the float32 codebook — VecDot
    // takes mixed element types without a cast node
    val lut32 = queries.select(col("q_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> " +
          s"struct(m AS m, slice(qv, m * $SUB + 1, $SUB) AS qs))")).as("s"))
      .select(col("q_id").as("lq"), col("s.m").as("lm"), col("s.qs").as("qs"))
      .join(broadcast(cb32), col("lm") === col("m"))
      .select(col("lq"), col("lm"), col("k"), vecDot(col("qs"), col("cbv")).as("lv"))
      .groupBy("lq", "lm")
      .agg(expr("transform(array_sort(collect_list(struct(k, lv))), x -> x.lv)").as("krow"))
      .groupBy("lq")
      .agg(expr("transform(array_sort(collect_list(struct(lm, krow))), x -> x.krow)").as("lut"))
      .localCheckpoint()
    val short32 = idx
      .join(broadcast(lut32), col("lq") === col("q_id"))
      .withColumn("adc", col("qcdot") + expr(
        s"aggregate(sequence(0, ${M - 1}), 0D, (acc, m) -> acc + lut[m][codes[m]])"))
      .select("q_id", "vec_id", "adc")
      .withColumn("rn", row_number().over(shortW))
      .filter(col("rn") <= SHORTLIST)
      .select("q_id", "vec_id").localCheckpoint()
    val rerank32 = short32.join(emb32, "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("xdot", vecDot(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("xdot"), asc("vec_id"))))
      .filter(col("rn") <= TOPK)
      .select("q_id", "vec_id").localCheckpoint()
    val tSearch32 = (System.nanoTime() - t0) / 1e9
    val hits32 = brute.join(rerank32, Seq("q_id", "vec_id")).count()
    val recall64 = hits.toDouble / (nq * TOPK)
    val recall32 = hits32.toDouble / (nq * TOPK)
    emit("float32", "rerank_bytes_f64" -> rawBytes,
      "rerank_bytes_f32" -> raw32Bytes,
      "bytes_ratio" -> (rawBytes.toDouble / raw32Bytes),
      "search_secs" -> tSearch32,
      "recall_at_10_f64" -> recall64, "recall_at_10_f32" -> recall32)
    require(recall32 >= recall64 - 0.005,
      s"float32 serving path lost recall: $recall32 vs $recall64")
    spark.stop()
  }

  private def duBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
      st.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
    }
  }
}
