package graft.examples

import graft.GraftSession
import graft.functions.VecOps.{cosine, vecDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the cell-blocked DBSCAN row (q_ml_dbscan) past the
  * 500-vector gate table: a generated corpus of micro-clusters (the
  * near-dup-pocket shape density clustering hunts at corpus scale) pushed
  * through the SAME pipeline shape — cell assignment, within-cell exact
  * ε-pairing, core scoring, min-label fixpoint — with the one upgrade a
  * 100 TB run needs: a TWO-LEVEL residual quantizer (coarse argmax, then
  * argmax of the residual against the coarse cell's sub-seeds — the
  * IMI/IVF-tree shape) so the cell count grows multiplicatively
  * (64 × 64 = 4096) while assignment cost stays 2 × 64 dots per vector,
  * never cells × dots.
  *
  * The corpus is adversarially structured for EXACT grading: 96% of ids
  * form 5-point micro-clusters whose center = coarse seed + 0.5 · fine
  * seed + 0.45 · per-group salt (so distinct groups sharing a cell sit at
  * cosine ≈ 0.86, well under ε = 0.97, while intra-group cosine ≈ 0.998,
  * well over); 4% are uniform scatter (cosine ≈ 0 to everything). The
  * probe therefore ASSERTS exact recovery — every group is one cluster of
  * 5 cores, every scatter point is noise — rather than eyeballing counts.
  *
  * Emits one JSON line per stage: wall seconds, occupied cells, max cell
  * population, candidate-pair count vs the N²/2 brute relation the
  * blocking avoids, ε-edges, CC rounds to fixpoint, and recovery checks.
  *
  * Run: DBSCAN_SCALE_VECS=200000 sbt "runMain graft.examples.DbscanScale"
  */
object DbscanScale {
  private val DIM = 64
  private val COARSE = 64
  private val FINE = 64 // sub-seeds per coarse cell → 4096 effective cells
  private val GROUP = 5 // micro-cluster size
  private val EPS = 0.97
  private val MINPTS = 4 // core ⇔ ≥ 3 ε-neighbors
  private val MAXROUNDS = 16

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("DBSCAN_SCALE_VECS", "200000").toLong
    val spark = GraftSession.get()

    def emit(stage: String, kv: (String, Any)*): Unit =
      println(s"""{"probe":"DbscanScale","stage":"$stage",${
        kv.map { case (k, v) => v match {
          case s: String => s""""$k":"$s""""
          case d: Double => f""""$k":$d%.4f"""
          case x => s""""$k":$x"""
        }}.mkString(",")}}""")

    // deterministic ±3 integer lattice per (salt, key, pos). The salt MUST
    // render as a BIGINT literal (`11L`): xxhash64 hashes INT and BIGINT
    // through different byte paths, so an un-suffixed `11` here would
    // silently generate seeds unrelated to the corpus centers.
    def latticeExpr(salt: Long, keyCol: String): String =
      s"transform(sequence(0, ${DIM - 1}), p -> " +
        s"CAST(pmod(xxhash64(${salt}L, $keyCol, p), 7) AS DOUBLE) - 3.0)"

    val nScatter = n / 25 // 4%
    val nClustered = n - nScatter
    val nGroups = (nClustered + GROUP - 1) / GROUP

    // clustered point: center(group) + tiny per-id noise; group center =
    // coarse seed + 0.5·fine seed + 0.45·group salt (salts 11/13/19; 17
    // is the noise). scatter point: uniform ±4, unattached to any seed.
    val vecSql =
      s"""CASE WHEN id < $nClustered THEN
            transform(sequence(0, ${DIM - 1}), p ->
              (CAST(pmod(xxhash64(11L, (id DIV $GROUP) % $COARSE, p), 7) AS DOUBLE) - 3.0)
              + 0.5 * (CAST(pmod(xxhash64(13L,
                  ((id DIV $GROUP) % $COARSE) * $FINE + (id DIV ($GROUP * $COARSE)) % $FINE, p), 7) AS DOUBLE) - 3.0)
              + 0.45 * (CAST(pmod(xxhash64(19L, id DIV $GROUP, p), 7) AS DOUBLE) - 3.0)
              + (CAST(pmod(xxhash64(17L, id, p), 1000) AS DOUBLE) / 1000.0 - 0.5) * 0.4)
          ELSE
            transform(sequence(0, ${DIM - 1}), p ->
              (CAST(pmod(xxhash64(23L, id, p), 1000) AS DOUBLE) / 125.0 - 4.0))
          END"""

    var t0 = System.nanoTime()
    val dir = GraftSession.tempDirCleanedOnExit("dbscan-scale").toString
    spark.range(n).select(col("id").as("vec_id"), expr(vecSql).as("v"))
      .write.mode("overwrite").parquet(s"$dir/raw")
    val emb = spark.read.parquet(s"$dir/raw")
    emit("corpus", "n" -> n, "dim" -> DIM, "groups" -> nGroups,
      "scatter" -> nScatter, "secs" -> ((System.nanoTime() - t0) / 1e9))

    // ---- two-level cell assignment ------------------------------------
    t0 = System.nanoTime()
    val coarse = spark.range(COARSE).select(col("id").cast("int").as("c1"),
      expr(latticeExpr(11L, "id")).as("s1")).localCheckpoint()
    val fine = spark.range(COARSE.toLong * FINE).select(
      (col("id") / FINE).cast("int").as("c1"),
      col("id").cast("int").as("cellId"),
      expr(latticeExpr(13L, "id")).as("s2")).localCheckpoint()
    // max_by carries only the cell ID through the aggregation buffer —
    // the winning seed re-joins from the broadcast side afterwards, so
    // the hash agg never shuffles 512-byte seed arrays per candidate row
    val lvl1 = emb.crossJoin(broadcast(coarse))
      .withColumn("d1", vecDot(col("v"), col("s1")))
      .groupBy("vec_id")
      .agg(first("v").as("v"),
        max_by(col("c1"), struct(col("d1"), -col("c1"))).as("c1"))
      .join(broadcast(coarse), "c1")
      .select(col("vec_id"), col("v"), col("c1"),
        expr("zip_with(v, s1, (a, b) -> a - b)").as("resid"))
    val cells = lvl1.join(broadcast(fine), "c1")
      .withColumn("d2", vecDot(col("resid"), col("s2")))
      .groupBy("vec_id")
      .agg(first("v").as("v"),
        max_by(col("cellId"), struct(col("d2"), -col("cellId"))).as("cell"))
      .localCheckpoint()
    val occ = cells.groupBy("cell").agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).as("cells"), max("m").as("maxm"),
        sum(expr("m * (m - 1) DIV 2")).as("cand")).collect()(0)
    emit("assign", "cells_occupied" -> occ.getLong(0),
      "max_cell" -> occ.getLong(1), "candidate_pairs" -> occ.getLong(2),
      "brute_pairs" -> (n * (n - 1) / 2),
      "avoided_x" -> (n * (n - 1) / 2.0 / occ.getLong(2)),
      "secs" -> ((System.nanoTime() - t0) / 1e9))

    // ---- within-cell exact ε-pairing + core scoring --------------------
    t0 = System.nanoTime()
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= EPS)
      .select("va", "vb").localCheckpoint()
    val edges = pairs.select(col("va").as("v"), col("vb").as("n"))
      .unionByName(pairs.select(col("vb").as("v"), col("va").as("n")))
      .localCheckpoint()
    val core = edges.groupBy("v").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= MINPTS - 1).select("v").localCheckpoint()
    val (nEdges, nCore) = (pairs.count(), core.count())
    emit("pairs", "eps_edges" -> nEdges, "cores" -> nCore,
      "secs" -> ((System.nanoTime() - t0) / 1e9))

    // ---- min-label fixpoint over core-core edges -----------------------
    t0 = System.nanoTime()
    val cedges = edges
      .join(core.withColumnRenamed("v", "cv"), col("v") === col("cv"))
      .join(core.withColumnRenamed("v", "cn"), col("n") === col("cn"))
      .select("v", "n").localCheckpoint()
    var lab = core.select(col("v"), col("v").as("lab")).localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < MAXROUNDS) {
      rounds += 1
      val next = lab.unionByName(
          cedges.join(lab.withColumnRenamed("v", "nv"), col("n") === col("nv"))
            .select(col("v"), col("lab")))
        .groupBy("v").agg(min("lab").as("lab"))
        .localCheckpoint()
      changed = next.join(lab.withColumnRenamed("lab", "old"), "v")
        .filter(col("lab") =!= col("old")).count()
      graft.plans.Iterate.release(lab)
      lab = next
    }
    require(changed == 0, s"CC did not converge in $MAXROUNDS rounds")
    val nClusters = lab.select("lab").distinct().count()
    emit("cluster", "clusters" -> nClusters, "cc_rounds" -> rounds,
      "secs" -> ((System.nanoTime() - t0) / 1e9))

    // ---- EXACT recovery grading ----------------------------------------
    t0 = System.nanoTime()
    // every clustered id is core, in a cluster of exactly GROUP members,
    // all from its own generator group; every scatter id is edge-less
    val sizes = lab.groupBy("lab").agg(count(lit(1)).as("sz"))
    val badSize = sizes.filter(col("sz") =!= GROUP).count()
    val impure = lab.withColumn("grp", expr(s"v DIV $GROUP"))
      .groupBy("lab").agg(countDistinct("grp").as("g")).filter(col("g") > 1)
      .count()
    val scatterWithEdges = edges.filter(col("v") >= nClustered).count()
    require(nCore == nClustered,
      s"expected every clustered point core: $nCore vs $nClustered")
    require(nClusters == nGroups, s"clusters $nClusters != groups $nGroups")
    require(badSize == 0, s"$badSize clusters off the group size")
    require(impure == 0, s"$impure clusters mix generator groups")
    require(scatterWithEdges == 0, s"$scatterWithEdges scatter ids got edges")
    emit("grade", "exact_recovery" -> true, "clusters" -> nClusters,
      "noise" -> nScatter, "secs" -> ((System.nanoTime() - t0) / 1e9))

    spark.stop()
  }
}
