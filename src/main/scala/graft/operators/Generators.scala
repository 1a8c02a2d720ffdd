package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic-data generators and Monte-Carlo operators (SURVEY.md §2.1
  * generators + §2.4 Pi, check class [stat]): `FastGraphGen` /
  * `SymmetricMatrixGen` (`examples/src/main/java/org/apache/hama/examples/
  * util/FastGraphGen.java:48-120`, `util/SymmetricMatrixGen.java`) and
  * `PiEstimator` (`examples/.../PiEstimator.java:55-95`).
  *
  * Randomness discipline: the reference seeds `java.util.Random` per task;
  * here every draw is `xxhash64(row, stream, seed)` — a pure column
  * function, so the generated set is IDENTICAL regardless of partitioning
  * or executor count (stronger than `rand(seed)`, which fixes only the
  * per-partition stream). GeneratorsSpec asserts the structural invariants
  * the reference tests check (edge bounds, symmetry, π tolerance).
  */
object Generators extends QueryModule {

  private val seed = 42L

  /** uniform in [0,1) from a keyed hash */
  private def u01(k1: org.apache.spark.sql.Column, k2: org.apache.spark.sql.Column) =
    pmod(xxhash64(k1, k2, lit(seed)), lit(1000000L)).cast("double") / 1000000.0

  /** FastGraphGen: n vertices, up to d random out-edges each, no self loops */
  def graphGen(s: SparkSession, n: Int = 1000, d: Int = 5): DataFrame =
    s.range(n.toLong).select(col("id").as("src"),
        explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j"), lit(seed)), lit(n.toLong)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** SymmetricMatrixGen: sparse symmetric (i, j, v), mirrored off-diagonal */
  def symMatrixGen(s: SparkSession, n: Int = 200, perRow: Int = 3): DataFrame = {
    val upper = s.range(n.toLong).select(col("id").as("i"),
        explode(sequence(lit(0), lit(perRow - 1))).as("j0"))
      .select(col("i"),
        pmod(xxhash64(col("i"), col("j0"), lit(seed + 1)), lit(n.toLong)).as("j"),
        round(u01(col("i"), col("j0")) * 10.0, 4).as("v"))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j").agg(min("v").as("v"))
    upper.unionAll(
        upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("v")))
      .select(col("i"), col("j"), col("v"))
  }

  /** PiEstimator: 4 · P(x²+y² < 1) over m hashed-uniform samples; the
    * peers-send-local-counts-to-master shape collapses to one partial+final
    * aggregate (`examples/.../PiEstimator.java:55-95`). */
  def piEstimate(s: SparkSession, m: Long = 400000L): DataFrame =
    s.range(m).select(u01(col("id"), lit(0)).as("x"), u01(col("id"), lit(1)).as("y"))
      .agg((lit(4.0) * avg((col("x") * col("x") + col("y") * col("y") < 1.0).cast("double")))
        .as("pi_est"), count(lit(1)).as("n"))

  override val defs: Seq[Q] = Seq(
    // [stat]: hash-seeded — the generated SET is not reproducible in DuckDB
    // (no xxhash64), so each declared query emits a driver-hashable
    // INVARIANT row (same pattern as q_agg_approx / bipartite): booleans
    // the generator contract guarantees, stated trivially by the oracle.
    // GeneratorsSpec still checks the full structure on the raw output.
    Q("q_gen_graph",
      (s, _) => {
        val g = graphGen(s)
        val deg = g.groupBy("src").agg(count(lit(1)).as("outdeg"))
        g.agg(
            (count(lit(1)) > 0).as("nonempty"),
            (min(col("dst")) >= 0 && max(col("dst")) < 1000).as("dst_in_range"),
            (sum(when(col("src") === col("dst"), 1).otherwise(0)) === 0).as("no_self_loops"))
          .crossJoin(deg.agg((max("outdeg") <= 5).as("outdeg_bounded")))
      },
      Some("""SELECT true AS nonempty, true AS dst_in_range,
              true AS no_self_loops, true AS outdeg_bounded""")),
    Q("q_gen_symmatrix",
      (s, _) => {
        val m = symMatrixGen(s)
        val mirrored = m.as("a").join(m.as("b"),
            col("a.i") === col("b.j") && col("a.j") === col("b.i") &&
              col("a.v") === col("b.v"))
          .agg(count(lit(1)).as("matched"))
        m.agg(count(lit(1)).as("n"),
            (min("v") >= 0.0 && max("v") < 10.0).as("v_in_range"),
            (min("i") >= 0 && max("i") < 200 &&
              min("j") >= 0 && max("j") < 200).as("idx_in_range"))
          .crossJoin(mirrored)
          .select((col("n") > 0).as("nonempty"), col("v_in_range"),
            col("idx_in_range"), (col("matched") === col("n")).as("symmetric"))
      },
      Some("""SELECT true AS nonempty, true AS v_in_range,
              true AS idx_in_range, true AS symmetric""")),
    Q("q_pi_estimate",
      (s, _) => piEstimate(s).select(col("n"),
        (abs(col("pi_est") - lit(math.Pi)) < 0.02).as("within_tol")),
      Some("SELECT CAST(400000 AS BIGINT) AS n, true AS within_tol"))
  )
}
