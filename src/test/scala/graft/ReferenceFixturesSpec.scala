package graft

import graft.operators.JoinSpec
import graft.operators.JoinSpec.{Outer, Override, Tbl}
import graft.plans.Pregel
import org.scalatest.funsuite.AnyFunSuite

/** vertex state for the fixture SSSP: current distance + weighted adj
  * (top-level so the Spark encoder needs no outer instance) */
case class RefSsspV(dist: Long, adj: Seq[(Long, Long)])

/** Exact-oracle fixtures ported from the reference's own test suite
  * (SURVEY §5 item (a)): the inputs and expected outputs are the
  * reference's, the execution is this engine's.
  */
class ReferenceFixturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // The 10-vertex weighted graph of the reference's SSSP test
  // (examples/src/test/.../SSSPTest.java:50-61): row index = vertex id,
  // each entry "dst:w".
  private val ssspInput = Seq(
    "1:85\t2:217\t4:173", // 0
    "0:85\t5:80", // 1
    "0:217\t6:186\t7:103", // 2
    "7:183", // 3
    "0:173\t9:502", // 4
    "1:80\t8:250", // 5
    "2:186", // 6
    "3:183\t9:167\t2:103", // 7
    "5:250\t9:84", // 8
    "4:502\t7:167\t8:84" // 9
  )

  // …and its expected shortest distances from vertex 0
  // (SSSPTest.java:123-132)
  private val ssspExpected = Map(
    0L -> 0L, 1L -> 85L, 2L -> 217L, 3L -> 503L, 4L -> 173L,
    5L -> 165L, 6L -> 403L, 7L -> 320L, 8L -> 415L, 9L -> 487L)

  test("SSSP: the reference's 10-vertex weighted graph, exact distances " +
      "(SSSPTest.java:50-61,123-145)") {
    val verts = ssspInput.zipWithIndex.map { case (line, id) =>
      val adj = line.split("\t").toSeq.map { e =>
        val Array(dst, w) = e.split(":")
        (dst.toLong, w.toLong)
      }
      (id.toLong, RefSsspV(Long.MaxValue, adj))
    }.toDS()
    // the reference vertex program (examples/.../SSSP.java:41-88): start
    // vertex proposes 0 at superstep 0, everyone else stays at infinity;
    // a vertex relaxes on the min incoming proposal and re-scatters
    // dist + w; MinIntCombiner (SSSP.java:62-70) = min message combiner;
    // always vote to halt, reactivated by messages.
    val out = Pregel.run[RefSsspV, Long, Unit](spark, verts, maxIter = 20,
      combiner = Some((a: Long, b: Long) => math.min(a, b))) { (id, v, msgs, step, _) =>
      val proposal =
        if (step == 0 && id == 0L) 0L
        else if (msgs.nonEmpty) msgs.min
        else Long.MaxValue
      if (proposal < v.dist)
        Pregel.ComputeResult(v.copy(dist = proposal), voteToHalt = true,
          messages = v.adj.map { case (dst, w) => (dst, proposal + w) })
      else Pregel.ComputeResult(v, voteToHalt = true)
    }
    val dists = out.collect().map { case (id, v) => id -> v.dist }.toMap
    assert(dists === ssspExpected)
  }

  test("composite outer join: the reference's a/b sequence fixture — " +
      "every joined tuple sums to 10 (TestCompositeInputFormat.java:57-115)") {
    // a.dat = (i, i), b.dat = (i, 10 - i) for i in 0..9; the reference's
    // JoinBSP asserts get(0) + get(1) == 10 for every composed tuple
    val a = (0 until 10).map(i => (i.toLong, i.toLong)).toDF("k", "va")
    val b = (0 until 10).map(i => (i.toLong, 10L - i)).toDF("k", "vb")
    val rows = JoinSpec.compose(Outer(Seq(Tbl(a, "k", "va"), Tbl(b, "k", "vb"))))
      .orderBy("key").collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) === 10L,
      s"tuple for key ${r.getLong(0)}"))
  }

  test("override(S1,S2,S3): S3 beats S2 beats S1 per key " +
      "(OverrideRecordReader.java:30-33 doc contract)") {
    val s1 = Seq((1L, "s1"), (2L, "s1"), (3L, "s1")).toDF("k", "v")
    val s2 = Seq((2L, "s2"), (3L, "s2")).toDF("k", "v")
    val s3 = Seq((3L, "s3")).toDF("k", "v")
    val out = JoinSpec.compose(Override(Seq(
        Tbl(s1, "k", "v"), Tbl(s2, "k", "v"), Tbl(s3, "k", "v"))))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "s1"), (2L, "s2"), (3L, "s3")))
  }

  test("connected components: the reference's MindistSearch 10-vertex " +
      "graph, exact min-id labels (MindistSearchTest.java:44-47)") {
    // input lines "v\tdst..." (MindistSearchTest.java:46-47)
    val adj = Seq(0L -> Seq(), 1L -> Seq(4L, 7L), 2L -> Seq(3L, 8L),
      3L -> Seq(5L), 4L -> Seq(1L), 5L -> Seq(6L), 6L -> Seq(), 7L -> Seq(),
      8L -> Seq(3L), 9L -> Seq(0L))
    val e = adj.flatMap { case (v, ds) => ds.map(d => (v, d)) }.toDF("src", "dst")
    val out = operators.Graph.ccLoop(e, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // resultList (MindistSearchTest.java:44-45): label of vertex i
    val expected = Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 1L, 8L -> 2L, 9L -> 0L)
    assert(out === expected)
  }

  test("k-core: the reference's 11-vertex kcore.txt graph, exact core " +
      "numbers (KCoreTest.java:60-62, resources/kcore.txt)") {
    val adj = Seq(1L -> Seq(2L), 2L -> Seq(1L, 3L, 9L, 8L, 5L), 3L -> Seq(2L),
      4L -> Seq(5L), 5L -> Seq(2L, 4L, 6L, 8L, 9L), 6L -> Seq(5L, 7L, 8L),
      7L -> Seq(6L), 8L -> Seq(2L, 5L, 6L, 9L, 10L, 11L), 9L -> Seq(2L, 5L, 8L),
      10L -> Seq(8L, 11L), 11L -> Seq(8L, 10L))
    val e = adj.flatMap { case (v, ds) => ds.map(d => (v, d)) }.toDF("src", "dst")
    val out = operators.Graph.kcoreLoop(e, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // KCoreTest.java:61-62: vertex -> core
    val expected = Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 3L,
      6L -> 2L, 7L -> 1L, 8L -> 3L, 9L -> 3L, 10L -> 2L, 11L -> 2L)
    assert(out === expected)
  }

  test("SpMV: the reference's 4x4 sparse matrix times dense vector = " +
      "(38, 12, 24, 11) (SpMVTest.java:101-141)") {
    // matrix cells (SpMVTest.java:101-120), vector (SpMVTest.java:124-131)
    val m = Seq((0L, 0L, 1.0), (0L, 2L, 6.0), (1L, 1L, 4.0), (2L, 1L, 2.0),
      (2L, 2L, 3.0), (3L, 0L, 3.0), (3L, 3L, 5.0)).toDF("i", "j", "mv")
    val v = Seq((0L, 2.0), (1L, 3.0), (2L, 6.0), (3L, 1.0)).toDF("j", "vv")
    // the q_ml_spmv shape: exploded-cell equi-join + per-row aggregate
    val u = m.join(org.apache.spark.sql.functions.broadcast(v), "j")
      .groupBy("i")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("mv") * org.apache.spark.sql.functions.col("vv")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(u === Map(0L -> 38.0, 1L -> 12.0, 2L -> 24.0, 3L -> 11.0))
  }
}
