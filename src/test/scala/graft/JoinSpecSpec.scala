package graft

import graft.operators.JoinSpec
import graft.operators.JoinSpec.{Inner, Outer, Override, Tbl}
import org.scalatest.funsuite.AnyFunSuite

class JoinSpecSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "av")
  private def b = Seq((2L, "b2"), (3L, "b3"), (4L, "b4")).toDF("k", "bv")
  private def c = Seq((3L, "c3"), (5L, "c5")).toDF("k", "cv")

  test("inner(tbl(a), tbl(b)): emit only keys held by all sources") {
    val out = JoinSpec.compose(Inner(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv"))))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((2L, "a2", "b2"), (3L, "a3", "b3")))
  }

  test("outer(tbl(a), tbl(b), tbl(c)): emit keys held by any source, nulls elsewhere") {
    val out = JoinSpec.compose(Outer(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv"), Tbl(c, "k", "cv"))))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, "a1", null, null),
      (2L, "a2", "b2", null),
      (3L, "a3", "b3", "c3"),
      (4L, null, "b4", null),
      (5L, null, null, "c5")))
  }

  test("override(tbl(a), tbl(b)): rightmost source holding the key wins") {
    val out = JoinSpec.compose(Override(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv"))))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a1"), (2L, "b2"), (3L, "b3"), (4L, "b4")))
  }

  test("override with 11+ children: rightmost still wins (numeric v-column order)") {
    // v10 sorts lexicographically between v1 and v2 — a string sort would
    // make child 9 beat the rightmost child 10
    val kids = (0 until 11).map(i => Tbl(Seq((1L, s"v$i")).toDF("k", "x"), "k", "x"))
    val out = JoinSpec.compose(Override(kids)).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "v10")))
  }

  test("nested composite: inner(outer(a, b), tbl(c))") {
    val out = JoinSpec.compose(Inner(Seq(Outer(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv"))), Tbl(c, "k", "cv"))))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq((3L, "a3", "b3", "c3")))
  }

  // ---- the expression-string grammar ------------------------------------

  private def resolve: (String, String) => Tbl = {
    case ("seq", "a") => Tbl(a, "k", "av")
    case ("seq", "b") => Tbl(b, "k", "bv")
    case ("seq", "c") => Tbl(c, "k", "cv")
    case (cls, p) => fail(s"unexpected tbl($cls, $p)")
  }

  test("""parse: inner(tbl(seq,"a"),tbl(seq,"b")) matches the typed ADT""") {
    val parsed = JoinSpec.parse("""inner(tbl(seq,"a"),tbl(seq,"b"))""", resolve)
    val typed = Inner(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv")))
    assert(JoinSpec.compose(parsed).orderBy("key").collect().toSeq ===
      JoinSpec.compose(typed).orderBy("key").collect().toSeq)
  }

  test("parse: the reference grammar's nested example shape with whitespace") {
    val parsed = JoinSpec.parse(
      """ override( tbl(seq, "a") , outer(tbl(seq,"b"), tbl(seq,"c")) ) """, resolve)
    // outer(b,c) has two value columns; override coalesces rightmost-first
    val out = JoinSpec.compose(parsed).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // key 3: c wins (rightmost), key 2/4: b, key 1: a, key 5: c
    assert(out.toSeq === Seq((1L, "a1"), (2L, "b2"), (3L, "c3"), (4L, "b4"), (5L, "c5")))
  }

  test("parse: user-defined op resolves through the define registry") {
    val op = new graft.operators.ConcatValsOp
    val parsed = JoinSpec.parse("""myop(tbl(seq,"a"),tbl(seq,"b"))""",
      resolve, name => if (name == "myop") Some(op) else None)
    val out = JoinSpec.compose(parsed).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a1"), (2L, "a2|b2"), (3L, "a3|b3"), (4L, "b4")))
  }

  test("parse: session-conf Class.forName registry (bsp.join.define analogue)") {
    spark.conf.set("graft.join.define.concat2", classOf[graft.operators.ConcatValsOp].getName)
    val parsed = JoinSpec.parse("""concat2(tbl(seq,"a"),tbl(seq,"c"))""",
      resolve, JoinSpec.definesFromConf(spark))
    val out = JoinSpec.compose(parsed).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a1"), (2L, "a2"), (3L, "a3|c3"), (5L, "c5")))
  }

  test("parse: malformed expressions fail with position info") {
    val ex1 = intercept[IllegalArgumentException] {
      JoinSpec.parse("""inner(tbl(seq,"a")""", resolve)
    }
    assert(ex1.getMessage.contains("expected ')'"))
    val ex2 = intercept[IllegalArgumentException] {
      JoinSpec.parse("""bogus(tbl(seq,"a"),tbl(seq,"b"))""", resolve)
    }
    assert(ex2.getMessage.contains("unknown op 'bogus'"))
    val ex3 = intercept[IllegalArgumentException] {
      JoinSpec.parse("""inner(tbl(seq,"a"),tbl(seq,"b")) extra""", resolve)
    }
    assert(ex3.getMessage.contains("trailing input"))
  }
}
