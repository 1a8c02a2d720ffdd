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

  test("nested composite: inner(outer(a, b), tbl(c))") {
    val out = JoinSpec.compose(Inner(Seq(Outer(Seq(Tbl(a, "k", "av"), Tbl(b, "k", "bv"))), Tbl(c, "k", "cv"))))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq((3L, "a3", "b3", "c3")))
  }
}
