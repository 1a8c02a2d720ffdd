package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Asof

class AsofSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def left =
    Seq((1L, 4L, "p4"), (1L, 15L, "p15"), (1L, 30L, "p30"), (1L, 50L, "p50"),
        (2L, 10L, "q10"))
      .toDF("k", "ts", "lid")

  // key 2 has no right rows at all; key 1 has a tie at ts=15
  private def right =
    Seq((1L, 5L, "r5", 50L), (1L, 15L, "r15a", 150L), (1L, 15L, "r15b", 151L),
        (1L, 40L, "r40", 400L))
      .toDF("k", "ts", "tag", "v")

  test("backward: inclusive, tie-broken, nulls when nothing precedes") {
    val out = Asof.backward(left, right, "k", "ts", Seq("tag", "v"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(4)).orNull, Option(r.get(5)).orNull, Option(r.get(3)).orNull))
      .toMap
    assert(out("p4") == (null, null, null)) // nothing at-or-before 4
    assert(out("p15") == ("r15b", 151L, 15L)) // inclusive; greatest of the ts-tie
    assert(out("p30") == ("r15b", 151L, 15L))
    assert(out("p50") == ("r40", 400L, 40L))
    assert(out("q10") == (null, null, null)) // key 2 has no right rows
  }

  test("forward: inclusive, earliest-at-or-after, nulls when nothing follows") {
    val out = Asof.forward(left, right, "k", "ts", Seq("tag", "v"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(4)).orNull, Option(r.get(5)).orNull, Option(r.get(3)).orNull))
      .toMap
    assert(out("p4") == ("r5", 50L, 5L))
    assert(out("p15") == ("r15a", 150L, 15L)) // inclusive; least of the ts-tie
    assert(out("p30") == ("r40", 400L, 40L))
    assert(out("p50") == (null, null, null))
    assert(out("q10") == (null, null, null))
  }

  test("NULL timestamps never fabricate matches, either side") {
    val l = Seq((1L, Option(4L), "p4"), (1L, Option.empty[Long], "pNull"))
      .toDF("k", "ts", "lid")
    val r = Seq((1L, Option.empty[Long], "rNull", 1L), (1L, Option(10L), "r10", 10L))
      .toDF("k", "ts", "tag", "v")
    val back = Asof.backward(l, r, "k", "ts", Seq("tag", "v"))
      .collect().map(x => x.getString(2) -> Option(x.get(4)).orNull).toMap
    // nothing at-or-before 4 (the NULL-ts right row must not be picked)
    assert(back("p4") == null)
    assert(back("pNull") == null)
    val fwd = Asof.forward(l, r, "k", "ts", Seq("tag", "v"))
      .collect().map(x => x.getString(2) -> Option(x.get(4)).orNull).toMap
    assert(fwd("p4") == "r10")
    // a NULL-ts left row is off the time axis: no match, not "earliest"
    assert(fwd("pNull") == null)
  }

  test("colliding output names are rejected up front") {
    val l = left.withColumnRenamed("lid", "asof_tag")
    intercept[IllegalArgumentException] {
      Asof.backward(l, right, "k", "ts", Seq("tag"))
    }
    intercept[IllegalArgumentException] {
      Asof.backward(left, right, "k", "ts", Seq("tag", "tag"))
    }
    intercept[IllegalArgumentException] {
      Asof.backward(left, right, "k", "ts", Seq("ts"))
    }
  }

  test("payload columns travel atomically (one struct = one right row)") {
    // every returned (asof_tag, asof_v, asof_ts) triple must be an actual
    // right-side row — mixed-row combinations cannot appear
    val rightRows = right.collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(1))).toSet
    val matched = Asof.backward(left, right, "k", "ts", Seq("tag", "v"))
      .filter("asof_tag IS NOT NULL").collect()
      .map(r => (r.getString(4), r.getLong(5), r.getLong(3)))
    assert(matched.nonEmpty)
    matched.foreach(t => assert(rightRows.contains(t), s"fabricated match $t"))
  }
}
