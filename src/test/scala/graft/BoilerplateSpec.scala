package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of q_dedup_boilerplate that the hash oracle
  * cannot express directly: the cleaned text is exactly the in-order
  * concatenation of this doc's blocks that no other doc shares. */
class BoilerplateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("cleaned text = ordered concatenation of unshared blocks; duplicates collapse") {
    val rows = SparkEntry.queries("q_dedup_boilerplate")(spark, TestSpark.sf0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    // recompute blocks on the driver from the raw docs
    val docs = Tables(spark, TestSpark.sf0, "documents")
      .selectExpr("doc_id", "filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0) AS tk")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val blocksByDoc = docs.map { case (id, tk) =>
      id -> tk.grouped(8).map(_.mkString(" ")).toVector
    }.toMap
    val docsPerBlock = blocksByDoc.toSeq
      .flatMap { case (id, bs) => bs.distinct.map(b => (b, id)) }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).distinct.size }

    rows.foreach { case (id, nBlocks, nRemoved, cleaned) =>
      val bs = blocksByDoc(id)
      assert(nBlocks === bs.length.toLong, s"doc $id block count")
      val kept = bs.filter(b => docsPerBlock(b) < 2)
      assert(nRemoved === (bs.length - kept.length).toLong, s"doc $id removed count")
      assert(cleaned === kept.mkString(" "), s"doc $id cleaned text")
    }
    // the corpus actually contains cross-document blocks (else the op is vacuous)
    assert(rows.map(_._3).sum > 0, "some boilerplate must be removed")
    // exact-duplicate docs lose ALL their blocks
    val dupIds = docs.groupBy(_._2).values.filter(_.length >= 2).flatMap(_.map(_._1))
    dupIds.foreach { id =>
      val r = rows.find(_._1 == id).get
      assert(r._4.isEmpty, s"exact-dup doc $id should be fully boilerplate")
    }
  }
}
