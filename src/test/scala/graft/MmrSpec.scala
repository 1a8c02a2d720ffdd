package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** MMR re-ranking invariants. */
class MmrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("mmr picks 5 distinct members of each query's top-10 pool, top-1 first") {
    val topk = q("q_sim_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (q, rank, cand)
    val pool = topk.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    val first = topk.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val mmr = q("q_sim_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    mmr.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 5)
      val ids = rows.map(_._3)
      assert(ids.distinct.length == 5)
      assert(ids.toSet.subsetOf(pool(qid)))
      // MMR's first pick is pure relevance = the plain top-1
      assert(rows.minBy(_._2)._3 == first(qid))
    }
  }
}
