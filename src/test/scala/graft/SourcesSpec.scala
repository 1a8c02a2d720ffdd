package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantee for the bucketed co-located join: with broadcast
  * off (forcing sort-merge), the join of two tables bucketed+sorted on the
  * join key must read bucket files aligned one-to-one — no shuffle exchange
  * below the join. This is the property that keeps the fact-table side
  * shuffle-free at any scale; the aggregate above the join may shuffle.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q_join_bucketed sort-merge-joins without a shuffle below the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_join_bucketed")(spark, TestSpark.sf0)
      df.collect() // force AQE to finalize the executed plan
      // AQE wraps stages, so assert on the finalized plan text: the join
      // must be sort-merge over Bucketed scans with NO exchange on either
      // join key (the aggregate above may still hash-shuffle on nationkey)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size >= 2,
        s"both sides must read bucketed files:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_sink_partitioned prunes partitions at the file listing") {
    val df = SparkEntry.queries("q_sink_partitioned")(spark, TestSpark.sf0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate must be a PARTITION filter (applied when listing
    // directories), not a data filter pushed into row groups
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected a partition filter on lang in:\n$plan")
    assert("PushedFilters: \\[\\]".r.findFirstIn(plan).isDefined,
      s"no data filter should remain once lang prunes at listing:\n$plan")
  }

  test("WorkerPool: one child per command, reused, respawned after death") {
    import graft.operators.WorkerPool
    val cmd = Seq("sed", "-u", "s/^/>/")
    val w1 = WorkerPool.get(cmd)
    assert(w1.call("abc") === ">abc")
    // same command → the SAME live child (the per-peer lifetime)
    assert(WorkerPool.get(cmd).pid === w1.pid)
    // concurrent callers serialize through the synchronized pipe and
    // each still gets its own 1:1 response
    val results = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (1 to 8).map(i => new Thread(() => {
      results.add(WorkerPool.get(cmd).call(s"line$i")): Unit
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet === (1 to 8).map(i => s">line$i").toSet)
    // a dead child is respawned on next acquisition, not handed out
    val killed = new ProcessBuilder("kill", w1.pid.toString).start()
    killed.waitFor()
    Thread.sleep(200)
    val w2 = WorkerPool.get(cmd)
    assert(w2.pid !== w1.pid, "a dead worker must be respawned")
    assert(w2.call("xyz") === ">xyz")
  }

  test("WorkerPool framed protocol round-trips binary payloads with newlines") {
    import graft.operators.WorkerPool
    val w = WorkerPool.get(graft.operators.Sources.framedChildCmd)
    val vals = Array(1.5, -2.25, 4.0e-3, 10.0, 1.0 / 3.0)
    val bb = java.nio.ByteBuffer.allocate(8 * vals.length)
    vals.foreach(bb.putDouble)
    val payload = bb.array()
    val resp = w.callFrame(payload)
    assert(resp.length === 8)
    assert(java.nio.ByteBuffer.wrap(resp).getDouble === vals.sum)
    // repeated frames through the SAME child must stay in sync
    val again = w.callFrame(payload)
    assert(java.nio.ByteBuffer.wrap(again).getDouble === vals.sum)
    assert(WorkerPool.get(graft.operators.Sources.framedChildCmd).pid === w.pid,
      "the framed child is pooled like any worker")
    // a payload that CONTAINS the line terminator must round-trip intact
    val nlVals = Array(java.lang.Double.longBitsToDouble(0x0A0A0A0A0A0A0A0AL), 2.0)
    val nb = java.nio.ByteBuffer.allocate(16)
    nlVals.foreach(nb.putDouble)
    assert(nb.array().count(_ == '\n'.toByte) === 8)
    val nresp = w.callFrame(nb.array())
    assert(java.nio.ByteBuffer.wrap(nresp).getDouble === nlVals.sum)
  }

  test("callFrame rejects an implausible frame length instead of allocating for it") {
    import graft.operators.WorkerPool
    // a desynced child (here: one that answers with 0xFFFFFFFF) must
    // surface as a protocol error, not an OOM-sized allocation
    val w = WorkerPool.get(Seq("bash", "-c",
      "printf '\\xff\\xff\\xff\\xff'; exec cat > /dev/null"))
    val ex = intercept[IllegalArgumentException] {
      w.callFrame(Array[Byte](1, 2, 3))
    }
    assert(ex.getMessage.contains("desync"))
  }

  test("q_join_bucketed matches the unbucketed join") {
    val bucketed = SparkEntry.queries("q_join_bucketed")(spark, TestSpark.sf0).collect()
    val plain = Tables(spark, TestSpark.sf0, "orders")
      .join(Tables(spark, TestSpark.sf0, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
      .orderBy("c_nationkey")
      .collect()
    assert(bucketed.toSeq == plain.toSeq)
  }
}
