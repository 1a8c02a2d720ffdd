package graft.plans

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import scala.reflect.runtime.universe.TypeTag

/** Typed Pregel engine on Datasets — the Spark re-expression of Hama's
  * vertex-centric runtime (`graph/src/main/java/org/apache/hama/graph/
  * GraphJobRunner.java:157-351`), with its exact control semantics:
  *
  *  - superstep 0 runs `compute` on EVERY vertex with an empty inbox
  *    (`doInitialSuperstep:318-351`);
  *  - afterwards a vertex computes when it received messages OR has not
  *    voted to halt (`doSuperstep:291-298`);
  *  - a halted vertex is reactivated by an incoming message
  *    (`Vertex.java:188-210`);
  *  - the job halts globally when no messages are in flight and every
  *    vertex is halted, or at `maxIter` (`GraphJob.setMaxIteration`,
  *    `GraphJobRunner:163-181`);
  *  - an optional commutative combiner merges messages per destination
  *    before delivery (`Combiner.java:22-31`, applied per-destination in
  *    `GraphJobRunner:733-760`);
  *  - an optional global aggregator runs after each superstep; its
  *    finalized value is visible to every vertex in the NEXT superstep and
  *    can trigger a master halt (`Aggregator.java:31-41`,
  *    `AggregationRunner.java:58-236`);
  *  - vertex additions/removals requested during `compute` are buffered
  *    and applied at superstep end (`Vertex.java:102-130`,
  *    `GraphJobRunner:574-597,696-702`).
  *
  * Execution mapping: messaging = one shuffle keyed by destination id per
  * superstep; combiner = typed reduce (map-side partial); barrier = the
  * Spark job boundary; every superstep's state is `localCheckpoint`ed,
  * which both truncates the iterative lineage and materializes the single
  * pass that produces new state AND outgoing messages. The driver holds
  * only O(1) control data (counts + the aggregated value). Messages
  * addressed to ids that don't exist are dropped unless that id is added
  * via `ComputeResult.add`.
  */
object Pregel {

  /** Result of one vertex compute call.
    *
    * `unconsumed` is the PERSISTENT_QUEUE analogue
    * (`core/.../bsp/message/AbstractMessageManager.java:145-161`,
    * `MessageQueue.PERSISTENT_QUEUE`): messages the vertex leaves in its
    * inbox are redelivered to it next superstep, merged with newly arriving
    * ones. Carried messages count as in-flight, so the global halt cannot
    * fire while any inbox is non-empty — a message survives an idle
    * superstep exactly as in the reference's TestPersistQueue. They travel
    * the same dst-keyed exchange as ordinary messages (key = own id, so
    * they stay in their shuffle partition); under a combiner they merge
    * with fresh arrivals at delivery, which a commutative-associative
    * combiner must tolerate anyway. */
  final case class ComputeResult[V, M](
      value: V,
      voteToHalt: Boolean = false,
      messages: Seq[(Long, M)] = Nil,
      remove: Boolean = false,
      add: Seq[(Long, V)] = Nil,
      unconsumed: Seq[M] = Nil)

  /** Per-superstep global aggregation (master side): fold over vertex
    * values on executors via `observe`, finalized value re-broadcast to the
    * next superstep; `haltOn` is the master halt of AggregationRunner. */
  final case class GlobalAggregator[V, A](
      observe: Dataset[(Long, V, Boolean)] => A,
      haltOn: A => Boolean = (_: A) => false)

  /** Counter/timing parity with the reference's `PeerCounter` enum and
    * per-superstep INFO logs (`core/src/main/java/org/apache/hama/bsp/
    * BSPPeerImpl.java:65-67` TOTAL_MESSAGES_SENT / SUPERSTEP_SUM,
    * `graph/.../GraphJobRunner.java:139-155,277-312` superstep ms).
    *
    * Delivery semantics: AT-LEAST-ONCE. The counts come from accumulators
    * updated inside the checkpoint-materializing transformation, so task
    * retries or speculative attempts can inflate them (never deflate);
    * exact-once would cost a second job per superstep. The halt direction
    * is safe — inflation can only delay the all-zero halt, never fake it —
    * and consumers should treat the values as lower-bounded telemetry, not
    * exact ledger entries (Hama's own counters behave the same way under
    * task retry). */
  final case class SuperstepStats(
      superstep: Int,
      messagesSent: Long,
      activeVertices: Long,
      added: Long,
      removed: Long,
      seconds: Double)

  type SuperstepHook = SuperstepStats => Unit
  val noHook: SuperstepHook = _ => ()

  def run[V: TypeTag, M: TypeTag, A](
      spark: SparkSession,
      vertices: Dataset[(Long, V)],
      maxIter: Int,
      combiner: Option[(M, M) => M] = None,
      aggregator: Option[GlobalAggregator[V, A]] = None,
      onSuperstep: SuperstepHook = noHook,
      inboxOrdering: Option[Ordering[M]] = None)(
      compute: (Long, V, Seq[M], Int, Option[A]) => ComputeResult[V, M]): Dataset[(Long, V)] = {

    implicit val vertEnc: ExpressionEncoder[(Long, V, Boolean)] =
      ExpressionEncoder[(Long, V, Boolean)]()
    implicit val msgEnc: ExpressionEncoder[(Long, M)] = ExpressionEncoder[(Long, M)]()
    implicit val inboxEnc: ExpressionEncoder[(Long, Seq[M])] = ExpressionEncoder[(Long, Seq[M])]()
    implicit val stepEnc: ExpressionEncoder[((Long, V, Boolean), Seq[(Long, M)], Seq[(Long, V)], Boolean)] =
      ExpressionEncoder[((Long, V, Boolean), Seq[(Long, M)], Seq[(Long, V)], Boolean)]()
    implicit val outEnc: ExpressionEncoder[(Long, V)] = ExpressionEncoder[(Long, V)]()
    implicit val statsEnc: ExpressionEncoder[(Long, Long, Long, Long)] =
      ExpressionEncoder[(Long, Long, Long, Long)]()
    implicit val keyEnc: ExpressionEncoder[Long] = ExpressionEncoder[Long]()
    // (newId, adderId, listIdx, value) rows for deterministic add resolution
    implicit val addEnc: ExpressionEncoder[(Long, Long, Int, V)] =
      ExpressionEncoder[(Long, Long, Int, V)]()

    var verts: Dataset[(Long, V, Boolean)] =
      vertices.map { case (id, v) => (id, v, false) }.localCheckpoint()
    var msgs: Dataset[(Long, M)] = spark.emptyDataset[(Long, M)]
    var aggValue: Option[A] = None
    var superstep = 0
    var done = false
    // checkpoints superseded this superstep; freed once the next superstep's
    // checkpoints are materialized (the barrier releases the old queues)
    var retired: List[Dataset[_]] = Nil

    while (!done && superstep < maxIter) {
      val tStep = System.nanoTime()
      // deliver: group by destination; combiner = typed partial reduce
      val inbox: Dataset[(Long, Seq[M])] = combiner match {
        case Some(c) => msgs.groupByKey(_._1)
          .reduceGroups((a, b) => (a._1, c(a._2, b._2)))
          .map { case (id, m) => (id, Seq(m._2)) }
        case None =>
          // optional sorted delivery — Hama's SortedMemoryQueue behaviour
          // (`core/.../bsp/message/queue/SortedMemoryQueue.java:32-39`,
          // selected via `BSPJob.setMessageQueueBehaviour`); default is the
          // unordered contract
          val ord = inboxOrdering
          msgs.groupByKey(_._1).mapGroups { (id, it) =>
            val delivered = it.map(_._2).toSeq
            (id, ord.fold(delivered)(delivered.sorted(_)))
          }
      }

      val step = superstep
      val aggIn = aggValue
      val fn = compute
      // O(1) control data via accumulators filled during the (eager)
      // checkpoint materialization — no separate stats job per superstep.
      // A hypothetical block-loss recompute could only inflate the counts,
      // which can delay the msgs==0 && active==0 halt but never fake it.
      val accMsgs = spark.sparkContext.longAccumulator("pregel.messagesSent")
      val accActive = spark.sparkContext.longAccumulator("pregel.active")
      val accAdded = spark.sparkContext.longAccumulator("pregel.added")
      val accRemoved = spark.sparkContext.longAccumulator("pregel.removed")
      val stepped = verts
        .joinWith(inbox, verts("_1") === inbox("_1"), "left_outer")
        .map { case ((id, value, halted), in) =>
          val delivered: Seq[M] = if (in == null) Nil else in._2
          val out = if (delivered.nonEmpty || !halted || step == 0) {
            val r = fn(id, value, delivered, step, aggIn)
            // unconsumed inbox → self-addressed redelivery next superstep
            ((id, r.value, r.voteToHalt),
              r.messages ++ r.unconsumed.map(m => (id, m)), r.add, r.remove)
          } else ((id, value, halted), Seq.empty[(Long, M)], Seq.empty[(Long, V)], false)
          accMsgs.add(out._2.size.toLong)
          if (!out._1._3) accActive.add(1L)
          accAdded.add(out._3.size.toLong)
          if (out._4) accRemoved.add(1L)
          out
        }
        .localCheckpoint() // one materialized pass feeds state, msgs and stats

      msgs = stepped.flatMap(_._2)
      val stats = (accMsgs.value.toLong, accActive.value.toLong,
        accAdded.value.toLong, accRemoved.value.toLong)

      val prevVerts = verts
      val kept = stepped.filter(!_._4).map(_._1)
      verts = if (stats._3 == 0 && stats._4 == 0) kept
      else {
        // buffered topology mutations applied at superstep end; an added id
        // that already exists keeps the existing vertex. Competing adds of
        // the SAME new id in one superstep resolve deterministically — the
        // lowest adder id wins (then list position within that adder) —
        // rather than by partition/task arrival order, so job output never
        // depends on scheduling.
        val newOnes = stepped
          .flatMap(t => t._3.zipWithIndex.map { case ((nid, v), i) => (nid, t._1._1, i, v) })
          .groupByKey(_._1)
          .reduceGroups((a, b) =>
            if (a._2 < b._2 || (a._2 == b._2 && a._3 <= b._3)) a else b)
          .map(m => (m._2._1, m._2._4, false))
          .toDF("id", "value", "halted")
          .join(kept.toDF("id", "value", "halted").select("id"), Seq("id"), "left_anti")
          .as[(Long, V, Boolean)]
        kept.union(newOnes).localCheckpoint()
      }
      // stepped (this superstep) feeds msgs/verts of the NEXT superstep, so
      // retire it one superstep later; the previous superstep's checkpoints
      // are no longer reachable once this superstep's are materialized
      retired.foreach(graft.plans.Iterate.release)
      retired = List(stepped, prevVerts)

      aggValue = aggregator.map(_.observe(verts))
      val aggHalt = (aggregator, aggValue) match {
        case (Some(a), Some(v)) => a.haltOn(v)
        case _ => false
      }
      done = (stats._1 == 0 && stats._2 == 0 && stats._3 == 0) || aggHalt
      onSuperstep(SuperstepStats(superstep, stats._1, stats._2, stats._3, stats._4,
        (System.nanoTime() - tStep) / 1e9))
      superstep += 1
    }
    verts.map { case (id, v, _) => (id, v) }
  }
}
