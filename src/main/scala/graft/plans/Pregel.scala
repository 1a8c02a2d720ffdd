package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import scala.reflect.runtime.universe.TypeTag

/** Typed Pregel engine — the Spark re-expression of Hama's vertex-centric
  * runtime (`graph/src/main/java/org/apache/hama/graph/
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
  * Execution mapping — vertex OWNERSHIP, like the reference: Hama routes a
  * message to the peer that owns its destination vertex and vertices never
  * move (`GraphJobRunner.java:823-837`). Here the vertex state is an RDD
  * hash-partitioned by id ONCE at job start; every later derivation
  * (`mapValues`/`filter`/partitioner-aware union) preserves that
  * partitioning, so the per-superstep vertex↔inbox cogroup is a NARROW
  * dependency — the only shuffle per superstep is the message exchange
  * itself, reduced map-side under a combiner (`reduceByKey`). The previous
  * Dataset implementation re-exchanged the full vertex state every
  * superstep because a `localCheckpoint` behind typed object maps loses
  * its partitioning attribute lineage, doubling shuffle volume — at 100 TB
  * vertex state the ownership model is the difference between shuffling
  * messages and shuffling the graph. The RDD layer is the documented
  * carve-out here: the compute function is an opaque JVM lambda (no
  * Catalyst expression to optimize), and the fixed co-partitioning IS the
  * plan — the same reasoning that makes GraphX RDD-based.
  *
  * Barrier = the Spark job boundary; every superstep's state is
  * `localCheckpoint`ed (truncates the iterative lineage, materializes the
  * single pass that produces new state AND outgoing messages). The driver
  * holds only O(1) control data. Messages addressed to ids that don't
  * exist are dropped unless that id is added via `ComputeResult.add`.
  *
  * Fault tolerance: `localCheckpoint` blocks are executor-local — lose an
  * executor mid-job and the lineage-truncated state is unrecoverable (the
  * accepted cost of not re-writing HDFS every superstep). For long runs,
  * `Checkpointing(dir, every)` writes a DURABLE parquet snapshot of
  * (vertex state, in-flight messages, superstep) every `every` supersteps
  * — the analogue of the reference's checkpoint-based superstep recovery
  * (`core/.../bsp/ft/AsyncRcvdMsgCheckpointImpl.java:69-260`, fast-forward
  * `SuperstepBSP.java:61-77`) — and `resumeFrom(latestSnapshot(...))`
  * restarts the loop from the last committed superstep.
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
      seconds: Double,
      /** messages DELIVERED this superstep, i.e. after the per-
        * destination combiner ran (map-side reduce): under a combiner
        * this is the distinct-destination count, so sent − delivered is
        * exactly the shuffle volume the combiner removed — the
        * reference's Combiner contract made measurable
        * (`graph/.../GraphJobRunner.java:733-760`). Equal to the
        * PREVIOUS superstep's sends when no combiner is set. */
      messagesDelivered: Long = 0L)

  type SuperstepHook = SuperstepStats => Unit
  val noHook: SuperstepHook = _ => ()

  /** Durable-snapshot cadence: every `every` supersteps, write vertex
    * state + in-flight messages as parquet under `dir/step=N/` with a
    * `_COMMIT` marker (written LAST, so a crash mid-write leaves no
    * half-snapshot that `latestSnapshot` would trust). `dir` takes any
    * Hadoop filesystem scheme — local path here, `hdfs://`/`s3a://` on a
    * cluster. */
  final case class Checkpointing(dir: String, every: Int = 5)

  /** A committed superstep boundary: the state entering `superstep`. */
  final case class Snapshot[V, M](
      verts: Dataset[(Long, V, Boolean)],
      msgs: Dataset[(Long, M)],
      superstep: Int)

  /** Most recent committed snapshot under `dir`, if any. */
  def latestSnapshot[V: TypeTag, M: TypeTag](
      spark: SparkSession, dir: String): Option[Snapshot[V, M]] = {
    implicit val vEnc: ExpressionEncoder[(Long, V, Boolean)] =
      ExpressionEncoder[(Long, V, Boolean)]()
    implicit val mEnc: ExpressionEncoder[(Long, M)] = ExpressionEncoder[(Long, M)]()
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val steps = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("step="))
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_COMMIT")))
      .map(p => p.getName.stripPrefix("step=").toInt -> p)
    if (steps.isEmpty) None
    else {
      val (step, p) = steps.maxBy(_._1)
      Some(Snapshot(
        spark.read.parquet(new Path(p, "verts").toString).as[(Long, V, Boolean)],
        spark.read.parquet(new Path(p, "msgs").toString).as[(Long, M)],
        step))
    }
  }

  /** Partition count sized to the job, not the session: the reference sizes
    * peer count to the input splits (`core/.../bsp/BSPJobClient.java`
    * `job.setNumBspTask(splits)`), and a 200-vertex graph on 32 shuffle
    * partitions pays 10 supersteps of near-empty task launches (VERDICT r4
    * #3 measured it as the dominant cost of every small-graph loop).
    * clamp(rows / targetRowsPerPartition, 1, spark.sql.shuffle.partitions):
    * the session conf stays the CAP, so at scale (rows ≫ target × conf)
    * this degrades to exactly the old behavior. */
  def sizedPartitions(spark: SparkSession, vertexRows: Long,
      targetRowsPerPartition: Long = 20000L): Int = {
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.min(cap.toLong,
      math.max(1L, (vertexRows + targetRowsPerPartition - 1) / targetRowsPerPartition)).toInt
  }

  def run[V: TypeTag, M: TypeTag, A](
      spark: SparkSession,
      vertices: Dataset[(Long, V)],
      maxIter: Int,
      combiner: Option[(M, M) => M] = None,
      aggregator: Option[GlobalAggregator[V, A]] = None,
      onSuperstep: SuperstepHook = noHook,
      inboxOrdering: Option[Ordering[M]] = None,
      checkpointing: Option[Checkpointing] = None,
      resumeFrom: Option[Snapshot[V, M]] = None,
      partitions: Option[Int] = None)(
      compute: (Long, V, Seq[M], Int, Option[A]) => ComputeResult[V, M]): Dataset[(Long, V)] = {

    implicit val vertEnc: ExpressionEncoder[(Long, V, Boolean)] =
      ExpressionEncoder[(Long, V, Boolean)]()
    implicit val msgEnc: ExpressionEncoder[(Long, M)] = ExpressionEncoder[(Long, M)]()
    implicit val outEnc: ExpressionEncoder[(Long, V)] = ExpressionEncoder[(Long, V)]()
    // PairRDDFunctions needs ClassTags for the generic value types; derive
    // them from the TypeTags the typed API already carries
    implicit val vCt: scala.reflect.ClassTag[V] =
      scala.reflect.ClassTag(scala.reflect.runtime.universe.typeTag[V].mirror
        .runtimeClass(scala.reflect.runtime.universe.typeTag[V].tpe))
    implicit val mCt: scala.reflect.ClassTag[M] =
      scala.reflect.ClassTag(scala.reflect.runtime.universe.typeTag[M].mirror
        .runtimeClass(scala.reflect.runtime.universe.typeTag[M].tpe))

    val sc = spark.sparkContext
    // vertices are assigned to their owning partition here and NEVER move
    // again (Hama: vertex ownership is fixed at load,
    // GraphJobRunner.java:823-837); callers with a known/bounded vertex
    // count size the partitioner via `partitions` (see sizedPartitions),
    // default = one partition per shuffle slot
    val part = new HashPartitioner(partitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt))

    def materialize[T](rdd: RDD[T]): RDD[T] = {
      rdd.localCheckpoint()
      rdd.count(): Unit // eager: fills accumulators, truncates lineage
      rdd
    }
    def toDs(rdd: RDD[(Long, (V, Boolean))]): Dataset[(Long, V, Boolean)] =
      spark.createDataset(rdd.map { case (id, (v, h)) => (id, v, h) })

    var verts: RDD[(Long, (V, Boolean))] = materialize(
      resumeFrom.fold(vertices.rdd.map { case (id, v) => (id, (v, false)) })(
        _.verts.rdd.map { case (id, v, h) => (id, (v, h)) })
        .partitionBy(part))
    var msgs: RDD[(Long, M)] =
      resumeFrom.fold(sc.emptyRDD[(Long, M)])(_.msgs.rdd)
    // the aggregated value a resumed superstep would have seen is exactly
    // observe() of the restored vertex state (it is always derived from the
    // previous superstep's output), so resume recomputes it instead of
    // persisting the arbitrary A
    var aggValue: Option[A] =
      if (resumeFrom.isDefined) aggregator.map(_.observe(toDs(verts))) else None
    var superstep = resumeFrom.fold(0)(_.superstep)
    var done = false
    // blocks superseded this superstep; freed once the next superstep's
    // checkpoints are materialized (the barrier releases the old queues)
    var retired: List[RDD[_]] = Nil

    while (!done && superstep < maxIter) {
      val tStep = System.nanoTime()
      // deliver: shuffle messages TO the vertex partitioner — combiner =
      // map-side combine (reduceByKey), so at high fan-in each sending
      // partition emits at most one pre-reduced message per destination
      val inbox: RDD[(Long, Seq[M])] = combiner match {
        case Some(c) => msgs.reduceByKey(part, c).mapValues(Seq(_))
        case None =>
          // optional sorted delivery — Hama's SortedMemoryQueue behaviour
          // (`core/.../bsp/message/queue/SortedMemoryQueue.java:32-39`,
          // selected via `BSPJob.setMessageQueueBehaviour`); default is the
          // unordered contract
          val ord = inboxOrdering
          msgs.groupByKey(part).mapValues { ms =>
            val delivered = ms.toSeq
            ord.fold(delivered)(delivered.sorted(_))
          }
      }

      val step = superstep
      val aggIn = aggValue
      val fn = compute
      // O(1) control data via accumulators filled during the (eager)
      // checkpoint materialization — no separate stats job per superstep.
      // A hypothetical block-loss recompute could only inflate the counts,
      // which can delay the msgs==0 && active==0 halt but never fake it.
      val accMsgs = sc.longAccumulator("pregel.messagesSent")
      val accDelivered = sc.longAccumulator("pregel.messagesDelivered")
      val accActive = sc.longAccumulator("pregel.active")
      val accAdded = sc.longAccumulator("pregel.added")
      val accRemoved = sc.longAccumulator("pregel.removed")
      // verts and inbox share `part` → narrow cogroup: no vertex movement.
      // mapPartitions (not mapValues) because compute needs the vertex id;
      // keys pass through unchanged, so the partitioning is preserved.
      val stepped: RDD[(Long, (V, Boolean, Seq[(Long, M)], Seq[(Long, V)], Boolean))] =
        materialize(verts.leftOuterJoin(inbox, part).mapPartitions(iter =>
          iter.map { case (id, ((value, halted), in)) =>
            val delivered: Seq[M] = in.getOrElse(Nil)
            accDelivered.add(delivered.size.toLong)
            val out = if (delivered.nonEmpty || !halted || step == 0) {
              val r = fn(id, value, delivered, step, aggIn)
              // unconsumed inbox → self-addressed redelivery next superstep
              (r.value, r.voteToHalt,
                r.messages ++ r.unconsumed.map(m => (id, m)), r.add, r.remove)
            } else (value, halted, Seq.empty[(Long, M)], Seq.empty[(Long, V)], false)
            accMsgs.add(out._3.size.toLong)
            if (!out._2) accActive.add(1L)
            accAdded.add(out._4.size.toLong)
            if (out._5) accRemoved.add(1L)
            (id, out)
          }, preservesPartitioning = true))

      msgs = stepped.flatMap(_._2._3)
      val stats = (accMsgs.value.toLong, accActive.value.toLong,
        accAdded.value.toLong, accRemoved.value.toLong)

      val prevVerts = verts
      // filter + mapValues keep the partitioner: the kept vertices are a
      // narrow view over this superstep's materialized blocks
      val kept = stepped.filter(!_._2._5).mapValues(t => (t._1, t._2))
      verts = if (stats._3 == 0 && stats._4 == 0) kept
      else {
        // buffered topology mutations applied at superstep end; an added id
        // that already exists keeps the existing vertex. Competing adds of
        // the SAME new id in one superstep resolve deterministically — the
        // lowest adder id wins (then list position within that adder) —
        // rather than by partition/task arrival order, so job output never
        // depends on scheduling.
        val fresh = stepped
          .flatMap { case (adder, t) =>
            t._4.zipWithIndex.map { case ((nid, v), i) => (nid, (adder, i, v)) } }
          .reduceByKey(part, (a, b) =>
            if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b)
          .subtractByKey(kept, part)
          .mapValues(t => (t._3, false))
        // same partitioner on both sides → partitioner-aware union, then a
        // fresh materialization so the mutated state owns its blocks
        materialize(kept.union(fresh))
      }
      // stepped (this superstep) feeds msgs/verts of the NEXT superstep, so
      // retire it one superstep later; the previous superstep's blocks are
      // no longer reachable once this superstep's are materialized
      retired.foreach(_.unpersist(false))
      retired = List(stepped, prevVerts)

      aggValue = aggregator.map(_.observe(toDs(verts)))
      val aggHalt = (aggregator, aggValue) match {
        case (Some(a), Some(v)) => a.haltOn(v)
        case _ => false
      }
      done = (stats._1 == 0 && stats._2 == 0 && stats._3 == 0) || aggHalt
      onSuperstep(SuperstepStats(superstep, stats._1, stats._2, stats._3, stats._4,
        (System.nanoTime() - tStep) / 1e9,
        messagesDelivered = accDelivered.value.toLong))
      superstep += 1

      checkpointing.foreach { cp =>
        if (!done && superstep < maxIter && cp.every > 0 && superstep % cp.every == 0) {
          val base = new Path(cp.dir, s"step=$superstep")
          toDs(verts).write.mode("overwrite")
            .parquet(new Path(base, "verts").toString)
          spark.createDataset(msgs).write.mode("overwrite")
            .parquet(new Path(base, "msgs").toString)
          val fs = base.getFileSystem(sc.hadoopConfiguration)
          fs.create(new Path(base, "_COMMIT"), true).close()
        }
      }
    }
    toDs(verts).map { case (id, v, _) => (id, v) }
  }
}
