package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Driver-side superstep loop: the Spark shape of Hama's BSP barrier
  * (`core/src/main/java/org/apache/hama/bsp/BSPPeerImpl.java:390-452` —
  * each `peer.sync()` becomes one Spark job boundary). Periodic
  * `localCheckpoint` truncates the growing iterative lineage — the one
  * physical obligation Hama never had with its mutable in-memory vertices
  * (SURVEY.md §4): without it, plan depth grows linearly with supersteps
  * and analysis/codegen time dominates at high iteration counts.
  */
object Iterate {

  /** Free the block-store copy behind a localCheckpoint once a LATER
    * checkpoint has been eagerly materialized from it — otherwise every
    * superstep's blocks pile up for the whole job (Hama frees a superstep's
    * queues at the barrier; this is the same hygiene).
    *
    * Deliberately releases ONLY a dataset whose plan root is itself the
    * checkpoint (i.e. the exact value `localCheckpoint()` returned) and
    * no-ops otherwise: scanning the whole plan for LogicalRDDs would also
    * destroy checkpoints a caller merely DERIVED from — truncated lineage
    * means those blocks are the only copy (ADVICE r1). */
  def release(ds: org.apache.spark.sql.Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** localCheckpoint with a scalar metric OBSERVED during the
    * materializing job itself (optimization r15, guide §1/§5): every
    * discovered-fixpoint loop here used to pay one checkpoint job plus
    * one narrow count/max job per round for its halt condition; a
    * `Dataset.observe` metric is collected by the checkpoint's own
    * action, so the round costs ONE job. Returns (pinned frame, metric
    * value — None for an all-null aggregate, e.g. sum over zero rows).
    * The observed column never lands in the schema, so downstream plan
    * shapes are untouched. */
  def pinObserved(df: DataFrame, metric: Column,
      freshIds: Boolean = false): (DataFrame, Option[Any]) = {
    val obs = org.apache.spark.sql.Observation()
    val ck = df.observe(obs, metric.as("m")).localCheckpoint()
    // freshIds: re-root the checkpointed blocks under NEW attribute ids
    // (zero recompute — same RDD): loops that repeatedly join/union
    // descendants of their own state need this to dodge Catalyst's
    // stale-id traps (see sccTrimOn/anfSketch pin()); release() still
    // works because the plan root stays a LogicalRDD over the same rdd.
    val pinned =
      if (freshIds) df.sparkSession.createDataFrame(ck.rdd, ck.schema) else ck
    (pinned, Option(obs.get.getOrElse("m", null)))
  }

  /** [[pinObserved]] counting rows that satisfy `flag` — the changed-row
    * halt condition of the frontier loops. */
  def pinCountTrue(df: DataFrame, flag: Column,
      freshIds: Boolean = false): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{sum, when}
    val (pinned, m) =
      pinObserved(df, sum(when(flag, 1L).otherwise(0L)), freshIds)
    (pinned, m.map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** [[pinObserved]] counting ALL rows — loop gates that only need "is
    * the relation empty / how many rows landed" fold into the pin. */
  def pinCountAll(df: DataFrame, freshIds: Boolean = false): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{count, lit}
    val (pinned, m) = pinObserved(df, count(lit(1)), freshIds)
    (pinned, m.map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** `reliable = true` swaps the executor-local checkpoint for Spark's
    * reliable `Dataset.checkpoint()` (files under `sc.setCheckpointDir` —
    * HDFS on a cluster): blocks lost with an executor are recomputed from
    * the checkpoint FILES instead of killing the job — the analogue of the
    * reference's superstep checkpoint recovery
    * (`core/.../bsp/ft/AsyncRcvdMsgCheckpointImpl.java:69-260`). Costs one
    * filesystem write of the loop state per cadence; cadence × state size
    * is the knob (BASELINE.md records the measured overhead). */
  def apply(init: DataFrame, maxIter: Int, checkpointEvery: Int = 10,
      reliable: Boolean = false)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var cur = init
    var prevCkpt: DataFrame = null
    var i = 0
    while (i < maxIter) {
      cur = step(cur, i)
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < maxIter) {
        // eager either way: materialized before old blocks go
        cur = if (reliable) cur.checkpoint() else cur.localCheckpoint()
        if (prevCkpt != null) release(prevCkpt)
        prevCkpt = cur
      }
    }
    cur
  }

  /** Result of a discovered-fixpoint loop: `converged` is the EXPLICIT
    * halt flag — callers guarding against exhaustion must require it, not
    * infer it from `iters < maxIter`: a loop whose confirming zero-change
    * round lands exactly on round maxIter has iters == maxIter AND
    * converged (ADVICE r9 — the inferred form misreported that boundary
    * as guard exhaustion). */
  final case class Fixpoint(out: DataFrame, iters: Int, converged: Boolean) {
    def requireConverged(what: String): Fixpoint = {
      require(converged,
        s"$what: guard exhausted after $iters rounds without convergence")
      this
    }
  }

  /** Loop with a halt condition evaluated between supersteps (the Spark
    * analogue of Hama's global `updated` flag + aggregator-driven halt,
    * `graph/src/main/java/org/apache/hama/graph/GraphJobRunner.java:163-181`).
    * `step` returns (next, changedCount); halts when changedCount == 0.
    * Returns (final, itersRun) — itersRun counts the confirming round.
    * Callers that must distinguish convergence from exhaustion use
    * [[untilFixpointChecked]] and its explicit flag. */
  def untilFixpoint(init: DataFrame, maxIter: Int, checkpointEvery: Int = 10,
      reliable: Boolean = false)(
      step: (DataFrame, Int) => (DataFrame, Long)): (DataFrame, Int) = {
    val fp = untilFixpointChecked(init, maxIter, checkpointEvery, reliable)(step)
    (fp.out, fp.iters)
  }

  /** [[untilFixpoint]] returning the explicit [[Fixpoint]] record. */
  def untilFixpointChecked(init: DataFrame, maxIter: Int, checkpointEvery: Int = 10,
      reliable: Boolean = false)(
      step: (DataFrame, Int) => (DataFrame, Long)): Fixpoint = {
    var cur = init
    var prevCkpt: DataFrame = null
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val (next, changed) = step(cur, i)
      cur = next
      i += 1
      if (changed == 0) done = true
      else if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < maxIter) {
        // eager either way: materialized before old blocks go
        cur = if (reliable) cur.checkpoint() else cur.localCheckpoint()
        if (prevCkpt != null) release(prevCkpt) // same hygiene as apply()
        prevCkpt = cur
      }
    }
    Fixpoint(cur, i, done)
  }
}
