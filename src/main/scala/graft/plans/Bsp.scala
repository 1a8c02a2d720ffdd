package graft.plans

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.reflect.runtime.universe.TypeTag

/** The reference's CORE user surface — a `BSP<K1,V1,K2,V2,M>` program: N
  * long-running peers, each holding local state, exchanging typed messages,
  * meeting at a global barrier per superstep
  * (`core/src/main/java/org/apache/hama/bsp/BSP.java:28-55`,
  * `BSPPeer.java:34-205`: `send(peerName, msg)` / `getCurrentMessage()` /
  * `sync()`).
  *
  * Spark mapping: a peer is a keyed state row (peer index = the partition
  * identity Hama derives from task ids, `BSPPeer.java:81-94`), `sync()` is
  * the job boundary between supersteps, and message delivery is the shuffle
  * keyed by destination peer. Implemented as a thin delegate over the typed
  * [[Pregel]] loop — a BSP peer IS a vertex whose id is the peer index, with
  * Hama's exact unordered-delivery contract (`BSPPeer.java:38-39`).
  *
  * The input split a Hama peer reads (`peer.readNext`) maps to partition
  * pre-aggregation OUTSIDE the loop: summarize each partition of the input
  * into the peer's initial state (`init`), then message across supersteps —
  * the same shape as `PiEstimator` (`examples/.../PiEstimator.java:55-95`:
  * local compute in `bsp()`, send to master, master sums in `cleanup`).
  */
object Bsp {

  /** One peer's superstep result: new state, outgoing (dstPeer, msg) pairs,
    * and whether this peer votes to halt (reactivated by incoming messages,
    * like `Vertex.voteToHalt`). */
  final case class PeerResult[S, M](
      state: S,
      messages: Seq[(Long, M)] = Nil,
      halt: Boolean = false)

  /** Run a BSP program over `peers` initial states.
    *
    * @param superstep (peerIdx, state, inbox, superstepNo) => result; inbox
    *                  order is unspecified (Hama's explicit contract)
    */
  def run[S: TypeTag, M: TypeTag](
      spark: SparkSession,
      peers: Dataset[(Long, S)],
      maxSupersteps: Int,
      combiner: Option[(M, M) => M] = None,
      onSuperstep: Pregel.SuperstepHook = Pregel.noHook,
      partitions: Option[Int] = None)(
      superstep: (Long, S, Seq[M], Int) => PeerResult[S, M]): Dataset[(Long, S)] =
    Pregel.run[S, M, Unit](spark, peers, maxSupersteps, combiner,
      aggregator = None, onSuperstep = onSuperstep,
      partitions = partitions) { (id, s, msgs, step, _) =>
      val r = superstep(id, s, msgs, step)
      Pregel.ComputeResult(r.state, voteToHalt = r.halt, messages = r.messages)
    }
}
