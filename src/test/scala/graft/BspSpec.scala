package graft

import graft.plans.{Bsp, Pregel}
import graft.plans.Bsp.PeerResult
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

case class PeerState(localHits: Long, total: Long)

/** The reference's core BSP program shape on the peer-level engine:
  * PiEstimator-style master collection (`examples/src/main/java/org/apache/
  * hama/examples/PiEstimator.java:55-95` — peers compute locally, send to
  * the master peer, master sums in cleanup) + counter parity. */
class BspSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("peers message local results to the master peer which sums them") {
    val nPeers = 8
    // peer i's "input split summary": local hit count = (i+1)*10
    val peers = (0L until nPeers.toLong).map(i => (i, PeerState((i + 1) * 10, 0L))).toDS()
    val stats = ArrayBuffer.empty[Pregel.SuperstepStats]

    val res = Bsp.run[PeerState, Long](spark, peers, maxSupersteps = 4,
      onSuperstep = stats += _) {
      case (id, s, _, 0) => // superstep 0: everyone reports to master peer 0
        PeerResult(s, messages = Seq((0L, s.localHits)), halt = true)
      case (id, s, msgs, _) if msgs.nonEmpty => // master reactivated by inbox
        PeerResult(s.copy(total = s.total + msgs.sum), halt = true)
      case (_, s, _, _) => PeerResult(s, halt = true)
    }

    val out = res.collect().toMap
    assert(out(0L).total === (1 to nPeers).map(_ * 10).sum)
    assert(out.values.count(_.total > 0) === 1, "only the master accumulated")

    // counter parity: superstep 0 sent one message per peer, then quiesced.
    // Counters are at-least-once (accumulators updated in a transformation;
    // see SuperstepStats), so assert the lower bound, not exact equality —
    // a task retry/speculative attempt may inflate them on a real cluster
    assert(stats.head.messagesSent >= nPeers)
    assert(stats.last.messagesSent === 0) // zero can't be inflated: quiesced
    assert(stats.forall(_.seconds > 0))
  }

  test("unordered delivery: result is order-insensitive (sum combiner optional)") {
    val peers = (0L until 4L).map(i => (i, PeerState(i + 1, 0L))).toDS()
    val combined = Bsp.run[PeerState, Long](spark, peers, maxSupersteps = 3,
      combiner = Some(_ + _)) {
      case (_, s, _, 0) => PeerResult(s, messages = Seq((0L, s.localHits)), halt = true)
      case (_, s, msgs, _) if msgs.nonEmpty =>
        PeerResult(s.copy(total = s.total + msgs.sum), halt = true)
      case (_, s, _, _) => PeerResult(s, halt = true)
    }
    assert(combined.collect().toMap.apply(0L).total === 10L)
  }
}
