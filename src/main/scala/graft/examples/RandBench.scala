package graft.examples

import graft.GraftSession
import graft.plans.Pregel
import graft.plans.Pregel.ComputeResult

/** Random-communication throughput harness — the Spark re-expression of the
  * reference's only benchmark (`examples/src/main/java/org/apache/hama/
  * examples/RandBench.java:40-117`: each peer sends <nCommunications>
  * messages of <sizeOfMsg> bytes to random peers per superstep, for
  * <nSupersteps> supersteps; wall-clock is the result). Here a superstep is
  * one Pregel iteration: messages ride the shuffle, the barrier is the job
  * boundary. Destinations are hash-picked (seeded) instead of Random.
  *
  * Run: sbt "runMain graft.examples.RandBench [msgBytes] [comms] [supersteps] [peers]"
  */
object RandBench {
  def main(args: Array[String]): Unit = {
    val msgBytes = args.lift(0).map(_.toInt).getOrElse(128)
    val comms = args.lift(1).map(_.toInt).getOrElse(16)
    val supersteps = args.lift(2).map(_.toInt).getOrElse(8)
    val peers = args.lift(3).map(_.toInt).getOrElse(1024)
    val spark = GraftSession.get()
    import spark.implicits._

    val payload = "x" * msgBytes
    val verts = spark.range(peers.toLong).map(id => (id.toLong, 0L))

    val t0 = System.nanoTime()
    val res = Pregel.run[Long, String, Unit](spark, verts, maxIter = supersteps)(
      (id, recvd, msgs, step, _) => {
        val outs = (0 until comms).map { i =>
          val dst = java.lang.Long.remainderUnsigned(
            (id + 1) * 0x9E3779B97F4A7C15L + (step.toLong << 16) + i, peers.toLong)
          (dst, payload)
        }
        ComputeResult(recvd + msgs.map(_.length.toLong).sum, messages = outs)
      })
    val totalRecvdBytes = res.map(_._2).reduce(_ + _)
    val secs = (System.nanoTime() - t0) / 1e9
    val totalMsgs = peers.toLong * comms * supersteps
    println(f"""{"metric":"randbench","value":$secs%.3f,"unit":"sec","msgs":$totalMsgs,""" +
      f""""msg_bytes":$msgBytes,"supersteps":$supersteps,"peers":$peers,""" +
      f""""recvd_bytes":$totalRecvdBytes,"msgs_per_sec":${totalMsgs / secs}%.0f}""")
    spark.stop()
  }
}
