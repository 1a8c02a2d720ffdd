package graft

import graft.plans.SuperstepPipeline
import org.scalatest.funsuite.AnyFunSuite

class SuperstepPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stages run round-robin and halt mid-chain") {
    val pipeline = new SuperstepPipeline[Long](Seq(
      (ds, _) => (ds.map(_ + 1), false),
      (ds, _) => {
        val doubled = ds.map(_ * 2)
        (doubled, doubled.head() > 100)
      }))
    val (out, steps) = pipeline.run(Seq(1L).toDS(), maxSupersteps = 100)
    // 1 →(+1,×2) 4 → 10 → 22 → 46 → 94 → 190 halt
    assert(out.head() === 190L)
    assert(steps === 12)
  }

  test("resume from a later superstep skips earlier stages (recovery fast-forward)") {
    val pipeline = new SuperstepPipeline[Long](Seq(
      (ds, _) => (ds.map(_ + 1), false),
      (ds, _) => (ds.map(_ * 2), false)))
    // starting at superstep 1 runs the ×2 stage first:
    // i=1 (×2 → 20), i=2 (+1 → 21), stop at maxSupersteps=3
    val (out, steps) = pipeline.run(Seq(10L).toDS(), maxSupersteps = 3, startSuperstep = 1)
    assert(out.head() === 21L)
    assert(steps === 3)
  }
}
