package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ForwardPush

/** Pins the content-derived state-partition rule (wave-quantization fix,
  * VERDICT r3 #2): in the parallel regime the count must DIVIDE evenly
  * into 2/4/8/16-core waves — a p that leaves a 1-task straggler wave
  * (e.g. 17 on 8 cores) caps scaling efficiency at (2k+1)/2k regardless
  * of the work inside. */
class StatePartsSpec extends AnyFunSuite {

  test("parallel-regime partition counts are multiples of 16 in [16,64]") {
    val edges = Seq(3000000L, 5000000L, 17299623L, 16506505L, 25000000L,
      40000000L, 64000000L, 500000000L)
    edges.foreach { m =>
      val p = ForwardPush.fastStateParts(m)
      assert(p % 16 == 0, s"m=$m p=$p not a multiple of 16")
      assert(p >= 16 && p <= 64, s"m=$m p=$p out of [16,64]")
    }
    // the hub regression case: 17.3M edges must NOT yield 17
    assert(ForwardPush.fastStateParts(17299623L) == 16)
    // the fora64 bench graph keeps its r3 partitioning (checksum-stable)
    assert(ForwardPush.fastStateParts(16506505L) == 16)
  }

  test("small-graph regime stays single-digit and content-derived") {
    assert(ForwardPush.fastStateParts(100000L) == 1)
    assert(ForwardPush.fastStateParts(1999999L) <= 4)
    // boundary: just above the local regime jumps to the parallel floor
    assert(ForwardPush.fastStateParts(2000001L) == 16)
  }
}
