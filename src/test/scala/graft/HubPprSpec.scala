package graft

import graft.ops._

/** O18 HubPPR: hub index = batched coarse push states + warm-start
  * refinement. Pinned properties:
  *  - a hub-source query matches the dense PPR oracle to the same tol
  *    as a cold deterministic push (the warm start refines to the same
  *    fixpoint bound);
  *  - the warm start SAVES work: query pushes from the hub state are
  *    strictly fewer than a cold query's (the cold prefix is amortized
  *    into the build);
  *  - non-hub sources fall through to the cold path with identical
  *    results (bitwise — same code path). */
class HubPprSpec extends SparkSpec {
  import TestGraphs._

  lazy val edges: Seq[(Int, Int)] = {
    val rnd = new scala.util.Random(11)
    (Seq.tabulate(80)(i => (i % 40, (i * 13 + 3) % 40)) ++
      Seq.tabulate(140)(_ => (rnd.nextInt(40), rnd.nextInt(40))) ++
      Seq.tabulate(25)(i => (7, (i * 3 + 1) % 40))) // 7 is a hub
      .filter(e => e._1 != e._2).distinct
  }
  val n = 40
  val tol = 1e-9

  test("hub-source query matches dense oracle; warm start saves pushes") {
    val g = graph(edges)
    try {
      val hubs = HubPpr.pickHubs(g, 3)
      assert(hubs.contains(7L), s"expected 7 among top-degree hubs $hubs")
      val idx = HubPpr.build(g, hubs, alpha = 0.2, rmaxCoarse = 1e-4)
      try {
        val hub = hubs.head
        val warm = HubPpr.query(g, idx, hub, tol)
        val want = DenseOracle.pprFix(n, edges, hub.toInt, 0.2)
        val got = scores(warm.state, "vid", "reserve")
        (0 until n).foreach { v =>
          val diff = math.abs(got.getOrElse(v.toLong, 0.0) - want(v))
          assert(diff <= tol + 1e-12, s"v=$v diff=$diff")
        }
        assert(warm.rsum <= tol + 1e-15)
        val cold = ForwardPush.deterministicPpr(g, Map(0 -> hub), 0.2, tol)
        assert(warm.pushes < cold.pushes,
          s"warm=${warm.pushes} !< cold=${cold.pushes}")
      } finally idx.table.unpersist()
    } finally g.unpersistAll()
  }

  test("non-hub source falls through to the cold path bitwise") {
    val g = graph(edges)
    try {
      val hubs = HubPpr.pickHubs(g, 2)
      val nonHub = (0 until n).map(_.toLong).find(!hubs.contains(_)).get
      val idx = HubPpr.build(g, hubs, alpha = 0.2, rmaxCoarse = 1e-4)
      try {
        val viaIdx = scores(HubPpr.query(g, idx, nonHub, tol).state,
          "vid", "reserve")
        val cold = scores(
          ForwardPush.deterministicPpr(g, Map(0 -> nonHub), 0.2, tol).state,
          "vid", "reserve")
        assert(viaIdx == cold)
      } finally idx.table.unpersist()
    } finally g.unpersistAll()
  }

  test("finer-than-index request is rejected") {
    val g = graph(edges)
    try {
      val idx = HubPpr.build(g, Seq(7L), alpha = 0.2, rmaxCoarse = 1e-12)
      try {
        intercept[IllegalArgumentException] {
          HubPpr.query(g, idx, 7L, tol = 1.0)
        }
        ()
      } finally idx.table.unpersist()
    } finally g.unpersistAll()
  }
}
