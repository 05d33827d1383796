package graft

import org.apache.spark.sql.functions._
import graft.ops._

class ForaSpec extends SparkSpec {
  import TestGraphs._

  lazy val edges: Seq[(Int, Int)] = {
    // deterministic ~150-edge digraph with a dangling vertex and a hub
    val rnd = new scala.util.Random(3)
    (Seq.tabulate(60)(i => (i % 30, (i * 7 + 1) % 30)) ++
      Seq.tabulate(90)(_ => (rnd.nextInt(30), rnd.nextInt(30))) ++
      Seq((0, 29))) // 29 has no out-edges unless random gave it some
      .filter(e => e._1 != e._2).filter(_._1 != 29).distinct
  }
  val n = 30

  test("fora (eps,delta) query: mass conservation + error within budget") {
    val g = graph(edges)
    try {
      val res = Fora.query(g, Map(0 -> 0L, 1 -> 7L),
        Fora.Params(eps = 0.5, seed = 42L))
      val rows = res.scores.collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // Σ over targets = 1 exactly-ish per query (reserve + walk mass)
      Seq(0, 1).foreach { q =>
        val tot = rows.collect { case ((`q`, _), s) => s }.sum
        assert(math.abs(tot - 1.0) < 1e-9, s"q=$q tot=$tot")
      }
      val want0 = DenseOracle.pprFix(n, edges, 0, 0.2)
      val delta = 1.0 / g.numVertices
      (0 until n).foreach { v =>
        val got = rows.getOrElse((0, v.toLong), 0.0)
        val err = math.abs(got - want0(v))
        assert(err <= 0.5 * math.max(want0(v), delta) + 1e-12,
          s"v=$v got=$got want=${want0(v)} err=$err")
      }
    } finally g.unpersistAll()
  }

  test("expandSlots emits exactly [0, nwalks) per row, nothing else") {
    // the chunked expansion must be slot-for-slot identical to a direct
    // explode(sequence(0, nwalks-1)) — counter-RNG walk identity depends
    // on it; covers nwalks below, at, above and at multiples of the
    // 4096 chunk size
    val spark = TestSpark.spark
    import spark.implicits._
    val counts = Seq(1L, 2L, 4095L, 4096L, 4097L, 8192L, 10000L)
    val rows = counts.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "nwalks")
    val got = Fora.expandSlots(rows)
      .select($"id", $"slot").as[(Long, Long)].collect().toSet
    val want = counts.zipWithIndex
      .flatMap { case (c, i) => (0L until c).map(s => (i.toLong, s)) }.toSet
    assert(got == want)
  }

  test("walk-index reproduces live-walk endpoints exactly") {
    val g = graph(edges)
    try {
      val sp = spark
      import sp.implicits._
      val p = Fora.Params(eps = 0.5, seed = 7L)
      val idx = WalkIndex.build(g, p)

      // endpoint-level: the counter-based RNG makes index == live, exactly
      val seeds = Seq((0, 3L, 0L, 3L, 0.5), (0, 11L, 1L, 11L, 0.25),
        (0, 29L, 0L, 29L, 0.125), (0, 5L, 3L, 5L, 0.125))
        .toDF("qid", "origin", "slot", "cur", "mass")
      def ends(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "origin", "slot", "vid", "mass").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4))).sorted.toSeq
      assert(ends(WalkIndex.lookup(g, idx, seeds, 0.2, 7L)) ==
        ends(RandomWalks.run(g, seeds, 0.2, 7L)))

      // query-level: scores equal up to float summation order
      def rows(r: Fora.QueryResult) = r.scores.orderBy("qid", "vid")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2))).toSeq
      val live = rows(Fora.query(g, Map(0 -> 3L), p))
      val indexed = rows(Fora.query(g, Map(0 -> 3L), p, walkIndex = Some(idx)))
      assert(live.map(t => (t._1, t._2)) == indexed.map(t => (t._1, t._2)))
      live.zip(indexed).foreach { case (a, b) =>
        assert(math.abs(a._3 - b._3) < 1e-12, s"$a vs $b") }
      idx.table.unpersist()
    } finally g.unpersistAll()
  }

  test("monte-carlo baseline approximates dense oracle") {
    val g = graph(HandGraphs.star5)
    try {
      val mc = Fora.montecarlo(g, Map(0 -> 1L),
        Fora.Params(eps = 0.3, seed = 1L))
      val got = mc.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      val want = DenseOracle.pprFix(5, HandGraphs.star5, 1, 0.2)
      (0 until 5).foreach { v =>
        assert(math.abs(got.getOrElse(v.toLong, 0.0) - want(v)) < 0.05,
          s"v=$v")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    } finally g.unpersistAll()
  }

  test("deterministic top-k matches oracle ranking exactly") {
    val g = graph(edges)
    try {
      val got = Fora.topk(g, 0L, k = 5).collect()
        .map(r => r.getLong(0)).toSeq
      val want = DenseOracle.pprFix(n, edges, 0, 0.2).zipWithIndex
        .map { case (s, v) => (-s, v) }.sorted.take(5).map(_._2.toLong).toSeq
      assert(got == want)
    } finally g.unpersistAll()
  }
}
