package graft

import graft.ops.{ConnectedComponents, LabelPropagation}

/** Hub-skew regression spec (VERDICT r1 item 7): the web graph is
  * power-law, so CC/LPA must stay correct — and array-free — when one
  * vertex owns a large fraction of all edges. */
/** The hash-vid scale ingest (LinkGraph.fromPagesHashVids) must produce
  * the SAME graph as the sorted-dense-id test ingest, up to the vid
  * relabeling — checked by mapping edges back to url pairs. */
class HashVidIngestSpec extends SparkSpec {
  test("hash-vid and sorted-vid ingest agree as url-pair edge sets") {
    val sp = spark
    import sp.implicits._
    import graft.graph.LinkGraph
    val pages = graft.sources.SyntheticPages.generate(sp, 800L, seed = 5L)
    val (g1, d1) = LinkGraph.fromPages(sp, pages.toDF(), numParts = 4)
    val (g2, d2) = LinkGraph.fromPagesHashVids(sp, pages.toDF(), numParts = 4)
    try {
      def urlEdges(g: LinkGraph, d: org.apache.spark.sql.Dataset[graft.graph.VertexUrl]) =
        g.edges.toDF()
          .join(d.toDF().select($"vid".as("src"), $"url".as("src_u")), "src")
          .join(d.toDF().select($"vid".as("dst"), $"url".as("dst_u")), "dst")
          .select($"src_u", $"dst_u").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      assert(g1.numEdges == g2.numEdges)
      assert(urlEdges(g1, d1) == urlEdges(g2, d2))
      // hash vids respect the packed-key fast-path domain
      val (lo, hi) = g2.vidBounds
      assert(lo >= 0 && hi < (1L << 40))
    } finally { g1.unpersistAll(); g2.unpersistAll() }
  }
}

class HubGraphSpec extends SparkSpec {
  import TestGraphs._

  /** hub 0 ↔ 1..1500 (≈97% of edges on one vertex), a 40-chain island,
    * and sparse random edges among the leaves. */
  lazy val hubEdges: Seq[(Int, Int)] = {
    val star = (1 to 1500).flatMap(i => Seq((0, i), (i, 0)))
    val chain = (2001 until 2040).map(i => (i, i + 1))
    val rnd = new scala.util.Random(9)
    val extra = Seq.fill(200)((1 + rnd.nextInt(1500), 1 + rnd.nextInt(1500)))
      .filter(e => e._1 != e._2)
    (star ++ chain ++ extra).distinct
  }

  private def unionFindOracle(edges: Seq[(Int, Int)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Int, Int]
    def find(x: Int): Int = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v.toLong -> find(v).toLong).toMap
  }

  test("CC is exact on a 97%-hub graph (no per-vertex arrays)") {
    val g = graph(hubEdges, parts = 8)
    try {
      val res = ConnectedComponents.run(g)
      val got = res.components.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFindOracle(hubEdges)
      assert(got == want)
    } finally g.unpersistAll()
  }

  test("salted two-phase sum equals plain aggregation on a hot key") {
    val sp = spark
    import sp.implicits._
    // 50k rows, 90% on one hot key — the hub shape
    val rows = (0L until 50000L).map { i =>
      val key = if (i % 10 != 0) 7L else i % 100
      (key, i, 1.0 / (1 + (i % 13)))
    }
    val df = rows.toDF("vid", "slot", "mass")
    val plain = df.groupBy($"vid").agg(org.apache.spark.sql.functions
      .sum($"mass").as("mass")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = graft.util.Salting.saltedSum(df, Seq("vid"), "mass",
      saltFrom = $"slot", salts = 32).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-9 * math.max(1.0, math.abs(v)),
        s"key=$k")
    }
  }

  test("LPA terminates with plurality labels on the hub graph") {
    val g = graph(hubEdges, parts = 8)
    try {
      val labels = LabelPropagation.run(g, rounds = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every chain-island vertex keeps a chain-island label; star
      // vertices converge within the star's label set
      (2001 to 2040).foreach(v =>
        assert(labels(v.toLong) >= 2001L, s"v=$v label=${labels(v.toLong)}"))
      assert(labels.size == g.numVertices)
    } finally g.unpersistAll()
  }
}

/** CSR block sizing rule (VERDICT r2 #8): partition count is derived
  * from the edge count so a block's in-row arrays stay bounded, and
  * packCsr aborts loudly on the skew tail instead of failing on a 2 GB
  * row mid-query. */
class CsrSizingSpec extends SparkSpec {
  import graft.graph.LinkGraph

  test("fromEdges raises numParts to meet edgesPerBlockTarget") {
    val sp = spark
    import sp.implicits._
    val saved = LinkGraph.edgesPerBlockTarget
    LinkGraph.edgesPerBlockTarget = 500
    try {
      // ~2000 edges, requested 1 partition -> rule demands >= 4
      val edges = (0 until 2100).map(i => (i.toLong % 300, (i * 7 + 1).toLong % 300))
      val g = LinkGraph.fromEdges(sp, edges.toDF("src", "dst"), numParts = 1)
      try {
        assert(g.numParts >= (g.numEdges / 500).toInt,
          s"numParts=${g.numParts} for m=${g.numEdges}")
        // every materialized block honors the hard cap
        val sizes = g.csr.collect().map(b => b.offsets.last.toLong)
        assert(sizes.forall(_ <= LinkGraph.maxBlockEdges))
        assert(sizes.sum == g.numEdges)
      } finally g.unpersistAll()
    } finally LinkGraph.edgesPerBlockTarget = saved
  }

  test("packCsr rejects a block over the hard cap with the sizing rule") {
    val saved = LinkGraph.edgesPerBlockTarget
    LinkGraph.edgesPerBlockTarget = 4 // hard cap 32
    try {
      val slabs = (0 until 5).iterator.map(v =>
        graft.graph.VertexAdj(v.toLong, Array.tabulate(10)(_.toLong + 100)))
      val e = intercept[IllegalArgumentException] {
        LinkGraph.packCsr(0, slabs)
      }
      assert(e.getMessage.contains("sizing rule"))
    } finally LinkGraph.edgesPerBlockTarget = saved
  }

  /** The round-5 one-sort-shuffle CSR build (packCsrStream over sorted
    * (part, src, dst) rows) must produce blocks BITWISE identical to the
    * original slab packer — same srcIds, offsets, dsts per part. */
  test("packCsrStream equals packCsr on a skewed multi-part stream") {
    val rnd = new scala.util.Random(11)
    val edges = ((1 to 800).map(i => (0L, i.toLong)) ++ // hub slab
      Seq.fill(600)((rnd.nextInt(50).toLong, rnd.nextInt(900).toLong)))
      .distinct.filter(e => e._1 != e._2)
    val P = 4
    def partOf(v: Long) = graft.util.Hashing.partOf(v, P)
    // streamed: rows sorted by (part, src, dst) WITH duplicate pairs
    // mixed in — the sort makes them adjacent and the packer must drop
    // them (the csr-first ingest's in-shuffle dedup); two parts
    // interleave in one physical partition, one carries a single part
    val sorted = (edges ++ edges.take(150) ++ edges.takeRight(75))
      .map { case (s, d) => (partOf(s), s, d) }.sorted
    val streamed = (LinkGraph.packCsrStream(
      sorted.filter(_._1 <= 1).iterator) ++
      LinkGraph.packCsrStream(sorted.filter(_._1 == 2).iterator) ++
      LinkGraph.packCsrStream(sorted.filter(_._1 == 3).iterator))
      .map(b => b.part -> b).toMap
    // reference: slab packer per part
    val slabbed = edges.groupBy(_._1).map { case (s, es) =>
      graft.graph.VertexAdj(s, es.map(_._2).sorted.toArray)
    }.groupBy(a => partOf(a.src)).map { case (p, slabs) =>
      p -> LinkGraph.packCsr(p, slabs.iterator)
    }
    assert(streamed.keySet == slabbed.keySet)
    streamed.keySet.foreach { p =>
      assert(java.util.Arrays.equals(streamed(p).srcIds, slabbed(p).srcIds), s"srcIds p=$p")
      assert(java.util.Arrays.equals(streamed(p).offsets, slabbed(p).offsets), s"offsets p=$p")
      assert(java.util.Arrays.equals(streamed(p).dsts, slabbed(p).dsts), s"dsts p=$p")
    }
  }

  test("packCsrStream rejects a block over the hard cap") {
    val saved = LinkGraph.edgesPerBlockTarget
    LinkGraph.edgesPerBlockTarget = 4 // hard cap 32
    try {
      val rows = Iterator.tabulate(40)(i => (0, i.toLong / 10, 100L + i))
      val e = intercept[IllegalArgumentException] {
        LinkGraph.packCsrStream(rows).toArray
      }
      assert(e.getMessage.contains("maxBlockEdges"))
    } finally LinkGraph.edgesPerBlockTarget = saved
  }
}
