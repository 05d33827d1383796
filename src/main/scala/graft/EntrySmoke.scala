package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import graft.graph.LinkGraph
    import graft.ops._
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"LAP $tag ${(System.nanoTime()-t0)/1e9}%.1fs"); t0 = System.nanoTime()
    }
    val pages = graft.sources.SyntheticPages.generate(spark, 400L, seed = 42L)
    val (g, dict) = LinkGraph.fromPages(spark, pages.toDF(), numParts = 8)
    lap(s"ingest n=${g.numVertices} m=${g.numEdges}")
    val ppr = ForwardPush.deterministicPpr(g, Map(0 -> 0L), alpha = 0.2, tol = 1e-7)
    lap(s"ppr supersteps=${ppr.supersteps} pushes=${ppr.pushes} rsum=${ppr.rsum}")
    val pr = PageRank.run(g, damping = 0.85, tol = 1e-9)
    lap(s"pagerank iters=${pr.iterations}")
    val cc = ConnectedComponents.run(g)
    lap(s"cc rounds=${cc.rounds} ncomp=${cc.components.select("component").distinct.count}")
    val tri = Triangles.count(g)
    lap(s"triangles=$tri")
    spark.stop()
  }
}
