package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Exact triangle counting on the undirected simple graph (SURVEY.md N7).
  *
  * Degree-ordered orientation (each undirected edge directed from the
  * endpoint with smaller (degree, vid) to the larger) bounds every
  * vertex's oriented out-degree by O(sqrt(m)), so the wedge join's output
  * is O(m^1.5) worst case and far less on power-law graphs — the standard
  * scalable formulation (e.g. Suri & Vassilvitskii, WWW 2011). Both joins
  * are plain Catalyst equi-joins: AQE splits skewed hub partitions at
  * runtime.
  */
object Triangles {

  /** Global triangle count. */
  def count(graph: LinkGraph): Long = triangles(graph).count()

  /** One row per triangle: corners a,b,c in orientation order. */
  def triangles(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val und = graph.undirectedEdges.toDF() // canonical src<dst, distinct
    val deg = und.select($"src".as("v"))
      .union(und.select($"dst".as("v")))
      .groupBy($"v").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))

    // orient by (deg, vid): a → b iff (deg(a), a) < (deg(b), b)
    val oriented = und
      .join(deg.select($"v".as("src"), $"deg".as("sdeg")), "src")
      .join(deg.select($"v".as("dst"), $"deg".as("ddeg")), "dst")
      .select(
        when(struct($"sdeg", $"src") < struct($"ddeg", $"dst"), $"src")
          .otherwise($"dst").as("a"),
        when(struct($"sdeg", $"src") < struct($"ddeg", $"dst"), $"dst")
          .otherwise($"src").as("b"),
        when(struct($"sdeg", $"src") < struct($"ddeg", $"dst"), $"ddeg")
          .otherwise($"sdeg").as("bdeg"))
      .persist()

    // wedges a→b, a→c with (deg(b),b) < (deg(c),c); close with edge b→c
    val e1 = oriented.select($"a", $"b", $"bdeg")
    val e2 = oriented.select($"a", $"b".as("c"), $"bdeg".as("cdeg"))
    val wedges = e1.join(e2, Seq("a"))
      .where(struct($"bdeg", $"b") < struct($"cdeg", $"c"))
      .select($"a", $"b", $"c")
    val closing = oriented.select($"b".as("cb"), $"a".as("ca"))
    // materialize before returning so `oriented` can be unpersisted here
    // (round-1 leak: persist with no unpersist accumulated across queries)
    val tris = wedges.join(closing,
        wedges("b") === closing("ca") && wedges("c") === closing("cb"))
      .select($"a", $"b", $"c")
      .localCheckpoint(true)
    oriented.unpersist()
    tris
  }

  /** (vid, triangles) for every vertex (0 for triangle-free vertices).
    * Accepts a precomputed triangle table so callers running both the
    * global count and the per-vertex histogram scan the wedges once. */
  def perVertex(graph: LinkGraph, precomputed: Option[DataFrame] = None)
      : DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val tris = precomputed.getOrElse(triangles(graph))
    val corners = tris.select(explode(array($"a", $"b", $"c")).as("vid"))
      .groupBy($"vid").agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    graph.vertices.toDF("vid")
      .join(corners, Seq("vid"), "left")
      .select($"vid", coalesce($"triangles", lit(0L)).as("triangles"))
  }
}
