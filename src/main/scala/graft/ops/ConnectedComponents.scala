package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Connected components on the symmetrized graph (SURVEY.md N5): exact,
  * deterministic — component label = smallest vid in the component.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
  * MapReduce and Beyond", SoCC 2014) expressed as Catalyst groupBy/agg +
  * explode passes over a canonical (big>small) edge list:
  *
  *   large-star(u): connect every neighbor larger than u to
  *                  m = min(N(u) ∪ {u});
  *   small-star(u): connect u and all its smaller neighbors to their min.
  *
  * Both preserve connectivity, never cross components, and only ever
  * decrease parents; the paper proves convergence in O(log² n) rounds to
  * disjoint stars rooted at component minima — at web scale this beats
  * plain label propagation's O(diameter) rounds.
  *
  * Fixpoint test (sound because parents only decrease): the canonical
  * edge set is a disjoint star forest ⇔ (1) no vertex has two distinct
  * parents and (2) no parent is itself a child. The root of each star is
  * then necessarily its component minimum.
  */
object ConnectedComponents {

  case class Result(components: DataFrame, rounds: Int) // (vid, component)

  /** Dense-subgraph gate (the Triangles/PageRank pattern): below this
    * undirected edge count the whole problem is one task's union-find
    * (O(m·α(n)) ≈ ms) while the star contraction pays ~2·log²n rounds
    * of join fixed cost. Labels are identical by construction — union
    * always attaches the larger root under the smaller, so every final
    * root is its component's minimum vid, exactly the contraction's
    * fixpoint. The contraction remains the unconditional web-scale plan. */
  private[graft] var DenseMaxUndEdges = 4000000L

  def run(graph: LinkGraph, maxRounds: Int = 60): Result = {
    if (graph.numEdges <= DenseMaxUndEdges) return runDense(graph)
    runStars(graph, maxRounds)
  }

  private def runDense(graph: LinkGraph): Result = {
    val spark = graph.spark
    import spark.implicits._
    val sc = spark.sparkContext
    // repack the gated O(m) collect into primitive src/dst arrays before
    // broadcasting (ADVICE r3 #4): 4M boxed Edge objects cost ~3-5x the
    // 64 MB raw estimate in headers + slow Java serialization; two long
    // arrays are exactly 2×8 B/edge and kryo-free (Triangles' ea/eb
    // pattern)
    val eRows = graph.undirectedEdges.collect()
    val eSrc = new Array[Long](eRows.length)
    val eDst = new Array[Long](eRows.length)
    var j = 0
    while (j < eRows.length) {
      eSrc(j) = eRows(j).src; eDst(j) = eRows(j).dst; j += 1
    }
    val bcSrc = sc.broadcast(eSrc)
    val bcDst = sc.broadcast(eDst)
    val bcV = sc.broadcast(graph.vertices.collect().sorted)
    val rows = spark.range(0L, 1L, 1L, 1).mapPartitions { _ =>
      val vs = bcV.value
      val idx = new graft.util.Prim.LongSlotMap(vs.length)
      var i = 0
      while (i < vs.length) { idx.getOrInsert(vs(i), i); i += 1 }
      val parent = Array.tabulate(vs.length)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val es = bcSrc.value; val ed = bcDst.value
      i = 0
      while (i < es.length) {
        val a = find(idx.get(es(i))); val b = find(idx.get(ed(i)))
        // union-by-min: vs is sorted, so root index order == vid order
        if (a < b) parent(b) = a else if (b < a) parent(a) = b
        i += 1
      }
      vs.indices.iterator.map(i2 => (vs(i2), vs(find(i2))))
    }.toDF("vid", "component").localCheckpoint(true)
    bcSrc.destroy(); bcDst.destroy(); bcV.destroy()
    Result(rows, 1)
  }

  private def runStars(graph: LinkGraph, maxRounds: Int): Result = {
    val spark = graph.spark
    import spark.implicits._

    var edges: DataFrame = graph.undirectedEdges.toDF() // canonical: src<dst
      .select($"dst".as("src"), $"src".as("dst"))       // → src>dst
      .localCheckpoint(true)

    var rounds = 0
    var converged = edges.isEmpty
    while (!converged && rounds < maxRounds) {
      // hub-safe formulation: the star mins come from groupBy().agg(min)
      // + an equi-join back to the edges — a web-scale hub's neighbor set
      // is never materialized as one array row (round-1 collect_set would
      // OOM on a power-law hub; min() partial-aggregates map-side)
      val sym = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
      val largeMins = sym.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src", least($"mn", $"src").as("m"))
      val large = sym.join(largeMins, Seq("src"))
        .where($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
        .distinct()

      val smallMins = large.groupBy($"src").agg(min($"dst").as("m"))
      val small = large.join(smallMins, Seq("src"))
        .select($"dst".as("src"), $"m".as("dst"))
        .unionByName(smallMins.select($"src", $"m".as("dst")))
        .where($"src" =!= $"dst")
        .distinct()
        .localCheckpoint(true)

      // `small` is distinct (src, dst) rows, so "some src has two
      // parents" ⇔ count(*) > countDistinct(src): one agg job over the
      // checkpointed frame instead of groupBy+filter+limit (round 6)
      val cnt = small.agg(count(lit(1)).as("n"),
        countDistinct($"src").as("ns")).head()
      val multiParent = cnt.getLong(0) > cnt.getLong(1)
      val chained =
        multiParent || small.as("a")
          .join(small.as("b"), col("a.dst") === col("b.src"))
          .limit(1).count() > 0
      converged = !multiParent && !chained
      edges = small
      rounds += 1
    }

    // stars: (child > root); isolated vertices label themselves
    val labels = edges.select($"src".as("vid"), $"dst".as("component"))
    val comps = graph.vertices.toDF("vid")
      .join(labels, Seq("vid"), "left")
      .select($"vid", coalesce($"component", $"vid").as("component"))
    Result(comps, rounds)
  }
}
