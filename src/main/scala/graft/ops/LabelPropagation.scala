package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Synchronous label propagation for community detection (SURVEY.md N6).
  *
  * Each round every vertex adopts the plurality label among its undirected
  * neighbors; ties break to the SMALLEST label so runs are deterministic
  * and reproducible across parallelism levels (required before scaling
  * timings are accepted, BASELINE.md §3). Vertices with no neighbors keep
  * their own label. A fixed round count keeps the operator deterministic
  * (plain LPA need not converge — it can oscillate on bipartite
  * structures).
  *
  * Two physical plans behind one logical operator (the PageRank /
  * ConnectedComponents dense-gate pattern, round 6):
  *
  *   1. **Distributed rounds (scale path, runJoin).** labels ⋈ symmetric
  *      adjacency (persisted, partitioned) → explode → two-phase
  *      count/argmax aggregation per round. The argmax with deterministic
  *      tie-break is `max_by(label, struct(cnt, -label))` — struct
  *      ordering is lexicographic, so it maximizes count then minimizes
  *      label, with no window function (no global sort). Unconditional at
  *      web scale.
  *
  *   2. **Dense-subgraph path (runDense).** Below the gate the whole
  *      problem is one task's array walk (rounds × m plurality votes ≈ ms
  *      on a community block) while the distributed plan pays ~4 fixed-
  *      cost shuffles per round. Labels are pure integers and the
  *      plurality + smallest-label tie-break is replicated exactly, so
  *      the two plans agree bit-for-bit (parity-spec'd).
  */
object LabelPropagation {

  /** Dense-subgraph gate (the ConnectedComponents bound): below this
    * undirected edge count the gated O(m) driver collect is legitimate
    * and the single-task rounds win by orders of magnitude. `var` so
    * specs can force the distributed plan. */
  private[graft] var DenseMaxUndEdges = 4000000L

  def run(graph: LinkGraph, rounds: Int = 10): DataFrame =
    if (graph.numEdges <= DenseMaxUndEdges) runDense(graph, rounds)
    else runJoin(graph, rounds)

  /** Single-task dense rounds over the collected symmetric adjacency —
    * identical labels to runJoin by construction (integer plurality,
    * count-desc then label-asc tie-break, isolated vertices keep their
    * own label). */
  private[graft] def runDense(graph: LinkGraph, rounds: Int): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val sc = spark.sparkContext
    // primitive-array broadcast of the undirected edge set (the
    // ConnectedComponents.runDense repack — no boxed Edge objects)
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
    val out = spark.range(0L, 1L, 1L, 1).mapPartitions { _ =>
      val vs = bcV.value
      val n = vs.length
      val idx = new graft.util.Prim.LongSlotMap(n)
      var i = 0
      while (i < n) { idx.getOrInsert(vs(i), i); i += 1 }
      // symmetric CSR over dense indices
      val es = bcSrc.value; val ed = bcDst.value
      val m = es.length
      val deg = new Array[Int](n)
      i = 0
      while (i < m) {
        deg(idx.get(es(i))) += 1; deg(idx.get(ed(i))) += 1; i += 1
      }
      val off = new Array[Int](n + 1)
      i = 0
      while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
      val nbr = new Array[Int](2 * m)
      val cur = off.clone()
      i = 0
      while (i < m) {
        val a = idx.get(es(i)); val b = idx.get(ed(i))
        nbr(cur(a)) = b; cur(a) += 1
        nbr(cur(b)) = a; cur(b) += 1
        i += 1
      }
      var label = Array.tabulate(n)(vi => vs(vi))
      var maxDeg = 0
      i = 0
      while (i < n) { if (deg(i) > maxDeg) maxDeg = deg(i); i += 1 }
      val tmp = new Array[Long](math.max(maxDeg, 1))
      var r = 0
      while (r < rounds) {
        val next = new Array[Long](n)
        var v = 0
        while (v < n) {
          val d = deg(v)
          if (d == 0) next(v) = label(v)
          else {
            var e = off(v)
            var t = 0
            val end = off(v + 1)
            while (e < end) { tmp(t) = label(nbr(e)); t += 1; e += 1 }
            java.util.Arrays.sort(tmp, 0, d)
            // scan sorted runs: plurality, tie → smallest label (the
            // ascending scan with strict > keeps the first/smallest)
            var best = tmp(0); var bestC = 1
            var curL = tmp(0); var curC = 1
            var s = 1
            while (s < d) {
              if (tmp(s) == curL) curC += 1
              else { curL = tmp(s); curC = 1 }
              if (curC > bestC) { best = curL; bestC = curC }
              s += 1
            }
            next(v) = best
          }
          v += 1
        }
        label = next
        r += 1
      }
      Iterator.range(0, n).map(vi => (vs(vi), label(vi)))
    }.toDF("vid", "label").localCheckpoint(true)
    bcSrc.destroy(); bcDst.destroy(); bcV.destroy()
    out
  }

  /** Distributed per-round plan — unconditional at web scale. */
  private[graft] def runJoin(graph: LinkGraph, rounds: Int): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    // labels ⋈ edges directly: the round-1 build-adjacency-then-explode
    // round-trip added a shuffle and materialized per-vertex arrays (hub
    // hazard); a persisted src-partitioned edge table joins in place
    val und = graph.undirectedEdges
    val sym = und.toDF().union(und.select($"dst".as("src"), $"src".as("dst")))
      .repartition(graph.numParts, $"src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sym.count()

    var labels: DataFrame = graph.vertices.toDF("vid")
      .withColumn("label", $"vid")
    var r = 0
    while (r < rounds) {
      val nbrLabels = labels
        .join(sym, labels("vid") === sym("src"))
        .select(sym("dst").as("vid"), $"label")
      val counts = nbrLabels.groupBy($"vid", $"label")
        .agg(count(lit(1)).as("cnt"))
      val picked = counts.groupBy($"vid")
        .agg(max_by($"label", struct($"cnt", (-$"label").as("negLabel")))
          .as("newLabel"))
      labels = graph.vertices.toDF("vid")
        .join(labels.select($"vid", $"label".as("oldLabel")), Seq("vid"))
        .join(picked, Seq("vid"), "left")
        .select($"vid", coalesce($"newLabel", $"oldLabel").as("label"))
        .localCheckpoint(true)
      r += 1
    }
    sym.unpersist()
    labels
  }
}
