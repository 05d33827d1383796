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
  * Plan shape per round: labels ⋈ symmetric adjacency (persisted,
  * partitioned) → explode → two-phase count/argmax aggregation. The argmax
  * with deterministic tie-break is `max_by(label, struct(cnt, -label))` —
  * struct ordering is lexicographic, so it maximizes count then minimizes
  * label, with no window function (no global sort).
  */
object LabelPropagation {

  def run(graph: LinkGraph, rounds: Int = 10): DataFrame = {
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
