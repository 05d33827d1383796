package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.LinkGraph

/** FORA+ precomputed random-walk index (SURVEY.md O9/O10; [TODS19 §4]).
  *
  * Offline, each non-dangling vertex v stores `slots(v) =
  * ⌈outdeg(v)·rmax·ω₁⌉ (capped)` walk endpoints, where ω₁ is the walk
  * budget at worst-case rsum=1 — by the push termination condition
  * r(v) ≤ rmax·outdeg(v), a query needs at most ω_v ≈ r(v)·ω/rsum ≤
  * outdeg(v)·rmax·ω₁ walks from v, so the index covers the demand;
  * any overflow (rounding, caps) falls back to live walks.
  *
  * Because the RNG is counter-based on (origin, slot, step), an index
  * lookup returns EXACTLY the endpoint the live walk would have produced —
  * index and live mode give bitwise-identical query results (property
  * tested), so the index is purely a performance artifact, never a
  * correctness one.
  *
  * Storage: parquet table (origin, slot, dest), cached hash-partitioned by
  * origin so the residuals⋈index join only shuffles the (small) residual
  * side.
  */
object WalkIndex {

  case class Index(table: DataFrame, rmax: Double, omega1: Double,
                   cap: Int)

  /** EP-C′ (SURVEY.md §3.2): one batch job building the whole index. */
  def build(graph: LinkGraph, p: Fora.Params = Fora.Params(),
            cap: Int = 10000,
            storageDir: Option[String] = None): Index = {
    val spark = graph.spark
    import spark.implicits._
    val n = graph.numVertices
    val m = graph.numEdges
    val delta = if (p.delta.isNaN) 1.0 / n else p.delta
    val pfail = if (p.pfail.isNaN) 1.0 / n else p.pfail
    val rmax = Fora.rmaxOf(p, m, delta, pfail)
    val omega1 = Fora.omegaOf(p, 1.0, delta, pfail)

    // streamed slot expansion (Fora.expandSlots): no nslots-length array
    // rows even when deg·rmax·ω₁ approaches the cap. Index size ≈
    // Σ_v ceil(deg·rmax·ω₁) ≤ m·rmax·ω₁ + n — the walkWidth estimate.
    val estSlots = (m * rmax * omega1).toLong + n
    val seeds = Fora.expandSlots(graph.adj.toDF()
      .select($"src", size($"dsts").as("deg"))
      .withColumn("nwalks",
        least(ceil($"deg" * lit(rmax) * lit(omega1)), lit(cap.toLong))
          .cast("long"))
      .where($"nwalks" > 0), estSlots)
      .select(lit(0).as("qid"), $"src".as("origin"), $"slot",
        $"src".as("cur"), lit(1.0).as("mass"))

    val endpoints = RandomWalks
      .runCounted(graph, seeds, p.alpha, p.seed, preSpread = true)
      .endpoints
      .select($"origin", $"slot", $"vid".as("dest"))

    val dir = storageDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-walkidx-").toString)
    endpoints.write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
      .repartition(graph.numParts, $"origin")
      .persist(StorageLevel.MEMORY_AND_DISK)
    table.count()
    Index(table, rmax, omega1, cap)
  }

  /** Query-time endpoint lookup (O10): slots < indexed count come from the
    * table; overflow slots run live walks. Same output contract as
    * RandomWalks.run. */
  def lookup(graph: LinkGraph, idx: Index, seeds: DataFrame, alpha: Double,
             seed: Long): DataFrame = {
    val joined = seeds.join(idx.table, Seq("origin", "slot"), "left")
    val hits = joined.where(col("dest").isNotNull)
      .select(col("qid"), col("origin"), col("slot"),
        col("dest").as("vid"), col("mass"))
    val misses = joined.where(col("dest").isNull)
      .select(col("qid"), col("origin"), col("slot"), col("cur"), col("mass"))
    val live = RandomWalks.run(graph, misses, alpha, seed)
    hits.unionByName(live)
  }
}
