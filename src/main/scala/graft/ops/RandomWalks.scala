package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** α-decay random walks as a Catalyst column pipeline (SURVEY.md O6/O8).
  *
  * RNG is counter-based (SURVEY.md O23/§7.5): every draw is
  * `xxhash64(seed, origin, slot, step, tag)` — a pure function of the
  * walk's identity, never of partition/task/order — so results are
  * bitwise identical at any parallelism AND the precomputed walk index
  * (WalkIndex) reproduces exactly the endpoints the live walk would
  * produce for the same (origin, slot).
  *
  * Semantics (pinned): at each step (including step 0 at the origin) the
  * walk stops with probability α at the current vertex; otherwise it moves
  * to a uniformly random out-neighbor; a walk reaching a dangling vertex
  * terminates there (absorb convention, matching ForwardPush).
  *
  * Plan shape per step: live ⋈ adj (cached, hash-partitioned on src) →
  * stop/move decision in codegen'd expressions → localCheckpoint; stopped
  * rows accumulate per step as cheap LogicalRDD slices. Walks of every
  * query in a batch advance together — per-step overhead is amortized
  * across the whole query set.
  */
object RandomWalks {

  /** u ~ U[0,1) from chained counters, identical to Hashing.u01. */
  private def u01(seed: Long, cols: Column*): Column =
    (shiftrightunsigned(xxhash64((lit(seed) +: cols): _*), 11).cast("double")
      / lit((1L << 53).toDouble))

  private def pick(seed: Long, n: Column, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: cols): _*), n.cast("long"))

  /** Advance walks to termination.
    *
    * @param seeds (qid: Int, origin: Long, slot: Long, cur: Long,
    *              mass: Double) — one row per walk; `cur` = start vertex
    *              (origin for live FORA walks).
    * @return (qid, origin, slot, vid, mass) — one endpoint row per walk,
    *         NOT yet aggregated (WalkIndex.build needs origin/slot).
    */
  def run(graph: LinkGraph, seeds: DataFrame, alpha: Double, seed: Long,
          maxSteps: Int = 300): DataFrame = {
    val spark = graph.spark
    val adj = graph.adj.toDF()

    var live = seeds.localCheckpoint(true)
    val stopped = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var step = 0
    var n = live.count()
    while (n > 0 && step < maxSteps) {
      val joined = live.join(adj, live("cur") === adj("src"), "left")
      val stopDraw = u01(seed, col("origin"), col("slot"), lit(step), lit(0L))
      val decided = joined.select(
          col("qid"), col("origin"), col("slot"), col("cur"), col("mass"),
          (col("dsts").isNull || stopDraw < lit(alpha)).as("stop"),
          when(col("dsts").isNotNull,
            element_at(col("dsts"),
              (pick(seed, size(col("dsts")), col("origin"), col("slot"),
                lit(step), lit(1L)) + 1).cast("int")))
            .as("next"))
        .localCheckpoint(true)
      stopped += decided.where(col("stop"))
        .select(col("qid"), col("origin"), col("slot"),
          col("cur").as("vid"), col("mass"))
      live = decided.where(!col("stop"))
        .select(col("qid"), col("origin"), col("slot"),
          col("next").as("cur"), col("mass"))
      n = live.count()
      step += 1
    }
    // force-stop stragglers at the cap (P(survive 300 steps) = 0.8^300)
    val tail = live.select(col("qid"), col("origin"), col("slot"),
      col("cur").as("vid"), col("mass"))
    stopped.foldLeft(tail)(_ unionByName _)
  }
}
