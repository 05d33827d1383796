package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.ckpt.CheckpointStore

/** FORA: Forward Push + Random Walks with (ε,δ,p_f) error budgeting
  * (SURVEY.md O6/O7/O11/O14; [KDD17 §2].)
  *
  * Guarantee at defaults (δ=1/n, p_f=1/n): for every t with π(s,t) > δ,
  * relative error ≤ ε with probability 1−p_f.
  *
  * Budget formulas [KDD17 §4]:
  *   rmax = (ε/3)·sqrt(δ / ((2ε/3+2)·m·ln(2/p_f))) · rmaxScale
  *   ω    = rsum·(2ε/3 + 2)·ln(2/p_f) / (ε²·δ)
  * (ω computed from the ACTUAL post-push rsum, as the reference does.)
  *
  * Each residual vertex v launches ω_v = ⌈r(v)·ω/rsum⌉ walks, each
  * depositing r(v)/ω_v at its endpoint — unbiased since a walk from v
  * ends at t with probability π(v,t) and the push invariant is
  * π(s,t) = π°(t) + Σ_v r(v)·π(v,t).
  */
object Fora {

  case class Params(alpha: Double = 0.2, eps: Double = 0.5,
                    delta: Double = Double.NaN, pfail: Double = Double.NaN,
                    rmaxScale: Double = 1.0, seed: Long = 42L)

  // not `private`: Catalyst encoder codegen can't access private classes
  case class ScoreRow(qid: Int, vid: Long, score: Double)

  case class QueryResult(scores: DataFrame, // (qid, vid, score)
                         rsum: Double, rmax: Double, omega: Double,
                         pushes: Long, walks: Long, walkSteps: Long,
                         pushSupersteps: Int = 0,
                         tPushSec: Double = 0.0, tWalkSec: Double = 0.0,
                         // push-phase split: per chained-round epoch +
                         // the kstate/rsum assembly tail (VERDICT r3 #2
                         // — evidence for the hub scaling analysis)
                         pushEpochSecs: Seq[Double] = Nil,
                         pushTailSec: Double = 0.0)

  def rmaxOf(p: Params, m: Long, delta: Double, pfail: Double): Double =
    (p.eps / 3.0) * math.sqrt(
      delta / ((2.0 * p.eps / 3.0 + 2.0) * m * math.log(2.0 / pfail))) *
      p.rmaxScale

  def omegaOf(p: Params, rsum: Double, delta: Double, pfail: Double): Double =
    rsum * (2.0 * p.eps / 3.0 + 2.0) * math.log(2.0 / pfail) /
      (p.eps * p.eps * delta)

  /** Walk-slot rows per explode chunk (see expandSlots). */
  private val SlotChunk = 4096L

  /** Expand rows carrying an `nwalks` count into one row per slot in
    * [0, nwalks) WITHOUT materializing an ω_v-length array per vertex
    * (VERDICT r2 #6: explode(sequence(0, nwalks−1)) builds the whole
    * per-vertex slot array in ONE row — multi-MB exchange rows once a
    * hot residual vertex wants 10⁶⁺ walks at δ=1/n web scale).
    *
    * Two-level streaming shape: explode ⌈nwalks/4096⌉ chunk ids, then
    * explode each chunk's OWN slot range — a sequence of exactly
    * min(4096, nwalks − chunk·4096) elements, so per-row arrays stay
    * ≤ 32 KB and total output is exactly Σ nwalks. (The first fix of
    * this crossJoined a broadcast 4096-row range and filtered
    * slot < nwalks: output-exact, but it GENERATED 4096 rows per chunk
    * row pre-filter — with millions of residual vertices wanting ~1
    * walk each, billions of filtered rows dominated the whole walk
    * phase.) Slot values are identical to the direct explode, so
    * counter-RNG walks (origin, slot, step) are bitwise unchanged. */
  private[graft] def expandSlots(rows: DataFrame,
                                 estWalks: Long = -1L): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      // guard, not dead code: sequence(0, -1) DESCENDS in Spark, so a
      // nwalks=0 row would emit two bogus chunk rows instead of zero
      // (ADVICE r3 #2); current callers all pre-filter nwalks >= 1, but
      // the helper's contract must not depend on that
      .where($"nwalks" > 0)
      .withColumn("_chunk", explode(sequence(lit(0L),
        floor(($"nwalks" - 1) / lit(SlotChunk)).cast("long"))))
      // spread CHUNK rows (≤4096 walks each) before expansion: the input
      // inherits its producer's partitioning (the push state block RDD
      // may have only a handful of partitions) and per-vertex walk
      // counts are hub-skewed, so balancing at chunk granularity keeps
      // the expansion both parallel and even. Width is data-derived
      // (walkWidth, VERDICT r4 #3) — callers pass the walk-volume
      // estimate (ω is exact to within the residual-vertex count)
      .repartition(RandomWalks.walkWidth(spark, estWalks))
      .withColumn("_off", explode(sequence(lit(0L),
        least(lit(SlotChunk), $"nwalks" - $"_chunk" * lit(SlotChunk)) - 1)))
      .withColumn("slot", $"_chunk" * lit(SlotChunk) + $"_off")
      .drop("_chunk", "_off")
  }

  /** Whole-graph SSPPR for a batch of sources (EP-A′, SURVEY.md §3.2). */
  def query(graph: LinkGraph, sources: Map[Int, Long], p: Params = Params(),
            ckpt: Option[CheckpointStore] = None,
            walkIndex: Option[WalkIndex.Index] = None): QueryResult = {
    val spark = graph.spark
    import spark.implicits._
    val n = graph.numVertices
    val delta = if (p.delta.isNaN) 1.0 / n else p.delta
    val pfail = if (p.pfail.isNaN) 1.0 / n else p.pfail
    val m = graph.numEdges
    val rmax = rmaxOf(p, m, delta, pfail)

    val t0 = System.nanoTime()
    val push = ForwardPush.run(graph, sources, p.alpha, rmax, ckpt)
    val tPush = (System.nanoTime() - t0) / 1e9
    val omega = omegaOf(p, push.rsum, delta, pfail)

    val residuals = push.state.where($"residue" > 0)
      .select($"qid", $"vid", $"residue")
    // ω_v = ceil(r_v·ω/rsum); each walk deposits r_v/ω_v
    // Σ ceil(r_v·ω/rsum) ≈ ω + |residual vertices| (ω already scales with
    // the batch via rsum) — the right order-of-magnitude width estimate
    // without an extra count action
    val estWalks = math.max(omega.toLong, 1L)
    val seeds = expandSlots(residuals
      .withColumn("nwalks",
        ceil($"residue" * lit(omega) / lit(math.max(push.rsum, 1e-300)))
          .cast("long")), estWalks)
      .select($"qid", $"vid".as("origin"), $"slot", $"vid".as("cur"),
        ($"residue" / $"nwalks").as("mass"))

    val t1 = System.nanoTime()
    val (endpoints, steps, nWalks) = walkIndex match {
      case Some(idx) =>
        val e = WalkIndex.lookup(graph, idx, seeds, p.alpha, p.seed)
        (e, 0L, seeds.count())
      case None =>
        val w = RandomWalks.runCounted(graph, seeds, p.alpha, p.seed,
          preSpread = true)
        (w.endpoints, w.steps, w.walks)
    }

    val tWalk = (System.nanoTime() - t1) / 1e9
    // when checkpointing, endpoints are consumed 3× (scores write, walkMass,
    // per-partition metrics) and the walk job would re-execute each time —
    // pin it once and release after commit (ADVICE r2 #4)
    val pinnedEndpoints =
      if (ckpt.isDefined) endpoints.localCheckpoint(true) else endpoints
    // walk endpoints concentrate on high-PPR hubs (hot keys); salt the
    // endpoint aggregation over the walk slot before the final merge (N8)
    val walkMass = graft.util.Salting.saltedSum(
      pinnedEndpoints.select($"qid", $"vid", $"mass", $"slot"),
      keys = Seq("qid", "vid"), valueCol = "mass",
      saltFrom = $"slot", salts = 64)
    // Estimate assembly (SURVEY.md O11): score = reserve + Σ walk mass.
    // Fast path: the push state already sits partition-pinned as sorted
    // primitive blocks — route ONLY the (much smaller, already-unique)
    // walk mass through the state's own partitioner and merge with a
    // two-pointer zipPartitions scan. The state never shuffles; each
    // key's score is reserve + one mass value (a two-term IEEE add —
    // order-independent), so the result is bitwise equal to the
    // union+groupBy plan that runs when no block handle exists.
    var scores = push.fastBlocks match {
      case Some((blocks, bp)) if ckpt.isEmpty =>
        val vp = new ForwardPush.VidPartitioner(bp)
        val massKV = walkMass.select($"qid", $"vid", $"mass")
          .as[(Long, Long, Double)].rdd
          .map { case (q, v, mm) => ((q << 40) | v, mm) }
          .partitionBy(vp)
        val rows = blocks.zipPartitions(massKV) { (bIt, mIt) =>
          val blk = if (bIt.hasNext) bIt.next()
            else ForwardPush.StateBlock(Array.emptyLongArray,
              Array.emptyDoubleArray, Array.emptyDoubleArray)
          val mass = new graft.util.Prim.Rows3(64)
          mIt.foreach { case (k, mm) => mass.append(k, mm, 0.0) }
          if (mass.n > 1)
            graft.util.Prim.sort3(mass.keys, mass.a, mass.b, 0, mass.n - 1)
          new Iterator[ScoreRow] {
            private var i = 0 // block cursor
            private var j = 0 // mass cursor
            def hasNext: Boolean = i < blk.keys.length || j < mass.n
            def next(): ScoreRow = {
              val takeBlock = j >= mass.n ||
                (i < blk.keys.length && blk.keys(i) <= mass.keys(j))
              val key = if (takeBlock) blk.keys(i) else mass.keys(j)
              var s = 0.0
              if (takeBlock) { s += blk.reserve(i); i += 1 }
              if (j < mass.n && mass.keys(j) == key) { s += mass.a(j); j += 1 }
              ScoreRow((key >>> 40).toInt, key & ForwardPush.VidMask, s)
            }
          }
        }
        spark.createDataset(rows).toDF()
      case _ =>
        push.state.select($"qid", $"vid", $"reserve".as("mass"))
          .unionByName(walkMass.select($"qid", $"vid", $"mass"))
          .groupBy($"qid", $"vid").agg(sum($"mass").as("score"))
    }

    // per-partition WALK metrics manifest (north rule: checkpoints carry
    // push AND walk metrics; push supersteps only record pushes).
    // phase="walk" commits under its own namespace (w<k>.json manifests,
    // state_walk/ dir) so a later resume=true push run can never load
    // walk scores as push state (ADVICE r2 #2)
    ckpt.foreach { store =>
      val pm = pinnedEndpoints
        .groupBy(pmod(xxhash64($"vid"), lit(graph.numParts)).cast("int")
          .as("part"))
        .agg(count(lit(1)).as("walks"))
        .collect()
        .map(r => graft.graph.PartMetrics(r.getInt(0), 0L, 0L,
          r.getLong(1), 0.0)).toSeq.sortBy(_.part)
      scores = store.commit(push.supersteps, scores,
        Map("omega" -> omega, "rsumAfterPush" -> push.rsum,
          "walks" -> nWalks.toDouble),
        pm, Map.empty, phase = "walk")
    }
    QueryResult(scores, push.rsum, rmax, omega, push.pushes, nWalks, steps,
      push.supersteps, tPush, tWalk, push.epochSecs, push.tailSec)
  }

  /** Monte-Carlo baseline (SURVEY.md O14; [KDD17 §2.3]): ω pure walks from
    * the source, π̂(t) = hits(t)/ω. Correctness cross-check operator. */
  def montecarlo(graph: LinkGraph, sources: Map[Int, Long],
                 p: Params = Params()): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val n = graph.numVertices
    val delta = if (p.delta.isNaN) 1.0 / n else p.delta
    val pfail = if (p.pfail.isNaN) 1.0 / n else p.pfail
    val omega = math.ceil(
      3.0 * math.log(2.0 / pfail) / (p.eps * p.eps * delta)).toLong
    val seeds = expandSlots(sources.toSeq.sortBy(_._1).toDF("qid", "src")
      .withColumn("nwalks", lit(omega)),
      estWalks = omega * math.max(sources.size, 1))
      .select($"qid", $"src".as("origin"), $"slot", $"src".as("cur"),
        lit(1.0 / omega).as("mass"))
    // preSpread: expandSlots just spread the seeds at the data-derived
    // width — a second full-width exchange here would be pure waste
    RandomWalks.runCounted(graph, seeds, p.alpha, p.seed, preSpread = true)
      .endpoints
      .groupBy($"qid", $"vid").agg(sum($"mass").as("score"))
  }

  /** Deterministic exact top-k (SURVEY.md O12 re-expressed without RNG):
    * reserves are monotone lower bounds and π ≤ π° + rsum, so once the
    * kth lower bound separates from the (k+1)th upper bound the top-k
    * SET is provably exact.
    *
    * Default mode is a WARM-STARTED refinement ladder: each round
    * continues pushing from the previous round's (reserve, residue)
    * state at a ×16 finer rmax — push is incremental by construction,
    * so total work ≈ one push at the finest level reached, not the
    * round-1 cold-restart sum — and exits at the separation bound.
    *
    * @param exactScores when true, reported scores must equal π to
    *        within `floor` (6-dp-stable, the DuckDB-oracle mode), which
    *        forbids the early separation exit — so run ONE push at the
    *        final threshold rmax = floor/(m+n) instead of paying the
    *        ladder's per-round chain/collect overhead for no exit.
    *
    * Rows are padded with zero-score vertices when fewer than k are
    * reachable. Tie-break: (score desc, vid asc), deterministic. */
  def topk(graph: LinkGraph, source: Long, k: Int, alpha: Double = 0.2,
           floor: Double = 1e-9, maxRounds: Int = 40,
           exactScores: Boolean = false): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    // the packed-key ladder is sound only under ForwardPush.run's own
    // fast-path gate (vids < 2^40, graph within the broadcast budget);
    // outside it, degrade to one exact join-path push at the final
    // threshold — same top-k set, no silent VidMask key corruption on
    // hash-vid graphs and no whole-graph broadcast OOM (ADVICE r2 #1)
    if (graph.numEdges > ForwardPush.fastPathMaxEdges ||
        !ForwardPush.packableKeys(graph, Map(0 -> source))) {
      val rmaxFine = floor / (graph.numEdges + graph.numVertices).toDouble
      val res = ForwardPush.run(graph, Map(0 -> source), alpha, rmaxFine)
      return graph.vertices.toDF("vid")
        .join(res.state.select($"vid", $"reserve".as("score")), Seq("vid"),
          "left")
        .select($"vid", coalesce($"score", lit(0.0)).as("score"))
        .orderBy(desc("score"), asc("vid")).limit(k)
    }
    if (exactScores) {
      // score accuracy (rsum < floor) is required regardless of when the
      // set separates, so the refinement ladder cannot exit early — one
      // push at the final threshold does the same work without paying
      // per-round chain/collect overhead (rmax = floor/(m+n) ⇒ rsum ≤
      // floor, as deterministicPpr)
      val rmaxFine = floor / (graph.numEdges + graph.numVertices).toDouble
      val fr = ForwardPush.runFastK(graph,
        Seq(ForwardPush.KRow(source, 0.0, 1.0)).toDF(), alpha, rmaxFine)
      val touched = fr.kstate
        .select(($"key".bitwiseAND(lit(ForwardPush.VidMask))).as("vid"),
          $"reserve".as("score"))
      return graph.vertices.toDF("vid")
        .join(touched, Seq("vid"), "left")
        .select($"vid", coalesce($"score", lit(0.0)).as("score"))
        .orderBy(desc("score"), asc("vid")).limit(k)
    }
    var rmax = 1.0 / math.max(graph.numEdges, 1L).toDouble
    var round = 0
    var state: DataFrame = Seq(ForwardPush.KRow(source, 0.0, 1.0)).toDF()
    var result: Option[DataFrame] = None
    while (result.isEmpty && round < maxRounds) {
      val fr = ForwardPush.runFastK(graph, state, alpha, rmax)
      state = fr.kstate
      // qid=0 ⇒ key == vid, so (reserve desc, key asc) is the pinned order
      val top = state.orderBy(desc("reserve"), asc("key"))
        .limit(k + 1).select($"key", $"reserve").as[(Long, Double)].collect()
      val kth = if (top.length >= k) top(k - 1)._2 else 0.0
      val next = if (top.length > k) top(k)._2 else 0.0
      val separated = kth > next + fr.rsum
      if (fr.rsum < floor || separated) {
        // pad with zero-score vertices: when fewer than k vertices are
        // reachable, top-k still returns k rows (ties at 0 break by vid)
        val touched = state
          .select(($"key".bitwiseAND(lit(ForwardPush.VidMask))).as("vid"),
            $"reserve".as("score"))
        result = Some(graph.vertices.toDF("vid")
          .join(touched, Seq("vid"), "left")
          .select($"vid", coalesce($"score", lit(0.0)).as("score"))
          .orderBy(desc("score"), asc("vid")).limit(k))
      }
      rmax /= 16.0
      round += 1
    }
    result.getOrElse(throw new IllegalStateException("topk did not separate"))
  }
}
