package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable
import graft.graph.{CsrBlock, LinkGraph, PartMetrics}
import graft.ckpt.CheckpointStore
import graft.util.Hashing

/** FORA Forward Push (SURVEY.md O4/O5/O7/O17; [FOCS06] Alg., [KDD17 §2.2]).
  *
  * Local-push invariant: for every target t,
  *   π(s,t) = π°(t) + Σ_v r(v)·π(v,t)
  * so at termination (∀v: r(v) ≤ rmax·outdeg(v)) the reserves π° estimate
  * PPR with per-vertex additive error ≤ rsum; the deterministic 1e-6 mode
  * sets rmax = tol/(m+n) so rsum ≤ tol at convergence.
  *
  * Execution model (SURVEY.md §3.2): state rows (qid, vid, reserve,
  * residue) are grouped by content-derived partition `part =
  * pmod(xxhash64(vid), P)` — ONE row-level Exchange per superstep — then
  * joined 1:1 per part with the persisted CSR blocks (exchange-free: the
  * block table is cached hash-partitioned on `part`). Inside each part a
  * sequential cascade pushes to *local* quiescence, so residual mass only
  * crosses the shuffle boundary when it leaves the partition — this is the
  * "residual-push frontier exchange" of the north rule, with far fewer
  * supersteps than one-push-per-superstep designs.
  *
  * Determinism: cascade processing order is sorted and content-keyed, all
  * float accumulation happens in that order, and `part` depends only on
  * vid and P (never on physical parallelism) ⇒ identical results at
  * local[8] vs local[32].
  *
  * Dangling convention (pinned; SURVEY.md §2.4 item 1): a vertex with no
  * out-edges ABSORBS — equivalent to a self-loop, so its entire residual
  * converts to reserve in closed form (π°(v) += r, geometric series of
  * self-pushes) and a random walk reaching it terminates there. Chosen
  * over dangling→source because it keeps the chain independent of the
  * query source, which the FORA+ walk index requires (an index walk from
  * v cannot know s). Σ_t π(s,t) = 1 is preserved.
  *
  * Multi-source batching: FORA is embarrassingly parallel across sources;
  * state is keyed by qid so one run answers a whole query set (the
  * `sspr_qps` metric batches ≥64 sources per BASELINE.md).
  */
object ForwardPush {

  /** One state row between supersteps; `delta=true` marks un-merged
    * residue contributions emitted to a remote partition. */
  case class PushRow(qid: Int, vid: Long, reserve: Double, residue: Double,
                     delta: Boolean)

  // not `private`: Catalyst encoder codegen can't access private classes
  case class StateIn(qid: Int, vid: Long, reserve: Double, residue: Double)
  case class CascadeIn(part: Int, states: Array[StateIn],
                       srcIds: Array[Long], offsets: Array[Int],
                       dsts: Array[Long])

  case class Result(state: DataFrame, // (qid, vid, reserve, residue)
                    rsum: Double, supersteps: Int, pushes: Long)

  /** Run forward push to threshold convergence.
    *
    * @param sources  qid → source vid
    * @param rmax     push threshold scale: push while r(v) > rmax·max(deg,1)
    * @param ckpt     optional durable checkpoint store (N9); when absent,
    *                 supersteps truncate lineage via persist()
    * @param resume   when true and `ckpt` has committed supersteps, continue
    *                 from the latest manifest instead of the seeds
    */
  def run(graph: LinkGraph, sources: Map[Int, Long], alpha: Double,
          rmax: Double, ckpt: Option[CheckpointStore] = None,
          resume: Boolean = false, maxSupersteps: Int = 10000): Result = {
    val spark = graph.spark
    import spark.implicits._
    val p = graph.numParts
    val sc = spark.sparkContext

    val resumeStep = if (resume) ckpt.flatMap(_.latestSuperstep()) else None
    var state: DataFrame = resumeStep match {
      case Some(k) => ckpt.get.loadState(k)
      case None =>
        sources.toSeq.sortBy(_._1)
          .map { case (q, v) => PushRow(q, v, 0.0, 1.0, delta = true) }
          .toDF()
    }
    var step = resumeStep.map(_ + 1).getOrElse(0)
    var converged = false
    var totalPushes = resumeStep.flatMap(k => ckpt.get.scalar(k, "totalPushes"))
      .getOrElse(0.0).toLong
    

    val csrDF = graph.csr // persisted, hash-partitioned by part

    while (!converged && step < maxSupersteps) {
      val pushAcc = sc.longAccumulator(s"pushes_$step")
      val remoteAcc = sc.longAccumulator(s"remoteDeltas_$step")
      val metricsAcc = sc.collectionAccumulator[PartMetrics](s"metrics_$step")

      val grouped = state
        .withColumn("part", pmod(xxhash64($"vid"), lit(p)).cast("int"))
        .repartition(p, col("part"))
        .groupBy($"part")
        .agg(collect_list(struct($"qid", $"vid", $"reserve", $"residue"))
          .as("states"))

      val joined = grouped.join(csrDF.toDF(), Seq("part"), "left")
        .select($"part", $"states", $"srcIds", $"offsets", $"dsts")
        .as[CascadeIn]

      val out = joined.flatMap { in =>
        cascade(in, alpha, rmax, p, pushAcc.add(_),
          remoteAcc.add(_), metricsAcc.add(_))
      }.toDF()

      val committed = ckpt match {
        case Some(store) =>
          val c = store.commit(step, out,
            Map("totalPushes" -> (totalPushes + pushAcc.value).toDouble),
            metricsList(metricsAcc), Map("alpha" -> alpha.toString,
              "rmax" -> rmax.toString, "numParts" -> p.toString))
          c
        case None =>
          // localCheckpoint truncates the logical plan — without this the
          // nested per-superstep plans grow superlinearly (SURVEY.md §4.2)
          out.localCheckpoint(true)
      }
      state = committed
      totalPushes += pushAcc.value
      // no remote residue emitted ⇒ every partition reached local
      // quiescence with nothing in flight ⇒ global fixpoint
      converged = remoteAcc.value == 0
      step += 1
    }

    val finalState = state.groupBy($"qid", $"vid")
      .agg(sum($"reserve").as("reserve"), sum($"residue").as("residue"))
    val rsum = finalState.agg(sum($"residue")).as[Double].head()
    Result(finalState, rsum, step, totalPushes)
  }

  private def metricsList(acc: org.apache.spark.util.CollectionAccumulator[PartMetrics])
      : Seq[PartMetrics] = {
    import scala.jdk.CollectionConverters._
    acc.value.asScala.toSeq
  }

  /** Sequential, deterministic push cascade within one partition. */
  private def cascade(in: CascadeIn, alpha: Double, rmax: Double, p: Int,
                      onPush: Long => Unit,
                      onRemote: Long => Unit, onMetrics: PartMetrics => Unit)
      : Iterator[PushRow] = {
    val srcIds = if (in.srcIds == null) Array.empty[Long] else in.srcIds
    val offsets = if (in.offsets == null) Array.empty[Int] else in.offsets
    val dsts = if (in.dsts == null) Array.empty[Long] else in.dsts

    def degOf(idx: Int): Int = offsets(idx + 1) - offsets(idx)
    def threshold(deg: Int): Double = rmax * math.max(deg, 1)

    // deterministic merge of incoming rows
    val rows = in.states.sortBy(s => (s.qid, s.vid, s.reserve, s.residue))
    val acc = mutable.LinkedHashMap.empty[(Int, Long), Array[Double]] // (reserve, residue)
    rows.foreach { s =>
      val a = acc.getOrElseUpdate((s.qid, s.vid), Array(0.0, 0.0))
      a(0) += s.reserve; a(1) += s.residue
    }

    val queue = mutable.ArrayDeque.empty[(Int, Long)]
    val queued = mutable.HashSet.empty[(Int, Long)]
    acc.keysIterator.toArray.sortBy(identity).foreach { k =>
      val vid = k._2
      val idx = java.util.Arrays.binarySearch(srcIds, vid)
      val deg = if (idx >= 0) degOf(idx) else 0
      if (acc(k)(1) > threshold(deg)) { queue.append(k); queued += k }
    }

    val remote = mutable.LinkedHashMap.empty[(Int, Long), Double]
    var pushes = 0L
    while (queue.nonEmpty) {
      val k = queue.removeHead()
      queued -= k
      val (qid, vid) = k
      val a = acc(k)
      val r = a(1)
      val idx = java.util.Arrays.binarySearch(srcIds, vid)
      val deg = if (idx >= 0) degOf(idx) else 0
      if (r > threshold(deg)) {
        pushes += 1
        if (deg == 0) { // dangling absorbs: closed-form self-loop pushes
          a(0) += r
          a(1) = 0.0
        } else {
        a(0) += alpha * r
        a(1) = 0.0
        val spread = (1.0 - alpha) * r
        def deposit(qd: Int, dv: Long, m: Double): Unit = {
          if (Hashing.partOf(dv, p) == in.part) {
            val kk = (qd, dv)
            val aa = acc.getOrElseUpdate(kk, Array(0.0, 0.0))
            aa(1) += m
            val di = java.util.Arrays.binarySearch(srcIds, dv)
            val dd = if (di >= 0) degOf(di) else 0
            if (aa(1) > threshold(dd) && !queued.contains(kk)) {
              queue.append(kk); queued += kk
            }
          } else {
            remote.updateWith((qd, dv)) {
              case Some(x) => Some(x + m); case None => Some(m) }
            ()
          }
        }
        val share = spread / deg
        var i = offsets(idx)
        while (i < offsets(idx + 1)) { deposit(qid, dsts(i), share); i += 1 }
        }
      }
    }

    onPush(pushes)
    onRemote(remote.size.toLong)
    var rsumLocal = 0.0
    acc.valuesIterator.foreach(a => rsumLocal += a(1))
    onMetrics(PartMetrics(in.part, acc.size.toLong, pushes, 0L, rsumLocal))

    val local = acc.iterator
      .filter { case (_, a) => a(0) != 0.0 || a(1) != 0.0 }
      .map { case ((q, v), a) => PushRow(q, v, a(0), a(1), delta = false) }
      .toArray.sortBy(r => (r.qid, r.vid))
    val rem = remote.iterator
      .map { case ((q, v), m) => PushRow(q, v, 0.0, m, delta = true) }
      .toArray.sortBy(r => (r.qid, r.vid))
    (local ++ rem).iterator
  }

  /** Deterministic PPR to additive tolerance `tol` (SURVEY.md O17 note):
    * rmax = tol/(m+n) ⇒ per-vertex |π̂−π| ≤ rsum ≤ tol. */
  def deterministicPpr(graph: LinkGraph, sources: Map[Int, Long],
                       alpha: Double = 0.2, tol: Double = 1e-7,
                       ckpt: Option[CheckpointStore] = None,
                       resume: Boolean = false): Result = {
    val rmax = tol / (graph.numEdges + graph.numVertices).toDouble
    run(graph, sources, alpha, rmax, ckpt, resume)
  }
}
