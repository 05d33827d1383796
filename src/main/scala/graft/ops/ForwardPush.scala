package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
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

  case class Result(state: DataFrame, // (qid, vid, reserve, residue)
                    rsum: Double, supersteps: Int, pushes: Long)

  /** Compact state row for the broadcast-CSR fast path:
    * key = qid<<40 | vid (vid < 2^40, qid < 2^23). */
  case class KRow(key: Long, reserve: Double, residue: Double)

  final val VidMask: Long = (1L << 40) - 1

  /** Above this edge count the broadcast-CSR fast path is off and the
    * per-partition CSR-join path (the 100 TB shape) runs instead. */
  var fastPathMaxEdges: Long = 20L * 1000 * 1000

  /** Run forward push to threshold convergence.
    *
    * Dispatches to the broadcast-CSR fast path (compact keys, primitive
    * cascade, chained shuffle rounds inside one job) when the graph fits
    * the broadcast budget and no durable checkpointing is requested;
    * otherwise the per-partition CSR-join path runs (one committed
    * superstep per exchange — the shape that scales beyond memory).
    *
    * @param sources  qid → source vid
    * @param rmax     push threshold scale: push while r(v) > rmax·max(deg,1)
    * @param ckpt     optional durable checkpoint store (N9)
    * @param resume   when true and `ckpt` has committed supersteps, continue
    *                 from the latest manifest instead of the seeds
    */
  /** The packed-key fast path is sound only when every key fits
    * qid<<40|vid: vids in [0, 2^40), qids in [0, 2^23). LinkGraph accepts
    * arbitrary longs (the 10^12-key plan is xxhash64-as-vid), so guard
    * here and fall back to the join path instead of corrupting keys. */
  private[ops] def packableKeys(graph: LinkGraph, sources: Map[Int, Long]): Boolean = {
    val (lo, hi) = graph.vidBounds
    lo >= 0 && hi < (1L << 40) &&
      sources.keys.forall(q => q >= 0 && q < (1 << 23))
  }

  def run(graph: LinkGraph, sources: Map[Int, Long], alpha: Double,
          rmax: Double, ckpt: Option[CheckpointStore] = None,
          resume: Boolean = false, maxSupersteps: Int = 10000): Result = {
    if (ckpt.isEmpty && graph.numEdges <= fastPathMaxEdges &&
        packableKeys(graph, sources))
      runFast(graph, sources, alpha, rmax, maxSupersteps)
    else runJoin(graph, sources, alpha, rmax, ckpt, resume, maxSupersteps)
  }

  /** Broadcast-CSR fast path: state rows are (key, reserve, residue);
    * each round re-hash-partitions the frontier by vid and cascades with
    * primitive structures against the broadcast whole-graph CSR;
    * `chainLen` rounds run inside ONE Spark job before a lineage
    * truncation, amortizing job/driver latency (the scaling-efficiency
    * killer measured on the join path). Bitwise deterministic: partition
    * ownership is pmod(murmur3(vid), P) — fixed by P, not by parallelism
    * — and every merge happens in sorted key order. */
  def runFast(graph: LinkGraph, sources: Map[Int, Long], alpha: Double,
              rmax: Double, maxSupersteps: Int = 10000,
              chainLen: Int = 8): Result = {
    val spark = graph.spark
    import spark.implicits._
    val init: DataFrame = sources.toSeq.sortBy(_._1)
      .map { case (q, v) => KRow((q.toLong << 40) | v, 0.0, 1.0) }
      .toDF()
    val fr = runFastK(graph, init, alpha, rmax, maxSupersteps, chainLen)
    Result(unpackK(spark, fr.kstate), fr.rsum, fr.supersteps, fr.pushes)
  }

  /** Packed fast-path state plus run stats; `kstate` feeds warm-started
    * continuation runs (top-k refinement re-pushes from here at a finer
    * rmax instead of restarting from the seeds — push is incremental by
    * construction: any (reserve, residue) state satisfying the invariant
    * is a valid starting point). */
  case class FastResult(kstate: DataFrame, rsum: Double, supersteps: Int,
                        pushes: Long)

  def unpackK(spark: org.apache.spark.sql.SparkSession, kstate: DataFrame)
      : DataFrame = {
    import spark.implicits._
    kstate.select(
      shiftrightunsigned($"key", 40).cast("int").as("qid"),
      ($"key".bitwiseAND(lit(VidMask))).as("vid"),
      $"reserve", $"residue")
  }

  /** Fast-path core over packed KRow state (see runFast docs). */
  def runFastK(graph: LinkGraph, init: DataFrame, alpha: Double,
               rmax: Double, maxSupersteps: Int = 10000,
               chainLen: Int = 8): FastResult = {
    val spark = graph.spark
    import spark.implicits._
    val p = graph.numParts
    val sc = spark.sparkContext
    val csrB = graph.flatCsr

    var state: DataFrame = init
    var step = 0
    var converged = false
    var totalPushes = 0L

    while (!converged && step < maxSupersteps) {
      val rounds = math.min(chainLen, maxSupersteps - step)
      val pushAcc = sc.longAccumulator(s"fpushes_$step")
      val remoteAcc = sc.longAccumulator(s"fremote_$step")
      var df = state
      (0 until rounds).foreach { _ =>
        df = df.repartition(p, col("key").bitwiseAND(lit(VidMask)))
          .as[KRow]
          .mapPartitions { it =>
            cascadeFast(it, csrB.value, alpha, rmax, p,
              pushAcc.add(_), remoteAcc.add(_))
          }
          .toDF()
      }
      state = df.localCheckpoint(true)
      totalPushes += pushAcc.value
      converged = remoteAcc.value == 0 && pushAcc.value == 0
      step += rounds
    }

    val rsum = state.agg(coalesce(sum($"residue"), lit(0.0)))
      .as[Double].head()
    FastResult(state, rsum, step, totalPushes)
  }

  /** Primitive-array cascade for one hash partition (fast path). */
  private def cascadeFast(it: Iterator[KRow], csr: graft.graph.FlatCsr,
                          alpha: Double, rmax: Double, p: Int,
                          onPush: Long => Unit, onRemote: Long => Unit)
      : Iterator[KRow] = {
    import graft.util.Prim
    val pid = org.apache.spark.TaskContext.getPartitionId()
    val in = new Prim.Rows3(1024)
    it.foreach(r => in.append(r.key, r.reserve, r.residue))
    if (in.n == 0) { onPush(0L); onRemote(0L); return Iterator.empty }
    Prim.sort3(in.keys, in.a, in.b, 0, in.n - 1)

    val map = new Prim.LongSlotMap(in.n)
    val store = new Prim.Rows3(in.n)
    var degs = new Array[Int](store.keys.length)
    def slotOf(key: Long): Int = {
      val s = map.getOrInsert(key, store.n)
      if (s == store.n) {
        store.append(key, 0.0, 0.0)
        if (degs.length < store.keys.length)
          degs = java.util.Arrays.copyOf(degs, store.keys.length)
        val idx = csr.indexOf(key & VidMask)
        degs(s) = if (idx >= 0) idx else -1 // store csr INDEX, -1 dangling
      }
      s
    }
    var i = 0
    while (i < in.n) {
      val s = slotOf(in.keys(i))
      store.a(s) += in.a(i); store.b(s) += in.b(i)
      i += 1
    }
    def thresholdOf(s: Int): Double = {
      val idx = degs(s)
      val d = if (idx >= 0) csr.degOf(idx) else 0
      rmax * math.max(d, 1)
    }

    val queue = new Prim.IntQueue(store.n)
    val inQ = new java.util.BitSet(store.n)
    i = 0
    while (i < store.n) { // slot order == sorted first-occurrence order
      if (store.b(i) > thresholdOf(i)) { queue.add(i); inQ.set(i) }
      i += 1
    }

    val remoteMap = new Prim.LongSlotMap(64)
    val remote = new Prim.Rows3(64)
    var pushes = 0L
    while (queue.nonEmpty) {
      val s = queue.poll()
      inQ.clear(s)
      val r = store.b(s)
      if (r > thresholdOf(s)) {
        pushes += 1
        val idx = degs(s)
        if (idx < 0) { // dangling absorbs (closed-form self-loop series)
          store.a(s) += r
          store.b(s) = 0.0
        } else {
          store.a(s) += alpha * r
          store.b(s) = 0.0
          val deg = csr.degOf(idx)
          val share = (1.0 - alpha) * r / deg
          val qbits = store.keys(s) & ~VidMask
          var e = csr.offsets(idx)
          val end = csr.offsets(idx + 1)
          while (e < end) {
            val dv = csr.dsts(e)
            val dkey = qbits | dv
            if (java.lang.Math.floorMod(
                org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(dv, 42),
                p) == pid) {
              val s2 = slotOf(dkey)
              store.b(s2) += share
              if (store.b(s2) > thresholdOf(s2) && !inQ.get(s2)) {
                queue.add(s2); inQ.set(s2)
              }
            } else {
              val rs = remoteMap.getOrInsert(dkey, remote.n)
              if (rs == remote.n) remote.append(dkey, 0.0, 0.0)
              remote.b(rs) += share
            }
            e += 1
          }
        }
      }
    }
    onPush(pushes)
    onRemote(remote.n.toLong)

    val localIt = (0 until store.n).iterator
      .filter(s => store.a(s) != 0.0 || store.b(s) != 0.0)
      .map(s => KRow(store.keys(s), store.a(s), store.b(s)))
    val remoteIt = (0 until remote.n).iterator
      .map(s => KRow(remote.keys(s), 0.0, remote.b(s)))
    localIt ++ remoteIt
  }

  /** Per-partition CSR-join path (scales beyond broadcast memory;
    * supports durable per-superstep checkpoint + resume). */
  def runJoin(graph: LinkGraph, sources: Map[Int, Long], alpha: Double,
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
    

    val csrDS = graph.csr // persisted, hash-partitioned by part

    while (!converged && step < maxSupersteps) {
      val pushAcc = sc.longAccumulator(s"pushes_$step")
      val remoteAcc = sc.longAccumulator(s"remoteDeltas_$step")
      val metricsAcc = sc.collectionAccumulator[PartMetrics](s"metrics_$step")

      // COGROUP, not groupBy(part).agg(collect_list): round 1 packed a
      // partition's whole state into ONE array row — a hub-heavy part
      // hits the 2 GB row limit at scale. CoGroup streams both sides'
      // rows per key; only the cascade's own working set is in memory.
      val out = state.as[StateIn]
        .groupByKey(r => Hashing.partOf(r.vid, p))
        .cogroup(csrDS.groupByKey(_.part)) { (part, sIt, cIt) =>
          cascade(part, sIt, cIt.buffered.headOption, alpha, rmax, p,
            pushAcc.add(_), remoteAcc.add(_), metricsAcc.add(_))
        }.toDF()

      // eager checkpoint FIRST: it runs the superstep job, so the
      // accumulators below are final before the manifest reads them
      // (round-1 bug: commit args evaluated pre-job → partitions:[] and
      // totalPushes one superstep behind in every manifest)
      val eager = out.localCheckpoint(true)
      val committed = ckpt match {
        case Some(store) =>
          store.commit(step, eager,
            Map("totalPushes" -> (totalPushes + pushAcc.value).toDouble),
            metricsList(metricsAcc), Map("alpha" -> alpha.toString,
              "rmax" -> rmax.toString, "numParts" -> p.toString))
        case None => eager
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
  private def cascade(part: Int, states: Iterator[StateIn],
                      block: Option[CsrBlock], alpha: Double, rmax: Double,
                      p: Int, onPush: Long => Unit,
                      onRemote: Long => Unit, onMetrics: PartMetrics => Unit)
      : Iterator[PushRow] = {
    val srcIds = block.map(_.srcIds).getOrElse(Array.empty[Long])
    val offsets = block.map(_.offsets).getOrElse(Array.empty[Int])
    val dsts = block.map(_.dsts).getOrElse(Array.empty[Long])

    def degOf(idx: Int): Int = offsets(idx + 1) - offsets(idx)
    def threshold(deg: Int): Double = rmax * math.max(deg, 1)

    // deterministic merge of incoming rows
    val rows = states.toArray
    if (rows.isEmpty) { // CSR-only part with no state this superstep
      onPush(0L); onRemote(0L)
      return Iterator.empty
    }
    java.util.Arrays.sort(rows, Ordering.by((s: StateIn) =>
      (s.qid, s.vid, s.reserve, s.residue)))
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
          if (Hashing.partOf(dv, p) == part) {
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
    onMetrics(PartMetrics(part, acc.size.toLong, pushes, 0L, rsumLocal))

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
