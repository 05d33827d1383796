package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable
import org.apache.spark.storage.StorageLevel
import graft.graph.LinkGraph
import graft.util.Hashing

/** Backward (reverse) push from target vertices (SURVEY.md O15;
  * Andersen et al. 2007; the backward half of BiPPR [KDD17 §2.3]).
  *
  * Estimates π(·, t): with residual r_t and reserve π°_t,
  *   π(s,t) = π°_t(s) + Σ_v r_t(v)·π(s,v)
  * push at v: π°_t(v) += α·r; every in-neighbor u gains
  * (1−α)·r/outdeg(u); r(v) = 0. Unlike forward push the weight depends on
  * the SENDER-side out-degree, so the in-CSR stores a weight per entry.
  *
  * Dangling (absorb convention): a dangling u has a self-loop in P', so
  * the in-CSR gets an explicit (v=u ← u, w=1) entry; the cascade's
  * closed form then converts the whole residual (geometric series), same
  * as forward.
  *
  * Execution shape mirrors ForwardPush: one row-level exchange per
  * superstep + a 1:1 per-part join against the persisted weighted in-CSR.
  */
object BackwardPush {

  case class BRow(qid: Int, vid: Long, reserve: Double, residue: Double,
                  delta: Boolean)
  case class BState(qid: Int, vid: Long, reserve: Double, residue: Double)
  case class BCsr(part: Int, srcIds: Array[Long], offsets: Array[Int],
                  dsts: Array[Long], wts: Array[Double])

  case class Result(state: DataFrame, rsum: Double, supersteps: Int,
                    pushes: Long)

  /** Weighted in-adjacency CSR blocks, built once per graph (cached on
    * the LinkGraph's storage dir). */
  def inCsr(graph: LinkGraph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val path = s"${graph.storageDir}/in_csr_weighted"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path))) {
      val p = graph.numParts
      val entries = graph.edges.toDF()
        .join(graph.outDegrees.select($"vid".as("src"), $"outDeg"), "src")
        .select($"dst".as("v"), $"src".as("u"),
          (lit(1.0) / $"outDeg").as("w"))
        .unionByName(graph.outDegrees.where($"outDeg" === 0)
          .select($"vid".as("v"), $"vid".as("u"), lit(1.0).as("w")))
      entries
        .groupByKey(r => Hashing.partOf(r.getLong(0), p))
        .mapGroups { (part, it) =>
          val rows = it.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .toArray.sortBy(t => (t._1, t._2))
          val srcIds = rows.map(_._1).distinct
          val offsets = new Array[Int](srcIds.length + 1)
          val dsts = new Array[Long](rows.length)
          val wts = new Array[Double](rows.length)
          var i = 0; var s = 0
          rows.foreach { case (v, u, w) =>
            while (s < srcIds.length && srcIds(s) != v) { s += 1; offsets(s) = i }
            dsts(i) = u; wts(i) = w; i += 1
          }
          while (s < srcIds.length) { s += 1; offsets(s) = i }
          BCsr(part, srcIds, offsets, dsts, wts)
        }.toDF()
        .write.mode("overwrite").parquet(path)
    }
    val back = spark.read.parquet(path)
      .repartition(graph.numParts, $"part")
      .persist(StorageLevel.MEMORY_AND_DISK)
    back.count()
    back
  }

  /** Run backward push to threshold rmax from each target (qid → t). */
  def run(graph: LinkGraph, targets: Map[Int, Long], alpha: Double,
          rmax: Double, maxSupersteps: Int = 10000): Result = {
    val spark = graph.spark
    import spark.implicits._
    val p = graph.numParts
    val sc = spark.sparkContext
    val csr = inCsr(graph)

    var state: DataFrame = targets.toSeq.sortBy(_._1)
      .map { case (q, v) => BRow(q, v, 0.0, 1.0, delta = true) }.toDF()
    var step = 0
    var converged = false
    var totalPushes = 0L

    while (!converged && step < maxSupersteps) {
      val pushAcc = sc.longAccumulator(s"bpushes_$step")
      val remoteAcc = sc.longAccumulator(s"bremote_$step")
      // cogroup streams state rows per part — no collect_list giant row
      // (same 2 GB-row fix as ForwardPush.runJoin)
      val out = state.as[BState]
        .groupByKey(r => Hashing.partOf(r.vid, p))
        .cogroup(csr.as[BCsr].groupByKey(_.part)) { (part, sIt, cIt) =>
          cascade(part, sIt, cIt.buffered.headOption, alpha, rmax, p,
            pushAcc.add(_), remoteAcc.add(_))
        }.toDF()
        .localCheckpoint(true)
      state = out
      totalPushes += pushAcc.value
      converged = remoteAcc.value == 0
      step += 1
    }
    val finalState = state.groupBy($"qid", $"vid")
      .agg(sum($"reserve").as("reserve"), sum($"residue").as("residue"))
    val rsum = finalState.agg(sum($"residue")).as[Double].head()
    Result(finalState, rsum, step, totalPushes)
  }

  private def cascade(part: Int, states: Iterator[BState],
                      block: Option[BCsr], alpha: Double, rmax: Double,
                      p: Int, onPush: Long => Unit, onRemote: Long => Unit)
      : Iterator[BRow] = {
    val srcIds = block.map(_.srcIds).getOrElse(Array.empty[Long])
    val offsets = block.map(_.offsets).getOrElse(Array.empty[Int])
    val dsts = block.map(_.dsts).getOrElse(Array.empty[Long])
    val wts = block.map(_.wts).getOrElse(Array.empty[Double])

    val rows = states.toArray
    if (rows.isEmpty) { onPush(0L); onRemote(0L); return Iterator.empty }
    java.util.Arrays.sort(rows, Ordering.by((s: BState) =>
      (s.qid, s.vid, s.reserve, s.residue)))
    val acc = mutable.LinkedHashMap.empty[(Int, Long), Array[Double]]
    rows.foreach { s =>
      val a = acc.getOrElseUpdate((s.qid, s.vid), Array(0.0, 0.0))
      a(0) += s.reserve; a(1) += s.residue
    }
    val queue = mutable.ArrayDeque.empty[(Int, Long)]
    val queued = mutable.HashSet.empty[(Int, Long)]
    acc.keysIterator.toArray.sortBy(identity).foreach { k =>
      if (acc(k)(1) > rmax) { queue.append(k); queued += k }
    }
    val remote = mutable.LinkedHashMap.empty[(Int, Long), Double]
    var pushes = 0L
    while (queue.nonEmpty) {
      val k = queue.removeHead(); queued -= k
      val (qid, vid) = k
      val a = acc(k)
      val r = a(1)
      if (r > rmax) {
        pushes += 1
        val idx = java.util.Arrays.binarySearch(srcIds, vid)
        // self-loop entries make the dangling geometric series explicit;
        // detect pure self-loop rows for the closed form
        if (idx >= 0 && offsets(idx + 1) - offsets(idx) == 1 &&
            dsts(offsets(idx)) == vid && wts(offsets(idx)) == 1.0) {
          a(0) += r; a(1) = 0.0 // absorb closed form
        } else {
          a(0) += alpha * r
          a(1) = 0.0
          if (idx >= 0) {
            var i = offsets(idx)
            while (i < offsets(idx + 1)) {
              val u = dsts(i); val m = (1.0 - alpha) * r * wts(i)
              if (Hashing.partOf(u, p) == part) {
                val kk = (qid, u)
                val aa = acc.getOrElseUpdate(kk, Array(0.0, 0.0))
                aa(1) += m
                if (aa(1) > rmax && !queued.contains(kk)) {
                  queue.append(kk); queued += kk
                }
              } else remote.updateWith((qid, u)) {
                case Some(x) => Some(x + m); case None => Some(m) }
              i += 1
            }
          }
        }
      }
    }
    onPush(pushes)
    onRemote(remote.size.toLong)
    val local = acc.iterator
      .filter { case (_, a) => a(0) != 0.0 || a(1) != 0.0 }
      .map { case ((q, v), a) => BRow(q, v, a(0), a(1), delta = false) }
      .toArray.sortBy(r => (r.qid, r.vid))
    val rem = remote.iterator
      .map { case ((q, v), m) => BRow(q, v, 0.0, m, delta = true) }
      .toArray.sortBy(r => (r.qid, r.vid))
    (local ++ rem).iterator
  }

  /** BiPPR pair query (SURVEY.md O16): π̂(s,t) = π°_t(s) +
    * (1/ω)·Σ_w r_t(endpoint of forward walk w from s). */
  def biPprPair(graph: LinkGraph, s: Long, t: Long, alpha: Double = 0.2,
                rmaxB: Double = 1e-4, omega: Long = 10000,
                seed: Long = 42L): Double = {
    val spark = graph.spark
    import spark.implicits._
    val back = run(graph, Map(0 -> t), alpha, rmaxB)
    val rt = back.state.select($"vid", $"reserve", $"residue")
    val reserveAtS = rt.where($"vid" === s).select($"reserve")
      .as[Double].collect().headOption.getOrElse(0.0)
    val seeds = spark.range(omega)
      .select(lit(0).as("qid"), lit(s).as("origin"), $"id".as("slot"),
        lit(s).as("cur"), lit(1.0 / omega).as("mass"))
    val hits = RandomWalks.run(graph, seeds, alpha, seed)
      .groupBy($"vid").agg(sum($"mass").as("w"))
      .join(rt.select($"vid", $"residue"), "vid")
      .agg(coalesce(sum($"w" * $"residue"), lit(0.0))).as[Double].head()
    reserveAtS + hits
  }
}
