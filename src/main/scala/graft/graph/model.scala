package graft.graph

/** Core typed rows of the link-graph engine (SURVEY.md §1.2). */

/** Directed edge over dense vertex ids. */
case class Edge(src: Long, dst: Long)

/** A url ↔ dense-vid dictionary entry. */
case class VertexUrl(vid: Long, url: String)

/** Extracted link over urls (pre-dictionary). */
case class LinkRow(src_url: String, dst_url: String)

/** Per-vertex adjacency slab: the engine's CSR row. `dsts` is sorted so
  * iteration order — and therefore every float reduction fed from it — is
  * deterministic and partition-independent. */
case class VertexAdj(src: Long, dsts: Array[Long]) {
  def outDeg: Int = dsts.length
}

/** Per-partition CSR block (SURVEY.md §1.2): struct-of-arrays packing of
  * all adjacency slabs whose source hashes into `part`. One row per
  * partition; built once, persisted; joined 1:1 with the grouped frontier
  * each superstep. `srcIds` sorted ascending; vertex i owns
  * `dsts[offsets(i) until offsets(i+1))`. */
case class CsrBlock(part: Int, srcIds: Array[Long], offsets: Array[Int],
                    dsts: Array[Long]) {
  def indexOf(vid: Long): Int = java.util.Arrays.binarySearch(srcIds, vid)
}

/** Whole-graph CSR (broadcast form for the single-box fast path). */
case class FlatCsr(srcIds: Array[Long], offsets: Array[Int],
                   dsts: Array[Long]) {
  def indexOf(vid: Long): Int = java.util.Arrays.binarySearch(srcIds, vid)
  def degOf(idx: Int): Int = offsets(idx + 1) - offsets(idx)

  /** O(1) vid→index table for the walk kernels. A walk step's binary
    * search costs ~log2(n) dependent cache misses; at ~10⁸ random steps
    * per query batch those probes ARE the walk phase's memory wall
    * (measured: walks scale 0.46 on the 2→8-core window while the
    * better-localized push cascade scales 0.89). 2×-sized linear-probe
    * table ⇒ 1–2 touches per lookup. @transient lazy: rebuilt once per
    * executor JVM after broadcast deserialization, never shipped. */
  @transient lazy val fastIndex: graft.util.Prim.LongSlotMap = {
    val t = new graft.util.Prim.LongSlotMap(srcIds.length)
    var i = 0
    while (i < srcIds.length) { t.getOrInsert(srcIds(i), i); i += 1 }
    t
  }
  /** As indexOf (negative when absent), via the O(1) table. */
  def fastIndexOf(vid: Long): Int = fastIndex.get(vid)
}

/** Per-superstep, per-partition execution metrics (north rule: checkpoint
  * with per-partition lineage + push/walk metrics). */
case class PartMetrics(part: Int, rows: Long, pushes: Long, walks: Long,
                       rsum: Double)
