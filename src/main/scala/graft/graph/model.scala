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
}

/** PPR iteration state for one (query, vertex) pair. `qid` keys batched
  * multi-source runs (FORA is embarrassingly parallel across sources —
  * SURVEY.md §7.4.1); single-source runs use qid=0. */
case class VertexState(qid: Int, vid: Long, reserve: Double, residue: Double)

/** One random walk in flight. */
case class Walk(qid: Int, walkId: Long, cur: Long, mass: Double, step: Int)

/** Per-superstep, per-partition execution metrics (north rule: checkpoint
  * with per-partition lineage + push/walk metrics). */
case class PartMetrics(part: Int, rows: Long, pushes: Long, walks: Long,
                       rsum: Double)
