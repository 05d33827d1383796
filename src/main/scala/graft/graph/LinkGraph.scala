package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.html.Html
import graft.util.Hashing

/** The engine's graph handle: a deduped edge table plus derived structures
  * (adjacency, CSR blocks, degrees), each MATERIALIZED as a parquet table
  * once and then cached hash-partitioned.
  *
  * Materialize-then-rescan matters twice at scale (SURVEY.md §4.2):
  *   - iterative operators reference these tables in every superstep; if
  *     they carried their full ingest lineage, chained plans blow up
  *     super-linearly (measured: 45M-char optimized plan after 5 chained
  *     PageRank steps against un-materialized tables; constant ~kB once
  *     they are plain scans);
  *   - the tables double as the durable "graph build" artifact a real
  *     deployment would register in a catalog (Iceberg in the north rule;
  *     plain parquet dirs here).
  *
  * Vertex ids are dense longs 0..n-1 when built from pages via the
  * dictionary; arbitrary non-negative longs from an external edge table.
  */
final class LinkGraph private (
    val spark: SparkSession,
    val storageDir: String,
    val numParts: Int) extends Serializable {
  import spark.implicits._

  private def materialize(df: DataFrame, name: String,
                          partBy: Option[String]): DataFrame = {
    val path = s"$storageDir/$name"
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    val shaped = partBy match {
      case Some(c) => back.repartition(numParts, col(c))
      case None => back
    }
    val cached = shaped.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    cached
  }

  /** Deduped directed edges, no self-loops, partitioned by src. */
  lazy val edges: Dataset[Edge] = spark.read
    .parquet(s"$storageDir/edges").repartition(numParts, $"src")
    .as[Edge].persist(StorageLevel.MEMORY_AND_DISK)

  /** Out-adjacency with sorted neighbor slabs, partitioned by src. */
  lazy val adj: Dataset[VertexAdj] = materialize(
    edges.groupBy($"src").agg(sort_array(collect_list($"dst")).as("dsts")),
    "adj", Some("src")).as[VertexAdj]

  /** Per-partition CSR blocks (SURVEY.md §1.2): one row per content-derived
    * partition (part = pmod(xxhash64(src), P) — never the physical
    * partition index, so blocks are identical at any parallelism). */
  lazy val csr: Dataset[CsrBlock] = materialize(
    adj.groupByKey(a => Hashing.partOf(a.src, numParts))
      .mapGroups { (part, it) => LinkGraph.packCsr(part, it) }.toDF(),
    "csr", Some("part")).as[CsrBlock]

  /** All vertex ids (sources ∪ sinks), partitioned by vid. */
  lazy val vertices: Dataset[Long] = materialize(
    edges.select($"src".as("vid"))
      .union(edges.select($"dst".as("vid"))).distinct().toDF(),
    "vertices", Some("vid")).as[Long]

  /** (vid, outDeg) for every vertex, 0 for dangling. */
  lazy val outDegrees: DataFrame = materialize(
    vertices.toDF("vid")
      .join(adj.select($"src".as("vid"), size($"dsts").as("outDeg")),
        Seq("vid"), "left")
      .na.fill(0, Seq("outDeg")),
    "out_degrees", Some("vid"))

  /** Symmetrized simple edge set (src<dst, each undirected edge once). */
  lazy val undirectedEdges: Dataset[Edge] = materialize(
    edges.select(least($"src", $"dst").as("src"),
        greatest($"src", $"dst").as("dst")).distinct(),
    "und_edges", Some("src")).as[Edge]

  lazy val numVertices: Long = vertices.count()
  lazy val numEdges: Long = edges.count()

  /** (min, max) vertex id — gates the packed-key fast paths, which encode
    * qid<<40|vid and therefore require 0 ≤ vid < 2^40. */
  lazy val vidBounds: (Long, Long) = {
    val r = vertices.toDF("vid")
      .agg(min($"vid"), max($"vid")).as[(Long, Long)].head()
    r
  }

  /** Whole-graph CSR broadcast for the single-box fast path (ForwardPush/
    * walks): legitimate whenever the adjacency fits in executor memory
    * (~16 B/edge); operators fall back to the per-partition CSR-join path
    * above this limit. */
  lazy val flatCsr: org.apache.spark.broadcast.Broadcast[FlatCsr] =
    registerBroadcast("flatCsr") {
      val slabs = adj.collect().sortBy(_.src)
      val srcIds = slabs.map(_.src)
      val offsets = new Array[Int](slabs.length + 1)
      var i = 0
      while (i < slabs.length) {
        offsets(i + 1) = offsets(i) + slabs(i).dsts.length; i += 1
      }
      val dsts = new Array[Long](offsets(slabs.length))
      i = 0
      while (i < slabs.length) {
        System.arraycopy(slabs(i).dsts, 0, dsts, offsets(i), slabs(i).dsts.length)
        i += 1
      }
      spark.sparkContext.broadcast(FlatCsr(srcIds, offsets, dsts))
    }

  /** Broadcasts derived from THIS graph instance (flat CSR, reverse CSR).
    * Instance-scoped — a process-global cache keyed by storageDir served
    * stale adjacency after a same-dir rebuild and leaked one broadcast
    * per graph for the session's lifetime (ADVICE r2 #3). */
  private val derivedBroadcasts = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.broadcast.Broadcast[_]]

  /** Build-once holder for a broadcast tied to this graph's lifetime;
    * destroyed by unpersistAll. */
  def registerBroadcast[T](key: String)(
      build: => org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] =
    derivedBroadcasts.getOrElseUpdate(key, build)
      .asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]

  def unpersistAll(): Unit = {
    edges.unpersist(); adj.unpersist(); csr.unpersist()
    vertices.unpersist(); outDegrees.unpersist(); undirectedEdges.unpersist()
    derivedBroadcasts.values.foreach(_.destroy())
    derivedBroadcasts.clear()
  }
}

object LinkGraph {

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-graph-").toString

  /** CSR block sizing rule (VERDICT r2 #8): a CsrBlock row carries one
    * partition's whole adjacency as in-row arrays, so its size is bounded
    * by construction, not by luck — numParts is derived from the edge
    * count so the MEAN block stays ≤ this many edges (~256 MB of dsts at
    * 8 B/edge, far under the 2 GB UnsafeRow ceiling with ~8× headroom
    * for hash skew), and packCsr enforces the hard per-block cap below.
    * `var` so specs can exercise the rule without 32M-edge fixtures. */
  var edgesPerBlockTarget: Long = 32L * 1000 * 1000

  /** Hard per-block ceiling: mean sizing plus 8× skew headroom. A block
    * above this aborts the build with the sizing rule in the message —
    * silent truncation or a 2 GB row failure mid-query are the
    * alternatives. */
  def maxBlockEdges: Long = edgesPerBlockTarget * 8

  /** Partition count satisfying the sizing rule for `numEdges`, at least
    * the caller's request. */
  def partsFor(requested: Int, numEdges: Long): Int =
    math.max(requested,
      ((numEdges + edgesPerBlockTarget - 1) / edgesPerBlockTarget).toInt)

  /** Build from a raw directed edge DataFrame with columns (src, dst).
    * `numParts` is a minimum: the effective partition count is raised to
    * meet the CSR block sizing rule (edgesPerBlockTarget). */
  def fromEdges(spark: SparkSession, raw: DataFrame, numParts: Int,
                storageDir: String = tempDir()): LinkGraph = {
    import spark.implicits._
    val e = raw.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .distinct()
    e.write.mode("overwrite").parquet(s"$storageDir/edges")
    val m = spark.read.parquet(s"$storageDir/edges").count()
    val g = new LinkGraph(spark, storageDir, partsFor(numParts, m))
    g.edges.count()
    g
  }

  /** Full ingest: pages table → links (href extraction, SURVEY.md N1) →
    * url dictionary (dense vids, N3) → edge table. Returns the graph plus
    * the dictionary for score ↔ url reporting. */
  def fromPages(spark: SparkSession, pages: DataFrame, numParts: Int,
                storageDir: String = tempDir()): (LinkGraph, Dataset[VertexUrl]) = {
    import spark.implicits._
    val links = extractLinkRows(spark, pages)
    links.write.mode("overwrite").parquet(s"$storageDir/links")
    val linksT = spark.read.parquet(s"$storageDir/links").as[LinkRow]
    val dict = vertexDictionary(spark, linksT, storageDir)
    val d = broadcast(dict.toDF)
    val e = linksT.toDF
      .join(d.select($"url".as("src_url"), $"vid".as("src")), "src_url")
      .join(d.select($"url".as("dst_url"), $"vid".as("dst")), "dst_url")
      .select($"src", $"dst")
    (fromEdges(spark, e, numParts, storageDir), dict)
  }

  /** Deterministic link extraction: pure function of (url, html) bytes. */
  def extractLinkRows(spark: SparkSession, pages: DataFrame): Dataset[LinkRow] = {
    import spark.implicits._
    pages.select($"url", $"html").as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        val src = Html.normalizeUrl(url)
        Html.extractLinks(url, html).map(dst => LinkRow(src, dst))
      }
      .dropDuplicates("src_url", "dst_url").as[LinkRow]
  }

  /** The 40-bit vid mask for hash-assigned vids (packed fast-path keys
    * need vid < 2^40; collision audit gates correctness). */
  final val HashVidMask: Long = (1L << 40) - 1

  /** SCALE-PATH ingest (SURVEY.md §7.4.3): vids are xxhash64(salt, url)
    * truncated to 40 bits — no global sort, no dictionary join; the edge
    * table is a pure map over the link rows. A collision audit (two
    * distinct urls sharing a vid) runs per build; on collision the WHOLE
    * mapping retries with salt+1 (vid stays a pure function of
    * (salt, url), so edges and dictionary always agree). At 10^6 urls
    * one salt collides with p ≈ 0.37 (birthday, 2^40 bins), so a couple
    * of retries are routine; 16 salts fail with p ≈ 1e-7. At 10^12 keys
    * a production build widens the vid domain (and the packed fast path
    * gives way to the CSR-join path, which takes any long).
    *
    * Returns the graph plus the (vid, url) dictionary for reporting. */
  /** @param onPhase optional wall-time sink per ingest phase
    *   ("links" extraction+write, "audit" url-distinct+collision scan,
    *   "dict" dictionary write, "edges" edge-table distinct+write+count)
    *   — feeds the scaling bench's ingest phase split (VERDICT r3 #6). */
  def fromPagesHashVids(spark: SparkSession, pages: DataFrame, numParts: Int,
                        storageDir: String = tempDir(), maxSalts: Int = 16,
                        onPhase: (String, Double) => Unit = (_, _) => ())
      : (LinkGraph, Dataset[VertexUrl]) = {
    import spark.implicits._
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      onPhase(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val linksT = phase("links") {
      val links = extractLinkRows(spark, pages)
      links.write.mode("overwrite").parquet(s"$storageDir/links")
      spark.read.parquet(s"$storageDir/links").as[LinkRow]
    }
    def hvid(c: org.apache.spark.sql.Column, salt: Int) =
      xxhash64(lit(salt.toLong), c).bitwiseAND(lit(HashVidMask))

    val (urls, salt) = phase("audit") {
      val u = linksT.select($"src_url".as("url"))
        .union(linksT.select($"dst_url".as("url"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      u.count()
      var s = 0
      var done = false
      while (!done && s < maxSalts) {
        val collided = u.select(hvid($"url", s).as("vid"))
          .groupBy($"vid").agg(count(lit(1)).as("c")).where($"c" > 1)
          .limit(1).count()
        if (collided == 0) done = true else s += 1
      }
      require(done, s"hash-vid collision at every salt < $maxSalts — " +
        "widen the vid domain or use LinkGraph.fromPages")
      (u, s)
    }

    val dict = phase("dict") {
      urls.select(hvid($"url", salt).as("vid"), $"url")
        .write.mode("overwrite").parquet(s"$storageDir/dict")
      urls.unpersist()
      val d = spark.read.parquet(s"$storageDir/dict").as[VertexUrl]
        .persist(StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    val g = phase("edges") {
      val e = linksT.select(hvid($"src_url", salt).as("src"),
        hvid($"dst_url", salt).as("dst"))
      fromEdges(spark, e, numParts, storageDir)
    }
    (g, dict)
  }

  /** Dense vid assignment via global sort + row_number (fine at test
    * scale; the 10^12-key path is xxhash64-as-vid + collision audit,
    * SURVEY.md §7.4.3). Materialized to parquet like the other tables. */
  def vertexDictionary(spark: SparkSession, links: Dataset[LinkRow],
                       storageDir: String): Dataset[VertexUrl] = {
    import spark.implicits._
    val urls = links.select($"src_url".as("url"))
      .union(links.select($"dst_url".as("url"))).distinct()
    urls.withColumn("vid",
        row_number().over(Window.orderBy($"url")).cast("long") - 1L)
      .select($"vid", $"url")
      .write.mode("overwrite").parquet(s"$storageDir/dict")
    val d = spark.read.parquet(s"$storageDir/dict").as[VertexUrl]
      .persist(StorageLevel.MEMORY_AND_DISK)
    d.count()
    d
  }

  /** Pack one partition's adjacency slabs into a CSR block row. Enforces
    * the block sizing rule: partsFor keeps the MEAN block under
    * edgesPerBlockTarget, and this guard catches the pathological tail
    * (hash skew, one-hub-owns-the-partition) before it becomes a 2 GB
    * row failure deep inside a query. */
  def packCsr(part: Int, slabIt: Iterator[VertexAdj]): CsrBlock = {
    val slabs = slabIt.toArray.sortBy(_.src)
    val srcIds = slabs.map(_.src)
    val offsets = new Array[Int](slabs.length + 1)
    var i = 0
    while (i < slabs.length) {
      offsets(i + 1) = offsets(i) + slabs(i).dsts.length; i += 1
    }
    require(offsets(slabs.length).toLong <= maxBlockEdges,
      s"CSR block $part has ${offsets(slabs.length)} edges > " +
        s"maxBlockEdges=$maxBlockEdges: raise numParts (sizing rule: " +
        s"~edgesPerBlockTarget=$edgesPerBlockTarget edges/partition) or " +
        "split the offending hub's slab")
    val dsts = new Array[Long](offsets(slabs.length))
    i = 0
    while (i < slabs.length) {
      System.arraycopy(slabs(i).dsts, 0, dsts, offsets(i), slabs(i).dsts.length)
      i += 1
    }
    CsrBlock(part, srcIds, offsets, dsts)
  }

  /** Out-adjacency for an arbitrary edge Dataset (used for ad-hoc
    * symmetric adjacency in LPA). Persisted but NOT parquet-backed —
    * callers must unpersist. */
  def adjacency(edges: Dataset[Edge], numParts: Int): Dataset[VertexAdj] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val a = edges
      .groupBy($"src").agg(sort_array(collect_list($"dst")).as("dsts"))
      .repartition(numParts, $"src")
      .as[VertexAdj]
      .persist(StorageLevel.MEMORY_AND_DISK)
    a.count()
    a
  }
}
