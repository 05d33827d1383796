package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query
  *   set against the corpus, score with codegen'd array expressions
  *   (`zip_with` + `aggregate`), per-query top-k via window. One corpus
  *   scan regardless of query count: the baseline and the recall oracle.
  * - `lshTopK`: random-hyperplane LSH with `numTables` independent hash
  *   tables (OR-construction): a candidate is scored if it shares the
  *   full signature with the query in ANY table. Single-table recall at
  *   cos ≈ 0.95 is only (1−θ/π)^bits ≈ 0.43 for 8 bits; eight tables
  *   lift it to 1−(1−0.43)^8 ≈ 0.99 (AnnSpec pins the measured floor
  *   against bruteForceTopK). The 100 TB path: candidates per query are
  *   ~T·corpus/2^bits, never the full corpus.
  * - `cosineNearDuplicates`: same OR-construction over in-bucket pairs.
  * - `ivfTopK`-style coarse quantization is subsumed by lshTopK here
  *   (hash buckets instead of trained centroids — no training data
  *   leaves the sandbox).
  *
  * All hyperplanes are counter-hash-derived (xxhash64 with literal
  * seeds): deterministic at any parallelism, identical across runs.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (greatest(norm(a), lit(1e-12)) * greatest(norm(b), lit(1e-12)))

  /** Exact top-k by cosine for each query row.
    * @param corpus  (idCol, vecCol)
    * @param queries (qidCol, vecCol) — small, broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "qid"): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(queries.select(col(qidCol), col(vecCol).as("qvec"))))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")).as("cos"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(desc("cos"), col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane b, dim i):
    * ±1 from xxhash64(seed, b, i). */
  private def sigBits(vec: Column, numBits: Int, seed: Long): Column = {
    val bits = (0 until numBits).map { b =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when(pmod(xxhash64(lit(seed), lit(b), i), lit(2)) === 0,
            x).otherwise(-x)),
        lit(0.0d), (acc, v) => acc + v)
      when(s > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Per-table seeds, spread so tables are independent. */
  private def tableSeed(seed: Long, table: Int): Long =
    seed + 1000003L * (table + 1)

  /** LSH-bucketed approximate top-k: score only candidates sharing a
    * signature bucket with the query in at least one of `numTables`
    * tables. Recall vs bruteForceTopK is pinned by AnnSpec. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numBits: Int = 8, numTables: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid"): DataFrame = {
    val qv = queries.select(col(qidCol), col(vecCol).as("qvec"))
    // candidate (qid, id) pairs from the OR of all tables
    val cand = (0 until numTables).map { t =>
      val s = tableSeed(seed, t)
      val c = corpus.select(col(idCol),
        sigBits(col(vecCol).cast("array<double>"), numBits, s).as("bucket"))
      val q = qv.select(col(qidCol),
        sigBits(col("qvec").cast("array<double>"), numBits, s).as("bucket"))
      c.join(broadcast(q), Seq("bucket")).select(col(qidCol), col(idCol))
    }.reduce(_ unionByName _).distinct()
    val scored = cand
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qv), Seq(qidCol))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")).as("cos"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(desc("cos"), col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), round(col("cos"), 6).as("cos"))
  }

  /** IVF-style approximate top-k: coarse quantization with `numCells`
    * deterministic centroids (hash-sampled corpus vectors — no trained
    * k-means, nothing leaves the sandbox), corpus rows assigned to their
    * nearest centroid ONCE (the inverted file), queries probe the
    * `nProbe` nearest cells and score only those rows.
    *
    * 100 TB shape: assignment is one scan against broadcast centroids
    * (cells persist alongside the corpus, like a partition key); a query
    * touches ~nProbe/numCells of the corpus. Complements lshTopK: IVF
    * adapts to the data's density (centroids ARE data points), LSH is
    * data-independent. Recall floor pinned by AnnSpec vs bruteForceTopK. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid"): DataFrame = {
    // deterministic centroid pick: the numCells corpus rows with the
    // smallest Knuth multiplicative hash of their id — a uniform sample,
    // pure function of the data, and expressible in plain SQL so the
    // DuckDB oracle can replicate the whole operator
    val centroids = corpus
      .select(col(idCol).as("cell_id"), col(vecCol).as("cvec"))
      .orderBy(pmod(col(idCol) * lit(2654435761L), lit(4294967296L)),
        col(idCol))
      .limit(numCells)
    def nearestCells(df: DataFrame, keyCol: String, vec: Column, n: Int,
                     outCol: String) = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("csim", cosine(vec.cast("array<double>"),
          col("cvec").cast("array<double>")))
      val w = Window.partitionBy(col(keyCol))
        .orderBy(desc("csim"), col("cell_id").asc)
      scored.withColumn("crank", row_number().over(w))
        .where(col("crank") <= n)
        .withColumnRenamed("cell_id", outCol)
    }
    // inverted file: each corpus row in its single nearest cell
    val assigned = nearestCells(corpus.select(col(idCol), col(vecCol)),
      idCol, col(vecCol), 1, "cell")
      .select(col(idCol), col(vecCol), col("cell"))
    val qv = queries.select(col(qidCol), col(vecCol).as("qvec"))
    val probes = nearestCells(qv, qidCol, col("qvec"), nProbe, "cell")
      .select(col(qidCol), col("qvec"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol).cast("array<double>"),
          col("qvec").cast("array<double>")).as("cos"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(desc("cos"), col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): OR of
    * `numTables` LSH tables → in-bucket pairs → cosine threshold. */
  def cosineNearDuplicates(corpus: DataFrame, threshold: Double = 0.95,
                           numBits: Int = 8, numTables: Int = 8,
                           seed: Long = 42L,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val pairs = (0 until numTables).map { t =>
      val s = tableSeed(seed, t)
      val c = corpus.select(col(idCol).as("id"),
        sigBits(col(vecCol).cast("array<double>"), numBits, s).as("bucket"))
      c.as("x").join(c.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"))
    }.reduce(_ unionByName _).distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(vecs.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"),
        cosine(col("va").cast("array<double>"),
          col("vb").cast("array<double>")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }
}
