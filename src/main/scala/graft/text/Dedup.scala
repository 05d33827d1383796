package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, token-set Jaccard.
  *
  * All randomness is counter-based (xxhash64 with literal seeds), so
  * signatures are reproducible at any parallelism and across runs.
  *
  * Scale notes (100 TB story):
  *   - exact: one hash-aggregate over the corpus, salt-free (md5 keys are
  *     uniform — no hot keys).
  *   - minhashLSH: cost is O(docs × tokens) for signatures (one scan +
  *     one agg), then candidate generation touches only docs sharing a
  *     band bucket — never the all-pairs cross join. Band buckets of hot
  *     boilerplate can skew; AQE skew-join handles the candidate
  *     self-join.
  *   - jaccard verification joins only candidate pairs.
  */
object Dedup {

  /** Exact duplicate groups by content fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Distinct lowercase whitespace tokens per doc. */
  private def tokens(textCol: Column): Column =
    array_distinct(split(lower(textCol), " "))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * min over token hashes. Returned as array<long>. */
  def minhashSignature(textCol: Column, numHashes: Int): Column = {
    val toks = tokens(textCol)
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(toks, t => xxhash64(lit(i), t)))
    }
    array(sigs: _*)
  }

  /** Exact token-set Jaccard for given candidate pairs (or all pairs of a
    * small corpus when `candidates` is None — test/oracle path). */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = toks.as("x").join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("common").cast("double") /
          (col("sza") + col("szb") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates → exact Jaccard
    * verification → pairs above threshold. */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.8,
                     numHashes: Int = 32, bands: Int = 8,
                     idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sig = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rows + lit(1), lit(rows))
          .cast("string")))).as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("cand_a"), col("y.id").as("cand_b"))
      .dropDuplicates("cand_a", "cand_b")
    val verified = jaccardPairs(
      docs.join(broadcastableIds(cand), col(idCol) === col("cid"), "left_semi"),
      threshold, idCol, textCol)
    verified.join(cand,
        verified("a") === cand("cand_a") && verified("b") === cand("cand_b"),
        "left_semi")
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  private def broadcastableIds(cand: DataFrame): DataFrame =
    cand.select(col("cand_a").as("cid"))
      .union(cand.select(col("cand_b").as("cid"))).distinct()

  /** 64-bit SimHash: weighted sign-sum of token-hash bits. */
  def simhash(textCol: Column): Column = {
    val toks = tokens(textCol)
    // for each bit b: popcount-style sum of (bit set ? 1 : -1) over tokens
    val bits = (0 until 64).map { b =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Buckets by
    * 16-bit chunks (pigeonhole: dist ≤ 3 ⇒ some chunk equal). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = sigs.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val cand = chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sh").as("sha"), col("y.sh").as("shb"))
      .dropDuplicates("a", "b")
    cand.select(col("a"), col("b"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .where(col("hamming") <= maxDist)
  }
}
