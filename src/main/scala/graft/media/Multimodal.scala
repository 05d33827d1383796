package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Multimodal columns for training-data pipelines: images/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, batched per-partition
  * processing shape — is real and tested; the actual media DECODE is a
  * clearly-marked deterministic STUB (this container ships no image/audio
  * codecs). In production the stub body is replaced by the real codec
  * call inside the same `mapPartitions` batch loop (the Scala analogue of
  * `mapInPandas`: one buffer in, columnar batch out, no per-row codec
  * setup).
  */
object Multimodal {

  /** Typed media row: the input_hint-style opaque payload + metadata. */
  case class MediaRow(media_id: Long, kind: String, // image|audio|video
                      payload: Array[Byte], width: Int, height: Int,
                      sample_rate: Int, n_frames: Int)

  /** Fixed-size feature vector extracted per media item. */
  case class MediaFeatures(media_id: Long, kind: String,
                           features: Array[Float])

  /** Deterministic synthetic media table (pure function of i, seed):
    * payload bytes, dims and frame counts derived by counter hashing. */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L)
      : Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds(Hashing.uniformInt(3, seed, i, 11L))
      val len = 256 + Hashing.uniformInt(1024, seed, i, 12L)
      val payload = new Array[Byte](len)
      var j = 0
      while (j < len) {
        payload(j) = (Hashing.h64(seed, i, 13L, j.toLong) & 0xFF).toByte
        j += 1
      }
      MediaRow(i, kind, payload,
        width = 16 * (1 + Hashing.uniformInt(64, seed, i, 14L)),
        height = 16 * (1 + Hashing.uniformInt(64, seed, i, 15L)),
        sample_rate = 16000,
        n_frames = 1 + Hashing.uniformInt(300, seed, i, 16L))
    }
  }

  /** STUB decode: a real implementation calls the codec here. The stub is
    * a deterministic fake — features are a pure function of the payload
    * bytes — so the distributed plumbing (batching, schema, partition
    * shape) is end-to-end testable without codecs. */
  private def decodeFeaturesStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // ??? <- real codec + model inference goes here (e.g. JPEG decode
      //        → resize → patch embed). Deterministic fake below.
      val h = graft.util.Hashing.h64(1234L,
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(payload,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            payload.length, 42L), i.toLong)
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Batched feature extraction: one partition = one batch loop, codec
    * state initialized once per partition (the mapInPandas shape). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec/model init would happen HERE, once
      it.map(r => MediaFeatures(r.media_id, r.kind,
        decodeFeaturesStub(r.payload, dim)))
    }
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index —
    * pure metadata op (no decode), pushed-down filterable. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_ids"))

  /** Metadata audit: per kind, payload-size/dim stats — the cheap
    * full-corpus scan a pipeline runs before committing to decode. */
  def metaStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n_items"),
      sum(length(col("payload"))).as("total_bytes"),
      // exact integer sum / single division: rounds identically in any
      // engine, unlike avg() whose fp accumulation order varies
      round(sum(length(col("payload"))).cast("double") / count(lit(1)), 6)
        .as("avg_bytes"),
      max(col("width")).as("max_width"),
      max(col("n_frames")).as("max_frames"))
}
