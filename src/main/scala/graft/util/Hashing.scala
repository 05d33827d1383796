package graft.util

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Counter-based deterministic RNG built on xxhash64 (SURVEY.md §7.5, O23).
  *
  * Every random draw in the engine is a pure function of
  * `(seed, stable ids...)` — never of partition index, task order or wall
  * clock — so results are bitwise identical at local[1], local[8] and
  * local[32], which the scaling protocol (BASELINE.md §3) requires before
  * timings are accepted.
  *
  * Uses the exact same XXH64 implementation as Spark SQL's `xxhash64`
  * function, so driver-side Scala, executor-side closures and Catalyst
  * column expressions can interoperate on identical hash values.
  */
object Hashing {
  /** Spark SQL xxhash64 default seed. */
  final val SqlSeed = 42L

  /** Chain-hash longs the way Spark's `xxhash64(col...)` does:
    * each value hashed with the running hash as seed. */
  def h64(seed: Long, xs: Long*): Long = {
    var h = seed
    var i = 0
    while (i < xs.length) { h = XXH64.hashLong(xs(i), h); i += 1 }
    h
  }

  def hashString(s: String, seed: Long): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, seed)
  }

  /** Uniform double in [0, 1) from a hash value. */
  def toUnit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** Uniform double in [0,1) from chained counters. */
  def u01(seed: Long, xs: Long*): Double = toUnit(h64(seed, xs: _*))

  /** Uniform int in [0, n) from chained counters (n > 0). */
  def uniformInt(n: Int, seed: Long, xs: Long*): Int = {
    val h = h64(seed, xs: _*)
    // floorMod keeps the result non-negative for negative hashes
    java.lang.Math.floorMod(h, n.toLong).toInt
  }

  /** Non-negative partition id for a vertex: stable across runs & configs. */
  def partOf(vid: Long, numParts: Int): Int =
    java.lang.Math.floorMod(XXH64.hashLong(vid, SqlSeed), numParts.toLong).toInt
}
