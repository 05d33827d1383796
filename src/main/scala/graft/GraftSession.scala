package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession config (SURVEY.md §4.2): AQE on (skew-join +
  * coalescing), shuffled-hash preferred over sort-merge (iterative joins
  * against cached adjacency shouldn't re-sort it every superstep),
  * shuffle.partitions sized to cores not 200. */
object GraftSession {
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
      // single-box bench sizing: GB-scale inputs at the default 128 MB
      // split into ~8-12 scan tasks — 1-2 waves at 8 cores, so one
      // straggler idles most of the box. 32 MB keeps every file scan
      // ≥4 waves per level; a real cluster keeps the 128 MB default
      // (its task count comes from data volume, not one box's cores)
      .config("spark.sql.files.maxPartitionBytes", (32L << 20).toString)
      // bench-only experiment hook (scaling probes): override the
      // parquet codec, e.g. SPARK_GRAFT_CODEC=uncompressed|lz4|zstd
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "snappy"))

  def local(cores: Int): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]")
      .appName("graft"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
