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

  def local(cores: Int): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]")
      .appName("graft"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
