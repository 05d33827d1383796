package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for registered queries, one file per
  * query, under an output dir — the before/after plan evidence for
  * optimization rounds (plans/r06/<query>_<suffix>.txt).
  *
  * Session config mirrors Bench's (master local[cpus],
  * shuffle.partitions=cpus) so the captured plans are the bench-time
  * plans. Building a query's DataFrame runs the iterative driver loops
  * eagerly (their per-step plans are truncated by design — the explain
  * then shows the surviving shallow plan, which is the point).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "plans/r06"
    val suffix = if (args.length > 2) args(2) else "before"
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
