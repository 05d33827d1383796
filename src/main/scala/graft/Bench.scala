package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a crashed query records -1.0, never a fake timing (round-1 flaw:
    // swallowed exceptions were indistinguishable from fast queries)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val v = try { fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
      // localCheckpoint RDDs from finished queries are unreferenced but
      // only freed when GC runs (ContextCleaner is GC-driven); without
      // this, 36 queries' worth of cached blocks pile up and force disk
      // spills that poison later timings
      System.gc()
      name -> v
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.values.count(_ < 0)
    // a partial total looks BETTER than a passing run (crashed queries
    // contribute 0s) — flag failures in the summary so it can't pass
    // silently as an improvement
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
