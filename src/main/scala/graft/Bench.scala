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
    // Pay the shared graph build ONCE, attributed explicitly (VERDICT r3
    // "what's wrong" #4: whichever query first touched derivedGraph paid
    // ~12 s of table materialization, so per-query numbers lied — e.g.
    // r3's "g_pagerank 12.4s" was mostly build). Counted into the total
    // below so round-over-round totals stay comparable.
    val tBuild0 = System.nanoTime()
    val graphBuildSec = try {
      val g = SparkEntry.derivedGraph(spark, sfDir)
      g.numEdges; g.numVertices; g.outDegrees.count()
      g.undirectedEdges.count(); g.flatCsr
      val sg = SparkEntry.sparseGraph(spark, sfDir)
      sg.numEdges; sg.numVertices
      (System.nanoTime() - tBuild0) / 1e9
    } catch { case e: Throwable =>
      System.err.println(s"[bench] graph build FAILED: ${e.getMessage}")
      -1.0
    }
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
    val failed = results.values.count(_ < 0) +
      (if (graphBuildSec < 0) 1 else 0)
    // a partial total looks BETTER than a passing run (crashed queries
    // contribute 0s) — flag failures in the summary so it can't pass
    // silently as an improvement. graph_build_sec is the shared
    // derived-graph table build, included in the total.
    val total = results.values.filter(_ >= 0).sum + math.max(graphBuildSec, 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"graph_build_sec":$graphBuildSec,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
