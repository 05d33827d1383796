package graft

import org.apache.spark.sql.SparkSession
import graft.ops.{BackwardPush, ForwardPush}

/** Isolation micro-bench (guide §1.4) — NOT a driver surface: times one
  * operator with a noop-style materialization so the shared graph build
  * is excluded and chain-length / plan experiments are attributable.
  * Bench.scala stays frozen; numbers from here are cited in
  * OPTIMIZATION_r06.md only.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <what> [chainLen]
  *   what ∈ pprjoin | bpushjoin | build
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "pprjoin"
    val chain = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[benchextra] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    what match {
      case "build" =>
        timed(s"build $sfDir") {
          val g = SparkEntry.derivedGraph(spark, sfDir)
          g.numEdges; g.numVertices; g.outDegrees.count()
          g.undirectedEdges.count(); g.flatCsr
          val sg = SparkEntry.sparseGraph(spark, sfDir)
          sg.numEdges; sg.numVertices
        }
      case "pprjoin" =>
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges; g.csrZip.count() // shared build excluded from timing
        val rmax = 1e-9 / (g.numEdges + g.numVertices).toDouble
        val res = timed(s"pprjoin chain=$chain") {
          val r = ForwardPush.runJoin(g, Map(0 -> 1L), alpha = 0.2,
            rmax = rmax, chainLen = chain)
          r.state.write.format("noop").mode("overwrite").save()
          r
        }
        println(s"[benchextra] supersteps=${res.supersteps} " +
          s"pushes=${res.pushes} rsum=${res.rsum}")
      case "bpushjoin" =>
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges
        timed("incsr build") { BackwardPush.inCsr(g).count() }
        val res = timed(s"bpushjoin chain=$chain") {
          val r = BackwardPush.runJoin(g, Map(0 -> 1L), alpha = 0.2,
            rmax = 1e-11, chainLen = chain)
          r.state.write.format("noop").mode("overwrite").save()
          r
        }
        println(s"[benchextra] supersteps=${res.supersteps} " +
          s"pushes=${res.pushes} rsum=${res.rsum}")
      case other =>
        System.err.println(s"[benchextra] unknown mode $other")
    }
    spark.stop()
  }
}
