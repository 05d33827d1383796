package graft

import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.ops._

/** Flagship-pipeline smoke run (verify surface 3): pages → links → dense
  * vids → edge table → deterministic PPR + PageRank, one LAP line per
  * phase; PPR must report rsum < 1e-7. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"LAP $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }

    val pages = sources.SyntheticPages.generate(spark, 2000L, seed = 42L)
    val nPages = pages.count()
    lap(s"pages n=$nPages")

    val (g, dict) = LinkGraph.fromPages(spark, pages.toDF(), numParts = 8)
    lap(s"graph n=${g.numVertices} m=${g.numEdges} dict=${dict.count()}")

    val ppr = ForwardPush.deterministicPpr(g, Map(0 -> 0L), alpha = 0.2,
      tol = 1e-7)
    lap(f"ppr rsum=${ppr.rsum}%.3e supersteps=${ppr.supersteps} " +
      f"pushes=${ppr.pushes}")
    require(ppr.rsum < 1e-7, s"rsum ${ppr.rsum} >= 1e-7")

    val pr = PageRank.run(g, damping = 0.85, tol = 1e-9)
    val prSum = pr.ranks.agg(sum($"rank")).as[Double].head()
    lap(f"pagerank sum=$prSum%.6f iters=${pr.iterations}")

    val top = SparkEntry.entry(spark)
    val rows = top.count()
    lap(s"entry rows=$rows")
    require(rows > 0, "entry returned no rows")
    println("SMOKE OK")
    spark.stop()
  }
}
