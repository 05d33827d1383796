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

    // stage-level accounting: wall time between stage submit/complete,
    // summed task time, per stage-name prefix
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[String,
      (Int, Double, Double, Double, Double, Double)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3).getOrElse(0.0)
          val tm = si.taskMetrics
          val task = tm.executorRunTime / 1e3
          val gc = tm.jvmGCTime / 1e3
          val deser = tm.executorDeserializeTime / 1e3
          val fetch = tm.shuffleReadMetrics.fetchWaitTime / 1e3
          val key = si.name.split(" at ").lastOption.getOrElse(si.name)
          stageAgg.merge(key, (1, wall, task, gc, deser, fetch),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4,
              a._5 + b._5, a._6 + b._6))
        }
      })
    def dumpStages(): Unit = {
      import scala.jdk.CollectionConverters._
      stageAgg.asScala.toSeq.sortBy(-_._2._2).take(14).foreach {
        case (k, (n, w, t, gc, de, fw)) =>
          println(f"[benchextra]   stage $k%-40s n=$n%4d wall=$w%7.2f task=$t%7.2f gc=$gc%6.2f deser=$de%6.2f fetchw=$fw%6.2f")
      }
      stageAgg.clear()
    }

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
          val g = timed("fromEdges (distinct+count)") {
            SparkEntry.derivedGraph(spark, sfDir)
          }
          timed("numEdges") { g.numEdges }
          timed("numVertices") { g.numVertices }
          timed("outDegrees (csr+adj+join)") { g.outDegrees.count() }
          timed("undirectedEdges") { g.undirectedEdges.count() }
          timed("flatCsr collect") { g.flatCsr }
          timed("sparse graph") {
            val sg = SparkEntry.sparseGraph(spark, sfDir)
            sg.numEdges; sg.numVertices
          }
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
        dumpStages()
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
      case "pagerank" =>
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges; g.outDegrees.count(); Thread.sleep(3000)
        stageAgg.clear()
        val saved = graft.ops.PageRank.DenseMaxVertices
        graft.ops.PageRank.DenseMaxVertices = 0L
        try timed("pagerank 12 iters (forced join)") {
          val r = graft.ops.PageRank.run(g, damping = 0.8, tol = 0.0,
            maxIter = 12, checkEvery = 12)
          r.ranks.write.format("noop").mode("overwrite").save()
        } finally graft.ops.PageRank.DenseMaxVertices = saved
        dumpStages()
      case "mcjoin" =>
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges; g.adj.count(); Thread.sleep(2000)
        stageAgg.clear()
        val saved = graft.ops.ForwardPush.fastPathMaxEdges
        graft.ops.ForwardPush.fastPathMaxEdges = 0L
        try timed("montecarlo (forced hop-join walks)") {
          graft.ops.Fora.montecarlo(g, Map(0 -> 1L),
            graft.ops.Fora.Params(eps = 0.5, delta = 0.01))
            .write.format("noop").mode("overwrite").save()
        } finally graft.ops.ForwardPush.fastPathMaxEdges = saved
        dumpStages()
      case "ccstars" =>
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges; g.undirectedEdges.count(); Thread.sleep(2000)
        stageAgg.clear()
        val saved = graft.ops.ConnectedComponents.DenseMaxUndEdges
        graft.ops.ConnectedComponents.DenseMaxUndEdges = 0L
        try timed("cc star contraction (forced)") {
          graft.ops.ConnectedComponents.run(g).components
            .write.format("noop").mode("overwrite").save()
        } finally graft.ops.ConnectedComponents.DenseMaxUndEdges = saved
        dumpStages()
      case "foraerr" =>
        import org.apache.spark.sql.functions._
        val g = SparkEntry.derivedGraph(spark, sfDir)
        g.numEdges; g.numVertices; g.flatCsr; Thread.sleep(1000)
        stageAgg.clear()
        val p = graft.ops.Fora.Params(eps = 0.5, delta = 0.01, pfail = 1e-4)
        val srcs = Map(0 -> 1L, 1 -> 2L, 2 -> 3L)
        timed("threeSourcePush tol=1e-9") {
          graft.ops.ForwardPush.deterministicPpr(g, srcs, alpha = 0.2,
            tol = 1e-9, qidShard = 3)
            .state.write.format("noop").mode("overwrite").save()
        }
        timed("fora query pfail=1e-4") {
          graft.ops.Fora.query(g, srcs, p).scores
            .write.format("noop").mode("overwrite").save()
        }
        timed("montecarlo pfail=1e-4") {
          graft.ops.Fora.montecarlo(g, srcs, p)
            .write.format("noop").mode("overwrite").save()
        }
        dumpStages()
      case "neardup" =>
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val sample = docs.where(col("doc_id") % 10 === 0)
          .localCheckpoint(true)
        (1 to 2).foreach { i =>
          timed(s"exact jaccardPairs(0.8) #$i") {
            graft.text.Dedup.jaccardPairs(sample, threshold = 0.8)
              .write.format("noop").mode("overwrite").save()
          }
        }
        (1 to 2).foreach { i =>
          timed(s"lsh nearDuplicates(0.8) #$i") {
            graft.text.Dedup.nearDuplicates(sample, threshold = 0.8)
              .write.format("noop").mode("overwrite").save()
          }
        }
        timed("full audit shape") {
          val lsh = graft.text.Dedup.nearDuplicates(sample, threshold = 0.8)
            .select(col("a"), col("b")).localCheckpoint(true)
          val exact = graft.text.Dedup.jaccardPairs(sample, threshold = 0.8)
            .select(col("a"), col("b")).localCheckpoint(true)
          exact.agg(count(lit(1)).as("n_exact"))
            .crossJoin(lsh.except(exact).agg(count(lit(1)).as("n_fp")))
            .crossJoin(exact.except(lsh).agg(count(lit(1)).as("n_miss")))
            .write.format("noop").mode("overwrite").save()
        }
        dumpStages()
      case "neardup2" =>
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val sample = docs.where(col("doc_id") % 10 === 0)
          .localCheckpoint(true)
        sample.count()
        (1 to 2).foreach { i =>
          val t = timed(s"#$i tokenize+ckpt") {
            val x = sample.select(col("doc_id").as("id"),
              array_distinct(split(lower(col("text")), " ")).as("toks"))
              .repartition(col("id")).localCheckpoint(true)
            x.count(); x
          }
          timed(s"#$i pair join condition only") {
            t.as("x").join(broadcast(t.as("y")), col("x.id") < col("y.id"))
              .select(col("x.id"), col("y.id"))
              .write.format("noop").mode("overwrite").save()
          }
          timed(s"#$i pair join + intersect") {
            t.as("x").join(broadcast(t.as("y")), col("x.id") < col("y.id"))
              .select(col("x.id").as("a"), col("y.id").as("b"),
                size(array_intersect(col("x.toks"), col("y.toks")))
                  .as("common"))
              .write.format("noop").mode("overwrite").save()
          }
        }
        dumpStages()
      case "stagefloor" =>
        // pure per-round scheduling/shuffle floor: `chain` chained
        // 16-task shuffle rounds over near-empty data, one job
        val sc = spark.sparkContext
        val vp = new graft.graph.LinkGraph.PartIdPartitioner(16)
        var r: org.apache.spark.rdd.RDD[(Int, Long)] =
          sc.parallelize((0 until 16).map(i => (i, i.toLong)), 16)
        timed(s"stagefloor rounds=$chain") {
          (0 until chain).foreach { _ =>
            r = r.partitionBy(vp).mapPartitions(
              _.map(kv => (kv._1, kv._2 + 1)), preservesPartitioning = true)
          }
          r.count()
        }
      case other =>
        System.err.println(s"[benchextra] unknown mode $other")
    }
    spark.stop()
  }
}
