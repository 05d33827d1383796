package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for representative registered queries —
  * the per-round evidence that scans prune columns/push filters, small
  * sides broadcast, and iterative ops keep their plans truncated.
  * Output: BENCH/PLANS.md (or argv(1)). */
object PlanAudit {
  val audited: Seq[String] = Seq(
    "g_edges",        // scan: ReadSchema pruned to 2 columns + pushed filter
    "g_deg_hist",     // two-phase hash agg, no sort
    "g_tri_count",    // dense bitset path here (gated); wedge join at scale
    "g_tri_wedge",    // the oriented wedge join itself (sparse graph)
    "d_near_dup",     // banded LSH candidates -> per-pair verification
    "d_simhash_pairs",// one-pass signature UDF -> multi-index posting join
    "d_lang_agg",     // partial+final agg over a pruned scan
    "e_ann_topk",     // broadcast query set, single corpus scan
    "e_ann_ivf",      // broadcast centroids/probes, inverted-file join
    "mm_meta")        // derived media scan + hash agg

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "BENCH/PLANS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark: SparkSession = GraftSession.local(cpus)
    val sb = new StringBuilder
    sb ++= s"# Physical plans (explain formatted), sf=$sfDir\n\n"
    sb ++= "Regenerated per round by `runMain graft.PlanAudit`. Things to\n"
    sb ++= "check: `ReadSchema` lists only needed columns; `PushedFilters`\n"
    sb ++= "carries the predicates; small sides appear as\n"
    sb ++= "`BroadcastExchange`; `WholeStageCodegen` spans cover the hot\n"
    sb ++= "expressions; iterative ops never appear here (their per-step\n"
    sb ++= "plans are truncated by localCheckpoint by design).\n"
    audited.foreach { name =>
      // g_tri_wedge's registered body checkpoints the wedge join before
      // returning (leak hygiene), which would truncate the plan — explain
      // the un-checkpointed join itself instead
      val df =
        if (name == "g_tri_wedge")
          graft.ops.Triangles
            .wedgeJoinPlan(SparkEntry.sparseGraph(spark, sfDir))._1
        else SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n```\n"
      sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb ++= "```\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
