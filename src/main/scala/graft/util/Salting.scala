package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hub-skew salting (SURVEY.md N8): explicit two-phase aggregation for
  * power-law-hot keys.
  *
  * A web-graph hub vertex concentrates a huge share of rows on one
  * reducer key (walk endpoints, residual deltas, degree counts). The
  * standard mitigation is salting: phase 1 aggregates by
  * (key, salt = hash(row-discriminator) % S), spreading one hot key over
  * S reducers; phase 2 aggregates the S partials by key. Phase-1 input
  * per reducer shrinks by ×S for the hot key while adding only S rows
  * per key to phase 2.
  *
  * Spark's HashAggregate already performs map-side partial aggregation,
  * which covers sum/count skew when map tasks are well-mixed — but NOT
  * when upstream data is already clustered by the hot key (e.g. walk
  * endpoints grouped by their arrival partition, hub rows filling whole
  * input splits). Salting is the explicit, planner-independent fix and
  * is exercised by ScalingBench's hub-heavy variant.
  */
object Salting {

  /** Two-phase salted sum: groupBy(keys :+ salt).sum → groupBy(keys).sum.
    *
    * @param df       input rows
    * @param keys     grouping key column names
    * @param valueCol numeric column to sum
    * @param saltFrom discriminator column spreading the hot key (must not
    *                 be constant per key — e.g. a slot/origin id)
    * @param salts    number of salt buckets (≈ shuffle parallelism)
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFrom: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val kcols = keys.map(col)
    val phase1 = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
      .groupBy((kcols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    phase1.groupBy(kcols: _*)
      .agg(sum(col("_partial")).as(valueCol))
  }
}
