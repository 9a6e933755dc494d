package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed co-located joins: pre-shuffle at write time so repeated joins on
  * the same key never exchange again (SURVEY.md scale notes — the 100 TB
  * answer to "this fact-fact join shuffles every run").
  *
  * Both sides bucketed by the join key into the same bucket count join with
  * zero Exchange nodes; `assertNoShuffle` makes that property testable so a
  * regression (e.g. mismatched bucket counts silently reintroducing a
  * shuffle) fails loudly instead of costing a cluster-wide shuffle.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the physical plan contains a shuffle exchange. String-based:
    * under AQE the plan root is an AdaptiveSparkPlanExec whose subtree is
    * not visible to `collect` until execution, but the rendered plan shows
    * shuffles as `Exchange hashpartitioning`/`rangepartitioning` (broadcast
    * exchanges render as `BroadcastExchange` and don't match). */
  def hasShuffle(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains("Exchange hashpartitioning") ||
      s.contains("Exchange rangepartitioning") ||
      df.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }.nonEmpty
  }

  def assertNoShuffle(df: DataFrame): Unit =
    require(!hasShuffle(df),
      "plan contains a ShuffleExchange — bucketing did not align:\n" +
        df.queryExecution.executedPlan.toString)
}
