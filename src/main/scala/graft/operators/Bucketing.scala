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

  /** True when the physical plan contains a shuffle exchange. Two probes,
    * both AQE-aware (the regression guard must not silently void itself):
    * a typed walk that UNWRAPS every AdaptiveSparkPlanExec (its current
    * subtree is not a `children` member, so a plain collect sees nothing
    * under AQE), and a rendered-string match for ANY `Exchange <dist>`
    * spelling — hash, range, SinglePartition, RoundRobinPartitioning —
    * while excluding `BroadcastExchange` (word-boundary regex, not a
    * substring, precisely because "BroadcastExchange" contains
    * "Exchange"). */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Boolean = {
      var found = false
      p.foreach {
        case _: ShuffleExchangeLike => found = true
        case a: AdaptiveSparkPlanExec => if (walk(a.executedPlan)) found = true
        case _ => ()
      }
      found
    }
    val s = df.queryExecution.executedPlan.toString
    walk(df.queryExecution.executedPlan) ||
      "(?<![A-Za-z])Exchange ".r.findFirstIn(s).isDefined
  }

  def assertNoShuffle(df: DataFrame): Unit =
    require(!hasShuffle(df),
      "plan contains a ShuffleExchange — bucketing did not align:\n" +
        df.queryExecution.executedPlan.toString)
}
