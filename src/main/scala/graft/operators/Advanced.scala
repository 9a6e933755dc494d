package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Advanced operators beyond the reference's own surface: as-of join,
  * exact percentiles, pivot. Each composes Spark built-ins (SURVEY.md §7.4
  * preference order (a)) — no custom strategy needed, and each stays a
  * shuffle-on-key program that scales horizontally.
  */
object Advanced {

  /** As-of join via union + running window (the merge-sorted-streams plan a
    * native engine would use, expressed declaratively): for every purchase
    * event, the most recent click by the same user at or before it.
    *
    * One shuffle on user_id covers the whole operator; no range cross-join.
    * Clicks are pre-deduped to one per (user, ts) (max event_id) so the
    * at-the-same-instant tie is deterministic. */
  def asofPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("event_id"))
      .select(col("user_id"), col("ts"), lit("click").as("kind"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit("purchase").as("kind"), col("event_id"))
    // order: ts asc, then 'click' before 'purchase' at the same instant
    // (>= semantics), then event_id for total determinism
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_ts",
        last(when(col("kind") === "click", col("ts")), ignoreNulls = true).over(w))
      .withColumn("asof_click_id",
        last(when(col("kind") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("kind") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ts").as("purchase_ts"),
              col("asof_click_ts"), col("asof_click_id"))
  }

  /** Exact percentiles per group (linear interpolation — Spark `percentile`;
    * at 100 TB swap for approx_percentile, single-pass and mergeable). */
  def pricePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
           round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
           round(min("o_totalprice"), 2).as("p_min"),
           round(max("o_totalprice"), 2).as("p_max"))

  /** Pivot: event counts per user cohort with an explicit value list (an
    * implicit list would force an extra distinct pass over 100 TB). */
  def eventPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", pmod(col("user_id"), lit(5)))
      .groupBy("cohort")
      .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
}
