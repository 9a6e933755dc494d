package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator layer — the reference's query semantics (SURVEY.md §2.2-2.7)
  * re-expressed as declarative DataFrame programs over the TESTDATA corpus.
  *
  * Every function is DataFrame→DataFrame with no driver-side materialization, so
  * Catalyst owns pushdown / pruning / join strategy and the same code runs
  * unchanged on a 1000-executor cluster. Dimension joins are explicitly
  * broadcast; fact-fact joins shuffle on their keys (sort-merge under AQE).
  *
  * Reference citations: web_scheduler.py (P1-P8 filters ~4599-4644, J1-J9 joins
  * ~1050-5385, A1-A6 aggregates ~1350-4685, T1-T5 sorts/limits ~5239-5423).
  */
object Relational {

  /** A1/A2/P1 — full-scan grouped aggregation (TPC-H Q1 shape).
    * Partial aggregation (map-side combine) keeps the shuffle at
    * |groups| × |partitions| rows regardless of input size.
    *
    * Price sums use the scaled-integer idiom (see [[tradeFlows]]): the
    * r9 sf10 run (60M lineitem) caught the double-sum→round(2dp) form
    * flipping a cent against DuckDB — at sum ≈ 3e11 a double's ULP is
    * ~6e-5 and 60M accumulation orders drift past the 2dp boundary.
    * Exact cent/10⁻⁴ longs are order-independent; the one final division
    * is bit-identical on both engines. Quantities are integral (their
    * double sum is exact) and the 4dp-rounded avgs sit ~10 orders of
    * magnitude inside double resolution, so both stay as-is. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                     * 10000).cast("long")) / 10000.0).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** P1-P5 — projection with aliases + conjunctive filters; both the predicate
    * and the 5-column read schema reach the parquet scan. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_discount") > 0.05)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        // no round(): the raw product is bit-identical IEEE math in any
        // engine, while round-to-decimal semantics differ across engines
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))

  /** J1-shape — snowflake dimension join; both dims are broadcast so the fact
    * side never shuffles. */
  def customersPerRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"))
      .agg(count(lit(1)).as("n_customers"),
           round(avg("c_acctbal"), 4).as("avg_bal"))

  /** J1/A1 — fact ⋈ dim aggregate: revenue per market segment. Customer is
    * the smaller side but GROWS with SF, so the join strategy stays with
    * AQE (broadcast at small SF, sort-merge once it outgrows the budget —
    * q143's adjudicated pattern); forcing broadcast would OOM at 100 TB. */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg((sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("total_price"),
           count(lit(1)).as("n_orders"))

  /** J5/J8 — LEFT join preserving customers with zero orders
    * (reference: notification_logs ⟕ email_configs, web_scheduler.py:5376-5385). */
  def ordersPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))

  /** J6-as-anti-join — customers with no URGENT order (reference's
    * `tl.task_id IS NULL` never-executed filter, web_scheduler.py:4639-4640).
    * The anti-join's build side is FILTERED (priority = 1-URGENT) so the
    * result has real mass at every gate SF — the unfiltered form was a
    * degenerate 0-rows-both-sides pass wherever every customer has an
    * order (r15 verdict: a broken anti-join could still pass 3 gates). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Semi join — EXISTS: customers with at least one order and positive balance. */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** A4/A5 — greatest-n-per-group: latest event per user (the reference's
    * latest-log-per-task correlated subquery, web_scheduler.py:1258-1271,
    * 4679-4685). One shuffle on the partition key; no correlated re-scan. */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
              col("event_type").as("last_event_type"), col("ts").as("last_ts"))
  }

  /** T3 — top-k by value with a unique tie-break (reference's
    * `ORDER BY execution_time DESC LIMIT 1`, web_scheduler.py:1335-1341).
    * Spark plans this as TakeOrderedAndProject — no global sort. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** T4 — pagination with LIMIT/OFFSET over a total order
    * (web_scheduler.py:5261-5267; per_page clamp semantics live in Serve). */
  def eventsPage(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .offset(40)
      .limit(20)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** P3/P6 — IN-list + LIKE substring filters
    * (web_scheduler.py:1256-1271, 4603-4605). */
  def inListLike(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase") && col("props").like("%7%"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))

  /** A1 — counts + exact distinct per group. */
  def eventTypeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))

  /** J3/J4-shape — multi-way join: fact ⋈ fact ⋈ dim ⋈ dim, aggregated.
    * lineitem⋈orders shuffles on orderkey; nation (25 rows at ANY SF)
    * broadcasts explicitly, customer grows with SF so its strategy stays
    * with AQE — see revenueBySegment. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    // r17 opt (guide §2.3 — aggregate before you shuffle): the orderkey
    // join only needs each order's revenue-cents sum and line count, so
    // lineitem partial-aggregates per order BEFORE its exchange — the
    // orderkey shuffle carries one narrow row per order (~1/4 the rows,
    // 3 columns) instead of raw fact rows, and the join's left side
    // reuses the aggregate's partitioning (no extra exchange). Exact
    // long cents are associative, so regrouping by order first yields
    // bit-identical nation sums; n_items = Σ per-order counts.
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      // scaled-integer revenue (r9 sf10 fix — see pricingSummary): exact
      // 10^-4 longs, one bit-identical final division
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                       * 10000).cast("long")).as("rev_units"),
           count(lit(1)).as("n_lines"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg((sum(col("rev_units")) / 10000.0).as("revenue"),
           sum(col("n_lines")).as("n_items"))

  /** q13's revenue-by-nation computed through [[SkewJoin.saltedJoin]] on
    * the lineitem–orders fact join: the manual skew fallback for when one
    * key holds a disproportionate share of a 100 TB fact table and AQE's
    * skew splitting isn't enough. The salt spreads each order key across
    * 8 reducers (orders replicated ×8 — per-key small by construction).
    * Sharing q13's oracle makes the REWRITE itself the thing under test:
    * salting must be result-invariant, not just faster on skew. */
  def revenueByNationSalted(spark: SparkSession, dir: String): DataFrame =
    SkewJoin.saltedJoin(
        Tables.lineitem(spark, dir),
        Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", nSalts = 8,
      // (orderkey, linenumber) is the row identity → salt is uniform AND
      // deterministic (never rand() — re-runs must salt identically)
      saltBy = struct(col("l_orderkey"), col("l_linenumber")))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      // scaled-integer revenue (r9 sf10 fix — see pricingSummary): exact
      // 10^-4 longs, one bit-identical final division
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                        * 10000).cast("long")) / 10000.0).as("revenue"),
           count(lit(1)).as("n_items"))

  /** q13's revenue-by-nation through [[SkewJoin.saltedJoinHeavyKeys]] —
    * the ADAPTIVE skew rewrite (q147): measure the fact side's key
    * histogram, salt only keys above threshold, plain-join the rest.
    * Sharing q13's oracle makes result-invariance of the adaptive split
    * the contract (both the salted and the plain path feed the same
    * aggregate). On this uniform corpus no order key exceeds the
    * threshold, so the plan degenerates to plain join + histogram —
    * exactly the property that makes it deployable as a default guard,
    * where the blanket q113 rewrite (8× unconditional replication,
    * 6.2× wall at sf1) is a measured-skew fallback. OperatorsSpec pins
    * the skewed case: a hot key splits across salts while light keys
    * join unsalted, result equal to the plain join. */
  def revenueByNationAdaptiveSkew(spark: SparkSession, dir: String): DataFrame =
    SkewJoin.saltedJoinHeavyKeys(
        Tables.lineitem(spark, dir),
        Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", nSalts = 8,
        saltBy = struct(col("l_orderkey"), col("l_linenumber")),
        // lineitems per order top out near 7 at any SF (TPC-H shape);
        // a key past 100 is genuine skew, not tail variance
        heavyThreshold = 100L)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      // scaled-integer revenue (r9 sf10 fix — see pricingSummary): exact
      // 10^-4 longs, one bit-identical final division
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                        * 10000).cast("long")) / 10000.0).as("revenue"),
           count(lit(1)).as("n_items"))

  /** TPC-H Q5 shape — local-supplier volume: the canonical 6-table star
    * join (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region)
    * with a region + order-year filter and the "customer and supplier in
    * the SAME nation" condition. The scale contract (r7 verdict fix: the
    * region restriction must land BEFORE the fact joins, or ~4/5 of
    * non-ASIA rows shuffle through three fact joins just to be dropped):
    * the ASIA nation-key set is dictionary-sized, so customer and
    * supplier are broadcast-SEMI-joined against it first — every row
    * entering a fact shuffle is already ASIA-only. The fact joins
    * (orders–customer on custkey, lineitem–orders on orderkey) then
    * shuffle on their keys and are left to AQE (customer/supplier grow
    * with the corpus — force-broadcasting them would OOM at 100 TB);
    * only nation/region-derived dims broadcast explicitly. The date
    * filter sits directly on the orders scan for pushdown.
    * PlanAuditSpec pins the semi-joins-below-fact-joins shape. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val asiaCustomer = Tables.customer(spark, dir)
      .join(broadcast(asiaNations.select(col("n_nationkey").as("c_nationkey"))),
            Seq("c_nationkey"), "left_semi")
    val asiaSupplier = Tables.supplier(spark, dir)
      .join(broadcast(asiaNations.select(col("n_nationkey").as("s_nationkey"))),
            Seq("s_nationkey"), "left_semi")
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(asiaCustomer, col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(asiaSupplier,
            col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                        * 10000).cast("long")) / 10000.0).as("revenue"))
  }

  /** Daily event-count anomaly detection: per (event_type, day) counts
    * z-scored against that type's own series mean/stddev — the drift
    * monitor an ingest pipeline runs over its event volumes. Two tiny
    * aggregates (the daily count, then per-type moments over ~series-length
    * rows) and a broadcast join back; the corpus is scanned once. z is
    * rounded to 4dp because mean/stddev are double AGGREGATES (sum order
    * differs across engines); the anomaly flag compares the ROUNDED z so
    * both engines flag identically. */
  def dailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(avg(col("n").cast("double")).as("mu"),
           stddev_samp(col("n").cast("double")).as("sigma"))
    daily.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("d").cast("timestamp_ntz").as("day"),
        col("n"),
        round(when(col("sigma") > 0,
            (col("n").cast("double") - col("mu")) / col("sigma"))
          .otherwise(0.0), 4).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > lit(2.5))
  }

  /** A6 — deterministic dedup: canonical (min id) row per key, instead of
    * dropDuplicates' arbitrary pick (reference `GROUP BY t.id`,
    * web_scheduler.py:4648). */
  def dedupFirstEvent(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min("event_id").as("first_event_id"),
           min("ts").as("first_ts"))

  /** Window top-n per group — top-3 orders per priority class. */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
  }

  /** F1-F13 — scalar function surface: date parts/formatting, CASE buckets,
    * string concat/substr (web_scheduler.py F-table, SURVEY.md §2.8). */
  def scalarShowcase(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"),
        when(col("o_totalprice") >= 200000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low").as("price_bucket"),
        concat_ws("-", col("o_orderstatus"), substring(col("o_orderpriority"), 1, 1))
          .as("status_label"),
        upper(col("o_orderstatus")).as("status_uc"),
        length(col("o_orderpriority")).as("prio_len"))

  /** A2-shape — conditional aggregation (the alert-condition evaluator's
    * thresholding, web_scheduler.py:3354-3364, as a grouped pivot). */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") > 50, 1).otherwise(0)).as("n_high"),
        sum(when(col("value") <= 50, 1).otherwise(0)).as("n_low"),
        round(avg(when(col("value") > 50, 1.0).otherwise(0.0)), 4).as("share_high"))

  /** The production monitoring projection (scheduler.db sql_scripts row 33):
    * column aliases are observable output and include non-ASCII names —
    * alias fidelity through plan, parquet write and oracle compare. */
  def aliasedProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("订单号"),
      col("o_custkey").as("店铺"),
      col("o_orderpriority").as("sku"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("日期"),
      // ntz at the output edge: DuckDB timestamps are naive (session TZ UTC
      // makes the cast an identity)
      col("o_orderdate").cast("timestamp_ntz").as("创建日期"),
      col("o_totalprice").as("总价格"))

  /** JSON path extraction over the `props` payload column (events carry a
    * JSON props string; extraction stays codegen'd — no UDF). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .filter(col("k_val") > 50)

  /** Gap-based sessionization: a new session starts after a >30 min gap per
    * user (lag window + conditional sum) — one shuffle on user_id covers
    * both the window and the final aggregate. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("is_new",
        // unix_micros, NOT unix_timestamp: the latter floors to whole
        // seconds, so a true gap in (1800 s, 1801 s) would compare ≤ 1800
        // here while the oracle's fractional epoch() sees > 1800 — the
        // 30-minute rule must bind on true timestamps (same convention as
        // dormantUsers/purchaseGaps below)
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > 1800L * 1000000L,
          1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Window-function suite beyond row_number: lag/lead, rank/dense_rank,
    * ntile, running sum — one shuffle on the partition key serves all six
    * (same window spec → single Window exec). */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      lag("o_totalprice", 1).over(w).as("prev_price"),
      lead("o_totalprice", 1).over(w).as("next_price"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      round(sum("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .as("running_total"))
  }

  /** Correlated scalar subquery — customers above their nation's average
    * balance. Catalyst decorrelates this into a join against a grouped
    * aggregate (the rewrite the reference's correlated MAX subqueries rely
    * on their backend DB for, SURVEY.md §4.1). Expressed through spark.sql
    * to exercise the parser path. */
  def aboveNationAverage(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("corr_customer")
    spark.sql(
      """SELECT c_custkey, c_name, c_acctbal AS acctbal
        |FROM corr_customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM corr_customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  /** Session windows (gap-merged): per-user sessions closed after 30 min of
    * inactivity, via Spark's native session_window aggregation — the same
    * construct runs unchanged under Structured Streaming with a watermark. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("sum_value"))

  /** ROLLUP hierarchy aggregation: per (event_type, day), per event_type,
    * and grand total in one pass (partial-agg friendly). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))

  /** Set operations: (big-order customers ∪ BUILDING-segment customers)
    * minus negative-balance customers — UNION/EXCEPT with set semantics. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("custkey"))
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val negative = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey"))
    bigOrders.union(building).distinct().except(negative)
  }

  /** Approximate distinct (HyperLogLog++) per group — the sketch path for
    * 100 TB cardinalities (exact countDistinct forces a second shuffle;
    * approx is single-pass mergeable). The sketch estimate itself is
    * engine-specific, so the oracle checks the exact column plus the
    * sketch's ERROR CONTRACT as a boolean: HLL++ at rsd=0.02 is
    * deterministic for fixed input, and its observed error here is ≪ the
    * 5% bound, so the row is a stable driver-checkable fact. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * 0.05).as("approx_within_5pct"))

  /** J6 — join back to a greatest-n-per-group: users whose LATEST event is an
    * error, with their lifetime event count (the reference's task-list
    * status filter, web_scheduler.py:4621-4648). */
  def usersLastError(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .select(col("user_id"), col("ts").as("last_ts"))
    val counts = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    latest.join(counts, "user_id")
      .select(col("user_id"), col("n_events"), col("last_ts"))
  }

  /** Ordered funnel conversion (view → click → purchase): per user, the
    * first view, the first click strictly AFTER that view, and the first
    * purchase strictly after that click — each within 7 days of the
    * previous stage (the conversion window). The product-analytics
    * staple: each stage is a filtered min-aggregate joined to the
    * previous stage's users. Every shuffle in the chain keys on user_id,
    * so the stage joins reuse one hash partitioning end-to-end — at
    * 100 TB this is three co-partitioned passes over the events table,
    * never a self-join on time. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ts") > col("t_view") &&
              col("ts") <= col("t_view") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ts") > col("t_click") &&
              col("ts") <= col("t_click") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
              col("t_click").isNotNull.as("reached_click"),
              col("t_purchase").isNotNull.as("converted"))
  }

  /** Shipping-delay distribution per order priority (q125): days from
    * order date to each line item's ship date — the fulfillment-SLA
    * report. The lineitem–orders join shuffles on the order key (left to
    * AQE); day differences are exact integers (both engines difference
    * DATE casts), aggregated per priority with the q39 percentile
    * convention. */
  def shippingDelays(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
              .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("bigint").as("delay_days"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           round(expr("percentile(delay_days, 0.5)"), 4).as("p50_days"),
           round(expr("percentile(delay_days, 0.9)"), 4).as("p90_days"),
           min("delay_days").as("min_days"), max("delay_days").as("max_days"))

  /** Monthly revenue with calendar-exact year-over-year delta: one
    * month-truncated aggregate, then a self-join on month == prior month
    * + 12 calendar months (never "12 rows back", which silently
    * misaligns across gaps). The join operates on the dictionary-sized
    * month series; yoy_pct derives from the ROUNDED revenues so both
    * engines divide identical operands. */
  def monthlyRevenueYoY(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
        .as("month"))
      .agg((sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("revenue"))
    val prev = m.select(
      (col("month") + expr("INTERVAL 12 MONTHS")).as("month"),
      col("revenue").as("prev_year_revenue"))
    m.join(prev, Seq("month"), "left")
      .select(col("month"), col("revenue"), col("prev_year_revenue"),
        round((col("revenue") - col("prev_year_revenue")) /
              col("prev_year_revenue") * 100, 4).as("yoy_pct"))
  }

  /** Join-key skew report: the top-10 heaviest user_id keys in the
    * events table with their share of all rows — the diagnostic that
    * decides between AQE skew splitting and the q113 salted rewrite.
    * One map-side-combined count per key, a broadcast 1-row total, and
    * a TakeOrdered head (ties to the lower key — deterministic LIMIT). */
  def joinKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val tot = c.agg(sum("n").as("tot"))
    c.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("share"))
      .orderBy(col("n").desc, col("user_id").asc)
      .limit(10)
  }

  /** Audience-overlap matrix (q139): Jaccard between the user audiences
    * of every event-type pair — "do purchasers also click" in one
    * number per pair. The distinct (user, type) frame self-joins on
    * user_id (co-partitioned; each user contributes ≤ C(|types|,2)
    * rows), sizes broadcast back, one division per cell. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val inter = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("na"))),
            Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("nb"))),
            Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        (col("n_both").cast("double") /
         (col("na") + col("nb") - col("n_both")).cast("double")).as("jaccard"))
  }

  /** Per-nation customer balance panel (q140): count, mean (rounded as
    * an order-dependent double aggregate), exact-interpolated median,
    * and raw min/max of account balances, nation dim broadcast. */
  def nationBalances(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_customers"),
           round(avg("c_acctbal"), 4).as("mean_balance"),
           round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_balance"),
           min("c_acctbal").as("min_balance"),
           max("c_acctbal").as("max_balance"))

  /** Dormancy report (q138): the 10 users with the longest silent gap
    * between consecutive events — re-engagement targeting. One lag
    * window per user partition, a per-user max, and a TakeOrdered head
    * (ties to the lower user id). */
  def dormantUsers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
        unix_micros(lag("ts", 1).over(w).cast("timestamp")))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(max("gap_us").as("max_gap_us"), count(lit(1)).as("n_gaps"))
      .orderBy(col("max_gap_us").desc, col("user_id").asc)
      .limit(10)
  }

  /** Conversion rate by acquisition week (q135): the q100 funnel's
    * converted flag aggregated per week of first view — "are newer
    * cohorts converting better" in one small aggregate over the funnel
    * output (all heavy lifting is the funnel's co-partitioned stage
    * joins). Rate is ONE division of exact longs. */
  def cohortConversion(spark: SparkSession, dir: String): DataFrame =
    funnelConversion(spark, dir)
      .select(date_trunc("week", col("t_view")).cast("timestamp_ntz")
                .as("cohort_week"),
              col("converted"))
      .groupBy("cohort_week")
      .agg(count(lit(1)).as("n_funnel_users"),
           sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("cohort_week"), col("n_funnel_users"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_funnel_users").cast("double"))
          .as("conversion_rate"))

  /** Revenue concentration (q136): how much of total revenue the top
    * decile of customers carries — the Pareto KPI, computed scale-clean:
    * the p90 spend threshold is one interpolated aggregate broadcast
    * into a second conditional aggregate, never a global ranking window
    * over the customer dimension. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy("o_custkey").agg((sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("rev"))
    // the threshold is an interpolated AGGREGATE derivative → rounded (2dp,
    // matching rev's scale) before the >= comparison on BOTH engines, so a
    // customer exactly at the boundary can't flip on a last-bit
    // interpolation difference (same convention as dailyAnomaly's z)
    val thr = per.agg(round(expr("percentile(rev, 0.9)"), 2).as("p90"))
    per.crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("n_customers"),
           sum(when(col("rev") >= col("p90"), 1L).otherwise(0L)).as("n_top"),
           (sum(round(col("rev") * 100).cast("long")) / 100.0).as("total_revenue"),
           (sum(round(when(col("rev") >= col("p90"), col("rev"))
                        .otherwise(0.0) * 100).cast("long")) / 100.0)
             .as("top_revenue"))
      .withColumn("top_share",
        round(col("top_revenue") / col("total_revenue"), 6))
  }

  /** Inter-purchase gap distribution (q133): time between a user's
    * consecutive purchases — the repeat-purchase rhythm behind retention
    * forecasts. One lag window per user partition produces exact
    * microsecond gaps; the global aggregate reports count and
    * interpolated p50/p90 (q39's percentile convention). */
  def purchaseGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select((unix_micros(col("ts").cast("timestamp")) -
               unix_micros(col("prev_ts").cast("timestamp"))).as("gap_us"))
      .agg(count(lit(1)).as("n_gaps"),
           round(expr("percentile(gap_us, 0.5)"), 4).as("p50_us"),
           round(expr("percentile(gap_us, 0.9)"), 4).as("p90_us"),
           min("gap_us").as("min_us"), max("gap_us").as("max_us"))
  }

  /** Purchase-value histogram (q134): fixed-width (10-unit) value
    * buckets per event type — exact integer binning (floor of a double
    * quotient at these magnitudes is engine-stable), one map-side-
    * combined aggregate. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") / 10.0).cast("bigint").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))

  /** Day-of-week seasonality (q132): event counts per (type, weekday)
    * with each cell's share of its type — the weekly-rhythm heatmap.
    * Two dictionary-sized aggregates and a broadcast join back; the
    * share is ONE division of exact longs. Spark's dayofweek is
    * 1=Sunday..7; the oracle maps DuckDB's 0-based dow accordingly. */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("event_type").agg(sum("n").as("tot"))
    cells.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("share"))
  }

  /** Referential-integrity audit (q129): orphan counts across the star
    * schema's foreign keys — orders without a customer, lineitems
    * without an order, customers/suppliers without a nation. The
    * data-quality precondition every join in this engine assumes; each
    * check is one anti-join (keyed, dim sides broadcast by AQE) folded
    * into a fixed four-row report. */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def orphans(name: String, fact: DataFrame, key: String,
                dim: DataFrame, dimKey: String): DataFrame =
      fact.join(dim.select(col(dimKey).as(key)), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_orphans"))
    orphans("orders->customer",
        Tables.orders(spark, dir).select(col("o_custkey").as("k")), "k",
        Tables.customer(spark, dir), "c_custkey")
      .unionByName(orphans("lineitem->orders",
        Tables.lineitem(spark, dir).select(col("l_orderkey").as("k")), "k",
        Tables.orders(spark, dir), "o_orderkey"))
      .unionByName(orphans("customer->nation",
        Tables.customer(spark, dir).select(col("c_nationkey").as("k")), "k",
        Tables.nation(spark, dir), "n_nationkey"))
      .unionByName(orphans("supplier->nation",
        Tables.supplier(spark, dir).select(col("s_nationkey").as("k")), "k",
        Tables.nation(spark, dir), "n_nationkey"))
  }

  /** RFM segmentation (q127): per purchasing user — recency (days since
    * last purchase, against the corpus max), frequency, monetary — each
    * scored 1–4 against exact-interpolated quartile THRESHOLDS rather
    * than a global ntile: ntile needs a single-partition window over the
    * whole user dimension, thresholds are three tiny aggregates
    * broadcast into a narrow map, which is the shape that survives a
    * billion users. Both engines compute identical threshold doubles
    * from identical operands, so the bucket comparisons agree exactly. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir).filter(col("event_type") === "purchase")
    val maxTs = p.agg(max(col("ts").cast("date")).as("max_d"))
    val rfm = p.groupBy("user_id")
      .agg(max(col("ts").cast("date")).as("last_d"),
           count(lit(1)).as("frequency"),
           (sum(round(col("value") * 100).cast("long")) / 100.0).as("monetary"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        datediff(col("max_d"), col("last_d")).cast("bigint").as("recency_days"),
        col("frequency"), col("monetary"))
    // quartile thresholds are aggregate derivatives → rounded (4dp) before
    // the bucket comparisons on BOTH engines (dailyAnomaly's convention):
    // a user exactly at a quartile boundary must score identically even if
    // the two engines' interpolations differ in the last bit
    val t = rfm.agg(
      round(expr("percentile(recency_days, 0.25)"), 4).as("r25"),
      round(expr("percentile(recency_days, 0.5)"), 4).as("r50"),
      round(expr("percentile(recency_days, 0.75)"), 4).as("r75"),
      round(expr("percentile(frequency, 0.25)"), 4).as("f25"),
      round(expr("percentile(frequency, 0.5)"), 4).as("f50"),
      round(expr("percentile(frequency, 0.75)"), 4).as("f75"),
      round(expr("percentile(monetary, 0.25)"), 4).as("m25"),
      round(expr("percentile(monetary, 0.5)"), 4).as("m50"),
      round(expr("percentile(monetary, 0.75)"), 4).as("m75"))
    def asc(c: Column, p25: Column, p50: Column, p75: Column) = // lower = better
      when(c <= p25, 4).when(c <= p50, 3).when(c <= p75, 2).otherwise(1)
    def desc(c: Column, p25: Column, p50: Column, p75: Column) = // higher = better
      when(c > p75, 4).when(c > p50, 3).when(c > p25, 2).otherwise(1)
    rfm.crossJoin(broadcast(t))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        asc(col("recency_days"), col("r25"), col("r50"), col("r75")).as("r_score"),
        desc(col("frequency"), col("f25"), col("f50"), col("f75")).as("f_score"),
        desc(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** Cumulative reach curve: distinct users ever seen, per day — the
    * "total audience" line. A sliding DISTINCT can't accumulate, but
    * first-seen-date per user CAN: one per-user min, one per-day count
    * of first-seens, then a running sum over the DAY SERIES — which is
    * dictionary-sized by definition, so the single-partition window is a
    * few hundred rows at any corpus scale (the heavy lifting is the
    * per-user aggregate, fully parallel). */
  def cumulativeReach(spark: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(spark, dir)
      .groupBy("user_id").agg(min(col("ts").cast("date")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cumulative_users", sum("new_users").over(w))
      .select(col("d").cast("timestamp_ntz").as("day"),
              col("new_users"), col("cumulative_users"))
  }

  /** Weekly churn: users active in week w but NOT in w+1, per week (the
    * last week is excluded — its successor is unobservable). Activity is
    * one distinct (user, week) frame; churn is an anti-join of that
    * frame against itself shifted back one week — co-partitioned on
    * (user_id, week), no time inequality anywhere. The rate is ONE
    * division of exact longs. */
  def weeklyChurn(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("timestamp_ntz").as("week"))
      .distinct()
    val nextAsThis = wk.select(col("user_id"),
      (col("week") - expr("INTERVAL 7 DAYS")).as("week"))
    val active = wk.groupBy("week").agg(count(lit(1)).as("n_active"))
    val churned = wk.join(nextAsThis, Seq("user_id", "week"), "left_anti")
      .groupBy("week").agg(count(lit(1)).as("n_churned"))
    val maxWk = wk.agg(max("week").as("max_week"))
    active.join(churned, Seq("week"), "left")
      .crossJoin(broadcast(maxWk))
      .filter(col("week") < col("max_week"))
      .select(col("week"), col("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"),
        (coalesce(col("n_churned"), lit(0L)).cast("double") /
         col("n_active").cast("double")).as("churn_rate"))
  }

  /** Per-user event-type transition matrix (first-order Markov counts):
    * for every consecutive event pair in a user's timeline, count
    * (from_type → to_type) and its conditional probability — the
    * behavior-model input product analytics derives journeys from. One
    * `lead` window per user partition (partition-local after the
    * user_id hash), then a dictionary-sized (|types|²) aggregate and a
    * broadcast join for the per-from totals. The probability is ONE
    * division of two exact longs. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = trans.groupBy("from_type").agg(sum("n_transitions").as("tot"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("tot").cast("double"))
          .as("p_transition"))
  }

  /** View→purchase conversion-latency distribution over the q100 funnel's
    * converted users: count, exact-interpolated p50/p90 (micros — exact
    * long inputs, the q39 percentile convention), min and max. The heavy
    * lifting is the funnel itself; this is one extra global aggregate
    * over |converted users| rows. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame =
    funnelConversion(spark, dir)
      .filter(col("converted"))
      .select((unix_micros(col("t_purchase").cast("timestamp")) -
               unix_micros(col("t_view").cast("timestamp"))).as("us"))
      .agg(count(lit(1)).as("n_conversions"),
           round(expr("percentile(us, 0.5)"), 4).as("p50_us"),
           round(expr("percentile(us, 0.9)"), 4).as("p90_us"),
           min("us").as("min_us"), max("us").as("max_us"))

  /** Weekly cohort retention: users grouped by the ISO week of their
    * FIRST event; for each later week, how many of that cohort were
    * active (distinct users, exact). Week arithmetic is day-difference /
    * 7 on week-truncated DATEs — exact integers (both engines truncate
    * weeks to Monday), no interval rounding. Scale shape: one first-seen
    * aggregate, one events-side join co-partitioned on user_id, one
    * (cohort, offset) count-distinct — the user dimension never
    * broadcasts, the events table streams through once. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    // cohort_week stays TIMESTAMP in the output (parquet micros matches
    // the oracle's dtype); the week arithmetic runs on DATE casts
    val cohort = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"),
              // date_trunc yields LTZ; back to NTZ so parquet micros match
              // the oracle's naive timestamps (session tz is UTC)
              date_trunc("week", col("first_ts")).cast("timestamp_ntz")
                .as("cohort_week"))
    val activity = ev.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
                  col("cohort_week").cast("date")) / lit(7))
          .cast("int").as("week_offset"))
      .distinct()
    val sizes = cohort.groupBy("cohort_week")
      .agg(countDistinct("user_id").as("n_cohort"))
    activity.groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
              col("n_cohort"),
              (col("n_active").cast("double") / col("n_cohort").cast("double"))
                .as("retention"))
  }

  /** Dense weekly time series with a generated calendar spine: every
    * (event_type × week) cell over the corpus' full week range, zero-
    * filled where no events landed — the gap-filling step every
    * reporting layer needs (a sparse GROUP BY silently drops empty
    * periods). The spine is a tiny generated dimension (weeks × types)
    * cross-joined on the driver side of a broadcast; the fact table
    * aggregates once. At 100 TB the spine stays dictionary-sized no
    * matter how large the corpus grows. */
  def calendarSpine(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        date_trunc("week", col("ts")).cast("timestamp_ntz").as("week"))
    val counts = ev.groupBy("event_type", "week")
      .agg(count(lit(1)).as("n_events"))
    val weeks = ev.agg(min("week").as("w0"), max("week").as("w1"))
      .select(explode(sequence(col("w0"), col("w1"),
        expr("INTERVAL 7 DAYS"))).as("week"))
    val types = ev.select("event_type").distinct()
    weeks.crossJoin(types)
      .join(counts, Seq("event_type", "week"), "left")
      .select(col("event_type"), col("week"),
              coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Trailing 7-day active users per day (the WAU curve): each event
    * contributes its user to the 7 daily windows that cover it, then one
    * distinct count per day. The explode is a fixed ×7 fan-out (linear,
    * partition-local) — the scalable form of a sliding DISTINCT window,
    * which no engine can do as a running aggregate because distinct
    * doesn't subtract. Days beyond the last event are not reported
    * (every reported day has ≥1 event in its window by construction). */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("wau"))
      // timestamp output (parquet DATE reads back as python objects —
      // the oracle compare wants one dtype both sides)
      .select(col("day").cast("timestamp_ntz").as("day"), col("wau"))

  /** Daily stickiness — DAU over trailing-7-day WAU, the engagement ratio
    * product analytics reports next to the q103 curve. Both counts come
    * from the SAME deduplicated (user, day) frame: DAU is a per-day
    * distinct count, WAU reuses q103's linear ×7 fan-out, and the ratio
    * is ONE division of two exact longs (bit-identical cross-engine).
    * Inner join is exact: every day with a DAU row has a WAU row by
    * construction (its own events are inside its trailing window). */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    // du is already distinct (user, day) → DAU is a plain count; a
    // countDistinct here would pay the distinct-aggregate expansion twice
    val dau = du.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, dau("d") === wau("day"))
      .select(col("d").cast("timestamp_ntz").as("day"),
              col("dau"), col("wau"),
              (col("dau").cast("double") / col("wau").cast("double"))
                .as("stickiness"))
  }

  /** Corpus-wide proximity count with NO equi key: for each error event,
    * how many purchase events (ANY user) landed within ±5 minutes — the
    * "what was happening around each incident" incident-analysis query.
    * A naive inequality join has no join key, so every engine plans it
    * as a cartesian/nested-loop product — quadratic, dead at scale. The
    * scalable form is the standard RANGE-JOIN BINNING rewrite: time is
    * bucketed into bins of exactly the interval width, each purchase is
    * fanned out to its own bin and both neighbors (a fixed ×3 generate —
    * any pair within the interval then shares at least one bin), the
    * join runs hash-keyed on the bin id, and the exact |Δt| predicate
    * filters bin-mates outside the interval. Shuffle volume is 3× the
    * purchase stream — never |errors| × |purchases|. PlanAuditSpec pins
    * the no-cartesian shape. */
  def errorProximity(spark: SparkSession, dir: String): DataFrame = {
    val intervalUs = 300L * 1000000L // ±5 minutes, in epoch micros
    val ev = Tables.events(spark, dir)
      // ntz → instant is the identity under the UTC session; unix_micros
      // keeps the full precision of the source timestamps
      .select(col("event_id"), col("event_type"),
              unix_micros(col("ts").cast("timestamp")).as("us"))
    // FLOOR division, not `div` (which truncates toward zero): the ±1-bin
    // coverage proof needs bin(us) monotone in us across ALL longs, so a
    // pre-1970 timestamp (negative micros) straddling bin 0 still lands
    // adjacent to its neighbors. `us - pmod(us, m)` is exactly divisible
    // by m and pmod is non-negative, so the `div` here IS floor division.
    val binOf = expr(s"(us - pmod(us, $intervalUs)) div $intervalUs")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("us"), binOf.as("bin"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("us").as("p_us"),
        explode(array(binOf - 1, binOf, binOf + 1)).as("bin"))
    val near = errors.join(purchases, Seq("bin"))
      .filter(abs(col("us") - col("p_us")) <= intervalUs)
      .groupBy("event_id").agg(count(lit(1)).as("n_nearby"))
    errors.select(col("event_id"))
      .join(near, Seq("event_id"), "left")
      .select(col("event_id"),
              coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
  }

  /** Last-observation-carried-forward: every event row annotated with the
    * most recent PRECEDING purchase value of the same user (null until
    * the first purchase) — the gap-fill/imputation primitive time-series
    * feature pipelines run before model training. One window per user
    * partition, running `last(..., ignoreNulls)` over unbounded preceding
    * rows: partition-local after the user_id hash — no shuffle beyond
    * the partitioning, no self-join, at any scale. The carried VALUE is
    * a raw passthrough (no arithmetic), so the oracle compares it
    * exactly. */
  def locfBackfill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
              col("value"))
      .withColumn("last_purchase_value",
        last(when(col("event_type") === "purchase", col("value")),
             ignoreNulls = true).over(w))
  }

  /** TPC-H Q7 shape — cross-nation trade flows: yearly revenue between
    * every (supplier nation, customer nation) pair, cross-nation rows
    * only. The two nation lookups are the only broadcasts (dictionary at
    * any SF); customer/supplier scale with the corpus, so their fact
    * joins shuffle on the key and are left to AQE, exactly like q110.
    * The cross-nation predicate lands immediately after the supplier
    * join — before the aggregate, so no same-nation row reaches the
    * final exchange. Revenue: per-row price (2dp) × (1−discount) (2dp)
    * has at most 4 TRUE decimal digits, so round(x·10⁴) recovers the
    * exact integer on both engines (the double sits within 1e-9 of it —
    * never on a rounding boundary) and the long sum is exact and
    * order-independent; one final division by 10⁴ emits a bit-identical
    * double. Both double-sum-then-round-2dp (3 flipped cents at
    * sf0.001) and per-row DECIMAL(18,4) casts (39 flipped groups at
    * sf1 — Spark rounds the double's shortest decimal string, DuckDB
    * the binary value, which disagree exactly ON a boundary) fail
    * cross-engine; the scaled-integer form cannot. */
  def tradeFlows(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation")))
    val custNation = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(suppNation, Seq("s_nationkey"))
      .join(custNation, Seq("c_nationkey"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("o_orderdate")).cast("int").as("order_year"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                        * 10000).cast("long")).cast("double") / 10000.0)
             .as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Per-brand pricing moments: corr / covariance between quantity and
    * discount plus the price spread — the "does the discount policy bind"
    * statistical profile. lineitem ⋈ part co-keys on partkey; part SCALES
    * with the corpus (200k rows at sf1), so the join shuffles on the key
    * under AQE rather than forcing a broadcast that would OOM at 100 TB.
    * The moments are all one-pass partial-aggregable (sum / sum-of-
    * squares / cross-products), so the shuffle after the join carries 25
    * brand groups, nothing else. All outputs are rounded aggregate
    * derivatives (4dp) per the repo's cross-engine float rule. */
  def brandPricingMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_discount"),
              col("l_extendedprice"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           round(corr(col("l_quantity"), col("l_discount")), 4).as("qty_disc_corr"),
           round(covar_samp(col("l_quantity"), col("l_discount")), 4)
             .as("qty_disc_covar"),
           round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
           round(avg(col("l_extendedprice")), 4).as("price_mean"))

  /** TPC-H Q17 shape — small-order revenue by brand: revenue locked in
    * lineitems whose quantity is below 20% of that part's own average
    * quantity (the "would consolidating small orders pay" report). The
    * per-part threshold is itself a fact-scale aggregate (one row per
    * part), so it is NOT broadcast: the threshold join co-keys on
    * l_partkey and shuffles both sides — at 100 TB both inputs hash to
    * the same layout and the join is local per partition. The threshold
    * is ROUNDED before the comparison on both engines (aggregate
    * derivative; quantities are integral so the strict `<` cannot sit on
    * the rounding boundary). */
  def smallOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    // r17 opt (guide §2.4 — share the exchange): the per-part threshold
    // used to be a groupBy-then-self-join, which scanned AND shuffled the
    // fact table twice (the aggregate subtree and the probe side are
    // distinct plans, so no ReusedExchange applies). The same-keyed
    // window computes the identical per-part average over ONE exchange
    // and one scan — partitions are per-part (~30 rows), so no window
    // skew at any scale. Threshold value and comparison are unchanged
    // (same rounding, same rows survive).
    val wPart = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    li.withColumn("qty_cut", round(avg(col("l_quantity")).over(wPart) * 0.2, 4))
      .filter(col("l_quantity") < col("qty_cut"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_orders"),
           // scaled-integer idiom (see tradeFlows): prices have ≤2 true
           // decimals, so sum exact CENTS as longs (order-independent,
           // boundary-proof) and divide ONCE at the end — both engines
           // then round the SAME double, instead of each rounding its own
           // accumulation-order-dependent double sum
           round(sum(round(col("l_extendedprice") * 100).cast("long"))
                   / 700.0, 2).as("avg_yearly_lost"))
  }

  /** TPC-H Q8 shape — market share: of all revenue on a part-type segment
    * (PROMO-typed parts), the share supplied from each region, per
    * order year. Revenue uses the scaled-integer idiom (exact long sums;
    * see [[tradeFlows]]); the share is ONE division of two exact longs —
    * bit-identical across engines, no rounding needed. part scales with
    * the corpus → its join shuffles under AQE; nation/region broadcast.
    * The p_type filter lands on the part scan (pushdown) BEFORE the
    * lineitem join, so non-segment rows never cross a shuffle. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val segParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val suppRegion = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                           * 10000).cast("long")
    // materialized ONCE: seg feeds both the totals and the final join —
    // without the checkpoint Spark would recompute the whole 4-table fact
    // pipeline twice (DataFrame reuse is not caching)
    val seg = graft.core.Mat.tracked(Tables.lineitem(spark, dir)
      .join(segParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(suppRegion, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("order_year"),
               col("supp_region"))
      .agg(sum(revCents).as("rev")))
    val totals = seg.groupBy("order_year").agg(sum("rev").as("total"))
    seg.join(broadcast(totals), Seq("order_year"))
      .select(col("order_year"), col("supp_region"),
        (col("rev").cast("double") / 10000.0).as("revenue"),
        (col("rev").cast("double") / col("total").cast("double"))
          .as("market_share"))
  }

  /** TPC-H Q15 shape — top supplier(s): the supplier(s) whose 1996-H1
    * revenue equals the maximum (ties kept, like the reference Q15 view +
    * subquery form). Per-supplier revenue is a map-side-combined
    * aggregate; the max is the repo's scalar pattern — crossJoin of a
    * broadcast 1-row aggregate, never a single-partition global window
    * over what is a corpus-scaling supplier set. Exact long cents make
    * the equality comparison safe. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
                           * 10000).cast("long")
    // materialized ONCE — referenced by both the scalar max and the
    // filter (same double-compute trap as marketShare's seg)
    val perSupp = graft.core.Mat.tracked(Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .groupBy(col("l_suppkey")).agg(sum(revCents).as("rev")))
    val top = perSupp
      .crossJoin(broadcast(perSupp.agg(max(col("rev")).as("mx"))))
      .filter(col("rev") === col("mx"))
    top.join(Tables.supplier(spark, dir),
             col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
              (col("rev").cast("double") / 10000.0).as("total_revenue"))
  }

  /** TPC-H Q4 shape — order-priority checking: orders placed in a
    * quarter with AT LEAST ONE late-shipped lineitem (shipdate > 60 days
    * after the order date), counted by priority. The EXISTS is a
    * LEFT-SEMI join keyed on orderkey (never an aggregate-then-join or a
    * fan-out join-then-distinct); the date filter sits on the orders
    * scan. */
  def orderPriorityLate(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val late = Tables.lineitem(spark, dir)
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
                          col("o_orderdate").as("od")), Seq("l_orderkey"))
      .filter(col("l_shipdate") > col("od") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey").as("o_orderkey"))
    orders.join(late, Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q18 shape — large-volume orders: orders whose line quantities
    * sum past 200, with their customer. The HAVING filter collapses the
    * fact table to a per-order aggregate FIRST (map-side combinable, one
    * shuffle on orderkey), so only qualifying order keys — a tiny
    * fraction — join back to orders and customer; both of those scale
    * with the corpus and stay AQE shuffle joins. */
  def largeVolumeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200)
    Tables.orders(spark, dir)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }
}
