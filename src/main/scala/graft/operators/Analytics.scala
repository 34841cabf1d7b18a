package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytics tail the reference lacks (SURVEY §2.7): joins,
  * aggregations, windows, top-k, set ops, grouping sets — all stock
  * Catalyst, declared so pushdown/pruning/codegen apply.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins broadcast the bounded sides (region=5, nation=25 —
  *    bounded by definition); fact-fact joins shuffle on their keys and are
  *    left to AQE to re-plan (skew join, coalescing).
  *  - money aggregates round each row to integer cents and sum BIGINT so
  *    partial aggregation (map-side combine) is exact and order-insensitive —
  *    identical results on 32 or 100k partitions, and canonicalization-safe
  *    across engines (DECIMAL canonical forms differ between engines).
  *  - averages are exact integer sums divided by counts at the end, not
  *    avg() over doubles (which is partition-order dependent).
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: single scan, partial-agg friendly. */
  def pricingSummary(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_price_cents"),
        sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
          .cast("long")).as("sum_disc_price_cents"),
        sum(round((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))) * 100)
          .cast("long")).as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        col("sum_qty_cents").cast("double") / col("count_order") / lit(100.0))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-10 orders by discounted revenue (join + agg + deterministic top-k:
    * unique key breaks ties so LIMIT is stable across engines).
    */
  def topRevenueOrders(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val o  = Tables.orders(spark, d)
    li.groupBy(col("l_orderkey"))
      .agg(sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
        .cast("long")).as("revenue_cents"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"), col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Revenue per nation/region: multi-way join; region+nation broadcast
    * (bounded dims), customer/orders/lineitem shuffle on keys.
    */
  def revenueByNation(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val o  = Tables.orders(spark, d)
    val c  = Tables.customer(spark, d)
    val n  = broadcast(Tables.nation(spark, d))
    val r  = broadcast(Tables.region(spark, d))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
          .cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Single-scan forecast-revenue aggregate (TPC-H Q6 shape: filter fully
    * pushed to parquet, no shuffle beyond one partial/final agg).
    */
  def forecastRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(round((col("l_extendedprice") * col("l_discount")) * 100).cast("long"))
          .as("revenue_cents"),
        count(lit(1)).as("n_rows"))

  /** Window functions: per-order line ranking + running quantity. */
  def lineitemWindows(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    Tables.lineitem(spark, d)
      // deterministic sample; a modulo predicate is evaluated post-scan (it
      // cannot reach the parquet reader), which is fine: it exists to bound
      // the window sample, not to prune IO.
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        sum(round(col("l_quantity") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_qty_cents"),
        lag(col("l_linenumber"), 1).over(w).as("prev_line"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Top-3 customers by revenue within each market segment (rank window
    * over an aggregated join).
    */
  def topCustomersPerSegment(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val perCust = o.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend_cents"))
      .join(c, col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("spend_cents").desc, col("c_custkey"))
    perCust.select(col("c_mktsegment"), col("c_custkey"), col("c_name"), col("spend_cents"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  /** ROLLUP grouping sets over return flag / line status. */
  def rollupCounts(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Set operations: segment overlap via intersect/except on key sets. */
  def segmentSetOps(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val big    = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val auto   = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val both   = big.intersect(auto).withColumn("set_kind", lit("rich_auto"))
    val onlyB  = big.except(auto).withColumn("set_kind", lit("rich_other"))
    both.unionByName(onlyB).orderBy(col("set_kind"), col("c_custkey"))
  }

  /** Anti join: customers who never placed a large order (filter pushed
    * below the anti join so the build side stays small).
    */
  def customersWithoutBigOrders(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d).filter(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Exact median (interpolated) unit price per brand. */
  def medianPriceByBrand(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .groupBy(col("p_brand"))
      .agg(
        expr("percentile(p_retailprice, 0.5)").as("median_price"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))

  /** Hourly tumbling-window counts per event type (the batch-equivalent of
    * the streaming windowed agg; ms epoch keys for engine-portable output).
    */
  def hourlyEventCounts(spark: SparkSession, d: String): DataFrame =
    { val ev = Tables.events(spark, d)
      ev.select(Tables.eventTsMs(ev).as("ts_ms"), col("event_type"), col("value"))
        .select(expr("(ts_ms DIV 3600000) * 3600000").as("hour_ms"),
          col("event_type"), col("value")) }
      .groupBy(col("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .orderBy(col("hour_ms"), col("event_type"))

  /** Gap-based sessionization (30-min inactivity) per user: lag + cumulative
    * session ids via windows — the classic pattern that also runs at scale
    * (partition by user, sort within partition).
    */
  def sessionize(spark: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    val evt = Tables.events(spark, d)
    val ev = evt.select(col("user_id"), Tables.eventTsMs(evt).as("ts_ms"))
    ev.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 30 * 60 * 1000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("duration_ms")).as("max_session_ms"))
      .orderBy(col("user_id"))
  }

  /** As-of join (the brief's canonical "operator Spark lacks", composed
    * from existing ops — preference (a)): each event matched to the
    * LATEST order of its customer at or before the event time.
    *
    * Implementation is the union + last-value-over-window merge, not a
    * range join: tag both inputs, union them, and take
    * `last(order_attr, ignoreNulls) over (partition by key order by
    * time, side)` — order rows sort before event rows at equal
    * timestamps, giving ≤ semantics. One sort-shuffle by key total;
    * a naive range join would explode each event against every earlier
    * order before aggregating the max away (O(events × orders/key) vs
    * O(events + orders) here), which is the difference that matters at
    * 100 TB. The right side is pre-reduced to one row per (key, time)
    * (max orderkey — the deterministic tie rule the oracle mirrors).
    */
  def asofOrders(spark: SparkSession, d: String): DataFrame = {
    val evt = Tables.events(spark, d)
    val e = evt.select(
      col("event_id"), col("user_id"),
      (col("user_id") + 1).as("k"),
      Tables.eventTsMs(evt).as("t_ms")) // exact integer epoch ms
    val o = Tables.orders(spark, d)
      .groupBy((col("o_custkey")).as("k"),
        // NTZ → TZ is exact under the session's UTC timezone
        unix_millis(col("o_orderdate").cast("timestamp")).as("t_ms"))
      .agg(max(col("o_orderkey")).as("o_orderkey")) // deterministic tie rule
      .withColumn("order_ms", col("t_ms"))
    graft.operators.join.AsofJoin.asof(e, o,
        keys = Seq("k"), time = "t_ms", attrs = Seq("o_orderkey", "order_ms"))
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderkey").as("o_orderkey"),
        col("asof_order_ms").as("order_ms"))
      .orderBy(col("event_id"))
  }

  /** Range join (point-in-interval) via [[graft.operators.join.RangeJoin]]:
    * every error event opens a 15-minute incident window; each window is
    * scored with the count and value of ALL events (any user) falling
    * inside it — the canonical "what happened around each alert"
    * correlation. A plain inequality join would plan as a broadcast
    * nested loop (O(incidents × events)); the binned range join keys
    * both sides on a 15-minute grid cell, so the only shuffle is an
    * equi-join on the bin id and fan-out per interval is ≤ 2 bins.
    */
  def incidentWindows(spark: SparkSession, d: String): DataFrame = {
    val evt = Tables.events(spark, d)
    val ev = evt.select(
      col("event_id"), Tables.eventTsMs(evt).as("t_ms"),
      round(col("value") * 100).cast("long").as("val_cents"),
      col("event_type"))
    val points = ev.select(col("event_id"), col("t_ms"), col("val_cents"))
    val windows = ev.filter(col("event_type") === "error").select(
      col("event_id").as("inc_id"), col("t_ms").as("start_ms"),
      (col("t_ms") + 900000L).as("end_ms"))
    graft.operators.join.RangeJoin
      .pointInInterval(points, "t_ms", windows, "start_ms", "end_ms",
        bin = 900000L)
      .groupBy(col("inc_id"), col("start_ms"))
      .agg(count(lit(1)).as("n_events"), sum(col("val_cents")).as("sum_val_cents"))
      .orderBy(col("inc_id"))
  }

  /** Pivot-style conditional aggregation: per-user event-type counts. */
  def userEventPivot(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"))
      .orderBy(col("user_id"))
}
