package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational join/aggregation operators over the TPC-H-ish star schema —
  * the query classes the reference lacks entirely (SURVEY.md §2.7) but a
  * general analytics engine must provide. Shapes follow the public TPC-H
  * specification (Q1/Q3/Q5 style), adapted to the fixture columns.
  *
  * Scale design: dimension tables (region/nation/supplier/customer/part)
  * are broadcast — Catalyst picks broadcast-hash join under the 10MB
  * threshold and AQE converts at runtime otherwise; the only large-table
  * shuffles are the hash aggregations on group keys. Fact-to-fact joins
  * (orders x lineitem) shuffle on the join key once; AQE coalesces
  * post-shuffle partitions.
  */
object Relational {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Money columns are fixed 2-decimal values stored as DOUBLE; summing in
    * DECIMAL is exact and therefore bit-identical across engines — float
    * partial-sum ordering differences would otherwise approach the rounding
    * granularity at 100TB row counts. Averages are expressed as exact-sum /
    * count so no decimal-division rounding rule is involved. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: scan-heavy, map-side partial agg. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(shipBefore)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
          * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count("*")).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count("*")).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count("*")).as("avg_disc"),
        count("*").cast("long").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top unshipped-revenue orders for a market segment.
    * customer (small) broadcasts into orders; orders⨝lineitem shuffles on
    * the order key. */
  def topUnshippedOrders(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, cutoff: String, k: Int): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
      .join(lineitem.filter(col("l_shipdate") > to_timestamp(lit(cutoff))),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(k)

  /** TPC-H Q5-style: regional revenue by nation (customer and supplier in
    * the same nation). All dims broadcast; lineitem shuffles once. */
  def regionalRevenue(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String, from: String, until: String): DataFrame =
    region.filter(col("r_name") === regionName)
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(from)) &&
        col("o_orderdate") < to_timestamp(lit(until))),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Brand revenue rollup: part (broadcast) ⨝ lineitem, top-k brands. */
  def brandRevenue(part: DataFrame, lineitem: DataFrame, k: Int): DataFrame =
    part.join(lineitem, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count("*").cast("long").as("n_items"))
      .orderBy(desc("revenue"), asc("p_brand"))
      .limit(k)

  /** TPC-H Q6-style forecast: pure scan + filter + single exact sum —
    * the pushdown showcase (all three predicates reach the parquet scan). */
  def revenueForecast(lineitem: DataFrame, from: String, until: String,
      discLo: Double, discHi: Double, qtyMax: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyMax)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count("*").cast("long").as("n_items"))

  /** Orders with at least one late line item (semi join — EXISTS):
    * shipped more than `lateDays` after the order date. */
  def ordersWithLateItems(orders: DataFrame, lineitem: DataFrame,
      lateDays: Int): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count("*").cast("long").as("n_orders"))
      .orderBy("o_orderpriority")

  /** Customers that never ordered (anti join — NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count("*").cast("long").as("n_customers"),
        min(col("c_custkey")).as("min_custkey"))
      .orderBy("c_mktsegment")

  /** Skew-safe heavy-hitter aggregation: two-phase salted aggregate.
    * Phase 1 aggregates on (key, salt) — a skewed key's rows spread over
    * `salts` partitions with bounded partial state — phase 2 combines the
    * partials per key. Semantics identical to a direct groupBy; the salt
    * is an internal physical detail. */
  def heavyHitters(df: DataFrame, keyCol: String, valueCol: String,
      k: Int, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(col(keyCol), monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count("*").as("pc"), sum(dec(col(valueCol))).as("ps"))
    salted.groupBy(col(keyCol))
      .agg(sum(col("pc")).cast("long").as("n"),
        sum(col("ps")).cast("double").as("total"))
      .orderBy(desc("total"), col(keyCol))
      .limit(k)
  }

  /** Per-customer order ranking (window function): top-n orders by price. */
  def topOrdersPerCustomer(orders: DataFrame, maxCust: Long, n: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders.filter(col("o_custkey") < maxCust)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))
      .orderBy("o_custkey", "rank")
  }
}
