package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas.table

/** Round-6 warehouse-analytics suite: the TPC-H-derived decision-support
  * shapes (exists/not-exists, multi-way star joins, correlated-aggregate
  * filters, argmax-by-group, outer-join distributions, conditional
  * ratios) a production engine must run beyond the reference's own
  * pipeline queries. Every query is DuckDB-oracle exact and states its
  * 100 TB join/shuffle strategy.
  *
  * Numeric discipline (shared with [[Analytics2.sqlShippingPriority]]):
  * money aggregates accumulate as exact DECIMAL after a per-row
  * `cast(decimal(18,4))` — double sums are addition-order dependent and
  * would hash-mismatch any engine pair; quantity sums are doubles
  * holding integers ≤ 2^53, exact under any order.
  */
object Warehouse {

  private def netDec(price: Column, disc: Column): Column =
    (price * (lit(1.0) - disc)).cast("decimal(18,4)")

  /** TPC-H-Q4-shaped order-priority check: orders in a quarter having at
    * least one returned item, counted by priority (orders/lineitem via
    * EXISTS — reference has no returns dimension, `l_returnflag = 'R'`
    * stands in for the late-delivery predicate).
    *
    * Scale shape: LEFT SEMI join — lineitem never duplicates orders, no
    * row explosion, and Spark plans it as a shuffle-hash/broadcast semi
    * whose build side carries ONLY `l_orderkey`. The date filter prunes
    * orders at the scan (pushed), the returnflag filter prunes lineitem
    * before the shuffle. Output is 5 rows; the groupBy is map-side
    * combined to nothing. */
  def sqlOrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val returned = table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H-Q5-shaped local-supplier volume: revenue per nation from
    * orders where the customer and the line's supplier share that
    * nation, restricted to one region and one order year.
    *
    * Scale shape: classic star — lineitem is the only big table; orders
    * (date-pruned) shuffles once on orderkey to meet it; customer,
    * supplier, nation, region all BROADCAST (each ≤ customer, itself
    * ~1e-4 of lineitem at any SF). The co-nation predicate
    * `c_nationkey = s_nationkey` rides the broadcast joins as a residual
    * — no extra shuffle. One exchange total at 100 TB. */
  def sqlLocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val nat = table(spark, dir, "nation")
      .join(table(spark, dir, "region")
          .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        netDec(col("l_extendedprice"), col("l_discount")).as("net_dec"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("net_dec")).cast("decimal(28,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H-Q6-shaped forecast-revenue delta: one filtered scan-agg, the
    * canonical pushdown probe — discount band, quantity cap, one ship
    * year, `sum(extendedprice * discount)`.
    *
    * Scale shape: zero shuffles (final single-row agg aside). All three
    * predicates and the 3-column projection reach the parquet scan
    * (`PushedFilters` / `ReadSchema` — asserted by the plan audit spec);
    * at 100 TB this is the query that proves scans don't read the other
    * 13 columns. */
  def sqlForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("decimal(28,4)").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H-Q13-shaped customer order-count distribution: how many
    * customers placed k orders, for every k including 0 — the LEFT
    * OUTER join + double aggregation shape.
    *
    * Scale shape: orders shuffles on custkey once (map-side combined to
    * per-custkey counts first is what the groupBy compiles to); the
    * left join preserves order-less customers. The second aggregation
    * keys on k — tiny domain, broadcast-sized result. Excluded-pattern
    * residual (`o_orderpriority <> '5-LOW'`) filters BEFORE the join at
    * the scan. */
  def sqlCustOrderDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "customer").select(col("c_custkey"))
      .join(table(spark, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H-Q14-shaped promo-revenue ratio: the share of one ship-month's
    * revenue coming from promotional parts — conditional aggregation
    * over a fact⨝dim join, reported as exact decimal parts plus an
    * IEEE-deterministic double ratio (decimal division scale rules
    * differ across engines; double division of identical exact inputs
    * does not).
    *
    * Scale shape: part BROADCASTS (bounded dimension); lineitem is
    * scanned once with the month filter pushed down; no shuffle before
    * the single-row agg. */
  def sqlPromoRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_partkey"),
        netDec(col("l_extendedprice"), col("l_discount")).as("net_dec"))
      .join(broadcast(table(spark, dir, "part")
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("net_dec"))
          .otherwise(lit(0).cast("decimal(18,4)")))
          .cast("decimal(28,4)").as("promo_revenue"),
        sum(col("net_dec")).cast("decimal(28,4)").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (col("promo_revenue").cast("double") * lit(100.0) /
          col("total_revenue").cast("double")).as("promo_pct"))

  /** TPC-H-Q15-shaped top supplier: supplier(s) achieving the maximum
    * quarterly revenue — the argmax-over-an-aggregate shape, done
    * without re-running the aggregate (Q15's VIEW is computed once and
    * self-joined on its own max).
    *
    * Scale shape: one shuffle of the date-pruned lineitem on suppkey to
    * per-supplier revenue (a supplier-cardinality table); the global
    * max of that is a broadcast scalar; the equality filter against it
    * touches no big data again. Revenue is exact DECIMAL so `= max`
    * is a safe equality. */
  def sqlTopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(netDec(col("l_extendedprice"), col("l_discount")))
        .cast("decimal(28,4)").as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(top), col("total_revenue") === col("mx"))
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H-Q17-shaped small-quantity revenue: revenue lost to line items
    * ordering below 20% of their part's average quantity, for one brand
    * — the correlated-scalar-subquery shape, decorrelated into an
    * aggregate + join.
    *
    * Scale shape: the per-part average aggregates the brand-pruned
    * lineitem on partkey once; its result has part-dimension
    * cardinality and BROADCASTS back onto the same pruned scan — no
    * second big shuffle, no correlated re-scan per row. Quantities are
    * integer-valued doubles: `sum` is exact under any addition order,
    * so `avg = sum/count` and the `< 0.2·avg` cut are cross-engine
    * deterministic. */
  def sqlSmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
          .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      .select(col("l_partkey").as("a_partkey"), col("avg_qty"))
    li.join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("decimal(28,4)").as("yearly_loss"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H-Q21-shaped sole-fault supplier report: suppliers whose
    * returned item is the ONLY return in a multi-supplier order — the
    * EXISTS + NOT-EXISTS double-correlation shape, decorrelated into
    * one per-order profile join (`count distinct suppliers` /
    * `count distinct returning suppliers`) instead of two correlated
    * re-scans.
    *
    * Scale shape: lineitem shuffles on orderkey ONCE to build the
    * order profile (two distinct-counts over a few-per-order set —
    * exact, map-side partial); returned items join that profile on the
    * same key — AQE reuses the exchange — then aggregate on suppkey
    * (supplier-cardinality). Contrast with the textbook formulation:
    * two additional correlated semi/anti joins over lineitem. */
  def sqlSoleFaultSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val profile = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret_supp"))
      .filter(col("n_supp") > 1 && col("n_ret_supp") === 1)
      .select(col("l_orderkey").as("p_orderkey"))
    li.filter(col("l_returnflag") === "R")
      .join(profile, col("l_orderkey") === col("p_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }
}
