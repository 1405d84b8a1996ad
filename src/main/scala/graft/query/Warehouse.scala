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
  * money aggregates accumulate as exact scaled BIGINT. The source data
  * is 2-decimal money stored as double (max binary error ~1e-9 of a
  * cent — measured, nowhere near a .5 rounding boundary), so
  * `round(x * 100)` recovers exact integer cents identically on every
  * engine, and `cents * (100 - pct_discount)` is pure 64-bit integer
  * arithmetic from there: no double summation-order sensitivity, no
  * double→DECIMAL cast whose rounding mode can drift across oracle
  * engine versions, and associative/commutative so Spark's partial
  * aggregation is exact. Oracle SQL must also `CAST(sum(..) AS BIGINT)`
  * — DuckDB sums BIGINT into HUGEINT (int128), a type whose
  * client-side canonicalization differs across versions. Headroom: max
  * net-×10k value ≈ 1.05e11, so 2^63 holds ~8.8e7 such rows PER GROUP
  * after map-side combine — at true 100 TB single-group scale the same
  * scaled-long values would final-combine via DECIMAL(38,0)/two-longs,
  * unchanged per-row math.
  */
object Warehouse {

  private def netDec(price: Column, disc: Column): Column =
    (price * (lit(1.0) - disc)).cast("decimal(18,4)")

  /** Exact net revenue scaled ×10 000: integer cents × integer
    * (100 − discount%), both recovered exactly from the 2-decimal
    * doubles (see class doc). */
  private[query] def netS4(price: Column, disc: Column): Column =
    round(price * lit(100)).cast("long") *
      (lit(100L) - round(disc * lit(100)).cast("long"))

  /** Exact integer cents of a 2-decimal money double. */
  private[query] def cents(x: Column): Column =
    round(x * lit(100)).cast("long")

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
    * — no extra shuffle. One exchange total at 100 TB. Revenue is the
    * exact ×10 000-scaled BIGINT sum (class doc) — driver-proof across
    * oracle engine versions. */
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
        netS4(col("l_extendedprice"), col("l_discount")).as("net_s4"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("net_s4")).as("revenue_s4"))
      .orderBy(col("revenue_s4").desc, col("n_name"))
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
    * Scale shape: AGGREGATE-THEN-JOIN — orders first reduces to one
    * (custkey, count) row per ordering customer (map-side combined, one
    * shuffle of |orders| rows collapsing to |custkey| rows); customer
    * then left-joins those counts with `coalesce(count, 0)` supplying
    * the zero-order customers. The join therefore moves |custkey| rows,
    * not |orders| — the join-before-aggregate alternative shuffles and
    * hash-probes every order row against customer before collapsing,
    * ~10× more exchange volume at TPC-H ratios. The second aggregation
    * keys on k — tiny domain, broadcast-sized result. Excluded-pattern
    * residual (`o_orderpriority <> '5-LOW'`) filters BEFORE the
    * aggregate at the scan. */
  def sqlCustOrderDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("o_count"))
    table(spark, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("o_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
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
    * second big shuffle, no correlated re-scan per row. All-integer
    * numerics: quantities are exact integers, so the predicate
    * `qty < 0.2 · (sum_q / cnt)` is evaluated as the equivalent
    * cross-multiplied BIGINT comparison `5·qty·cnt < sum_q` — zero
    * floating-point anywhere — and the lost revenue sums exact integer
    * cents (class doc). */
  def sqlSmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
          .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("qty_i"),
        cents(col("l_extendedprice")).as("price_c"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty_i")).as("sum_q"), count(lit(1)).as("cnt"))
      .select(col("l_partkey").as("a_partkey"), col("sum_q"), col("cnt"))
    li.join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
      .filter(col("qty_i") * col("cnt") * lit(5L) < col("sum_q"))
      .agg(sum(col("price_c")).as("yearly_loss_c"),
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
  /** TPC-H-Q7-shaped nation-pair volume: revenue flowing between two
    * trading nations (supplier nation → customer nation, both
    * directions) per ship year — the two-dimension-lookup star with a
    * pair predicate.
    *
    * Scale shape: both nation lookups ride BROADCAST joins (supplier
    * and customer are bounded dimensions); the pair predicate
    * `(s,c) ∈ {(1,2),(2,1)}` is a residual on the broadcasts, pruning
    * before the one big lineitem⨝orders shuffle's output aggregates.
    * Group keys (two names + year) are a tiny domain — map-side
    * combined to nothing. Money is the exact ×10 000-scaled BIGINT
    * (class doc). */
  def sqlNationVolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val supp = table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")
          .filter(col("n_name").isin(nationA, nationB))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")
          .filter(col("n_name").isin(nationA, nationB))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
        netS4(col("l_extendedprice"), col("l_discount")).as("net_s4"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("net_s4")).as("revenue_s4"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H-Q12-shaped priority-by-linestatus check: for one ship year,
    * per line status, how many lines belong to urgent/high-priority
    * orders vs the rest — the conditional-count-over-join shape
    * (adapted: the reference schema carries no shipmode/receipt
    * columns; linestatus stands in for the grouping dimension).
    *
    * Scale shape: one lineitem⨝orders shuffle on orderkey (the date
    * filter prunes lineitem at the scan first); the conditional counts
    * are map-side combined over a 2-value group domain. All-integer
    * output. */
  def sqlPriorityLinestatus(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** TPC-H-Q18-shaped large-volume customers: orders whose total
    * quantity exceeds a threshold, with their customer — the
    * HAVING-over-aggregate + enrichment-join shape.
    *
    * Scale shape: lineitem aggregates per orderkey FIRST (map-side
    * combined, one shuffle collapsing to |orders| rows) and the HAVING
    * cut reduces that to a tiny survivor set, which then joins orders
    * and broadcast customer — the joins move only survivors, the
    * Q13 aggregate-then-join discipline again. Quantities are exact
    * integers. */
  def sqlLargeVolumeCustomer(spark: SparkSession, dir: String,
      minQty: Long = 300L): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("q")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H-Q19-shaped disjunctive-band revenue: revenue from three
    * (brand, quantity-band) alternatives OR-ed together — the
    * disjunctive-predicate pushdown probe (each disjunct alone is
    * selective; the union must not devolve into a full scan of the
    * JOIN output).
    *
    * Scale shape: part BROADCASTS; the disjunction is a residual on the
    * broadcast join evaluated inside codegen, and the quantity bounds
    * (the common `qty_i <= 30` envelope) push to the lineitem scan.
    * Single-row output; money is exact scaled BIGINT. */
  def sqlDisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("qty_i"),
        netS4(col("l_extendedprice"), col("l_discount")).as("net_s4"))
      .filter(col("qty_i") <= 30L)
    li.join(broadcast(table(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("qty_i").between(1L, 11L)) ||
        (col("p_brand") === "Brand#2" && col("qty_i").between(10L, 20L)) ||
        (col("p_brand") === "Brand#3" && col("qty_i").between(20L, 30L)))
      .agg(sum(col("net_s4")).as("revenue_s4"), count(lit(1)).as("n_items"))
  }

  /** TPC-H-Q22-shaped sales opportunity: LAPSED customers — above-average
    * positive account balance, no order since the cutoff — counted per
    * nation. The scalar-subquery-filter + anti-join shape (the pure
    * never-ordered variant is degenerate on this schema: order volume
    * covers nearly every customer, so the anti-join is date-scoped,
    * which is also the more realistic churn query).
    *
    * Scale shape: the global (sum, count) of positive balances is a
    * 1-row broadcast scalar; the above-average cut is the
    * cross-multiplied integer comparison `bal_c · n > sum_c` (balances
    * are 2-decimal money → exact cents, see class doc) — no double
    * average, no division anywhere. The no-recent-orders check is a
    * LEFT ANTI join on custkey against the date-pruned orders scan
    * (filter pushed down; ids only cross the exchange). Both sides of
    * the compare stay all-BIGINT. */
  def sqlSalesOpportunity(spark: SparkSession, dir: String,
      cutoff: String = "2000-01-01"): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_c"))
    val avgPos = cust.filter(col("bal_c") > 0L)
      .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_c") * col("n_pos") > col("sum_c"))
      .join(table(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H-Q8-shaped market share: of all revenue flowing to customers
    * in one region, the fraction supplied by one nation, per order year
    * — the conditional-share-over-star shape.
    *
    * Scale shape: identical star to [[sqlLocalSupplierVolume]] (one
    * lineitem⨝orders shuffle, every dimension broadcast); numerator and
    * denominator accumulate in ONE aggregation pass as exact scaled
    * BIGINTs (a `when` inside the sum — no second scan, no self-join);
    * the share is a single long/long→double division per output row,
    * IEEE-identical across engines given identical exact inputs. */
  def sqlMarketShare(spark: SparkSession, dir: String,
      region: String = "ASIA", nation: String = "NATION_1"): DataFrame = {
    val custRegion = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")
          .join(broadcast(table(spark, dir, "region")
              .filter(col("r_name") === region)),
            col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("sn_name"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        netS4(col("l_extendedprice"), col("l_discount")).as("net_s4"))
      .join(table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("sn_name") === nation, col("net_s4")).otherwise(0L))
          .as("nation_s4"),
        sum(col("net_s4")).as("total_s4"))
      .select(col("o_year"), col("nation_s4"), col("total_s4"),
        (col("nation_s4").cast("double") / col("total_s4").cast("double"))
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H-Q10-shaped returned-item report: customers ranked by revenue
    * lost to returns in one quarter — the top-k-over-star shape every
    * churn dashboard runs.
    *
    * Scale shape: the returnflag filter prunes lineitem at the scan and
    * the quarter filter prunes orders; one orderkey shuffle joins them;
    * customer (with its nation name) BROADCASTS onto the per-custkey
    * aggregate. TakeOrdered replaces a global sort for the top 20.
    * Money is exact scaled BIGINT, so the ranking is on exact integers
    * with a custkey tiebreak. */
  def sqlReturnedTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        netS4(col("l_extendedprice"), col("l_discount")).as("net_s4"))
      .join(table(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("net_s4")).as("revenue_s4"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_s4"))
      .orderBy(col("revenue_s4").desc, col("c_custkey"))
      .limit(20)
  }

  def sqlSoleFaultSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    // distinct-supplier profile WITHOUT multi-distinct expand: collapse
    // to the (order, supplier) grain once (carrying a has-return flag),
    // then the per-order counts are plain aggregates whose shuffle key
    // is a prefix of the first — no Expand multiplication of the fact
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
        .as("has_r"))
    // the order profile attaches as a window over the SAME (order,
    // supplier) grain rather than a groupBy+self-join — the join form
    // evaluated the perSupp aggregation on both branches (no
    // cross-branch CSE), doubling the fact pass
    val wOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(wOrder))
      .withColumn("n_ret_supp", sum(col("has_r")).over(wOrder))
      .filter(col("has_r") === 1 && col("n_supp") > 1
        && col("n_ret_supp") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      // Q21's output grain is s_name, NOT the supplier key: names are
      // unique in a real corpus, but the grain must be the declared one
      // anyway (the x10 synthesis shifts keys while reusing names, and
      // the key-grain answer diverged there). An order has at most one
      // sole-fault supplier, so summing the per-key counts equals the
      // oracle's count(DISTINCT l_orderkey) per name; the re-agg runs
      // on ≤|supplier| tiny rows
      .groupBy(col("s_name"))
      .agg(sum(col("numwait")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }
}
