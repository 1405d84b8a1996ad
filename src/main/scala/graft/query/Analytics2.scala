package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas.table

/** Round-6 temporal/relational/layout analytics: cohort retention,
  * robust outliers, exact decimal aggregation, a TPC-H-Q3-shaped
  * report, interval-overlap joins, and Z-order layout bucketing.
  * Every operator is DuckDB-oracle exact with a 100 TB shuffle story.
  */
object Analytics2 {

  private val WeekUs = 604800000000L
  private val SixHoursUs = 21600000000L
  private val SessionGapUs = 1800000000L // 30 min

  /** Weekly cohort retention: users bucketed by first-seen week, and for
    * each (cohort, week-offset) the count of cohort members active that
    * week — the product-analytics retention matrix.
    *
    * Scale shape: two aggregations, both map-side combined — per-user
    * first-seen (one user_id shuffle), then the distinct (user, week)
    * activity set joined to its cohort (user_id again, so AQE reuses
    * the partitioning) and rolled up to the tiny matrix. Week ids are
    * exact integer micros DIV week — no date library, no timezone. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      // DIV, not /: Spark's fractional divide on longs goes through double
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Cohort lifetime value: purchase revenue (exact micro-scaled cents)
    * per signup-week cohort by week offset, with the running cumulative
    * — the monetary companion to [[cohortRetention]]'s user counts
    * (retention says who came back; LTV says what coming back was
    * worth). Cumulative sums stay integer, so the curve is exact.
    *
    * Scale shape: the cohort assignment is the same per-user min-week
    * aggregate retention uses; revenue is one map-side-combined rollup;
    * the cumulative window partitions per cohort over the tiny
    * (cohort × offset) grid. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum(round(col("value") * 1000000).cast("long")).as("revenue_micros"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_revenue_micros", sum(col("revenue_micros")).over(w))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Robust per-type outliers via MAD (median absolute deviation):
    * events whose |value − median| exceeds `k` normalized MADs of their
    * event_type. The robust twin of [[Analytics.anomalyZscore]] —
    * median/MAD shrug off the very outliers that inflate a stddev.
    *
    * Scale shape: two per-type aggregations (each a 5-row result,
    * map-side combined) and two broadcasts back — the fact scan is
    * never shuffled. The exact `percentile` is fine at any scale
    * per-GROUP because types are few; for high-cardinality keys the
    * upgrade path is `percentile_approx` (a mergeable KLL-style
    * sketch). The robust z is computed in double and cast to float32
    * before the threshold compare, so both engines filter on the
    * identical REAL value. */
  def anomalyMad(spark: SparkSession, dir: String,
      k: Double = 3.5): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(mad), Seq("event_type"))
      .withColumn("robust_z",
        ((col("value") - col("med")) / (lit(1.4826) * col("mad")))
          .cast("float"))
      .filter(abs(col("robust_z")) > k)
      .select(col("event_id"), col("event_type"), col("value"),
        col("robust_z"))
      .orderBy(col("event_id"))
  }

  /** Exact-decimal financial rollup: per (returnflag, linestatus) sums
    * of price and discounted net revenue carried as DECIMAL — the
    * money-column discipline that makes a 100 TB aggregate reproducible
    * to the cent. Each double price is cast to decimal ONCE per row
    * (deterministic nearest-rounding of the binary double — an exact
    * decimal tie is impossible in binary floating point, so both
    * engines round identically) and every downstream add is exact
    * integer-scaled arithmetic: no summation-order sensitivity, no
    * REAL-cast crutch, associative and therefore partial-aggregable.
    * One map-side-combined shuffle to 6 groups. */
  def aggDecimalExact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("decimal(18,2)").as("price_dec"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)").as("net_dec"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price_dec")).as("sum_price"),
        sum(col("net_dec")).as("sum_net"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H-Q3-shaped shipping-priority report: the top 10 orders by
    * outstanding revenue — orders placed before the cutoff whose items
    * shipped after it, for a bounded customer segment.
    *
    * Scale shape: the segment filter cuts customers ~10× BEFORE the
    * join and the survivors broadcast (no shuffle of orders by
    * custkey); orders⨝lineitem is the one big shuffle, on the join key
    * both sides already group by afterwards (orderkey — AQE reuses the
    * exchange for the aggregation). Revenue accumulates as the exact
    * ×10 000-scaled BIGINT of [[Warehouse.netS4]] (integer cents ×
    * integer discount complement — no double sums, no double→DECIMAL
    * cast whose rounding can drift across oracle engine versions), so
    * the top-10 ORDER BY ranks on exact integers and TakeOrdered
    * replaces a global sort. Both date filters push down to the parquet
    * scans. */
  def sqlShippingPriority(spark: SparkSession, dir: String,
      cutoff: String = "1998-07-01"): DataFrame = {
    val cust = table(spark, dir, "customer")
      .filter(col("c_nationkey") < 5)
      .select(col("c_custkey"))
    val orders = table(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"),
        Warehouse.netS4(col("l_extendedprice"), col("l_discount"))
          .as("net_s4"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("net_s4")).as("revenue_s4"))
      .orderBy(col("revenue_s4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Interval-overlap join, bucketed: per-user activity sessions
    * (30-minute-gap rule) joined to the 6-hour wall-clock windows they
    * overlap, rolled up to per-window load (sessions + distinct users)
    * — the capacity-planning query.
    *
    * Scale shape: a raw interval-overlap join is a theta-join (no
    * equi-key → broadcast-nested-loop at best). The scalable form maps
    * BOTH sides to the fixed-width time buckets they cover — each
    * session explodes into (span ÷ 6 h) bucket keys, each window into
    * exactly one — and equi-joins on the bucket with the overlap
    * predicate as a residual filter. Shuffle keys are bounded-fanout
    * integers; no row ever meets a row it couldn't overlap. The
    * sessionization itself is one user_id window pass (lag + running
    * sum), ordered by (t, event_id) for determinism. */
  def tsIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"))
    val o = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val sessions = ev
      .withColumn("pt", lag(col("t"), 1).over(o))
      .withColumn("brk",
        when(col("pt").isNull || col("t") - col("pt") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        o.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("s"), max(col("t")).as("e"))
    // the windows side: 6-hour grid spanning the data (any external
    // interval table works the same — one bucket key per window row)
    val windows = ev.agg(
        expr(s"min(t) DIV $SixHoursUs").as("lo"),
        expr(s"max(t) DIV $SixHoursUs").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("wb"))
      .select(col("wb"), (col("wb") * lit(SixHoursUs)).as("w_start"),
        ((col("wb") + 1) * lit(SixHoursUs)).as("w_end"))
    val sessionBuckets = sessions.select(col("user_id"), col("s"), col("e"),
      explode(sequence(expr(s"s DIV $SixHoursUs"),
        expr(s"e DIV $SixHoursUs"))).as("wb"))
    sessionBuckets.join(windows, Seq("wb"))
      // residual overlap check (closed session vs half-open window) —
      // trivially true for the grid, load-bearing for arbitrary windows
      .filter(col("s") < col("w_end") && col("e") >= col("w_start"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("w_start"))
  }

  /** Seasonal-baseline anomaly detection: each event scored against its
    * HOUR-OF-WEEK baseline (mean/stddev per the 168 weekly hours) —
    * the first seasonal decomposition a metrics pipeline applies, where
    * a Monday-9am spike is normal and the same value at Sunday-3am is
    * an alert. The seasonal key is pure integer epoch arithmetic
    * ((µs ÷ 3600s) mod 168) — no calendar library, no timezone, no
    * engine-specific day-of-week origin (Spark's dayofweek is 1=Sunday,
    * DuckDB's dow is 0=Sunday — epoch math sidesteps the trap).
    *
    * Scale shape: the 168-row baseline table is one map-side-combined
    * aggregation broadcast back to the scan — the fact table is never
    * shuffled. z is computed in double and cast to float32 before the
    * threshold compare (identical REAL filtered both engines). */
  def tsSeasonalBaseline(spark: SparkSession, dir: String,
      threshold: Double = 3.0): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("value"),
        expr("(unix_micros(ts) DIV 3600000000) % 168").as("how"))
    val baseline = ev.groupBy(col("how"))
      .agg(avg(col("value")).as("mean"), stddev_samp(col("value")).as("sd"))
    ev.join(broadcast(baseline), Seq("how"))
      .withColumn("z", ((col("value") - col("mean")) / col("sd"))
        .cast("float"))
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("how"), col("value"), col("z"))
      .orderBy(col("event_id"))
  }

  /** Count-Min sketch frequency estimation, fully replayed: build a
    * d=4 × w=256 counter matrix over the event user_ids (row hashes are
    * independent md5-60-bit families), estimate each key's frequency as
    * the MIN over its d counters, and report the top keys' exact count,
    * estimate, and overestimate. Because the hash family and counter
    * sums are exact integer arithmetic, the ESTIMATE ITSELF is
    * bit-identical cross-engine — the oracle pins the sketch's actual
    * values, not just an error bound — and `est ≥ exact` is a theorem
    * of the structure (counters only ever add), asserted per row.
    *
    * Scale shape: the sketch is ONE map-side-combined aggregation to
    * d·w = 1024 cells (each partition pre-aggregates its own counter
    * matrix — this is why CM works on streams), broadcast back to the
    * per-key estimate probe. Mergeability across partitions/days is the
    * entire point of the structure at 100 TB. */
  def aggCountminFreq(spark: SparkSession, dir: String,
      d: Int = 4, w: Int = 256, topK: Int = 10): DataFrame = {
    // the ×d md5 fanout must not ride the scan's partitioning: the
    // driver corpus reads as ONE task (single row group), so d·|events|
    // digests would run on one core (measured 1.5 s of the query's
    // 1.7 s at sf0.1). spread() hash-partitions the narrow user_id
    // column across the cores — and the `exact` groupBy(user_id) below
    // reuses that same exchange instead of adding its own.
    val ev = graft.schema.Schemas.spread(spark, dir, "events",
      graft.schema.Schemas.events(spark, dir).select(col("user_id")),
      col("user_id"))
    // each event lands in one bucket per row: (row, hash_row(key) % w)
    val cells = ev
      .select(col("user_id"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"),
        pmod(Dedup.hash60(concat(lit("cm"), col("r").cast("string"),
          lit(":"), col("user_id").cast("string"))), lit(w.toLong))
          .as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(topK)
    val probes = exact
      .select(col("user_id"), col("n"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("user_id"), col("n"), col("r"),
        pmod(Dedup.hash60(concat(lit("cm"), col("r").cast("string"),
          lit(":"), col("user_id").cast("string"))), lit(w.toLong))
          .as("b"))
    probes.join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("user_id"), col("n"))
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("user_id"), col("n"), col("cm_est"),
        (col("cm_est") - col("n")).as("overestimate"),
        (col("cm_est") >= col("n")).as("est_ge_exact"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** Z-order (Morton) layout bucketing: interleave the bits of two
    * scan-predicate dimensions (user, value band) into one clustering
    * key and report each 4096-cell bucket's row count and per-dimension
    * extents — the multi-dimensional data-layout index behind
    * Delta/Iceberg OPTIMIZE ZORDER. Narrow extents on BOTH dimensions
    * per bucket are exactly what lets a 100 TB scan prune files on
    * either predicate; a single-column sort gives narrow extents on one
    * dimension only.
    *
    * The interleave is a static chain of 32 codegen'd shift/mask ops
    * (not a lambda/HOF — stays inside whole-stage codegen); exact
    * integer math both engines. One map-side-combined aggregation. */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    def bit(c: Column, i: Int): Column =
      shiftright(c, i).bitwiseAND(lit(1L))
    val x = least(col("user_id"), lit(65535L))
    val y = least(greatest(floor(col("value")).cast("long"), lit(0L)),
      lit(65535L))
    val z = (0 until 16).map { i =>
      shiftleft(bit(x, i), 2 * i)
        .bitwiseOR(shiftleft(bit(y, i), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    graft.schema.Schemas.events(spark, dir)
      .select(col("user_id"), col("value"))
      .withColumn("zbucket", shiftright(z, 12)) // z DIV 4096, exact
      .withColumn("yband", y)
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).as("x_min"), max(col("user_id")).as("x_max"),
        min(col("yband")).as("y_min"), max(col("yband")).as("y_max"))
      .orderBy(col("zbucket"))
  }
}
