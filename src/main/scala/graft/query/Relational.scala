package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.Schemas.{events, table}

/** SURVEY.md §2 operator inventory re-expressed as declarative DataFrame
  * programs over the driver's test tables. Every query here is paired with
  * an ANSI-SQL oracle in [[graft.SparkEntry.oracleSql]] and hash-compared
  * by the driver against DuckDB at sf0.01.
  *
  * Conventions (driver-compare safety):
  *   - output column names are all lowercase and aliased identically in the
  *     oracle SQL (driver sorts columns by name before hashing);
  *   - every query ends in a total ORDER BY (deterministic row order even if
  *     the driver does not sort rows);
  *   - output types match the oracle's (INT/BIGINT/REAL/DOUBLE — oracles
  *     CAST where DuckDB's natural type differs, e.g. EXTRACT → BIGINT).
  *
  * Scale notes (100 TB rule): every query is a pure Catalyst plan — filters
  * and projections push to the parquet scan, aggregations are partial
  * (map-side combine) before the exchange, sorts run on already-reduced
  * outputs, dimension joins are broadcast, and nothing materializes on the
  * driver.
  */
object Relational {

  /** Flagship aggregation (TPC-H Q1 shape) — pricing summary by flag/status.
    * GroupBy keys are low-cardinality: partial aggregation collapses each
    * input partition to ~6 rows before the exchange, so the shuffle is O(1)
    * regardless of input size. (Reference analog: the trainer's only
    * aggregate is Imputer's per-column mean, spark_trainer.py:70 — this is
    * its group-by generalization.) */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3 skeleton (SURVEY §7.3): avg event value per hour-of-day, band
    * filter, best-first sort — the relational core of the reference's
    * optimal-time endpoint (api/api.py:227-313) with the model swapped for
    * an aggregate. 24-row output: the HAVING band runs post-agg on 24 rows;
    * the groupBy shuffles only 24 partial rows per input partition.
    *
    * Exactness: the score rides the ×10³ value grid summed in
    * DECIMAL(38,0) — a streaming `avg(double)` accumulates in engine-
    * specific order and drifted past bit-equality at x10, and here the
    * drift is worse than cosmetic because the BETWEEN band sits on the
    * drifting value (a boundary hour can flip in/out). The band test is
    * the exact integer inequality 45000·n ≤ Σv3 ≤ 52000·n; the reported
    * score is one fixed-parenthesization double epilogue. */
  def q3OptimalTime(spark: SparkSession, dir: String): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    events(spark, dir)
      .select(hour(col("ts")).as("hour"),
        round(col("value") * lit(1000.0)).cast("long").as("v3"))
      .groupBy(col("hour"))
      .agg(sum(col("v3").cast(dec38)).as("sv3"), count(lit(1)).as("n_events"))
      .filter(col("sv3") >= col("n_events").cast(dec38) * lit(45000L) &&
        col("sv3") <= col("n_events").cast(dec38) * lit(52000L))
      .select(col("hour"),
        (col("sv3").cast("double") / col("n_events").cast("double") /
          lit(1000.0)).as("score"),
        col("n_events"))
      .orderBy(col("score"), col("hour"))
  }

  // ---- §2.1 sources --------------------------------------------------------

  /** S1: projection scan. Column pruning reaches the parquet reader
    * (ReadSchema carries only 4 of 11 lineitem columns). Reference analog:
    * the producer's header-CSV scan (producer/producer.py:33-45). */
  def s1ScanProject(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** S2/O3: deterministic row limit — ordered top-N, a single reduction
    * (TakeOrderedAndProject: no global sort, no full shuffle). Reference:
    * MAX_ROWS_TO_SEND cap (producer/producer.py:14,46-48). */
  def s2LimitOrdered(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
      .limit(100)

  /** S3/F1: to_float_or_zero coercion — cast-with-default at the source
    * boundary (producer/producer.py:53-58: empty/invalid → 0.0). A
    * non-numeric string coerces to 0.0f; a numeric one round-trips. */
  def s3CoerceToFloat(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id"),
        // try_cast, not cast: Spark 4 runs ANSI mode, where a failed string
        // cast throws instead of yielding null (the reference's semantics)
        coalesce(expr("try_cast(event_type AS float)"), lit(0.0f)).as("et_coerced"),
        coalesce(col("value").cast("float"), lit(0.0f)).as("value_f"))
      .orderBy(col("event_id"))

  /** S4/F2: JSON-encode sink shape (producer/producer.py:21,62). Built by
    * explicit concat so the byte-level result is engine-independent (key
    * order and spacing of to_json vary by engine). */
  def s4JsonEncode(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        concat(lit("{\"event_id\":"), col("event_id").cast("string"),
          lit(",\"user_id\":"), col("user_id").cast("string"),
          lit(",\"event_type\":\""), col("event_type"), lit("\"}")).as("payload"))
      .orderBy(col("event_id"))

  /** S6/F2/S8: JSON-decode source — parse the `props` JSON value column and
    * surface a typed field (consumer/consumer.py:24 value_deserializer). */
  def s6JsonDecode(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  /** S7: malformed-record filter — rows whose JSON value fails to parse (or
    * lacks the field) are dropped, the `from_json`-null idiom for the
    * consumer's non-dict drop (consumer/consumer.py:47-49). The k>50 band
    * keeps the filter observable on all-valid synthetic data. */
  def s7MalformedFilter(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull && col("k") > 50)
      .orderBy(col("event_id"))

  /** S9: count-based tumbling batch window (consumer/consumer.py:59-82) —
    * batch_id = floor(row_rank / 1000) in `event_id` order, then per-batch
    * stats. Scale-safe global ranking WITHOUT a single-partition sort:
    * two-level rank. Level 1 buckets rows by the ID VALUE range
    * (`floor(event_id / bucketWidth)` — derived from the value, so it is
    * deterministic under any physical partitioning) and aggregates a
    * per-bucket histogram; a running sum over that histogram (a window over
    * n/bucketWidth tiny rows, NOT the data) yields each bucket's global
    * rank offset, broadcast back. Level 2 ranks within each bucket
    * (parallel windows, ≤ bucketWidth rows each) and adds the offset.
    * The only single-partition exchange in the plan carries the aggregated
    * histogram. Requires unique event_ids (ties would make the global rank
    * order-dependent — asserted by the data-contract spec). The
    * arrival-order streaming variant (no ordering column needed) lives in
    * [[graft.ingest.Batcher]]. */
  def s9BatchAssign(spark: SparkSession, dir: String,
      bucketWidth: Long = 4096L): DataFrame =
    graft.ingest.Batcher.assignBatches(
        events(spark, dir).select(col("event_id")),
        "event_id", batchSize = 1000, maxBatches = Int.MaxValue,
        bucketWidth = bucketWidth)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("batch_id"))

  /** S11: multi-file scan — several scans of the same schema unioned into
    * one DataFrame (spark_trainer/spark_trainer.py:43,46 reads a *list* of
    * batch CSVs). Expressed as two disjoint scans + unionAll; Catalyst
    * pushes the disjoint filters into both scans. */
  def s11MultiScanUnion(spark: SparkSession, dir: String): DataFrame = {
    def part(n: Int) = table(spark, dir, "lineitem")
      .filter(col("l_linenumber") === n)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    part(1).unionAll(part(2)).orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** S12: in-memory row source — literal rows + explicit schema
    * (api/api.py:89,157,284 createDataFrame). LocalRelation: constant-folded,
    * never touches an executor. */
  def s12InMemSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq((1, 1200.5f, 17.0f), (2, 450.0f, 21.5f), (3, 80.25f, 3.0f))
      .toDF("row_id", "distance", "temp")
      // arithmetic in double: float division/promotion rules differ between
      // engines; double ops are IEEE-identical everywhere
      .withColumn("score",
        col("distance").cast("double") * lit(0.01) + col("temp").cast("double"))
      .orderBy(col("row_id"))
  }

  // ---- §2.2 transforms -----------------------------------------------------

  /** T1: bulk cast — every numeric column cast in ONE select (the
    * reference's 25 stacked withColumn casts, spark_trainer.py:48-50,
    * collapsed to a single Project so the plan has one node, not 25). */
  def t1BulkCast(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("float").as("quantity_f"),
        col("l_extendedprice").cast("float").as("extendedprice_f"),
        col("l_discount").cast("float").as("discount_f"),
        col("l_tax").cast("float").as("tax_f"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** T2: null-drop on a subset — na.drop on the label column
    * (spark_trainer.py:52). Nulls are induced (value<1 → null) since the
    * synthetic table is complete; the drop then removes exactly those. */
  def t2NullDrop(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("label",
        when(col("value") < 1.0, lit(null)).otherwise(col("value")))
      .na.drop(Seq("label"))
      .select(col("event_id"), col("label"))
      .orderBy(col("event_id"))

  /** T3/T4: training projection — keep features+label, drop the rest
    * (spark_trainer.py:56-62), with the defensive schema intersect. */
  def t3Projection(spark: SparkSession, dir: String): DataFrame = {
    val wanted = Seq("o_orderkey", "o_custkey", "o_totalprice", "no_such_col")
    val df = table(spark, dir, "orders")
    val present = wanted.filter(df.columns.contains) // T4 intersect
    df.select(present.map(col): _*).orderBy(col("o_orderkey"))
  }

  /** T5: single-row validation/coercion — missing feature → 0.0 plus a
    * missing-flag column (api/api.py:49-73's warning list, as data). */
  def t5ValidateRow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq((1, Some(1200.5f), Option.empty[Float], Some(3.2f)),
        (2, Option.empty[Float], Some(21.0f), Option.empty[Float]))
      .toDF("row_id", "distance", "temp", "wind")
      .select(col("row_id"),
        coalesce(col("distance"), lit(0.0f)).as("distance_v"),
        coalesce(col("temp"), lit(0.0f)).as("temp_v"),
        coalesce(col("wind"), lit(0.0f)).as("wind_v"),
        col("distance").isNull.as("distance_missing"),
        col("temp").isNull.as("temp_missing"),
        col("wind").isNull.as("wind_missing"))
      .orderBy(col("row_id"))
  }

  /** T6: BETWEEN range filter (api/api.py:290) — pushed to the parquet scan
    * as two comparison filters. */
  def t6BetweenFilter(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_quantity").between(10.0, 20.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** T7: column override (what-if clone, api/api.py:133-135) — overwrite one
    * feature with a literal across all rows. */
  def t7ColumnOverride(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), col("value"))
      .withColumn("value_overridden", lit(42.5))
      .orderBy(col("event_id"))

  /** T8: grid substitution (api/api.py:261-268) — one base row × an
    * exploded candidate-hour sequence, Phour/Pmin overwritten per candidate.
    * The base side is a LocalRelation: the "join" is constant expansion, no
    * shuffle at any scale. */
  def t8GridSubstitution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq((1200.5f, 17.0f)).toDF("distance", "temp")
      .withColumn("hour", explode(sequence(lit(0), lit(23))))
      .select(col("hour"),
        col("hour").cast("float").as("phour"),
        lit(30.0f).as("pmin"),
        col("distance"), col("temp"))
      .orderBy(col("hour"))
  }

  /** T9: candidate-domain filter (api/api.py:262-264) — drop out-of-domain
    * hours from a literal candidate list. */
  def t9DomainFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq(-3, 0, 7, 12, 18, 23, 24, 99).toDF("hour")
      .filter(col("hour").between(0, 23))
      .orderBy(col("hour"))
  }

  // ---- §2.3 aggregations ---------------------------------------------------

  /** A1: mean imputation — the relational core of Imputer(strategy=mean)
    * (spark_trainer.py:67-70): one global mean over non-null values, then
    * coalesce nulls to it. The 1-row aggregate is broadcast: no shuffle of
    * the fact side, the impute is a map-side expression at any scale.
    *
    * Exactness: the mean rides the ×10³ value grid summed in
    * DECIMAL(38,0) with a two-division double epilogue — a streaming
    * avg(double) accumulates in engine-specific order and drifted past
    * bit-equality at the x10 corpus (the q3_optimal_time class). */
  def a1MeanImpute(spark: SparkSession, dir: String): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val withNulls = events(spark, dir)
      .withColumn("value_n",
        when(col("value") < 1.0, lit(null)).otherwise(col("value")))
    val mean = withNulls
      .select(round(col("value_n") * lit(1000.0)).cast("long").as("v3"))
      .agg((sum(col("v3").cast(dec38)).cast("double")
        / count(col("v3")).cast("double") / lit(1000.0)).as("mean_value"))
    withNulls.crossJoin(broadcast(mean))
      .select(col("event_id"),
        coalesce(col("value_n"), col("mean_value")).as("value_imputed"))
      .orderBy(col("event_id"))
  }

  /** A2: scalar aggregate — the 1-row "first()" extraction (api/api.py:92)
    * as a proper global aggregate. */
  def a2ScalarAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      // float32 output: engines associate double summation differently
      // (DuckDB vectorizes); float rounding absorbs the last-ulp skew, and
      // the reference is float-typed end-to-end anyway (api/api.py:46-47)
      .agg(avg(col("value")).cast("float").as("mean_value"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))

  /** Grouped stats — group-by generalization of A1's per-column mean, with
    * exact distinct counts. Low-cardinality keys → partial agg collapses
    * each partition before the exchange. */
  def aggGroupStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value")).cast("float").as("sum_value"))
      .orderBy(col("event_type"))

  // ---- joins (engine surface; reference's Q2/Q3 re-expression + north-star)

  /** Broadcast dimension join — fact × small dim. `broadcast(part)` keeps
    * the fact side shuffle-free: the 1000-executor plan is a map-side hash
    * join per fact partition.
    *
    * Exactness: revenue is summed as BIGINT cents ×(100−disc_c) in
    * DECIMAL(38,0) (the [[joinSaltedSkew]] discipline) — the original
    * `sum(double)` form drifted past bit-equality at x10 because the two
    * engines accumulate in different orders; one fixed-paren double
    * epilogue (/10⁴) restores the dollar scale. */
  def joinBroadcastDim(spark: SparkSession, dir: String): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .cast(dec38) *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("rev_c4"),
        count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        (col("rev_c4").cast("double") / lit(10000.0)).as("revenue"),
        col("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Shuffle (sort-merge/hash) join — two fact tables co-partitioned on the
    * join key by the exchange; AQE picks the physical strategy and coalesces
    * post-shuffle partitions. */
  def joinShuffleFact(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))

  /** 3-way star join — customer→nation→region, both dims broadcast.
    *
    * Exactness: acctbal is on the cents grid but not binary-representable,
    * so `sum(double)` is order-sensitive and drifted at x10 — summed as
    * BIGINT cents in DECIMAL(38,0), one double epilogue (/10²). */
  def joinStar3Way(spark: SparkSession, dir: String): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)").cast(dec38))
          .as("bal_c"))
      .select(col("r_name"), col("n_customers"),
        (col("bal_c").cast("double") / lit(100.0)).as("sum_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Anti join — parts never ordered (NOT EXISTS). Broadcast the distinct
    * key set of the fact side when small; at scale this is a shuffled
    * left-anti hash join. */
  def joinAntiUnordered(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .join(table(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Semi join — customers with at least one order (EXISTS): no
    * multiplication of the left side, the probe stops at first match. */
  def joinSemiActive(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left outer join with aggregation — unmatched left rows survive with
    * zero counts (count of a null-producing column). */
  def joinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val li2001 = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
    table(spark, dir, "part")
      .join(li2001, col("p_partkey") === col("l_partkey"), "left_outer")
      .groupBy(col("p_partkey"))
      .agg(count(col("l_orderkey")).as("n_2001_items"))
      .orderBy(col("p_partkey"))
  }

  /** Full outer join — early-window vs late-window customer activity;
    * either side may be null, keys coalesced. */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val early = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("ck_early"))
      .agg(count(lit(1)).as("n_early"))
    val late = o.filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("ck_late"))
      .agg(count(lit(1)).as("n_late"))
    early.join(late, col("ck_early") === col("ck_late"), "full_outer")
      .select(coalesce(col("ck_early"), col("ck_late")).as("custkey"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
      .orderBy(col("custkey"))
  }

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL preserve
    * duplicate cardinalities (the bag semantics the DISTINCT forms drop). */
  def setOpsMultiset(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchasers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val errorers   = ev.filter(col("event_type") === "error").select(col("user_id"))
    val iAll = purchasers.intersectAll(errorers).withColumn("tag", lit("intersect_all"))
    val eAll = purchasers.exceptAll(errorers).withColumn("tag", lit("except_all"))
    iAll.unionAll(eAll)
      .groupBy(col("tag"), col("user_id"))
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("tag"), col("user_id"))
  }

  /** AS-OF join, composed from built-ins (SURVEY §7.6 preference (a)): for
    * every error event, the most recent purchase by the same user at or
    * before it. Union the two streams tagged, then one window pass per user
    * carries the last-seen purchase forward — a single shuffle on user_id,
    * no range-join explosion. The oracle is DuckDB's native ASOF JOIN, so
    * the composition is checked against a first-class implementation. */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tagged = purchases
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        col("value").as("p_value"), col("ts").as("p_ts"))
      .unionByName(errors
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("double").as("p_value"),
          lit(null).cast("timestamp").as("p_ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("event_id").isNotNull) // keep the error rows only
      .select(col("event_id"), col("user_id"),
        date_trunc("millisecond", col("last_purchase_ts")).as("purchase_ts"),
        col("last_purchase_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Non-equi range join — events banded by literal value ranges (the
    * BroadcastNestedLoopJoin path for interval predicates; the band table
    * broadcasts, the fact side never shuffles). */
  def joinRangeBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0),
      ("high", 150.0, 1e9)).toDF("band", "lo", "hi")
    events(spark, dir)
      .join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("band"))
  }

  /** Exact interpolated percentiles per group. */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").cast("float").as("p25"),
        expr("percentile(value, 0.5)").cast("float").as("p50"),
        expr("percentile(value, 0.75)").cast("float").as("p75"),
        expr("percentile(value, 0.9)").cast("float").as("p90"))
      .orderBy(col("event_type"))

  // ---- window functions ----------------------------------------------------

  /** Top-k per key — row_number over (partition by type, order by value
    * desc). Partitioned window: shuffles once on the key, sorts within
    * partitions only. Tie-broken by event_id for determinism. */
  def windowTopkPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    events(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** Running sum per user in event order — rows unbounded preceding..current. */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        sum(col("value")).over(w).cast("float").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Hopping (sliding) event-time windows in batch: 6-hour windows sliding
    * every 3 hours — each event lands in exactly two windows (epoch-aligned
    * like Spark's streaming `window`). The oracle reconstructs the window
    * assignment with modular epoch arithmetic + UNNEST. */
  def windowHoppingAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Session windows in batch: per-user activity sessions with a 30-minute
    * inactivity gap via `session_window` — the built-in sessionization
    * operator (the islands-and-gaps SQL pattern is the oracle). */
  def windowSessionAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      // truncate to ms: the oracle's source timestamps are nanosecond-
      // precision, ours are micros — ms is the shared precision
      .select(col("user_id"),
        date_trunc("millisecond", col("w.start")).as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** Lag/lead offsets per key in event order — the remaining window-family
    * member (offset functions; frames and ranking covered elsewhere). */
  def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("value") - lag(col("value"), 1).over(w)).cast("float").as("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Advanced statistical aggregates — sample stddev/variance, exact
    * median, correlation, covariance. Moments ride the exact-integer
    * discipline (value on the ×10³ grid, raw BIGINT user ids, sums in
    * DECIMAL(38,0)/HUGEINT) and every statistic is a fixed
    * parenthesization of those exact sums: the builtin
    * covar_samp/corr accumulators are streaming doubles whose ORDER
    * differs per engine, and the x10 sweep caught them diverging past
    * the REAL cast once the synthetic user-id stride (~10⁹ offsets) met
    * 10⁶-row groups — catastrophic cancellation the two-pass textbook
    * form never sees. Median stays on the raw doubles: selection plus
    * one midpoint average is order-independent on any engine. */
  def aggStatsAdvanced(spark: SparkSession, dir: String): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def d(c: Column): Column = c.cast(dec38)
    val g = events(spark, dir)
      .select(col("event_type"),
        round(col("value") * lit(1000.0)).cast("long").as("v3"),
        col("user_id").as("u"), col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("v3"))).as("sv"),
        sum(d(col("v3")) * col("v3")).as("svv"),
        sum(d(col("u"))).as("su"),
        sum(d(col("u")) * col("u")).as("suu"),
        sum(d(col("u")) * col("v3")).as("suv"),
        median(col("value")).cast("float").as("median_value"))
    val nD = col("n").cast("double")
    val varNum = (d(col("n")) * col("svv") - col("sv") * col("sv"))
      .cast("double")
    val covNum = (d(col("n")) * col("suv") - col("su") * col("sv"))
      .cast("double")
    val uNum = (d(col("n")) * col("suu") - col("su") * col("su"))
      .cast("double")
    val varV = varNum / (nD * (nD - lit(1.0))) / lit(1e6)
    g.select(col("event_type"),
        sqrt(varV).cast("float").as("sd_value"),
        varV.cast("float").as("var_value"),
        col("median_value"),
        (covNum / (sqrt(varNum) * sqrt(uNum))).cast("float")
          .as("corr_value_user"),
        (covNum / (nD * (nD - lit(1.0))) / lit(1e3)).cast("float")
          .as("covar_value_user"))
      .orderBy(col("event_type"))
  }

  // ---- §2.4 sorts / limits / top-k ----------------------------------------

  /** O1: sort by aggregate desc — the feature-importance ordering
    * (spark_trainer.py:95) generalized: avg value per type, heaviest first. */
  def o1SortImportanceDesc(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("importance"))
      .orderBy(col("importance").desc, col("event_type"))

  /** O2: ascending top-k — "best suggestions first" (api/api.py:298) with a
    * cap: TakeOrderedAndProject, not a global sort. */
  def o2TopkAsc(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
      .orderBy(col("value"), col("event_id"))
      .limit(20)

  // ---- set ops -------------------------------------------------------------

  /** Set operations — distinct user sets of two event types: intersect
    * (users doing both) and except (purchasers who never error), unioned
    * with a tag. Both are shuffle-on-key distinct ops. */
  def setOpsUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchasers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val errorers   = ev.filter(col("event_type") === "error").select(col("user_id"))
    val both    = purchasers.intersect(errorers).withColumn("tag", lit("both"))
    val pureBuy = purchasers.except(errorers).withColumn("tag", lit("purchase_only"))
    both.unionAll(pureBuy).orderBy(col("tag"), col("user_id"))
  }

  /** Skew-salted aggregation — the two-stage groupBy for hot keys: stage 1
    * aggregates on (key, salt) spreading each hot key over `salts`
    * partitions; stage 2 merges the partials per key. Result is identical
    * to the direct groupBy (the oracle); the win at scale is that no
    * single reducer owns a hot key's full volume. (AQE's skew handling
    * covers joins; aggregation salting is the manual analog for extreme
    * key skew — here user_id has only ~15 distinct values, the synthetic
    * worst case.) */
  def aggSaltedSkew(spark: SparkSession, dir: String, salts: Int = 16): DataFrame =
    events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("float").as("sum_value"))
      .orderBy(col("user_id"))

  /** Salted shuffle equi-join — the skew-join twin of [[aggSaltedSkew]].
    * The fact side gets a deterministic salt in [0, salts); the dim side
    * is replicated ×salts (one copy per salt value); the join key becomes
    * (key, salt), so a hot key's rows spread across `salts` post-shuffle
    * partitions instead of landing on one straggler. The `shuffle_hash`
    * hint keeps the pattern honest — salting exists precisely for dims
    * too big to broadcast, and a broadcast plan would salt nothing.
    * Result rows are EXACTLY the unsalted join's (each fact row meets its
    * key's dim copy for its own salt exactly once), which is what the
    * oracle checks. Cost: dim ×salts replication — the standard skew
    * tradeoff; AQE's skew-join split handles runtime-detected skew, this
    * handles the skew you know at authoring time. */
  def saltedEquiJoin(fact: DataFrame, factKey: String, saltSrc: Column,
      dim: DataFrame, dimKey: String, salts: Int): DataFrame = {
    val salted = fact.withColumn("jsalt",
      pmod(saltSrc, lit(salts)).cast("int"))
    val replicated = dim.withColumnRenamed(dimKey, factKey)
      .withColumn("jsalt",
        explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(factKey, "jsalt"))
      .drop("jsalt")
  }

  /** Skew-hardened revenue-by-nation: lineitem (fact) salted-joined to
    * supplier (dim, replicated ×salts), then nation broadcast and exact
    * scaled-integer revenue per nation — oracle-exact vs the plain
    * unsalted SQL join. Money stays in BIGINT cents ×(100−disc_c)
    * (the engine-version-proof scaled-integer discipline). */
  def joinSaltedSkew(spark: SparkSession, dir: String,
      salts: Int = 8): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
    val sup = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = table(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    saltedEquiJoin(li, "l_suppkey",
        col("l_orderkey") + col("l_linenumber"), sup, "s_suppkey", salts)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("revenue_c4"))
      .orderBy(col("n_name"))
  }

  /** Bloom-prefiltered fact→dim join — the runtime-filter pattern for the
    * dim-too-big-to-broadcast regime: build a bloom filter over the
    * selective dim's keys (`bloom_filter_agg`, an ObjectHashAggregate
    * whose one-row binary result broadcasts at ~100 KB), semi-filter the
    * fact with `might_contain` BEFORE its shuffle, then run the real
    * equi-join on the survivors. False positives only cost a little
    * extra shuffle — the join keeps results exact, which is what the
    * plain-join oracle checks. At 100 TB this is the difference between
    * shuffling the full fact table and shuffling the ~selectivity
    * fraction that can match (Spark's own AQE runtime filter injects the
    * same shape; building it explicitly keeps it deterministic and
    * hint-controlled). Sizing here is fixed (1e5 items / 8e5 bits ≈ 2%
    * FPP); a production build sizes from dim-side stats. */
  def joinBloomPrefilter(spark: SparkSession, dir: String,
      numItems: Long = 100000L, numBits: Long = 800000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      exprs => BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0),
      "scala_udf")
    reg.createOrReplaceTempFunction("might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
    table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
      .createOrReplaceTempView("v_bloom_urgent")
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .createOrReplaceTempView("v_bloom_li")
    // might_contain requires the filter side to be a constant or scalar
    // subquery (the shape Spark's AQE runtime filter injects); the
    // subquery plans once, its ~100 KB binary result ships to every
    // fact-side task, and the filter pushes below the fact's exchange
    spark.sql(
      s"""SELECT /*+ SHUFFLE_HASH(o) */
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100L - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS revenue_c4
        |FROM v_bloom_li l
        |JOIN v_bloom_urgent o ON l_orderkey = o_orderkey
        |WHERE might_contain(
        |    (SELECT bloom_filter_agg(xxhash64(o_orderkey),
        |       ${numItems}L, ${numBits}L) FROM v_bloom_urgent),
        |    xxhash64(l_orderkey))
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** ROLLUP grouping sets — per-(type, user-bucket) stats plus per-type and
    * grand-total subtotals in one pass (one shuffle; Expand feeds the same
    * partial-agg pipeline). Null grouping keys are the subtotal markers. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("user_bucket", (col("user_id") % 3).cast("int"))
      .rollup(col("event_type"), col("user_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("float").as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("user_bucket").asc_nulls_first)

  /** Pivot — event counts per hour-of-day pivoted to one column per event
    * type. Explicit pivot values keep the plan single-pass (no distinct
    * pre-scan); equivalent to per-type conditional aggregation, which is
    * exactly the oracle's formulation. */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(hour(col("ts")).as("hour"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("hour"))

  /** Typed UDAF: weighted average of `value` weighted by the props payload
    * `k`, per event type ([[graft.functions.WeightedAvg]] Aggregator). */
  def udafWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val wavg = org.apache.spark.sql.functions.udaf(graft.functions.WeightedAvg)
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(wavg(col("value"), col("k")).cast("float").as("weighted_avg_value"))
      .orderBy(col("event_type"))
  }

  /** The SQL entry point: a TPC-H-Q5-shaped multi-join aggregation
    * registered and run as pure SQL (temp views + spark.sql) — Catalyst
    * join reordering, broadcast selection, and partial aggregation all
    * apply to SQL text exactly as to the DataFrame API. */
  def sqlRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => table(spark, dir, t).createOrReplaceTempView(s"v_$t"))
    spark.sql(
      """SELECT n_name,
        |  CAST(sum(l_extendedprice * (1.0 - l_discount)) AS FLOAT) AS revenue,
        |  count(*) AS n_items
        |FROM v_customer
        |JOIN v_orders   ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey
        |JOIN v_nation   ON s_nationkey = n_nationkey
        |JOIN v_region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  // ---- §2.7 endpoint skeletons --------------------------------------------

  /** Q2 skeleton: sensitivity analysis (api/api.py:108-223) without the
    * model — base row × UNNEST(variation_values), the varied feature
    * overridden per clone, a deterministic linear score standing in for the
    * RF transform. Cross join of 1×N literals: constant-folded, no shuffle. */
  def q2SensitivitySkeleton(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Seq((1200.5f, 17.0f, 2.5f)).toDF("distance", "temp", "wind")
    base
      .withColumn("varied_value",
        explode(array(Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f).map(lit): _*)))
      .withColumn("distance_varied", col("varied_value"))
      .select(col("varied_value"),
        (col("distance_varied").cast("double") * lit(0.02)
          + col("temp").cast("double") * lit(0.5)
          + col("wind").cast("double") * lit(1.5)).as("score"))
      .orderBy(col("varied_value"))
  }
}
