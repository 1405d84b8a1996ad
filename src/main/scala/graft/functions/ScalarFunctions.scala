package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas.{events, table}

/** Scalar-function surface (SURVEY §2.5 / §2.8): string, date, math, and
  * array functions as oracle-backed queries. The reference's own scalar
  * surface is tiny (F1 cast-with-default, F2 JSON encode/decode — both in
  * [[graft.query.Relational]]); these queries document the engine's full
  * built-in function coverage, chosen to be bit-reproducible across
  * Spark and DuckDB (no functions with engine-specific rounding, e.g. ln on
  * arbitrary doubles is avoided in favor of sqrt/power which are IEEE-exact).
  */
object ScalarFunctions {

  /** String functions over documents: case, substring, trim-shaped ops,
    * length, concat, replace, split-count. All codegen'd built-ins — no
    * UDFs in the hot path. */
  def fStringFns(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        upper(col("lang")).as("lang_upper"),
        substring(col("text"), 1, 20).as("text_head"),
        length(col("text")).as("text_len"),
        concat(col("source"), lit(":"), col("lang")).as("source_lang"),
        regexp_replace(col("text"), "\\s+", " ").as("text_norm_head"),
        size(split(col("text"), " ")).as("n_tokens_space"))
      .orderBy(col("doc_id"))

  /** Date/time functions over orders: year/month/day extraction, month
    * truncation, day-of-week (normalized to DuckDB's 0=Sunday convention:
    * Spark dayofweek is 1=Sunday). */
  def fDateFns(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        (dayofweek(col("o_orderdate")) - lit(1)).as("order_dow"),
        trunc(col("o_orderdate"), "month").as("order_month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
          .as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  /** Math functions over lineitem: abs/ceil/floor/sqrt/power/greatest/least
    * — the IEEE-exact subset (identical bit patterns in any engine). */
  def fMathFns(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - lit(25.0)).as("qty_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_discount"), lit(2)).as("disc_sq"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Advanced string functions: pad, reverse, find, translate, split_part,
    * repeat — each with identical semantics in DuckDB (verified; initcap is
    * deliberately absent, DuckDB lacks it). */
  def fStringAdvanced(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "-").as("brand_rpad"),
        reverse(col("p_name")).as("name_rev"),
        instr(col("p_type"), "a").as("type_a_pos"),
        translate(col("p_brand"), "B#", "b_").as("brand_translated"),
        substring_index(col("p_type"), " ", 1).as("type_first_word"),
        repeat(col("p_brand"), 2).as("brand_twice"))
      .orderBy(col("p_partkey"))

  /** Regex family: capture-group extraction, match filtering, and
    * occurrence counting — identical RE2-compatible patterns on both
    * engines. */
  def fRegexFns(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("props").rlike("\"k\": \\d+"))
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k_extracted"),
        regexp_count(col("event_type"), lit("[aeiou]")).as("n_vowels"),
        col("event_type").rlike("^(error|view)$").as("is_err_or_view"))
      .orderBy(col("event_id"))

  /** Null semantics: nullif, null-default, null-safe equality (Spark `<=>`
    * ≡ SQL IS NOT DISTINCT FROM), and three-valued-logic-safe counting. */
  def fNullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val v = when(col("value") < 1.0, lit(null)).otherwise(col("value"))
    events(spark, dir)
      .select(col("event_id"),
        nullif(col("event_type"), lit("error")).as("type_or_null"),
        coalesce(v, lit(-1.0)).as("value_defaulted"),
        (v <=> lit(null)).as("value_is_null"),
        v.isNotNull.as("value_present"))
      .orderBy(col("event_id"))
  }

  /** Date arithmetic: day offsets, month addition, last-day-of-month —
    * calendar-aware operations beyond the extraction family. */
  def fDateArith(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        add_months(col("o_orderdate").cast("date"), 1).as("plus_1m"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy(col("o_orderkey"))

  /** Array (higher-order) functions over embeddings: size, 1-based
    * element_at, and an `aggregate` fold computing the L2 norm — the same
    * fold the similarity operators build on. The fold accumulates in double
    * (left-to-right, matching DuckDB's list_sum order) so results are
    * bit-identical. */
  def fArrayFns(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_component"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("l2_norm"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        exists(col("embedding"), x => x > lit(0.3f)).as("has_large"),
        element_at(array_sort(col("embedding")), 1).as("min_component"),
        element_at(array_sort(col("embedding")), -1).as("max_component"))
      .orderBy(col("vec_id"))

  /** Advanced array functions over embeddings' label-derived int arrays:
    * except/position/remove/overlap/flatten/repeat — the set-algebra and
    * shape tier above f_array_fns. Arrays are projected to scalars before
    * output (counts/positions) for clean parquet↔DuckDB comparison. */
  def fArrayAdvanced(spark: SparkSession, dir: String): DataFrame = {
    val a = sequence(lit(1), (col("vec_id") % 5 + 3).cast("int"))
    val b = sequence(lit(2), (col("vec_id") % 7 + 2).cast("int"))
    table(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(array_except(a, b)).as("n_except"),
        array_position(a, 3).cast("int").as("pos_of_3"),
        size(array_remove(a, 2)).as("n_removed"),
        arrays_overlap(a, b).as("overlaps"),
        size(flatten(array(a, b))).as("n_flat"),
        size(array_repeat(col("vec_id"), 3)).as("n_repeat"),
        size(array_distinct(concat(a, b))).as("n_union_distinct"))
      .orderBy(col("vec_id"))
  }

  /** Timestamp/date extras over orders: quarter, day-of-year, last day of
    * month, fixed-day arithmetic, epoch round-trip, make_date — the
    * calendar tier above f_date_fns, restricted to integer-exact
    * operations (no months_between float semantics). */
  def fTsFns(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).as("order_quarter"),
        dayofyear(col("o_orderdate")).as("order_doy"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        date_sub(col("o_orderdate").cast("date"), 7).as("minus_7d"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          lit(1)).as("month_start"))
      .orderBy(col("o_orderkey"))

  /** Bit-manipulation scalars: shifts, masks, xor, bit_count, two's-
    * complement negation — exact integer ops in any engine. */
  def fBitFns(spark: SparkSession, dir: String): DataFrame =
    graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"),
        shiftleft(col("user_id"), 3).as("uid_shl3"),
        shiftright(col("event_id"), 2).as("eid_shr2"),
        col("user_id").bitwiseAND(lit(0xFFL)).as("uid_low8"),
        col("user_id").bitwiseOR(lit(0x100L)).as("uid_or"),
        col("user_id").bitwiseXOR(col("event_id")).as("uid_xor_eid"),
        bit_count(col("user_id")).as("uid_bits"))
      .orderBy(col("event_id"))

  /** URL parsing (parse_url HOST/PATH/QUERY) over deterministic synthetic
    * URLs built from table columns. The oracle replicates the extraction
    * with anchored regexes — exact for these well-formed URLs. */
  def fUrlFns(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://ex"), col("doc_id").cast("string"),
      lit(".org/p/"), col("lang"), lit("?q="), col("source"))
    table(spark, dir, "documents")
      .select(col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"))
      .orderBy(col("doc_id"))
  }

  /** ANSI-safe try_* arithmetic: Spark 4 runs ANSI mode (overflow and
    * division-by-zero THROW), so the engine's null-on-error tier is the
    * try_ family — the cross-engine equivalent of dividing by
    * nullif(x, 0). k comes from the props JSON and is frequently 0. */
  def fTryArith(spark: SparkSession, dir: String): DataFrame =
    graft.schema.Schemas.events(spark, dir)
      .withColumn("k",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .select(col("event_id"),
        try_divide(col("value"), col("k")).as("value_per_k"),
        try_divide(lit(1.0), col("value") - col("value")).as("div_zero_null"),
        try_add(col("event_id"), lit(1L)).as("id_plus_1"),
        try_multiply(col("k"), col("k")).as("k_sq"))
      .orderBy(col("event_id"))
}
