package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas.{events, table}

/** SURVEY.md §2 operator inventory re-expressed as declarative DataFrame
  * programs over the driver's test tables. Every query here is paired with
  * an ANSI-SQL oracle in [[graft.SparkEntry.oracleSql]] and hash-compared
  * by the driver against DuckDB at sf0.01.
  *
  * Scale notes (100 TB rule): every query is a pure Catalyst plan — filters
  * and projections push to the parquet scan, aggregations are partial
  * (map-side combine) before the shuffle, sorts are only on already-reduced
  * outputs, and nothing materializes on the driver.
  */
object Relational {

  /** Flagship aggregation (TPC-H Q1 shape) — pricing summary by flag/status.
    * GroupBy keys are low-cardinality: partial aggregation collapses each
    * input partition to ~6 rows before the exchange, so the shuffle is O(1)
    * regardless of input size. (Reference analog: the trainer's only
    * aggregate is Imputer's per-column mean, spark_trainer.py:70 — this is
    * its group-by generalization.)
    */
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
    */
  def q3OptimalTime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(hour(col("ts")).as("hour"))
      .agg(avg(col("value")).as("score"), count(lit(1)).as("n_events"))
      .filter(col("score").between(lit(45.0), lit(52.0)))
      .orderBy(col("score"), col("hour"))
}
