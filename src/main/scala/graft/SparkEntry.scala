package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys follow SURVEY.md §2 operator IDs; each key present in
  * `oracleSql` is hash-compared against DuckDB by the driver at sf0.01.
  * Column names are aliased identically on both sides (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> Relational.q1Agg _,
    "q3_optimal_time" -> Relational.q3OptimalTime _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_optimal_time" ->
      """SELECT EXTRACT(hour FROM ts) AS hour,
        |  avg(value) AS score,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY 1
        |HAVING avg(value) BETWEEN 45.0 AND 52.0
        |ORDER BY score, hour""".stripMargin,
  )
}
