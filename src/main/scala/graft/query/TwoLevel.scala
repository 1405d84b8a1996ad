package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level (bucketed) global ranking — the house pattern behind
  * s9_batch_assign / winsorized_stats / curriculum_phases, packaged so
  * new operators stop hand-rolling it: a global `row_number()` over an
  * unbounded relation must never run as one unpartitioned window (Spark
  * moves the whole input to a single partition). Instead rows bucket by
  * a value-range key that is MONOTONE in the sort order, a per-bucket
  * count histogram prefix-sums into rank offsets (the only
  * unpartitioned window runs over the histogram — bounded by the value
  * range / bucket width, not the row count), offsets broadcast back,
  * and the within-bucket `row_number()` windows run in parallel.
  *
  * Requirements: `bucket` must be a deterministic function of the FIRST
  * sort key such that sorting by (`bucket` in `bucketDesc` direction,
  * then `order`) equals sorting by `order` alone — i.e. rows that
  * compare adjacent across a bucket boundary must land in order-adjacent
  * buckets, and ties of the first key must share a bucket (same value ⇒
  * same bucket makes this automatic for `floor(key / width)`). The
  * [[graft.WindowGateSpec]] plan gate fails any query that reintroduces
  * an unpartitioned window over unreduced input.
  */
object TwoLevel {

  /** Append column `out` = 1-based global row_number over `order`.
    * `bucket`: the value-range bucket expression (e.g.
    * `floor(col("key") / lit(4096L))`); `bucketDesc`: true when `order`
    * leads with a descending key so buckets prefix-sum in descending
    * bucket order. Internal columns are dropped before returning. */
  def rowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      bucketDesc: Boolean, out: String): DataFrame = {
    val b = df.withColumn("__tl_bkt", bucket)
    val bOrd = if (bucketDesc) col("__tl_bkt").desc else col("__tl_bkt").asc
    val offs = b.groupBy(col("__tl_bkt"))
      .agg(count(lit(1)).as("__tl_bn"))
      .select(col("__tl_bkt"),
        coalesce(sum(col("__tl_bn")).over(Window.orderBy(bOrd)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__tl_off"))
    b.join(broadcast(offs), Seq("__tl_bkt"))
      .withColumn(out, col("__tl_off") + row_number().over(
        Window.partitionBy(col("__tl_bkt")).orderBy(order: _*)))
      .drop("__tl_bkt", "__tl_off")
  }

  /** `ntile(buckets)` bucket id from a 1-based global rank `r` over `n`
    * total rows — the exact Spark/DuckDB NTILE fill rule (the first
    * n mod b buckets take one extra row), as PURE INTEGER arithmetic
    * (`div`, never `/` — Column `/` promotes to double division, whose
    * correctly-rounded quotient can land exactly ON the next integer
    * when the true quotient is within an ulp below it, flipping a
    * bucket boundary past ~2²⁶ rows per bucket) so an ntile window over
    * an unbounded relation can ride [[rowNumber]] instead. Emits INT
    * like the native ntile. */
  def ntileFromRank(r: Column, n: Column, buckets: Int): Column = {
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val bk = lit(buckets.toLong)
    val size = idiv(n, bk)
    val rem = n % bk
    val cut = (size + lit(1L)) * rem
    when(r <= cut, idiv(r - 1, size + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(r - cut - 1, size) + lit(1L))
      .cast("int")
  }
}
