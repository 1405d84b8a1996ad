package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1–S5: the producer leg (reference producer/producer.py) as declarative
  * Spark: header-CSV scan, row cap, type-coercing projection with
  * 0.0-default (F1), JSON publish.
  *
  * Scale: the coercion is a single Project over the scan (pushed column
  * pruning, one plan node for all 25 casts — not the reference's 25
  * stacked withColumns); the cap is a `limit`, which Spark executes
  * incrementally (no full scan when the limit is small).
  */
object Replay {

  /** F1 `to_float_or_zero`: cast with 0.0 default (producer.py:53-58,
    * api/api.py:59-65). `try_cast` (not `cast`) because Spark 4 runs ANSI
    * mode where failed string casts throw; the reference's semantics are
    * empty/invalid → 0.0. */
  def toFloatOrZero(c: Column): Column =
    coalesce(c.cast(StringType).try_cast(FloatType), lit(0.0f))

  /** Flag column marking values that fell back to the default — the
    * engine's order-safe replacement for the reference's driver-side
    * warning list (producer.py:57, api/api.py:57-59). */
  def coercionFailed(c: Column): Column =
    c.isNotNull && c.cast(StringType).try_cast(FloatType).isNull

  /** S1: header-CSV scan with explicit all-string schema (no inferSchema
    * second pass — spark_trainer.py:46's choice, kept deliberately). */
  def csvScan(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .csv(path)

  /** S3: type-coercing projection — the 25 declared numeric columns coerce
    * via [[toFloatOrZero]]; unknown columns pass through untouched
    * (producer.py:50-60). One select, not N withColumns. */
  def coerceNumeric(df: DataFrame, numericCols: Seq[String]): DataFrame = {
    val projected = df.columns.map { c =>
      if (numericCols.contains(c)) toFloatOrZero(col(c)).as(c) else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** S1+S2+S3 composed: scan, cap (MAX_ROWS_TO_SEND, producer.py:14), coerce. */
  def replay(spark: SparkSession, path: String, columns: Seq[String],
      numericCols: Seq[String], maxRows: Int): DataFrame =
    coerceNumeric(csvScan(spark, path, columns).limit(maxRows), numericCols)

  /** S4: publish as JSON values through a transport (producer.py:19-21,62). */
  def publish(df: DataFrame, transport: StreamTransport): Unit =
    transport.publish(df)
}
