package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Canonical schemas for the engine.
  *
  * The trip schema reproduces the reference's single logical dataset: 25
  * numeric (float) columns (reference: producer/producer.py:39-42 =
  * spark_trainer/spark_trainer.py:34-37), of which 19 are model features
  * (spark_trainer/spark_trainer.py:26-30, api/api.py:41-45) and `Duration`
  * is the label.
  *
  * All fields are nullable FloatType end-to-end, matching the reference's
  * API StructType (api/api.py:46-47).
  */
object Schemas {

  val label = "Duration"

  /** 19 model-input features, in assembler order (reference feature_cols). */
  val featureCols: Seq[String] = Seq(
    "Distance", "PLong", "PLatd", "DLong", "DLatd", "Haversine",
    "Pmonth", "Pday", "Phour", "Pmin", "PDweek",
    "Temp", "Precip", "Wind", "Humid", "Solar", "Snow", "GroundTemp", "Dust")

  /** Drop-off-time columns: present in the stream, dropped before training
    * (reference spark_trainer/spark_trainer.py:29 drop list). */
  val dropoffCols: Seq[String] = Seq("Dmonth", "Dday", "Dhour", "Dmin", "DDweek")

  /** All 25 numeric columns of the trip stream, producer declaration order. */
  val numericCols: Seq[String] =
    Seq(label, "Distance", "PLong", "PLatd", "DLong", "DLatd", "Haversine",
      "Pmonth", "Pday", "Phour", "Pmin", "PDweek") ++ dropoffCols ++
      Seq("Temp", "Precip", "Wind", "Humid", "Solar", "Snow", "GroundTemp", "Dust")

  /** Full 25-column trip schema (all nullable float). */
  val trip25: StructType =
    StructType(numericCols.map(c => StructField(c, FloatType, nullable = true)))

  /** 19-column feature schema — the scoring-request shape (api/api.py:46-47). */
  val feature19: StructType =
    StructType(featureCols.map(c => StructField(c, FloatType, nullable = true)))

  /** feature19 + label — the training-projection shape. */
  val training20: StructType =
    StructType(feature19.fields :+ StructField(label, FloatType, nullable = true))

  // ---- test-table access -------------------------------------------------

  /** Read one driver-provided test table from an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` normalized to a true TimestampType.
    *
    * The parquet stores TIMESTAMP(NANOS), which Spark surfaces as LongType
    * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong`. Integer
    * division (DIV) truncates to micros — a double-precision path would
    * corrupt 2024-era epoch-nanos (1.7e18 > 2^53).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP)"))
      case _ => df
    }
  }
}
