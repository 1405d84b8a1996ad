package graft.query

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.{ModelStore, Trainer}
import graft.schema.Schemas

/** Q1–Q3: the reference API's three model-backed query programs
  * (api/api.py:77-313) as DataFrame dataflows. Models come from
  * [[ModelStore]] (growing-window versions trained on the events-derived
  * trip frame); outputs are scalar-only projections (no VectorUDT), so
  * Verify can dump them as parquet. These queries have no SQL oracle —
  * scoring is the RF transform — and are covered by determinism and
  * invariant specs instead (SURVEY §5.2).
  *
  * Order safety: the reference re-associates predictions with inputs
  * positionally (api/api.py:162-210); the engine carries an explicit id
  * column through the scoring plan instead — same results, no order hazard
  * at any partitioning (SURVEY §3.3 note).
  */
object Endpoints {

  /** The canonical request payload (reference README.md:18-39) — the
    * golden fixture every endpoint replays. */
  val canonicalFeatures: Map[String, Float] = Map(
    "Distance" -> 3.5f, "PLong" -> 126.9876f, "PLatd" -> 37.5456f,
    "DLong" -> 127.0123f, "DLatd" -> 37.5789f, "Haversine" -> 4.2f,
    "Pmonth" -> 7f, "Pday" -> 15f, "Phour" -> 14f, "Pmin" -> 30f,
    "PDweek" -> 3f, "Temp" -> 28.5f, "Precip" -> 0.0f, "Wind" -> 2.1f,
    "Humid" -> 65.3f, "Solar" -> 0.85f, "Snow" -> 0.0f,
    "GroundTemp" -> 31.2f, "Dust" -> 45.6f)

  /** S12: one validated request row (T5 semantics: missing → 0.0f). */
  private def requestDf(spark: SparkSession, features: Map[String, Float],
      extra: Map[String, Float] = Map.empty): DataFrame = {
    val all = features ++ extra
    val row = Row.fromSeq(Schemas.featureCols.map(c => all.getOrElse(c, 0.0f)))
    spark.createDataFrame(
      java.util.Collections.singletonList(row), Schemas.feature19)
  }

  /** Q1: predict duration (api/api.py:77-104) — validate → 1-row frame →
    * pipeline transform → scalar prediction. `features` defaults to the
    * canonical README payload; the HTTP shell
    * ([[graft.serve.ApiServer]]) passes request payloads through. */
  def q1Predict(spark: SparkSession, dir: String, version: Int = 3,
      features: Map[String, Float] = canonicalFeatures): DataFrame = {
    val model = ModelStore.forDir(spark, dir, version)
    model.transform(requestDf(spark, features))
      .select(lit(version).as("model_version"),
        col("prediction").as("predicted_duration"))
  }

  /** Q2: sensitivity analysis (api/api.py:108-223) — base row ×
    * UNNEST(variation_values), varied feature overridden per clone, one
    * batched transform (the reference's own deliberate optimization:
    * one Spark job, not N). */
  def q2Sensitivity(spark: SparkSession, dir: String, version: Int = 3,
      variableFeature: String = "Distance",
      variations: Seq[Float] = Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f),
      base: Map[String, Float] = canonicalFeatures): DataFrame = {
    require(Schemas.featureCols.contains(variableFeature),
      s"unknown feature $variableFeature")
    val model = ModelStore.forDir(spark, dir, version)
    val grid = requestDf(spark, base)
      .withColumn("varied_value", explode(array(variations.map(lit): _*)))
      .withColumn(variableFeature, col("varied_value"))
    model.transform(grid)
      .select(col("varied_value"), col("prediction"))
      .orderBy(col("varied_value"))
  }

  /** Q3: optimal-time suggestion (api/api.py:227-313) — candidate-hour grid
    * (T8) with domain filter (T9), Phour/Pmin substituted per candidate,
    * one batched transform, BETWEEN band (T6), best (lowest) first (O2). */
  def q3OptimalTime(spark: SparkSession, dir: String, version: Int = 3,
      hours: Seq[Int] = 7 to 18, minuteOfHour: Int = 30,
      minDuration: Double = 5.0, maxDuration: Double = 20.0,
      baseConditions: Map[String, Float] = canonicalFeatures): DataFrame = {
    val model = ModelStore.forDir(spark, dir, version)
    val valid = hours.filter(h => h >= 0 && h <= 23) // T9
    val base = baseConditions - "Phour" - "Pmin"
    val grid = requestDf(spark, base)
      .withColumn("hour", explode(array(valid.map(lit): _*)))
      .withColumn("Phour", col("hour").cast("float"))
      .withColumn("Pmin", lit(minuteOfHour.toFloat))
    model.transform(grid)
      .select(col("hour"), col("prediction"))
      .filter(col("prediction").between(minDuration, maxDuration)) // T6
      .orderBy(col("prediction"), col("hour"))                     // O2
  }

  /** M6+M5: growing-window training over the stream prefix — one row per
    * (version, feature) with its importance and rank; versions are nested
    * prefixes v1 ⊂ v2 ⊂ v3 (spark_trainer.py:107-109). */
  def m6GrowingWindowImportances(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // versions train concurrently: independent fits submit independent job
    // groups, and the scheduler interleaves their stages across cores (the
    // per-version fits underuse the cluster individually)
    val models = Await.result(
      Future.sequence((1 to Trainer.MaxVersions).map(v =>
        Future(v -> ModelStore.forDir(spark, dir, v)))), Duration.Inf)
    val rows = models.flatMap { case (v, model) =>
      Trainer.featureImportances(model).zipWithIndex.map {
        case ((feature, imp), i) => (v, feature, imp, i + 1)
      }
    }
    rows.toDF("model_version", "feature", "importance", "rank")
      .orderBy(col("model_version"), col("rank"), col("feature"))
  }
}
