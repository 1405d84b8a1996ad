package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{Imputer, VectorAssembler}
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** The reference's ML core (spark_trainer/spark_trainer.py) in Scala Spark:
  * T1–T4 preparation, A1 Imputer(mean), M1 VectorAssembler(skip),
  * M2 RandomForestRegressor(seed=42, stock numTrees=20/maxDepth=5),
  * M3 Pipeline, M5 feature importances, M6 growing-window versioning.
  *
  * These are the same JVM estimators PySpark calls through Py4J, so
  * training is bit-compatible with the reference given identical input —
  * with the Py4J boundary gone.
  */
object Trainer {

  /** Training cap mirroring the reference's MAX_ROWS_TO_SEND=30005 replay
    * cap × BATCH_SIZE=10000 × 3 batches (docker-compose.yml:45,58-60): a
    * model version v trains on the first v·10000 stream rows. */
  val BatchSize = 10000
  val MaxVersions = 3

  /** T1–T4: prepare a raw (string-ish) frame for training — bulk-cast the
    * 25 numeric columns in ONE select (not the reference's 25 stacked
    * withColumns), drop null labels, project features+label with the
    * defensive schema intersect (spark_trainer.py:34-62). */
  def prepare(df: DataFrame): DataFrame = {
    val present = Schemas.numericCols.filter(df.columns.contains)
    // try_cast: the reference's PySpark cast is non-ANSI (invalid → null,
    // spark_trainer.py:48-50); Spark 4's ANSI-mode cast would throw
    val cast = df.select(present.map(c =>
      col(c).try_cast(org.apache.spark.sql.types.FloatType).as(c)): _*)
    val featurePresent = Schemas.featureCols.filter(cast.columns.contains)
    cast.na.drop(Seq(Schemas.label))
      .select((featurePresent :+ Schemas.label).map(col): _*)
  }

  /** M3 pipeline: Imputer(mean) over the feature columns → *_imputed,
    * VectorAssembler(handleInvalid=skip) → features, RF(seed=42)
    * (spark_trainer.py:67-79). */
  def pipeline(featureCols: Seq[String] = Schemas.featureCols): Pipeline = {
    val imputed = featureCols.map(_ + "_imputed")
    val imputer = new Imputer()
      .setStrategy("mean")
      .setInputCols(featureCols.toArray)
      .setOutputCols(imputed.toArray)
    val assembler = new VectorAssembler()
      .setInputCols(imputed.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features")
      .setLabelCol(Schemas.label)
      .setSeed(42)
    new Pipeline().setStages(Array(imputer, assembler, rf))
  }

  /** Fit on a prepared frame. The feature set is whatever [[prepare]] kept
    * (the T4 defensive intersect): a frame carrying fewer than the 19
    * canonical features trains on what it has, as the reference does when
    * columns are missing (spark_trainer.py:56-60 warning path). */
  def fit(prepared: DataFrame): PipelineModel =
    pipeline(prepared.columns.filter(_ != Schemas.label).toSeq).fit(prepared)

  /** M6: growing-window versions — version v trains on the first
    * v·batchSize rows of the stream (spark_trainer.py:107-109:
    * v1=batch_0, v2=batch_0..1, v3=batch_0..2). `batchSize` defaults to
    * the reference's 10 000 and is injectable so small fixtures genuinely
    * exercise the window growth (v1 ⊊ v2 ⊊ v3). */
  def fitVersion(raw: DataFrame, version: Int, orderCol: String,
      batchSize: Int = BatchSize): PipelineModel = {
    require(version >= 1 && version <= MaxVersions, s"version $version")
    val window = raw.orderBy(col(orderCol)).limit(version * batchSize)
    // Materialize the prepared window before fitting. Two reasons, both
    // measured: (1) Pipeline.fit walks the input several times (Imputer
    // mean pass, transform, RF's instance conversion) — uncached, every
    // walk re-runs the upstream scan + JSON feature parse + global
    // top-N; (2) orderBy().limit() emits a SINGLE partition, so the RF
    // fit's per-iteration treeAggregate would run on one core.
    // Re-spread over a FIXED handful of partitions sized to the window
    // (task overhead swamps 30k-row stats aggregation beyond that).
    // Constant, not cores-derived: RF bagging is seeded per partition
    // index, so the partition count is part of the model's determinism
    // contract across environments.
    val prep = prepare(window).repartition(4).persist()
    prep.count()
    try fit(prep) finally { prep.unpersist(false); () }
  }

  /** The v-th training window itself (what [[fitVersion]] trains on), for
    * specs asserting the strict v1 ⊊ v2 ⊊ v3 row growth. */
  def versionWindow(raw: DataFrame, version: Int, orderCol: String,
      batchSize: Int = BatchSize): DataFrame =
    prepare(raw.orderBy(col(orderCol)).limit(version * batchSize))

  /** Per-feature importances in ASSEMBLER column order (the vector's
    * native order, spark_trainer.py:92-94 before its sort). */
  def importancesInAssemblerOrder(model: PipelineModel): Seq[(String, Double)] = {
    val rf = model.stages.last.asInstanceOf[RandomForestRegressionModel]
    val assembler = model.stages(1).asInstanceOf[VectorAssembler]
    val names = assembler.getInputCols.map(_.stripSuffix("_imputed"))
    names.zip(rf.featureImportances.toArray).toSeq
  }

  /** M5+O1: per-feature importances of the RF stage, descending — the
    * JSON artifact's content (spark_trainer.py:87-99). */
  def featureImportances(model: PipelineModel): Seq[(String, Double)] =
    importancesInAssemblerOrder(model)
      .sortBy { case (n, v) => (-v, n) }

  /** The stream-shaped test table as a trip-shaped training frame: a
    * deterministic feature derivation from `events` (value → Duration-like
    * label with genuine signal in the derived Distance; calendar features
    * from ts; weather-like features from the props payload). This stands in
    * for the Seoul-bike CSV, which is not in the test environment. */
  def tripFrameFromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Schemas.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("float"))
    ev.select(
      col("event_id"),
      col("value").cast("float").as(Schemas.label),
      (col("value") * 10.0 + col("user_id")).cast("float").as("Distance"),
      (lit(126.9) + col("user_id") * 0.01).cast("float").as("PLong"),
      (lit(37.5) + col("user_id") * 0.005).cast("float").as("PLatd"),
      (lit(127.0) + col("k") * 0.001).cast("float").as("DLong"),
      (lit(37.6) + col("k") * 0.0005).cast("float").as("DLatd"),
      (col("value") * 9.0).cast("float").as("Haversine"),
      month(col("ts")).cast("float").as("Pmonth"),
      dayofmonth(col("ts")).cast("float").as("Pday"),
      hour(col("ts")).cast("float").as("Phour"),
      minute(col("ts")).cast("float").as("Pmin"),
      (dayofweek(col("ts")) - 1).cast("float").as("PDweek"),
      (pmod(col("k"), lit(40.0f)) - 5.0f).cast("float").as("Temp"),
      pmod(col("k"), lit(3.0f)).cast("float").as("Precip"),
      (pmod(col("k"), lit(10.0f)) / 2.0f).cast("float").as("Wind"),
      pmod(col("k"), lit(100.0f)).cast("float").as("Humid"),
      pmod(col("k"), lit(5.0f)).cast("float").as("Solar"),
      lit(0.0f).as("Snow"),
      (pmod(col("k"), lit(40.0f)) - 7.0f).cast("float").as("GroundTemp"),
      pmod(col("k"), lit(50.0f)).cast("float").as("Dust"))
  }
}
