package graft.ml

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

/** S13: the versioned model store (reference spark_models/ dir +
  * api/api.py:24-37 eager load). Adds an in-process cache so serving-style
  * queries (Q1–Q3) amortize one training/deserialization across requests —
  * the reference's own deliberate optimization (eager startup load).
  */
object ModelStore {

  private val cache = new ConcurrentHashMap[String, PipelineModel]()

  /** Get the growing-window model for (test dir, version), training on
    * first use. Thread-safe; one fit per key per JVM. */
  def forDir(spark: SparkSession, dir: String, version: Int): PipelineModel =
    cache.computeIfAbsent(s"$dir#$version", { _ =>
      val raw = Trainer.tripFrameFromEvents(spark, dir)
      Trainer.fitVersion(raw, version, orderCol = "event_id")
    })

  /** Persist a model (same on-disk format PySpark reads/writes). */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a persisted model. */
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
