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

  /** Count of actual fits (not disk loads) — lets specs prove the
    * persisted path short-circuits retraining. */
  private[graft] val trains = new java.util.concurrent.atomic.AtomicInteger

  /** On-disk home for (dir, version): the reference's
    * `spark_models/model_<v>_rf` layout under a tmp root, keyed by the
    * events-table CONTENT fingerprint so a regenerated corpus never
    * serves a stale persisted model. */
  private[graft] def persistedPath(dir: String, version: Int): String = {
    val fp = graft.schema.Schemas.fingerprint(s"$dir/events.parquet")
    val key = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$dir#$fp"))
    s"${sys.props("java.io.tmpdir")}/graft_spark_models/$key/model_${version}_rf"
  }

  /** Get the growing-window model for (test dir, version) FROM THE DISK
    * BOUNDARY: first use trains and persists (reference
    * spark_trainer.py's save), but the instance handed to every caller
    * — including the Q1–Q3 serving path — is `PipelineModel.load` of
    * the persisted form, exactly the startup-load contract of
    * api/api.py:24-37. A warm persisted store (marker present) skips
    * training entirely, like an API restart against existing
    * spark_models/. Thread-safe; one fit OR load per key per JVM. */
  def forDir(spark: SparkSession, dir: String, version: Int): PipelineModel =
    cache.computeIfAbsent(s"$dir#$version", { _ =>
      val path = persistedPath(dir, version)
      val marker = new java.io.File(path, "_graft_complete")
      if (!marker.exists()) {
        val raw = Trainer.tripFrameFromEvents(spark, dir)
        val m = Trainer.fitVersion(raw, version, orderCol = "event_id")
        trains.incrementAndGet()
        save(m, path)
        marker.createNewFile()
      }
      load(path)
    })

  /** Persist a model (same on-disk format PySpark reads/writes). */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a persisted model. */
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
