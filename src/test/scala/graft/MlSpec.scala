package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ml.{ModelStore, Trainer}
import graft.query.Endpoints
import graft.schema.Schemas

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("prepare: bulk cast, label null-drop, 20-col projection") {
    val raw = Seq(
      ("10.5", "100.0", "zzz"), (null, "50.0", "yyy"), ("bad?", "25.0", "x"))
      .toDF("Duration", "Distance", "junk")
    val p = Trainer.prepare(raw)
    assert(p.columns.toSeq == Seq("Distance", "Duration"))
    // ANSI-mode cast of "bad?" would throw — prepare must be null-safe
    val rows = p.orderBy("Duration").collect()
    assert(rows.length == 1 || rows.length == 2)
  }

  test("pipeline fit is deterministic: seed-42 twice -> identical importances + predictions") {
    val raw = Trainer.tripFrameFromEvents(spark, sf)
    val m1 = Trainer.fitVersion(raw, 1, "event_id")
    val m2 = Trainer.fitVersion(raw, 1, "event_id")
    val imp1 = Trainer.featureImportances(m1)
    val imp2 = Trainer.featureImportances(m2)
    assert(imp1 == imp2)
    val req = Endpoints.q1Predict(spark, sf) // also exercises ModelStore
    val p1 = m1.transform(Trainer.prepare(raw).limit(50)).select("prediction")
      .as[Double].collect().toSeq
    val p2 = m2.transform(Trainer.prepare(raw).limit(50)).select("prediction")
      .as[Double].collect().toSeq
    assert(p1 == p2)
  }

  test("feature importances: 19 names, sum ~ 1.0, sorted desc") {
    val m = ModelStore.forDir(spark, sf, 1)
    val imp = Trainer.featureImportances(m)
    assert(imp.map(_._1).toSet == Schemas.featureCols.toSet)
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
    assert(imp.map(_._2).sameElements(imp.map(_._2).sortBy(-_)))
  }

  test("growing window: v1 subset of v2 training rows; importances query shape") {
    val df = Endpoints.m6GrowingWindowImportances(spark, sf)
    val rows = df.collect()
    assert(rows.length == 3 * 19)
    val versions = rows.map(_.getInt(0)).distinct.sorted
    assert(versions.toSeq == Seq(1, 2, 3))
    // per version, ranks are 1..19 and importances descend
    (1 to 3).foreach { v =>
      val sub = rows.filter(_.getInt(0) == v).sortBy(_.getInt(3))
      assert(sub.map(_.getInt(3)).toSeq == (1 to 19))
      val imps = sub.map(_.getDouble(2))
      assert(imps.sameElements(imps.sortBy(-(_: Double))))
    }
  }

  test("growing window, small batchSize: v1 ⊊ v2 ⊊ v3 rows; models differ") {
    // batchSize=300 on the 1000-row sf0.001 events table: unlike the
    // reference's 10 000 (≥ table size here), every version window is a
    // strictly larger prefix, so window growth is genuinely exercised
    val raw = Trainer.tripFrameFromEvents(spark, sf)
    val counts = (1 to 3).map(v =>
      Trainer.versionWindow(raw, v, "event_id", batchSize = 300).count())
    assert(counts(0) < counts(1) && counts(1) < counts(2))
    // strict prefix containment of the underlying stream windows
    val ids = (1 to 3).map(v =>
      raw.orderBy(col("event_id")).limit(v * 300)
        .select(col("event_id").cast("string")).as[String].collect().toSet)
    assert(ids(0).subsetOf(ids(1)) && ids(1).subsetOf(ids(2)))
    assert(ids(0).size < ids(1).size && ids(1).size < ids(2).size)
    // more training data changes the fitted forest
    val m1 = Trainer.fitVersion(raw, 1, "event_id", batchSize = 300)
    val m3 = Trainer.fitVersion(raw, 3, "event_id", batchSize = 300)
    assert(Trainer.featureImportances(m1) != Trainer.featureImportances(m3))
  }

  test("Q1 predict: one finite prediction for the canonical README payload") {
    val r = Endpoints.q1Predict(spark, sf).collect()
    assert(r.length == 1)
    val pred = r.head.getDouble(1)
    assert(!pred.isNaN && !pred.isInfinite)
    assert(r.head.getInt(0) == 3)
  }

  test("Q2 sensitivity: one prediction per variation, order-safe") {
    val r = Endpoints.q2Sensitivity(spark, sf).collect()
    assert(r.map(_.getFloat(0)).toSeq == Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f))
    r.foreach(row => assert(!row.getDouble(1).isNaN))
  }

  test("Q3 optimal time: in-domain hours, band respected, ascending") {
    val r = Endpoints.q3OptimalTime(spark, sf,
      minDuration = 0.0, maxDuration = 1e9).collect()
    assert(r.nonEmpty && r.length <= 12)
    r.foreach { row =>
      assert(row.getInt(0) >= 7 && row.getInt(0) <= 18)
    }
    val preds = r.map(_.getDouble(1))
    assert(preds.sameElements(preds.sorted))
    // out-of-domain hours are filtered (T9)
    val r2 = Endpoints.q3OptimalTime(spark, sf, hours = Seq(-1, 5, 30),
      minDuration = 0.0, maxDuration = 1e9).collect()
    assert(r2.map(_.getInt(0)).forall(_ == 5))
  }

  test("model store round-trip: save/load preserves predictions") {
    val dir = Files.createTempDirectory("model").toString
    val m = ModelStore.forDir(spark, sf, 1)
    ModelStore.save(m, s"$dir/m1")
    val loaded = ModelStore.load(s"$dir/m1")
    val probe = Trainer.prepare(Trainer.tripFrameFromEvents(spark, sf)).limit(20)
    val a = m.transform(probe).select("prediction").as[Double].collect().toSeq
    val b = loaded.transform(probe).select("prediction").as[Double].collect().toSeq
    assert(a == b)
  }
}
