package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.{Batcher, FileJsonTransport, Replay}
import graft.ml.Trainer
import graft.schema.Schemas

/** SURVEY §5.2 "pipeline integration test": the reference's whole lifecycle
  * end-to-end at its real operating points — 30 005-row CSV replay (S1-S5)
  * → JSON transport (S4/S6/S7) → streaming count-batcher at
  * BATCH_SIZE=10 000 / NUM_BATCHES=3 (S9/S10) → growing-window training
  * v1⊂v2⊂v3 (M6) → scoring (M4) — asserting the compose-sentinel
  * invariants (FIXTURES §1.4/§1.5): 3 full batches, ~5-row remainder
  * discarded, 3 models, importances sum ≈ 1 sorted desc.
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("30005-row replay -> 3x10000 batches + discarded remainder -> v1/v2/v3 models -> scoring") {
    val tmp = Files.createTempDirectory("pipeline").toString

    // --- produce a 30 005-row trip CSV (deterministic trip-shaped rows) ---
    val nRows = 30005
    val csv = new StringBuilder("Duration,Distance,Temp,Phour\n")
    var i = 0
    while (i < nRows) {
      // a few malformed/empty numerics, as the real feed has
      val dur = if (i % 5000 == 4999) "" else ((i % 120) + 1).toString
      val dist = if (i % 7000 == 6999) "oops" else ((i % 900) * 10).toString
      csv.append(s"$dur,$dist,${15 + (i % 20)},${i % 24}\n")
      i += 1
    }
    Files.writeString(java.nio.file.Paths.get(tmp, "trips.csv"), csv.toString)

    // --- S1-S5: replay with cap + coercion ---
    val replayed = Replay.replay(spark, s"$tmp/trips.csv",
      Seq("Duration", "Distance", "Temp", "Phour"),
      Seq("Duration", "Distance", "Temp", "Phour"), maxRows = nRows)
    assert(replayed.count() == nRows)

    // --- S4: publish through the transport (JSON values) ---
    val transport = new FileJsonTransport(s"$tmp/topic")
    transport.publish(replayed)

    // --- S6-S10: streaming count-batcher at reference operating points ---
    val res = Batcher.streamBatches(spark, transport,
      org.apache.spark.sql.types.StructType.fromDDL(
        "Duration FLOAT, Distance FLOAT, Temp FLOAT, Phour FLOAT"),
      stagingDir = s"$tmp/staging", outDir = s"$tmp/batches",
      batchSize = 10000, maxBatches = 3, checkpointDir = s"$tmp/ckpt")
    assert(res.nBatches == 3)
    assert(res.remainderRows == 5) // 30005 - 3*10000, discarded past the cap
    val sizes = res.batches.groupBy("batch_id").count()
      .orderBy("batch_id").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((0, 10000L), (1, 10000L), (2, 10000L)))

    // --- S10 CSV parity: reference-shaped batch_<k>.csv files ---
    val csvIds = Batcher.writeCsvBatches(spark, res.batches, s"$tmp/csv_batches")
    assert(csvIds == Seq(0, 1, 2))
    val csvFiles = new java.io.File(s"$tmp/csv_batches").listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.getName).sorted.toSeq
    assert(csvFiles == Seq("batch_0.csv", "batch_1.csv", "batch_2.csv"),
      s"reference file naming broke: $csvFiles")
    csvIds.foreach { b =>
      val lines = scala.io.Source.fromFile(
        s"$tmp/csv_batches/batch_$b.csv").getLines().toSeq
      // header first, producer column order (consumer.py DictWriter)
      assert(lines.head == "Duration,Distance,Temp,Phour",
        s"batch $b header/column-order: ${lines.head}")
      assert(lines.length == 10001, s"batch $b rows: ${lines.length - 1}")
    }
    // seq order within the file: batch 0 starts at the stream's first row
    val firstCsvRow = scala.io.Source.fromFile(
      s"$tmp/csv_batches/batch_0.csv").getLines().drop(1).next()
    val firstStreamRow = res.batches.filter(col("batch_id") === 0)
      .orderBy("seq").select("Duration", "Distance", "Temp", "Phour")
      .head()
    assert(firstCsvRow == (0 until 4).map(firstStreamRow.getFloat)
      .mkString(","), s"batch 0 first row drifted: $firstCsvRow")

    // --- M6: growing-window training on batch prefixes ---
    val batches = res.batches
    val models = (1 to 3).map { v =>
      val window = batches.filter(col("batch_id") < v)
        .drop("batch_id", "seq")
      assert(window.count() == v * 10000L)
      Trainer.fit(Trainer.prepare(window))
    }

    // --- M5: importances invariants per FIXTURES §1.5 ---
    models.foreach { m =>
      val imp = Trainer.featureImportances(m)
      assert(imp.map(_._1).toSet == Set("Distance", "Temp", "Phour"))
      assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
      assert(imp.map(_._2).sameElements(imp.map(_._2).sortBy(-(_: Double))))
    }

    // --- M4/Q1: score one validated request row with each version ---
    val req = Seq((3.5f, 28.5f, 14.0f)).toDF("Distance", "Temp", "Phour")
    val preds = models.map(_.transform(req).select("prediction").head().getDouble(0))
    preds.foreach(p => assert(!p.isNaN && !p.isInfinite))
    // growing windows see the same generator distribution: predictions are
    // finite and in the label range
    preds.foreach(p => assert(p >= 0.0 && p <= 121.0))
  }
}
