package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, StructField, StructType}
import graft.ingest.{FileJsonTransport, Replay}
import graft.ml.{ModelStore, Trainer}
import graft.schema.Schemas

/** Driver-round-15 pins: the S14 on-disk importances artifact (the
  * compose startup sentinel), the fingerprint-keyed model-store
  * eviction, and the SURVEY §1.2 schema-inference agreement test. */
class DriverRound15Spec extends SparkSpec {

  test("S14: training writes model_<v>_rf_feature_importances.json beside " +
      "the model dir — sorted desc, the 19 feature keys, sum ≈ 1 " +
      "(spark_trainer.py:87-99; docker-compose.yml:99 gates on it)") {
    ModelStore.clear()
    val modelPath = new java.io.File(ModelStore.persistedPath(sf, 1))
    val art = new java.io.File(ModelStore.importancesPath(sf, 1))
    // force a COLD store so THIS call performs the artifact write
    org.apache.commons.io.FileUtils.deleteQuietly(modelPath)
    org.apache.commons.io.FileUtils.deleteQuietly(art)
    val m = ModelStore.forDir(spark, sf, 1)
    assert(art.exists(), s"importances artifact missing at $art")
    assert(art.getName == "model_1_rf_feature_importances.json")
    // same directory as the model dir (the reference MODELS_DIR layout)
    assert(art.getParentFile.getCanonicalPath
      == modelPath.getParentFile.getCanonicalPath)
    val txt = Files.readString(art.toPath)
    val kv = """"([A-Za-z]+)"\s*:\s*([-+0-9.eE]+)""".r
      .findAllMatchIn(txt).map(g => g.group(1) -> g.group(2).toDouble).toSeq
    assert(kv.map(_._1).toSet == Schemas.featureCols.toSet,
      s"artifact keys ${kv.map(_._1)} != 19 feature cols")
    assert(kv.size == 19)
    val vals = kv.map(_._2)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b },
      s"artifact values not sorted descending: $vals")
    assert(math.abs(vals.sum - 1.0) < 1e-6, s"importances sum ${vals.sum}")
    // content parity with the in-memory M5 map (the oracle the specs pin)
    val mem = Trainer.featureImportances(m).toMap
    kv.foreach { case (n, v) =>
      assert(math.abs(mem(n) - v) < 1e-12, s"$n: artifact $v vs model ${mem(n)}")
    }
    // warm-store restart (the compose sentinel's premise): artifact still
    // present, no retrain, no rewrite needed
    ModelStore.clear()
    val t0 = ModelStore.trains.get()
    ModelStore.forDir(spark, sf, 1)
    assert(ModelStore.trains.get() == t0 && art.exists())
  }

  test("ModelStore evicts superseded fingerprint generations of the same " +
      "dataset dir (regenerated corpora must not accumulate stale model " +
      "trees in tmpdir)") {
    ModelStore.clear()
    val current = new java.io.File(ModelStore.modelsDir(sf))
    // a fake model tree from a superseded generation of the SAME dir
    val stale = new java.io.File(current.getParentFile,
      current.getName.split("__")(0) + "__0@0")
    stale.mkdirs()
    Files.writeString(new java.io.File(stale, "junk").toPath, "x")
    // and one from a DIFFERENT dataset dir — must survive
    val other = new java.io.File(current.getParentFile, "otherdir__1@1")
    other.mkdirs()
    // force a cold store so the eviction path runs
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ModelStore.persistedPath(sf, 1)))
    ModelStore.forDir(spark, sf, 1)
    assert(!stale.exists(), s"superseded generation $stale not evicted")
    assert(other.exists(), "eviction must not touch other datasets' models")
    org.apache.commons.io.FileUtils.deleteQuietly(other)
    (): Unit
  }

  test("freeCheckpoint releases localCheckpoint RDD blocks — plain " +
      "Dataset.unpersist is the documented no-op on them") {
    val sc = spark.sparkContext
    def live = sc.getPersistentRDDs.size
    val before = live
    val df = spark.range(1000).toDF("x").localCheckpoint(true)
    assert(live == before + 1, "localCheckpoint must register RDD blocks")
    df.unpersist(blocking = true)
    assert(live == before + 1,
      "Dataset.unpersist unexpectedly released checkpoint blocks — " +
        "freeCheckpoint may be removable")
    graft.query.TextAnalysis.freeCheckpoint(df)
    assert(live == before, "freeCheckpoint must release the blocks")
  }

  test("S8: schema inference over the replayed JSON stream agrees with the " +
      "declared trip StructType modulo the documented all-float coercion " +
      "(consumer.py:51-52 infers from the first message's keys)") {
    val tmp = Files.createTempDirectory("s8-infer").toString
    // a 25-numeric-column + 1 passthrough trip CSV, fully populated
    val cols = Schemas.numericCols :+ "Note"
    val sb = new StringBuilder(cols.mkString(",") + "\n")
    (0 until 50).foreach { i =>
      sb.append(Schemas.numericCols.indices
        .map(j => ((i * 7 + j) % 100).toString).mkString(","))
      sb.append(s",note$i\n")
    }
    Files.writeString(java.nio.file.Paths.get(tmp, "trips.csv"), sb.toString)
    val replayed = Replay.replay(spark, s"$tmp/trips.csv", cols,
      Schemas.numericCols, maxRows = 50)
    val transport = new FileJsonTransport(s"$tmp/topic")
    transport.publish(replayed)
    // the consumer-side inference: read the topic's JSON values with
    // schema inference (the first-record key-inspection analog)
    val inferred = spark.read.json(s"$tmp/topic").schema
    // (1) the inferred field NAME SET is exactly the declared one — no
    // column is lost or invented by the JSON round trip
    assert(inferred.fieldNames.toSet == cols.toSet,
      s"inferred ${inferred.fieldNames.toSeq.sorted} != declared $cols")
    // (2) every declared numeric column inferred as a NUMERIC type, and
    // the documented all-float coercion maps it to the declared field;
    // field ORDER is the declared schema's prerogative (JSON inference
    // sorts names; consumer.py takes first-message key order) — the
    // engine replaces order-inference with the explicit StructType
    val coerced = StructType(Schemas.numericCols.map { c =>
      val f = inferred(c)
      assert(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"$c inferred as ${f.dataType}, not numeric")
      StructField(c, FloatType, nullable = true)
    })
    assert(coerced == Schemas.trip25,
      "coerced inferred schema != declared trip25")
    // (3) and the values agree: the declared-schema read equals the
    // inferred read after the coercion, row for row
    val declaredRead = transport.sourceBatch(spark)
      .select(from_json(col("value"), Schemas.trip25).as("r"))
      .select(Schemas.numericCols.map(c => col(s"r.$c")): _*)
      .orderBy(col(Schemas.label), col("Distance"), col("Temp"))
      .collect().map(_.toSeq)
    val inferredRead = spark.read.json(s"$tmp/topic")
      .select(Schemas.numericCols.map(c => col(c).cast("float").as(c)): _*)
      .orderBy(col(Schemas.label), col("Distance"), col("Temp"))
      .collect().map(_.toSeq)
    assert(declaredRead.toSeq == inferredRead.toSeq,
      "declared-schema read and coerced inferred read disagree")
  }
}
