package graft

import org.apache.spark.sql.functions._
import graft.schema.Schemas
import graft.query.Similarity

/** Regression pin for physical-type drift on the NON-events tables.
  *
  * The round-10 lesson (`events.ts` shipping as three different parquet
  * physical types across testdata regenerations) generalizes: nothing
  * stops a regenerated corpus from shipping `embedding` as
  * list&lt;double&gt; or the integer ids at a different width. The vector
  * kernels bind to ArrayType(FloatType) (driver-side `getSeq[Float]`,
  * codegen'd `float_dot`), so an un-normalized double-shaped embedding
  * column is a hard crash across 30+ consumers — worse than wrong
  * answers only because it is louder. `Schemas.table` therefore
  * normalizes generator-dependent physical types at the read boundary;
  * this spec feeds a drifted copy (embedding as double, vec_id INT32,
  * label INT64, n_chars INT32) through the same readers and requires
  * bit-identical results to the canonical shape.
  */
class TableTypeDriftSpec extends SparkSpec {

  /** Copy the sf corpus into a fresh dir with drifted physical types. */
  private lazy val driftedDir: String = {
    val base = java.nio.file.Files.createTempDirectory("graft-typedrift")
    base.toFile.deleteOnExit()
    def export(name: String)(reshape: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      val stage = base.resolve(s"stage_$name").toString
      reshape(spark.read.parquet(s"$sf/$name.parquet"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, base.resolve(s"$name.parquet"))
    }
    export("embeddings")(df => df
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .withColumn("vec_id", col("vec_id").cast("int"))
      .withColumn("label", col("label").cast("long")))
    export("documents")(df => df
      .withColumn("doc_id", col("doc_id").cast("int"))
      .withColumn("n_chars", col("n_chars").cast("int"))
      // raw bytes without the UTF8 annotation — reads back BinaryType
      .withColumn("text", col("text").cast("binary"))
      .withColumn("lang", col("lang").cast("binary")))
    // note: no `value` drift — a DOUBLE→FLOAT flip is LOSSY; no reader
    // can normalize bits away, so that class must fail visibly instead
    export("events")(df => df
      .withColumn("user_id", col("user_id").cast("int"))
      .withColumn("event_type", col("event_type").cast("binary"))
      .withColumn("props", col("props").cast("binary")))
    base.toString
  }

  test("Schemas.table normalizes drifted embeddings to the canonical schema") {
    val norm = Schemas.table(spark, driftedDir, "embeddings").schema
    val want = Schemas.table(spark, sf, "embeddings").schema
    assert(norm("embedding").dataType.simpleString ==
      want("embedding").dataType.simpleString)
    assert(norm("vec_id").dataType == want("vec_id").dataType)
    assert(norm("label").dataType == want("label").dataType)
  }

  test("brute-force ANN is bit-identical under drifted embedding storage") {
    val canon = Similarity.bruteForceTopK(spark, sf).collect()
    val drift = Similarity.bruteForceTopK(spark, driftedDir).collect()
    assert(canon.length == drift.length && canon.length > 0)
    canon.zip(drift).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      // double→float→double round-trips exactly for values born float
      assert(a.getDouble(1) == b.getDouble(1))
    }
  }

  test("documents reader decodes drifted BINARY text/lang; text consumers " +
      "and the multimodal payload are byte-identical") {
    val norm = Schemas.table(spark, driftedDir, "documents").schema
    assert(norm("text").dataType == org.apache.spark.sql.types.StringType)
    assert(norm("lang").dataType == org.apache.spark.sql.types.StringType)
    // a text consumer: exact-dedup fingerprints over the decoded column
    val canon = graft.query.Dedup.dedupExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).sortBy(_._1)
    val drift = graft.query.Dedup.dedupExact(spark, driftedDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).sortBy(_._1)
    assert(canon.length == drift.length && canon.nonEmpty)
    assert(canon.toSeq == drift.toSeq)
    // the multimodal payload (encode(text)) sees identical bytes
    val pb = graft.query.Multimodal.multimodalFeatures(spark, driftedDir)
      .agg(sum(col("payload_bytes"))).head().getLong(0)
    val pbCanon = graft.query.Multimodal.multimodalFeatures(spark, sf)
      .agg(sum(col("payload_bytes"))).head().getLong(0)
    assert(pb == pbCanon && pb > 0)
  }

  test("events reader normalizes drifted widths and BINARY strings " +
      "through BOTH the batch and the streaming path") {
    val batchCanon = Schemas.events(spark, sf)
    val batchDrift = Schemas.events(spark, driftedDir)
    assert(batchDrift.schema.map(f => (f.name, f.dataType)) ==
      batchCanon.schema.map(f => (f.name, f.dataType)))
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("v3"),
        sum(col("user_id")).as("us"),
        max(length(col("props"))).as("pl"))
      .orderBy(col("event_type")).collect().toSeq
    assert(digest(batchDrift) == digest(batchCanon))
    // streaming: the probed-footer source must survive the same drift
    val sCanon = graft.streaming.StreamQueries
      .streamWindowAgg(spark, sf).collect().toSeq
    val sDrift = graft.streaming.StreamQueries
      .streamWindowAgg(spark, driftedDir).collect().toSeq
    assert(sCanon.nonEmpty && sDrift == sCanon)
  }

  test("documents reader normalizes drifted integer widths") {
    val norm = Schemas.table(spark, driftedDir, "documents").schema
    val want = Schemas.table(spark, sf, "documents").schema
    assert(norm("doc_id").dataType == want("doc_id").dataType)
    assert(norm("n_chars").dataType == want("n_chars").dataType)
    val a = Schemas.table(spark, driftedDir, "documents")
      .agg(sum(col("n_chars"))).head().getLong(0)
    val b = Schemas.table(spark, sf, "documents")
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(a == b)
  }
}
