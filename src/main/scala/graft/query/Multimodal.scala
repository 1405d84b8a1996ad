package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas.table

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by per-row expressions / per-partition batches.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (hash-derived pseudo-features) — the
  * Spark-side surface (binary column, metadata struct, batch shape,
  * partition parallelism) is real and tested. Swapping the stub for a real
  * decoder (JNI or `mapInPandas`-style batched Python) changes ONE
  * function, not the pipeline.
  *
  * Scale: payloads stay in executors end-to-end (no driver collect); a
  * real deployment reads `binaryFile` sources partitioned by file, with
  * `spark.sql.files.maxPartitionBytes` sizing partitions to decoder
  * memory.
  */
object Multimodal {

  /** STUB — deterministic fake feature extractor standing in for an image
    * decode+embed. Derives 4 doubles in [0,1) from the md5-based
    * [[Dedup.hash60]] of the payload bytes at different seeds — DuckDB
    * reproduces them bit-identically (md5 of the same byte sequence), so
    * the stub pipeline is hash-compare oracle-able. A real implementation
    * replaces this expression with a decoder call. */
  private def stubFeature(payload: org.apache.spark.sql.Column, seed: Int) =
    (Dedup.hash60(concat(payload, encode(lit(s":$seed"), "UTF-8")))
      % lit(1000000L)).cast("double") / lit(1000000.0)

  /** Binary payload pipeline over documents-as-media: encode text bytes as
    * the opaque payload (the corpus has no real media), attach typed
    * metadata (byte size, pseudo mime/width/height), and extract stub
    * features. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    table(spark, dir, "documents")
      .select(col("doc_id"),
        payload.as("payload"),
        octet_length(payload).as("payload_bytes"),
        // metadata struct a real media table would carry (md5-derived
        // pseudo-dimensions: DuckDB-reproducible, see stubFeature)
        struct(
          lit("image/stub").as("mime"),
          (Dedup.hash60(concat(col("doc_id").cast("string"), lit(":w")))
            % lit(1024L) + lit(256L)).cast("int").as("width"),
          (Dedup.hash60(concat(col("doc_id").cast("string"), lit(":h")))
            % lit(768L) + lit(256L)).cast("int").as("height"))
          .as("media_meta"),
        array((0 until 4).map(stubFeature(payload, _)): _*).as("stub_embedding"))
  }

  /** Decoded-feature record produced by the batched per-partition decoder. */
  case class DecodedMedia(doc_id: Long, payload_bytes: Int,
      features: Array[Float])

  /** Batched per-partition decode — the Scala analog of a `mapInPandas`
    * batched Python UDF: each partition's payloads are processed in
    * micro-batches of `batchSize`, the shape a real decoder (native lib /
    * GPU) wants for amortized per-call setup. The decode itself is the
    * deterministic stub below; the batching, partitioning and schema
    * plumbing are the real thing.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // >>> a real decoder processes `batch` in one native/device call;
          // >>> STUB: deterministic per-payload pseudo-features
          batch.iterator.map { case (id, bytes) =>
            DecodedMedia(id, bytes.length, stubDecode(bytes))
          }
        }
      }
      .toDF()
  }

  /** STUB decoder: 4 floats md5-derived from the payload bytes at
    * different seeds — the SAME values [[stubFeature]] computes in SQL
    * (hash60(payload||":s") % 1e6 / 1e6), so the batched JVM path is
    * DuckDB-replayable and hash-compare oracle-able. Stands in for
    * decode+resize+embed; replace with the real codec call at
    * deployment. */
  private def stubDecode(bytes: Array[Byte]): Array[Float] =
    Array.tabulate(4) { s =>
      val h = graft.functions.SimHashImpl.hash60(
        bytes ++ s":$s".getBytes("UTF-8"))
      ((h % 1000000L).toDouble / 1000000.0).toFloat
    }

  /** Scalar projection of the batched per-partition decode path
    * ([[decodeBatched]] — the mapInPandas-shaped surface). The stub
    * features are md5-derived (see [[stubDecode]]), so the driver gate
    * hash-compares this against DuckDB; the spec additionally pins
    * determinism and batch-size invariance. */
  def multimodalBatchDecode(spark: SparkSession, dir: String): DataFrame =
    decodeBatched(table(spark, dir, "documents"))
      .select(col("doc_id"), col("payload_bytes"),
        element_at(col("features"), 1).as("f0"),
        element_at(col("features"), 4).as("f3"))
      .orderBy(col("doc_id"))

  /** Video-style frame sampling over the opaque payload: derive per-doc
    * stream metadata (fps, duration — md5-derived stubs standing in for
    * a container-header probe), pick ~8 evenly-strided frame indices,
    * and emit one row per sampled frame with a deterministic stub frame
    * fingerprint. This is the frame-extraction PLUMBING of a video
    * training pipeline — schema, fanout, partitioning — with the decode
    * stubbed exactly like [[stubFeature]] (md5-replayable, so the
    * driver gate hash-compares it against DuckDB).
    *
    * Scale shape: map-only — the explode fans each doc into ≤ 9 rows
    * (stride = ⌈n_frames/8⌉ bounds the fanout regardless of clip
    * length), payloads never shuffle, and a real decoder slots into the
    * per-row fingerprint exactly like [[decodeBatched]]'s batch path.
    * The ORDER BY is the dump's, not the operator's. */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    table(spark, dir, "documents")
      .select(col("doc_id"), payload.as("payload"))
      // stub container-header probe: fps ∈ {24, 30}, duration 5–34 s
      .withColumn("fps",
        when(Dedup.hash60(concat(col("doc_id").cast("string"), lit(":fps")))
          % lit(2L) === 0, lit(24L)).otherwise(lit(30L)))
      .withColumn("duration_s",
        Dedup.hash60(concat(col("doc_id").cast("string"), lit(":dur")))
          % lit(30L) + lit(5L))
      .withColumn("n_frames", col("fps") * col("duration_s"))
      .withColumn("stride", expr("greatest(1L, (n_frames + 7) DIV 8)"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride")))
          .as("frame_idx"),
        col("payload"))
      .withColumn("frame_fp",
        Dedup.hash60(concat(col("payload"),
          encode(concat(lit(":f"), col("frame_idx").cast("string")),
            "UTF-8"))) % lit(1000000L))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        col("frame_fp"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Nearest neighbors over the multimodal stub embeddings: one query
    * doc's 4-dim feature vector against the whole media corpus by dot
    * product — the retrieval step a real decode→embed→search pipeline
    * ends with, runnable end-to-end because the stub features are
    * md5-derived (oracle-replayable).
    *
    * Numerics: the dot product is a FIXED left-associated 4-term
    * expression (not an aggregation), so the double arithmetic order is
    * identical on both engines — deterministic without any scaled-int
    * crutch. Ties break on doc_id.
    *
    * Scale shape: the query vector is a 1-row broadcast scalar; scoring
    * is map-only over the feature scan; TakeOrdered picks the top-k.
    * With a real embedding column this is [[Similarity.annBruteForce]];
    * at 100 TB the IVF/LSH variants take over — same front half. */
  def multimodalEmbedKnn(spark: SparkSession, dir: String,
      queryId: Long = 0L, topK: Int = 10): DataFrame = {
    val feats = multimodalFeatures(spark, dir)
      .select(col("doc_id") +: (0 until 4).map(i =>
        element_at(col("stub_embedding"), i + 1).as(s"f$i")): _*)
    val q = feats.filter(col("doc_id") === queryId)
      .select((0 until 4).map(i => col(s"f$i").as(s"q$i")): _*)
    feats.filter(col("doc_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        (col("f0") * col("q0") + col("f1") * col("q1")
          + col("f2") * col("q2") + col("f3") * col("q3")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(topK)
  }

  /** Scalar projection of the multimodal pipeline (Verify-friendly: no
    * binary/struct/array columns in the dump). */
  def multimodalSummary(spark: SparkSession, dir: String): DataFrame =
    multimodalFeatures(spark, dir)
      .select(col("doc_id"), col("payload_bytes"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        element_at(col("stub_embedding"), 1).as("f0"),
        element_at(col("stub_embedding"), 2).as("f1"))
      .orderBy(col("doc_id"))
}
