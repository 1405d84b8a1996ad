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

  // weak session key: a stopped test session's cached plans drop with it
  private val relCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** Content fingerprint (total size + max mtime) of a parquet file or
    * directory — ~1 ms of Files.walk, vs the ~60 ms eager footer
    * read + file listing `spark.read.parquet` pays per call. Public:
    * every build-once/probe-often index cache (Dedup signatures,
    * Curation PQ codes, the co-purchase graph, Pipeline gram index)
    * keys on it too, so a corpus regenerated at the same path can never
    * serve a stale persisted index. */
  def fingerprint(path: String): String = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    // A concurrent regeneration can delete files between the walk and the
    // stat — exactly the window this function guards. Any IO error
    // degrades to a UNIQUE token, i.e. a cache miss (the next call after
    // the regeneration settles re-fingerprints cleanly); it must never
    // surface as a query crash. The nanoTime tail keeps two degraded
    // tokens from ever colliding.
    try {
      if (!java.nio.file.Files.exists(p)) "absent"
      else {
        val walk = java.nio.file.Files.walk(p) // javadoc: must be closed
        val (size, mtime) =
          try {
            val files = walk.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_)).toSeq
            (files.map(java.nio.file.Files.size).sum,
              files.map(java.nio.file.Files.getLastModifiedTime(_)
                .toMillis).maxOption.getOrElse(0L))
          } finally walk.close()
        s"$size@$mtime"
      }
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        s"racing@${System.nanoTime()}"
    }
  }

  /** Read one driver-provided test table from an sf directory.
    *
    * The resolved DataFrame is cached per (session, dir, table, content
    * fingerprint): `spark.read.parquet` eagerly lists files and reads a
    * footer for schema inference on EVERY call (~60 ms driver-side —
    * measured by [[graft.tools.ConstProbe]]), which a 200-query loop
    * pays hundreds of times for the same dozen tables. A production
    * deployment gets the same amortization from the catalog's relation
    * cache; here the fingerprint key keeps a regenerated corpus at the
    * same path from serving a stale file listing (same discipline as
    * [[graft.ingest.Formats]]). DataFrames are immutable plans, so
    * reuse across queries in one session is safe; the session key
    * keeps plans from crossing SparkSessions in tests. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    evictingComputeIfAbsent(
      relCache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()),
      path, fingerprint(path))(
      normalizePhysicalTypes(name, spark.read.parquet(path)))(_ => ())
  }

  /** Normalize generator-dependent physical types at the read boundary —
    * the same discipline [[events]] applies to `ts`, extended to every
    * column a regenerated corpus has drifted (or could drift) on. The
    * `events.ts` drift silently compressed event time 1000× in round 10;
    * an `embedding` shipped as list<double> would hard-crash all 30+
    * vector consumers (the codegen'd kernels bind to ArrayType(FloatType)),
    * and integer widths (`n_chars`, `label`) feed hash-exact oracles where
    * a silent INT32/INT64 flip changes result schemas. Casting when the
    * type already matches is a no-op Catalyst elides, so the steady-state
    * plan is unchanged. */
  private def normalizePhysicalTypes(name: String, df: DataFrame): DataFrame = {
    def matches(have: DataType, want: DataType): Boolean = (have, want) match {
      case (ArrayType(e1, _), ArrayType(e2, _)) => matches(e1, e2)
      case _ => have == want
    }
    def castIf(d: DataFrame, c: String, want: DataType): DataFrame =
      if (d.columns.contains(c) && !matches(d.schema(c).dataType, want)) {
        import org.apache.spark.sql.functions._
        val src = col(c)
        val guarded = (d.schema(c).dataType, want) match {
          // NARROWING integral cast: a plain cast silently wraps
          // out-of-range values — the exact corruption class this
          // normalization exists to prevent. Fail loudly instead.
          case (LongType, IntegerType) =>
            when(src.isNull ||
                src.between(Int.MinValue.toLong, Int.MaxValue.toLong),
              src.cast(want))
              .otherwise(raise_error(concat(
                lit(s"drifted $name.$c out of INT32 range: "),
                src.cast("string"))).cast(want))
          // LOSSY storage drift: a DOUBLE-contract column stored as
          // FLOAT already lost mantissa bits at write time — widening
          // it back cannot recover them, and every downstream
          // integer-exact oracle (×10⁶ scaling) would silently diverge.
          // TableTypeDriftSpec's contract: this class must fail
          // visibly, never auto-widen.
          case (FloatType, DoubleType) =>
            raise_error(lit(s"drifted $name.$c stored as FLOAT: lossy " +
              "vs the DOUBLE contract — regenerate the corpus")).cast(want)
          case _ => src.cast(want)
        }
        d.withColumn(c, guarded)
      } else d
    name match {
      case "embeddings" =>
        castIf(castIf(castIf(df, "embedding", ArrayType(FloatType)),
          "vec_id", LongType), "label", IntegerType)
      case "documents" =>
        // text/lang/source as un-annotated BINARY (a generator writing
        // raw bytes without the UTF8 logical type) decode back to
        // StringType here — downstream this column feeds every
        // tokenizer, shingle hash, and the multimodal payload encode
        castIf(castIf(castIf(castIf(castIf(df,
          "n_chars", LongType), "doc_id", LongType),
          "text", StringType), "lang", StringType), "source", StringType)
      case "events" =>
        // ts is normalized in [[events]] (its drift needs the stored
        // type to pick the conversion); the remaining columns get the
        // same width/binary discipline as documents/embeddings
        castIf(castIf(castIf(castIf(castIf(df,
          "event_id", LongType), "user_id", LongType),
          "value", DoubleType), "event_type", StringType),
          "props", StringType)
      case _ => df
    }
  }

  /** `computeIfAbsent` for fingerprint-keyed caches WITH eviction of the
    * superseded generation: the cache key is `prefix#fp`; on a miss,
    * entries under the same `prefix#` with a DIFFERENT fingerprint are
    * removed and handed to `retire` (unpersist a DataFrame, delete a
    * temp dir) before the new entry is built. Without this, every corpus
    * regeneration in a long-lived session leaks the old generation's
    * persisted blocks / on-disk copies until JVM exit. The trailing `#`
    * in the prefix match keeps sibling prefixes (`/a/b` vs `/a/bc`)
    * apart. Removal uses the map's atomic remove, so concurrent misses
    * retire each stale entry at most once. */
  def evictingComputeIfAbsent[V](
      map: java.util.concurrent.ConcurrentHashMap[String, V],
      prefix: String, fp: String)(build: => V)(retire: V => Unit): V = {
    val key = s"$prefix#$fp"
    val hit = map.get(key)
    if (hit != null) hit
    else {
      import scala.jdk.CollectionConverters._
      map.keySet().asScala.filter(k => k != key && k.startsWith(s"$prefix#"))
        .foreach { stale =>
          val v = map.remove(stale)
          if (v != null) try retire(v) catch { case _: Throwable => () }
        }
      // build OUTSIDE the map's compute: a build thunk that resolves a
      // BASE index through this same cache (derived-index composition)
      // would otherwise be a recursive computeIfAbsent — which
      // ConcurrentHashMap rejects with IllegalStateException("Recursive
      // update") WHEN the two keys land in the same hash bin. The keys
      // embed content fingerprints, so bin collisions arrive and vanish
      // with testdata regenerations — a crash that appears "randomly"
      // across corpus generations (observed: dedup_groups → minhash
      // candidates). Cost of the non-reentrant form: two racing threads
      // may both build; the loser's value is retired, the winner is
      // served to both — builds here are idempotent persisted plans, so
      // at-most-once was a nicety, recursion-safety is correctness.
      val built = build
      val prev = map.putIfAbsent(key, built)
      if (prev != null) {
        if (!prev.equals(built)) try retire(built) catch { case _: Throwable => () }
        prev
      } else built
    }
  }

  /** Drop cached relations (test/corpus-regeneration hook). */
  def clearCaches(): Unit = relCache.clear()

  // ---- scan-layout-aware spreading --------------------------------------

  private val slicesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Upper bound on the number of scan tasks a table's file layout can
    * feed: Σ_files ceil(size / maxPartitionBytes). The driver testdata
    * ships every table as ONE small parquet file with ONE row group, so
    * the scan reads as a single task no matter the split config — every
    * pre-shuffle expression (md5 fanouts, tokenization, shingling) then
    * runs on one core of the whole machine (guide §2.5 "input skew: one
    * huge unsplittable file"). This estimate intentionally ignores
    * row-group boundaries: it only has to answer "can the layout feed
    * the cores at all", and for that an over-estimate at healthy
    * layouts is harmless. Cached per (path, fingerprint). */
  def scanSlices(spark: SparkSession, sfDir: String, name: String): Int = {
    val path = s"$sfDir/$name.parquet"
    val maxSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(128L * 1024 * 1024)
    evictingComputeIfAbsent(slicesCache, s"slices:$path",
      fingerprint(path)) {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) Integer.valueOf(1)
      else {
        val walk = java.nio.file.Files.walk(p)
        try {
          val n = walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => math.max(1L,
              (java.nio.file.Files.size(f) + maxSplit - 1) / maxSplit))
            .sum
          Integer.valueOf(math.min(n, Int.MaxValue.toLong).toInt)
        } finally walk.close()
      }
    }(_ => ())
  }

  /** Hash-spread a NARROW frame across the cores iff the source table's
    * file layout cannot (guide §2.5): when [[scanSlices]] says the scan
    * feeds fewer tasks than the session has cores, repartition by `keys`
    * to defaultParallelism so the expensive per-row work downstream runs
    * on every core instead of inside the unsplittable scan task. On a
    * production layout (many splits ≥ cores) this is the IDENTITY — no
    * exchange is added, because there the same repartition would be a
    * pure extra shuffle of the fact table. Call it on the narrowest
    * projection available (project before the exchange, guide §2.3).
    * Hash partitioning on a stable key is deterministic under retries;
    * results are partition-invariant for the aggregate/join consumers
    * this feeds (PartitionInvarianceSpec's discipline). */
  def spread(spark: SparkSession, sfDir: String, name: String,
      df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    if (scanSlices(spark, sfDir, name) >= cores) df
    else df.repartition(cores, keys: _*)
  }

  /** `events` with `ts` normalized to a true TimestampType.
    *
    * The testdata generator has shipped `ts` as THREE physical shapes
    * across regenerations: TIMESTAMP(NANOS) (surfaced as LongType
    * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong`),
    * TIMESTAMP(MICROS) isAdjustedToUTC=false (surfaced as
    * TIMESTAMP_NTZ / LocalDateTime in Spark 4), and plain UTC-adjusted
    * TIMESTAMP. All three normalize here to TimestampType so every
    * downstream consumer — batch, streaming, and specs comparing
    * `Row.getTimestamp` — sees one type. Under the UTC session timezone
    * the NTZ→TZ cast is a pure reinterpretation (same micros value),
    * matching DuckDB's naive-timestamp read of the same file. For the
    * nanos case, integer division (DIV) truncates to micros — a
    * double-precision path would corrupt 2024-era epoch-nanos
    * (1.7e18 > 2^53).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP)"))
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
