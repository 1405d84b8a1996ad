package graft

import org.apache.spark.sql.functions._
import graft.query.{Analytics4, Similarity}

/** Round-14 guards for the r13-advice defects: ANSI-mode element_at
  * crashes on short/partially-empty panels (Hampel short frames,
  * median-of-means empty buckets), and driver-held-panel operators that
  * stopped degrading gracefully on degenerate inputs (missing k-center
  * seed, MMR over-asked pool). Each test plants the exact degenerate
  * state the advice describes and asserts the contract, not just
  * no-crash.
  */
class DriverRound14Spec extends SparkSpec {

  /** Tiny events fixture: user 1 has 8 events (full frames), user 2 has
    * exactly 2 (every frame < 4 rows — no 4th order statistic). */
  private lazy val shortSeriesDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14-short").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 8).map(i => (i.toLong, 1L, i)) ++
      Seq((100L, 2L, 0), (101L, 2L, 1))
    rows.toDF("event_id", "user_id", "i")
      .select(col("event_id"),
        expr(s"timestamp_millis(${base}L + i * 60000)").as("ts"),
        col("user_id"), lit("click").as("event_type"),
        (col("i") * 10.0 + 1.5).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("window_hampel_filter: a user with < 4 events yields NULL " +
      "median/mad and unflagged rows — not an ANSI element_at crash") {
    val out = Analytics4.windowHampelFilter(spark, shortSeriesDir)
      .collect()
    val short = out.filter(_.getLong(0) == 2L)
    assert(short.length == 2, s"expected 2 rows for the 2-event user, got ${short.length}")
    short.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4),
        s"median/mad must be NULL on a < 4-row frame (oracle vals[4] semantics): $r")
      assert(!r.getBoolean(5), s"short-frame row must be unflagged: $r")
      assert(r.getDouble(6) == r.getDouble(2),
        s"cleaned must pass the value through on a short frame: $r")
    }
    // the full-frame user still gets real picks
    val full = out.filter(_.getLong(0) == 1L)
    assert(full.forall(r => !r.isNullAt(3) && !r.isNullAt(4)),
      "full frames lost their median/mad picks")
  }

  test("agg_median_of_means: empty hash buckets — the median derives " +
      "from the REALIZED bucket count, not the parameter") {
    // 3 events → at most 3 of the 16 buckets occupied
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14-mom").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Seq((0L, 10.0), (1L, 20.0), (2L, 90.0))
      .toDF("event_id", "value")
      .select(col("event_id"),
        expr(s"timestamp_millis(${base}L + event_id * 1000)").as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        col("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics4.aggMedianOfMeans(spark, dir).collect()
    assert(r.length == 1)
    val nBuckets = r.head.getLong(1)
    assert(nBuckets <= 3, s"3 events cannot occupy $nBuckets buckets")
    val mom = r.head.getDouble(2)
    // each event hashes to its own bucket (or collides) — either way the
    // median of the realized bucket means must sit within their range
    assert(mom >= 10.0 && mom <= 90.0, s"median_of_means $mom outside the data range")
    // and with all 16 buckets occupied (sf corpus) the pick is unchanged
    // from the hardcoded-8/9 form: n_buckets == 16 → same two middles
    val fullR = Analytics4.aggMedianOfMeans(spark, sf).collect().head
    assert(fullR.getLong(1) == 16L, "sf corpus should fill all 16 buckets")
  }

  test("sample_kcenter_coreset: a missing seed id fails with a clear " +
      "message, not NoSuchElementException") {
    val e = intercept[IllegalArgumentException] {
      Similarity.sampleKcenterCoreset(spark, sf, k = 2, seedId = -999L)
    }
    assert(e.getMessage.contains("seed vector -999 not found"),
      s"unexpected message: ${e.getMessage}")
  }

  test("sample_kcenter_coreset: k larger than the corpus degrades to " +
      "fewer centers instead of throwing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14-kc").toString
    graft.schema.Schemas.table(spark, sf, "embeddings")
      .orderBy(col("vec_id")).limit(3)
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.sampleKcenterCoreset(spark, dir, k = 8).collect()
    assert(out.length == 3, s"3-vector corpus must yield 3 centers, got ${out.length}")
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3), "pick_order must stay dense")
  }

  test("retrieval_mmr_topk: select > realized pool degrades to fewer " +
      "picks; inconsistent lambda/mu is rejected at entry") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14-mmr").toString
    // 3 vectors → the brute-force pool excludes the query vector
    // itself, leaving a REALIZED pool of 2 against select = 5
    graft.schema.Schemas.table(spark, sf, "embeddings")
      .orderBy(col("vec_id")).limit(3)
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.retrievalMmrTopk(spark, dir, select = 5).collect()
    assert(out.length == 2, s"2-vector realized pool must yield 2 picks, got ${out.length}")
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2), "pick_order must stay dense")
    val e = intercept[IllegalArgumentException] {
      Similarity.retrievalMmrTopk(spark, sf, lambda = 0.5)
    }
    assert(e.getMessage.contains("must sum to 1"),
      s"unexpected message: ${e.getMessage}")
  }
}
