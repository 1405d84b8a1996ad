package graft

import org.apache.spark.sql.functions._
import graft.schema.Schemas
import graft.streaming.StreamQueries

class StreamingSpec extends SparkSpec {

  test("stream window agg: full AvailableNow drain equals the batch answer") {
    val streamed = StreamQueries.streamWindowAgg(spark, sf).collect()
    val batch = Schemas.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("float").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(s.getFloat(3) == b.getFloat(3))
    }
  }

  test("stream hopping agg: drain equals batch double-assignment; each event in 2 windows") {
    val streamed = StreamQueries.streamHoppingAgg(spark, sf).collect()
    val batch = Schemas.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("float").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(s.getFloat(3) == b.getFloat(3))
    }
    // size/slide = 2: total window-event incidences are exactly 2 per event
    val nEvents = Schemas.events(spark, sf).count()
    assert(streamed.map(_.getLong(2)).sum == 2 * nEvents)
  }

  test("stream session_window native: append drain equals batch gap-rule sessions finalized by the watermark") {
    val streamed = StreamQueries.streamSessionWindowNative(spark, sf)
      .collect()
    val ev = Schemas.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val sessions = ev
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))
    val wmRow = ev.agg(max(unix_micros(col("ts"))))
      .collect()(0).getLong(0) - 3600000000L
    val batch = sessions
      .filter(unix_micros(col("last_ts")) + 1800000000L <= wmRow)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
      .collect()
    assert(streamed.length == batch.length,
      s"streamed=${streamed.length} batch=${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0))
      assert(s.getTimestamp(1) == b.getTimestamp(1))
      assert(s.getLong(2) == b.getLong(2))
    }
  }

  test("stream session counts: gap logic on a hand-computed fixture") {
    import spark.implicits._
    // user 1: events at 0, 10, 50, 65 min (gap 30) -> sessions at 0 and 50 = 2
    // user 2: events at 0, 45, 90 -> 3 sessions
    val base = 1700000000000L
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 10L, 1.0), (1L, 50L, 1.0), (1L, 65L, 1.0),
      (2L, 0L, 1.0), (2L, 45L, 1.0), (2L, 90L, 1.0))
      .map { case (u, m, v) => (u * 10 + m, base + m * 60000L, u, "t", v, "{}") }
    val stage = java.nio.file.Files.createTempDirectory("sess-stage").toString
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("ts_ms") * 1000000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    // the streaming source globs for a FILE named events.parquet
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val out = StreamQueries.streamSessionCounts(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 2, 2L -> 3))
  }

  test("SessionMerger: arbitrary-order fold equals the sorted fold, across triggers") {
    // reference = the sort-the-whole-group fold the merger replaced
    def sortedFold(state: (Long, Int), batch: Seq[Long], gapMs: Long): (Long, Int) = {
      var (lastTs, sessions) = state
      batch.sorted.foreach { t =>
        if (lastTs == Long.MinValue || t - lastTs > gapMs) sessions += 1
        lastTs = t
      }
      (lastTs, sessions)
    }
    val gapMs = 1800000L
    val rng = new scala.util.Random(8)
    (1 to 40).foreach { _ =>
      val n = 1 + rng.nextInt(400)
      // timestamps spread so both sub-gap and super-gap diffs occur
      val ts = Seq.fill(n)(rng.nextLong(200L * gapMs))
      val triggers = ts.grouped(1 + n / 3).toSeq // 1-4 "micro-batches"
      var ref = (Long.MinValue, 0)
      var got = (Long.MinValue, 0)
      triggers.foreach { batch =>
        ref = sortedFold(ref, batch, gapMs)
        val m = new StreamQueries.SessionMerger(gapMs)
        rng.shuffle(batch).foreach(m.add) // arbitrary arrival order
        got = m.merge(got)
      }
      assert(got == ref)
    }
  }

  test("SessionMerger: 200k-event hot key folds in O(sessions) memory, not O(events)") {
    // bot-shaped hot key: 200k events at 1 s spacing (gap 30 min) in
    // random arrival order — ONE session; the interval high-water mark
    // must stay orders of magnitude below the event count (expected
    // n/(gap*e) ≈ 40 for uniform random arrival)
    val gapMs = 1800000L
    val rng = new scala.util.Random(42)
    val ts = rng.shuffle((0 until 200000).map(_ * 1000L).toVector)
    val m = new StreamQueries.SessionMerger(gapMs)
    ts.foreach(m.add)
    assert(m.intervalCount == 1)
    assert(m.maxLiveIntervals < 2000,
      s"interval high-water ${m.maxLiveIntervals} — buffer not bounded")
    assert(m.merge((Long.MinValue, 0)) == (199999000L, 1))
  }

  test("stream session counts: 100k-event hot key in one trigger, exact and no blowup") {
    import spark.implicits._
    // user 1: 3 bursts of 33,334 events at 1 s spacing, bursts 2 h apart
    //   -> 3 sessions; user 2: 2 events 45 min apart -> 2 sessions
    val base = 1700000000000L
    val hot = (0 until 100000).map { i =>
      val burst = i / 33334
      val off = i % 33334
      (i.toLong, base + burst * 7200000L * 10 + off * 1000L, 1L, "t", 1.0, "{}")
    }
    val cold = Seq(
      (200001L, base, 2L, "t", 1.0, "{}"),
      (200002L, base + 45 * 60000L, 2L, "t", 1.0, "{}"))
    val stage = java.nio.file.Files.createTempDirectory("hot-stage").toString
    val dir = java.nio.file.Files.createTempDirectory("hot").toString
    (hot ++ cold).toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("ts_ms") * 1000000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val out = StreamQueries.streamSessionCounts(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 3, 2L -> 2))
  }

  test("stream session counts on events: positive, bounded by event count") {
    val out = StreamQueries.streamSessionCounts(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getInt(1) >= 1))
  }

  test("foreachBatch upsert: multi-batch merge equals single-batch drain equals batch argmax") {
    import org.apache.spark.sql.functions._
    val single = StreamQueries.streamForeachbatchUpsert(spark, sf).collect()
    // batch ground truth: per user the latest (ts, event_id) row
    val batch = Schemas.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), unix_micros(col("m.ts")).as("last_ts_us"),
        col("m.event_id").as("last_event_id"),
        col("m.value").as("last_value"))
      .orderBy(col("user_id")).collect()
    assert(single.toSeq == batch.toSeq)
    // split the events into 3 parquet files and force 1 file per
    // micro-batch: the drain becomes 3 micro-batches, so the versioned
    // store must merge across batches — last-wins is
    // batching-independent, so the result is identical
    val splitDir = java.nio.file.Files
      .createTempDirectory("graft-upsert-split").toString
    Schemas.events(spark, sf)
      .select(col("event_id"),
        expr("timestamp_micros(unix_micros(ts)) AS ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(3, col("event_id"))
      .write.mode("overwrite").parquet(splitDir)
    val multi = StreamQueries.streamForeachbatchUpsertFrom(
      spark, splitDir, rawEvents = false, filesPerTrigger = Some(1)).collect()
    assert(multi.toSeq == batch.toSeq)
  }

  test("stream late data: late tranche dropped, only finalized windows emitted") {
    val out = StreamQueries.streamLateData(spark, sf).cache()
    val ev = Schemas.events(spark, sf)
    val isLate = col("event_id") % 7 === 0 &&
      col("ts") < lit("2024-01-15").cast("timestamp")
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    // batch replay of the semantics: on-time rows, windows ending at or
    // before the post-batch-0 watermark (max ts - 1h)
    val expect = ev.filter(!isLate)
      .select(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"), col("value"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR")
        <= lit(new java.sql.Timestamp(maxTs.getTime - 3600 * 1000L)))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).cast("float").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    assert(out.collect().toSeq == expect.toSeq)
    // the late tranche is genuinely non-empty (the drop is exercised)
    assert(ev.filter(isLate).count() > 0)
  }
}
