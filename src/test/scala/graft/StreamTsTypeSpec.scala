package graft

import org.apache.spark.sql.functions._
import graft.schema.Schemas
import graft.streaming.StreamQueries

/** Regression pin for the events `ts` physical-type probe.
  *
  * The testdata generator has shipped `events.ts` as BOTH
  * TIMESTAMP(NANOS) (surfaced as LongType under nanosAsLong) and
  * TIMESTAMP(MICROS) (a true TimestampType) across regenerations. A
  * streaming source must declare its schema up front, so StreamQueries
  * probes the parquet footer per dir. Assuming one type when the other
  * ships compresses event time 1000×: every window collapses to a
  * handful of groups and an interval join goes near-cartesian — exactly
  * the round-10 CORRECTNESS regression (stream_window_agg 10 rows vs
  * 3385; stream_stream_join 5276 vs 9). This spec feeds the SAME events
  * through a micros-typed copy and a nanos-long copy and requires the
  * streaming drain to agree with the batch answer on both.
  */
class StreamTsTypeSpec extends SparkSpec {

  /** Write the sf events as `events.parquet` under a fresh dir, with ts
    * stored per `asLongNanos`. Returns the dir streamEvents should scan. */
  private def exportEvents(asLongNanos: Boolean): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-tstype-${if (asLongNanos) "nanos" else "micros"}")
    base.toFile.deleteOnExit()
    val ev = Schemas.events(spark, sf)
    val out =
      if (asLongNanos)
        // plain INT64 epoch-nanos: the same LongType shape the legacy
        // TIMESTAMP(NANOS) flag surfaces, exercising the DIV-1000 branch
        ev.withColumn("ts", unix_micros(col("ts")) * 1000L)
      else ev // Spark writes TimestampType as TIMESTAMP(MICROS)
    val stage = base.resolve("stage").toString
    out.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = base.resolve("events.parquet")
    java.nio.file.Files.move(part.toPath, dest)
    base.toString
  }

  test("stream window agg agrees with batch under BOTH stored ts types") {
    val batch = Schemas.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("float").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    for (nanos <- Seq(true, false)) {
      val dir = exportEvents(asLongNanos = nanos)
      val streamed = StreamQueries.streamWindowAgg(spark, dir).collect()
      assert(streamed.length == batch.length,
        s"asLongNanos=$nanos: ${streamed.length} windows vs batch ${batch.length}")
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getTimestamp(0) == b.getTimestamp(0), s"asLongNanos=$nanos")
        assert(s.getString(1) == b.getString(1))
        assert(s.getLong(2) == b.getLong(2))
        assert(s.getFloat(3) == b.getFloat(3))
      }
    }
  }

  test("stream-stream interval join agrees with batch under BOTH stored ts types") {
    val ev = Schemas.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
      expr("""user_id = p_user_id
             |AND purchase_ts >= click_ts
             |AND purchase_ts <= click_ts + INTERVAL 10 MINUTES""".stripMargin))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .orderBy(col("click_id"), col("purchase_id"))
      .collect()
    for (nanos <- Seq(true, false)) {
      val dir = exportEvents(asLongNanos = nanos)
      val streamed = StreamQueries.streamStreamJoin(spark, dir).collect()
      assert(streamed.length == batch.length,
        s"asLongNanos=$nanos: ${streamed.length} pairs vs batch ${batch.length}")
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getLong(0) == b.getLong(0))
        assert(s.getLong(1) == b.getLong(1))
        assert(s.getLong(2) == b.getLong(2))
      }
    }
  }

  test("transformWithState profile agrees with batch under BOTH stored ts types") {
    val batch = Schemas.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).cast("float").as("sum_value"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("user_id")).collect()
    for (nanos <- Seq(true, false)) {
      val dir = exportEvents(asLongNanos = nanos)
      val streamed =
        StreamQueries.streamTransformWithState(spark, dir).collect()
      assert(streamed.toSeq == batch.toSeq,
        s"asLongNanos=$nanos: ValueState profile diverged from batch")
    }
  }
}
