package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Dev profiling main for the STREAMING DRAIN FLOOR: what does one
  * AvailableNow drain cost when the data is near-empty, and which knob
  * moves it? Decomposes across checkpoint medium (disk /tmp vs tmpfs
  * /dev/shm), state-store partition count, and stateless vs stateful
  * plans. Usage: runMain graft.tools.StreamProbe <sfDir>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // probe the stored ts type — the generator has shipped both
    // TIMESTAMP(NANOS) (long under nanosAsLong) and TIMESTAMP(MICROS)
    val tsIsLong = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(dir).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val eventsSchema = StructType.fromDDL(
      s"event_id LONG, ts ${if (tsIsLong) "LONG" else "TIMESTAMP"}, " +
        "user_id LONG, event_type STRING, value DOUBLE, props STRING")
    def stream(): DataFrame = {
      val src = spark.readStream
        .schema(eventsSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      if (tsIsLong)
        src.withColumn("ts",
          expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP)"))
      else src
    }

    var n = 0
    def drain(df: DataFrame, mode: OutputMode, sp: Int,
        ckptRoot: Option[String]): Unit = {
      n += 1
      val name = s"probe_$n"
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", sp.toString)
      try {
        val w0 = df.writeStream.outputMode(mode).format("memory")
          .queryName(name).trigger(Trigger.AvailableNow())
        val w = ckptRoot.map(r => w0.option("checkpointLocation",
          s"$r/graft-probe-$n")).getOrElse(w0)
        val q = w.start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    def best(label: String, reps: Int)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3 / 1e3
      }
      println(f"[sprobe] $label%-46s min=${times.min}%7.1f ms  med=${times.sorted.apply(reps / 2)}%7.1f ms")
    }

    def statefulAgg(df: DataFrame): DataFrame = df
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    // warm-up: one of each
    drain(stream().select("event_id"), OutputMode.Append(), 8, None)
    drain(statefulAgg(stream()), OutputMode.Complete(), 8, None)

    best("stateless, /tmp ckpt, sp=8", 5)(
      drain(stream().select("event_id"), OutputMode.Append(), 8, None))
    best("stateless, shm ckpt, sp=8", 5)(
      drain(stream().select("event_id"), OutputMode.Append(), 8,
        Some("/dev/shm")))
    best("stateful,  /tmp ckpt, sp=8", 5)(
      drain(statefulAgg(stream()), OutputMode.Complete(), 8, None))
    best("stateful,  shm ckpt, sp=8", 5)(
      drain(statefulAgg(stream()), OutputMode.Complete(), 8,
        Some("/dev/shm")))
    best("stateful,  /tmp ckpt, sp=1", 5)(
      drain(statefulAgg(stream()), OutputMode.Complete(), 1, None))
    best("stateful,  shm ckpt, sp=1", 5)(
      drain(statefulAgg(stream()), OutputMode.Complete(), 1,
        Some("/dev/shm")))
    best("stateful,  shm ckpt, sp=32", 5)(
      drain(statefulAgg(stream()), OutputMode.Complete(), 32,
        Some("/dev/shm")))
    spark.stop()
  }
}
