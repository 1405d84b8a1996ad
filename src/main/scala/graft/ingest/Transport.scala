package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Transport abstraction for the stream leg (SURVEY §7.4).
  *
  * The reference's Kafka usage (producer/producer.py:19-21,
  * consumer/consumer.py:19-26) is plain pub/sub: JSON values, no keys, no
  * headers, no transactions, earliest-offset restart, ordered replay. The
  * spark-sql-kafka connector jar is not on this classpath (offline build),
  * so the engine programs against this trait; [[FileJsonTransport]] is a
  * semantically faithful stand-in (JSON-lines files, checkpoint = consumer
  * group offset, `from_json` null = malformed drop). A Kafka implementation
  * is the same ~10 lines with `format("kafka")` and
  * `option("subscribe", topic)` once the connector is present.
  */
trait StreamTransport {

  /** Unbounded source of raw JSON `value` strings (Kafka value analog). */
  def source(spark: SparkSession): DataFrame

  /** Publish a (bounded or micro-batch) DataFrame as JSON values. */
  def publish(df: DataFrame): Unit

  /** Typed view of the source: parse JSON values against `schema`, dropping
    * malformed records (S7: from_json yields null on corrupt input —
    * consumer/consumer.py:47-49's non-dict drop). */
  def typedSource(spark: SparkSession, schema: StructType): DataFrame = {
    val parsed = source(spark)
      .select(from_json(col("value"), schema).as("parsed"))
    parsed.filter(col("parsed").isNotNull).select(col("parsed.*"))
  }
}

/** Kafka transport — the reference's actual wire (producer/producer.py:19-21
  * publish, consumer/consumer.py:19-26 subscribe with earliest offsets and a
  * consumer group). Compiles against stock Spark (formats are late-bound
  * strings); RUNNING it requires the `spark-sql-kafka-0-10` connector on the
  * classpath, which this offline build does not ship — [[FileJsonTransport]]
  * is the drop-in stand-in with identical semantics for every feature the
  * reference uses (ordered replay, JSON values, no keys/headers/txns,
  * checkpoint-as-offset-store).
  */
final class KafkaJsonTransport(bootstrapServers: String, topic: String)
    extends StreamTransport {

  override def source(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest") // auto_offset_reset='earliest'
      .load()
      .select(col("value").cast("string").as("value"))

  override def publish(df: DataFrame): Unit =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
}

/** JSON-lines-directory transport: each published file is a "partition" of
  * the topic; a streaming read replays files in order; the checkpoint
  * directory plays the consumer-group offset store (earliest on first run,
  * resume-from-offset on restart).
  */
final class FileJsonTransport(topicDir: String) extends StreamTransport {

  override def source(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(StructType.fromDDL("value STRING"))
      // one file per trigger preserves the replay pacing knob (S5 throttle
      // analog: rate is files/trigger, not a driver-side sleep)
      .option("maxFilesPerTrigger", "1")
      .text(topicDir)
      .toDF("value")

  override def publish(df: DataFrame): Unit =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      .write.mode("append").text(topicDir)

  /** Batch view of everything currently in the topic (for verification). */
  def sourceBatch(spark: SparkSession): DataFrame =
    spark.read.schema(StructType.fromDDL("value STRING")).text(topicDir).toDF("value")
}
