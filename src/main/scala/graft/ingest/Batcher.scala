package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** S6–S10: count-based tumbling batch windows (reference
  * consumer/consumer.py:37-94): buffer the stream, emit one batch per
  * BATCH_SIZE rows, cap at NUM_BATCHES_TO_WRITE, flush the remainder at
  * stream end.
  *
  * Structured Streaming has no count trigger, so three faithful forms:
  *
  *   1. [[assignBatches]] — batch emulation over an ordering column
  *      (row_number window). Oracle-able; global window is single-partition,
  *      so it is the small-data/verification path only.
  *   2. [[assignBatchesArrivalOrder]] — the 100 TB path: per-partition
  *      counts + prefix-sum offsets, then a zipWithIndex-style map. The
  *      driver holds ONE long per partition (not rows); no global sort, no
  *      shuffle — arrival order is partition-major, exactly the reference's
  *      "order the consumer happened to see".
  *   3. [[streamBatches]] — the streaming form: foreachBatch + a running
  *      row-count offset (the consumer's buffer counter), AvailableNow
  *      trigger = the reference's drain-then-stop idle timeout.
  */
object Batcher {

  /** Result of a capped batching pass. */
  final case class BatchingResult(
      batches: DataFrame,        // rows with batch_id assigned, within cap
      remainderRows: Long,       // rows past the cap (discarded or flushed)
      nBatches: Int)

  /** (1) Oracle-able emulation: batch_id by row rank over `orderCol`.
    * Cap: ranks past `maxBatches * batchSize` drop (consumer.py:60,80-82).
    */
  def assignBatches(df: DataFrame, orderCol: String, batchSize: Int,
      maxBatches: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", floor((col("rn") - 1) / batchSize).cast("int"))
      .filter(col("batch_id") < maxBatches)
      .drop("rn")
  }

  /** (2) Scale path: arrival-order (partition-major) batch assignment with
    * no global sort. Stage 1 counts rows per partition (driver receives
    * numPartitions longs); stage 2 maps each row to offset(partition) +
    * local index. Both stages are narrow — zero shuffle at any scale.
    */
  def assignBatchesArrivalOrder(df: DataFrame, batchSize: Int,
      maxBatches: Int): BatchingResult = {
    val spark = df.sparkSession
    val counts: Array[Long] = df.rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets: Array[Long] = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val cap = batchSize.toLong * maxBatches
    val schema = df.schema
      .add("seq", "long").add("batch_id", "int")
    val assigned = spark.createDataFrame(
      df.rdd.mapPartitionsWithIndex { case (i, it) =>
        val base = offsets(i)
        it.zipWithIndex.map { case (r, j) =>
          val seq = base + j
          Row.fromSeq(r.toSeq :+ seq :+ (seq / batchSize).toInt)
        }
      }, schema)
    BatchingResult(
      batches = assigned.filter(col("batch_id") < maxBatches),
      remainderRows = math.max(0L, total - math.min(total, cap)),
      nBatches = math.min(maxBatches.toLong, (total + batchSize - 1) / batchSize).toInt)
  }

  /** (3) Streaming form. Consumes `transport`'s typed source with
    * AvailableNow (drain-then-stop ≈ consumer_timeout_ms), maintains the
    * running row count across micro-batches (the consumer's buffer
    * counter), and appends each micro-batch to `stagingDir` parquet with a
    * global `seq`. After the drain, completed count-batches are written as
    * `batch_id=K` parquet partitions under `outDir`. With `flushRemainder`
    * (the reference default) a trailing partial batch is written when the
    * cap is not yet reached (consumer.py:85-94 end-of-stream flush); rows
    * past the cap are always discarded (consumer.py:60,80-82).
    *
    * State: ONE long on the driver (checkpointable via staging dir row
    * count on restart) — rows never collect to the driver.
    */
  def streamBatches(spark: SparkSession, transport: StreamTransport,
      schema: StructType, stagingDir: String, outDir: String,
      batchSize: Int, maxBatches: Int, checkpointDir: String,
      flushRemainder: Boolean = true): BatchingResult = {
    // recover the counter from staging on restart: the checkpoint replays
    // only uncommitted offsets, so the seq must continue where it stopped
    var rowsSeen =
      try spark.read.parquet(stagingDir).count() catch { case _: Throwable => 0L }
    val query: StreamingQuery = transport.typedSource(spark, schema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (mb: DataFrame, _: Long) =>
        // seq within the micro-batch via the arrival-order assigner
        // (micro-batches are small; their internal order is the arrival
        // order the source delivered)
        val withSeq = assignBatchesArrivalOrder(mb, batchSize = Int.MaxValue,
          maxBatches = 1).batches
          .withColumn("seq", col("seq") + rowsSeen)
          .drop("batch_id")
        withSeq.write.mode("append").parquet(stagingDir)
        rowsSeen += mb.count()
        (): Unit
      }
      .start()
    query.awaitTermination()

    val staged = spark.read.parquet(stagingDir)
      .withColumn("batch_id", (col("seq") / batchSize).cast("int"))
    val capped = staged.filter(col("batch_id") < maxBatches)
    val fullOnly =
      if (flushRemainder) capped
      else capped.filter(col("batch_id") <
        least(lit(maxBatches), floor(lit(rowsSeen) / batchSize)).cast("int"))
    fullOnly.write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
    val written = math.min(maxBatches.toLong,
      if (flushRemainder) (rowsSeen + batchSize - 1) / batchSize
      else rowsSeen / batchSize)
    BatchingResult(
      batches = spark.read.parquet(outDir),
      remainderRows = rowsSeen - math.min(rowsSeen, written * batchSize),
      nBatches = written.toInt)
  }
}
