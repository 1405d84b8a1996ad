package graft

import org.apache.spark.sql.types.StructType
import graft.ingest.{Batcher, KafkaJsonTransport}

/** The real Kafka wire path (reference producer/producer.py:19-21 →
  * consumer/consumer.py:19-26): publish → typedSource → streamBatches
  * over an actual broker.
  *
  * This environment ships neither the `spark-sql-kafka-0-10` connector
  * nor a broker (offline build — SURVEY §7.4), so the suite GATES on
  * both and reports CANCELED (visible as skipped, not silently green)
  * when either is absent. [[graft.ingest.FileJsonTransport]] carries the
  * integration coverage for the transport semantics in the meantime
  * (IngestSpec); this suite is the switch that lights up the moment the
  * connector jar lands on the classpath next to a reachable broker.
  */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  private val connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private val bootstrap: String =
    sys.env.getOrElse("GRAFT_KAFKA_BOOTSTRAP", "127.0.0.1:9092")

  private def brokerReachable: Boolean = {
    val Array(host, port) = bootstrap.split(':')
    val s = new java.net.Socket()
    try {
      s.connect(new java.net.InetSocketAddress(host, port.toInt), 500)
      true
    } catch { case _: java.io.IOException => false }
    finally s.close()
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"kafka-$name").toString

  test("Kafka wire: publish -> typedSource -> streamBatches round-trips through a broker") {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector NOT on classpath — Kafka wire path not exercised " +
        "(FileJsonTransport integration stands in; see SURVEY §7.4)")
    assume(brokerReachable,
      s"no Kafka broker reachable at $bootstrap (set GRAFT_KAFKA_BOOTSTRAP) — " +
        "Kafka wire path not exercised")
    val topic = s"graft-wire-${java.util.UUID.randomUUID().toString.take(8)}"
    val t = new KafkaJsonTransport(bootstrap, topic)
    // the reference's shape: JSON values, no keys, ordered replay —
    // the same 1000-event S9 contract IngestSpec pins over files
    val ev = graft.schema.Schemas.events(spark, sf)
      .select($"event_id", $"user_id", $"value")
      .filter($"event_id" < 1000)
    t.publish(ev)
    val res = Batcher.streamBatches(spark, t,
      StructType.fromDDL("event_id LONG, user_id LONG, value DOUBLE"),
      stagingDir = tmp("staging"), outDir = tmp("batches"),
      batchSize = 300, maxBatches = 4, checkpointDir = tmp("ckpt"))
    assert(res.batches.count() == 1000L)
    assert(res.batches.select("event_id").distinct().count() == 1000L)
    val sizes = res.batches.groupBy("batch_id").count().orderBy("batch_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((0, 300L), (1, 300L), (2, 300L), (3, 100L)))
  }
}
