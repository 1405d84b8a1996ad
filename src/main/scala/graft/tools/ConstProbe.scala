package graft.tools

import org.apache.spark.sql.SparkSession
import graft.schema.Schemas

/** Dev profiling main for the PER-QUERY CONSTANT: where do the
  * ~0.2–0.5 s/query of the bench loop go when the data itself is small?
  * Decomposes one query's wall time into (a) the bare job-submission
  * floor, (b) parquet relation resolution (file listing + footer schema
  * read, driver-side, eager at `spark.read.parquet`), (c) Catalyst
  * analyze+optimize+physical planning, and (d) execution proper — and
  * measures the same query with AQE on/off, since each AQE shuffle
  * stage is an extra driver round-trip that is pure constant at bench
  * scale (and pure win at 100 TB scale).
  *
  * Usage: runMain graft.tools.ConstProbe <sfDir>
  */
object ConstProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-constprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // best-of-N: the constant is the *floor*, noise is the machine
    def best[T](n: Int)(f: => T): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
    def p(label: String, ms: Double): Unit =
      println(f"[const] $label%-42s $ms%8.1f ms")

    // warm everything once (JIT, codegen, parquet reader classes)
    spark.range(1000).selectExpr("sum(id)").collect()
    Schemas.table(spark, dir, "orders").count()
    graft.query.Analytics.aggModePerKey(spark, dir).count()

    p("job floor: range(1).count", best(20)(spark.range(1).count()))
    p("job floor: 32-task shuffle count",
      best(20)(spark.range(1 << 14).repartition(32).count()))
    p("relation resolve: read.parquet(orders)",
      best(20)(spark.read.parquet(s"$dir/orders.parquet")))
    p("relation resolve: Schemas.table cached",
      best(20)(Schemas.table(spark, dir, "orders")))
    p("relation resolve: all 11 tables",
      best(10)(Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$dir/$t.parquet"))))
    val q = () => graft.query.Analytics.aggModePerKey(spark, dir)
    p("catalyst: analyze+optimize+plan only",
      best(20)(q().queryExecution.executedPlan))
    p("end-to-end: agg_mode_per_key (AQE on)", best(10)(q().count()))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    p("end-to-end: agg_mode_per_key (AQE off)", best(10)(q().count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // a single-stage scan-agg for contrast
    val s = () => Schemas.table(spark, dir, "orders")
      .selectExpr("sum(o_totalprice)")
    p("end-to-end: single-stage scan agg", best(10)(s().collect()))
    // the STREAMING constant: a full AvailableNow drain pays query
    // start/stop, checkpoint setup, and per-micro-batch planning on top
    // of the data work — measured against the tiny sf0.001 fixture,
    // where the data itself is negligible, this is ≈ the fixed overhead
    // every bench streaming query carries (13 queries × ~0.5-1 s)
    val warm = "/root/testdata/sf0.001"
    graft.streaming.StreamQueries.streamWindowAgg(spark, warm).count()
    p("streaming drain floor: window agg on sf0.001",
      best(5)(graft.streaming.StreamQueries.streamWindowAgg(spark, warm).count()))
    p("streaming drain floor: stateful sessions on sf0.001",
      best(5)(graft.streaming.StreamQueries.streamSessionCounts(spark, warm).count()))
    spark.stop()
  }
}
