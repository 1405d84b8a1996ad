package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-format coverage beyond parquet: the same tables served
  * through Spark's ORC and JSON-lines sources — a lakehouse engine
  * reads whatever the upstream wrote. Each source is materialized ONCE
  * per (corpus dir, table, format) into a temp location (deleted at JVM
  * exit) and every query scans that copy, so the queries measure the
  * SOURCE path (reader, pushdown, pruning), not the conversion.
  *
  * Correctness: content is byte-identical to the parquet tables —
  * doubles survive both ORC (binary) and JSON (shortest-repr text,
  * which round-trips IEEE doubles exactly) — so the DuckDB oracles run
  * the same SQL over the original parquet and must hash-match.
  *
  * Scale: at 100 TB the materialization step disappears (the data
  * already lives in the lake in its native format); both ORC and JSON
  * sources split by file/stripe and prune columns, and ORC additionally
  * takes predicate pushdown (asserted by the plan spec).
  */
object Formats {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // every temp dir ever created, for exit cleanup — survives clearCaches()
  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case _: Throwable => () }
      }
    }, "graft-formats-cleanup"))
  }

  private def materialized(spark: SparkSession, dir: String,
      table: String, fmt: String): String =
    // content-fingerprinted key: a regenerated corpus at the SAME path
    // gets a new cache key, so the converted copy can never silently
    // serve stale data to source_orc_agg/source_jsonl_agg while the
    // oracle reads the fresh parquet. The SUPERSEDED conversion's temp
    // dir is deleted on the rebuild (evictingComputeIfAbsent) instead
    // of lingering until JVM exit.
    graft.schema.Schemas.evictingComputeIfAbsent(dirs,
      s"$dir#$table#$fmt",
      graft.schema.Schemas.fingerprint(s"$dir/$table.parquet"))({
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-$fmt-$table").toString
      created.add(out)
      graft.schema.Schemas.table(spark, dir, table)
        .write.mode("overwrite").format(fmt).save(out)
      out
    })({ stale =>
      created.remove(stale)
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(stale)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    })

  /** Drop all cached conversions (test/corpus-regeneration hook — the
    * [[graft.query.Dedup.clearCaches]] convention). The temp copies
    * themselves are reaped by the shutdown hook. */
  def clearCaches(): Unit = dirs.clear()

  /** ORC source: date-filtered priority rollup over orders served from
    * ORC. The date predicate pushes into the ORC reader (stripe-level
    * min/max skipping at scale); money sums as exact cents. */
  def orcSourceAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(materialized(spark, dir, "orders", "orc"))
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * lit(100)).cast("long"))
          .as("value_c"))
      .orderBy(col("o_orderpriority"))

  /** Schema-evolution source: one parquet directory whose files come
    * from TWO pipeline generations — legacy files (even order keys)
    * lack `o_orderpriority`, current files (odd keys) carry it — read
    * through `mergeSchema=true`, the lakehouse answer to columns added
    * mid-stream. Legacy rows surface as NULLs in the evolved column;
    * the rollup tags them `<legacy>` so the oracle can replay the
    * split arithmetically from the original table. At 100 TB merged
    * reads cost one footer per file (schema union on the driver);
    * per-file column absence is free (the reader fills nulls), so
    * evolution never forces a rewrite of old data. */
  def schemaEvolutionAgg(spark: SparkSession, dir: String): DataFrame = {
    val evoDir = graft.schema.Schemas.evictingComputeIfAbsent(dirs,
      s"$dir#orders#pqevo",
      graft.schema.Schemas.fingerprint(s"$dir/orders.parquet"))({
      val out = java.nio.file.Files
        .createTempDirectory("graft-pqevo-orders").toString
      created.add(out)
      val orders = graft.schema.Schemas.table(spark, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(out)
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("append").parquet(out)
      out
    })({ stale =>
      created.remove(stale)
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(stale)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    })
    spark.read.option("mergeSchema", "true").parquet(evoDir)
      .groupBy(coalesce(col("o_orderpriority"), lit("<legacy>"))
        .as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * lit(100)).cast("long"))
          .as("value_c"))
      .orderBy(col("priority"))
  }

  /** JSON-lines source: segment rollup over customer served from JSONL
    * with an EXPLICIT schema (no inference pass — at 100 TB schema
    * inference is a full extra scan). Account balances as exact cents
    * (JSON shortest-repr text round-trips the doubles bit-exactly). */
  def jsonlSourceAgg(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.schema.Schemas.table(spark, dir, "customer").schema
    spark.read.schema(schema)
      .json(materialized(spark, dir, "customer", "json"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(round(col("c_acctbal") * lit(100)).cast("long"))
          .as("acctbal_c"))
      .orderBy(col("c_mktsegment"))
  }
}
