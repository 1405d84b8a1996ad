package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Sources/sinks and physical-layout techniques: multi-format round-trips
  * and bucketed co-located joins (the shuffle-free join path named in the
  * scale design).
  */
class StorageSpec extends SparkSpec {

  private val ev = Schemas.events(SparkSpec.spark, SparkSpec.sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  test("format round-trips: csv, json, orc, parquet preserve rows and values") {
    val base = ev.orderBy("event_id").collect()
    Seq("csv", "json", "orc", "parquet").foreach { fmt =>
      val dir = Files.createTempDirectory(s"rt-$fmt").toString + "/data"
      val w = ev.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(dir)
      val r = spark.read
      val back = (fmt match {
        case "csv" => r.option("header", "true").schema(ev.schema).format(fmt).load(dir)
        case "json" => r.schema(ev.schema).format(fmt).load(dir)
        case _ => r.format(fmt).load(dir)
      }).orderBy("event_id").collect()
      assert(back.length == base.length, fmt)
      back.zip(base).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0), fmt)
        assert(a.getDouble(3) == b.getDouble(3), fmt) // exact through every format
      }
    }
  }

  test("bucketed tables: co-located join plans without a shuffle exchange") {
    val orders = Schemas.table(spark, sf, "orders")
    val lineitem = Schemas.table(spark, sf, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val joined = spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    // disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: no Exchange below the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"), plan)
      // and it still computes the right answer
      val direct = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(bucketed == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
