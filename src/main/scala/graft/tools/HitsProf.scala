package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the HITS rounds. Usage: runMain graft.tools.HitsProf <sfDir> */
object HitsProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-hits-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(spark.read.parquet(s"$dir/lineitem.parquet").count())
    val bip = time("bip build+persist") {
      val b = graft.schema.Schemas.table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct().persist()
      b.count(); b
    }
    val hub0 = time("hub init distinct") {
      bip.select(col("ok")).distinct().withColumn("h", lit(1L)).localCheckpoint()
    }
    val a1 = time("round1 auth") {
      bip.join(broadcast(hub0), Seq("ok"))
        .groupBy(col("pk")).agg(sum(col("h")).as("a")).localCheckpoint()
    }
    val h1 = time("round1 hub") {
      bip.join(broadcast(a1), Seq("pk"))
        .groupBy(col("ok")).agg(sum(col("a")).as("h")).localCheckpoint()
    }
    val a2 = time("round2 auth") {
      bip.join(broadcast(h1), Seq("ok"))
        .groupBy(col("pk")).agg(sum(col("h")).as("a"))
        .localCheckpoint()
    }
    time("final topk") {
      val amax = a2.agg(max(col("a")).as("amax"))
      a2.crossJoin(broadcast(amax))
        .select(col("pk"), col("a"),
          (col("a").cast("double") / col("amax").cast("double")).as("s"))
        .orderBy(col("a").desc, col("pk")).limit(50).collect()
    }
    // second pass warm
    val hub0b = time("hub init (warm)") {
      bip.select(col("ok")).distinct().withColumn("h", lit(1L)).localCheckpoint()
    }
    val a1b = time("round1 auth (warm)") {
      bip.join(broadcast(hub0b), Seq("ok"))
        .groupBy(col("pk")).agg(sum(col("h")).as("a")).localCheckpoint()
    }
    val h1b = time("round1 hub (warm, no ckpt)") {
      val df = bip.join(broadcast(a1b), Seq("pk"))
        .groupBy(col("ok")).agg(sum(col("a")).as("h"))
      df.count(); df
    }
    spark.stop()
  }
}
