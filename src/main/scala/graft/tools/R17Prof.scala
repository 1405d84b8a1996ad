package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the round-17 arrivals: times each stage of
  * eval_bootstrap_bca and graph_sssp_weighted in isolation.
  * Usage: runMain graft.tools.R17Prof <sfDir> */
object R17Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-r17prof")
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
      println(f"[r17prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm code paths
    graft.query.Analytics7.evalBootstrapBca(spark, "/root/testdata/sf0.001").count()
    graft.query.Analytics7.graphSsspWeighted(spark, "/root/testdata/sf0.001").count()

    time("bootstrap replicas (collect)") {
      graft.query.Analytics5.evalPairedBootstrap(spark, dir).collect()
    }
    time("bootstrap replicas warm") {
      graft.query.Analytics5.evalPairedBootstrap(spark, dir).collect()
    }
    time("bootstrap localCheckpoint") {
      graft.query.Analytics5.evalPairedBootstrap(spark, dir)
        .localCheckpoint(true).count()
    }
    time("mcnemar (tally-shaped agg)") {
      graft.query.Analytics5.evalMcnemar(spark, dir).collect()
    }
    time("bca full") {
      graft.query.Analytics7.evalBootstrapBca(spark, dir).collect()
    }
    time("bca full again") {
      graft.query.Analytics7.evalBootstrapBca(spark, dir).collect()
    }
    time("sssp full") {
      graft.query.Analytics7.graphSsspWeighted(spark, dir).collect()
    }
    time("sssp full again") {
      graft.query.Analytics7.graphSsspWeighted(spark, dir).collect()
    }
    (1 to 4).foreach { r =>
      time(s"sssp rounds=$r warm") {
        graft.query.Analytics7.graphSsspWeighted(spark, dir, rounds = r)
          .collect()
      }
    }
    spark.stop()
  }
}
