package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the pagerank loop: isolates index-build cost,
  * per-round cost, and checkpoint cadence effects.
  * Usage: runMain graft.tools.PrProf <sfDir> */
object PrProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pr-prof")
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
      println(f"[prprof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.query.Analytics._
    time("warmup sf0.001")(graphPagerank(spark, "/root/testdata/sf0.001").count())
    time("iters=1 (builds index)")(graphPagerank(spark, dir, iters = 1).count())
    // inspect the persisted index shape (rebuild the same plan; the
    // cachedDf layer will serve the persisted blocks)
    val pr1 = graphPagerank(spark, dir, iters = 1)
    pr1.queryExecution.executedPlan // force planning
    println("[prprof] plan:\n" + pr1.queryExecution.executedPlan.toString.take(4000))
    time("iters=1 warm")(graphPagerank(spark, dir, iters = 1).count())
    time("iters=2 warm")(graphPagerank(spark, dir, iters = 2).count())
    time("iters=4 warm")(graphPagerank(spark, dir, iters = 4).count())
    time("iters=6 ck3 warm")(graphPagerank(spark, dir, iters = 6, checkpointEvery = 3).count())
    time("iters=10 ck3 warm")(graphPagerank(spark, dir, iters = 10, checkpointEvery = 3).count())
    spark.stop()
  }
}
