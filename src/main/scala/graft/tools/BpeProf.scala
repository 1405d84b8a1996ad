package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiler for the BPE training loop: per-phase wall clock
  * at a given sf dir and round count. Dev tool only. */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    graft.query.TextAnalysis.textBpeTrain(spark, "/root/testdata/sf0.001",
      rounds = 2).count()
    for (r <- Seq(1, 2, 4, 8, rounds)) {
      val t0 = System.nanoTime()
      graft.query.TextAnalysis.textBpeTrain(spark, dir, rounds = r).count()
      println(f"[bpeprof] rounds=$r%-3d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
