package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev bench main: times NAMED SparkEntry queries under the exact Bench
  * session config (best-of-2 min, warm-up pass), without paying the
  * ~85 s full-registry run. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.BenchSome <sfDir> <name> [<name>…]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchSome <sfDir> <name> [<name>…]")
    val dir = args.head
    val names = args.tail.toSeq
    val requested = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpus = math.max(1,
      math.min(requested, Runtime.getRuntime.availableProcessors())).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-some")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    // untimed warm-up on the tiny fixture compiles the code paths
    qs.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    def once(): Seq[(String, Double)] = qs.map { case (n, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, dir).count() catch { case _: Throwable => () }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val p1 = once().toMap
    val p2 = once().toMap
    names.foreach { n =>
      println(f"[bench-some] $n%-28s p1=${p1(n)}%6.2f s  p2=${p2(n)}%6.2f s  min=${math.min(p1(n), p2(n))}%6.2f s")
    }
    spark.stop()
  }
}
