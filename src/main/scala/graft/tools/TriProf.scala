package graft.tools
import org.apache.spark.sql.SparkSession
object TriProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("warm")(spark.read.parquet(s"$dir/lineitem.parquet").count())
    time("tri cold")(graft.query.Analytics.graphTriangles(spark, dir).count())
    time("tri warm")(graft.query.Analytics.graphTriangles(spark, dir).count())
    time("pr warm")(graft.query.Analytics.graphPagerank(spark, dir).count())
    time("novelty cold")(graft.query.Curation.textNgramNovelty(spark, dir).count())
    time("novelty warm")(graft.query.Curation.textNgramNovelty(spark, dir).count())
    spark.stop()
  }
}
