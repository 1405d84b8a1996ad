package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Dedup

/** Dev profiling main: times the stages of a query pipeline in isolation.
  * Usage: runMain graft.tools.Prof <sfDir> */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
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

    // warm-up JIT/codegen
    time("warmup")(spark.read.parquet(s"$dir/documents.parquet").count())
    time("warmup2")(Dedup.dedupExact(spark, dir).count())

    val raw = graft.schema.Schemas.table(spark, dir, "documents")
    time("plain read count")(raw.count())
    time("split count")(raw.select(Dedup.tokens(col("text")).as("t")).count())
    time("planted union count")(Dedup.withPlantedNearDups(raw).count())
    val docs = Dedup.withPlantedNearDups(
      graft.schema.Schemas.table(spark, dir, "documents"))
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    time("tokens count")(docs.count())
    time("tokens count again")(docs.count())
    val sig = Dedup.minhashSignatures(docs, "toks", "doc_id", 3, 32)
    time("signatures")(sig.count())
    val sigP = sig.persist()
    time("signatures persist")(sigP.count())
    time("full dedupMinhashLsh")(Dedup.dedupMinhashLsh(spark, dir).count())
    time("full again (warm)")(Dedup.dedupMinhashLsh(spark, dir).count())
    time("dedup groups")(Dedup.dedupGroups(spark, dir).count())
    time("dedup groups warm")(Dedup.dedupGroups(spark, dir).count())
    // ngram-jaccard (b=16, r=2) stage breakdown
    val banded = sigP.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * 2 + 1, lit(2))), b)))
        .as(Seq("band", "bucket")))
    time("banded r2 count")(banded.count())
    val bstats = banded.groupBy("band", "bucket").count()
      .agg(max("count").as("max"), sum(col("count") * (col("count") - 1) / 2).as("pairs"))
    time("bucket stats")(println("  " + bstats.head()))
    val cands = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b")),
        Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    time("cand pre-distinct")(println("  n=" + cands.count()))
    val candD = cands.distinct().persist()
    time("cand distinct")(println("  n=" + candD.count()))
    time("ngram full")(Dedup.dedupNgramJaccard(spark, dir).count())
    time("ngram full warm")(Dedup.dedupNgramJaccard(spark, dir).count())
    spark.stop()
  }
}
