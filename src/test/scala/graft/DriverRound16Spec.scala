package graft

import org.apache.spark.sql.functions._
import graft.query.Dedup
import graft.schema.Schemas.table

/** Driver-round-16 pins: the shared substring-window census (r15
  * verdict #1 — exact/multiscale/maximal must trigger ONE tokenize
  * pass per (session, corpus, width set)) and its output parity with
  * the pre-index inline formulas. */
class DriverRound16Spec extends SparkSpec {

  test("substring family shares ONE window-census build: exact + " +
      "multiscale + maximal trigger exactly one tokenize pass " +
      "(the ModelStore `trains` discipline)") {
    Dedup.clearCaches()
    val b0 = Dedup.censusBuilds.get()
    Dedup.dedupExactSubstring(spark, sf).count()
    Dedup.dedupSubstringMultiscale(spark, sf).count()
    Dedup.dedupSubstringMaximal(spark, sf).count()
    assert(Dedup.censusBuilds.get() == b0 + 1,
      s"expected 1 census build, got ${Dedup.censusBuilds.get() - b0}")
    // warm repeats stay probes
    Dedup.dedupExactSubstring(spark, sf).count()
    Dedup.dedupSubstringMaximal(spark, sf).count()
    assert(Dedup.censusBuilds.get() == b0 + 1)
  }

  test("dedup_exact_substring from the shared census is row-identical " +
      "to the direct one-pass formula (the r15 shape)") {
    val direct = {
      val docs = Dedup.withPlantedNearDups(table(spark, sf, "documents"))
        .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
      docs
        .select(col("doc_id"),
          explode(Dedup.shinglesFromTokens(col("toks"), 8)).as("win"))
        .select(col("doc_id"), Dedup.hash60(col("win")).as("h"))
        .groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("h"))
    }
    val got = Dedup.dedupExactSubstring(spark, sf)
    assert(got.columns.toSeq == direct.columns.toSeq)
    assert(got.collect().toSeq == direct.collect().toSeq)
    assert(got.count() > 0, "planted near-dups must surface repeated spans")
  }

  test("dedup_substring_maximal from the shared index is row-identical " +
      "to the direct posexplode formula (the r15 shape)") {
    import org.apache.spark.sql.expressions.Window
    val direct = {
      val docs = Dedup.withPlantedNearDups(table(spark, sf, "documents"))
        .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
      val wins = docs
        .select(col("doc_id"),
          posexplode(Dedup.shinglesFromTokens(col("toks"), 8))
            .as(Seq("p", "win")))
        .select(col("doc_id"), (col("p") + 1).cast("long").as("i"),
          Dedup.hash60(col("win")).as("h"))
      val repeated = wins.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select(col("h"))
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      wins.join(repeated, Seq("h"), "left_semi")
        .withColumn("grp", col("i") - row_number().over(wdoc))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("i")).as("start_pos"), count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("start_pos"),
          (col("n_windows") + lit(7L)).as("span_len"))
        .orderBy(col("doc_id"), col("start_pos"))
    }
    val got = Dedup.dedupSubstringMaximal(spark, sf)
    assert(got.columns.toSeq == direct.columns.toSeq)
    assert(got.collect().toSeq == direct.collect().toSeq)
    assert(got.count() > 0)
  }

  test("a non-family width falls back to its own cached pass (no " +
      "cross-width contamination of the shared index)") {
    Dedup.clearCaches()
    val b0 = Dedup.censusBuilds.get()
    val w9 = Dedup.dedupExactSubstring(spark, sf, windowTokens = 9)
    assert(w9.count() > 0)
    assert(Dedup.censusBuilds.get() == b0 + 1)
    // the family widths still build their own (second) index
    Dedup.dedupSubstringMultiscale(spark, sf).count()
    assert(Dedup.censusBuilds.get() == b0 + 2)
  }
}
