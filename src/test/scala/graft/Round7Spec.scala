package graft

import org.apache.spark.sql.functions._
import graft.query.Dedup

/** Round-7 additions: delta-vs-corpus near-dup over the shared MinHash
  * band index. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  test("dedup_incremental_minhash: statuses derive from the full verified pair list") {
    // ground truth: the oracle-verified full-corpus near-pair list
    // (doc_a < doc_b, jaccard >= 0.5) restricted to delta involvement
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val links = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val expectNc = links.filter { case (d, m) => d % 5 == 0 && m % 5 != 0 }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expectNb = links.filter { case (d, m) =>
      d % 5 == 0 && m % 5 == 0 && m < d }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val out = Dedup.dedupIncrementalMinhash(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    // output covers exactly the delta docs (including planted ids % 5 = 0)
    val deltaIds = Dedup.withPlantedNearDups(
        graft.schema.Schemas.table(spark, sf, "documents"))
      .filter($"doc_id" % 5 === 0).select($"doc_id")
      .as[Long].collect().toSet
    assert(out.map(_._1).toSet == deltaIds)
    out.foreach { case (id, status, nc, nb) =>
      assert(nc == expectNc.getOrElse(id, 0L), s"doc $id nc")
      assert(nb == expectNb.getOrElse(id, 0L), s"doc $id nb")
      val want =
        if (nc > 0) "near_dup_of_corpus"
        else if (nb > 0) "near_dup_in_batch"
        else "new"
      assert(status == want, s"doc $id status=$status want=$want")
    }
    // the planted-dup construction guarantees non-degenerate output:
    // planted copies with id % 5 = 0 match their original in the batch
    assert(out.exists(_._2 != "new"), "no near-dup found in delta")
  }

  test("dedup_incremental_minhash: probe reuses the persisted signature index (no rebuild)") {
    // warm the shared index via the full-corpus query, then check the
    // incremental probe's plan reads an InMemoryTableScan (the persisted
    // signature index), not a fresh minhash projection over documents
    Dedup.dedupMinhashLsh(spark, sf).count()
    val p = Dedup.dedupIncrementalMinhash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p.take(4000))
  }
}
