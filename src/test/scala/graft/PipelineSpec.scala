package graft

import org.apache.spark.sql.functions._
import graft.query.Pipeline

/** Property specs for the training-data pipeline operators (round 4). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: overlaps meet the floor, splits are disjoint, fractions valid") {
    val rows = Pipeline.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tr, ev, shared, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(tr % 37 != 0, s"train doc $tr is in the eval split")
      assert(ev % 37 == 0, s"eval doc $ev is not in the eval split")
      assert(shared >= 2 && frac > 0.0 && frac <= 1.0)
    }
    // the synthetic corpus contains a fully-contained eval doc — the
    // operator must surface it with eval_frac == 1.0
    assert(rows.exists(_.getDouble(3) == 1.0), "full containment not found")
  }

  test("pack_sequences: bins are contiguous, conserve docs/tokens, respect doc order") {
    val docs = graft.schema.Schemas.table(spark, sf, "documents")
    val nDocs = docs.count()
    val totTok = docs.select(
      sum(size(graft.query.Dedup.tokens($"text")).cast("long"))).head().getLong(0)
    val bins = Pipeline.packSequences(spark, sf).collect()
    assert(bins.map(_.getLong(1)).sum == nDocs)
    assert(bins.map(_.getLong(2)).sum == totTok)
    // bin ids ascending; doc ranges non-overlapping and ordered
    val ids = bins.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"bin ${a.getLong(0)} overlaps bin ${b.getLong(0)}")
      case _ =>
    }
  }

  test("train_test_split: 3 deterministic splits conserving docs, train largest") {
    val out = Pipeline.trainTestSplit(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet == Set("train", "val", "test"))
    val total = graft.schema.Schemas.table(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum == total)
    val byName = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") + byName("test"))
    // deterministic: a second run returns identical rows
    assert(Pipeline.trainTestSplit(spark, sf).collect().toSeq == out.toSeq)
  }

  test("class_weights: inverse-frequency invariant holds per class") {
    val ev = graft.schema.Schemas.events(spark, sf)
    val nTotal = ev.count()
    val counts = ev.groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = counts.size
    Pipeline.classWeights(spark, sf).collect().foreach { r =>
      val (et, w) = (r.getString(1), r.getDouble(2))
      val expected = nTotal.toDouble / (k * counts(et))
      assert(math.abs(w - expected) < 1e-12, s"$et: $w vs $expected")
    }
  }

  test("text_repetition: score in [0,1), zero iff all bigrams distinct") {
    val rows = Pipeline.textRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, rep) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d >= 1 && d <= n)
      assert(rep >= 0.0 && rep < 1.0)
      assert((rep == 0.0) == (n == d))
    }
  }
}
