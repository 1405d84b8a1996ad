package graft

import org.apache.spark.sql.functions._
import graft.query.{Dedup, Similarity, TextAnalysis}
import graft.schema.Schemas

/** Round-11 operators: BPE pair induction and RRF hybrid retrieval. */
class Round11Spec extends SparkSpec {

  test("text_bpe_pairs: counts conserve mass and match a hand fold") {
    val out = TextAnalysis.textBpePairs(spark, sf, k = 100000).collect()
    // hand fold over the same tokenization
    val toks = Schemas.table(spark, sf, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .collect().map(_.getString(0))
    val expected = toks.filter(_.length >= 2)
      .flatMap(t => t.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.length == expected.size,
      s"distinct pairs: ${out.length} vs hand ${expected.size}")
    out.foreach { r =>
      assert(r.getLong(1) == expected(r.getString(0)),
        s"count mismatch for pair '${r.getString(0)}'")
    }
    // mass conservation: every token of length L contributes L-1 pairs
    val mass = toks.filter(_.length >= 2).map(_.length - 1L).sum
    assert(out.map(_.getLong(1)).sum == mass)
    // ordering contract: non-increasing counts, pair-name tiebreak
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) &&
            a.getString(0) < b.getString(0)))
      case _ => ()
    }
  }

  test("retrieval_rrf_hybrid: fusion arithmetic, pool membership, determinism") {
    val out = Similarity.retrievalRrfHybrid(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val tr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(tr.nonEmpty || vr.nonEmpty, "a fused doc must come from a pool")
      tr.foreach(x => assert(x >= 1 && x <= 20))
      vr.foreach(x => assert(x >= 1 && x <= 20))
      val want = tr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getFloat(3) == want.toFloat,
        s"rrf mismatch for doc ${r.getLong(0)}")
    }
    // a doc retrieved by BOTH arms outranks any doc retrieved by one arm
    // at equal-or-worse ranks: 1/(60+a)+1/(60+b) > 1/(60+c) for c >= 1
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getFloat(3)).min > single.map(_.getFloat(3)).max / 2,
        "two-arm fused scores collapsed below one-arm scores")
    // determinism: a second run is byte-identical
    val again = Similarity.retrievalRrfHybrid(spark, sf).collect()
    assert(out.toSeq == again.toSeq)
  }
}
