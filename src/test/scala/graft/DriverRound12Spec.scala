package graft

import org.apache.spark.sql.functions._
import graft.query.{Pipeline, Similarity, Warehouse2}

/** Driver-round-12 operator pins: MMR diversified retrieval, hard-
  * negative mining, Δ-join view maintenance, and leave-one-out target
  * encoding. (File named by DRIVER round per the BASELINE.md
  * reconciliation.)
  */
class DriverRound12Spec extends SparkSpec {

  test("retrieval_mmr_topk: picks and scores equal an exact driver-side " +
      "replay of the greedy MMR unroll over the brute-force pool") {
    val picks = Similarity.retrievalMmrTopk(spark, sf).collect()
    assert(picks.length == 3)
    assert(picks.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(picks.map(_.getLong(0)).distinct.length == 3)
    // replay: float_dot accumulates float→double products in index order,
    // so this driver loop reproduces every comparison bit for bit
    val pool = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = graft.schema.Schemas.table(spark, sf, "embeddings")
      .filter(col("vec_id").isin(pool.keys.toSeq: _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    var selected = Vector.empty[(Long, Double)]
    (1 to 3).foreach { step =>
      val cand = pool.keys.filterNot(id => selected.exists(_._1 == id))
      val scored = cand.map { id =>
        val score =
          if (step == 1) pool(id)
          else 0.7 * pool(id) -
            0.3 * selected.map(s => dot(vecs(id), vecs(s._1))).max
        id -> score
      }.toSeq.sortBy { case (id, sc) => (-sc, id) }
      selected :+= scored.head
    }
    picks.zip(selected).zipWithIndex.foreach { case ((got, (id, score)), i) =>
      assert(got.getLong(0) == id, s"pick ${i + 1} id")
      assert(got.getDouble(2) == score, s"pick ${i + 1} score")
    }
  }

  test("ann_hard_negatives: every negative's label differs from its " +
      "anchor's; per-anchor ranks contiguous; cosines non-increasing") {
    val emb = graft.schema.Schemas.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.annHardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (anchor, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      rs.foreach(r => assert(emb(r.getLong(2)) != emb(anchor),
        s"negative ${r.getLong(2)} shares anchor $anchor's label"))
      val cos = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mv_join_delta: the delta-maintained view equals the full recompute " +
      "over the effective table, row for row") {
    val cust = graft.schema.Schemas.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val full = graft.schema.Schemas.table(spark, sf, "orders")
      .withColumn("price_cents",
        when(col("o_orderkey") % 20 === 5,
          round((col("o_totalprice") + lit(5.0)) * 100).cast("long"))
          .otherwise(round(col("o_totalprice") * 100).cast("long")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
        col("c_nationkey"))
      .orderBy(col("o_orderkey")).collect()
    val delta = Warehouse2.mvJoinDelta(spark, sf).collect()
    assert(delta.length == full.length && delta.nonEmpty)
    delta.zip(full).foreach { case (a, b) => assert(a == b) }
  }

  test("feature_target_encode: encoding is the leave-one-out smoothed " +
      "mean — verified against a direct per-row computation") {
    val ev = graft.schema.Schemas.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value") * lit(1e6)).cast("long").as("v6")).collect()
    val byType = ev.groupBy(_.getString(1))
      .map { case (t, rs) => t -> (rs.map(_.getLong(2)).sum, rs.length.toLong) }
    val s = ev.map(_.getLong(2)).sum
    val n = ev.length.toLong
    val got = Pipeline.featureTargetEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    ev.filter(_.getLong(0) < 2000L).foreach { r =>
      val (sg, ng) = byType(r.getString(1))
      val want = ((sg - r.getLong(2)) * n + 10L * s).toDouble /
        ((ng - 1 + 10) * n).toDouble / 1e6
      assert(got(r.getLong(0)) == want, s"event ${r.getLong(0)}")
    }
  }
}
