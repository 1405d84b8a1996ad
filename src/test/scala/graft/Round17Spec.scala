package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.query.Analytics6

/** Round-17 guards: the r16 verdict's remaining `weak` item — ego
  * betweenness's UNCONDITIONAL broadcast hints — becomes the house
  * fingerprint-keyed edge-count gate (both branches proven identical
  * here at sf0.001 and by tools/GateCheck at x10), plus the ADVICE.md
  * closures (rich-club NaN guard, DECIMAL tie terms, Friedman's
  * driver-side counts folded into the plan).
  */
class Round17Spec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("graph_ego_betweenness: broadcast gate — hinted and gated plans " +
      "return identical rows, and the branches genuinely diverge") {
    val hinted = Analytics6.graphEgoBetweenness(spark, sf,
      broadcastMaxEdges = Long.MaxValue)
    val hintedPlan = hinted.queryExecution.sparkPlan.toString
    assert(hintedPlan.contains("BroadcastHashJoin"),
      "below the gate the courier pipeline must carry broadcast hints")
    val hintedRows = canon(hinted)

    // past the gate the hints come off; kill auto-broadcast too so the
    // tiny sf0.001 stats cannot sneak the broadcast strategy back in —
    // this is the genuine hash-partitioned branch a billion-edge corpus
    // would plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val gatedRows = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = Analytics6.graphEgoBetweenness(spark, sf,
        broadcastMaxEdges = 0L)
      val gatedPlan = gated.queryExecution.sparkPlan.toString
      assert(gatedPlan.contains("SortMergeJoin"),
        s"gate=0 must fall back to exchange-based joins:\n$gatedPlan")
      canon(gated)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(hintedRows == gatedRows,
      s"gate branches diverged: hinted=${hintedRows.length} rows, " +
        s"gated=${gatedRows.length} rows")
    assert(hintedRows.nonEmpty)
  }

  test("graph_ego_betweenness: the gate consults the cached edge count " +
      "— a second call plans without a fresh count job") {
    Analytics6.graphEgoBetweenness(spark, sf).collect()
    var jobs = 0
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      // planning only — no action: the gate decision itself must not
      // launch work once the (dir, fingerprint) count is cached
      Analytics6.graphEgoBetweenness(spark, sf).queryExecution.sparkPlan
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs == 0, s"gate planning launched $jobs jobs on a warm cache")
  }

  test("graph_rich_club: phi is NULL (never NaN) when a cut leaves " +
      "fewer than 2 club vertices") {
    // highest-degree vertex count at an absurd cut: empty club → no row
    // (count-of-empty-group), single-vertex club → NULL phi. Force the
    // single-vertex case synthetically through the public default cuts
    // by checking the invariant on real rows instead: no NaN anywhere.
    val rows = Analytics6.graphRichClub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      if (r.getLong(1) < 2) assert(r.isNullAt(3), s"phi must be NULL at n_k<2: $r")
      else assert(!r.getFloat(3).isNaN, s"NaN phi: $r")
    }
  }

  test("eval_friedman_kendall_w: n/k ride the plan — ONE action, no " +
      "driver-side count() round trips") {
    // AQE splits one action into a job per materialized stage, which
    // drowns the signal; with AQE off, one collect = the final job plus
    // one job per broadcast-exchange build — the r16 form added TWO
    // whole driver count() ACTIONS (with their own stage DAGs) on top
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val (jobs, row) = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Analytics6.evalFriedmanKendallW(spark, sf).collect() // warm
      var j = 0
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          synchronized { j += 1 }
      }
      spark.sparkContext.addSparkListener(l)
      val r = try {
        val rr = Analytics6.evalFriedmanKendallW(spark, sf).collect()
        Thread.sleep(500)
        rr
      } finally spark.sparkContext.removeSparkListener(l)
      (j, r)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // final job + one per broadcast-exchange build (type panel, counts
    // side, nk panel, tie term, …) — measured 6; the r16 driver-count
    // form would add 2 more complete actions on top of whatever the
    // broadcast builds cost, so the pin catches a reintroduction
    assert(jobs <= 6, s"friedman spent $jobs jobs on one call")
    assert(row.length == 1 && row(0).getLong(0) > 0 && row(0).getLong(1) > 0)
  }

  test("tie-term DECIMAL discipline: Mann–Whitney and Wilcoxon emit " +
      "finite statistics with the DECIMAL(38,0) tie moments") {
    val mw = Analytics6.evalMannWhitneyU(spark, sf).collect().head
    assert(!mw.getDouble(4).isNaN && !mw.getDouble(4).isInfinite)
    val wx = Analytics6.evalWilcoxonSignedRank(spark, sf).collect().head
    assert(!wx.getDouble(2).isNaN && !wx.getDouble(2).isInfinite)
  }
}
