package graft.tools

import org.apache.spark.sql.SparkSession

/** Mechanized per-query bench budget (r12 advice #6): time registered
  * queries once at sf0.1 and FAIL LOUDLY (exit 1) when any exceeds its
  * budget — the guard that keeps a plan-recursion bug (the
  * `sample_kcenter_coreset` 179 s incident, r12) from ever reaching an
  * official driver bench again. The rule it mechanizes is r11 advice
  * #6: a new operator lands only if it runs <3 s at sf0.1 OR carries an
  * explicit shared-index amortization / streaming-floor note — those
  * exceptions live in [[amortized]], IN CODE, so an undocumented slow
  * query cannot pass silently (the `SparkEntry.noOracleByDesign`
  * pinning discipline).
  *
  * Usage: runMain graft.tools.BenchBudget [queryName ...]
  *   - no args: the FULL registered surface (retroactive audit mode)
  *   - names:   just those queries (pre-commit check for new operators)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_BUDGET_SEC (default 3.0).
  *
  * Measurement discipline: same session shape as [[graft.Bench]]
  * (clamped local[N], AQE, sorted order) including the untimed sf0.001
  * warm-up, but SINGLE-pass — this is a budget gate with ~2× headroom
  * built into the limits, not a benchmark; best-of-2 belongs to the
  * official bench. Dev/CI tool only — not part of the driver contract.
  */
object BenchBudget {

  /** Documented exceptions: query → (budget seconds, why). Every entry
    * must name the amortization or floor that justifies it; "it's slow"
    * is not a note. Streaming queries pay a fixed micro-batch/state-
    * store floor (~1–2.5 s at any SF); index-builder queries pay a
    * build that later queries in the same family ride for free. */
  val amortized: Map[String, (Double, String)] = Map(
    "stream_stream_join" -> (8.0,
      "two watermarked sources + interval-join state floor; r11 quiet band 2.4 s"),
    "stream_session_window" -> (8.0,
      "session-gap state floor + multi-batch drain; r11 quiet band 1.7 s"),
    "stream_late_data" -> (6.0,
      "multi-batch drain to exercise lateness; floor not data cost"),
    "stream_transform_with_state" -> (6.0,
      "transformWithState store init floor"),
    "stream_anomaly_zscore" -> (6.0,
      "transformWithState store init floor"),
    "stream_dedup_watermark" -> (6.0, "stateful dedup store floor"),
    "stream_foreachbatch_upsert" -> (6.0, "multi-batch foreachBatch floor"),
    "sql_basket_affinity" -> (6.0,
      "builds + persists the (order, brand) pair index other sql_* ride; r11 quiet 1.9 s"),
    "sql_sole_fault_supplier" -> (6.0,
      "rides the persisted lineitem-supplier index; r11 quiet 1.3 s"),
    "graph_pagerank_deep" -> (6.0,
      "20-round BSP with per-round localCheckpoint; constant per-round plan"),
    "graph_reachability" -> (6.0,
      "multi-hop BSP over the persisted adjacency index"),
    "dedup_minhash_lsh" -> (6.0,
      "builds + persists the banded-signature index the dedup family rides"),
    "ml_rf_versions" -> (10.0, "three RF fits (growing windows), seed 42"),
    "ml_importances" -> (8.0, "RF fit behind the importance extract"),
    "ml_predict" -> (8.0, "RF fit behind the scorer"),
    "ts_mann_kendall" -> (4.0,
      "exact inversion-count regime at sf0.1; hot keys ride the sampled-Sen path"),
    // cold single-pass exposes first-builder cost the bench's best-of-2
    // amortizes; each entry names the shared artifact being built
    "graph_closeness_sampled" -> (60.0,
      "builds the persisted multi-landmark BFS index; graph_effective_diameter rides it; ~0.5 s warm"),
    "graph_assortativity" -> (8.0,
      "first builder of the persisted co-purchase edge index the graph family shares"),
    "graph_two_hop_reach" -> (8.0,
      "rides/builds the degree-capped adjacency index (shared with walks/node2vec)"),
    "graph_communities_lpa" -> (6.0,
      "LPA rounds over the shared edge index; builder when first"),
    "dedup_cluster_stats" -> (6.0,
      "builds the persisted LSH candidate-pair index the dedup family shares"),
    "m6_growing_window_importances" -> (10.0,
      "three growing-window RF fits (seed 42), cached for ml_* queries"),
    "ann_ivf_pq_topk" -> (6.0,
      "first builder of the persisted PQ code index (shared with ann_pq_adc_topk / emb_pq_codes); ADC probe itself is sub-second warm"),
    "graph_adamic_adar" -> (10.0,
      "alphabetically first of the graph family — cold it builds the shared co-purchase edge/degree indexes; the cachedDf result serves repeats free"),
    "stream_kalman_filter" -> (6.0,
      "transformWithState store init + drain floor; data work is 3 doubles/user"),
    // r16: the substring family shares ONE persisted window index +
    // census (Dedup.substringWins/substringCensus); alphabetically
    // first dedup_exact_substring pays the Θ(corpus tokens) build,
    // the siblings are width-filtered probes of the persisted tables
    "dedup_exact_substring" -> (8.0,
      "first builder of the shared substring window index + census " +
        "(dedup_substring_multiscale/maximal ride it); probe itself sub-second warm"),
    "dedup_substring_maximal" -> (6.0,
      "islands pass over the persisted window index: one semi-join " +
        "shuffle + doc-bounded windows; builder only when cold-first"),
    "dedup_substring_multiscale" -> (6.0,
      "presentation sort over the persisted census; builder only when " +
        "cold-first (Θ(corpus tokens) three-width pass, ScaleCurve e = 0.45)"),
    "stream_alert_debounce" -> (6.0,
      "transformWithState store init + drain floor; data work is 1 long/user"),
    "stream_eval_ece" -> (6.0,
      "transformWithState store init + drain floor; data work is 3 longs/bin"),
    "stream_drift_psi" -> (6.0,
      "transformWithState store init + drain floor + the batch-side " +
        "baseline-edges head; data work is 2 longs/bin"),
    // r16 arrivals above the default bar
    "graph_ego_betweenness" -> (8.0,
      "~300 M-row broadcast-pipelined courier stream (deg³ per %64 " +
        "center on a mean-degree-120 graph); ~3.6 s warm at 32 threads, " +
        "cold adds the shared edge-index build"),
    "graph_katz_centrality" -> (6.0,
      "3 broadcast rounds over the persisted destination-partitioned " +
        "edge index; builder of pagerank's shared #wdeg when cold-first"),
    "stream_cusum_target" -> (6.0,
      "transformWithState store init + drain floor; data work is " +
        "2 numbers/user"),
    "stream_croston" -> (6.0,
      "transformWithState store init + drain floor; data work is " +
        "4 numbers/user"),
    // r17 arrivals above the default bar
    "graph_sssp_weighted" -> (8.0,
      "4 BSP relaxation rounds, one min-combine shuffle + superstep " +
        "barrier each over the hash(u)-pinned #symlen index (~3 s " +
        "warm); builder of the shared co-purchase projection when " +
        "cold-first"),
    "eval_bootstrap_bca" -> (4.0,
      "two fact passes (the ×50 replica fanout + the jackknife tally), " +
        "each materialized once; ~1.9 s warm at 32 threads")
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val budget = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "3.0").toDouble
    val requested = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val cpus = math.max(1,
      math.min(requested, Runtime.getRuntime.availableProcessors())).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try graft.query.Dedup.dedupMinhashLsh(spark, warmDir).count()
    catch { case _: Throwable => }
    try graft.streaming.StreamQueries.streamWindowAgg(spark, warmDir).count()
    catch { case _: Throwable => }

    val all = graft.SparkEntry.queries
    val selected =
      if (args.nonEmpty) {
        val missing = args.filterNot(all.contains)
        if (missing.nonEmpty) {
          System.err.println(s"unknown queries: ${missing.mkString(", ")}")
          spark.stop(); sys.exit(2)
        }
        args.toSeq.distinct
      } else all.keys.toSeq.sorted

    var over = List.empty[(String, Double, Double)]
    selected.foreach { name =>
      val t0 = System.nanoTime()
      val ok = try { all(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"ERROR $name: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      val cap = amortized.get(name).map(_._1).getOrElse(budget)
      val flag = if (!ok) "ERR " else if (sec > cap) "OVER" else "ok  "
      println(f"$flag $name%-40s ${sec}%8.3f s (cap $cap%5.1f)")
      if (!ok || sec > cap) over ::= ((name, sec, cap))
    }
    spark.stop()
    if (over.nonEmpty) {
      System.err.println(s"BUDGET VIOLATIONS (${over.size}):")
      over.reverse.foreach { case (n, s, c) =>
        System.err.println(f"  $n: ${s}%.3f s > cap ${c}%.1f s — add the " +
          "operator's amortization note to BenchBudget.amortized or fix the plan")
      }
      sys.exit(1)
    }
    println(s"BUDGET OK: ${selected.size} queries within budget at $sfDir")
  }
}
