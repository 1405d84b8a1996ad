package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.ScalarFunctions
import graft.query.{Analytics, Analytics2, Analytics3, Analytics4, Analytics5, Analytics6, Analytics7, Curation, Curation2, Dedup, Endpoints, Multimodal, Pipeline, Relational, Relational2, Relational3, Similarity, TextAnalysis, Warehouse, Warehouse2}
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys follow SURVEY.md §2 operator IDs; each key present in
  * `oracleSql` is hash-compared against DuckDB by the driver at sf0.01.
  *
  * Driver-compare conventions (applied on both sides of every pair):
  *   - identical lowercase column aliases (the compare sorts columns by
  *     name before hashing);
  *   - total ORDER BY for deterministic row order;
  *   - oracle CASTs wherever DuckDB's natural type differs from Spark's
  *     (EXTRACT/length/row_number → BIGINT but Spark emits INT, ceil →
  *     DOUBLE but Spark emits BIGINT, etc.);
  *   - derived float arithmetic is done in double on both sides (IEEE-
  *     identical in any engine; float promotion rules are not).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** Duplicate-detecting Map constructor for the two registries below.
    * A Scala `Map("k" -> a, "k" -> b)` literal silently keeps the LAST
    * pair — which once shadowed an entire query behind another
    * implementation (the `sample_weighted` incident, BASELINE.md).
    * `reg` makes that class of bug impossible: any duplicate key fails
    * loudly at first evaluation, i.e. in every test run, Verify run,
    * and Bench run. */
  private[graft] def reg[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate registry keys (later pair would shadow the earlier): ${dups.toSeq.sorted.mkString(", ")}")
    pairs.toMap
  }

  /** Query keys that deliberately have NO DuckDB oracle (rows-only
    * check by the driver): exactly the RandomForest-backed programs —
    * DuckDB cannot replay Spark MLlib's trained forest. (Round 14
    * shrank this to the 4 RF rows: `ann_ivf_topk` is now the
    * deterministic-Forgy Lloyd's loop, oracle-exact; the MLlib-KMeans
    * form stays as `Similarity.ivfTopK` under its recall-floor specs.)
    * Pinned by RegistrySpec: a 5th member cannot land silently. */
  private[graft] val noOracleByDesign: Set[String] = Set(
    "q1_predict_duration", "q2_sensitivity_ml", "q3_optimal_time_ml",
    "m6_growing_window_importances")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = reg(
    // §2.7 endpoint programs / skeletons
    "q1_agg"                  -> Relational.q1Agg _,
    "q3_optimal_time"         -> Relational.q3OptimalTime _,
    "q2_sensitivity_skeleton" -> Relational.q2SensitivitySkeleton _,
    // §2.1 sources / sinks / stream shapes
    "s1_scan_project"     -> Relational.s1ScanProject _,
    "s2_limit_ordered"    -> Relational.s2LimitOrdered _,
    "s3_coerce_to_float"  -> Relational.s3CoerceToFloat _,
    "s4_json_encode"      -> Relational.s4JsonEncode _,
    "s6_json_decode"      -> Relational.s6JsonDecode _,
    "s7_malformed_filter" -> Relational.s7MalformedFilter _,
    "s9_batch_assign"     -> ((s: SparkSession, d: String) => Relational.s9BatchAssign(s, d)),
    "s11_multiscan_union" -> Relational.s11MultiScanUnion _,
    "s12_inmem_source"    -> Relational.s12InMemSource _,
    // §2.2 transforms
    "t1_bulk_cast"        -> Relational.t1BulkCast _,
    "t2_null_drop"        -> Relational.t2NullDrop _,
    "t3_projection"       -> Relational.t3Projection _,
    "t5_validate_row"     -> Relational.t5ValidateRow _,
    "t6_between_filter"   -> Relational.t6BetweenFilter _,
    "t7_column_override"  -> Relational.t7ColumnOverride _,
    "t8_grid_substitution" -> Relational.t8GridSubstitution _,
    "t9_domain_filter"    -> Relational.t9DomainFilter _,
    // §2.3 aggregations
    "a1_mean_impute"      -> Relational.a1MeanImpute _,
    "a2_scalar_agg"       -> Relational.a2ScalarAgg _,
    "agg_group_stats"     -> Relational.aggGroupStats _,
    "agg_rollup"          -> Relational.aggRollup _,
    "agg_salted_skew"     ->
      ((s: SparkSession, d: String) => Relational.aggSaltedSkew(s, d)),
    // skew-hardened JOIN (salt fact, replicate dim) — oracle-exact vs
    // the plain unsalted join
    "join_salted_skew"    ->
      ((s: SparkSession, d: String) => Relational.joinSaltedSkew(s, d)),
    // bloom runtime-filter join (might_contain prune before the shuffle)
    "join_bloom_prefilter" ->
      ((s: SparkSession, d: String) => Relational.joinBloomPrefilter(s, d)),
    "agg_pivot"           -> Relational.aggPivot _,
    "udaf_weighted_avg"   -> Relational.udafWeightedAvg _,
    "sql_revenue_by_nation" -> Relational.sqlRevenueByNation _,
    // joins
    "join_broadcast_dim"  -> Relational.joinBroadcastDim _,
    "join_shuffle_fact"   -> Relational.joinShuffleFact _,
    "join_star_3way"      -> Relational.joinStar3Way _,
    "join_anti_unordered" -> Relational.joinAntiUnordered _,
    "join_semi_active"    -> Relational.joinSemiActive _,
    "join_asof"           -> Relational.joinAsof _,
    "join_range_bands"    -> Relational.joinRangeBands _,
    "join_left_outer"     -> Relational.joinLeftOuter _,
    "join_full_outer"     -> Relational.joinFullOuter _,
    "set_ops_multiset"    -> Relational.setOpsMultiset _,
    "agg_percentiles"     -> Relational.aggPercentiles _,
    // window functions
    "window_topk_per_key" -> Relational.windowTopkPerKey _,
    "window_running_sum"  -> Relational.windowRunningSum _,
    "window_lag_lead"     -> Relational.windowLagLead _,
    "window_hopping_agg"  -> Relational.windowHoppingAgg _,
    "window_session_agg"  -> Relational.windowSessionAgg _,
    "agg_stats_advanced"  -> Relational.aggStatsAdvanced _,
    // §2.4 sorts / limits
    "o1_sort_importance_desc" -> Relational.o1SortImportanceDesc _,
    "o2_topk_asc"         -> Relational.o2TopkAsc _,
    // set ops
    "set_ops_users"       -> Relational.setOpsUsers _,
    // §2.5 scalar functions
    "f_string_fns"        -> ScalarFunctions.fStringFns _,
    "f_string_advanced"   -> ScalarFunctions.fStringAdvanced _,
    "f_regex_fns"         -> ScalarFunctions.fRegexFns _,
    "f_null_semantics"    -> ScalarFunctions.fNullSemantics _,
    "f_date_fns"          -> ScalarFunctions.fDateFns _,
    "f_date_arith"        -> ScalarFunctions.fDateArith _,
    "f_math_fns"          -> ScalarFunctions.fMathFns _,
    "f_array_fns"         -> ScalarFunctions.fArrayFns _,
    // second-wave relational coverage (Relational2, all oracle-backed)
    "agg_cube"            -> Relational2.aggCube _,
    "agg_count_distinct"  -> Relational2.aggCountDistinct _,
    "agg_min_max_by"      -> Relational2.aggMinMaxBy _,
    "agg_string_concat"   -> Relational2.aggStringConcat _,
    "agg_conditional"     -> Relational2.aggConditional _,
    "window_ranking"      -> Relational2.windowRanking _,
    "window_frames"       -> Relational2.windowFrames _,
    "join_null_safe"      -> Relational2.joinNullSafe _,
    "join_cross_small"    -> Relational2.joinCrossSmall _,
    "subq_correlated"     -> Relational2.subqCorrelated _,
    "sql_cte_ranking"     -> Relational2.sqlCteRanking _,
    "f_map_struct"        -> Relational2.fMapStruct _,
    "f_json_nested"       -> Relational2.fJsonNested _,
    "unpivot_metrics"     -> Relational2.unpivotMetrics _,
    "sample_hash_det"     -> Relational2.sampleHashDet _,
    "o3_limit_offset"     -> Relational2.o3LimitOffset _,
    "ts_gapfill"          -> Relational2.tsGapfill _,
    "part_pruning"        -> Relational2.partPruning _,
    "lateral_explode"     -> Relational2.lateralExplode _,
    "agg_bitwise"         -> Relational2.aggBitwise _,
    "f_try_arith"         -> ScalarFunctions.fTryArith _,
    "f_array_advanced"    -> ScalarFunctions.fArrayAdvanced _,
    "f_ts_fns"            -> ScalarFunctions.fTsFns _,
    "f_bit_fns"           -> ScalarFunctions.fBitFns _,
    "typed_pipeline"      -> Relational2.typedPipeline _,
    "window_range_frame"  -> Relational2.windowRangeFrame _,
    "join_skew_salted"    ->
      ((s: SparkSession, d: String) => Relational2.joinSkewSalted(s, d)),
    // approximate sketches, reshaped for the oracle: exact values plus
    // boolean within-5% contract columns (Relational2.aggApproxSketch)
    // — hash-exact in CORRECTNESS, not part of the rows-only allowlist
    "agg_approx_sketch"   -> Relational2.aggApproxSketch _,
    // §2.6/2.7 ML operators (no SQL oracle — RF scoring; covered by
    // determinism/invariant specs, driver records rows-only checks)
    "m6_growing_window_importances" ->
      ((s: SparkSession, d: String) => Endpoints.m6GrowingWindowImportances(s, d)),
    "q1_predict_duration" ->
      ((s: SparkSession, d: String) => Endpoints.q1Predict(s, d)),
    "q2_sensitivity_ml" ->
      ((s: SparkSession, d: String) => Endpoints.q2Sensitivity(s, d)),
    "q3_optimal_time_ml" ->
      ((s: SparkSession, d: String) => Endpoints.q3OptimalTime(s, d)),
    // north-star: deduplication (SURVEY §7.7)
    "dedup_exact"            -> Dedup.dedupExact _,
    "dedup_minhash_lsh"      ->
      ((s: SparkSession, d: String) => Dedup.dedupMinhashLsh(s, d)),
    "dedup_simhash"          ->
      ((s: SparkSession, d: String) => Dedup.dedupSimhash(s, d)),
    "dedup_ngram_jaccard"    ->
      ((s: SparkSession, d: String) => Dedup.dedupNgramJaccard(s, d)),
    "dedup_groups"           ->
      ((s: SparkSession, d: String) => Dedup.dedupGroups(s, d)),
    "dedup_embedding_cosine" ->
      ((s: SparkSession, d: String) => Dedup.dedupEmbeddingCosine(s, d)),
    // SemDeDup: deterministic-cell cluster + within-cell cosine prune
    "dedup_semantic"         ->
      ((s: SparkSession, d: String) => Dedup.dedupSemantic(s, d)),
    // north-star: similarity search
    "ann_brute_force_topk"   ->
      ((s: SparkSession, d: String) => Similarity.bruteForceTopK(s, d)),
    // contrastive-training hard negatives: per-anchor top-k, label ≠ anchor's
    "ann_hard_negatives"     ->
      ((s: SparkSession, d: String) => Similarity.annHardNegatives(s, d)),
    // MMR greedy diversified retrieval over the brute-force pool
    "retrieval_mmr_topk"     ->
      ((s: SparkSession, d: String) => Similarity.retrievalMmrTopk(s, d)),
    // deterministic-Forgy Lloyd's k-means IVF (2 refinement iterations,
    // exact integer-rational centroids) — oracle-exact since round 14;
    // the MLlib-KMeans form lives on as Similarity.ivfTopK under its
    // recall-floor and nProbe=nCells specs
    "ann_ivf_topk"           ->
      ((s: SparkSession, d: String) => Similarity.ivfLloydTopK(s, d)),
    // deterministic-cell IVF: same probe machinery, hash-exact oracle
    "ann_ivf_det_topk"       ->
      ((s: SparkSession, d: String) => Similarity.ivfDetTopK(s, d)),
    // north-star: text analysis
    "text_quality"           -> TextAnalysis.textQuality _,
    "text_token_count"       -> TextAnalysis.textTokenCount _,
    "text_fingerprint"       -> TextAnalysis.textFingerprint _,
    "text_langid"            -> TextAnalysis.textLangId _,
    "text_scrub"             -> TextAnalysis.textScrub _,
    "text_tfidf"             -> TextAnalysis.textTfidf _,
    "text_ngram_counts"      ->
      ((s: SparkSession, d: String) => TextAnalysis.textNgramCounts(s, d)),
    "text_bm25"              ->
      ((s: SparkSession, d: String) => TextAnalysis.textBm25(s, d)),
    // tokenizer induction: the BPE first-merge pair-frequency table
    "text_bpe_pairs"         ->
      ((s: SparkSession, d: String) => TextAnalysis.textBpePairs(s, d)),
    // hybrid lexical+semantic retrieval fused by reciprocal rank
    "retrieval_rrf_hybrid"   ->
      ((s: SparkSession, d: String) => Similarity.retrievalRrfHybrid(s, d)),
    // driver round 12: late-interaction scoring, mutual-kNN graph,
    // PRF query expansion, DSIR domain weights, WOE/IV, node2vec
    "retrieval_colbert_maxsim" ->
      ((s: SparkSession, d: String) => Similarity.retrievalColbertMaxsim(s, d)),
    "ann_knn_graph_mutual"   ->
      ((s: SparkSession, d: String) => Similarity.annKnnGraphMutual(s, d)),
    "retrieval_prf_expansion" ->
      ((s: SparkSession, d: String) => TextAnalysis.retrievalPrfExpansion(s, d)),
    "corpus_dsir_weights"    ->
      ((s: SparkSession, d: String) => TextAnalysis.corpusDsirWeights(s, d)),
    "feature_woe_iv"         ->
      ((s: SparkSession, d: String) => Pipeline.featureWoeIv(s, d)),
    "graph_node2vec_transitions" ->
      ((s: SparkSession, d: String) => Analytics5.graphNode2vecTransitions(s, d)),
    "dedup_minhash_est_error" ->
      ((s: SparkSession, d: String) => Dedup.dedupMinhashEstError(s, d)),
    "dedup_line_level"       ->
      ((s: SparkSession, d: String) => Dedup.dedupLineLevel(s, d)),
    "pack_bin_ffd"           ->
      ((s: SparkSession, d: String) => Pipeline.packBinFfd(s, d)),
    "graph_closeness_sampled" ->
      ((s: SparkSession, d: String) => Analytics.graphClosenessSampled(s, d)),
    "ts_mann_kendall"        ->
      ((s: SparkSession, d: String) => Analytics4.tsMannKendall(s, d)),
    // image-modality near-dup: REAL javax.imageio decode → integer dHash
    "multimodal_phash_dedup" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalPhashDedup(s, d)),
    // probes the same persisted BFS index as graph_closeness_sampled
    "graph_effective_diameter" ->
      ((s: SparkSession, d: String) => Analytics.graphEffectiveDiameter(s, d)),
    "dq_benford_test"        -> Warehouse2.dqBenfordTest _,
    // integer-exact online z-score gate (transformWithState ValueState)
    "stream_anomaly_zscore"  ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamAnomalyZscore(s, d)),
    "text_kneser_ney"        ->
      ((s: SparkSession, d: String) => TextAnalysis.textKneserNey(s, d)),
    // greedy farthest-point selection: k map-only scans, no libm
    "sample_kcenter_coreset" ->
      ((s: SparkSession, d: String) => Similarity.sampleKcenterCoreset(s, d)),
    // round 12: fixpoint components, skyline, table profiling,
    // calibration, L2 ANN, warehouse maintenance, TPC-H Q2/Q9/Q16 shapes
    "graph_connected_components" ->
      ((s: SparkSession, d: String) => Analytics3.graphConnectedComponents(s, d)),
    "pareto_frontier"        ->
      ((s: SparkSession, d: String) => Analytics3.paretoFrontier(s, d)),
    "profile_table_stats"    -> Analytics3.profileTableStats _,
    "eval_calibration_bins"  -> Analytics3.evalCalibrationBins _,
    "ann_l2_topk"            ->
      ((s: SparkSession, d: String) => Analytics3.annL2TopK(s, d)),
    "drift_chi2_terms"       -> Analytics3.driftChi2Terms _,
    "pii_scan_report"        -> TextAnalysis.piiScanReport _,
    "context_length_bands"   -> TextAnalysis.contextLengthBands _,
    "eval_auc_roc"           -> Analytics3.evalAucRoc _,
    "ts_cusum_changepoint"   ->
      ((s: SparkSession, d: String) => Analytics3.tsCusumChangepoint(s, d)),
    "anomaly_spc_runs"       ->
      ((s: SparkSession, d: String) => Analytics3.anomalySpcRuns(s, d)),
    "dq_constraint_report"   -> Warehouse2.dqConstraintReport _,
    "corpus_diversity_stats" -> TextAnalysis.corpusDiversityStats _,
    "text_bigram_logprob"    -> TextAnalysis.textBigramLogprob _,
    "snapshot_diff"          -> Warehouse2.snapshotDiff _,
    "layout_compaction_plan" ->
      ((s: SparkSession, d: String) => Warehouse2.layoutCompactionPlan(s, d)),
    "mv_incremental_merge"   -> Warehouse2.mvIncrementalMerge _,
    // Δ-join view maintenance: (V ⊲ Δkeys) ∪ (Δ ⋈ dim) == full recompute
    "mv_join_delta"          -> Warehouse2.mvJoinDelta _,
    "sql_product_type_profit" -> Warehouse2.sqlProductTypeProfit _,
    "sql_yearly_growth"      -> Warehouse2.sqlYearlyGrowth _,
    "sql_basket_affinity"    ->
      ((s: SparkSession, d: String) => Warehouse2.sqlBasketAffinity(s, d)),
    "sql_supplier_cnt_by_parttype" -> Warehouse2.sqlSupplierCntByParttype _,
    "sql_min_cost_supplier"  -> Warehouse2.sqlMinCostSupplier _,
    "agg_grouping_sets"      -> Relational2.aggGroupingSets _,
    "o4_sort_nulls"          -> Relational2.o4SortNulls _,
    "t10_distinct"           -> Relational2.t10Distinct _,
    "agg_having"             -> Relational2.aggHaving _,
    "join_self_nextline"     -> Relational2.joinSelfNextline _,
    "f_url_fns"              -> ScalarFunctions.fUrlFns _,
    "window_ratio_to_report" -> Relational2.windowRatioToReport _,
    "set_ops_union_by_name"  -> Relational2.setOpsUnionByName _,
    "window_gaps_islands"    -> Relational2.windowGapsIslands _,
    // round 3: layout-aware joins, merge, windows, sampling, fuzzy match
    "join_bucketed"          -> Relational3.joinBucketed _,
    "merge_upsert"           -> Relational3.mergeUpsert _,
    "window_distribution"    -> Relational3.windowDistribution _,
    "sample_stratified"      -> Relational3.sampleStratified _,
    "dedup_cluster_stats"    -> Relational3.dedupClusterStats _,
    "f_fuzzy_match"          ->
      ((s: SparkSession, d: String) => Relational3.fuzzyNameMatch(s, d)),
    "window_funnel"          ->
      ((s: SparkSession, d: String) => Relational3.windowFunnel(s, d)),
    "window_fill_forward"    -> Relational3.windowFillForward _,
    "text_feature_hashing"   ->
      ((s: SparkSession, d: String) => Relational3.textFeatureHashing(s, d)),
    "ann_lsh_topk"           ->
      ((s: SparkSession, d: String) => Similarity.lshTopK(s, d)),
    // round 4: temporal dimension ops
    "scd2_versions"          ->
      ((s: SparkSession, d: String) => Relational3.scd2Versions(s, d)),
    "scd2_asof_lookup"       ->
      ((s: SparkSession, d: String) => Relational3.scd2AsofLookup(s, d)),
    // round 4: training-data pipeline operators
    "decontaminate_ngram"    ->
      ((s: SparkSession, d: String) => Pipeline.decontaminate(s, d)),
    "pack_sequences"         ->
      ((s: SparkSession, d: String) => Pipeline.packSequences(s, d)),
    "train_test_split"       -> Pipeline.trainTestSplit _,
    "class_weights"          -> Pipeline.classWeights _,
    "text_repetition"        -> Pipeline.textRepetition _,
    "text_top_ngram_cov"     -> TextAnalysis.textTopNgramCoverage _,
    "skew_profile"           -> Pipeline.skewProfile _,
    "quality_topk_per_lang"  ->
      ((s: SparkSession, d: String) => Pipeline.qualityTopkPerLang(s, d)),
    "corpus_mix_budget"      ->
      ((s: SparkSession, d: String) => Pipeline.corpusMixBudget(s, d)),
    "feature_binning"        ->
      ((s: SparkSession, d: String) => Pipeline.featureBinning(s, d)),
    // leave-one-out target encoding with additive smoothing, exact rationals
    "feature_target_encode"  ->
      ((s: SparkSession, d: String) => Pipeline.featureTargetEncode(s, d)),
    "text_inverted_index"    ->
      ((s: SparkSession, d: String) => TextAnalysis.textInvertedIndex(s, d)),
    "eval_confusion"         -> Pipeline.evalConfusion _,
    "window_cumulative_distinct" ->
      ((s: SparkSession, d: String) => Pipeline.windowCumulativeDistinct(s, d)),
    "sample_topk_per_group"  ->
      ((s: SparkSession, d: String) => Pipeline.sampleTopkPerGroup(s, d)),
    // north-star: multimodal plumbing
    "multimodal_summary"     -> Multimodal.multimodalSummary _,
    "multimodal_batch_decode" -> Multimodal.multimodalBatchDecode _,
    // real javax.imageio bytes->pixels decode; oracle replays the
    // expected integer pixel sums arithmetically
    "multimodal_image_decode" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalImageDecode(s, d)),
    // per-channel min/max/mean off the same real raster walk
    "multimodal_image_channel_stats" ->
      ((s: SparkSession, d: String) =>
        Multimodal.multimodalImageChannelStats(s, d)),
    // round 5: text statistics, embedding prototypes, graph/anomaly/
    // sampling/window/sketch analytics
    "text_unigram_logprob"   -> TextAnalysis.unigramLogprob _,
    "text_entropy"           -> TextAnalysis.textEntropy _,
    "cooccur_pmi"            ->
      ((s: SparkSession, d: String) => TextAnalysis.cooccurPmi(s, d)),
    "embedding_centroids"    -> Similarity.embeddingCentroids _,
    "ann_centroid_classify"  -> Similarity.centroidClassify _,
    "graph_triangles"        -> Analytics.graphTriangles _,
    "anomaly_zscore"         ->
      ((s: SparkSession, d: String) => Analytics.anomalyZscore(s, d)),
    // corpus drift monitoring: exact two-sample KS statistic
    "drift_ks_value"         ->
      ((s: SparkSession, d: String) => Analytics.driftKsValue(s, d)),
    // per-bin PSI terms (binned drift, direction-sensitive)
    "drift_psi_value"        ->
      ((s: SparkSession, d: String) => Analytics.driftPsiValue(s, d)),
    // value-proportional Bernoulli sample (P[keep] = value/max) — distinct
    // from the Efraimidis–Spirakis weighted RESERVOIR in `sample_weighted`
    "sample_prop_value"      -> Analytics.sampleWeighted _,
    "window_rolling_median"  ->
      ((s: SparkSession, d: String) => Analytics.rollingMedian(s, d)),
    "window_ewma"            ->
      ((s: SparkSession, d: String) => Analytics.windowEwma(s, d)),
    "agg_sketch_merge"       -> Analytics.aggSketchMerge _,
    "dedup_containment"      ->
      ((s: SparkSession, d: String) => Dedup.dedupContainment(s, d)),
    "graph_pagerank"         ->
      ((s: SparkSession, d: String) => Analytics.graphPagerank(s, d)),
    // Deeper variant with lineage truncation every 3 rounds — the
    // iterate-to-fixpoint shape (plan size stays constant per round).
    // Registered at 6 rounds: the bench pays per-round cost ×iters with
    // zero extra plan coverage past the first checkpoint boundary, and
    // the round-8 driver run showed one 10-round entry eating 23% of the
    // whole bench budget. The 10-round shape itself stays pinned by
    // Round8Spec ("constant per-round plan size") and
    // PartitionInvarianceSpec's 10-round accumulation check.
    "graph_pagerank_deep"    ->
      ((s: SparkSession, d: String) =>
        Analytics.graphPagerank(s, d, iters = 6, checkpointEvery = 3)),
    "agg_mode_per_key"       ->
      ((s: SparkSession, d: String) => Analytics.aggModePerKey(s, d)),
    "ts_resample_interp"     ->
      ((s: SparkSession, d: String) => Analytics.tsResampleInterp(s, d)),
    // Structured Streaming (real streaming queries, AvailableNow drain —
    // full drain == batch answer, which is the oracle)
    "stream_window_agg"      -> StreamQueries.streamWindowAgg _,
    "stream_session_counts"  ->
      ((s: SparkSession, d: String) => StreamQueries.streamSessionCounts(s, d)),
    "stream_dedup_keys"      -> StreamQueries.streamDedupKeys _,
    "stream_static_join"     -> StreamQueries.streamStaticJoin _,
    "stream_stream_join"     ->
      ((s: SparkSession, d: String) => StreamQueries.streamStreamJoin(s, d)),
    // round 6: curation decisions, exact-decimal finance, layout,
    // interval joins, retention, robust outliers, frame sampling
    "dedup_keep_best"        -> Curation.dedupKeepBest _,
    "text_ngram_novelty"     -> Curation.textNgramNovelty _,
    "emb_quantize_int8"      -> Curation.embQuantizeInt8 _,
    "heavy_hitters"          ->
      ((s: SparkSession, d: String) => Curation.heavyHitters(s, d)),
    "cohort_retention"       -> Analytics2.cohortRetention _,
    "anomaly_mad"            ->
      ((s: SparkSession, d: String) => Analytics2.anomalyMad(s, d)),
    "agg_decimal_exact"      -> Analytics2.aggDecimalExact _,
    "sql_shipping_priority"  ->
      ((s: SparkSession, d: String) => Analytics2.sqlShippingPriority(s, d)),
    "ts_interval_overlap"    -> Analytics2.tsIntervalOverlap _,
    "zorder_cluster"         -> Analytics2.zorderCluster _,
    "multimodal_frame_sample" -> Multimodal.multimodalFrameSample _,
    "multimodal_resize_plan" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalResizePlan(s, d)),
    // round 15: REAL nearest-neighbor resample over the decoded raster
    "multimodal_image_resize" ->
      ((sp: SparkSession, d: String) => Multimodal.multimodalImageResize(sp, d)),
    "multimodal_audio_windows" ->
      ((s: SparkSession, d: String) =>
        Multimodal.multimodalAudioWindows(s, d)),
    "ann_filtered_topk"      ->
      ((s: SparkSession, d: String) => Similarity.annFilteredTopK(s, d)),
    "eval_retrieval_metrics" ->
      ((s: SparkSession, d: String) => Similarity.evalRetrievalMetrics(s, d)),
    // JL dimension reduction + exact recall audit (codegen'd jl_project)
    "emb_jl_recall"          ->
      ((s: SparkSession, d: String) => Similarity.embJlRecall(s, d)),
    // JL-projected pre-rank + exact re-rank top-k
    "ann_jl_topk"            ->
      ((s: SparkSession, d: String) => Similarity.annJlTopK(s, d)),
    "corpus_quality_gate"    -> Curation.corpusQualityGate _,
    "emb_pq_codes"           ->
      ((s: SparkSession, d: String) => Curation.embPqCodes(s, d)),
    "ann_pq_adc_topk"        ->
      ((s: SparkSession, d: String) => Curation.annPqAdcTopk(s, d)),
    "multimodal_embed_knn"   ->
      ((s: SparkSession, d: String) => Multimodal.multimodalEmbedKnn(s, d)),
    "export_jsonl_manifest"  ->
      ((s: SparkSession, d: String) =>
        graft.ingest.Export.exportJsonlManifest(s, d)),
    "stream_foreachbatch_upsert" -> StreamQueries.streamForeachbatchUpsert _,
    "agg_countmin_freq"      ->
      ((s: SparkSession, d: String) => Analytics2.aggCountminFreq(s, d)),
    "graph_communities_lpa"  ->
      ((s: SparkSession, d: String) => Analytics.graphCommunitiesLpa(s, d)),
    "ts_seasonal_baseline"   ->
      ((s: SparkSession, d: String) => Analytics2.tsSeasonalBaseline(s, d)),
    // round-6 warehouse suite (TPC-H-derived decision-support shapes)
    "sql_order_priority"     -> Warehouse.sqlOrderPriority _,
    "sql_local_supplier_volume" -> Warehouse.sqlLocalSupplierVolume _,
    "sql_forecast_revenue"   -> Warehouse.sqlForecastRevenue _,
    "sql_cust_order_dist"    -> Warehouse.sqlCustOrderDist _,
    "sql_promo_revenue"      -> Warehouse.sqlPromoRevenue _,
    "sql_top_supplier"       -> Warehouse.sqlTopSupplier _,
    "sql_small_qty_revenue"  -> Warehouse.sqlSmallQtyRevenue _,
    "sql_sole_fault_supplier" -> Warehouse.sqlSoleFaultSupplier _,
    // round-7 warehouse widening (Q7/Q12/Q18/Q19/Q22 shapes)
    "sql_nation_volume_shipping" ->
      ((s: SparkSession, d: String) => Warehouse.sqlNationVolumeShipping(s, d)),
    "sql_priority_linestatus" -> Warehouse.sqlPriorityLinestatus _,
    "sql_large_volume_customer" ->
      ((s: SparkSession, d: String) => Warehouse.sqlLargeVolumeCustomer(s, d)),
    "sql_disjunctive_revenue" -> Warehouse.sqlDisjunctiveRevenue _,
    "sql_sales_opportunity"  ->
      ((s: SparkSession, d: String) => Warehouse.sqlSalesOpportunity(s, d)),
    "sql_market_share"       ->
      ((s: SparkSession, d: String) => Warehouse.sqlMarketShare(s, d)),
    "sql_returned_top_customers" -> Warehouse.sqlReturnedTopCustomers _,
    // round-6 corpus-shaping operators
    "chunk_sliding"          ->
      ((s: SparkSession, d: String) => Curation2.chunkSliding(s, d)),
    "curriculum_phases"      ->
      ((s: SparkSession, d: String) => Curation2.curriculumPhases(s, d)),
    // α=0.5 temperature rebalancing across skewed language groups
    "corpus_temperature_mix" ->
      ((s: SparkSession, d: String) => Curation2.corpusTemperatureMix(s, d)),
    // epoch-repetition materialization: small sources upsampled ⌊f⌋/⌈f⌉
    "corpus_epoch_repeat"    ->
      ((s: SparkSession, d: String) => Curation2.corpusEpochRepeat(s, d)),
    "dedup_incremental"      -> Curation2.dedupIncremental _,
    // round-7: delta-vs-corpus NEAR-dup via the shared MinHash band index
    "dedup_incremental_minhash" ->
      ((s: SparkSession, d: String) => Dedup.dedupIncrementalMinhash(s, d)),
    "path_transitions"       -> Curation2.pathTransitions _,
    "winsorized_stats"       -> Curation2.winsorizedStats _,
    "histogram_equiwidth"    ->
      ((s: SparkSession, d: String) => Curation2.histogramEquiWidth(s, d)),
    "stream_late_data"       -> ((s: SparkSession, d: String) =>
      StreamQueries.streamLateData(s, d)),
    "stream_hopping_agg"     -> StreamQueries.streamHoppingAgg _,
    "stream_session_window"  -> StreamQueries.streamSessionWindowNative _,
    "source_orc_agg"         -> graft.ingest.Formats.orcSourceAgg _,
    "source_jsonl_agg"       -> graft.ingest.Formats.jsonlSourceAgg _,
    // mergeSchema read over mixed-generation parquet (evolved column)
    "source_schema_evolution" -> graft.ingest.Formats.schemaEvolutionAgg _,
    "graph_reachability"     ->
      ((s: SparkSession, d: String) => Analytics.graphReachability(s, d)),
    "ann_radius_search"      ->
      ((s: SparkSession, d: String) => Similarity.annRadiusSearch(s, d)),
    "eval_pr_auc"            -> Analytics4.evalPrAuc _,
    "graph_common_neighbors" ->
      ((s: SparkSession, d: String) => Analytics4.graphCommonNeighbors(s, d)),
    "graph_assortativity"    -> Analytics4.graphAssortativity _,
    "attribution_last_touch" -> Analytics4.attributionLastTouch _,
    "agg_linreg_by_group"    -> Analytics4.aggLinregByGroup _,
    "emb_matryoshka_recall"  ->
      ((s: SparkSession, d: String) => Analytics4.embMatryoshkaRecall(s, d)),
    "join_asof_nearest"      -> Analytics4.joinAsofNearest _,
    "stats_zone_map"         -> Warehouse2.statsZoneMap _,
    "text_gopher_rules"      -> TextAnalysis.textGopherRules _,
    "text_zipf_slope"        ->
      ((s: SparkSession, d: String) => TextAnalysis.textZipfSlope(s, d)),
    "text_llr_collocations"  ->
      ((s: SparkSession, d: String) => TextAnalysis.textLlrCollocations(s, d)),
    "ts_holt_forecast"       -> Analytics4.tsHoltForecast _,
    "retrieval_ndcg"         ->
      ((s: SparkSession, d: String) => Analytics4.retrievalNdcg(s, d)),
    "emb_power_iteration"    ->
      ((s: SparkSession, d: String) => Analytics4.embPowerIteration(s, d)),
    "quality_ablation_report" -> TextAnalysis.qualityAblationReport _,
    "window_rolling_slope"   ->
      ((s: SparkSession, d: String) => Analytics4.windowRollingSlope(s, d)),
    "eval_brier_decomp"      -> Analytics4.evalBrierDecomp _,
    "text_oov_rate"          ->
      ((s: SparkSession, d: String) => TextAnalysis.textOovRate(s, d)),
    "privacy_k_anonymity"    ->
      ((s: SparkSession, d: String) => Warehouse2.privacyKAnonymity(s, d)),
    "window_drawdown"        ->
      ((s: SparkSession, d: String) => Analytics4.windowDrawdown(s, d)),
    "agg_pareto_concentration" -> Analytics4.aggParetoConcentration _,
    "join_asof_tolerance"    ->
      ((s: SparkSession, d: String) => Analytics4.joinAsofTolerance(s, d)),
    "graph_local_clustering" ->
      ((s: SparkSession, d: String) => Analytics4.graphLocalClustering(s, d)),
    "ts_autocorr_lag1"       ->
      ((s: SparkSession, d: String) => Analytics4.tsAutocorrLag1(s, d)),
    "graph_copurchase_weights" ->
      ((s: SparkSession, d: String) => Analytics4.graphCopurchaseWeights(s, d)),
    "text_hapax_stats"       -> TextAnalysis.textHapaxStats _,
    "agg_gini_cents"         -> Analytics4.aggGiniCents _,
    "dedup_prefix_groups"    ->
      ((s: SparkSession, d: String) => Analytics4.dedupPrefixGroups(s, d)),
    "join_dpp_pruned"        -> Relational2.joinDppPruned _,
    "eval_silhouette_centroid" -> Analytics4.evalSilhouetteCentroid _,
    "emb_dim_stats"          -> Analytics4.embDimStats _,
    "ts_holt_backtest"       -> Analytics4.tsHoltBacktest _,
    "privacy_l_diversity"    ->
      ((s: SparkSession, d: String) => Warehouse2.privacyLDiversity(s, d)),
    "dq_freshness_lag"       -> Warehouse2.dqFreshnessLag _,
    "agg_entropy_by_key"     -> Analytics4.aggEntropyByKey _,
    "text_js_divergence"     -> Analytics4.textJsDivergence _,
    "stream_stream_left_join" -> ((s: SparkSession, d: String) =>
      StreamQueries.streamStreamLeftJoin(s, d)),
    "stream_two_level_agg"   -> ((s: SparkSession, d: String) =>
      StreamQueries.streamTwoLevelAgg(s, d)),
    "agg_bitmap_distinct"    -> Analytics4.aggBitmapDistinct _,
    "emb_hubness_stats"      ->
      ((s: SparkSession, d: String) => Analytics4.embHubnessStats(s, d)),
    "sample_weighted"        ->
      ((s: SparkSession, d: String) => Analytics5.sampleWeighted(s, d)),
    "agg_weighted_median"    -> Analytics5.aggWeightedMedian _,
    "ts_interval_union"      ->
      ((s: SparkSession, d: String) => Analytics5.tsIntervalUnion(s, d)),
    "drift_psi"              ->
      ((s: SparkSession, d: String) => Analytics5.driftPsi(s, d)),
    "dq_join_profile"        -> Analytics5.dqJoinProfile _,
    "attribution_linear"     ->
      ((s: SparkSession, d: String) => Analytics5.attributionLinear(s, d)),
    "graph_kcore"            ->
      ((s: SparkSession, d: String) => Analytics5.graphKcore(s, d)),
    "join_edit_distance"     ->
      ((s: SparkSession, d: String) => Analytics5.joinEditDistance(s, d)),
    "f_variant_json"         -> Analytics5.fVariantJson _,
    "dedup_time_window"      ->
      ((s: SparkSession, d: String) => Analytics5.dedupTimeWindow(s, d)),
    "corpus_sample_stratified" -> Analytics5.corpusSampleStratified _,
    "anomaly_rolling_z"      ->
      ((s: SparkSession, d: String) => Analytics5.anomalyRollingZ(s, d)),
    "agg_histogram_quantiles" ->
      ((s: SparkSession, d: String) => Analytics5.aggHistogramQuantiles(s, d)),
    "sql_inactive_customers" -> Analytics5.sqlInactiveCustomers _,
    "stream_transform_with_state" -> StreamQueries.streamTransformWithState _,
    "sql_priority_returns"   -> Analytics5.sqlPriorityReturns _,
    "quality_lang_confusion" -> Analytics5.qualityLangConfusion _,
    "agg_dow_hour_grid"      -> Analytics5.aggDowHourGrid _,
    "graph_two_hop_reach"    -> Analytics5.graphTwoHopReach _,
    "privacy_dp_counts"      ->
      ((s: SparkSession, d: String) => Analytics5.privacyDpCounts(s, d)),
    "corpus_mix_weights"     -> Analytics5.corpusMixWeights _,
    "eval_ks_test"           -> Analytics5.evalKsTest _,
    "sql_monthly_cum_revenue" -> Analytics5.sqlMonthlyCumRevenue _,
    "stream_idle_timeout"    ->
      ((s: SparkSession, d: String) => StreamQueries.streamIdleTimeout(s, d)),
    "eval_decile_lift"       -> Analytics5.evalDecileLift _,
    "privacy_t_closeness_tv" -> Analytics5.privacyTClosenessTv _,
    "dq_volume_anomaly"      -> Analytics5.dqVolumeAnomaly _,
    "stream_user_top_values" -> StreamQueries.streamUserTopValues _,
    "stream_user_type_counts" -> StreamQueries.streamUserTypeCounts _,
    "ann_recall_curve"       ->
      ((s: SparkSession, d: String) => Similarity.annRecallCurve(s, d)),
    "emb_cell_balance"       ->
      ((s: SparkSession, d: String) => Similarity.embCellBalance(s, d)),
    "text_rare_span"         ->
      ((s: SparkSession, d: String) => TextAnalysis.textRareSpan(s, d)),
    "join_asof_forward"      ->
      ((s: SparkSession, d: String) => Analytics5.joinAsofForward(s, d)),
    "graph_degree_bands"     -> Analytics5.graphDegreeBands _,
    // round 15: keyword extraction, streaming SCD2 point-in-time
    // enrichment, and additive seasonal-trend decomposition
    "text_keywords_topk"     ->
      ((s: SparkSession, d: String) => TextAnalysis.textKeywordsTopk(s, d)),
    "stream_scd2_enrich"     ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamScd2Enrich(s, d)),
    "ts_stl_decompose"       -> Analytics5.tsStlDecompose _,
    // per-key sequential recurrence via flatMapSortedGroups (sorted-group
    // streaming iteration — the typed-API shape windows can't express)
    "anomaly_alert_debounce" ->
      ((s: SparkSession, d: String) => Analytics5.anomalyAlertDebounce(s, d)),
    // integer-exact HITS on the bipartite order↔part graph. Registered at
    // iters=2 (each round is TWO joins — the 3-round shape costs ~2×
    // pagerank-3 at bench scale and is pinned by Round15Spec instead)
    "graph_hits"             ->
      ((s: SparkSession, d: String) => Analytics5.graphHits(s, d, iters = 2)),
    // Welch's two-sample t-test from exact scaled-integer moments
    "agg_ttest_welch"        -> Analytics5.aggTtestWelch _,
    // streaming token-bucket admission control (transformWithState)
    "stream_rate_limit"      ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamRateLimit(s, d)),
    // shot segmentation over sampled frames (video-curation shape)
    "multimodal_scene_cuts"  ->
      ((s: SparkSession, d: String) => Multimodal.multimodalSceneCuts(s, d)),
    // spectral power at candidate periods over the hourly rollup
    "ts_periodogram"         ->
      ((s: SparkSession, d: String) => Analytics5.tsPeriodogram(s, d)),
    // exact distribution-shape moments via DECIMAL(38) power sums
    "agg_skew_kurtosis"      -> Analytics5.aggSkewKurtosis _,
    // RFM quintile segmentation (the CRM derived-feature table)
    "sql_customer_rfm"       -> Warehouse2.sqlCustomerRfm _,
    // TPC-H Q20 shape: suppliers with excess stock of a named part family
    "sql_excess_stock"       -> Warehouse2.sqlExcessStock _,
    // the third standard attribution model (exponential time decay)
    "attribution_time_decay" ->
      ((s: SparkSession, d: String) => Analytics5.attributionTimeDecay(s, d)),
    // monetary cohort analysis (exact integer cumulative LTV curve)
    "cohort_ltv"             -> Analytics2.cohortLtv _,
    // community-quality score for the LPA labels
    "graph_modularity"       -> Analytics5.graphModularity _,
    // cross-document boilerplate fraction (CCNet-style template strip)
    "text_boilerplate_frac"  ->
      ((s: SparkSession, d: String) => TextAnalysis.textBoilerplateFrac(s, d)),
    // Pareto stock-control classes over exact-cents revenue
    "sql_abc_analysis"       -> Warehouse2.sqlAbcAnalysis _,
    // chance-corrected inter-rater agreement (deterministic raters)
    "eval_cohens_kappa"      -> Analytics5.evalCohensKappa _,
    // McNemar's paired discordant test between the two labelers
    "eval_mcnemar"           -> Analytics5.evalMcnemar _,
    // Fleiss' kappa: 3-rater 3-category chance-corrected agreement
    "eval_fleiss_kappa"      -> Analytics5.evalFleissKappa _,
    // Spearman rho + Kendall tau-b between two quality signals, per lang
    "eval_rank_corr"         -> Analytics5.evalRankCorr _,
    // Bradley-Terry arena ratings: 8 unrolled MM rounds, bit-identical
    "eval_bradley_terry"     ->
      ((s: SparkSession, d: String) => Analytics5.evalBradleyTerry(s, d)),
    // Krippendorff's alpha: 3 raters with 25% PRF missingness, nominal
    "eval_krippendorff_alpha" -> Analytics5.evalKrippendorffAlpha _,
    // DeLong AUC variance + 95% CI (tie-aware integer placements)
    "eval_auc_delong"        -> Analytics3.evalAucDelong _,
    // 50-replica deterministic Poisson bootstrap of the paired delta
    "eval_paired_bootstrap"  ->
      ((s: SparkSession, d: String) => Analytics5.evalPairedBootstrap(s, d)),
    // delta-maintenance CC: contract delta onto labels, relabel touched
    "graph_cc_incremental"   ->
      ((s: SparkSession, d: String) => Analytics3.graphCcIncremental(s, d)),
    // pairwise win rates + Wilson 95% bounds per model matchup
    "eval_win_rate_matrix"   -> Analytics5.evalWinRateMatrix _,
    // Warner randomized response (local DP) with debiased estimate
    "privacy_rand_response"  -> Analytics5.privacyRandResponse _,
    // binary sign-code ANN: popcount(xor) top-k, the RAM-efficiency tier
    "ann_hamming_topk"       ->
      ((s: SparkSession, d: String) => Similarity.annHammingTopK(s, d)),
    // MIH banded Hamming: 4x15-bit band index, <=3-distance recall
    // guaranteed by pigeonhole; candidate count emitted for audit
    "ann_hamming_mih"        ->
      ((s: SparkSession, d: String) => Similarity.annHammingMih(s, d)),
    // DPO prep: (chosen, rejected) + margin per 4-doc candidate group
    "pref_pair_margin"       ->
      ((s: SparkSession, d: String) => Curation2.prefPairMargin(s, d)),
    // CCNet head/middle/tail fluency terciles per language
    "corpus_ccnet_buckets"   ->
      ((s: SparkSession, d: String) => Curation2.corpusCcnetBuckets(s, d)),
    // T5 span-corruption plan: PRF-placed non-overlapping mask spans
    "text_span_mask_plan"    ->
      ((s: SparkSession, d: String) => TextAnalysis.textSpanMaskPlan(s, d)),
    // fulfillment SLA panel (exact integer-day percentiles)
    "sql_lead_time_percentiles" -> Warehouse2.sqlLeadTimePercentiles _,
    // BPE merge application + fertility audit (tokenizer induction end)
    "text_bpe_encode"        ->
      ((s: SparkSession, d: String) => TextAnalysis.textBpeEncode(s, d)),
    // replayable DeepWalk-style sampling over the graph index
    "graph_random_walks"     ->
      ((s: SparkSession, d: String) => Analytics5.graphRandomWalks(s, d)),
    // skip-gram pair counts over the walk corpus (DeepWalk step 2)
    "graph_walk_cooccurrence" ->
      ((s: SparkSession, d: String) => Analytics5.graphWalkCooccurrence(s, d)),
    // exact streaming distinct per window (dedup→aggregate chain)
    "stream_windowed_distinct" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamWindowedDistinct(s, d)),
    // PK half of the constraint audit (FK half: dq_constraint_report)
    "dq_pk_uniqueness"       -> Warehouse2.dqPkUniqueness _,
    // Kadane best-streak per user (sorted-group sequential recurrence)
    "window_max_subarray"    -> Analytics5.windowMaxSubarray _,
    // market-basket rule panel (confidence/lift over the pair index)
    "sql_basket_rules"       ->
      ((s: SparkSession, d: String) => Analytics5.sqlBasketRules(s, d)),
    // round 13: layered ANN seed, fixed-window exact-substring census,
    // two-stage retrieval rerank (pool-bounded pairwise scorer)
    "ann_hnsw_layers"        ->
      ((s: SparkSession, d: String) => Similarity.annHnswLayers(s, d)),
    "dedup_exact_substring"  ->
      ((s: SparkSession, d: String) => Dedup.dedupExactSubstring(s, d)),
    "retrieval_rerank_crossenc" ->
      ((s: SparkSession, d: String) => Similarity.retrievalRerankCrossenc(s, d)),
    // IVFADC composite: probed cells × PQ code index, all-deterministic
    "ann_ivf_pq_topk"        ->
      ((s: SparkSession, d: String) => Curation.annIvfPqTopk(s, d)),
    // green-list watermark detector (map-only bigram PRF test + z)
    "text_watermark_detect"  ->
      ((s: SparkSession, d: String) => TextAnalysis.textWatermarkDetect(s, d)),
    // the pass@k estimator in its stable product form
    "eval_pass_at_k"         ->
      ((s: SparkSession, d: String) => Analytics4.evalPassAtK(s, d)),
    // ROUGE-N clipped-overlap P/R/F1 over adjacent-doc pairs
    "eval_rouge_n"           ->
      ((s: SparkSession, d: String) => TextAnalysis.evalRougeN(s, d)),
    // BLEU-2 modified precisions + brevity penalty, same pair grain
    "eval_bleu"              ->
      ((s: SparkSession, d: String) => TextAnalysis.evalBleu(s, d)),
    // chrF2: character 1..3-gram F-score (β=2), whitespace-stripped
    "eval_chrf"              ->
      ((s: SparkSession, d: String) => TextAnalysis.evalChrf(s, d)),
    // exact-rational covariance matrix (whitening/PCA input)
    "emb_covariance_int"     ->
      ((s: SparkSession, d: String) => Analytics4.embCovarianceInt(s, d)),
    // white-noise portmanteau terms per (user, lag)
    "ts_ljung_box_terms"     ->
      ((s: SparkSession, d: String) => Analytics4.tsLjungBoxTerms(s, d)),
    // AMS F2 frequency-moment sketch beside its exact companion
    "agg_ams_f2"             ->
      ((s: SparkSession, d: String) => Analytics4.aggAmsF2(s, d)),
    // hourly OHLC candles via keyed min_by/max_by (no window)
    "ts_ohlc_hourly"         ->
      ((s: SparkSession, d: String) => Analytics4.tsOhlcHourly(s, d)),
    // Rabin-style content-defined chunk spans (map-only)
    "text_cdc_chunking"      ->
      ((s: SparkSession, d: String) => TextAnalysis.textCdcChunking(s, d)),
    // per-cell mutual-information contributions (never pre-summed)
    "feature_mutual_info_terms" ->
      ((s: SparkSession, d: String) => Pipeline.featureMutualInfoTerms(s, d)),
    // Laplace-mechanism DP counts with a replayable PRF noise draw
    "dq_dp_laplace_counts"   ->
      ((s: SparkSession, d: String) => Warehouse2.dqDpLaplaceCounts(s, d)),
    // Neyman-optimal stratified allocation, largest-remainder exact
    "sample_neyman_allocation" ->
      ((s: SparkSession, d: String) => Relational3.sampleNeymanAllocation(s, d)),
    // DoReMi-style uniform-target domain mixture plan (rates/epochs/deficit)
    "sample_domain_mixture"  ->
      ((s: SparkSession, d: String) => Curation2.sampleDomainMixture(s, d)),
    // per-zone Bloom signatures vs min/max maps for point-lookup skipping
    "layout_bloom_prune"     ->
      ((s: SparkSession, d: String) => Warehouse2.layoutBloomPrune(s, d)),
    // DSIR hashed-unigram importance weights vs the lang='en' target slice
    "text_dsir_importance"   ->
      ((s: SparkSession, d: String) => Curation2.textDsirImportance(s, d)),
    // Adamic-Adar link prediction (1/ln(deg) wedge weights)
    "graph_adamic_adar"      ->
      ((s: SparkSession, d: String) => Analytics4.graphAdamicAdar(s, d)),
    // closed-form (minimax) weighted isotonic calibration over bins
    "ml_isotonic_calibration" ->
      ((s: SparkSession, d: String) => Analytics3.mlIsotonicCalibration(s, d)),
    // per-user local-level Kalman filter (sorted-group recurrence)
    "ts_kalman_1d"           ->
      ((s: SparkSession, d: String) => Analytics4.tsKalman1d(s, d)),
    // its streaming twin: ValueState carries (rn, x, P); drain == batch
    "stream_kalman_filter"   ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamKalmanFilter(s, d)),
    // live OHLC candles: ordered first/last as mergeable min_by/max_by
    "stream_ohlc_candles"    ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamOhlcCandles(s, d)),
    // rolling mean ± 2σ envelope with integer-exact breakout verdicts
    "window_bollinger_bands" ->
      ((s: SparkSession, d: String) => Analytics4.windowBollingerBands(s, d)),
    // rolling-median/MAD despiker — all picks, nothing to drift
    "window_hampel_filter"   ->
      ((s: SparkSession, d: String) => Analytics4.windowHampelFilter(s, d)),
    // PACF via unrolled Durbin–Levinson layers over the shared lag-ρ
    "ts_pacf_durbin_levinson" ->
      ((s: SparkSession, d: String) => Analytics4.tsPacfDurbinLevinson(s, d)),
    // heavy-tail-robust mean (median of 16 hash-bucket means)
    "agg_median_of_means"    ->
      ((s: SparkSession, d: String) => Analytics4.aggMedianOfMeans(s, d)),
    // round 14: REAL BPE training — iterative count→select→merge→RECOUNT
    "text_bpe_train"         ->
      ((s: SparkSession, d: String) => TextAnalysis.textBpeTrain(s, d)),
    // round 14: streaming incremental near-dup — per-micro-batch band-
    // index probe + ListState intra-delta candidates; drain == batch
    "stream_dedup_incremental" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamDedupIncremental(s, d)),
    // round 18: streaming IVF maintenance — per-micro-batch assignment
    // of arriving delta vectors into the persisted corpus-trained
    // cells; ValueState cumulative occupancy; drain == batch report
    "stream_ann_ivf_assign" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamAnnIvfAssign(s, d)),
    // round 15: monitoring twins — per-bin ValueState counters whose
    // drained panels feed the SAME epilogue as the batch queries
    "stream_eval_ece" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamEvalEce(s, d)),
    "stream_drift_psi" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamDriftPsi(s, d)),
    // round 16: the alert debouncer on its home turf — one-long-per-user
    // anchor ValueState; drain == batch row-for-row, shared CTE oracle
    "stream_alert_debounce" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.StreamQueries.streamAlertDebounce(s, d)),
    // round 14: multi-granularity substring census — widths {8,16,32}
    // share one tokenize pass and one shuffle; spans report their
    // maximal length class
    "dedup_substring_multiscale" ->
      ((s: SparkSession, d: String) => Dedup.dedupSubstringMultiscale(s, d)),
    // round 15: exact maximal repeated spans — gaps-and-islands over
    // the covered window positions, one extra shuffle over the census
    "dedup_substring_maximal" ->
      ((s: SparkSession, d: String) => Dedup.dedupSubstringMaximal(s, d)),
    // round 14: real RIFF/PCM bytes→samples audio decode (whole-clip
    // stats + per-STFT-frame features over the decoded array)
    "multimodal_audio_decode" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalAudioDecode(s, d)),
    "multimodal_audio_frames" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalAudioFrames(s, d)),
    // round 14: energy-threshold VAD segments over the decoded frames
    "multimodal_audio_vad" ->
      ((s: SparkSession, d: String) => Multimodal.multimodalAudioVad(s, d)),
    // round 14: the trained tokenizer's unit-frequency vocabulary
    "text_bpe_vocab"         ->
      ((s: SparkSession, d: String) => TextAnalysis.textBpeVocab(s, d)),
    // per-lang fertility of the TRAINED tokenizer (vocab-grain apply)
    "text_bpe_fertility"     ->
      ((s: SparkSession, d: String) => TextAnalysis.textBpeFertility(s, d)),
    // per-source exact -> near-dup survivor funnel off the shared indexes
    "dedup_cascade_report"   ->
      ((s: SparkSession, d: String) => Dedup.dedupCascadeReport(s, d)),
    // leak-free LM scoring: train on even docs, score odd (+1 smoothing)
    "text_heldout_perplexity" -> TextAnalysis.textHeldoutPerplexity _,
    // bounded-state MV: top-k maintained from state + insert tranche
    "mv_topk_delta"          ->
      ((s: SparkSession, d: String) => Warehouse2.mvTopkDelta(s, d)),
    // pairwise source-vocabulary Jaccard via one bitmask aggregate
    "corpus_source_overlap"  ->
      ((s: SparkSession, d: String) => Curation2.corpusSourceOverlap(s, d)),
    // exact mean pairwise intra-label dot via the sum-vector identity
    "emb_label_cohesion"     -> Analytics4.embLabelCohesion _,
    // exact mean cross-label dot (Sa.Sb) per label pair
    "emb_label_separation"   -> Analytics4.embLabelSeparation _,
    // systematic PPS sampling: integer anchor+step on cumulative cents
    "sample_pps_systematic"  ->
      ((s: SparkSession, d: String) => Analytics5.samplePpsSystematic(s, d)),
    // expected / maximum calibration error over the reliability bins
    "eval_ece"               -> Analytics3.evalEce _,
    // Matthews correlation + balanced accuracy + Youden's J
    "eval_mcc"               -> Analytics5.evalMcc _,
    // round 15: continuous-rating reliability (2-way random effects)
    "eval_icc"               -> ((sp: SparkSession, d: String) =>
      Analytics5.evalIcc(sp, d)),
    // round 15: robust trend slope (median of pairwise hourly slopes)
    "ts_theil_sen"           ->
      ((s: SparkSession, d: String) => Analytics5.tsTheilSen(s, d)),
    // round 15: Benford first-digit audit over exact cents
    "dq_benford_law"         -> Analytics5.dqBenfordLaw _,
    "stream_dq_benford"      -> ((sp: SparkSession, d: String) =>
      graft.streaming.StreamQueries.streamDqBenford(sp, d)),
    // round 15: Flesch / FK readability from regex count surrogates
    "text_readability"       -> ((sp: SparkSession, d: String) =>
      TextAnalysis.textReadability(sp, d)),
    // cld3-style char-trigram language ID (even-doc-trained model)
    "text_langid_chargram"   -> TextAnalysis.textLangidChargram _,
    // exponential-mechanism (Gumbel-max) DP top-k selection
    "privacy_dp_topk"        ->
      ((s: SparkSession, d: String) => Analytics5.privacyDpTopk(s, d)),
    // corpus entropy rate: H(X2|X1) vs H(X) and the predictability ratio
    "text_bigram_entropy_rate" -> TextAnalysis.textBigramEntropyRate _,
    // ordinal (squared-distance) Krippendorff for graded annotations
    "eval_krippendorff_ordinal" -> Analytics5.evalKrippendorffOrdinal _,
    // per-lang source-mix entropy and the effective source count
    "corpus_mix_entropy"     -> Curation2.corpusMixEntropy _,
    // truncated RBO: top-weighted agreement of two document rankers
    "eval_topk_agreement"    ->
      ((s: SparkSession, d: String) => Analytics5.evalTopkAgreement(s, d)),
    // exact per-lang token-length percentiles (context budgeting)
    "corpus_length_percentiles" -> Curation2.corpusLengthPercentiles _,
    // round 16: tie-corrected two-sample rank-sum (2×-integer ranks)
    "eval_mann_whitney_u"    -> Analytics6.evalMannWhitneyU _,
    // round 16: ordinal effect size beside the rank-test p-value
    "eval_cliffs_delta"      -> Analytics6.evalCliffsDelta _,
    // round 16: paired signed-rank on per-user activity-count deltas
    "eval_wilcoxon_signed_rank" -> Analytics6.evalWilcoxonSignedRank _,
    // round 16: attenuated-path centrality on the co-purchase graph
    "graph_katz_centrality"  -> ((s: SparkSession, d: String) =>
      Analytics6.graphKatzCentrality(s, d)),
    // round 16: Page's one-sided CUSUM vs a fixed target (live detector)
    "ts_cusum_target"        -> ((s: SparkSession, d: String) =>
      Analytics6.tsCusumTarget(s, d)),
    "stream_cusum_target"    -> ((sp: SparkSession, d: String) =>
      graft.streaming.StreamQueries.streamCusumTarget(sp, d)),
    // round 16: TOST — the test that can conclude "equivalent"
    "eval_tost_equivalence"  -> ((s: SparkSession, d: String) =>
      Analytics6.evalTostEquivalence(s, d)),
    // round 16: prevalence-stable agreement beside Cohen's kappa
    "eval_gwet_ac1"          -> Analytics6.evalGwetAc1 _,
    // round 16: intermittent-demand smoother (demand and gap separately)
    "ts_croston"             -> ((s: SparkSession, d: String) =>
      Analytics6.tsCroston(s, d)),
    // round 16: exponential-mechanism DP median over a candidate grid
    "privacy_dp_quantile"    -> ((s: SparkSession, d: String) =>
      Analytics6.privacyDpQuantile(s, d)),
    // round 16: standardized effect size beside the t/TOST verdicts
    "eval_cohens_d"          -> Analytics6.evalCohensD _,
    // round 16: rolling autocorrelation regime monitor
    "window_rolling_autocorr" -> ((s: SparkSession, d: String) =>
      Analytics6.windowRollingCorr(s, d)),
    // round 16: R/S long-memory diagnostic on the hourly series
    "ts_hurst_exponent"      -> ((s: SparkSession, d: String) =>
      Analytics6.tsHurstExponent(s, d)),
    // round 16: Everett–Borgatti ego betweenness (brokerage centrality)
    "graph_ego_betweenness"  -> ((s: SparkSession, d: String) =>
      Analytics6.graphEgoBetweenness(s, d)),
    // round 19: the %512 sampled center cohort — same plan, 8× fewer
    // centers, which is what makes the x10 oracle replay disk-feasible
    "graph_ego_betweenness_s512" -> ((s: SparkSession, d: String) =>
      Analytics6.graphEgoBetweenness(s, d, cohortMod = 512)),
    // round 16: minimum detectable effect at the observed sample sizes
    "eval_mde_power"         -> Analytics6.evalMdePower _,
    // round 16: dup-rate curve over Jaccard cuts off the pair index
    "dedup_threshold_curve"  -> ((s: SparkSession, d: String) =>
      Analytics6.dedupThresholdCurve(s, d)),
    // round 16: SAX symbol strings (z-norm → PAA → quartile alphabet)
    "ts_sax_symbolic"        -> ((s: SparkSession, d: String) =>
      Analytics6.tsSaxSymbolic(s, d)),
    "stream_croston"         -> ((sp: SparkSession, d: String) =>
      graft.streaming.StreamQueries.streamCroston(sp, d)),
    // round 16: decomposable inequality beside the Lorenz pair
    "agg_theil_index"        -> Analytics6.aggTheilIndex _,
    // round 16: do hubs trade with hubs (panel of degree cuts)
    "graph_rich_club"        -> ((s: SparkSession, d: String) =>
      Analytics6.graphRichClub(s, d)),
    // round 16: lead-lag cross-correlation on the hourly grid
    "ts_ccf_lags"            -> ((s: SparkSession, d: String) =>
      Analytics6.tsCcfLags(s, d)),
    // round 16: repeated-measures k-system test + rater concordance
    "eval_friedman_kendall_w" -> Analytics6.evalFriedmanKendallW _,
    // round 17: weighted shortest paths (frontier-pruned Bellman-Ford)
    "graph_sssp_weighted"    -> ((s: SparkSession, d: String) =>
      Analytics7.graphSsspWeighted(s, d)),
    // round 17: BCa interval over the deterministic bootstrap replicas
    "eval_bootstrap_bca"     -> ((s: SparkSession, d: String) =>
      Analytics7.evalBootstrapBca(s, d)),
    // round 19: the 100 TB form — replicas over a deterministic
    // hash-threshold subsample, √(N/n) widening emitted beside the CI
    "eval_bootstrap_bca_sampled" -> ((s: SparkSession, d: String) =>
      Analytics7.evalBootstrapBcaSampled(s, d)),
    // round 17: DP clipped-sum mean (the Laplace release for means)
    "privacy_dp_clipped_mean" -> ((s: SparkSession, d: String) =>
      Analytics7.privacyDpClippedMean(s, d)),
    // round 18: ε-ledger with basic + advanced composition bounds over
    // the standing release inventory (exact µε grid)
    "privacy_budget_ledger" -> ((s: SparkSession, d: String) =>
      Analytics7.privacyBudgetLedger(s, d)),
    // round 17: delta-batch assignment into the persisted IVF cells
    "ann_ivf_delta_assign"   -> ((s: SparkSession, d: String) =>
      Similarity.annIvfDeltaAssign(s, d)),
  )

  /** The [[graft.query.Analytics5.evalBradleyTerry]] oracle: the MM
    * fixpoint unrolled into `iters` CTE layers over the 20-cell win
    * matrix, each layer the IDENTICAL fixed-parenthesization scalar
    * expressions the Spark column layers evaluate — the
    * ts_pacf_durbin_levinson discipline, so the float ratings are
    * bit-identical. Generated, not hand-written: both sides derive
    * from the same slot/iteration loop shape. */
  private def btOracleSql(iters: Int): String = {
    val k = Analytics5.btSlots
    val slots = 0 until k
    def others(a: Int) = slots.filter(_ != a)
    val cells = (for (a <- slots; b <- slots if a != b) yield
      s"""CAST(coalesce(sum(CASE WHEN wi = $a AND li = $b THEN 1 END), 0)
         |      AS BIGINT) AS w_${a}_$b""".stripMargin).mkString(",\n    ")
    val wNames = (for (a <- slots; b <- slots if a != b)
      yield s"w_${a}_$b").mkString(", ")
    val p0 = slots.map(a =>
      s"CASE WHEN $a < (SELECT count(*) FROM t) THEN 1.0 ELSE 0.0 END " +
        s"AS p$a").mkString(", ")
    val layers = (1 to iters).map { r =>
      val ps = slots.map { a =>
        val wa = others(a).map(b => s"w_${a}_$b").mkString(" + ")
        val den = others(a).map(b =>
          s"CASE WHEN (p$a + p$b) > 0 THEN " +
            s"CAST(w_${a}_$b + w_${b}_$a AS DOUBLE) / (p$a + p$b) " +
            s"ELSE 0.0 END")
          .mkString(" + ")
        s"""CASE WHEN ($wa) > 0 AND ($den) > 0
           |      THEN CAST($wa AS DOUBLE) / ($den) ELSE p$a END AS p$a"""
          .stripMargin
      }.mkString(",\n    ")
      s"it$r AS (\n  SELECT $wNames,\n    $ps\n  FROM it${r - 1}\n)"
    }.mkString(", ")
    val tot = slots.map(a => s"p$a").mkString(" + ")
    val finals = slots.map { a =>
      val wins = others(a).map(b => s"w_${a}_$b").mkString(" + ")
      val losses = others(a).map(b => s"w_${b}_$a").mkString(" + ")
      s"""SELECT $a AS idx, CAST($wins AS BIGINT) AS wins,
         |    CAST($losses AS BIGINT) AS losses,
         |    CAST(p$a / ($tot) AS REAL) AS rating FROM it$iters"""
        .stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    CAST(round(value * 1000.0) AS BIGINT) AS v3 FROM events
       |), t AS (
       |  SELECT * FROM (
       |    SELECT event_type,
       |      CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT)
       |        AS idx
       |    FROM (SELECT DISTINCT event_type FROM e)
       |  ) WHERE idx < $k
       |), m AS (
       |  SELECT event_id // 2 AS match_id,
       |    arg_min(event_type, event_id % 2) AS ta,
       |    arg_min(v3, event_id % 2) AS va,
       |    arg_max(event_type, event_id % 2) AS tb,
       |    arg_max(v3, event_id % 2) AS vb,
       |    count(*) AS cnt
       |  FROM e GROUP BY 1
       |), wl AS (
       |  SELECT CASE WHEN va >= vb THEN x.idx ELSE y.idx END AS wi,
       |    CASE WHEN va >= vb THEN y.idx ELSE x.idx END AS li
       |  FROM m JOIN t x ON m.ta = x.event_type
       |    JOIN t y ON m.tb = y.event_type
       |  WHERE cnt = 2 AND ta <> tb
       |), it0 AS (
       |  SELECT $wNames, $p0 FROM (
       |    SELECT
       |    $cells
       |    FROM wl)
       |), $layers, f AS (
       |  $finals
       |)
       |SELECT t.event_type AS model, f.idx, f.wins, f.losses,
       |  CAST(f.wins + f.losses AS BIGINT) AS n_matches, f.rating
       |FROM f JOIN t USING (idx) ORDER BY model""".stripMargin
  }

  /** The [[graft.query.Analytics5.evalTopkAgreement]] oracle: prefix
    * overlaps from the cumulative histogram of max(rank_a, rank_b),
    * the SHARED truncated-RBO weight literals per depth. */
  private def topkAgreementOracleSql(k: Int): String = {
    val rows = (1 to k).map { d =>
      val w = Analytics5.rboWeights(d - 1)
      // literals go through DOUBLE explicitly: a bare decimal parses
      // as DECIMAL in DuckDB and CAST(DECIMAL AS REAL) can round to
      // the adjacent float vs the double->float path Spark takes
      s"""SELECT $d AS depth,
         |    CAST(coalesce(sum(CASE WHEN m <= $d THEN 1 END), 0)
         |      AS BIGINT) AS overlap,
         |    CAST(coalesce(sum(CASE WHEN m <= $d THEN 1 END), 0)
         |      / CAST($d AS DOUBLE) AS REAL) AS agreement,
         |    CAST(CAST($w AS DOUBLE) AS REAL) AS weight,
         |    CAST(CAST($w AS DOUBLE)
         |      * (coalesce(sum(CASE WHEN m <= $d THEN 1 END), 0)
         |      / CAST($d AS DOUBLE)) AS REAL) AS contribution
         |  FROM m""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH s AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS sa,
       |    CAST(len(list_distinct(string_split(lower(trim(
       |      regexp_replace(text, '\\s+', ' ', 'g'))), ' ')))
       |      AS BIGINT) AS sb
       |  FROM documents
       |), r AS (
       |  SELECT greatest(
       |    row_number() OVER (ORDER BY sa DESC, doc_id),
       |    row_number() OVER (ORDER BY sb DESC, doc_id)) AS m
       |  FROM s
       |), m AS (SELECT m FROM r)
       |SELECT * FROM (
       |  $rows
       |) ORDER BY depth""".stripMargin
  }

  /** The [[graft.query.Analytics5.evalPairedBootstrap]] oracle: the
    * same McNemar paired-classifier CTEs, fanned out ×reps with the
    * SHARED 2⁶⁰-scaled Poisson-CDF thresholds inlined as literals —
    * both engines evaluate identical integer compares. */
  /** The shared paired-bootstrap CTE prefix (`e`→`a`): the paired-ok
    * frame, the ×reps replica fanout, the Poisson(1) threshold weights,
    * and the per-replica integer sums — read by both
    * [[pairedBootstrapOracleSql]] and [[bcaOracleSql]], so the two
    * oracles replay the IDENTICAL replica table by construction. */
  private def pairedBootCtes(reps: Int): String =
    pairedBootCtesFrom(reps, sampledTarget = None)

  /** `sampledTarget = Some(t)` inserts the deterministic hash-threshold
    * subsample between the paired frame and the replica fanout: mod =
    * ⌈N/t⌉ recomputed IN SQL from the same events count the Spark plan
    * probes, so both engines draw the identical subsample (the
    * [[graft.query.Analytics7.evalBootstrapBcaSampled]] contract). The
    * splice text carries `|` margins and is interpolated BEFORE the
    * single stripMargin call — the one-stripMargin discipline the NOTE
    * below pins (a pre-stripped splice whose lines open with `||`
    * would be corrupted by the outer strip). */
  private def pairedBootCtesFrom(reps: Int,
      sampledTarget: Option[Long]): String = {
    val t = Analytics5.poissonThresh60
    // margin-carrying splice: starts with a newline, ends at `|)` so the
    // outer template's `|)$subCtes, r AS (` reads as s-close → mq → ss →
    // r-open after the ONE stripMargin
    val subCtes = sampledTarget.fold("") { tgt =>
      s"""
         |, mq AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_full,
         |    greatest(CAST(1 AS BIGINT),
         |      (CAST(count(*) AS BIGINT) + ${tgt - 1}) // $tgt) AS md
         |  FROM events
         |), ss AS (
         |  SELECT s.* FROM s, mq
         |  WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':bcasub'), 1, 15) AS BIGINT) % mq.md = 0
         |)"""
    }
    val src = if (sampledTarget.isDefined) "ss" else "s"
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    CAST(round(value * 1000.0) AS BIGINT) AS v3
       |  FROM events
       |), m AS (
       |  SELECT event_type, CAST(sum(v3) AS BIGINT) AS s3,
       |    CAST(count(*) AS BIGINT) AS n_t FROM e GROUP BY event_type
       |), g AS (
       |  SELECT CAST(sum(v3) AS BIGINT) AS g3,
       |    CAST(count(*) AS BIGINT) AS n_g FROM e
       |), s AS (
       |  SELECT e.event_id,
       |    (e.v3 * m.n_t > m.s3) = lbl AS a_ok,
       |    (e.v3 * g.n_g > g.g3) = lbl AS b_ok
       |  FROM e JOIN m USING (event_type) CROSS JOIN g,
       |    LATERAL (SELECT CAST('0x' || substr(md5(
       |      CAST(e.event_id AS VARCHAR) || ':label'), 1, 15)
       |      AS BIGINT) % 2 = 1 AS lbl) l
       |)$subCtes, r AS (
       |  SELECT $src.*, i AS replica,
       |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
       |      || ':boot:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM $src, LATERAL (SELECT unnest(
       |    generate_series(0, ${reps - 1})) AS i) x
       |), wv AS (
       |  SELECT replica,
       |    CASE WHEN h < ${t(0)} THEN 0 WHEN h < ${t(1)} THEN 1
       |      WHEN h < ${t(2)} THEN 2 WHEN h < ${t(3)} THEN 3
       |      WHEN h < ${t(4)} THEN 4 ELSE 5 END AS w,
       |    a_ok, b_ok
       |  FROM r
       |), a AS (
       |  SELECT replica, CAST(sum(w) AS BIGINT) AS n_eff,
       |    CAST(sum(w * CASE WHEN a_ok THEN 1 ELSE 0 END) AS BIGINT)
       |      AS sum_a,
       |    CAST(sum(w * CASE WHEN b_ok THEN 1 ELSE 0 END) AS BIGINT)
       |      AS sum_b
       |  FROM wv GROUP BY replica
       |)""".stripMargin
  }

  // NOTE both consumers CONCATENATE the prefix (never re-interpolate it
  // into another stripMargin template: the prefix contains `||` at line
  // starts, which a second stripMargin would corrupt)
  private def pairedBootstrapOracleSql(reps: Int): String = {
    pairedBootCtes(reps) + "\n" +
    """SELECT CAST(replica AS INT) AS replica, n_eff, sum_a, sum_b,
       |  CAST(CAST(sum_a AS DOUBLE) / CAST(n_eff AS DOUBLE) AS REAL)
       |    AS acc_a,
       |  CAST(CAST(sum_b AS DOUBLE) / CAST(n_eff AS DOUBLE) AS REAL)
       |    AS acc_b,
       |  CAST(CAST(sum_a AS DOUBLE) / CAST(n_eff AS DOUBLE)
       |    - CAST(sum_b AS DOUBLE) / CAST(n_eff AS DOUBLE) AS REAL)
       |    AS delta
       |FROM a ORDER BY replica""".stripMargin
  }

  /** The [[graft.query.Analytics7.evalBootstrapBca]] oracle: the shared
    * replica CTEs, the exact d∈{−1,0,1} tallies, HUGEINT jackknife
    * moments (Spark holds DECIMAL(38,0)), and the Φ⁻¹ grid inlined as a
    * VALUES table from the SAME [[graft.query.Analytics7.invNormGrid]]
    * literals the Spark plan carries — neither engine evaluates a
    * normal quantile at query time, and the percentile index is the
    * grid-threshold count (⌈Φ(w)·B⌉ = 1 + #{k : Φ⁻¹(k/B) < w}). */
  private def bcaOracleSql(reps: Int): String =
    bcaOracleSqlFrom(reps, sampledTarget = None)

  /** `sampledTarget = Some(t)` → the oracle for
    * [[graft.query.Analytics7.evalBootstrapBcaSampled]]: identical BCa
    * tail over the `ss` subsample CTE, plus the √(N/n_sub) widening
    * columns — every splice margin-carrying under the ONE stripMargin. */
  private def bcaOracleSqlFrom(reps: Int,
      sampledTarget: Option[Long]): String = {
    val tz = Analytics7.invNormGrid(reps)
    val zLo = Analytics7.invNormCdf(0.025)
    val zHi = Analytics7.invNormCdf(0.975)
    val zgRows = tz.zipWithIndex
      .map { case (z, i) => s"(${i + 1}, CAST($z AS DOUBLE))" }
      .mkString(", ")
    val tsrc = if (sampledTarget.isDefined) "ss" else "s"
    val mqJoin = if (sampledTarget.isDefined) " CROSS JOIN mq" else ""
    // fixed-parenthesization double epilogue: theta + (ci − theta)·
    // √(n/N) — the m-out-of-n PROJECTION (shrink, not widen: the
    // subsample replica spread already carries the √(N/n) inflation) —
    // the exact expression tree the Spark plan carries
    def wCol(d: String, as: String): String =
      s"""
         |  , CAST(CAST(i.d_total AS DOUBLE) / CAST(i.n_items AS DOUBLE) + (CAST($d AS DOUBLE) - CAST(i.d_total AS DOUBLE) / CAST(i.n_items AS DOUBLE)) * sqrt(CAST(i.n_items AS DOUBLE) / CAST(mq.n_full AS DOUBLE)) AS REAL) AS $as"""
    val widenCols = if (sampledTarget.isEmpty) "" else
      s"""
         |  , mq.n_full,
         |  CAST(sqrt(CAST(mq.n_full AS DOUBLE) / CAST(i.n_items AS DOUBLE)) AS REAL) AS widen""" +
        wCol("rl.delta", "ci_lo_proj") + wCol("rh.delta", "ci_hi_proj")
    pairedBootCtesFrom(reps, sampledTarget) + ",\n" +
    s"""bs AS (
       |  SELECT CAST(replica AS INT) AS replica, n_eff, sum_a, sum_b,
       |    CAST(CAST(sum_a AS DOUBLE) / CAST(n_eff AS DOUBLE)
       |      - CAST(sum_b AS DOUBLE) / CAST(n_eff AS DOUBLE) AS REAL)
       |      AS delta
       |  FROM a
       |), tly AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(coalesce(sum(CASE WHEN a_ok THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS sa,
       |    CAST(coalesce(sum(CASE WHEN b_ok THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS sb,
       |    CAST(coalesce(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0
       |      END), 0) AS BIGINT) AS cm,
       |    CAST(coalesce(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0
       |      END), 0) AS BIGINT) AS cp
       |  FROM $tsrc
       |), blw AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN
       |      (bs.sum_a - bs.sum_b) * t.n_items
       |        < (t.sa - t.sb) * bs.n_eff THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS cnt_below
       |  FROM bs CROSS JOIN tly t
       |), core AS (
       |  SELECT t.n_items, t.sa - t.sb AS d_total, t.cm, t.cp,
       |    b.cnt_below
       |  FROM tly t CROSS JOIN blw b WHERE t.n_items > 0
       |), mom AS (
       |  SELECT core.*,
       |    CAST(cm AS HUGEINT)
       |        * CAST(n_items + d_total AS HUGEINT)
       |        * CAST(n_items + d_total AS HUGEINT)
       |      + CAST(n_items - cm - cp AS HUGEINT)
       |        * CAST(d_total AS HUGEINT) * CAST(d_total AS HUGEINT)
       |      + CAST(cp AS HUGEINT)
       |        * CAST(n_items - d_total AS HUGEINT)
       |        * CAST(n_items - d_total AS HUGEINT) AS i2,
       |    -(CAST(cm AS HUGEINT)
       |        * CAST(n_items + d_total AS HUGEINT)
       |        * CAST(n_items + d_total AS HUGEINT)
       |        * CAST(n_items + d_total AS HUGEINT))
       |      - CAST(n_items - cm - cp AS HUGEINT)
       |        * CAST(d_total AS HUGEINT) * CAST(d_total AS HUGEINT)
       |        * CAST(d_total AS HUGEINT)
       |      + CAST(cp AS HUGEINT)
       |        * CAST(n_items - d_total AS HUGEINT)
       |        * CAST(n_items - d_total AS HUGEINT)
       |        * CAST(n_items - d_total AS HUGEINT) AS i3
       |  FROM core
       |), zg AS (SELECT * FROM (VALUES $zgRows) AS zz(k, z)),
       |acc AS (
       |  SELECT mom.*, CASE WHEN i2 = 0 THEN 0.0
       |    ELSE CAST(i3 AS DOUBLE)
       |      / (6.0 * CAST(i2 AS DOUBLE) * sqrt(CAST(i2 AS DOUBLE)))
       |    END AS accel_d
       |  FROM mom
       |), zr AS (
       |  SELECT acc.*, zg.z AS z0_d
       |  FROM acc JOIN zg ON zg.k
       |    = CAST(least(greatest(acc.cnt_below, 1), ${reps - 1}) AS INT)
       |), w AS (
       |  SELECT zr.*,
       |    z0_d + (z0_d + $zLo) / (1.0 - accel_d * (z0_d + $zLo))
       |      AS w_lo_d,
       |    z0_d + (z0_d + $zHi) / (1.0 - accel_d * (z0_d + $zHi))
       |      AS w_hi_d
       |  FROM zr
       |), idx AS (
       |  SELECT w.*,
       |    CAST(1 + (SELECT count(*) FROM zg WHERE zg.z < w.w_lo_d)
       |      AS INT) AS idx_lo,
       |    CAST(1 + (SELECT count(*) FROM zg WHERE zg.z < w.w_hi_d)
       |      AS INT) AS idx_hi
       |  FROM w
       |), ranked AS (
       |  SELECT delta, row_number()
       |    OVER (ORDER BY delta NULLS LAST, replica) AS rk
       |  FROM bs
       |)
       |SELECT i.n_items, i.d_total, i.cnt_below,
       |  CAST(CAST(i.d_total AS DOUBLE) / CAST(i.n_items AS DOUBLE)
       |    AS REAL) AS theta_hat,
       |  CAST(i.z0_d AS REAL) AS z0, CAST(i.accel_d AS REAL) AS accel,
       |  i.idx_lo, i.idx_hi, rl.delta AS ci_lo, rh.delta AS ci_hi$widenCols
       |FROM idx i JOIN ranked rl ON rl.rk = i.idx_lo
       |  JOIN ranked rh ON rh.rk = i.idx_hi$mqJoin""".stripMargin
  }

  /** The [[graft.query.Analytics6.graphEgoBetweenness]] oracle,
    * parametrized by the center-cohort modulus: %64 is the declared
    * query; %512 is the x10-replayable sampled cohort (r18 verdict
    * #7 — the %64 courier join exceeds DuckDB temp disk at x10).
    * Same MATERIALIZED stage chain either way. */
  private def egoBetweennessOracleSql(mod: Int): String =
      s"""WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS MATERIALIZED (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), ego AS MATERIALIZED (
        |  SELECT u AS z, v AS n FROM sym WHERE u % $mod = 0
        |), pairs AS MATERIALIZED (
        |  SELECT a.z, a.n AS u, b.n AS v
        |  FROM ego a JOIN ego b ON a.z = b.z AND a.n < b.n
        |), nonadj AS MATERIALIZED (
        |  SELECT p.z, p.u, p.v FROM pairs p
        |  LEFT JOIN e0 ON e0.u = p.u AND e0.v = p.v
        |  WHERE e0.u IS NULL
        |), cour AS MATERIALIZED (
        |  SELECT na.z, na.u, na.v, CAST(count(*) AS BIGINT) AS extra
        |  FROM nonadj na
        |  JOIN sym su ON su.u = na.u
        |  JOIN sym sv ON sv.u = na.v AND sv.v = su.v
        |  JOIN ego e ON e.z = na.z AND e.n = su.v
        |  WHERE su.v <> na.z
        |  GROUP BY na.z, na.u, na.v
        |), sig AS MATERIALIZED (
        |  SELECT na.z, 1 + coalesce(c.extra, 0) AS sigma
        |  FROM nonadj na LEFT JOIN cour c
        |    ON c.z = na.z AND c.u = na.u AND c.v = na.v
        |)
        |SELECT z AS part, CAST(count(*) AS BIGINT) AS n_broker_pairs,
        |  CAST(sum(1.0 / CAST(sigma AS DOUBLE)) AS REAL)
        |    AS ego_betweenness
        |FROM sig GROUP BY z ORDER BY part""".stripMargin

  /** The [[graft.query.Analytics7.graphSsspWeighted]] oracle: the
    * Bellman-Ford relaxation UNROLLED into `rounds` MATERIALIZED
    * min-combine stages over the length-carrying symmetric co-purchase
    * edges (frontier-pruned Spark rounds produce exactly the full
    * per-round relaxation — offers are re-sent the round after their
    * source improves). MATERIALIZED is load-bearing: each d_{r−1} is
    * referenced twice per stage. */
  private def ssspOracleSql(rounds: Int, nSources: Int): String = {
    val stages = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT src, v, min(d) AS d FROM (
         |    SELECT src, v, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT r.src, e.v, r.d + e.len
         |    FROM d${i - 1} r JOIN ew e ON e.u = r.v) GROUP BY src, v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS (
       |  SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY a.pk, b.pk
       |), ew AS (
       |  SELECT u, v,
       |    CAST(1 AS BIGINT) + CAST(1000 AS BIGINT) // w AS len
       |  FROM e0
       |  UNION ALL
       |  SELECT v, u,
       |    CAST(1 AS BIGINT) + CAST(1000 AS BIGINT) // w AS len
       |  FROM e0
       |), verts AS (SELECT DISTINCT u FROM ew),
       |srcs AS (
       |  SELECT u AS src FROM verts
       |  ORDER BY CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15)
       |    AS BIGINT), u LIMIT $nSources
       |), d0 AS (SELECT src, src AS v, CAST(0 AS BIGINT) AS d FROM srcs),
       |$stages
       |SELECT src, v AS part, d AS dist
       |FROM d$rounds ORDER BY src, part""".stripMargin
  }

  /** The [[graft.query.TextAnalysis.textBpeTrain]] oracle: the training
    * loop unrolled into `rounds` MATERIALIZED CTE stages (count pairs
    * from vᵣ₋₁ → top-1 → apply the double-space-separator replace into
    * vᵣ). MATERIALIZED is load-bearing: v_{r-1} is referenced twice per
    * stage, so an inlining planner would otherwise blow up ~2^rounds.
    * Generated, not hand-written — the stage text is identical modulo
    * the round index, and the Spark loop it replays is parameterized by
    * the same `rounds`. */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val union = (1 to rounds)
      .map(r => s"SELECT merge_rank, pa, pb, cnt FROM b$r")
      .mkString(" UNION ALL ")
    s"""${bpeTrainCtes(rounds)}
       |SELECT merge_rank, pa AS lhs, pb AS rhs, pa || pb AS merged,
       |  cnt AS score
       |FROM ($union) ORDER BY merge_rank""".stripMargin
  }

  private def bpeStages(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT ss[i] AS pa, ss[i + 1] AS pb,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, string_split(trim(sp), '  ') AS ss
         |        FROM v${r - 1}) t$r,
         |    LATERAL (SELECT unnest(generate_series(1, len(ss) - 1)) AS i) s$r
         |  WHERE len(ss) >= 2 GROUP BY 1, 2
         |), b$r AS MATERIALIZED (
         |  SELECT $r AS merge_rank, pa, pb, cnt FROM p$r
         |  ORDER BY cnt DESC, pa, pb LIMIT 1
         |), v$r AS MATERIALIZED (
         |  SELECT word, freq,
         |    replace(sp, ' ' || pa || '  ' || pb || ' ',
         |      ' ' || pa || pb || ' ') AS sp
         |  FROM v${r - 1} CROSS JOIN b$r
         |)""".stripMargin
    }.mkString(", ")

  /** The shared WITH clause of the BPE oracles: v0 + `rounds` unrolled
    * stages (each defining p_r, b_r, v_r). */
  private def bpeTrainCtes(rounds: Int): String = {
    val stages = bpeStages(rounds)
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT tok AS word, count(*) AS freq,
       |    '  ' || regexp_replace(tok, '(.)', '\\1  ', 'g') AS sp
       |  FROM (SELECT unnest(string_split(
       |      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
       |    FROM documents)
       |  WHERE length(tok) >= 2
       |  GROUP BY tok
       |), $stages""".stripMargin
  }

  /** The [[graft.query.TextAnalysis.textBpeVocab]] oracle: the trained
    * final state v_rounds, exploded to surviving units weighted by word
    * frequency. */
  private def bpeVocabOracleSql(rounds: Int): String =
    s"""${bpeTrainCtes(rounds)}
       |SELECT u.unit, CAST(sum(freq) AS BIGINT) AS n_occ,
       |  length(u.unit) > 1 AS is_merged
       |FROM v$rounds,
       |  LATERAL (SELECT unnest(string_split(trim(sp), '  ')) AS unit) u
       |GROUP BY u.unit ORDER BY n_occ DESC, u.unit""".stripMargin

  /** The [[graft.query.TextAnalysis.textBpeFertility]] oracle: apply
    * the trained state v_rounds at the vocab grain (unit counts per
    * word), join the (lang, word) corpus counts, two exact divisions
    * per language row. */
  private def bpeFertilityOracleSql(rounds: Int): String =
    s"""${bpeTrainCtes(rounds)},
       |wu AS (
       |  SELECT word,
       |    CAST(len(string_split(trim(sp), '  ')) AS BIGINT) AS n_units
       |  FROM v$rounds
       |), tw AS (
       |  SELECT lang, tok AS word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT lang, unnest(string_split(
       |      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
       |      AS tok
       |    FROM documents)
       |  GROUP BY 1, 2
       |), j AS (
       |  SELECT lang, n, coalesce(wu.n_units, 1) AS nu,
       |    CAST(length(word) AS BIGINT) AS nc
       |  FROM tw LEFT JOIN wu USING (word)
       |)
       |SELECT lang, CAST(sum(n) AS BIGINT) AS n_words,
       |  CAST(sum(n * nu) AS BIGINT) AS n_units,
       |  CAST(sum(n * nc) AS BIGINT) AS n_chars,
       |  CAST(CAST(sum(n * nu) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
       |    AS REAL) AS fertility,
       |  CAST(CAST(sum(n * nc) AS DOUBLE) / CAST(sum(n * nu) AS DOUBLE)
       |    AS REAL) AS chars_per_unit
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** The [[graft.query.Similarity.ivfLloydTopK]] oracle: Forgy seeds →
    * `iters` unrolled Lloyd stages (per-dim ×10³-quantized member sums
    * → exact-rational REAL centroids → argmax-dot reassignment) →
    * probe + exact re-rank. Stage text identical modulo the iteration
    * index; MATERIALIZED for the twice-referenced assignment CTEs. */
  private def ivfLloydOracleSql(iters: Int): String = {
    val stages = (1 to iters).map { t =>
      s"""c$t AS MATERIALIZED (
         |  SELECT cell, dd.d AS d,
         |    CAST(sum(CAST(round(e[dd.d] * 1000.0) AS BIGINT)) AS BIGINT)
         |      AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM a${t - 1}, LATERAL (SELECT unnest(generate_series(1,
         |    len(e))) AS d) dd
         |  GROUP BY cell, dd.d
         |), cent$t AS MATERIALIZED (
         |  SELECT cell, list(CAST(CAST(CAST(s AS DOUBLE) / (1000.0 * n)
         |    AS REAL) AS DOUBLE) ORDER BY d) AS cv
         |  FROM c$t GROUP BY cell
         |), a$t AS MATERIALIZED (
         |  SELECT vec_id, e, cell FROM (
         |    SELECT emb.vec_id, emb.e, c.cell,
         |      row_number() OVER (PARTITION BY emb.vec_id
         |        ORDER BY list_dot_product(emb.e, c.cv) DESC, c.cell)
         |        AS rn
         |    FROM emb, cent$t c) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), seeds AS (
       |  SELECT seed_vid, seed_e,
       |    CAST(row_number() OVER (ORDER BY h, seed_vid) - 1 AS BIGINT)
       |      AS cell
       |  FROM (
       |    SELECT vec_id AS seed_vid, e AS seed_e,
       |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
       |        AS BIGINT) AS h
       |    FROM emb ORDER BY h, vec_id LIMIT 16)
       |), a0 AS MATERIALIZED (
       |  SELECT vec_id, e, cell FROM (
       |    SELECT emb.vec_id, emb.e, s.cell,
       |      row_number() OVER (PARTITION BY emb.vec_id
       |        ORDER BY list_dot_product(emb.e, s.seed_e) DESC, s.cell)
       |        AS rn
       |    FROM emb, seeds s) WHERE rn = 1
       |), $stages,
       |qe AS (SELECT e AS q FROM emb WHERE vec_id = 0),
       |probes AS (
       |  SELECT cell FROM cent$iters, qe
       |  ORDER BY list_dot_product(cv, q) DESC, cell LIMIT 4
       |)
       |SELECT a.vec_id, a.cell, list_dot_product(a.e, qe.q) AS cosine
       |FROM a$iters a JOIN probes USING (cell), qe
       |WHERE a.vec_id <> 0
       |ORDER BY cosine DESC, a.vec_id LIMIT 10""".stripMargin
  }

  /** Shared by `dedup_incremental_minhash` and its streaming twin
    * `stream_dedup_incremental` (whose drain equals the batch probe by
    * contract). */
  /** eval_ece oracle — shared with the transformWithState streaming
    * twin (drain == batch contract, same panel, same epilogue). */
  private lazy val eceOracleSql: String =
    """WITH s AS (
        |  SELECT least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5,
        |    0.0), 0.9999) AS score, label
        |  FROM embeddings
        |), b AS (
        |  SELECT CAST(floor(score * 10) AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(score * 1000000.0) AS BIGINT)) AS DOUBLE)
        |      / 1000000.0 AS sum_score,
        |    CAST(count(CASE WHEN label % 2 = 1 THEN 1 END) AS BIGINT)
        |      AS n_pos
        |  FROM s GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_bins
        |  FROM b
        |), terms AS (
        |  SELECT bin, n_total, n_bins,
        |    (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE))
        |      * abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |        - sum_score / CAST(n AS DOUBLE)) AS term,
        |    abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |      - sum_score / CAST(n AS DOUBLE)) AS gap
        |  FROM b CROSS JOIN t
        |), p AS (
        |  SELECT n_total, n_bins,
        |    coalesce(sum(CASE WHEN bin = 0 THEN term END), 0.0) AS t0,
        |    coalesce(sum(CASE WHEN bin = 1 THEN term END), 0.0) AS t1,
        |    coalesce(sum(CASE WHEN bin = 2 THEN term END), 0.0) AS t2,
        |    coalesce(sum(CASE WHEN bin = 3 THEN term END), 0.0) AS t3,
        |    coalesce(sum(CASE WHEN bin = 4 THEN term END), 0.0) AS t4,
        |    coalesce(sum(CASE WHEN bin = 5 THEN term END), 0.0) AS t5,
        |    coalesce(sum(CASE WHEN bin = 6 THEN term END), 0.0) AS t6,
        |    coalesce(sum(CASE WHEN bin = 7 THEN term END), 0.0) AS t7,
        |    coalesce(sum(CASE WHEN bin = 8 THEN term END), 0.0) AS t8,
        |    coalesce(sum(CASE WHEN bin = 9 THEN term END), 0.0) AS t9,
        |    max(gap) AS max_gap
        |  FROM terms GROUP BY n_total, n_bins
        |)
        |SELECT n_total, n_bins,
        |  CAST(t0 + t1 + t2 + t3 + t4 + t5 + t6 + t7 + t8 + t9 AS REAL)
        |    AS ece,
        |  CAST(max_gap AS REAL) AS max_gap
        |FROM p""".stripMargin

  /** drift_psi_value oracle — shared with the streaming twin. */
  private lazy val psiTermsOracleSql: String =
    """WITH s AS (
        |  SELECT value,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS isa
        |  FROM events
        |), st AS (
        |  SELECT min(value) AS vmin, max(value) AS vmax,
        |    CAST(sum(isa) AS BIGINT) AS na,
        |    CAST(sum(1 - isa) AS BIGINT) AS nb
        |  FROM s
        |), b AS (
        |  SELECT least(CAST(floor((value - st.vmin)
        |      / ((st.vmax - st.vmin) / 10.0)) AS BIGINT), 9) AS bin, isa
        |  FROM s CROSS JOIN st
        |), g AS (
        |  SELECT bin, CAST(sum(isa) AS BIGINT) AS ca,
        |    CAST(sum(1 - isa) AS BIGINT) AS cb
        |  FROM b GROUP BY bin
        |)
        |SELECT bin, ca, cb,
        |  CAST((greatest(CAST(ca AS DOUBLE) / CAST(st.na AS DOUBLE), 0.0001)
        |      - greatest(CAST(cb AS DOUBLE) / CAST(st.nb AS DOUBLE), 0.0001))
        |    * ln(greatest(CAST(ca AS DOUBLE) / CAST(st.na AS DOUBLE), 0.0001)
        |       / greatest(CAST(cb AS DOUBLE) / CAST(st.nb AS DOUBLE), 0.0001))
        |    AS REAL) AS psi_term
        |FROM g CROSS JOIN st ORDER BY bin""".stripMargin

  /** dq_benford_law oracle — shared with the streaming twin. */
  private lazy val benfordOracleSql: String =
    """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100.0)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders
        |  WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) > 0
        |), g AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM c GROUP BY digit
        |), t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM g)
        |SELECT digit, n_orders,
        |  CAST(CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE) AS REAL)
        |    AS observed_p,
        |  CAST(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |    / CAST(digit AS DOUBLE)) AS REAL) AS expected_p,
        |  CAST((CAST(n_orders AS DOUBLE) - CAST(n_total AS DOUBLE)
        |      * log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |        / CAST(digit AS DOUBLE)))
        |    * (CAST(n_orders AS DOUBLE) - CAST(n_total AS DOUBLE)
        |      * log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |        / CAST(digit AS DOUBLE)))
        |    / (CAST(n_total AS DOUBLE) * log10(CAST(1.0 AS DOUBLE)
        |      + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))) AS REAL)
        |    AS chi2_term
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin

  /** Oracle for `privacy_budget_ledger`: the VALUES panel and the two
    * composition epilogues are rendered from the SAME Scala inventory
    * ([[Analytics7.defaultDpReleases]]) and constants the engine uses,
    * so no libm exp/ln runs in either engine and every sum is an exact
    * BIGINT — only fixed-paren double epilogues remain. */
  private lazy val privacyLedgerOracleSql: String = {
    val rows = Analytics7.defaultDpReleases
      .map(r => s"('${r.release}', '${r.mechanism}', " +
        s"'${r.privacy_model}', ${r.n_draws}, ${r.eps_u}, ${r.lin_n})")
      .mkString(",\n      |    ")
    s"""WITH p(release, mechanism, privacy_model, n_draws, eps_u, lin_n)
      |  AS (VALUES
      |    $rows),
      |t AS (
      |  SELECT CAST(coalesce(sum(n_draws), 0) AS BIGINT) AS n,
      |    CAST(coalesce(sum(eps_u), 0) AS BIGINT) AS s,
      |    CAST(coalesce(sum(CAST(eps_u AS BIGINT) * eps_u), 0)
      |      AS BIGINT) AS ssq,
      |    CAST(coalesce(sum(lin_n), 0) AS BIGINT) AS sl
      |  FROM p
      |)
      |SELECT release, mechanism, privacy_model,
      |  CAST(n_draws AS BIGINT) AS n_draws,
      |  CAST(eps_u AS BIGINT) AS eps_micro,
      |  CAST(CAST(eps_u AS DOUBLE) / 1000000.0 AS REAL) AS eps
      |FROM p
      |UNION ALL
      |SELECT 'zz_composition_basic', 'sequential', 'central+local',
      |  n, s, CAST(CAST(s AS DOUBLE) / 1000000.0 AS REAL)
      |FROM t
      |UNION ALL
      |SELECT 'zz_composition_advanced', 'advanced_composition',
      |  'central+local', n, CAST(NULL AS BIGINT),
      |  CAST(sqrt(2.0 * ${Analytics7.lnInvDelta}
      |      * (CAST(ssq AS DOUBLE) / 1000000000000.0))
      |    + CAST(sl AS DOUBLE) / 1000000000.0 AS REAL)
      |FROM t
      |ORDER BY release""".stripMargin
  }

  /** Shared by `ann_ivf_delta_assign` and its streaming twin
    * `stream_ann_ivf_assign` (drain == batch row-for-row, so one
    * oracle adjudicates both). */
  private lazy val annIvfAssignOracleSql: String =
    """WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), corpus AS (SELECT * FROM emb WHERE vec_id % 5 <> 0
      |), delta AS (SELECT * FROM emb WHERE vec_id % 5 = 0
      |), seeds AS (
      |  SELECT seed_vid, seed_e,
      |    CAST(row_number() OVER (ORDER BY h, seed_vid) - 1 AS BIGINT)
      |      AS cell
      |  FROM (
      |    SELECT vec_id AS seed_vid, e AS seed_e,
      |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
      |        AS BIGINT) AS h
      |    FROM corpus ORDER BY h, vec_id LIMIT 16)
      |), ca AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT c.vec_id, s.cell,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_dot_product(c.e, s.seed_e) DESC, s.cell)
      |        AS rn
      |    FROM corpus c, seeds s) WHERE rn = 1
      |), da AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT d.vec_id, s.cell,
      |      row_number() OVER (PARTITION BY d.vec_id
      |        ORDER BY list_dot_product(d.e, s.seed_e) DESC, s.cell)
      |        AS rn
      |    FROM delta d, seeds s) WHERE rn = 1
      |), occ AS (
      |  SELECT s.cell,
      |    CAST(coalesce(co.n, 0) AS BIGINT) AS n_corpus,
      |    CAST(coalesce(de.n, 0) AS BIGINT) AS n_delta
      |  FROM seeds s
      |  LEFT JOIN (SELECT cell, count(*) AS n FROM ca GROUP BY cell) co
      |    USING (cell)
      |  LEFT JOIN (SELECT cell, count(*) AS n FROM da GROUP BY cell) de
      |    USING (cell)
      |), tot AS (
      |  SELECT CAST(sum(n_corpus) AS BIGINT) AS tc,
      |    CAST(sum(n_delta) AS BIGINT) AS td
      |  FROM occ
      |)
      |SELECT cell, n_corpus, n_delta,
      |  CAST(CAST(n_corpus AS DOUBLE) / CAST(tc AS DOUBLE) AS REAL)
      |    AS share_before,
      |  CAST(CAST(n_corpus + n_delta AS DOUBLE)
      |    / CAST(tc + td AS DOUBLE) AS REAL) AS share_after,
      |  CAST(CAST(n_corpus + n_delta AS DOUBLE)
      |      / CAST(tc + td AS DOUBLE)
      |    - CAST(n_corpus AS DOUBLE) / CAST(tc AS DOUBLE) AS REAL)
      |    AS drift
      |FROM occ, tot ORDER BY cell""".stripMargin

  private lazy val incrementalMinhashOracleSql: String =
    s"""WITH ${minhashPairsCtes(8, 4, "0.5")},
       |delta AS (SELECT doc_id FROM base WHERE doc_id % 5 = 0),
       |links AS (
       |  SELECT doc_a AS d, doc_b AS m FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS d, doc_a AS m FROM pairs
       |), agg AS (
       |  SELECT d AS doc_id,
       |    CAST(sum(CASE WHEN m % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nc,
       |    CAST(sum(CASE WHEN m % 5 = 0 AND m < d THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb
       |  FROM links WHERE d % 5 = 0 GROUP BY d
       |)
       |SELECT dd.doc_id,
       |  CASE WHEN COALESCE(a.nc, 0) > 0 THEN 'near_dup_of_corpus'
       |       WHEN COALESCE(a.nb, 0) > 0 THEN 'near_dup_in_batch'
       |       ELSE 'new' END AS status,
       |  COALESCE(a.nc, 0) AS n_corpus_matches,
       |  COALESCE(a.nb, 0) AS n_batch_matches
       |FROM delta dd LEFT JOIN agg a ON dd.doc_id = a.doc_id
       |ORDER BY dd.doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = reg(
    // the unrolled deterministic-Forgy Lloyd's IVF oracle (2 stages)
    "ann_ivf_topk" -> ivfLloydOracleSql(2),
    // exact maximal repeated spans: covered width-8 windows →
    // gaps-and-islands per document → run length + w − 1
    "dedup_substring_maximal" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'planted near duplicate copy ' || text AS text
        |  FROM documents WHERE doc_id < 10
        |), docs AS (
        |  SELECT * FROM d0 UNION ALL SELECT * FROM planted
        |), toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM docs
        |), wins AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |    CAST('0x' || substr(md5(array_to_string(
        |      t[i : i + 7], ' ')), 1, 15) AS BIGINT) AS h
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      CAST(len(t) AS INT) - 7)) AS i) s
        |  WHERE len(t) >= 8
        |), rep AS (
        |  SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |), covered AS (
        |  SELECT doc_id, i,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        |  FROM wins JOIN rep USING (h)
        |)
        |SELECT doc_id, min(i) AS start_pos,
        |  CAST(count(*) + 7 AS BIGINT) AS span_len
        |FROM covered GROUP BY doc_id, grp
        |ORDER BY doc_id, start_pos""".stripMargin,
    // three window widths over one shared tokenize CTE (chained
    // LATERALs: width unnest, then the per-width slide)
    "dedup_substring_multiscale" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'planted near duplicate copy ' || text AS text
        |  FROM documents WHERE doc_id < 10
        |), docs AS (
        |  SELECT * FROM d0 UNION ALL SELECT * FROM planted
        |), toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM docs
        |), widths AS (SELECT unnest([8, 16, 32]) AS w),
        |tw AS (
        |  -- slide bound precomputed BEFORE the lateral: DuckDB 1.0
        |  -- fails to bind a joined column inside generate_series
        |  SELECT doc_id, t, w, CAST(len(t) AS INT) - w + 1 AS hi
        |  FROM toks CROSS JOIN widths WHERE len(t) >= w
        |), wins AS (
        |  SELECT doc_id, w,
        |    CAST('0x' || substr(md5(array_to_string(
        |      t[i : i + w - 1], ' ')), 1, 15) AS BIGINT) AS h
        |  FROM tw, LATERAL (SELECT unnest(generate_series(1, hi)) AS i) s
        |)
        |SELECT w, h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM wins GROUP BY w, h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY w, h""".stripMargin,
    // the generated unrolled-merge BPE-training oracle (16 stages)
    "text_bpe_train" -> bpeTrainOracleSql(16),
    "eval_bradley_terry" -> btOracleSql(8),
    "eval_paired_bootstrap" -> pairedBootstrapOracleSql(50),
    "eval_topk_agreement" -> topkAgreementOracleSql(10),
    // same unrolled stages, final state exploded to the unit census
    "text_bpe_vocab" -> bpeVocabOracleSql(16),
    "text_bpe_fertility" -> bpeFertilityOracleSql(16),
    "dedup_cascade_report" -> dedupCascadeOracleSql,
    // train on even doc_ids, Laplace-smoothed scoring of the odd half
    "text_heldout_perplexity" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS tok
        |    FROM documents) GROUP BY 1, 2
        |), vocab AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt
        |  FROM tf WHERE doc_id % 2 = 0 GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM vocab
        |), sc AS (
        |  SELECT tf.doc_id, tf.tf, coalesce(vocab.cnt, 0) AS cnt,
        |    tot.total, tot.v
        |  FROM tf LEFT JOIN vocab USING (tok), tot
        |  WHERE tf.doc_id % 2 = 1
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cnt = 0 THEN tf ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(-sum(tf * (ln(cnt + 1) - ln(total + v))) / sum(tf)
        |    AS REAL) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // FULL recompute: the engine's state+delta maintenance must equal it
    "mv_topk_delta" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), t AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY v3 DESC, event_id) AS rank
        |  FROM e
        |)
        |SELECT event_type, CAST(rank AS INT) AS rank, event_id, v3,
        |  event_id % 10 = 0 AS from_delta
        |FROM t WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    // one (token)-grain bit_or; pair stats off the mask histogram
    "corpus_source_overlap" ->
      """WITH si AS (
        |  SELECT * FROM (
        |    SELECT source,
        |      CAST(row_number() OVER (ORDER BY source) - 1 AS INT) AS idx
        |    FROM (SELECT DISTINCT source FROM documents)
        |  ) WHERE idx < 16
        |), tk AS (
        |  SELECT si.idx, tok FROM (
        |    SELECT source, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS tok
        |    FROM documents) d JOIN si USING (source)
        |), m AS (
        |  SELECT tok, CAST(bit_or(CAST(1 AS BIGINT) << idx) AS BIGINT)
        |    AS mask
        |  FROM tk GROUP BY tok
        |), h AS (
        |  SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM m
        |  GROUP BY mask
        |), p AS (
        |  SELECT a.source AS source_a, a.idx AS ia,
        |    b.source AS source_b, b.idx AS ib
        |  FROM si a JOIN si b ON a.source < b.source
        |), s AS (
        |  SELECT source_a, source_b,
        |    CAST(sum(CASE WHEN (mask >> ia) & 1 = 1 THEN cnt ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN (mask >> ib) & 1 = 1 THEN cnt ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN (mask >> ia) & 1 = 1
        |        AND (mask >> ib) & 1 = 1 THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n_common
        |  FROM h CROSS JOIN p GROUP BY source_a, source_b
        |)
        |SELECT source_a, source_b, n_a, n_b, n_common,
        |  CAST(CAST(n_common AS DOUBLE)
        |    / CAST(n_a + n_b - n_common AS DOUBLE) AS REAL) AS jaccard
        |FROM s ORDER BY source_a, source_b""".stripMargin,
    // sum-vector identity: sum_{i!=j} xi.xj = |Sx|^2 - sum|x|^2, exact
    // on x1000-quantized BIGINTs; one division, de-scaled by 1e6
    "emb_label_cohesion" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding,
        |    e -> CAST(round(CAST(e AS DOUBLE) * 1000.0) AS BIGINT)) AS v
        |  FROM embeddings
        |), pd AS (
        |  SELECT label, d, CAST(sum(v[d]) AS BIGINT) AS s
        |  FROM q, LATERAL (SELECT unnest(generate_series(1, 64)) AS d) t
        |  GROUP BY label, d
        |), outerm AS (
        |  SELECT label, CAST(sum(s * s) AS BIGINT) AS sum_outer
        |  FROM pd GROUP BY label
        |), sq AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(list_sum(list_transform(v, x -> x * x))) AS BIGINT)
        |      AS sum_sq
        |  FROM q GROUP BY label
        |)
        |SELECT sq.label, sq.n, outerm.sum_outer, sq.sum_sq,
        |  CAST(CAST(sum_outer - sum_sq AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE) / 1000000.0 AS REAL)
        |    AS avg_pair_dot
        |FROM sq JOIN outerm USING (label)
        |WHERE sq.n >= 2 ORDER BY sq.label""".stripMargin,
    // cross-label: sum_{i in a, j in b} xi.xj = Sa.Sb, exact
    "emb_label_separation" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding,
        |    e -> CAST(round(CAST(e AS DOUBLE) * 1000.0) AS BIGINT)) AS v
        |  FROM embeddings
        |), pd AS (
        |  SELECT label, d, CAST(sum(v[d]) AS BIGINT) AS s
        |  FROM q, LATERAL (SELECT unnest(generate_series(1, 64)) AS d) t
        |  GROUP BY label, d
        |), g AS (
        |  SELECT label, list(s ORDER BY d) AS sv FROM pd GROUP BY label
        |), n AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM q
        |  GROUP BY label
        |), j AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    na.n AS n_a, nb.n AS n_b,
        |    CAST(list_dot_product(a.sv, b.sv) AS BIGINT) AS cross_dot
        |  FROM g a JOIN g b ON a.label < b.label
        |  JOIN n na ON na.label = a.label
        |  JOIN n nb ON nb.label = b.label
        |)
        |SELECT label_a, label_b, n_a, n_b, cross_dot,
        |  CAST(CAST(cross_dot AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
        |    / 1000000.0 AS REAL) AS avg_cross_dot
        |FROM j ORDER BY label_a, label_b""".stripMargin,
    // systematic PPS: points a + k*W in x20-scaled cumulative space;
    // multiplicity = ceil-count difference, all BIGINT floor division
    "sample_pps_systematic" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS w
        |  FROM orders
        |), c AS (
        |  SELECT o_orderkey, w,
        |    CAST(sum(w) OVER (ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS c_hi
        |  FROM o
        |), t AS (
        |  SELECT max(c_hi) AS big_w,
        |    CAST('0x' || substr(md5('pps:anchor'), 1, 15) AS BIGINT)
        |      % max(c_hi) AS a
        |  FROM c
        |), m AS (
        |  SELECT o_orderkey, w, c_hi - w AS c_lo, c_hi,
        |    (CASE WHEN c_hi * 20 <= a THEN 0
        |      ELSE 1 + (c_hi * 20 - a - 1) // big_w END)
        |    - (CASE WHEN (c_hi - w) * 20 <= a THEN 0
        |      ELSE 1 + ((c_hi - w) * 20 - a - 1) // big_w END)
        |      AS multiplicity
        |  FROM c, t
        |)
        |SELECT o_orderkey, w, CAST(c_lo AS BIGINT) AS c_lo, c_hi,
        |  CAST(multiplicity AS BIGINT) AS multiplicity
        |FROM m WHERE multiplicity >= 1 ORDER BY o_orderkey""".stripMargin,
    // frames replayed closed-form (the audio_frames oracle), active
    // threshold win·T² = 400·6000², islands via frame − row_number
    "multimodal_audio_vad" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    400 + CAST('0x' || substr(md5(doc_id || ':ns'), 1, 15)
        |      AS BIGINT) % 2001 AS n,
        |    CAST('0x' || substr(md5(doc_id || ':ab'), 1, 15) AS BIGINT)
        |      % 24001 - 12000 AS b,
        |    CAST('0x' || substr(md5(doc_id || ':as'), 1, 15) AS BIGINT)
        |      % 8 + 1 AS s
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, n, b, s, ff.f AS f, ff.f * 160 AS a,
        |    ff.f * 160 + 399 AS b2
        |  FROM p, LATERAL (SELECT unnest(generate_series(0,
        |    (n - 400) // 160)) AS f) ff
        |), g AS (
        |  SELECT doc_id, f,
        |    400 * b * b + 2 * b * s * ((a + b2) * 200)
        |      + s * s * ((b2 * (b2 + 1) * (2 * b2 + 1)) // 6
        |        - ((a - 1) * a * (2 * a - 1)) // 6) AS fe
        |  FROM fr
        |), act AS (
        |  SELECT doc_id, f, fe,
        |    f - (row_number() OVER (PARTITION BY doc_id ORDER BY f) - 1)
        |      AS isl
        |  FROM g WHERE fe > 14400000000
        |)
        |SELECT doc_id, CAST(min(f) AS INT) AS seg_start,
        |  CAST(max(f) AS INT) AS seg_end,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(fe) AS BIGINT) AS seg_energy
        |FROM act GROUP BY doc_id, isl
        |ORDER BY doc_id, seg_start""".stripMargin,
    // the WAV ramp (base b, step s, n samples) decoded by the REAL
    // RIFF/PCM parser; the oracle replays Σamp, Σamp², the single
    // rising zero crossing, and min/max in closed form — integer
    // arithmetic only, so a parser regression hash-mismatches
    "multimodal_audio_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    400 + CAST('0x' || substr(md5(doc_id || ':ns'), 1, 15)
        |      AS BIGINT) % 2001 AS n,
        |    CAST('0x' || substr(md5(doc_id || ':ab'), 1, 15) AS BIGINT)
        |      % 24001 - 12000 AS b,
        |    CAST('0x' || substr(md5(doc_id || ':as'), 1, 15) AS BIGINT)
        |      % 8 + 1 AS s
        |  FROM documents)
        |SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * b + s * ((n * (n - 1)) // 2) AS BIGINT) AS sum_amp,
        |  CAST(n * b * b + 2 * b * s * ((n * (n - 1)) // 2)
        |    + s * s * (((n - 1) * n * (2 * n - 1)) // 6) AS BIGINT)
        |    AS energy,
        |  CAST(CASE WHEN b < 0 AND b + (n - 1) * s >= 0 THEN 1 ELSE 0
        |    END AS BIGINT) AS zero_cross,
        |  CAST(b AS BIGINT) AS min_amp,
        |  CAST(b + (n - 1) * s AS BIGINT) AS max_amp
        |FROM p ORDER BY doc_id""".stripMargin,
    // frame f covers samples [160f, 160f+400): Σ and Σ² over that index
    // interval in closed form, the crossing as an interval test on
    // i₀ = ⌈−b/s⌉; every doc has ≥ 1 frame (n ≥ 400 by synthesis)
    "multimodal_audio_frames" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    400 + CAST('0x' || substr(md5(doc_id || ':ns'), 1, 15)
        |      AS BIGINT) % 2001 AS n,
        |    CAST('0x' || substr(md5(doc_id || ':ab'), 1, 15) AS BIGINT)
        |      % 24001 - 12000 AS b,
        |    CAST('0x' || substr(md5(doc_id || ':as'), 1, 15) AS BIGINT)
        |      % 8 + 1 AS s
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, n, b, s, ff.f AS f, ff.f * 160 AS a,
        |    ff.f * 160 + 399 AS b2
        |  FROM p, LATERAL (SELECT unnest(generate_series(0,
        |    (n - 400) // 160)) AS f) ff
        |), g AS (
        |  SELECT doc_id, f, b, s, a,
        |    (a + b2) * 200 AS s1,
        |    (b2 * (b2 + 1) * (2 * b2 + 1)) // 6
        |      - ((a - 1) * a * (2 * a - 1)) // 6 AS s2
        |  FROM fr)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(400 * b + s * s1 AS BIGINT) AS frame_sum,
        |  CAST(400 * b * b + 2 * b * s * s1 + s * s * s2 AS BIGINT)
        |    AS frame_energy,
        |  CAST(CASE WHEN b < 0
        |      AND ((-b) + s - 1) // s BETWEEN a + 1 AND a + 399
        |    THEN 1 ELSE 0 END AS BIGINT) AS frame_zc
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_optimal_time" ->
      """SELECT hour,
        |  CAST(sv3 AS DOUBLE) / CAST(n_events AS DOUBLE) / 1000.0 AS score,
        |  n_events
        |FROM (SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
        |        SUM(CAST(round(value * 1000) AS HUGEINT)) AS sv3,
        |        count(*) AS n_events
        |      FROM events GROUP BY 1)
        |WHERE sv3 >= CAST(n_events AS HUGEINT) * 45000
        |  AND sv3 <= CAST(n_events AS HUGEINT) * 52000
        |ORDER BY score, hour""".stripMargin,
    "q2_sensitivity_skeleton" ->
      """SELECT CAST(v AS REAL) AS varied_value,
        |  CAST(v AS DOUBLE) * 0.02 + CAST(CAST(17.0 AS REAL) AS DOUBLE) * 0.5
        |    + CAST(CAST(2.5 AS REAL) AS DOUBLE) * 1.5 AS score
        |FROM (VALUES (1.0), (2.0), (3.0), (4.0), (5.0)) t(v)
        |ORDER BY varied_value""".stripMargin,
    "s1_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s2_limit_ordered" ->
      """SELECT event_id, user_id, value FROM events
        |ORDER BY event_id LIMIT 100""".stripMargin,
    "s3_coerce_to_float" ->
      """SELECT event_id,
        |  coalesce(TRY_CAST(event_type AS REAL), CAST(0.0 AS REAL)) AS et_coerced,
        |  coalesce(TRY_CAST(value AS REAL), CAST(0.0 AS REAL)) AS value_f
        |FROM events ORDER BY event_id""".stripMargin,
    "s4_json_encode" ->
      """SELECT event_id,
        |  '{"event_id":' || CAST(event_id AS VARCHAR) ||
        |  ',"user_id":' || CAST(user_id AS VARCHAR) ||
        |  ',"event_type":"' || event_type || '"}' AS payload
        |FROM events ORDER BY event_id""".stripMargin,
    "s6_json_decode" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "s7_malformed_filter" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k
        |FROM events
        |WHERE CAST(props->>'$.k' AS INT) IS NOT NULL
        |  AND CAST(props->>'$.k' AS INT) > 50
        |ORDER BY event_id""".stripMargin,
    "s9_batch_assign" ->
      """SELECT CAST(floor((rn - 1) / 1000) AS INT) AS batch_id,
        |  count(*) AS n_rows, min(event_id) AS min_id, max(event_id) AS max_id
        |FROM (SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn
        |      FROM events)
        |GROUP BY 1 ORDER BY batch_id""".stripMargin,
    "s11_multiscan_union" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber = 1
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber = 2
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s12_inmem_source" ->
      """SELECT CAST(row_id AS INT) AS row_id, CAST(distance AS REAL) AS distance,
        |  CAST(temp AS REAL) AS temp,
        |  CAST(CAST(distance AS REAL) AS DOUBLE) * 0.01
        |    + CAST(CAST(temp AS REAL) AS DOUBLE) AS score
        |FROM (VALUES (1, 1200.5, 17.0), (2, 450.0, 21.5), (3, 80.25, 3.0))
        |  t(row_id, distance, temp)
        |ORDER BY row_id""".stripMargin,
    "t1_bulk_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS REAL) AS quantity_f,
        |  CAST(l_extendedprice AS REAL) AS extendedprice_f,
        |  CAST(l_discount AS REAL) AS discount_f,
        |  CAST(l_tax AS REAL) AS tax_f
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t2_null_drop" ->
      """SELECT event_id,
        |  CASE WHEN value < 1.0 THEN NULL ELSE value END AS label
        |FROM events
        |WHERE CASE WHEN value < 1.0 THEN NULL ELSE value END IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "t3_projection" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "t5_validate_row" ->
      """SELECT CAST(row_id AS INT) AS row_id,
        |  coalesce(distance, CAST(0.0 AS REAL)) AS distance_v,
        |  coalesce(temp, CAST(0.0 AS REAL)) AS temp_v,
        |  coalesce(wind, CAST(0.0 AS REAL)) AS wind_v,
        |  distance IS NULL AS distance_missing,
        |  temp IS NULL AS temp_missing,
        |  wind IS NULL AS wind_missing
        |FROM (VALUES
        |  (1, CAST(1200.5 AS REAL), CAST(NULL AS REAL), CAST(3.2 AS REAL)),
        |  (2, CAST(NULL AS REAL), CAST(21.0 AS REAL), CAST(NULL AS REAL)))
        |  t(row_id, distance, temp, wind)
        |ORDER BY row_id""".stripMargin,
    "t6_between_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity BETWEEN 10.0 AND 20.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t7_column_override" ->
      """SELECT event_id, value, CAST(42.5 AS DOUBLE) AS value_overridden
        |FROM events ORDER BY event_id""".stripMargin,
    "t8_grid_substitution" ->
      """SELECT CAST(h AS INT) AS hour, CAST(h AS REAL) AS phour,
        |  CAST(30.0 AS REAL) AS pmin, CAST(1200.5 AS REAL) AS distance,
        |  CAST(17.0 AS REAL) AS temp
        |FROM generate_series(0, 23) t(h)
        |ORDER BY hour""".stripMargin,
    "t9_domain_filter" ->
      """SELECT CAST(h AS INT) AS hour
        |FROM (VALUES (-3), (0), (7), (12), (18), (23), (24), (99)) t(h)
        |WHERE h BETWEEN 0 AND 23
        |ORDER BY hour""".stripMargin,
    // the impute mean rides the ×10³ grid: exact HUGEINT sum, two-
    // division double epilogue (a streaming avg(double) drifted at x10)
    "a1_mean_impute" ->
      """WITH n AS (SELECT event_id,
        |    CASE WHEN value < 1.0 THEN NULL ELSE value END AS value_n
        |  FROM events),
        |m AS (SELECT CAST(sum(CAST(round(value_n * 1000.0) AS BIGINT))
        |      AS DOUBLE)
        |    / CAST(count(value_n) AS DOUBLE) / 1000.0 AS mean_value
        |  FROM n)
        |SELECT event_id,
        |  coalesce(value_n, (SELECT mean_value FROM m)) AS value_imputed
        |FROM n ORDER BY event_id""".stripMargin,
    "a2_scalar_agg" ->
      """SELECT CAST(avg(value) AS REAL) AS mean_value, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_users
        |FROM events""".stripMargin,
    "agg_group_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(value) AS REAL) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_rollup" ->
      """SELECT event_type, CAST(user_bucket AS INT) AS user_bucket,
        |  count(*) AS n, CAST(sum(value) AS REAL) AS sum_value
        |FROM (SELECT event_type, user_id % 3 AS user_bucket, value FROM events)
        |GROUP BY ROLLUP (event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "agg_salted_skew" ->
      """SELECT user_id, count(*) AS n, CAST(sum(value) AS REAL) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "join_salted_skew" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    AS revenue_c4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    AS revenue_c4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_pivot" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "udaf_weighted_avg" ->
      """SELECT event_type,
        |  CAST(sum(value * k) / sum(k) AS REAL) AS weighted_avg_value
        |FROM (SELECT event_type, value,
        |        CAST(props->>'$.k' AS DOUBLE) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sql_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(l_extendedprice * (1.0 - l_discount)) AS REAL) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "join_broadcast_dim" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_shuffle_fact" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_star_3way" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS HUGEINT)) AS DOUBLE)
        |    / 100.0 AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_anti_unordered" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin,
    "join_semi_active" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_left_outer" ->
      """SELECT p_partkey, count(l_orderkey) AS n_2001_items
        |FROM part LEFT JOIN (SELECT * FROM lineitem
        |    WHERE l_shipdate >= TIMESTAMP '2001-01-01') li
        |  ON p_partkey = li.l_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "join_full_outer" ->
      """WITH early AS (SELECT o_custkey AS ck, count(*) AS n_early FROM orders
        |    WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY o_custkey),
        |  late AS (SELECT o_custkey AS ck, count(*) AS n_late FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey)
        |SELECT coalesce(early.ck, late.ck) AS custkey,
        |  coalesce(n_early, 0) AS n_early, coalesce(n_late, 0) AS n_late
        |FROM early FULL JOIN late ON early.ck = late.ck
        |ORDER BY custkey""".stripMargin,
    "set_ops_multiset" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
        |  e AS (SELECT user_id FROM events WHERE event_type = 'error'),
        |  both_tags AS (
        |    SELECT user_id, 'intersect_all' AS tag
        |    FROM (SELECT user_id FROM p INTERSECT ALL SELECT user_id FROM e)
        |    UNION ALL
        |    SELECT user_id, 'except_all' AS tag
        |    FROM (SELECT user_id FROM p EXCEPT ALL SELECT user_id FROM e))
        |SELECT tag, user_id, count(*) AS multiplicity
        |FROM both_tags GROUP BY tag, user_id
        |ORDER BY tag, user_id""".stripMargin,
    "join_asof" ->
      """WITH p AS (SELECT user_id, ts, value FROM events
        |    WHERE event_type = 'purchase'),
        |  e AS (SELECT event_id, user_id, ts FROM events
        |    WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id,
        |  make_timestamp(epoch_ms(p.ts) * 1000) AS purchase_ts,
        |  p.value AS purchase_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "join_range_bands" ->
      """SELECT band, count(*) AS n, min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events
        |JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
        |      ('high', 150.0, 1000000000.0)) b(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "agg_percentiles" ->
      """SELECT event_type,
        |  CAST(quantile_cont(value, 0.25) AS REAL) AS p25,
        |  CAST(quantile_cont(value, 0.5) AS REAL) AS p50,
        |  CAST(quantile_cont(value, 0.75) AS REAL) AS p75,
        |  CAST(quantile_cont(value, 0.9) AS REAL) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "window_topk_per_key" ->
      """SELECT event_type, CAST(rk AS INT) AS rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,
    "window_running_sum" ->
      """SELECT user_id, event_id, value,
        |  CAST(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS REAL) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "window_hopping_agg" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_ms(ts) // 10800000) * 10800 AS s3 FROM events)
        |SELECT TIMESTAMP '1970-01-01 00:00:00' + ws * INTERVAL 1 SECOND
        |    AS window_start,
        |  event_type, count(*) AS n
        |FROM (SELECT event_type, unnest([s3 - 10800, s3]) AS ws FROM e)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "window_session_agg" ->
      """WITH o AS (SELECT user_id, ts, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (SELECT *, sum(CASE WHEN prev IS NULL OR ms - prev >= 1800000
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
        |    AS island FROM o)
        |SELECT user_id,
        |  make_timestamp(min(ms) * 1000) AS session_start,
        |  count(*) AS n_events
        |FROM m GROUP BY user_id, island
        |ORDER BY user_id, session_start""".stripMargin,
    "window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  CAST(value - lag(value, 1) OVER w AS REAL) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    // exact HUGEINT moments on the ×10³ value grid (the builtin
    // streaming covar/corr accumulators are engine-order-dependent and
    // diverged at x10); median is selection-based and stays raw
    "agg_stats_advanced" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(round(value * 1000.0) AS HUGEINT) AS v3,
        |    CAST(user_id AS HUGEINT) AS u, value
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    sum(v3) AS sv, sum(v3 * v3) AS svv,
        |    sum(u) AS su, sum(u * u) AS suu, sum(u * v3) AS suv,
        |    CAST(median(value) AS REAL) AS median_value
        |  FROM e GROUP BY event_type
        |)
        |SELECT event_type,
        |  CAST(sqrt(CAST(n * svv - sv * sv AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 1e6)
        |    AS REAL) AS sd_value,
        |  CAST(CAST(n * svv - sv * sv AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 1e6
        |    AS REAL) AS var_value,
        |  median_value,
        |  CAST(CAST(n * suv - su * sv AS DOUBLE)
        |    / (sqrt(CAST(n * svv - sv * sv AS DOUBLE))
        |      * sqrt(CAST(n * suu - su * su AS DOUBLE))) AS REAL)
        |    AS corr_value_user,
        |  CAST(CAST(n * suv - su * sv AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 1e3
        |    AS REAL) AS covar_value_user
        |FROM m ORDER BY event_type""".stripMargin,
    "o1_sort_importance_desc" ->
      """SELECT event_type, avg(value) AS importance
        |FROM events GROUP BY event_type
        |ORDER BY importance DESC, event_type""".stripMargin,
    "o2_topk_asc" ->
      """SELECT event_id, value FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY value, event_id LIMIT 20""".stripMargin,
    "set_ops_users" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'both' AS tag FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS tag FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |ORDER BY tag, user_id""".stripMargin,
    "f_string_fns" ->
      """SELECT doc_id,
        |  upper(lang) AS lang_upper,
        |  substring(text, 1, 20) AS text_head,
        |  CAST(length(text) AS INT) AS text_len,
        |  source || ':' || lang AS source_lang,
        |  regexp_replace(text, '\s+', ' ', 'g') AS text_norm_head,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_space
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f_string_advanced" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_lpad,
        |  rpad(p_brand, 12, '-') AS brand_rpad,
        |  reverse(p_name) AS name_rev,
        |  CAST(strpos(p_type, 'a') AS INT) AS type_a_pos,
        |  translate(p_brand, 'B#', 'b_') AS brand_translated,
        |  split_part(p_type, ' ', 1) AS type_first_word,
        |  repeat(p_brand, 2) AS brand_twice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f_regex_fns" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k_extracted,
        |  CAST(len(regexp_extract_all(event_type, '[aeiou]')) AS INT) AS n_vowels,
        |  regexp_matches(event_type, '^(error|view)$') AS is_err_or_view
        |FROM events
        |WHERE regexp_matches(props, '"k": \d+')
        |ORDER BY event_id""".stripMargin,
    "f_null_semantics" ->
      """SELECT event_id,
        |  nullif(event_type, 'error') AS type_or_null,
        |  coalesce(CASE WHEN value < 1.0 THEN NULL ELSE value END, -1.0)
        |    AS value_defaulted,
        |  (CASE WHEN value < 1.0 THEN NULL ELSE value END)
        |    IS NOT DISTINCT FROM NULL AS value_is_null,
        |  (CASE WHEN value < 1.0 THEN NULL ELSE value END) IS NOT NULL
        |    AS value_present
        |FROM events ORDER BY event_id""".stripMargin,
    "f_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
        |  CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS order_dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
        |    AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  pow(l_discount, 2) AS disc_sq,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f_array_fns" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_component,
        |  sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2_norm,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
        |  len(list_filter(embedding, x -> x > CAST(0.3 AS REAL))) > 0 AS has_large,
        |  list_sort(embedding)[1] AS min_component,
        |  list_sort(embedding)[-1] AS max_component
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  doc_id = min(doc_id) OVER (PARTITION BY
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ann_brute_force_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  list_dot_product(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(qe AS DOUBLE[]) FROM q)) AS cosine
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "ann_hard_negatives" ->
      """WITH a AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS ae,
        |    label AS al
        |  FROM embeddings WHERE vec_id < 10
        |), s AS (
        |  SELECT a.anchor_id, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), a.ae) AS cosine
        |  FROM embeddings e JOIN a ON e.label <> a.al
        |), r AS (
        |  SELECT anchor_id, vec_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY cosine DESC, vec_id) AS INT) AS rank
        |  FROM s
        |)
        |SELECT anchor_id, rank, vec_id, cosine FROM r
        |WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin,
    // the same greedy unroll as the Spark fold: pick 1 = argmax rel;
    // picks 2..3 = argmax 0.7·rel − 0.3·max-sim-to-picked
    "retrieval_mmr_topk" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
        |  WHERE vec_id = 0
        |), rel AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    list_dot_product(CAST(embedding AS DOUBLE[]),
        |      (SELECT qe FROM q)) AS rel
        |  FROM embeddings WHERE vec_id <> 0
        |  ORDER BY rel DESC, vec_id LIMIT 10
        |), pairs AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_dot_product(x.e, y.e) AS sim
        |  FROM rel x JOIN rel y ON x.vec_id <> y.vec_id
        |), s1 AS (
        |  SELECT vec_id, rel AS score FROM rel
        |  ORDER BY rel DESC, vec_id LIMIT 1
        |), c2 AS (
        |  SELECT r.vec_id, 0.7 * r.rel - 0.3 * max(p.sim) AS score
        |  FROM rel r JOIN pairs p ON p.a = r.vec_id
        |    AND p.b IN (SELECT vec_id FROM s1)
        |  WHERE r.vec_id NOT IN (SELECT vec_id FROM s1)
        |  GROUP BY r.vec_id, r.rel
        |), s2 AS (SELECT vec_id, score FROM c2
        |  ORDER BY score DESC, vec_id LIMIT 1
        |), c3 AS (
        |  SELECT r.vec_id, 0.7 * r.rel - 0.3 * max(p.sim) AS score
        |  FROM rel r JOIN pairs p ON p.a = r.vec_id
        |    AND p.b IN (SELECT vec_id FROM s1
        |                UNION ALL SELECT vec_id FROM s2)
        |  WHERE r.vec_id NOT IN (SELECT vec_id FROM s1
        |                         UNION ALL SELECT vec_id FROM s2)
        |  GROUP BY r.vec_id, r.rel
        |), s3 AS (SELECT vec_id, score FROM c3
        |  ORDER BY score DESC, vec_id LIMIT 1
        |)
        |SELECT vec_id, CAST(1 AS INT) AS pick_order, score FROM s1
        |UNION ALL SELECT vec_id, CAST(2 AS INT), score FROM s2
        |UNION ALL SELECT vec_id, CAST(3 AS INT), score FROM s3
        |ORDER BY pick_order""".stripMargin,
    // the 8×8 slice-dot grid is generated, not hand-written: greatest()
    // is exact max, and the 8-term sum is left-associated in BOTH
    // engines (Scala reduce and SQL's left-assoc +), so each maxsim is
    // the bit-identical double
    "retrieval_colbert_maxsim" -> {
      val terms = (0 until 8).map { i =>
        (0 until 8).map { j =>
          s"list_dot_product(de[${j * 8 + 1}:${j * 8 + 8}], " +
            s"qe[${i * 8 + 1}:${i * 8 + 8}])"
        }.mkString("greatest(", ", ", ")")
      }.mkString("\n  + ")
      s"""WITH q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
         |  WHERE vec_id = 0
         |), d AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings
         |  WHERE vec_id <> 0
         |)
         |SELECT vec_id,
         |  $terms AS maxsim
         |FROM d, q ORDER BY maxsim DESC, vec_id LIMIT 10""".stripMargin
    },
    "ann_knn_graph_mutual" ->
      """WITH sub AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE vec_id < 512
        |), p AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_dot_product(x.e, y.e) AS cosine
        |  FROM sub x JOIN sub y ON x.vec_id <> y.vec_id
        |), r AS (
        |  SELECT a, b, cosine, row_number() OVER (PARTITION BY a
        |    ORDER BY cosine DESC, b) AS rn
        |  FROM p
        |), knn AS (SELECT a, b, cosine FROM r WHERE rn <= 5)
        |SELECT k.a, k.b, k.cosine FROM knn k
        |JOIN knn m ON m.a = k.b AND m.b = k.a
        |WHERE k.a < k.b ORDER BY k.a, k.b""".stripMargin,
    "retrieval_prf_expansion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), qt AS (SELECT DISTINCT tok FROM tf WHERE doc_id = 0),
        |fb AS (
        |  SELECT t.doc_id, count(*) AS n_terms,
        |    CAST(sum(t.tf) AS BIGINT) AS q_tf
        |  FROM tf t JOIN qt USING (tok)
        |  WHERE t.doc_id <> 0
        |  GROUP BY t.doc_id
        |  ORDER BY n_terms DESC, q_tf DESC, doc_id LIMIT 10
        |)
        |SELECT t.tok, count(*) AS n_docs, CAST(sum(t.tf) AS BIGINT) AS total_tf
        |FROM tf t JOIN fb ON t.doc_id = fb.doc_id
        |WHERE t.tok NOT IN (SELECT tok FROM qt)
        |GROUP BY t.tok
        |ORDER BY n_docs DESC, total_tf DESC, tok LIMIT 10""".stripMargin,
    "corpus_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), tb AS (
        |  SELECT t.doc_id, d.lang,
        |    CAST('0x' || substr(md5(t.tok), 1, 15) AS BIGINT) % 64 AS bucket,
        |    t.tf
        |  FROM tf t JOIN documents d USING (doc_id)
        |), src AS (
        |  SELECT bucket, CAST(sum(tf) AS BIGINT) AS cs FROM tb GROUP BY bucket
        |), tgt AS (
        |  SELECT bucket, CAST(sum(tf) AS BIGINT) AS ct FROM tb
        |  WHERE lang = 'en' GROUP BY bucket
        |), tot AS (
        |  SELECT CAST(sum(tf) AS BIGINT) AS ts,
        |    CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS tt
        |  FROM tb
        |), dist AS (
        |  SELECT s.bucket,
        |    ln(COALESCE(t.ct, 0) + 1) - ln(tot.tt + 64)
        |      - ln(s.cs + 1) + ln(tot.ts + 64) AS logratio
        |  FROM src s LEFT JOIN tgt t USING (bucket), tot
        |)
        |SELECT tb.doc_id, tb.lang, CAST(sum(tb.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(tb.tf * d.logratio) AS REAL) AS dsir_logweight
        |FROM tb JOIN dist d USING (bucket)
        |GROUP BY tb.doc_id, tb.lang ORDER BY doc_id""".stripMargin,
    "feature_woe_iv" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
        |  FROM events
        |), c AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS good
        |  FROM ev GROUP BY event_type
        |), c2 AS (SELECT event_type, n, good, n - good AS bad FROM c),
        |g AS (
        |  SELECT CAST(sum(good) AS BIGINT) AS gt,
        |    CAST(sum(bad) AS BIGINT) AS bt FROM c2
        |)
        |SELECT c2.event_type, c2.n, c2.good, c2.bad,
        |  CAST(ln(CAST((2 * good + 1) * bt AS DOUBLE)
        |    / CAST((2 * bad + 1) * gt AS DOUBLE)) AS REAL) AS woe,
        |  CAST(CAST((2 * good + 1) * bt - (2 * bad + 1) * gt AS DOUBLE)
        |    / CAST(2 * gt * bt AS DOUBLE)
        |    * ln(CAST((2 * good + 1) * bt AS DOUBLE)
        |      / CAST((2 * bad + 1) * gt AS DOUBLE)) AS REAL) AS iv_term
        |FROM c2, g ORDER BY event_type""".stripMargin,
    // the oracle rebuilds the same md5-derived signatures, so the
    // estimator column itself (not just the verdicts) is hash-compared
    "dedup_minhash_est_error" ->
      s"""WITH ${minhashPairsCtes(8, 4, "0.0")},
         |eq AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(count(*) FILTER (WHERE sa.mh = sb.mh) AS INT) AS n_equal
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hi = sa.hi
         |  GROUP BY c.doc_a, c.doc_b
         |)
         |SELECT p.doc_a, p.doc_b, e.n_equal,
         |  CAST(e.n_equal AS DOUBLE) / 32 AS est_jaccard,
         |  p.jaccard AS exact_jaccard,
         |  abs(CAST(e.n_equal AS DOUBLE) / 32 - p.jaccard) AS abs_err
         |FROM pairs p JOIN eq e ON e.doc_a = p.doc_a AND e.doc_b = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "dedup_line_level" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 4 = 0
        |       THEN 'subscribe to our newsletter today. ' ELSE '' END)
        |    || text || '. copyright ' || source
        |    || ' all rights reserved.' AS text2
        |  FROM documents
        |), r0 AS (
        |  SELECT doc_id, unnest(string_split(text2, '.')) AS s FROM planted
        |), r1 AS (
        |  SELECT doc_id, trim(s) AS s FROM r0 WHERE trim(s) <> ''
        |), sents AS (
        |  SELECT doc_id, md5(lower(s)) AS fp FROM r1
        |), fpd AS (
        |  SELECT fp, count(DISTINCT doc_id) AS n_docs FROM sents GROUP BY fp
        |)
        |SELECT s.doc_id, count(*) AS n_sents,
        |  CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_sents,
        |  CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac
        |FROM sents s JOIN fpd f USING (fp)
        |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    "graph_closeness_sampled" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), verts AS (SELECT DISTINCT u FROM edges),
        |r(src, v, dist) AS (
        |  SELECT u, u, 0 FROM verts WHERE u <= 50
        |  UNION
        |  SELECT r.src, e.v, r.dist + 1
        |  FROM r JOIN edges e ON e.u = r.v WHERE r.dist < 4
        |), md AS (
        |  SELECT src, v, min(dist) AS d FROM r GROUP BY src, v
        |), c AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN d = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        |  FROM md WHERE d > 0 GROUP BY v
        |)
        |SELECT v, n1, n2, n3, n4,
        |  CAST(n1 AS DOUBLE) / 1.0 + CAST(n2 AS DOUBLE) / 2.0
        |    + CAST(n3 AS DOUBLE) / 3.0 + CAST(n4 AS DOUBLE) / 4.0 AS harmonic
        |FROM c ORDER BY v""".stripMargin,
    // replays the synthesized gradient raster arithmetically (no image
    // bytes): pixels → pooled cells → cross-multiplied dHash bits; a
    // decoder regression on the Spark side hash-mismatches
    "multimodal_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id AS src, doc_id AS id, 0 AS bright FROM documents
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1000000, 1 FROM documents WHERE doc_id < 10
        |), params AS (
        |  SELECT id, bright,
        |    16 + CAST('0x' || substr(md5(src || ':gw'), 1, 15) AS BIGINT)
        |      % 17 AS w,
        |    16 + CAST('0x' || substr(md5(src || ':gh'), 1, 15) AS BIGINT)
        |      % 9 AS h,
        |    CAST('0x' || substr(md5(src || ':gr'), 1, 15) AS BIGINT)
        |      % 224 AS br,
        |    CAST('0x' || substr(md5(src || ':gg'), 1, 15) AS BIGINT)
        |      % 224 AS bg,
        |    CAST('0x' || substr(md5(src || ':gb'), 1, 15) AS BIGINT)
        |      % 224 AS bb,
        |    CAST('0x' || substr(md5(src || ':kxr'), 1, 15) AS BIGINT)
        |      % 8 AS kxr,
        |    CAST('0x' || substr(md5(src || ':kxg'), 1, 15) AS BIGINT)
        |      % 8 AS kxg,
        |    CAST('0x' || substr(md5(src || ':kxb'), 1, 15) AS BIGINT)
        |      % 8 AS kxb,
        |    CAST('0x' || substr(md5(src || ':kyr'), 1, 15) AS BIGINT)
        |      % 8 AS kyr,
        |    CAST('0x' || substr(md5(src || ':kyg'), 1, 15) AS BIGINT)
        |      % 8 AS kyg,
        |    CAST('0x' || substr(md5(src || ':kyb'), 1, 15) AS BIGINT)
        |      % 8 AS kyb,
        |    CAST('0x' || substr(md5(src || ':kxxr'), 1, 15) AS BIGINT)
        |      % 8 AS kxxr,
        |    CAST('0x' || substr(md5(src || ':kxxg'), 1, 15) AS BIGINT)
        |      % 8 AS kxxg,
        |    CAST('0x' || substr(md5(src || ':kxxb'), 1, 15) AS BIGINT)
        |      % 8 AS kxxb,
        |    CAST('0x' || substr(md5(src || ':kxyr'), 1, 15) AS BIGINT)
        |      % 8 AS kxyr,
        |    CAST('0x' || substr(md5(src || ':kxyg'), 1, 15) AS BIGINT)
        |      % 8 AS kxyg,
        |    CAST('0x' || substr(md5(src || ':kxyb'), 1, 15) AS BIGINT)
        |      % 8 AS kxyb,
        |    CAST('0x' || substr(md5(src || ':kyyr'), 1, 15) AS BIGINT)
        |      % 8 AS kyyr,
        |    CAST('0x' || substr(md5(src || ':kyyg'), 1, 15) AS BIGINT)
        |      % 8 AS kyyg,
        |    CAST('0x' || substr(md5(src || ':kyyb'), 1, 15) AS BIGINT)
        |      % 8 AS kyyb
        |  FROM ids
        |), px AS (
        |  SELECT p.id, gx.x, gy.y,
        |    2126 * (16 + (p.br + gx.x * gx.x * p.kxxr + gx.x * gy.y * p.kxyr
        |      + gy.y * gy.y * p.kyyr + gx.x * p.kxr + gy.y * p.kyr) % 224
        |      + p.bright)
        |    + 7152 * (16 + (p.bg + gx.x * gx.x * p.kxxg + gx.x * gy.y * p.kxyg
        |      + gy.y * gy.y * p.kyyg + gx.x * p.kxg + gy.y * p.kyg) % 224
        |      + p.bright)
        |    + 722 * (16 + (p.bb + gx.x * gx.x * p.kxxb + gx.x * gy.y * p.kxyb
        |      + gy.y * gy.y * p.kyyb + gx.x * p.kxb + gy.y * p.kyb) % 224
        |      + p.bright) AS lum,
        |    gx.x * 9 // p.w AS ci, gy.y * 8 // p.h AS cj
        |  FROM params p,
        |    LATERAL (SELECT unnest(generate_series(0, p.w - 1)) AS x) gx,
        |    LATERAL (SELECT unnest(generate_series(0, p.h - 1)) AS y) gy
        |), cells AS (
        |  SELECT id, ci, cj, CAST(sum(lum) AS BIGINT) AS s, count(*) AS c
        |  FROM px GROUP BY 1, 2, 3
        |), bits AS (
        |  SELECT a.id, a.ci AS i, a.cj AS j,
        |    CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
        |  FROM cells a JOIN cells b ON b.id = a.id AND b.ci = a.ci + 1
        |    AND b.cj = a.cj
        |  WHERE a.ci < 8
        |), ph AS (
        |  SELECT id, string_agg(bit, '' ORDER BY i, j) AS phash
        |  FROM bits GROUP BY id
        |)
        |SELECT phash, count(*) AS n_docs, min(id) AS keeper_doc,
        |  max(id) AS max_doc, count(*) - 1 AS n_dropped
        |FROM ph GROUP BY phash HAVING count(*) >= 2
        |ORDER BY phash""".stripMargin,
    "graph_effective_diameter" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), verts AS (SELECT DISTINCT u FROM edges),
        |r(src, v, dist) AS (
        |  SELECT u, u, 0 FROM verts WHERE u <= 50
        |  UNION
        |  SELECT r.src, e.v, r.dist + 1
        |  FROM r JOIN edges e ON e.u = r.v WHERE r.dist < 4
        |), md AS (
        |  SELECT src, v, min(dist) AS d FROM r GROUP BY src, v
        |), c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN d = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
        |  FROM md WHERE d > 0
        |)
        |SELECT n1 + n2 + n3 + n4 AS n_pairs, n1, n2, n3, n4,
        |  CAST(1 * n1 + 2 * n2 + 3 * n3 + 4 * n4 AS DOUBLE)
        |    / CAST(n1 + n2 + n3 + n4 AS DOUBLE) AS mean_dist,
        |  CAST(CASE WHEN 10 * n1 >= 9 * (n1 + n2 + n3 + n4) THEN 1
        |    WHEN 10 * (n1 + n2) >= 9 * (n1 + n2 + n3 + n4) THEN 2
        |    WHEN 10 * (n1 + n2 + n3) >= 9 * (n1 + n2 + n3 + n4) THEN 3
        |    ELSE 4 END AS INT) AS d90
        |FROM c""".stripMargin,
    "dq_benford_test" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders
        |), c AS (
        |  SELECT digit, count(*) AS obs FROM d GROUP BY digit
        |), t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM c)
        |SELECT digit, obs, n,
        |  CAST(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS REAL)
        |    AS p_benford,
        |  CAST((CAST(obs AS DOUBLE) - CAST(n AS DOUBLE)
        |      * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |    * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE)
        |      * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
        |    / (CAST(n AS DOUBLE)
        |      * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))) AS REAL)
        |    AS chi2_term
        |FROM c, t ORDER BY digit""".stripMargin,
    // the streaming state's verdicts replayed as cumulative
    // 1-PRECEDING window sums — integer-exact on both sides
    "stream_anomaly_zscore" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), cum AS (
        |  SELECT user_id, event_id, v3,
        |    count(*) OVER w AS n,
        |    COALESCE(sum(v3) OVER w, 0) AS s,
        |    COALESCE(sum(v3 * v3) OVER w, 0) AS q
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, event_id, CAST(n AS BIGINT) AS n_prior
        |FROM cum
        |WHERE n >= 10
        |  AND (v3 * n - s) * (v3 * n - s) > 9 * (n * q - s * s)
        |ORDER BY user_id, event_id""".stripMargin,
    "text_kneser_ney" ->
      """WITH toks AS (
        |  SELECT string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), g AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), big AS (SELECT w1, w2, count(*) AS c FROM g GROUP BY 1, 2),
        |ctx AS (
        |  SELECT w1, CAST(sum(c) AS BIGINT) AS c1, count(*) AS n_after
        |  FROM big GROUP BY w1
        |), cont AS (SELECT w2, count(*) AS n_before FROM big GROUP BY w2),
        |nb AS (SELECT count(*) AS n_big FROM big)
        |SELECT b.w1, b.w2, b.c, x.c1, x.n_after, o.n_before,
        |  greatest(CAST(b.c AS DOUBLE) - 0.75, 0.0) / x.c1
        |    + 0.75 * x.n_after / x.c1
        |    * (CAST(o.n_before AS DOUBLE) / nb.n_big) AS p_kn
        |FROM big b JOIN ctx x USING (w1) JOIN cont o USING (w2), nb
        |WHERE b.c >= 5
        |ORDER BY w1, w2""".stripMargin,
    // the greedy farthest-point unroll, one CTE pair per pick — the
    // same generated-unroll discipline as retrieval_mmr_topk
    "sample_kcenter_coreset" -> {
      val ctes = (2 to 8).map { i =>
        val prevUnion = (1 until i)
          .map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
        s"""chosen$i AS ($prevUnion),
           |cand$i AS (
           |  SELECT b.vec_id,
           |    min(b.nrm + c.nrm - 2 * list_dot_product(b.e, c.e)) AS md2
           |  FROM base b, base c
           |  WHERE c.vec_id IN (SELECT vec_id FROM chosen$i)
           |    AND b.vec_id NOT IN (SELECT vec_id FROM chosen$i)
           |  GROUP BY b.vec_id
           |),
           |s$i AS (
           |  SELECT vec_id, CAST($i AS INT) AS pick_order, md2 AS dist2
           |  FROM cand$i ORDER BY md2 DESC, vec_id LIMIT 1
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[])) AS nrm
         |  FROM embeddings
         |), s1 AS (
         |  SELECT vec_id, CAST(1 AS INT) AS pick_order,
         |    CAST(0.0 AS DOUBLE) AS dist2
         |  FROM base WHERE vec_id = 0
         |),
         |$ctes
         |${(1 to 8).map(i => s"SELECT vec_id, pick_order, dist2 FROM s$i")
        .mkString("\nUNION ALL ")}
         |ORDER BY pick_order""".stripMargin
    },
    "ts_mann_kendall" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(round(value * 1000000.0) AS BIGINT) AS v6
        |  FROM events
        |), pairs AS (
        |  SELECT a.user_id, a.v6 AS v_a, b.v6 AS v_b,
        |    a.us AS us_a, b.us AS us_b, a.event_id AS id_a, b.event_id AS id_b
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
        |), s AS (
        |  SELECT user_id, CAST(sum(sign(v_b - v_a)) AS BIGINT) AS s_stat
        |  FROM pairs GROUP BY user_id
        |), ties AS (
        |  SELECT user_id,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18,
        |    CAST(sum(t) AS BIGINT) AS n
        |  FROM (SELECT user_id, v6, count(*) AS t FROM ev GROUP BY 1, 2)
        |  GROUP BY user_id
        |), slopes AS (
        |  SELECT user_id,
        |    CAST(v_b - v_a AS DOUBLE) / CAST(us_b - us_a AS DOUBLE) AS slope,
        |    id_a, id_b
        |  FROM pairs WHERE us_a <> us_b
        |), ranked AS (
        |  SELECT user_id, slope, row_number() OVER (PARTITION BY user_id
        |    ORDER BY slope, id_a, id_b) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS m
        |  FROM slopes
        |), sen AS (
        |  SELECT user_id, sum(slope) / count(*) AS sen_slope
        |  FROM ranked
        |  WHERE (m % 2 = 1 AND rn = (m + 1) // 2)
        |     OR (m % 2 = 0 AND (rn = m // 2 OR rn = m // 2 + 1))
        |  GROUP BY user_id
        |)
        |SELECT s.user_id, t.n, s.s_stat,
        |  t.n * (t.n - 1) * (2 * t.n + 5) - t.tie18 AS var18,
        |  CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
        |      / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie18) / 18.0)
        |    WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
        |      / sqrt((t.n * (t.n - 1) * (2 * t.n + 5) - t.tie18) / 18.0)
        |    ELSE 0.0 END AS z,
        |  sen.sen_slope
        |FROM s JOIN ties t USING (user_id) JOIN sen USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // the FFD recurrence replayed with the bin-load list as recursive
    // CTE state; all arithmetic integer, so placement is exact
    "pack_bin_ffd" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source, CAST(len(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |    AS BIGINT) AS t
        |  FROM documents
        |), ord AS (
        |  SELECT doc_id, source, t,
        |    row_number() OVER (PARTITION BY source ORDER BY t DESC, doc_id)
        |      AS rn
        |  FROM toks
        |), pk(source, rn, doc_id, t, bin, loads) AS (
        |  SELECT source, rn, doc_id, t, CAST(0 AS BIGINT) AS bin, [t] AS loads
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.source, o.rn, o.doc_id, o.t,
        |    CASE WHEN len(list_filter(range(1, len(p.loads) + 1),
        |        i -> p.loads[i] + o.t <= 256)) > 0
        |      THEN list_filter(range(1, len(p.loads) + 1),
        |        i -> p.loads[i] + o.t <= 256)[1] - 1
        |      ELSE len(p.loads) END AS bin,
        |    CASE WHEN len(list_filter(range(1, len(p.loads) + 1),
        |        i -> p.loads[i] + o.t <= 256)) > 0
        |      THEN list_transform(range(1, len(p.loads) + 1),
        |        i -> CASE WHEN i = list_filter(range(1, len(p.loads) + 1),
        |            j -> p.loads[j] + o.t <= 256)[1]
        |          THEN p.loads[i] + o.t ELSE p.loads[i] END)
        |      ELSE list_append(p.loads, o.t) END AS loads
        |  FROM pk p JOIN ord o ON o.source = p.source AND o.rn = p.rn + 1
        |)
        |SELECT doc_id, source, t AS n_tokens, bin FROM pk
        |ORDER BY source, doc_id""".stripMargin,
    "graph_node2vec_transitions" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), ranked AS (
        |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY
        |    CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':cap:' ||
        |      CAST(v AS VARCHAR)), 1, 15) AS BIGINT), v) AS rn
        |  FROM edges
        |), adj AS (
        |  SELECT u, list_sort(list(v)) AS nbrs FROM ranked
        |  WHERE rn <= 64 GROUP BY u
        |), exp1 AS (
        |  SELECT u AS prev, nbrs AS prev_nbrs, unnest(nbrs) AS cur
        |  FROM adj WHERE u <= 20
        |), exp2 AS (
        |  SELECT e.prev, e.prev_nbrs, e.cur, unnest(a.nbrs) AS next
        |  FROM exp1 e JOIN adj a ON a.u = e.cur
        |), wt AS (
        |  SELECT prev, cur, next,
        |    CAST(CASE WHEN next = prev THEN 0.5
        |      WHEN list_contains(prev_nbrs, next) THEN 1.0
        |      ELSE 2.0 END AS DOUBLE) AS w
        |  FROM exp2
        |)
        |SELECT prev, cur, next, w,
        |  w / sum(w) OVER (PARTITION BY prev, cur) AS prob
        |FROM wt ORDER BY prev, cur, next""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS DOUBLE) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        |  (CAST(length(text) AS DOUBLE)
        |     - CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |    / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
        |    + least(((CAST(length(text) AS DOUBLE)
        |        - CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE))
        |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0) * 0.3
        |    + (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |       / CAST(length(text) AS DOUBLE)) * 0.2 AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, CAST(sum(value) AS REAL) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // native session_window in append mode: the oracle is the batch
    // gap-rule sessionization filtered to sessions the final watermark
    // (max ts - 1h) finalized — session end = last event + 30min gap
    "stream_session_window" ->
      """WITH o AS (SELECT user_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
        |      AS prev
        |  FROM events),
        |m AS (SELECT *,
        |    sum(CASE WHEN prev IS NULL OR us - prev >= 1800000000
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
        |    AS island FROM o),
        |s AS (SELECT user_id, min(us) AS s_us, max(us) AS e_us,
        |    count(*) AS n_events
        |  FROM m GROUP BY user_id, island),
        |wm AS (SELECT max(us) - 3600000000 AS w FROM o)
        |SELECT user_id, make_timestamp(s_us) AS session_start, n_events
        |FROM s, wm WHERE e_us + 1800000000 <= w
        |ORDER BY user_id, session_start""".stripMargin,
    // the format queries scan ORC/JSONL copies whose content is identical
    // to the parquet tables, so the oracle reads the originals
    "source_orc_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS value_c
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "source_jsonl_agg" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS acctbal_c
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "source_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<legacy>'
        |    ELSE o_orderpriority END AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS value_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_hopping_agg" ->
      """WITH e AS (SELECT event_type, value,
        |    (epoch_ms(ts) // 10800000) * 10800 AS s3 FROM events)
        |SELECT TIMESTAMP '1970-01-01 00:00:00' + ws * INTERVAL 1 SECOND
        |    AS window_start,
        |  event_type, count(*) AS n, CAST(sum(value) AS REAL) AS sum_value
        |FROM (SELECT event_type, value, unnest([s3 - 10800, s3]) AS ws
        |  FROM e)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "stream_session_counts" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ms IS NULL
        |      OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END) AS INT)
        |    AS n_sessions
        |FROM (SELECT user_id, ts,
        |        lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
        |    AS INT) AS n_bpe_tokens,
        |  CAST(length(text) AS DOUBLE) / 4.0 AS n_est_chars4
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH norm AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
        |  FROM documents),
        |toks AS (SELECT doc_id, nt, string_split(nt, ' ') AS t FROM norm),
        |grams AS (SELECT doc_id,
        |    concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]) AS g
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 3)) AS i) s),
        |winnow AS (SELECT doc_id,
        |    min(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)) AS fw
        |  FROM grams GROUP BY doc_id)
        |SELECT n.doc_id, md5(nt) AS fingerprint_md5, fw AS fingerprint_winnow
        |FROM norm n LEFT JOIN winnow w ON n.doc_id = w.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    "text_langid" ->
      """WITH u AS (SELECT doc_id, lang,
        |    list_distinct(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
        |  FROM documents),
        |scores AS (SELECT doc_id, lang,
        |    CAST(len(list_intersect(t, ['der','die','das','und','ist','von','ein','eine','zu','mit'])) AS DOUBLE) / 10.0 AS s_de,
        |    CAST(len(list_intersect(t, ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / 10.0 AS s_en,
        |    CAST(len(list_intersect(t, ['el','la','de','que','y','en','un','una','es','por'])) AS DOUBLE) / 10.0 AS s_es,
        |    CAST(len(list_intersect(t, ['le','la','de','et','les','des','un','une','est','dans'])) AS DOUBLE) / 10.0 AS s_fr,
        |    CAST(len(list_intersect(t, ['de','shi','bu','le','zai','ren','you','wo','ta','zhe'])) AS DOUBLE) / 10.0 AS s_zh
        |  FROM u)
        |SELECT doc_id, lang AS lang_labeled,
        |  CASE WHEN m = 0 THEN 'und'
        |       WHEN s_zh = m THEN 'zh' WHEN s_fr = m THEN 'fr'
        |       WHEN s_es = m THEN 'es' WHEN s_en = m THEN 'en'
        |       ELSE 'de' END AS lang_detected,
        |  m AS lid_score
        |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM scores)
        |ORDER BY doc_id""".stripMargin,
    "stream_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,
    "stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(value) AS REAL) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  count(*) AS n_rows, CAST(sum(l_quantity) AS REAL) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "agg_approx_sketch" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_users_ok,
        |  CAST(quantile_cont(value, 0.5) AS REAL) AS exact_p50,
        |  TRUE AS approx_p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT CAST(l_partkey AS VARCHAR) || ':'
        |    || CAST(l_suppkey AS VARCHAR)) AS n_part_supp,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_min_max_by" ->
      """SELECT event_type,
        |  arg_max(user_id, event_id) AS latest_user,
        |  arg_min(user_id, event_id) AS first_user,
        |  arg_max(value, event_id) AS latest_value,
        |  max(event_id) AS max_event_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_string_concat" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
        |    AS statuses,
        |  count(DISTINCT l_linestatus) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_conditional" ->
      """SELECT event_type,
        |  CAST(count_if(value > 50) AS BIGINT) AS n_gt50,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(value > 99) AS any_gt99,
        |  CAST(sum(CASE WHEN value > 50 THEN value ELSE 0.0 END) AS REAL)
        |    AS sum_gt50
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "window_ranking" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS tile4,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "window_frames" ->
      """SELECT event_id, user_id,
        |  CAST(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS REAL) AS sum_3,
        |  CAST(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS REAL) AS avg_next3,
        |  first_value(value) OVER wa AS first_value,
        |  last_value(value) OVER wa AS last_value,
        |  nth_value(value, 2) OVER wa AS second_value
        |FROM events
        |WINDOW wa AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "join_null_safe" ->
      """WITH n AS (SELECT nullif(n_regionkey, 2) AS k, count(*) AS n_nations
        |  FROM nation GROUP BY nullif(n_regionkey, 2)),
        |r AS (SELECT nullif(r_regionkey, 2) AS rk, r_name FROM region)
        |SELECT n.k, r.r_name, n.n_nations
        |FROM n LEFT JOIN r ON n.k IS NOT DISTINCT FROM r.rk
        |ORDER BY n.k, r.r_name""".stripMargin,
    "join_cross_small" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "subq_correlated" ->
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM orders o
        |    WHERE o.o_custkey = c.c_custkey) AS max_total,
        |  EXISTS(SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderstatus = 'F') AS has_f
        |FROM customer c
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "sql_cte_ranking" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(o_totalprice) AS REAL) AS total
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, n_orders, total,
        |  CAST(dense_rank() OVER (ORDER BY n_orders DESC, o_custkey) AS INT)
        |    AS rnk
        |FROM per_cust ORDER BY o_custkey""".stripMargin,
    "f_map_struct" ->
      """SELECT o_orderkey,
        |  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2
        |    WHEN 'P' THEN 3 END AS status_code,
        |  o_orderpriority AS prio_via_struct,
        |  o_orderstatus AS status_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_json_nested" ->
      """SELECT o_orderkey, o_orderstatus AS status_rt,
        |  o_orderpriority AS prio_rt, o_custkey AS custkey_rt,
        |  CAST(1 AS INT) AS n_ks
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "unpivot_metrics" ->
      """SELECT l_returnflag, 'sum_qty' AS metric,
        |  CAST(sum(l_quantity) AS REAL) AS value
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', CAST(sum(l_discount) AS REAL)
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, 'n_rows', CAST(count(*) AS REAL)
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag, metric""".stripMargin,
    "sample_hash_det" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |  AS BIGINT) % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "o3_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin,
    "typed_pipeline" ->
      """SELECT event_type, count(*) AS n_high, max(event_id) AS max_event_id,
        |  CAST(count(DISTINCT user_id) AS INT) AS n_users
        |FROM events WHERE value > 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
        |), nn AS (SELECT count(*) AS n FROM documents),
        |ad AS (SELECT avg(dl) AS avgdl FROM dl)
        |SELECT t.doc_id, t.tok, t.tf, d.df, l.dl,
        |  CAST(ln((nn.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |    * t.tf * 2.2
        |    / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / ad.avgdl)) AS REAL)
        |    AS bm25
        |FROM tf t JOIN dfreq d USING (tok) JOIN dl l USING (doc_id)
        |CROSS JOIN nn CROSS JOIN ad
        |WHERE t.doc_id < 20
        |ORDER BY doc_id, tok""".stripMargin,
    "text_ngram_counts" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT concat_ws(' ', t[i], t[i+1]) AS gram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |)
        |SELECT gram, count(*) AS n FROM grams GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 50""".stripMargin,
    "text_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), pairs AS (
        |  SELECT substr(tok, i, 2) AS pair
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, length(tok) - 1)) AS i) s
        |  WHERE length(tok) >= 2
        |)
        |SELECT pair, count(*) AS n FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "text_bpe_encode" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), pc AS (
        |  SELECT substr(tok, i, 2) AS pair, count(*) AS n
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    length(tok) - 1)) AS i) s
        |  WHERE length(tok) >= 2 GROUP BY 1
        |), rk AS (
        |  SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rn
        |  FROM pc
        |), m AS (
        |  SELECT max(CASE WHEN rn = 1 THEN pair END) AS m1,
        |    max(CASE WHEN rn = 2 THEN pair END) AS m2,
        |    max(CASE WHEN rn = 3 THEN pair END) AS m3
        |  FROM rk WHERE rn <= 3
        |), enc AS (
        |  -- a corpus with < 3 distinct pairs leaves m2/m3 NULL; COALESCE
        |  -- turns that merge into the identity replace(' ',' ') so the
        |  -- chain degrades exactly like the Spark fold over a short
        |  -- merge list (instead of NULLing the whole expression)
        |  SELECT doc_id, CAST(length(tok) AS BIGINT) AS nch,
        |    CAST(len(string_split(trim(
        |      replace(replace(replace(
        |        ' ' || regexp_replace(tok, '(.)', '\1 ', 'g'),
        |        COALESCE(' ' || substr(m1, 1, 1) || ' ' || substr(m1, 2, 1) || ' ', ' '),
        |        COALESCE(' ' || m1 || ' ', ' ')),
        |        COALESCE(' ' || substr(m2, 1, 1) || ' ' || substr(m2, 2, 1) || ' ', ' '),
        |        COALESCE(' ' || m2 || ' ', ' ')),
        |        COALESCE(' ' || substr(m3, 1, 1) || ' ' || substr(m3, 2, 1) || ' ', ' '),
        |        COALESCE(' ' || m3 || ' ', ' '))
        |      ), ' ')) AS BIGINT) AS nu
        |  FROM toks CROSS JOIN m
        |)
        |SELECT doc_id, CAST(sum(nch) AS BIGINT) AS n_chars,
        |  CAST(sum(nu) AS BIGINT) AS n_units,
        |  CAST(CAST(sum(nu) AS DOUBLE) / CAST(sum(nch) AS DOUBLE) AS REAL)
        |    AS fertility
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "graph_random_walks" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), ranked AS (
        |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY
        |    CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':cap:' ||
        |      CAST(v AS VARCHAR)), 1, 15) AS BIGINT), v) AS rn
        |  FROM edges
        |), adj AS (
        |  SELECT u, list_sort(list(v)) AS nbrs FROM ranked
        |  WHERE rn <= 64 GROUP BY u
        |), w0 AS (
        |  SELECT u AS walk_id, u AS pos, CAST(u AS VARCHAR) AS path
        |  FROM adj WHERE u <= 100
        |), w1 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':1:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w0 w JOIN adj a ON a.u = w.pos
        |), w1p AS (
        |  SELECT walk_id, pos, path || '->' || CAST(pos AS VARCHAR) AS path
        |  FROM w1
        |), w2 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':2:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w1p w JOIN adj a ON a.u = w.pos
        |), w2p AS (
        |  SELECT walk_id, pos, path || '->' || CAST(pos AS VARCHAR) AS path
        |  FROM w2
        |), w3 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':3:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w2p w JOIN adj a ON a.u = w.pos
        |)
        |SELECT walk_id, path || '->' || CAST(pos AS VARCHAR) AS path,
        |  pos AS end_vertex
        |FROM w3 ORDER BY walk_id""".stripMargin,
    // the walk CTE chain above, exploded into ±2 skip-gram pairs
    "graph_walk_cooccurrence" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), ranked AS (
        |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY
        |    CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':cap:' ||
        |      CAST(v AS VARCHAR)), 1, 15) AS BIGINT), v) AS rn
        |  FROM edges
        |), adj AS (
        |  SELECT u, list_sort(list(v)) AS nbrs FROM ranked
        |  WHERE rn <= 64 GROUP BY u
        |), w0 AS (
        |  SELECT u AS walk_id, u AS pos, [u] AS path
        |  FROM adj WHERE u <= 100
        |), w1 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':1:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w0 w JOIN adj a ON a.u = w.pos
        |), w1p AS (SELECT walk_id, pos, list_append(path, pos) AS path FROM w1),
        |w2 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':2:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w1p w JOIN adj a ON a.u = w.pos
        |), w2p AS (SELECT walk_id, pos, list_append(path, pos) AS path FROM w2),
        |w3 AS (
        |  SELECT w.walk_id,
        |    a.nbrs[CAST(CAST('0x' || substr(md5(
        |      CAST(w.walk_id AS VARCHAR) || ':3:' || CAST(w.pos AS VARCHAR)
        |      ), 1, 15) AS BIGINT) % len(a.nbrs) AS INT) + 1] AS pos,
        |    w.path FROM w2p w JOIN adj a ON a.u = w.pos
        |), walks AS (SELECT list_append(path, pos) AS p FROM w3),
        |pairs AS (
        |  SELECT p[i + 1] AS center, p[j + 1] AS context
        |  FROM walks,
        |    LATERAL (SELECT unnest(generate_series(0, len(p) - 1)) AS i) si,
        |    LATERAL (SELECT unnest(generate_series(greatest(0, i - 2),
        |      least(len(p) - 1, i + 2))) AS j) sj
        |  WHERE i <> j
        |)
        |SELECT center, context, CAST(count(*) AS BIGINT) AS n
        |FROM pairs GROUP BY center, context
        |ORDER BY center, context""".stripMargin,
    "stream_windowed_distinct" ->
      """SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
        |    AS window_start,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,
    "dq_pk_uniqueness" ->
      """SELECT * FROM (
        |  SELECT 'lineitem(l_orderkey,l_linenumber)' AS table_key,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST((SELECT count(*) FROM (SELECT DISTINCT l_orderkey,
        |      l_linenumber FROM lineitem)) AS BIGINT) AS n_distinct_keys,
        |    CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT
        |      l_orderkey, l_linenumber FROM lineitem)) AS BIGINT)
        |      AS n_duplicates
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders(o_orderkey)', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'customer(c_custkey)', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT c_custkey) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'part(p_partkey)', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT p_partkey) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT p_partkey) AS BIGINT)
        |  FROM part
        |  UNION ALL
        |  SELECT 'supplier(s_suppkey)', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s_suppkey) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT s_suppkey) AS BIGINT)
        |  FROM supplier
        |) ORDER BY table_key""".stripMargin,
    // Kadane's recurrence as a recursive CTE on ×n-scaled integers
    "window_max_subarray" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 1000000.0) AS BIGINT) AS v6
        |  FROM events
        |), st AS (
        |  SELECT user_id, CAST(sum(v6) AS BIGINT) AS s6,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY user_id
        |), x AS (
        |  SELECT e.user_id, e.event_id, e.us,
        |    st.n * e.v6 - st.s6 AS x, st.n,
        |    row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.us, e.event_id) AS rn
        |  FROM ev e JOIN st ON e.user_id = st.user_id
        |), walk AS (
        |  SELECT user_id, rn, n,
        |    greatest(x, x) AS cur, x AS best
        |  FROM x WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.n,
        |    greatest(e.x, w.cur + e.x),
        |    greatest(w.best, greatest(e.x, w.cur + e.x))
        |  FROM x e JOIN walk w
        |    ON e.user_id = w.user_id AND e.rn = w.rn + 1
        |)
        |SELECT user_id, n AS n_events,
        |  CAST(best AS BIGINT) AS best_scaled,
        |  CAST(CAST(best AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |    AS REAL) AS best_value
        |FROM walk WHERE rn = n ORDER BY user_id""".stripMargin,
    // li MATERIALIZED: DuckDB inlines plain CTEs per reference, so the
    // DISTINCT projection re-ran inside both self-join sides and the
    // degree scan — >1800 s at x10; materialized it replays in 9 s
    "sql_basket_rules" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), w AS MATERIALIZED (
        |  SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS weight
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk
        |), d AS MATERIALIZED (SELECT pk, CAST(count(*) AS BIGINT) AS d FROM li GROUP BY pk),
        |n AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders)
        |SELECT w.u AS part_a, w.v AS part_b, w.weight AS support_n,
        |  CAST(CAST(w.weight AS DOUBLE) / CAST(du.d AS DOUBLE) AS REAL)
        |    AS conf_a_to_b,
        |  CAST(CAST(w.weight AS DOUBLE) / CAST(dv.d AS DOUBLE) AS REAL)
        |    AS conf_b_to_a,
        |  CAST(CAST(w.weight AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
        |    / (CAST(du.d AS DOUBLE) * CAST(dv.d AS DOUBLE)) AS REAL)
        |    AS lift
        |FROM w JOIN d du ON du.pk = w.u JOIN d dv ON dv.pk = w.v
        |CROSS JOIN n
        |ORDER BY support_n DESC, part_a, part_b LIMIT 50""".stripMargin,
    // RRF fusion of BM25 (terms: table, join, query) and cosine-vs-vec-0
    // rankings. Per-term BM25 columns fused in FIXED order so the double
    // adds are bit-identical to Spark's; ranks are row_numbers with id
    // tiebreaks; rrf = 1/(60+rank) sums on exact integers.
    "retrieval_rrf_hybrid" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('table', 'join', 'query')
        |  GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
        |), nn AS (SELECT count(*) AS n FROM documents),
        |ad AS (SELECT avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  SELECT t.doc_id, t.tok,
        |    ln((nn.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * t.tf * 2.2
        |      / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / ad.avgdl)) AS bm25
        |  FROM tf t JOIN dfreq d USING (tok) JOIN dl l USING (doc_id)
        |  CROSS JOIN nn CROSS JOIN ad
        |), per_doc AS (
        |  SELECT doc_id,
        |    COALESCE(max(CASE WHEN tok = 'table' THEN bm25 END), 0.0)
        |      + COALESCE(max(CASE WHEN tok = 'join' THEN bm25 END), 0.0)
        |      + COALESCE(max(CASE WHEN tok = 'query' THEN bm25 END), 0.0)
        |      AS text_score
        |  FROM scored GROUP BY doc_id
        |), text_rank AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY text_score DESC, doc_id) AS BIGINT) AS text_rank
        |  FROM per_doc
        |  QUALIFY text_rank <= 20
        |), vec_rank AS (
        |  SELECT vec_id AS doc_id, CAST(row_number() OVER (
        |    ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |       WHERE vec_id = 0)) DESC, vec_id) AS BIGINT) AS vec_rank
        |  FROM embeddings WHERE vec_id <> 0
        |  QUALIFY vec_rank <= 20
        |)
        |SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
        |  t.text_rank, v.vec_rank,
        |  CAST(COALESCE(1.0 / (60 + t.text_rank), 0.0)
        |    + COALESCE(1.0 / (60 + v.vec_rank), 0.0) AS REAL) AS rrf_score
        |FROM text_rank t FULL OUTER JOIN vec_rank v ON t.doc_id = v.doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    // round 12 — unbounded recursive CTE = the fixpoint the engine's
    // pointer-jumping min-label loop converges to
    "graph_connected_components" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), pair_orders AS (
        |  SELECT ok FROM li GROUP BY ok HAVING count(*) = 2
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  WHERE a.ok IN (SELECT ok FROM pair_orders)
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), verts AS (SELECT DISTINCT u FROM edges),
        |r(u, lbl) AS (
        |  SELECT u, u AS lbl FROM verts
        |  UNION
        |  SELECT e.v AS u, r.lbl FROM r JOIN edges e ON e.u = r.u
        |), comp AS (SELECT u, min(lbl) AS component FROM r GROUP BY u)
        |SELECT component, count(*) AS n_members, max(u) AS max_member
        |FROM comp GROUP BY component ORDER BY component""".stripMargin,
    // incremental CC oracle: FULL-graph recursive-CTE components,
    // restricted to components containing a delta-order endpoint — the
    // engine's contract-and-merge path must land on exactly these rows
    "graph_cc_incremental" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), pair_orders AS (
        |  SELECT ok FROM li GROUP BY ok HAVING count(*) = 2
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  WHERE a.ok IN (SELECT ok FROM pair_orders)
        |), d_ep AS (
        |  SELECT DISTINCT pk AS u FROM li
        |  WHERE ok % 10 = 0 AND ok IN (SELECT ok FROM pair_orders)
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), verts AS (SELECT DISTINCT u FROM edges),
        |r(u, lbl) AS (
        |  SELECT u, u AS lbl FROM verts
        |  UNION
        |  SELECT e.v AS u, r.lbl FROM r JOIN edges e ON e.u = r.u
        |), comp AS (SELECT u, min(lbl) AS component FROM r GROUP BY u),
        |touched AS (
        |  SELECT DISTINCT component FROM comp JOIN d_ep USING (u)
        |)
        |SELECT component, count(*) AS n_members, max(u) AS max_member
        |FROM comp WHERE component IN (SELECT component FROM touched)
        |GROUP BY component ORDER BY component""".stripMargin,
    // win-rate matrix: BIGINT wins/games per pair; Wilson bounds as a
    // fixed-paren double epilogue (z = 1.96, z2 spelled 1.96 * 1.96)
    "eval_win_rate_matrix" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), m AS (
        |  SELECT event_id // 2 AS match_id,
        |    arg_min(event_type, event_id % 2) AS ta,
        |    arg_min(v3, event_id % 2) AS va,
        |    arg_max(event_type, event_id % 2) AS tb,
        |    arg_max(v3, event_id % 2) AS vb,
        |    count(*) AS cnt
        |  FROM e GROUP BY 1
        |), w AS (
        |  SELECT least(ta, tb) AS model_a, greatest(ta, tb) AS model_b,
        |    CASE WHEN va >= vb THEN ta ELSE tb END AS winner
        |  FROM m WHERE cnt = 2 AND ta <> tb
        |), g AS (
        |  SELECT model_a, model_b, CAST(count(*) AS BIGINT) AS n_games,
        |    CAST(sum(CASE WHEN winner = model_a THEN 1 ELSE 0 END)
        |      AS BIGINT) AS wins_a
        |  FROM w GROUP BY 1, 2
        |), q AS (
        |  SELECT *,
        |    CAST(wins_a AS DOUBLE) / CAST(n_games AS DOUBLE) AS p,
        |    CAST(n_games AS DOUBLE) AS n
        |  FROM g
        |)
        |SELECT model_a, model_b, n_games, wins_a,
        |  CAST(n_games - wins_a AS BIGINT) AS wins_b,
        |  CAST(p AS REAL) AS rate_a,
        |  CAST((p + 1.96 * 1.96 / (2.0 * n)
        |      - 1.96 * sqrt(p * (1.0 - p) / n
        |        + 1.96 * 1.96 / (4.0 * n * n)))
        |    / (1.0 + 1.96 * 1.96 / n) AS REAL) AS wilson_lo,
        |  CAST((p + 1.96 * 1.96 / (2.0 * n)
        |      + 1.96 * sqrt(p * (1.0 - p) / n
        |        + 1.96 * 1.96 / (4.0 * n * n)))
        |    / (1.0 + 1.96 * 1.96 / n) AS REAL) AS wilson_hi
        |FROM q ORDER BY model_a, model_b""".stripMargin,
    // randomized response: flip iff hash60(id:rr) % 4 = 3; debias by
    // (p_obs - 0.25) / 0.5 — truth ships beside for auditability
    "privacy_rand_response" ->
      """WITH b AS (
        |  SELECT event_type,
        |    event_id % 2 = 1 AS t,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':rr'), 1, 15) AS BIGINT) % 4 < 3
        |      THEN event_id % 2 = 1 ELSE NOT (event_id % 2 = 1) END AS r
        |  FROM events
        |), g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_true_1,
        |    CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_reported_1
        |  FROM b GROUP BY event_type
        |)
        |SELECT event_type, n, n_true_1, n_reported_1,
        |  CAST(CAST(n_reported_1 AS DOUBLE) / CAST(n AS DOUBLE) AS REAL)
        |    AS p_reported,
        |  CAST((CAST(n_reported_1 AS DOUBLE) / CAST(n AS DOUBLE) - 0.25)
        |    / 0.5 AS REAL) AS pi_hat
        |FROM g ORDER BY event_type""".stripMargin,
    // sign codes (60 bits, positive BIGINT both engines), popcount(xor)
    "ann_hamming_topk" ->
      """WITH c AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN embedding[i + 1] > 0
        |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS code
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(0, 59)) AS i) s
        |  GROUP BY vec_id
        |), r AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id,
        |    CAST(bit_count(xor(c.code, p.code)) AS INT) AS hamming
        |  FROM c JOIN (SELECT vec_id, code FROM c WHERE vec_id < 5) p
        |    ON c.vec_id <> p.vec_id
        |), t AS (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY hamming, vec_id) AS rank
        |  FROM r
        |)
        |SELECT probe_id, CAST(rank AS INT) AS rank, vec_id, hamming
        |FROM t WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    // MIH: candidates share >= 1 of the 4 15-bit bands; exact rerank;
    // planted 1-flip / 3-flip near-dups make the pigeonhole recall real
    "ann_hamming_mih" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64), i ->
        |      CASE WHEN i = 4 THEN -embedding[i] ELSE embedding[i] END)
        |      AS embedding
        |  FROM embeddings WHERE vec_id < 5
        |  UNION ALL
        |  SELECT vec_id + 2000000 AS vec_id,
        |    list_transform(generate_series(1, 64), i ->
        |      CASE WHEN i IN (4, 14, 24) THEN -embedding[i]
        |        ELSE embedding[i] END) AS embedding
        |  FROM embeddings WHERE vec_id < 5
        |), c AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN embedding[i + 1] > 0
        |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS code
        |  FROM base,
        |    LATERAL (SELECT unnest(generate_series(0, 59)) AS i) s
        |  GROUP BY vec_id
        |), cb AS (
        |  SELECT vec_id, code, j AS slot,
        |    (code >> (15 * j)) & 32767 AS band
        |  FROM c, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) b
        |), pb AS (
        |  SELECT vec_id AS probe_id, code AS pcode, slot, band
        |  FROM cb WHERE vec_id < 5
        |), cand AS (
        |  SELECT DISTINCT pb.probe_id, cb.vec_id, cb.code, pb.pcode
        |  FROM cb JOIN pb ON cb.slot = pb.slot AND cb.band = pb.band
        |  WHERE cb.vec_id <> pb.probe_id
        |), sc AS (
        |  SELECT probe_id, vec_id,
        |    CAST(bit_count(xor(code, pcode)) AS INT) AS hamming,
        |    CAST(count(*) OVER (PARTITION BY probe_id) AS BIGINT)
        |      AS n_candidates
        |  FROM cand
        |), t AS (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |    ORDER BY hamming, vec_id) AS rank
        |  FROM sc
        |)
        |SELECT probe_id, CAST(rank AS INT) AS rank, vec_id, hamming,
        |  n_candidates
        |FROM t WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    // skyline: the declarative NOT EXISTS dominance definition; the
    // engine's bucket-prefilter + survivor anti-join must equal it
    "pareto_frontier" ->
      """WITH m AS (
        |  SELECT l_partkey AS p_partkey, sum(l_quantity) AS total_qty,
        |    min(l_extendedprice / l_quantity) AS min_unit_price
        |  FROM lineitem GROUP BY 1)
        |SELECT p_partkey, total_qty, min_unit_price FROM m p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM m q
        |  WHERE q.total_qty >= p.total_qty
        |    AND q.min_unit_price <= p.min_unit_price
        |    AND (q.total_qty > p.total_qty
        |      OR q.min_unit_price < p.min_unit_price))
        |ORDER BY p_partkey""".stripMargin,
    // per-column UNION ALL is the oracle spelling; the engine computes
    // the same numbers in ONE multi-distinct scan
    "profile_table_stats" ->
      """SELECT 'l_discount' AS col, count(*) AS n_rows,
        |  count(l_discount) AS n_nonnull, count(DISTINCT l_discount) AS ndv,
        |  CAST(min(l_discount) AS DOUBLE) AS min_v,
        |  CAST(max(l_discount) AS DOUBLE) AS max_v FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', count(*), count(l_partkey),
        |  count(DISTINCT l_partkey), CAST(min(l_partkey) AS DOUBLE),
        |  CAST(max(l_partkey) AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(l_quantity),
        |  count(DISTINCT l_quantity), CAST(min(l_quantity) AS DOUBLE),
        |  CAST(max(l_quantity) AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey', count(*), count(l_suppkey),
        |  count(DISTINCT l_suppkey), CAST(min(l_suppkey) AS DOUBLE),
        |  CAST(max(l_suppkey) AS DOUBLE) FROM lineitem
        |ORDER BY col""".stripMargin,
    // affine-clamp score (no exp: bit-identical across engines); n_pos
    // via count(CASE) so both sides emit BIGINT, not DuckDB HUGEINT
    // score mass on the ×10⁶ micro-unit grid (raw double sums of the
    // 0.9999-clamped score drifted at x10), one division back
    "eval_calibration_bins" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5, 0.0),
        |      0.9999) AS score,
        |    label
        |  FROM embeddings)
        |SELECT CAST(floor(score * 10) AS INT) AS bin, count(*) AS n,
        |  CAST(sum(CAST(round(score * 1000000.0) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 AS sum_score,
        |  count(CASE WHEN label % 2 = 1 THEN 1 END) AS n_pos
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // ECE: per-bin terms pivoted to 10 fixed columns, left-assoc sum
    "eval_ece" -> eceOracleSql,
    // MCC: exact BIGINT cells; denominator in double (Long margins
    // product would overflow at corpus scale); degenerate margins NULL
    "dq_benford_law" -> benfordOracleSql,
    "text_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_sentences > 0 AND n_words > 0 THEN
        |    CAST(CAST(206.835 AS DOUBLE)
        |      - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)) AS REAL) END AS flesch_ease,
        |  CASE WHEN n_sentences > 0 AND n_words > 0 THEN
        |    CAST(CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      + CAST(11.8 AS DOUBLE) * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE))
        |      - CAST(15.59 AS DOUBLE) AS REAL) END AS fk_grade
        |FROM d ORDER BY doc_id""".stripMargin,
    "eval_icc" ->
      """WITH r AS (
        |  SELECT
        |    CAST('0x' || substr(md5(event_id || ':icclat'), 1, 15)
        |      AS BIGINT) % 7 AS lat,
        |    CAST('0x' || substr(md5(event_id || ':iccn1'), 1, 15)
        |      AS BIGINT) % 3 AS e1,
        |    CAST('0x' || substr(md5(event_id || ':iccn2'), 1, 15)
        |      AS BIGINT) % 3 AS e2,
        |    CAST('0x' || substr(md5(event_id || ':iccn3'), 1, 15)
        |      AS BIGINT) % 3 AS e3
        |  FROM events
        |), x AS (
        |  SELECT lat + 1 + e1 AS x1, lat + 2 + e2 AS x2,
        |    lat + 3 + e3 AS x3 FROM r
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1 + x2 + x3) AS BIGINT) AS s,
        |    CAST(sum(x1 * x1 + x2 * x2 + x3 * x3) AS BIGINT) AS ss,
        |    CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS srow2,
        |    CAST(sum(x1) AS BIGINT) AS c1, CAST(sum(x2) AS BIGINT) AS c2,
        |    CAST(sum(x3) AS BIGINT) AS c3
        |  FROM x
        |), m AS (
        |  SELECT n,
        |    (CAST(srow2 AS DOUBLE) / 3.0
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * 3.0)) / (CAST(n AS DOUBLE) - 1.0)
        |      AS msr,
        |    ((CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
        |        + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE)
        |        + CAST(c3 AS DOUBLE) * CAST(c3 AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * 3.0)) / (3.0 - 1.0) AS msc,
        |    ((CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * 3.0))
        |      - (CAST(srow2 AS DOUBLE) / 3.0
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * 3.0))
        |      - ((CAST(c1 AS DOUBLE) * CAST(c1 AS DOUBLE)
        |          + CAST(c2 AS DOUBLE) * CAST(c2 AS DOUBLE)
        |          + CAST(c3 AS DOUBLE) * CAST(c3 AS DOUBLE))
        |          / CAST(n AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |          / (CAST(n AS DOUBLE) * 3.0)))
        |      / ((CAST(n AS DOUBLE) - 1.0) * (3.0 - 1.0)) AS mse
        |  FROM g
        |)
        |SELECT n AS n_items, 3 AS k_raters,
        |  CAST(msr AS REAL) AS msr, CAST(msc AS REAL) AS msc,
        |  CAST(mse AS REAL) AS mse,
        |  CAST((msr - mse) / (msr + (3.0 - 1.0) * mse
        |    + 3.0 * (msc - mse) / CAST(n AS DOUBLE)) AS REAL) AS icc2_1,
        |  CAST((msr - mse) / (msr + (msc - mse) / CAST(n AS DOUBLE))
        |    AS REAL) AS icc2_k
        |FROM m""".stripMargin,
    "ts_theil_sen" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h,
        |    CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS v6
        |  FROM events GROUP BY 1
        |), pairs AS (
        |  SELECT a.h AS hi, b.h AS hj,
        |    CAST(b.v6 - a.v6 AS DOUBLE)
        |      / CAST((b.h - a.h) * 1000000 AS DOUBLE) AS slope
        |  FROM hourly a JOIN hourly b ON a.h < b.h
        |), ranked AS (
        |  SELECT slope,
        |    row_number() OVER (ORDER BY slope, hi, hj) AS rk,
        |    count(*) OVER () AS n_pairs
        |  FROM pairs
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM hourly) AS n_points,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(slope AS REAL) AS theil_sen_slope
        |FROM ranked WHERE rk = (n_pairs + 1) // 2""".stripMargin,
    "eval_mcc" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(sum(v3) AS BIGINT) AS s3,
        |    CAST(count(*) AS BIGINT) AS n_t FROM e GROUP BY event_type
        |), s AS (
        |  SELECT (e.v3 * m.n_t > m.s3) AS pred,
        |    CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
        |      || ':label'), 1, 15) AS BIGINT) % 2 = 1 AS label
        |  FROM e JOIN m USING (event_type)
        |), g AS (
        |  SELECT
        |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM s
        |)
        |SELECT tp, fp, fn, tn,
        |  CAST(CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
        |      AND tn + fn > 0
        |    THEN (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))
        |    END AS REAL) AS mcc,
        |  CAST(CASE WHEN tp + fn > 0 AND tn + fp > 0
        |    THEN (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
        |        + CAST(fn AS DOUBLE))
        |      + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE)
        |        + CAST(fp AS DOUBLE))) / 2.0
        |    END AS REAL) AS balanced_acc,
        |  CAST(CASE WHEN tp + fn > 0 AND tn + fp > 0
        |    THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
        |        + CAST(fn AS DOUBLE))
        |      + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE)
        |        + CAST(fp AS DOUBLE)) - 1.0
        |    END AS REAL) AS youden_j
        |FROM g""".stripMargin,
    // char-trigram langid: BIGINT counts, ONE division per (doc, lang),
    // argmax by (score, lang) struct — lexicographic in both engines
    "text_langid_chargram" ->
      """WITH b AS (
        |  SELECT doc_id, lang, replace(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ', '')
        |    AS s
        |  FROM documents
        |), dgc AS (
        |  SELECT doc_id, lang, substring(s, i, 3) AS g,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM b, LATERAL (SELECT unnest(
        |    generate_series(1, length(s) - 2)) AS i) x
        |  WHERE length(s) >= 3
        |  GROUP BY 1, 2, 3
        |), model AS (
        |  SELECT g, lang AS mlang, CAST(sum(tf) AS BIGINT) AS cnt
        |  FROM dgc WHERE doc_id % 2 = 0 GROUP BY 1, 2
        |), tot AS (
        |  SELECT mlang, CAST(sum(cnt) AS BIGINT) AS t FROM model
        |  GROUP BY 1
        |), sc AS (
        |  SELECT dgc.doc_id, model.mlang,
        |    CAST(sum(dgc.tf * model.cnt) AS BIGINT) AS s_l
        |  FROM dgc JOIN model USING (g) GROUP BY 1, 2
        |), best AS (
        |  SELECT doc_id, max(struct_pack(
        |    score := CAST(s_l AS DOUBLE) / CAST(t AS DOUBLE),
        |    lang := mlang)) AS bst
        |  FROM sc JOIN tot USING (mlang) GROUP BY doc_id
        |)
        |SELECT b.doc_id, b.lang AS lang_labeled,
        |  coalesce(best.bst.lang, 'und') AS lang_predicted,
        |  CAST(best.bst.score AS REAL) AS score,
        |  best.bst.lang = b.lang AS correct
        |FROM b LEFT JOIN best USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // Gumbel-max = exponential mechanism; u from the md5 60-bit draw
    "privacy_dp_topk" ->
      """WITH c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_count
        |  FROM events GROUP BY event_type
        |), n AS (
        |  SELECT event_type, exact_count,
        |    CAST(exact_count AS DOUBLE) + 2.0 * (-ln(-ln(
        |      (CAST(CAST('0x' || substr(md5('dptopk:' || event_type),
        |        1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        |      / 1152921504606846976.0))) AS noised_utility
        |  FROM c
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY noised_utility DESC, event_type) AS rank
        |  FROM n
        |)
        |SELECT CAST(rank AS INT) AS rank, event_type,
        |  CAST(noised_utility AS REAL) AS noised_utility, exact_count
        |FROM r WHERE rank <= 3 ORDER BY rank""".stripMargin,
    // conditional bigram entropy vs unigram entropy; REAL absorbs the
    // group-order ulps of the c*ln(c) folds (the unigram-LM rule)
    "text_bigram_entropy_rate" ->
      """WITH t AS (
        |  SELECT string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), bi AS (
        |  SELECT t[i] AS a, t[i + 1] AS b, CAST(count(*) AS BIGINT)
        |    AS c_ab
        |  FROM t, LATERAL (SELECT unnest(
        |    generate_series(1, len(t) - 1)) AS i) x
        |  WHERE len(t) >= 2 GROUP BY 1, 2
        |), pf AS (
        |  SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bi GROUP BY a
        |), c AS (
        |  SELECT CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
        |    CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |    sum(c_ab * (ln(c_ab) - ln(c_a))) AS s_cond
        |  FROM bi JOIN pf USING (a)
        |), u AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |    sum(c * ln(c)) AS s_uni
        |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(t) AS tok FROM t) GROUP BY tok)
        |)
        |SELECT n_bigrams, n_distinct_bigrams, n_tokens,
        |  CAST(-s_cond / CAST(n_bigrams AS DOUBLE) AS REAL) AS h_cond,
        |  CAST(ln(CAST(n_tokens AS DOUBLE))
        |    - s_uni / CAST(n_tokens AS DOUBLE) AS REAL) AS h_uni,
        |  CAST(1.0 - (-s_cond / CAST(n_bigrams AS DOUBLE))
        |    / (ln(CAST(n_tokens AS DOUBLE))
        |      - s_uni / CAST(n_tokens AS DOUBLE)) AS REAL)
        |    AS predictability
        |FROM c CROSS JOIN u""".stripMargin,
    "ann_l2_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  list_dot_product(CAST(embedding AS DOUBLE[]),
        |    CAST(embedding AS DOUBLE[]))
        |  - 2 * list_dot_product(CAST(embedding AS DOUBLE[]),
        |      (SELECT qe FROM q))
        |  + (SELECT list_dot_product(qe, qe) FROM q) AS dist2
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY dist2, vec_id LIMIT 10""".stripMargin,
    // categorical drift: per-category chi-square terms (the PSI-terms
    // precedent — emit terms, sum is the statistic); identical double
    // expression tree on both sides, REAL cast
    "drift_chi2_terms" ->
      """WITH s AS (
        |  SELECT event_type AS cat,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS isa
        |  FROM events
        |), tot AS (
        |  SELECT CAST(sum(isa) AS BIGINT) AS na,
        |    CAST(sum(1 - isa) AS BIGINT) AS nb FROM s
        |), g AS (
        |  SELECT cat, CAST(sum(isa) AS BIGINT) AS ca,
        |    CAST(sum(1 - isa) AS BIGINT) AS cb
        |  FROM s GROUP BY cat
        |)
        |SELECT cat, ca, cb,
        |  CAST((CAST(ca AS DOUBLE) - CAST(ca + cb AS DOUBLE)
        |      * CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |    * (CAST(ca AS DOUBLE) - CAST(ca + cb AS DOUBLE)
        |      * CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |    / (CAST(ca + cb AS DOUBLE) * CAST(na AS DOUBLE)
        |      / CAST(na + nb AS DOUBLE))
        |  + (CAST(cb AS DOUBLE) - CAST(ca + cb AS DOUBLE)
        |      * CAST(nb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |    * (CAST(cb AS DOUBLE) - CAST(ca + cb AS DOUBLE)
        |      * CAST(nb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |    / (CAST(ca + cb AS DOUBLE) * CAST(nb AS DOUBLE)
        |      / CAST(na + nb AS DOUBLE))
        |  AS REAL) AS chi2_term
        |FROM g CROSS JOIN tot ORDER BY cat""".stripMargin,
    "pii_scan_report" ->
      """WITH counts AS (
        |  SELECT source,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(text,
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |    len(regexp_extract_all(text,
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
        |    len(regexp_extract_all(text, '[0-9]{16}')) AS n_pan16
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_email) AS BIGINT) AS n_email,
        |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
        |  CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
        |  CAST(sum(n_pan16) AS BIGINT) AS n_pan16,
        |  CAST(count(CASE WHEN n_email + n_phone + n_ipv4 + n_pan16 > 0
        |    THEN 1 END) AS BIGINT) AS n_flagged
        |FROM counts GROUP BY source ORDER BY source""".stripMargin,
    // skew_profile's integer log2 band (length(bin(n)) - 1) over token
    // counts — no float log anywhere
    "context_length_bands" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |    AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT CAST(length(bin(n)) - 1 AS INT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n) AS min_tokens, max(n) AS max_tokens,
        |  CAST(sum(n) AS BIGINT) AS total_tokens
        |FROM t GROUP BY band ORDER BY band""".stripMargin,
    "eval_auc_roc" ->
      """WITH s AS (
        |  SELECT least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5,
        |    0.0), 0.9999) AS score,
        |    CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), r AS (
        |  SELECT y, CAST(rank() OVER (ORDER BY score) AS DOUBLE)
        |    + (CAST(count(*) OVER (PARTITION BY score) AS DOUBLE) - 1.0)
        |      / 2.0 AS avg_rank
        |  FROM s
        |), agg AS (
        |  SELECT CAST(sum(CASE WHEN y = 1 THEN avg_rank END) AS DOUBLE)
        |      AS rpos,
        |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS npos,
        |    CAST(count(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS nneg
        |  FROM r
        |)
        |SELECT npos, nneg,
        |  CAST((rpos - CAST(npos AS DOUBLE) * (CAST(npos AS DOUBLE) + 1.0)
        |      / 2.0)
        |    / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)) AS REAL) AS auc
        |FROM agg""".stripMargin,
    // DeLong: doubled tie-aware placements per distinct score; all
    // moments BIGINT; variance a fixed-paren double epilogue
    "eval_auc_delong" ->
      """WITH s AS (
        |  SELECT least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5,
        |    0.0), 0.9999) AS score,
        |    CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), g AS (
        |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM s GROUP BY score
        |), w AS (
        |  SELECT np, nn,
        |    CAST(coalesce(sum(nn) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cneg,
        |    CAST(coalesce(sum(np) OVER (ORDER BY score
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS cpos
        |  FROM g
        |), a AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS npos,
        |    CAST(sum(nn) AS BIGINT) AS nneg,
        |    CAST(sum(np * (2 * cneg + nn)) AS BIGINT) AS u2,
        |    CAST(sum(np * (2 * cneg + nn) * (2 * cneg + nn)) AS BIGINT)
        |      AS sum_d2,
        |    CAST(sum(nn * (2 * cpos + np) * (2 * cpos + np)) AS BIGINT)
        |      AS sum_e2
        |  FROM w
        |), q AS (
        |  SELECT *,
        |    CAST(u2 AS DOUBLE)
        |      / (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)) AS auc
        |  FROM a
        |), v AS (
        |  SELECT *,
        |    (CAST(sum_d2 AS DOUBLE)
        |        / (4.0 * CAST(nneg AS DOUBLE) * CAST(nneg AS DOUBLE))
        |      - CAST(npos AS DOUBLE) * auc * auc)
        |      / (CAST(npos AS DOUBLE) - 1.0) / CAST(npos AS DOUBLE)
        |    + (CAST(sum_e2 AS DOUBLE)
        |        / (4.0 * CAST(npos AS DOUBLE) * CAST(npos AS DOUBLE))
        |      - CAST(nneg AS DOUBLE) * auc * auc)
        |      / (CAST(nneg AS DOUBLE) - 1.0) / CAST(nneg AS DOUBLE)
        |      AS var_auc
        |  FROM q
        |)
        |SELECT npos, nneg, u2, sum_d2, sum_e2, CAST(auc AS REAL) AS auc,
        |  CAST(var_auc AS REAL) AS var_auc,
        |  CAST(1.96 * sqrt(var_auc) AS REAL) AS ci95_half
        |FROM v""".stripMargin,
    // ordered-frame folds on both sides → identical doubles; REAL casts
    // as the documented float-noise backstop
    "ts_cusum_changepoint" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
        |  WHERE user_id < 50
        |), m AS (
        |  SELECT user_id, t, event_id, value,
        |    sum(value) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS tot,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e
        |), s AS (
        |  SELECT user_id, t, event_id, n,
        |    sum(value - tot / n) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM m
        |)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(max(cusum) - min(cusum) AS REAL) AS cusum_range,
        |  CAST(min(CASE WHEN rnk = 1 THEN event_id END) AS BIGINT)
        |    AS peak_event
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY abs(cusum) DESC, t, event_id) AS rnk
        |  FROM s)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "anomaly_spc_runs" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
        |  WHERE user_id < 50
        |), med AS (
        |  SELECT user_id, quantile_cont(value, 0.5) AS med FROM e
        |  GROUP BY user_id
        |), sgn AS (
        |  SELECT e.user_id, t, event_id,
        |    CASE WHEN value > m.med THEN 1 WHEN value < m.med THEN -1
        |         ELSE 0 END AS sgn
        |  FROM e JOIN med m ON m.user_id = e.user_id
        |), chg AS (
        |  SELECT user_id, t, event_id, sgn,
        |    CASE WHEN sgn = lag(sgn) OVER w THEN 0 ELSE 1 END AS brk
        |  FROM sgn WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |), grp AS (
        |  SELECT user_id, sgn, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS g
        |  FROM chg
        |), runs AS (
        |  SELECT user_id, g, sgn, count(*) AS run_len FROM grp
        |  GROUP BY user_id, g, sgn
        |)
        |SELECT user_id,
        |  CAST(max(CASE WHEN sgn = 1 THEN run_len ELSE 0 END) AS BIGINT)
        |    AS longest_above,
        |  CAST(max(CASE WHEN sgn = -1 THEN run_len ELSE 0 END) AS BIGINT)
        |    AS longest_below,
        |  CAST(count(CASE WHEN sgn <> 0 AND run_len >= 8 THEN 1 END)
        |    AS BIGINT) AS n_alert_runs
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "dq_constraint_report" ->
      """SELECT 'lineitem_orderkey_fk' AS constraint_name,
        |  CAST(count(*) AS BIGINT) AS n_checked,
        |  CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT)
        |    AS n_violations
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |UNION ALL
        |SELECT 'lineitem_qty_positive', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
        |FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        |UNION ALL
        |SELECT 'orders_price_nonnull', CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'part_partkey_unique', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(DISTINCT p_partkey) AS BIGINT) FROM part
        |ORDER BY constraint_name""".stripMargin,
    "corpus_diversity_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |)
        |SELECT lang, source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
        |  CAST(CAST(count(DISTINCT tok) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS REAL) AS type_token_ratio
        |FROM toks GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // 252-bit zone Bloom signatures as four 63-bit BIGINT words (every
    // shift positive on both engines), md5-derived double hashing,
    // bit_or aggregation — all-integer, bit-identical cross-engine
    "layout_bloom_prune" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT l_orderkey // 4096 AS zone_id, l_suppkey AS key
        |  FROM lineitem
        |), hp AS MATERIALIZED (
        |  SELECT zone_id, key,
        |    CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h1,
        |    CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 17, 15)
        |      AS BIGINT) AS h2
        |  FROM pairs
        |), bits AS MATERIALIZED (
        |  SELECT zone_id, (h1 + i * h2) % 252 AS pos
        |  FROM hp, LATERAL (SELECT unnest([0, 1, 2]) AS i) s
        |), zsig AS MATERIALIZED (
        |  SELECT zone_id,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 0 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS w0,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 1 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS w1,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 2 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS w2,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 3 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS w3
        |  FROM bits GROUP BY zone_id
        |), zrange AS MATERIALIZED (
        |  SELECT zone_id, min(key) AS zmin, max(key) AS zmax
        |  FROM pairs GROUP BY zone_id
        |), probes AS (
        |  SELECT unnest([CAST(1 AS BIGINT), 3, 7,
        |    777000001, 777000002, 777000003]) AS pk
        |), php AS (
        |  SELECT pk,
        |    CAST('0x' || substr(md5(CAST(pk AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h1,
        |    CAST('0x' || substr(md5(CAST(pk AS VARCHAR)), 17, 15)
        |      AS BIGINT) AS h2
        |  FROM probes
        |), pbits AS (
        |  SELECT pk, (h1 + i * h2) % 252 AS pos
        |  FROM php, LATERAL (SELECT unnest([0, 1, 2]) AS i) s
        |), psig AS (
        |  SELECT pk,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 0 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS p0,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 1 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS p1,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 2 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS p2,
        |    coalesce(bit_or(CASE WHEN pos // 63 = 3 THEN CAST(1 AS BIGINT)
        |      << CAST(pos % 63 AS INT) END), 0) AS p3
        |  FROM pbits GROUP BY pk
        |), truth AS MATERIALIZED (
        |  SELECT DISTINCT zone_id, key AS pk, TRUE AS present FROM pairs
        |)
        |SELECT s.pk AS probe_key, CAST(count(*) AS BIGINT) AS n_zones,
        |  CAST(sum(CASE WHEN r.zmin <= s.pk AND s.pk <= r.zmax
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zones_minmax,
        |  CAST(sum(CASE WHEN (z.w0 & s.p0) = s.p0 AND (z.w1 & s.p1) = s.p1
        |      AND (z.w2 & s.p2) = s.p2 AND (z.w3 & s.p3) = s.p3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zones_bloom,
        |  CAST(sum(CASE WHEN coalesce(t.present, FALSE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zones_true,
        |  CAST(sum(CASE WHEN (z.w0 & s.p0) = s.p0 AND (z.w1 & s.p1) = s.p1
        |      AND (z.w2 & s.p2) = s.p2 AND (z.w3 & s.p3) = s.p3
        |    THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN coalesce(t.present, FALSE) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bloom_false_pos
        |FROM zsig z JOIN zrange r USING (zone_id) CROSS JOIN psig s
        |LEFT JOIN truth t ON t.zone_id = z.zone_id AND t.pk = s.pk
        |GROUP BY s.pk ORDER BY probe_key""".stripMargin,
    // all allocation quantities BIGINT (floor div), rate/epochs are one
    // IEEE division each — the only doubles in the plan
    "sample_domain_mixture" ->
      """WITH supply AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS supply_chars
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(supply_chars) AS BIGINT) AS total_chars,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM supply
        |)
        |SELECT source, n_docs, supply_chars,
        |  CAST(total_chars // k AS BIGINT) AS target_chars,
        |  least(1.0, CAST(total_chars // k AS DOUBLE)
        |    / CAST(supply_chars AS DOUBLE)) AS sample_rate,
        |  CAST(total_chars // k AS DOUBLE)
        |    / CAST(supply_chars AS DOUBLE) AS epochs,
        |  least(supply_chars, CAST(total_chars // k AS BIGINT))
        |    AS achieved_chars,
        |  greatest(0, CAST(total_chars // k AS BIGINT) - supply_chars)
        |    AS deficit_chars
        |FROM supply, tot ORDER BY source""".stripMargin,
    // hashed-unigram add-1 log-likelihood ratio, float epilogue (the
    // text_bigram_logprob exactness precedent)
    "text_dsir_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 4096 AS bucket
        |  FROM (
        |    SELECT doc_id, lang, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |    FROM documents)
        |), b2 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY bucket) AS n_tgt,
        |    count(*) OVER (PARTITION BY bucket) AS n_all
        |  FROM toks
        |), norms AS (
        |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ct,
        |    CAST(count(*) AS BIGINT) AS cr
        |  FROM toks
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(ln((CAST(n_tgt AS DOUBLE) + 1.0)
        |        / (CAST(ct AS DOUBLE) + 4096.0))
        |      - ln((CAST(n_all AS DOUBLE) + 1.0)
        |        / (CAST(cr AS DOUBLE) + 4096.0))) AS REAL) AS log_weight
        |FROM b2, norms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(
        |    generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), bg AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cbg
        |  FROM grams GROUP BY w1, w2
        |), ug AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS cug FROM grams GROUP BY w1
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM grams
        |)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(ln((CAST(b.cbg AS DOUBLE) + 1.0)
        |      / (CAST(u.cug AS DOUBLE) + CAST(vocab.v AS DOUBLE))))
        |    / CAST(count(*) AS DOUBLE) AS REAL) AS mean_logprob
        |FROM grams g JOIN bg b ON b.w1 = g.w1 AND b.w2 = g.w2
        |JOIN ug u ON u.w1 = g.w1 CROSS JOIN vocab
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "snapshot_diff" ->
      """WITH snap_a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS pa FROM orders
        |  WHERE o_orderkey % 7 <> 0
        |), snap_b AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS pb
        |  FROM orders WHERE o_orderkey % 5 <> 0
        |), d AS (
        |  SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |         WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.pa <> b.pb THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k)
        |SELECT status, count(*) AS n, min(k) AS min_key, max(k) AS max_key
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    // (cum_bytes - 1) // target is next-fit packing quantized to the
    // capacity grid — deterministic on both engines (integer arithmetic)
    "layout_compaction_plan" ->
      """WITH files AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
        |      AS part_month,
        |    CAST(o_orderdate AS DATE) AS file_day,
        |    count(*) AS n_rows, count(*) * 64 AS est_bytes
        |  FROM orders GROUP BY 1, 2
        |), planned AS (
        |  SELECT part_month, file_day, n_rows, est_bytes,
        |    CAST((sum(est_bytes) OVER (PARTITION BY part_month
        |      ORDER BY file_day ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) - 1) // 4096 AS INT) AS target_file
        |  FROM files)
        |SELECT part_month, target_file, count(*) AS n_input_files,
        |  CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |  CAST(sum(est_bytes) AS BIGINT) AS total_bytes
        |FROM planned GROUP BY 1, 2
        |ORDER BY part_month, target_file""".stripMargin,
    // oracle recomputes the monthly rollup DIRECTLY from base — equality
    // proves the engine's daily-partial merge path
    "mv_incremental_merge" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |  l_returnflag AS returnflag, sum(l_quantity) AS qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY month, returnflag""".stripMargin,
    // full recompute over the EFFECTIVE post-change table — the hash
    // match proves the Spark side's Δ-join maintenance algebra
    "mv_join_delta" ->
      """WITH eff AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 20 = 5
        |      THEN CAST(round((o_totalprice + 5.0) * 100) AS BIGINT)
        |      ELSE CAST(round(o_totalprice * 100) AS BIGINT)
        |    END AS price_cents
        |  FROM orders
        |)
        |SELECT e.o_orderkey, e.o_custkey, e.price_cents, c.c_nationkey
        |FROM eff e JOIN customer c ON e.o_custkey = c.c_custkey
        |ORDER BY e.o_orderkey""".stripMargin,
    // growth arithmetic in DOUBLE over float32 yearly totals (exactly
    // representable) so both engines emit identical rates
    "sql_yearly_growth" ->
      """WITH y AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |    CAST(sum(o_totalprice) AS REAL) AS revenue,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1
        |)
        |SELECT yr, revenue, n_orders,
        |  lag(revenue) OVER (ORDER BY yr) AS prev_revenue,
        |  CAST(CASE WHEN lag(revenue) OVER (ORDER BY yr) IS NOT NULL
        |    THEN (CAST(revenue AS DOUBLE)
        |        - CAST(lag(revenue) OVER (ORDER BY yr) AS DOUBLE))
        |      / CAST(lag(revenue) OVER (ORDER BY yr) AS DOUBLE) END AS REAL)
        |    AS yoy_growth
        |FROM y ORDER BY yr""".stripMargin,
    "sql_basket_affinity" ->
      """WITH ob AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |), n AS (
        |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM ob
        |), bc AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS nb FROM ob GROUP BY b
        |), pairs AS (
        |  SELECT a.b AS brand_a, c.b AS brand_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
        |  GROUP BY 1, 2
        |)
        |SELECT brand_a, brand_b, n_both,
        |  CAST(CAST(n_both AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS REAL)
        |    AS support,
        |  CAST(CAST(n_both AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
        |    / (CAST(ba.nb AS DOUBLE) * CAST(bb.nb AS DOUBLE)) AS REAL)
        |    AS lift
        |FROM pairs
        |JOIN bc ba ON ba.b = brand_a JOIN bc bb ON bb.b = brand_b
        |CROSS JOIN n
        |WHERE n_both >= 20
        |ORDER BY lift DESC, brand_a, brand_b LIMIT 30""".stripMargin,
    "sql_product_type_profit" ->
      """SELECT n.n_name AS nation,
        |  CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
        |  CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL) AS profit
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_name LIKE 'red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "sql_supplier_cnt_by_parttype" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#1'
        |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "sql_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2
        |), best AS (
        |  SELECT pk, min(unit_cost) AS mc FROM cost GROUP BY pk
        |), pick AS (
        |  SELECT c.pk, min(c.sk) AS sk, min(c.unit_cost) AS unit_cost
        |  FROM cost c JOIN best b ON b.pk = c.pk AND c.unit_cost = b.mc
        |  GROUP BY c.pk)
        |SELECT p.p_partkey, s.s_name, n.n_name AS nation, k.unit_cost
        |FROM pick k
        |JOIN part p ON p.p_partkey = k.pk
        |JOIN supplier s ON s.s_suppkey = k.sk
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'EUROPE' AND p.p_size <= 10
        |ORDER BY p.p_partkey""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), nn AS (SELECT count(*) AS n FROM documents)
        |SELECT t.doc_id, t.tok, t.tf, d.df,
        |  CAST(t.tf * (ln((nn.n + 1.0) / (d.df + 1.0)) + 1.0) AS REAL)
        |    AS tfidf
        |FROM tf t JOIN dfreq d USING (tok) CROSS JOIN nn
        |WHERE t.doc_id < 30
        |ORDER BY doc_id, tok""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(l_extendedprice) AS REAL) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "f_url_fns" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://ex' || CAST(doc_id AS VARCHAR) || '.org/p/' || lang
        |      || '?q=' || source AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query
        |FROM u ORDER BY doc_id""".stripMargin,
    "window_ratio_to_report" ->
      """SELECT event_id, event_type,
        |  CAST(value / CAST(CAST(sum(value) OVER
        |    (PARTITION BY event_type) AS REAL) AS DOUBLE) AS REAL) AS share
        |FROM events ORDER BY event_id""".stripMargin,
    "join_self_nextline" ->
      """SELECT a.l_orderkey, a.l_linenumber, a.l_quantity,
        |  b.l_quantity AS next_quantity
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey
        |  AND b.l_linenumber = a.l_linenumber + 1
        |ORDER BY a.l_orderkey, a.l_linenumber""".stripMargin,
    "set_ops_union_by_name" ->
      """SELECT r_name AS name, 'region' AS kind,
        |  r_regionkey AS region_key, CAST(NULL AS INT) AS nation_key
        |FROM region
        |UNION ALL
        |SELECT n_name, 'nation', CAST(NULL AS INT), n_nationkey
        |FROM nation
        |ORDER BY kind, name""".stripMargin,
    "window_gaps_islands" ->
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |      - row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY event_id) AS grp
        |  FROM events
        |), runs AS (
        |  SELECT user_id, event_type, grp, count(*) AS run_len
        |  FROM g GROUP BY user_id, event_type, grp
        |)
        |SELECT user_id, event_type, count(*) AS n_islands,
        |  max(run_len) AS longest_run
        |FROM runs GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "o4_sort_nulls" ->
      """SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS prio_n,
        |  o_orderstatus
        |FROM orders
        |ORDER BY prio_n ASC NULLS FIRST, o_orderstatus DESC NULLS LAST,
        |  o_orderkey
        |LIMIT 200""".stripMargin,
    "t10_distinct" ->
      """SELECT DISTINCT lang, source FROM documents
        |ORDER BY lang, source""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 3 ORDER BY o_custkey""".stripMargin,
    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(value) AS REAL) AS sum_value
        |FROM (SELECT CASE WHEN event_id % 10 < 7 THEN 1
        |        ELSE user_id END AS k, value
        |      FROM events) f
        |JOIN customer ON f.k = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "window_range_frame" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing_10m,
        |  CAST(sum(value) OVER w AS REAL) AS sum_trailing_10m
        |FROM (SELECT *, epoch_ms(ts) // 1000 AS sec FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "f_array_advanced" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS INT)
        |    AS n_except,
        |  CAST(list_position(a, 3) AS INT) AS pos_of_3,
        |  CAST(len(list_filter(a, x -> x != 2)) AS INT) AS n_removed,
        |  len(list_intersect(a, b)) > 0 AS overlaps,
        |  CAST(len(a) + len(b) AS INT) AS n_flat,
        |  CAST(3 AS INT) AS n_repeat,
        |  CAST(len(list_distinct(list_concat(a, b))) AS INT)
        |    AS n_union_distinct
        |FROM (SELECT vec_id,
        |    generate_series(1, CAST(vec_id % 5 + 3 AS INT)) AS a,
        |    generate_series(2, CAST(vec_id % 7 + 2 AS INT)) AS b
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "f_ts_fns" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS INT) AS order_quarter,
        |  CAST(dayofyear(o_orderdate) AS INT) AS order_doy,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |  CAST(o_orderdate AS DATE) - 7 AS minus_7d,
        |  epoch_ms(o_orderdate) // 1000 AS epoch_s,
        |  make_date(CAST(year(o_orderdate) AS INT),
        |    CAST(month(o_orderdate) AS INT), 1) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_bit_fns" ->
      """SELECT event_id,
        |  user_id << 3 AS uid_shl3,
        |  event_id >> 2 AS eid_shr2,
        |  user_id & 255 AS uid_low8,
        |  user_id | 256 AS uid_or,
        |  xor(user_id, event_id) AS uid_xor_eid,
        |  CAST(bit_count(user_id) AS INT) AS uid_bits
        |FROM events ORDER BY event_id""".stripMargin,
    "agg_bitwise" ->
      """SELECT event_type,
        |  bit_and(user_id) AS uid_and,
        |  bit_or(user_id) AS uid_or,
        |  bit_xor(user_id) AS uid_xor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f_try_arith" ->
      """SELECT event_id,
        |  value / nullif(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT),
        |    0) AS value_per_k,
        |  1.0 / nullif(value - value, 0.0) AS div_zero_null,
        |  event_id + 1 AS id_plus_1,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)
        |    * CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k_sq
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_gapfill" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events
        |), hourly AS (
        |  SELECT h, event_type, count(*) AS n,
        |    CAST(sum(value) AS REAL) AS sum_value
        |  FROM ev GROUP BY h, event_type
        |), grid AS (
        |  SELECT g.h, t.event_type
        |  FROM (SELECT unnest(generate_series(
        |      (SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
        |      INTERVAL 1 HOUR)) AS h) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
        |)
        |SELECT grid.h, grid.event_type,
        |  coalesce(hourly.n, 0) AS n,
        |  coalesce(hourly.sum_value, CAST(0 AS REAL)) AS sum_value
        |FROM grid LEFT JOIN hourly
        |  ON grid.h = hourly.h AND grid.event_type = hourly.event_type
        |ORDER BY grid.h, grid.event_type""".stripMargin,
    "part_pruning" ->
      """SELECT user_id, count(*) AS n_clicks,
        |  CAST(sum(value) AS REAL) AS sum_value
        |FROM events WHERE event_type = 'click'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "lateral_explode" ->
      """SELECT doc_id, CAST(ii.i - 1 AS INT) AS pos, d.toks[ii.i] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id < 50) d,
        |  LATERAL (SELECT unnest(generate_series(1, len(d.toks))) AS i) ii
        |ORDER BY doc_id, pos""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH nn AS (SELECT count(*) AS n FROM embeddings),
        |rsel AS (
        |  SELECT min(i) AS r FROM range(1, 41) t(i), nn
        |  WHERE 32 * (CAST(1 AS BIGINT) << i) >= nn.n
        |), planes AS (
        |  SELECT tt.t AS t, ii.i AS i,
        |    list(CAST(CAST('0x' || substr(
        |        md5(tt.t || ':' || ii.i || ':' || jj.j), 1, 15)
        |        AS BIGINT) AS DOUBLE) / 576460752303423488.0 - 1.0
        |      ORDER BY jj.j) AS plane
        |  FROM (SELECT unnest(generate_series(0, 15)) AS t) tt,
        |       (SELECT unnest(generate_series(0, 39)) AS i) ii,
        |       (SELECT unnest(generate_series(0, 63)) AS j) jj
        |  WHERE ii.i < (SELECT r FROM rsel)
        |  GROUP BY tt.t, ii.i
        |), emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), sigs AS (
        |  SELECT vec_id, t,
        |    sum(CASE WHEN list_dot_product(e, plane) >= 0
        |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS sig
        |  FROM emb, planes GROUP BY vec_id, t
        |), mem AS (
        |  -- replay the adversarial-occupancy cap (boundedSelfPairs):
        |  -- all-pairs in buckets <= 64 members, hub-spoke to the
        |  -- minimum id above (first diverged at sf0.1 where one sign
        |  -- bucket crossed the cap)
        |  SELECT vec_id, t, sig,
        |    count(*) OVER (PARTITION BY t, sig) AS bsz,
        |    min(vec_id) OVER (PARTITION BY t, sig) AS bmin
        |  FROM sigs
        |), cand AS (
        |  SELECT DISTINCT vec_a, vec_b FROM (
        |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |    FROM mem a JOIN mem b
        |      ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
        |    WHERE a.bsz <= 64
        |    UNION ALL
        |    SELECT bmin AS vec_a, vec_id AS vec_b FROM mem
        |    WHERE bsz > 64 AND vec_id <> bmin)
        |)
        |SELECT c.vec_a, c.vec_b, list_dot_product(ea.e, eb.e) AS cosine
        |FROM cand c
        |JOIN emb ea ON ea.vec_id = c.vec_a
        |JOIN emb eb ON eb.vec_id = c.vec_b
        |WHERE list_dot_product(ea.e, eb.e) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // every CTE MATERIALIZED: assigned/amem/emb are each referenced
    // multiple times downstream, and DuckDB's per-reference inlining
    // re-evaluated the n×nCells assignment cross-join (with the full
    // embedding array carried through its window) once per consumer —
    // 37 GiB OOM at x10; materialization evaluates each stage once
    "dedup_semantic" ->
      """WITH emb AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), k AS MATERIALIZED (
        |  SELECT CASE WHEN CAST(ceil(count(*) / 32.0) AS BIGINT) > 16
        |    THEN CAST(ceil(count(*) / 32.0) AS BIGINT)
        |    ELSE 16 END AS nc
        |  FROM emb
        |), cells AS MATERIALIZED (
        |  SELECT vec_id, e,
        |    CAST(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % (SELECT nc FROM k) AS BIGINT) AS cell,
        |    lpad(CAST(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
        |        17, 15) AS BIGINT) AS VARCHAR), 19, '0')
        |      || lpad(CAST(vec_id AS VARCHAR), 19, '0') AS skey
        |  FROM emb
        |), seeds AS MATERIALIZED (
        |  SELECT s.cell, e2.e AS seed_e
        |  FROM (SELECT cell, CAST(substr(min(skey), 20, 19) AS BIGINT)
        |          AS seed_vid
        |        FROM cells GROUP BY cell) s
        |  JOIN emb e2 ON e2.vec_id = s.seed_vid
        |), assigned AS MATERIALIZED (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT emb.vec_id, emb.e, s.cell,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY list_dot_product(emb.e, s.seed_e) DESC, s.cell)
        |        AS rn
        |    FROM emb, seeds s) WHERE rn = 1
        |), amem AS MATERIALIZED (
        |  -- replay the adversarial-occupancy cap (boundedSelfPairs):
        |  -- Voronoi cell sizes are data-driven, so a cell CAN cross the
        |  -- 64-member cap at scale; above it only hub-spoke pairs are
        |  -- scored (the dedup_embedding_cosine sf0.1 lesson)
        |  SELECT vec_id, e, cell,
        |    count(*) OVER (PARTITION BY cell) AS bsz,
        |    min(vec_id) OVER (PARTITION BY cell) AS bmin
        |  FROM assigned
        |), removed AS MATERIALIZED (
        |  SELECT DISTINCT vec_b AS vec_id FROM (
        |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |    FROM amem a JOIN amem b
        |      ON a.cell = b.cell AND a.vec_id < b.vec_id
        |    WHERE a.bsz <= 64 AND list_dot_product(a.e, b.e) >= 0.4
        |    UNION ALL
        |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |    FROM amem a JOIN amem b
        |      ON a.cell = b.cell AND a.vec_id = a.bmin
        |        AND b.vec_id <> b.bmin
        |    WHERE a.bsz > 64 AND list_dot_product(a.e, b.e) >= 0.4)
        |)
        |SELECT a.vec_id, a.cell,
        |  a.vec_id NOT IN (SELECT vec_id FROM removed) AS kept
        |FROM assigned a ORDER BY a.vec_id""".stripMargin,
    "multimodal_embed_knn" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(text || ':0'), 1, 15) AS BIGINT)
        |      % 1000000 AS DOUBLE) / 1000000.0 AS f0,
        |    CAST(CAST('0x' || substr(md5(text || ':1'), 1, 15) AS BIGINT)
        |      % 1000000 AS DOUBLE) / 1000000.0 AS f1,
        |    CAST(CAST('0x' || substr(md5(text || ':2'), 1, 15) AS BIGINT)
        |      % 1000000 AS DOUBLE) / 1000000.0 AS f2,
        |    CAST(CAST('0x' || substr(md5(text || ':3'), 1, 15) AS BIGINT)
        |      % 1000000 AS DOUBLE) / 1000000.0 AS f3
        |  FROM documents
        |), q AS (
        |  SELECT f0 AS q0, f1 AS q1, f2 AS q2, f3 AS q3
        |  FROM f WHERE doc_id = 0
        |)
        |SELECT doc_id,
        |  f0 * q0 + f1 * q1 + f2 * q2 + f3 * q3 AS sim
        |FROM f, q WHERE doc_id <> 0
        |ORDER BY sim DESC, doc_id LIMIT 10""".stripMargin,
    "multimodal_summary" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS payload_bytes,
        |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':w'), 1, 15)
        |    AS BIGINT) % 1024 + 256 AS INT) AS width,
        |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':h'), 1, 15)
        |    AS BIGINT) % 768 + 256 AS INT) AS height,
        |  CAST(CAST('0x' || substr(md5(text || ':0'), 1, 15) AS BIGINT)
        |    % 1000000 AS DOUBLE) / 1000000.0 AS f0,
        |  CAST(CAST('0x' || substr(md5(text || ':1'), 1, 15) AS BIGINT)
        |    % 1000000 AS DOUBLE) / 1000000.0 AS f1
        |FROM documents ORDER BY doc_id""".stripMargin,
    // metadata-arithmetic resize plan over the md5-stub dimensions
    "multimodal_resize_plan" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':w'),
        |      1, 15) AS BIGINT) % 1024 + 256 AS INT) AS width,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':h'),
        |      1, 15) AS BIGINT) % 768 + 256 AS INT) AS height
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, width, height,
        |    least(least(512.0 / CAST(width AS DOUBLE),
        |      512.0 / CAST(height AS DOUBLE)), 1.0) AS scale
        |  FROM m
        |)
        |SELECT doc_id, width, height,
        |  CAST(floor(CAST(width AS DOUBLE) * scale) AS INT) AS out_w,
        |  CAST(floor(CAST(height AS DOUBLE) * scale) AS INT) AS out_h,
        |  CAST(width AS BIGINT) * CAST(height AS BIGINT) AS in_pixels,
        |  CAST(floor(CAST(width AS DOUBLE) * scale) AS BIGINT)
        |    * CAST(floor(CAST(height AS DOUBLE) * scale) AS BIGINT)
        |    AS out_pixels
        |FROM s ORDER BY doc_id""".stripMargin,
    "multimodal_audio_windows" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dur'),
        |      1, 15) AS BIGINT) % 30000 + 1000 AS duration_ms
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, duration_ms,
        |    duration_ms * 16000 // 1000 AS n_samples
        |  FROM m
        |), f AS (
        |  SELECT doc_id, duration_ms, n_samples,
        |    CASE WHEN n_samples >= 400
        |      THEN (n_samples - 400) // 160 + 1 ELSE 0 END AS n_frames
        |  FROM s
        |)
        |SELECT doc_id, duration_ms, n_samples, n_frames,
        |  n_samples - CASE WHEN n_frames > 0
        |    THEN (n_frames - 1) * 160 + 400 ELSE 0 END AS tail_samples
        |FROM f ORDER BY doc_id""".stripMargin,
    "scd2_versions" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, ts FROM events
        |  WHERE user_id < 20
        |), marked AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), versioned AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w2 AS INT) AS version_n,
        |    event_type AS attr, ts AS valid_from,
        |    lead(ts) OVER w2 AS valid_to
        |  FROM changes
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, version_n, attr, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM versioned ORDER BY user_id, version_n""".stripMargin,
    "scd2_asof_lookup" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, ts FROM events
        |  WHERE user_id < 20
        |), marked AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), versioned AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w2 AS INT) AS version_n,
        |    event_type AS attr, ts AS valid_from,
        |    lead(ts) OVER w2 AS valid_to
        |  FROM changes
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e.event_id, e.user_id, v.version_n, v.attr
        |FROM ev e JOIN versioned v
        |  ON v.user_id = e.user_id AND v.valid_from <= e.ts
        |  AND (v.valid_to IS NULL OR e.ts < v.valid_to)
        |ORDER BY e.event_id""".stripMargin,
    "decontaminate_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ftoks AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    CAST('0x' || substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])),
        |      1, 15) AS BIGINT) AS h
        |  FROM ftoks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
        |), df AS (
        |  SELECT h FROM grams WHERE doc_id % 37 <> 0
        |  GROUP BY h HAVING count(*) <= 50
        |), tr AS (
        |  SELECT g.doc_id, g.h FROM grams g JOIN df ON g.h = df.h
        |  WHERE g.doc_id % 37 <> 0
        |), ev AS (SELECT doc_id, h FROM grams WHERE doc_id % 37 = 0),
        |evn AS (SELECT doc_id, count(*) AS ng FROM ev GROUP BY doc_id),
        |ov AS (
        |  SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
        |    count(*) AS n_shared
        |  FROM tr JOIN ev ON tr.h = ev.h GROUP BY 1, 2
        |)
        |SELECT ov.train_doc, ov.eval_doc, ov.n_shared,
        |  CAST(ov.n_shared AS DOUBLE) / evn.ng AS eval_frac
        |FROM ov JOIN evn ON evn.doc_id = ov.eval_doc
        |WHERE ov.n_shared >= 2
        |ORDER BY train_doc, eval_doc""".stripMargin,
    "text_boilerplate_frac" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ftoks AS (SELECT doc_id, t FROM toks WHERE len(t) >= 8),
        |chunks AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(array_to_string(
        |      t[ci * 8 + 1 : ci * 8 + 8], ' ')), 1, 15) AS BIGINT) AS h
        |  FROM ftoks,
        |    LATERAL (SELECT unnest(generate_series(0,
        |      CAST(len(t) // 8 AS INT) - 1)) AS ci) s
        |), df AS (
        |  SELECT h, CAST(count(*) AS BIGINT) AS df FROM (
        |    SELECT DISTINCT doc_id, h FROM chunks) GROUP BY h
        |)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS REAL) AS boiler_frac
        |FROM chunks c JOIN df ON c.h = df.h
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "sql_abc_analysis" ->
      """WITH rev AS (
        |  SELECT l_partkey AS part_id,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY l_partkey
        |), tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents
        |  FROM rev),
        |ranked AS (
        |  SELECT part_id, revenue_cents,
        |    CAST(row_number() OVER (ORDER BY revenue_cents DESC, part_id)
        |      AS INT) AS rank,
        |    CAST(sum(revenue_cents) OVER (
        |      ORDER BY revenue_cents DESC, part_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM rev
        |)
        |SELECT part_id, rank, revenue_cents, cum_cents,
        |  CASE WHEN cum_cents * 100 < total_cents * 80 THEN 'A'
        |       WHEN cum_cents * 100 < total_cents * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM ranked CROSS JOIN tot ORDER BY rank""".stripMargin,
    "eval_cohens_kappa" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(sum(v3) AS BIGINT) AS s3,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY event_type
        |), r AS (
        |  SELECT e.event_id,
        |    CASE WHEN e.v3 * m.n > m.s3 THEN 1 ELSE 0 END AS a,
        |    CAST(CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
        |      || ':rater'), 1, 15) AS BIGINT) % 2 AS INT) AS b
        |  FROM e JOIN m USING (event_type)
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_agree,
        |    CAST(sum(a) AS BIGINT) AS n_a1,
        |    CAST(sum(b) AS BIGINT) AS n_b1
        |  FROM r
        |), p AS (
        |  SELECT *, CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |    CAST(n_a1 AS DOUBLE) / CAST(n AS DOUBLE) AS pa1,
        |    CAST(n_b1 AS DOUBLE) / CAST(n AS DOUBLE) AS pb1
        |  FROM g
        |), q AS (
        |  SELECT *, pa1 * pb1 + (1.0 - pa1) * (1.0 - pb1) AS pe FROM p
        |)
        |SELECT n, n_agree, n_a1, n_b1,
        |  CAST(po AS REAL) AS p_observed,
        |  CAST(pe AS REAL) AS p_expected,
        |  CAST((po - pe) / (1.0 - pe) AS REAL) AS kappa
        |FROM q""".stripMargin,
    // McNemar: exact BIGINT contingency cells; continuity-corrected chi2
    "eval_mcnemar" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(sum(v3) AS BIGINT) AS s3,
        |    CAST(count(*) AS BIGINT) AS n_t FROM e GROUP BY event_type
        |), g AS (
        |  SELECT CAST(sum(v3) AS BIGINT) AS g3,
        |    CAST(count(*) AS BIGINT) AS n_g FROM e
        |), r AS (
        |  SELECT
        |    (e.v3 * m.n_t > m.s3) = lbl AS a_ok,
        |    (e.v3 * g.n_g > g.g3) = lbl AS b_ok
        |  FROM e JOIN m USING (event_type) CROSS JOIN g,
        |    LATERAL (SELECT CAST('0x' || substr(md5(
        |      CAST(e.event_id AS VARCHAR) || ':label'), 1, 15)
        |      AS BIGINT) % 2 = 1 AS lbl) l
        |), c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both,
        |    CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a_only,
        |    CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b_only,
        |    CAST(sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neither
        |  FROM r
        |)
        |SELECT n, n_both, n_a_only, n_b_only, n_neither,
        |  CAST(CASE WHEN n_a_only + n_b_only = 0 THEN 0.0
        |    ELSE (abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
        |        - 1.0)
        |      * (abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
        |        - 1.0)
        |      / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE))
        |    END AS REAL) AS chi2
        |FROM c""".stripMargin,
    // Fleiss: latent cat + 3 PRF raters (7/10 agree); exact BIGINT sums
    "eval_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT event_id,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |      || ':truecat'), 1, 15) AS BIGINT) % 3 AS base
        |  FROM events
        |), c AS (
        |  SELECT event_id,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':r1'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |      ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':alt1'), 1, 15) AS BIGINT) % 3 END AS c1,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':r2'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |      ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':alt2'), 1, 15) AS BIGINT) % 3 END AS c2,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':r3'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |      ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':alt3'), 1, 15) AS BIGINT) % 3 END AS c3
        |  FROM r
        |), n AS (
        |  SELECT
        |    CAST(CASE WHEN c1 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n0,
        |    CAST(CASE WHEN c1 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 1 THEN 1 ELSE 0 END AS BIGINT) AS n1,
        |    CAST(CASE WHEN c1 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n2
        |  FROM c
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(n0) AS BIGINT) AS s0, CAST(sum(n1) AS BIGINT) AS s1,
        |    CAST(sum(n2) AS BIGINT) AS s2,
        |    CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS ss
        |  FROM n
        |), q AS (
        |  SELECT *,
        |    (CAST(ss AS DOUBLE) - CAST(n_items AS DOUBLE) * 3.0)
        |      / (CAST(n_items AS DOUBLE) * 3.0 * 2.0) AS pbar,
        |    (CAST(s0 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |      * (CAST(s0 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |    + (CAST(s1 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |      * (CAST(s1 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |    + (CAST(s2 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |      * (CAST(s2 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 3.0))
        |      AS pe
        |  FROM g
        |)
        |SELECT n_items, CAST(3 AS INT) AS m, s0, s1, s2, ss,
        |  CAST(pbar AS REAL) AS p_bar, CAST(pe AS REAL) AS p_e,
        |  CAST((pbar - pe) / (1.0 - pe) AS REAL) AS kappa
        |FROM q""".stripMargin,
    // Krippendorff: 2nDo and n(n-1)De as exact BIGINTs, ONE division
    "eval_krippendorff_alpha" ->
      """WITH r AS (
        |  SELECT event_id,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |      || ':truecat'), 1, 15) AS BIGINT) % 3 AS base
        |  FROM events
        |), c AS (
        |  SELECT event_id,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present1'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r1'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt1'), 1, 15) AS BIGINT) % 3 END
        |    END AS c1,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present2'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r2'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt2'), 1, 15) AS BIGINT) % 3 END
        |    END AS c2,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present3'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r3'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt3'), 1, 15) AS BIGINT) % 3 END
        |    END AS c3
        |  FROM r
        |), n AS (
        |  SELECT
        |    CAST(CASE WHEN c1 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n0,
        |    CAST(CASE WHEN c1 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 1 THEN 1 ELSE 0 END AS BIGINT) AS n1,
        |    CAST(CASE WHEN c1 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n2
        |  FROM c
        |), p AS (
        |  SELECT n0, n1, n2, n0 + n1 + n2 AS m,
        |    n0 * n0 + n1 * n1 + n2 * n2 AS s
        |  FROM n WHERE n0 + n1 + n2 >= 2
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(m) AS BIGINT) AS n_ratings,
        |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
        |    CAST(sum(n2) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN m = 2 THEN 2 * (4 - s) ELSE 9 - s END)
        |      AS BIGINT) AS do_num2
        |  FROM p
        |)
        |SELECT n_items, n_ratings, c0, c1, c2, do_num2,
        |  CAST(n_ratings * n_ratings - (c0 * c0 + c1 * c1 + c2 * c2)
        |    AS BIGINT) AS de_num,
        |  CAST(1.0 - CAST(do_num2 * (n_ratings - 1) AS DOUBLE)
        |    / CAST(2 * (n_ratings * n_ratings
        |        - (c0 * c0 + c1 * c1 + c2 * c2)) AS DOUBLE) AS REAL)
        |    AS alpha
        |FROM g""".stripMargin,
    // ordinal alpha: squared-distance pair mass, weights {1, 4, 1}
    "eval_krippendorff_ordinal" ->
      """WITH r AS (
        |  SELECT event_id,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |      || ':truecat'), 1, 15) AS BIGINT) % 3 AS base
        |  FROM events
        |), c AS (
        |  SELECT event_id,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present1'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r1'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt1'), 1, 15) AS BIGINT) % 3 END
        |    END AS c1,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present2'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r2'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt2'), 1, 15) AS BIGINT) % 3 END
        |    END AS c2,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':present3'), 1, 15) AS BIGINT) % 4 <> 0 THEN
        |      CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':r3'), 1, 15) AS BIGINT) % 10 < 7 THEN base
        |        ELSE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |          || ':alt3'), 1, 15) AS BIGINT) % 3 END
        |    END AS c3
        |  FROM r
        |), n AS (
        |  SELECT
        |    CAST(CASE WHEN c1 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n0,
        |    CAST(CASE WHEN c1 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 1 THEN 1 ELSE 0 END AS BIGINT) AS n1,
        |    CAST(CASE WHEN c1 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c2 = 2 THEN 1 ELSE 0 END
        |      + CASE WHEN c3 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n2
        |  FROM c
        |), p AS (
        |  SELECT n0, n1, n2, n0 + n1 + n2 AS m,
        |    2 * (n0 * n1 + 4 * n0 * n2 + n1 * n2) AS dsq
        |  FROM n
        |), g AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_items,
        |    CAST(coalesce(sum(CASE WHEN m >= 2 THEN m ELSE 0 END), 0)
        |      AS BIGINT) AS n_ratings,
        |    CAST(coalesce(sum(CASE WHEN m >= 2 THEN n0 ELSE 0 END), 0)
        |      AS BIGINT) AS c0,
        |    CAST(coalesce(sum(CASE WHEN m >= 2 THEN n1 ELSE 0 END), 0)
        |      AS BIGINT) AS c1,
        |    CAST(coalesce(sum(CASE WHEN m >= 2 THEN n2 ELSE 0 END), 0)
        |      AS BIGINT) AS c2,
        |    CAST(coalesce(sum(CASE WHEN m = 2 THEN 2 * dsq
        |      WHEN m = 3 THEN dsq ELSE 0 END), 0) AS BIGINT) AS do_num2
        |  FROM p
        |)
        |SELECT n_items, n_ratings, c0, c1, c2, do_num2,
        |  CAST(2 * (c0 * c1 + 4 * c0 * c2 + c1 * c2) AS BIGINT)
        |    AS de_num,
        |  CAST(CASE WHEN 2 * (c0 * c1 + 4 * c0 * c2 + c1 * c2) > 0
        |    THEN 1.0 - CAST(do_num2 * (n_ratings - 1) AS DOUBLE)
        |      / CAST(2 * (2 * (c0 * c1 + 4 * c0 * c2 + c1 * c2))
        |        AS DOUBLE)
        |    END AS REAL) AS alpha
        |FROM g""".stripMargin,
    // mix entropy: -sum p ln p per lang; effective sources = exp(H)
    "corpus_mix_entropy" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |), t AS (
        |  SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_sources
        |  FROM c GROUP BY lang
        |), h AS (
        |  SELECT c.lang, t.n_docs, t.n_sources,
        |    sum(-(CAST(c.n AS DOUBLE) / CAST(t.n_docs AS DOUBLE))
        |      * ln(CAST(c.n AS DOUBLE) / CAST(t.n_docs AS DOUBLE))) AS h
        |  FROM c JOIN t USING (lang)
        |  GROUP BY c.lang, t.n_docs, t.n_sources
        |)
        |SELECT lang, n_docs, n_sources,
        |  CAST(h AS REAL) AS source_entropy,
        |  CAST(exp(h) AS REAL) AS effective_sources
        |FROM h ORDER BY lang""".stripMargin,
    // percentile_disc picks at rank ceil(q*n/100), integer end to end
    "corpus_length_percentiles" ->
      """WITH d AS (
        |  SELECT lang, CAST(len(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT)
        |    AS len, doc_id
        |  FROM documents
        |), r AS (
        |  SELECT lang, len,
        |    row_number() OVER (PARTITION BY lang ORDER BY len, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n_docs
        |  FROM d
        |)
        |SELECT lang, CAST(max(n_docs) AS BIGINT) AS n_docs,
        |  CAST(max(CASE WHEN rk = greatest(1, (n_docs * 50 + 99) // 100)
        |    THEN len END) AS BIGINT) AS p50_tokens,
        |  CAST(max(CASE WHEN rk = greatest(1, (n_docs * 90 + 99) // 100)
        |    THEN len END) AS BIGINT) AS p90_tokens,
        |  CAST(max(CASE WHEN rk = greatest(1, (n_docs * 99 + 99) // 100)
        |    THEN len END) AS BIGINT) AS p99_tokens,
        |  CAST(max(len) AS BIGINT) AS max_tokens
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // 2×-integer mid-ranks (2C+t+1), exact tie term, continuity-corrected z
    "eval_mann_whitney_u" ->
      """WITH pv AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY value
        |), c AS (
        |  SELECT na, nb, na + nb AS t,
        |    2 * (sum(na + nb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - (na + nb)) + (na + nb) + 1 AS r2
        |  FROM pv
        |), m AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    CAST(sum(na * r2) AS BIGINT) AS r2_a,
        |    sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
        |      * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie3
        |  FROM c
        |), k AS (
        |  SELECT n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
        |    CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS ua,
        |    CAST(tie3 AS DOUBLE) AS tie3d
        |  FROM m
        |), z AS (
        |  SELECT n_a, n_b, ua, nad, nbd,
        |    nad * nbd / 2.0 AS mu,
        |    sqrt(nad * nbd / 12.0
        |      * ((n + 1.0) - tie3d / (n * (n - 1.0)))) AS sigma
        |  FROM k
        |)
        |SELECT n_a, n_b, ua AS u_stat, ua / (nad * nbd) AS auc_equiv,
        |  ((CASE WHEN ua > mu THEN ua - 0.5 WHEN ua < mu THEN ua + 0.5
        |    ELSE ua END) - mu) / sigma AS z_score
        |FROM z""".stripMargin,
    // exact integer dominance numerator; Romano magnitude bands
    "eval_cliffs_delta" ->
      """WITH pv AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY value
        |), t AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS ta,
        |    CAST(sum(nb) AS BIGINT) AS tb FROM pv
        |), c AS (
        |  SELECT na, nb,
        |    sum(nb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nb
        |      AS cb_lt
        |  FROM pv
        |), m AS (
        |  SELECT ta, tb,
        |    CAST(sum(na * (cb_lt - (tb - cb_lt - nb))) AS BIGINT) AS dom
        |  FROM c, t GROUP BY ta, tb
        |), k AS (
        |  SELECT ta AS n_a, tb AS n_b,
        |    CAST(dom AS DOUBLE)
        |      / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)) AS cliffs_delta
        |  FROM m
        |)
        |SELECT n_a, n_b, cliffs_delta,
        |  CASE WHEN abs(cliffs_delta) < 0.147 THEN 'negligible'
        |    WHEN abs(cliffs_delta) < 0.33 THEN 'small'
        |    WHEN abs(cliffs_delta) < 0.474 THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM k""".stripMargin,
    // paired counts → integer d; ×48-scaled exact variance
    "eval_wilcoxon_signed_rank" ->
      """WITH d AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      - sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS d
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY user_id
        |), pa AS (
        |  SELECT abs(d) AS ad, count(*) AS t,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS tp
        |  FROM d WHERE d <> 0 GROUP BY abs(d)
        |), r AS (
        |  SELECT t, tp,
        |    2 * (sum(t) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
        |      + t + 1 AS r2
        |  FROM pa
        |), m AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS n_pairs,
        |    CAST(sum(tp * r2) AS BIGINT) AS w2,
        |    sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
        |      * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie3
        |  FROM r
        |), k AS (
        |  SELECT n_pairs, CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
        |    CAST(n_pairs AS DOUBLE) AS nd,
        |    CAST(2 * CAST(n_pairs AS HUGEINT)
        |      * (CAST(n_pairs AS HUGEINT) + 1)
        |      * (2 * CAST(n_pairs AS HUGEINT) + 1) - tie3
        |      AS DOUBLE) AS v48
        |  FROM m
        |)
        |SELECT n_pairs, w_plus,
        |  (w_plus - nd * (nd + 1.0) / 4.0) / sqrt(v48 / 48.0) AS z_score
        |FROM k""".stripMargin,
    "graph_katz_centrality" -> katzOracleSql(3, "0.05"),
    "ts_cusum_target" -> cusumTargetRecurrenceSql,
    "stream_cusum_target" -> cusumTargetRecurrenceSql,
    // the agg_ttest_welch moment CTEs with the ±margin one-sided pair
    "eval_tost_equivalence" ->
      """WITH g AS (
        |  SELECT
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1a,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2a,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1b,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *, CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM g
        |), v AS (
        |  SELECT *, m1 - m2 AS d,
        |    sqrt(((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * m1)
        |        / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
        |      + ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * m2)
        |        / CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE)) AS se
        |  FROM m
        |), t AS (
        |  SELECT n1, n2, d, se,
        |    (d + 2000.0) / se AS t_lower, (2000.0 - d) / se AS t_upper
        |  FROM v
        |)
        |SELECT n1, n2,
        |  CAST(d / 1000.0 AS REAL) AS mean_diff,
        |  CAST(se / 1000.0 AS REAL) AS se,
        |  CAST(t_lower AS REAL) AS t_lower,
        |  CAST(t_upper AS REAL) AS t_upper,
        |  t_lower > 1.6448536269514722 AND t_upper > 1.6448536269514722
        |    AS equivalent
        |FROM t""".stripMargin,
    // same confusion cells as eval_cohens_kappa; AC1 chance term
    "eval_gwet_ac1" ->
      """WITH tm AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(round(value * 1000.0) AS BIGINT)) AS BIGINT)
        |      AS s3,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type
        |), rated AS (
        |  SELECT
        |    CASE WHEN CAST(round(e.value * 1000.0) AS BIGINT) * tm.n
        |      > tm.s3 THEN 1 ELSE 0 END AS a,
        |    CAST(CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
        |      || ':rater'), 1, 15) AS BIGINT) % 2 AS INT) AS b
        |  FROM events e JOIN tm ON tm.event_type = e.event_type
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_agree,
        |    CAST(sum(a) AS BIGINT) AS n_a1,
        |    CAST(sum(b) AS BIGINT) AS n_b1
        |  FROM rated
        |), k AS (
        |  SELECT n, n_agree,
        |    CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |    (CAST(n_a1 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + CAST(n_b1 AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0 AS pibar
        |  FROM g
        |)
        |SELECT n, n_agree,
        |  CAST(po AS REAL) AS p_observed,
        |  CAST(2.0 * pibar * (1.0 - pibar) AS REAL) AS p_chance_ac1,
        |  CAST((po - 2.0 * pibar * (1.0 - pibar))
        |    / (1.0 - 2.0 * pibar * (1.0 - pibar)) AS REAL) AS gwet_ac1
        |FROM k""".stripMargin,
    // Croston recurrence replayed per purchase in (ts, event_id) order
    "ts_croston" -> crostonRecurrenceSql,
    // step-width bucket histogram → exact strictly-below rank per
    // candidate; Gumbel-max with the hash60 uniforms
    "privacy_dp_quantile" ->
      """WITH hist AS (
        |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
        |cand AS (
        |  SELECT CAST(i * 5 AS INT) AS c FROM range(1, 98) t(i)
        |), lt AS (
        |  SELECT c, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS cnt_lt
        |  FROM cand LEFT JOIN hist ON b < CAST(c AS BIGINT) / 5
        |  GROUP BY c
        |), scored AS (
        |  SELECT c, cnt_lt,
        |    (-CAST(abs(2 * cnt_lt - n) AS DOUBLE)) / 2.0 AS utility,
        |    (-CAST(abs(2 * cnt_lt - n) AS DOUBLE)) / 2.0
        |      + 2.0 * (-ln(-ln((CAST(CAST('0x' || substr(md5('dpq:'
        |        || CAST(c AS VARCHAR)), 1, 15) AS BIGINT)
        |        AS DOUBLE) + 0.5) / 1152921504606846976.0)))
        |      AS noised_utility
        |  FROM lt, tot
        |), ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    ORDER BY noised_utility DESC, c) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT rank, c AS candidate,
        |  CAST(noised_utility AS REAL) AS noised_utility,
        |  cnt_lt, CAST(utility AS REAL) AS utility
        |FROM ranked WHERE rank <= 3 ORDER BY rank""".stripMargin,
    // pooled-SD effect size from the same Welch moment CTEs
    "eval_cohens_d" ->
      """WITH g AS (
        |  SELECT
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1a,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2a,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1b,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *, CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM g
        |), k AS (
        |  SELECT n1, n2,
        |    (m1 - m2) / sqrt(((CAST(s2a AS DOUBLE)
        |        - CAST(s1a AS DOUBLE) * m1)
        |      + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * m2))
        |      / CAST(n1 + n2 - 2 AS DOUBLE)) AS d,
        |    1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0) AS j
        |  FROM m
        |)
        |SELECT n1, n2,
        |  CAST(d AS REAL) AS cohens_d,
        |  CAST(d * j AS REAL) AS hedges_g,
        |  CASE WHEN abs(d) < 0.2 THEN 'negligible'
        |    WHEN abs(d) < 0.5 THEN 'small'
        |    WHEN abs(d) < 0.8 THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM k""".stripMargin,
    // the Bollinger integer-moment discipline on (x, lag(x)) pairs
    "window_rolling_autocorr" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000.0) AS BIGINT) AS x
        |  FROM events WHERE user_id < 50
        |), l AS (
        |  SELECT *, lag(x) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS y
        |  FROM e
        |), m AS (
        |  SELECT user_id, event_id,
        |    CAST(count(y) OVER w AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN x END) OVER w
        |      AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN x * x END) OVER w
        |      AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
        |  FROM l
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, event_id, np AS n_pairs,
        |  CASE WHEN np = 20 AND np * sxx - sx * sx > 0
        |      AND np * syy - sy * sy > 0
        |    THEN CAST(CAST(np * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(np * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(np * syy - sy * sy AS DOUBLE))) AS REAL)
        |    END AS rolling_autocorr
        |FROM m ORDER BY user_id, event_id""".stripMargin,
    // ordered full-frame folds block-by-block, then the 4-point fit
    "ts_hurst_exponent" ->
      """WITH hourly AS (
        |  SELECT CAST(sum(CAST(round(value * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / 1000000.0 AS v,
        |    epoch_us(ts) // 3600000000 AS h
        |  FROM events GROUP BY h
        |), idxd AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY h) AS INT) AS idx
        |  FROM hourly
        |), sized AS (
        |  SELECT v, idx, w, CAST((idx - 1) // w AS BIGINT) AS blk
        |  FROM idxd, (VALUES (8), (16), (32), (64)) s(w)
        |), perrow AS (
        |  SELECT w, blk, v, idx,
        |    count(*) OVER g AS bn,
        |    sum(v) OVER f / w AS mean
        |  FROM sized
        |  WINDOW g AS (PARTITION BY w, blk),
        |    f AS (PARTITION BY w, blk ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), devrow AS (
        |  SELECT w, blk, idx,
        |    sum(v - mean) OVER p AS dev,
        |    sum((v - mean) * (v - mean)) OVER f AS ssq
        |  FROM perrow WHERE bn = w
        |  WINDOW p AS (PARTITION BY w, blk ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    f AS (PARTITION BY w, blk ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), blocks AS (
        |  SELECT w, blk,
        |    max(dev) - min(dev) AS r,
        |    sqrt(max(ssq) / w) AS s
        |  FROM devrow GROUP BY w, blk
        |), rsrows AS (
        |  SELECT w, blk, r / s AS rs FROM blocks WHERE s > 0.0
        |), panel0 AS (
        |  SELECT w, blk,
        |    count(*) OVER q AS nb,
        |    sum(rs) OVER q / CAST(count(*) OVER q AS DOUBLE) AS avg_rs,
        |    row_number() OVER (PARTITION BY w ORDER BY blk) AS prn
        |  FROM rsrows
        |  WINDOW q AS (PARTITION BY w ORDER BY blk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), panel AS (
        |  SELECT w, CAST(nb AS BIGINT) AS n_blocks, avg_rs
        |  FROM panel0 WHERE prn = 1
        |), fit AS (
        |  SELECT w, n_blocks, avg_rs,
        |    (CAST(count(*) OVER q AS DOUBLE)
        |        * sum(ln(CAST(w AS DOUBLE)) * ln(avg_rs)) OVER q
        |      - sum(ln(CAST(w AS DOUBLE))) OVER q * sum(ln(avg_rs)) OVER q)
        |    / (CAST(count(*) OVER q AS DOUBLE)
        |        * sum(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE))) OVER q
        |      - sum(ln(CAST(w AS DOUBLE))) OVER q
        |        * sum(ln(CAST(w AS DOUBLE))) OVER q) AS hurst
        |  FROM panel
        |  WINDOW q AS (ORDER BY w
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT max(CASE WHEN w = 8 THEN n_blocks END) AS blocks_w8,
        |  CAST(max(CASE WHEN w = 8 THEN avg_rs END) AS REAL) AS rs_w8,
        |  CAST(max(CASE WHEN w = 16 THEN avg_rs END) AS REAL) AS rs_w16,
        |  CAST(max(CASE WHEN w = 32 THEN avg_rs END) AS REAL) AS rs_w32,
        |  CAST(max(CASE WHEN w = 64 THEN avg_rs END) AS REAL) AS rs_w64,
        |  CAST(max(hurst) AS REAL) AS hurst
        |FROM fit""".stripMargin,
    // Σ 1/σ over non-adjacent neighbor pairs; couriers by 3-way join
    "graph_ego_betweenness" -> egoBetweennessOracleSql(64),
    // round 19 (r18 verdict #7): the %512 center cohort — the sampled
    // form whose x10 DuckDB replay fits in temp disk (the full %64
    // courier stream measured ~300 M rows > 78 GB twice at x10)
    "graph_ego_betweenness_s512" -> egoBetweennessOracleSql(512),
    // Welch SE epilogue with the two-z MDE constant
    "eval_mde_power" ->
      """WITH g AS (
        |  SELECT
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1a,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2a,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1b,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *, CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM g
        |), v AS (
        |  SELECT n1, n2,
        |    sqrt(((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * m1)
        |        / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
        |      + ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * m2)
        |        / CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE)) AS se,
        |    sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * m1
        |      + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * m2))
        |      / CAST(n1 + n2 - 2 AS DOUBLE)) AS sp
        |  FROM m
        |)
        |SELECT n1, n2,
        |  CAST(se / 1000.0 AS REAL) AS se_diff,
        |  CAST(2.8015852181129683 * se / 1000.0 AS REAL) AS mde_abs,
        |  CAST(2.8015852181129683 * se / sp AS REAL) AS mde_d
        |FROM v""".stripMargin,
    // the minhash pair index probed at five verification cuts
    "dedup_threshold_curve" ->
      s"""WITH ${minhashPairsCtes(8, 4, "0.5")},
        |th AS (
        |  SELECT CAST(x AS DOUBLE) AS threshold
        |  FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) t(x)
        |), pt AS (
        |  SELECT th.threshold, p.doc_a, p.doc_b
        |  FROM pairs p JOIN th ON p.jaccard >= th.threshold
        |), ex AS (
        |  SELECT threshold, doc_a AS doc_id FROM pt
        |  UNION ALL SELECT threshold, doc_b AS doc_id FROM pt
        |)
        |SELECT threshold, CAST(count(*) / 2 AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM ex GROUP BY threshold ORDER BY threshold""".stripMargin,
    // z-norm → PAA → quartile alphabet, every fold ordered
    "ts_sax_symbolic" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE user_id < 50
        |), r AS (
        |  SELECT user_id, value,
        |    CAST(count(*) OVER u AS BIGINT) AS n,
        |    sum(value) OVER uf / count(*) OVER u AS mean,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM e
        |  WINDOW u AS (PARTITION BY user_id),
        |    uf AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), s AS (
        |  SELECT user_id, value, n, mean, rn,
        |    sum((value - mean) * (value - mean)) OVER uf AS ssq
        |  FROM r
        |  WINDOW uf AS (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), z AS (
        |  SELECT user_id, rn,
        |    (value - mean) / sqrt(ssq / n) AS z,
        |    CAST((rn - 1) // 8 AS BIGINT) AS blk
        |  FROM s WHERE ssq > 0.0
        |), b AS (
        |  SELECT user_id, blk,
        |    count(*) OVER g AS bn,
        |    sum(z) OVER f / count(*) OVER g AS paa,
        |    row_number() OVER (PARTITION BY user_id, blk ORDER BY rn)
        |      AS brn
        |  FROM z
        |  WINDOW g AS (PARTITION BY user_id, blk),
        |    f AS (PARTITION BY user_id, blk ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), sym AS (
        |  SELECT user_id, blk,
        |    CASE WHEN paa < -0.6744897501960817 THEN 'a'
        |      WHEN paa < 0.0 THEN 'b'
        |      WHEN paa < 0.6744897501960817 THEN 'c'
        |      ELSE 'd' END AS sym
        |  FROM b WHERE brn = 1 AND bn = 8
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  string_agg(sym, '' ORDER BY blk) AS sax
        |FROM sym GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_croston" -> crostonRecurrenceSql,
    // cross-multiplied integer-fed x·ln(x) terms; REAL absorbs fold order
    "agg_theil_index" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), t AS (
        |  SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s
        |  FROM o GROUP BY priority
        |), r AS (
        |  SELECT o.priority, t.n,
        |    CASE WHEN cents > 0 THEN
        |      (CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)
        |        / CAST(s AS DOUBLE))
        |      * ln(CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)
        |        / CAST(s AS DOUBLE))
        |      ELSE CAST(0.0 AS DOUBLE) END AS term
        |  FROM o JOIN t USING (priority)
        |)
        |SELECT priority, CAST(max(n) AS BIGINT) AS n_orders,
        |  CAST(sum(term) / CAST(max(n) AS DOUBLE) AS REAL) AS theil
        |FROM r GROUP BY priority ORDER BY priority""".stripMargin,
    // exact club counts off the same co-purchase edge/degree CTEs
    "graph_rich_club" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u
        |), ks AS (
        |  SELECT k FROM (VALUES (10), (20), (40), (80)) t(k)
        |), nk AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_k
        |  FROM deg CROSS JOIN ks WHERE deg > k GROUP BY k
        |), ek AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS e_k
        |  FROM e0
        |  JOIN deg du ON du.u = e0.u
        |  JOIN deg dv ON dv.u = e0.v
        |  CROSS JOIN ks
        |  WHERE du.deg > k AND dv.deg > k GROUP BY k
        |)
        |SELECT k, n_k, CAST(coalesce(e_k, 0) AS BIGINT) AS e_k,
        |  CASE WHEN n_k >= 2 THEN
        |    CAST(2.0 * CAST(coalesce(e_k, 0) AS DOUBLE)
        |      / (CAST(n_k AS DOUBLE) * CAST(n_k - 1 AS DOUBLE)) AS REAL)
        |  END AS phi
        |FROM nk LEFT JOIN ek USING (k) ORDER BY k""".stripMargin,
    // exact HUGEINT moments per lag (Spark side holds DECIMAL(38,0) —
    // both are exact integers, so the double epilogues agree bitwise)
    "ts_ccf_lags" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS cx,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS py
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY h
        |), lags AS (
        |  SELECT lag_h FROM (VALUES (0), (1), (2), (4), (8)) t(lag_h)
        |), j AS (
        |  SELECT l.lag_h, a.cx, b.py
        |  FROM hourly a CROSS JOIN lags l
        |  JOIN hourly b ON b.h = a.h + l.lag_h
        |), m AS (
        |  SELECT lag_h, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(cx AS HUGEINT)) AS sx,
        |    sum(CAST(py AS HUGEINT)) AS sy,
        |    sum(CAST(cx AS HUGEINT) * CAST(py AS HUGEINT)) AS sxy,
        |    sum(CAST(cx AS HUGEINT) * CAST(cx AS HUGEINT)) AS sxx,
        |    sum(CAST(py AS HUGEINT) * CAST(py AS HUGEINT)) AS syy
        |  FROM j GROUP BY lag_h
        |)
        |SELECT lag_h, n AS n_hours,
        |  CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS REAL)
        |    AS ccf
        |FROM m ORDER BY lag_h""".stripMargin,
    // complete blocks (absent types count 0), 2×-integer mid-ranks,
    // the scipy tie-corrected χ² on exact integer inputs
    "eval_friedman_kendall_w" ->
      """WITH types AS (SELECT DISTINCT event_type FROM events),
        |users AS (SELECT DISTINCT user_id FROM events),
        |counts AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type
        |), blocks AS (
        |  SELECT u.user_id, t.event_type, coalesce(c.c, 0) AS c
        |  FROM users u CROSS JOIN types t
        |  LEFT JOIN counts c
        |    ON c.user_id = u.user_id AND c.event_type = t.event_type
        |), ranked AS (
        |  SELECT user_id, event_type, c,
        |    rank() OVER (PARTITION BY user_id ORDER BY c) AS rk,
        |    count(*) OVER (PARTITION BY user_id, c) AS t
        |  FROM blocks
        |), cs AS (
        |  SELECT event_type,
        |    CAST(sum(2 * (rk - 1) + t + 1) AS HUGEINT) AS r2j
        |  FROM ranked GROUP BY event_type
        |), tt AS (
        |  SELECT coalesce(sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
        |      * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)), 0) AS tie3
        |  FROM (SELECT DISTINCT user_id, c, t FROM ranked)
        |), km AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
        |nm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
        |m AS (SELECT sum(r2j * r2j) AS sr2 FROM cs),
        |f AS (
        |  SELECT n, k,
        |    (12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |        * (CAST(k AS DOUBLE) + 1.0))
        |      * (CAST(sr2 AS DOUBLE) / 4.0)
        |      - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
        |    / (1.0 - CAST(tie3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |        * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)))
        |      AS chi2
        |  FROM m, tt, km, nm
        |)
        |SELECT n AS n_users, k AS k_types, chi2 AS chi2_friedman,
        |  chi2 / (CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))
        |    AS kendalls_w
        |FROM f""".stripMargin,
    // round 17: unrolled Bellman-Ford (frontier-pruned == full rounds)
    "graph_sssp_weighted" -> ssspOracleSql(4, 4),
    // round 17: BCa over the shared replica CTEs, Φ⁻¹ grid literals
    "eval_bootstrap_bca" -> bcaOracleSql(50),
    "eval_bootstrap_bca_sampled" ->
      bcaOracleSqlFrom(50, sampledTarget = Some(4096L)),
    // round 17: clipped-sum DP mean — exact scaled-BIGINT clip, the
    // dqDpLaplaceCounts REAL-cast-first noise contract at b=C/ε and 1/ε
    "privacy_dp_clipped_mean" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
        |    CAST(coalesce(sum(least(greatest(
        |      CAST(floor(value * 100.0) AS BIGINT), 0), 5000)), 0)
        |      AS BIGINT) AS clipped_sum_scaled
        |  FROM events GROUP BY 1
        |), u AS (
        |  SELECT g.*,
        |    CAST(CAST('0x' || substr(md5(event_type || ':dpsum'), 1, 15)
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS us,
        |    CAST(CAST('0x' || substr(md5(event_type || ':dpcnt'), 1, 15)
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS uc
        |  FROM g
        |), nz AS (
        |  SELECT event_type, n_exact, clipped_sum_scaled,
        |    CAST(-100.0 * sign(us - 0.5)
        |      * ln(1.0 - 2.0 * abs(us - 0.5)) AS REAL) AS noise_sum,
        |    CAST(-2.0 * sign(uc - 0.5)
        |      * ln(1.0 - 2.0 * abs(uc - 0.5)) AS REAL) AS noise_cnt
        |  FROM u
        |), rel AS (
        |  SELECT *,
        |    CAST(CAST(clipped_sum_scaled AS DOUBLE) / 100.0
        |      + CAST(noise_sum AS DOUBLE) AS REAL) AS dp_sum,
        |    CAST(greatest(CAST(n_exact AS DOUBLE)
        |      + CAST(noise_cnt AS DOUBLE), 1.0) AS REAL) AS dp_count
        |  FROM nz
        |)
        |SELECT event_type, n_exact, clipped_sum_scaled, noise_sum,
        |  noise_cnt, dp_sum, dp_count,
        |  CAST(CAST(dp_sum AS DOUBLE) / CAST(dp_count AS DOUBLE) AS REAL)
        |    AS dp_mean
        |FROM rel ORDER BY event_type""".stripMargin,
    // round 17: the ann_ivf_det_topk cell CTEs with the quantizer
    // trained on the CORPUS slice only; the delta batch joins the
    // standing cells and only the occupancy epilogue follows
    "ann_ivf_delta_assign" -> annIvfAssignOracleSql,
    // DPO pairs: chosen = (score DESC, id ASC) pick, rejected =
    // (score ASC, id DESC) pick — distinct docs whenever n_cands >= 2
    "pref_pair_margin" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
        |    doc_id // 4 AS group_id
        |  FROM documents
        |), r AS (
        |  SELECT group_id, doc_id, score,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY score DESC, doc_id) AS rc,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY score ASC, doc_id DESC) AS rr,
        |    count(*) OVER (PARTITION BY group_id) AS n_cands
        |  FROM d
        |)
        |SELECT c.group_id, CAST(c.n_cands AS BIGINT) AS n_cands,
        |  c.doc_id AS chosen_doc, c.score AS chosen_score,
        |  j.doc_id AS rejected_doc, j.score AS rejected_score,
        |  c.score - j.score AS margin
        |FROM r c JOIN r j ON c.group_id = j.group_id
        |WHERE c.rc = 1 AND j.rr = 1 AND c.n_cands >= 2
        |ORDER BY c.group_id""".stripMargin,
    // rank corr: doubled avg ranks -> exact Long moments; Kendall P/Q by
    // the O(n^2) pair join (the engine's inversion count must equal it)
    "eval_rank_corr" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS tok
        |    FROM documents) GROUP BY 1, 2
        |), xy AS (
        |  SELECT d.lang, tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM tf JOIN documents d USING (doc_id)
        |  GROUP BY d.lang, tf.doc_id
        |), rk AS (
        |  SELECT lang, x, y,
        |    CAST(2 * rank() OVER (PARTITION BY lang ORDER BY x)
        |      + count(*) OVER (PARTITION BY lang, x) - 1 AS BIGINT)
        |      AS r2x,
        |    CAST(2 * rank() OVER (PARTITION BY lang ORDER BY y)
        |      + count(*) OVER (PARTITION BY lang, y) - 1 AS BIGINT)
        |      AS r2y
        |  FROM xy
        |), sp AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) * sum(r2x * r2y) - sum(r2x) * sum(r2y)
        |      AS BIGINT) AS s_num,
        |    CAST(count(*) * sum(r2x * r2x) - sum(r2x) * sum(r2x)
        |      AS BIGINT) AS s_d1,
        |    CAST(count(*) * sum(r2y * r2y) - sum(r2y) * sum(r2y)
        |      AS BIGINT) AS s_d2
        |  FROM rk GROUP BY lang
        |), pq AS (
        |  SELECT a.lang,
        |    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |      OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p,
        |    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |      OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS q
        |  FROM xy a JOIN xy b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY a.lang
        |), tx AS (
        |  SELECT lang, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT lang, x, count(*) AS t FROM xy GROUP BY 1, 2)
        |  GROUP BY lang
        |), ty AS (
        |  SELECT lang, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT lang, y, count(*) AS t FROM xy GROUP BY 1, 2)
        |  GROUP BY lang
        |), txy AS (
        |  SELECT lang, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS nxy
        |  FROM (SELECT lang, x, y, count(*) AS t FROM xy GROUP BY 1, 2, 3)
        |  GROUP BY lang
        |)
        |SELECT s.lang, s.n, s.s_num, s.s_d1, s.s_d2,
        |  CAST(CASE WHEN s.s_d1 > 0 AND s.s_d2 > 0
        |    THEN CAST(s.s_num AS DOUBLE)
        |      / sqrt(CAST(s.s_d1 AS DOUBLE) * CAST(s.s_d2 AS DOUBLE))
        |    END AS REAL) AS spearman_rho,
        |  CAST(s.n * (s.n - 1) / 2 AS BIGINT) AS n0, tx.n1, ty.n2,
        |  txy.nxy,
        |  coalesce(pq.p, 0) AS n_concordant,
        |  coalesce(pq.q, 0) AS n_discordant,
        |  CAST(CASE WHEN s.n * (s.n - 1) / 2 - tx.n1 > 0
        |      AND s.n * (s.n - 1) / 2 - ty.n2 > 0
        |    THEN CAST(coalesce(pq.p, 0) - coalesce(pq.q, 0) AS DOUBLE)
        |      / sqrt(CAST(s.n * (s.n - 1) / 2 - tx.n1 AS DOUBLE)
        |        * CAST(s.n * (s.n - 1) / 2 - ty.n2 AS DOUBLE))
        |    END AS REAL) AS tau_b
        |FROM sp s
        |LEFT JOIN pq USING (lang) JOIN tx USING (lang)
        |JOIN ty USING (lang) JOIN txy USING (lang)
        |ORDER BY lang""".stripMargin,
    "sql_lead_time_percentiles" ->
      """WITH fs AS (
        |  SELECT l_orderkey, min(l_shipdate) AS first_ship
        |  FROM lineitem GROUP BY l_orderkey
        |), lt AS (
        |  SELECT o.o_orderpriority,
        |    datediff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(fs.first_ship AS DATE)) AS lead_days
        |  FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(quantile_cont(lead_days, 0.5) AS REAL) AS p50,
        |  CAST(quantile_cont(lead_days, 0.9) AS REAL) AS p90,
        |  CAST(quantile_cont(lead_days, 0.99) AS REAL) AS p99,
        |  CAST(max(lead_days) AS BIGINT) AS max_days
        |FROM lt GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |    AS BIGINT) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, tok,
        |    CAST(coalesce(sum(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_excl
        |  FROM d
        |)
        |SELECT cum_excl // 256 AS bin_id, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY bin_id""".stripMargin,
    "train_test_split" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |    AS BIGINT) AS tok,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':split'), 1, 15) AS BIGINT) % 10 < 8 THEN 'train'
        |      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':split'), 1, 15) AS BIGINT) % 10 = 8 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM documents
        |)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(CAST(sum(tok) AS DOUBLE) / count(*) AS REAL) AS avg_tokens
        |FROM d GROUP BY split ORDER BY split""".stripMargin,
    "class_weights" ->
      """WITH cc AS (
        |  SELECT event_type, count(*) AS n_class FROM events
        |  GROUP BY event_type
        |), tot AS (
        |  SELECT count(*) AS n_total,
        |    count(DISTINCT event_type) AS n_classes
        |  FROM events
        |)
        |SELECT e.event_id, e.event_type,
        |  CAST(tot.n_total AS DOUBLE) / (tot.n_classes * cc.n_class)
        |    AS weight
        |FROM events e JOIN cc ON cc.event_type = e.event_type, tot
        |WHERE e.event_id < 100
        |ORDER BY e.event_id""".stripMargin,
    "window_cumulative_distinct" ->
      """WITH marked AS (
        |  SELECT event_id, event_type, ts,
        |    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
        |      ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS ff
        |  FROM events
        |), cum AS (
        |  SELECT event_id, event_type,
        |    CAST(sum(ff) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_distinct_users
        |  FROM marked
        |)
        |SELECT event_id, event_type, cum_distinct_users FROM cum
        |WHERE event_id < 3000 ORDER BY event_id""".stripMargin,
    "eval_confusion" ->
      """WITH types AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT)
        |      AS idx
        |  FROM (SELECT DISTINCT event_type FROM events)
        |), kk AS (SELECT count(*) AS k FROM types),
        |labeled AS (
        |  SELECT e.event_id, e.event_type AS label, t.idx, kk.k,
        |    CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
        |      || ':pred'), 1, 15) AS BIGINT) AS h
        |  FROM events e JOIN types t ON t.event_type = e.event_type, kk
        |), preds AS (
        |  SELECT event_id, label,
        |    CASE WHEN h % 20 < 15 THEN idx
        |      ELSE (idx + 1 + (h % 20 - 15) % (k - 1)) % k END AS pidx
        |  FROM labeled
        |), named AS (
        |  SELECT p.label, t2.event_type AS pred
        |  FROM preds p JOIN types t2 ON t2.idx = p.pidx
        |), cells AS (
        |  SELECT label, pred, count(*) AS n FROM named GROUP BY 1, 2
        |)
        |SELECT label, pred, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY label) AS row_frac
        |FROM cells ORDER BY label, pred""".stripMargin,
    "sample_topk_per_group" ->
      """WITH h AS (
        |  SELECT event_type, event_id,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':smp'),
        |      1, 15) AS BIGINT) AS hv
        |  FROM events
        |), ranked AS (
        |  SELECT event_type, event_id, CAST(row_number() OVER (
        |    PARTITION BY event_type ORDER BY hv, event_id) AS INT) AS rn
        |  FROM h
        |)
        |SELECT event_type, rn, event_id FROM ranked
        |WHERE rn <= 20 ORDER BY event_type, rn""".stripMargin,
    "text_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents WHERE doc_id < 200
        |), terms AS (
        |  SELECT DISTINCT doc_id, unnest(t) AS term FROM toks
        |), idx AS (
        |  SELECT term, count(*) AS df,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |      AS postings
        |  FROM terms GROUP BY term
        |)
        |SELECT term, df, postings FROM idx
        |WHERE df BETWEEN 3 AND 150
        |ORDER BY term""".stripMargin,
    "feature_binning" ->
      """WITH bs AS (
        |  SELECT quantile_cont(value,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS b
        |  FROM events
        |)
        |SELECT e.event_id, e.value,
        |  CAST(len(list_filter(bs.b, x -> e.value > x)) + 1 AS INT) AS bin
        |FROM events e, bs
        |WHERE e.event_id < 2000
        |ORDER BY e.event_id""".stripMargin,
    // one exact integer numerator/denominator, ONE double division —
    // same assembly order as the Spark side
    "feature_target_encode" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000000.0) AS BIGINT) AS v6
        |  FROM events
        |), g AS (
        |  SELECT event_type, CAST(sum(v6) AS BIGINT) AS sg,
        |    CAST(count(*) AS BIGINT) AS ng
        |  FROM e GROUP BY event_type
        |), t AS (
        |  SELECT CAST(sum(v6) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n FROM e
        |)
        |SELECT e.event_id, e.event_type,
        |  CAST(CAST(g.sg - e.v6 AS HUGEINT) * t.n
        |      + 10 * CAST(t.s AS HUGEINT) AS DOUBLE)
        |    / CAST(CAST(g.ng - 1 + 10 AS HUGEINT) * t.n AS DOUBLE)
        |    / 1000000.0 AS loo_te
        |FROM e JOIN g ON e.event_type = g.event_type CROSS JOIN t
        |WHERE e.event_id < 2000
        |ORDER BY e.event_id""".stripMargin,
    "skew_profile" ->
      """WITH kc AS (SELECT user_id, count(*) AS n FROM events
        |  GROUP BY user_id)
        |SELECT CAST(length(bin(n)) - 1 AS INT) AS band,
        |  count(*) AS n_keys, min(n) AS min_count, max(n) AS max_count,
        |  CAST(sum(n) AS BIGINT) AS n_rows
        |FROM kc GROUP BY 1 ORDER BY band""".stripMargin,
    "quality_topk_per_lang" ->
      """WITH q AS (
        |  SELECT doc_id, lang,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
        |      + least(((CAST(length(text) AS DOUBLE)
        |          - CAST(length(text) - length(replace(text, ' ', ''))
        |            AS DOUBLE))
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0,
        |        1.0) * 0.3
        |      + (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |          AS DOUBLE)
        |         / CAST(length(text) AS DOUBLE)) * 0.2 AS score
        |  FROM documents
        |), ranked AS (
        |  SELECT lang, doc_id, score, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY score DESC, doc_id) AS INT) AS rnk
        |  FROM q
        |)
        |SELECT lang, rnk, doc_id, score FROM ranked
        |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    "corpus_mix_budget" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS BIGINT) AS tok,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
        |      + least(((CAST(length(text) AS DOUBLE)
        |          - CAST(length(text) - length(replace(text, ' ', ''))
        |            AS DOUBLE))
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0,
        |        1.0) * 0.3
        |      + (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |          AS DOUBLE)
        |         / CAST(length(text) AS DOUBLE)) * 0.2 AS score
        |  FROM documents
        |), ranked AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER w AS INT) AS rnk,
        |    CAST(sum(tok) OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tok
        |  FROM q WINDOW w AS (PARTITION BY source ORDER BY score DESC, doc_id)
        |)
        |SELECT source, doc_id, rnk, cum_tok FROM ranked
        |WHERE cum_tok <= 1000 ORDER BY source, rnk""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ftoks AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
        |grams AS (
        |  SELECT doc_id, concat_ws(' ', t[i], t[i+1]) AS g
        |  FROM ftoks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  count(DISTINCT g) AS n_distinct,
        |  1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS repetition
        |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_top_ngram_cov" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS n_chars,
        |    string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ftoks AS (SELECT * FROM toks WHERE len(t) >= 2),
        |grams AS (
        |  SELECT doc_id, n_chars, concat_ws(' ', t[i], t[i+1]) AS g
        |  FROM ftoks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |), counts AS (
        |  SELECT doc_id, n_chars, g, count(*) AS cnt
        |  FROM grams GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT doc_id, n_chars, g, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rk
        |  FROM counts
        |)
        |SELECT doc_id, g AS top_gram, cnt AS top_count, n_bigrams,
        |  CAST(cnt AS DOUBLE) / n_bigrams AS top_frac,
        |  CAST(cnt AS DOUBLE) * len(g) / n_chars AS char_cov
        |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "multimodal_image_resize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    4 + CAST('0x' || substr(md5(doc_id || ':iw'), 1, 15) AS BIGINT)
        |      % 13 AS w,
        |    4 + CAST('0x' || substr(md5(doc_id || ':ih'), 1, 15) AS BIGINT)
        |      % 9 AS h,
        |    CAST('0x' || substr(md5(doc_id || ':r'), 1, 15) AS BIGINT)
        |      % 256 AS r0,
        |    CAST('0x' || substr(md5(doc_id || ':g'), 1, 15) AS BIGINT)
        |      % 256 AS g0,
        |    CAST('0x' || substr(md5(doc_id || ':b'), 1, 15) AS BIGINT)
        |      % 256 AS b0,
        |    CAST('0x' || substr(md5(doc_id || ':wr'), 1, 15) AS BIGINT)
        |      % 256 AS wr,
        |    CAST('0x' || substr(md5(doc_id || ':wg'), 1, 15) AS BIGINT)
        |      % 256 AS wg,
        |    CAST('0x' || substr(md5(doc_id || ':wb'), 1, 15) AS BIGINT)
        |      % 256 AS wb
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, w, h, r0, g0, b0, wr, wg, wb,
        |    greatest(1, CAST(floor(w * least(1.0,
        |      least(8.0 / w, 8.0 / h))) AS BIGINT)) AS ow,
        |    greatest(1, CAST(floor(h * least(1.0,
        |      least(8.0 / w, 8.0 / h))) AS BIGINT)) AS oh
        |  FROM p
        |)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
        |  CAST(r0 * (ow * oh - 1) + wr AS BIGINT) AS sum_r,
        |  CAST(g0 * (ow * oh - 1) + wg AS BIGINT) AS sum_g,
        |  CAST(b0 * (ow * oh - 1) + wb AS BIGINT) AS sum_b
        |FROM d ORDER BY doc_id""".stripMargin,
    "multimodal_image_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    4 + CAST('0x' || substr(md5(doc_id || ':iw'), 1, 15) AS BIGINT)
        |      % 13 AS w,
        |    4 + CAST('0x' || substr(md5(doc_id || ':ih'), 1, 15) AS BIGINT)
        |      % 9 AS h,
        |    CAST('0x' || substr(md5(doc_id || ':r'), 1, 15) AS BIGINT)
        |      % 256 AS r0,
        |    CAST('0x' || substr(md5(doc_id || ':g'), 1, 15) AS BIGINT)
        |      % 256 AS g0,
        |    CAST('0x' || substr(md5(doc_id || ':b'), 1, 15) AS BIGINT)
        |      % 256 AS b0,
        |    CAST('0x' || substr(md5(doc_id || ':wr'), 1, 15) AS BIGINT)
        |      % 256 AS wr,
        |    CAST('0x' || substr(md5(doc_id || ':wg'), 1, 15) AS BIGINT)
        |      % 256 AS wg,
        |    CAST('0x' || substr(md5(doc_id || ':wb'), 1, 15) AS BIGINT)
        |      % 256 AS wb
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(r0 * (w * h - 1) + wr AS BIGINT) AS sum_r,
        |  CAST(g0 * (w * h - 1) + wg AS BIGINT) AS sum_g,
        |  CAST(b0 * (w * h - 1) + wb AS BIGINT) AS sum_b
        |FROM p ORDER BY doc_id""".stripMargin,
    // extrema/mean of the base+watermark fixtures: min/max closed-form,
    // mean = one exact division of the integer sum by w*h
    "multimodal_image_channel_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    4 + CAST('0x' || substr(md5(doc_id || ':iw'), 1, 15) AS BIGINT)
        |      % 13 AS w,
        |    4 + CAST('0x' || substr(md5(doc_id || ':ih'), 1, 15) AS BIGINT)
        |      % 9 AS h,
        |    CAST('0x' || substr(md5(doc_id || ':r'), 1, 15) AS BIGINT)
        |      % 256 AS r0,
        |    CAST('0x' || substr(md5(doc_id || ':g'), 1, 15) AS BIGINT)
        |      % 256 AS g0,
        |    CAST('0x' || substr(md5(doc_id || ':b'), 1, 15) AS BIGINT)
        |      % 256 AS b0,
        |    CAST('0x' || substr(md5(doc_id || ':wr'), 1, 15) AS BIGINT)
        |      % 256 AS wr,
        |    CAST('0x' || substr(md5(doc_id || ':wg'), 1, 15) AS BIGINT)
        |      % 256 AS wg,
        |    CAST('0x' || substr(md5(doc_id || ':wb'), 1, 15) AS BIGINT)
        |      % 256 AS wb
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(least(r0, wr) AS INTEGER) AS min_r,
        |  CAST(greatest(r0, wr) AS INTEGER) AS max_r,
        |  CAST(least(g0, wg) AS INTEGER) AS min_g,
        |  CAST(greatest(g0, wg) AS INTEGER) AS max_g,
        |  CAST(least(b0, wb) AS INTEGER) AS min_b,
        |  CAST(greatest(b0, wb) AS INTEGER) AS max_b,
        |  CAST(CAST(r0 * (w * h - 1) + wr AS DOUBLE)
        |    / CAST(w * h AS DOUBLE) AS REAL) AS mean_r,
        |  CAST(CAST(g0 * (w * h - 1) + wg AS DOUBLE)
        |    / CAST(w * h AS DOUBLE) AS REAL) AS mean_g,
        |  CAST(CAST(b0 * (w * h - 1) + wb AS DOUBLE)
        |    / CAST(w * h AS DOUBLE) AS REAL) AS mean_b
        |FROM p ORDER BY doc_id""".stripMargin,
    "multimodal_batch_decode" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS payload_bytes,
        |  CAST(CAST(CAST('0x' || substr(md5(text || ':0'), 1, 15) AS BIGINT)
        |    % 1000000 AS DOUBLE) / 1000000.0 AS REAL) AS f0,
        |  CAST(CAST(CAST('0x' || substr(md5(text || ':3'), 1, 15) AS BIGINT)
        |    % 1000000 AS DOUBLE) / 1000000.0 AS REAL) AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'planted near duplicate copy ' || text AS text
        |  FROM documents WHERE doc_id < 10
        |), toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM base
        |), th AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        |  FROM toks, LATERAL (SELECT unnest(t) AS tok) u
        |), votes AS (
        |  SELECT doc_id, bb.b AS b,
        |    sum(CASE WHEN ((h >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, LATERAL (SELECT unnest(generate_series(0, 59)) AS b) bb
        |  GROUP BY doc_id, bb.b
        |), fp AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN v > 0
        |    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id
        |), chunks AS (
        |  SELECT doc_id, simhash, cc.c AS chunk_idx,
        |    (simhash >> (cc.c * 15)) & 32767 AS chunk
        |  FROM fp, LATERAL (SELECT unnest(generate_series(0, 3)) AS c) cc
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM chunks a JOIN chunks b
        |  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
        |  AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_minhash_lsh" -> minhashOracleSql(numBands = 8, rowsPerBand = 4,
      threshold = "0.5"),
    "dedup_ngram_jaccard" -> minhashOracleSql(numBands = 16, rowsPerBand = 2,
      threshold = "0.3"),
    "dedup_groups" -> dedupGroupsOracleSql,
    "text_scrub" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@example.com or https://ex.org/d/'
        |        || CAST(doc_id AS VARCHAR)
        |      ELSE text END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text2, 'https?://[^ ]+')) AS INT)
        |    AS n_urls
        |FROM base ORDER BY doc_id""".stripMargin,
    // round 3 additions
    "join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(o_totalprice) AS REAL) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey AS t_key, o_totalprice AS t_price,
        |    o_orderstatus AS t_status
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |), source AS (
        |  SELECT o_orderkey AS s_key,
        |    CAST(o_totalprice AS DOUBLE) * 1.1 AS s_price,
        |    'U' AS s_status
        |  FROM orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT coalesce(s_key, t_key) AS o_orderkey,
        |  CAST(coalesce(s_price, CAST(t_price AS DOUBLE)) AS REAL)
        |    AS o_totalprice,
        |  coalesce(s_status, t_status) AS o_orderstatus,
        |  CASE WHEN s_key IS NOT NULL AND t_key IS NOT NULL THEN 'updated'
        |       WHEN s_key IS NOT NULL THEN 'inserted'
        |       ELSE 'kept' END AS merge_action
        |FROM target FULL OUTER JOIN source ON t_key = s_key
        |ORDER BY o_orderkey""".stripMargin,
    "window_distribution" ->
      """SELECT l_orderkey, l_linenumber,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(3) OVER w AS INT) AS tile,
        |  nth_value(l_quantity, 2) OVER wf AS second_qty,
        |  last_value(l_quantity) OVER wf AS last_qty,
        |  l_partkey, l_suppkey
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity),
        |  wf AS (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "sample_stratified" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE CASE
        |  WHEN event_type = 'click' THEN
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 8 = 0
        |  WHEN event_type = 'view' THEN
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4 = 0
        |  ELSE TRUE END
        |ORDER BY event_id""".stripMargin,
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE ${minhashPairsCtes(8, 4, "0.5")},
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS a, doc_a AS b FROM pairs
         |), nodes AS (
         |  SELECT DISTINCT a FROM edges
         |), reach(a, b) AS (
         |  SELECT a, a FROM nodes
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |), labels AS (
         |  SELECT a AS doc_id, min(b) AS group_id FROM reach GROUP BY a
         |), sizes AS (
         |  SELECT group_id, count(*) AS sz FROM labels GROUP BY group_id
         |)
         |SELECT sz AS group_size, count(*) AS n_groups
         |FROM sizes GROUP BY sz ORDER BY group_size""".stripMargin,
    "f_fuzzy_match" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_size, p_name,
        |    CAST(floor(strlen(p_name) / 8) AS BIGINT) AS band
        |  FROM part
        |), l AS (
        |  SELECT p.*, unnest([band, band + 1]) AS probe FROM p
        |), cand AS (
        |  SELECT DISTINCT
        |    least(l.p_partkey, r.p_partkey) AS part_a,
        |    greatest(l.p_partkey, r.p_partkey) AS part_b
        |  FROM l JOIN p r
        |    ON l.p_brand = r.p_brand AND l.p_size = r.p_size
        |    AND l.probe = r.band AND l.p_partkey <> r.p_partkey
        |)
        |SELECT c.part_a, c.part_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM cand c
        |JOIN p a ON a.p_partkey = c.part_a
        |JOIN p b ON b.p_partkey = c.part_b
        |WHERE levenshtein(a.p_name, b.p_name) <= 18
        |ORDER BY part_a, part_b""".stripMargin,
    "window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT ev.user_id, min(ts) AS t2 FROM ev JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1
        |         AND ts <= t1 + INTERVAL 30 MINUTE GROUP BY ev.user_id),
        |t3 AS (SELECT ev.user_id, min(ts) AS t3 FROM ev JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2
        |         AND ts <= t2 + INTERVAL 30 MINUTE GROUP BY ev.user_id)
        |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1
        |            ELSE 0 END AS INT) AS funnel_stage,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN t1 USING (user_id)
        |LEFT JOIN t2 USING (user_id)
        |LEFT JOIN t3 USING (user_id)
        |GROUP BY 1 ORDER BY funnel_stage""".stripMargin,
    "window_fill_forward" ->
      """SELECT event_id, user_id,
        |  CASE WHEN value > 50 THEN value END AS good,
        |  last_value(CASE WHEN value > 50 THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "text_feature_hashing" ->
      """SELECT doc_id,
        |  CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 256
        |    AS feature_idx,
        |  count(*) AS n
        |FROM (SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents WHERE doc_id < 100)
        |GROUP BY 1, 2 ORDER BY doc_id, feature_idx""".stripMargin,
    "ann_ivf_det_topk" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), seeds AS (
        |  SELECT seed_vid, seed_e,
        |    CAST(row_number() OVER (ORDER BY h, seed_vid) - 1 AS BIGINT)
        |      AS cell
        |  FROM (
        |    SELECT vec_id AS seed_vid, e AS seed_e,
        |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) AS h
        |    FROM emb ORDER BY h, vec_id LIMIT 16)
        |), assigned AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT emb.vec_id, emb.e, s.cell,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY list_dot_product(emb.e, s.seed_e) DESC, s.cell)
        |        AS rn
        |    FROM emb, seeds s) WHERE rn = 1
        |), qe AS (SELECT e AS q FROM emb WHERE vec_id = 0
        |), probes AS (
        |  SELECT cell FROM seeds, qe
        |  ORDER BY list_dot_product(seed_e, q) DESC, cell LIMIT 4
        |)
        |SELECT a.vec_id, a.cell, list_dot_product(a.e, qe.q) AS cosine
        |FROM assigned a JOIN probes USING (cell), qe
        |WHERE a.vec_id <> 0
        |ORDER BY cosine DESC, a.vec_id LIMIT 10""".stripMargin,
    "ann_lsh_topk" ->
      """WITH planes AS (
        |  SELECT pp.p AS p,
        |    list(CAST(CAST('0x' || substr(md5(pp.p || ':' || ii.i), 1, 15)
        |        AS BIGINT) AS DOUBLE) / 576460752303423488.0 - 1.0
        |      ORDER BY ii.i) AS plane
        |  FROM (SELECT unnest(generate_series(0, 7)) AS p) pp,
        |       (SELECT unnest(generate_series(0, 63)) AS i) ii
        |  GROUP BY pp.p
        |), emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), buck AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN list_dot_product(e, plane) >= 0
        |      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM emb, planes GROUP BY vec_id
        |), qb AS (
        |  SELECT b.bucket AS qbucket, emb.e AS qe
        |  FROM buck b JOIN emb ON emb.vec_id = b.vec_id WHERE b.vec_id = 0
        |)
        |SELECT b.vec_id, b.bucket,
        |  list_dot_product(emb.e, qb.qe) AS cosine
        |FROM buck b, qb, emb
        |WHERE emb.vec_id = b.vec_id AND b.vec_id <> 0
        |  AND bit_count(xor(b.bucket, qb.qbucket)) <= 1
        |ORDER BY cosine DESC, b.vec_id LIMIT 10""".stripMargin,
    "text_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), vocab AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok
        |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(tf.tf * (ln(cnt) - ln(total))) / sum(tf.tf) AS REAL)
        |    AS avg_logprob
        |FROM tf JOIN vocab USING (tok), tot
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct,
        |  CAST(ln(CAST(sum(tf) AS DOUBLE))
        |    - sum(tf * ln(tf)) / sum(tf) AS REAL) AS entropy
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "cooccur_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), uni AS (
        |  SELECT tok, count(*) AS cu
        |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
        |), tu AS (SELECT CAST(sum(cu) AS BIGINT) AS t_total FROM uni),
        |bi AS (
        |  SELECT t[i] AS a, t[i + 1] AS b, count(*) AS n_ab
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2 GROUP BY 1, 2
        |), tb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS b_total FROM bi),
        |top AS (SELECT * FROM bi ORDER BY n_ab DESC, a, b LIMIT 50)
        |SELECT top.a, top.b, top.n_ab, ua.cu AS n_a, ub.cu AS n_b,
        |  CAST(ln(CAST(top.n_ab AS DOUBLE) / b_total)
        |    - ln(CAST(ua.cu AS DOUBLE) / t_total)
        |    - ln(CAST(ub.cu AS DOUBLE) / t_total) AS REAL) AS pmi
        |FROM top JOIN uni ua ON ua.tok = top.a
        |JOIN uni ub ON ub.tok = top.b, tu, tb
        |ORDER BY n_ab DESC, a, b""".stripMargin,
    "embedding_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS pos, count(*) AS n,
        |  CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS centroid
        |FROM embeddings,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) s
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    "ann_centroid_classify" ->
      """WITH cent AS (
        |  SELECT label AS c_label, CAST(i - 1 AS INT) AS pos,
        |    CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS c
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) s
        |  GROUP BY 1, 2
        |), cvec AS (
        |  SELECT c_label, list(CAST(c AS DOUBLE) ORDER BY pos) AS cv
        |  FROM cent GROUP BY c_label
        |), scored AS (
        |  SELECT e.vec_id, e.label, c.c_label,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) AS cosine
        |  FROM embeddings e, cvec c
        |), ranked AS (
        |  SELECT vec_id, label, c_label, cosine,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cosine DESC, c_label) AS rn
        |  FROM scored
        |)
        |SELECT vec_id, label, c_label AS pred_label,
        |  CAST(cosine AS REAL) AS best_cosine,
        |  label = c_label AS correct
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "graph_triangles" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), deg AS MATERIALIZED (
        |  SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges)
        |  GROUP BY x
        |), oriented AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
        |    CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t,
        |    CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg
        |      END AS dt
        |  FROM edges e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |), wedges AS MATERIALIZED (
        |  SELECT p.t AS u2, q.t AS v2
        |  FROM oriented p JOIN oriented q ON p.s = q.s
        |  WHERE (p.dt, p.t) < (q.dt, q.t)
        |), tri AS MATERIALIZED (
        |  SELECT count(*) AS n_triangles FROM wedges w
        |  WHERE EXISTS (SELECT 1 FROM oriented o
        |    WHERE o.s = w.u2 AND o.t = w.v2)
        |)
        |SELECT (SELECT count(*) FROM deg) AS n_vertices,
        |  (SELECT count(*) FROM edges) AS n_edges,
        |  (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  n_triangles,
        |  CAST(3.0 * n_triangles / (SELECT sum((deg * (deg - 1)) // 2)
        |    FROM deg) AS REAL) AS clustering_coeff
        |FROM tri""".stripMargin,
    "anomaly_zscore" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mean, stddev_samp(value) AS sd
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.event_type, e.value,
        |  CAST((e.value - s.mean) / s.sd AS REAL) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE abs(CAST((e.value - s.mean) / s.sd AS REAL)) > 3.0
        |ORDER BY event_id""".stripMargin,
    // exact-integer KS: D's numerator max|cumA*nB - cumB*nA| is a BIGINT,
    // divided once — identical doubles either engine. The oracle uses the
    // plain global-window ECDF; the Spark side's bucketed two-level
    // prefix sum is an execution-shape choice with the same result.
    "drift_ks_value" ->
      """WITH s AS (
        |  SELECT value,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS isa
        |  FROM events
        |), pv AS (
        |  SELECT value, sum(isa) AS ca, sum(1 - isa) AS cb
        |  FROM s GROUP BY value
        |), c AS (
        |  SELECT value,
        |    sum(ca) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM pv
        |), nn AS (
        |  SELECT CAST(sum(isa) AS BIGINT) AS na,
        |    CAST(sum(1 - isa) AS BIGINT) AS nb FROM s
        |)
        |SELECT nn.na AS n_a, nn.nb AS n_b,
        |  CAST(max(abs(cuma * nn.nb - cumb * nn.na)) AS BIGINT) AS ks_num,
        |  CAST(CAST(max(abs(cuma * nn.nb - cumb * nn.na)) AS BIGINT)
        |      AS DOUBLE)
        |    / CAST(nn.na * nn.nb AS DOUBLE) AS ks_d
        |FROM c CROSS JOIN nn GROUP BY nn.na, nn.nb""".stripMargin,
    // per-bin PSI: bin edges replay from SQL min/max — (vmax-vmin)/10.0
    // rounds to the same double the Spark side precomputes; proportions
    // are exact-integer divisions; ln is libm on identical doubles with
    // the REAL cast absorbing the last ulp
    "drift_psi_value" -> psiTermsOracleSql,
    "sample_prop_value" ->
      """WITH mx AS (SELECT max(value) AS vmax FROM events)
        |SELECT event_id, value FROM events, mx
        |WHERE CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |    || ':w'), 1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0
        |  < value / vmax
        |ORDER BY event_id""".stripMargin,
    "window_rolling_median" ->
      """SELECT event_id, user_id, value,
        |  CAST(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS REAL)
        |    AS rolling_median
        |FROM events WHERE user_id < 40 ORDER BY event_id""".stripMargin,
    "window_ewma" ->
      """WITH f AS (
        |  SELECT event_id, user_id, value,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS frame
        |  FROM events WHERE user_id < 40
        |)
        |SELECT event_id, user_id, value,
        |  CAST((SELECT sum(frame[i] * pow(0.5, len(frame) - i))
        |      FROM (SELECT unnest(generate_series(1, len(frame))) AS i))
        |    / (2.0 - pow(0.5, len(frame) - 1)) AS REAL) AS ewma
        |FROM f ORDER BY event_id""".stripMargin,
    "dedup_containment" -> containmentOracleSql,
    "graph_pagerank" -> pagerankOracleSql(3),
    "graph_pagerank_deep" -> pagerankOracleSql(6),
    "agg_mode_per_key" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events
        |  WHERE user_id < 200 GROUP BY 1, 2
        |), r AS (
        |  SELECT user_id, event_type, n,
        |    count(*) OVER (PARTITION BY user_id) AS n_types,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT user_id, n_types, event_type AS mode_type, n AS mode_n
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ts_resample_interp" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t, value, event_id FROM events
        |  WHERE user_id < 5
        |), spans AS (
        |  SELECT user_id, min(t) AS lo, max(t) AS hi FROM ev GROUP BY user_id
        |), g AS (
        |  SELECT user_id, unnest(generate_series(
        |    ((lo + 3599999999) // 3600000000) * 3600000000,
        |    (hi // 3600000000) * 3600000000, 3600000000)) AS t
        |  FROM spans
        |), u AS (
        |  SELECT user_id, t, value, 0 AS is_grid, event_id FROM ev
        |  UNION ALL
        |  SELECT user_id, t, NULL AS value, 1 AS is_grid,
        |    NULL AS event_id FROM g
        |), w AS (
        |  SELECT user_id, t, is_grid,
        |    last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
        |      OVER wp AS pt,
        |    last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
        |      OVER wp AS pv,
        |    first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
        |      OVER wn AS nt,
        |    first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
        |      OVER wn AS nv
        |  FROM u
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, t AS grid_us,
        |  CAST(CASE WHEN nt = pt THEN pv
        |    ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / (nt - pt)) END
        |    AS REAL) AS value_interp
        |FROM w WHERE is_grid = 1 ORDER BY user_id, grid_us""".stripMargin,
    "agg_sketch_merge" ->
      """WITH pn AS (
        |  SELECT n.n_regionkey, c.c_nationkey,
        |    count(DISTINCT c.c_custkey) AS n_exact
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY 1, 2
        |)
        |SELECT r.r_name, count(*) AS n_nations,
        |  CAST(sum(n_exact) AS BIGINT) AS n_customers,
        |  TRUE AS est_within_8pct
        |FROM pn JOIN region r ON r.r_regionkey = pn.n_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    // round 6
    "dedup_keep_best" -> dedupKeepBestOracleSql,
    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ftoks AS (
        |  SELECT doc_id, t FROM toks WHERE len(t) >= 3
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |    CAST('0x' || substr(md5(concat_ws(' ', t[i], t[i+1], t[i+2])),
        |      1, 15) AS BIGINT) AS gh
        |  FROM ftoks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
        |), fs AS (
        |  SELECT gh, min(doc_id) AS first_doc FROM grams GROUP BY gh
        |)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*) AS REAL) AS novelty
        |FROM grams JOIN fs USING (gh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "emb_quantize_int8" ->
      """WITH a AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, amax,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / amax)) AS INT))
        |      AS qv
        |  FROM a WHERE amax > 0
        |)
        |SELECT vec_id, CAST(127.0 / amax AS REAL) AS scale,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(list_transform(qv, x -> abs(x)), 'sum')
        |    AS BIGINT) AS q_l1
        |FROM q ORDER BY vec_id""".stripMargin,
    "heavy_hitters" ->
      """WITH c AS (
        |  SELECT lang, source, count(*) AS n FROM documents
        |  GROUP BY 1, 2
        |), t AS (SELECT count(*) AS total FROM documents)
        |SELECT lang, source, n,
        |  CAST(CAST(n AS DOUBLE) / total AS REAL) AS share
        |FROM c, t WHERE n > total * 0.02
        |ORDER BY n DESC, lang, source""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
        |), coh AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |), act AS (SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "anomaly_mad" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value FROM events
        |), med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM ev GROUP BY 1
        |), mad AS (
        |  SELECT e.event_type, med,
        |    quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM ev e JOIN med USING (event_type) GROUP BY e.event_type, med
        |)
        |SELECT event_id, e.event_type, value,
        |  CAST((value - med) / (1.4826 * mad) AS REAL) AS robust_z
        |FROM ev e JOIN mad USING (event_type)
        |WHERE abs(CAST((value - med) / (1.4826 * mad) AS REAL)) > 3.5
        |ORDER BY event_id""".stripMargin,
    "agg_decimal_exact" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DECIMAL(28,2)) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_net
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sql_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_s4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey < 5
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2
        |ORDER BY revenue_s4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "ts_interval_overlap" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
        |), l AS (
        |  SELECT user_id, t, event_id,
        |    lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt
        |  FROM ev
        |), f AS (
        |  SELECT user_id, t, event_id,
        |    CASE WHEN pt IS NULL OR t - pt > 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM l
        |), sid AS (
        |  SELECT user_id, t,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f
        |), sess AS (
        |  SELECT user_id, sid, min(t) AS s, max(t) AS e
        |  FROM sid GROUP BY user_id, sid
        |), spans AS (SELECT min(t) AS lo, max(t) AS hi FROM ev),
        |w AS (
        |  SELECT unnest(generate_series(lo // 21600000000,
        |    hi // 21600000000)) AS wb
        |  FROM spans
        |), sb AS (
        |  SELECT user_id, s, e,
        |    unnest(generate_series(s // 21600000000,
        |      e // 21600000000)) AS wb
        |  FROM sess
        |)
        |SELECT wb * 21600000000 AS w_start, count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users
        |FROM sb JOIN w USING (wb)
        |WHERE s < (wb + 1) * 21600000000 AND e >= wb * 21600000000
        |GROUP BY wb ORDER BY w_start""".stripMargin,
    "zorder_cluster" -> zorderOracleSql,
    "eval_pr_auc" ->
      """WITH s AS (
        |  SELECT vec_id, least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0
        |      + 0.5, 0.0), 0.9999) AS score,
        |    CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), r AS (
        |  SELECT y,
        |    CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS DOUBLE)
        |      AS k,
        |    CAST(sum(y) OVER (ORDER BY score DESC, vec_id
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS tp
        |  FROM s
        |)
        |SELECT CAST(count(*) AS BIGINT) AS npos,
        |  CAST(sum(tp / k) / CAST(count(*) AS DOUBLE) AS REAL)
        |    AS avg_precision
        |FROM r WHERE y = 1""".stripMargin,
    "graph_common_neighbors" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), deg AS (
        |  SELECT u AS x, count(*) AS deg FROM sym GROUP BY u
        |), cohort AS (
        |  SELECT u, v FROM sym WHERE v % 16 = 0
        |), cn AS (
        |  SELECT a.v AS u2, b.v AS v2, CAST(count(*) AS BIGINT) AS cn
        |  FROM cohort a JOIN cohort b ON a.u = b.u AND a.v < b.v
        |  GROUP BY a.v, b.v
        |), na AS (
        |  SELECT * FROM cn WHERE NOT EXISTS (
        |    SELECT 1 FROM edges e WHERE e.u = cn.u2 AND e.v = cn.v2)
        |)
        |SELECT u2 AS u, v2 AS v, cn,
        |  CAST(CAST(cn AS DOUBLE)
        |    / CAST(du.deg + dv.deg - cn AS DOUBLE) AS REAL) AS jaccard
        |FROM na JOIN deg du ON du.x = na.u2 JOIN deg dv ON dv.x = na.v2
        |ORDER BY cn DESC, u, v LIMIT 20""".stripMargin,
    "graph_assortativity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), deg AS (
        |  SELECT u AS x, count(*) AS deg FROM sym GROUP BY u
        |), j AS (
        |  SELECT CAST(du.deg AS DOUBLE) AS x, CAST(dv.deg AS DOUBLE) AS y
        |  FROM sym JOIN deg du ON du.x = sym.u JOIN deg dv ON dv.x = sym.v
        |), a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM j
        |)
        |SELECT CAST(n AS BIGINT) AS n_dir_edges,
        |  CAST((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS REAL)
        |    AS assortativity
        |FROM a""".stripMargin,
    "attribution_last_touch" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events
        |)
        |SELECT coalesce(touch, 'direct') AS touch_type,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(value) AS REAL) AS attributed_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "agg_linreg_by_group" ->
      """WITH a AS (
        |  SELECT l_returnflag AS rf, CAST(count(*) AS DOUBLE) AS n,
        |    sum(CAST(l_quantity AS DOUBLE)) AS sx,
        |    sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
        |    sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE)) AS sxy,
        |    sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE)) AS sxx,
        |    sum(CAST(l_extendedprice AS DOUBLE)
        |      * CAST(l_extendedprice AS DOUBLE)) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT rf, CAST(n AS BIGINT) AS n,
        |  CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS REAL) AS slope,
        |  CAST((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |    AS REAL) AS intercept,
        |  CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS REAL) AS r2
        |FROM a ORDER BY rf""".stripMargin,
    "emb_matryoshka_recall" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
        |  WHERE vec_id < 20
        |), p AS (
        |  SELECT q.qid, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(q.qe AS DOUBLE[])) AS dot_full,
        |    list_dot_product(CAST(e.embedding[1:8] AS DOUBLE[]),
        |      CAST(q.qe[1:8] AS DOUBLE[])) AS dot_8,
        |    list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]),
        |      CAST(q.qe[1:16] AS DOUBLE[])) AS dot_16,
        |    list_dot_product(CAST(e.embedding[1:32] AS DOUBLE[]),
        |      CAST(q.qe[1:32] AS DOUBLE[])) AS dot_32
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
        |), r AS (
        |  SELECT row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_full DESC, vec_id) AS r_full,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_8 DESC, vec_id) AS r_8,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_16 DESC, vec_id) AS r_16,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_32 DESC, vec_id) AS r_32
        |  FROM p
        |), h AS (
        |  SELECT CAST(sum(CASE WHEN r_full <= 10 THEN 1 END) AS DOUBLE)
        |      AS truth,
        |    CAST(sum(CASE WHEN r_full <= 10 AND r_8 <= 10 THEN 1 END)
        |      AS DOUBLE) AS h8,
        |    CAST(sum(CASE WHEN r_full <= 10 AND r_16 <= 10 THEN 1 END)
        |      AS DOUBLE) AS h16,
        |    CAST(sum(CASE WHEN r_full <= 10 AND r_32 <= 10 THEN 1 END)
        |      AS DOUBLE) AS h32
        |  FROM r
        |)
        |SELECT CAST(8 AS INTEGER) AS dim, h8 / truth AS recall_at_k FROM h
        |UNION ALL
        |SELECT CAST(16 AS INTEGER), h16 / truth FROM h
        |UNION ALL
        |SELECT CAST(32 AS INTEGER), h32 / truth FROM h
        |ORDER BY dim""".stripMargin,
    "join_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE event_type IN ('purchase', 'error')
        |), n AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_err,
        |    first_value(CASE WHEN event_type = 'error' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_err
        |  FROM e
        |), p AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_err IS NULL AND next_err IS NULL
        |        THEN NULL
        |      WHEN next_err IS NULL THEN prev_err
        |      WHEN prev_err IS NULL THEN next_err
        |      WHEN epoch_us(ts) - epoch_us(prev_err)
        |          <= epoch_us(next_err) - epoch_us(ts) THEN prev_err
        |      ELSE next_err END AS nearest_err_ts
        |  FROM n WHERE event_type = 'purchase'
        |)
        |SELECT user_id, event_id, ts, nearest_err_ts,
        |  CAST(epoch_us(nearest_err_ts) - epoch_us(ts) AS BIGINT)
        |    AS delta_us
        |FROM p ORDER BY user_id, event_id""".stripMargin,
    "stats_zone_map" ->
      """WITH z1 AS (
        |  SELECT l_orderkey % 16 AS zone_id, count(*) AS n_rows,
        |    min(l_shipdate) AS zmin, max(l_shipdate) AS zmax
        |  FROM lineitem GROUP BY 1
        |), z2 AS (
        |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS zone_id,
        |    count(*) AS n_rows,
        |    min(l_shipdate) AS zmin, max(l_shipdate) AS zmax
        |  FROM lineitem GROUP BY 1
        |), r1 AS (
        |  SELECT 'by_orderkey_hash' AS layout,
        |    CAST(count(*) AS BIGINT) AS n_zones,
        |    CAST(sum(CASE WHEN zmax >= TIMESTAMP '1996-01-01'
        |      AND zmin <= TIMESTAMP '1996-06-30' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS zones_scanned,
        |    CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |    CAST(sum(CASE WHEN zmax >= TIMESTAMP '1996-01-01'
        |      AND zmin <= TIMESTAMP '1996-06-30' THEN n_rows ELSE 0 END)
        |      AS BIGINT) AS rows_scanned
        |  FROM z1
        |), r2 AS (
        |  SELECT 'by_shipdate_month' AS layout,
        |    CAST(count(*) AS BIGINT) AS n_zones,
        |    CAST(sum(CASE WHEN zmax >= TIMESTAMP '1996-01-01'
        |      AND zmin <= TIMESTAMP '1996-06-30' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS zones_scanned,
        |    CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |    CAST(sum(CASE WHEN zmax >= TIMESTAMP '1996-01-01'
        |      AND zmin <= TIMESTAMP '1996-06-30' THEN n_rows ELSE 0 END)
        |      AS BIGINT) AS rows_scanned
        |  FROM z2
        |), u AS (
        |  SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |)
        |SELECT layout, n_zones, zones_scanned, rows_total, rows_scanned,
        |  CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE)
        |    AS scan_frac
        |FROM u ORDER BY layout""".stripMargin,
    "text_gopher_rules" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), g AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(max(tf) AS BIGINT) AS max_tf,
        |    CAST(sum(tf * length(tok)) AS BIGINT) AS sum_len,
        |    CAST(sum(CASE WHEN tok IN ('the', 'a') THEN tf ELSE 0 END)
        |      AS BIGINT) AS stop_tf
        |  FROM tf GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS mean_word_len,
        |  CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS top_tok_frac,
        |  CAST(stop_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_frac,
        |  (n_tokens >= 20
        |    AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 3.0
        |    AND CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 10.0
        |    AND CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.15
        |    AND CAST(stop_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.02)
        |    AS pass_gopher
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_zipf_slope" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), totals AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok
        |), ranked AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok)
        |      AS DOUBLE)) AS x,
        |    ln(CAST(freq AS DOUBLE)) AS y,
        |    row_number() OVER (ORDER BY freq DESC, tok) AS rank
        |  FROM totals QUALIFY rank <= 100
        |), a AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM ranked
        |)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS REAL)
        |    AS zipf_slope,
        |  CAST((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |    AS REAL) AS zipf_intercept
        |FROM a""".stripMargin,
    "text_llr_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(
        |    generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), bg AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
        |  FROM grams GROUP BY w1, w2
        |), ca AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS ca FROM grams GROUP BY w1
        |), cb AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS cb FROM grams GROUP BY w2
        |), nt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ntot FROM grams
        |), kk AS (
        |  SELECT bg.w1, bg.w2, bg.k11 AS n_pair,
        |    CAST(bg.k11 AS DOUBLE) AS a11,
        |    CAST(ca.ca AS DOUBLE) - CAST(bg.k11 AS DOUBLE) AS a12,
        |    CAST(cb.cb AS DOUBLE) - CAST(bg.k11 AS DOUBLE) AS a21,
        |    CAST(nt.ntot AS DOUBLE) - CAST(ca.ca AS DOUBLE)
        |      - CAST(cb.cb AS DOUBLE) + CAST(bg.k11 AS DOUBLE) AS a22,
        |    CAST(nt.ntot AS DOUBLE) AS nn
        |  FROM bg JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN nt
        |)
        |SELECT w1, w2, n_pair,
        |  CAST(2.0 * (
        |    (CASE WHEN a11 > 0.0 THEN a11 * ln(a11) ELSE 0.0 END)
        |    + (CASE WHEN a12 > 0.0 THEN a12 * ln(a12) ELSE 0.0 END)
        |    + (CASE WHEN a21 > 0.0 THEN a21 * ln(a21) ELSE 0.0 END)
        |    + (CASE WHEN a22 > 0.0 THEN a22 * ln(a22) ELSE 0.0 END)
        |    + (CASE WHEN nn > 0.0 THEN nn * ln(nn) ELSE 0.0 END)
        |    - (CASE WHEN a11 + a12 > 0.0
        |        THEN (a11 + a12) * ln(a11 + a12) ELSE 0.0 END)
        |    - (CASE WHEN a21 + a22 > 0.0
        |        THEN (a21 + a22) * ln(a21 + a22) ELSE 0.0 END)
        |    - (CASE WHEN a11 + a21 > 0.0
        |        THEN (a11 + a21) * ln(a11 + a21) ELSE 0.0 END)
        |    - (CASE WHEN a12 + a22 > 0.0
        |        THEN (a12 + a22) * ln(a12 + a22) ELSE 0.0 END)) AS REAL)
        |    AS llr
        |FROM kk ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin,
    // NOTE: duckdb 1.0's list_reduce mutates the struct accumulator
    // field-by-field (the 'b' expression would see the UPDATED 'l'), so
    // the oracle replays the fold as a recursive CTE, where the
    // recursive term reads the previous ROW's columns — standard SQL
    // semantics, bit-identical to Spark's aggregate() fold
    "ts_holt_forecast" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id
        |), r AS (
        |  SELECT user_id, vals, 1 AS i, CAST(vals[1] AS DOUBLE) AS l,
        |    CAST(0.0 AS DOUBLE) AS b
        |  FROM o
        |  UNION ALL
        |  SELECT user_id, vals, i + 1,
        |    0.5 * vals[i + 1] + 0.5 * (l + b),
        |    0.3 * ((0.5 * vals[i + 1] + 0.5 * (l + b)) - l) + 0.7 * b
        |  FROM r WHERE i < len(vals)
        |)
        |SELECT user_id, CAST(i AS BIGINT) AS n_events,
        |  CAST(l AS REAL) AS level, CAST(b AS REAL) AS trend,
        |  CAST(l + 3.0 * b AS REAL) AS forecast_3
        |FROM r WHERE i = len(vals) ORDER BY user_id""".stripMargin,
    "retrieval_ndcg" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        |  FROM embeddings WHERE vec_id < 20
        |), p AS (
        |  SELECT q.qid, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(q.qe AS DOUBLE[])) AS dot,
        |    CASE WHEN e.label = q.qlabel THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS rel
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
        |), r AS (
        |  SELECT qid, rel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot DESC, vec_id) AS r,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY rel DESC, vec_id) AS ri
        |  FROM p
        |), g AS (
        |  SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel,
        |    sum(CASE WHEN r <= 10 THEN rel
        |      / (ln(CAST(r + 1 AS DOUBLE)) / ln(CAST(2.0 AS DOUBLE)))
        |      ELSE CAST(0.0 AS DOUBLE) END) AS dcg,
        |    sum(CASE WHEN ri <= 10 THEN rel
        |      / (ln(CAST(ri + 1 AS DOUBLE)) / ln(CAST(2.0 AS DOUBLE)))
        |      ELSE CAST(0.0 AS DOUBLE) END) AS idcg
        |  FROM r GROUP BY qid
        |)
        |SELECT qid, n_rel, CAST(dcg AS REAL) AS dcg,
        |  CAST(idcg AS REAL) AS idcg, CAST(dcg / idcg AS REAL) AS ndcg
        |FROM g ORDER BY qid""".stripMargin,
    "emb_power_iteration" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
        |), v0 AS (
        |  SELECT list_transform(generate_series(1, 64),
        |    i -> CAST(0.125 AS DOUBLE)) AS v
        |), s1 AS (
        |  SELECT x.x, list_dot_product(x.x, v0.v) AS score
        |  FROM x CROSS JOIN v0
        |), c1 AS (
        |  SELECT j, sum(x[j] * score) AS s
        |  FROM s1, LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |  GROUP BY j
        |), u1 AS (
        |  SELECT list(s ORDER BY j) AS u FROM c1
        |), v1 AS (
        |  SELECT list_transform(u,
        |    e -> e / sqrt(list_dot_product(u, u))) AS v FROM u1
        |), s2 AS (
        |  SELECT x.x, list_dot_product(x.x, v1.v) AS score
        |  FROM x CROSS JOIN v1
        |), c2 AS (
        |  SELECT j, sum(x[j] * score) AS s
        |  FROM s2, LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |  GROUP BY j
        |), u2 AS (
        |  SELECT list(s ORDER BY j) AS u FROM c2
        |), v2 AS (
        |  SELECT list_transform(u,
        |    e -> e / sqrt(list_dot_product(u, u))) AS v FROM u2
        |), s3 AS (
        |  SELECT x.x, list_dot_product(x.x, v2.v) AS score
        |  FROM x CROSS JOIN v2
        |), c3 AS (
        |  SELECT j, sum(x[j] * score) AS s
        |  FROM s3, LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |  GROUP BY j
        |), u3 AS (
        |  SELECT list(s ORDER BY j) AS u FROM c3
        |), v3 AS (
        |  SELECT list_transform(u,
        |    e -> e / sqrt(list_dot_product(u, u))) AS v FROM u3
        |), fs AS (
        |  SELECT list_dot_product(x.x, v3.v) AS score FROM x CROSS JOIN v3
        |), lam AS (
        |  SELECT sum(score * score) AS lam FROM fs
        |)
        |SELECT j AS dim, CAST(v[j] AS REAL) AS loading,
        |  CAST(lam AS REAL) AS eigenvalue
        |FROM v3 CROSS JOIN lam,
        |  LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |ORDER BY dim""".stripMargin,
    // flags stringified with an 'all' rollup sentinel: NULL grouping
    // keys round-trip differently through parquet/pandas booleans
    "quality_ablation_report" ->
      """WITH c AS (
        |  SELECT n_chars >= 200 AS so, lang = 'en' AS le,
        |    contains(text, ' the ') AS hs,
        |    CAST(GROUPING(n_chars >= 200, lang = 'en',
        |      contains(text, ' the ')) AS INT) AS gid,
        |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_total
        |  FROM documents
        |  GROUP BY CUBE(so, le, hs)
        |)
        |SELECT coalesce(CAST(so AS VARCHAR), 'all') AS size_ok,
        |  coalesce(CAST(le AS VARCHAR), 'all') AS lang_en,
        |  coalesce(CAST(hs AS VARCHAR), 'all') AS has_stop,
        |  gid, n_docs, chars_total
        |FROM c ORDER BY gid, size_ok, lang_en, has_stop""".stripMargin,
    // frame lists + explicit sequential folds on BOTH sides (the ewma
    // discipline): the closed-form slope cancels catastrophically at
    // epoch-hour magnitudes, so only bit-identical op order agrees
    "window_rolling_slope" ->
      """WITH f AS (
        |  SELECT event_id, user_id,
        |    list(CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fx,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fy
        |  FROM events WHERE user_id < 40
        |), s AS (
        |  SELECT event_id, user_id, CAST(len(fx) AS DOUBLE) AS n,
        |    (SELECT sum(fx[i]) FROM (SELECT unnest(
        |      generate_series(1, len(fx))) AS i)) AS sx,
        |    (SELECT sum(fy[i]) FROM (SELECT unnest(
        |      generate_series(1, len(fy))) AS i)) AS sy,
        |    (SELECT sum(fx[i] * fy[i]) FROM (SELECT unnest(
        |      generate_series(1, len(fx))) AS i)) AS sxy,
        |    (SELECT sum(fx[i] * fx[i]) FROM (SELECT unnest(
        |      generate_series(1, len(fx))) AS i)) AS sxx
        |  FROM f
        |)
        |SELECT event_id, user_id, CAST(n AS BIGINT) AS n_frame,
        |  CAST(CASE WHEN n * sxx - sx * sx <> 0.0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
        |    ELSE NULL END AS REAL) AS slope_per_hour
        |FROM s ORDER BY event_id""".stripMargin,
    "eval_brier_decomp" ->
      """WITH s AS (
        |  SELECT least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5,
        |      0.0), 0.9999) AS p,
        |    CASE WHEN label % 2 = 1 THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM embeddings
        |), sb AS (
        |  SELECT p, y, CAST(least(floor(p * 10.0), 9.0) AS INT) AS bin
        |  FROM s
        |), tot AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(y) AS sumy,
        |    sum((p - y) * (p - y)) AS sumsq
        |  FROM sb
        |), b AS (
        |  SELECT bin, CAST(count(*) AS DOUBLE) AS nb, sum(p) AS sp,
        |    sum(y) AS sy
        |  FROM sb GROUP BY bin
        |), d AS (
        |  SELECT n, sumsq, sumy,
        |    sum(nb * (sp / nb - sy / nb) * (sp / nb - sy / nb)) AS rel,
        |    sum(nb * (sy / nb - sumy / n) * (sy / nb - sumy / n)) AS res
        |  FROM b CROSS JOIN tot GROUP BY n, sumsq, sumy
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sumsq / n AS REAL) AS brier,
        |  CAST(rel / n AS REAL) AS reliability,
        |  CAST(res / n AS REAL) AS resolution,
        |  CAST((sumy / n) * (1.0 - sumy / n) AS REAL) AS uncertainty
        |FROM d""".stripMargin,
    "text_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens
        |  FROM tf GROUP BY doc_id
        |), tot AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS freq FROM tf GROUP BY tok
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, row_number() OVER (ORDER BY freq DESC, tok) AS rank
        |    FROM tot) WHERE rank <= 256
        |), oov AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_oov FROM tf
        |  WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY doc_id
        |)
        |SELECT dl.doc_id, dl.n_tokens, coalesce(oov.n_oov, 0) AS n_oov,
        |  CAST(coalesce(oov.n_oov, 0) AS DOUBLE)
        |    / CAST(dl.n_tokens AS DOUBLE) AS oov_rate
        |FROM dl LEFT JOIN oov USING (doc_id) ORDER BY doc_id""".stripMargin,
    "privacy_k_anonymity" ->
      """SELECT c_nationkey AS nation,
        |  CAST(year(o_orderdate) AS INT) AS order_year,
        |  count(*) AS class_size, count(*) < 10 AS at_risk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY nation, order_year""".stripMargin,
    "window_drawdown" ->
      """SELECT event_id, user_id, CAST(value AS REAL) AS value,
        |  CAST(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS REAL) AS peak,
        |  CAST(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) - value AS REAL) AS drawdown
        |FROM events WHERE user_id < 100 ORDER BY event_id""".stripMargin,
    "agg_pareto_concentration" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey
        |), r AS (
        |  SELECT l_partkey, cents,
        |    row_number() OVER (ORDER BY cents DESC, l_partkey) AS rk,
        |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM pp
        |), t AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS t, count(*) AS p FROM pp
        |)
        |SELECT CAST(t.p AS BIGINT) AS n_parts,
        |  CAST(sum(CASE WHEN (cum - cents) * 10 < t.t * 8
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_parts_80pct,
        |  CAST(sum(CASE WHEN rk <= ceil(CAST(t.p AS DOUBLE) / 10.0)
        |      THEN cents ELSE 0 END) AS DOUBLE) / CAST(t.t AS DOUBLE)
        |    AS top_decile_share
        |FROM r CROSS JOIN t GROUP BY t.t, t.p""".stripMargin,
    "join_asof_tolerance" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE event_type IN ('purchase', 'error')
        |), n AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_err
        |  FROM e
        |)
        |SELECT user_id, event_id, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(prev_err) <= 3600000000
        |    THEN prev_err END AS matched_err_ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(prev_err) <= 3600000000
        |    THEN CAST(epoch_us(ts) - epoch_us(prev_err) AS BIGINT) END
        |    AS gap_us
        |FROM n WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    "join_asof_forward" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE event_type IN ('purchase', 'error')
        |), n AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    first_value(CASE WHEN event_type = 'purchase' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_buy
        |  FROM e
        |)
        |SELECT user_id, event_id, ts,
        |  CASE WHEN epoch_us(next_buy) - epoch_us(ts) <= 3600000000
        |    THEN next_buy END AS matched_buy_ts,
        |  CASE WHEN epoch_us(next_buy) - epoch_us(ts) <= 3600000000
        |    THEN CAST(epoch_us(next_buy) - epoch_us(ts) AS BIGINT) END
        |    AS gap_us
        |FROM n WHERE event_type = 'error'
        |ORDER BY user_id, event_id""".stripMargin,
    "graph_degree_bands" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), d AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM d)
        |SELECT CAST(length(bin(deg)) - 1 AS INT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_vertices_band,
        |  CAST(min(deg) AS BIGINT) AS deg_min,
        |  CAST(max(deg) AS BIGINT) AS deg_max,
        |  CAST(count(*) AS DOUBLE) / CAST(n_vertices AS DOUBLE) AS share
        |FROM d, t GROUP BY 1, n_vertices ORDER BY band""".stripMargin,
    "text_keywords_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), nn AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.tok,
        |    t.tf * (ln((nn.n + 1.0) / (d.df + 1.0)) + 1.0) AS tfidf
        |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN nn
        |), r AS (
        |  SELECT doc_id, tok, tfidf, CAST(row_number() OVER (
        |      PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, tok, CAST(tfidf AS REAL) AS tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "stream_scd2_enrich" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, ts FROM events
        |  WHERE user_id < 20
        |), marked AS (
        |  SELECT *, lag(event_type) OVER w AS prev_type
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), versioned AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w2 AS INT) AS version_n,
        |    event_type AS attr, ts AS valid_from,
        |    lead(ts) OVER w2 AS valid_to
        |  FROM changes
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e.event_id, e.user_id, v.version_n, v.attr
        |FROM ev e JOIN versioned v
        |  ON v.user_id = e.user_id AND v.valid_from <= e.ts
        |  AND (v.valid_to IS NULL OR e.ts < v.valid_to)
        |ORDER BY e.event_id""".stripMargin,
    "ts_stl_decompose" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h,
        |    CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS v6
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT h, v6,
        |    CAST(sum(v6) OVER w AS BIGINT) AS t25_sum,
        |    count(*) OVER w AS t25_n
        |  FROM hourly
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
        |), d AS (
        |  SELECT *,
        |    CASE WHEN t25_n = 25 THEN 25 * v6 - t25_sum END AS detr25,
        |    CAST(h % 24 AS INT) AS hod
        |  FROM t
        |), s AS (
        |  SELECT hod, CAST(sum(detr25) AS BIGINT) AS s_sum,
        |    count(*) AS s_n
        |  FROM d WHERE detr25 IS NOT NULL GROUP BY hod
        |)
        |SELECT make_timestamp(h * 3600000000) AS hour_ts,
        |  CAST(CAST(v6 AS DOUBLE) / 1000000.0 AS REAL) AS value,
        |  CAST(CASE WHEN t25_n = 25
        |    THEN CAST(t25_sum AS DOUBLE) / 25000000.0 END AS REAL) AS trend,
        |  CAST(CASE WHEN d.detr25 IS NOT NULL
        |    THEN CAST(s_sum AS DOUBLE) / CAST(s_n * 25 AS DOUBLE)
        |      / 1000000.0 END AS REAL) AS seasonal,
        |  CAST(CASE WHEN d.detr25 IS NOT NULL
        |    THEN CAST(d.detr25 AS DOUBLE) / 25000000.0
        |      - CAST(s_sum AS DOUBLE) / CAST(s_n * 25 AS DOUBLE)
        |        / 1000000.0 END AS REAL) AS residual
        |FROM d LEFT JOIN s USING (hod)
        |ORDER BY hour_ts""".stripMargin,
    // the greedy debounce recurrence replayed as a recursive CTE: row n
    // joins row n−1's anchor — the sequential dependency made explicit;
    // shared with the streaming twin (drain == batch contract)
    "anomaly_alert_debounce" -> debounceRecurrenceSql,
    "stream_alert_debounce" -> debounceRecurrenceSql,
    "graph_hits" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), a1 AS (
        |  SELECT pk, CAST(count(*) AS BIGINT) AS a FROM li GROUP BY pk
        |), h1 AS (
        |  SELECT ok, CAST(sum(a) AS BIGINT) AS h
        |  FROM li JOIN a1 USING (pk) GROUP BY ok
        |), a2 AS (
        |  SELECT pk, CAST(sum(h) AS BIGINT) AS a
        |  FROM li JOIN h1 USING (ok) GROUP BY pk
        |), mx AS (SELECT max(a) AS amax FROM a2)
        |SELECT pk AS part_id, a AS auth,
        |  CAST(CAST(a AS DOUBLE) / CAST(amax AS DOUBLE) AS REAL) AS score
        |FROM a2, mx ORDER BY auth DESC, part_id LIMIT 50""".stripMargin,
    "agg_ttest_welch" ->
      """WITH g AS (
        |  SELECT
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1a,
        |    CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2a,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s1b,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000.0) AS BIGINT)
        |         * CAST(round(value * 1000.0) AS BIGINT) END) AS BIGINT)
        |      AS s2b
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT *, CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s1b AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM g
        |), v AS (
        |  SELECT *,
        |    ((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * m1)
        |      / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE) AS se1,
        |    ((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * m2)
        |      / CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE) AS se2
        |  FROM m
        |)
        |SELECT n1, n2,
        |  CAST(m1 / 1000.0 AS REAL) AS mean1,
        |  CAST(m2 / 1000.0 AS REAL) AS mean2,
        |  CAST((m1 - m2) / sqrt(se1 + se2) AS REAL) AS t_stat,
        |  CAST((se1 + se2) * (se1 + se2)
        |    / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
        |     + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS REAL) AS df
        |FROM v""".stripMargin,
    // the token bucket replayed as a recursive CTE: burst 2, one token
    // per 12 h, admission iff a full token is present at arrival
    "stream_rate_limit" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |), walk AS (
        |  SELECT user_id, event_id, us, rn, TRUE AS allowed,
        |    CAST(2 * 43200000000 - 43200000000 AS BIGINT) AS tok_after
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.us, e.rn,
        |    least(2 * 43200000000, w.tok_after + (e.us - w.us))
        |      >= 43200000000,
        |    CAST(CASE WHEN least(2 * 43200000000,
        |        w.tok_after + (e.us - w.us)) >= 43200000000
        |      THEN least(2 * 43200000000, w.tok_after + (e.us - w.us))
        |        - 43200000000
        |      ELSE least(2 * 43200000000, w.tok_after + (e.us - w.us))
        |      END AS BIGINT)
        |  FROM ev e JOIN walk w
        |    ON e.user_id = w.user_id AND e.rn = w.rn + 1
        |)
        |SELECT user_id, event_id, allowed FROM walk
        |ORDER BY user_id, event_id""".stripMargin,
    "multimodal_scene_cuts" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':fps'), 1, 15) AS BIGINT) % 2 = 0
        |      THEN CAST(24 AS BIGINT) ELSE CAST(30 AS BIGINT) END AS fps,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dur'),
        |      1, 15) AS BIGINT) % 30 + 5 AS duration_s
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, text, fps * duration_s AS n_frames,
        |    greatest(CAST(1 AS BIGINT),
        |      (fps * duration_s + 7) // 8) AS stride
        |  FROM m
        |), sel AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(CAST(0 AS BIGINT), n_frames - 1,
        |      stride)) AS frame_idx
        |  FROM f
        |), fp AS (
        |  SELECT doc_id, frame_idx,
        |    CAST('0x' || substr(md5(text || ':f'
        |      || CAST(frame_idx AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
        |      AS frame_fp
        |  FROM sel
        |), d AS (
        |  SELECT doc_id, frame_idx,
        |    abs(frame_fp - lag(frame_fp) OVER (PARTITION BY doc_id
        |      ORDER BY frame_idx)) AS delta
        |  FROM fp
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN delta > 400000 THEN 1 ELSE 0 END) + 1
        |    AS BIGINT) AS n_scenes,
        |  max(CASE WHEN delta > 400000 THEN frame_idx END)
        |    AS last_cut_frame
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ts_periodogram" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h,
        |    CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS v6
        |  FROM events GROUP BY 1
        |), hv AS (
        |  SELECT h, CAST(v6 AS DOUBLE) / 1000000.0 AS v FROM hourly
        |), p AS (
        |  SELECT h, v, unnest([6, 12, 24, 168]) AS period_h FROM hv
        |), g AS (
        |  SELECT period_h,
        |    sum(v * cos(2.0 * pi() * CAST(h AS DOUBLE)
        |      / CAST(period_h AS DOUBLE))) AS c,
        |    sum(v * sin(2.0 * pi() * CAST(h AS DOUBLE)
        |      / CAST(period_h AS DOUBLE))) AS s,
        |    CAST(count(*) AS BIGINT) AS n_hours
        |  FROM p GROUP BY period_h
        |)
        |SELECT period_h, n_hours,
        |  CAST((c * c + s * s) / CAST(n_hours AS DOUBLE) AS REAL) AS power
        |FROM g ORDER BY period_h""".stripMargin,
    "agg_skew_kurtosis" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CAST(CAST(round(value * 1000.0) AS BIGINT) AS HUGEINT) AS x
        |  FROM events
        |), g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS s1, sum(x * x) AS s2,
        |    sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
        |  FROM x GROUP BY event_type
        |), d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS p2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS p3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS p4
        |  FROM g
        |), c AS (
        |  SELECT event_type, n, m,
        |    p2 - m * m AS m2,
        |    p3 - 3.0 * m * p2 + 2.0 * m * m * m AS m3,
        |    p4 - 4.0 * m * p3 + 6.0 * m * m * p2
        |      - 3.0 * m * m * m * m AS m4
        |  FROM d
        |)
        |SELECT event_type, n,
        |  CAST(m / 1000.0 AS REAL) AS mean,
        |  CAST(m3 / sqrt(m2 * m2 * m2) AS REAL) AS skewness,
        |  CAST(m4 / (m2 * m2) - 3.0 AS REAL) AS kurtosis_excess
        |FROM c ORDER BY event_type""".stripMargin,
    "graph_local_clustering" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), deg AS (
        |  SELECT u AS x, count(*) AS deg FROM sym GROUP BY u
        |), nbrs AS (
        |  SELECT u, v FROM sym WHERE u % 128 = 0
        |), wedges AS (
        |  SELECT a.u AS x, a.v AS u2, b.v AS v2
        |  FROM nbrs a JOIN nbrs b ON a.u = b.u AND a.v < b.v
        |), closed AS (
        |  SELECT x, CAST(count(*) AS BIGINT) AS n_closed FROM wedges w
        |  WHERE EXISTS (SELECT 1 FROM edges e
        |    WHERE e.u = w.u2 AND e.v = w.v2)
        |  GROUP BY x
        |), alln AS (
        |  SELECT x, CAST(count(*) AS BIGINT) AS n_wedges
        |  FROM wedges GROUP BY x
        |)
        |SELECT alln.x AS vertex, CAST(deg.deg AS BIGINT) AS deg, n_wedges,
        |  coalesce(n_closed, 0) AS n_closed,
        |  CAST(coalesce(n_closed, 0) AS DOUBLE) / CAST(n_wedges AS DOUBLE)
        |    AS clustering_coeff
        |FROM alln LEFT JOIN closed USING (x)
        |JOIN deg ON deg.x = alln.x
        |ORDER BY vertex""".stripMargin,
    "ts_autocorr_lag1" ->
      """WITH l AS (
        |  SELECT user_id, value AS y,
        |    lag(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS x
        |  FROM events WHERE user_id < 100
        |), p AS (
        |  SELECT user_id, x, y FROM l WHERE x IS NOT NULL
        |), a AS (
        |  SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM p GROUP BY user_id
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
        |  CAST((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS REAL)
        |    AS autocorr_lag1
        |FROM a ORDER BY user_id""".stripMargin,
    "graph_copurchase_weights" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |)
        |SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS weight
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY a.pk, b.pk
        |ORDER BY weight DESC, u, v LIMIT 25""".stripMargin,
    "text_hapax_stats" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), tot AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok
        |), r AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
        |  FROM tot
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_vocab,
        |  CAST(sum(freq) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS hapax_ratio,
        |  CAST(sum(CASE WHEN rank <= 10 THEN freq ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(freq) AS DOUBLE) AS top10_mass
        |FROM r""".stripMargin,
    "join_dpp_pruned" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(value) AS REAL) AS sum_value
        |FROM events WHERE event_type IN ('click', 'view')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "eval_silhouette_centroid" ->
      """WITH x AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x
        |  FROM embeddings
        |), cs AS (
        |  SELECT label, j, sum(x[j]) AS s, CAST(count(*) AS DOUBLE) AS cn
        |  FROM x, LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |  GROUP BY label, j
        |), cent AS (
        |  SELECT label AS clabel, list(s / cn ORDER BY j) AS c FROM cs
        |  GROUP BY label
        |), d AS (
        |  SELECT x.vec_id, x.label, cent.clabel,
        |    sqrt(greatest(
        |      list_dot_product(x.x, x.x)
        |        - 2.0 * list_dot_product(x.x, cent.c)
        |        + list_dot_product(cent.c, cent.c), 0.0)) AS dist
        |  FROM x CROSS JOIN cent
        |), ab AS (
        |  SELECT vec_id, label,
        |    min(CASE WHEN label = clabel THEN dist END) AS a,
        |    min(CASE WHEN label <> clabel THEN dist END) AS b
        |  FROM d GROUP BY vec_id, label
        |)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(avg((b - a) / greatest(a, b)) AS REAL) AS mean_silhouette
        |FROM ab GROUP BY label ORDER BY label""".stripMargin,
    "emb_dim_stats" ->
      """WITH e AS (
        |  SELECT j AS dim, CAST(embedding[j] AS DOUBLE) AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, 64)) AS j) t
        |)
        |SELECT CAST(dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) / CAST(count(*) AS DOUBLE) AS REAL) AS mean,
        |  CAST(sum(v * v) / CAST(count(*) AS DOUBLE)
        |    - (sum(v) / CAST(count(*) AS DOUBLE))
        |      * (sum(v) / CAST(count(*) AS DOUBLE)) AS REAL) AS variance,
        |  CAST(min(v) AS REAL) AS vmin, CAST(max(v) AS REAL) AS vmax
        |FROM e GROUP BY dim ORDER BY dim""".stripMargin,
    // same recursive-CTE replay as ts_holt_forecast, with the error
    // accumulators carried beside the Holt state
    "ts_holt_backtest" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id
        |), f AS (
        |  SELECT user_id, vals FROM o WHERE len(vals) >= 2
        |), r AS (
        |  SELECT user_id, vals, 1 AS i, CAST(vals[1] AS DOUBLE) AS l,
        |    CAST(0.0 AS DOUBLE) AS b, CAST(vals[1] AS DOUBLE) AS prev,
        |    CAST(0.0 AS DOUBLE) AS errsum, CAST(0.0 AS DOUBLE) AS naivesum
        |  FROM f
        |  UNION ALL
        |  SELECT user_id, vals, i + 1,
        |    0.5 * vals[i + 1] + 0.5 * (l + b),
        |    0.3 * ((0.5 * vals[i + 1] + 0.5 * (l + b)) - l) + 0.7 * b,
        |    vals[i + 1],
        |    errsum + abs(vals[i + 1] - (l + b)),
        |    naivesum + abs(vals[i + 1] - prev)
        |  FROM r WHERE i < len(vals)
        |)
        |SELECT user_id, CAST(len(vals) - 1 AS BIGINT) AS n_forecasts,
        |  CAST(errsum / CAST(len(vals) - 1 AS DOUBLE) AS REAL)
        |    AS mae_holt,
        |  CAST(naivesum / CAST(len(vals) - 1 AS DOUBLE) AS REAL)
        |    AS mae_naive
        |FROM r WHERE i = len(vals) ORDER BY user_id""".stripMargin,
    "privacy_l_diversity" ->
      """SELECT c_nationkey AS nation,
        |  CAST(year(o_orderdate) AS INT) AS order_year,
        |  count(*) AS class_size,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_sensitive,
        |  count(DISTINCT o_orderpriority) < 3 AS below_l
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY nation, order_year""".stripMargin,
    "dq_freshness_lag" ->
      """WITH g AS (SELECT max(ts) AS gmax FROM events)
        |SELECT event_type, count(*) AS n_events, max(ts) AS newest,
        |  CAST((epoch_us((SELECT gmax FROM g)) - epoch_us(max(ts)))
        |    // 60000000 AS BIGINT) AS lag_minutes
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // LEFT OUTER stream-stream join: the inner matches plus one
    // (click, NULL) row per click the FINAL watermark proved
    // unmatchable. Watermark = min of the two streams' (ms-floored)
    // max event times − 1h (multiple-watermark min policy); a click's
    // null emits when its 10-minute window closes strictly before it
    "stream_stream_left_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT date_trunc('milliseconds',
        |    least(max(CASE WHEN event_type = 'click' THEN ts END),
        |      max(CASE WHEN event_type = 'purchase' THEN ts END)))
        |    - INTERVAL 1 HOUR AS wm
        |  FROM events
        |), m AS (
        |  SELECT c.click_id, p.purchase_id, c.user_id
        |  FROM c JOIN p ON c.user_id = p.user_id
        |    AND p.purchase_ts >= c.click_ts
        |    AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
        |), u AS (
        |  SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
        |    c.user_id
        |  FROM c, w
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |    WHERE p.user_id = c.user_id
        |      AND p.purchase_ts >= c.click_ts
        |      AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE)
        |    AND c.click_ts + INTERVAL 10 MINUTE < w.wm
        |)
        |SELECT * FROM m UNION ALL SELECT * FROM u
        |ORDER BY click_id, purchase_id""".stripMargin,
    // chained stateful aggs: only hours the FINAL watermark finalized
    // flow through level 2 and emit
    "stream_two_level_agg" ->
      """WITH w AS (
        |  SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events
        |), l1 AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT h AS window_start, CAST(count(*) AS BIGINT) AS n_types,
        |  max(n) AS max_n, CAST(sum(n) AS BIGINT) AS n_total
        |FROM l1, w WHERE h + INTERVAL 1 HOUR < wm
        |GROUP BY h ORDER BY window_start""".stripMargin,
    "emb_hubness_stats" ->
      """WITH p AS (
        |  SELECT q.vec_id AS qid, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(q.embedding AS DOUBLE[])) AS dot
        |  FROM embeddings e CROSS JOIN embeddings q
        |  WHERE e.vec_id <> q.vec_id
        |), r AS (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot DESC, vec_id) AS r
        |  FROM p
        |), indeg AS (
        |  SELECT vec_id, CAST(count(*) AS BIGINT) AS d FROM r
        |  WHERE r <= 5 GROUP BY vec_id
        |)
        |SELECT coalesce(indeg.d, 0) AS in_degree,
        |  CAST(count(*) AS BIGINT) AS n_vectors
        |FROM embeddings e LEFT JOIN indeg USING (vec_id)
        |GROUP BY 1 ORDER BY in_degree""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT n_regionkey,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers_exact,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers_bitmap,
        |  TRUE AS bitmap_is_exact
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "agg_entropy_by_key" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT user_id, CAST(sum(n) AS BIGINT) AS ntot,
        |    CAST(count(*) AS BIGINT) AS n_types
        |  FROM c GROUP BY user_id
        |)
        |SELECT c.user_id, t.n_types,
        |  CAST(sum(-((CAST(c.n AS DOUBLE) / CAST(t.ntot AS DOUBLE))
        |    * ln(CAST(c.n AS DOUBLE) / CAST(t.ntot AS DOUBLE)))) AS REAL)
        |    AS entropy_nats
        |FROM c JOIN t USING (user_id)
        |GROUP BY c.user_id, t.n_types ORDER BY user_id""".stripMargin,
    "text_js_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        |  FROM documents
        |), bysrc AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2
        |), st AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ct FROM bysrc
        |  GROUP BY source
        |), corpus AS (
        |  SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM bysrc GROUP BY tok
        |), gt AS (
        |  SELECT CAST(sum(g) AS BIGINT) AS gt FROM corpus
        |), j AS (
        |  SELECT b.source,
        |    CAST(b.c AS DOUBLE) / CAST(st.ct AS DOUBLE) AS p,
        |    CAST(co.g AS DOUBLE) / CAST(gt.gt AS DOUBLE) AS q
        |  FROM bysrc b JOIN st USING (source) JOIN corpus co USING (tok)
        |  CROSS JOIN gt
        |), s AS (
        |  SELECT source,
        |    sum(0.5 * p * ln(2.0 * p / (p + q))) AS pterm,
        |    sum(0.5 * q * ln(2.0 * q / (p + q))) AS qterm,
        |    sum(q) AS qcov
        |  FROM j GROUP BY source
        |)
        |SELECT source,
        |  CAST(pterm + qterm + 0.5 * (1.0 - qcov) * ln(2.0) AS REAL)
        |    AS js_divergence
        |FROM s ORDER BY source""".stripMargin,
    "agg_gini_cents" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey
        |), r AS (
        |  SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents, l_partkey) AS BIGINT)
        |      AS i
        |  FROM pp
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |  (2.0 * CAST(sum(i * cents) AS DOUBLE))
        |    / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |  - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
        |    AS gini
        |FROM r""".stripMargin,
    "dedup_prefix_groups" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), p AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(array_to_string(t[1:5], ' ')), 1, 15)
        |      AS BIGINT) AS pfx
        |  FROM toks WHERE len(t) >= 5
        |)
        |SELECT pfx, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY pfx HAVING count(*) > 1 ORDER BY pfx""".stripMargin,
    "multimodal_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':fps'), 1, 15) AS BIGINT) % 2 = 0
        |      THEN CAST(24 AS BIGINT) ELSE CAST(30 AS BIGINT) END AS fps,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dur'),
        |      1, 15) AS BIGINT) % 30 + 5 AS duration_s
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, text, fps * duration_s AS n_frames,
        |    greatest(CAST(1 AS BIGINT),
        |      (fps * duration_s + 7) // 8) AS stride
        |  FROM m
        |), sel AS (
        |  SELECT doc_id, text, n_frames,
        |    unnest(generate_series(CAST(0 AS BIGINT), n_frames - 1,
        |      stride)) AS frame_idx
        |  FROM f
        |)
        |SELECT doc_id, n_frames, frame_idx,
        |  CAST('0x' || substr(md5(text || ':f'
        |    || CAST(frame_idx AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
        |    AS frame_fp
        |FROM sel ORDER BY doc_id, frame_idx""".stripMargin,
    "ann_filtered_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  list_dot_product(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(qe AS DOUBLE[]) FROM q)) AS cosine
        |FROM embeddings WHERE vec_id <> 0 AND label % 2 = 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "eval_retrieval_metrics" ->
      """WITH qs AS (
        |  SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        |  FROM embeddings WHERE vec_id < 20
        |), scored AS (
        |  SELECT qid, qlabel, e.vec_id, e.label,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(qe AS DOUBLE[])) AS cos
        |  FROM embeddings e JOIN qs ON e.vec_id <> qid
        |), ranked AS (
        |  SELECT qid, qlabel, label,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored
        |), pq AS (
        |  SELECT qid,
        |    sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS hits,
        |    min(CASE WHEN label = qlabel THEN rn END) AS first_hit
        |  FROM ranked WHERE rn <= 10 GROUP BY qid
        |)
        |SELECT count(*) AS n_queries,
        |  CAST(avg(CAST(hits AS DOUBLE) / 10) AS REAL) AS precision_at_k,
        |  CAST(avg(coalesce(1.0 / first_hit, 0.0)) AS REAL) AS mrr
        |FROM pq""".stripMargin,
    "ann_jl_topk" ->
      """WITH planes AS (
        |  SELECT jj.j AS pj,
        |    list(CAST(CAST('0x' || substr(
        |        md5('jl:' || jj.j || ':' || ii.i), 1, 15)
        |        AS BIGINT) AS DOUBLE) / 576460752303423488.0 - 1.0
        |      ORDER BY ii.i) AS plane
        |  FROM (SELECT unnest(generate_series(0, 15)) AS j) jj,
        |       (SELECT unnest(generate_series(0, 63)) AS i) ii
        |  GROUP BY jj.j
        |), emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), qp AS (
        |  SELECT list(list_dot_product(q.e, pl.plane) ORDER BY pl.pj)
        |    AS pq
        |  FROM (SELECT e FROM emb WHERE vec_id = 0) q, planes pl
        |), proj AS (
        |  SELECT emb.vec_id,
        |    list(list_dot_product(emb.e, pl.plane) ORDER BY pl.pj) AS pe
        |  FROM emb, planes pl WHERE emb.vec_id <> 0
        |  GROUP BY emb.vec_id
        |), cand AS (
        |  SELECT vec_id FROM proj, qp
        |  ORDER BY list_dot_product(pe, pq) DESC, vec_id LIMIT 80
        |)
        |SELECT c.vec_id,
        |  list_dot_product(e.e,
        |    (SELECT e FROM emb WHERE vec_id = 0)) AS cosine
        |FROM cand c JOIN emb e USING (vec_id)
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "emb_jl_recall" ->
      """WITH planes AS (
        |  SELECT jj.j AS pj,
        |    list(CAST(CAST('0x' || substr(
        |        md5('jl:' || jj.j || ':' || ii.i), 1, 15)
        |        AS BIGINT) AS DOUBLE) / 576460752303423488.0 - 1.0
        |      ORDER BY ii.i) AS plane
        |  FROM (SELECT unnest(generate_series(0, 15)) AS j) jj,
        |       (SELECT unnest(generate_series(0, 63)) AS i) ii
        |  GROUP BY jj.j
        |), emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), proj AS (
        |  SELECT vec_id,
        |    list(list_dot_product(e, plane) ORDER BY pj) AS pe
        |  FROM emb, planes GROUP BY vec_id
        |), fullv AS (
        |  SELECT emb.vec_id, emb.e, proj.pe
        |  FROM emb JOIN proj USING (vec_id)
        |), scored AS (
        |  SELECT q.vec_id AS qid, x.vec_id,
        |    list_dot_product(x.e, q.e) AS cf,
        |    list_dot_product(x.pe, q.pe) AS cp
        |  FROM fullv x JOIN fullv q
        |    ON q.vec_id < 20 AND x.vec_id <> q.vec_id
        |), ranked AS (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cf DESC, vec_id) AS rf,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cp DESC, vec_id) AS rp
        |  FROM scored
        |)
        |SELECT qid, CAST(count(*) AS BIGINT) AS n_retrieved,
        |  CAST(sum(CASE WHEN rf <= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hits_at_k
        |FROM ranked WHERE rp <= 10 GROUP BY qid ORDER BY qid""".stripMargin,
    "corpus_quality_gate" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |    len(string_split(text, ' ')) AS n_ws,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |      AS DOUBLE) / length(text) AS ar
        |  FROM documents
        |), k AS (
        |  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canon
        |  FROM d
        |), r AS (
        |  SELECT CASE WHEN lang <> 'en' THEN 'non_en'
        |    WHEN n_ws < 20 THEN 'too_short'
        |    WHEN ar < 0.78 THEN 'low_alpha'
        |    WHEN NOT is_canon THEN 'exact_dup'
        |    ELSE 'kept' END AS reason
        |  FROM k
        |), t AS (SELECT count(*) AS total FROM r)
        |SELECT reason, count(*) AS n_docs,
        |  CAST(CAST(count(*) AS DOUBLE) / total AS REAL) AS share
        |FROM r, t GROUP BY reason, total ORDER BY reason""".stripMargin,
    "ann_pq_adc_topk" ->
      """WITH a AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / amax)) AS INT))
        |      AS qv
        |  FROM a WHERE amax > 0
        |), cb AS (
        |  SELECT m, k, d,
        |    CAST(CAST('0x' || substr(md5('pq:' || m || ':' || k || ':'
        |      || d), 1, 15) AS BIGINT) % 256 - 128 AS INT) AS c
        |  FROM (SELECT unnest(generate_series(0, 7)) AS m),
        |       (SELECT unnest(generate_series(0, 15)) AS k),
        |       (SELECT unnest(generate_series(0, 7)) AS d)
        |), sub AS (
        |  SELECT vec_id, m, d, qv[m * 8 + d + 1] AS qd
        |  FROM q, (SELECT unnest(generate_series(0, 7)) AS m) mm,
        |       (SELECT unnest(generate_series(0, 7)) AS d) dd
        |), dist AS (
        |  SELECT vec_id, s.m, cb.k, sum(abs(qd - c)) AS dist
        |  FROM sub s JOIN cb ON cb.m = s.m AND cb.d = s.d
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT vec_id, m, k, dist,
        |    row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, k) AS rn
        |  FROM dist
        |), codes AS (
        |  SELECT vec_id, m, k FROM best WHERE rn = 1
        |), qlut AS (
        |  SELECT s.m, cb.k, CAST(sum(abs(qd - c)) AS BIGINT) AS qdist
        |  FROM sub s JOIN cb ON cb.m = s.m AND cb.d = s.d
        |  WHERE s.vec_id = 0
        |  GROUP BY 1, 2
        |)
        |SELECT c.vec_id, CAST(sum(l.qdist) AS BIGINT) AS adc_dist
        |FROM codes c JOIN qlut l ON l.m = c.m AND l.k = c.k
        |GROUP BY 1 ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin,
    "emb_pq_codes" ->
      """WITH a AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / amax)) AS INT))
        |      AS qv
        |  FROM a WHERE amax > 0
        |), cb AS (
        |  SELECT m, k, d,
        |    CAST(CAST('0x' || substr(md5('pq:' || m || ':' || k || ':'
        |      || d), 1, 15) AS BIGINT) % 256 - 128 AS INT) AS c
        |  FROM (SELECT unnest(generate_series(0, 7)) AS m),
        |       (SELECT unnest(generate_series(0, 15)) AS k),
        |       (SELECT unnest(generate_series(0, 7)) AS d)
        |), sub AS (
        |  SELECT vec_id, m, d, qv[m * 8 + d + 1] AS qd
        |  FROM q, (SELECT unnest(generate_series(0, 7)) AS m) mm,
        |       (SELECT unnest(generate_series(0, 7)) AS d) dd
        |), dist AS (
        |  SELECT vec_id, s.m, cb.k, sum(abs(qd - c)) AS dist
        |  FROM sub s JOIN cb ON cb.m = s.m AND cb.d = s.d
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT vec_id, m, k, dist,
        |    row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, k) AS rn
        |  FROM dist
        |)
        |SELECT vec_id,
        |  CAST(max(CASE WHEN m = 0 THEN k END) AS INT) AS code_0,
        |  CAST(max(CASE WHEN m = 1 THEN k END) AS INT) AS code_1,
        |  CAST(max(CASE WHEN m = 2 THEN k END) AS INT) AS code_2,
        |  CAST(max(CASE WHEN m = 3 THEN k END) AS INT) AS code_3,
        |  CAST(max(CASE WHEN m = 4 THEN k END) AS INT) AS code_4,
        |  CAST(max(CASE WHEN m = 5 THEN k END) AS INT) AS code_5,
        |  CAST(max(CASE WHEN m = 6 THEN k END) AS INT) AS code_6,
        |  CAST(max(CASE WHEN m = 7 THEN k END) AS INT) AS code_7,
        |  CAST(sum(dist) AS BIGINT) AS l1_err
        |FROM best WHERE rn = 1
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "export_jsonl_manifest" ->
      """SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |    || ':shard'), 1, 15) AS BIGINT) % 8 AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS text_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    "stream_foreachbatch_upsert" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, t AS last_ts_us, event_id AS last_event_id,
        |  value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "agg_countmin_freq" ->
      """WITH ev AS (SELECT user_id FROM events),
        |cells AS (
        |  SELECT r, CAST('0x' || substr(md5('cm' || r || ':'
        |      || user_id), 1, 15) AS BIGINT) % 256 AS b,
        |    count(*) AS cnt
        |  FROM ev, (SELECT unnest(generate_series(0, 3)) AS r) rr
        |  GROUP BY 1, 2
        |), exact AS (
        |  SELECT user_id, count(*) AS n FROM ev GROUP BY 1
        |  ORDER BY n DESC, user_id LIMIT 10
        |), probes AS (
        |  SELECT user_id, n, r, CAST('0x' || substr(md5('cm' || r || ':'
        |      || user_id), 1, 15) AS BIGINT) % 256 AS b
        |  FROM exact, (SELECT unnest(generate_series(0, 3)) AS r) rr
        |)
        |SELECT user_id, n, min(cnt) AS cm_est,
        |  CAST(min(cnt) - n AS BIGINT) AS overestimate,
        |  min(cnt) >= n AS est_ge_exact
        |FROM probes JOIN cells USING (r, b)
        |GROUP BY user_id, n
        |ORDER BY n DESC, user_id""".stripMargin,
    "graph_communities_lpa" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), l0 AS (SELECT DISTINCT u, u AS lbl FROM edges),
        |c1 AS (
        |  SELECT e.u, l.lbl, count(*) AS c
        |  FROM edges e JOIN l0 l ON l.u = e.v GROUP BY 1, 2
        |), l1 AS (
        |  SELECT u, lbl FROM (
        |    SELECT u, lbl, row_number() OVER (PARTITION BY u
        |      ORDER BY c DESC, lbl) AS rn FROM c1) WHERE rn = 1
        |), c2 AS (
        |  SELECT e.u, l.lbl, count(*) AS c
        |  FROM edges e JOIN l1 l ON l.u = e.v GROUP BY 1, 2
        |), l2 AS (
        |  SELECT u, lbl FROM (
        |    SELECT u, lbl, row_number() OVER (PARTITION BY u
        |      ORDER BY c DESC, lbl) AS rn FROM c2) WHERE rn = 1
        |)
        |SELECT u AS part, lbl AS community FROM l2
        |WHERE u <= 100 ORDER BY part""".stripMargin,
    // the LPA chain above, extended with the modularity tail (exact
    // BIGINT edge/degree masses; one double expression per community)
    "graph_modularity" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS MATERIALIZED (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), l0 AS MATERIALIZED (SELECT DISTINCT u, u AS lbl FROM edges),
        |c1 AS MATERIALIZED (
        |  SELECT e.u, l.lbl, count(*) AS c
        |  FROM edges e JOIN l0 l ON l.u = e.v GROUP BY 1, 2
        |), l1 AS MATERIALIZED (
        |  SELECT u, lbl FROM (
        |    SELECT u, lbl, row_number() OVER (PARTITION BY u
        |      ORDER BY c DESC, lbl) AS rn FROM c1) WHERE rn = 1
        |), c2 AS MATERIALIZED (
        |  SELECT e.u, l.lbl, count(*) AS c
        |  FROM edges e JOIN l1 l ON l.u = e.v GROUP BY 1, 2
        |), l2 AS MATERIALIZED (
        |  SELECT u, lbl FROM (
        |    SELECT u, lbl, row_number() OVER (PARTITION BY u
        |      ORDER BY c DESC, lbl) AS rn FROM c2) WHERE rn = 1
        |), tm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS two_m FROM edges),
        |dm AS MATERIALIZED (
        |  SELECT l.lbl, CAST(count(*) AS BIGINT) AS d_c
        |  FROM edges e JOIN l2 l ON l.u = e.u GROUP BY l.lbl
        |), ic AS MATERIALIZED (
        |  SELECT lu.lbl, CAST(count(*) AS BIGINT) AS e2_c
        |  FROM edges e JOIN l2 lu ON lu.u = e.u JOIN l2 lv ON lv.u = e.v
        |  WHERE lu.lbl = lv.lbl GROUP BY lu.lbl
        |)
        |SELECT dm.lbl AS community,
        |  CAST(coalesce(ic.e2_c, 0) AS BIGINT) AS e2_c, dm.d_c, tm.two_m,
        |  CAST(CAST(coalesce(ic.e2_c, 0) AS DOUBLE) / CAST(tm.two_m AS DOUBLE)
        |    - (CAST(dm.d_c AS DOUBLE) / CAST(tm.two_m AS DOUBLE))
        |      * (CAST(dm.d_c AS DOUBLE) / CAST(tm.two_m AS DOUBLE))
        |    AS REAL) AS q_c
        |FROM dm LEFT JOIN ic ON dm.lbl = ic.lbl CROSS JOIN tm
        |ORDER BY community""".stripMargin,
    "cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    epoch_us(ts) // 604800000000 AS week
        |  FROM events
        |), cohorts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |), rev AS (
        |  SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
        |    CAST(sum(CAST(round(e.value * 1000000) AS BIGINT)) AS BIGINT)
        |      AS revenue_micros
        |  FROM ev e JOIN cohorts c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2
        |)
        |SELECT cohort_week, week_offset, revenue_micros,
        |  CAST(sum(revenue_micros) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_revenue_micros
        |FROM rev ORDER BY cohort_week, week_offset""".stripMargin,
    "ts_seasonal_baseline" ->
      """WITH ev AS (
        |  SELECT event_id, value,
        |    (epoch_us(ts) // 3600000000) % 168 AS how
        |  FROM events
        |), b AS (
        |  SELECT how, avg(value) AS mean, stddev_samp(value) AS sd
        |  FROM ev GROUP BY how
        |)
        |SELECT event_id, how, value,
        |  CAST((value - mean) / sd AS REAL) AS z
        |FROM ev JOIN b USING (how)
        |WHERE abs(CAST((value - mean) / sd AS REAL)) > 3.0
        |ORDER BY event_id""".stripMargin,
    // round-6 warehouse suite
    "sql_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_s4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue_s4 DESC, n_name""".stripMargin,
    "sql_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(28,4)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "sql_cust_order_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |) GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "sql_promo_revenue" ->
      """WITH m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(28,4))
        |      AS promo_revenue,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |)
        |SELECT promo_revenue, total_revenue,
        |  CAST(promo_revenue AS DOUBLE) * 100.0
        |    / CAST(total_revenue AS DOUBLE) AS promo_pct
        |FROM m""".stripMargin,
    "sql_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "sql_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(round(l_quantity) AS BIGINT) AS qty_i,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'
        |), a AS (
        |  SELECT l_partkey AS a_partkey,
        |    CAST(sum(qty_i) AS BIGINT) AS sum_q, count(*) AS cnt
        |  FROM li GROUP BY 1
        |)
        |SELECT
        |  CAST(sum(price_c) AS BIGINT) AS yearly_loss_c,
        |  count(*) AS n_items
        |FROM li JOIN a ON l_partkey = a_partkey
        |WHERE qty_i * cnt * 5 < sum_q""".stripMargin,
    "sql_nation_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_s4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "sql_priority_linestatus" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_large_volume_customer" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |    > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "sql_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_s4,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(round(l_quantity) AS BIGINT) <= 30
        |  AND ((p_brand = 'Brand#1'
        |      AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#2'
        |      AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#3'
        |      AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30))""".stripMargin,
    "sql_market_share" ->
      """WITH cr AS (
        |  SELECT c_custkey
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |), sn AS (
        |  SELECT s_suppkey, n_name AS sn_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |)
        |SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN sn_name = 'NATION_1'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS nation_s4,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS total_s4,
        |  CAST(CAST(sum(CASE WHEN sn_name = 'NATION_1'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cr ON o_custkey = c_custkey
        |JOIN sn ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_returned_top_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS revenue_s4
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-07-01'
        |    AND o_orderdate < TIMESTAMP '1997-10-01'
        |  GROUP BY 1
        |)
        |SELECT c_custkey, c_name, n_name, revenue_s4
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_s4 DESC, c_custkey LIMIT 20""".stripMargin,
    "sql_sales_opportunity" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer
        |), avg_pos AS (
        |  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
        |    count(*) AS n_pos
        |  FROM cust WHERE bal_c > 0
        |)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM cust, avg_pos
        |WHERE bal_c * n_pos > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_sole_fault_supplier" ->
      """WITH profile AS (
        |  SELECT l_orderkey
        |  FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING count(DISTINCT l_suppkey) > 1
        |    AND count(DISTINCT CASE WHEN l_returnflag = 'R'
        |      THEN l_suppkey END) = 1
        |)
        |SELECT s_name, count(DISTINCT l_orderkey) AS numwait
        |FROM lineitem
        |JOIN profile USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_returnflag = 'R'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    // round-6 corpus-shaping operators
    "chunk_sliding" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(1, greatest(len(toks), 1), 16)) AS st
        |  FROM t
        |)
        |SELECT doc_id, CAST((st - 1) / 16 AS INT) AS chunk_idx,
        |  CAST(len(list_slice(toks, st, st + 31)) AS INT) AS n_tok,
        |  md5(array_to_string(list_slice(toks, st, st + 31), ' '))
        |    AS chunk_hash
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "corpus_temperature_mix" ->
      """WITH n AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        |), m AS (SELECT min(n_docs) AS n_min FROM n)
        |SELECT d.lang, n.n_docs,
        |  CAST(sum(CASE WHEN
        |      CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
        |          || ':tm'), 1, 15) AS BIGINT) AS DOUBLE)
        |        * sqrt(CAST(n.n_docs AS DOUBLE))
        |      < 1152921504606846976.0 * sqrt(CAST(m.n_min AS DOUBLE))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN n USING (lang), m
        |GROUP BY d.lang, n.n_docs ORDER BY d.lang""".stripMargin,
    // epoch repetition: f = min(sqrt(n_max/n_src), 4); floor copies +
    // one more iff hash60 clears floor(frac(f)*2^60) — integer compare
    "corpus_epoch_repeat" ->
      """WITH n AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_src
        |  FROM documents GROUP BY source
        |), m AS (SELECT max(n_src) AS n_max FROM n),
        |f AS (
        |  SELECT d.doc_id, d.source, n.n_src,
        |    least(sqrt(CAST(m.n_max AS DOUBLE) / CAST(n.n_src AS DOUBLE)),
        |      4.0) AS factor
        |  FROM documents d JOIN n USING (source), m
        |), k AS (
        |  SELECT doc_id, source, n_src, factor,
        |    CAST(floor(factor) AS BIGINT)
        |      + CASE WHEN CAST('0x' || substr(md5(
        |            CAST(doc_id AS VARCHAR) || ':epoch'), 1, 15) AS BIGINT)
        |          < CAST(floor((factor - floor(factor))
        |              * 1152921504606846976.0) AS BIGINT)
        |        THEN 1 ELSE 0 END AS n_copies
        |  FROM f
        |)
        |SELECT doc_id, source, n_src, CAST(factor AS REAL) AS factor,
        |  CAST(copy_idx AS BIGINT) AS copy_idx
        |FROM k, LATERAL (SELECT unnest(generate_series(1, n_copies))
        |  AS copy_idx) s
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // CCNet terciles: familiarity = sum tf*cnt / n_tokens (ONE exact
    // double divide), ntile(3) per lang on (familiarity DESC, doc_id)
    "corpus_ccnet_buckets" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
        |      AS tok
        |    FROM documents) GROUP BY 1, 2
        |), vocab AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok
        |), sc AS (
        |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |    CAST(sum(tf.tf * cnt) AS BIGINT) AS s_freq
        |  FROM tf JOIN vocab USING (tok) GROUP BY tf.doc_id
        |), f AS (
        |  SELECT d.doc_id, d.lang, n_tokens, s_freq,
        |    CAST(CAST(s_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      AS REAL) AS familiarity
        |  FROM documents d JOIN sc USING (doc_id)
        |)
        |SELECT doc_id, lang, n_tokens, s_freq, familiarity,
        |  CAST(ntile(3) OVER (PARTITION BY lang
        |    ORDER BY familiarity DESC, doc_id) AS INT) AS bucket
        |FROM f ORDER BY doc_id""".stripMargin,
    // span plan: one span per 20 tokens, confined to its own segment,
    // start = i*seg + 1 + hash60(doc:mask:i) % (seg - 2)
    "text_span_mask_plan" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS t
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, t, t // 20 AS n_spans, t // (t // 20) AS seg
        |  FROM d WHERE t // 20 >= 1
        |)
        |SELECT doc_id, t AS n_tokens, n_spans,
        |  CAST(i AS BIGINT) AS span_idx,
        |  CAST(i * seg + 1
        |    + CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mask:'
        |        || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
        |      % (seg - 3 + 1) AS BIGINT) AS start,
        |  CAST(3 AS BIGINT) AS span_len,
        |  CAST(CAST(n_spans * 3 AS DOUBLE) / CAST(t AS DOUBLE) AS REAL)
        |    AS masked_frac
        |FROM s, LATERAL (SELECT unnest(generate_series(0, n_spans - 1))
        |  AS i) x
        |ORDER BY doc_id, span_idx""".stripMargin,
    "curriculum_phases" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT)
        |    AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY n_tok DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
        |      AS BIGINT) AS cum_before
        |  FROM d
        |), p AS (
        |  SELECT doc_id, n_tok, cum_before // 2000 AS phase
        |  FROM c
        |)
        |SELECT phase, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM p GROUP BY phase ORDER BY phase""".stripMargin,
    // the streaming twin drains to the identical panel (batch-
    // equivalence contract), so it shares the batch probe's oracle
    "stream_dedup_incremental" -> incrementalMinhashOracleSql,
    // drain == batch row-for-row, so the batch IVF oracle adjudicates
    // the streaming twin too
    "stream_ann_ivf_assign" -> annIvfAssignOracleSql,
    "privacy_budget_ledger" -> privacyLedgerOracleSql,
    // monitoring twins share their batch queries' oracles (drain==batch)
    "stream_eval_ece" -> eceOracleSql,
    "stream_drift_psi" -> psiTermsOracleSql,
    "stream_dq_benford" -> benfordOracleSql,
    "dedup_incremental_minhash" -> incrementalMinhashOracleSql,
    "dedup_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id, md5(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents
        |), corpus AS (
        |  SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0
        |), delta AS (
        |  SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0
        |), first_in AS (
        |  SELECT fp, min(doc_id) AS first_id FROM delta GROUP BY fp
        |)
        |SELECT d.doc_id, d.fp AS fingerprint,
        |  CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
        |    WHEN d.doc_id > f.first_id THEN 'dup_in_batch'
        |    ELSE 'new' END AS status
        |FROM delta d
        |LEFT JOIN corpus c ON d.fp = c.fp
        |JOIN first_in f ON d.fp = f.fp
        |ORDER BY d.doc_id""".stripMargin,
    "path_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type FROM events
        |), l AS (
        |  SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM ev
        |), pairs AS (
        |  SELECT prev_type, next_type, count(*) AS n
        |  FROM l WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT prev_type, next_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type)
        |    AS DOUBLE) AS p
        |FROM pairs ORDER BY prev_type, next_type""".stripMargin,
    "winsorized_stats" ->
      """WITH li AS (
        |  SELECT l_returnflag AS f, l_extendedprice AS p FROM lineitem
        |), k AS (
        |  SELECT f, greatest(CAST(ceil(0.05 * count(*)) AS BIGINT), 1)
        |    AS klo, CAST(ceil(0.95 * count(*)) AS BIGINT) AS khi
        |  FROM li GROUP BY f
        |), r AS (
        |  SELECT f, p,
        |    row_number() OVER (PARTITION BY f ORDER BY p) AS rn
        |  FROM li
        |), thr AS (
        |  SELECT r.f,
        |    max(CASE WHEN rn = klo THEN p END) AS lo,
        |    max(CASE WHEN rn = khi THEN p END) AS hi
        |  FROM r JOIN k ON r.f = k.f GROUP BY r.f
        |)
        |SELECT li.f AS l_returnflag,
        |  CAST(sum(CAST(round(least(greatest(p, lo), hi) * 100)
        |    AS BIGINT)) AS BIGINT) AS wsum_c,
        |  CAST(sum(CASE WHEN p < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo_clip,
        |  CAST(sum(CASE WHEN p > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi_clip,
        |  count(*) AS n
        |FROM li JOIN thr ON li.f = thr.f
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "histogram_equiwidth" ->
      """SELECT
        |  CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0),
        |    19) AS BIGINT) AS bin,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS value_total_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the watermark finalization + late-drop rule as plain SQL: on-time
    // rows only, windows whose end precedes max(ts) - 1h (the watermark
    // after the first arrival batch, which holds the newest events)
    "stream_late_data" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events),
        |ontime AS (
        |  SELECT * FROM events
        |  WHERE NOT (event_id % 7 = 0 AND ts < TIMESTAMP '2024-01-15')
        |)
        |SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, CAST(sum(value) AS REAL) AS sum_value
        |FROM ontime, mx
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |  <= m - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // bounded recursion: Spark runs frontier-delta rounds, the oracle the
    // equivalent recursive CTE; min(dist) = BFS distance on both sides
    "graph_reachability" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), r(u, dist) AS (
        |  SELECT DISTINCT u, 0 FROM edges WHERE u <= 3
        |  UNION
        |  SELECT e.v, r.dist + 1
        |  FROM r JOIN edges e ON e.u = r.u
        |  WHERE r.dist < 3
        |)
        |SELECT u AS part, CAST(min(dist) AS INT) AS hops
        |FROM r GROUP BY u ORDER BY part""".stripMargin,
    "ann_radius_search" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  list_dot_product(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(qe AS DOUBLE[]) FROM q)) AS cosine
        |FROM embeddings WHERE vec_id <> 0
        |  AND list_dot_product(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(qe AS DOUBLE[]) FROM q)) >= 0.15
        |ORDER BY vec_id""".stripMargin,
    // Efraimidis–Spirakis keys from the md5-derived uniform: DuckDB
    // replays the same hash60 bits, so the sample is bit-identical
    "sample_weighted" ->
      """WITH k AS (
        |  SELECT o_orderkey, o_totalprice,
        |    -ln((CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
        |          AS BIGINT) + 1) / 1152921504606846976.0)
        |      / o_totalprice AS es_key
        |  FROM orders
        |)
        |SELECT o_orderkey, o_totalprice, CAST(es_key AS REAL) AS es_key
        |FROM k ORDER BY k.es_key, o_orderkey LIMIT 100""".stripMargin,
    "agg_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf, l_quantity AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS w_cents,
        |    l_orderkey, l_linenumber
        |  FROM lineitem
        |), c AS (
        |  SELECT rf, q, w_cents,
        |    sum(w_cents) OVER (PARTITION BY rf
        |      ORDER BY q, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(w_cents) OVER (PARTITION BY rf) AS tot_cents
        |  FROM li
        |)
        |SELECT rf AS l_returnflag, min(q) AS weighted_median,
        |  CAST(min(tot_cents) AS BIGINT) AS total_cents
        |FROM c WHERE cum * 2 >= tot_cents
        |GROUP BY rf ORDER BY rf""".stripMargin,
    "ts_interval_union" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 300000000 AS en, event_id
        |  FROM events
        |), m AS (
        |  SELECT *, max(en) OVER (PARTITION BY user_id
        |    ORDER BY s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM e
        |), f AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR s > prev_end
        |    THEN 1 ELSE 0 END AS ni
        |  FROM m
        |), g AS (
        |  SELECT *, sum(ni) OVER (PARTITION BY user_id
        |    ORDER BY s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f
        |), isl AS (
        |  SELECT user_id, island, min(s) AS is_start, max(en) AS is_end
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(is_end - is_start) AS BIGINT) AS covered_micros
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    "drift_psi" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS tus, value FROM events
        |), ext AS (SELECT min(tus) AS lo, max(tus) AS hi FROM e),
        |b AS (
        |  SELECT CASE WHEN tus * 2 < lo + hi THEN 'early' ELSE 'late' END
        |      AS half,
        |    least(greatest(CAST(floor(value / 10) AS INT), 0), 9) AS bin
        |  FROM e, ext
        |), c AS (
        |  SELECT bin,
        |    sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS n_early,
        |    sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS n_late
        |  FROM b GROUP BY bin
        |), t AS (SELECT sum(n_early) AS te, sum(n_late) AS tl FROM c)
        |SELECT bin, CAST(n_early AS BIGINT) AS n_early,
        |  CAST(n_late AS BIGINT) AS n_late,
        |  CAST(((n_early + 1.0) / (te + 10.0) - (n_late + 1.0) / (tl + 10.0))
        |    * ln(((n_early + 1.0) / (te + 10.0))
        |        / ((n_late + 1.0) / (tl + 10.0))) AS REAL) AS psi_term
        |FROM c, t ORDER BY bin""".stripMargin,
    "dq_join_profile" ->
      """WITH ck AS (SELECT DISTINCT c_custkey AS pk FROM customer),
        |pk AS (SELECT DISTINCT p_partkey AS pk FROM part),
        |r1 AS (
        |  SELECT 'orders->customer' AS relationship,
        |    CAST(count(*) AS BIGINT) AS child_rows,
        |    CAST(count(ck.pk) AS BIGINT) AS matched_rows,
        |    CAST(count(*) - count(ck.pk) AS BIGINT) AS orphan_rows,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT)
        |      AS distinct_child_keys,
        |    CAST(count(ck.pk) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS match_rate
        |  FROM orders LEFT JOIN ck ON o_custkey = ck.pk
        |), r2 AS (
        |  SELECT 'lineitem->part' AS relationship,
        |    CAST(count(*) AS BIGINT) AS child_rows,
        |    CAST(count(pk.pk) AS BIGINT) AS matched_rows,
        |    CAST(count(*) - count(pk.pk) AS BIGINT) AS orphan_rows,
        |    CAST(count(DISTINCT l_partkey) AS BIGINT)
        |      AS distinct_child_keys,
        |    CAST(count(pk.pk) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS match_rate
        |  FROM lineitem LEFT JOIN pk ON l_partkey = pk.pk
        |)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |ORDER BY relationship""".stripMargin,
    "attribution_linear" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus, value
        |  FROM events
        |), p AS (
        |  SELECT event_id AS p_id, user_id, tus AS p_tus, value AS p_value
        |  FROM e WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT user_id, event_type AS touch_type, tus AS t_tus
        |  FROM e WHERE event_type IN ('click', 'view')
        |), j AS (
        |  SELECT p.p_id, p.p_value, t.touch_type, t.t_tus
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.t_tus <= p.p_tus AND p.p_tus - t.t_tus < 3600000000
        |), n AS (
        |  SELECT p_id, p_value, touch_type, t_tus,
        |    count(t_tus) OVER (PARTITION BY p_id) AS n_touch
        |  FROM j
        |)
        |SELECT CASE WHEN t_tus IS NULL THEN 'direct' ELSE touch_type END
        |    AS credit_type,
        |  CAST(count(*) AS BIGINT) AS n_credits,
        |  CAST(sum(CASE WHEN t_tus IS NULL THEN p_value
        |    ELSE p_value / n_touch END) AS REAL) AS credited_value
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "attribution_time_decay" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus, value
        |  FROM events
        |), p AS (
        |  SELECT event_id AS p_id, user_id, tus AS p_tus, value AS p_value
        |  FROM e WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT user_id, event_type AS touch_type, tus AS t_tus
        |  FROM e WHERE event_type IN ('click', 'view')
        |), j AS (
        |  SELECT p.p_id, p.p_tus, p.p_value, t.touch_type, t.t_tus
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.t_tus <= p.p_tus AND p.p_tus - t.t_tus < 3600000000
        |), n AS (
        |  SELECT p_id, p_value, touch_type, t_tus,
        |    CASE WHEN t_tus IS NOT NULL THEN pow(0.5,
        |      CAST(p_tus - t_tus AS DOUBLE) / 900000000.0) END AS w,
        |    sum(CASE WHEN t_tus IS NOT NULL THEN pow(0.5,
        |      CAST(p_tus - t_tus AS DOUBLE) / 900000000.0) END)
        |      OVER (PARTITION BY p_id) AS w_sum
        |  FROM j
        |)
        |SELECT CASE WHEN t_tus IS NULL THEN 'direct' ELSE touch_type END
        |    AS credit_type,
        |  CAST(count(*) AS BIGINT) AS n_credits,
        |  CAST(sum(CASE WHEN t_tus IS NULL THEN p_value
        |    ELSE p_value * w / w_sum END) AS REAL) AS credited_value
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_customer_rfm" ->
      """WITH ref AS (SELECT max(o_orderdate) AS ref FROM orders),
        |base AS (
        |  SELECT o_custkey AS c_custkey,
        |    CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
        |      CAST((SELECT ref FROM ref) AS DATE)) AS BIGINT)
        |      AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS monetary_cents
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_custkey, recency_days, frequency, monetary_cents,
        |  CAST(ntile(5) OVER (ORDER BY recency_days, c_custkey) AS INT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency DESC, c_custkey) AS INT)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, c_custkey)
        |    AS INT) AS m_score,
        |  CAST(ntile(5) OVER (ORDER BY recency_days, c_custkey) * 100
        |    + ntile(5) OVER (ORDER BY frequency DESC, c_custkey) * 10
        |    + ntile(5) OVER (ORDER BY monetary_cents DESC, c_custkey)
        |    AS INT) AS rfm_cell
        |FROM base ORDER BY c_custkey""".stripMargin,
    "sql_excess_stock" ->
      """WITH survivors AS (
        |  SELECT l_suppkey
        |  FROM lineitem
        |  WHERE l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE '%bolt')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) FILTER (
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01') > 0
        |    AND sum(CAST(l_quantity AS BIGINT)) >
        |      4 * sum(CAST(l_quantity AS BIGINT)) FILTER (
        |        WHERE l_shipdate >= TIMESTAMP '1996-01-01')
        |)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM survivors)
        |ORDER BY s_suppkey""".stripMargin,
    // three unrolled peel rounds — the Spark side runs the identical
    // fixed-round fold over the shared co-purchase edge index
    // every CTE MATERIALIZED: the peeling chain references each stage
    // 3× (two IN-subqueries + the next HAVING), so DuckDB's per-
    // reference inlining re-evaluated the pair self-join a combinatorial
    // number of times and exhausted temp disk at x10; materialization
    // evaluates each peel once
    "graph_kcore" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS MATERIALIZED (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), thr AS MATERIALIZED (
        |  SELECT quantile_cont(deg, 0.1) AS k FROM (
        |    SELECT CAST(count(*) AS DOUBLE) AS deg FROM sym GROUP BY u)
        |), a1 AS MATERIALIZED (SELECT u FROM sym GROUP BY u
        |  HAVING count(*) >= (SELECT k FROM thr)),
        |e1 AS MATERIALIZED (SELECT u, v FROM sym
        |  WHERE u IN (SELECT u FROM a1) AND v IN (SELECT u FROM a1)),
        |a2 AS MATERIALIZED (SELECT u FROM e1 GROUP BY u
        |  HAVING count(*) >= (SELECT k FROM thr)),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1
        |  WHERE u IN (SELECT u FROM a2) AND v IN (SELECT u FROM a2)),
        |a3 AS MATERIALIZED (SELECT u FROM e2 GROUP BY u
        |  HAVING count(*) >= (SELECT k FROM thr)),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2
        |  WHERE u IN (SELECT u FROM a3) AND v IN (SELECT u FROM a3))
        |SELECT u AS vertex, CAST(count(*) AS BIGINT) AS core_degree
        |FROM e3 GROUP BY u ORDER BY vertex""".stripMargin,
    // the oracle is the brute-force all-pairs truth over the DISTINCT
    // name vocabulary; matching it proves the FastSS deletion-
    // neighborhood candidate generation is complete
    "join_edit_distance" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "f_variant_json" ->
      """SELECT event_type,
        |  CAST(count(CAST(props->>'$.k' AS INT)) AS BIGINT) AS n_with_k,
        |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS INT)) AS min_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k,
        |  CAST(sum(CAST(props->>'$.k' AS INT)) AS DOUBLE)
        |    / CAST(count(CAST(props->>'$.k' AS INT)) AS DOUBLE) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dedup_time_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
        |    make_timestamp(epoch_us(ts) - epoch_us(ts) % 600000000)
        |      AS win_start
        |  FROM events
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type, win_start
        |    ORDER BY tus, event_id) AS rn
        |  FROM e
        |)
        |SELECT event_id, user_id, event_type, win_start
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "corpus_sample_stratified" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM documents
        |), s AS (
        |  SELECT lang, (count(*) + 9) // 10 AS target FROM d GROUP BY lang
        |), r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM d
        |)
        |SELECT r.doc_id, r.lang FROM r JOIN s USING (lang)
        |WHERE rn <= target ORDER BY doc_id""".stripMargin,
    "anomaly_rolling_z" ->
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |    count(value) OVER f AS n,
        |    sum(value) OVER f AS s1,
        |    sum(value * value) OVER f AS s2
        |  FROM events
        |  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        |), v AS (
        |  SELECT event_id, user_id, value, s1 / n AS mean,
        |    (s2 - s1 * s1 / n) / (n - 1) AS variance
        |  FROM w WHERE n >= 10
        |)
        |SELECT event_id, user_id, value,
        |  CAST((value - mean) / sqrt(variance) AS REAL) AS z
        |FROM v WHERE variance > 0
        |  AND abs((value - mean) / sqrt(variance)) > 3.0
        |ORDER BY event_id""".stripMargin,
    "agg_histogram_quantiles" ->
      """WITH x AS (SELECT l_extendedprice AS x FROM lineitem),
        |ext AS (SELECT min(x) AS lo, max(x) AS hi FROM x),
        |c AS (
        |  SELECT least(greatest(
        |      CAST(floor((x - lo) * 32 / (hi - lo)) AS INT), 0), 31) AS bin,
        |    min(lo) AS lo, min(hi) AS hi, count(*) AS n
        |  FROM x, ext GROUP BY 1
        |), cum AS (
        |  SELECT bin, lo, hi, n,
        |    coalesce(sum(n) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM c
        |), tot AS (SELECT sum(n) AS total FROM c),
        |t AS (
        |  SELECT q, total,
        |    CASE q WHEN 'p50' THEN (total + 1) // 2
        |           WHEN 'p90' THEN (total * 9 + 9) // 10
        |           ELSE (total * 99 + 99) // 100 END AS k
        |  FROM (SELECT unnest(['p50', 'p90', 'p99']) AS q), tot
        |)
        |SELECT q, CAST(k AS BIGINT) AS k,
        |  CAST(lo + (hi - lo) / 32 * (CAST(bin AS DOUBLE)
        |    + CAST(k - cum_before AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS REAL) AS estimate
        |FROM t JOIN cum ON k > cum_before AND k <= cum_before + n
        |ORDER BY q""".stripMargin,
    "sql_inactive_customers" ->
      """WITH balavg AS (
        |  SELECT avg(c_acctbal) AS bal_avg FROM customer
        |  WHERE c_acctbal > 0.0
        |), hibar AS (
        |  SELECT avg(o_totalprice) * 2.0 AS hi_bar FROM orders
        |), big AS (
        |  SELECT DISTINCT o_custkey FROM orders, hibar
        |  WHERE o_totalprice > hi_bar
        |)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(c_acctbal) AS REAL) AS totacctbal
        |FROM customer, balavg
        |WHERE c_acctbal > bal_avg
        |  AND c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // full AvailableNow drain == batch aggregate (the streaming-oracle
    // contract shared by the whole stream_* family)
    "stream_transform_with_state" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(value) AS REAL) AS sum_value,
        |  max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sql_priority_returns" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the langid oracle wrapped in the confusion rollup — same scoring
    "quality_lang_confusion" ->
      """WITH u AS (SELECT doc_id, lang,
        |    list_distinct(string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
        |  FROM documents),
        |scores AS (SELECT doc_id, lang,
        |    CAST(len(list_intersect(t, ['der','die','das','und','ist','von','ein','eine','zu','mit'])) AS DOUBLE) / 10.0 AS s_de,
        |    CAST(len(list_intersect(t, ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) / 10.0 AS s_en,
        |    CAST(len(list_intersect(t, ['el','la','de','que','y','en','un','una','es','por'])) AS DOUBLE) / 10.0 AS s_es,
        |    CAST(len(list_intersect(t, ['le','la','de','et','les','des','un','une','est','dans'])) AS DOUBLE) / 10.0 AS s_fr,
        |    CAST(len(list_intersect(t, ['de','shi','bu','le','zai','ren','you','wo','ta','zhe'])) AS DOUBLE) / 10.0 AS s_zh
        |  FROM u),
        |det AS (
        |  SELECT lang AS lang_labeled,
        |    CASE WHEN m = 0 THEN 'und'
        |         WHEN s_zh = m THEN 'zh' WHEN s_fr = m THEN 'fr'
        |         WHEN s_es = m THEN 'es' WHEN s_en = m THEN 'en'
        |         ELSE 'de' END AS lang_detected
        |  FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m
        |        FROM scores)
        |)
        |SELECT lang_labeled, lang_detected,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM det GROUP BY 1, 2
        |ORDER BY lang_labeled, lang_detected""".stripMargin,
    "agg_dow_hour_grid" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, user_id FROM events
        |)
        |SELECT CAST((us // 86400000000 + 4) % 7 AS INT) AS dow,
        |  CAST((us % 86400000000) // 3600000000 AS INT) AS hour,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin,
    "graph_two_hop_reach" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), cohort AS (SELECT u, v FROM sym WHERE u % 16 = 0),
        |hop1 AS (SELECT u AS src, v AS reach FROM cohort),
        |hop2 AS (
        |  SELECT a.u AS src, b.v AS reach
        |  FROM cohort a JOIN sym b ON a.v = b.u WHERE b.v <> a.u
        |)
        |SELECT src, CAST(count(DISTINCT reach) AS BIGINT) AS reach_2hop
        |FROM (SELECT * FROM hop1 UNION ALL SELECT * FROM hop2)
        |GROUP BY src ORDER BY src""".stripMargin,
    "privacy_dp_counts" ->
      """WITH c AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS exact_count
        |  FROM customer GROUP BY c_nationkey
        |), n AS (
        |  SELECT *,
        |    (CAST('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
        |       1, 15) AS BIGINT) + 0.5) / 1152921504606846976.0 - 0.5 AS p
        |  FROM c
        |)
        |SELECT c_nationkey, exact_count,
        |  CAST(-sign(p) * ln(1.0 - abs(p) * 2.0) AS REAL) AS noise,
        |  CAST(exact_count + (-sign(p) * ln(1.0 - abs(p) * 2.0)) AS REAL)
        |    AS noisy_count
        |FROM n ORDER BY c_nationkey""".stripMargin,
    "corpus_mix_weights" ->
      """WITH p AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang
        |), t AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM p
        |)
        |SELECT lang, n_docs,
        |  CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
        |  CAST(n_total AS DOUBLE) / CAST(n_langs * n_docs AS DOUBLE)
        |    AS weight
        |FROM p, t ORDER BY lang""".stripMargin,
    "eval_ks_test" ->
      """WITH pv AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nb
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY value
        |), t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM pv),
        |c AS (
        |  SELECT value,
        |    sum(na) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(nb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        |  FROM pv
        |)
        |SELECT CAST(ta AS BIGINT) AS n_click, CAST(tb AS BIGINT)
        |    AS n_purchase,
        |  max(abs(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
        |    - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))) AS ks_stat
        |FROM c, t GROUP BY ta, tb""".stripMargin,
    "sql_monthly_cum_revenue" ->
      """WITH m AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
        |      + EXTRACT(month FROM o_orderdate) AS INT) AS ym,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents
        |  FROM orders GROUP BY 1
        |), t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents
        |  FROM m)
        |SELECT ym, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY ym
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY ym
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(total_cents AS DOUBLE) AS cum_share
        |FROM m, t ORDER BY ym""".stripMargin,
    // timer contract: emitted = users idle >= gap behind the final
    // watermark, all in the engine's millisecond-floor arithmetic
    "stream_idle_timeout" ->
      """WITH wm AS (
        |  SELECT max(epoch_us(ts)) // 1000 - 600000 AS w FROM events
        |), u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(ts) AS idle_since FROM events GROUP BY user_id
        |)
        |SELECT user_id, n_events, idle_since FROM u, wm
        |WHERE epoch_us(idle_since) // 1000 + 1800000 <= w
        |ORDER BY user_id""".stripMargin,
    "eval_decile_lift" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    least(greatest(
        |      CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5, 0.0), 0.9999)
        |      AS score,
        |    CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |    CAST(sum(y) AS BIGINT) AS np FROM s),
        |r AS (
        |  SELECT y, row_number() OVER (ORDER BY score DESC, vec_id) AS r
        |  FROM s
        |), d AS (
        |  SELECT CAST((r - 1) * 10 // nt AS INT) AS decile, y FROM r, t
        |)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos_decile,
        |  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS response_rate,
        |  CAST((CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / ((SELECT CAST(np AS DOUBLE) FROM t)
        |       / (SELECT CAST(nt AS DOUBLE) FROM t)) AS REAL) AS lift
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    "privacy_t_closeness_tv" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg FROM customer
        |), cs AS (SELECT nk, seg, count(*) AS ns FROM c GROUP BY 1, 2),
        |ct AS (SELECT nk, count(*) AS nc FROM c GROUP BY nk),
        |gs AS (SELECT seg, count(*) AS gs FROM c GROUP BY seg),
        |gt AS (SELECT count(*) AS gt FROM c),
        |f AS (
        |  SELECT ct.nk, ct.nc,
        |    abs(CAST(coalesce(cs.ns, 0) AS DOUBLE) / CAST(ct.nc AS DOUBLE)
        |      - CAST(gs.gs AS DOUBLE) / CAST(gt.gt AS DOUBLE)) AS term
        |  FROM ct CROSS JOIN gs CROSS JOIN gt
        |  LEFT JOIN cs ON cs.nk = ct.nk AND cs.seg = gs.seg
        |)
        |SELECT nk AS c_nationkey, CAST(min(nc) AS BIGINT) AS class_size,
        |  CAST(sum(term) / 2.0 AS REAL) AS tv_distance
        |FROM f GROUP BY nk ORDER BY c_nationkey""".stripMargin,
    "dq_volume_anomaly" ->
      """WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day_index,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT day_index, n_events,
        |    count(n_events) OVER f AS trail_days,
        |    sum(n_events) OVER f AS trail_sum
        |  FROM d
        |  WINDOW f AS (ORDER BY day_index
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT CAST(day_index AS BIGINT) AS day_index, n_events,
        |  CAST(trail_days AS BIGINT) AS trail_days,
        |  CAST(n_events * trail_days AS DOUBLE)
        |    / CAST(trail_sum AS DOUBLE) AS volume_ratio,
        |  (CAST(n_events * trail_days AS DOUBLE)
        |    / CAST(trail_sum AS DOUBLE) >= 1.5
        |   OR CAST(n_events * trail_days AS DOUBLE)
        |    / CAST(trail_sum AS DOUBLE) <= 0.5) AS flagged
        |FROM t WHERE trail_days >= 3 ORDER BY day_index""".stripMargin,
    "stream_user_top_values" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events
        |), u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_seen
        |  FROM events GROUP BY user_id
        |)
        |SELECT u.user_id AS user_id, n_seen,
        |  max(CASE WHEN rk = 1 THEN value END) AS v1,
        |  max(CASE WHEN rk = 2 THEN value END) AS v2,
        |  max(CASE WHEN rk = 3 THEN value END) AS v3
        |FROM u JOIN r ON u.user_id = r.user_id AND rk <= 3
        |GROUP BY u.user_id, n_seen ORDER BY u.user_id""".stripMargin,
    "stream_user_type_counts" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,
    // the full det-cell IVF sweep replayed: md5 Forgy anchors, argmax
    // cells, per-query probe ranks, exact and per-level top-10 lists
    "ann_recall_curve" ->
      """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
        |seeds AS (
        |  SELECT vec_id AS seed_vid, embedding AS seed_e,
        |    row_number() OVER (ORDER BY
        |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |        AS BIGINT), vec_id) - 1 AS cell
        |  FROM emb
        |  ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |    AS BIGINT), vec_id
        |  LIMIT 16
        |), assigned AS (
        |  SELECT e.vec_id,
        |    -(max(struct_pack(
        |        dp := list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |          CAST(s.seed_e AS DOUBLE[])),
        |        negc := -s.cell))).negc AS cell
        |  FROM emb e CROSS JOIN seeds s GROUP BY e.vec_id
        |), panel AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM emb WHERE vec_id < 20
        |), cr AS (
        |  SELECT qid, cell,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      list_dot_product(CAST(qe AS DOUBLE[]),
        |        CAST(seed_e AS DOUBLE[])) DESC, cell) AS cell_rank
        |  FROM panel CROSS JOIN seeds
        |), scr AS (
        |  SELECT p.qid, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |      CAST(p.qe AS DOUBLE[])) AS dot,
        |    cr.cell_rank
        |  FROM emb e CROSS JOIN panel p
        |  JOIN assigned a ON a.vec_id = e.vec_id
        |  JOIN cr ON cr.qid = p.qid AND cr.cell = a.cell
        |  WHERE e.vec_id <> p.qid
        |), exact AS (
        |  SELECT qid, (list(vec_id ORDER BY dot DESC, vec_id))[1:10]
        |    AS exact_ids
        |  FROM scr GROUP BY qid
        |), lv AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
        |pl AS (
        |  SELECT nprobe, qid,
        |    (list(vec_id ORDER BY dot DESC, vec_id))[1:10] AS ivf_ids,
        |    count(*) AS n_candidates
        |  FROM scr, lv WHERE cell_rank <= nprobe GROUP BY nprobe, qid
        |)
        |SELECT nprobe,
        |  CAST(sum(len(list_intersect(ivf_ids, exact_ids))) AS DOUBLE)
        |    / 200.0 AS avg_recall,
        |  CAST(sum(n_candidates) AS DOUBLE) / 20.0 AS avg_candidates
        |FROM pl JOIN exact USING (qid)
        |GROUP BY nprobe ORDER BY nprobe""".stripMargin,
    "emb_cell_balance" ->
      """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
        |seeds AS (
        |  SELECT vec_id AS seed_vid, embedding AS seed_e,
        |    row_number() OVER (ORDER BY
        |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |        AS BIGINT), vec_id) - 1 AS cell
        |  FROM emb
        |  ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |    AS BIGINT), vec_id
        |  LIMIT 16
        |), assigned AS (
        |  SELECT e.vec_id,
        |    -(max(struct_pack(
        |        dp := list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |          CAST(s.seed_e AS DOUBLE[])),
        |        negc := -s.cell))).negc AS cell
        |  FROM emb e CROSS JOIN seeds s GROUP BY e.vec_id
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM emb)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        |FROM assigned, tot GROUP BY cell, n_total
        |ORDER BY cell""".stripMargin,
    "text_rare_span" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, i, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(
        |    generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), bg AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cbg
        |  FROM grams GROUP BY w1, w2
        |), sc AS (
        |  SELECT g.doc_id, g.i, b.cbg
        |  FROM grams g JOIN bg b ON b.w1 = g.w1 AND b.w2 = g.w2
        |), win AS (
        |  SELECT doc_id, i,
        |    sum(cbg) OVER f AS span_freq_sum,
        |    count(*) OVER f AS span_n
        |  FROM sc
        |  WINDOW f AS (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING)
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST((min(struct_pack(s := span_freq_sum, i := i))).i AS BIGINT)
        |    AS span_start,
        |  CAST((min(struct_pack(s := span_freq_sum, i := i))).s AS BIGINT)
        |    AS span_freq_sum
        |FROM win WHERE span_n = 20
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // deterministic geometric levels from the cross-engine 60-bit hash;
    // exact top-4 per (layer, src) with dst-id tie-break
    "ann_hnsw_layers" ->
      """WITH lv AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM embeddings
        |), lev AS (
        |  SELECT vec_id, e,
        |    CASE WHEN h % 4096 = 0 THEN 3 WHEN h % 256 = 0 THEN 2
        |         WHEN h % 16 = 0 THEN 1 ELSE 0 END AS level
        |  FROM lv
        |), mem AS (
        |  SELECT vec_id, e, CAST(layer AS INT) AS layer
        |  FROM lev,
        |    LATERAL (SELECT unnest(generate_series(1, level)) AS layer) s
        |  WHERE level >= 1
        |), pairs AS (
        |  SELECT a.layer, a.vec_id AS src, b.vec_id AS dst,
        |    list_dot_product(a.e, b.e) AS cosine
        |  FROM mem a JOIN mem b
        |    ON a.layer = b.layer AND a.vec_id <> b.vec_id
        |), ranked AS (
        |  SELECT layer, src, dst, cosine, CAST(row_number() OVER (
        |    PARTITION BY layer, src ORDER BY cosine DESC, dst) AS INT)
        |    AS rank
        |  FROM pairs
        |)
        |SELECT layer, src, rank, dst, cosine FROM ranked
        |WHERE rank <= 4 ORDER BY layer, src, rank""".stripMargin,
    // fixed-window (8-token, stride-1) repeated-span census over the
    // planted-near-dup corpus; windows keyed by the 60-bit md5 hash
    "dedup_exact_substring" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'planted near duplicate copy ' || text AS text
        |  FROM documents WHERE doc_id < 10
        |), docs AS (
        |  SELECT * FROM d0 UNION ALL SELECT * FROM planted
        |), toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM docs
        |), wins AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(array_to_string(
        |      t[i : i + 7], ' ')), 1, 15) AS BIGINT) AS h
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      CAST(len(t) AS INT) - 7)) AS i) s
        |  WHERE len(t) >= 8
        |)
        |SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY h""".stripMargin,
    // pool recall (brute-force top-10 dots) → per-pair feature blend:
    // 0.6·cosine + 0.3·token-jaccard + 0.1·length-ratio, exact integer
    // set sizes, fixed-order double arithmetic
    "retrieval_rerank_crossenc" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
        |  WHERE vec_id = 0
        |), cand AS (
        |  SELECT vec_id,
        |    list_dot_product(CAST(embedding AS DOUBLE[]), q.qe) AS cosine
        |  FROM embeddings, q WHERE vec_id <> 0
        |  ORDER BY cosine DESC, vec_id LIMIT 10
        |), toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), qtok AS (
        |  SELECT DISTINCT unnest(t) AS tok FROM toks WHERE doc_id = 0
        |), qstats AS (
        |  SELECT (SELECT count(*) FROM qtok) AS nq,
        |    (SELECT len(t) FROM toks WHERE doc_id = 0) AS qlen
        |), ctok AS (
        |  SELECT c.vec_id, tk.tok
        |  FROM cand c JOIN toks d ON d.doc_id = c.vec_id,
        |    LATERAL (SELECT DISTINCT unnest(d.t) AS tok) tk
        |), inter AS (
        |  SELECT c.vec_id, count(*) AS ni
        |  FROM (SELECT DISTINCT vec_id, tok FROM ctok) c
        |  JOIN qtok q USING (tok) GROUP BY 1
        |), dstats AS (
        |  SELECT c.vec_id,
        |    (SELECT count(DISTINCT tok) FROM ctok x
        |      WHERE x.vec_id = c.vec_id) AS nd,
        |    (SELECT len(t) FROM toks WHERE doc_id = c.vec_id) AS dlen
        |  FROM cand c
        |), feat AS (
        |  SELECT c.vec_id, c.cosine,
        |    CAST(coalesce(i.ni, 0) AS DOUBLE)
        |      / CAST(d.nd + s.nq - coalesce(i.ni, 0) AS DOUBLE) AS jaccard,
        |    CAST(least(d.dlen, s.qlen) AS DOUBLE)
        |      / CAST(greatest(d.dlen, s.qlen) AS DOUBLE) AS len_ratio
        |  FROM cand c
        |  LEFT JOIN inter i ON i.vec_id = c.vec_id
        |  JOIN dstats d ON d.vec_id = c.vec_id, qstats s
        |)
        |SELECT CAST(row_number() OVER (
        |    ORDER BY 0.6 * cosine + 0.3 * jaccard + 0.1 * len_ratio DESC,
        |      vec_id) AS INT) AS rank,
        |  vec_id, cosine, jaccard, len_ratio,
        |  0.6 * cosine + 0.3 * jaccard + 0.1 * len_ratio AS score
        |FROM feat
        |ORDER BY rank""".stripMargin,
    // IVFADC = the ann_ivf_det_topk cell CTEs ∘ the ann_pq_adc_topk
    // code CTEs, joined on the probed cells
    "ann_ivf_pq_topk" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), seeds AS (
        |  SELECT seed_vid, seed_e,
        |    CAST(row_number() OVER (ORDER BY h, seed_vid) - 1 AS BIGINT)
        |      AS cell
        |  FROM (
        |    SELECT vec_id AS seed_vid, e AS seed_e,
        |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) AS h
        |    FROM emb ORDER BY h, vec_id LIMIT 16)
        |), assigned AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT emb.vec_id, s.cell,
        |      row_number() OVER (PARTITION BY emb.vec_id
        |        ORDER BY list_dot_product(emb.e, s.seed_e) DESC, s.cell)
        |        AS rn
        |    FROM emb, seeds s) WHERE rn = 1
        |), qe AS (SELECT e AS q FROM emb WHERE vec_id = 0
        |), probes AS (
        |  SELECT cell FROM seeds, qe
        |  ORDER BY list_dot_product(seed_e, q) DESC, cell LIMIT 4
        |), aa AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS amax
        |  FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / amax)) AS INT))
        |      AS qv
        |  FROM aa WHERE amax > 0
        |), cb AS (
        |  SELECT m, k, d,
        |    CAST(CAST('0x' || substr(md5('pq:' || m || ':' || k || ':'
        |      || d), 1, 15) AS BIGINT) % 256 - 128 AS INT) AS c
        |  FROM (SELECT unnest(generate_series(0, 7)) AS m),
        |       (SELECT unnest(generate_series(0, 15)) AS k),
        |       (SELECT unnest(generate_series(0, 7)) AS d)
        |), sub AS (
        |  SELECT vec_id, m, d, qv[m * 8 + d + 1] AS qd
        |  FROM qz, (SELECT unnest(generate_series(0, 7)) AS m) mm,
        |       (SELECT unnest(generate_series(0, 7)) AS d) dd
        |), dist AS (
        |  SELECT vec_id, s.m, cb.k, sum(abs(qd - c)) AS dist
        |  FROM sub s JOIN cb ON cb.m = s.m AND cb.d = s.d
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT vec_id, m, k, dist,
        |    row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, k) AS rn
        |  FROM dist
        |), codes AS (
        |  SELECT vec_id, m, k FROM best WHERE rn = 1
        |), qlut AS (
        |  SELECT s.m, cb.k, CAST(sum(abs(qd - c)) AS BIGINT) AS qdist
        |  FROM sub s JOIN cb ON cb.m = s.m AND cb.d = s.d
        |  WHERE s.vec_id = 0
        |  GROUP BY 1, 2
        |)
        |SELECT c.vec_id, asg.cell, CAST(sum(l.qdist) AS BIGINT) AS adc_dist
        |FROM codes c
        |JOIN qlut l ON l.m = c.m AND l.k = c.k
        |JOIN assigned asg ON asg.vec_id = c.vec_id
        |JOIN probes USING (cell)
        |WHERE c.vec_id <> 0
        |GROUP BY 1, 2
        |ORDER BY adc_dist, c.vec_id LIMIT 10""".stripMargin,
    // per-doc green-bigram census: prev-token-seeded md5 PRF, γ = 1/4
    "text_watermark_detect" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents
        |), ft AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    CASE WHEN CAST('0x' || substr(md5(
        |      array_to_string(t[i : i + 1], ' ')), 1, 15) AS BIGINT)
        |      % 4 = 0 THEN 1 ELSE 0 END AS g
        |  FROM ft,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      CAST(len(t) AS INT) - 1)) AS i) s
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
        |  CAST(sum(g) AS BIGINT) AS n_green,
        |  CAST(sum(g) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS green_frac,
        |  (CAST(sum(g) AS DOUBLE) - 0.25 * CAST(count(*) AS DOUBLE))
        |    / sqrt(CAST(count(*) AS DOUBLE) * 0.1875) AS z
        |FROM bg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // pass@k in the stable product form; NULL below k trials, exact 1.0
    // when fewer than k failures exist
    "eval_pass_at_k" ->
      """WITH t AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM events GROUP BY 1
        |)
        |SELECT user_id, n, c,
        |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pass1,
        |  CASE WHEN n < 5 THEN NULL
        |       WHEN n - c < 5 THEN 1.0
        |       ELSE 1.0 - (
        |         ((CAST(n - c AS DOUBLE) - 0.0) / (CAST(n AS DOUBLE) - 0.0))
        |         * ((CAST(n - c AS DOUBLE) - 1.0) / (CAST(n AS DOUBLE) - 1.0))
        |         * ((CAST(n - c AS DOUBLE) - 2.0) / (CAST(n AS DOUBLE) - 2.0))
        |         * ((CAST(n - c AS DOUBLE) - 3.0) / (CAST(n AS DOUBLE) - 3.0))
        |         * ((CAST(n - c AS DOUBLE) - 4.0) / (CAST(n AS DOUBLE) - 4.0)))
        |  END AS pass5
        |FROM t ORDER BY user_id""".stripMargin,
    // clipped n-gram overlap pair grain shared by ROUGE-N and BLEU;
    // exact BIGINT counts, ratios double then ONE cast to REAL
    "eval_rouge_n" ->
      """WITH toks AS (
        |  SELECT doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_cand,
        |    string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents WHERE doc_id < 400
        |), grams AS (
        |  SELECT pair_id, is_cand, 1 AS n, t[i] AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
        |  UNION ALL
        |  SELECT pair_id, is_cand, 2 AS n,
        |    concat_ws(' ', t[i], t[i + 1]) AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), cnt AS (
        |  SELECT pair_id, n, gram,
        |    CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN is_cand THEN 0 ELSE 1 END) AS BIGINT) AS r
        |  FROM grams GROUP BY 1, 2, 3
        |), agg AS (
        |  SELECT pair_id, n, CAST(sum(least(c, r)) AS BIGINT) AS overlap,
        |    CAST(sum(c) AS BIGINT) AS cand_ngrams,
        |    CAST(sum(r) AS BIGINT) AS ref_ngrams
        |  FROM cnt GROUP BY 1, 2
        |)
        |SELECT pair_id, n, overlap, cand_ngrams, ref_ngrams,
        |  CAST(CASE WHEN cand_ngrams > 0
        |    THEN CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE)
        |    ELSE 0.0 END AS REAL) AS prec,
        |  CAST(CASE WHEN ref_ngrams > 0
        |    THEN CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE)
        |    ELSE 0.0 END AS REAL) AS rec,
        |  CAST(CASE WHEN
        |    (CASE WHEN cand_ngrams > 0
        |      THEN CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE)
        |      ELSE 0.0 END)
        |    + (CASE WHEN ref_ngrams > 0
        |      THEN CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE)
        |      ELSE 0.0 END) > 0
        |    THEN 2.0
        |      * (CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
        |      * (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE))
        |      / ((CAST(overlap AS DOUBLE) / CAST(cand_ngrams AS DOUBLE))
        |        + (CAST(overlap AS DOUBLE) / CAST(ref_ngrams AS DOUBLE)))
        |    ELSE 0.0 END AS REAL) AS f1
        |FROM agg ORDER BY pair_id, n""".stripMargin,
    // BLEU-2: same clipped grain pivoted per pair; zero clip => 0.0
    "eval_bleu" ->
      """WITH toks AS (
        |  SELECT doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_cand,
        |    string_split(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents WHERE doc_id < 400
        |), grams AS (
        |  SELECT pair_id, is_cand, 1 AS n, t[i] AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
        |  UNION ALL
        |  SELECT pair_id, is_cand, 2 AS n,
        |    concat_ws(' ', t[i], t[i + 1]) AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  WHERE len(t) >= 2
        |), cnt AS (
        |  SELECT pair_id, n, gram,
        |    CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN is_cand THEN 0 ELSE 1 END) AS BIGINT) AS r
        |  FROM grams GROUP BY 1, 2, 3
        |), agg AS (
        |  SELECT pair_id, n, CAST(sum(least(c, r)) AS BIGINT) AS overlap,
        |    CAST(sum(c) AS BIGINT) AS cand_ngrams,
        |    CAST(sum(r) AS BIGINT) AS ref_ngrams
        |  FROM cnt GROUP BY 1, 2
        |), piv AS (
        |  SELECT pair_id,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN overlap END), 0)
        |      AS BIGINT) AS clip1,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN cand_ngrams END), 0)
        |      AS BIGINT) AS cand_len,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN ref_ngrams END), 0)
        |      AS BIGINT) AS ref_len,
        |    CAST(coalesce(sum(CASE WHEN n = 2 THEN overlap END), 0)
        |      AS BIGINT) AS clip2,
        |    CAST(coalesce(sum(CASE WHEN n = 2 THEN cand_ngrams END), 0)
        |      AS BIGINT) AS cand_bigrams
        |  FROM agg GROUP BY pair_id
        |), sc AS (
        |  SELECT pair_id, cand_len, ref_len, clip1, clip2, cand_bigrams,
        |    CASE WHEN cand_len = 0 THEN 0.0
        |         WHEN cand_len >= ref_len THEN 1.0
        |         ELSE exp(1.0 - CAST(ref_len AS DOUBLE)
        |           / CAST(cand_len AS DOUBLE)) END AS bpd
        |  FROM piv
        |)
        |SELECT pair_id, cand_len, ref_len, clip1, clip2, cand_bigrams,
        |  CAST(bpd AS REAL) AS bp,
        |  CAST(CASE WHEN clip1 > 0 AND clip2 > 0
        |    THEN bpd * exp((
        |      ln(CAST(clip1 AS DOUBLE) / CAST(cand_len AS DOUBLE)) +
        |      ln(CAST(clip2 AS DOUBLE) / CAST(cand_bigrams AS DOUBLE))
        |    ) / 2.0)
        |    ELSE 0.0 END AS REAL) AS bleu
        |FROM sc ORDER BY pair_id""".stripMargin,
    // chrF2: char 1..3-gram clipped overlaps on whitespace-stripped
    // text; per-order P/R averaged (empty order contributes 0), beta=2
    "eval_chrf" ->
      """WITH toks AS (
        |  SELECT doc_id // 2 AS pair_id, doc_id % 2 = 0 AS is_cand,
        |    replace(
        |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
        |      ' ', '') AS s
        |  FROM documents WHERE doc_id < 400
        |), grams AS (
        |  SELECT pair_id, is_cand, 1 AS n, substring(s, i, 1) AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, length(s))) AS i) a
        |  WHERE length(s) >= 1
        |  UNION ALL
        |  SELECT pair_id, is_cand, 2 AS n, substring(s, i, 2) AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, length(s) - 1)) AS i) a
        |  WHERE length(s) >= 2
        |  UNION ALL
        |  SELECT pair_id, is_cand, 3 AS n, substring(s, i, 3) AS gram
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(1, length(s) - 2)) AS i) a
        |  WHERE length(s) >= 3
        |), cnt AS (
        |  SELECT pair_id, n, gram,
        |    CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN is_cand THEN 0 ELSE 1 END) AS BIGINT) AS r
        |  FROM grams GROUP BY 1, 2, 3
        |), agg AS (
        |  SELECT pair_id, n, CAST(sum(least(c, r)) AS BIGINT) AS overlap,
        |    CAST(sum(c) AS BIGINT) AS cand_ngrams,
        |    CAST(sum(r) AS BIGINT) AS ref_ngrams
        |  FROM cnt GROUP BY 1, 2
        |), piv AS (
        |  SELECT pair_id,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN overlap END), 0)
        |      AS BIGINT) AS clip1,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN cand_ngrams END), 0)
        |      AS BIGINT) AS cand1,
        |    CAST(coalesce(sum(CASE WHEN n = 1 THEN ref_ngrams END), 0)
        |      AS BIGINT) AS ref1,
        |    CAST(coalesce(sum(CASE WHEN n = 2 THEN overlap END), 0)
        |      AS BIGINT) AS clip2,
        |    CAST(coalesce(sum(CASE WHEN n = 2 THEN cand_ngrams END), 0)
        |      AS BIGINT) AS cand2,
        |    CAST(coalesce(sum(CASE WHEN n = 2 THEN ref_ngrams END), 0)
        |      AS BIGINT) AS ref2,
        |    CAST(coalesce(sum(CASE WHEN n = 3 THEN overlap END), 0)
        |      AS BIGINT) AS clip3,
        |    CAST(coalesce(sum(CASE WHEN n = 3 THEN cand_ngrams END), 0)
        |      AS BIGINT) AS cand3,
        |    CAST(coalesce(sum(CASE WHEN n = 3 THEN ref_ngrams END), 0)
        |      AS BIGINT) AS ref3
        |  FROM agg GROUP BY pair_id
        |), sc AS (
        |  SELECT *,
        |    ((CASE WHEN cand1 > 0
        |        THEN CAST(clip1 AS DOUBLE) / CAST(cand1 AS DOUBLE)
        |        ELSE 0.0 END)
        |     + (CASE WHEN cand2 > 0
        |        THEN CAST(clip2 AS DOUBLE) / CAST(cand2 AS DOUBLE)
        |        ELSE 0.0 END)
        |     + (CASE WHEN cand3 > 0
        |        THEN CAST(clip3 AS DOUBLE) / CAST(cand3 AS DOUBLE)
        |        ELSE 0.0 END)) / 3.0 AS p,
        |    ((CASE WHEN ref1 > 0
        |        THEN CAST(clip1 AS DOUBLE) / CAST(ref1 AS DOUBLE)
        |        ELSE 0.0 END)
        |     + (CASE WHEN ref2 > 0
        |        THEN CAST(clip2 AS DOUBLE) / CAST(ref2 AS DOUBLE)
        |        ELSE 0.0 END)
        |     + (CASE WHEN ref3 > 0
        |        THEN CAST(clip3 AS DOUBLE) / CAST(ref3 AS DOUBLE)
        |        ELSE 0.0 END)) / 3.0 AS r
        |  FROM piv
        |)
        |SELECT pair_id, clip1, cand1, ref1, clip2, cand2, ref2,
        |  clip3, cand3, ref3,
        |  CAST(p AS REAL) AS chr_p, CAST(r AS REAL) AS chr_r,
        |  CAST(CASE WHEN 4.0 * p + r > 0
        |    THEN 5.0 * p * r / (4.0 * p + r)
        |    ELSE 0.0 END AS REAL) AS chrf2
        |FROM sc ORDER BY pair_id""".stripMargin,
    // exact BIGINT moments; ONE double division at the end
    "emb_covariance_int" ->
      """WITH q AS (
        |  SELECT list_transform(embedding[1:8],
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
        |    AS q6
        |  FROM embeddings
        |), p AS (
        |  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |    q6[i] AS xi, q6[j] AS xj
        |  FROM q, (SELECT unnest(generate_series(1, 8)) AS i) a,
        |       (SELECT unnest(generate_series(1, 8)) AS j) b
        |  WHERE j >= i
        |), a2 AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xi * xj) AS BIGINT) AS sxy,
        |    CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(xj) AS BIGINT) AS sy
        |  FROM p GROUP BY i, j
        |)
        |SELECT i, j, n, sxy, sx, sy,
        |  CAST(n * CAST(sxy AS HUGEINT)
        |      - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / (CAST(n * n AS DOUBLE) * 1e12) AS cov
        |FROM a2 ORDER BY i, j""".stripMargin,
    // the ts_autocorr_lag1 Pearson-over-pairs form at lags 1..5, plus
    // the Ljung-Box Q term n(n+2)·ρ²/(n−k) per row
    "ts_ljung_box_terms" ->
      """WITH l AS (
        |  SELECT user_id, value AS y,
        |    lag(value, 1) OVER w AS x1, lag(value, 2) OVER w AS x2,
        |    lag(value, 3) OVER w AS x3, lag(value, 4) OVER w AS x4,
        |    lag(value, 5) OVER w AS x5
        |  FROM events WHERE user_id < 100
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), st AS (
        |  SELECT user_id, 1 AS lag, x1 AS x, y FROM l WHERE x1 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 2, x2, y FROM l WHERE x2 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 3, x3, y FROM l WHERE x3 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 4, x4, y FROM l WHERE x4 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 5, x5, y FROM l WHERE x5 IS NOT NULL
        |), a AS (
        |  SELECT user_id, lag, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM st GROUP BY user_id, lag
        |), r AS (
        |  SELECT user_id, CAST(lag AS INT) AS lag,
        |    CAST(n AS BIGINT) AS n_pairs,
        |    CAST((n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |      AS REAL) AS rho,
        |    n + lag AS nser
        |  FROM a
        |)
        |SELECT user_id, lag, n_pairs, rho,
        |  CAST((nser * (nser + 2.0))
        |    * (CAST(rho AS DOUBLE) * CAST(rho AS DOUBLE))
        |    / (nser - CAST(lag AS DOUBLE)) AS REAL) AS q_term
        |FROM r ORDER BY user_id, lag""".stripMargin,
    // 16 ±1-hashed counters over per-user counts; all-integer until the
    // final relative-error division
    "agg_ams_f2" ->
      """WITH f AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS f
        |  FROM events GROUP BY user_id
        |), ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM f),
        |t AS (
        |  SELECT c.counter,
        |    CASE WHEN CAST('0x' || substr(md5(
        |      CAST(user_id AS VARCHAR) || ':ams:' ||
        |      CAST(c.counter AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
        |      THEN f ELSE -f END AS term
        |  FROM f, (SELECT unnest(generate_series(0, 15)) AS counter) c
        |), s AS (
        |  SELECT CAST(counter AS INT) AS counter,
        |    CAST(sum(term) AS BIGINT) AS s
        |  FROM t GROUP BY counter
        |)
        |SELECT counter, s, s * s AS s2, f2_exact,
        |  CAST(s * s - f2_exact AS DOUBLE) / CAST(f2_exact AS DOUBLE)
        |    AS rel_err
        |FROM s, ex ORDER BY counter""".stripMargin,
    // open/close by fixed-width (micros, event_id) lexicographic argmin;
    // the streaming candle drain equals the batch table, sharing the text
    "ts_ohlc_hourly" -> ohlcHourlySql,
    "stream_ohlc_candles" -> ohlcHourlySql,
    // boundary after token i where the 4-gram hash lands in the 1/32
    // bucket, forced end at len; chunks between consecutive boundaries
    "text_cdc_chunking" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'planted near duplicate copy ' || text AS text
        |  FROM documents WHERE doc_id < 10
        |), docs AS (SELECT * FROM d0 UNION ALL SELECT * FROM planted),
        |toks AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM docs
        |), ft AS (SELECT doc_id, t FROM toks WHERE len(t) >= 1),
        |ends AS (
        |  SELECT doc_id, t, i
        |  FROM ft,
        |    LATERAL (SELECT unnest(generate_series(1,
        |      CAST(len(t) AS INT))) AS i) s
        |  WHERE i = len(t) OR (i >= 4 AND
        |    CAST('0x' || substr(md5(array_to_string(
        |      t[i - 3 : i], ' ')), 1, 15) AS BIGINT) % 32 = 0)
        |), spans AS (
        |  SELECT doc_id, t,
        |    CAST(row_number() OVER w - 1 AS INT) AS chunk_idx,
        |    CAST(coalesce(lag(i) OVER w + 1, 1) AS INT) AS start_tok,
        |    CAST(i - coalesce(lag(i) OVER w + 1, 1) + 1 AS INT) AS n_toks,
        |    i AS e
        |  FROM ends
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        |)
        |SELECT doc_id, chunk_idx, start_tok, n_toks,
        |  CAST('0x' || substr(md5(array_to_string(
        |    t[start_tok : e], ' ')), 1, 15) AS BIGINT) AS chunk_hash
        |FROM spans ORDER BY doc_id, chunk_idx""".stripMargin,
    // exact joint/marginal counts; one ln per cell, REAL-cast
    "feature_mutual_info_terms" ->
      """WITH ev AS (
        |  SELECT event_type AS x,
        |    CAST(floor(value / 25.0) AS INT) AS y
        |  FROM events
        |), joint AS (
        |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM ev GROUP BY x, y
        |), mx AS (SELECT x, CAST(count(*) AS BIGINT) AS n_x FROM ev GROUP BY x),
        |my AS (SELECT y, CAST(count(*) AS BIGINT) AS n_y FROM ev GROUP BY y),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev)
        |SELECT j.x, j.y, j.n_xy, mx.n_x, my.n_y, tot.n,
        |  CAST((CAST(j.n_xy AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |    * ln(CAST(j.n_xy * tot.n AS DOUBLE)
        |      / CAST(mx.n_x * my.n_y AS DOUBLE)) AS REAL) AS mi_term
        |FROM joint j JOIN mx USING (x) JOIN my USING (y), tot
        |ORDER BY x, y""".stripMargin,
    // inverse-CDF Laplace draw from the 60-bit hash of the category
    "dq_dp_laplace_counts" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1
        |), u AS (
        |  SELECT event_type, n_exact,
        |    CAST(CAST('0x' || substr(md5(event_type || ':dp'), 1, 15)
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
        |  FROM g
        |), nz AS (
        |  SELECT event_type, n_exact, u,
        |    CAST(-2.0 * sign(u - 0.5)
        |      * ln(1.0 - 2.0 * abs(u - 0.5)) AS REAL) AS noise
        |  FROM u
        |)
        |SELECT event_type, n_exact, u, noise,
        |  CAST(CAST(n_exact AS DOUBLE) + CAST(noise AS DOUBLE) AS REAL)
        |    AS n_noisy
        |FROM nz ORDER BY event_type""".stripMargin,
    // sd = √(N·Σv²−(Σv)²)/N/10³ on exact BIGINT moments; tmass folds in
    // sorted stratum order; largest-remainder rounding is integer-exact
    "sample_neyman_allocation" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(sum(v3) AS BIGINT) AS s1,
        |    CAST(sum(v3 * v3) AS BIGINT) AS s2
        |  FROM ev GROUP BY 1
        |), sdd AS (
        |  SELECT event_type, n_h,
        |    sqrt(CAST(n_h * CAST(s2 AS HUGEINT)
        |      - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
        |      / CAST(n_h AS DOUBLE) / 1000.0 AS sd
        |  FROM m
        |), tot AS (
        |  SELECT list_aggregate(
        |    list(CAST(n_h AS DOUBLE) * sd ORDER BY event_type), 'sum')
        |    AS tmass
        |  FROM sdd
        |), ideal AS (
        |  SELECT event_type, n_h, sd,
        |    1000.0 * ((CAST(n_h AS DOUBLE) * sd) / tmass) AS ideal
        |  FROM sdd, tot
        |), fl AS (
        |  SELECT event_type, n_h, sd, ideal,
        |    CAST(floor(ideal) AS BIGINT) AS n_floor,
        |    ideal - CAST(floor(ideal) AS BIGINT) AS rem
        |  FROM ideal
        |), lo AS (SELECT 1000 - CAST(sum(n_floor) AS BIGINT) AS lo FROM fl)
        |SELECT event_type, n_h, CAST(sd AS REAL) AS sd,
        |  CAST(ideal AS REAL) AS ideal,
        |  n_floor + CASE WHEN row_number() OVER (
        |    ORDER BY rem DESC, event_type) <= lo THEN 1 ELSE 0 END
        |    AS n_alloc
        |FROM fl, lo ORDER BY event_type""".stripMargin,
    // the common-neighbors wedge machinery with 1/ln(center degree)
    // weights; top-k still ranked on the INTEGER count
    "graph_adamic_adar" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), edges AS (
        |  SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |), sym AS (
        |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
        |), deg AS (
        |  SELECT u AS x, count(*) AS deg FROM sym GROUP BY u
        |), cohort AS (
        |  SELECT u, v FROM sym WHERE v % 16 = 0
        |), wed AS (
        |  SELECT a.u AS z, a.v AS u2, b.v AS v2
        |  FROM cohort a JOIN cohort b ON a.u = b.u AND a.v < b.v
        |), scored AS (
        |  SELECT u2, v2, CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(1.0 / ln(CAST(d.deg AS DOUBLE))) AS REAL)
        |      AS adamic_adar
        |  FROM wed JOIN deg d ON d.x = wed.z
        |  GROUP BY u2, v2
        |), na AS (
        |  SELECT * FROM scored WHERE NOT EXISTS (
        |    SELECT 1 FROM edges e WHERE e.u = scored.u2 AND e.v = scored.v2)
        |)
        |SELECT u2 AS u, v2 AS v, cn, adamic_adar FROM na
        |ORDER BY cn DESC, u, v LIMIT 20""".stripMargin,
    // fitted_i = max_{a<=i} min_{b>=i} weighted interval mean — the
    // minimax closed form of PAV; every mean is one double division of
    // exact integer sums
    "ml_isotonic_calibration" ->
      """WITH s AS (
        |  SELECT least(greatest(CAST(embedding[1] AS DOUBLE) * 2.0 + 0.5,
        |      0.0), 0.9999) AS score, label
        |  FROM embeddings
        |), bins AS (
        |  SELECT CAST(floor(score * 10) AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN label % 2 = 1 THEN 1 END) AS BIGINT)
        |      AS n_pos
        |  FROM s GROUP BY 1
        |), iv AS (
        |  SELECT a.bin AS a, b.bin AS b2,
        |    CAST(sum(c.n_pos) AS DOUBLE) / CAST(sum(c.n) AS DOUBLE) AS avg
        |  FROM bins a JOIN bins b ON a.bin <= b.bin
        |  JOIN bins c ON c.bin BETWEEN a.bin AND b.bin
        |  GROUP BY a.bin, b.bin
        |), mn AS (
        |  SELECT i.bin AS i, iv.a, min(iv.avg) AS minavg
        |  FROM iv JOIN bins i ON iv.a <= i.bin AND iv.b2 >= i.bin
        |  GROUP BY i.bin, iv.a
        |), ft AS (
        |  SELECT i, max(minavg) AS fitted FROM mn GROUP BY i
        |)
        |SELECT b.bin, b.n, b.n_pos,
        |  CAST(b.n_pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
        |  ft.fitted
        |FROM bins b JOIN ft ON ft.i = b.bin
        |ORDER BY b.bin""".stripMargin,
    // the filter recurrence replayed as a recursive CTE — identical
    // parenthesization and (ts, event_id) order ⇒ bit-identical doubles;
    // the STREAMING twin drains to the same rows, so it shares the text
    "ts_kalman_1d" -> kalmanRecurrenceSql,
    "stream_kalman_filter" -> kalmanRecurrenceSql,
    // BIGINT rolling sums (order-independent under segment-tree sliding
    // windows); breakout verdicts cross-multiplied onto exact integers
    "window_bollinger_bands" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events WHERE user_id < 50
        |), m AS (
        |  SELECT user_id, event_id, value, v3,
        |    CAST(count(*) OVER w AS BIGINT) AS n_win,
        |    CAST(sum(v3) OVER w AS BIGINT) AS s,
        |    CAST(sum(v3 * v3) OVER w AS BIGINT) AS q
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, event_id, value, n_win,
        |  CAST(s AS DOUBLE) / (CAST(n_win AS DOUBLE) * 1000.0) AS mean,
        |  sqrt(CAST(n_win * q - s * s AS DOUBLE)) / CAST(n_win AS DOUBLE)
        |    / 1000.0 AS sd,
        |  CASE WHEN n_win < 20 THEN FALSE
        |    ELSE v3 * n_win - s > 0 AND (v3 * n_win - s) * (v3 * n_win - s)
        |      > 4 * (n_win * q - s * s) END AS above_upper,
        |  CASE WHEN n_win < 20 THEN FALSE
        |    ELSE v3 * n_win - s < 0 AND (v3 * n_win - s) * (v3 * n_win - s)
        |      > 4 * (n_win * q - s * s) END AS below_lower
        |FROM m ORDER BY user_id, event_id""".stripMargin,
    // median/MAD are picks from sorted ×10³ integers; DuckDB's vals[4]
    // is NULL when the frame has < 4 rows (user with ≤ 3 events), and
    // the Spark side when-guards its element_at to the same NULL
    "window_hampel_filter" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(round(value * 1000.0) AS BIGINT) AS v3
        |  FROM events WHERE user_id < 50
        |), m AS (
        |  SELECT user_id, event_id, value, v3,
        |    CAST(count(*) OVER w AS BIGINT) AS n_win,
        |    list_sort(list(v3) OVER w) AS vals
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), m2 AS (
        |  SELECT user_id, event_id, value, v3, n_win,
        |    vals[4] AS med3,
        |    (list_sort(list_transform(vals, x -> abs(x - vals[4]))))[4]
        |      AS mad3
        |  FROM m
        |), m3 AS (
        |  SELECT user_id, event_id, value,
        |    CAST(med3 AS DOUBLE) / 1000.0 AS median,
        |    CAST(mad3 AS DOUBLE) / 1000.0 AS mad,
        |    CASE WHEN n_win < 7 THEN FALSE
        |      ELSE CAST(abs(v3 - med3) AS DOUBLE)
        |        > 3.0 * 1.4826 * CAST(mad3 AS DOUBLE) END AS is_outlier
        |  FROM m2
        |)
        |SELECT user_id, event_id, value, median, mad, is_outlier,
        |  CASE WHEN is_outlier THEN median ELSE value END AS cleaned
        |FROM m3 ORDER BY user_id, event_id""".stripMargin,
    // the ljung-box ρ front end, pivoted, then the Durbin–Levinson
    // layers with the SAME parenthesization as the Column expressions
    "ts_pacf_durbin_levinson" ->
      """WITH l AS (
        |  SELECT user_id, value AS y,
        |    lag(value, 1) OVER w AS x1, lag(value, 2) OVER w AS x2,
        |    lag(value, 3) OVER w AS x3, lag(value, 4) OVER w AS x4,
        |    lag(value, 5) OVER w AS x5
        |  FROM events WHERE user_id < 100
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), st AS (
        |  SELECT user_id, 1 AS lag, x1 AS x, y FROM l WHERE x1 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 2, x2, y FROM l WHERE x2 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 3, x3, y FROM l WHERE x3 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 4, x4, y FROM l WHERE x4 IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, 5, x5, y FROM l WHERE x5 IS NOT NULL
        |), a AS (
        |  SELECT user_id, lag, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM st GROUP BY user_id, lag
        |), r AS (
        |  SELECT user_id, lag,
        |    CAST((n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |      AS REAL) AS rho
        |  FROM a
        |), piv AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN lag = 1 THEN rho END) AS DOUBLE) AS r1,
        |    CAST(max(CASE WHEN lag = 2 THEN rho END) AS DOUBLE) AS r2,
        |    CAST(max(CASE WHEN lag = 3 THEN rho END) AS DOUBLE) AS r3,
        |    CAST(max(CASE WHEN lag = 4 THEN rho END) AS DOUBLE) AS r4,
        |    CAST(max(CASE WHEN lag = 5 THEN rho END) AS DOUBLE) AS r5
        |  FROM r GROUP BY user_id
        |), l1 AS (SELECT *, r1 AS p11 FROM piv),
        |l2 AS (SELECT *,
        |  (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM l1),
        |l2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM l2),
        |l3 AS (SELECT *,
        |  (r3 - (p21 * r2 + p22 * r1))
        |    / (1.0 - (p21 * r1 + p22 * r2)) AS p33 FROM l2b),
        |l3b AS (SELECT *, p21 - p33 * p22 AS p31,
        |  p22 - p33 * p21 AS p32 FROM l3),
        |l4 AS (SELECT *,
        |  (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
        |    / (1.0 - (p31 * r1 + p32 * r2 + p33 * r3)) AS p44 FROM l3b),
        |l4b AS (SELECT *, p31 - p44 * p33 AS p41,
        |  p32 - p44 * p32 AS p42, p33 - p44 * p31 AS p43 FROM l4),
        |l5 AS (SELECT *,
        |  (r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))
        |    / (1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4))
        |    AS p55 FROM l4b)
        |SELECT user_id, lag, CAST(p AS REAL) AS pacf FROM (
        |  SELECT user_id, 1 AS lag, p11 AS p FROM l5
        |  UNION ALL SELECT user_id, 2, p22 FROM l5
        |  UNION ALL SELECT user_id, 3, p33 FROM l5
        |  UNION ALL SELECT user_id, 4, p44 FROM l5
        |  UNION ALL SELECT user_id, 5, p55 FROM l5)
        |ORDER BY user_id, lag""".stripMargin,
    // 16 hash-bucket means (exact-rational divisions), median of the
    // sorted 16 (average of the two middle picks)
    "agg_median_of_means" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 1000.0) AS BIGINT) AS v3,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':mom'),
        |      1, 15) AS BIGINT) % 16 AS b
        |  FROM events
        |), means AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(v3) AS DOUBLE)
        |      / (CAST(count(*) AS DOUBLE) * 1000.0) AS mean_b
        |  FROM ev GROUP BY b
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v3) AS DOUBLE)
        |      / (CAST(count(*) AS DOUBLE) * 1000.0) AS plain_mean
        |  FROM ev
        |), ms AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        |    list_sort(list(mean_b)) AS l
        |  FROM means
        |)
        |SELECT tot.n, ms.n_buckets,
        |  CASE WHEN len(l) % 2 = 0
        |    THEN (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0
        |    ELSE l[(len(l) + 1) // 2] END AS median_of_means,
        |  tot.plain_mean
        |FROM ms, tot""".stripMargin,
  )

  /** Hourly OHLC candles — shared by the batch operator and the
    * streaming Complete-mode drain (which equals it row for row). */
  private val ohlcHourlySql: String =
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS hour_ts, value,
        |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
        |      || lpad(CAST(event_id AS VARCHAR), 10, '0') AS skey
        |  FROM events
        |)
        |SELECT hour_ts, CAST(count(*) AS BIGINT) AS n_events,
        |  arg_min(value, skey) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, skey) AS close,
        |  CAST(sum(value) / count(*) AS REAL) AS mean_value
        |FROM ev GROUP BY hour_ts ORDER BY hour_ts""".stripMargin

  /** The greedy debounce recurrence as a recursive CTE — shared by the
    * batch operator and its streaming twin (whose full drain equals the
    * batch query row for row by the batch-equivalence contract). */
  private val debounceRecurrenceSql: String =
      """WITH RECURSIVE errs AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE event_type = 'error'
        |), walk AS (
        |  SELECT user_id, event_id, ts, us, rn, us AS anchor,
        |    TRUE AS emitted
        |  FROM errs WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts, e.us, e.rn,
        |    CASE WHEN e.us - w.anchor >= 1800000000
        |      THEN e.us ELSE w.anchor END,
        |    e.us - w.anchor >= 1800000000
        |  FROM errs e JOIN walk w
        |    ON e.user_id = w.user_id AND e.rn = w.rn + 1
        |)
        |SELECT user_id, event_id, ts FROM walk WHERE emitted
        |ORDER BY user_id, event_id""".stripMargin

  /** The Kalman recurrence as a recursive CTE — shared by the batch
    * operator and its streaming twin (whose full drain equals the batch
    * filter bit for bit by the batch-equivalence contract). */
  private val kalmanRecurrenceSql: String =
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value AS z,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 50
        |), st AS (
        |  -- DOUBLE-cast base literals: bare 1.0 is DECIMAL(2,1) in
        |  -- DuckDB and would round every downstream k/p to one decimal
        |  SELECT user_id, event_id, z, rn,
        |    CAST(1.0 AS DOUBLE) AS k, z AS x, CAST(1.0 AS DOUBLE) AS p
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.z, e.rn,
        |    (s.p + 1.0) / (s.p + 1.0 + 4.0) AS k,
        |    s.x + ((s.p + 1.0) / (s.p + 1.0 + 4.0)) * (e.z - s.x) AS x,
        |    (1.0 - (s.p + 1.0) / (s.p + 1.0 + 4.0)) * (s.p + 1.0) AS p
        |  FROM st s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1
        |)
        |SELECT user_id, event_id, rn, z, k AS k_gain, x AS x_filt
        |FROM st ORDER BY user_id, rn""".stripMargin

  /** Shared CTE block replaying [[graft.query.Dedup.dedupMinhashLsh]]
    * (3-gram shingles, numBands×rowsPerBand md5-60-bit double-hashed
    * minhashes) up to a `pairs(doc_a, doc_b, jaccard)` relation: same
    * planted near-dups, same normalization, same Kirsch–Mitzenmacher
    * family, band buckets by signature-slice equality, exact Jaccard
    * verify ≥ threshold. Bucket values differ from Spark's (xxhash64 of
    * the slice there, the raw joined slice here) but bucket EQUALITY is
    * the same relation, which is all the candidate join observes. */
  private def minhashPairsCtes(numBands: Int, rowsPerBand: Int,
      threshold: String): String = {
    val nh = numBands * rowsPerBand
    s"""base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    'planted near duplicate copy ' || text AS text
       |  FROM documents WHERE doc_id < 10
       |), toks AS (
       |  SELECT doc_id, string_split(
       |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
       |  FROM base
       |), ftoks AS (
       |  SELECT doc_id, t FROM toks WHERE len(t) >= 3
       |), grams AS (
       |  SELECT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS g
       |  FROM ftoks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
       |), gh AS (
       |  -- h1/h2 are the two 60-bit halves of ONE md5 (Spark's
       |  -- MinHashImpl does the same: md5 dominates signature cost)
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(g), 17, 15) AS BIGINT) AS h2
       |  FROM grams
       |), sig AS (
       |  SELECT doc_id, h.i AS hi,
       |    min((h1 + h.i * (h2 >> 5)) & 1152921504606846975) AS mh
       |  FROM gh, LATERAL (SELECT unnest(generate_series(0, ${nh - 1})) AS i) h
       |  GROUP BY doc_id, h.i
       |), bands AS (
       |  SELECT doc_id, hi // $rowsPerBand AS band,
       |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY hi) AS bucket
       |  FROM sig GROUP BY doc_id, hi // $rowsPerBand
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |), sh AS (
       |  -- Jaccard over DISTINCT md5-60-bit gram hashes (h1 above):
       |  -- identical hashing to Spark's shingle_hashes, so set sizes
       |  -- (and even any collision) reproduce bit-identically
       |  SELECT doc_id, list(DISTINCT h1) AS sh FROM gh GROUP BY doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / len(list_distinct(sa.sh || sb.sh)) AS jaccard
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = cand.doc_a
       |  JOIN sh sb ON sb.doc_id = cand.doc_b
       |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / len(list_distinct(sa.sh || sb.sh)) >= $threshold
       |)""".stripMargin
  }

  /** The [[graft.query.Dedup.dedupCascadeReport]] oracle: the shared
    * MinHash pairs chain plus a source-carrying planted base, exact
    * fingerprint keeps, and the pairwise both-survivor near-drop. */
  private def dedupCascadeOracleSql: String =
    s"""WITH ${minhashPairsCtes(8, 4, "0.5")},
       |srcbase AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, source,
       |    'planted near duplicate copy ' || text AS text
       |  FROM documents WHERE doc_id < 10
       |), ex AS (
       |  SELECT doc_id, source,
       |    doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(
       |      regexp_replace(text, '\\s+', ' ', 'g'))))) AS keep_exact
       |  FROM srcbase
       |), nd AS (
       |  SELECT DISTINCT p.doc_b AS doc_id
       |  FROM pairs p
       |  JOIN ex a ON a.doc_id = p.doc_a AND a.keep_exact
       |  JOIN ex b ON b.doc_id = p.doc_b AND b.keep_exact
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN keep_exact THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_after_exact,
       |  CAST(sum(CASE WHEN keep_exact
       |      AND ex.doc_id NOT IN (SELECT doc_id FROM nd)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_near,
       |  CAST(count(*) - sum(CASE WHEN keep_exact THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_exact_dropped,
       |  CAST(sum(CASE WHEN keep_exact THEN 1 ELSE 0 END)
       |    - sum(CASE WHEN keep_exact
       |        AND ex.doc_id NOT IN (SELECT doc_id FROM nd)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dropped
       |FROM ex GROUP BY source ORDER BY source""".stripMargin

  /** Containment verify on the same high-recall 16×2 banding as
    * [[graft.query.Dedup.dedupContainment]]: |A∩B| / min(|A|,|B|). The
    * chain's `pairs` CTE goes unused (threshold 0.0 keeps it harmless);
    * `cand` and `sh` are the shared machinery. */
  /** Unrolled `iters`-round pagerank oracle: DuckDB has no iterative
    * construct that re-aggregates over the recursion, so each damping
    * round is one mechanical CTE (pr1..prN) — the same literal
    * arithmetic the Spark loop runs. Every CTE is MATERIALIZED: DuckDB
    * inlines plain CTEs per reference, so the unrolled chain re-planned
    * the DISTINCT pair self-join once per round and the x10 replay blew
    * the 1800 s sweep timeout; materialization makes the oracle evaluate
    * each stage once (184 s at x10, measured). */
  private def pagerankOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT e.v AS u, 0.15 / nv.n + 0.85 * sum(p.pr / d.deg) AS pr
         |  FROM edges e JOIN pr${i - 1} p ON p.u = e.u JOIN deg d ON d.u = e.u, nv
         |  GROUP BY e.v, nv.n
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |), edges AS MATERIALIZED (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
       |), deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM edges GROUP BY u),
       |nv AS MATERIALIZED (SELECT count(*) AS n FROM deg),
       |pr0 AS MATERIALIZED (SELECT u, 1.0 / n AS pr FROM deg, nv),
       |$rounds
       |SELECT u AS part, CAST(pr AS REAL) AS pagerank
       |FROM pr$iters WHERE u <= 100 ORDER BY part""".stripMargin
  }

  /** [[graft.query.Analytics6.graphKatzCentrality]]: x⁰ = 1, xⁱ(v) =
    * 1 + α·Σ_{u∼v} xⁱ⁻¹(u), `iters` rounds unrolled over the same
    * co-purchase edge CTEs as [[pagerankOracleSql]] (no degree
    * division — Katz counts walks, not a stochastic process). */
  private def katzOracleSql(iters: Int, alpha: String): String = {
    val rounds = (1 to iters).map { i =>
      s"""x$i AS (
         |  SELECT e.v AS u, 1.0 + $alpha * sum(p.x) AS x
         |  FROM edges e JOIN x${i - 1} p ON p.u = e.u
         |  GROUP BY e.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS (
       |  SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |), edges AS (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
       |), verts AS (SELECT DISTINCT u FROM edges),
       |x0 AS (SELECT u, CAST(1.0 AS DOUBLE) AS x FROM verts),
       |$rounds
       |SELECT u AS part, CAST(x AS REAL) AS katz
       |FROM x$iters WHERE u <= 100 ORDER BY part""".stripMargin
  }

  /** [[graft.query.Analytics6.tsCroston]] and its streaming twin: the
    * two-EWMA intermittent-demand recurrence replayed per purchase in
    * (ts, event_id) order; the gap precomputes via lag so only the
    * smoothers live in the recursion. */
  private val crostonRecurrenceSql: String =
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value AS z,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) = 1 THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
        |        / 3600000000.0 END AS q,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 50 AND event_type = 'purchase'
        |), st AS (
        |  SELECT user_id, event_id, z, q, rn, z AS zh, q AS qh
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.z, e.q, e.rn,
        |    s.zh + 0.1 * (e.z - s.zh) AS zh,
        |    s.qh + 0.1 * (e.q - s.qh) AS qh
        |  FROM st s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1
        |)
        |SELECT user_id, event_id, rn, z AS demand, q AS gap_h,
        |  zh AS z_hat, qh AS q_hat, zh / qh AS forecast
        |FROM st ORDER BY user_id, rn""".stripMargin

  /** [[graft.query.Analytics6.tsCusumTarget]] and its streaming twin:
    * the clamped Page recurrence S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (v − 50 − 5))
    * replayed per user in (ts, event_id) order — the
    * [[kalmanRecurrenceSql]] recursive-CTE discipline, identical
    * parenthesization (including the base case's + 0.0). */
  private val cusumTargetRecurrenceSql: String =
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, value AS v,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 50
        |), st AS (
        |  SELECT user_id, event_id, v, rn,
        |    greatest(CAST(0.0 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE) + (v - 50.0 - 5.0)) AS s
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.v, e.rn,
        |    greatest(CAST(0.0 AS DOUBLE), s.s + (e.v - 50.0 - 5.0)) AS s
        |  FROM st s JOIN ev e
        |    ON e.user_id = s.user_id AND e.rn = s.rn + 1
        |)
        |SELECT user_id, event_id, rn, v AS value, s AS s_plus,
        |  s > 200.0 AS alarm
        |FROM st ORDER BY user_id, rn""".stripMargin

  private def containmentOracleSql: String =
    s"""WITH ${minhashPairsCtes(16, 2, "0.0")}
       |SELECT c.doc_a, c.doc_b,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |    / least(len(sa.sh), len(sb.sh)) AS containment
       |FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
       |JOIN sh sb ON sb.doc_id = c.doc_b
       |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |    / least(len(sa.sh), len(sb.sh)) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  private def minhashOracleSql(numBands: Int, rowsPerBand: Int,
      threshold: String): String =
    s"""WITH ${minhashPairsCtes(numBands, rowsPerBand, threshold)}
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components over the near-dup pair graph via a recursive
    * CTE: reachability closure, then min reachable id per node — the
    * declarative twin of Dedup.dedupGroups' min-label propagation. */
  private def dedupGroupsOracleSql: String =
    s"""WITH RECURSIVE ${minhashPairsCtes(8, 4, "0.5")},
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS a, doc_a AS b FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT a FROM edges
       |), reach(a, b) AS (
       |  SELECT a, a FROM nodes
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, min(b) AS group_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** [[graft.query.Curation.dedupKeepBest]]: the dedup_groups recursive
    * CTE extended with per-doc normalized char counts and a per-group
    * (chars desc, doc_id asc) argmax via max-of-struct — the same
    * deterministic tiebreak the Spark side computes. */
  private def dedupKeepBestOracleSql: String =
    s"""WITH RECURSIVE ${minhashPairsCtes(8, 4, "0.5")},
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS a, doc_a AS b FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT a FROM edges
       |), reach(a, b) AS (
       |  SELECT a, a FROM nodes
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), labels AS (
       |  SELECT a AS doc_id, min(b) AS group_id FROM reach GROUP BY a
       |), chars AS (
       |  SELECT doc_id, CAST(strlen(lower(trim(
       |    regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) AS chars
       |  FROM base
       |), g AS (
       |  SELECT group_id, count(*) AS n_docs, sum(chars) AS chars_total,
       |    max(struct_pack(c := chars, n := -doc_id)) AS m
       |  FROM labels JOIN chars USING (doc_id)
       |  GROUP BY group_id
       |)
       |SELECT group_id, -m.n AS kept_doc, n_docs,
       |  CAST(chars_total - m.c AS BIGINT) AS chars_dropped
       |FROM g ORDER BY group_id""".stripMargin

  /** [[graft.query.Analytics2.zorderCluster]]: the 16+16-bit Morton
    * interleave as one generated bitwise expression — the SAME static
    * shift/mask chain the Spark side builds, so the bucket assignment is
    * exact integer math on both engines. */
  private def zorderOracleSql: String = {
    val interleave = (0 until 16).map { i =>
      s"((((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" | ")
    s"""WITH b AS (
       |  SELECT user_id, value,
       |    least(user_id, 65535) AS x,
       |    least(greatest(CAST(floor(value) AS BIGINT), 0), 65535) AS y
       |  FROM events
       |), z AS (
       |  SELECT user_id, y AS yband, ($interleave) >> 12 AS zbucket
       |  FROM b
       |)
       |SELECT zbucket, count(*) AS n,
       |  min(user_id) AS x_min, max(user_id) AS x_max,
       |  min(yband) AS y_min, max(yband) AS y_max
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }
}
