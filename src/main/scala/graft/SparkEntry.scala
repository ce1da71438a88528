package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> ((s, d) => analytics.Queries.pricingSummary(s, d)),
    "a2_topk_revenue" -> ((s, d) => analytics.Queries.topkRevenue(s, d)),
    "a3_multi_join" -> ((s, d) => analytics.Queries.multiJoinVolume(s, d)),
    "a4_window_rank" -> ((s, d) => analytics.Queries.windowRank(s, d)),
    "a5_distinct_stats" -> ((s, d) => analytics.Queries.distinctStats(s, d)),
    "a6_semi_anti" -> ((s, d) => analytics.Queries.semiAnti(s, d)),
    "a7_rollup" -> ((s, d) => analytics.Queries.rollupStats(s, d)),
    "p1_bronze_decode" -> ((s, d) => pipeline.Medallion.p1BronzeDecode(s, d)),
    "p2_silver_clean" -> ((s, d) => pipeline.Medallion.p2SilverClean(s, d)),
    "p3_gold_window15m" -> ((s, d) => pipeline.Medallion.p3GoldWindow(s, d)),
    "p4_gold_sliding" -> ((s, d) => pipeline.Medallion.p4GoldSliding(s, d)),
    "p5_dq_checks" -> ((s, d) => quality.Checks.p5EventChecks(s, d)),
    "p6_stream_gold" -> ((s, d) => streaming.Streams.p6StreamGold(s, d)),
    "p7_backfill_silver" -> ((s, d) => pipeline.Medallion.p7Backfill(s, d)),
    "p8_lake_day" -> ((s, d) => sources.Lake.p8LakeDay(s, d)),
    "t1_quality_score" -> ((s, d) => text.TextAnalysis.t1Quality(s, d)),
    "t2_token_count" -> ((s, d) => text.TextAnalysis.t2Tokens(s, d)),
    "t3_fingerprint" -> ((s, d) => text.TextAnalysis.t3Fingerprint(s, d)),
    "t4_lang_id" -> ((s, d) => text.TextAnalysis.t4LangId(s, d)),
    "d1_exact_dedup" -> ((s, d) => dedup.Dedup.d1(s, d)),
    "d2_minhash_lsh" -> ((s, d) => dedup.Dedup.d2(s, d)),
    "d3_simhash" -> ((s, d) => dedup.Dedup.d3(s, d)),
    "d4_ngram_jaccard" -> ((s, d) => dedup.Dedup.d4(s, d)),
    "d5_embed_neardup" -> ((s, d) => dedup.Dedup.d5(s, d)),
    "s1_knn_bruteforce" -> ((s, d) => similarity.Similarity.s1(s, d)),
    "s2_knn_lsh" -> ((s, d) => similarity.Similarity.s2(s, d)),
    "s3_ivf_knn" -> ((s, d) => similarity.Similarity.s3(s, d)),
    "s4_sq_knn" -> ((s, d) => similarity.Similarity.s4(s, d)),
    "s5_semantic_search" -> ((s, d) => similarity.Similarity.s5(s, d)),
    "m1_binary_meta" -> ((s, d) => multimodal.Multimodal.m1(s, d)),
    "m2_feature_extract" -> ((s, d) => multimodal.Multimodal.m2(s, d)),
    "st1_sessionize" -> ((s, d) => streaming.Sessionize.st1(s, d)),
    "st2_asof_join" -> ((s, d) => operators.AsOfJoin.st2(s, d)),
    "a8_percentiles" -> ((s, d) => analytics.Queries.percentiles(s, d)),
    "a8b_approx_percentiles" -> ((s, d) => analytics.Queries.approxPercentiles(s, d)),
    "a5b_approx_distinct" -> ((s, d) => analytics.Queries.approxDistinct(s, d)),
    "a9_moment_stats" -> ((s, d) => analytics.Queries.momentStats(s, d)),
    "a10_lag_lead" -> ((s, d) => analytics.Queries.lagLeadDeltas(s, d)),
    "x1_hash_sample" -> ((s, d) => text.Curation.x1HashSample(s, d)),
    "x2_source_cap" -> ((s, d) => text.Curation.x2SourceCap(s, d)),
    "x3_normalize" -> ((s, d) => text.Curation.x3Normalize(s, d)),
    "x4_curation" -> ((s, d) => text.Curation.x4Curation(s, d)),
    "x4b_curation_neardup" -> ((s, d) => text.Curation.x4bCuration(s, d)),
    "d6_dedup_clusters" -> ((s, d) => dedup.Clusters.d6(s, d)),
    "st3_range_join" -> ((s, d) => operators.RangeJoin.st3(s, d)),
    "x5_stratified_sample" -> ((s, d) => text.Curation.x5StratifiedSample(s, d)),
    "d7_contamination" -> ((s, d) => dedup.Contamination.d7(s, d)),
    "m3_frame_sample" -> ((s, d) => multimodal.Multimodal.m3(s, d)),
    "t5_top_tokens" -> ((s, d) => text.TextAnalysis.t5TopTokens(s, d)),
    "t6_repetition" -> ((s, d) => text.TextAnalysis.t6Repetition(s, d)),
    "t7_lm_surprisal" -> ((s, d) => text.TextAnalysis.t7LmSurprisal(s, d)),
    "st4_interval_join" -> ((s, d) => operators.IntervalJoin.st4(s, d)),
    "x6_pack_sequences" -> ((s, d) => text.Curation.x6PackSequences(s, d)),
    "a11_promo_share" -> ((s, d) => analytics.Queries.promoRevenue(s, d)),
    "a12_bucket_join" -> ((s, d) => analytics.Queries.bucketJoinRevenue(s, d)),
    "x7_pii_redact" -> ((s, d) => text.Curation.x7PiiRedact(s, d)),
    "a13_pivot_daily" -> ((s, d) => analytics.Queries.pivotDaily(s, d)),
    "s6_bm25" -> ((s, d) => text.Retrieval.s6Bm25(s, d)),
    "s7_rrf_fusion" -> ((s, d) => text.Retrieval.s7RrfFusion(s, d)),
    "x8_hash_split" -> ((s, d) => text.Curation.x8HashSplit(s, d)),
    "x9_token_budget_mix" -> ((s, d) => text.Curation.x9TokenBudgetMix(s, d)),
    "x9b_token_budget_salted" -> ((s, d) => text.Curation.x9bTokenBudgetSalted(s, d)),
    "s8_mmr_rerank" -> ((s, d) => similarity.Similarity.s8(s, d)),
    "x10_shuffle_positions" -> ((s, d) => text.Curation.x10ShufflePositions(s, d)),
    "p9_cdc_latest" -> ((s, d) => pipeline.Medallion.p9CdcLatest(s, d)),
    "a14_cube" -> ((s, d) => analytics.Queries.cubeStats(s, d)),
    "a15_running_total" -> ((s, d) => analytics.Queries.runningTotals(s, d)),
    "p10_scd2" -> ((s, d) => pipeline.Medallion.p10Scd2(s, d)),
    "st5_funnel" -> ((s, d) => operators.Funnel.st5(s, d)),
    "x11_weighted_sample" -> ((s, d) => text.Curation.x11QualityWeightedSample(s, d)),
    "s9_pq_knn" -> ((s, d) => similarity.Similarity.s9(s, d)),
    "d8_substring_dupes" -> ((s, d) => dedup.Substring.d8(s, d)),
    "t8_type_token" -> ((s, d) => text.TextAnalysis.t8TypeToken(s, d)),
    "a16_cohort_retention" -> ((s, d) => analytics.Queries.cohortRetention(s, d)),
    "st6_transitions" -> ((s, d) => operators.Transitions.st6(s, d)),
    "p11_quarantine" -> ((s, d) => quality.Checks.p11Quarantine(s, d)),
    "d9_semantic_dedup" -> ((s, d) => dedup.SemDedup.d9(s, d)),
    "t9_gopher_rules" -> ((s, d) => text.TextAnalysis.t9GopherRules(s, d)),
    "d10_incremental_dedup" -> ((s, d) => dedup.Incremental.d10(s, d)),
    "s10_filtered_knn" -> ((s, d) => similarity.Similarity.s10(s, d)),
    "s11_pq_rerank" -> ((s, d) => similarity.Similarity.s11(s, d)),
    "t10_token_entropy" -> ((s, d) => text.TextAnalysis.t10TokenEntropy(s, d)),
    "x12_dup_weighted_sample" -> ((s, d) => text.Curation.x12DupWeightedSample(s, d)),
    "a17_small_qty_revenue" -> ((s, d) => analytics.Queries.smallQtyRevenue(s, d)),
    "d11_containment" -> ((s, d) => dedup.Dedup.d11(s, d)),
    "st7_locf_resample" -> ((s, d) => operators.Resample.st7(s, d)),
    "st28_linear_interp" -> ((s, d) => operators.Resample.st28(s, d)),
    "p12_fk_orphans" -> ((s, d) => quality.Checks.p12FkOrphans(s, d)),
    "st8_rolling_active" -> ((s, d) => operators.Activity.st8(s, d)),
    "st8b_rolling_sketch" -> ((s, d) => operators.Activity.st8b(s, d)),
    "st9_zscore_anomaly" -> ((s, d) => operators.Activity.st9(s, d)),
    "a18_grouping_sets" -> ((s, d) => analytics.Queries.groupingSetsStats(s, d)),
    "a19_waiting_supplier" -> ((s, d) => analytics.Queries.waitingSupplier(s, d)),
    "x13_leakage_safe_split" -> ((s, d) => text.Curation.x13LeakageSafeSplit(s, d)),
    "d12_strip_dup_spans" -> ((s, d) => dedup.Substring.d12(s, d)),
    "t11_source_kl" -> ((s, d) => text.TextAnalysis.t11SourceKl(s, d)),
    "p13_snapshot_diff" -> ((s, d) => pipeline.Medallion.p13SnapshotDiff(s, d)),
    "s12_range_search" -> ((s, d) => similarity.Similarity.s12(s, d)),
    "x14_corpus_mix" -> ((s, d) => text.Curation.x14CorpusMix(s, d)),
    "d13_fingerprint_dedup" -> ((s, d) => dedup.Dedup.d13(s, d)),
    "x15_interleave" -> ((s, d) => text.Curation.x15Interleave(s, d)),
    "s13_cluster_cohesion" -> ((s, d) => similarity.Similarity.s13(s, d)),
    "m4_resize" -> ((s, d) => multimodal.Multimodal.m4(s, d)),
    "a20_item_cooccurrence" -> ((s, d) => analytics.Queries.a20(s, d)),
    "d14_cross_source_dupes" -> ((s, d) => dedup.Dedup.d14(s, d)),
    "p14_profile" -> ((s, d) => quality.Checks.p14Profile(s, d)),
    "t12_novelty" -> ((s, d) => text.TextAnalysis.t12Novelty(s, d)),
    "st10_disorder_audit" -> ((s, d) => operators.Activity.st10(s, d)),
    "st11_watermark_sim" -> ((s, d) => operators.Activity.st11(s, d)),
    "a21_market_share" -> ((s, d) => analytics.Queries.a21(s, d)),
    "a22_dormant_customers" -> ((s, d) => analytics.Queries.a22(s, d)),
    "m5_phash_dupes" -> ((s, d) => multimodal.Multimodal.m5(s, d)),
    "p15_profile_drift" -> ((s, d) => quality.Checks.p15ProfileDrift(s, d)),
    "p15b_approx_drift" -> ((s, d) => quality.Checks.p15bApproxDrift(s, d)),
    "t13_zipf_alpha" -> ((s, d) => text.TextAnalysis.t13ZipfAlpha(s, d)),
    "st12_changepoint" -> ((s, d) => operators.Activity.st12(s, d)),
    "s14_centroid_drift" -> ((s, d) => similarity.Similarity.s14(s, d)),
    "st13_funnel_timing" -> ((s, d) => operators.Funnel.st13(s, d)),
    "x16_mix_rebalance" -> ((s, d) => text.Curation.x16MixRebalance(s, d)),
    "d15_minhash_calibration" -> ((s, d) => dedup.Dedup.d15(s, d)),
    "a23_big_orders" -> ((s, d) => analytics.Queries.a23(s, d)),
    "a24_order_count_hist" -> ((s, d) => analytics.Queries.a24(s, d)),
    "a25_returned_revenue" -> ((s, d) => analytics.Queries.a25(s, d)),
    "a26_nation_trade" -> ((s, d) => analytics.Queries.a26(s, d)),
    "a27_top_supplier" -> ((s, d) => analytics.Queries.a27(s, d)),
    "d16_dup_degree" -> ((s, d) => dedup.Dedup.d16(s, d)),
    "s15_knn_graph" -> ((s, d) => similarity.Similarity.s15(s, d)),
    "x17_length_curriculum" -> ((s, d) => text.Curation.x17LengthCurriculum(s, d)),
    "d17_best_rep_dedup" -> ((s, d) => dedup.Clusters.d17(s, d)),
    "st14_trending" -> ((s, d) => operators.Activity.st14(s, d)),
    "x18_epoch_plan" -> ((s, d) => text.Curation.x18EpochPlan(s, d)),
    "st15_attribution" -> ((s, d) => operators.Activity.st15(s, d)),
    "a28_spend_deciles" -> ((s, d) => analytics.Queries.a28(s, d)),
    "t14_vocab_coverage" -> ((s, d) => text.TextAnalysis.t14VocabCoverage(s, d)),
    "d18_cluster_report" -> ((s, d) => dedup.Clusters.d18(s, d)),
    "s16_cosine_hist" -> ((s, d) => similarity.Similarity.s16(s, d)),
    "s17_ivf_recall" -> ((s, d) => similarity.Similarity.s17(s, d)),
    "st16_session_funnel" -> ((s, d) => operators.Funnel.st16(s, d)),
    "a29_late_shipments" -> ((s, d) => analytics.Queries.a29(s, d)),
    "t15_lang_confusion" -> ((s, d) => text.TextAnalysis.t15LangConfusion(s, d)),
    "a30_yearly_growth" -> ((s, d) => analytics.Queries.a30(s, d)),
    "m6_format_mix" -> ((s, d) => multimodal.Multimodal.m6(s, d)),
    "a31_shipping_priority" -> ((s, d) => analytics.Queries.a31(s, d)),
    "a32_local_volume" -> ((s, d) => analytics.Queries.a32(s, d)),
    "a33_revenue_forecast" -> ((s, d) => analytics.Queries.a33(s, d)),
    "a34_order_backlog" -> ((s, d) => analytics.Queries.a34(s, d)),
    "p16_incremental_gold" -> ((s, d) => pipeline.Medallion.p16IncrementalGold(s, d)),
    "d2b_minhash_joinback" -> ((s, d) =>
      dedup.Dedup.minhashLshPairsJoinback(graft.Tables.documents(s, d))
        .orderBy("a_id", "b_id")),
    "st17_interval_merge" -> ((s, d) => operators.Intervals.st17(s, d)),
    "st18_dwell_time" -> ((s, d) => operators.Intervals.st18(s, d)),
    "a35_rfm_segments" -> ((s, d) => analytics.Queries.a35(s, d)),
    "t16_bigram_ppl" -> ((s, d) => text.TextAnalysis.t16BigramPpl(s, d)),
    "p17_zorder_layout" -> ((s, d) => sources.Lake.p17ZorderLayout(s, d)),
    "a36_abc_classes" -> ((s, d) => analytics.Queries.a36(s, d)),
    "st19_streaks" -> ((s, d) => operators.Activity.st19(s, d)),
    "a37_disjunct_revenue" -> ((s, d) => analytics.Queries.a37(s, d)),
    "x19_quality_sweep" -> ((s, d) => text.Curation.x19QualitySweep(s, d)),
    "t17_readability" -> ((s, d) => text.TextAnalysis.t17Readability(s, d)),
    "m7_audio_stats" -> ((s, d) => multimodal.Multimodal.m7(s, d)),
    "a38_supplier_diversity" -> ((s, d) => analytics.Queries.a38(s, d)),
    "p18_schema_evolution" -> ((s, d) => sources.Lake.p18SchemaEvolution(s, d)),
    "st20_returning_users" -> ((s, d) => operators.Activity.st20(s, d)),
    "d19_threshold_sweep" -> ((s, d) => dedup.Dedup.d19(s, d)),
    "s18_knn_classify" -> ((s, d) => similarity.Similarity.s18(s, d)),
    "d20_boilerplate_shingles" -> ((s, d) => dedup.Dedup.d20(s, d)),
    "a39_decile_migration" -> ((s, d) => analytics.Queries.a39(s, d)),
    "s19_knn_outliers" -> ((s, d) => similarity.Similarity.s19(s, d)),
    "t18_code_detect" -> ((s, d) => text.TextAnalysis.t18CodeDetect(s, d)),
    "x20_length_histogram" -> ((s, d) => text.Curation.x20LengthHistogram(s, d)),
    "st21_gap_stats" -> ((s, d) => operators.Activity.st21(s, d)),
    "x21_pack_efficiency" -> ((s, d) => text.Curation.x21PackEfficiency(s, d)),
    "p19_retention_plan" -> ((s, d) => sources.Lake.p19RetentionPlan(s, d)),
    "p20_idempotent_backfill" -> ((s, d) => sources.Lake.p20IdempotentBackfill(s, d)),
    "st22_session_stats" -> ((s, d) => streaming.Sessionize.st22(s, d)),
    "t19_ppl_partition" -> ((s, d) => text.TextAnalysis.t19PplPartition(s, d)),
    "x22_source_quality" -> ((s, d) => text.Curation.x22SourceQuality(s, d)),
    "m8_byte_entropy" -> ((s, d) => multimodal.Multimodal.m8(s, d)),
    "s20_nprobe_curve" -> ((s, d) => similarity.Similarity.s20(s, d)),
    "p21_dq_daily" -> ((s, d) => quality.Checks.p21DqDaily(s, d)),
    "x23_split_leakage" -> ((s, d) => text.Curation.x23SplitLeakage(s, d)),
    "st23_first_touch" -> ((s, d) => operators.Activity.st23(s, d)),
    "p22_stage_reconcile" -> ((s, d) => pipeline.Medallion.stageReconcile(s, d)),
    "s21_sq_error" -> ((s, d) => similarity.Similarity.s21(s, d)),
    "x24_temperature_mix" -> ((s, d) => text.Curation.x24TemperatureMix(s, d)),
    "s22_scan_cost" -> ((s, d) => similarity.Similarity.s22(s, d)),
    "a40_basket_lift" -> ((s, d) => analytics.Queries.a40(s, d)),
    "d21_dedup_savings" -> ((s, d) => dedup.Dedup.d21(s, d)),
    "t20_blocklist_gate" -> ((s, d) => text.TextAnalysis.t20BlocklistGate(s, d)),
    "st25_return_cadence" -> ((s, d) => streaming.Sessionize.st25(s, d)),
    "p14b_approx_profile" -> ((s, d) => quality.Checks.p14bApproxProfile(s, d)),
    "p23_lake_merge" -> ((s, d) => sources.Lake.p23LakeMerge(s, d)),
    "st26_session_window" -> ((s, d) => streaming.Sessionize.st26(s, d)),
    "p24_compaction" -> ((s, d) => sources.Lake.p24Compaction(s, d)),
    "m9_scene_change" -> ((s, d) => multimodal.Multimodal.m9(s, d)),
    "p25_write_audit_publish" -> ((s, d) => sources.Lake.p25WriteAuditPublish(s, d)),
    "st24_peak_concurrency" -> ((s, d) => operators.Intervals.st24(s, d)),
    "x25_doc_chunking" -> ((s, d) => text.Curation.x25DocChunking(s, d)),
    "t21_quality_classifier" -> ((s, d) => text.TextAnalysis.t21QualityClassifier(s, d)),
    "p26_scan_prune_manifest" -> ((s, d) => sources.Lake.p26ScanPruneManifest(s, d)),
    "p27_incremental_manifest" -> ((s, d) => sources.Lake.p27IncrementalManifest(s, d)),
    "x26_chunk_dedup" -> ((s, d) => text.Curation.x26ChunkDedup(s, d)),
    "x27_dsir_importance" -> ((s, d) => text.Curation.x27DsirImportance(s, d)),
    "st27_concurrency_histogram" -> ((s, d) => operators.Intervals.st27(s, d)),
    "m10_image_tiles" -> ((s, d) => multimodal.Multimodal.m10(s, d)),
    "a41_min_cost_supplier" -> ((s, d) => analytics.Queries.a41(s, d)),
    "a42_important_stock" -> ((s, d) => analytics.Queries.a42(s, d)),
    "a43_priority_checking" -> ((s, d) => analytics.Queries.a43(s, d)),
    "a44_sales_opportunity" -> ((s, d) => analytics.Queries.a44(s, d)),
    "a45_promo_suppliers" -> ((s, d) => analytics.Queries.a45(s, d)),
    "s23_mrl_recall" -> ((s, d) => similarity.Similarity.s23(s, d)),
    "p28_time_travel" -> ((s, d) => sources.Lake.p28TimeTravel(s, d)),
    "x28_tokenizer_fertility" -> ((s, d) => text.Curation.x28TokenizerFertility(s, d)),
    "m11_clip_dedup" -> ((s, d) => multimodal.Multimodal.m11(s, d)),
    "p29_vacuum_orphans" -> ((s, d) => sources.Lake.p29VacuumOrphans(s, d)),
    "p30_optimistic_commit" -> ((s, d) => sources.Lake.p30OptimisticCommit(s, d)),
    "p31_manifest_pruned_read" -> ((s, d) => sources.Lake.p31ManifestPrunedRead(s, d)),
    "a46_product_profit" -> ((s, d) => analytics.Queries.a46(s, d)),
    "a47_pagerank3" -> ((s, d) => analytics.Queries.a47(s, d)),
    "p32_partition_skew" -> ((s, d) => sources.Lake.p32PartitionSkew(s, d)),
    "d22_shingle_df_profile" -> ((s, d) => dedup.Dedup.d22(s, d)),
    "s24_ivf_convergence" -> ((s, d) => similarity.Similarity.s24(s, d)),
    "s25_anisotropy" -> ((s, d) => similarity.Similarity.s25(s, d)),
    "m12_audio_chunks" -> ((s, d) => multimodal.Multimodal.m12(s, d)),
    "t22_keywords" -> ((s, d) => text.TextAnalysis.t22Keywords(s, d)),
    "s26_incremental_ivf" -> ((s, d) => similarity.Similarity.s26(s, d)),
    "st29_ewma" -> ((s, d) => operators.Activity.st29(s, d)),
    "a48_trailing_range" -> ((s, d) => analytics.Queries.a48(s, d)),
    "st30_debounce" -> ((s, d) => operators.Activity.st30(s, d)),
    "s27_hard_negatives" -> ((s, d) => similarity.Similarity.s27(s, d)),
    "d23_fuzzy_contamination" -> ((s, d) => dedup.Contamination.d23(s, d)),
  )

  /** p15 oracle: p14's per-column profile replay GENERATED for each
    * slice predicate, joined per column for the drift verdict.
    */
  private def p15Oracle: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate", "l_linestatus")
    def side(pred: String): String = cols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM li WHERE $pred""".stripMargin).mkString("\nUNION ALL ")
    s"""WITH li AS (SELECT l_orderkey, l_quantity, l_returnflag,
       |  CAST(l_shipdate AS DATE) AS l_shipdate, l_linestatus FROM lineitem),
       |a AS (${side("l_shipdate < DATE '1998-01-01'")}),
       |b AS (${side("l_shipdate >= DATE '1998-01-01'")})
       |SELECT a.col_name, a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
       | round(CAST(a.n_nulls AS DOUBLE) / a.n_rows, 6) AS null_rate_a,
       | round(CAST(b.n_nulls AS DOUBLE) / b.n_rows, 6) AS null_rate_b,
       | a.n_distinct AS n_distinct_a, b.n_distinct AS n_distinct_b,
       | round(CAST(b.n_distinct AS DOUBLE) / a.n_distinct, 6) AS distinct_ratio,
       | (a.min_val <> b.min_val OR a.max_val <> b.max_val) AS range_changed
       |FROM a JOIN b USING (col_name) ORDER BY col_name""".stripMargin
  }

  /** p14b oracle: full-corpus portable stats (count/nulls/min/max)
    * plus EXACT distinct on the deterministic `l_orderkey % 16`
    * slice, with both sketch gates stated `true` (a5b's pattern —
    * the Spark side computes HLL++ vs exact on the slice and the
    * full-corpus sketch's covers-slice bound, so sketch drift past
    * the gates hash-mismatches here).
    */
  /** p15b oracle: p14b's per-column replay generated per SIDE of the
    * 1998 split — full-side exact counts/nulls/min/max, slice-exact
    * distincts, the slice-based drift ratio, range escape across
    * sides, and the per-side sketch gates as stated-`true` literals
    * (the Spark side must COMPUTE them true, p14b's contract).
    */
  private def p15bOracle: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate", "l_linestatus")
    val branches = cols.map(c =>
      s"""SELECT '$c' AS col_name, fa.n_rows AS n_rows_a, fb.n_rows AS n_rows_b,
         | round(CAST(fa.n_nulls AS DOUBLE) / fa.n_rows, 6) AS null_rate_a,
         | round(CAST(fb.n_nulls AS DOUBLE) / fb.n_rows, 6) AS null_rate_b,
         | da.d AS n_distinct_slice_a, db.d AS n_distinct_slice_b,
         | round(CAST(db.d AS DOUBLE) / da.d, 6) AS distinct_ratio_slice,
         | (fa.min_val <> fb.min_val OR fa.max_val <> fb.max_val) AS range_changed,
         | true AS sketch_ok_a, true AS sketch_ok_b
         |FROM (SELECT count(*) AS n_rows,
         |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         | FROM sa) fa
         |CROSS JOIN (SELECT count(*) AS n_rows,
         |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         | FROM sb) fb
         |CROSS JOIN (SELECT count(DISTINCT $c) AS d FROM la) da
         |CROSS JOIN (SELECT count(DISTINCT $c) AS d FROM lb) db""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH li AS (SELECT l_orderkey, l_quantity, l_returnflag,
       |  CAST(l_shipdate AS DATE) AS l_shipdate, l_linestatus FROM lineitem),
       |sa AS (SELECT * FROM li WHERE l_shipdate < DATE '1998-01-01'),
       |sb AS (SELECT * FROM li WHERE l_shipdate >= DATE '1998-01-01'),
       |la AS (SELECT * FROM sa WHERE l_orderkey % 16 = 0),
       |lb AS (SELECT * FROM sb WHERE l_orderkey % 16 = 0)
       |$branches
       |ORDER BY col_name""".stripMargin
  }

  private def p14bOracle: String = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate", "l_linestatus")
    val branches = cols.map(c =>
      s"""SELECT '$c' AS col_name, f.n_rows, f.n_nulls, s.n_distinct_slice,
         | f.min_val, f.max_val,
         | true AS slice_within_5pct, true AS full_covers_slice,
         | true AS full_within_slice_band
         |FROM (SELECT count(*) AS n_rows,
         |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         | FROM li) f
         |CROSS JOIN (SELECT count(DISTINCT $c) AS n_distinct_slice FROM sl) s""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH li AS (SELECT l_orderkey, l_quantity, l_returnflag,
       |  CAST(l_shipdate AS DATE) AS l_shipdate, l_linestatus FROM lineitem),
       |sl AS (SELECT * FROM li WHERE l_orderkey % 16 = 0)
       |$branches
       |ORDER BY col_name""".stripMargin
  }

  /** s9 oracle: the full PQ replay, GENERATED per subspace — for
    * each of the m slices: deterministic init (first ksub sample
    * slices in vec_id order), two unrolled Lloyd iterations with
    * ordered-fold sums and per-dim float32 re-rounding (s3's
    * technique in L2 geometry), corpus encoding by windowed argmin
    * (ties → smallest code), per-query ADC distance tables; then
    * candidates score as the left-assoc m-term lookup sum, matching
    * the Spark side's fixed fold, and rank (dist asc, id asc).
    * Every chained CTE is MATERIALIZED — the s8 lesson: DuckDB
    * re-inlines referenced CTEs, and the pa→pc→pa chains re-expand
    * exponentially without the hint (>300 s vs 2 s at sf0.01).
    */
  private def pqKnnOracle: String = pqOracle(rerank = false)

  /** s11 oracle: the same generated PQ replay widened to a
    * 100-candidate short list, then re-scored by EXACT cosine and
    * re-ranked (cos desc, id asc) — the candidate-generation +
    * exact-re-rank composition s9's recall knee prescribes.
    */
  private def pqRerankOracle: String = pqOracle(rerank = true)

  private def pqOracle(rerank: Boolean): String = {
    val m = 16; val sub = 4; val ksub = 32; val k = if (rerank) 100 else 10
    def dist(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, $sub), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"
    def meanCte(prev: String, asg: String): String =
      s"""SELECT p.code, COALESCE(n.ce, p.ce) AS ce FROM $prev p LEFT JOIN (
         | SELECT code, list_transform(generate_series(1, $sub), d ->
         |  CAST(CAST(list_reduce(list_transform(ses, e -> e[d]), (x, y) -> x + y) / n AS FLOAT) AS DOUBLE)) AS ce
         | FROM (SELECT code, list(se ORDER BY vec_id) AS ses, count(*) AS n FROM $asg GROUP BY code)
         |) n ON p.code = n.code""".stripMargin
    def assignCte(src: String, cents: String): String =
      s"""SELECT vec_id, se, code FROM (
         | SELECT t.vec_id, t.se, c.code,
         |  row_number() OVER (PARTITION BY t.vec_id ORDER BY ${dist("t.se", "c.ce")} ASC, c.code ASC) AS rn
         | FROM $src t CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
    val perSub = (0 until m).map { s =>
      val lo = s * sub + 1; val hi = (s + 1) * sub
      s"""psub$s AS MATERIALIZED (SELECT vec_id, emb[$lo:$hi] AS se FROM psample),
         |pc0_$s AS MATERIALIZED (
         | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, se AS ce
         | FROM (SELECT vec_id, se FROM psub$s ORDER BY vec_id LIMIT $ksub)),
         |pa1_$s AS MATERIALIZED (${assignCte(s"psub$s", s"pc0_$s")}),
         |pc1_$s AS MATERIALIZED (${meanCte(s"pc0_$s", s"pa1_$s")}),
         |pa2_$s AS MATERIALIZED (${assignCte(s"psub$s", s"pc1_$s")}),
         |pc2_$s AS MATERIALIZED (${meanCte(s"pc1_$s", s"pa2_$s")}),
         |pcode_$s AS MATERIALIZED (
         | SELECT vec_id, code FROM (
         |  SELECT t.vec_id, c.code,
         |   row_number() OVER (PARTITION BY t.vec_id ORDER BY ${dist("t.se", "c.ce")} ASC, c.code ASC) AS rn
         |  FROM (SELECT vec_id, emb[$lo:$hi] AS se FROM e) t CROSS JOIN pc2_$s c) WHERE rn = 1),
         |pqd_$s AS MATERIALIZED (
         | SELECT q.vec_id AS q_id, c.code, ${dist("q.se", "c.ce")} AS d
         | FROM (SELECT vec_id, emb[$lo:$hi] AS se FROM e WHERE vec_id % 50 = 0 AND vec_id < 25600) q CROSS JOIN pc2_$s c)""".stripMargin
    }.mkString(",\n")
    val codeCols = (0 until m).map(s => s"c$s.code AS k$s").mkString(", ")
    val codeJoins = (1 until m).map(s => s"JOIN pcode_$s c$s ON c$s.vec_id = c0.vec_id").mkString(" ")
    val dJoins = (0 until m).map(s => s"JOIN pqd_$s d$s ON d$s.q_id = p.q_id AND d$s.code = n.k$s").mkString("\n ")
    val dSum = (0 until m).map(s => s"d$s.d").mkString(" + ")
    val finalSelect =
      if (!rerank)
        s"""SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(dist2, 6) AS pq_dist2
           |FROM pqscored WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
      else
        s"""rescored AS (
           | SELECT c.q_id, c.n_id,
           |  list_cosine_similarity(qe.emb, ne.emb) AS cos,
           |  row_number() OVER (PARTITION BY c.q_id
           |    ORDER BY list_cosine_similarity(qe.emb, ne.emb) DESC, c.n_id ASC) AS rank
           | FROM (SELECT q_id, n_id FROM pqscored WHERE rank <= $k) c
           | JOIN e qe ON qe.vec_id = c.q_id
           | JOIN e ne ON ne.vec_id = c.n_id)
           |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
           |FROM rescored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL),
       |psample0 AS MATERIALIZED (SELECT vec_id, emb FROM e WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 20000),
       |psample AS MATERIALIZED (
       | SELECT vec_id, emb FROM psample0
       | UNION ALL
       | SELECT vec_id, emb FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 20000)
       | WHERE (SELECT count(*) FROM psample0) = 0),
       |$perSub,
       |pcodes AS MATERIALIZED (SELECT c0.vec_id, $codeCols FROM pcode_0 c0 $codeJoins),
       |pqscored AS (
       | SELECT p.q_id, n.vec_id AS n_id, $dSum AS dist2,
       |  row_number() OVER (PARTITION BY p.q_id ORDER BY $dSum ASC, n.vec_id ASC) AS rank
       | FROM (SELECT DISTINCT q_id FROM pqd_0) p
       | JOIN pcodes n ON n.vec_id <> p.q_id
       | $dJoins)${if (rerank) "," else ""}
       |$finalSelect""".stripMargin
  }

  /** DuckDB CTE fragments shared between oracles. `minhashPairCtes`
    * replays the 128-perm minhash + banded-LSH candidate pipeline
    * over any doc-set CTE (`d2` runs it on `documents`, `x4b` on the
    * curated survivor set `d`), ending in a `scored(a_id, b_id,
    * est_jaccard)` CTE; `curationCtes` is the normalize -> score ->
    * quality-filter -> exact-dedup head shared by x4 and x4b,
    * ending in the survivor CTE `d`.
    */
  /** s4/s5 shared fragment: the int8 scalar-quantization + quantized
    * cosine ranking replay, ending in `scored(q_id, n_id, cos8, rank)`.
    */
  /** Shared IVF replay fragment: the full coarse-quantizer training
    * (deterministic init + 3 unrolled Lloyd iterations with
    * ordered-fold means re-rounded to float32) and the corpus cell
    * assignment - everything up to `corpus(vec_id, emb, cell)`.
    * Consumed by the s3 (IVF KNN) and d9 (semantic dedup) oracles.
    */
  /** Shared by d6 and x13: transitive closure over the exact 3-gram
    * jaccard pair set (the same pairs d4 verifies) → min-id cluster
    * labels for every doc that appears in an edge.
    */
  private val ccLabelCtes: String =
    """g AS (
      | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
      | WHERE len(toks) >= 3),
      |p AS (
      | SELECT a.doc_id AS a_id, b.doc_id AS b_id
      | FROM g a JOIN g b ON a.doc_id < b.doc_id
      | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |       / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
      |reach AS (
      | SELECT src AS id, src AS r FROM edges
      | UNION
      | SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      |labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  /** Shared by t16 and t19: the full bigram-LM train + stupid-backoff
    * scoring replay, ending in `pplframe(doc_id, n_scored, avg_nll,
    * ppl)`.
    */
  private val bigramPplCtes: String =
    """d AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
      |  t -> t <> '') AS toks
      | FROM documents),
      |uni AS (SELECT doc_id, unnest(toks) AS token FROM d),
      |vocab AS (SELECT token, count(*) AS c FROM uni GROUP BY 1),
      |tot AS (SELECT sum(c) AS t, count(*) AS v FROM vocab),
      |bi AS (
      | SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS u
      |  FROM d)),
      |lm0 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
      |lm AS (
      | SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p12 FROM (
      |  SELECT lm0.w1, lm0.w2, lm0.c12, v.c AS c1,
      |   row_number() OVER (ORDER BY lm0.c12 DESC, lm0.w1, lm0.w2) AS rk
      |  FROM lm0 JOIN vocab v ON v.token = lm0.w1)
      | WHERE rk <= 2000),
      |occ AS (
      | SELECT doc_id, w1, w2 FROM bi
      | UNION ALL
      | SELECT doc_id, NULL AS w1, toks[1] AS w2 FROM d WHERE len(toks) >= 1),
      |sc AS (
      | SELECT o.doc_id,
      |  CASE WHEN lm.p12 IS NOT NULL THEN lm.p12
      |   ELSE (CASE WHEN o.w1 IS NULL THEN 1.0 ELSE 0.4 END)
      |    * (CAST(v.c AS DOUBLE) + 1.0)
      |    / (CAST(tot.t AS DOUBLE) + CAST(tot.v AS DOUBLE))
      |  END AS p
      | FROM occ o
      | JOIN vocab v ON v.token = o.w2
      | LEFT JOIN lm ON lm.w1 = o.w1 AND lm.w2 = o.w2
      | CROSS JOIN tot),
      |pplframe AS (
      | SELECT doc_id, count(*) AS n_scored, round(avg(-ln(p)), 4) AS avg_nll,
      |  round(exp(round(avg(-ln(p)), 4)), 4) AS ppl
      | FROM sc GROUP BY 1)""".stripMargin

  /** The IVF trainer replay ladder (cents0..3 + full-corpus
    * assignment), parameterized by the training-sample WHERE so
    * index-maintenance oracles (s26) can train on a filtered corpus
    * while replaying the identical Lloyd arithmetic. */
  /** The IVF family's corpus-derived cell count, replayed in SQL:
    * clamp(ceil(n / 128), 16, 1 << 20) over the non-null-embedding
    * corpus — the exact formula `Similarity.derivedNumCells` applies
    * (targetCellSize 128), as a scalar-subquery LIMIT so the replay
    * tracks the Spark side at ANY corpus size. s24/s26 pass an
    * explicit "16" instead: their entries pin the fixed-model k.
    */
  private val derivedCellsSql: String =
    "(SELECT least(1048576, greatest(16, CAST(ceil(count(*) / 128.0) AS BIGINT))) FROM e)"

  private def ivfCtesWith(sampleWhere: String,
                          fallbackWhere: String = "TRUE",
                          cells: String = derivedCellsSql): String =
    s"""e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL),
        |sample0 AS (
        | SELECT vec_id, emb FROM e WHERE $sampleWhere ORDER BY vec_id LIMIT 20000),
        |sample AS (
        | SELECT vec_id, emb FROM sample0
        | UNION ALL
        | SELECT vec_id, emb FROM (SELECT vec_id, emb FROM e
        |   WHERE $fallbackWhere ORDER BY vec_id LIMIT 20000)
        | WHERE (SELECT count(*) FROM sample0) = 0),
        |cents0 AS (
        | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, emb AS cemb
        | FROM (SELECT vec_id, emb FROM sample ORDER BY vec_id LIMIT $cells)),
        |asg_cents1_rn AS (
        | SELECT s.vec_id AS vid, s.emb AS emb, c.cell,
        |  row_number() OVER (PARTITION BY s.vec_id
        |    ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS rn
        | FROM sample s CROSS JOIN cents0 c),
        |asg_cents1 AS (SELECT vid AS vec_id, emb, cell FROM asg_cents1_rn WHERE rn = 1),
        |cents1 AS (
        | SELECT p.cell, COALESCE(n.cemb, p.cemb) AS cemb
        | FROM cents0 p LEFT JOIN (
        |   SELECT cell,
        |    list_transform(generate_series(1, 64), d ->
        |      CAST(CAST(list_reduce(list_transform(embs, e -> e[d]), (x, y) -> x + y) / n AS FLOAT) AS DOUBLE)) AS cemb
        |   FROM (SELECT cell, list(emb ORDER BY vec_id) AS embs, count(*) AS n FROM asg_cents1 GROUP BY cell)
        | ) n ON p.cell = n.cell),
        |asg_cents2_rn AS (
        | SELECT s.vec_id AS vid, s.emb AS emb, c.cell,
        |  row_number() OVER (PARTITION BY s.vec_id
        |    ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS rn
        | FROM sample s CROSS JOIN cents1 c),
        |asg_cents2 AS (SELECT vid AS vec_id, emb, cell FROM asg_cents2_rn WHERE rn = 1),
        |cents2 AS (
        | SELECT p.cell, COALESCE(n.cemb, p.cemb) AS cemb
        | FROM cents1 p LEFT JOIN (
        |   SELECT cell,
        |    list_transform(generate_series(1, 64), d ->
        |      CAST(CAST(list_reduce(list_transform(embs, e -> e[d]), (x, y) -> x + y) / n AS FLOAT) AS DOUBLE)) AS cemb
        |   FROM (SELECT cell, list(emb ORDER BY vec_id) AS embs, count(*) AS n FROM asg_cents2 GROUP BY cell)
        | ) n ON p.cell = n.cell),
        |asg_cents3_rn AS (
        | SELECT s.vec_id AS vid, s.emb AS emb, c.cell,
        |  row_number() OVER (PARTITION BY s.vec_id
        |    ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS rn
        | FROM sample s CROSS JOIN cents2 c),
        |asg_cents3 AS (SELECT vid AS vec_id, emb, cell FROM asg_cents3_rn WHERE rn = 1),
        |cents3 AS (
        | SELECT p.cell, COALESCE(n.cemb, p.cemb) AS cemb
        | FROM cents2 p LEFT JOIN (
        |   SELECT cell,
        |    list_transform(generate_series(1, 64), d ->
        |      CAST(CAST(list_reduce(list_transform(embs, e -> e[d]), (x, y) -> x + y) / n AS FLOAT) AS DOUBLE)) AS cemb
        |   FROM (SELECT cell, list(emb ORDER BY vec_id) AS embs, count(*) AS n FROM asg_cents3 GROUP BY cell)
        | ) n ON p.cell = n.cell),
        |corpus_rn AS (
        | SELECT s.vec_id AS vid, s.emb AS emb, c.cell,
        |  row_number() OVER (PARTITION BY s.vec_id
        |    ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS rn
        | FROM e s CROSS JOIN cents3 c),
        |corpus AS (SELECT vid AS vec_id, emb, cell FROM corpus_rn WHERE rn = 1)""".stripMargin

  private val ivfCorpusCtes: String = ivfCtesWith("vec_id % 4 = 0")

  /** Fixed 16-cell variant for the fixed-model reports (s24). */
  private val ivfCorpusCtes16: String =
    ivfCtesWith("vec_id % 4 = 0", cells = "16")

  private val sqKnnCtes: String =
    """e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS scale FROM e),
        |q8 AS (
        | SELECT vec_id,
        |  CASE WHEN scale = 0 THEN list_transform(emb, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(emb, x -> CAST(floor(x / scale * 127 + 0.5) AS BIGINT)) END AS q
        | FROM s),
        |n8 AS (SELECT vec_id, q, list_sum(list_transform(q, v -> v * v)) AS nsq FROM q8),
        |cand AS (
        | SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |  list_sum(list_transform(generate_series(1, len(a.q)), i -> a.q[i] * b.q[i])) AS dot8,
        |  a.nsq AS qn, b.nsq AS cn
        | FROM n8 a JOIN n8 b ON a.vec_id % 50 = 0 AND a.vec_id < 25600 AND a.vec_id <> b.vec_id),
        |scored AS (
        | SELECT q_id, n_id,
        |  CASE WHEN qn = 0 OR cn = 0 THEN 0.0
        |       ELSE CAST(dot8 AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) END AS cos8,
        |  row_number() OVER (PARTITION BY q_id ORDER BY
        |    CASE WHEN qn = 0 OR cn = 0 THEN 0.0
        |         ELSE CAST(dot8 AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) END DESC,
        |    n_id) AS rank
        | FROM cand)""".stripMargin

  private def minhashPairCtes(src: String): String =
    """base AS (SELECT doc_id, list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(regexp_split_to_array(text, '\s+'), tk -> list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), list_transform(regexp_split_to_array(tk, ''), ch -> CAST(unicode(ch) AS HUGEINT))), (acc, c) -> (((xor(acc, c)) % 4294967296) * 435 + ((((xor(acc, c)) % 4294967296) * 256 + ((xor(acc, c)) // 4294967296) * 435) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT))), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)) AS th FROM %SRC%),
        |w AS (SELECT doc_id, th, generate_series(1, len(th) - 2) AS idxs FROM base WHERE len(th) >= 3),
        |h1 AS (SELECT doc_id, th, idxs, list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(idxs, i -> th[i]), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)) AS m1 FROM w),
        |h2 AS (SELECT doc_id, th, idxs, list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(generate_series(1, len(idxs)), k -> xor(m1[k], th[idxs[k] + 1])), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)) AS m2 FROM h1),
        |h3 AS (SELECT doc_id, list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(generate_series(1, len(idxs)), k -> xor(m2[k], th[idxs[k] + 2])), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)) AS raw FROM h2),
        |shrows AS (SELECT doc_id, unnest(list_distinct(raw)) AS x FROM h3),
        |perms(p, a, b) AS (VALUES (0, CAST('13679457532755275413' AS HUGEINT), CAST('13432527470776545160' AS HUGEINT)),(1, CAST('18105923034897077331' AS HUGEINT), CAST('17864077645780634326' AS HUGEINT)),(2, CAST('13469799137962766343' AS HUGEINT), CAST('8913683988413733765' AS HUGEINT)),(3, CAST('291080821224767267' AS HUGEINT), CAST('2038608524547893592' AS HUGEINT)),(4, CAST('13477024926058894539' AS HUGEINT), CAST('6762955539682377832' AS HUGEINT)),(5, CAST('17993093053756489803' AS HUGEINT), CAST('14438123640516013942' AS HUGEINT)),(6, CAST('13566731111258911605' AS HUGEINT), CAST('7931773194558452508' AS HUGEINT)),(7, CAST('11319972279577420103' AS HUGEINT), CAST('3892645080117226033' AS HUGEINT)),(8, CAST('9056593541966880723' AS HUGEINT), CAST('10849667979899222076' AS HUGEINT)),(9, CAST('13477849763770103655' AS HUGEINT), CAST('4719769192585930289' AS HUGEINT)),(10, CAST('3616225228971510763' AS HUGEINT), CAST('10120733601449672245' AS HUGEINT)),(11, CAST('15462672028412579011' AS HUGEINT), CAST('3965022595533706929' AS HUGEINT)),(12, CAST('3178540356880283481' AS HUGEINT), CAST('16550353102095353028' AS HUGEINT)),(13, CAST('368342364169337291' AS HUGEINT), CAST('6003839248161056871' AS HUGEINT)),(14, CAST('7424157817344609039' AS HUGEINT), CAST('15037995407070714543' AS HUGEINT)),(15, CAST('10260536580878929051' AS HUGEINT), CAST('15028230723423410763' AS HUGEINT)),(16, CAST('5329533497540776603' AS HUGEINT), CAST('10034679062275131300' AS HUGEINT)),(17, CAST('16570158482149399475' AS HUGEINT), CAST('7086638178683056257' AS HUGEINT)),(18, CAST('6271748679462446237' AS HUGEINT), CAST('9769939611674103587' AS HUGEINT)),(19, CAST('13663500456917897595' AS HUGEINT), CAST('10489464471626960117' AS HUGEINT)),(20, CAST('1002036849063315981' AS HUGEINT), CAST('685060799451887893' AS HUGEINT)),(21, CAST('14944177521445700419' AS HUGEINT), CAST('7932416640711727352' AS HUGEINT)),(22, CAST('15224156538121406901' AS HUGEINT), CAST('17637387166446545346' AS HUGEINT)),(23, CAST('4439252105671733795' AS HUGEINT), CAST('15057826196960218502' AS HUGEINT)),(24, CAST('17264232662068481735' AS HUGEINT), CAST('17894217328592812498' AS HUGEINT)),(25, CAST('11337970468298749807' AS HUGEINT), CAST('18105566178415619511' AS HUGEINT)),(26, CAST('17714652617231823143' AS HUGEINT), CAST('18119689086777206668' AS HUGEINT)),(27, CAST('7075883509774426401' AS HUGEINT), CAST('5718913436695043505' AS HUGEINT)),(28, CAST('17360999193197444373' AS HUGEINT), CAST('4824385676517010403' AS HUGEINT)),(29, CAST('2532601429470541125' AS HUGEINT), CAST('15060681878671775511' AS HUGEINT)),(30, CAST('1243045329627533101' AS HUGEINT), CAST('1866550240620900528' AS HUGEINT)),(31, CAST('5149949291087212247' AS HUGEINT), CAST('13520556390570570131' AS HUGEINT)),(32, CAST('2475505609494469523' AS HUGEINT), CAST('2522708310006964940' AS HUGEINT)),(33, CAST('14779109287369959189' AS HUGEINT), CAST('12911555454244211934' AS HUGEINT)),(34, CAST('10415119907296966887' AS HUGEINT), CAST('17957624262515163977' AS HUGEINT)),(35, CAST('8322708147046919739' AS HUGEINT), CAST('12583251242654464876' AS HUGEINT)),(36, CAST('7402764794868543633' AS HUGEINT), CAST('5692280587187851116' AS HUGEINT)),(37, CAST('15762048743580106609' AS HUGEINT), CAST('5412126991504962750' AS HUGEINT)),(38, CAST('8288105064287199793' AS HUGEINT), CAST('3066530030326113719' AS HUGEINT)),(39, CAST('213235391877949751' AS HUGEINT), CAST('2936217767587523410' AS HUGEINT)),(40, CAST('1766186853405588597' AS HUGEINT), CAST('13032462758197477675' AS HUGEINT)),(41, CAST('15112002237677987833' AS HUGEINT), CAST('14593856488226084738' AS HUGEINT)),(42, CAST('12978548834978922355' AS HUGEINT), CAST('4588524522137214616' AS HUGEINT)),(43, CAST('12390575530792971711' AS HUGEINT), CAST('10826722299036291093' AS HUGEINT)),(44, CAST('8361847590266283331' AS HUGEINT), CAST('10252629665644599760' AS HUGEINT)),(45, CAST('12847895688012758659' AS HUGEINT), CAST('283545940951472360' AS HUGEINT)),(46, CAST('16743392734764332447' AS HUGEINT), CAST('10203985545584359410' AS HUGEINT)),(47, CAST('4413419251928811825' AS HUGEINT), CAST('7641485672361121627' AS HUGEINT)),(48, CAST('12488321346544387775' AS HUGEINT), CAST('3628886295211392483' AS HUGEINT)),(49, CAST('16611378828665872033' AS HUGEINT), CAST('13179204359784223196' AS HUGEINT)),(50, CAST('12320550652532879441' AS HUGEINT), CAST('12301270148063061047' AS HUGEINT)),(51, CAST('7518142022867140873' AS HUGEINT), CAST('6443721252915813847' AS HUGEINT)),(52, CAST('3884191051923679857' AS HUGEINT), CAST('4434623615375371796' AS HUGEINT)),(53, CAST('2567215163496524159' AS HUGEINT), CAST('3082911595961197696' AS HUGEINT)),(54, CAST('17926071438690182313' AS HUGEINT), CAST('12886239756459850089' AS HUGEINT)),(55, CAST('17582785007600462387' AS HUGEINT), CAST('5556391513672054180' AS HUGEINT)),(56, CAST('10443721792965224423' AS HUGEINT), CAST('18131988017634935936' AS HUGEINT)),(57, CAST('10854456172974466049' AS HUGEINT), CAST('8389253293679179366' AS HUGEINT)),(58, CAST('4348727781342549897' AS HUGEINT), CAST('7294718685450441387' AS HUGEINT)),(59, CAST('10456070020140924673' AS HUGEINT), CAST('11012009786045520870' AS HUGEINT)),(60, CAST('1439860313952550465' AS HUGEINT), CAST('14223775187781137396' AS HUGEINT)),(61, CAST('13878831836636946993' AS HUGEINT), CAST('18150830474300286535' AS HUGEINT)),(62, CAST('14249732241852757271' AS HUGEINT), CAST('12721046935469164921' AS HUGEINT)),(63, CAST('6613474315883560813' AS HUGEINT), CAST('16978397421569485293' AS HUGEINT)),(64, CAST('5709529872722685115' AS HUGEINT), CAST('14565752631745422850' AS HUGEINT)),(65, CAST('6324342846970663237' AS HUGEINT), CAST('333013510707886610' AS HUGEINT)),(66, CAST('7514200000578077153' AS HUGEINT), CAST('13477402351732944336' AS HUGEINT)),(67, CAST('7544784243361311007' AS HUGEINT), CAST('8346100818921284029' AS HUGEINT)),(68, CAST('10909245258051103221' AS HUGEINT), CAST('489503802456916415' AS HUGEINT)),(69, CAST('12569283570280214053' AS HUGEINT), CAST('2935772237847478965' AS HUGEINT)),(70, CAST('9191661375739200469' AS HUGEINT), CAST('4285767305400068431' AS HUGEINT)),(71, CAST('2422743717134523639' AS HUGEINT), CAST('3638928751631197414' AS HUGEINT)),(72, CAST('206112525064394601' AS HUGEINT), CAST('9297691789713465307' AS HUGEINT)),(73, CAST('10342009793269020263' AS HUGEINT), CAST('15009683458566077745' AS HUGEINT)),(74, CAST('1434110149463548485' AS HUGEINT), CAST('18268749646997184021' AS HUGEINT)),(75, CAST('17850908991922152409' AS HUGEINT), CAST('2914380442709976269' AS HUGEINT)),(76, CAST('13181733461238856629' AS HUGEINT), CAST('6616389739668441417' AS HUGEINT)),(77, CAST('78350552875603143' AS HUGEINT), CAST('14125433436979177977' AS HUGEINT)),(78, CAST('10565451817265287239' AS HUGEINT), CAST('1678227255434177717' AS HUGEINT)),(79, CAST('4545245708110107337' AS HUGEINT), CAST('12080575812442232812' AS HUGEINT)),(80, CAST('16616562186316015769' AS HUGEINT), CAST('13048158563546023526' AS HUGEINT)),(81, CAST('1669485836469994413' AS HUGEINT), CAST('12190486122897749068' AS HUGEINT)),(82, CAST('7764880849542401125' AS HUGEINT), CAST('9400993982111403755' AS HUGEINT)),(83, CAST('5621867568970652369' AS HUGEINT), CAST('12013518963520482432' AS HUGEINT)),(84, CAST('16774671638949507337' AS HUGEINT), CAST('17095148956929344043' AS HUGEINT)),(85, CAST('2349795952729772421' AS HUGEINT), CAST('10831612129113404590' AS HUGEINT)),(86, CAST('4100462258288108073' AS HUGEINT), CAST('16599994709314851193' AS HUGEINT)),(87, CAST('14529253353511111529' AS HUGEINT), CAST('15251669095119325999' AS HUGEINT)),(88, CAST('3911689957754131815' AS HUGEINT), CAST('15971158118921158609' AS HUGEINT)),(89, CAST('594492520465601301' AS HUGEINT), CAST('7255830705509247015' AS HUGEINT)),(90, CAST('9720658696779892243' AS HUGEINT), CAST('16910822789333739666' AS HUGEINT)),(91, CAST('2570829354940271745' AS HUGEINT), CAST('10281707179180492535' AS HUGEINT)),(92, CAST('11264245849058558797' AS HUGEINT), CAST('8136366241869743180' AS HUGEINT)),(93, CAST('9573739971386752087' AS HUGEINT), CAST('5041728370232640815' AS HUGEINT)),(94, CAST('12623609056511380039' AS HUGEINT), CAST('7580044024164808114' AS HUGEINT)),(95, CAST('7761314653172008095' AS HUGEINT), CAST('3366007655283134767' AS HUGEINT)),(96, CAST('11814690440435435921' AS HUGEINT), CAST('6891898409403446906' AS HUGEINT)),(97, CAST('1105320251969121883' AS HUGEINT), CAST('17343262202220562448' AS HUGEINT)),(98, CAST('13501766296712335639' AS HUGEINT), CAST('13214800971078148629' AS HUGEINT)),(99, CAST('13739094096181386463' AS HUGEINT), CAST('16831762735033169500' AS HUGEINT)),(100, CAST('8210609491974554501' AS HUGEINT), CAST('4382590103070185798' AS HUGEINT)),(101, CAST('7464496237744838505' AS HUGEINT), CAST('4863137989774621669' AS HUGEINT)),(102, CAST('6153227672419271685' AS HUGEINT), CAST('7757563950941602299' AS HUGEINT)),(103, CAST('13157387464470375413' AS HUGEINT), CAST('16280494742147394026' AS HUGEINT)),(104, CAST('15156656305153769037' AS HUGEINT), CAST('9102940088911286829' AS HUGEINT)),(105, CAST('5302934877338729551' AS HUGEINT), CAST('3591310641178525461' AS HUGEINT)),(106, CAST('15721607689647135745' AS HUGEINT), CAST('3714432240112385972' AS HUGEINT)),(107, CAST('7350668447369684287' AS HUGEINT), CAST('8298218915660572452' AS HUGEINT)),(108, CAST('2164534462834122149' AS HUGEINT), CAST('18437047743522589496' AS HUGEINT)),(109, CAST('13744174975128628763' AS HUGEINT), CAST('1784937755037984706' AS HUGEINT)),(110, CAST('16732235586306984517' AS HUGEINT), CAST('843186567711051837' AS HUGEINT)),(111, CAST('10108932951917845085' AS HUGEINT), CAST('10933956566130174471' AS HUGEINT)),(112, CAST('15186231919485255385' AS HUGEINT), CAST('8999802954715218159' AS HUGEINT)),(113, CAST('3594022018564067379' AS HUGEINT), CAST('8826591015326365747' AS HUGEINT)),(114, CAST('13957543819327916831' AS HUGEINT), CAST('7738825323609040495' AS HUGEINT)),(115, CAST('8661739536773468721' AS HUGEINT), CAST('10764764186557308228' AS HUGEINT)),(116, CAST('16865123829182479995' AS HUGEINT), CAST('11666028803861412160' AS HUGEINT)),(117, CAST('1834259532742582725' AS HUGEINT), CAST('17047879759299074604' AS HUGEINT)),(118, CAST('2953978149157085429' AS HUGEINT), CAST('8055474199420154557' AS HUGEINT)),(119, CAST('15277699873020400955' AS HUGEINT), CAST('16572825319487891809' AS HUGEINT)),(120, CAST('18161880236535812061' AS HUGEINT), CAST('15955440571319364142' AS HUGEINT)),(121, CAST('3932050099488213061' AS HUGEINT), CAST('13988760277360615667' AS HUGEINT)),(122, CAST('14173269494356648193' AS HUGEINT), CAST('9070587492826488163' AS HUGEINT)),(123, CAST('9014437191441640791' AS HUGEINT), CAST('10702361435307540126' AS HUGEINT)),(124, CAST('2939829710348414437' AS HUGEINT), CAST('10445262313494891432' AS HUGEINT)),(125, CAST('1651925021461507357' AS HUGEINT), CAST('13135863309941376199' AS HUGEINT)),(126, CAST('8928822556985265511' AS HUGEINT), CAST('124246009997301819' AS HUGEINT)),(127, CAST('6302864214067040527' AS HUGEINT), CAST('15695697087449242853' AS HUGEINT))),
        |hv AS (
        | SELECT doc_id, p,
        |  min((( (x % 4294967296) * (a % 4294967296)
        |       + (((x % 4294967296) * (a // 4294967296) + (x // 4294967296) * (a % 4294967296)) % 4294967296) * 4294967296
        |      ) % CAST('18446744073709551616' AS HUGEINT) + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
        | FROM shrows CROSS JOIN perms
        | GROUP BY doc_id, p),
        |sigs AS (SELECT doc_id, list(h ORDER BY p) AS sig FROM hv GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, bnd, sig[bnd * 8 + 1 : bnd * 8 + 8] AS bsig, sig
        | FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bnd)),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS siga, b.sig AS sigb
        | FROM bands a JOIN bands b
        |   ON a.bnd = b.bnd AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        |scored AS (
        | SELECT a_id, b_id,
        |  round(CAST(len(list_filter(generate_series(1, 128), k -> siga[k] = sigb[k])) AS DOUBLE) / 128, 6) AS est_jaccard
        | FROM cand)""".stripMargin.replace("%SRC%", src)

  private val curationCtes: String =
    """n AS (
        | SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'), '\s+', ' ', 'g')) AS text
        | FROM documents),
        |s AS (
        | SELECT doc_id, source, text,
        |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        | FROM (
        |  SELECT doc_id, source, text, len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM n))),
        |f AS (SELECT * FROM s WHERE quality_score >= 0.5),
        |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text)),
        |d AS (SELECT f.* FROM f JOIN k USING (doc_id))""".stripMargin

  /** s6/s7 shared fragment: BM25 replay over `documents` for the
    * default term set (spark, join, vector) — per-doc tf via
    * list_filter (TermFrequencies parity: whitespace tokens of the
    * lowercased text), corpus stats as one aggregate row, the scoring
    * fold in the exact left-to-right order and double arithmetic of
    * Retrieval.termScore (k1 = 1.2, b = 0.75, constants as parsed
    * decimal literals on both sides). Ends in `bm_top(doc_id, score)`
    * = the top-20 list.
    */
  private def bm25TermScore(tf: String, df: String): String =
    (s"""(CASE WHEN $tf > 0
        |   THEN ln(1.0 + (n - $df + 0.5) / ($df + 0.5))
        |        * (CAST($tf AS DOUBLE) * 2.2)
        |        / (CAST($tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (sum_dl / n))))
        |   ELSE 0.0 END)""").stripMargin
  private val bm25Ctes: String =
    ("""bm_tf AS (
        | SELECT doc_id, len(toks) AS dl,
        |  len(list_filter(toks, x -> x = 'spark')) AS tf0,
        |  len(list_filter(toks, x -> x = 'join')) AS tf1,
        |  len(list_filter(toks, x -> x = 'vector')) AS tf2
        | FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents)),
        |bm_st AS (
        | SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sum_dl,
        |  CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |  CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |  CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        | FROM bm_tf),
        |bm_scored AS (
        | SELECT doc_id, round(""" + "\n"
      + bm25TermScore("tf0", "df0") + "\n + " + bm25TermScore("tf1", "df1")
      + "\n + " + bm25TermScore("tf2", "df2") + ", 6) AS score\n"
      + """ FROM bm_tf CROSS JOIN bm_st),
        |bm_top AS (
        | SELECT doc_id, score FROM bm_scored WHERE score > 0
        | ORDER BY score DESC, doc_id LIMIT 20)""").stripMargin

  /** s8 fragment: the greedy MMR selection UNROLLED into 10 pick/
    * rescore stage pairs (s3's unrolled-Lloyd technique — greedy
    * argmax-over-a-set steps cannot be a linear recursion). Builds on
    * sqKnnCtes' `scored` (relevance) and `n8` (int8 codes + integer
    * norms): candidate similarity is the quantized integer cosine, so
    * every comparison the greedy makes is bit-identical to the Scala
    * driver loop (integer dot, double division, 0.5·rel − 0.5·maxsim
    * in the same operation order).
    */
  private val mmrCtes: String = {
    def sim(a: String, p: String): String =
      s"""CASE WHEN $a.nsq = 0 OR $p.nsq = 0 THEN 0.0
         |   ELSE CAST(list_sum(list_transform(generate_series(1, len($a.q)), i -> $a.q[i] * $p.q[i])) AS DOUBLE)
         |        / (sqrt(CAST($a.nsq AS DOUBLE)) * sqrt(CAST($p.nsq AS DOUBLE))) END""".stripMargin
    // MATERIALIZED throughout: every stage is ≤ 20 rows, and each is
    // referenced twice (by its pick and its rescore) — inlining would
    // re-expand the whole upstream chain per reference, exponentially
    val sb = new StringBuilder
    sb ++= ("mmr_cand AS MATERIALIZED (\n" +
      " SELECT s.n_id, round(s.cos8, 6) AS rel, n.q, n.nsq\n" +
      " FROM scored s JOIN n8 n ON n.vec_id = s.n_id\n" +
      " WHERE s.q_id = 0 AND s.rank <= 20),\n")
    sb ++= "mp1 AS MATERIALIZED (SELECT n_id, rel, q, nsq, rel AS mmr_score FROM mmr_cand ORDER BY rel DESC, n_id LIMIT 1),\n"
    sb ++= s"mr1 AS MATERIALIZED (SELECT c.n_id, c.rel, c.q, c.nsq, ${sim("c", "p")} AS maxsim FROM mmr_cand c, mp1 p WHERE c.n_id <> p.n_id)"
    for (i <- 2 to 10) {
      sb ++= s",\nmp$i AS MATERIALIZED (SELECT n_id, rel, q, nsq, 0.5 * rel - 0.5 * maxsim AS mmr_score FROM mr${i - 1} ORDER BY 0.5 * rel - 0.5 * maxsim DESC, n_id LIMIT 1)"
      if (i < 10)
        sb ++= s",\nmr$i AS MATERIALIZED (SELECT r.n_id, r.rel, r.q, r.nsq, greatest(r.maxsim, ${sim("r", "p")}) AS maxsim FROM mr${i - 1} r, mp$i p WHERE r.n_id <> p.n_id)"
    }
    sb.toString
  }
  private val mmrSelect: String =
    (1 to 10).map(i =>
      s"SELECT n_id AS doc_id, $i AS mmr_rank, round(mmr_score, 6) AS mmr_score, rel FROM mp$i")
      .mkString("\nUNION ALL ") + "\nORDER BY mmr_rank"

  /** Shared by x9 (global-window spelling) and x9b (banded/salted
    * spelling) — the two must be row-identical by construction.
    */
  private val x9Sql: String =
    """WITH q AS (
      | SELECT doc_id, source, n_tokens,
      |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
      | FROM (
      |  SELECT doc_id, source, len(toks) AS n_tokens,
      |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
      |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
      |  FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))),
      |c AS (
      | SELECT doc_id, source, n_tokens, quality_score,
      |  CAST(sum(n_tokens) OVER (PARTITION BY source
      |    ORDER BY quality_score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      | FROM q WHERE quality_score IS NOT NULL)
      |SELECT doc_id, source, n_tokens, cum_tokens, quality_score FROM c
      |WHERE cum_tokens <= CASE source WHEN 'src0' THEN 6000 ELSE 3000 END
      |ORDER BY doc_id""".stripMargin

  /** DuckDB-runnable ANSI SQL oracle per query key (same parquet
    * tables, registered by table name). Column aliases MUST match the
    * Spark side exactly.
    */
  /** Shared d3/t21 oracle fragment: bit-exact ShingleHashes(n=1,
    * keep-reps) replay - FNV-1a 64 over UTF-16 units per token,
    * then the splitmix64 finalizer applied twice, all in HUGEINT
    * mod-2^64 arithmetic with 32-bit-split modular multiplies.
    */
  private val tokenHashesSql: String =
    "list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(regexp_split_to_array(text, '\\s+'), tk -> list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), list_transform(regexp_split_to_array(tk, ''), ch -> CAST(unicode(ch) AS HUGEINT))), (acc, c) -> (((xor(acc, c)) % 4294967296) * 435 + ((((xor(acc, c)) % 4294967296) * 256 + ((xor(acc, c)) // 4294967296) * 435) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT))), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31))"

  def oracleSql: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "a3_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "a4_window_rank" ->
      """SELECT * FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "a5_distinct_stats" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END),4) AS finished_value,
        | round(avg(o_totalprice),4) AS avg_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a6_semi_anti" ->
      """SELECT c_custkey,
        | EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "a7_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "p1_bronze_decode" ->
      """SELECT event_id, event_type,
        | CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "p2_silver_clean" ->
      """SELECT event_id, user_id, event_type,
        | date_trunc('minute', ts) AS event_minute,
        | (event_type = 'error') AS is_error,
        | CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events)
        |ORDER BY event_id""".stripMargin,
    "p3_gold_window15m" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(sum(value),2) / count(*) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p4_gold_sliding" ->
      """SELECT user_id,
        | round(sum(value),2) / count(*) AS avg_value,
        | count(*) AS n_events,
        | window_start,
        | window_start + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *, time_bucket(INTERVAL '5 minutes', ts) - (o.i * INTERVAL '5 minutes') AS window_start
        |      FROM events CROSS JOIN (VALUES (0),(1),(2)) o(i))
        |GROUP BY user_id, window_start
        |ORDER BY window_start, user_id""".stripMargin,
    "p5_dq_checks" ->
      """SELECT * FROM (
        | SELECT 'avg_value' AS check_name, round(avg(value),6) AS value,
        |   round(avg(value),6) BETWEEN 0 AND 1000 AS passed FROM events
        | UNION ALL
        | SELECT 'duplicate_count_event_id', CAST(count(event_id) - count(DISTINCT event_id) AS DOUBLE) AS v,
        |   (count(event_id) - count(DISTINCT event_id)) <= 0 FROM events
        | UNION ALL
        | SELECT 'min_value', round(min(value),6) AS v, round(min(value),6) >= 0 FROM events
        | UNION ALL
        | SELECT 'missing_count_user_id', CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS v,
        |   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) <= 0 FROM events
        | UNION ALL
        | SELECT 'row_count', CAST(count(*) AS DOUBLE) AS v, count(*) > 0 FROM events
        |) ORDER BY check_name""".stripMargin,
    "p6_stream_gold" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(sum(value),2) / count(*) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p7_backfill_silver" ->
      """SELECT user_id, count(*) AS n_events,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(sum(value),4) AS total_value,
        | max(date_trunc('minute', ts)) AS last_seen_minute
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // p8: one-day read of the date-partitioned lake; the oracle
    // filters the flat events table to the same (min) day
    "p8_lake_day" ->
      """SELECT event_type,
        | strftime(CAST(ts AS DATE), '%Y-%m-%d') AS p_date,
        | count(*) AS n_events,
        | round(sum(value), 2) / count(*) AS avg_value
        |FROM events
        |WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
        |GROUP BY event_type, CAST(ts AS DATE)
        |ORDER BY event_type""".stripMargin,
    "t1_quality_score" ->
      """SELECT doc_id, len_chars, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
        | round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        |FROM (
        | SELECT doc_id,
        |  length(text) AS len_chars,
        |  len(toks) AS n_tokens,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
        |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_word_len
        | FROM (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "t2_token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3)
        |SELECT a_id, b_id, round(j, 6) AS jaccard FROM (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        | FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin,
    "d5_embed_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    "s1_knn_bruteforce" ->
      """SELECT q_id, n_id, rank, round(cos, 6) AS cosine FROM (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        | FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) q JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // s4: int8 quantization replays exactly — integer dot products
    // and norms have no summation-order drift; the only float math
    // (scale division) is pinned to double on both sides
    "s4_sq_knn" -> ("WITH " + sqKnnCtes +
      """
        |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos8, 6) AS cosine_q8
        |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin),
    // s5: the s4 quantized-ANN replay joined back to documents for
    // the neighbors' metadata (doc_id and vec_id share one id space)
    "s5_semantic_search" -> ("WITH " + sqKnnCtes +
      """
        |SELECT s.q_id, s.n_id, CAST(s.rank AS BIGINT) AS rank,
        | round(s.cos8, 6) AS cosine_q8, d.source AS n_source, d.lang AS n_lang
        |FROM scored s JOIN documents d ON s.n_id = d.doc_id
        |WHERE s.rank <= 5 ORDER BY s.q_id, s.rank""".stripMargin),
    "m1_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS byte_len,
        | upper(substr(hex(encode(text)), 1, 4)) AS magic_hex,
        | md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "st1_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM x)),
        |z AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM y)
        |SELECT user_id, session_seq,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        | count(*) AS n_events, round(sum(value),4) AS total_value
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "st2_asof_join" ->
      """SELECT l.event_id, l.user_id,
        | r.event_id AS signup_event_id, r.ts_us AS signup_ts_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) l
        |ASOF LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'signup') r
        | ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.event_id""".stripMargin,
    "a8_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
        | round(quantile_cont(l_extendedprice, 0.75), 4) AS price_p75,
        | round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // a5b: same tolerance-flag pattern as a8b — oracle states the
    // exact distinct counts and `true` flags
    "a5b_approx_distinct" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS exact_custs,
        | true AS approx_within_5pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // a8b: oracle states the EXACT percentiles and `true` tolerance
    // flags — the Spark side computes both sketch and exact, so any
    // sketch drift beyond 1% relative error hash-mismatches here
    "a8b_approx_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50_exact,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95_exact,
        | true AS p50_within_tol,
        | true AS p95_within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a9_moment_stats" ->
      """SELECT l_linestatus,
        | round(stddev_samp(l_extendedprice), 4) AS price_sd,
        | round(var_samp(l_quantity), 6) AS qty_var,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_cov
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "a10_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, prev_price, next_price,
        | round(l_extendedprice - prev_price, 4) AS delta_prev
        |FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  lag(l_extendedprice) OVER w AS prev_price,
        |  lead(l_extendedprice) OVER w AS next_price
        | FROM lineitem
        | WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice))
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "x1_hash_sample" ->
      """SELECT doc_id, source FROM documents WHERE doc_id % 10 < 3 ORDER BY doc_id""".stripMargin,
    "x2_source_cap" ->
      """SELECT doc_id, source, quality_score FROM (
        | SELECT doc_id, source, quality_score,
        |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
        | FROM (
        |  SELECT doc_id, source,
        |   round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        |  FROM (
        |   SELECT doc_id, source, len(toks) AS n_tokens,
        |    round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |   FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))))
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "x3_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'), '\s+', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x4_curation" -> ("WITH " + curationCtes +
      """
        |SELECT doc_id, source, quality_score FROM (
        | SELECT doc_id, source, quality_score,
        |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
        | FROM d)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin),
    // x4b: x4 plus minhash near-dup clustering between scoring and
    // capping - the pair stage replays the d2 pipeline over the
    // curated survivor set `d`, the d6-style recursive closure
    // assigns min-id labels, and only cluster representatives
    // (or untouched singletons) reach the per-source cap
    "x4b_curation_neardup" -> ("WITH RECURSIVE " + curationCtes + ",\n" +
      minhashPairCtes("d") +
      """,
        |p AS (SELECT a_id, b_id FROM scored WHERE est_jaccard >= 0.5),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
        |reach AS (
        | SELECT src AS id, src AS r FROM edges
        | UNION
        | SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |kept AS (SELECT d.* FROM d LEFT JOIN labels USING (doc_id)
        |         WHERE coalesce(cluster_id, doc_id) = doc_id)
        |SELECT doc_id, source, quality_score FROM (
        | SELECT doc_id, source, quality_score,
        |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
        | FROM kept)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin),
    "st3_range_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        | p.ts_us - c.ts_us AS gap_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase') p
        | ON c.user_id = p.user_id
        | AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 30 * 60 * 1000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    // x7: identical regexes mean the same thing to Java regex and
    // RE2; redaction order (emails, then phones) matches the entry
    "x7_pii_redact" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        | CAST(len(regexp_extract_all(text, '\d{3}[- .]\d{3}[- .]\d{4}')) AS INTEGER) AS n_phones,
        | regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
        |   '\d{3}[- .]\d{3}[- .]\d{4}', '<phone>', 'g') AS pii_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x5_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 10 < (CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 8 ELSE 6 END)
        |ORDER BY doc_id""".stripMargin,
    "a11_promo_share" ->
      """SELECT
        | round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS promo_revenue,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
        | round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
        |       sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    // a13: portable pivot replay — conditional aggregation per pinned
    // event type; avg over a filtered subset == pivot cell
    "a13_pivot_daily" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        | round(sum(value) FILTER (event_type = 'click'), 2) / count(*) FILTER (event_type = 'click') AS avg_click,
        | round(sum(value) FILTER (event_type = 'error'), 2) / count(*) FILTER (event_type = 'error') AS avg_error,
        | round(sum(value) FILTER (event_type = 'purchase'), 2) / count(*) FILTER (event_type = 'purchase') AS avg_purchase,
        | round(sum(value) FILTER (event_type = 'signup'), 2) / count(*) FILTER (event_type = 'signup') AS avg_signup,
        | round(sum(value) FILTER (event_type = 'view'), 2) / count(*) FILTER (event_type = 'view') AS avg_view
        |FROM events
        |GROUP BY CAST(ts AS DATE)
        |ORDER BY day""".stripMargin,
    // a12: bucketing changes the physical layout, never the result —
    // the oracle is the plain join
    "a12_bucket_join" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        | count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "t5_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // t22: tf/df/N replay with the same ln-idf expression tree; the
    // rank rides the 4dp-ROUNDED score (t10/t11's cross-engine
    // contract) with the token-asc tiebreak
    "t22_keywords" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        | FROM documents),
        |tf AS (
        | SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY 1, 2),
        |d AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        | SELECT tf.doc_id, tf.token, tf.tf, d.df,
        |  round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS score
        | FROM tf JOIN d USING (token) CROSS JOIN n),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, token) AS rnk FROM s)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rank, token, tf, df, score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,
    // t6: max sorted-run length == max token multiplicity, so the
    // oracle's per-distinct-token recount replays the Spark fold
    "t6_repetition" ->
      """SELECT doc_id, n_tokens,
        | round(CASE WHEN n_grams > 0
        |   THEN CAST(n_grams - distinct_grams AS DOUBLE) / n_grams ELSE 0.0 END, 6) AS dup_3gram_frac,
        | top_token_count,
        | round(CAST(top_token_count AS DOUBLE) / n_tokens, 6) AS top_token_frac
        |FROM (
        | SELECT doc_id, len(toks) AS n_tokens,
        |  greatest(0, len(toks) - 2) AS n_grams,
        |  len(list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS distinct_grams,
        |  CAST(list_max(list_transform(list_distinct(toks),
        |    x -> len(list_filter(toks, y -> y = x)))) AS INTEGER) AS top_token_count
        | FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // t7: avg of doubles — both engines sum in different orders, so
    // round(4) absorbs the ~1e-12 associativity drift (a9 precedent)
    "t7_lm_surprisal" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |vocab AS (SELECT token, count(*) AS cnt FROM t2 GROUP BY token),
        |tot AS (SELECT sum(cnt) AS total FROM vocab)
        |SELECT doc_id,
        | round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 4) AS avg_surprisal,
        | count(*) AS n_scored
        |FROM t2 JOIN vocab USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // st4: interval-interval overlap; the oracle is the direct
    // inequality join the bucketed plan must reproduce exactly
    "st4_interval_join" ->
      """SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
        | greatest(c.ts_us, e.ts_us - 600000000) AS overlap_start_us,
        | least(c.ts_us + 1800000000, e.ts_us + 600000000) AS overlap_end_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error') e
        | ON c.user_id = e.user_id
        | AND e.ts_us - 600000000 <= c.ts_us + 1800000000
        | AND c.ts_us <= e.ts_us + 600000000
        |ORDER BY click_id, error_id""".stripMargin,
    // t4: stopword-profile argmax; ties break to the lexicographically
    // LARGEST language code (Spark sorts struct(hits, lang) descending)
    "t4_lang_id" ->
      """SELECT doc_id,
        | CASE WHEN COALESCE(greatest(h_en, h_de, h_es, h_fr), 0) = 0 THEN 'und'
        |      WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
        |      WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
        |      WHEN h_en >= h_de THEN 'en'
        |      ELSE 'de' END AS lang_pred,
        | CAST(greatest(h_en, h_de, h_es, h_fr) AS INTEGER) AS lang_score
        |FROM (
        | SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'is'))) AS h_en,
        |  len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS h_de,
        |  len(list_filter(toks, x -> x IN ('el', 'la', 'los', 'que', 'es'))) AS h_es,
        |  len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS h_fr
        | FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // x6: replay of the chunked next-fit packer as a linear recursion
    // over each 64-id chunk (depth = docs per chunk)
    "x6_pack_sequences" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS n,
        |  doc_id // 64 AS chunk,
        |  CAST(row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS INTEGER) AS rn
        | FROM documents WHERE text IS NOT NULL),
        |state AS (
        | SELECT chunk, rn, doc_id, n, 0 AS bin, n AS used FROM toks WHERE rn = 1
        | UNION ALL
        | SELECT t.chunk, t.rn, t.doc_id, t.n,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN s.bin + 1 ELSE s.bin END,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN t.n ELSE s.used + t.n END
        | FROM toks t JOIN state s ON t.chunk = s.chunk AND t.rn = s.rn + 1)
        |SELECT doc_id, chunk * 1048576 + bin AS bin_id, n AS n_tokens
        |FROM state ORDER BY doc_id""".stripMargin,
    // d6: connected components = transitive closure over the exact
    // jaccard pair set (the same pairs d4 verifies), min-id labels
    "d6_dedup_clusters" ->
      ("WITH RECURSIVE " + ccLabelCtes + """,
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
        |SELECT l.doc_id, l.cluster_id, s.cluster_size, (l.doc_id = l.cluster_id) AS keep
        |FROM labels l JOIN sizes s USING (cluster_id)
        |WHERE s.cluster_size > 1
        |ORDER BY l.doc_id""".stripMargin),
    // d3: bit-exact DuckDB replay of the simhash pipeline — FNV-1a 64
    // per token then the splitmix64 finalizer applied twice
    // (ShingleHashes n=1 mixes the token hash, then the 1-gram combine
    // mixes again), all in HUGEINT mod-2^64 arithmetic with 32-bit-split
    // modular multiplies (BIGINT would overflow-error, HUGEINT can't
    // hold a 64x64 product); bit-majority vote, then all-pairs
    // bit_count(xor) <= 3 — which is exactly what the Spark side's
    // pigeonhole blocking returns (3 flipped bits cannot touch all
    // four 16-bit chunks). Layered list_transform stages keep each
    // lambda tiny (a nested textual expansion re-evaluates
    // subexpressions exponentially).
    "d3_simhash" ->
      s"""WITH th AS (
        | SELECT doc_id, $tokenHashesSql AS ths
        | FROM documents),
        |sims AS (
        | SELECT doc_id,
        |  list_sum(list_transform(generate_series(0, 63), j ->
        |    CASE WHEN 2 * len(list_filter(ths, t -> (t >> j) % 2 = 1)) > len(ths)
        |         THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END)) AS u
        | FROM th),
        |sg AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS sim
        | FROM sims)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // m2: the deterministic stub decode is a 31x byte fold mod 2^64 —
    // replayable in HUGEINT (31*(2^64) fits without splitting)
    "m2_feature_extract" ->
      """WITH h AS (
        | SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        | CAST(byte_len AS INTEGER) AS byte_len,
        | CAST(64 + u % 1024 AS INTEGER) AS width,
        | CAST(64 + (u // 131072) % 1024 AS INTEGER) AS height,
        | CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        | abs(CAST((CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |        THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END) AS BIGINT) % 1000000)
        |   / 1000000.0 AS feat_norm
        |FROM h ORDER BY doc_id""".stripMargin,
    // t12: d11's shingle replay → global first-seen min → per-doc
    // novel fraction; LEFT JOIN keeps shingle-less docs (null rate)
    "t12_novelty" ->
      """WITH g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |f AS (SELECT s, min(doc_id) AS first_id FROM g GROUP BY s),
        |per AS (
        | SELECT g.doc_id, count(*) AS n_shingles,
        |  sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS n_novel
        | FROM g JOIN f USING (s) GROUP BY g.doc_id)
        |SELECT d.doc_id,
        | CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
        | CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
        | round(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // st10: running event-time max over the arrival order (event_id)
    // per key; lateness = how far behind the max an event lands
    "st10_disorder_audit" ->
      """WITH x AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (
        | SELECT user_id,
        |  CASE WHEN max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > ts_us
        |   THEN max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_us
        |   ELSE 0 END AS late_us
        | FROM x)
        |SELECT user_id, count(*) AS n_events,
        | CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        | max(late_us) AS max_late_us
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,
    "p15_profile_drift" -> p15Oracle,
    "p14b_approx_profile" -> p14bOracle,
    "p15b_approx_drift" -> p15bOracle,
    // st13: st5's k-join funnel replay, unpivoted per transition,
    // quantile_cont == Spark's exact interpolated percentile (a8)
    "st13_funnel_timing" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
        | WHERE user_id IS NOT NULL
        |  AND event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM ev e JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM ev e JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |f AS (SELECT u.user_id, s1.t1, s2.t2, s3.t3
        |      FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |      LEFT JOIN s3 USING (user_id)),
        |p AS (
        | SELECT 'step1_to_step2' AS transition, CAST(t2 - t1 AS DOUBLE) AS delay_us,
        |  t1 IS NOT NULL AS eligible FROM f
        | UNION ALL
        | SELECT 'step2_to_step3', CAST(t3 - t2 AS DOUBLE), t2 IS NOT NULL FROM f)
        |SELECT transition,
        | CAST(sum(CASE WHEN eligible THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible,
        | count(delay_us) AS n_converted,
        | round(CAST(count(delay_us) AS DOUBLE)
        |   / sum(CASE WHEN eligible THEN 1 ELSE 0 END), 6) AS conv_rate,
        | round(quantile_cont(delay_us, 0.25), 4) AS delay_p25_us,
        | round(quantile_cont(delay_us, 0.5), 4) AS delay_p50_us,
        | round(quantile_cont(delay_us, 0.75), 4) AS delay_p75_us
        |FROM p GROUP BY transition ORDER BY transition""".stripMargin,
    // x16: x14's token sums per source; plan math replays on the
    // tiny frame — rate rounds BEFORE the expected-tokens product
    "x16_mix_rebalance" ->
      """WITH g AS (
        | SELECT source,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS tot, count(*) AS ns FROM g),
        |r AS (
        | SELECT source, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / tot, 6) AS share,
        |  round(1.0 / ns, 6) AS target_share,
        |  round(least(1.0, (1.0 / ns) * CAST(tot // 2 AS BIGINT) / n_tokens), 6) AS rate,
        |  (1.0 / ns) * CAST(tot // 2 AS BIGINT) >= n_tokens AS capped
        | FROM g, t)
        |SELECT source, n_tokens, share, target_share, rate,
        | round(rate * n_tokens, 4) AS expected_tokens, capped
        |FROM r ORDER BY source""".stripMargin,
    // x18: epoch repeat plan — integer token sums in, double plan
    // math replayed with identical operation order
    "x18_epoch_plan" ->
      """WITH g AS (
        | SELECT source,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS tot, count(*) AS ns FROM g),
        |r AS (
        | SELECT source, n_tokens, (1.0 / ns) * tot AS alloc,
        |  least(CAST(floor((1.0 / ns) * tot / n_tokens) AS BIGINT), 4) AS fullp
        | FROM g, t),
        |r2 AS (
        | SELECT source, n_tokens, alloc, fullp,
        |  CASE WHEN fullp < 4 THEN (alloc - fullp * n_tokens) / n_tokens
        |       ELSE 0.0 END AS frac
        | FROM r),
        |r3 AS (
        | SELECT source, n_tokens, alloc, fullp, frac,
        |  round((fullp + frac) * n_tokens, 4) AS planned
        | FROM r2)
        |SELECT source, n_tokens, round(alloc, 4) AS alloc_tokens,
        | CAST(fullp + CASE WHEN frac > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_epochs,
        | round(frac, 6) AS last_epoch_rate,
        | planned AS planned_tokens,
        | round(greatest(alloc - planned, 0.0), 4) AS deficit
        |FROM r3 ORDER BY source""".stripMargin,
    // st15: the correlated "latest touch before t" spelled as the
    // same strict-preceding IGNORE NULLS carry-forward window
    "st15_attribution" ->
      """SELECT event_id, user_id, ts_us, touch_event_id, touch_type, touch_ts_us,
        | touch_event_id IS NOT NULL AS attributed,
        | ts_us - touch_ts_us AS touch_age_us
        |FROM (
        | SELECT event_id, user_id, ts_us, event_type,
        |  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
        |    OVER w AS touch_event_id,
        |  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
        |    OVER w AS touch_type,
        |  last_value(CASE WHEN event_type IN ('click', 'view') THEN ts_us END IGNORE NULLS)
        |    OVER w AS touch_ts_us
        | FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events)
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // a28: ntile over the aggregated spend frame; DuckDB's ntile
    // uses the same larger-first remainder rule as Spark
    "a28_spend_deciles" ->
      """WITH s AS (
        | SELECT o_custkey, round(sum(o_totalprice), 4) AS spend
        | FROM orders GROUP BY o_custkey),
        |d AS (
        | SELECT spend,
        |  CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS decile
        | FROM s)
        |SELECT decile, count(*) AS n_custs,
        | round(min(spend), 4) AS min_spend,
        | round(max(spend), 4) AS max_spend,
        | round(sum(spend), 4) AS total_spend
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    // t14: rank over the vocab frame, ladder via conditional sums
    "t14_vocab_coverage" ->
      """WITH c AS (
        | SELECT token, count(*) AS n
        | FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents)
        | WHERE token <> '' GROUP BY token),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens, count(*) AS vocab_size FROM c),
        |m AS (
        | SELECT d.k, CAST(sum(CASE WHEN rk <= d.k THEN n END) AS BIGINT) AS topk_mass
        | FROM r CROSS JOIN (VALUES (10), (100), (1000), (10000)) d(k)
        | GROUP BY d.k)
        |SELECT CAST(k AS BIGINT) AS k,
        | CAST(least(k, vocab_size) AS BIGINT) AS n_types,
        | topk_mass, total_tokens,
        | round(CAST(topk_mass AS DOUBLE) / total_tokens, 6) AS coverage
        |FROM m, t ORDER BY k""".stripMargin,
    // d18: closure labels + t1 replay, per-cluster spread audit
    "d18_cluster_report" -> ("WITH RECURSIVE " + ccLabelCtes + """,
        |q AS (
        | SELECT doc_id, len(toks) AS n_tokens,
        |  round(least(1.0, len(toks) / 100.0) * 0.5
        |   + round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) * 0.3
        |   + (1.0 - round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6)) * 0.2, 6) AS quality_score
        | FROM (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))
        |SELECT l.cluster_id, count(*) AS cluster_size,
        | round(min(q.quality_score), 6) AS min_quality,
        | round(max(q.quality_score), 6) AS max_quality,
        | CAST(sum(CAST(round(q.quality_score * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_quality_e6,
        | CAST(min(q.n_tokens) AS BIGINT) AS min_tokens,
        | CAST(max(q.n_tokens) AS BIGINT) AS max_tokens
        |FROM labels l JOIN q USING (doc_id)
        |GROUP BY l.cluster_id HAVING count(*) > 1
        |ORDER BY l.cluster_id""".stripMargin),
    // s14: even/odd halves, float-cast centroid components (s13's
    // discipline), index-ordered norm folds — all engine-exact
    "s14_centroid_drift" ->
      """WITH comp AS (
        | SELECT label, vec_id % 2 AS h, generate_subscripts(embedding, 1) AS i,
        |  unnest(embedding) AS v
        | FROM embeddings WHERE embedding IS NOT NULL),
        |cent AS (
        | SELECT label, h, list(CAST(cv AS FLOAT) ORDER BY i) AS c, max(n) AS n_vecs
        | FROM (SELECT label, h, i, avg(CAST(v AS DOUBLE)) AS cv, count(*) AS n
        |       FROM comp GROUP BY label, h, i)
        | GROUP BY label, h)
        |SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
        | round(list_cosine_similarity(CAST(a.c AS DOUBLE[]), CAST(b.c AS DOUBLE[])), 6)
        |   AS centroid_cos,
        | round(sqrt(list_reduce(list_transform(CAST(b.c AS DOUBLE[]), x -> x * x),
        |         (p, q) -> p + q))
        |   / sqrt(list_reduce(list_transform(CAST(a.c AS DOUBLE[]), x -> x * x),
        |         (p, q) -> p + q)), 6) AS norm_ratio
        |FROM cent a JOIN cent b ON a.label = b.label AND a.h = 0 AND b.h = 1
        |ORDER BY a.label""".stripMargin,
    // st12: CUSUM argmax over the day-grain series; all sums fold in
    // day order (window cumsum), argmax ties break earliest-day
    "st12_changepoint" ->
      """WITH s AS (
        | SELECT event_type AS series, CAST(ts AS DATE) AS day, avg(value) AS x
        | FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT series, day, x,
        |  sum(x) OVER (PARTITION BY series ORDER BY day ROWS UNBOUNDED PRECEDING) AS s,
        |  row_number() OVER (PARTITION BY series ORDER BY day) AS t,
        |  count(*) OVER (PARTITION BY series) AS n,
        |  sum(x) OVER (PARTITION BY series) AS total
        | FROM s),
        |d AS (SELECT *, abs(s - CAST(t AS DOUBLE) / n * total) AS d
        |      FROM c WHERE t < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY series
        |        ORDER BY d DESC, day) AS rk FROM d)
        |SELECT series, day AS cp_day, n AS n_days,
        | round(s / t, 4) AS pre_mean,
        | round((total - s) / (n - t), 4) AS post_mean,
        | round((total - s) / (n - t) - s / t, 4) AS shift,
        | round(d, 4) AS cusum_score
        |FROM r WHERE rk = 1 ORDER BY series""".stripMargin,
    // t13: rank window (count desc, token asc — deterministic), top-V
    // cut, closed-form OLS slope; integer counts → identical ln
    // inputs, 4dp absorbs the unordered-sum noise (t11 pattern)
    "t13_zipf_alpha" ->
      """WITH c AS (
        | SELECT source, t AS token, count(*) AS c
        | FROM (SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS t
        |       FROM documents)
        | WHERE t <> '' GROUP BY source, t),
        |r AS (SELECT source, c,
        |  row_number() OVER (PARTITION BY source ORDER BY c DESC, token) AS r
        | FROM c),
        |x AS (SELECT source, ln(r) AS x, ln(c) AS y FROM r WHERE r <= 100)
        |SELECT source, count(*) AS n_terms,
        | round(-(count(*) * sum(x*y) - sum(x) * sum(y))
        |   / (count(*) * sum(x*x) - sum(x) * sum(x)), 4) AS zipf_alpha
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    // m5: text payloads all route through the stub content fold
    // (m4's HUGEINT replay); the group verdict replays over the hash
    "m5_phash_dupes" ->
      """WITH h AS (
        | SELECT doc_id, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |   list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |   (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL),
        |s AS (
        | SELECT doc_id, CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |   THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS phash
        | FROM h)
        |SELECT doc_id, phash,
        | count(*) OVER (PARTITION BY phash) AS n_copies,
        | doc_id = min(doc_id) OVER (PARTITION BY phash) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    // st11: micro-batch = event_id DIV 1000; the watermark in force
    // during a batch is the running max of EARLIER batch maxima minus
    // the delay (batch-boundary advance, Spark semantics); four
    // candidate delays as conditional sums over one joined pass
    "st11_watermark_sim" ->
      """WITH x AS (
        | SELECT event_id // 1000 AS b, epoch_us(ts) AS ts_us FROM events),
        |bm AS (SELECT b, max(ts_us) AS bmax FROM x GROUP BY b),
        |wm AS (SELECT b, max(bmax) OVER (ORDER BY b
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base
        |       FROM bm),
        |j AS (SELECT x.ts_us, wm.wm_base FROM x JOIN wm USING (b))
        |SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
        | count(*) AS n_events,
        | CAST(sum(CASE WHEN wm_base - d.delay_s * 1000000 > ts_us
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        | round(CAST(sum(CASE WHEN wm_base - d.delay_s * 1000000 > ts_us
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS drop_frac
        |FROM j CROSS JOIN (VALUES (0), (60), (300), (900)) d(delay_s)
        |GROUP BY d.delay_s ORDER BY delay_s""".stripMargin,
    // a21: Q8-shape market share — ASIA market, PROMO parts,
    // NATION_3's supplier share by order year
    "a21_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        | round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4) AS nation_revenue,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS market_revenue,
        | round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    // a22: Q22-shape — scalar AVG subquery + NOT EXISTS since cutoff,
    // decorrelated Spark-side into broadcast cross join + anti join
    "a22_dormant_customers" ->
      """SELECT c_nationkey, count(*) AS n_custs,
        | round(sum(c_acctbal), 4) AS total_bal
        |FROM customer,
        | (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
        |WHERE c_acctbal > a
        | AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                 AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // a23: Q18-shape — IN-subquery spelled directly; Spark side
    // decorrelates to aggregate-then-join
    "a23_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | CAST(o_orderdate AS DATE) AS o_day, o_totalprice,
        | round(q.sum_qty, 4) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 250) q ON o_orderkey = q.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // a24: Q13-shape — LEFT join keeps zero-order customers;
    // count(o_custkey) ignores the null-extended rows
    "a24_order_count_hist" ->
      """SELECT c_count, count(*) AS n_custs
        |FROM (SELECT c_custkey, count(o_custkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY c_count""".stripMargin,
    // a25: Q10-shape — returned revenue per customer in a quarter,
    // top 20; ordering is part of the contract
    "a25_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS returned_rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        | AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY returned_rev DESC, c_custkey LIMIT 20""".stripMargin,
    // a26: Q7-shape — bilateral volume, both directions, by ship year
    "a26_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | year(l_shipdate) AS ship_year,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        | AND cn.n_name IN ('NATION_1', 'NATION_2')
        | AND sn.n_name <> cn.n_name
        |GROUP BY supp_nation, cust_nation, ship_year
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    // a27: Q15-shape — view + MAX scalar subquery, ties preserved;
    // revenue rounded on BOTH engines before the equality
    "a27_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // d17: closure labels + t1 quality replay; rep = argmax
    // (quality DESC, doc_id ASC) per cluster, stated as literal truth
    "d17_best_rep_dedup" -> ("WITH RECURSIVE " + ccLabelCtes + """,
        |q AS (
        | SELECT doc_id,
        |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        | FROM (
        |  SELECT doc_id,
        |   len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))),
        |lbl AS (SELECT l.doc_id, l.cluster_id, q.quality_score
        |        FROM labels l JOIN q USING (doc_id)),
        |rep AS (SELECT cluster_id, doc_id AS rep_id FROM (
        |  SELECT cluster_id, doc_id,
        |   row_number() OVER (PARTITION BY cluster_id
        |     ORDER BY quality_score DESC, doc_id) AS rn FROM lbl) WHERE rn = 1)
        |SELECT lbl.doc_id, lbl.cluster_id, lbl.quality_score,
        | rep.rep_id, lbl.doc_id = rep.rep_id AS keep
        |FROM lbl JOIN rep USING (cluster_id)
        |ORDER BY lbl.doc_id""".stripMargin),
    // st14: hourly trending top-k; ties (count DESC, item ASC)
    "st14_trending" ->
      """SELECT hour_ts, item, n_events, CAST(rank AS BIGINT) AS rank FROM (
        | SELECT hour_ts, item, n_events,
        |  row_number() OVER (PARTITION BY hour_ts
        |    ORDER BY n_events DESC, item) AS rank
        | FROM (
        |  SELECT date_trunc('hour', ts) AS hour_ts,
        |   CAST(json_extract(props, '$.k') AS INTEGER) AS item,
        |   count(*) AS n_events
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        |  GROUP BY hour_ts, item))
        |WHERE rank <= 3 ORDER BY hour_ts, rank""".stripMargin,
    // d16: d4's exact pair replay → per-doc degree → histogram;
    // LEFT JOIN keeps the degree-0 population
    "d16_dup_degree" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |deg AS (
        | SELECT doc_id, count(*) AS degree
        | FROM (SELECT a_id AS doc_id FROM p UNION ALL SELECT b_id AS doc_id FROM p)
        | GROUP BY doc_id)
        |SELECT COALESCE(d.degree, 0) AS degree, count(*) AS n_docs
        |FROM documents LEFT JOIN deg d USING (doc_id)
        |GROUP BY degree ORDER BY degree""".stripMargin,
    // x17: GLOBAL-window replay of the banded curriculum rank —
    // proves the two-phase decomposition admits the identical order
    "x17_length_curriculum" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS shuffle_key
        | FROM m5),
        |t AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        | FROM documents WHERE text IS NOT NULL)
        |SELECT t.doc_id, t.n_tokens,
        | CAST(row_number() OVER (ORDER BY t.n_tokens, s.shuffle_key, t.doc_id) AS BIGINT) AS curriculum_pos
        |FROM t JOIN sgn s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // d14: d4's pair replay decorated with sources, unordered pair
    // key via least/greatest; n_pairs halves the exploded rows
    "d14_cross_source_dupes" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |ps AS (
        | SELECT least(da.source, db.source) AS source_a,
        |  greatest(da.source, db.source) AS source_b, a_id, b_id
        | FROM p JOIN documents da ON da.doc_id = p.a_id
        |        JOIN documents db ON db.doc_id = p.b_id),
        |ex AS (
        | SELECT source_a, source_b, a_id AS doc_id FROM ps
        | UNION ALL SELECT source_a, source_b, b_id FROM ps)
        |SELECT source_a, source_b, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
        | count(DISTINCT doc_id) AS n_docs
        |FROM ex GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin,
    // p14: one UNION ALL branch per profiled column; min/max decided
    // on the native type then stringified (both engines), shipdate
    // day-cast
    "p14_profile" ->
      """WITH li AS (SELECT l_orderkey, l_quantity, l_returnflag,
        |  CAST(l_shipdate AS DATE) AS l_shipdate, l_linestatus FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
        | CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
        | count(DISTINCT l_orderkey) AS n_distinct,
        | CAST(min(l_orderkey) AS VARCHAR) AS min_val, CAST(max(l_orderkey) AS VARCHAR) AS max_val
        |FROM li
        |UNION ALL SELECT 'l_quantity', count(*),
        | CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT),
        | count(DISTINCT l_quantity), CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR) FROM li
        |UNION ALL SELECT 'l_returnflag', count(*),
        | CAST(count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS BIGINT),
        | count(DISTINCT l_returnflag), CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR) FROM li
        |UNION ALL SELECT 'l_shipdate', count(*),
        | CAST(count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS BIGINT),
        | count(DISTINCT l_shipdate), CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR) FROM li
        |UNION ALL SELECT 'l_linestatus', count(*),
        | CAST(count(CASE WHEN l_linestatus IS NULL THEN 1 END) AS BIGINT),
        | count(DISTINCT l_linestatus), CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR) FROM li
        |ORDER BY col_name""".stripMargin,
    // a20: capped per-user top-items (count desc, item asc — the
    // deterministic cut), within-user pair join, PMI from marginals;
    // all-integer counts make the double ratio exact, 4dp absorbs ln
    "a20_item_cooccurrence" ->
      """WITH it AS (
        | SELECT user_id, CAST(json_extract(props, '$.k') AS INTEGER) AS item, count(*) AS c
        | FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        | GROUP BY user_id, item),
        |cap AS (
        | SELECT user_id, item FROM (
        |  SELECT user_id, item, row_number() OVER (PARTITION BY user_id ORDER BY c DESC, item) AS rn
        |  FROM it) WHERE rn <= 20),
        |nu AS (SELECT item, count(*) AS n_item FROM cap GROUP BY item),
        |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM cap),
        |pairs AS (
        | SELECT a.item AS item_u, b.item AS item_v, count(*) AS n_cooccur
        | FROM cap a JOIN cap b ON a.user_id = b.user_id AND a.item < b.item
        | GROUP BY 1, 2)
        |SELECT item_u, item_v, n_cooccur,
        | round(ln(CAST(n_cooccur AS DOUBLE) * n_users / (ua.n_item * CAST(ub.n_item AS DOUBLE))), 4) AS pmi
        |FROM pairs
        |JOIN nu ua ON ua.item = pairs.item_u
        |JOIN nu ub ON ub.item = pairs.item_v
        |CROSS JOIN tot
        |ORDER BY item_u, item_v""".stripMargin,
    // a47: the same capped pair graph, three unrolled power-iteration
    // CTEs on the integer micro-mass grid — a floor-div disagreement
    // or a missed dangling base breaks every downstream rank hash
    "a47_pagerank3" ->
      """WITH it AS (
        | SELECT user_id, CAST(json_extract(props, '$.k') AS INTEGER) AS item, count(*) AS c
        | FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        | GROUP BY user_id, item),
        |cap AS (
        | SELECT user_id, item FROM (
        |  SELECT user_id, item, row_number() OVER (PARTITION BY user_id ORDER BY c DESC, item) AS rn
        |  FROM it) WHERE rn <= 20),
        |und AS (
        | SELECT DISTINCT a.item AS src, b.item AS dst
        | FROM cap a JOIN cap b ON a.user_id = b.user_id AND a.item < b.item),
        |edges AS (SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT item FROM cap),
        |r0 AS (SELECT item, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |i1 AS (SELECT e.dst AS item, sum(r.r // d.deg) AS s
        |       FROM edges e JOIN r0 r ON e.src = r.item JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.item, CAST(150000000 + (85 * CAST(coalesce(i.s, 0) AS HUGEINT)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i1 i ON n.item = i.item),
        |i2 AS (SELECT e.dst AS item, sum(r.r // d.deg) AS s
        |       FROM edges e JOIN r1 r ON e.src = r.item JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.item, CAST(150000000 + (85 * CAST(coalesce(i.s, 0) AS HUGEINT)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i2 i ON n.item = i.item),
        |i3 AS (SELECT e.dst AS item, sum(r.r // d.deg) AS s
        |       FROM edges e JOIN r2 r ON e.src = r.item JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.item, CAST(150000000 + (85 * CAST(coalesce(i.s, 0) AS HUGEINT)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i3 i ON n.item = i.item)
        |SELECT r3.item, r3.r AS rank_e9, CAST(coalesce(d.deg, 0) AS BIGINT) AS degree
        |FROM r3 LEFT JOIN deg d ON d.src = r3.item
        |ORDER BY item""".stripMargin,
    // m4: m2's fold → dims, integer-exact box fit, then the fake
    // resize hash = ((31·(31·u + out_w) + out_h) mod 2^64) signed —
    // the corpus never hits the real-BMP pixel path (m2's oracle
    // already proves the dispatch lands on the stub for text bytes)
    "m4_resize" ->
      """WITH h AS (
        | SELECT doc_id, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |   list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |   (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL),
        |d AS (
        | SELECT doc_id, u,
        |  CAST(64 + u % 1024 AS INTEGER) AS width,
        |  CAST(64 + (u // 131072) % 1024 AS INTEGER) AS height
        | FROM h),
        |r AS (
        | SELECT doc_id, u, width, height,
        |  CAST(CASE WHEN greatest(width, height) <= 224 THEN width
        |       ELSE greatest(1, width * 224 // greatest(width, height)) END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN greatest(width, height) <= 224 THEN height
        |       ELSE greatest(1, height * 224 // greatest(width, height)) END AS INTEGER) AS out_h
        | FROM d),
        |v AS (
        | SELECT doc_id, width, height, out_w, out_h,
        |  (31 * ((31 * u + out_w) % CAST('18446744073709551616' AS HUGEINT)) + out_h)
        |    % CAST('18446744073709551616' AS HUGEINT) AS vv
        | FROM r)
        |SELECT doc_id, width, height, out_w, out_h,
        | CAST(CASE WHEN vv >= CAST('9223372036854775808' AS HUGEINT)
        |      THEN vv - CAST('18446744073709551616' AS HUGEINT) ELSE vv END AS BIGINT) AS resize_hash
        |FROM v ORDER BY doc_id""".stripMargin,
    // m3: frame stride/count from the same fold; frame_hash replays
    // java.util.Arrays.hashCode (31x fold mod 2^32, signed)
    "m3_frame_sample" ->
      """WITH h AS (
        | SELECT doc_id,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u,
        |  list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, c) -> (31 * acc + c) % 4294967296) AS ju
        | FROM documents WHERE text IS NOT NULL),
        |s AS (
        | SELECT doc_id,
        |  CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        |  CASE WHEN ju >= 2147483648 THEN ju - 4294967296 ELSE ju END AS jhash,
        |  CAST(((1 + (u // 8589934592) % 16) + 3) // 4 AS INTEGER) AS stride
        | FROM h)
        |SELECT doc_id,
        | CAST(frame // stride AS INTEGER) AS frame_idx,
        | CAST(frame * 33 AS BIGINT) AS ts_ms,
        | CAST(jhash * 31 + frame AS BIGINT) AS frame_hash
        |FROM (SELECT doc_id, stride, jhash, unnest(generate_series(0, n_frames - 1, stride)) AS frame FROM s)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // s2: the hyperplane components are SEED-derived constants
    // (mix64 grid, independent of the data), so the oracle carries
    // them as literal double arrays and replays bucketing (ordered
    // dot-product fold, IEEE-identical to the Scala loop), the
    // 15-mask multiprobe, and exact cosine top-k
    "s2_knn_lsh" ->
      """WITH e AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL),
        |b AS (SELECT vec_id, emb, (CASE WHEN list_reduce(list_transform(generate_series(1, 64), i -> emb[i] * ([0.4831297575436466,0.45635754657871463,0.9630481089290748,0.9368271793005098,0.4603985488322606,-0.03357644549125749,-0.9684409541259245,-0.7789736208837705,0.4611819703474347,-0.2667588911453489,0.9508150578616625,0.565384501766178,0.4709079344353593,-0.1400354270797437,0.22731385379935265,-0.5779585747421894,-0.018082160648132062,0.17632335945531508,0.4612713994312787,-0.4882815987768181,-0.6079280750552198,0.09729213578387763,0.6764662605635758,-0.5701113887968243,-0.6553819639737548,0.7943928788693988,-0.9600642408549158,-0.34906244438900447,-0.1950711965559735,0.6304227290173106,0.11244960518559233,0.6293640398949065,-0.4221708203632022,0.08796208395134997,0.7965401824775487,-0.23166514910531122,-0.32001564564437235,0.05925897520292467,0.48139968791470666,0.13727001683474627,-0.8913589471335024,-0.9257255592949607,0.6202509734760469,-0.13996566450801784,0.6506063592890625,0.9122493482829299,-0.5186953222819857,0.6325727875653409,0.871791855850985,0.9400949302588086,0.22926522133059946,0.9630094184718285,0.9206264852428769,0.9645406272645731,-0.23283117264482112,-0.3799541627678693,0.8822833041783757,-0.47693905686123084,-0.7254148028128147,0.6328824011969005,-0.8652287553119871,-0.7976282174065479,-0.4416413790413063,0.4659016611869382])[i]), (a, b) -> a + b) > 0 THEN 1 ELSE 0 END) + (CASE WHEN list_reduce(list_transform(generate_series(1, 64), i -> emb[i] * ([0.2889205464457245,-0.4495970664914146,0.919027945491357,0.799238360011836,-0.45197554778791194,-0.3353801145468889,-0.959043040503361,-0.5234482802636802,-0.6729479552904831,-0.06037505269491028,-0.4428744425425537,0.889057750434421,0.20077641769609622,-0.4473533829798164,-0.9479189317555625,-0.3682719842491622,-0.48471940118165846,-0.07928915078675969,0.9822750200153878,-0.705697358413371,-0.6040064215399448,-0.6732622410470992,0.26472694283760845,-0.5887696831269638,0.875961467903184,-0.7371957754026699,0.8798713150077997,0.41073411356514966,-0.5157736693515571,-0.29589974932217666,-0.1303036949033327,0.2133401434261859,-0.45580638158152653,-0.7961116121365008,0.17859951246760608,0.7443103484756164,-0.008438454315613297,0.42841126078435576,0.7822325608201028,-0.7189475676637811,-0.5939438089482902,-0.07653935731171835,-0.8856513920639695,0.7792863834354375,0.803610567264816,0.6035450314090991,0.871328523584854,-0.21793145375962264,0.8598423542295015,-0.7366306536929073,-0.11185197362647337,0.5816047537836604,0.47122134202278443,-0.38991706463256004,0.44859967284203073,0.09329855930999598,-0.6490520344976733,-0.6137910695572741,0.48813698487505985,-0.5908990339848701,-0.2719138795733358,0.1274034388291594,-0.385722809212131,-0.5657621355906588])[i]), (a, b) -> a + b) > 0 THEN 2 ELSE 0 END) + (CASE WHEN list_reduce(list_transform(generate_series(1, 64), i -> emb[i] * ([0.6696709430057244,0.26551974529309663,-0.5640898928832452,0.37292968445687347,0.0423610058372641,-0.6745222491009384,-0.402551940139398,0.35471185532709004,-0.36187082205735366,-0.5124960518952926,-0.9801650448802106,-0.2869704139554361,0.506977345832897,-0.2919629509773287,-0.3849486710516601,-0.028366645778671984,-0.9345057112903139,-0.8133609666540575,0.5508045228239253,-0.23104486851049,0.4056207283184696,-0.1733603546238791,-0.4778735609732696,-0.5943973567297407,-0.13503316021656797,0.043526662018896545,-0.8269174084094906,0.25671553526913127,-0.39132646166439344,0.1681167604938283,-0.5119449208516733,0.8947435093732621,-0.9684180428669875,-0.3584542396201609,0.3848901183279909,0.27127429684032345,0.25753985475046637,0.4704859929346574,-0.6930732266011688,0.516482547465011,0.8519326929424726,0.7904320611398663,0.7583977997251683,-0.1694837634407067,0.08746088304709088,-0.5647722106018414,0.7658868635310454,-0.26099520020536504,0.43604344231564274,0.26276902222595244,-0.4030071841589449,0.7659126996009826,0.6059510939566934,0.7890722511956503,-0.7735739560801884,0.4213816857063526,0.2790189405972223,0.777388079142548,0.37395672062962015,-0.398398476927031,0.4880831371999743,0.4720669187584452,-0.39024003948736663,0.6765242084021938])[i]), (a, b) -> a + b) > 0 THEN 4 ELSE 0 END) + (CASE WHEN list_reduce(list_transform(generate_series(1, 64), i -> emb[i] * ([-0.43977207565312626,-0.8033574222631266,-0.9105030239597309,0.2963022486720597,-0.5742059729676576,0.5631207291463483,0.21888713132924442,-0.42189563249394313,0.3109784588796791,0.8845930494983192,0.5632735459194818,-0.9878342539636598,-0.17942017269081645,0.12301668593490755,0.16260479742581824,-0.1243162959473183,0.6204568998065949,0.3990365389797952,-0.32370093135097866,0.1498824275235704,0.825453767026405,-0.3411978762197101,-0.0517005999052087,0.07728424935812095,0.7482807055979659,-0.6697791516750342,-0.5673382465315802,-0.7896012894830835,-0.13427901701964218,-0.5378341934981536,-0.2301966482557647,0.10463905647586147,-0.47850001974395817,-0.4808347170406664,0.48597206894968314,-0.25180854939126207,-0.6186968604111842,-0.6358295151487021,-0.13189752695272494,-0.11880177158589134,-0.2733765100625498,0.05373172689986605,0.24370112659740162,0.44825491751590074,-0.6193044321180234,0.19334207183020524,0.8986037767162058,-0.8403012121313129,0.5718613028113979,-0.9267107128545855,0.17563976904106404,0.0013926551790492958,-0.24925432671758618,0.40657867627757893,-0.9655176451902316,-0.4683079549291791,0.4918022944906144,0.5359210214545229,0.4938796061202686,0.531536112761058,0.9243175474596907,0.9696035029712387,0.2137045776340727,0.9077965328230189])[i]), (a, b) -> a + b) > 0 THEN 8 ELSE 0 END) AS bkt FROM e),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, bkt AS q_bkt FROM b WHERE vec_id % 50 = 0 AND vec_id < 25600),
        |probes AS (SELECT q_id, q_emb, unnest(list_transform([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14], m -> xor(q_bkt, m))) AS p_bkt FROM q),
        |cand AS (
        | SELECT p.q_id, p.q_emb, c.vec_id AS n_id, c.emb AS n_emb
        | FROM probes p JOIN b c ON c.bkt = p.p_bkt AND c.vec_id <> p.q_id),
        |scored AS (
        | SELECT q_id, n_id,
        |  list_cosine_similarity(q_emb, n_emb) AS cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
        | FROM cand)
        |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
        |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // s3: full IVF replay — mod-4 id sample, 3 unrolled Lloyd
    // iterations (per-cell ordered elementwise mean, float32-rounded
    // exactly like the Scala trainer), window-argmax cell assignment
    // (ties -> smallest cell, matching assignBest), 12-cell probe,
    // exact cosine top-k
    "s3_ivf_knn" -> ("WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |cand AS (
        | SELECT DISTINCT p.q_id, p.q_emb, c.vec_id AS n_id, c.emb AS n_emb
        | FROM (SELECT * FROM probes WHERE pr <= 12) p
        | JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id),
        |scored AS (
        | SELECT q_id, n_id,
        |  list_cosine_similarity(q_emb, n_emb) AS cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
        | FROM cand)
        |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
        |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin),
    // s27: s3's probe replay with the per-query label-mismatch test
    // on the candidate join (labels decorate by vec_id equi-joins)
    "s27_hard_negatives" -> ("WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |cand AS (
        | SELECT DISTINCT p.q_id, p.q_emb, ql.label AS q_label,
        |  c.vec_id AS n_id, c.emb AS n_emb, nl.label AS n_label
        | FROM (SELECT * FROM probes WHERE pr <= 12) p
        | JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id
        | JOIN embeddings ql ON ql.vec_id = p.q_id
        | JOIN embeddings nl ON nl.vec_id = c.vec_id
        | WHERE ql.label <> nl.label),
        |scored AS (
        | SELECT q_id, q_label, n_id, n_label,
        |  list_cosine_similarity(q_emb, n_emb) AS cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
        | FROM cand)
        |SELECT q_id, CAST(q_label AS BIGINT) AS q_label, n_id,
        | CAST(n_label AS BIGINT) AS n_label, CAST(rank AS BIGINT) AS rank,
        | round(cos, 6) AS cosine
        |FROM scored WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),
    // d2: full minhash replay — token/shingle hashes as in d3
    // (HUGEINT mod-2^64, layered transforms; token-level mix then
    // three chained window mixes), then the 128-perm signature
    // computed VECTORIZED: shingle-rows x perm-constant table cross
    // join with plain column arithmetic + unsigned min (HUGEINT in
    // [0,2^64) compares unsigned for free), banded candidates via
    // an equi-join on 8-slot signature slices exactly like the
    // Spark side. ~17s in DuckDB at sf0.01 (lambda-only
    // formulation measured 46s).
    "d2_minhash_lsh" -> ("WITH " + minhashPairCtes("documents") +
      """
        |SELECT a_id, b_id, est_jaccard FROM scored
        |WHERE est_jaccard >= 0.5
        |ORDER BY a_id, b_id""".stripMargin),
    // d2b: the joinback (signature-free band shuffle) spelling must
    // reproduce d2's exact pair set — same oracle replay
    "d2b_minhash_joinback" -> ("WITH " + minhashPairCtes("documents") +
      """
        |SELECT a_id, b_id, est_jaccard FROM scored
        |WHERE est_jaccard >= 0.5
        |ORDER BY a_id, b_id""".stripMargin),
    // d23: d2's pair replay decorated with x8's exact mix64 split
    // (sm-prefixed ladder), cross-split normalization, worst-match
    // window per held doc
    "d23_fuzzy_contamination" -> ("WITH " + minhashPairCtes("documents") + """,
        |sm0 AS (SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z FROM documents),
        |sm1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM sm0),
        |sm2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM sm1),
        |sm3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM sm2),
        |sm4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM sm3),
        |sm5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM sm4),
        |ssgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
        | FROM sm5),
        |sp AS (
        | SELECT doc_id,
        |  CASE WHEN ((h % 100) + 100) % 100 < 80 THEN 'train'
        |       WHEN ((h % 100) + 100) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM ssgn),
        |pairs AS (
        | SELECT a_id, b_id, est_jaccard FROM scored WHERE est_jaccard >= 0.5),
        |xs AS (
        | SELECT CASE WHEN sa.split = 'train' THEN p.b_id ELSE p.a_id END AS held_id,
        |  CASE WHEN sa.split = 'train' THEN sb.split ELSE sa.split END AS held_split,
        |  CASE WHEN sa.split = 'train' THEN p.a_id ELSE p.b_id END AS train_id,
        |  p.est_jaccard
        | FROM pairs p
        | JOIN sp sa ON sa.doc_id = p.a_id
        | JOIN sp sb ON sb.doc_id = p.b_id
        | WHERE (sa.split = 'train') <> (sb.split = 'train')),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY held_id
        |   ORDER BY est_jaccard DESC, train_id) AS rn FROM xs)
        |SELECT held_id, held_split, train_id AS worst_train_id,
        | est_jaccard AS worst_est_jaccard
        |FROM r WHERE rn = 1 ORDER BY held_id""".stripMargin),
    // d15: d2's replay extended with the exact jaccard over the SAME
    // hashed shingle sets; within_tol is literal truth (a8b pattern)
    "d15_minhash_calibration" -> ("WITH " + minhashPairCtes("documents") +
      """,
        |sets AS (SELECT doc_id, list_distinct(raw) AS sh FROM h3)
        |SELECT s.a_id, s.b_id, s.est_jaccard,
        | round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |   / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
        |   AS exact_jaccard,
        | true AS within_tol
        |FROM scored s
        |JOIN sets x ON s.a_id = x.doc_id
        |JOIN sets y ON s.b_id = y.doc_id
        |WHERE s.est_jaccard >= 0.5
        |ORDER BY s.a_id, s.b_id""".stripMargin),
    // d7: 8-gram string-shingle overlap vs the src0 benchmark set
    // s6: BM25 replay — see bm25Ctes; scoring is fixed-fold-order
    // double math rounded to 6dp on both sides
    "s6_bm25" -> ("WITH " + bm25Ctes +
      """
        |SELECT doc_id, score FROM bm_top ORDER BY score DESC, doc_id""".stripMargin),
    // s7: reciprocal-rank fusion of the s6 lexical list (depth 20)
    // and the s4 quantized-ANN list of query vector 0 (depth 20);
    // 1/(60+rank) contributions summed lexical-first, 6dp round
    "s7_rrf_fusion" -> ("WITH " + sqKnnCtes + ",\n" + bm25Ctes +
      """,
        |bm_rank AS (
        | SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
        | FROM bm_top),
        |sem AS (
        | SELECT n_id AS doc_id, CAST(rank AS BIGINT) AS sem_rank
        | FROM scored WHERE q_id = 0 AND rank <= 20),
        |fused AS (
        | SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
        |  round(coalesce(1.0 / (60.0 + l.lex_rank), 0.0)
        |      + coalesce(1.0 / (60.0 + s.sem_rank), 0.0), 6) AS rrf_score
        | FROM bm_rank l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
        |SELECT doc_id, lex_rank, sem_rank, rrf_score FROM fused
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin),
    // x8: scalar splitmix64 finalizer replay (same HUGEINT mod-2^64
    // staged pipeline as d3, on one value instead of a list), then
    // the signed pmod-100 bucket and threshold routing
    "x8_hash_split" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
        | FROM m5),
        |b AS (SELECT doc_id, ((h % 100) + 100) % 100 AS bucket FROM sgn)
        |SELECT doc_id, bucket,
        | CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // x13: d6's transitive-closure labels (shared ccLabelCtes), rep =
    // coalesce(label, own id), then x8's exact mix64 chain on rep
    "x13_leakage_safe_split" ->
      ("WITH RECURSIVE " + ccLabelCtes + """,
        |rep AS (
        | SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS rep_id
        | FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
        |m0 AS (SELECT doc_id, rep_id, (CAST(rep_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z FROM rep),
        |m1 AS (SELECT doc_id, rep_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, rep_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, rep_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, rep_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, rep_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id, rep_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
        | FROM m5),
        |b AS (SELECT doc_id, rep_id, ((h % 100) + 100) % 100 AS bucket FROM sgn)
        |SELECT doc_id, rep_id, bucket,
        | CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),
    // d12: token-window replay of the span stripper — hot 8-token
    // windows (≥2 distinct docs), covered positions, ordered re-join
    // of the surviving tokens
    "d12_strip_dup_spans" ->
      """WITH base AS (
        | SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |wins AS (
        | SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS w
        | FROM base, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)),
        |hot AS (SELECT w FROM (SELECT DISTINCT doc_id, w FROM wins) GROUP BY w HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + k AS p
        |        FROM wins SEMI JOIN hot USING (w), UNNEST(generate_series(0, 7)) AS g(k)),
        |tokpos AS (SELECT doc_id, i - 1 AS p, toks[i] AS tok
        |           FROM base, UNNEST(generate_series(1, len(toks))) AS u(i)),
        |keep AS (SELECT t.doc_id, t.p, t.tok
        |         FROM tokpos t ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p),
        |clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text FROM keep GROUP BY doc_id),
        |nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
        |SELECT b.doc_id, len(b.toks) AS n_tokens, COALESCE(n.n_removed, 0) AS n_removed,
        | COALESCE(c.clean_text, '') AS clean_text
        |FROM base b LEFT JOIN nrem n USING (doc_id) LEFT JOIN clean c USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // p13: identical half-split (integer-div midpoint), identical
    // total version order, FULL JOIN USING for the coalesced key
    "p13_snapshot_diff" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |m AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid FROM ev),
        |h1 AS (
        | SELECT user_id, value AS old_value, ts_us AS old_ts_us FROM (
        |  SELECT ev.*, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM ev, m WHERE ts_us <= mid) WHERE rn = 1),
        |h2 AS (
        | SELECT user_id, value AS new_value, ts_us AS new_ts_us FROM (
        |  SELECT ev.*, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM ev, m WHERE ts_us > mid) WHERE rn = 1)
        |SELECT user_id,
        | CASE WHEN old_ts_us IS NULL THEN 'added'
        |      WHEN new_ts_us IS NULL THEN 'removed'
        |      WHEN old_value IS DISTINCT FROM new_value THEN 'changed'
        |      ELSE 'unchanged' END AS status,
        | old_value, old_ts_us, new_value, new_ts_us
        |FROM h1 FULL JOIN h2 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // t11: identical per-term doubles (p, q, ln), order-free after
    // the 4dp round on the summed KL
    "t11_source_kl" ->
      """WITH toks AS (
        | SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS token
        | FROM documents),
        |st AS (SELECT source, token, count(*) AS c_st FROM toks GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ct)
        |SELECT st.source, ns.n_s AS n_tokens, count(*) AS n_types,
        | round(sum((CAST(c_st AS DOUBLE) / n_s) * ln((CAST(c_st AS DOUBLE) / n_s) / (CAST(c_t AS DOUBLE) / n.n))), 4) AS kl
        |FROM st JOIN ns USING (source) JOIN ct USING (token) CROSS JOIN n
        |GROUP BY st.source, ns.n_s ORDER BY st.source""".stripMargin,
    // s8: quantized-ANN candidates for query 0, then the unrolled
    // greedy MMR replay (see mmrCtes)
    "s8_mmr_rerank" -> ("WITH " + sqKnnCtes + ",\n" + mmrCtes + "\n" + mmrSelect),
    // x9: t1's quality replay + a per-source best-first running token
    // sum (ROWS frame over a total order), budget filter
    "x9_token_budget_mix" -> x9Sql,
    // x9b: the banded (hot-source-salted) spelling must admit the
    // IDENTICAL rows, so its oracle IS x9's global-window replay
    "x9b_token_budget_salted" -> x9Sql,
    // x10: the distributed two-phase rank must equal a TRUE global
    // row_number over the mix64 ordering — the oracle computes the
    // global one directly (x8's scalar mix64 replay for the key)
    "x10_shuffle_positions" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS shuffle_key
        | FROM m5)
        |SELECT doc_id, shuffle_key,
        | CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS shuffle_pos
        |FROM sgn ORDER BY doc_id""".stripMargin,
    // s15: within-cell kNN graph over the SAME replayed IVF training
    // as s3; rank on unrounded cosine, n_id tiebreak
    "s15_knn_graph" -> ("WITH " + ivfCorpusCtes + """,
        |scored AS (
        | SELECT a.vec_id, b.vec_id AS n_id,
        |  list_cosine_similarity(a.emb, b.emb) AS cos,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) AS rank
        | FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
        |SELECT vec_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
        |FROM scored WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin),
    // a30: yearly agg + lag window over the tiny year frame; growth
    // computed on the rounded revenue both sides
    "a30_yearly_growth" ->
      """WITH y AS (
        | SELECT year(l_shipdate) AS ship_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        | FROM lineitem GROUP BY ship_year)
        |SELECT ship_year, revenue,
        | lag(revenue) OVER (ORDER BY ship_year) AS prev_revenue,
        | round(revenue / lag(revenue) OVER (ORDER BY ship_year) - 1, 6) AS yoy_growth
        |FROM y ORDER BY ship_year""".stripMargin,
    // m6: m1's meta replay grouped on the magic prefix
    "m6_format_mix" ->
      """SELECT magic_hex, count(*) AS n_media,
        | CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        | count(DISTINCT content_md5) AS n_distinct
        |FROM (
        | SELECT octet_length(encode(text)) AS byte_len,
        |  upper(substr(hex(encode(text)), 1, 4)) AS magic_hex,
        |  md5(text) AS content_md5
        | FROM documents)
        |GROUP BY magic_hex ORDER BY magic_hex""".stripMargin,
    // a29: correlated EXISTS spelled directly; Spark side
    // decorrelates to a per-order max reduction
    "a29_late_shipments" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late_orders,
        | count(*) AS n_orders,
        | round(CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS late_share
        |FROM (
        | SELECT o_orderpriority,
        |  EXISTS (SELECT 1 FROM lineitem
        |          WHERE l_orderkey = o_orderkey
        |           AND l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        | FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // t15: t4's prediction replay joined to the declared label,
    // share via window over the tiny confusion frame
    "t15_lang_confusion" ->
      """WITH pred AS (
        | SELECT doc_id,
        |  CASE WHEN COALESCE(greatest(h_en, h_de, h_es, h_fr), 0) = 0 THEN 'und'
        |       WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
        |       WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
        |       WHEN h_en >= h_de THEN 'en'
        |       ELSE 'de' END AS lang_pred
        | FROM (
        |  SELECT doc_id,
        |   len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'is'))) AS h_en,
        |   len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS h_de,
        |   len(list_filter(toks, x -> x IN ('el', 'la', 'los', 'que', 'es'))) AS h_es,
        |   len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS h_fr
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents))),
        |j AS (SELECT d.lang AS declared, p.lang_pred
        |      FROM documents d JOIN pred p USING (doc_id))
        |SELECT declared, lang_pred, count(*) AS n_docs,
        | round(CAST(count(*) AS DOUBLE)
        |   / sum(count(*)) OVER (PARTITION BY declared), 6) AS declared_share
        |FROM j GROUP BY declared, lang_pred
        |ORDER BY declared, lang_pred""".stripMargin,
    // st16: st1's session replay + st5's k-join funnel spelling per
    // (user, session) — proves the single-fold == the 3-join form
    "st16_session_funnel" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
        |      WHERE user_id IS NOT NULL),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM x)),
        |z AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM y),
        |ev AS (SELECT user_id, session_seq, event_id, ts_us, event_type FROM z
        |       WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id, session_seq FROM ev),
        |s1 AS (SELECT user_id, session_seq, min(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id, session_seq),
        |s2 AS (SELECT e.user_id, e.session_seq, min(e.ts_us) AS t2 FROM ev e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.session_seq = s1.session_seq AND e.ts_us > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id, e.session_seq),
        |s3 AS (SELECT e.user_id, e.session_seq, min(e.ts_us) AS t3 FROM ev e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.session_seq = s2.session_seq AND e.ts_us > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id, e.session_seq)
        |SELECT u.user_id, u.session_seq,
        | s1.t1 AS step1_ts_us, s2.t2 AS step2_ts_us, s3.t3 AS step3_ts_us,
        | CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3 WHEN s2.t2 IS NOT NULL THEN 2
        |      WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached
        |FROM u LEFT JOIN s1 USING (user_id, session_seq)
        | LEFT JOIN s2 USING (user_id, session_seq)
        | LEFT JOIN s3 USING (user_id, session_seq)
        |ORDER BY u.user_id, u.session_seq""".stripMargin,
    // s17: s3's IVF replay ∩ brute-force replay, membership by id
    // equi-join (never a cosine re-compare)
    "s17_ivf_recall" -> ("WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |cand AS (
        | SELECT DISTINCT p.q_id, p.q_emb, c.vec_id AS n_id, c.emb AS n_emb
        | FROM (SELECT * FROM probes WHERE pr <= 12) p
        | JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id),
        |scored AS (
        | SELECT q_id, n_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
        | FROM cand),
        |approx AS (SELECT q_id, n_id FROM scored WHERE rank <= 10),
        |bf AS (
        | SELECT q_id, n_id FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) q JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600)
        | WHERE rank <= 10)
        |SELECT a.q_id, count(*) AS n_hits,
        | round(CAST(count(*) AS DOUBLE) / 10, 4) AS recall_at_k
        |FROM approx a JOIN bf ON a.q_id = bf.q_id AND a.n_id = bf.n_id
        |GROUP BY a.q_id ORDER BY a.q_id""".stripMargin),
    // s16: mix64-bucketed deterministic pairing replay; bin from the
    // unrounded cosine, pmod sign law spelled out
    "s16_cosine_hist" ->
      """WITH m0 AS (
        | SELECT vec_id, (CAST(vec_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM embeddings WHERE embedding IS NOT NULL),
        |m1 AS (SELECT vec_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT vec_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT vec_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT vec_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT vec_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT vec_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
        | FROM m5),
        |r AS (
        | SELECT vec_id, ((h % 64) + 64) % 64 AS b, h,
        |  row_number() OVER (PARTITION BY ((h % 64) + 64) % 64 ORDER BY h, vec_id) AS rn
        | FROM sgn),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE embedding IS NOT NULL),
        |pr AS (
        | SELECT a.vec_id AS a_id, bb.vec_id AS b_id
        | FROM (SELECT vec_id, b, (rn + 1) // 2 AS p FROM r WHERE rn % 2 = 1) a
        | JOIN (SELECT vec_id, b, rn // 2 AS p FROM r WHERE rn % 2 = 0) bb
        |   ON a.b = bb.b AND a.p = bb.p),
        |c AS (
        | SELECT list_cosine_similarity(ea.emb, eb.emb) AS cos
        | FROM pr JOIN e ea ON ea.vec_id = pr.a_id JOIN e eb ON eb.vec_id = pr.b_id),
        |binned AS (
        | SELECT least(CAST(floor((cos + 1.0) * 20 / 2.0) AS BIGINT), 19) AS bin, cos FROM c)
        |SELECT bin,
        | round(-1.0 + bin * 2.0 / 20, 6) AS bin_lo,
        | round(-1.0 + (bin + 1) * 2.0 / 20, 6) AS bin_hi,
        | count(*) AS n_pairs,
        | round(min(cos), 6) AS min_cos, round(max(cos), 6) AS max_cos
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,
    // p9: latest version per key; total order (ts desc, id desc)
    "p9_cdc_latest" ->
      """SELECT user_id, last_event_id, last_ts_us, last_value, n_versions FROM (
        | SELECT user_id, event_id AS last_event_id, ts_us AS last_ts_us, value AS last_value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_versions
        | FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // a14: CUBE replay — DuckDB's GROUPING(a,b) uses the same
    // first-column-is-MSB bit order as Spark's grouping_id()
    "a14_cube" ->
      """SELECT CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
        | l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_price,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // a15: running/trailing frame sums on DECIMAL (exact in any
    // accumulation order — windowed DOUBLE sums are not replayable:
    // DuckDB aggregates frames via a segment tree, Spark accumulates
    // in row order)
    "a15_running_total" ->
      """SELECT event_id, user_id, ts_us, value,
        | CAST(row_number() OVER w AS INT) AS rn,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (w ROWS 2 PRECEDING) AS DOUBLE) AS trailing3_sum
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin,
    // s9: generated full-PQ replay — see pqKnnOracle
    "s9_pq_knn" -> pqKnnOracle,
    // d8: identical 40/10 character windowing — distinct (doc,
    // window), windows in >=2 docs, per-doc duplicated fraction
    "d8_substring_dupes" ->
      """WITH base AS (
        | SELECT doc_id, text,
        |  CASE WHEN length(text) >= 40
        |       THEN CAST(floor((length(text) - 40) / 10.0) AS BIGINT) + 1 ELSE 0 END AS n_windows
        | FROM documents),
        |wins AS (
        | SELECT DISTINCT doc_id, w FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, CAST(n_windows AS INT) - 1),
        |    i -> substring(text, i * 10 + 1, 40))) AS w
        |  FROM base WHERE n_windows > 0)),
        |dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2),
        |per AS (SELECT doc_id, count(*) AS n_dup_windows FROM wins JOIN dup USING (w) GROUP BY doc_id)
        |SELECT b.doc_id, b.n_windows, COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
        | CASE WHEN b.n_windows > 0
        |      THEN round(CAST(COALESCE(p.n_dup_windows, 0) AS DOUBLE) / b.n_windows, 6)
        |      ELSE 0.0 END AS dup_fraction,
        | CASE WHEN b.n_windows > 0
        |      THEN round(CAST(COALESCE(p.n_dup_windows, 0) AS DOUBLE) / b.n_windows, 6)
        |      ELSE 0.0 END >= 0.5 AS flagged
        |FROM base b LEFT JOIN per p USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // t8: group-by token-count replay of the sorted-run fold (integer
    // counts — method-independent)
    "t8_type_token" ->
      """WITH t AS (
        | SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        | FROM documents),
        |g AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |a AS (
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        | FROM g GROUP BY doc_id)
        |SELECT d.doc_id,
        | CASE WHEN d.text IS NOT NULL THEN COALESCE(a.n_tokens, 0) END AS n_tokens,
        | CASE WHEN d.text IS NOT NULL THEN COALESCE(a.n_types, 0) END AS n_types,
        | CASE WHEN d.text IS NOT NULL THEN COALESCE(a.hapax, 0) END AS hapax,
        | CASE WHEN a.n_tokens > 0 THEN round(CAST(a.n_types AS DOUBLE) / a.n_tokens, 6) END AS ttr,
        | CASE WHEN a.n_types > 0 THEN round(CAST(a.hapax AS DOUBLE) / a.n_types, 6) END AS hapax_frac
        |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // st5: the k-join funnel spelling — each step's min-ts strictly
    // after the previous step's time; proves the Spark single-shuffle
    // fold and the classic self-join formulation agree
    "st5_funnel" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
        | WHERE user_id IS NOT NULL
        |  AND event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM ev e JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM ev e JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT u.user_id, s1.t1 AS step1_ts_us, s2.t2 AS step2_ts_us, s3.t3 AS step3_ts_us,
        | CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3 WHEN s2.t2 IS NOT NULL THEN 2
        |      WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    // x11: x8's scalar mix64 replay → u01 from the top 53 bits (the
    // shift and the 2^-53 scale are exact in binary FP, so u01 is
    // bit-identical across engines), gated against x9's quality replay
    "x11_weighted_sample" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |draw AS (SELECT doc_id, CAST(u // 2048 AS DOUBLE) / 9007199254740992.0 AS u01 FROM m5),
        |q AS (
        | SELECT doc_id, source,
        |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        | FROM (
        |  SELECT doc_id, source, len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM documents)))
        |SELECT q.doc_id, q.source, q.quality_score, draw.u01
        |FROM q JOIN draw ON q.doc_id = draw.doc_id
        |WHERE q.quality_score IS NOT NULL AND draw.u01 < q.quality_score
        |ORDER BY q.doc_id""".stripMargin,
    // p10: SCD2 interval replay over the same total (ts, id) order
    "p10_scd2" ->
      """SELECT user_id, event_id, CAST(row_number() OVER w AS INT) AS version,
        | ts_us AS valid_from_us,
        | lead(ts_us) OVER w AS valid_to_us,
        | lead(ts_us) OVER w IS NULL AS is_current,
        | value
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "d7_contamination" ->
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, source, list_distinct(list_transform(generate_series(1, len(toks) - 7),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
        |        toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])) AS sh
        | FROM t WHERE len(toks) >= 8),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE source = 'src0'),
        |corpus AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE source <> 'src0')
        |SELECT c.doc_id, count(*) AS shared_shingles, count(*) >= 3 AS contaminated
        |FROM corpus c JOIN bench USING (s)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // a16: cohort triangle replay — day_offset cast to INT to match
    // Spark's datediff type; retention divides exact longs, one round
    "a16_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id),
        |tri AS (
        | SELECT cohort_day, CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
        |  count(DISTINCT ev.user_id) AS active_users
        | FROM ev JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset, active_users,
        | first_value(active_users) OVER w AS cohort_size,
        | round(CAST(active_users AS DOUBLE) / first_value(active_users) OVER w, 6) AS retention
        |FROM tri
        |WINDOW w AS (PARTITION BY cohort_day ORDER BY day_offset)
        |ORDER BY 1, 2""".stripMargin,
    // st6: lead over the same µs-truncated (ts, event_id) total order
    // the Spark side uses (epoch_us matches unix_micros)
    "st6_transitions" ->
      """WITH p AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
        | FROM events),
        |m AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS prob
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // p11: rule order and null spelling mirror Checks.rowQuarantine;
    // concat_ws skips non-firing NULLs in both engines
    "p11_quarantine" ->
      """SELECT event_id, user_id, event_type, value, reasons FROM (
        | SELECT event_id, user_id, event_type, value, concat_ws(',',
        |  CASE WHEN props IS NULL OR NOT json_valid(props)
        |       OR json_extract_string(props, '$.k') IS NULL THEN 'bad_props' END,
        |  CASE WHEN user_id IS NULL THEN 'null_user' END,
        |  CASE WHEN event_type IS NULL OR event_type NOT IN
        |       ('click', 'error', 'purchase', 'signup', 'view') THEN 'unknown_type' END,
        |  CASE WHEN value IS NULL OR value < 0 OR value > 400 THEN 'value_out_of_range' END
        | ) AS reasons FROM events)
        |WHERE reasons <> '' ORDER BY event_id""".stripMargin,
    // d9: same training + assignment replay as s3 (shared fragment),
    // then within-cell smaller-id near-dup anchors; cosine parity
    // with the Spark expression is the d5/s1-proven exact match
    "d9_semantic_dedup" -> ("WITH " + ivfCorpusCtes + """,
        |dups AS (
        | SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of, count(*) AS n_dups_smaller
        | FROM corpus a JOIN corpus b
        |  ON a.cell = b.cell AND b.vec_id < a.vec_id
        | WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
        | GROUP BY a.vec_id)
        |SELECT c.vec_id, c.cell, COALESCE(d.n_dups_smaller, 0) AS n_dups_smaller,
        | d.dup_of, d.dup_of IS NULL AS keep
        |FROM corpus c LEFT JOIN dups d USING (vec_id)
        |ORDER BY c.vec_id""".stripMargin),
    // t9: structural quality rules — ratios rounded to 6dp BEFORE the
    // threshold comparisons on both sides (keep is computed from the
    // rounded columns in the Spark code too)
    "t9_gopher_rules" ->
      """SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
        | ellipsis_ratio, alpha_ratio, n_req_stopwords,
        | (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |  AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        |  AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
        |  AND n_req_stopwords >= 2) AS keep
        |FROM (
        | SELECT doc_id,
        |  len(toks) AS n_words,
        |  round(CASE WHEN len(toks) > 0 THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END, 6) AS mean_word_len,
        |  round(CASE WHEN len(toks) > 0 THEN CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.|…')) AS DOUBLE) / len(toks) END, 6) AS symbol_ratio,
        |  round(CAST(len(list_filter(lns, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE) / len(lns), 6) AS bullet_ratio,
        |  round(CAST(len(list_filter(lns, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE) / len(lns), 6) AS ellipsis_ratio,
        |  round(CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks) END, 6) AS alpha_ratio,
        |  len(list_intersect(list_transform(toks, x -> lower(x)),
        |    ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS n_req_stopwords
        | FROM (SELECT doc_id, text,
        |        list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks,
        |        string_split(text, chr(10)) AS lns
        |       FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // d10: incremental batch-vs-corpus dedup — string-shingle jaccard
    // exactly as d4's replay, restricted to batch x corpus pairs;
    // round AFTER max on both sides
    "d10_incremental_dedup" ->
      """WITH bh AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0),
        |ch AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0),
        |g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |pairs AS (
        | SELECT gb.doc_id AS b_id, gc.doc_id AS c_id,
        |  CAST(len(list_intersect(gb.sh, gc.sh)) AS DOUBLE) / len(list_distinct(list_concat(gb.sh, gc.sh))) AS j
        | FROM g gb JOIN g gc ON gb.doc_id % 10 = 0 AND gc.doc_id % 10 <> 0),
        |near AS (
        | SELECT b_id, min(c_id) AS near_dup_of, round(max(j), 6) AS best_jaccard
        | FROM pairs WHERE j >= 0.5 GROUP BY b_id)
        |SELECT bh.doc_id, (ch.h IS NOT NULL) AS exact_dup,
        | near.near_dup_of, near.best_jaccard,
        | (ch.h IS NULL AND near.near_dup_of IS NULL) AS is_new
        |FROM bh LEFT JOIN ch ON bh.h = ch.h
        |LEFT JOIN near ON near.b_id = bh.doc_id
        |ORDER BY doc_id""".stripMargin,
    // s10: s3's IVF replay with the even-label metadata gate on the
    // corpus side of the candidate join (quantizer trained unfiltered,
    // exactly like the Spark side)
    "s10_filtered_knn" -> ("WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |flt AS (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL AND label % 2 = 0),
        |cand AS (
        | SELECT DISTINCT p.q_id, p.q_emb, c.vec_id AS n_id, c.emb AS n_emb
        | FROM (SELECT * FROM probes WHERE pr <= 12) p
        | JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id
        | JOIN flt f ON f.vec_id = c.vec_id),
        |scored AS (
        | SELECT q_id, n_id,
        |  list_cosine_similarity(q_emb, n_emb) AS cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
        | FROM cand)
        |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
        |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin),
    // s11: generated PQ replay widened to 100 candidates + exact
    // cosine re-rank — see pqRerankOracle
    "s11_pq_rerank" -> pqRerankOracle,
    // s12: exact radius search — membership decided on the 6dp
    // ROUNDED cosine on both sides so fp summation order can't flip
    // a borderline pair
    "s12_range_search" ->
      """SELECT q_id, n_id, cosine FROM (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        | FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) q JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600)
        |WHERE cosine >= 0.35 ORDER BY q_id, n_id""".stripMargin,
    // x15: x10's mix64 chain for the within-source shuffle key, then
    // pos = (per-source row_number - 1) * n_sources + source index
    "x15_interleave" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS shuffle_key
        | FROM m5)
        |SELECT d.doc_id, d.source,
        | CAST((row_number() OVER (PARTITION BY d.source ORDER BY s.shuffle_key, d.doc_id) - 1)
        |      * (SELECT count(DISTINCT source) FROM documents)
        |      + dense_rank() OVER (ORDER BY d.source) - 1 AS BIGINT) AS pos
        |FROM documents d JOIN sgn s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // s13: exact centroid replay — avg per (label, dim) float-cast on
    // BOTH engines (absorbs fp summation-order noise), then the same
    // double-cosine as s1's proven replay; 6dp round on the three
    // cosine-derived columns
    "s13_cluster_cohesion" ->
      """WITH comp AS (
        | SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
        | FROM embeddings WHERE embedding IS NOT NULL),
        |cent AS (
        | SELECT label, list(CAST(cv AS FLOAT) ORDER BY i) AS centroid
        | FROM (SELECT label, i, avg(CAST(v AS DOUBLE)) AS cv FROM comp GROUP BY label, i)
        | GROUP BY label),
        |coh AS (
        | SELECT e.label, count(*) AS n_vecs,
        |  avg(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))) AS coh,
        |  min(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))) AS mincos
        | FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e JOIN cent c USING (label) GROUP BY e.label),
        |sep AS (
        | SELECT a.label,
        |  max(list_cosine_similarity(CAST(a.centroid AS DOUBLE[]), CAST(b.centroid AS DOUBLE[]))) AS sepmax
        | FROM cent a JOIN cent b ON a.label <> b.label GROUP BY a.label)
        |SELECT label, n_vecs, round(coh, 6) AS cohesion, round(mincos, 6) AS min_cos,
        | round(sepmax, 6) AS max_other_sim
        |FROM coh JOIN sep USING (label) ORDER BY label""".stripMargin,
    // d13: d1's grouping keyed on t3's fingerprint expression (t3's
    // oracle already proves the md5-canonical-form parity)
    "d13_fingerprint_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fingerprint,
        | min(doc_id) AS keep_id, count(*) AS n_variants
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // x14: t2's whitespace token definition aggregated per stratum;
    // share denominator = the same table's total
    "x14_corpus_mix" ->
      """WITH g AS (
        | SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, n_tokens,
        | round(CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM g), 6) AS token_share
        |FROM g ORDER BY source, lang""".stripMargin,
    // t10: frequency-table entropy replay; 4dp round absorbs the
    // unordered-sum float noise (t7's precedent)
    "t10_token_entropy" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        | FROM documents),
        |freq AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, sum(c * ln(c)) AS clnc FROM freq GROUP BY doc_id)
        |SELECT d.doc_id,
        | CASE WHEN d.text IS NOT NULL THEN CAST(COALESCE(a.n, 0) AS BIGINT) END AS n_tokens,
        | CASE WHEN a.n > 0 THEN round(ln(a.n) - a.clnc / a.n, 4) END AS entropy,
        | CASE WHEN a.n > 1 THEN round((ln(a.n) - a.clnc / a.n) / ln(a.n), 4) END AS entropy_efficiency
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // d11: d4's string-shingle replay with both asymmetric ratios
    "d11_containment" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3)
        |SELECT a_id, b_id, round(ca, 6) AS contain_a, round(cb, 6) AS contain_b FROM (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS ca,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh) AS cb
        | FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |WHERE greatest(ca, cb) >= 0.8 ORDER BY a_id, b_id""".stripMargin,
    // st7: same slotting + grid + IGNORE NULLS forward fill
    "st7_locf_resample" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
        |s AS (
        | SELECT user_id, ts_us // 86400000000 AS slot, value,
        |  row_number() OVER (PARTITION BY user_id, ts_us // 86400000000
        |    ORDER BY ts_us DESC, event_id DESC) AS rn
        | FROM e),
        |latest AS (SELECT user_id, slot, value FROM s WHERE rn = 1),
        |span AS (SELECT user_id, min(slot) AS lo, max(slot) AS hi FROM latest GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS slot FROM span)
        |SELECT g.user_id, g.slot AS grid_slot,
        | last_value(l.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.slot) AS filled_value,
        | l.value IS NOT NULL AS is_observed
        |FROM grid g LEFT JOIN latest l ON l.user_id = g.user_id AND l.slot = g.slot
        |ORDER BY g.user_id, grid_slot""".stripMargin,
    // st28: same union-then-bracket construction — the interpolation
    // itself is one sign-restored half-away integer division, so the
    // hash can only match if both engines bracket AND round identically
    "st28_linear_interp" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
        |span AS (
        | SELECT user_id, (min(ts_us) + 86399999999) // 86400000000 AS lo,
        |  max(ts_us) // 86400000000 AS hi FROM e GROUP BY 1),
        |grid AS (
        | SELECT user_id, unnest(generate_series(lo, hi)) AS slot
        | FROM span WHERE lo <= hi),
        |u AS (
        | SELECT user_id, ts_us AS ts, 0 AS is_grid, event_id AS id, v,
        |  ts_us AS ots, CAST(NULL AS BIGINT) AS slot FROM e
        | UNION ALL
        | SELECT user_id, slot * 86400000000, 1, 0, CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT), slot FROM grid),
        |w AS (
        | SELECT user_id, ts, is_grid, slot,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(ots IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pts,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid, id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(ots IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid, id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nts
        | FROM u)
        |SELECT user_id, slot AS grid_slot,
        | CAST(CASE WHEN nts IS NULL OR nts = pts THEN pv
        |  ELSE pv + CAST(sign(nv - pv) AS BIGINT) *
        |   CAST((2 * abs(CAST(nv - pv AS HUGEINT) * (ts - pts)) + (nts - pts))
        |        // (2 * (nts - pts)) AS BIGINT) END AS BIGINT) AS interp_e6,
        | CAST(CASE WHEN nts IS NULL THEN NULL ELSE nts - pts END AS BIGINT) AS bracket_us
        |FROM w WHERE is_grid = 1 ORDER BY user_id, grid_slot""".stripMargin,
    // st29: the same exact integer recursion — list_reduce uses the
    // first element as init (= s0 = v0); DuckDB `//` TRUNCATES toward
    // zero (measured: -10 // 4 = -2), so the mathematical floor is
    // spelled pmod-style, mirroring the Spark side exactly
    "st29_ewma" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events
        | WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |g AS (
        | SELECT user_id, list(v ORDER BY ts_us, event_id, v) AS vs,
        |  count(*) AS n FROM e GROUP BY 1),
        |f AS (
        | SELECT user_id, n, vs[-1] AS last_v,
        |  list_reduce(vs, (acc, x) ->
        |   acc + (x - acc - (((x - acc) % 4) + 4) % 4) // 4) AS ewma
        | FROM g)
        |SELECT user_id, CAST(n AS BIGINT) AS n_obs,
        | last_v AS last_v_e6, ewma AS ewma_e6,
        | last_v - ewma AS lag_e6
        |FROM f ORDER BY user_id""".stripMargin,
    // a48: the same day-grain rollup with DuckDB's own RANGE frame —
    // a missing-day miscount on either side breaks the trailing sums
    "a48_trailing_range" ->
      """WITH byday AS (
        | SELECT o_orderpriority,
        |  CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS epoch_day,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents,
        |  count(*) AS n_orders
        | FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, epoch_day, day_cents, n_orders,
        | CAST(sum(day_cents) OVER (PARTITION BY o_orderpriority ORDER BY epoch_day
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_cents,
        | CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY epoch_day
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_days
        |FROM byday ORDER BY o_orderpriority, epoch_day""".stripMargin,
    // st30: lag-gap + running-kept-run replay; the kept lead joins its
    // run's aggregates (min-struct and join spellings are equivalent
    // because the lead is the run's (ts, id) minimum by construction)
    "st30_debounce" ->
      """WITH e AS (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM events
        | WHERE user_id IS NOT NULL),
        |f AS (
        | SELECT *, lag(ts_us) OVER (PARTITION BY user_id, event_type
        |   ORDER BY ts_us, event_id) AS prev FROM e),
        |k AS (
        | SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 600000000
        |   THEN 1 ELSE 0 END AS kept FROM f),
        |r AS (
        | SELECT *, sum(kept) OVER (PARTITION BY user_id, event_type
        |   ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM k),
        |g AS (
        | SELECT user_id, event_type, run, count(*) AS n,
        |  max(ts_us) AS last_ts FROM r GROUP BY 1, 2, 3)
        |SELECT kk.user_id, kk.event_type, kk.event_id, kk.ts_us,
        | CAST(g.n - 1 AS BIGINT) AS n_suppressed,
        | CAST(g.last_ts - kk.ts_us AS BIGINT) AS span_us
        |FROM (SELECT * FROM r WHERE kept = 1) kk
        |JOIN g ON kk.user_id = g.user_id AND kk.event_type = g.event_type
        |      AND kk.run = g.run
        |UNION ALL
        |SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        | CAST(0 AS BIGINT) AS n_suppressed, CAST(0 AS BIGINT) AS span_us
        |FROM events WHERE user_id IS NULL
        |ORDER BY user_id, event_type, ts_us""".stripMargin,
    // p12: per-relation anti-join counts (null child keys reported
    // separately, never folded into the orphan count)
    "p12_fk_orphans" ->
      """WITH rel AS (
        | SELECT 'lineitem.l_orderkey->orders' AS relation,
        |  CAST(count(*) AS BIGINT) AS n_children,
        |  CAST(count(CASE WHEN l_orderkey IS NOT NULL AND o.o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_orphans,
        |  CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_null_keys
        | FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey
        | UNION ALL
        | SELECT 'lineitem.l_partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_partkey IS NOT NULL AND p.p_partkey IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN l_partkey IS NULL THEN 1 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON l.l_partkey = p.p_partkey
        | UNION ALL
        | SELECT 'lineitem.l_suppkey->supplier',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN l_suppkey IS NOT NULL AND s.s_suppkey IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN l_suppkey IS NULL THEN 1 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s ON l.l_suppkey = s.s_suppkey
        | UNION ALL
        | SELECT 'orders.o_custkey->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN o_custkey IS NOT NULL AND c.c_custkey IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
        | FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey)
        |SELECT relation, n_children, n_orphans, n_null_keys,
        | (n_orphans = 0 AND n_null_keys = 0) AS ok
        |FROM rel ORDER BY relation""".stripMargin,
    // x12: x11's splitmix64 draw replay + per-content-hash copy count
    "x12_dup_weighted_sample" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |draw AS (SELECT doc_id, CAST(u // 2048 AS DOUBLE) / 9007199254740992.0 AS u01 FROM m5),
        |copies AS (
        | SELECT doc_id, source, CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
        | FROM documents)
        |SELECT c.doc_id, c.source, c.n_copies, draw.u01
        |FROM copies c JOIN draw ON c.doc_id = draw.doc_id
        |WHERE draw.u01 < 1.0 / c.n_copies
        |ORDER BY c.doc_id""".stripMargin,
    // a17: correlated-subquery decorrelation replay — same window
    "a17_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM (
        | SELECT l_extendedprice, l_quantity,
        |  avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'))
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    // st8: rolling distinct actives — grid × (day,user) between-join,
    // the same decomposition the Spark side runs
    "st8_rolling_active" ->
      """WITH daily AS (
        | SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |grid AS (SELECT DISTINCT day AS g_day FROM daily)
        |SELECT g_day AS day,
        | CAST(count(DISTINCT CASE WHEN d.day = g_day THEN d.user_id END) AS BIGINT) AS dau,
        | CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau,
        | round(CAST(count(DISTINCT CASE WHEN d.day = g_day THEN d.user_id END) AS DOUBLE)
        |   / count(DISTINCT d.user_id), 4) AS stickiness
        |FROM grid g JOIN daily d ON d.day BETWEEN g_day - 6 AND g_day
        |GROUP BY g_day ORDER BY day""".stripMargin,
    // st8b: exact replay + literal-true gate flags (a8b pattern) —
    // the HLL union estimate must sit within the in-query tolerance
    // for the hash to match
    "st8b_rolling_sketch" ->
      """WITH daily AS (
        | SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |grid AS (SELECT DISTINCT day AS g_day FROM daily)
        |SELECT g_day AS day,
        | CAST(count(DISTINCT CASE WHEN d.day = g_day THEN d.user_id END) AS BIGINT) AS dau,
        | CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau,
        | true AS dau_ok, true AS wau_ok
        |FROM grid g JOIN daily d ON d.day BETWEEN g_day - 6 AND g_day
        |GROUP BY g_day ORDER BY day""".stripMargin,
    // st9: day-grain series + lagged ROWS-frame baseline (7 preceding
    // through 1 preceding), sample stddev, threshold 2
    "st9_zscore_anomaly" ->
      """WITH series AS (
        | SELECT event_type AS series, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  avg(value) AS m
        | FROM events WHERE event_type IS NOT NULL
        | GROUP BY 1, 2),
        |scored AS (
        | SELECT series, day, m,
        |  avg(m) OVER w AS mu, stddev_samp(m) OVER w AS sd
        | FROM series
        | WINDOW w AS (PARTITION BY series ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT series, day, round(m, 4) AS daily_mean,
        | round(CASE WHEN sd > 0 THEN (m - mu) / sd END, 4) AS z,
        | coalesce(abs(CASE WHEN sd > 0 THEN round((m - mu) / sd, 4) END) > 2, false) AS is_anomaly
        |FROM scored ORDER BY series, day""".stripMargin,
    // a19: the TEXTBOOK correlated spelling (EXISTS + NOT EXISTS fact
    // self-joins) — deliberately a different formulation than the
    // Spark window decorrelation, so the hash match proves them
    // equivalent
    "a19_waiting_supplier" ->
      """WITH sm AS (
        | SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
        | FROM lineitem GROUP BY 1, 2),
        |f AS (
        | SELECT sm.* FROM sm JOIN orders ON o_orderkey = l_orderkey
        | WHERE o_orderstatus = 'F')
        |SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS waiting_count
        |FROM f s1
        |WHERE EXISTS (SELECT 1 FROM f s2 WHERE s2.l_orderkey = s1.l_orderkey
        |   AND s2.l_suppkey <> s1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM f s3 WHERE s3.l_orderkey = s1.l_orderkey
        |   AND s3.l_suppkey <> s1.l_suppkey AND s3.s_max >= s1.s_max)
        |GROUP BY 1 ORDER BY waiting_count DESC, suppkey LIMIT 100""".stripMargin,
    // a18: non-hierarchical grouping sets + grouping_id disambiguation
    "a18_grouping_sets" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INT) AS ship_year, l_quantity FROM lineitem)
        |SELECT CAST(grouping(l_returnflag, l_linestatus, ship_year) AS INT) AS gid,
        | l_returnflag, l_linestatus, ship_year,
        | round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM li
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (ship_year), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, ship_year NULLS FIRST""".stripMargin,
    // a31: Q3-shape top-k; the ORDER BY + LIMIT is part of the
    // contract (revenue rounded before ranking on both engines,
    // l_orderkey in the key so ties can't split)
    "a31_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-06-15'
        | AND l_shipdate > TIMESTAMP '1998-06-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // a32: Q5-shape local-supplier volume — the flat 6-table spelling
    "a32_local_volume" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        | AND o_orderdate >= TIMESTAMP '1997-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY n_name""".stripMargin,
    // a33: Q6-shape single-scan what-if aggregate
    "a33_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS forecast_revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        | AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount BETWEEN 0.02 AND 0.04
        | AND l_quantity < 24""".stripMargin,
    // a34: backlog curve — both facts reduce to day-cardinality
    // counts before the FULL JOIN + running windows
    "a34_order_backlog" ->
      """WITH opened AS (
        | SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_opened
        | FROM orders GROUP BY 1),
        |maxship AS (
        | SELECT l_orderkey, max(l_shipdate) AS ship_done
        | FROM lineitem GROUP BY 1),
        |closed AS (
        | SELECT CAST(ship_done AS DATE) AS day, count(*) AS n_closed
        | FROM maxship GROUP BY 1),
        |days AS (
        | SELECT day, coalesce(n_opened, 0) AS n_opened,
        |  coalesce(n_closed, 0) AS n_closed
        | FROM opened FULL JOIN closed USING (day))
        |SELECT day, n_opened, n_closed,
        | CAST(sum(n_opened) OVER (ORDER BY day)
        |  - sum(n_closed) OVER (ORDER BY day) AS BIGINT) AS backlog
        |FROM days ORDER BY day""".stripMargin,
    // p16: the oracle recomputes gold from the FULL event log — the
    // hash match proves the Spark side's base+delta partial merge
    // equals a from-scratch recompute bit-for-bit
    "p16_incremental_gold" ->
      """SELECT event_type,
        | round(sum(value),2) / count(*) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM events
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    // st17: same exclusive-prior running max + island running sum over
    // the µs-truncated (start, end, event_id) total order
    "st17_interval_merge" ->
      """WITH iv AS (
        | SELECT user_id, epoch_us(ts) AS start_us,
        |  epoch_us(ts) + 300000000 AS end_us, event_id
        | FROM events),
        |f AS (
        | SELECT user_id, start_us, end_us, event_id,
        |  max(end_us) OVER (PARTITION BY user_id
        |   ORDER BY start_us, end_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max_end
        | FROM iv),
        |g AS (
        | SELECT user_id, start_us, end_us, event_id,
        |  CASE WHEN prior_max_end IS NULL OR start_us > prior_max_end
        |       THEN 1 ELSE 0 END AS new_island
        | FROM f),
        |h AS (
        | SELECT user_id, start_us, end_us,
        |  sum(new_island) OVER (PARTITION BY user_id
        |   ORDER BY start_us, end_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_seq
        | FROM g)
        |SELECT user_id, CAST(island_seq AS BIGINT) AS island_seq,
        | min(start_us) AS island_start, max(end_us) AS island_end,
        | count(*) AS n_intervals,
        | max(end_us) - min(start_us) AS covered_us
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // st18: exact µs long sums; the mean divides the exact totals in
    // the same (sum / 1e6) / n association as the Spark side
    "st18_dwell_time" ->
      """WITH p AS (
        | SELECT event_type,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dwell_us
        | FROM events)
        |SELECT event_type AS state, count(*) AS n,
        | CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
        | round(CAST(sum(dwell_us) AS DOUBLE) / 1000000.0
        |  / CAST(count(*) AS DOUBLE), 4) AS avg_dwell_s
        |FROM p WHERE dwell_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // a35: spend as exact cent longs (d18's law), quintile tie order
    // carries o_custkey — both engines' ntile follows the SQL-standard
    // equal-bucket/earlier-buckets-get-extras fill
    "a35_rfm_segments" ->
      """WITH ref AS (SELECT max(o_orderdate) AS r FROM orders),
        |c AS (
        | SELECT o_custkey, count(*) AS freq, max(o_orderdate) AS last_o,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |s AS (
        | SELECT o_custkey, cents, freq,
        |  date_diff('day', CAST(last_o AS DATE),
        |   CAST((SELECT r FROM ref) AS DATE)) AS recency_days
        | FROM c),
        |q AS (
        | SELECT cents, freq, recency_days,
        |  CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_q,
        |  CAST(ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_q,
        |  CAST(ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS m_q
        | FROM s)
        |SELECT r_q, f_q, m_q, count(*) AS n_custs,
        | round(CAST(sum(recency_days) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
        |  AS avg_recency_days,
        | round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total_spend
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // t16: full bigram-LM replay — same top-2000 (count DESC, w1, w2)
    // cut, c12/c1 conditional, stupid backoff, exp of the ROUNDED avg
    "t16_bigram_ppl" -> ("WITH " + bigramPplCtes + """
        |SELECT doc_id, n_scored, avg_nll, ppl FROM pplframe ORDER BY doc_id""".stripMargin),
    // p17: generated 24-term Morton interleave — bit-exact integer
    // replay of Lake.zorderKey's disjoint-bit sum
    "p17_zorder_layout" -> {
      val zTerms = (0 until 12).map(i =>
        s"(((source_bin >> $i) & 1) << ${2 * i + 1}) + (((len_bits >> $i) & 1) << ${2 * i})")
        .mkString(" + ")
      s"""WITH sb AS (
         | SELECT source, dense_rank() OVER (ORDER BY source) - 1 AS source_bin
         | FROM (SELECT DISTINCT source FROM documents)),
         |k AS (
         | SELECT d.doc_id, sb.source_bin, least(d.n_chars, 4095) AS len_bits
         | FROM documents d JOIN sb USING (source)),
         |z AS (SELECT doc_id, source_bin, len_bits, ($zTerms) AS zkey FROM k)
         |SELECT zkey >> 8 AS zbucket, count(*) AS n_docs,
         | min(len_bits) AS min_len, max(len_bits) AS max_len,
         | min(source_bin) AS min_src, max(source_bin) AS max_src
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // a36: integer class boundaries (cum·100 vs 80·total) — no FP
    // share can flip a class; cent sums exact on both engines
    "a36_abc_classes" ->
      """WITH c AS (
        | SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS total FROM orders),
        |k AS (
        | SELECT cents,
        |  CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM c),
        |cl AS (
        | SELECT cents,
        |  CASE WHEN cum * 100 <= (SELECT total FROM t) * 80 THEN 'A'
        |       WHEN cum * 100 <= (SELECT total FROM t) * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        | FROM k)
        |SELECT abc_class, count(*) AS n_custs,
        | round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total_spend,
        | round(CAST(sum(cents) AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE), 6)
        |  AS spend_share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    // st19: the oracle replays the textbook gaps-and-islands window
    // spelling (day − row_number island key), proving the one-shuffle
    // sorted-day fold admits the identical result set (x9b's pattern)
    "st19_streaks" ->
      """WITH days AS (
        | SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        | FROM events WHERE user_id IS NOT NULL),
        |isl AS (
        | SELECT user_id, day,
        |  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |   AS INTEGER) AS island
        | FROM days),
        |runs AS (
        | SELECT user_id, island, count(*) AS len
        | FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        | CAST(count(*) AS BIGINT) AS n_streaks,
        | CAST(max(len) AS BIGINT) AS longest_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    // a37: the oracle replays the PLAIN disjunction with no scan
    // hulls — proving the operator's hand-derived envelopes are
    // semantics-free pushdown, not a result change
    "a37_disjunct_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |  / 10000.0, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 15 AND 45
        |       AND l_quantity BETWEEN 25 AND 45)""".stripMargin,
    // x19: t1's quality-score replay, then a threshold×corpus
    // group-by replay of the operator's one-pass conditional ladder
    // (null scores survive no rung on either engine)
    "x19_quality_sweep" ->
      """WITH s AS (
        | SELECT round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3
        |         + (1.0 - punct_ratio) * 0.2, 6) AS q,
        |  n_tokens AS tk
        | FROM (
        |  SELECT len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT text, regexp_split_to_array(text, '\s+') AS toks FROM documents))),
        |tot AS (SELECT count(*) AS n, sum(tk) AS tot FROM s),
        |th AS (SELECT unnest([0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
        |SELECT threshold,
        | CAST(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS docs_surviving,
        | round(CAST(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END) AS DOUBLE)
        |  / (SELECT n FROM tot), 6) AS doc_share,
        | CAST(sum(CASE WHEN q >= threshold THEN tk ELSE 0 END) AS BIGINT) AS tokens_surviving,
        | round(CAST(sum(CASE WHEN q >= threshold THEN tk ELSE 0 END) AS DOUBLE)
        |  / (SELECT tot FROM tot), 6) AS token_share
        |FROM th, s GROUP BY threshold ORDER BY threshold""".stripMargin,
    // t17: per-row fixed double formulas — two divisions and one
    // round, identical evaluation order on both engines
    "t17_readability" ->
      """SELECT doc_id, n_words, n_sentences, n_syllables,
        | round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |  - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch,
        | round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |  + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4) AS fk_grade
        |FROM (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // m7: the corpus carries no real WAV payloads, so every row takes
    // the stub path — the HUGEINT fold replay (m5's technique) with
    // unsigned-shift/power-of-two-modulus field derivations (spelled
    // as // 2^k divisions), which agree between the signed Scala long
    // and the mod-2^64 view by construction
    "m7_audio_stats" ->
      """WITH h AS (
        | SELECT doc_id, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |   list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |   (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL),
        |s AS (
        | SELECT doc_id,
        |  1 + CAST((u // 8192) % 65536 AS BIGINT) AS n_samples,
        |  CAST((u // 536870912) % 32768 AS BIGINT) AS peak,
        |  CAST((u // CAST('17592186044416' AS HUGEINT)) % 4096 AS BIGINT) AS k
        | FROM h)
        |SELECT doc_id, FALSE AS is_pcm, n_samples,
        | n_samples * 1000 // 16000 AS duration_ms,
        | round(CAST(k * 8 AS DOUBLE), 4) AS rms, peak
        |FROM s ORDER BY doc_id""".stripMargin,
    // m12: m7's duration fold fanned into the chunk grid — the ceil
    // spelling and the last-chunk clamp must both agree exactly
    "m12_audio_chunks" ->
      """WITH h AS (
        | SELECT doc_id, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |   list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |   (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL),
        |d AS (
        | SELECT doc_id,
        |  (1 + CAST((u // 8192) % 65536 AS BIGINT)) * 1000 // 16000 AS duration_ms
        | FROM h),
        |n AS (
        | SELECT doc_id, duration_ms,
        |  CAST(CASE WHEN duration_ms <= 1000 THEN 1
        |   ELSE 1 + (duration_ms - 1000 + 799) // 800 END AS BIGINT) AS n_chunks
        | FROM d),
        |g AS (
        | SELECT doc_id, duration_ms, n_chunks,
        |  unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        | FROM n)
        |SELECT doc_id, FALSE AS is_pcm, duration_ms, n_chunks,
        | CAST(chunk_idx AS BIGINT) AS chunk_idx,
        | CAST(chunk_idx * 800 AS BIGINT) AS start_ms,
        | CAST(least(chunk_idx * 800 + 1000, duration_ms) AS BIGINT) AS end_ms
        |FROM g ORDER BY doc_id, chunk_idx""".stripMargin,
    // a38: the oracle replays the correlated NOT-IN spelling the
    // operator decorrelates into a LEFT ANTI join
    "a38_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        | AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // p18: the oracle replays the two-generation split from the flat
    // events table — v1 (even ids) predates the quality_flag column
    // so its flags are ALL null after the merge read, v2 (odd ids)
    // carries `value > 50.0`, which is itself NULL when value is NULL
    // (so the null-flag count spells the operator's actual
    // IS-NULL semantics, not the value-never-null corpus shortcut)
    "p18_schema_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'v1' ELSE 'v2' END AS batch,
        | count(*) AS n_rows,
        | CAST(sum(CASE WHEN event_id % 2 = 0 OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_flag,
        | CAST(sum(CASE WHEN event_id % 2 = 1 AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_flag
        |FROM events GROUP BY 1 ORDER BY batch""".stripMargin,
    // st20: the oracle replays the textbook correlated-EXISTS
    // spelling (was this user active in the 7 preceding days?) the
    // operator's bounded fan-out replaces — proving the two agree
    "st20_returning_users" ->
      """WITH days AS (
        | SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        | FROM events WHERE user_id IS NOT NULL),
        |r AS (
        | SELECT d.day, d.u,
        |  EXISTS(SELECT 1 FROM days p WHERE p.u = d.u
        |         AND p.day < d.day AND p.day >= d.day - 7) AS prior
        | FROM days d)
        |SELECT day, count(*) AS dau,
        | CAST(sum(CASE WHEN prior THEN 1 ELSE 0 END) AS BIGINT) AS returning,
        | CAST(count(*) - sum(CASE WHEN prior THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        | round(CAST(sum(CASE WHEN prior THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |  AS returning_rate
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    // d19: d4's exact-jaccard pair replay (unrounded 0.5 floor, the
    // frame's law) + a rung×pairs group-by on the ROUNDED jaccard;
    // rungs with no surviving pairs emit no row on either engine
    "d19_threshold_sweep" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS j
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |th AS (SELECT unnest([0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS threshold),
        |f AS (SELECT th.threshold, p.a_id, p.b_id FROM th JOIN p ON p.j >= th.threshold),
        |np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM f GROUP BY threshold),
        |nd AS (SELECT threshold, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
        |       FROM (SELECT threshold, unnest([a_id, b_id]) AS d FROM f)
        |       GROUP BY threshold)
        |SELECT threshold, n_pairs, n_docs,
        | round(CAST(n_docs AS DOUBLE) / (SELECT count(*) FROM documents), 6)
        |  AS affected_share
        |FROM np JOIN nd USING (threshold) ORDER BY threshold""".stripMargin,
    // s18: s15's within-cell kNN replay (shared IVF training CTEs) →
    // neighbor-label votes → (votes DESC, label) argmax → per-label
    // agreement report
    "s18_knn_classify" -> ("WITH " + ivfCorpusCtes + """,
        |scored AS (
        | SELECT a.vec_id, b.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) AS rank
        | FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |votes AS (
        | SELECT s.vec_id, l.label AS n_label, count(*) AS votes
        | FROM scored s JOIN embeddings l ON s.n_id = l.vec_id
        | WHERE s.rank <= 5 AND l.label IS NOT NULL GROUP BY 1, 2),
        |pred AS (
        | SELECT vec_id, n_label AS predicted FROM (
        |  SELECT vec_id, n_label, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY votes DESC, n_label) AS rk FROM votes)
        | WHERE rk = 1)
        |SELECT e2.label, count(*) AS n_classified,
        | CAST(sum(CASE WHEN pred.predicted = e2.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        | round(CAST(sum(CASE WHEN pred.predicted = e2.label THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*), 6) AS agree_rate
        |FROM pred JOIN embeddings e2 ON pred.vec_id = e2.vec_id
        |GROUP BY e2.label ORDER BY e2.label""".stripMargin),
    // d20: d4's distinct word-3-gram shingle replay → df counts →
    // (df DESC, shingle) top-K with rank
    "d20_boilerplate_shingles" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |c AS (
        | SELECT s AS shingle, CAST(count(*) AS BIGINT) AS df
        | FROM (SELECT unnest(sh) AS s FROM g) GROUP BY 1),
        |r AS (
        | SELECT shingle, df,
        |  CAST(row_number() OVER (ORDER BY df DESC, shingle) AS BIGINT) AS rank
        | FROM c WHERE df >= 2)
        |SELECT rank, shingle, df,
        | round(CAST(df AS DOUBLE) / (SELECT count(*) FROM documents), 6) AS doc_share
        |FROM r WHERE rank <= 25 ORDER BY rank""".stripMargin,
    // a39: identical midpoint/half/ntile replay; one-half customers
    // survive the FULL JOIN with a null decile on the other side
    "a39_decile_migration" ->
      """WITH o AS (
        | SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders),
        |m AS (SELECT min(d) + CAST(date_diff('day', min(d), max(d)) // 2 AS INTEGER) AS mid FROM o),
        |sp AS (
        | SELECT o_custkey,
        |  CASE WHEN d < (SELECT mid FROM m) THEN 'h1' ELSE 'h2' END AS half,
        |  CAST(sum(cents) AS BIGINT) AS spend
        | FROM o GROUP BY 1, 2),
        |h1 AS (SELECT o_custkey, CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS from_decile
        |       FROM sp WHERE half = 'h1'),
        |h2 AS (SELECT o_custkey, CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS to_decile
        |       FROM sp WHERE half = 'h2')
        |SELECT from_decile, to_decile, count(*) AS n_custs
        |FROM h1 FULL JOIN h2 USING (o_custkey)
        |GROUP BY 1, 2
        |ORDER BY from_decile ASC NULLS FIRST, to_decile ASC NULLS FIRST""".stripMargin,
    // s19: s15's within-cell replay → k-th-rank cosine (the frame's
    // 6dp round) → bottom-N isolation cut with vec_id tiebreak
    "s19_knn_outliers" -> ("WITH " + ivfCorpusCtes + """,
        |scored AS (
        | SELECT a.vec_id, b.vec_id AS n_id,
        |  round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id) AS rank
        | FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |kth AS (SELECT vec_id, cosine AS kth_cosine FROM scored WHERE rank = 5),
        |top AS (
        | SELECT vec_id, kth_cosine,
        |  CAST(row_number() OVER (ORDER BY kth_cosine, vec_id) AS BIGINT)
        |   AS isolation_rank
        | FROM kth)
        |SELECT isolation_rank, t.vec_id, e2.label, kth_cosine
        |FROM top t JOIN embeddings e2 ON t.vec_id = e2.vec_id
        |WHERE isolation_rank <= 25 ORDER BY isolation_rank""".stripMargin),
    // t18: identical regexp counts and rounded ratios; (?m) multiline
    // anchors are supported by both Java regex and RE2
    "t18_code_detect" ->
      """SELECT doc_id, n_lines, symbol_ratio, indent_ratio, camel_rate,
        | coalesce(symbol_ratio > 0.03, FALSE) OR indent_ratio > 0.2 AS is_code
        |FROM (
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\n')) + 1 AS BIGINT) AS n_lines,
        |  round(CAST(len(regexp_extract_all(text, '[{};()=<>\[\]]')) AS DOUBLE)
        |   / nullif(length(text), 0), 6) AS symbol_ratio,
        |  round(CAST(len(regexp_extract_all(text, '(?m)^(  |\t)')) AS DOUBLE)
        |   / (len(regexp_extract_all(text, '\n')) + 1), 6) AS indent_ratio,
        |  round(CAST(len(regexp_extract_all(text, '[a-z][A-Z]')) AS DOUBLE)
        |   / nullif(length(text), 0), 6) AS camel_rate
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // x20: bucket = bit length of the token count (integer-exact —
    // never a floating log2), shares over the tiny bucket frame
    "x20_length_histogram" ->
      """WITH d AS (
        | SELECT len(regexp_split_to_array(text, '\s+')) AS n FROM documents),
        |b AS (SELECT CASE WHEN n <= 0 THEN 0 ELSE length(bin(n)) END AS bucket, n FROM d),
        |a AS (SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
        |      FROM b GROUP BY 1)
        |SELECT bucket,
        | CASE WHEN bucket = 0 THEN 0 ELSE CAST(1 AS BIGINT) << (bucket - 1) END AS lo_tokens,
        | CASE WHEN bucket = 0 THEN 0 ELSE (CAST(1 AS BIGINT) << bucket) - 1 END AS hi_tokens,
        | n_docs, n_tokens,
        | round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share,
        | round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share
        |FROM a ORDER BY bucket""".stripMargin,
    // st21: identical lead-diff gaps in the (ts_us, event_id) total
    // order, attributed to the earlier event's type; quantile_cont
    // interpolates the same exact µs integers (a8's parity law)
    "st21_gap_stats" ->
      """WITH g AS (
        | SELECT event_type,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us
        |   AS gap_us
        | FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |       FROM events))
        |SELECT event_type, count(*) AS n_gaps,
        | round(quantile_cont(gap_us, 0.5) / 1000000.0, 4) AS p50_s,
        | round(quantile_cont(gap_us, 0.9) / 1000000.0, 4) AS p90_s,
        | round(quantile_cont(gap_us, 0.99) / 1000000.0, 4) AS p99_s,
        | round(max(gap_us) / 1000000.0, 4) AS max_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // x21: x6's recursive next-fit replay → per-bin sums → 1-row
    // report (integer sums + one division)
    "x21_pack_efficiency" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS n,
        |  doc_id // 64 AS chunk,
        |  CAST(row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS INTEGER) AS rn
        | FROM documents WHERE text IS NOT NULL),
        |state AS (
        | SELECT chunk, rn, doc_id, n, 0 AS bin, n AS used FROM toks WHERE rn = 1
        | UNION ALL
        | SELECT t.chunk, t.rn, t.doc_id, t.n,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN s.bin + 1 ELSE s.bin END,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN t.n ELSE s.used + t.n END
        | FROM toks t JOIN state s ON t.chunk = s.chunk AND t.rn = s.rn + 1),
        |bins AS (
        | SELECT chunk * 1048576 + bin AS bin_id, sum(n) AS bt, count(*) AS bd
        | FROM state GROUP BY 1)
        |SELECT count(*) AS n_bins, CAST(sum(bd) AS BIGINT) AS n_docs,
        | CAST(sum(bt) AS BIGINT) AS total_tokens,
        | round(CAST(sum(bt) AS DOUBLE) / (count(*) * 512), 6) AS mean_fill,
        | CAST(sum(CASE WHEN bt > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
        | CAST(sum(CASE WHEN bt * 2 < 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_underfull
        |FROM bins""".stripMargin,
    // p19: day-grain replay — age behind the max day, ladder as
    // conditional sums
    "p19_retention_plan" ->
      """WITH d AS (
        | SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
        |a AS (SELECT date_diff('day', day, (SELECT max(day) FROM d)) AS age, n FROM d),
        |th AS (SELECT unnest([1, 3, 7, 14, 30]) AS retention_days)
        |SELECT CAST(retention_days AS BIGINT) AS retention_days,
        | CAST(sum(CASE WHEN age < retention_days THEN n ELSE 0 END) AS BIGINT) AS n_retained,
        | CAST(sum(n) - sum(CASE WHEN age < retention_days THEN n ELSE 0 END) AS BIGINT) AS n_expired,
        | round(CAST(sum(CASE WHEN age < retention_days THEN n ELSE 0 END) AS DOUBLE)
        |  / sum(n), 6) AS retained_share
        |FROM th, a GROUP BY th.retention_days ORDER BY retention_days""".stripMargin,
    // p20: the oracle aggregates the FLAT source — the lake (written,
    // corrupted, then repaired via dynamic partition overwrite) can
    // only hash-match if the repair replaced in place: static
    // overwrite loses every other day, append doubles the repaired one
    "p20_idempotent_backfill" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS p_date, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY p_date""".stripMargin,
    // p23: full-log recompute of the partition-local keyed merge —
    // the two earliest days' corrections (id%7=3, value ×10) replace
    // their originals, the inserts (id%11=5 cloned to +1e8) append,
    // everything else passes through untouched; per-day report in
    // p20's exact-cent form
    // st26: gaps-and-islands replay of the NATIVE session_window
    // semantics — split on gap >= 30min (session_window merges only
    // strictly-inside events, the boundary law the Scaladoc states);
    // window end = last event ts + gap
    "st26_session_window" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        | FROM events WHERE user_id IS NOT NULL),
        |y AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000
        |        THEN 1 ELSE 0 END AS brk
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |              ORDER BY ts_us, event_id) AS prev FROM x)),
        |z AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
        |      FROM y)
        |SELECT user_id, min(ts_us) AS session_start_us,
        | max(ts_us) + 1800000000 AS window_end_us,
        | count(*) AS n_events, round(sum(value), 4) AS total_value
        |FROM z GROUP BY user_id, seq
        |ORDER BY user_id, session_start_us""".stripMargin,
    // p25: replay of ONLY the clean (even-id) half — hash-matches iff
    // the failed staged batch is invisible to lake-root readers and
    // the published batch arrived whole. The empty guards mirror ALL
    // THREE audit checks (row count > 0 is implicit in an empty even
    // half; null user_id; duplicate event_id — count vs distinct,
    // DuplicateCount's exact spelling), so a corpus whose even half
    // fails ANY check replays as zero rows, matching the unpublished
    // lake (ADVICE r11).
    "p25_write_audit_publish" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE event_id % 2 = 0
        | AND NOT EXISTS (SELECT 1 FROM events
        |                 WHERE event_id % 2 = 0 AND user_id IS NULL)
        | AND NOT EXISTS (SELECT 1 FROM events WHERE event_id % 2 = 0
        |                 HAVING count(event_id) > count(DISTINCT event_id))
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // p26: day stats replayed from the raw table — the per-file
    // manifest collection must roll up to EXACTLY the table truth.
    // n_files=1/day is the single-input-split testdata contract
    // (spec-asserted against the real dir listing). Window = days
    // [1, 3) after the corpus's first day, same derivation as Spark.
    "p26_scan_prune_manifest" ->
      """WITH b AS (
        | SELECT epoch_us(CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)) AS t0
        | FROM events),
        |m AS (
        | SELECT strftime(ts, '%Y-%m-%d') AS p_date, count(*) AS n_rows,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        |  min(event_type) AS min_type, max(event_type) AS max_type
        | FROM events GROUP BY 1)
        |SELECT p_date, CAST(1 AS BIGINT) AS n_files, n_rows,
        | min_ts_us, max_ts_us, min_type, max_type,
        | NOT (max_ts_us < (SELECT t0 + 86400000000 FROM b)
        |   OR min_ts_us > (SELECT t0 + 3 * 86400000000 - 1 FROM b)) AS would_scan
        |FROM m ORDER BY p_date""".stripMargin,
    // p27: the incrementally-merged manifest must equal the FULL-lake
    // truth replayed from the raw table (p16's proof pattern). Base
    // slice writes 1 file/day, the appended commit adds 1 more →
    // n_files=2/day under the single-input-split testdata contract.
    "p27_incremental_manifest" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS p_date,
        | CAST(2 AS BIGINT) AS n_files, count(*) AS n_rows,
        | min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        | min(event_type) AS min_type, max(event_type) AS max_type
        |FROM events GROUP BY 1 ORDER BY p_date""".stripMargin,
    // t21: d3's token-hash replay (shared fragment) → mask-mod bucket
    // (unsigned u % 1024 == signed h & 1023), integer milli-weight
    // formula, exact integer score sum; the logit rounds to µ-units
    // in INTEGER arithmetic (half-away on |s|, signed — a double
    // round lands on half-way grid points where engines disagree),
    // then exp of the exactly-scaled µ value (t16's idiom). Token-
    // less docs drop via the same trim() law both sides.
    "t21_quality_classifier" ->
      (s"""WITH th AS (
        | SELECT doc_id, $tokenHashesSql AS ths
        | FROM documents WHERE regexp_matches(text, '\\S')),
        |w AS (
        | SELECT doc_id, CAST(len(ths) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(ths, h ->
        |    CAST((h % 1024) * 2654435761 % 2003 AS BIGINT) - 1001)) AS BIGINT)
        |   AS score_milli
        | FROM th),
        |l AS (
        | SELECT doc_id, n_tokens, score_milli,
        |  CASE WHEN score_milli < 0
        |   THEN -((abs(score_milli) * 2000 + n_tokens) // (2 * n_tokens))
        |   ELSE (score_milli * 2000 + n_tokens) // (2 * n_tokens)
        |  END AS logit_micro
        | FROM w)
        |SELECT doc_id, n_tokens, score_milli, logit_micro,
        | round(1.0 / (1.0 + exp(-(CAST(logit_micro AS DOUBLE) / 1000000.0))), 6) AS prob,
        | CASE WHEN round(1.0 / (1.0 + exp(-(CAST(logit_micro AS DOUBLE) / 1000000.0))), 6) >= 0.5
        |      THEN 'keep' ELSE 'drop' END AS label
        |FROM l ORDER BY doc_id""".stripMargin),
    // x25: same '\s+' split law as t2/x6 (limit -1: leading/trailing
    // empties kept on both engines), 1-based inclusive list slice,
    // md5 over the UTF-8 bytes of the re-joined chunk (t3's law).
    // window 32 / stride 24 — below the corpus max doc length so the
    // multi-chunk overlap law is actually exercised
    "x25_doc_chunking" ->
      """WITH tk AS (
        | SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_toks FROM tk),
        |c AS (
        | SELECT doc_id, toks, n_toks,
        |  unnest(generate_series(0, CASE WHEN n_toks <= 32 THEN 0
        |    ELSE (n_toks - 32 + 23) // 24 END)) AS chunk_idx
        | FROM n),
        |s AS (
        | SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok,
        |  array_to_string(toks[chunk_idx * 24 + 1 :
        |    least(chunk_idx * 24 + 32, n_toks)], ' ') AS ctext,
        |  least(32, n_toks - chunk_idx * 24) AS n_chunk_toks
        | FROM c)
        |SELECT doc_id, chunk_idx, start_tok, n_chunk_toks,
        | CAST(length(ctext) AS BIGINT) AS chunk_chars,
        | md5(ctext) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    // x27: full DSIR replay — token-hash fragment → mask buckets,
    // add-one-smoothed target/raw distributions over the 0..1023
    // grid, ln of the IDENTICAL expression tree rounded half-away to
    // integer milli-nats once per bucket, exact integer doc sums,
    // t21's integer µ-mean. ln() is the only FP wobble (t16 idiom).
    "x27_dsir_importance" ->
      (s"""WITH th AS (
        | SELECT doc_id, source, $tokenHashesSql AS ths
        | FROM documents WHERE regexp_matches(text, '\\S')),
        |tok AS (SELECT doc_id, source, unnest(ths) AS h FROM th),
        |tb AS (SELECT doc_id, source, CAST(h % 1024 AS BIGINT) AS b FROM tok),
        |grid AS (SELECT unnest(generate_series(0, 1023)) AS b),
        |tgt AS (SELECT b, count(*) AS c FROM tb WHERE source = 'src0' GROUP BY 1),
        |rawd AS (SELECT b, count(*) AS c FROM tb GROUP BY 1),
        |tots AS (SELECT coalesce((SELECT sum(c) FROM tgt), 0) AS tt,
        |                coalesce((SELECT sum(c) FROM rawd), 0) AS rt),
        |lr AS (
        | SELECT g.b,
        |  ln(((coalesce(t.c, 0) + 1.0) * ((SELECT rt FROM tots) + 1024.0)) /
        |     ((coalesce(r.c, 0) + 1.0) * ((SELECT tt FROM tots) + 1024.0))) AS x
        | FROM grid g LEFT JOIN tgt t ON g.b = t.b LEFT JOIN rawd r ON g.b = r.b),
        |lrm AS (
        | SELECT b, CASE WHEN x < 0
        |   THEN -CAST(floor(abs(x) * 1000.0 + 0.5) AS BIGINT)
        |   ELSE CAST(floor(abs(x) * 1000.0 + 0.5) AS BIGINT) END AS lr_milli
        | FROM lr),
        |per AS (
        | SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(l.lr_milli) AS BIGINT) AS sum_milli
        | FROM tb JOIN lrm l USING (b) GROUP BY 1)
        |SELECT doc_id, n_tokens, sum_milli,
        | CASE WHEN sum_milli < 0
        |  THEN -((abs(sum_milli) * 2000 + n_tokens) // (2 * n_tokens))
        |  ELSE (sum_milli * 2000 + n_tokens) // (2 * n_tokens) END AS avg_micro,
        | (CASE WHEN sum_milli < 0
        |  THEN -((abs(sum_milli) * 2000 + n_tokens) // (2 * n_tokens))
        |  ELSE (sum_milli * 2000 + n_tokens) // (2 * n_tokens) END) > 0 AS selected
        |FROM per ORDER BY doc_id""".stripMargin),
    // x26: x25's chunk replay grouped by content hash; the savings
    // arithmetic rides the aggregated frame
    "x26_chunk_dedup" ->
      """WITH tk AS (
        | SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_toks FROM tk),
        |c AS (
        | SELECT doc_id, toks, n_toks,
        |  unnest(generate_series(0, CASE WHEN n_toks <= 32 THEN 0
        |    ELSE (n_toks - 32 + 23) // 24 END)) AS chunk_idx
        | FROM n),
        |s AS (
        | SELECT doc_id,
        |  md5(array_to_string(toks[chunk_idx * 24 + 1 :
        |    least(chunk_idx * 24 + 32, n_toks)], ' ')) AS chunk_md5,
        |  least(32, n_toks - chunk_idx * 24) AS n_chunk_toks
        | FROM c),
        |g AS (
        | SELECT chunk_md5, count(*) AS n_copies,
        |  count(DISTINCT doc_id) AS n_docs,
        |  min(n_chunk_toks) AS chunk_toks, min(doc_id) AS first_doc
        | FROM s GROUP BY 1)
        |SELECT chunk_md5, n_copies, n_docs, chunk_toks, first_doc,
        | (n_copies - 1) * chunk_toks AS saved_toks
        |FROM g WHERE n_docs >= 2 ORDER BY chunk_md5""".stripMargin,
    // p29: both report sides replayed from the raw table — tracked =
    // the full day, orphans = the commit-0 slice of the two first
    // days (the planted copies ARE that slice's files)
    "p29_vacuum_orphans" ->
      """WITH d AS (
        | SELECT strftime(ts, '%Y-%m-%d') AS p_date,
        |  count(*) AS tracked_rows,
        |  CAST(sum(CASE WHEN event_id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS base_rows
        | FROM events GROUP BY 1),
        |r AS (
        | SELECT p_date, tracked_rows, base_rows,
        |  row_number() OVER (ORDER BY p_date) AS rk
        | FROM d)
        |SELECT p_date, tracked_rows,
        | CASE WHEN rk <= 2 THEN base_rows ELSE 0 END AS orphan_rows,
        | tracked_rows + CASE WHEN rk <= 2 THEN base_rows ELSE 0 END AS naive_reader_rows
        |FROM r ORDER BY p_date""".stripMargin,
    // p30: SERIAL replay of the two racing merges in commit order
    // (A then B) — the OCC outcome must be serializable, so the
    // committed state hash-matches iff B's rebase re-applied its
    // day-2 merge on top of A's corrections (lost updates and
    // phantom pre-rebase files both change a day's sum)
    "p30_optimistic_commit" ->
      """WITH ev AS (SELECT event_id, ts, value, CAST(ts AS DATE) AS d FROM events),
        |dd AS (SELECT d, row_number() OVER (ORDER BY d) AS rk
        |       FROM (SELECT DISTINCT d FROM ev)),
        |a AS (SELECT event_id, ts, round(value * 3, 2) AS value, d FROM ev
        |      WHERE d IN (SELECT d FROM dd WHERE rk <= 2) AND event_id % 11 = 4),
        |b AS (SELECT event_id, ts, round(value * 7, 2) AS value, d FROM ev
        |      WHERE d IN (SELECT d FROM dd WHERE rk IN (2, 3)) AND event_id % 13 = 6),
        |s1 AS (SELECT event_id, ts, value FROM ev
        |        WHERE event_id NOT IN (SELECT event_id FROM a)
        |       UNION ALL SELECT event_id, ts, value FROM a),
        |s2 AS (SELECT event_id, ts, value FROM s1
        |        WHERE event_id NOT IN (SELECT event_id FROM b)
        |       UNION ALL SELECT event_id, ts, value FROM b)
        |SELECT strftime(ts, '%Y-%m-%d') AS p_date, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s2 GROUP BY 1 ORDER BY p_date""".stripMargin,
    // p31: the UNPRUNED window filter over the raw table — pruning
    // must be invisible to results (drop only never-matching files)
    "p31_manifest_pruned_read" ->
      """WITH b AS (
        | SELECT epoch_us(CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)) AS t0
        | FROM events)
        |SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |WHERE epoch_us(ts) >= (SELECT t0 + 86400000000 FROM b)
        | AND epoch_us(ts) <= (SELECT t0 + 3 * 86400000000 - 1 FROM b)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // x28: t2's token-count laws aggregated per source, ratios via
    // the t21 integer half-away µ-law (no double rounding)
    "x28_tokenizer_fertility" ->
      """WITH t AS (
        | SELECT source, n_chars,
        |  len(regexp_split_to_array(text, '\s+')) AS ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe
        | FROM documents),
        |g AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens
        | FROM t GROUP BY 1)
        |SELECT source, n_docs, n_chars, ws_tokens, bpe_tokens,
        | CAST((CAST(n_chars AS HUGEINT) * 2000000 + ws_tokens) // (2 * ws_tokens) AS BIGINT) AS chars_per_ws_micro,
        | CAST((CAST(n_chars AS HUGEINT) * 2000000 + bpe_tokens) // (2 * bpe_tokens) AS BIGINT) AS chars_per_bpe_micro,
        | CAST((CAST(bpe_tokens AS HUGEINT) * 2000000 + ws_tokens) // (2 * ws_tokens) AS BIGINT) AS bpe_per_ws_micro
        |FROM g ORDER BY source""".stripMargin,
    // m11: m3's frame-index replay (byte-fold dims → stride) keyed by
    // t3's content fingerprint per frame, grouped across docs
    "m11_clip_dedup" ->
      """WITH h AS (
        | SELECT doc_id,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fp
        | FROM documents WHERE text IS NOT NULL),
        |s AS (
        | SELECT doc_id, fp,
        |  CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        |  CAST(((1 + (u // 8589934592) % 16) + 3) // 4 AS INTEGER) AS stride
        | FROM h),
        |f AS (
        | SELECT doc_id, md5(fp || ':' || CAST(frame // stride AS VARCHAR)) AS clip_key
        | FROM (SELECT doc_id, fp, stride,
        |        unnest(generate_series(0, n_frames - 1, stride)) AS frame FROM s)),
        |g AS (
        | SELECT clip_key, count(*) AS n_frames,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
        | FROM f GROUP BY 1)
        |SELECT clip_key, n_frames, n_docs, first_doc
        |FROM g WHERE n_docs >= 2 ORDER BY clip_key""".stripMargin,
    // s23: truncated-prefix cosine replay per dim rung; full-dim rung
    // is the recall-1.0 anchor. Same double-cast cosine law as s1.
    "s23_mrl_recall" ->
      """WITH dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        |r AS (
        | SELECT d.dim, q.vec_id AS q_id, c.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY q.vec_id, d.dim
        |    ORDER BY list_cosine_similarity(
        |      CAST(q.embedding[1:d.dim] AS DOUBLE[]),
        |      CAST(c.embedding[1:d.dim] AS DOUBLE[])) DESC, c.vec_id) AS rank
        | FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) q JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c ON q.vec_id <> c.vec_id
        | CROSS JOIN dims d
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |topk AS (SELECT dim, q_id, n_id FROM r WHERE rank <= 10),
        |f AS (SELECT q_id, n_id FROM topk WHERE dim = 64)
        |SELECT CAST(t.dim AS INTEGER) AS dim,
        | CAST(count(DISTINCT t.q_id) AS BIGINT) AS n_queries,
        | CAST(sum(CASE WHEN f.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        | round(CAST(sum(CASE WHEN f.q_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / (count(DISTINCT t.q_id) * 10), 4) AS recall
        |FROM topk t LEFT JOIN f ON t.q_id = f.q_id AND t.n_id = f.n_id
        |GROUP BY t.dim ORDER BY 1""".stripMargin,
    // s24: per-rung sample assignment under cents0..3 (the trainer's
    // own CTE ladder) with the cosine kept; means ride the exact-e6
    // integer grid, one final double division of two exact longs
    "s24_ivf_convergence" -> ("WITH " + ivfCorpusCtes16 + "," + Seq(0, 1, 2, 3).map { r =>
      s"""rung$r AS (
         | SELECT vid, cell, cs FROM (
         |  SELECT s.vec_id AS vid, c.cell, (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) AS cs,
         |   row_number() OVER (PARTITION BY s.vec_id
         |     ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> s.emb[i] * s.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS rn
         |  FROM sample s CROSS JOIN cents$r c) WHERE rn = 1),
         |cell$r AS (
         | SELECT cell, count(*) AS n,
         |  CAST(sum(CAST(round(cs * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6
         | FROM rung$r GROUP BY 1),
         |stat$r AS (
         | SELECT $r AS iter, CAST(sum(n) AS BIGINT) AS n_vecs,
         |  count(*) AS cells_used,
         |  CAST(round(CAST(sum(sum_e6) AS DOUBLE) / sum(n)) AS BIGINT) AS mean_cos_e6,
         |  CAST(min(n) AS BIGINT) AS min_cell_n,
         |  CAST(max(n) AS BIGINT) AS max_cell_n
         | FROM cell$r)""".stripMargin
    }.mkString(",\n") +
      "\nSELECT * FROM stat0 UNION ALL SELECT * FROM stat1 UNION ALL SELECT * FROM stat2 UNION ALL SELECT * FROM stat3 ORDER BY iter"),
    // s26: the ladder retrained on the existing side only (the
    // parameterized sample WHERE), full-corpus assignment split by
    // the batch mod, new-arrival cosines re-joined from cents3
    "s26_incremental_ivf" -> ("WITH " +
      ivfCtesWith("vec_id % 4 = 0 AND vec_id % 10 <> 7", "vec_id % 10 <> 7", cells = "16") + """,
        |ex AS (
        | SELECT cell, count(*) AS n_existing FROM corpus
        | WHERE vec_id % 10 <> 7 GROUP BY 1),
        |nw AS (
        | SELECT x.cell, count(*) AS n_new,
        |  CAST(sum(CAST(round(
        |   (list_reduce(list_transform(generate_series(1, 64), i -> x.emb[i] * c.cemb[i]), (x0, y0) -> x0 + y0)
        |    / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> x.emb[i] * x.emb[i]), (x0, y0) -> x0 + y0))
        |       * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x0, y0) -> x0 + y0))))
        |   * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6
        | FROM corpus x JOIN cents3 c ON x.cell = c.cell
        | WHERE x.vec_id % 10 = 7 GROUP BY 1)
        |SELECT CAST(c.cell AS BIGINT) AS cell,
        | CAST(coalesce(ex.n_existing, 0) AS BIGINT) AS n_existing,
        | CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new,
        | CASE WHEN nw.n_new IS NOT NULL
        |  THEN CAST(round(CAST(nw.sum_e6 AS DOUBLE) / nw.n_new) AS BIGINT)
        |  ELSE NULL END AS mean_new_cos_e6,
        | CASE WHEN coalesce(ex.n_existing, 0) > 0
        |  THEN CAST((CAST(coalesce(nw.n_new, 0) AS HUGEINT) * 2000000 + ex.n_existing)
        |            // (2 * ex.n_existing) AS BIGINT)
        |  ELSE NULL END AS growth_ppm
        |FROM cents3 c
        |LEFT JOIN ex ON c.cell = ex.cell
        |LEFT JOIN nw ON c.cell = nw.cell
        |ORDER BY cell""".stripMargin),
    // s25: per-dimension moment replay on the same e6 integer grid —
    // HUGEINT where Spark rides decimal(38,0); the one sqrt is an
    // IEEE op on an exact integer (never a .5 boundary)
    "s25_anisotropy" ->
      """WITH comp AS (
        | SELECT t.i AS dim,
        |  CAST(round(CAST(e.embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS c_e6
        | FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t),
        |d AS (
        | SELECT dim, count(*) AS n, CAST(sum(c_e6) AS BIGINT) AS s,
        |  sum(CAST(c_e6 AS HUGEINT) * c_e6) AS ssq
        | FROM comp GROUP BY 1),
        |m AS (
        | SELECT dim,
        |  CAST(sign(s) AS BIGINT) *
        |   CAST((2 * abs(CAST(s AS HUGEINT)) + n) // (2 * n) AS BIGINT) AS mean_e6,
        |  CAST((n * ssq - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_e12
        | FROM d),
        |tot AS (
        | SELECT CAST(sum(var_e12) AS HUGEINT) AS tv,
        |  CAST(round(sqrt(CAST(sum(CAST(mean_e6 AS HUGEINT) * mean_e6) AS DOUBLE))) AS BIGINT) AS cnorm
        | FROM m)
        |SELECT CAST(dim AS BIGINT) AS dim, mean_e6, var_e12,
        | CAST((CAST(var_e12 AS HUGEINT) * 2000000 + tv) // (2 * tv) AS BIGINT) AS var_share_ppm,
        | cnorm AS centroid_norm_e6
        |FROM m CROSS JOIN tot ORDER BY dim""".stripMargin,
    // p28: the as-of-commit-0 slice replayed from the raw table — a
    // file-pinning bug cannot produce this rollup
    "p28_time_travel" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE event_id % 7 <> 3
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // a41: Q2's correlated min as agg + row_number join-back; unit
    // price exact micro-cents so MIN and join-back are integer laws
    "a41_min_cost_supplier" ->
      """WITH ps AS (
        | SELECT l_partkey, l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        | FROM lineitem GROUP BY 1, 2),
        |u AS (SELECT l_partkey, l_suppkey, (c * 10000) // q AS unit_ucents FROM ps),
        |r AS (
        | SELECT l_partkey, l_suppkey, unit_ucents,
        |  row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY unit_ucents, l_suppkey) AS rn
        | FROM u)
        |SELECT r.l_partkey AS p_partkey, s.s_suppkey, s.s_name, n.n_name,
        | CAST(r.unit_ucents AS BIGINT) AS unit_ucents
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    // a42: Q11's group-wise HAVING vs the nation total — threshold is
    // 3x the nation's MEAN part share (distribution-relative; a fixed
    // ppm floor empties as parts grow), integer cross-multiplied
    "a42_important_stock" ->
      """WITH v AS (
        | SELECT n.n_name, l.l_partkey,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        | FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | GROUP BY 1, 2),
        |t AS (
        | SELECT n_name, l_partkey AS p_partkey, value_cents,
        |  CAST(sum(value_cents) OVER (PARTITION BY n_name) AS BIGINT) AS nation_cents,
        |  CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_parts
        | FROM v)
        |SELECT n_name, p_partkey, value_cents, nation_cents FROM t
        |WHERE value_cents * n_parts > 3 * nation_cents
        |ORDER BY n_name, p_partkey""".stripMargin,
    // a43: Q4's EXISTS with the non-equi late-shipment predicate
    "a43_priority_checking" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        | AND o.o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        | AND EXISTS (SELECT 1 FROM lineitem l
        |   WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // a44: Q22's scalar-avg decorrelation + lapsed-customer anti join
    // (no orders in the final 24 months; cutoff data-derived, both
    // engines month-shift the DATE)
    "a44_sales_opportunity" ->
      """WITH c AS (
        | SELECT c_custkey, c_nationkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        | FROM customer),
        |a AS (SELECT CAST(sum(bal) AS BIGINT) AS s, count(*) AS n FROM c WHERE bal > 0),
        |cut AS (SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 24 MONTH AS d FROM orders)
        |SELECT n.n_name, count(*) AS n_custs,
        | CAST(sum(c.bal) AS BIGINT) AS total_bal_cents
        |FROM c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.bal * (SELECT n FROM a) > (SELECT s FROM a)
        | AND NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= (SELECT d FROM cut))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // a45: Q20's nested semi — PROMO-part filter, per-supplier HAVING
    "a45_promo_suppliers" ->
      """WITH q AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS promo_qty
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        | GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 500)
        |SELECT s.s_suppkey, s.s_name, q.promo_qty
        |FROM supplier s JOIN q ON s.s_suppkey = q.l_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    // a46: Q9 profit replay in the same exact 1e-4 integer units —
    // identical double expression tree before the round, so both
    // engines land on the same (never-halfway) integral value
    "a46_product_profit" ->
      """WITH m AS (
        | SELECT p_partkey,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS retail_cents
        | FROM part WHERE p_name LIKE '%bolt%')
        |SELECT n.n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        | CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
        |   - m.retail_cents * 60 * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e4,
        | CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | count(*) AS n_lines
        |FROM lineitem l
        | JOIN m ON l.l_partkey = m.p_partkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year""".stripMargin,
    // p32: same lower+upper-middle median law and rounded decimal-DIV
    // ppm spelling — integers end to end, so the hash can only match
    // if the median selection and both ppm roundings agree exactly
    "p32_partition_skew" ->
      """WITH byday AS (
        | SELECT CAST(ts AS DATE) AS p_date, count(*) AS n_rows,
        |  CAST(sum(length(props) + 16) AS BIGINT) AS n_bytes
        | FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n, CAST(sum(n_rows) AS BIGINT) AS total FROM byday),
        |r AS (SELECT p_date, n_rows, row_number() OVER (ORDER BY n_rows, p_date) AS rn FROM byday),
        |med AS (
        | SELECT CAST(sum(CASE WHEN (n + 1) // 2 = (n + 2) // 2
        |   THEN n_rows * 2 ELSE n_rows END) AS BIGINT) AS median_x2
        | FROM r CROSS JOIN tot WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
        |SELECT p_date, n_rows, n_bytes,
        | CAST((CAST(n_rows AS HUGEINT) * 2000000 + total) // (2 * total) AS BIGINT) AS share_ppm,
        | CAST((CAST(n_rows AS HUGEINT) * 4000000 + median_x2) // (2 * median_x2) AS BIGINT) AS ratio_vs_median_ppm,
        | n_rows * 2 > 2 * median_x2 AS skewed
        |FROM byday CROSS JOIN tot CROSS JOIN med
        |ORDER BY p_date""".stripMargin,
    // d22: d4's text-shingle spelling (hash-free replay — distinct
    // shingles per doc agree with the hashed spelling, d4's law),
    // DF per shingle, bucket fold with HUGEINT pair mass
    "d22_shingle_df_profile" ->
      """WITH g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |d AS (SELECT s, count(*) AS df FROM g GROUP BY 1),
        |b AS (
        | SELECT df,
        |  CASE WHEN df <= 1 THEN 1 WHEN df <= 5 THEN 2 WHEN df <= 25 THEN 6
        |       WHEN df <= 100 THEN 26 WHEN df <= 1000 THEN 101 ELSE 1001 END AS df_lo,
        |  CASE WHEN df <= 1 THEN 1 WHEN df <= 5 THEN 5 WHEN df <= 25 THEN 25
        |       WHEN df <= 100 THEN 100 WHEN df <= 1000 THEN 1000
        |       ELSE 9223372036854775807 END AS df_hi,
        |  CAST(CAST(df AS HUGEINT) * (df - 1) // 2 AS BIGINT) AS cand
        | FROM d)
        |SELECT CAST(df_lo AS BIGINT) AS df_lo, CAST(df_hi AS BIGINT) AS df_hi,
        | count(*) AS n_shingles, CAST(sum(df) AS BIGINT) AS posting_mass,
        | CAST(sum(cand) AS BIGINT) AS cand_pairs
        |FROM b GROUP BY 1, 2 ORDER BY df_lo""".stripMargin,
    // m10: m2's HUGEINT stub-dims replay fanned into the tile grid —
    // edge tiles carry their true short extent
    "m10_image_tiles" ->
      """WITH h AS (
        | SELECT doc_id,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents WHERE text IS NOT NULL),
        |dims AS (
        | SELECT doc_id, CAST(64 + u % 1024 AS INTEGER) AS w,
        |  CAST(64 + (u // 131072) % 1024 AS INTEGER) AS h
        | FROM h),
        |g AS (SELECT doc_id, w, h, (w + 63) // 64 AS nx, (h + 63) // 64 AS ny FROM dims),
        |t AS (SELECT doc_id, w, h, nx, unnest(generate_series(0, ny - 1)) AS ty FROM g),
        |tt AS (SELECT doc_id, w, h, ty, unnest(generate_series(0, nx - 1)) AS tx FROM t)
        |SELECT doc_id, CAST(tx AS INTEGER) AS tile_x, CAST(ty AS INTEGER) AS tile_y,
        | CAST(least(64, w - tx * 64) AS INTEGER) AS px_w,
        | CAST(least(64, h - ty * 64) AS INTEGER) AS px_h
        |FROM tt ORDER BY doc_id, tile_y, tile_x""".stripMargin,
    // st27: global-spelling replay of the duration histogram — the
    // banded within-band lead + cross-band next-first patch must
    // equal ONE global lead over the same per-instant frame
    "st27_concurrency_histogram" ->
      """WITH deltas AS (
        | SELECT epoch_us(ts) AS us, 1 AS delta FROM events
        | UNION ALL
        | SELECT epoch_us(ts) + 300000000 AS us, -1 AS delta FROM events),
        |perus AS (
        | SELECT us, sum(delta) AS net FROM deltas GROUP BY us),
        |run AS (
        | SELECT us,
        |  sum(net) OVER (ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
        |  lead(us) OVER (ORDER BY us) AS next_us
        | FROM perus)
        |SELECT CAST(running AS BIGINT) AS level, count(*) AS n_spans,
        | CAST(sum(next_us - us) AS BIGINT) AS total_us
        |FROM run WHERE next_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // st24: the oracle computes the GLOBAL sweep-line running sum
    // directly — the Spark side's (day, hour)-banded offset
    // decomposition must equal it bit-for-bit, so DuckDB itself
    // proves the prefix-sum split exact (the x9b proof pattern).
    // Half-open interval law: all deltas at one instant net together.
    "st24_peak_concurrency" ->
      """WITH deltas AS (
        | SELECT epoch_us(ts) AS us, 1 AS delta FROM events
        | UNION ALL
        | SELECT epoch_us(ts) + 300000000 AS us, -1 AS delta FROM events),
        |perus AS (
        | SELECT us, sum(delta) AS net FROM deltas GROUP BY us),
        |run AS (
        | SELECT us, sum(net) OVER (ORDER BY us
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        | FROM perus),
        |byday AS (
        | SELECT CAST(make_timestamp(us) AS DATE) AS day, us, running FROM run),
        |pk AS (
        | SELECT day, max(running) AS peak FROM byday GROUP BY day)
        |SELECT b.day, CAST(p.peak AS BIGINT) AS peak_concurrency,
        | min(b.us) AS peak_at_us
        |FROM byday b JOIN pk p ON b.day = p.day AND b.running = p.peak
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // m9: m3's frame replay extended one window step — a cut opens a
    // scene when consecutive frame hashes differ in > 3 bits
    // (two's-complement bit_count on both engines)
    "m9_scene_change" ->
      """WITH h AS (
        | SELECT doc_id,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u,
        |  list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, c) -> (31 * acc + c) % 4294967296) AS ju
        | FROM documents WHERE text IS NOT NULL),
        |s AS (
        | SELECT doc_id,
        |  CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        |  CASE WHEN ju >= 2147483648 THEN ju - 4294967296 ELSE ju END AS jhash,
        |  CAST(((1 + (u // 8589934592) % 16) + 3) // 4 AS INTEGER) AS stride
        | FROM h),
        |f AS (
        | SELECT doc_id, CAST(frame // stride AS INTEGER) AS frame_idx,
        |  CAST(jhash * 31 + frame AS BIGINT) AS frame_hash
        | FROM (SELECT doc_id, stride, jhash,
        |        unnest(generate_series(0, n_frames - 1, stride)) AS frame FROM s)),
        |g AS (
        | SELECT doc_id, frame_hash,
        |  lag(frame_hash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        | FROM f)
        |SELECT doc_id, count(*) AS n_frames,
        | CAST(sum(CASE WHEN prev IS NULL THEN 1
        |   WHEN bit_count(xor(frame_hash, prev)) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_scenes
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // p24: flat-source replay — the report hash-matches iff the
    // fragment-then-compact rewrite conserved every row and value
    "p24_compaction" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS p_date, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY p_date""".stripMargin,
    "p23_lake_merge" ->
      """WITH ev AS (SELECT event_id, ts, event_type, value FROM events),
        |days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM ev ORDER BY d LIMIT 2),
        |corr AS (
        | SELECT event_id, ts, round(value * 10, 2) AS value
        | FROM ev WHERE CAST(ts AS DATE) IN (SELECT d FROM days) AND event_id % 7 = 3),
        |ins AS (
        | SELECT event_id + 100000000 AS event_id, ts, 1.23 AS value
        | FROM ev WHERE CAST(ts AS DATE) IN (SELECT d FROM days) AND event_id % 11 = 5),
        |merged AS (
        | SELECT event_id, ts, value FROM ev
        |  WHERE event_id NOT IN (SELECT event_id FROM corr)
        | UNION ALL SELECT event_id, ts, value FROM corr
        | UNION ALL SELECT event_id, ts, value FROM ins)
        |SELECT strftime(ts, '%Y-%m-%d') AS p_date, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM merged GROUP BY 1 ORDER BY p_date""".stripMargin,
    // st22: st1's session replay folded to the 1-row quality report;
    // percentiles interpolate exact integers (a8's parity law)
    "st22_session_stats" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM x)),
        |z AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM y),
        |s AS (
        | SELECT user_id, session_seq, count(*) AS n_events,
        |  max(ts_us) - min(ts_us) AS dur_us
        | FROM z GROUP BY user_id, session_seq)
        |SELECT count(*) AS n_sessions,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*), 6) AS bounce_rate,
        | quantile_cont(n_events, 0.5) AS p50_events,
        | quantile_cont(n_events, 0.9) AS p90_events,
        | round(quantile_cont(dur_us, 0.5) / 1000000.0, 4) AS p50_dur_s,
        | round(quantile_cont(dur_us, 0.9) / 1000000.0, 4) AS p90_dur_s
        |FROM s""".stripMargin,
    // t19: t16's shared ppl replay + tercile thresholds (quantile_cont
    // on the 4dp ppl — a8's parity law) + per-bucket integer-exact
    // mean (d18's law)
    "t19_ppl_partition" -> ("WITH " + bigramPplCtes + """,
        |th AS (SELECT quantile_cont(ppl, CAST(1 AS DOUBLE) / 3) AS q33,
        |              quantile_cont(ppl, CAST(2 AS DOUBLE) / 3) AS q67
        |       FROM pplframe),
        |b AS (
        | SELECT CASE WHEN ppl <= (SELECT q33 FROM th) THEN 'head'
        |             WHEN ppl <= (SELECT q67 FROM th) THEN 'middle'
        |             ELSE 'tail' END AS bucket,
        |  n_scored, ppl
        | FROM pplframe)
        |SELECT bucket, count(*) AS n_docs,
        | CAST(sum(n_scored) AS BIGINT) AS n_scored_total,
        | round(min(ppl), 4) AS min_ppl, round(max(ppl), 4) AS max_ppl,
        | round(CAST(sum(CAST(round(ppl * 10000) AS BIGINT)) AS DOUBLE)
        |  / 10000.0 / count(*), 4) AS mean_ppl
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
    // x22: t1's score replay per source; mean as exact 1e-6 integer
    // units (d18's law), null scores reject (x4's law)
    "x22_source_quality" ->
      """WITH s AS (
        | SELECT source,
        |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3
        |         + (1.0 - punct_ratio) * 0.2, 6) AS q,
        |  n_tokens AS tk
        | FROM (
        |  SELECT source, len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT source, text, regexp_split_to_array(text, '\s+') AS toks FROM documents)))
        |SELECT source, count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS n_tokens,
        | round(CASE WHEN count(q) > 0
        |  THEN CAST(sum(CAST(round(q * 1000000) AS BIGINT)) AS DOUBLE)
        |   / 1000000.0 / count(q) END, 6) AS mean_quality,
        | round(CAST(sum(CASE WHEN q >= 0.5 THEN 0 ELSE 1 END) AS DOUBLE)
        |  / count(*), 6) AS reject_rate
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    // m8: byte histogram over the ASCII payload (unicode(c) = byte,
    // the m5/m6 equivalence), H = log2(n) − Σ c·log2 c / n; empty
    // docs re-join with zero stats (the operator emits them directly)
    "m8_byte_entropy" ->
      """WITH ch AS (
        | SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
        | FROM documents WHERE text IS NOT NULL),
        |hist AS (
        | SELECT doc_id, c, count(*) AS cnt FROM ch WHERE c <> '' GROUP BY 1, 2),
        |e AS (
        | SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS byte_len,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(log2(CAST(sum(cnt) AS DOUBLE))
        |   - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt), 4) AS entropy_bits
        | FROM hist GROUP BY 1)
        |SELECT d.doc_id, coalesce(e.byte_len, 0) AS byte_len,
        | coalesce(e.n_distinct, 0) AS n_distinct,
        | coalesce(e.entropy_bits, 0.0) AS entropy_bits
        |FROM (SELECT * FROM documents WHERE text IS NOT NULL) d
        | LEFT JOIN e USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // s20: s17's IVF-probe replay GENERATED per ladder rung (pr <=
    // nprobe); hit counts join on (q, n) membership, never a cosine
    // re-compare; mean recall = Σhits / (k·|queries|), one exact
    // integer division
    "s20_nprobe_curve" -> {
      val rungs = Seq(1, 2, 4, 8, 16)
      val perRung = rungs.map { np =>
        s"""cand_$np AS (
           | SELECT DISTINCT p.q_id, p.q_emb, c.vec_id AS n_id, c.emb AS n_emb
           | FROM (SELECT * FROM probes WHERE pr <= $np) p
           | JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.q_id),
           |approx_$np AS (
           | SELECT q_id, n_id FROM (
           |  SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, n_id) AS rank
           |  FROM cand_$np)
           | WHERE rank <= 10)""".stripMargin
      }.mkString(",\n")
      val unions = rungs.map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, count(*) AS n_hits FROM approx_$np a JOIN bf ON a.q_id = bf.q_id AND a.n_id = bf.n_id"
      }.mkString("\nUNION ALL\n")
      "WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |bf AS (
        | SELECT q_id, n_id FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) q JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600)
        | WHERE rank <= 10),
        |""".stripMargin + perRung + s"""
        |SELECT nprobe, n_hits,
        | round(CAST(n_hits AS DOUBLE)
        |  / ((SELECT count(DISTINCT q_id) FROM bf) * 10), 6) AS mean_recall
        |FROM ($unions) u
        |WHERE (SELECT count(*) FROM bf) > 0 ORDER BY nprobe""".stripMargin
    },
    // p21: identical day-grain counts; avg from the exactly-recovered
    // rounded sum (p8's law); verdict folds the same integers
    "p21_dq_daily" ->
      """SELECT day, n_rows, n_null_user, n_dup_event_id, avg_value,
        | (n_null_user = 0 AND n_dup_event_id = 0
        |  AND avg_value BETWEEN 0.0 AND 1000.0) AS ok
        |FROM (
        | SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user,
        |  CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS n_dup_event_id,
        |  round(sum(value), 2) / count(*) AS avg_value
        | FROM events GROUP BY 1)
        |ORDER BY day""".stripMargin,
    // x23: x8's mix64 split replay on each pair member + d4's pair
    // replay; cells fold unordered via least/greatest (d14's law)
    "x23_split_leakage" ->
      """WITH m0 AS (
        | SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS z
        | FROM documents),
        |m1 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m0),
        |m2 AS (SELECT doc_id, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
        |m4 AS (SELECT doc_id, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT) AS z FROM m3),
        |m5 AS (SELECT doc_id, xor(z, z >> 31) AS u FROM m4),
        |sgn AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
        | FROM m5),
        |sp AS (
        | SELECT doc_id,
        |  CASE WHEN ((h % 100) + 100) % 100 < 80 THEN 'train'
        |       WHEN ((h % 100) + 100) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM sgn),
        |g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |cells AS (
        | SELECT least(sa.split, sb.split) AS split_lo,
        |  greatest(sa.split, sb.split) AS split_hi, count(*) AS n_pairs
        | FROM p JOIN sp sa ON p.a_id = sa.doc_id
        |        JOIN sp sb ON p.b_id = sb.doc_id
        | GROUP BY 1, 2)
        |SELECT split_lo, split_hi, n_pairs,
        | round(CAST(n_pairs AS DOUBLE) / (SELECT sum(n_pairs) FROM cells), 6)
        |  AS pair_share,
        | split_lo <> split_hi AS is_leak
        |FROM cells ORDER BY split_lo, split_hi""".stripMargin,
    // st23: both carries over st15's frame; first_value/last_value
    // IGNORE NULLS over the identical strict-precedence window
    "st23_first_touch" ->
      """SELECT event_id, user_id, first_touch_id, last_touch_id,
        | first_touch_id IS NOT NULL AS attributed,
        | first_touch_id = last_touch_id AS same_touch
        |FROM (
        | SELECT event_id, user_id, event_type,
        |  first_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
        |    OVER w AS first_touch_id,
        |  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
        |    OVER w AS last_touch_id
        | FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events)
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // p22: replayed stage counts — silver = distinct event_id (the
    // dedup key; unique at every SF, §5's determinism note), gold
    // event mass = silver by conservation
    "p22_stage_reconcile" ->
      """SELECT n_bronze, n_silver, n_bronze - n_silver AS dedup_loss,
        | n_gold_groups, gold_events, gold_events = n_silver AS conserved
        |FROM (
        | SELECT (SELECT count(*) FROM events) AS n_bronze,
        |  (SELECT count(DISTINCT event_id) FROM events) AS n_silver,
        |  (SELECT count(*) FROM (SELECT DISTINCT event_type,
        |    time_bucket(INTERVAL '15 minutes', ts) FROM events)) AS n_gold_groups,
        |  (SELECT count(DISTINCT event_id) FROM events) AS gold_events)""".stripMargin,
    // s21: identical int8 quantization (floor(x/scale·127 + 0.5))
    // and fixed-index-order cosine fold; mean over 1e-6 integer
    // units of the per-row ROUNDED cosine (d18's law)
    "s21_sq_error" ->
      """WITH c AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |  list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS scale
        | FROM embeddings WHERE embedding IS NOT NULL),
        |q AS (
        | SELECT vec_id, e,
        |  CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
        |   ELSE list_transform(e, x -> CAST(floor(x / scale * 127.0 + 0.5) AS BIGINT))
        |  END AS codes
        | FROM c),
        |s AS (
        | SELECT vec_id,
        |  list_reduce(list_transform(generate_series(1, 64), i -> codes[i] * codes[i]),
        |    (x, y) -> x + y) AS qn,
        |  list_reduce(list_transform(generate_series(1, 64), i -> e[i] * CAST(codes[i] AS DOUBLE)),
        |    (x, y) -> x + y) AS dot,
        |  sqrt(list_reduce(list_transform(generate_series(1, 64), i -> e[i] * e[i]),
        |    (x, y) -> x + y)) AS ne
        | FROM q),
        |r AS (
        | SELECT vec_id,
        |  round(CASE WHEN qn > 0 AND ne > 0
        |   THEN dot / (ne * sqrt(CAST(qn AS DOUBLE))) END, 6) AS cos
        | FROM s)
        |SELECT count(*) AS n_vecs, round(min(cos), 6) AS min_cos,
        | round(CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS DOUBLE)
        |  / 1000000.0 / count(cos), 6) AS mean_cos,
        | round(CAST(sum(CASE WHEN cos >= 0.999 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*), 6) AS share_above_999
        |FROM r""".stripMargin,
    // x24: exact token-sum shares, then s^τ / Σ s^τ per rung —
    // identical pow/normalize arithmetic, rounded once
    "x24_temperature_mix" ->
      """WITH b AS (
        | SELECT source,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS tokens
        | FROM documents GROUP BY 1),
        |sh AS (
        | SELECT source,
        |  CAST(tokens AS DOUBLE) / (SELECT sum(tokens) FROM b) AS base_share
        | FROM b),
        |th AS (SELECT unnest([0.5, 0.7, 1.0]) AS tau),
        |w AS (
        | SELECT source, tau, base_share, pow(base_share, tau) AS pw
        | FROM sh, th)
        |SELECT source, tau, round(base_share, 6) AS base_share,
        | round(pw / sum(pw) OVER (PARTITION BY tau), 6) AS weight
        |FROM w ORDER BY tau, source""".stripMargin,
    // s22: the shared IVF probe replay → rung prefix of the cell
    // preference ranks → exact integer cell-size sums per rung
    "s22_scan_cost" -> ("WITH " + ivfCorpusCtes + """,
        |probes AS (
        | SELECT q.vec_id AS q_id, c.cell,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY (list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * c.cemb[i]), (x, y) -> x + y) / (sqrt(list_reduce(list_transform(generate_series(1, 64), i -> q.emb[i] * q.emb[i]), (x, y) -> x + y)) * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> c.cemb[i] * c.cemb[i]), (x, y) -> x + y)))) DESC, c.cell ASC) AS pr
        | FROM e q CROSS JOIN cents3 c
        | WHERE q.vec_id % 50 = 0 AND q.vec_id < 25600),
        |sizes AS (SELECT cell, count(*) AS n FROM corpus GROUP BY 1),
        |th AS (SELECT unnest([1, 2, 4, 8, 16]) AS nprobe),
        |f AS (SELECT th.nprobe, p.q_id, p.cell FROM th JOIN probes p ON p.pr <= th.nprobe)
        |SELECT CAST(nprobe AS BIGINT) AS nprobe,
        | CAST(sum(coalesce(s.n, 0)) AS BIGINT) AS total_scanned,
        | round(CAST(sum(coalesce(s.n, 0)) AS DOUBLE)
        |  / (SELECT count(DISTINCT q_id) FROM probes), 4) AS mean_scanned_per_query
        |FROM f LEFT JOIN sizes s ON f.cell = s.cell
        |GROUP BY nprobe ORDER BY nprobe""".stripMargin),
    // a40: identical basket/pair/marginal replay; lift from exact
    // integer counts, divided once
    "a40_basket_lift" ->
      """WITH k AS (
        | SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |p AS (
        | SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
        | FROM k a JOIN k b ON a.okey = b.okey AND a.brand < b.brand
        | GROUP BY 1, 2 HAVING count(*) >= 10),
        |m AS (SELECT brand, count(*) AS n FROM k GROUP BY 1),
        |t AS (SELECT count(DISTINCT okey) AS n_orders FROM k)
        |SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
        | CAST(ma.n AS BIGINT) AS n_a, CAST(mb.n AS BIGINT) AS n_b,
        | round(CAST(n_ab AS DOUBLE) / (SELECT n_orders FROM t), 6) AS support,
        | round(CAST(n_ab AS DOUBLE) * (SELECT n_orders FROM t)
        |  / (ma.n * mb.n), 6) AS lift
        |FROM p JOIN m ma ON p.brand_a = ma.brand
        |       JOIN m mb ON p.brand_b = mb.brand
        |ORDER BY brand_a, brand_b""".stripMargin,
    // d21: d19's pair replay → per-rung distinct b_id drop set
    // (pairwise min-id anchor law) → token decoration + shares
    "d21_dedup_savings" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS j
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |th AS (SELECT unnest([0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS threshold),
        |drop0 AS (
        | SELECT DISTINCT th.threshold, p.b_id AS doc_id
        | FROM th JOIN p ON p.j >= th.threshold),
        |tk AS (SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS t
        |       FROM documents),
        |tot AS (SELECT count(*) AS docs, sum(t) AS tokens FROM tk)
        |SELECT threshold, CAST(count(*) AS BIGINT) AS n_dropped,
        | round(CAST(count(*) AS DOUBLE) / (SELECT docs FROM tot), 6) AS doc_share,
        | CAST(sum(tk.t) AS BIGINT) AS tokens_removed,
        | round(CAST(sum(tk.t) AS DOUBLE) / (SELECT tokens FROM tot), 6) AS token_share
        |FROM drop0 JOIN tk USING (doc_id)
        |GROUP BY threshold ORDER BY threshold""".stripMargin,
    // t20: per-term list_filter counts over the lowercased token
    // array; dl counts NON-EMPTY tokens (TermFrequencies' tokenize
    // law — an empty doc is dl 0, not [''] = 1); empty docs keep
    "t20_blocklist_gate" ->
      """SELECT doc_id, n_tokens, n_hits, n_terms_hit,
        | round(CASE WHEN n_tokens > 0
        |  THEN CAST(n_hits AS DOUBLE) / n_tokens END, 6) AS hit_rate,
        | coalesce(round(CASE WHEN n_tokens > 0
        |  THEN CAST(n_hits AS DOUBLE) / n_tokens END, 6) <= 0.02, TRUE) AS keep
        |FROM (
        | SELECT doc_id, CAST(len(list_filter(toks, x -> x <> '')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> x = 'drop'))
        |   + len(list_filter(toks, x -> x = 'slow'))
        |   + len(list_filter(toks, x -> x = 'filter'))
        |   + len(list_filter(toks, x -> x = 'merge')) AS BIGINT) AS n_hits,
        |  CASE WHEN toks IS NOT NULL THEN
        |  CAST((CASE WHEN len(list_filter(toks, x -> x = 'drop')) > 0 THEN 1 ELSE 0 END)
        |   + (CASE WHEN len(list_filter(toks, x -> x = 'slow')) > 0 THEN 1 ELSE 0 END)
        |   + (CASE WHEN len(list_filter(toks, x -> x = 'filter')) > 0 THEN 1 ELSE 0 END)
        |   + (CASE WHEN len(list_filter(toks, x -> x = 'merge')) > 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) END AS n_terms_hit
        | FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |       FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // st25: st1's session replay → per-user session-start lead gaps
    // → 1-row cadence fold (quantile_cont on exact µs, a8's law)
    "st25_return_cadence" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM x)),
        |z AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM y),
        |s AS (SELECT user_id, session_seq, min(ts_us) AS start_us
        |      FROM z GROUP BY user_id, session_seq),
        |g AS (
        | SELECT user_id,
        |  lead(start_us) OVER (PARTITION BY user_id ORDER BY session_seq) - start_us
        |   AS gap_us
        | FROM s)
        |SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_returning_users,
        | count(*) AS n_gaps,
        | round(quantile_cont(gap_us, 0.5) / 3600000000.0, 4) AS p50_cadence_h,
        | round(quantile_cont(gap_us, 0.9) / 3600000000.0, 4) AS p90_cadence_h
        |FROM g WHERE gap_us IS NOT NULL""".stripMargin,
  )
}
