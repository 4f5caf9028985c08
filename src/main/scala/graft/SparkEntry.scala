package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ClusterStage, Dedup, Forecast, IntervalJoin, JsonOps, LinkAnalysis, Multimodal, Relational, Retrieval, Sampling, Sessionize, Similarity, StatsStage, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the north-star
  * LLM-data-pipeline extensions) gets a `queries` entry; each SQL-expressible
  * one gets a DuckDB `oracleSql` twin with IDENTICAL column names and
  * cross-engine-exact numerics (integer cents, int/int division, floor-based
  * truncation — see operators/Relational.scala Scaladoc).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.weeklyFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— reference parity (SURVEY §2) ——
    "q01_pruned_scan"     -> ((s, d) => Relational.prunedScan(s, d)),
    "q02_grouped_agg"     -> ((s, d) => Relational.groupedAgg(s, d)),
    "q03_topk"            -> ((s, d) => Relational.topK(s, d)),
    "q04_join_broadcast"  -> ((s, d) => Relational.joinBroadcast(s, d)),
    "q05_join_inner_agg"  -> ((s, d) => Relational.joinInnerAgg(s, d)),
    "q06_join_semi"       -> ((s, d) => Relational.joinSemi(s, d)),
    "q07_join_anti"       -> ((s, d) => Relational.joinAnti(s, d)),
    "q08_dedup_keys"      -> ((s, d) => Relational.dedupKeys(s, d)),
    "q09_distinct_rows"   -> ((s, d) => Relational.distinctRows(s, d)),
    "q10_weekly_features" -> ((s, d) => Relational.weeklyFeatures(s, d)),
    "q11_silver_like"     -> ((s, d) => Relational.silverLike(s, d)),
    "q12_date_functions"  -> ((s, d) => Relational.dateFunctions(s, d)),
    "q13_case_cast"       -> ((s, d) => Relational.caseCast(s, d)),
    "q14_union_distinct"  -> ((s, d) => Relational.unionDistinct(s, d)),
    "q15_quality_checks"  -> ((s, d) => Relational.qualityChecks(s, d)),
    "q16_ungrouped_agg"   -> ((s, d) => Relational.ungroupedAgg(s, d)),
    // —— LLM-data-pipeline extensions (north star) ——
    "x01_dedup_exact"     -> ((s, d) => Dedup.exact(s, d)),
    "x02_ngram_jaccard"   -> ((s, d) => Dedup.ngramJaccard(s, d, n = 5, threshold = 0.3)),
    "x03_minhash_lsh"     -> ((s, d) => Dedup.minhashLsh(s, d, threshold = 0.3)),
    "x04_simhash_pairs"   -> ((s, d) => Dedup.simhashPairs(s, d)),
    "x05_text_stats"      -> ((s, d) => TextAnalysis.stats(s, d)),
    "x06_lang_id"         -> ((s, d) => TextAnalysis.languageId(s, d)),
    "x07_token_counts"    -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "x08_fingerprints"    -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "x09_cosine_topk"     -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "x10_ann_lsh"         -> ((s, d) => Similarity.lshTopK(s, d)),
    "x11_sessionize"      -> ((s, d) => Sessionize.sessions(s, d)),
    "x12_hourly_windows"  -> ((s, d) => Sessionize.hourlyWindows(s, d)),
    "x13_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "x14_json_extract"    -> ((s, d) => JsonOps.extractAndAggregate(s, d)),
    "x15_multimodal"      -> ((s, d) => Multimodal.featuresByModality(s, d)),
    "x16_winnowing_fp"    -> ((s, d) => TextAnalysis.winnowingFingerprints(s, d)),
    "x17_dedup_clusters"  -> ((s, d) => ClusterStage.clusters(s, d)),
    "x18_ann_ivf"         -> ((s, d) => Similarity.ivfTopK(s, d)),
    "x19_sliding_windows" -> ((s, d) => Sessionize.slidingWindows(s, d)),
    "x20_session_window"  -> ((s, d) => Sessionize.sessionWindows(s, d)),
    "x21_vocabulary"      -> ((s, d) => TextAnalysis.vocabularyStats(s, d)),
    "x22_tfidf_keywords"  -> ((s, d) => TextAnalysis.tfidfKeywords(s, d)),
    "x23_pii_scrub"       -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "x24_asof_join"       -> ((s, d) => Relational.asofJoin(s, d)),
    "x25_pivot"           -> ((s, d) => Relational.pivotCounts(s, d)),
    "x26_rollup"          -> ((s, d) => Relational.rollupRevenue(s, d)),
    "x27_train_test_split" -> ((s, d) => Sampling.trainTestSplit(s, d)),
    "x28_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "x29_length_quantiles" -> ((s, d) => Sampling.lengthQuantiles(s, d)),
    "x30_repetition_ratio" -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    "x31_decontamination"  -> ((s, d) => Dedup.contaminationPairs(s, d)),
    "x32_interval_join"    -> ((s, d) => IntervalJoin.purchasesInClickSurges(s, d)),
    "x33_frame_sample"     -> ((s, d) => Multimodal.frameSampleStats(s, d)),
    "x34_distinct_sketch"  -> ((s, d) => TextAnalysis.distinctTokenSketch(s, d)),
    "x35_assembly_funnel"  -> ((s, d) => Sampling.assemblyFunnel(s, d)),
    "x36_sampled_quantiles" -> ((s, d) => Sampling.sampledQuantiles(s, d)),
    "x37_sequence_packing"  -> ((s, d) => Sampling.packSequences(s, d)),
    "x38_cluster_debiased"  -> ((s, d) => Sampling.clusterDebiasedSample(s, d)),
    "x39_paragraph_dedup"   -> ((s, d) => Dedup.paragraphDedup(s, d)),
    "x40_quality_features"  -> ((s, d) => TextAnalysis.qualityFeatures(s, d)),
    "x41_countmin_hitters"  -> ((s, d) => TextAnalysis.countMinHeavyHitters(s, d)),
    "x42_rare_token_ratio"  -> ((s, d) => TextAnalysis.rareTokenStats(s, d)),
    "x43_bloom_decontam"    -> ((s, d) => Dedup.bloomDecontamination(s, d)),
    "x44_incremental_dedup" -> ((s, d) => Dedup.incrementalParagraphDedup(s, d)),
    "x45_chunk_documents"   -> ((s, d) => TextAnalysis.chunkDocuments(s, d)),
    "x46_source_cap"        -> ((s, d) => Sampling.sourceCapSample(s, d)),
    "x47_decontaminated"    -> ((s, d) => Dedup.decontaminate(s, d)),
    "x48_mixture_sample"    -> ((s, d) => Sampling.mixtureSample(s, d)),
    "x49_bigram_familiarity" -> ((s, d) => TextAnalysis.bigramFamiliarity(s, d)),
    "x50_length_trim"       -> ((s, d) => Sampling.lengthTailTrim(s, d)),
    "x51_inverted_index"    -> ((s, d) => TextAnalysis.invertedIndex(s, d)),
    "x52_label_centroids"   -> ((s, d) => Similarity.labelCentroids(s, d)),
    "x53_source_overlap"    -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "x54_domain_score"      -> ((s, d) => TextAnalysis.domainScore(s, d)),
    "x55_lexical_diversity" -> ((s, d) => TextAnalysis.lexicalDiversity(s, d)),
    "x56_score_deciles"     -> ((s, d) => TextAnalysis.scoreDeciles(s, d)),
    "x57_neardedup_corpus"  -> ((s, d) => Dedup.nearDedupedCorpus(s, d)),
    "x58_split_leakage"     -> ((s, d) => Dedup.splitLeakage(s, d)),
    "x59_bpe_pair_counts"   -> ((s, d) => TextAnalysis.bpePairCounts(s, d)),
    "x60_random_projection" -> ((s, d) => Similarity.randomProjection(s, d)),
    "x61_token_budget"      -> ((s, d) => Sampling.tokenBudget(s, d)),
    "x62_substring_decontam" -> ((s, d) => Dedup.exactSubstringContamination(s, d)),
    "x63_bpe_token_budget"  -> ((s, d) => Sampling.bpeTokenBudget(s, d)),
    "x64_substring_decontaminated" -> ((s, d) => Dedup.substringDecontaminate(s, d)),
    "x65_token_drift"       -> ((s, d) => TextAnalysis.tokenDrift(s, d)),
    "x66_repetition_metrics" -> ((s, d) => TextAnalysis.repetitionMetrics(s, d)),
    "x67_repetition_filter" -> ((s, d) => TextAnalysis.repetitionFilter(s, d)),
    "x68_crossdoc_substrings" -> ((s, d) => Dedup.crossDocSubstringPairs(s, d)),
    "x69_ship_corpus"       -> ((s, d) => Sampling.shipCorpus(s, d)),
    "x70_best_keep"         -> ((s, d) => Dedup.bestKeepCorpus(s, d)),
    "x71_shard_read_audit"  -> ((s, d) => Sampling.shardReadAudit(s, d)),
    "x72_crossdoc_deduped"  -> ((s, d) => Dedup.crossDocSubstringDedup(s, d)),
    "x73_bm25_topk"         -> ((s, d) => Retrieval.bm25TopK(s, d)),
    "x74_epoch_shuffle"     -> ((s, d) => Sampling.epochShuffle(s, d)),
    "x75_upsample_mixture"  -> ((s, d) => Sampling.upsampleMixture(s, d)),
    "x76_bpe_chunks"        -> ((s, d) => TextAnalysis.bpeChunkDocuments(s, d)),
    "x77_pagerank"          -> ((s, d) => LinkAnalysis.pageRank(s, d)),
    "x78_semantic_deduped"  -> ((s, d) => Dedup.semanticDeduped(s, d)),
    "x79_hard_negatives"    -> ((s, d) => Similarity.hardNegativesTopK(s, d)),
    "x80_curriculum"        -> ((s, d) => Sampling.curriculumSchedule(s, d)),
    "x81_shuffled_pack"     -> ((s, d) => Sampling.packShuffledSequences(s, d)),
    "x82_span_dedup"        -> ((s, d) => Dedup.spanDedupStats(s, d)),
    "x83_data_card"         -> ((s, d) => Sampling.dataCard(s, d)),
    "x84_length_batches"    -> ((s, d) => Sampling.lengthBatches(s, d)),
    "x85_event_transitions" -> ((s, d) => Sessionize.eventTransitions(s, d)),
    "x86_funnel"            -> ((s, d) => Sessionize.funnel(s, d)),
    "x87_error_spikes"      -> ((s, d) => Sessionize.errorSpikes(s, d)),
    "x88_retention"         -> ((s, d) => Sessionize.retentionCohorts(s, d)),
    "x89_quality_scores"    -> ((s, d) => TextAnalysis.qualityScorePinned(s, d)),
    "x90_dedup_rates"       -> ((s, d) => Dedup.dedupRates(s, d)),
    "x91_user_growth"       -> ((s, d) => Sessionize.userGrowth(s, d)),
    "x92_mirror_pairs"      -> ((s, d) => Dedup.sourceMirrorPairs(s, d)),
    "x93_embedding_audit"   -> ((s, d) => Similarity.embeddingAudit(s, d)),
    "x94_bigram_fluency"    -> ((s, d) => TextAnalysis.bigramFluency(s, d)),
    "x95_dsir_importance"   -> ((s, d) => Sampling.dsirImportance(s, d)),
    "x96_band_ingest"       -> ((s, d) => Dedup.incrementalBandIngest(s, d)),
    "x97_quality_cap"       -> ((s, d) => Sampling.qualityCapSample(s, d)),
    "x98_cluster_ingest"    -> ((s, d) => Dedup.incrementalClusterIngest(s, d)),
    "x99_hits"              -> ((s, d) => LinkAnalysis.hits(s, d)),
    "x100_dsir_resample"    -> ((s, d) => Sampling.dsirResample(s, d)),
    "x101_ewma_popularity"  -> ((s, d) => Sessionize.ewmaPopularity(s, d)),
    "x102_robust_spikes"    -> ((s, d) => Sessionize.robustSpikes(s, d)),
    "x103_pmi_bigrams"      -> ((s, d) => TextAnalysis.pmiBigrams(s, d)),
    "x104_preference_pairs" -> ((s, d) => Sampling.preferencePairs(s, d)),
    "x105_vocab_audit"      -> ((s, d) => TextAnalysis.sourceVocabAudit(s, d)),
    "x106_interarrival"     -> ((s, d) => Sessionize.interArrivalStats(s, d)),
    "x107_vocab_coverage"   -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    "x108_degree_hist"      -> ((s, d) => LinkAnalysis.degreeHistogram(s, d)),
    "x109_code_switch"      -> ((s, d) => TextAnalysis.codeSwitch(s, d)),
    "x110_market_hhi"       -> ((s, d) => Relational.marketHhi(s, d)),
    "x111_assoc_rules"      -> ((s, d) => Sessionize.associationRules(s, d)),
    "x112_last_touch"       -> ((s, d) => Sessionize.lastTouchAttribution(s, d)),
    "x113_fertility"        -> ((s, d) => TextAnalysis.tokenizerFertility(s, d)),
    "x114_copy_directions"  -> ((s, d) => Dedup.copyDirections(s, d)),
    "x115_weighted_sample"  -> ((s, d) => Sampling.weightedSample(s, d)),
    "x116_triangles"        -> ((s, d) => LinkAnalysis.triangles(s, d)),
    "x117_seasonal_wape"    -> ((s, d) => Forecast.seasonalBacktest(s, d)),
    "x118_dow_profile"      -> ((s, d) => Forecast.dowProfile(s, d)),
    "x119_discount_slope"   -> ((s, d) => Forecast.discountSlope(s, d)),
    "x120_rfm_segments"     -> ((s, d) => Relational.rfmSegments(s, d)),
    "x121_session_paths"    -> ((s, d) => Sessionize.sessionPaths(s, d)),
    "x122_kcore"            -> ((s, d) => LinkAnalysis.kcore(s, d)),
    "x123_ab_conversion"    -> ((s, d) => Sessionize.abConversion(s, d)),
    "x124_gap_fill"         -> ((s, d) => Forecast.gapFill(s, d)),
    "x125_novelty_curve"    -> ((s, d) => Dedup.noveltyCurve(s, d)),
    "x126_cube_revenue"     -> ((s, d) => Relational.cubeRevenue(s, d)),
    "x127_unpivot"          -> ((s, d) => Relational.unpivotMeasures(s, d)),
    "x128_fuzzy_names"      -> ((s, d) => Dedup.fuzzyNamePairs(s, d)),
    "x129_quality_drift"    -> ((s, d) => TextAnalysis.qualityDrift(s, d)),
    "x130_lsh_precision"    -> ((s, d) => Dedup.lshPrecision(s, d)),
    "x131_lead_times"       -> ((s, d) => Relational.leadTimes(s, d)),
    "x132_loyalty_tiers"    -> ((s, d) => Relational.loyaltyTransitions(s, d)),
    "x133_sketch_audit"     -> ((s, d) => TextAnalysis.sketchAccuracy(s, d)),
    "x134_pareto_parts"     -> ((s, d) => Relational.paretoParts(s, d)),
    "x135_mean_shift"       -> ((s, d) => Forecast.meanShiftSplit(s, d)),
    "x136_purchase_streaks" -> ((s, d) => Relational.purchaseStreaks(s, d)),
    "x137_rrf_consensus"    -> ((s, d) => TextAnalysis.rrfConsensus(s, d)),
    "x138_tier_intervals"   -> ((s, d) => Relational.tierIntervals(s, d)),
    "x139_integrity_audit"  -> ((s, d) => Relational.integrityAudit(s, d)),
    "x140_profile_orders"   -> ((s, d) => Relational.profileOrders(s, d)),
    "x141_brand_top_parts"  -> ((s, d) => Relational.brandTopParts(s, d)),
    "x142_value_histogram"  -> ((s, d) => Relational.orderValueHistogram(s, d)),
    "x143_reconcile_orders" -> ((s, d) => Relational.reconcileOrders(s, d)),
    "x144_cdc_merge"        -> ((s, d) => Relational.cdcMergeDocs(s, d)),
    "x145_cohort_ltv"       -> ((s, d) => Relational.cohortLtv(s, d)),
    "x146_containment"      -> ((s, d) => Dedup.containmentPairs(s, d)),
    "x147_active_users"     -> ((s, d) => Sessionize.activeUsers(s, d)),
    "x148_benford_audit"    -> ((s, d) => Relational.benfordAudit(s, d)),
    "x149_key_skew"         -> ((s, d) => Relational.keySkewAudit(s, d)),
    "x150_life_table"       -> ((s, d) => Forecast.lifeTable(s, d)),
    "x151_bfs_hops"         -> ((s, d) => LinkAnalysis.bfsHops(s, d)),
    "x152_corr_moments"     -> ((s, d) => Forecast.corrMoments(s, d)),
    "x153_assoc_rules"      -> ((s, d) => LinkAnalysis.assocRules(s, d)),
    "x154_reorder_rate"     -> ((s, d) => Relational.reorderRate(s, d)),
    "x155_spend_deciles"    -> ((s, d) => Relational.spendDeciles(s, d)),
    "x156_spend_gini"       -> ((s, d) => Relational.spendGini(s, d)),
    "x157_apportionment"    -> ((s, d) => Sampling.budgetApportionment(s, d)),
    "x158_rendezvous"       -> ((s, d) => Sampling.rendezvousReshard(s, d)),
    "x159_length_drift_ks"  -> ((s, d) => TextAnalysis.lengthDriftKs(s, d)),
    "x160_contingency"      -> ((s, d) => TextAnalysis.langSourceContingency(s, d)),
    "x161_rank_test"        -> ((s, d) => TextAnalysis.qualityRankTest(s, d)),
    "x162_acf_panel"        -> ((s, d) => Forecast.acfMoments(s, d)),
    "x163_tf_cosine"        -> ((s, d) => Dedup.tfCosinePairs(s, d)),
    "x164_label_prop"       -> ((s, d) => LinkAnalysis.labelPropagation(s, d)),
    "x165_conversion_lag"   -> ((s, d) => Sessionize.conversionLatency(s, d)),
    "x166_markov_eval"      -> ((s, d) => Sessionize.markovEval(s, d)),
    "x167_zipf_audit"       -> ((s, d) => TextAnalysis.zipfAudit(s, d)),
    "x168_heaps_curve"      -> ((s, d) => TextAnalysis.heapsCurve(s, d)),
    "x169_region_revenue"   -> ((s, d) => Relational.regionSegmentRevenue(s, d)),
    "x170_price_realization" -> ((s, d) => Relational.priceRealization(s, d)),
    "x171_common_neighbors" -> ((s, d) => LinkAnalysis.commonNeighbors(s, d)),
    "x172_clustering_coeff" -> ((s, d) => LinkAnalysis.clusteringCoefficients(s, d)),
    "x173_assortativity"    -> ((s, d) => LinkAnalysis.degreeAssortativity(s, d)),
    "x174_term_affinity"    -> ((s, d) => TextAnalysis.sourceTermAffinity(s, d)),
    "x175_quantized_recall" -> ((s, d) => Similarity.quantizedRecall(s, d)),
    "x176_kendall_tau"      -> ((s, d) => Forecast.kendallTau(s, d)),
    "x177_link_scores"      -> ((s, d) => LinkAnalysis.linkScores(s, d)),
    "x178_mutual_knn"       -> ((s, d) => Similarity.mutualTopK(s, d)),
    "x179_simhash_precision" -> ((s, d) => Dedup.simhashPrecision(s, d)),
    "x180_weighted_pagerank" -> ((s, d) => LinkAnalysis.weightedPageRank(s, d)),
    "x181_er_clusters"      -> ((s, d) => Dedup.erClusters(s, d)),
    "x182_chunk_dedup"      -> ((s, d) => Multimodal.chunkDedupStats(s, d)),
    "x183_sorted_neighborhood" -> ((s, d) => Dedup.sortedNeighborhoodPairs(s, d)),
    "x184_blocking_audit"   -> ((s, d) => Dedup.blockingAudit(s, d)),
    "x185_waterfill_mixture" -> ((s, d) => Sampling.waterfillMixture(s, d)),
    "x186_dow_anomalies"    -> ((s, d) => Forecast.dowAnomalies(s, d)),
    "x187_quant_error"      -> ((s, d) => Similarity.quantizationError(s, d)),
    "x188_decay_attribution" -> ((s, d) => Sessionize.decayAttribution(s, d)),
    "x189_loo_encoding"     -> ((s, d) => Relational.looTargetEncoding(s, d)),
    "x190_grouped_folds"    -> ((s, d) => Sampling.groupedFolds(s, d)),
    "x191_knn_homophily"    -> ((s, d) => Similarity.knnHomophily(s, d)),
    "x192_knn_hubness"      -> ((s, d) => Similarity.knnHubness(s, d)),
    "x193_hll_audit"        -> ((s, d) => Relational.hllDistinctAudit(s, d)),
    "x194_boilerplate"      -> ((s, d) => TextAnalysis.boilerplateGrams(s, d)),
    "x195_theil_sen"        -> ((s, d) => Forecast.theilSenSlopes(s, d)),
    "x196_bootstrap_ci"     -> ((s, d) => Forecast.bootstrapCi(s, d)),
    "x197_winsor_spend"     -> ((s, d) => Relational.winsorizedSpend(s, d)),
    "x198_knn_truss"        -> ((s, d) => LinkAnalysis.knnTruss(s, d)),
    "x199_event_hll"        -> ((s, d) => Sessionize.eventHllAudit(s, d)),
    "x200_good_turing"      -> ((s, d) => TextAnalysis.goodTuringGrams(s, d)),
    "x201_prefix_jaccard"   -> ((s, d) => Dedup.prefixJaccardPairs(s, d)),
    "x202_lsh_recall_curve" -> ((s, d) => Similarity.lshRecallCurve(s, d)),
    "x203_knn_ingest"       -> ((s, d) => Similarity.knnIngest(s, d)),
    "x204_conformal"        -> ((s, d) => Forecast.conformalIntervals(s, d)),
    "x205_byte_simhash"     -> ((s, d) => Multimodal.byteSimhashPairs(s, d)),
    "x206_ivm_revenue"      -> ((s, d) => Relational.ivmNationRevenue(s, d)),
    "x207_power_iteration"  -> ((s, d) => Similarity.powerIteration(s, d)),
    "x208_range_bounds"     -> ((s, d) => Relational.rangeBoundaries(s, d)),
    "x209_zorder_tiles"     -> ((s, d) => Relational.zorderTiles(s, d)),
    "x210_grouping_sets"    -> ((s, d) => Relational.groupingSetsPanel(s, d)),
    "x211_lateness_hist"    -> ((s, d) => Sessionize.latenessHistogram(s, d)),
    "x212_watermark_drops"  -> ((s, d) => Sessionize.watermarkDrops(s, d)),
    "x213_dedup_sweep"      -> ((s, d) => Multimodal.dedupSweep(s, d)),
    "x214_reach_panel"      -> ((s, d) => LinkAnalysis.reachabilityPanel(s, d)),
    "x215_forecast_duel"    -> ((s, d) => Forecast.forecastDuel(s, d)),
    "x216_corpus_alignment" -> ((s, d) => Relational.corpusAlignment(s, d)),
    "x217_label_terms"      -> ((s, d) => TextAnalysis.labelTermLift(s, d)),
    "x218_ring_churn"       -> ((s, d) => Sampling.ringChurn(s, d)),
    "x219_dupe_quality"     -> ((s, d) => TextAnalysis.dupeQuality(s, d)),
    "x220_table_checksums"  -> ((s, d) => Relational.tableChecksums(s, d)),
    "x221_ann_swap"         -> ((s, d) => Similarity.annSwapFidelity(s, d)),
    "x222_zone_map"         -> ((s, d) => Relational.zoneMapSkipping(s, d)),
    "x223_join_cardest"     -> ((s, d) => Relational.joinCardinalityAudit(s, d)),
    "x224_centroid_drift"   -> ((s, d) => Similarity.centroidDrift(s, d)),
    "x225_retrieval_eval"   -> ((s, d) => Similarity.retrievalEval(s, d)),
    "x226_peak_concurrency" -> ((s, d) => Sessionize.peakConcurrency(s, d)),
    "x227_quantile_sketch"  -> ((s, d) => Relational.quantileSketchAudit(s, d)),
    "x228_browse_runs"      -> ((s, d) => Sessionize.browseRunCensus(s, d)),
    "x229_stock_ledger"     -> ((s, d) => Relational.stockLedger(s, d)),
    "x230_importance_ess"   -> ((s, d) => Sampling.importanceEss(s, d)),
    "x231_zorder_delta"     -> ((s, d) => Relational.zorderSkippingDelta(s, d)),
    "x232_recall_curve_sampled" -> ((s, d) => Similarity.lshRecallCurve(s, d,
      querySampleBps = Some(Similarity.AuditSampleBps))),
    "x233_ann_swap_sampled" -> ((s, d) => Similarity.annSwapFidelity(s, d,
      querySampleBps = Some(Similarity.AuditSampleBps))),
    "x234_retrieval_eval_sampled" -> ((s, d) => Similarity.retrievalEval(s, d,
      querySampleBps = Some(Similarity.AuditSampleBps))),
    "x235_footer_zone_map"  -> ((s, d) => Relational.zoneMapSkippingFromFooters(s, d)),
    "x236_footer_zorder_delta" -> ((s, d) => Relational.zorderSkippingDeltaFromFooters(s, d)),
    "x237_priority_sample"  -> ((s, d) => Sampling.prioritySample(s, d)),
    "x238_matryoshka_recall" -> ((s, d) => Similarity.matryoshkaRecall(s, d)),
    "x239_hybrid_related"   -> ((s, d) => Retrieval.hybridRelated(s, d)),
    "x240_compaction_plan"  -> ((s, d) => Relational.compactionPlan(s, d)),
    "x241_retrieval_eval_ann" -> ((s, d) => Similarity.retrievalEval(s, d,
      rankedTable = (s2, d2, k) => operators.AnnStage.ranked(s2, d2, k))),
    "x242_temperature_mixture" -> ((s, d) => Sampling.temperatureMixture(s, d)),
    "x243_compacted_stats"  -> ((s, d) => StatsStage.compactedStatsPanel(s, d)),
    "x244_upsert_orders"    -> ((s, d) => graft.pipeline.Maintenance.upsertAudit(s, d)),
    "x245_cdc_apply"        -> ((s, d) => Relational.cdcApply(s, d)),
    "x246_equidepth_hist"   -> ((s, d) => StatsStage.equiDepthHistogram(s, d)),
    "x247_epoch_schedule"   -> ((s, d) => Sampling.epochSchedule(s, d)),
    "x248_k_anonymity"      -> ((s, d) => Relational.kAnonymityAudit(s, d)),
    "x249_bucketed_join"    -> ((s, d) => operators.BucketedStage.bucketedJoin(s, d)),
    "x250_bucket_lookup"    -> ((s, d) => operators.BucketedStage.bucketLookup(s, d)),
    "x251_selectivity"      -> ((s, d) => StatsStage.selectivityAudit(s, d)),
    "x252_schema_evolution" -> ((s, d) => operators.SchemaStage.schemaEvolutionRead(s, d)),
    "x253_pit_tier_join"    -> ((s, d) => Relational.pitTierJoin(s, d)),
    "x254_salted_join"      -> ((s, d) => operators.SkewJoin.saltedJoinAudit(s, d)),
    "x255_edit_distance"    -> ((s, d) => Dedup.editDistanceDedup(s, d)),
    "x256_quality_sweep"    -> ((s, d) => TextAnalysis.qualityRetentionSweep(s, d)),
    "x257_containment"      -> ((s, d) => Dedup.containmentScores(s, d)),
    "x258_event_debounce"   -> ((s, d) => Sessionize.eventDebounce(s, d)),
    "x259_format_roundtrip" -> ((s, d) => operators.FormatStage.roundTrip(s, d)),
    "x260_rank_agreement"   -> ((s, d) => Retrieval.rankAgreement(s, d)),
    "x261_partition_pruned" -> ((s, d) => operators.PartitionedStage.prunedRead(s, d)),
    "x262_kneser_ney"       -> ((s, d) => TextAnalysis.kneserNeyBigrams(s, d)),
    "x263_embedding_coverage" -> ((s, d) => Similarity.embeddingCoverage(s, d)),
    "x264_kn_fluency"       -> ((s, d) => TextAnalysis.knFluency(s, d)),
    "x265_kn_trigram"       -> ((s, d) => TextAnalysis.kneserNeyTrigrams(s, d)),
    "x266_full_sync"        -> ((s, d) => graft.pipeline.Maintenance.fullSyncAudit(s, d)),
    "x267_retention_sweep"  -> ((s, d) => operators.PartitionedStage.retentionSweep(s, d)),
    "x268_global_ranking"   -> ((s, d) => operators.GlobalSort.rankedDocuments(s, d)),
    "x269_normalized_dedup" -> ((s, d) => Dedup.normalizedDedup(s, d)),
    "x270_filter_kappa"     -> ((s, d) => TextAnalysis.filterKappa(s, d)),
    "x271_coalesced_join"   -> ((s, d) => operators.BucketedStage.coalescedJoin(s, d)),
    "x272_pq_adc"           -> ((s, d) => operators.ProductQuant.pqAdcTopK(s, d)),
    "x273_pq_distortion"    -> ((s, d) => operators.ProductQuant.pqDistortion(s, d)),
    "x274_ivf_pq"           -> ((s, d) => operators.ProductQuant.ivfPqTopK(s, d)),
    "x275_time_travel"      -> ((s, d) => operators.StatsStage.timeTravelPanel(s, d)),
    "x276_pq_adc_agg"       -> ((s, d) => operators.ProductQuant.pqAdcTopKAgg(s, d)),
    "x277_bloom_skipping"   -> ((s, d) => Relational.bloomSkipping(s, d)),
    "x278_hilbert_delta"    -> ((s, d) => Relational.hilbertSkippingDelta(s, d)),
    "x279_pq_rerank"        -> ((s, d) => operators.ProductQuant.pqRerankTopK(s, d)),
    "x280_bloom_lookup"     -> ((s, d) => Relational.bloomServedLookup(s, d)),
    "x281_er_clusters_sampled" -> ((s, d) => Dedup.erClustersSampled(s, d)),
    "x282_matryoshka_sampled" -> ((s, d) => Similarity.matryoshkaRecall(s, d,
      querySampleBps = Some(Similarity.MatryoshkaSampleBps))),
    "x283_pq_prod_adc"      -> ((s, d) => operators.ProductQuant.pqProdAdcTopK(s, d)),
    "x284_ivf_pq_prod"      -> ((s, d) => operators.ProductQuant.ivfPqTopK(s, d,
      subspaces = operators.ProductQuant.PqProdSubspaces,
      subDim = operators.ProductQuant.PqProdSubDim,
      codes = operators.ProductQuant.PqProdCodes)),
    "x285_pq_adc_k256"      -> ((s, d) => operators.ProductQuant.pqProdAdcTopK(s, d,
      codes = operators.ProductQuant.PqFullCodes)),
    "x286_ivf_pq_k256"      -> ((s, d) => operators.ProductQuant.ivfPqTopK(s, d,
      subspaces = operators.ProductQuant.PqProdSubspaces,
      subDim = operators.ProductQuant.PqProdSubDim,
      codes = operators.ProductQuant.PqFullCodes)),
    "x287_source_duels"     -> ((s, d) => operators.Preference.sourceDuels(s, d)),
    "x288_bt_strengths"     -> ((s, d) => operators.Preference.btStrengths(s, d)),
    "x289_bt_concordance"   -> ((s, d) => operators.Preference.btWinrateConcordance(s, d)),
    "x290_lpa_communities"  -> ((s, d) => LinkAnalysis.lpaCommunities(s, d)),
    "x291_lpa_census"       -> ((s, d) => LinkAnalysis.lpaCommunityCensus(s, d)),
    "x292_semantic_lpa"     -> ((s, d) => LinkAnalysis.semanticLpa(s, d)),
    "x293_semantic_purity"  -> ((s, d) => LinkAnalysis.semanticLpaPurity(s, d)),
  )

  /** x17's recursive-CTE cluster computation (shingle → capped
    * set-similarity pairs → symmetric edges → transitive closure) —
    * shared verbatim by x57's oracle so corpus-level dedup can't diverge
    * from the cluster definition. */
  /** The recursive-CTE replica of `BpeEncode`'s greedy loop over the
    * distinct-word set, ending in `term(w, n_toks)` — shared by x63 and
    * x76 so budget counting and chunking can't diverge on tokenization.
    * Merge table interpolated from TextAnalysis.PinnedBpeMerges; every
    * pinned merge has left ≠ right, so the set-based simultaneous rewrite
    * equals the kernel's left-to-right pass (asserted in spec). */
  /** x222's zone-map audit oracle — shared VERBATIM with x235 (the
    * footer-backed variant): the written layout buckets rows by the same
    * deterministic rule, so the real footer statistics must reproduce
    * the modeled skip grid exactly. */
  private def zoneMapOracleSql: String = {
    import operators.Relational.{ZoneFiles, ZonePredicates}
    s"""WITH rows_ AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
      |b AS (SELECT min(k) AS min_k, max(k) AS max_k,
      |             min(c) AS min_c, max(c) AS max_c FROM rows_),
      |tagged AS (SELECT ((k - min_k) * $ZoneFiles) // (max_k - min_k + 1) AS f,
      |                  ((c - min_c) * $ZonePredicates) // (max_c - min_c + 1) AS p, c
      |           FROM rows_, b),
      |files AS (SELECT f, CAST(count(*) AS BIGINT) AS f_rows,
      |                 min(c) AS f_min, max(c) AS f_max FROM tagged GROUP BY 1),
      |preds AS (SELECT CAST(r.p AS BIGINT) AS p,
      |                 min_c + (r.p * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates AS lo,
      |                 min_c + ((r.p + 1) * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates - 1 AS hi
      |          FROM (SELECT unnest(range($ZonePredicates)) AS p) r, b),
      |grid AS (SELECT p, lo, hi, CAST(count(*) AS BIGINT) AS n_files,
      |                CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
      |                CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0 ELSE f_rows END) AS BIGINT) AS rows_scanned
      |         FROM preds, files GROUP BY 1, 2, 3),
      |m AS (SELECT p, CAST(count(*) AS BIGINT) AS n_matching FROM tagged GROUP BY 1)
      |SELECT g.p, g.lo, g.hi, g.n_files, g.n_skipped, g.rows_scanned,
      |       coalesce(m.n_matching, 0) AS n_matching
      |FROM grid g LEFT JOIN m ON g.p = m.p""".stripMargin
  }

  /** The md5 query-sample CTE of the sampled fidelity audits
    * (x232/x233/x234, and x282 at its own dial) — x27's bucket rule,
    * salt "qsample", over the signature CTE `s`. */
  private def qsampleCteSql(
      bps: Int = operators.Similarity.AuditSampleBps): String =
    s"""sq AS (SELECT * FROM s
      |       WHERE ('0x' || substr(md5('qsample:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
      |             % 10000 < $bps),""".stripMargin

  /** x202's recall-curve oracle, shared with its sampled twin x232 —
    * ONE builder parameterized on the query-side CTE so the full and
    * sampled gates can never drift (the zoneMapOracleSql reasoning
    * applied to the fidelity family). */
  private def recallCurveOracleSql(sampled: Boolean): String = {
    import operators.Similarity.{LshCurveK, LshPlanes, LshProbeRadius}
    val (cte, q) = if (sampled) (qsampleCteSql() + "\n", "sq") else ("", "s")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm,
      |        ${operators.Similarity.hyperplaneSigSql("v", LshPlanes)} AS sig
      |      FROM e),
      |${cte}exact_scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id,
      |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |  FROM $q q JOIN s c ON q.vec_id <> c.vec_id),
      |exact_topk AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, vec_id) AS rank
      |    FROM exact_scored) t WHERE rank <= $LshCurveK),
      |cand AS (
      |  SELECT q.vec_id AS q_id, c.vec_id,
      |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim,
      |    bit_count(xor(c.sig, q.sig)) AS d
      |  FROM $q q JOIN s c ON q.vec_id <> c.vec_id
      |    AND bit_count(xor(c.sig, q.sig)) <= $LshProbeRadius),
      |fan AS (SELECT q_id, vec_id, cos_sim,
      |               unnest(range(d, ${LshProbeRadius + 1})) AS radius
      |        FROM cand),
      |ranked AS (SELECT q_id, vec_id, radius,
      |                  row_number() OVER (PARTITION BY q_id, radius
      |                    ORDER BY cos_sim DESC, vec_id) AS rk
      |           FROM fan),
      |hits AS (SELECT t.radius, CAST(count(*) AS BIGINT) AS n_hits
      |         FROM ranked t JOIN exact_topk x
      |           ON t.q_id = x.q_id AND t.vec_id = x.vec_id
      |         WHERE t.rk <= $LshCurveK GROUP BY 1),
      |cands AS (SELECT radius, CAST(count(*) AS BIGINT) AS n_candidates
      |          FROM fan GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM $q),
      |rr AS (SELECT unnest(range(0, ${LshProbeRadius + 1})) AS radius)
      |SELECT rr.radius, t.n_queries,
      |       coalesce(c.n_candidates, 0) AS n_candidates,
      |       coalesce(h.n_hits, 0) AS n_hits,
      |       (1000000 * coalesce(h.n_hits, 0)) // ($LshCurveK * t.n_queries)
      |         AS recall_ppm,
      |       coalesce(c.n_candidates, 0) // t.n_queries AS avg_candidates
      |FROM rr LEFT JOIN cands c ON rr.radius = c.radius
      |LEFT JOIN hits h ON rr.radius = h.radius CROSS JOIN tot t""".stripMargin
  }

  /** x221's swap-fidelity oracle, shared with its sampled twin x233. */
  private def annSwapOracleSql(sampled: Boolean): String = {
    import operators.AnnStage.AnnRadius
    import operators.KnnStage.StageK
    import operators.Similarity.LshPlanes
    val (cte, q) = if (sampled) (qsampleCteSql() + "\n", "sq") else ("", "s")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm,
      |        ${operators.Similarity.hyperplaneSigSql("v", LshPlanes)} AS sig
      |      FROM e),
      |${cte}exact_rk AS (
      |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, vec_id) AS rank_exact
      |  FROM (SELECT q.vec_id AS q_id, c.vec_id,
      |          floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |        FROM $q q JOIN s c ON q.vec_id <> c.vec_id) t),
      |exact_topk AS (SELECT * FROM exact_rk WHERE rank_exact <= $StageK),
      |ann_rk AS (
      |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, vec_id) AS rank_ann
      |  FROM (SELECT q.vec_id AS q_id, c.vec_id,
      |          floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |        FROM s q JOIN s c ON q.vec_id <> c.vec_id
      |          AND bit_count(xor(c.sig, q.sig)) <= $AnnRadius) t),
      |ann_topk AS (SELECT * FROM ann_rk WHERE rank_ann <= $StageK)
      |SELECT CAST(x.rank_exact AS INTEGER) AS rank_exact,
      |       CAST(count(*) AS BIGINT) AS n_exact,
      |       CAST(count(a.rank_ann) AS BIGINT) AS n_found,
      |       CAST((1000000 * count(a.rank_ann)) // count(*) AS BIGINT) AS recall_ppm,
      |       CAST(coalesce(sum(a.rank_ann - x.rank_exact), 0) AS BIGINT) AS displacement_sum
      |FROM exact_topk x LEFT JOIN ann_topk a
      |  ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      |GROUP BY x.rank_exact""".stripMargin
  }

  /** x225's retrieval-eval oracle, shared with its sampled twin x234
    * and its ANN-served twin x241 (`annRadius` restricts the candidate
    * set to the radius-R Hamming ball — AnnStage's exact SQL replica,
    * so the task-level metric degradation of the swap is itself
    * oracle-checked). */
  private def retrievalEvalOracleSql(sampled: Boolean,
                                     annRadius: Option[Int] = None): String = {
    import operators.KnnStage.StageK
    import operators.Similarity.{EvalKs, LshPlanes}
    val (cte, q) = if (sampled) (qsampleCteSql() + "\n", "sq") else ("", "s")
    val sigCol = if (annRadius.isDefined)
      s",\n        ${operators.Similarity.hyperplaneSigSql("v", LshPlanes)} AS sig"
    else ""
    val ballPred = annRadius
      .map(r => s"\n          AND bit_count(xor(c.sig, q.sig)) <= $r").getOrElse("")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm$sigCol
      |      FROM e),
      |${cte}rk AS (
      |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, vec_id) AS rank
      |  FROM (SELECT q.vec_id AS q_id, c.vec_id,
      |          floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |        FROM $q q JOIN s c ON q.vec_id <> c.vec_id$ballPred) t),
      |topk AS (SELECT * FROM rk WHERE rank <= $StageK),
      |lab AS (SELECT vec_id AS id, label FROM embeddings),
      |fh AS (SELECT t.q_id, ql.label AS q_label,
      |              min(CASE WHEN nl.label = ql.label THEN t.rank END) AS first_hit
      |       FROM topk t JOIN lab ql ON t.q_id = ql.id
      |                   JOIN lab nl ON t.vec_id = nl.id
      |       GROUP BY 1, 2)
      |SELECT q_label, CAST(count(*) AS BIGINT) AS n_queries,
      |       CAST(sum(CASE WHEN first_hit <= ${EvalKs(0)} THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
      |       CAST(sum(CASE WHEN first_hit <= ${EvalKs(1)} THEN 1 ELSE 0 END) AS BIGINT) AS n_hit3,
      |       CAST(sum(CASE WHEN first_hit <= ${EvalKs(2)} THEN 1 ELSE 0 END) AS BIGINT) AS n_hit5,
      |       CAST(sum(coalesce(1000000 // first_hit, 0)) AS BIGINT) AS rr_ppm_sum
      |FROM fh GROUP BY 1""".stripMargin
  }

  /** x181's ER-cluster oracle, shared with its sampled-universe twin
    * x281 (the r16 skip-list closure) — ONE builder parameterized on
    * the part universe. The sampled universe CTE is MATERIALIZED: the
    * recursive closure references it three times (pairs, seed,
    * implicit singleton restore), and the md5 filter must evaluate
    * once, not per reference. */
  private def erClustersOracleSql(sampled: Boolean): String = {
    import operators.Dedup.{ErSampleBps, FuzzyMaxDistance}
    val universe =
      if (sampled)
        s"""u AS MATERIALIZED (
           |  SELECT * FROM part
           |  WHERE ('0x' || substr(md5('psample:' || CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT
           |        % 10000 < $ErSampleBps),
           |""".stripMargin
      else "u AS (SELECT * FROM part),\n"
    s"""WITH RECURSIVE $universe
      |pairs AS (
      |  SELECT a.p_partkey AS ka, b.p_partkey AS kb
      |  FROM u a JOIN u b
      |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDistance),
      |edges AS (SELECT ka AS src, kb AS dst FROM pairs
      |          UNION ALL SELECT kb, ka FROM pairs),
      |reach(node, label) AS (
      |  SELECT p_partkey, p_partkey FROM u
      |  UNION
      |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
      |canon AS (SELECT node AS p_partkey, MIN(label) AS canonical_key
      |          FROM reach GROUP BY 1),
      |sz AS (SELECT canonical_key, CAST(count(*) AS BIGINT) AS cluster_size
      |       FROM canon GROUP BY 1)
      |SELECT c.p_partkey, c.canonical_key, s.cluster_size,
      |       CAST(CASE WHEN c.p_partkey = c.canonical_key THEN 1 ELSE 0 END
      |            AS INTEGER) AS is_canonical
      |FROM canon c JOIN sz s USING (canonical_key)""".stripMargin
  }

  /** x238's per-dim truncation-recall oracle, shared with its sampled
    * twin x282 (the r16 skip-list closure) — ONE builder parameterized
    * on the query-side CTE, the recallCurveOracleSql reasoning. The
    * sampled twin runs at [[operators.Similarity.MatryoshkaSampleBps]]
    * (10%): x238's scored cross carries |MatryoshkaDims| prefix cosines
    * per pair, so the 40% audit dial would still blow the sf1 replay
    * budget. */
  private def matryoshkaOracleSql(sampled: Boolean): String = {
    import operators.Similarity.{LshCurveK, MatryoshkaDims, MatryoshkaSampleBps}
    val dimsList = MatryoshkaDims.mkString("[", ", ", "]")
    val (cte, q) =
      if (sampled) (qsampleCteSql(MatryoshkaSampleBps) + "\n", "sq")
      else ("", "s")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm
      |      FROM e),
      |${cte}exact_rk AS (
      |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY cos_sim DESC, vec_id) AS rank_exact
      |  FROM (SELECT q.vec_id AS q_id, c.vec_id,
      |          floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |        FROM $q q JOIN s c ON q.vec_id <> c.vec_id) t),
      |exact_topk AS (SELECT * FROM exact_rk WHERE rank_exact <= $LshCurveK),
      |dd AS (SELECT CAST(unnest($dimsList) AS BIGINT) AS d),
      |pre_rk AS (
      |  SELECT q_id, vec_id, d, row_number() OVER (PARTITION BY q_id, d
      |      ORDER BY cos_sim DESC, vec_id) AS rank_prefix
      |  FROM (SELECT q.vec_id AS q_id, c.vec_id, dd.d,
      |          floor(list_dot_product(q.v[1:dd.d], c.v[1:dd.d]) /
      |            (sqrt(list_aggregate(list_transform(q.v[1:dd.d], x -> x*x), 'sum')) *
      |             sqrt(list_aggregate(list_transform(c.v[1:dd.d], x -> x*x), 'sum')))
      |            * 1000000) / 1000000 AS cos_sim
      |        FROM $q q JOIN s c ON q.vec_id <> c.vec_id, dd) t),
      |pre_topk AS (SELECT * FROM pre_rk WHERE rank_prefix <= $LshCurveK)
      |SELECT dd.d, CAST(count(*) AS BIGINT) AS n_exact,
      |       CAST(count(p.rank_prefix) AS BIGINT) AS n_found,
      |       CAST((1000000 * count(p.rank_prefix)) // count(*) AS BIGINT) AS recall_ppm,
      |       CAST(coalesce(sum(p.rank_prefix - x.rank_exact), 0) AS BIGINT) AS displacement_sum
      |FROM exact_topk x CROSS JOIN dd
      |LEFT JOIN pre_topk p
      |  ON x.q_id = p.q_id AND x.vec_id = p.vec_id AND dd.d = p.d
      |GROUP BY dd.d""".stripMargin
  }

  /** x231's before/after-OPTIMIZE oracle — shared VERBATIM with x236
    * (the footer-backed variant), same reasoning as [[zoneMapOracleSql]]. */
  private def zorderDeltaOracleSql: String = {
    import operators.Relational.{ZoneFiles, ZonePredicates}
    val bits = 3
    val m = 1 << bits
    val interleave = (0 until bits).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
      .mkString(" + ")
    def scan(fileCol: String, out: String): String =
      s"""SELECT p.p, CAST(sum(CASE WHEN f.f_max < p.lo OR f.f_min > p.hi
         |       THEN 0 ELSE f.f_rows END) AS BIGINT) AS $out
         |FROM preds p, (SELECT $fileCol AS f, CAST(count(*) AS BIGINT) AS f_rows,
         |               min(c) AS f_min, max(c) AS f_max FROM tagged GROUP BY 1) f
         |GROUP BY 1""".stripMargin
    s"""WITH rows_ AS (SELECT o_orderkey AS k, o_custkey AS c,
      |                      CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
      |               FROM orders),
      |b AS (SELECT min(k) AS min_k, max(k) AS max_k, min(c) AS min_c,
      |             max(c) AS max_c, min(day) AS min_d, max(day) AS max_d FROM rows_),
      |t0 AS (SELECT ((k - min_k) * $ZoneFiles) // (max_k - min_k + 1) AS f_cur,
      |              ((c - min_c) * $m) // (max_c - min_c + 1) AS bx,
      |              ((day - min_d) * $m) // (max_d - min_d + 1) AS by,
      |              ((c - min_c) * $ZonePredicates) // (max_c - min_c + 1) AS p, c
      |       FROM rows_, b),
      |tagged AS (SELECT f_cur, $interleave AS f_z, p, c FROM t0),
      |preds AS (SELECT CAST(r.p AS BIGINT) AS p,
      |                 min_c + (r.p * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates AS lo,
      |                 min_c + ((r.p + 1) * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates - 1 AS hi
      |          FROM (SELECT unnest(range($ZonePredicates)) AS p) r, b),
      |sc AS (${scan("f_cur", "scanned_current")}),
      |sz AS (${scan("f_z", "scanned_zordered")}),
      |mm AS (SELECT p, CAST(count(*) AS BIGINT) AS n_matching FROM tagged GROUP BY 1)
      |SELECT sc.p, coalesce(mm.n_matching, 0) AS n_matching,
      |       sc.scanned_current, sz.scanned_zordered,
      |       sc.scanned_current - sz.scanned_zordered AS rows_saved
      |FROM sc JOIN sz ON sc.p = sz.p LEFT JOIN mm ON sc.p = mm.p""".stripMargin
  }

  /** Shared x277/x280 CTE prefix: value-tagged file rows, per-file Bloom
    * bitmaps (md5-60 positions, 63-bit words), the probe ladder, and the
    * per-(probe, file) admissions — interpolated from the SAME constants
    * `Relational.bloomProbeFrames` uses, and shared so the audit and the
    * served-lookup gate can't drift. */
  private def bloomCtesSql: String = {
    import operators.Relational.{ZoneFiles, BloomWords, BloomHashes, BloomProbes, BloomProbeStepDenom}
    val bits = BloomWords * 63
    s"""WITH rows_ AS (SELECT o_orderkey AS k, o_custkey AS c,
      |                      CAST(round(o_totalprice*100) AS BIGINT) AS cents
      |               FROM orders),
      |b AS (SELECT min(k) AS min_k, max(k) AS max_k,
      |             min(c) AS min_c, max(c) AS max_c FROM rows_),
      |tagged AS (SELECT ((k - min_k) * $ZoneFiles) // (max_k - min_k + 1) AS f, c, cents
      |           FROM rows_, b),
      |pos AS (SELECT DISTINCT f, c, i,
      |          ('0x' || substr(md5(c::VARCHAR || ':' || i::VARCHAR), 1, 15))::BIGINT % $bits AS p
      |        FROM tagged, (SELECT unnest(range(0, $BloomHashes)) AS i) hs),
      |words AS (SELECT f, p // 63 AS w,
      |            bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS word
      |          FROM pos GROUP BY 1, 2),
      |fl AS (SELECT DISTINCT f FROM tagged),
      |probes AS (SELECT pid, min_c + pid * ((max_c - min_c) // $BloomProbeStepDenom) AS key
      |           FROM (SELECT unnest(range(0, $BloomProbes)) AS pid) ps, b),
      |ppos AS (SELECT pid, key, i,
      |           ('0x' || substr(md5(key::VARCHAR || ':' || i::VARCHAR), 1, 15))::BIGINT % $bits AS p
      |         FROM probes, (SELECT unnest(range(0, $BloomHashes)) AS i) hs),
      |tests AS (SELECT pp.pid, pp.key, fl.f,
      |            CASE WHEN wo.word IS NOT NULL
      |                 AND (wo.word & (1::BIGINT << CAST(pp.p % 63 AS INT))) <> 0
      |                 THEN 1 ELSE 0 END AS bit_set
      |          FROM ppos pp CROSS JOIN fl
      |          LEFT JOIN words wo ON wo.f = fl.f AND wo.w = pp.p // 63),
      |hits AS (SELECT pid, key, f, CAST(min(bit_set) AS BIGINT) AS hit
      |         FROM tests GROUP BY 1, 2, 3)""".stripMargin
  }

  /** x278's oracle — x231's shape under 2-D rectangle predicates, with
    * the Hilbert side built from the SAME xy2d steps the engine unrolls
    * (`Relational.hilbertSteps`, `//` division token). */
  private def hilbertDeltaOracleSql: String = {
    import operators.Relational.RectPreds
    val bits = 3
    val m = 1 << bits
    val np = RectPreds
    val interleave = (0 until bits).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
      .mkString(" + ")
    val chain = operators.Relational.hilbertChainSql(
      "SELECT c, day, f_z, p, bx AS hx, by AS hy, CAST(0 AS BIGINT) AS hd FROM t1", m)
    def scan(fileCol: String, out: String): String =
      s"""SELECT p.p, CAST(sum(CASE WHEN f.c_max < p.lo_c OR f.c_min > p.hi_c
         |       OR f.d_max < p.lo_d OR f.d_min > p.hi_d
         |       THEN 0 ELSE f.f_rows END) AS BIGINT) AS $out
         |FROM preds p, (SELECT $fileCol AS f, CAST(count(*) AS BIGINT) AS f_rows,
         |               min(c) AS c_min, max(c) AS c_max,
         |               min(day) AS d_min, max(day) AS d_max
         |               FROM tagged GROUP BY 1) f
         |GROUP BY 1""".stripMargin
    s"""WITH rows_ AS (SELECT o_custkey AS c,
      |                      CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
      |               FROM orders),
      |b AS (SELECT min(c) AS min_c, max(c) AS max_c,
      |             min(day) AS min_d, max(day) AS max_d FROM rows_),
      |t0 AS (SELECT c, day,
      |              ((c - min_c) * $m) // (max_c - min_c + 1) AS bx,
      |              ((day - min_d) * $m) // (max_d - min_d + 1) AS by,
      |              (((c - min_c) * $np) // (max_c - min_c + 1)) * $np
      |                + ((day - min_d) * $np) // (max_d - min_d + 1) AS p
      |       FROM rows_, b),
      |t1 AS (SELECT *, $interleave AS f_z FROM t0),
      |tagged AS (SELECT c, day, p, f_z, hd AS f_h
      |           FROM ($chain)),
      |preds AS (SELECT CAST(r.p AS BIGINT) AS p,
      |            min_c + ((r.p // $np) * (max_c - min_c + 1) + ${np - 1}) // $np AS lo_c,
      |            min_c + ((r.p // $np + 1) * (max_c - min_c + 1) + ${np - 1}) // $np - 1 AS hi_c,
      |            min_d + ((r.p % $np) * (max_d - min_d + 1) + ${np - 1}) // $np AS lo_d,
      |            min_d + ((r.p % $np + 1) * (max_d - min_d + 1) + ${np - 1}) // $np - 1 AS hi_d
      |          FROM (SELECT unnest(range(${np * np})) AS p) r, b),
      |sz AS (${scan("f_z", "scanned_zordered")}),
      |sh AS (${scan("f_h", "scanned_hilbert")}),
      |mm AS (SELECT p, CAST(count(*) AS BIGINT) AS n_matching FROM tagged GROUP BY 1)
      |SELECT sz.p, coalesce(mm.n_matching, 0) AS n_matching,
      |       sz.scanned_zordered, sh.scanned_hilbert,
      |       sz.scanned_zordered - sh.scanned_hilbert AS rows_saved
      |FROM sz JOIN sh ON sz.p = sh.p LEFT JOIN mm ON sz.p = mm.p""".stripMargin
  }

  private def bpeTermCteSql: String = {
    val merges = operators.TextAnalysis.PinnedBpeMerges
    val aLit = merges.map(m => s"'${m._1}'").mkString("[", ",", "]")
    val bLit = merges.map(m => s"'${m._2}'").mkString("[", ",", "]")
    val nm = merges.length
    // lowest-rank applicable merge for a symbol list, NULL when none
    val br = s"list_min([r for r in range(1, $nm+1) " +
      s"if len([i for i in range(1, len(syms)) " +
      s"if syms[i] = c.A[r] AND syms[i+1] = c.B[r]]) > 0])"
    s"""WITH RECURSIVE
      |consts AS (SELECT $aLit AS A, $bLit AS B),
      |words AS (SELECT DISTINCT w
      |          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |          WHERE len(w) > 0),
      |enc AS (
      |  SELECT w, [substr(w, i, 1) for i in range(1, len(w)+1)] AS syms FROM words
      |  UNION ALL
      |  SELECT w,
      |    list_transform(
      |      [i for i in range(1, len(syms)+1)
      |         if NOT (i > 1 AND syms[i-1] = c.A[br] AND syms[i] = c.B[br])],
      |      i -> CASE WHEN i < len(syms) AND syms[i] = c.A[br] AND syms[i+1] = c.B[br]
      |                THEN syms[i] || syms[i+1] ELSE syms[i] END) AS syms
      |  FROM (SELECT w, syms, $br AS br FROM enc, consts c) t, consts c
      |  WHERE br IS NOT NULL),
      |term AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_toks
      |         FROM enc, consts c WHERE $br IS NULL)""".stripMargin
  }

  /** x40's feature CTEs, ending in `feat(doc_id, n_words, mean_word_len,
    * stopword_ratio, short_word_ratio, dup_ratio)` — shared by x89's
    * pinned-weight scorer so scoring can't diverge from the features. */
  private def qualityFeatureCtes: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
      |    length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS mean_word_len,
      |    len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','an','of','to','in','and','is','for','on')))
      |      / len(string_split(text, ' ')) AS stopword_ratio,
      |    len(list_filter(string_split(text, ' '), w -> length(w) = 1))
      |      / len(string_split(text, ' ')) AS short_word_ratio,
      |    CAST(greatest(len(string_split(text, ' ')) - 2, 0) AS INTEGER) AS tot,
      |    CAST(len(list_distinct([array_to_string(words[i:i+2], ' ')
      |                            for i in range(1, len(words) - 1)])) AS INTEGER) AS dis
      |  FROM (SELECT *, string_split(text, ' ') AS words FROM documents) t),
      |feat AS (
      |  SELECT doc_id, n_words, mean_word_len, stopword_ratio, short_word_ratio,
      |         CASE WHEN tot > 0 THEN (tot - dis) / tot ELSE 0.0 END AS dup_ratio
      |  FROM g)""".stripMargin

  /** x56's per-source score-calibration CTEs, ending in
    * `dec(doc_id, source, score_q, decile)` — shared by x80's curriculum
    * schedule so the ordering can't diverge from the calibration. */
  private def scoreDecileCtes: String = {
    val ds = 10 to 90 by 10
    val edgePicks = ds.map(d =>
      s"MAX(CASE WHEN vr = CAST(ceil(n * $d / 100.0) AS BIGINT) THEN v END) AS e$d").mkString(",\n      |         ")
    val decileSum = ds.map(d => s"CASE WHEN b.score_q >= e$d THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(floor(least(1.0, len(string_split(text, ' ')) / 100.0) *
      |         (1 - CAST(len(list_filter(string_split(text, ' '), w -> len(w) = 1)) AS DOUBLE)
      |              / len(string_split(text, ' '))) * ${operators.TextAnalysis.CalibQuantScale}) AS BIGINT) AS score_q,
      |    ('0x' || substr(md5('cal:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |m AS (SELECT source, h, MIN(score_q) AS v FROM base GROUP BY 1, 2),
      |r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM m),
      |kk AS (SELECT source, v FROM r WHERE rn <= ${operators.TextAnalysis.CalibSampleK}),
      |s AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS vr,
      |             COUNT(*) OVER (PARTITION BY source) AS n FROM kk),
      |edges AS (SELECT source,
      |         $edgePicks
      |       FROM s GROUP BY source),
      |dec AS (SELECT b.doc_id, b.source, b.score_q,
      |          CAST($decileSum AS INTEGER) AS decile
      |        FROM base b JOIN edges USING (source))""".stripMargin
  }

  /** x13's LSH-bucketed embedding-pair CTEs (hyperplane signatures +
    * Hamming-radius candidates + exact cosine), shared by x78's removal
    * oracle so dedup can't diverge from detection. */
  private def embeddingPairCtes: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |        ${operators.Similarity.hyperplaneSigSql("v", operators.Dedup.NearDupPlanes)} AS sig
       |      FROM e),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS c
       |  FROM n a JOIN n b
       |    ON a.vec_id < b.vec_id
       |   AND bit_count(xor(a.sig, b.sig)) <= ${operators.Dedup.NearDupMaxHamming})""".stripMargin

  /** x62's benchmark/corpus char-gram CTEs, shared by x64's oracle (the
    * clustersCteSql pattern: removal may not diverge from detection). */
  private def substringContamCtes: String = {
    val k = operators.Dedup.DecontamGramChars
    val bmax = operators.Dedup.DecontamBenchMaxId
    s"""WITH bench AS (
      |  SELECT DISTINCT doc_id AS bench_id,
      |         ('0x' || substr(md5(substr(text, i, $k)), 1, 15))::BIGINT AS gh
      |  FROM documents, unnest(range(1, len(text) - ${k - 2})) AS t(i)
      |  WHERE doc_id < $bmax AND len(text) >= $k),
      |corp AS (
      |  SELECT DISTINCT doc_id,
      |         ('0x' || substr(md5(substr(text, i, $k)), 1, 15))::BIGINT AS gh
      |  FROM documents, unnest(range(1, len(text) - ${k - 2})) AS t(i)
      |  WHERE doc_id >= $bmax AND len(text) >= $k)""".stripMargin
  }

  /** x66's per-document repetition-metric CTE, shared by x67's oracle
    * (filter may not diverge from the metrics). DuckDB slices are
    * 1-based inclusive; the bigram list is deliberately NON-distinct so
    * duplicate bigrams are countable. */
  private def repetitionMetricsCteSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |    CAST(list_max([len([x for x in ws if x = w])
      |                   for w in list_distinct(ws)]) AS BIGINT) AS max_tf,
      |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_2grams,
      |    CAST(greatest(len(ws) - 1, 0)
      |         - len(list_distinct([ws[i] || ' ' || ws[i+1]
      |                              for i in range(1, len(ws))])) AS BIGINT) AS n_dup_2grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t)""".stripMargin

  /** x68's gram/cap/pair CTE chain, shared by x72's oracle (removal may
    * not diverge from detection — the substringContamCtes rule). Yields
    * `xpairs(doc_a, doc_b, n_shared_grams)`; x68 applies the min-shared
    * floor, x72 anti-joins the doc_b side. */
  private def crossDocPairCtes: String = {
    val k = operators.Dedup.DecontamGramChars
    s"""xgrams AS (
      |  SELECT DISTINCT doc_id, gh
      |  FROM (SELECT doc_id,
      |          ('0x' || substr(md5(substr(text, i, $k)), 1, 15))::BIGINT AS gh
      |        FROM documents, unnest(range(1, len(text) - ${k - 2})) AS t(i)
      |        WHERE len(text) >= $k) g
      |  WHERE gh % ${operators.Dedup.CrossDocAnchorMod} = 0),
      |xcapped AS (
      |  SELECT * FROM xgrams
      |  WHERE gh NOT IN (SELECT gh FROM xgrams GROUP BY gh
      |                   HAVING COUNT(*) > ${operators.Dedup.CrossDocMaxGramDf})),
      |xpairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(count(*) AS BIGINT) AS n_shared_grams
      |  FROM xcapped a JOIN xcapped b USING (gh)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin
  }

  /** x37's greedy-pack bin table, shared verbatim with x71's oracle (the
    * audit recomputes this table from the materialized shard files). */
  private def packBinTableSql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      |  FROM t)
      |SELECT CAST(tokens_before // 512 AS BIGINT) AS bin_id, COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1""".stripMargin

  private def clustersCteSql: String = clustersCteSql("TRUE")

  /** x17's cluster CTEs restricted to `docPred` (default unrestricted) —
    * the restricted form is x98's "clusters of the existing snapshot". */
  private def clustersCteSql(docPred: String): String =
    s"""WITH RECURSIVE sh AS (
      |  SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_sh, unnest(shingles) AS sh FROM (
      |    SELECT doc_id,
      |           list_distinct([array_to_string(words[i:i+4], ' ')
      |                          for i in range(1, len(words) - 3)]) AS shingles
      |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
      |          WHERE $docPred) t1) t2),
      |capped AS (
      |  SELECT * FROM sh
      |  WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 100)),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
      |         COUNT(*) AS inter
      |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4
      |  HAVING COUNT(*) / (a.n_sh + b.n_sh - COUNT(*)) >= 0.3),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, label) AS (
      |  SELECT doc_id, doc_id FROM documents WHERE $docPred
      |  UNION
      |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id)""".stripMargin

  /** x98's oracle: the existing snapshot's x17 cluster CTEs (restricted
    * to doc_id < boundary), x03's banding CTEs over the whole corpus for
    * the verified links, then a recursive min-label closure over the
    * BATCH graph only (batch↔batch links + batch→canonical anchors) —
    * the SQL twin of `Dedup.incrementalClusters`. Knobs from
    * Dedup.BandIngest*. */
  private def clusterIngestOracleSql: String = {
    val lo = operators.Dedup.BandIngestNewMinId
    val th = operators.Dedup.BandIngestThreshold
    val jac = "len(list_intersect(x.hs, y.hs)) / " +
      "(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))"
    s"""${clustersCteSql(s"doc_id < $lo")},
       |exclusters AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id),
       |${minhashCtePrefix.stripPrefix("WITH ")},
       |vlinkex AS (
       |  SELECT DISTINCT c.doc_id, c.partner FROM (
       |    SELECT DISTINCT b.doc_id, e.doc_id AS partner
       |    FROM banded b JOIN banded e
       |      ON b.band = e.band AND b.bucket = e.bucket
       |      AND b.doc_id >= $lo AND e.doc_id < $lo) c
       |  JOIN docs x ON c.doc_id = x.doc_id JOIN docs y ON c.partner = y.doc_id
       |  WHERE $jac >= $th),
       |canonlink AS (
       |  SELECT DISTINCT v.doc_id, c.canonical_id AS node
       |  FROM vlinkex v JOIN exclusters c ON v.partner = c.doc_id),
       |vlinkin AS (
       |  SELECT DISTINCT c.doc_id, c.partner FROM (
       |    SELECT DISTINCT a.doc_id, b2.doc_id AS partner
       |    FROM banded a JOIN banded b2
       |      ON a.band = b2.band AND a.bucket = b2.bucket
       |      AND a.doc_id >= $lo AND b2.doc_id >= $lo AND b2.doc_id < a.doc_id) c
       |  JOIN docs x ON c.doc_id = x.doc_id JOIN docs y ON c.partner = y.doc_id
       |  WHERE $jac >= $th),
       |edges2 AS (
       |  SELECT doc_id AS src, partner AS dst FROM vlinkin
       |  UNION ALL SELECT partner, doc_id FROM vlinkin
       |  UNION ALL SELECT doc_id, node FROM canonlink
       |  UNION ALL SELECT node, doc_id FROM canonlink),
       |reach2(node, label) AS (
       |  SELECT node, node AS label FROM (
       |    SELECT doc_id AS node FROM documents WHERE doc_id >= $lo
       |    UNION SELECT DISTINCT canonical_id FROM exclusters) b
       |  UNION
       |  SELECT e.dst, r.label FROM reach2 r JOIN edges2 e ON e.src = r.node),
       |labels2 AS (SELECT node AS doc_id, MIN(label) AS component
       |            FROM reach2 WHERE node >= $lo GROUP BY 1),
       |linked AS (SELECT DISTINCT src AS doc_id FROM edges2 WHERE src >= $lo)
       |SELECT d.doc_id,
       |       CAST(COALESCE(l.component, d.doc_id) AS BIGINT) AS canonical_id,
       |       CASE WHEN COALESCE(l.component, d.doc_id) < $lo THEN 'joins_existing'
       |            WHEN k.doc_id IS NOT NULL THEN 'new_cluster'
       |            ELSE 'singleton' END AS status
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $lo) d
       |LEFT JOIN labels2 l USING (doc_id)
       |LEFT JOIN linked k USING (doc_id)""".stripMargin
  }

  /** x04's oracle replicates the ENTIRE SimHash pipeline in DuckDB SQL —
    * possible because the token hash is the engine-neutral
    * `Dedup.md5Hash60` (first 15 md5 hex chars as a long), not xxhash64:
    * per-token hashing, the per-bit majority vote over bits 0..59, 4×16-bit
    * banding, and the Hamming ≤ 8 verify are recomputed end-to-end. The
    * 60 SUM / 60 CASE columns are generated here rather than hand-written. */
  /** The signature+banding CTE prefix of the SimHash oracles — shared by
    * x04's pair join and x179's per-band precision audit so the banding
    * rule cannot diverge between them (the minhashCtePrefix pattern). */
  private def simhashCtePrefix: String = {
    val counts = (0 until 60).map(b => s"SUM((h >> $b) & 1) AS c$b").mkString(", ")
    val bits = (0 until 60)
      .map(b => s"(CASE WHEN c$b * 2 > n THEN 1::BIGINT ELSE 0::BIGINT END << $b)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t),
       |agg AS (SELECT doc_id, COUNT(*) AS n, $counts FROM tok GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS sh FROM agg),
       |banded AS (
       |  SELECT doc_id, sh, band, (sh >> (band * 16)) & 65535 AS chunk
       |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b)""".stripMargin
  }

  private def simhashOracleSql: String =
    s"""$simhashCtePrefix,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 8""".stripMargin

  /** x03's oracle replicates the MinHash+LSH algorithm end-to-end in
    * DuckDB — possible because every stage is an engine-neutral primitive:
    * md5-60 shingle hashes, the `(h%P)·(2j+1)+7919(j+1) mod P` permutation
    * minima, md5-of-slice band buckets, and exact Jaccard over the hash
    * sets. The 32 permutation expressions are generated, not hand-written.
    * The banding's recall behavior is therefore itself oracle-checked: a
    * pair both engines band apart is (correctly) absent from both. */
  /** Shared docs→signature→band CTE prefix (the algorithm half of x03's
    * oracle), reused verbatim by x96's incremental-ingest oracle so the
    * banding rule cannot diverge between the pair join and the ingest
    * classification — the SQL twin of `Dedup.bandFrames`. */
  private def minhashCtePrefix: String = {
    val P = 1000000007L
    val perms = (0 until 32).map(j =>
      s"list_min(list_transform(hs, h -> ((h % $P) * ${2 * j + 1} + ${7919L * (j + 1)}) % $P))")
      .mkString("[", ", ", "]")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
       |  FROM (SELECT doc_id,
       |          list_distinct([array_to_string(words[i:i+4], ' ')
       |                         for i in range(1, len(words) - 3)]) AS shingles
       |        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2
       |  WHERE len(shingles) > 0),
       |sig AS (SELECT doc_id, hs, $perms AS sg FROM docs),
       |banded AS (
       |  SELECT doc_id, band,
       |         md5(array_to_string(sg[band * 4 + 1 : band * 4 + 4], ',')) AS bucket
       |  FROM sig, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b)""".stripMargin
  }

  /** x95's weight pipeline as a CTE block (no WITH keyword), ending in
    * `w(doc_id, n_toks, importance_pts, imp_per_tok)` — shared by the
    * x95 and x100 oracles so the resample always applies the exact
    * weight definition it was scored with. */
  private def dsirWeightsCtes: String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |bk AS (SELECT doc_id,
      |         ('0x' || substr(md5('dsir:' || token), 1, 15))::BIGINT
      |           % ${operators.Sampling.DsirBuckets} AS b
      |       FROM tok),
      |counts AS (SELECT b,
      |    CAST(sum(CASE WHEN doc_id < ${operators.Sampling.DsirTargetMaxId} THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
      |    CAST(sum(CASE WHEN doc_id >= ${operators.Sampling.DsirTargetMaxId} THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      |  FROM bk GROUP BY 1),
      |scored AS (SELECT x.doc_id,
      |             (${operators.Sampling.DsirScale} * (c.t_b + 1)) // (c.c_b + 1) AS q
      |           FROM bk x JOIN counts c USING (b)
      |           WHERE x.doc_id >= ${operators.Sampling.DsirTargetMaxId}),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |               CAST(sum(q) AS BIGINT) AS importance_pts
      |        FROM scored GROUP BY 1),
      |w AS (SELECT d.doc_id, CAST(COALESCE(a.n_toks, 0) AS BIGINT) AS n_toks,
      |       CAST(COALESCE(a.importance_pts, 0) AS BIGINT) AS importance_pts,
      |       CAST(COALESCE(a.importance_pts // a.n_toks, 0) AS BIGINT) AS imp_per_tok
      |      FROM (SELECT doc_id FROM documents
      |            WHERE doc_id >= ${operators.Sampling.DsirTargetMaxId}) d
      |      LEFT JOIN agg a USING (doc_id))""".stripMargin

  private def minhashOracleSql: String =
    s"""$minhashCtePrefix,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT c.doc_a, c.doc_b, len(list_intersect(x.hs, y.hs)) AS inter,
       |         len(x.hs) AS n_a, len(y.hs) AS n_b
       |  FROM cand c JOIN docs x ON c.doc_a = x.doc_id JOIN docs y ON c.doc_b = y.doc_id)
       |SELECT doc_a, doc_b, inter / (n_a + n_b - inter) AS jaccard
       |FROM verified WHERE inter / (n_a + n_b - inter) >= 0.3""".stripMargin

  /** x96's oracle: the same banding CTEs, split at the new-batch
    * boundary, with x03's verify rule applied existing-vs-batch and
    * within-batch (first-occurrence-wins), then the x44 status
    * precedence. Knobs interpolated from Dedup.BandIngest*. */
  private def bandIngestOracleSql: String = {
    val lo = operators.Dedup.BandIngestNewMinId
    val th = operators.Dedup.BandIngestThreshold
    s"""$minhashCtePrefix,
       |exb AS (SELECT * FROM banded WHERE doc_id < $lo),
       |bb AS (SELECT * FROM banded WHERE doc_id >= $lo),
       |cand_ex AS (SELECT DISTINCT b.doc_id, e.doc_id AS partner
       |            FROM bb b JOIN exb e ON b.band = e.band AND b.bucket = e.bucket),
       |ver_ex AS (SELECT c.doc_id, c.partner
       |           FROM cand_ex c JOIN docs x ON c.doc_id = x.doc_id
       |                          JOIN docs y ON c.partner = y.doc_id
       |           WHERE len(list_intersect(x.hs, y.hs))
       |                 / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) >= $th),
       |ex_agg AS (SELECT doc_id, min(partner) AS rep_ex, count(*) AS n_ex
       |           FROM ver_ex GROUP BY 1),
       |cand_in AS (SELECT DISTINCT a.doc_id, b2.doc_id AS partner
       |            FROM bb a JOIN bb b2 ON a.band = b2.band AND a.bucket = b2.bucket
       |                                AND b2.doc_id < a.doc_id),
       |ver_in AS (SELECT c.doc_id, c.partner
       |           FROM cand_in c JOIN docs x ON c.doc_id = x.doc_id
       |                          JOIN docs y ON c.partner = y.doc_id
       |           WHERE len(list_intersect(x.hs, y.hs))
       |                 / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) >= $th),
       |in_agg AS (SELECT doc_id, min(partner) AS rep_in, count(*) AS n_in
       |           FROM ver_in GROUP BY 1)
       |SELECT d.doc_id,
       |       CASE WHEN e.n_ex IS NOT NULL THEN 'dup_of_existing'
       |            WHEN i.n_in IS NOT NULL THEN 'dup_in_batch'
       |            ELSE 'kept' END AS status,
       |       CAST(CASE WHEN e.n_ex IS NOT NULL THEN e.rep_ex
       |                 WHEN i.n_in IS NOT NULL THEN i.rep_in
       |                 ELSE d.doc_id END AS BIGINT) AS rep_id,
       |       CAST(COALESCE(e.n_ex, 0) AS BIGINT) AS n_existing_partners,
       |       CAST(COALESCE(i.n_in, 0) AS BIGINT) AS n_batch_partners
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= $lo) d
       |LEFT JOIN ex_agg e USING (doc_id)
       |LEFT JOIN in_agg i USING (doc_id)""".stripMargin
  }

  /** DuckDB oracle SQL per query (same table names, same column names).
    * Every query is oracle-checked. The approximate operators fall in two
    * oracle classes:
    *  - ALGORITHM oracles (x03, x04, x10, x13): the approximate semantics
    *    are deterministic plan-time constants (md5-derived hashes and
    *    minhash permutations, ±1 hyperplane matrices), so the SQL
    *    replicates the algorithm itself — signatures, banding/probing,
    *    verify — and checks it end-to-end, independent of what corpus it
    *    runs on.
    *  - EXACT oracle with measured full recall (x18): nProbe is sized so
    *    measured recall is 1.0 on the evaluation corpus (see RecallProbe),
    *    so the approximate plan must reproduce the exact SQL answer. NOTE
    *    this equality is corpus-dependent by construction: recall depends
    *    on the (deterministically pinned) KMeans cells — on a NEW corpus
    *    the gate can fail without a correctness bug. The evaluation
    *    corpora contain no near-boundary queries. */
  /** The x239/x260 shared CTE prefix: both retrieval systems' top-k
    * lists — `sem` (exact cosine ranking over embeddings, the KnnStage
    * contract) and `lex` (x163's TF-cosine pairs symmetrized and
    * ranked) — built from the same engine-neutral constants as the
    * Spark side so the two oracles can never disagree on the rankings
    * they measure. */
  /** Shared by x239/x260. MATERIALIZED hints (r17): nn/sem/tfc/idx/p/lex
    * are each multiply-referenced — DuckDB inlines by default, so the sf1
    * replay recomputed the 5-gram explode 4× and the pair join twice
    * (x260 read 144 s; hint-only, row-identical, re-gated both scales). */
  private def hybridRankingCtes: String = {
    import operators.Dedup.{TfCosMaxTermDf, TfCosShingleN, TfCosThresholdDen, TfCosThresholdNum}
    import operators.Retrieval.HybridK
    val (n2, d2) = (TfCosThresholdNum.toLong * TfCosThresholdNum,
      TfCosThresholdDen.toLong * TfCosThresholdDen)
    val (hi, lo) = (TfCosShingleN - 1, TfCosShingleN - 2)
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |nn AS MATERIALIZED (SELECT vec_id, v,
      |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
      |sem AS MATERIALIZED (
      |  SELECT q_id AS doc_id, vec_id AS rel_id,
      |         CAST(rank AS BIGINT) AS r_sem
      |  FROM (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
      |          ORDER BY cos_sim DESC, vec_id) AS rank
      |        FROM (SELECT q.vec_id AS q_id, c.vec_id,
      |                floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
      |              FROM nn q JOIN nn c ON q.vec_id <> c.vec_id) t0) t1
      |  WHERE rank <= $HybridK),
      |t AS (SELECT doc_id, unnest([array_to_string(words[i:i+$hi], ' ')
      |             for i in range(1, len(words) - $lo)]) AS w
      |       FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1),
      |tfc AS MATERIALIZED (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
      |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm2 FROM tfc GROUP BY 1),
      |stop AS (SELECT w FROM (SELECT w, count(*) AS df FROM tfc GROUP BY 1) s
      |         WHERE df > $TfCosMaxTermDf),
      |idx AS MATERIALIZED (SELECT doc_id, w, tf, norm2
      |        FROM tfc ANTI JOIN stop USING (w) JOIN norms USING (doc_id)),
      |p AS MATERIALIZED (SELECT doc_a, doc_b, dot, norm2_a, norm2_b,
      |             CAST(dot AS DOUBLE) / sqrt(CAST(norm2_a AS DOUBLE) * norm2_b) AS cos_dbl
      |      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                   a.norm2 AS norm2_a, b.norm2 AS norm2_b,
      |                   CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      |            FROM idx a JOIN idx b ON a.w = b.w AND a.doc_id < b.doc_id
      |            GROUP BY 1, 2, 3, 4) pp
      |      WHERE CAST($d2 AS HUGEINT) * dot * dot >= CAST($n2 AS HUGEINT) * norm2_a * norm2_b),
      |sym AS (SELECT doc_a AS doc_id, doc_b AS rel_id, cos_dbl FROM p
      |        UNION ALL SELECT doc_b AS doc_id, doc_a AS rel_id, cos_dbl FROM p),
      |lex AS MATERIALIZED (SELECT doc_id, rel_id, r_lex FROM (
      |          SELECT doc_id, rel_id, CAST(row_number() OVER (PARTITION BY doc_id
      |            ORDER BY cos_dbl DESC, rel_id) AS BIGINT) AS r_lex FROM sym) t
      |        WHERE r_lex <= $HybridK)""".stripMargin
  }

  /** x290/x291 shared LPA replay: the x180 co-purchase edge derivation,
    * then `iters` synchronous label rounds — support sum per (node,
    * neighbor label), argmax by (support desc, label asc) packed into
    * one BIGINT aggregate. MATERIALIZED throughout (each lN feeds the
    * next round; e/e0/fit are multiply-referenced). */
  /** The propagation rounds alone (expects a CTE `e(src, dst, w)`):
    * l0 self-labels, each lN is the packed support-argmax — shared by
    * the co-purchase (x290/x291) and semantic-kNN (x292/x293) chains. */
  private def lpaRoundsSql(iters: Int): String = {
    val cap = operators.LinkAnalysis.LpaLabelCap
    val rounds = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS MATERIALIZED (
         |  SELECT dst AS node,
         |    CAST($cap - 1 - (max(sc * $cap + ($cap - 1 - label)) % $cap)
         |      AS BIGINT) AS label
         |  FROM (SELECT e.dst, l.label, CAST(sum(e.w) AS BIGINT) AS sc
         |        FROM e JOIN $prev l ON l.node = e.src GROUP BY 1, 2)
         |  GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM e),
       |$rounds""".stripMargin
  }

  private def lpaChainSql(iters: Int): String =
    s"""op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS w
       |      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
       |      GROUP BY 1, 2 HAVING count(*) >= ${operators.LinkAnalysis.TriMinSupport}),
       |e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM e0
       |                   UNION ALL SELECT b, a, w FROM e0),
       |${lpaRoundsSql(iters)}""".stripMargin

  /** x292/x293 shared chain: the x198 staged-kNN derivation (same exact
    * trunc6-cosine ranking contract), mutual pairs weighted by rank
    * affinity StageK+1−max(rank, rank'), then the shared LPA rounds. */
  private def semanticLpaChainSql(iters: Int): String = {
    val k = operators.KnnStage.StageK
    s"""ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM ev),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id,
       |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM scored),
       |topk AS MATERIALIZED (SELECT q_id, vec_id, rank FROM ranked WHERE rank <= $k),
       |e0 AS MATERIALIZED (SELECT f.q_id AS a, f.vec_id AS b,
       |       CAST(${k + 1} - greatest(f.rank, r.rank) AS BIGINT) AS w
       |       FROM topk f JOIN topk r
       |         ON f.q_id = r.vec_id AND f.vec_id = r.q_id
       |       WHERE f.q_id < f.vec_id),
       |e AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM e0
       |                   UNION ALL SELECT b, a, w FROM e0),
       |${lpaRoundsSql(iters)}""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "x04_simhash_pairs" -> simhashOracleSql,
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS quantity,
        |       CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05""".stripMargin,

    "q02_grouped_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_topk" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents, o_orderpriority
        |FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin,

    "q04_join_broadcast" ->
      """SELECT s_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,

    "q05_join_inner_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""".stripMargin,

    "q06_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin,

    "q07_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q08_dedup_keys" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS quantity
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |        row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey) AS rn
        |      FROM lineitem) t WHERE rn = 1""".stripMargin,

    "q09_distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem""".stripMargin,

    "q10_weekly_features" ->
      """WITH weekly AS (
        |  SELECT l_suppkey, CAST(year(l_shipdate) AS INTEGER) AS year,
        |         CAST(weekofyear(l_shipdate) AS INTEGER) AS week,
        |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS weekly_revenue_cents,
        |         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS had_return,
        |         CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS disc_cents,
        |         COUNT(*) AS n_items
        |  FROM lineitem GROUP BY 1, 2, 3),
        |feat AS (
        |  SELECT l_suppkey, year, week, weekly_revenue_cents, had_return, n_items,
        |         disc_cents / n_items AS avg_discount_cents,
        |         lag(weekly_revenue_cents, 1) OVER w AS prev_week_revenue,
        |         lag(weekly_revenue_cents, 2) OVER w AS prev2_week_revenue,
        |         CAST(SUM(weekly_revenue_cents) OVER wf AS BIGINT) / COUNT(*) OVER wf AS mean_last4_weeks
        |  FROM weekly
        |  WINDOW w  AS (PARTITION BY l_suppkey ORDER BY year, week),
        |         wf AS (PARTITION BY l_suppkey ORDER BY year, week
        |                ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
        |SELECT * FROM feat
        |WHERE prev_week_revenue IS NOT NULL AND prev2_week_revenue IS NOT NULL
        |  AND mean_last4_weeks IS NOT NULL""".stripMargin,

    "q11_silver_like" ->
      """WITH fact AS (
        |  SELECT ship_date, l_suppkey, l_orderkey, quantity, price_cents FROM (
        |    SELECT CAST(l_shipdate AS DATE) AS ship_date, l_suppkey, l_orderkey,
        |           CAST(l_quantity AS BIGINT) AS quantity,
        |           CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        |           row_number() OVER (PARTITION BY CAST(l_shipdate AS DATE), l_suppkey
        |                              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice) AS rn
        |    FROM lineitem) t WHERE rn = 1),
        |urgent AS (
        |  SELECT CAST(o_orderdate AS DATE) AS ship_date,
        |         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS is_urgent
        |  FROM orders GROUP BY 1)
        |SELECT f.ship_date, f.l_suppkey, f.l_orderkey, f.quantity, f.price_cents,
        |       s.s_name, s.s_nationkey, COALESCE(u.is_urgent, 0) AS is_urgent,
        |       CAST(year(f.ship_date) AS INTEGER) AS year,
        |       CAST(month(f.ship_date) AS INTEGER) AS month
        |FROM fact f
        |LEFT JOIN supplier s ON f.l_suppkey = s.s_suppkey
        |LEFT JOIN urgent u ON f.ship_date = u.ship_date
        |WHERE s.s_name IS NOT NULL AND s.s_nationkey IS NOT NULL""".stripMargin,

    "q12_date_functions" ->
      """WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT d, CAST(year(d) AS INTEGER) AS y, CAST(month(d) AS INTEGER) AS m,
        |       CAST(day(d) AS INTEGER) AS dom, CAST(weekofyear(d) AS INTEGER) AS iso_week,
        |       CAST(quarter(d) AS INTEGER) AS q, CAST(dayofyear(d) AS INTEGER) AS doy
        |FROM dd""".stripMargin,

    "q13_case_cast" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final,
        |  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS priority,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS total_trunc,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        |FROM orders""".stripMargin,

    "q14_union_distinct" ->
      """SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q15_quality_checks" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkeys,
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_names,
        |  MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS min_total_cents,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,

    "q16_ungrouped_agg" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  MIN(CAST(l_quantity AS BIGINT)) AS min_qty,
        |  MAX(CAST(l_quantity AS BIGINT)) AS max_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "x01_dedup_exact" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // x02's oracle replicates the stop-shingle frequency cap (df ≤ 100) —
    // the cap is part of the operator contract, so a corpus with hot
    // shingles is checked as capped, not mis-graded against uncapped SQL.
    "x02_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_sh, unnest(shingles) AS sh FROM (
        |    SELECT doc_id,
        |           list_distinct([array_to_string(words[i:i+4], ' ')
        |                          for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2),
        |capped AS (
        |  SELECT * FROM sh
        |  WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 100)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |         COUNT(*) AS inter
        |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, inter, inter / (n_a + n_b - inter) AS jaccard
        |FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.3""".stripMargin,

    "x03_minhash_lsh" -> minhashOracleSql,

    // x255: bounded edit-distance verify over x03's candidate CTEs —
    // DuckDB computes the FULL distance and applies the same cutoff
    // CASE, so both the distances and the -1 rejection band must match.
    "x255_edit_distance" -> {
      import operators.Dedup.{LevBandWidth, LevThreshold}
      s"""$minhashCtePrefix,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |dist AS (
         |  SELECT c.doc_a, c.doc_b,
         |         CASE WHEN levenshtein(x.text, y.text) > $LevThreshold THEN -1
         |              ELSE levenshtein(x.text, y.text) END AS d
         |  FROM cand c JOIN documents x ON c.doc_a = x.doc_id
         |              JOIN documents y ON c.doc_b = y.doc_id)
         |SELECT CASE WHEN d < 0 THEN -1 ELSE d // $LevBandWidth END AS dist_band,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(min(d) AS BIGINT) AS min_d, CAST(max(d) AS BIGINT) AS max_d
         |FROM dist GROUP BY 1""".stripMargin
    },
    "x96_band_ingest" -> bandIngestOracleSql,
    "x98_cluster_ingest" -> clusterIngestOracleSql,

    // x99: HITS unrolled to HitsIters=2 full rounds. Each normalization
    // replicates the operator's overflow-free integer scale
    // `score // greatest(1, max // Unit)` — same truncation, bit-exact.
    // MATERIALIZED hints (r17): `e` is referenced 5× and each score CTE
    // 2× (the max subquery); DuckDB inlines CTEs by default, so the sf1
    // replay recomputed the orders⋈lineitem DISTINCT tree ~2^rounds times
    // and spilled >80 GB. Hint-only change — measured 93 s → 2.7 s at
    // sf1, identical rows; this removed x99 from the sf1 skip list.
    "x99_hits" -> {
      val u = operators.LinkAnalysis.HitsUnit
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey AS hub, l_suppkey AS auth
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT DISTINCT hub, CAST($u AS BIGINT) AS h FROM e),
        |a1r AS MATERIALIZED (SELECT auth, CAST(sum(h) AS BIGINT) AS a FROM e JOIN h0 USING (hub) GROUP BY 1),
        |a1 AS MATERIALIZED (SELECT auth, a // greatest(1, (SELECT max(a) FROM a1r) // $u) AS a FROM a1r),
        |h1r AS MATERIALIZED (SELECT hub, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a1 USING (auth) GROUP BY 1),
        |h1 AS MATERIALIZED (SELECT hub, h // greatest(1, (SELECT max(h) FROM h1r) // $u) AS h FROM h1r),
        |a2r AS MATERIALIZED (SELECT auth, CAST(sum(h) AS BIGINT) AS a FROM e JOIN h1 USING (hub) GROUP BY 1),
        |a2 AS MATERIALIZED (SELECT auth, a // greatest(1, (SELECT max(a) FROM a2r) // $u) AS a FROM a2r),
        |h2r AS MATERIALIZED (SELECT hub, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a2 USING (auth) GROUP BY 1),
        |h2 AS (SELECT hub, h // greatest(1, (SELECT max(h) FROM h2r) // $u) AS h FROM h2r)
        |SELECT 'customer' AS node_type, CAST(hub AS BIGINT) AS node_key, h AS pts FROM h2
        |UNION ALL
        |SELECT 'supplier' AS node_type, CAST(auth AS BIGINT) AS node_key, a AS pts FROM a2""".stripMargin
    },

    // x10's oracle replicates the APPROXIMATE algorithm itself: the ±1
    // hyperplane matrix is a plan-time constant, so the same signatures,
    // multi-probe (Hamming ≤ LshProbeRadius), and exact re-rank are
    // computed in SQL — the oracle validates the LSH semantics including
    // their recall behavior. Plane count and probe radius come from the
    // SAME constants the Spark operator defaults to.
    "x10_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm,
         |        ${operators.Similarity.hyperplaneSigSql("v", operators.Similarity.LshPlanes)} AS sig
         |      FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, sig AS qsig FROM s
         |      WHERE vec_id >= 10 AND vec_id < 20),
         |scored AS (
         |  SELECT q.q_id, s.vec_id,
         |    floor(list_dot_product(q.qv, s.v)
         |          / (q.qnrm * s.nrm) * 1000000) / 1000000 AS cos_sim
         |  FROM s, q
         |  WHERE s.vec_id <> q.q_id
         |    AND bit_count(xor(s.sig, q.qsig)) <= ${operators.Similarity.LshProbeRadius}),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT q_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5""".stripMargin,

    "x18_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
        |      WHERE vec_id >= 20 AND vec_id < 30),
        |scored AS (
        |  SELECT q.q_id, n.vec_id,
        |    floor(list_dot_product(q.qv, n.v)
        |          / (q.qnrm * n.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n, q WHERE n.vec_id <> q.q_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
        |           FROM scored)
        |SELECT q_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5""".stripMargin,

    // x79: x09's exact brute-force ranking restricted to cross-label
    // candidates — the hard-negative mining contract.
    "x79_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qnrm
        |      FROM n WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, q.q_label, n.vec_id, n.label AS neg_label,
        |    floor(list_dot_product(q.qv, n.v)
        |          / (q.qnrm * n.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n, q WHERE n.label <> q.q_label),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
        |           FROM scored)
        |SELECT q_id, q_label, vec_id, neg_label, cos_sim, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "x05_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |  length(replace(text, ' ', '')) / len(string_split(text, ' ')) AS mean_word_len,
        |  len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','an','of','to','in','and','is','for','on')))
        |    / len(string_split(text, ' ')) AS stopword_ratio,
        |  len(list_filter(string_split(text, ' '), w -> length(w) = 1))
        |    / len(string_split(text, ' ')) AS short_word_ratio,
        |  least(1.0, len(string_split(text, ' ')) / 100.0)
        |    * (1.0 - len(list_filter(string_split(text, ' '), w -> length(w) = 1))
        |              / len(string_split(text, ' '))) AS quality_score
        |FROM documents""".stripMargin,

    "x06_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    CAST(len(list_filter(string_split(text,' '),
        |      w -> w IN ('the','a','an','of','to','in','and','is','for','on'))) AS INTEGER) AS score_en,
        |    CAST(len(list_filter(string_split(text,' '),
        |      w -> w IN ('el','la','de','los','las','es','y','en','un','una'))) AS INTEGER) AS score_es,
        |    CAST(len(list_filter(string_split(text,' '),
        |      w -> w IN ('der','die','das','und','ist','ein','eine','zu','mit'))) AS INTEGER) AS score_de,
        |    CAST(len(list_filter(string_split(text,' '),
        |      w -> w IN ('le','la','les','des','et','est','un','une','dans'))) AS INTEGER) AS score_fr,
        |    CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS INTEGER) AS score_zh
        |  FROM documents)
        |SELECT *, CASE
        |  WHEN score_en >= greatest(score_es, score_de, score_fr, score_zh) THEN 'en'
        |  WHEN score_es >= greatest(score_de, score_fr, score_zh) THEN 'es'
        |  WHEN score_de >= greatest(score_fr, score_zh) THEN 'de'
        |  WHEN score_fr >= score_zh THEN 'fr'
        |  ELSE 'zh' END AS predicted_lang
        |FROM s""".stripMargin,

    "x07_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_ish_tokens
        |FROM documents""".stripMargin,

    "x08_fingerprints" ->
      """SELECT doc_id, md5(lower(trim(text))) AS content_fp,
        |  list_aggregate(list_transform(string_split(text, ' '), w -> md5(w)), 'min') AS min_word_fp
        |FROM documents""".stripMargin,

    "x09_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, n.vec_id,
        |    floor(list_dot_product(q.qv, n.v)
        |          / (q.qnrm * n.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n, q WHERE n.vec_id <> q.q_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
        |           FROM scored)
        |SELECT q_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5""".stripMargin,

    "x11_sessionize" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(round(value*100) AS BIGINT) AS value_cents
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts_s - lag(ts_s, 1) OVER w > 1800 THEN 1
        |                 WHEN lag(ts_s, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |       MIN(ts_s) AS session_start_s, MAX(ts_s) AS session_end_s,
        |       CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents,
        |       COUNT(DISTINCT event_type) AS n_event_types,
        |       MAX(ts_s) - MIN(ts_s) AS duration_s
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,

    "x12_hourly_windows" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start_s,
        |       event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    // x13's oracle is an ALGORITHM oracle like x10's: the same ±1
    // hyperplane matrix is baked into SQL and the candidate rule
    // (signature Hamming ≤ NearDupMaxHamming) is replicated with
    // bit_count(xor(...)), so the oracle checks the bucketed semantics
    // themselves. Plane count and radius come from the SAME constants the
    // Spark operator defaults to (`Dedup.NearDupPlanes` /
    // `Dedup.NearDupMaxHamming`) — they can only move together.
    "x13_embedding_neardup" ->
      s"""$embeddingPairCtes
         |SELECT vec_a, vec_b, floor(c * 1000000) / 1000000 AS cos_sim
         |FROM p WHERE c >= 0.4""".stripMargin,

    // x78: x13's removal step — drop every vector with a lower-id
    // near-duplicate partner; the pair CTEs are shared verbatim (x72's
    // pattern: removal may not diverge from detection).
    "x78_semantic_deduped" ->
      s"""$embeddingPairCtes
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT vec_b FROM p WHERE c >= 0.4)""".stripMargin,

    "x14_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "x15_multimodal" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
        |  COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(unhex(md5(text)))) AS BIGINT) AS total_bytes,
        |  CAST(MIN(n_chars % 64 + 1) AS INTEGER) AS min_width,
        |  CAST(MAX(n_chars % 48 + 1) AS INTEGER) AS max_height
        |FROM documents GROUP BY 1""".stripMargin,

    // x16: row/window form (r17 verdict task 2) — the original per-doc
    // list-comprehension form built a 32-char-hash list per document and
    // re-sliced it per window position (interpreted list ops ×50M at sf1:
    // 373 s solo, outside the repeatable 120 s watchdog). Unnesting grams
    // to rows and taking the w=4 window min as a frame aggregate is
    // row-identical (verified at sf0.01/sf0.1) and ~20× faster (~5 s at
    // sf1), so x16 sits back inside the pinned sf1 gate. `i >= 4` keeps
    // exactly the full windows, which also subsumes the old
    // `len(grams) >= 4` doc filter.
    "x16_winnowing_fp" ->
      """WITH g AS (
        |  SELECT doc_id, i, md5(substr(text, CAST(i AS INTEGER), 8)) AS h
        |  FROM documents, unnest(range(1, length(text) - 8 + 2)) AS t(i)),
        |w AS (
        |  SELECT doc_id, i,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
        |  FROM g)
        |SELECT DISTINCT doc_id, fp FROM w WHERE i >= 4""".stripMargin,

    // x17's oracle recomputes the same near-dup graph and takes connected
    // components via a recursive CTE.
    "x17_dedup_clusters" ->
      s"""$clustersCteSql
        |SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id""".stripMargin,

    "x19_sliding_windows" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type,
        |         CAST(round(value*100) AS BIGINT) AS value_cents
        |  FROM events),
        |windowed AS (
        |  SELECT ((ts_s // 900) * 900 - off.o) AS window_start_s, event_type, value_cents
        |  FROM ev, (SELECT unnest([0, 900, 1800, 2700]) AS o) off)
        |SELECT window_start_s, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
        |FROM windowed GROUP BY 1, 2""".stripMargin,

    "x20_session_window" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(round(value*100) AS BIGINT) AS value_cents
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(ts_s, 1) OVER w IS NULL THEN 1
        |                 WHEN ts_s - lag(ts_s, 1) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, MIN(ts_s) AS session_start_s, COUNT(*) AS n_events,
        |       CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,

    "x21_vocabulary" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |SELECT word, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
        |FROM w GROUP BY word ORDER BY term_freq DESC, word LIMIT 20""".stripMargin,

    "x22_tfidf_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df, tf.tf * n.n_docs / df.df AS tf_idf
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, word) AS rank
        |           FROM scored)
        |SELECT doc_id, word, tf, df, tf_idf, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,

    "x23_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com or +1-555-000-'
        |              || doc_id || ' ref 1234567890123' AS planted
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, planted,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(planted,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |             '\+?[0-9][0-9()\[\]. -]{7,}[0-9]', '<PHONE>', 'g'),
        |           '[0-9]{9,}', '<NUM>', 'g') AS scrubbed
        |  FROM p)
        |SELECT doc_id, scrubbed,
        |       CAST(length(planted) - length(scrubbed) AS INTEGER) AS chars_removed
        |FROM s""".stripMargin,

    "x24_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |t AS (SELECT *, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase FROM ev),
        |f AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_purchase = 1 THEN event_id END IGNORE NULLS) OVER w AS last_purchase_id,
        |    last_value(CASE WHEN is_purchase = 1 THEN ts_s END IGNORE NULLS) OVER w AS last_purchase_ts
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, is_purchase DESC, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts_s, last_purchase_id, last_purchase_ts,
        |       ts_s - last_purchase_ts AS attribution_lag_s
        |FROM f WHERE event_type = 'click'""".stripMargin,

    "x25_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
        |FROM events GROUP BY user_id""".stripMargin,

    "x26_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    // x27/x28 replicate the md5-hash-bucket assignment exactly (same
    // engine-neutral hash as x03/x04) — deterministic splits/samples are a
    // pure function of the row key in both engines.
    "x27_train_test_split" ->
      """SELECT doc_id, source, lang,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |FROM (SELECT doc_id, source, lang,
        |        ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |      FROM documents) t""".stripMargin,

    "x28_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |      < (CASE WHEN lang = 'zh' THEN 10000 WHEN lang = 'en' THEN 5000 ELSE 2500 END)""".stripMargin,

    "x29_length_quantiles" ->
      """WITH ranked AS (
        |  SELECT source, n_chars, doc_id,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, MAX(n) AS n_docs,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 25 / 100) AS BIGINT) THEN n_chars END) AS q25_chars,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 50 / 100) AS BIGINT) THEN n_chars END) AS q50_chars,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 75 / 100) AS BIGINT) THEN n_chars END) AS q75_chars
        |FROM ranked GROUP BY source""".stripMargin,

    "x30_repetition_ratio" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CAST(greatest(len(words) - 2, 0) AS INTEGER) AS total_ngrams,
        |         CAST(len(list_distinct([array_to_string(words[i:i+2], ' ')
        |                                 for i in range(1, len(words) - 1)])) AS INTEGER) AS distinct_ngrams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t)
        |SELECT doc_id, total_ngrams, distinct_ngrams,
        |       (total_ngrams - distinct_ngrams) / total_ngrams AS dup_ratio,
        |       CAST((total_ngrams - distinct_ngrams) / total_ngrams >= 0.2 AS INTEGER) AS flagged
        |FROM g WHERE total_ngrams > 0""".stripMargin,

    "x31_decontamination" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(shingles) AS sh FROM (
        |    SELECT doc_id, list_distinct([array_to_string(words[i:i+4], ' ')
        |                                  for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2)
        |SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        |FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id < 20 AND c.doc_id >= 20
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,

    // x257: containment strength — x31's distinct-shingle CTE, ratio
    // per (eval, train) pair, worst-offender fold per eval doc.
    "x257_containment" -> {
      import operators.Dedup.ContainMinPpm
      s"""WITH sh AS (
        |  SELECT doc_id, unnest(shingles) AS sh FROM (
        |    SELECT doc_id, list_distinct([array_to_string(words[i:i+4], ' ')
        |                                  for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2),
        |bs AS (SELECT doc_id AS bench_id, CAST(count(*) AS BIGINT) AS n_bench_sh
        |       FROM sh WHERE doc_id < 20 GROUP BY 1),
        |p AS (SELECT b.doc_id AS bench_id, c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |      FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id < 20 AND c.doc_id >= 20
        |      GROUP BY 1, 2),
        |pp AS (SELECT p.bench_id, p.doc_id,
        |              (1000000 * n_shared) // n_bench_sh AS ppm
        |       FROM p JOIN bs USING (bench_id)),
        |mx AS (SELECT bench_id, max(ppm) AS max_ppm FROM pp GROUP BY 1)
        |SELECT pp.bench_id, bs.n_bench_sh,
        |       CAST(sum(CASE WHEN ppm >= $ContainMinPpm THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       CAST(max(ppm) AS BIGINT) AS max_ppm,
        |       min(CASE WHEN ppm = mx.max_ppm THEN pp.doc_id END) AS worst_doc
        |FROM pp JOIN bs USING (bench_id) JOIN mx USING (bench_id)
        |GROUP BY 1, 2""".stripMargin
    },

    "x32_interval_join" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(round(value*100) AS BIGINT) AS value_cents
        |  FROM events),
        |surges AS (
        |  SELECT (ts_s // 3600) * 3600 AS start_s, COUNT(*) AS n_clicks
        |  FROM ev WHERE event_type = 'click' GROUP BY 1 HAVING COUNT(*) >= 4),
        |p AS (SELECT event_id, ts_s, value_cents FROM ev WHERE event_type = 'purchase')
        |SELECT s.start_s, s.n_clicks, COUNT(*) AS n_purchases,
        |       CAST(SUM(p.value_cents) AS BIGINT) AS purchase_cents
        |FROM p JOIN surges s ON p.ts_s >= s.start_s AND p.ts_s < s.start_s + 3600
        |GROUP BY 1, 2""".stripMargin,

    // x33 recomputes the frame-sampling arithmetic (32-byte frames of the
    // UTF-8 text, every 2nd kept, tail-frame byte accounting) in SQL.
    "x33_frame_sample" ->
      """WITH d AS (SELECT doc_id AS asset_id, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT asset_id, n, CAST(ceil(n / 32.0) AS BIGINT) AS total_frames FROM d),
        |k AS (SELECT * FROM (
        |        SELECT asset_id, n, unnest(range(0, total_frames)) AS i FROM f) u
        |      WHERE i % 2 = 0)
        |SELECT asset_id, COUNT(*) AS n_frames,
        |       CAST(SUM(LEAST(32, n - i * 32)) AS BIGINT) AS bytes_kept
        |FROM k GROUP BY asset_id""".stripMargin,

    // x34's oracle replicates the KMV sketch: the k smallest distinct
    // md5-60 token hashes per group, and the (k-1)·2^60/h_k estimate as
    // one exact product + one division — the sketch ALGORITHM is checked,
    // not just its row count.
    "x34_distinct_sketch" ->
      """WITH t AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) u),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t),
        |kk AS (SELECT source, h FROM r WHERE rn <= 256)
        |SELECT source, CAST(COUNT(*) AS INTEGER) AS n_kept, MAX(h) AS kth_hash,
        |       CASE WHEN COUNT(*) = 256 THEN 255.0 * 1152921504606846976.0 / MAX(h)
        |            ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
        |FROM kk GROUP BY source""".stripMargin,

    // x35 replicates the whole assembly funnel: md5-canonical dedup,
    // length + 3-gram repetition quality gate, md5-bucket split, per-split
    // accounting — one SQL statement checking the composed pipeline.
    "x35_assembly_funnel" ->
      """WITH canon AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |d AS (SELECT doc.* FROM documents doc JOIN canon USING (doc_id)),
        |g AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |         CAST(greatest(len(string_split(text, ' ')) - 2, 0) AS INTEGER) AS tot,
        |         CAST(len(list_distinct([array_to_string(words[i:i+2], ' ')
        |                                 for i in range(1, len(words) - 1)])) AS INTEGER) AS dis
        |  FROM (SELECT *, string_split(text, ' ') AS words FROM d) t),
        |gated AS (
        |  SELECT * FROM g
        |  WHERE n_words >= 20 AND tot > 0 AND (tot - dis) / tot < 0.2),
        |s AS (
        |  SELECT *, ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |  FROM gated)
        |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_words) AS BIGINT) AS sum_words,
        |       COUNT(DISTINCT source) AS n_sources
        |FROM s GROUP BY 1""".stripMargin,

    // x36 replicates the bottom-k hash-priority sample: min payload per
    // hash, k smallest hashes per group, quantile picks from the sorted
    // sample — the sketch algorithm itself is the contract.
    "x36_sampled_quantiles" ->
      """WITH t AS (
        |  SELECT lang,
        |         ('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
        |         n_chars AS v
        |  FROM documents),
        |m AS (SELECT lang, h, MIN(v) AS v FROM t GROUP BY lang, h),
        |r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM m),
        |kk AS (SELECT lang, v FROM r WHERE rn <= 64),
        |s AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS vr,
        |             COUNT(*) OVER (PARTITION BY lang) AS n FROM kk)
        |SELECT lang, CAST(MAX(n) AS INTEGER) AS n_sample,
        |       MAX(CASE WHEN vr = CAST(ceil(n * 50 / 100.0) AS BIGINT) THEN v END) AS q50_sampled,
        |       MAX(CASE WHEN vr = CAST(ceil(n * 90 / 100.0) AS BIGINT) THEN v END) AS q90_sampled
        |FROM s GROUP BY lang""".stripMargin,

    // x37: the oracle computes the same greedy packing with a direct
    // global cumulative sum — equality with Spark's multi-level distributed
    // prefix sum is exactly what's being checked. `tokens_before` is a
    // DuckDB window SUM over BIGINT, which yields HUGEINT-typed arithmetic
    // — bin_id MUST be cast back to BIGINT or the driver's type-sensitive
    // hash compare flags a mismatch against Spark's LongType.
    "x37_sequence_packing" -> packBinTableSql,

    // x71: the sharded-read audit's oracle IS x37's bin table — the
    // Spark side must reproduce it from the materialized shard files,
    // proving the partitioned write preserves the pack exactly.
    "x71_shard_read_audit" -> packBinTableSql,

    // x38 recomputes the near-dup clusters (same recursive CTE as x17),
    // cluster sizes, and the deterministic 10000-div-size keep rule.
    "x38_cluster_debiased" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_sh, unnest(shingles) AS sh FROM (
        |    SELECT doc_id,
        |           list_distinct([array_to_string(words[i:i+4], ' ')
        |                          for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2),
        |capped AS (
        |  SELECT * FROM sh
        |  WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 100)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |         COUNT(*) AS inter
        |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4
        |  HAVING COUNT(*) / (a.n_sh + b.n_sh - COUNT(*)) >= 0.3),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id),
        |clusters AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id),
        |sized AS (
        |  SELECT c.doc_id, s.cluster_size FROM clusters c
        |  JOIN (SELECT canonical_id, COUNT(*) AS cluster_size FROM clusters GROUP BY 1) s
        |    ON c.canonical_id = s.canonical_id),
        |flagged AS (
        |  SELECT cluster_size,
        |         CASE WHEN ('0x' || substr(md5('cds:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |                   < 10000 // cluster_size THEN 1 ELSE 0 END AS kept
        |  FROM sized)
        |SELECT cluster_size, COUNT(*) AS n_docs_total,
        |       CAST(SUM(kept) AS BIGINT) AS n_docs_kept
        |FROM flagged GROUP BY cluster_size""".stripMargin,

    // x39 replicates the whole paragraph-dedup pipeline: the md5-60
    // content-defined boundary rule (≡ 0 mod 16 — same engine-neutral hash
    // as x03/x04/x27), per-doc running boundary count, paragraph re-join,
    // corpus-wide first-occurrence-by-(doc_id, par_id) dedup on the
    // paragraph digest, and in-order re-assembly of the survivors.
    "x39_paragraph_dedup" ->
      s"""WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, pos, w,
        |         SUM(CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % ${operators.Dedup.ParagraphBoundaryMod} = 0
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS par_id
        |  FROM w),
        |pars AS (
        |  SELECT doc_id, par_id, array_to_string(list(w ORDER BY pos), ' ') AS par
        |  FROM c GROUP BY doc_id, par_id),
        |marked AS (
        |  SELECT doc_id, par_id, par,
        |         row_number() OVER (PARTITION BY md5(par) ORDER BY doc_id, par_id) AS rn
        |  FROM pars),
        |tot AS (SELECT doc_id, COUNT(*) AS n_pars FROM pars GROUP BY doc_id),
        |re AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         array_to_string(list(par ORDER BY par_id), ' ') AS clean_text
        |  FROM marked WHERE rn = 1 GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_pars AS INTEGER) AS n_pars,
        |       CAST(COALESCE(re.n_kept, 0) AS INTEGER) AS n_kept,
        |       COALESCE(re.clean_text, '') AS clean_text
        |FROM tot t LEFT JOIN re USING (doc_id)""".stripMargin,

    // x40: the quality-classifier FEATURE MATRIX (and its heuristic label)
    // is fully deterministic — int/int divisions only — so the whole
    // model-input assembly is oracle-checked; the LogisticRegression
    // fit/score on top is float-iterative and test-gated instead
    // (QualityClassifierSpec) — same split as x18's fit vs dataflow.
    "x40_quality_features" ->
      s"""$qualityFeatureCtes
        |SELECT doc_id, n_words, mean_word_len, stopword_ratio, short_word_ratio,
        |       dup_ratio,
        |       CAST(least(1.0, n_words / 100.0) * (1.0 - short_word_ratio) >= 0.5
        |            AS INTEGER) AS label
        |FROM feat""".stripMargin,

    // x89: the pinned-weight linear scorer over x40's features — ratios
    // quantized with floor(x·1e6) (exact both engines), then an integer
    // dot product with the frozen weights; threshold interpolated from
    // TextAnalysis.Qw*/QualityKeepThresholdMicro.
    "x89_quality_scores" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes
        |SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro,
        |       CAST(($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT))
        |            >= $QualityKeepThresholdMicro AS INTEGER) AS keep
        |FROM feat""".stripMargin
    },

    // x97: quality-ranked per-source cap — x89's scoring SELECT verbatim
    // (shared feature CTEs), then a per-source rank with the doc_id
    // tiebreak; cap interpolated from Sampling.QualityCapPerSource.
    "x97_quality_cap" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |ranked AS (
        |  SELECT d.doc_id, d.source, s.score_micro,
        |         row_number() OVER (PARTITION BY d.source
        |           ORDER BY s.score_micro DESC, d.doc_id) AS rank
        |  FROM documents d JOIN scored s USING (doc_id))
        |SELECT doc_id, source, score_micro, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= ${operators.Sampling.QualityCapPerSource}""".stripMargin
    },

    // x104: preference pairs — x89's scoring CTE verbatim, then the
    // struct-extrema argmax/argmin replicated as (score DESC, doc_id
    // DESC) / (score ASC, doc_id ASC) row_number picks per cell.
    "x104_preference_pairs" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |j AS (SELECT d.doc_id, d.source,
        |             d.n_chars // ${operators.Sampling.PrefBucketChars} AS bucket,
        |             s.score_micro
        |      FROM documents d JOIN scored s USING (doc_id)),
        |r AS (SELECT *,
        |       row_number() OVER (PARTITION BY source, bucket
        |         ORDER BY score_micro DESC, doc_id DESC) AS rb,
        |       row_number() OVER (PARTITION BY source, bucket
        |         ORDER BY score_micro ASC, doc_id ASC) AS rw,
        |       count(*) OVER (PARTITION BY source, bucket) AS nc
        |      FROM j)
        |SELECT source, bucket, CAST(nc AS BIGINT) AS n_candidates,
        |       max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
        |       max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
        |       CAST(max(CASE WHEN rb = 1 THEN score_micro END)
        |          - max(CASE WHEN rw = 1 THEN score_micro END) AS BIGINT) AS margin_micro
        |FROM r WHERE nc >= 2 GROUP BY 1, 2, 3""".stripMargin
    },

    // x41's oracle replicates the count-min sketch end-to-end: the salted
    // md5-60 row hashes ('cm<r>:' prefixes), the depth×width counter
    // cells, and the min-over-rows estimate — the sketch ALGORITHM is the
    // contract, including its one-sided (over-)estimation error.
    "x41_countmin_hitters" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |cells AS (
        |  SELECT r, ('0x' || substr(md5('cm' || r || ':' || w), 1, 15))::BIGINT % ${operators.TextAnalysis.CmWidth} AS b,
        |         COUNT(*) AS cnt
        |  FROM tok, (SELECT unnest([${(0 until operators.TextAnalysis.CmDepth).mkString(", ")}]) AS r) rr
        |  GROUP BY 1, 2),
        |top AS (SELECT w AS word, COUNT(*) AS true_count FROM tok
        |        GROUP BY w ORDER BY true_count DESC, word LIMIT 20),
        |probes AS (
        |  SELECT word, true_count, r,
        |         ('0x' || substr(md5('cm' || r || ':' || word), 1, 15))::BIGINT % ${operators.TextAnalysis.CmWidth} AS b
        |  FROM top, (SELECT unnest([${(0 until operators.TextAnalysis.CmDepth).mkString(", ")}]) AS r) rr)
        |SELECT p.word, p.true_count, MIN(c.cnt) AS est_count,
        |       MIN(c.cnt) - p.true_count AS overcount
        |FROM probes p JOIN cells c USING (r, b)
        |GROUP BY p.word, p.true_count""".stripMargin,

    // x42: corpus-wide term frequencies joined back per token; rarity is
    // RELATIVE (tf·10 below the floor-mean frequency, integer comparison
    // on both engines); SUMs are CAST to BIGINT (DuckDB SUM yields HUGEINT
    // — the x37 lesson) and the ratio is one int/int IEEE division.
    "x42_rare_token_ratio" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT w, COUNT(*) AS tf FROM tok GROUP BY w),
        |s AS (SELECT CAST(SUM(tf) AS BIGINT) AS total_tf, COUNT(*) AS n_vocab FROM tf),
        |j AS (SELECT t.doc_id, t.w,
        |             CASE WHEN f.tf * ${operators.TextAnalysis.RareRelDenom} < s.total_tf // s.n_vocab THEN 1 ELSE 0 END AS r
        |      FROM tok t JOIN tf f USING (w) CROSS JOIN s)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(r) AS BIGINT) AS n_rare,
        |       COUNT(DISTINCT w) AS n_distinct,
        |       CAST(SUM(r) AS BIGINT) / COUNT(*) AS rare_ratio,
        |       CAST(CAST(SUM(r) AS BIGINT) / COUNT(*) >= 0.5 AS INTEGER) AS flagged
        |FROM j GROUP BY doc_id""".stripMargin,

    // x43's oracle is x31's SQL verbatim: the Bloom prefilter is LOSSLESS
    // end-to-end (membership has no false negatives; false positives die
    // in the exact verify join), so the two operators' outputs are
    // bit-identical by construction — the bloom changes the COST shape
    // (per-row bit test instead of probing every shingle), not the answer.
    // DedupSpec asserts the Spark-side equality and the prefilter's
    // effectiveness directly.
    "x43_bloom_decontam" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(shingles) AS sh FROM (
        |    SELECT doc_id, list_distinct([array_to_string(words[i:i+4], ' ')
        |                                  for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2)
        |SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        |FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id < 20 AND c.doc_id >= 20
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,

    // x44 replicates incremental paragraph dedup end-to-end: the same CDC
    // cut as x39, the existing-corpus digest set (doc_id < 250), the
    // within-batch first-occurrence rule, and the per-doc classification
    // rollup. MIN(ROW(...)) mirrors Spark's min(struct(...)); SUMs CAST
    // to BIGINT (DuckDB HUGEINT — the x37 lesson).
    "x44_incremental_dedup" ->
      s"""WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, pos, w,
        |         SUM(CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % ${operators.Dedup.ParagraphBoundaryMod} = 0
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS par_id
        |  FROM w),
        |pars AS (
        |  SELECT doc_id, par_id, md5(array_to_string(list(w ORDER BY pos), ' ')) AS fp
        |  FROM c GROUP BY doc_id, par_id),
        |ex AS (SELECT DISTINCT fp FROM pars WHERE doc_id < ${operators.Dedup.IncrementalNewMinId}),
        |np AS (SELECT * FROM pars WHERE doc_id >= ${operators.Dedup.IncrementalNewMinId}),
        |bf AS (SELECT fp, MIN(ROW(doc_id, par_id)) AS first FROM np GROUP BY fp),
        |cls AS (
        |  SELECT np.doc_id,
        |    CASE WHEN ex.fp IS NOT NULL THEN 'dup_of_existing'
        |         WHEN bf.first <> ROW(np.doc_id, np.par_id) THEN 'dup_in_batch'
        |         ELSE 'kept' END AS status
        |  FROM np LEFT JOIN ex ON np.fp = ex.fp JOIN bf ON np.fp = bf.fp)
        |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_pars,
        |       CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
        |       CAST(SUM(CASE WHEN status = 'dup_of_existing' THEN 1 ELSE 0 END) AS INTEGER) AS n_dup_existing,
        |       CAST(SUM(CASE WHEN status = 'dup_in_batch' THEN 1 ELSE 0 END) AS INTEGER) AS n_dup_batch
        |FROM cls GROUP BY doc_id""".stripMargin,

    // x45: same all-integer chunk-count arithmetic (floor div) and the
    // same inclusive-clamped slice semantics on both engines.
    "x45_chunk_documents" -> {
      val (c, st) = (operators.TextAnalysis.ChunkTokens, operators.TextAnalysis.ChunkStride)
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |n AS (SELECT doc_id, ws,
        |        CAST((greatest(len(ws) - $c, 0) + ${st - 1}) // $st AS INTEGER) + 1 AS n_chunks
        |      FROM d),
        |ex AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_id FROM n)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |       CAST(len(ws[chunk_id*$st+1 : chunk_id*$st+$c]) AS INTEGER) AS n_tokens,
        |       md5(array_to_string(ws[chunk_id*$st+1 : chunk_id*$st+$c], ' ')) AS chunk_md5
        |FROM ex""".stripMargin
    },

    // x46: the oracle is the WINDOW formulation (rank by salted md5-60
    // hash within source, doc_id tie-break, keep rank ≤ cap) — the
    // sketch-threshold plan must select exactly the same rows, which is the
    // whole point: same answer, corpus never shuffled. The (h, doc_id) pair
    // key makes the selection deterministic even under a 60-bit hash
    // collision. Algorithm oracle via the md5 hashes.
    "x46_source_cap" ->
      s"""SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
        |  FROM (SELECT doc_id, source, lang,
        |          ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |        FROM documents) t) r
        |WHERE rn <= ${operators.Sampling.DefaultSourceCap}""".stripMargin,

    // x47: the cleaned corpus — non-benchmark docs minus x31/x43's hit
    // set (the bloom prefilter is output-invisible, so plain SQL suffices).
    "x47_decontaminated" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(shingles) AS sh FROM (
        |    SELECT doc_id, list_distinct([array_to_string(words[i:i+4], ' ')
        |                                  for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2),
        |hits AS (
        |  SELECT c.doc_id
        |  FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id < 20 AND c.doc_id >= 20
        |  GROUP BY c.doc_id, b.doc_id HAVING COUNT(*) >= 3)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id >= 20 AND d.doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin,

    // x48: algorithm oracle — the same √(n_min/n) acceptance thresholds
    // from the same salted md5-60 hashes. All float ops are correctly
    // rounded (divide, sqrt) or exact (×2⁶⁰ exponent shift, floor), so
    // the thresholds — and the kept set — are bit-identical cross-engine.
    "x48_mixture_sample" ->
      s"""WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |mn AS (SELECT min(n) AS n_min FROM counts),
        |th AS (SELECT lang,
        |         CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n) * ${operators.Sampling.HashSpace}) AS BIGINT) AS thresh
        |       FROM counts, mn)
        |SELECT d.doc_id, d.source, d.lang
        |FROM documents d JOIN th USING (lang)
        |WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT < thresh""".stripMargin,

    // x49: corpus bigram frequencies joined back per doc; the score is a
    // BIGINT sum + one double division (log-free on purpose — libm log is
    // not correctly rounded, integer ratios are).
    "x49_bigram_familiarity" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |freq AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cf FROM bg GROUP BY 1)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(f.cf) AS BIGINT) AS sum_cf,
        |       CAST(CAST(sum(f.cf) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS familiarity
        |FROM bg b JOIN freq f USING (bigram) GROUP BY 1""".stripMargin,

    // x94: conditional-bigram fluency — x49's CTE conventions (same
    // tokenization and bigram join rule), then integer-exact conditional
    // points (Scale·c2) // c1 with c1 rolled up FROM the model; docs
    // under two tokens get (0,0) via the left join (x63's rule). Scale
    // interpolated from TextAnalysis.FluencyScale.
    "x94_bigram_fluency" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |model AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
        |firsts AS (SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1
        |           FROM model GROUP BY 1),
        |scored AS (SELECT b.doc_id,
        |             (${operators.TextAnalysis.FluencyScale} * m.c2) // f.c1 AS q
        |           FROM bg b JOIN model m USING (bigram)
        |           JOIN firsts f ON string_split(b.bigram, ' ')[1] = f.w1),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |               CAST(sum(q) AS BIGINT) AS sq
        |        FROM scored GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(COALESCE(a.sq // a.n_bigrams, 0) AS BIGINT) AS fluency_ppm
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // x95: DSIR-style importance weights — hashed-unigram buckets via the
    // md5-60 'dsir:' salt (hashBucket's convention), ONE conditional-sum
    // pass for both sides' counts, add-1-smoothed integer ratio points.
    // Knobs interpolated from Sampling.Dsir*. CTE block shared with
    // x100's resample so the weight definition can't drift.
    "x95_dsir_importance" ->
      s"""WITH $dsirWeightsCtes
        |SELECT doc_id, n_toks, importance_pts, imp_per_tok FROM w""".stripMargin,

    // x100: the resample APPLY over x95's weights — deterministic md5-60
    // coin vs floor(HashSpace * imp / max_imp), both engines computing
    // the threshold with the identical two IEEE double ops.
    "x100_dsir_resample" ->
      s"""WITH $dsirWeightsCtes,
        |mx AS (SELECT max(imp_per_tok) AS max_imp FROM w)
        |SELECT doc_id, n_toks, imp_per_tok FROM w, mx
        |WHERE ('0x' || substr(md5('dsirs:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      < CAST(floor(CAST(${operators.Sampling.HashSpace} AS DOUBLE) * imp_per_tok / max_imp) AS BIGINT)""".stripMargin,

    // x50: algorithm oracle — replicates the bottom-k hash sample
    // (min-value-per-hash, x36's convention), the q10/q90 picks, and the
    // fence filter. The corpus filter itself is exact integer compares.
    "x50_length_trim" ->
      s"""WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |         ('0x' || substr(md5('len:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |m AS (SELECT source, h, MIN(n_chars) AS v FROM t GROUP BY source, h),
        |r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM m),
        |kk AS (SELECT source, v FROM r WHERE rn <= ${operators.Sampling.TrimSampleK}),
        |s AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS vr,
        |             COUNT(*) OVER (PARTITION BY source) AS n FROM kk),
        |f AS (SELECT source,
        |        MAX(CASE WHEN vr = CAST(ceil(n * ${operators.Sampling.TrimLoPct} / 100.0) AS BIGINT) THEN v END) AS lo,
        |        MAX(CASE WHEN vr = CAST(ceil(n * ${operators.Sampling.TrimHiPct} / 100.0) AS BIGINT) THEN v END) AS hi
        |      FROM s GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN f USING (source)
        |WHERE d.n_chars >= f.lo AND d.n_chars <= f.hi""".stripMargin,

    // x51: exact df/cf plus the bottom-k posting sample replicated with
    // x36's min-per-hash convention; both engines emit the sample as a
    // comma-joined numerically-sorted id string.
    "x51_inverted_index" ->
      s"""WITH tf AS (SELECT token, doc_id, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |            GROUP BY 1, 2),
        |ph AS (SELECT token, doc_id, tf,
        |         ('0x' || substr(md5(token || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |       FROM tf),
        |agg AS (SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |        FROM ph GROUP BY 1),
        |m AS (SELECT token, h, MIN(doc_id) AS doc_id FROM ph GROUP BY 1, 2),
        |r AS (SELECT token, doc_id, row_number() OVER (PARTITION BY token ORDER BY h) AS rn FROM m),
        |ps AS (SELECT token, array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= ${operators.TextAnalysis.PostingSampleK})), ',') AS postings_sample
        |       FROM r GROUP BY 1)
        |SELECT a.token, a.df, a.cf, ps.postings_sample FROM agg a JOIN ps USING (token)""".stripMargin,

    // x52: quantize floats with exact/correctly-rounded ops only, sum as
    // BIGINT (order-independent), one double division per dimension.
    "x52_label_centroids" ->
      s"""WITH q AS (SELECT label, i - 1 AS dim,
        |             CAST(floor(CAST(embedding[i] AS DOUBLE) * ${operators.Similarity.CentroidQuantScale}) AS BIGINT) AS qv
        |           FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))
        |SELECT label, CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(qv) AS BIGINT) AS sum_q,
        |       CAST(CAST(sum(qv) AS BIGINT) AS DOUBLE) / count(*) AS centroid_q
        |FROM q GROUP BY 1, 2""".stripMargin,

    // x53: algorithm oracle — per-source bottom-k shingle-hash sketches,
    // union-top-k, and the Broder match count recomputed end-to-end.
    "x53_source_overlap" ->
      s"""WITH sh AS (SELECT source,
        |         unnest(list_distinct([array_to_string(ws[i:i+${operators.Dedup.OverlapShingleN - 1}], ' ')
        |                               for i in range(1, len(ws) - ${operators.Dedup.OverlapShingleN - 2})])) AS sh
        |       FROM (SELECT source, string_split(text, ' ') AS ws FROM documents) t),
        |hh AS (SELECT DISTINCT source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM sh),
        |rr AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
        |sk AS (SELECT source, list_sort(list(h) FILTER (WHERE rn <= ${operators.Dedup.OverlapSketchK})) AS sig
        |       FROM rr GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |        CAST(len(list_intersect(list_sort(list_distinct(a.sig || b.sig))[1:${operators.Dedup.OverlapSketchK}],
        |                                list_intersect(a.sig, b.sig))) AS BIGINT) AS matches,
        |        CAST(len(list_sort(list_distinct(a.sig || b.sig))[1:${operators.Dedup.OverlapSketchK}]) AS BIGINT) AS n_union_k
        |      FROM sk a JOIN sk b ON a.source < b.source)
        |SELECT src_a, src_b, matches, n_union_k,
        |       CAST(matches AS DOUBLE) / n_union_k AS j_est FROM p""".stripMargin,

    // x54: DSIR-style scoring against the benchmark-set bigram model;
    // integer hit counts + one division (log-free, like x49).
    "x54_domain_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |target AS (SELECT bigram, CAST(count(*) AS BIGINT) AS tcf FROM bg WHERE doc_id < 20 GROUP BY 1)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(count(t.bigram) AS BIGINT) AS n_hits,
        |       CAST(COALESCE(CAST(sum(t.tcf) AS BIGINT), 0) AS BIGINT) AS sum_tcf,
        |       CAST(CAST(count(t.bigram) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS hit_ratio
        |FROM bg b LEFT JOIN target t USING (bigram)
        |WHERE b.doc_id >= 20 GROUP BY 1""".stripMargin,

    // x55: Gini–Simpson lexical diversity — integer sums, one int→double
    // conversion, one division, one subtraction; all exact or correctly
    // rounded, so the doubles are bit-identical cross-engine.
    "x55_lexical_diversity" ->
      """WITH tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |            GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(sum(tf * tf) AS BIGINT) AS sum_tf2,
        |       1 - CAST(CAST(sum(tf * tf) AS BIGINT) AS DOUBLE) /
        |           (CAST(sum(tf) AS BIGINT) * CAST(sum(tf) AS BIGINT)) AS simpson
        |FROM tf GROUP BY 1""".stripMargin,

    // x56: algorithm oracle — the quantized x05 score, the bottom-k
    // sample (min-per-hash convention), the nine decile-edge picks, and
    // the edge-count assignment, replicated end-to-end.
    // x256: quality-threshold retention sweep — x56's exact score_q
    // expression, conditional sums per (source × threshold).
    "x256_quality_sweep" -> {
      val thrs = operators.TextAnalysis.SweepThresholds.mkString(", ")
      s"""WITH base AS (
        |  SELECT source,
        |    CAST(floor(least(1.0, len(string_split(text, ' ')) / 100.0) *
        |         (1 - CAST(len(list_filter(string_split(text, ' '), w -> len(w) = 1)) AS DOUBLE)
        |              / len(string_split(text, ' '))) * ${operators.TextAnalysis.CalibQuantScale}) AS BIGINT) AS score_q,
        |    n_chars
        |  FROM documents),
        |t AS (SELECT unnest([$thrs]) AS thr)
        |SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs, CAST(t.thr AS BIGINT) AS thr,
        |       CAST(sum(CASE WHEN score_q >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN score_q >= thr THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
        |       (1000000 * CAST(sum(CASE WHEN score_q >= thr THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS retention_ppm
        |FROM base b, t
        |GROUP BY 1, 3""".stripMargin
    },

    "x56_score_deciles" ->
      s"""$scoreDecileCtes
        |SELECT doc_id, source, score_q, decile FROM dec""".stripMargin,

    // x57: x17's cluster CTE verbatim, then keep only each cluster's
    // canonical (min doc_id) member — the deduplicated shipping corpus.
    "x57_neardedup_corpus" ->
      s"""$clustersCteSql,
        |canon AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars
        |FROM documents d JOIN canon c ON d.doc_id = c.doc_id AND c.doc_id = c.canonical_id""".stripMargin,

    // x58: x27's split rule + x02's capped shingle join, composed: eval
    // docs sharing ≥ LeakMinShared shingles with any train doc. Algorithm
    // oracle via the md5 split buckets; the n-gram width, df cap, and
    // shared-count floor interpolate Dedup's Leak* constants (the
    // NearDupPlanes move-together pattern) so query and oracle can't
    // desync. DuckDB slices are 1-based inclusive: ws[i:i+(n-1)] is an
    // n-gram, and i ranges over 1..len-(n-1) via range's exclusive bound.
    "x58_split_leakage" -> {
      val n = operators.Dedup.LeakShingleN
      s"""WITH sh0 AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(ws[i:i+${n - 1}], ' ')
        |                                       for i in range(1, len(ws) - ${n - 2})])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t),
        |capped AS (SELECT * FROM sh0
        |           WHERE sh NOT IN (SELECT sh FROM sh0 GROUP BY sh
        |                            HAVING COUNT(*) > ${operators.Dedup.LeakMaxShingleDf})),
        |lab AS (SELECT doc_id,
        |          CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |        FROM (SELECT doc_id,
        |                ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |              FROM documents) t),
        |pairs AS (
        |  SELECT e.doc_id AS eval_doc, el.split, t2.doc_id AS train_doc,
        |         CAST(count(*) AS BIGINT) AS shared
        |  FROM capped e JOIN lab el USING (doc_id)
        |  JOIN capped t2 ON e.sh = t2.sh
        |  JOIN lab tl ON t2.doc_id = tl.doc_id AND tl.split = 'train'
        |  WHERE el.split <> 'train'
        |  GROUP BY 1, 2, 3 HAVING count(*) >= ${operators.Dedup.LeakMinShared})
        |SELECT eval_doc, split, CAST(count(*) AS BIGINT) AS n_train_partners,
        |       CAST(max(shared) AS BIGINT) AS max_shared
        |FROM pairs GROUP BY 1, 2""".stripMargin
    },

    // x60: the same ±1 sign matrix and grammar-pinned left-to-right add
    // chains as the Spark plan (hyperplaneSigSql's argument), so every
    // projected double is bit-identical. The 1/√16 = 0.25 scale is exact.
    "x60_random_projection" -> {
      val signs = operators.Similarity.hyperplaneSigns(operators.Similarity.ProjDims, 64)
      val scale = 1.0 / math.sqrt(operators.Similarity.ProjDims.toDouble)
      val projections = (0 until operators.Similarity.ProjDims).map { j =>
        val chain = (0 until 64)
          .map(d => s"${if (signs(j)(d) > 0) "+" else "-"} v[${d + 1}]")
          .mkString("0.0 ", " ", "")
        s"($chain) * $scale AS p$j"
      }.mkString(",\n        |       ")
      s"""SELECT vec_id,
        |       $projections
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings) t""".stripMargin
    },

    // x61: per-(source × split) doc/token/char totals under x27's split
    // rule — the mixture-planning report.
    "x61_token_budget" ->
      """SELECT source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT *,
        |        ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |      FROM documents) t
        |GROUP BY 1, 2""".stripMargin,

    // x62: char-level exact-substring decontamination — algorithm oracle
    // replicating the per-position md5-60 gram hashing and the hash join
    // (substr over unnest(range); range's upper bound is exclusive, so
    // len-k+2 yields positions 1..len-k+1). Gram width and the benchmark
    // boundary interpolate Dedup's Decontam* constants.
    "x62_substring_decontam" ->
      s"""$substringContamCtes
        |SELECT c.doc_id,
        |       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_partners,
        |       CAST(count(DISTINCT c.gh) AS BIGINT) AS n_gram_hits
        |FROM corp c JOIN bench b USING (gh)
        |GROUP BY 1""".stripMargin,

    // x64: x47's removal twin for the char-level detector — x62's CTEs
    // verbatim, then keep every non-benchmark doc with NO gram hit.
    "x64_substring_decontaminated" ->
      s"""$substringContamCtes,
        |flagged AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b USING (gh))
        |SELECT d.doc_id, d.source, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id >= ${operators.Dedup.DecontamBenchMaxId}
        |  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)""".stripMargin,

    // x65: integer cross-multiplied token drift between the existing
    // corpus and the new shard (x44's boundary) — rational-form rate
    // difference, no floats, so values and the top-20 cut are exact in
    // both engines (ties broken by word).
    "x65_token_drift" ->
      s"""WITH tok AS (
        |  SELECT doc_id >= ${operators.Dedup.IncrementalNewMinId} AS is_new,
        |         unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old,
        |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new
        |  FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_old) AS BIGINT) AS n_old,
        |               CAST(sum(c_new) AS BIGINT) AS n_new FROM cnt)
        |SELECT w, c_old, c_new,
        |       CAST(abs(c_old * n_new - c_new * n_old) AS BIGINT) AS drift
        |FROM cnt, tot
        |ORDER BY drift DESC, w LIMIT 20""".stripMargin,

    // x66: Gopher-style within-doc repetition signals, pure integers.
    "x66_repetition_metrics" ->
      s"""$repetitionMetricsCteSql
        |SELECT doc_id, n_words, n_distinct, max_tf, n_2grams, n_dup_2grams FROM m""".stripMargin,

    // x67: the filter over x66's CTE — integer cross-multiplied rules,
    // thresholds interpolated from TextAnalysis.Rep* constants.
    "x67_repetition_filter" ->
      s"""$repetitionMetricsCteSql
        |SELECT d.doc_id, d.source, d.lang, d.n_chars
        |FROM documents d JOIN m USING (doc_id)
        |WHERE (m.n_words - m.n_distinct) * 100 <=
        |        m.n_words * ${operators.TextAnalysis.RepMaxDupWordPct}
        |  AND m.max_tf * 100 <= m.n_words * ${operators.TextAnalysis.RepMaxTopWordPct}
        |  AND m.n_dup_2grams * 100 <=
        |        m.n_2grams * ${operators.TextAnalysis.RepMaxDup2gramPct}""".stripMargin,

    // x63: x61's budget with BPE-accurate token counts — the oracle
    // replicates BpeEncode's greedy loop as a recursive CTE over the
    // (tiny) distinct-word set: each step finds the lowest-rank merge
    // whose pair occurs adjacently, rewrites the symbol list (pinned
    // merges have left ≠ right, so occurrences never overlap and the
    // one-pass left-to-right merge is a simultaneous rewrite), and
    // terminal states (no applicable merge) carry each word's token
    // count back onto the per-occurrence join. Merge table interpolated
    // from TextAnalysis.PinnedBpeMerges (LshPlanes pattern).
    "x63_bpe_token_budget" ->
      s"""$bpeTermCteSql,
        |occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |doctoks AS (SELECT o.doc_id, sum(t.n_toks) AS toks
        |            FROM occ o JOIN term t USING (w) GROUP BY 1),
        |lab AS (SELECT doc_id, source, len(string_split(text, ' ')) AS ws,
        |          CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |        FROM (SELECT *,
        |                ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |              FROM documents) t)
        |SELECT l.source, l.split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(coalesce(d.toks, 0)) AS BIGINT) AS bpe_tokens,
        |       CAST(sum(l.ws) AS BIGINT) AS ws_tokens
        |FROM lab l LEFT JOIN doctoks d USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,

    // x76: token-budget chunking under the pinned tokenizer — per-word
    // counts from the shared recursive BPE CTE (empty words count 0 via
    // the LEFT JOIN), cumulative sum per doc, floor-division chunk ids.
    "x76_bpe_chunks" ->
      s"""$bpeTermCteSql,
        |occ AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
        |             unnest(range(1, len(ws) + 1)) AS u(i)),
        |wt AS (SELECT o.doc_id, o.pos, coalesce(t.n_toks, 0) AS n_toks
        |       FROM occ o LEFT JOIN term t USING (w)),
        |cum AS (SELECT doc_id, pos, n_toks,
        |          sum(n_toks) OVER (PARTITION BY doc_id ORDER BY pos) AS cum_after
        |        FROM wt)
        |SELECT doc_id,
        |       CAST((cum_after - n_toks) // ${operators.TextAnalysis.BpeChunkBudget} AS BIGINT) AS chunk_id,
        |       CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(n_toks) AS BIGINT) AS chunk_tokens,
        |       CAST(min(pos) AS BIGINT) AS first_word,
        |       CAST(max(pos) AS BIGINT) AS last_word
        |FROM cum GROUP BY 1, 2""".stripMargin,

    // x69: the unified ship-corpus assembly — the composed funnel's
    // oracle reuses each stage's CTEs VERBATIM (clusters from x17/x57,
    // char grams from x62/x64, repetition metrics from x66/x67; the
    // word-shingle hits reuse the cluster CTE's `sh`, which is x47's
    // shingle definition plus an n_sh column; bench boundary 20 and
    // min-shared 3 are x43/x47's values), so the composition cannot
    // diverge from the standalone stages it stacks.
    "x69_ship_corpus" ->
      s"""$clustersCteSql,
        |canon AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id),
        |${substringContamCtes.stripPrefix("WITH ")},
        |${repetitionMetricsCteSql.stripPrefix("WITH ")},
        |whits AS (
        |  SELECT c.doc_id
        |  FROM sh c JOIN sh b ON c.sh = b.sh AND b.doc_id < 20 AND c.doc_id >= 20
        |  GROUP BY c.doc_id, b.doc_id HAVING COUNT(*) >= 3),
        |chits AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b USING (gh)),
        |surv AS (
        |  SELECT d.doc_id, d.source, d.lang, d.n_chars, m.n_words AS ws_toks
        |  FROM documents d JOIN m USING (doc_id) JOIN canon c ON d.doc_id = c.doc_id
        |  WHERE d.doc_id >= ${operators.Dedup.DecontamBenchMaxId}
        |    AND c.doc_id = c.canonical_id
        |    AND d.doc_id NOT IN (SELECT doc_id FROM whits)
        |    AND d.doc_id NOT IN (SELECT doc_id FROM chits)
        |    AND (m.n_words - m.n_distinct) * 100 <=
        |          m.n_words * ${operators.TextAnalysis.RepMaxDupWordPct}
        |    AND m.max_tf * 100 <= m.n_words * ${operators.TextAnalysis.RepMaxTopWordPct}
        |    AND m.n_dup_2grams * 100 <=
        |          m.n_2grams * ${operators.TextAnalysis.RepMaxDup2gramPct}),
        |capped_surv AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
        |    FROM (SELECT *,
        |            ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |          FROM surv) t1) t2
        |  WHERE rn <= ${operators.Sampling.DefaultSourceCap})
        |SELECT source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT *,
        |        ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |      FROM capped_surv) t
        |GROUP BY 1, 2""".stripMargin,

    // x70: best-member cluster keep — x17's cluster CTE, then one
    // survivor per cluster by (longest document, lowest doc_id); the
    // oracle ranks with a window (DuckDB-side only — the Spark plan is a
    // partial-aggregable min_by, never a corpus window).
    "x70_best_keep" ->
      s"""$clustersCteSql,
        |canon AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id),
        |m AS (
        |  SELECT c.canonical_id AS cluster_id, d.doc_id, d.source, d.lang, d.n_chars,
        |         row_number() OVER (PARTITION BY c.canonical_id
        |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn,
        |         count(*) OVER (PARTITION BY c.canonical_id) AS n_members
        |  FROM documents d JOIN canon c ON d.doc_id = c.doc_id)
        |SELECT cluster_id, doc_id, source, lang, n_chars,
        |       CAST(n_members AS BIGINT) AS n_members
        |FROM m WHERE rn = 1""".stripMargin,

    // x68: cross-document exact-substring duplicate pairs — x62's gram
    // hashing turned corpus-vs-corpus (doc_a < doc_b), with the hot-gram
    // stop-list cap interpolated from Dedup.CrossDocMaxGramDf. Algorithm
    // oracle: the same per-position md5-60 grams, df cap as NOT IN, then
    // the bucket self-join.
    "x68_crossdoc_substrings" ->
      s"""WITH $crossDocPairCtes
        |SELECT doc_a, doc_b, n_shared_grams FROM xpairs
        |WHERE n_shared_grams >= ${operators.Dedup.CrossDocMinShared}""".stripMargin,

    // x72: x68's removal step — drop every doc with a lower-id substring
    // partner; the pair CTEs are shared verbatim so removal can't
    // diverge from detection.
    "x72_crossdoc_deduped" ->
      s"""WITH $crossDocPairCtes
        |SELECT d.doc_id, d.source, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_b FROM xpairs)""".stripMargin,

    // x73: BM25-family ranked retrieval — the log-free rational scoring
    // replicated term-for-term (Retrieval.pointsSqlExpr's algebra with
    // DuckDB's // integer division), pinned query set interpolated from
    // Retrieval.Bm25Queries, top-k per query by (score desc, doc_id).
    "x73_bm25_topk" -> {
      val qrows = operators.Retrieval.Bm25Queries
        .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }.mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $qrows),
        |tot AS (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w_total,
        |               CAST(count(*) AS BIGINT) AS n_docs
        |        FROM documents),
        |tok AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS term
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t),
        |tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE term IN (SELECT term FROM q)
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |         CAST(count(*) AS BIGINT) AS n_terms,
        |         CAST(sum((${operators.Retrieval.Bm25Scale}::BIGINT * 22 * tf.tf * w_total
        |                    * (2 * (n_docs - df.df) + 1))
        |               // ((10 * tf.tf * w_total + 3 * w_total + 9 * tf.dl * n_docs)
        |                    * (2 * df.df + 1))) AS BIGINT) AS score_pts
        |       FROM tf JOIN df USING (term) JOIN q USING (term), tot
        |       GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, n_terms, score_pts
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |                     ORDER BY score_pts DESC, doc_id) AS BIGINT) AS rank
        |      FROM sc) r
        |WHERE rank <= ${operators.Retrieval.Bm25TopK}""".stripMargin
    },

    // x80: the curriculum read order — x56's decile CTEs verbatim, then
    // x74's sharded-order materialization with shard led by the decile
    // band (9 − decile) so shard order IS curriculum order.
    "x80_curriculum" -> {
      val spd = operators.Sampling.CurriculumShardsPerDecile
      val w = operators.Sampling.HashSpace / spd
      s"""$scoreDecileCtes,
        |k AS (SELECT doc_id, source, decile,
        |        ('0x' || substr(md5('curr:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM dec)
        |SELECT CAST((9 - decile) * $spd + h // $w AS BIGINT) AS shard,
        |       CAST(row_number() OVER (PARTITION BY (9 - decile) * $spd + h // $w
        |                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
        |       doc_id, source, decile, h
        |FROM k""".stripMargin
    },

    // x81: x37's bin rule over x74's epoch-1 order — the oracle computes
    // the global running token count with ONE window ordered by
    // (shard, h, doc_id), which is exactly the (shard, pos) read order.
    "x81_shuffled_pack" -> {
      val shardWidth = operators.Sampling.HashSpace / operators.Sampling.ShuffleShards
      s"""WITH e AS (SELECT doc_id,
        |        ('0x' || substr(md5('epoch:1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |s AS (SELECT doc_id, h, n_tokens, h // ${shardWidth} AS shard FROM e),
        |c AS (SELECT *,
        |        COALESCE(SUM(n_tokens) OVER (ORDER BY shard, h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |      FROM s)
        |SELECT CAST(tokens_before // 512 AS BIGINT) AS bin_id,
        |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |       MIN(shard) AS first_shard, MAX(shard) AS last_shard
        |FROM c GROUP BY 1""".stripMargin
    },

    // x83: per-(source × split) data card — totals, length envelope, and
    // the bottom-k hash sample replicated with x51's min-per-hash
    // convention (value-sorted, comma-joined).
    "x83_data_card" ->
      s"""WITH d AS (SELECT source,
        |        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
        |        doc_id, n_chars, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |        ('0x' || substr(md5('card:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM (SELECT *,
        |              ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |            FROM documents) t),
        |m AS (SELECT source, split, h, MIN(doc_id) AS doc_id FROM d GROUP BY 1, 2, 3),
        |r AS (SELECT source, split, doc_id,
        |        row_number() OVER (PARTITION BY source, split ORDER BY h) AS rn FROM m),
        |ps AS (SELECT source, split,
        |         array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= ${operators.Sampling.CardSampleK})), ',') AS sample_ids
        |       FROM r GROUP BY 1, 2),
        |agg AS (SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(toks) AS BIGINT) AS ws_tokens,
        |          MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |        FROM d GROUP BY 1, 2)
        |SELECT agg.source, agg.split, agg.n_docs, agg.ws_tokens,
        |       agg.min_chars, agg.max_chars, ps.sample_ids
        |FROM agg JOIN ps USING (source, split)""".stripMargin,

    // x85: per-user chronological lag with the (ts_s, event_id) total
    // order key — x11's ordering convention.
    "x85_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type,
        |       CAST(count(*) AS BIGINT) AS n_transitions,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // x86: strict-order conversion funnel over per-user first-touch
    // times; stages interpolated from Sessionize.FunnelStages.
    "x86_funnel" -> {
      val stages = operators.Sessionize.FunnelStages
      val mins = stages.map(st =>
        s"MIN(CASE WHEN event_type = '$st' THEN ts_s END) AS t_$st").mkString(",\n        |         ")
      val sums = stages.indices.map { k =>
        val present = stages.take(k + 1).map(st => s"t_$st IS NOT NULL").mkString(" AND ")
        val ordered = (1 to k).map(i => s"t_${stages(i - 1)} < t_${stages(i)}")
        val cond = (Seq(present) ++ ordered).mkString(" AND ")
        s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_$k"
      }.mkString(",\n        |        ")
      val rows = stages.indices.map(i =>
        s"SELECT CAST(${i + 1} AS BIGINT) AS stage, '${stages(i)}' AS event_type, n_$i AS n_users, n_total FROM c").mkString("\n        |UNION ALL ")
      s"""WITH ev AS (SELECT user_id, event_type,
        |              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |pu AS (SELECT user_id,
        |         $mins
        |       FROM ev GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |        $sums
        |      FROM pu)
        |$rows""".stripMargin
    },

    // x90: per-source dedup rates — x17's cluster CTEs verbatim, counts
    // of canonical vs dropped members per source.
    "x90_dedup_rates" ->
      s"""$clustersCteSql,
        |canon AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN c.doc_id = c.canonical_id THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
        |       CAST(sum(CASE WHEN c.doc_id = c.canonical_id THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |FROM documents d JOIN canon c USING (doc_id)
        |GROUP BY 1""".stripMargin,

    // x92: cross-source mirror pairs — x17's cluster CTEs verbatim, then
    // distinct (cluster, source) memberships self-joined on cluster id.
    "x92_mirror_pairs" ->
      s"""$clustersCteSql,
        |canon AS (SELECT doc_id, MIN(label) AS canonical_id FROM reach GROUP BY doc_id),
        |m AS (SELECT DISTINCT c.canonical_id, d.source
        |      FROM canon c JOIN documents d USING (doc_id))
        |SELECT a.source AS source_a, b.source AS source_b,
        |       CAST(count(DISTINCT a.canonical_id) AS BIGINT) AS n_shared_clusters
        |FROM m a JOIN m b ON a.canonical_id = b.canonical_id AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // x93: per-label embedding audit — norms quantized with floor(·1e6)
    // over the same left-to-right sum-of-squares fold (x09's argument).
    "x93_embedding_audit" ->
      """WITH e AS (
        |  SELECT label, CAST(len(embedding) AS INTEGER) AS n_dims,
        |         CAST(floor(sqrt(list_aggregate(list_transform(
        |             CAST(embedding AS DOUBLE[]), x -> x*x), 'sum')) * 1000000) AS BIGINT) AS norm_q
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(count(DISTINCT n_dims) AS BIGINT) AS n_distinct_dims,
        |       CAST(sum(CASE WHEN norm_q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
        |       MIN(norm_q) AS min_norm_q, MAX(norm_q) AS max_norm_q
        |FROM e GROUP BY 1""".stripMargin,

    // x91: weekly growth curve — integer epoch weeks; the cumulative sum
    // runs over the tiny weekly aggregate.
    "x91_user_growth" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |              CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
        |            FROM events),
        |act AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |        FROM wk GROUP BY 1),
        |fw AS (SELECT MIN(week) AS week FROM wk GROUP BY user_id),
        |nw AS (SELECT week, CAST(count(*) AS BIGINT) AS n_new FROM fw GROUP BY 1)
        |SELECT act.week, act.n_active,
        |       CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new,
        |       CAST(SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY act.week
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM act LEFT JOIN nw USING (week)""".stripMargin,

    // x88: weekly retention triangle — integer epoch-week indices.
    "x88_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |              CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
        |            FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT c.cohort_week, wk.week - c.cohort_week AS week_offset,
        |       CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        |FROM wk JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // x87: hourly error-spike monitor — integer cross-multiplied trailing
    // comparison over a RANGE (clock-hour) frame, denominator = elapsed
    // hours capped at the window; factor/window from Sessionize.Spike*.
    "x87_error_spikes" ->
      s"""WITH h AS (
        |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_start_s,
        |         CAST(count(*) AS BIGINT) AS n_errors
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |t AS (SELECT *,
        |        CAST(least(${operators.Sessionize.SpikeTrailingHours},
        |          (hour_start_s - min(hour_start_s) OVER (ORDER BY hour_start_s
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // 3600)
        |          AS BIGINT) AS trailing_hours,
        |        CAST(COALESCE(sum(n_errors) OVER w, 0) AS BIGINT) AS trailing_errors
        |      FROM h
        |      WINDOW w AS (ORDER BY hour_start_s
        |        RANGE BETWEEN ${operators.Sessionize.SpikeTrailingHours * 3600} PRECEDING
        |          AND 3600 PRECEDING))
        |SELECT hour_start_s, n_errors, trailing_hours, trailing_errors,
        |       CAST(CASE WHEN trailing_hours > 0
        |                  AND n_errors * trailing_hours >
        |                      ${operators.Sessionize.SpikeFactor} * trailing_errors
        |             THEN 1 ELSE 0 END AS INTEGER) AS spike
        |FROM t""".stripMargin,

    // x101: exponentially-weighted hourly popularity — power-of-two lag
    // weights over the trailing EwmaHours clock hours, replicated with
    // the same BIGINT shifts; quiet hours contribute 0 via the inner
    // lag join on clock-hour arithmetic.
    "x101_ewma_popularity" -> {
      val w = operators.Sessionize.EwmaHours
      s"""WITH h AS (
        |  SELECT event_type,
        |         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_start_s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, hour_start_s, k
        |      FROM h, unnest(range(0, $w)) AS t(k)),
        |j AS (SELECT a.event_type, a.hour_start_s, a.k, h2.n
        |      FROM a JOIN h h2 ON h2.event_type = a.event_type
        |       AND h2.hour_start_s = a.hour_start_s - a.k * 3600)
        |SELECT event_type, hour_start_s,
        |       CAST(sum(CASE WHEN k = 0 THEN n END) AS BIGINT) AS n_events,
        |       CAST(sum(n * (CAST(1 AS BIGINT) << (${w - 1} - k))) AS BIGINT) AS ewma_pts
        |FROM j GROUP BY 1, 2""".stripMargin
    },

    // x103: PMI-ranked collocations — x49's tokenize/bigram CTE
    // conventions, log-free fixed-point ratio, deterministic
    // (pmi desc, w1, w2) top-k. Knobs interpolated from TextAnalysis.
    "x103_pmi_bigrams" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |uni AS (SELECT u.w, CAST(count(*) AS BIGINT) AS c
        |        FROM tok, unnest(ws) AS u(w) GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(count(*) AS BIGINT) AS c_xy
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)
        |       GROUP BY 1, 2
        |       HAVING count(*) >= ${operators.TextAnalysis.PmiMinCount})
        |SELECT b.w1, b.w2, b.c_xy, u1.c AS c_1, u2.c AS c_2,
        |       (${operators.TextAnalysis.PmiScale} * b.c_xy * n.n_tokens) // (u1.c * u2.c)
        |         AS pmi_millis
        |FROM bg b JOIN uni u1 ON b.w1 = u1.w
        |          JOIN uni u2 ON b.w2 = u2.w, n
        |ORDER BY pmi_millis DESC, b.w1, b.w2
        |LIMIT ${operators.TextAnalysis.PmiTopK}""".stripMargin,

    // x105: per-source vocabulary audit — tokens/types/hapax counts with
    // the single-IEEE-division ratio discipline.
    "x105_vocab_audit" ->
      """WITH c AS (SELECT source, u.token, CAST(count(*) AS BIGINT) AS c
        |           FROM (SELECT source, string_split(text, ' ') AS ws FROM documents),
        |                unnest(ws) AS u(token)
        |           GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS ttr,
        |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS BIGINT) AS hapax_ratio
        |FROM c GROUP BY 1""".stripMargin,

    // x108: degree histogram of the undirected purchase graph — the
    // same edge derivation as x77, parity decode on the node key.
    "x108_degree_hist" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1)
        |SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
        |       deg, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY 1, 2""".stripMargin,

    // x133: KMV accuracy audit — x34's sketch CTE verbatim joined to
    // the exact distinct count; signed error is a subtraction, the ppm
    // floors a composition of exact IEEE ops on replicated inputs.
    "x133_sketch_audit" ->
      """WITH t AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) u),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t),
        |kk AS (SELECT source, h FROM r WHERE rn <= 256),
        |sk AS (SELECT source, CAST(COUNT(*) AS INTEGER) AS n_kept, MAX(h) AS kth_hash,
        |              CASE WHEN COUNT(*) = 256 THEN 255.0 * 1152921504606846976.0 / MAX(h)
        |                   ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
        |       FROM kk GROUP BY source),
        |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct FROM t GROUP BY 1)
        |SELECT source, exact_distinct, n_kept, est_distinct,
        |       est_distinct - exact_distinct AS err_est,
        |       CAST(floor(abs(est_distinct - exact_distinct) * 1000000.0
        |         / exact_distinct) AS BIGINT) AS abs_err_ppm
        |FROM sk JOIN ex USING (source)""".stripMargin,

    // x134: bounded-domain skyline — per-size min price, the suffix-min
    // staircase over the tiny size frame, inner join back (≡ semi: one
    // frontier row per (size, price)).
    "x134_pareto_parts" ->
      """WITH parts AS (
        |  SELECT p_partkey, p_name, p_size,
        |         CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |  FROM part),
        |bysize AS (SELECT p_size AS f_size, MIN(price_cents) AS min_price_cents
        |           FROM parts GROUP BY 1),
        |fr AS (SELECT f_size, min_price_cents,
        |              MIN(min_price_cents) OVER (ORDER BY f_size DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_larger
        |       FROM bysize)
        |SELECT p.p_partkey, p.p_name, p.p_size, p.price_cents
        |FROM parts p
        |JOIN (SELECT f_size, min_price_cents FROM fr
        |      WHERE best_larger IS NULL OR best_larger > min_price_cents) f
        |  ON p.p_size = f.f_size AND p.price_cents = f.min_price_cents""".stripMargin,

    // x135: mean-shift split — prefix sums over the daily frame, totals
    // CTE crossed in. The ranking score is the |mean gap| computed as
    // two exact-operand IEEE divisions (r16: the cross-multiplied BIGINT
    // form wrapped at sf1, and the HUGEINT widening was rejected because
    // DuckDB's HUGEINT→DOUBLE cast is not correctly rounded above 2^64);
    // earliest-day tiebreak.
    "x135_mean_shift" ->
      """WITH daily AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |               CAST(SUM(rev) AS BIGINT) AS rev_total FROM daily),
        |cum AS (SELECT day,
        |               CAST(SUM(n) OVER w AS BIGINT) AS n_before,
        |               CAST(SUM(rev) OVER w AS BIGINT) AS rev_before_cents
        |        FROM daily
        |        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sc AS (SELECT day, n_before, rev_before_cents,
        |              n_total - n_before AS n_after,
        |              rev_total - rev_before_cents AS rev_after_cents
        |       FROM cum, tot),
        |s2 AS (SELECT *,
        |              abs(CAST(rev_before_cents AS DOUBLE) / CAST(n_before AS DOUBLE)
        |                  - CAST(rev_after_cents AS DOUBLE) / CAST(n_after AS DOUBLE)) AS shift_dbl
        |       FROM sc WHERE n_after > 0)
        |SELECT day AS split_day, n_before, n_after, rev_before_cents, rev_after_cents,
        |       CAST(rev_before_cents AS DOUBLE) / CAST(n_before AS DOUBLE) AS mean_before_dbl,
        |       CAST(rev_after_cents AS DOUBLE) / CAST(n_after AS DOUBLE) AS mean_after_dbl,
        |       shift_dbl
        |FROM s2 ORDER BY shift_dbl DESC, day LIMIT 1""".stripMargin,

    // x136: gaps-and-islands — island id = month_index − row_number per
    // customer, longest run per customer, segment census.
    "x136_purchase_streaks" ->
      """WITH mo AS (SELECT DISTINCT o_custkey,
        |                   year(o_orderdate)*12 + month(o_orderdate) - 1 AS m
        |            FROM orders),
        |rk AS (SELECT o_custkey, m,
        |              row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS rn
        |       FROM mo),
        |st AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS streak
        |       FROM rk GROUP BY o_custkey, m - rn),
        |lg AS (SELECT o_custkey, CAST(MAX(streak) AS BIGINT) AS longest_streak
        |       FROM st GROUP BY 1)
        |SELECT c_mktsegment, longest_streak, CAST(count(*) AS BIGINT) AS n_customers
        |FROM lg JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    // x137: integer-quantized RRF — x89's scoring CTE verbatim for the
    // quality arm, x55's distinct-token count for the richness arm,
    // top-100 each (rank before LIMIT keeps ranks 1..100), full outer
    // fusion with 1000000 // (60 + rank) micro-unit credits.
    "x137_rrf_consensus" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |q AS (SELECT doc_id,
        |             CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS r_quality
        |      FROM scored ORDER BY score_micro DESC, doc_id LIMIT 100),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        |       GROUP BY 1, 2),
        |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct FROM tf GROUP BY 1),
        |r AS (SELECT doc_id,
        |             CAST(row_number() OVER (ORDER BY n_distinct DESC, doc_id) AS BIGINT) AS r_richness
        |      FROM nd ORDER BY n_distinct DESC, doc_id LIMIT 100)
        |SELECT COALESCE(q.doc_id, r.doc_id) AS doc_id, r_quality, r_richness,
        |       CAST(COALESCE(1000000 // (60 + r_quality), 0)
        |          + COALESCE(1000000 // (60 + r_richness), 0) AS BIGINT) AS rrf_micro
        |FROM q FULL JOIN r ON q.doc_id = r.doc_id""".stripMargin
    },

    // x138: SCD2 episode build — x132's rank CTE, tier-change filter
    // (rn=1 opens the bronze episode), lead() closes each interval.
    "x138_tier_intervals" -> {
      import operators.Relational.{TierGoldAt, TierSilverAt}
      def t(e: String) =
        s"CASE WHEN $e < $TierSilverAt THEN 'bronze' WHEN $e < $TierGoldAt THEN 'silver' ELSE 'gold' END"
      s"""WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |  FROM orders),
        |rk AS (SELECT o_custkey, day,
        |              row_number() OVER (PARTITION BY o_custkey
        |                ORDER BY day, o_orderkey) AS rn
        |       FROM o),
        |ep AS (SELECT o_custkey, rn, day AS valid_from_day,
        |              ${t("rn")} AS tier
        |       FROM rk
        |       WHERE rn = 1 OR ${t("rn")} <> ${t("(rn - 1)")})
        |SELECT o_custkey, tier, valid_from_day,
        |       lead(valid_from_day) OVER (PARTITION BY o_custkey ORDER BY rn) AS valid_to_day
        |FROM ep""".stripMargin
    },

    // x139: referential-integrity panel — NOT EXISTS per relationship
    // (null keys count as orphans, matching the anti-join).
    "x139_integrity_audit" -> {
      def rel(name: String, child: String, key: String,
              parent: String, pkey: String) =
        s"""SELECT '$name' AS relationship,
          |       CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_child_rows,
          |       CAST((SELECT count(*) FROM $child c WHERE NOT EXISTS
          |             (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key)) AS BIGINT) AS n_orphan_rows""".stripMargin
      Seq(
        rel("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        rel("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        rel("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        rel("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        rel("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ).mkString("\nUNION ALL\n")
    },

    // x140: column profile — one aggregate CTE, panel rows via UNION ALL
    // (DuckDB's stack()); categorical min/max stays NULL by design.
    "x140_profile_orders" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |                  CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS order_day,
        |                  o_orderstatus, o_orderpriority
        |           FROM orders),
        |a AS (SELECT
        |  CAST(count(o_orderkey) AS BIGINT) AS nn1, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
        |  MIN(o_orderkey) AS mn1, MAX(o_orderkey) AS mx1,
        |  CAST(count(o_custkey) AS BIGINT) AS nn2, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
        |  MIN(o_custkey) AS mn2, MAX(o_custkey) AS mx2,
        |  CAST(count(total_cents) AS BIGINT) AS nn3, CAST(count(DISTINCT total_cents) AS BIGINT) AS nd3,
        |  MIN(total_cents) AS mn3, MAX(total_cents) AS mx3,
        |  CAST(count(order_day) AS BIGINT) AS nn4, CAST(count(DISTINCT order_day) AS BIGINT) AS nd4,
        |  MIN(order_day) AS mn4, MAX(order_day) AS mx4,
        |  CAST(count(o_orderstatus) AS BIGINT) AS nn5, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd5,
        |  CAST(count(o_orderpriority) AS BIGINT) AS nn6, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd6
        |  FROM t)
        |SELECT 'o_orderkey' AS column_name, nn1 AS n_nonnull, nd1 AS n_distinct, mn1 AS min_v, mx1 AS max_v FROM a
        |UNION ALL SELECT 'o_custkey', nn2, nd2, mn2, mx2 FROM a
        |UNION ALL SELECT 'o_totalprice_cents', nn3, nd3, mn3, mx3 FROM a
        |UNION ALL SELECT 'o_orderdate_day', nn4, nd4, mn4, mx4 FROM a
        |UNION ALL SELECT 'o_orderstatus', nn5, nd5, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM a
        |UNION ALL SELECT 'o_orderpriority', nn6, nd6, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM a""".stripMargin,

    // x141: rank() WITH ties — every part tying a top-3 line-item count
    // reports; no tiebreak column, the output is deterministic as a set.
    "x141_brand_top_parts" ->
      """WITH pp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lineitems
        |            FROM lineitem GROUP BY 1),
        |j AS (SELECT p_brand, p_partkey, n_lineitems
        |      FROM pp JOIN part ON l_partkey = p_partkey),
        |r AS (SELECT *, CAST(rank() OVER (PARTITION BY p_brand
        |                     ORDER BY n_lineitems DESC) AS BIGINT) AS rnk
        |      FROM j)
        |SELECT p_brand, p_partkey, n_lineitems, rnk FROM r WHERE rnk <= 3""".stripMargin,

    // x142: log2 histogram — bucket = bit-length via length(bin(v)),
    // integer-exact in both engines; edges reconstructed by shifts.
    "x142_value_histogram" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v
        |           FROM orders
        |           WHERE CAST(round(o_totalprice*100) AS BIGINT) > 0)
        |SELECT CAST(length(bin(v)) AS BIGINT) AS bucket,
        |       (1::BIGINT << (CAST(length(bin(v)) AS BIGINT) - 1)) AS lo_cents,
        |       (1::BIGINT << CAST(length(bin(v)) AS BIGINT)) - 1 AS hi_cents,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(v) AS BIGINT) AS sum_cents
        |FROM v GROUP BY 1, 2, 3""".stripMargin,

    // x143: header-vs-lines reconciliation — line totals aggregated per
    // order first, left join, integer-cents drift panel per status.
    "x143_reconcile_orders" ->
      """WITH lt AS (SELECT l_orderkey,
        |                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS line_cents
        |            FROM lineitem GROUP BY 1)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CASE WHEN COALESCE(line_cents, 0) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_lines,
        |       CAST(SUM(CASE WHEN CAST(round(o_totalprice*100) AS BIGINT) = COALESCE(line_cents, 0)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |       CAST(SUM(abs(CAST(round(o_totalprice*100) AS BIGINT) - COALESCE(line_cents, 0))) AS BIGINT) AS abs_drift_cents
        |FROM orders LEFT JOIN lt ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    // x144: MERGE-apply — the pinned CDC batch (mod-7 updates, mod-13
    // negated-key inserts), EXISTS/NOT EXISTS replicating the
    // semi/anti match phases.
    "x144_cdc_merge" ->
      """WITH snap AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |upd AS (SELECT doc_id, lang, 'cdc_update' AS source,
        |               CAST(length(text) AS BIGINT) AS n_chars
        |        FROM documents WHERE doc_id % 7 = 0),
        |ins AS (SELECT -doc_id AS doc_id, lang, 'cdc_insert' AS source, n_chars
        |        FROM documents WHERE doc_id % 13 = 0 AND doc_id <> 0),
        |cdc AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT s.doc_id, s.lang, s.source, s.n_chars, 'kept' AS change_type
        |FROM snap s WHERE NOT EXISTS (SELECT 1 FROM cdc c WHERE c.doc_id = s.doc_id)
        |UNION ALL
        |SELECT c.doc_id, c.lang, c.source, c.n_chars, 'updated' AS change_type
        |FROM cdc c WHERE EXISTS (SELECT 1 FROM snap s WHERE s.doc_id = c.doc_id)
        |UNION ALL
        |SELECT c.doc_id, c.lang, c.source, c.n_chars, 'inserted' AS change_type
        |FROM cdc c WHERE NOT EXISTS (SELECT 1 FROM snap s WHERE s.doc_id = c.doc_id)""".stripMargin,

    // x145: cohort LTV triangle — first-order month per customer, keyed
    // join back, cumulative over the tiny (cohort, age) frame.
    "x145_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |                  year(o_orderdate)*12 + month(o_orderdate) - 1 AS m,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS v
        |           FROM orders),
        |f AS (SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY 1),
        |c AS (SELECT cohort_m, m - cohort_m AS age_months,
        |             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
        |             CAST(SUM(v) AS BIGINT) AS revenue_cents
        |      FROM o JOIN f USING (o_custkey) GROUP BY 1, 2)
        |SELECT cohort_m, age_months, n_customers, revenue_cents,
        |       CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_m ORDER BY age_months
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_revenue_cents
        |FROM c""".stripMargin,

    // x146: containment pairs — x02's shingle/cap/pair CTEs verbatim,
    // integer cross-multiplied keep filter, single-IEEE display ratios.
    "x146_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, CAST(len(shingles) AS INTEGER) AS n_sh, unnest(shingles) AS sh FROM (
        |    SELECT doc_id,
        |           list_distinct([array_to_string(words[i:i+4], ' ')
        |                          for i in range(1, len(words) - 3)]) AS shingles
        |    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1) t2),
        |capped AS (
        |  SELECT * FROM sh
        |  WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 100)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |         COUNT(*) AS inter
        |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, n_a, n_b, inter,
        |       CAST(inter AS DOUBLE) / n_a AS containment_a,
        |       CAST(inter AS DOUBLE) / n_b AS containment_b
        |FROM pairs WHERE inter * 5 >= n_a * 4 OR inter * 5 >= n_b * 4""".stripMargin,

    // x147: rolling active users — each (user, week) replicated to its
    // ≤4 trailing-window targets, deduped, counted; ppm stickiness.
    "x147_active_users" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |                   (CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS week
        |            FROM events),
        |wau AS (SELECT week, CAST(count(*) AS BIGINT) AS wau FROM uw GROUP BY 1),
        |tw AS (SELECT DISTINCT user_id, week + d AS week
        |       FROM uw, (SELECT unnest([0, 1, 2, 3]) AS d) ds),
        |mau AS (SELECT week, CAST(count(*) AS BIGINT) AS mau4 FROM tw GROUP BY 1)
        |SELECT week, wau, mau4, (1000000 * wau) // mau4 AS stickiness_ppm
        |FROM wau JOIN mau USING (week)""".stripMargin,

    // x148: Benford audit — first digit of the cents string, 9-cell
    // window total, pinned expected-ppm VALUES table.
    "x148_benford_audit" -> {
      val values = operators.Relational.BenfordPpm.zipWithIndex
        .map { case (ppm, i) => s"(${i + 1}, $ppm)" }.mkString(", ")
      s"""WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v FROM orders
        |           WHERE CAST(round(o_totalprice*100) AS BIGINT) > 0),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |             CAST(count(*) AS BIGINT) AS n_orders
        |      FROM v GROUP BY 1),
        |t AS (SELECT *, CAST(SUM(n_orders) OVER () AS BIGINT) AS n_total FROM d)
        |SELECT digit, n_orders, (1000000 * n_orders) // n_total AS observed_ppm,
        |       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
        |       (1000000 * n_orders) // n_total - CAST(b.benford_ppm AS BIGINT) AS deviation_ppm
        |FROM t JOIN (VALUES $values) AS b(digit, benford_ppm) USING (digit)""".stripMargin
    },

    // x149: key-skew panel — per column: key counts, 1-row stats, top-5
    // with rank, floor-div ratios; three panels unioned.
    "x149_key_skew" -> {
      def panel(c: String) =
        s"""SELECT '$c' AS key_col, rnk, key, n_rows, n_keys, n_total,
          |       n_total // n_keys AS avg_per_key,
          |       (1000000 * n_rows) // (n_total // n_keys) AS hot_x_avg_ppm
          |FROM (SELECT key, n_rows,
          |             row_number() OVER (ORDER BY n_rows DESC, key) AS rnk
          |      FROM (SELECT $c AS key, CAST(count(*) AS BIGINT) AS n_rows
          |            FROM lineitem GROUP BY 1) c0
          |      ORDER BY n_rows DESC, key LIMIT 5) t,
          |     (SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total,
          |             CAST(COUNT(*) AS BIGINT) AS n_keys
          |      FROM (SELECT $c AS key, count(*) AS n_rows
          |            FROM lineitem GROUP BY 1) s0) s""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(panel).mkString("\nUNION ALL\n")
    },

    // x150: repeat-purchase life table — per-customer lead() gap to the
    // next distinct order date (censored at corpus max), 7-day buckets,
    // reverse-cumulative risk set. Integer weeks + counts only.
    "x150_life_table" -> {
      import operators.Forecast.LifeTableBucketDays
      s"""WITH cd AS (SELECT DISTINCT o_custkey AS c, CAST(o_orderdate AS DATE) AS d
        |            FROM orders),
        |mx AS (SELECT max(d) AS maxd FROM cd),
        |s AS (SELECT c, d, lead(d, 1) OVER (PARTITION BY c ORDER BY d) AS nd FROM cd),
        |subj AS (SELECT CAST(datediff('day', d, coalesce(nd, (SELECT maxd FROM mx)))
        |                  AS BIGINT) // $LifeTableBucketDays AS t_week,
        |                CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END AS ev
        |         FROM s),
        |agg AS (SELECT t_week, CAST(sum(ev) AS BIGINT) AS n_events,
        |               CAST(sum(1 - ev) AS BIGINT) AS n_censored
        |        FROM subj GROUP BY 1)
        |SELECT t_week,
        |       CAST(SUM(n_events + n_censored) OVER (ORDER BY t_week
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
        |       n_events, n_censored
        |FROM agg""".stripMargin
    },

    // x151: multi-source BFS hop distance — x116's edge CTE, symmetric
    // edges, BfsMaxHops frontier rounds unrolled (the pinned-iteration
    // convention), per-round anti-join against the visited set.
    "x151_bfs_hops" -> {
      import operators.LinkAnalysis.{BfsMaxHops, BfsSourceBrand, TriMinSupport}
      val levels = (1 to BfsMaxHops).map { i =>
        s"""f$i AS MATERIALIZED (SELECT n.node, CAST($i AS BIGINT) AS dist
          |  FROM (SELECT DISTINCT s.b AS node
          |        FROM f${i - 1} f JOIN sym s ON f.node = s.a) n
          |  ANTI JOIN v${i - 1} v ON n.node = v.node),
          |v$i AS MATERIALIZED (SELECT node, dist FROM v${i - 1}
          |  UNION ALL SELECT node, dist FROM f$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |v0 AS MATERIALIZED (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
        |  FROM part WHERE p_brand = '$BfsSourceBrand'),
        |f0 AS MATERIALIZED (SELECT node FROM v0),
        |$levels
        |SELECT p.p_partkey, p.p_brand, v.dist
        |FROM v$BfsMaxHops v JOIN part p ON v.node = p.p_partkey""".stripMargin
    },

    // x152: correlation-moment audit — exact raw moments per pinned
    // pair; sums promoted to DECIMAL(38,0) on BOTH engines (DuckDB's
    // HUGEINT sum cast down) so the contract is wrap-free at any scale.
    "x152_corr_moments" -> {
      val arms = operators.Forecast.CorrPairs.map { case (name, x, y) =>
        s"SELECT '$name' AS pair, $x AS x, $y AS y FROM lineitem"
      }.mkString("\nUNION ALL\n")
      s"""WITH p AS ($arms)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(CAST(sum(x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_x,
        |       CAST(CAST(sum(y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_y,
        |       CAST(CAST(sum(x * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xy,
        |       CAST(CAST(sum(x * x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xx,
        |       CAST(CAST(sum(y * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_yy
        |FROM p GROUP BY 1""".stripMargin
    },

    // x153: market-basket association rules — x116's distinct (o,p)
    // CTE, min-support prune, both confidences in ppm, lift as the raw
    // DECIMAL(38,0) rational (x119 discipline).
    "x153_assoc_rules" -> {
      import operators.LinkAnalysis.AssocMinSupport
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op),
        |pc AS MATERIALIZED (SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM op GROUP BY 1),
        |pr AS (SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY 1, 2 HAVING count(*) >= $AssocMinSupport)
        |SELECT pr.a, pr.b, pr.n_ab, pa.n_p AS n_a, pb.n_p AS n_b, t.n_orders,
        |       (1000000 * pr.n_ab) // pa.n_p AS conf_a_b_ppm,
        |       (1000000 * pr.n_ab) // pb.n_p AS conf_b_a_ppm,
        |       CAST(CAST(CAST(pr.n_ab AS HUGEINT) * t.n_orders AS DECIMAL(38,0)) AS VARCHAR) AS lift_num,
        |       CAST(CAST(CAST(pa.n_p AS HUGEINT) * pb.n_p AS DECIMAL(38,0)) AS VARCHAR) AS lift_den
        |FROM pr JOIN pc pa ON pr.a = pa.p JOIN pc pb ON pr.b = pb.p, tot t""".stripMargin
    },

    // x154: per-part reorder rate — distinct (part, customer, order)
    // purchase events, repeat = ≥2 distinct orders, exact ppm.
    "x154_reorder_rate" ->
      """WITH lo AS (SELECT DISTINCT l.l_partkey AS p, o.o_custkey AS c,
        |                   o.o_orderkey AS ok
        |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |pc AS (SELECT p, c, CAST(count(*) AS BIGINT) AS n_ord FROM lo GROUP BY 1, 2)
        |SELECT p AS p_partkey, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
        |       CAST(sum(n_ord) AS BIGINT) AS n_orders,
        |       (1000000 * CAST(sum(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS reorder_ppm
        |FROM pc GROUP BY 1""".stripMargin,

    // x155: spend Lorenz deciles — x120's strict-rank decile rule
    // (rank()−1 ≡ the engine's exclusivePrefixSum offset), ppm shares
    // over a HUGEINT/DECIMAL numerator (wrap-free).
    "x155_spend_deciles" ->
      """WITH base AS (SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        |       FROM orders GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |             CAST(sum(spend_cents) AS BIGINT) AS total_cents FROM base),
        |r AS (SELECT spend_cents, rank() OVER (ORDER BY spend_cents) - 1 AS o FROM base),
        |d AS (SELECT (10 * o) // (SELECT n_cust FROM g) + 1 AS decile, spend_cents FROM r),
        |a AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |             CAST(sum(spend_cents) AS BIGINT) AS decile_cents
        |      FROM d GROUP BY 1),
        |c AS (SELECT *, CAST(SUM(decile_cents) OVER (ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |      FROM a)
        |SELECT decile, n_customers, decile_cents, cum_cents,
        |       CAST((1000000 * CAST(decile_cents AS HUGEINT))
        |         // (SELECT total_cents FROM g) AS BIGINT) AS share_ppm,
        |       CAST((1000000 * CAST(cum_cents AS HUGEINT))
        |         // (SELECT total_cents FROM g) AS BIGINT) AS cum_share_ppm
        |FROM c""".stripMargin,

    // x156: spend Gini — tie-exact rank identity over the (value →
    // count) aggregate, raw DECIMAL(38,0) rational, HUGEINT interior.
    "x156_spend_gini" ->
      """WITH base AS (SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |       FROM orders GROUP BY 1),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1),
        |r AS (SELECT v, cnt, CAST(coalesce(SUM(cnt) OVER (ORDER BY v
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
        |      FROM g),
        |a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_customers,
        |             sum(CAST(v AS HUGEINT) * cnt) AS total,
        |             sum(CAST(v AS HUGEINT) * cnt * (2 * o + cnt + 1)) AS two_r
        |      FROM r)
        |SELECT n_customers, CAST(CAST(total AS DECIMAL(38,0)) AS VARCHAR) AS total_cents,
        |       CAST(CAST(two_r - (n_customers + 1) * total AS DECIMAL(38,0)) AS VARCHAR) AS gini_num,
        |       CAST(CAST(n_customers * total AS DECIMAL(38,0)) AS VARCHAR) AS gini_den
        |FROM a""".stripMargin,

    // x157: largest-remainder budget apportionment — x07's whitespace
    // token rule, HUGEINT quota products, remainder-rank bonus seats.
    "x157_apportionment" -> {
      import operators.Sampling.ApportionBudget
      s"""WITH s AS (SELECT source,
        |         CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS n_tokens
        |       FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total FROM s),
        |q AS (SELECT source, n_tokens,
        |             CAST((CAST(n_tokens AS HUGEINT) * $ApportionBudget) // n_total AS BIGINT) AS base_alloc,
        |             CAST((CAST(n_tokens AS HUGEINT) * $ApportionBudget) % n_total AS BIGINT) AS remainder
        |      FROM s, g),
        |l AS (SELECT $ApportionBudget - CAST(sum(base_alloc) AS BIGINT) AS leftover FROM q),
        |b AS (SELECT *, CASE WHEN row_number() OVER (ORDER BY remainder DESC, source)
        |                       <= (SELECT leftover FROM l) THEN 1 ELSE 0 END AS bonus
        |      FROM q)
        |SELECT source, n_tokens, base_alloc, remainder,
        |       CAST(bonus AS BIGINT) AS bonus,
        |       base_alloc + bonus AS alloc_tokens
        |FROM b""".stripMargin
    },

    // x158: rendezvous-hash resharding audit — md5-60 highest-random-
    // weight argmax under K and K+1 shards, per-shard movement ppm.
    "x158_rendezvous" -> {
      import operators.Sampling.RendezvousShards
      val k = RendezvousShards
      s"""WITH sh AS (SELECT unnest(range(0, ${k + 1})) AS s),
        |a AS (SELECT d.doc_id, CAST(sh.s AS BIGINT) AS s,
        |             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
        |               CAST(sh.s AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |      FROM documents d, sh),
        |old AS (SELECT doc_id, s AS shard FROM (
        |  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS r
        |  FROM a WHERE s < $k) t WHERE r = 1),
        |nw AS (SELECT doc_id, s AS shard_new FROM (
        |  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS r
        |  FROM a) t WHERE r = 1)
        |SELECT o.shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN o.shard <> n.shard_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
        |       (1000000 * CAST(sum(CASE WHEN o.shard <> n.shard_new THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS moved_ppm
        |FROM old o JOIN nw n USING (doc_id) GROUP BY 1""".stripMargin
    },

    // x159: exact two-sample KS over per-source length distributions —
    // merged value grid per pair, HUGEINT CDF cross-products, raw
    // rational supremum with smallest-length argmax.
    "x159_length_drift_ks" ->
      """WITH c AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |       FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b
        |      FROM t a JOIN t b ON a.source < b.source),
        |m AS (SELECT p.src_a, p.src_b, p.n_a, p.n_b, c.v,
        |             CAST(sum(CASE WHEN c.source = p.src_a THEN c.c ELSE 0 END) AS BIGINT) AS da,
        |             CAST(sum(CASE WHEN c.source = p.src_b THEN c.c ELSE 0 END) AS BIGINT) AS db
        |      FROM p JOIN c ON c.source IN (p.src_a, p.src_b)
        |      GROUP BY 1, 2, 3, 4, 5),
        |g AS (SELECT *, abs(CAST(SUM(da) OVER w AS HUGEINT) * n_b
        |               - CAST(SUM(db) OVER w AS HUGEINT) * n_a) AS gap
        |      FROM m WINDOW w AS (PARTITION BY src_a, src_b ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
        |        ORDER BY gap DESC, v) AS r FROM g)
        |SELECT src_a, src_b, n_a, n_b, v AS ks_at_length,
        |       CAST(CAST(gap AS DECIMAL(38,0)) AS VARCHAR) AS ks_num,
        |       CAST(CAST(CAST(n_a AS HUGEINT) * n_b AS DECIMAL(38,0)) AS VARCHAR) AS ks_den
        |FROM r WHERE r = 1""".stripMargin,

    // x160: lang×source contingency deviations — full marginal-cross
    // grid (zero cells included), raw HUGEINT/DECIMAL independence
    // deviation rational.
    "x160_contingency" ->
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_ij
        |       FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, CAST(sum(n_ij) AS BIGINT) AS r_i FROM cells GROUP BY 1),
        |c AS (SELECT lang, CAST(sum(n_ij) AS BIGINT) AS c_j FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(n_ij) AS BIGINT) AS n_total FROM cells),
        |g AS (SELECT r.source, c.lang, r.r_i, c.c_j FROM r, c)
        |SELECT g.source, g.lang, CAST(coalesce(cells.n_ij, 0) AS BIGINT) AS n_ij,
        |       g.r_i, g.c_j, t.n_total,
        |       CAST(CAST(CAST(coalesce(cells.n_ij, 0) AS HUGEINT) * t.n_total
        |         - CAST(g.r_i AS HUGEINT) * g.c_j AS DECIMAL(38,0)) AS VARCHAR) AS dev_num,
        |       CAST(CAST(CAST(t.n_total AS HUGEINT) * t.n_total AS DECIMAL(38,0)) AS VARCHAR) AS dev_den
        |FROM g LEFT JOIN cells ON g.source = cells.source AND g.lang = cells.lang, t""".stripMargin,

    // x161: Mann–Whitney over x89 scores — x89's scoring CTE verbatim,
    // midrank doubling identity on the merged per-pair value grid,
    // HUGEINT interior, Σ(d³−d) tie term.
    "x161_rank_test" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |cnt AS (SELECT d.source, s.score_micro AS v, CAST(count(*) AS BIGINT) AS c
        |        FROM documents d JOIN scored s USING (doc_id) GROUP BY 1, 2),
        |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b
        |      FROM tt a JOIN tt b ON a.source < b.source),
        |m AS (SELECT p.src_a, p.src_b, p.n_a, p.n_b, cnt.v,
        |             CAST(sum(CASE WHEN cnt.source = p.src_a THEN cnt.c ELSE 0 END) AS BIGINT) AS da,
        |             CAST(sum(CASE WHEN cnt.source = p.src_b THEN cnt.c ELSE 0 END) AS BIGINT) AS db
        |      FROM p JOIN cnt ON cnt.source IN (p.src_a, p.src_b)
        |      GROUP BY 1, 2, 3, 4, 5),
        |w AS (SELECT *, da + db AS d,
        |             CAST(coalesce(SUM(da + db) OVER (PARTITION BY src_a, src_b
        |               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
        |      FROM m)
        |SELECT src_a, src_b, n_a, n_b,
        |       CAST(CAST(sum(CAST(da AS HUGEINT) * (2 * o + d + 1))
        |         - CAST(n_a AS HUGEINT) * (n_a + 1) AS DECIMAL(38,0)) AS VARCHAR) AS u2_a,
        |       CAST(CAST(sum(CAST(d AS HUGEINT) * d * d - d) AS DECIMAL(38,0)) AS VARCHAR) AS tie_cubes
        |FROM w GROUP BY 1, 2, 3, 4""".stripMargin
    },

    // x162: per-brand ACF moment panel — x117's daily CTE verbatim,
    // lag pairs via self-equi-join, HUGEINT/DECIMAL moment sums.
    "x162_acf_panel" -> {
      val lags = operators.Forecast.AcfLags.mkString(", ")
      s"""WITH daily AS (
        |  SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |pr AS (
        |  SELECT x.p_brand, lg.lag, x.rev_cents AS x, y.rev_cents AS y
        |  FROM daily x
        |  CROSS JOIN (SELECT CAST(unnest([$lags]) AS BIGINT) AS lag) lg
        |  JOIN daily y ON y.p_brand = x.p_brand AND y.day = x.day - lg.lag)
        |SELECT p_brand, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_x,
        |       CAST(CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_y,
        |       CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xy,
        |       CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xx,
        |       CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_yy
        |FROM pr GROUP BY 1, 2""".stripMargin
    },

    // x163: exact TF all-pairs cosine — x02's 5-gram CTE WITHOUT the
    // list_distinct (multiplicity counts), x02's stop-term cap,
    // integer cross-multiplied keep decision, one 3-IEEE-op cosine.
    "x163_tf_cosine" -> {
      import operators.Dedup.{TfCosMaxTermDf, TfCosShingleN, TfCosThresholdDen, TfCosThresholdNum}
      val (n2, d2) = (TfCosThresholdNum.toLong * TfCosThresholdNum,
        TfCosThresholdDen.toLong * TfCosThresholdDen)
      val (hi, lo) = (TfCosShingleN - 1, TfCosShingleN - 2)
      s"""WITH t AS (SELECT doc_id, unnest([array_to_string(words[i:i+$hi], ' ')
        |             for i in range(1, len(words) - $lo)]) AS w
        |       FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1),
        |tfc AS MATERIALIZED (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm2 FROM tfc GROUP BY 1),
        |stop AS (SELECT w FROM (SELECT w, count(*) AS df FROM tfc GROUP BY 1) s
        |         WHERE df > $TfCosMaxTermDf),
        |idx AS MATERIALIZED (SELECT doc_id, w, tf, norm2
        |        FROM tfc ANTI JOIN stop USING (w) JOIN norms USING (doc_id)),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |             a.norm2 AS norm2_a, b.norm2 AS norm2_b,
        |             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |      FROM idx a JOIN idx b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, dot, norm2_a, norm2_b,
        |       CAST(dot AS DOUBLE) / sqrt(CAST(norm2_a AS DOUBLE) * norm2_b) AS cos_dbl
        |FROM p
        |WHERE CAST($d2 AS HUGEINT) * dot * dot >= CAST($n2 AS HUGEINT) * norm2_a * norm2_b""".stripMargin
    },

    // x164: synchronous label propagation — x116's edge CTE, rounds
    // unrolled, majority label with the (cnt DESC, label ASC) total
    // tie-break as a row_number pick.
    "x164_label_prop" -> {
      import operators.LinkAnalysis.{LpaRounds, TriMinSupport}
      val rounds = (1 to LpaRounds).map { r =>
        s"""l$r AS MATERIALIZED (
          |  SELECT a AS node, label FROM (
          |    SELECT a, label, row_number() OVER (PARTITION BY a
          |             ORDER BY cnt DESC, label ASC) AS rk
          |    FROM (SELECT s.a, l.label, CAST(count(*) AS BIGINT) AS cnt
          |          FROM sym s JOIN l${r - 1} l ON s.b = l.node
          |          GROUP BY 1, 2) c) t
          |  WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM sym),
        |$rounds,
        |sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
        |          FROM l$LpaRounds GROUP BY 1)
        |SELECT p.p_partkey, p.p_brand, l.label AS community, s.community_size
        |FROM l$LpaRounds l JOIN sizes s USING (label)
        |JOIN part p ON l.node = p.p_partkey""".stripMargin
    },

    // x165: signup→first-purchase latency table — conditional-min first
    // purchase at-or-after first signup, −1 censored row, ppm shares.
    "x165_conversion_lag" ->
      """WITH ev AS (SELECT user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |s0 AS (SELECT user_id, min(ts_s) AS t0 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, ts_s FROM ev WHERE event_type = 'purchase'),
        |f AS (SELECT s0.user_id, s0.t0,
        |             min(CASE WHEN p.ts_s >= s0.t0 THEN p.ts_s END) AS tp
        |      FROM s0 LEFT JOIN p ON s0.user_id = p.user_id
        |      GROUP BY 1, 2),
        |b AS (SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400
        |                  ELSE -1 END AS latency_days FROM f),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_signups FROM s0)
        |SELECT latency_days, CAST(count(*) AS BIGINT) AS n_users, t.n_signups,
        |       (1000000 * CAST(count(*) AS BIGINT)) // t.n_signups AS share_ppm
        |FROM b, t GROUP BY 1, 3""".stripMargin,

    // x166: next-event Markov eval — x85's transition CTE verbatim,
    // argmax as a (n DESC, type DESC) row_number pick, hit ppm.
    "x166_markov_eval" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, event_type AS next_type,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |pr AS (SELECT prev_type, next_type AS predicted_next FROM (
        |  SELECT *, row_number() OVER (PARTITION BY prev_type
        |           ORDER BY n DESC, next_type DESC) AS rk FROM t) x WHERE rk = 1)
        |SELECT t.prev_type, pr.predicted_next,
        |       CAST(sum(t.n) AS BIGINT) AS n_total,
        |       CAST(sum(CASE WHEN t.next_type = pr.predicted_next THEN t.n ELSE 0 END) AS BIGINT) AS n_hits,
        |       (1000000 * CAST(sum(CASE WHEN t.next_type = pr.predicted_next THEN t.n ELSE 0 END) AS BIGINT))
        |         // CAST(sum(t.n) AS BIGINT) AS hit_ppm
        |FROM t JOIN pr USING (prev_type) GROUP BY 1, 2""".stripMargin,

    // x167: Zipf rank-frequency audit — frequency levels, strict-rank
    // spans via the DESC cumulative window, bit-length log2 buckets.
    "x167_zipf_audit" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |fr AS (SELECT token, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1),
        |lv AS (SELECT f, CAST(count(*) AS BIGINT) AS n_types FROM fr GROUP BY 1),
        |r AS (SELECT f, n_types,
        |             CAST(coalesce(SUM(n_types) OVER (ORDER BY f DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
        |      FROM lv)
        |SELECT f, n_types, o + 1 AS rank_lo, o + n_types AS rank_hi,
        |       CAST(length(bin(f)) AS BIGINT) AS log2_f,
        |       CAST(length(bin(o + 1)) AS BIGINT) AS log2_rank
        |FROM r""".stripMargin,

    // x168: Heaps vocabulary-growth curve — x125's batch rule, unigram
    // first-seen min-fold, cumulative pair over O(batches) rows.
    "x168_heaps_curve" -> {
      import operators.Dedup.NoveltyBatches
      s"""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |bt AS (SELECT (d.doc_id * $NoveltyBatches) // (mx.mx + 1) AS batch,
        |              unnest(string_split(d.text, ' ')) AS token
        |       FROM documents d, mx),
        |pb AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_tokens FROM bt GROUP BY 1),
        |fs AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_new_types FROM (
        |         SELECT token, min(batch) AS batch FROM bt GROUP BY 1) t GROUP BY 1)
        |SELECT pb.batch, pb.n_tokens,
        |       CAST(coalesce(fs.n_new_types, 0) AS BIGINT) AS n_new_types,
        |       CAST(SUM(pb.n_tokens) OVER w AS BIGINT) AS cum_tokens,
        |       CAST(SUM(coalesce(fs.n_new_types, 0)) OVER w AS BIGINT) AS cum_types
        |FROM pb LEFT JOIN fs USING (batch)
        |WINDOW w AS (ORDER BY batch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
    },

    // x169: regional segment revenue — the six-table TPC-H-Q5-shaped
    // star join, discounted cents with the shared two-multiply round.
    "x169_region_revenue" ->
      """SELECT r.r_name, c.c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    // x170: price realization per part type — integer cents/units, the
    // non-negative ppm quotient (gap is a consumer-side subtraction).
    "x170_price_realization" ->
      """WITH j AS (SELECT p.p_type, CAST(round(l.l_quantity) AS BIGINT) AS qty,
        |                  CAST(round(l.l_extendedprice * 100) AS BIGINT) AS realized,
        |                  CAST(round(p.p_retailprice * 100) AS BIGINT) AS retail_unit
        |           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT p_type, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(qty) AS BIGINT) AS units,
        |       CAST(sum(realized) AS BIGINT) AS realized_cents,
        |       CAST(sum(qty * retail_unit) AS BIGINT) AS retail_cents,
        |       CAST((1000000 * CAST(sum(realized) AS HUGEINT))
        |         // sum(qty * retail_unit) AS BIGINT) AS realization_ppm
        |FROM j GROUP BY 1""".stripMargin,

    // x171: common-neighbor link prediction — x116's support-pruned
    // edge CTE, wedge self-join on the shared center, anti-join out
    // existing edges, endpoint degrees decoded from the symmetric fold.
    "x171_common_neighbors" -> {
      import operators.LinkAnalysis.{CnMinCount, TriMinSupport}
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |sym AS MATERIALIZED (SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e),
        |cn AS (SELECT w1.n AS u, w2.n AS v, CAST(count(*) AS BIGINT) AS n_common
        |       FROM sym w1 JOIN sym w2 ON w1.w = w2.w AND w1.n < w2.n
        |       GROUP BY 1, 2 HAVING count(*) >= $CnMinCount),
        |ne AS (SELECT cn.* FROM cn LEFT JOIN e ON cn.u = e.a AND cn.v = e.b
        |       WHERE e.a IS NULL),
        |deg AS (SELECT w AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1)
        |SELECT ne.u, ne.v, ne.n_common, du.deg AS deg_u, dv.deg AS deg_v
        |FROM ne JOIN deg du ON ne.u = du.node JOIN deg dv ON ne.v = dv.node""".stripMargin
    },

    // x172: exact clustering coefficient — x116's triangle CTE plus the
    // symmetric degree fold; raw rational (2·tri, deg·(deg−1)) with the
    // one-IEEE-op double; degree-1 nodes excluded (0/0).
    "x172_clustering_coeff" -> {
      import operators.LinkAnalysis.TriMinSupport
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |t AS (SELECT e1.a AS ca, e1.b AS cb, e2.b AS cc
        |      FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |corners AS (SELECT unnest([ca, cb, cc]) AS node FROM t),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM corners GROUP BY 1),
        |sym AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1)
        |SELECT p.p_partkey, p.p_brand, d.deg,
        |       CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
        |       CAST(2 * coalesce(tc.n_triangles, 0) AS BIGINT) AS cc_num,
        |       d.deg * (d.deg - 1) AS cc_den,
        |       CAST(2 * coalesce(tc.n_triangles, 0) AS DOUBLE)
        |         / (d.deg * (d.deg - 1)) AS clustering
        |FROM deg d LEFT JOIN tc USING (node) JOIN part p ON d.node = p.p_partkey
        |WHERE d.deg >= 2""".stripMargin
    },

    // x173: degree-assortativity raw moments over distinct purchase
    // pairs — x152's moment contract on the customer–supplier graph;
    // sums HUGEINT→DECIMAL→VARCHAR (the r10 representation rule).
    "x173_assortativity" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |dc AS (SELECT cust, CAST(count(*) AS BIGINT) AS x FROM e0 GROUP BY 1),
        |ds AS (SELECT supp, CAST(count(*) AS BIGINT) AS y FROM e0 GROUP BY 1),
        |p AS (SELECT dc.x, ds.y FROM e0 JOIN dc USING (cust) JOIN ds USING (supp))
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |       CAST(CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_x,
        |       CAST(CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_y,
        |       CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xy,
        |       CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS VARCHAR) AS sum_xx,
        |       CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS VARCHAR) AS sum_yy
        |FROM p""".stripMargin,

    // x174: source-characteristic terms — per-source/corpus token
    // counts, exact lift rational as VARCHAR digits plus the
    // one-IEEE-op ranking double, top-K per source.
    "x174_term_affinity" -> {
      import operators.TextAnalysis.{AffinityMinTf, AffinityTopK}
      s"""WITH st AS MATERIALIZED (
        |  SELECT source, u.token AS term, CAST(count(*) AS BIGINT) AS tf_s
        |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents),
        |       unnest(ws) AS u(token)
        |  GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(tf_s) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT term, CAST(sum(tf_s) AS BIGINT) AS tf_c FROM st GROUP BY 1),
        |nt AS (SELECT CAST(sum(tf_c) AS BIGINT) AS n_total FROM ct),
        |cand AS (
        |  SELECT st.source, st.term, st.tf_s, ct.tf_c, ns.n_s, nt.n_total,
        |         CAST(CAST(st.tf_s AS HUGEINT) * nt.n_total AS DECIMAL(38,0)) AS numd,
        |         CAST(CAST(ct.tf_c AS HUGEINT) * ns.n_s AS DECIMAL(38,0)) AS dend
        |  FROM st JOIN ct USING (term) JOIN ns USING (source), nt
        |  WHERE st.tf_s >= $AffinityMinTf),
        |r AS (SELECT *, CAST(numd AS DOUBLE) / CAST(dend AS DOUBLE) AS affinity,
        |             CAST(row_number() OVER (PARTITION BY source
        |               ORDER BY CAST(numd AS DOUBLE) / CAST(dend AS DOUBLE) DESC, term)
        |               AS BIGINT) AS rank
        |      FROM cand)
        |SELECT source, rank, term, tf_s, tf_c, n_s, n_total,
        |       CAST(numd AS VARCHAR) AS aff_num, CAST(dend AS VARCHAR) AS aff_den,
        |       affinity
        |FROM r WHERE rank <= $AffinityTopK""".stripMargin
    },

    // x175: int8 quantization recall audit — per-vector max-|x| scale,
    // round-half-up via floor(+0.5) (exact IEEE composition), both
    // rankings trunc6'd with vec_id tie-break (the x09 contract),
    // top-5 overlap + quantized-rank displacement per query.
    "x175_quantized_recall" -> {
      import operators.Similarity.QuantLevels
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale FROM e),
        |qv AS (SELECT vec_id, v,
        |         list_transform(v, x -> floor(x / scale * $QuantLevels.0 + 0.5)) AS q FROM sc),
        |n AS (SELECT vec_id, v, q,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm,
        |        sqrt(list_aggregate(list_transform(q, x -> x*x), 'sum')) AS qnrm FROM qv),
        |qs AS (SELECT vec_id AS q_id, v AS vq, q AS qq, nrm AS nrmq, qnrm AS qnrmq
        |       FROM n WHERE vec_id >= 0 AND vec_id < 10),
        |scored AS (
        |  SELECT qs.q_id, n.vec_id,
        |    floor(list_dot_product(qs.vq, n.v) / (qs.nrmq * n.nrm) * 1000000) / 1000000 AS ce,
        |    floor(list_dot_product(qs.qq, n.q) / (qs.qnrmq * n.qnrm) * 1000000) / 1000000 AS cq
        |  FROM n, qs WHERE n.vec_id <> qs.q_id),
        |ranked AS (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY ce DESC, vec_id) AS re,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cq DESC, vec_id) AS rq
        |  FROM scored)
        |SELECT q_id, CAST(5 AS INTEGER) AS k,
        |  CAST(sum(CASE WHEN re <= 5 AND rq <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN re <= 5 AND rq <= 5 THEN 1 ELSE 0 END) AS DOUBLE) / 5 AS recall,
        |  CAST(sum(CASE WHEN re <= 5 THEN rq ELSE 0 END) AS BIGINT) AS quant_rank_sum
        |FROM ranked GROUP BY q_id""".stripMargin
    },

    // x176: Kendall rank concordance — weekly region revenue panel,
    // later-minus-earlier sign comparisons over week pairs, exact
    // integer concordance/tie counts + one-division tau-a.
    "x176_kendall_tau" ->
      """WITH wk AS (
        |  SELECT r.r_name AS region,
        |         (CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400) // 7 AS wk,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |       JOIN nation n ON c.c_nationkey = n.n_nationkey
        |       JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |panel AS MATERIALIZED (
        |  SELECT a.region AS r1, b.region AS r2, a.wk, a.cents AS x, b.cents AS y
        |  FROM wk a JOIN wk b ON a.wk = b.wk AND a.region < b.region),
        |nw AS (SELECT r1, r2, CAST(count(*) AS BIGINT) AS n_weeks FROM panel GROUP BY 1, 2),
        |pr AS (SELECT p.r1, p.r2,
        |         CASE WHEN q.x > p.x THEN 1 WHEN q.x < p.x THEN -1 ELSE 0 END AS sx,
        |         CASE WHEN q.y > p.y THEN 1 WHEN q.y < p.y THEN -1 ELSE 0 END AS sy
        |       FROM panel p JOIN panel q
        |         ON p.r1 = q.r1 AND p.r2 = q.r2 AND p.wk < q.wk),
        |ag AS (SELECT r1, r2, CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
        |         CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        |         CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_x,
        |         CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_y,
        |         CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_both
        |       FROM pr GROUP BY 1, 2)
        |SELECT ag.r1, ag.r2, nw.n_weeks, ag.n_pairs, ag.n_conc, ag.n_disc,
        |       ag.n_tie_x, ag.n_tie_y, ag.n_tie_both,
        |       ag.n_conc - ag.n_disc AS tau_num,
        |       CAST(ag.n_conc - ag.n_disc AS DOUBLE) / ag.n_pairs AS tau_a
        |FROM ag JOIN nw USING (r1, r2)""".stripMargin,

    // x177: link-prediction scores — x171's wedge CTE with the center's
    // degree shipped onto the wedge rows; Jaccard rational + integerized
    // resource-allocation sum (RaScale div deg_w, exact both engines).
    "x177_link_scores" -> {
      import operators.LinkAnalysis.{CnMinCount, RaScale, TriMinSupport}
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |sym AS MATERIALIZED (SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT w AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |symd AS (SELECT sym.w, sym.n, deg.deg AS deg_w
        |         FROM sym JOIN deg ON sym.w = deg.node),
        |cn AS (SELECT w1.n AS u, w2.n AS v, CAST(count(*) AS BIGINT) AS n_common,
        |              CAST(sum($RaScale // w1.deg_w) AS BIGINT) AS ra_e12
        |       FROM symd w1 JOIN sym w2 ON w1.w = w2.w AND w1.n < w2.n
        |       GROUP BY 1, 2 HAVING count(*) >= $CnMinCount),
        |ne AS (SELECT cn.* FROM cn LEFT JOIN e ON cn.u = e.a AND cn.v = e.b
        |       WHERE e.a IS NULL)
        |SELECT ne.u, ne.v, ne.n_common, du.deg AS deg_u, dv.deg AS deg_v,
        |       du.deg + dv.deg - ne.n_common AS jac_den,
        |       CAST(ne.n_common AS DOUBLE) / (du.deg + dv.deg - ne.n_common) AS jaccard,
        |       ne.ra_e12
        |FROM ne JOIN deg du ON ne.u = du.node JOIN deg dv ON ne.v = dv.node""".stripMargin
    },

    // x178: reciprocal nearest neighbors — x09's exact scoring contract
    // over all ordered pairs, rank ≤ k both directions, u < v.
    "x178_mutual_knn" -> {
      import operators.Similarity.MutualK
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id,
        |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |           ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
        |  FROM scored),
        |topk AS (SELECT * FROM ranked WHERE rank <= $MutualK)
        |SELECT f.q_id AS u, f.vec_id AS v, f.rank AS rank_uv, r.rank AS rank_vu,
        |       f.cos_sim
        |FROM topk f JOIN topk r ON f.q_id = r.vec_id AND f.vec_id = r.q_id
        |WHERE f.q_id < f.vec_id""".stripMargin
    },

    // x179: per-band SimHash banding precision — x04's signature+banding
    // CTEs verbatim, band-keyed candidates, Hamming verify tally.
    "x179_simhash_precision" -> {
      import operators.Dedup.SimhashMaxHamming
      s"""$simhashCtePrefix,
        |cand AS (
        |  SELECT a.band, a.sh AS sh_a, b.sh AS sh_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT band, n_candidates, n_verified,
        |       (1000000 * n_verified) // n_candidates AS precision_ppm
        |FROM (SELECT band, CAST(count(*) AS BIGINT) AS n_candidates,
        |             CAST(sum(CASE WHEN bit_count(xor(sh_a, sh_b)) <= $SimhashMaxHamming
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
        |      FROM cand GROUP BY band) t""".stripMargin
    },

    // x180: weighted PageRank — x77's unrolled integer iterations with
    // support-proportional splits on the support-pruned co-purchase
    // graph (x171's edge CTE with the count kept).
    "x180_weighted_pagerank" -> {
      import operators.LinkAnalysis.{PrDampPct, PrIters, PrUnit, TriMinSupport}
      val base = PrUnit - PrUnit * PrDampPct / 100
      val iters = (1 to PrIters).map { i =>
        val prev = if (i == 1) "r0" else s"it${i - 1}"
        s"""it$i AS (SELECT e.dst AS node,
           |  CAST($base + ($PrDampPct * sum((r.rank * e.w) // wd.wout)) // 100 AS BIGINT) AS rank
           |  FROM e JOIN wd USING (src) JOIN $prev r ON r.node = e.src
           |  GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS w
        |      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |e AS (SELECT a AS src, b AS dst, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
        |wd AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST($PrUnit AS BIGINT) AS rank FROM wd),
        |$iters
        |SELECT p.p_partkey, p.p_brand, wd.wout AS w_out, r.rank AS rank_pts
        |FROM it$PrIters r JOIN wd ON wd.src = r.node
        |JOIN part p ON r.node = p.p_partkey""".stripMargin
    },

    // x181: ER clusters — x128's fuzzy pairs closed transitively via a
    // recursive min-label CTE (the x17 closure pattern), singletons
    // restored by the part-table seed. ONE builder with its
    // sampled-universe twin (x281) so the two can never drift.
    "x181_er_clusters" -> erClustersOracleSql(sampled = false),
    // x281: x181's bounded-cost production mode — the r16 skip-list
    // closure: the recursive closure replay is quadratic in cluster
    // size (each cluster materializes size² (node, label) rows), which
    // outgrows any replay budget at sf1 density; the 10% md5 part
    // bucket reproduces sf0.1's green replay cost at 10× the corpus.
    "x281_er_clusters_sampled" -> erClustersOracleSql(sampled = true),

    // x182: fixed-size chunk-store dedup — 32-byte offset chunks of the
    // UTF-8 byte stream, ownership = min asset id per content (x39's
    // first-occurrence rule), per-asset storage ledger. DuckDB cannot
    // slice BLOBs, so the oracle slices the VARCHAR — byte-identical
    // here because the corpus is pure ASCII (octet_length = length on
    // every row at every SF, verified), making char offsets ≡ byte
    // offsets and string equality ≡ byte equality.
    "x182_chunk_dedup" -> {
      import operators.Multimodal.ChunkBytes
      s"""WITH d AS (SELECT doc_id AS asset_id, text AS b,
        |              octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT asset_id,
        |        substring(b, CAST(i * $ChunkBytes + 1 AS INTEGER), $ChunkBytes) AS frame,
        |        LEAST($ChunkBytes, n - i * $ChunkBytes) AS len
        |      FROM (SELECT asset_id, b, n,
        |              unnest(range(0, CAST(ceil(n / $ChunkBytes.0) AS BIGINT))) AS i
        |            FROM d) u),
        |pa AS (SELECT asset_id, frame, CAST(max(len) AS INTEGER) AS len,
        |              CAST(count(*) AS BIGINT) AS n_copies
        |       FROM f GROUP BY 1, 2),
        |ow AS (SELECT frame, MIN(asset_id) AS owner FROM pa GROUP BY 1)
        |SELECT pa.asset_id, CAST(sum(n_copies) AS BIGINT) AS n_chunks,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(sum(CASE WHEN pa.asset_id = ow.owner THEN 1 ELSE 0 END) AS BIGINT) AS n_owned,
        |       CAST(sum(CASE WHEN pa.asset_id = ow.owner THEN len ELSE 0 END) AS BIGINT) AS new_bytes,
        |       CAST(sum(n_copies * len) AS BIGINT) AS raw_bytes
        |FROM pa JOIN ow USING (frame) GROUP BY 1""".stripMargin
    },

    // x183: sorted-neighborhood blocking — global (name, key) sort
    // ranks, each record vs its `SnWindow` successors, banded
    // levenshtein verify; same_brand = 0 rows are the cross-block
    // matches x128's brand blocking cannot see.
    "x183_sorted_neighborhood" -> {
      import operators.Dedup.{FuzzyMaxDistance, SnWindow}
      s"""WITH p AS (
        |  SELECT p_partkey, p_brand, p_name,
        |         CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rank
        |  FROM part)
        |SELECT a.p_partkey AS key_a, a.p_name AS name_a,
        |       b.p_partkey AS key_b, b.p_name AS name_b,
        |       b.rank - a.rank AS rank_gap,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance,
        |       CAST(CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS INTEGER) AS same_brand
        |FROM p a JOIN p b ON b.rank > a.rank AND b.rank <= a.rank + $SnWindow
        |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDistance""".stripMargin
    },

    // x184: blocking-strategy audit — x128's brand pairs and x183's
    // sorted-neighborhood pairs full-outer joined on the canonical
    // unordered key, folded to the 3-row provenance panel.
    "x184_blocking_audit" -> {
      import operators.Dedup.{FuzzyMaxDistance, SnWindow}
      s"""WITH p AS (
        |  SELECT p_partkey, p_brand, p_name,
        |         CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rank
        |  FROM part),
        |bp AS (SELECT a.p_partkey AS u, b.p_partkey AS v,
        |         CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance,
        |         1 AS by_brand
        |       FROM part a JOIN part b
        |         ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |       WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDistance),
        |sp AS (SELECT LEAST(a.p_partkey, b.p_partkey) AS u,
        |         GREATEST(a.p_partkey, b.p_partkey) AS v,
        |         CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS sn_distance,
        |         CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS same_brand,
        |         1 AS by_sn
        |       FROM p a JOIN p b ON b.rank > a.rank AND b.rank <= a.rank + $SnWindow
        |       WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDistance),
        |j AS (SELECT COALESCE(bp.by_brand, 0) AS by_brand,
        |             COALESCE(sp.by_sn, 0) AS by_sn,
        |             COALESCE(bp.distance, sp.sn_distance) AS d,
        |             COALESCE(sp.same_brand, 1) AS sb
        |      FROM bp FULL OUTER JOIN sp ON bp.u = sp.u AND bp.v = sp.v)
        |SELECT CAST(by_brand AS INTEGER) AS by_brand, CAST(by_sn AS INTEGER) AS by_sn,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dist0,
        |       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dist1,
        |       CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dist2plus,
        |       CAST(sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_brand
        |FROM j GROUP BY 1, 2""".stripMargin
    },

    // x185: water-filling mixture — max-min fair token allocation across
    // sources; the capped test is a prefix along ascending supply
    // (proven in the Scaladoc), so the closed form is exact integers.
    "x185_waterfill_mixture" -> {
      import operators.Sampling.WaterfillPct
      s"""WITH s AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS supply
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(supply) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS n_sources FROM s),
        |o AS (SELECT s.*, CAST(row_number() OVER (ORDER BY supply, source) AS BIGINT) AS rk,
        |        CAST(sum(supply) OVER (ORDER BY supply, source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM s),
        |b AS (SELECT o.*, t.n_sources, ($WaterfillPct * t.total) // 100 AS budget FROM o, t),
        |f AS (SELECT b.*, CASE WHEN supply * (n_sources - rk + 1)
        |                         <= budget - (cum - supply)
        |                       THEN 1 ELSE 0 END AS capped FROM b),
        |cs AS (SELECT CAST(COALESCE(sum(capped), 0) AS BIGINT) AS n_capped,
        |              CAST(COALESCE(sum(CASE WHEN capped = 1 THEN supply END), 0) AS BIGINT) AS capped_cum
        |       FROM f),
        |g AS (SELECT f.*, cs.n_capped, budget - cs.capped_cum AS r,
        |             n_sources - cs.n_capped AS m
        |      FROM f, cs),
        |a AS (SELECT source, supply, rk, CAST(capped AS INTEGER) AS capped, budget,
        |        CASE WHEN capped = 1 THEN supply
        |             ELSE (r // m) + (CASE WHEN rk - n_capped <= (r % m)
        |                              THEN 1 ELSE 0 END) END AS alloc
        |      FROM g)
        |SELECT source, supply, rk, capped, alloc,
        |       (1000000 * alloc) // budget AS share_ppm
        |FROM a""".stripMargin
    },

    // x186: seasonality-adjusted daily anomalies — x102's scaled-integer
    // median/MAD algebra per (brand, weekday) cell of the daily revenue
    // series; weekday via the x118 arithmetic.
    "x186_dow_anomalies" ->
      s"""WITH daily AS (
        |  SELECT p.p_brand,
        |         CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |dd AS (SELECT *, (day + 4) % 7 AS dow FROM daily),
        |m AS (SELECT p_brand, dow, CAST(2 * median(rev_cents) AS BIGINT) AS med2
        |      FROM dd GROUP BY 1, 2),
        |d AS (SELECT dd.p_brand, dd.day, dd.dow, dd.rev_cents, m.med2,
        |             abs(2 * dd.rev_cents - m.med2) AS dev2
        |      FROM dd JOIN m USING (p_brand, dow)),
        |mm AS (SELECT p_brand, dow, CAST(2 * median(dev2) AS BIGINT) AS mad4
        |       FROM d GROUP BY 1, 2)
        |SELECT d.p_brand, d.day, d.dow, d.rev_cents, d.med2, mm.mad4,
        |       CAST(CASE WHEN 2 * d.dev2 > ${operators.Sessionize.RobustZ} * mm.mad4
        |             THEN 1 ELSE 0 END AS INTEGER) AS seasonal_spike
        |FROM d JOIN mm USING (p_brand, dow)""".stripMargin,

    // x187: int8 reconstruction distortion — x175's quantizer, error
    // folded per vector in exact micro-units (floor ·10⁶ of a
    // deterministic left-to-right IEEE sum), per-label rollup.
    "x187_quant_error" -> {
      import operators.Similarity.QuantLevels
      s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT label, v,
        |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale FROM e),
        |p AS (SELECT label,
        |        CAST(floor(list_aggregate(list_transform(v,
        |          x -> abs(x - floor(x / scale * $QuantLevels.0 + 0.5)
        |                       * (scale / $QuantLevels.0))), 'sum') * 1000000)
        |          AS BIGINT) AS err_micro
        |      FROM s)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(err_micro) AS BIGINT) AS sum_err_micro,
        |       MAX(err_micro) AS max_err_micro
        |FROM p GROUP BY label""".stripMargin
    },

    // x188: position-decay multi-touch attribution — K lag columns per
    // user, halving integer weights, tallied per touched type.
    "x188_decay_attribution" -> {
      import operators.Sessionize.DecayK
      val lags = (1 to DecayK).map(j =>
        s"lag(event_type, $j) OVER w AS t$j").mkString(", ")
      val arms = (1 to DecayK).map(j =>
        s"SELECT $j AS pos, t$j AS touched, ${1L << (DecayK - j)} AS wt FROM p WHERE t$j IS NOT NULL")
        .mkString("\n|      UNION ALL ")
      s"""WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |l AS (SELECT event_type, $lags
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |p AS (SELECT * FROM l WHERE event_type = 'purchase'),
        |t AS ($arms)
        |SELECT touched AS event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(wt) AS BIGINT) AS credit_pts,
        |       CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nearest
        |FROM t GROUP BY 1""".stripMargin
    },

    // x189: leave-one-out target encoding — the (brand, qty) aggregate
    // carries the whole encoding; raw rational + one-division double,
    // single-row categories flagged (den = 0).
    "x189_loo_encoding" ->
      """WITH r AS (
        |  SELECT p.p_brand, CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_centi,
        |         CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |b AS (SELECT p_brand, CAST(sum(qty_centi * n_rows) AS BIGINT) AS brand_sum,
        |             CAST(sum(n_rows) AS BIGINT) AS brand_cnt
        |      FROM r GROUP BY 1)
        |SELECT r.p_brand, r.qty_centi, r.n_rows,
        |       b.brand_sum - r.qty_centi AS loo_num,
        |       b.brand_cnt - 1 AS loo_den,
        |       CASE WHEN b.brand_cnt > 1
        |            THEN CAST(b.brand_sum - r.qty_centi AS DOUBLE) / (b.brand_cnt - 1)
        |            END AS loo_mean,
        |       CAST(CASE WHEN b.brand_cnt = 1 THEN 1 ELSE 0 END AS INTEGER) AS no_peers
        |FROM r JOIN b USING (p_brand)""".stripMargin,

    // x190: grouped k-fold — fold = salted md5 bucket of the USER mod K
    // (rows of one user can never straddle folds), per-cell balance.
    "x190_grouped_folds" -> {
      import operators.Sampling.FoldK
      s"""SELECT (('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 10000) % $FoldK AS fold,
        |       event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin
    },

    // x191: kNN label homophily — x178's exact ranked CTE at the staged
    // depth, labels joined onto both endpoints, per-label ppm ratio.
    "x191_knn_homophily" -> {
      import operators.KnnStage.StageK
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id, c.label,
        |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, q_label, vec_id, label,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored),
        |topk AS (SELECT * FROM ranked WHERE rank <= $StageK)
        |SELECT q_label, n_vecs, n_slots, n_same,
        |       (1000000 * n_same) // n_slots AS homophily_ppm
        |FROM (SELECT q_label, CAST(count(DISTINCT q_id) AS BIGINT) AS n_vecs,
        |             CAST(count(*) AS BIGINT) AS n_slots,
        |             CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        |      FROM topk GROUP BY 1) t""".stripMargin
    },

    // x192: kNN hubness — in-degree histogram of the exact kNN graph,
    // zero-in-degree band recovered from the vector universe.
    "x192_knn_hubness" -> {
      import operators.KnnStage.StageK
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id,
        |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored),
        |indeg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS in_deg
        |          FROM ranked WHERE rank <= $StageK GROUP BY 1),
        |allv AS (SELECT e.vec_id, coalesce(i.in_deg, 0) AS in_deg
        |         FROM e LEFT JOIN indeg i USING (vec_id))
        |SELECT in_deg, CAST(count(*) AS BIGINT) AS n_vecs,
        |       min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
        |FROM allv GROUP BY 1""".stripMargin
    },

    // x193: HLL distinct-buyers audit — md5-60 item hash, trailing-zero
    // register ranks, INTEGER harmonic sum Σ2^(58−reg), raw-estimator
    // division as the one shared IEEE expression.
    "x193_hll_audit" -> {
      import operators.Relational.{HllBuckets, HllShiftCap}
      s"""WITH buyers AS (
        |  SELECT DISTINCT c.c_nationkey AS nk, o.o_custkey AS ck
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |hashed AS (
        |  SELECT nk,
        |    ('0x' || substr(md5('hll:' || CAST(ck AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM buyers),
        |ranks AS (
        |  SELECT nk, (h % $HllBuckets) AS bucket,
        |    CASE WHEN (h // $HllBuckets) = 0 THEN 57
        |         ELSE bit_count(((h // $HllBuckets) & -(h // $HllBuckets)) - 1) + 1
        |    END AS rnk
        |  FROM hashed),
        |regs AS (SELECT nk, bucket, CAST(max(rnk) AS BIGINT) AS register
        |         FROM ranks GROUP BY 1, 2),
        |universe AS (SELECT n.n_nationkey, b.bucket FROM nation n
        |             CROSS JOIN (SELECT unnest(range($HllBuckets)) AS bucket) b),
        |full_regs AS (
        |  SELECT u.n_nationkey, coalesce(r.register, 0) AS register
        |  FROM universe u LEFT JOIN regs r
        |    ON u.n_nationkey = r.nk AND u.bucket = r.bucket),
        |harm AS (
        |  SELECT n_nationkey,
        |         CAST(sum(CAST(1 AS BIGINT)
        |           << CAST($HllShiftCap - least(register, $HllShiftCap) AS INTEGER)) AS BIGINT)
        |           AS harmonic_scaled,
        |         CAST(max(register) AS BIGINT) AS max_register
        |  FROM full_regs GROUP BY 1),
        |exact AS (SELECT nk AS n_nationkey, CAST(count(*) AS BIGINT) AS n_exact
        |          FROM buyers GROUP BY 1),
        |est AS (
        |  SELECT h.n_nationkey, e.n_exact, h.max_register, h.harmonic_scaled,
        |         CAST(floor((172.288 * 288230376151711744.0)
        |           / CAST(h.harmonic_scaled AS DOUBLE)) AS BIGINT) AS est_hll
        |  FROM harm h JOIN exact e USING (n_nationkey))
        |SELECT n_nationkey, n_exact, max_register, harmonic_scaled, est_hll,
        |       (1000000 * abs(est_hll - n_exact)) // n_exact AS err_ppm
        |FROM est""".stripMargin
    },

    // x194: within-source boilerplate grams — word 5-grams with
    // same-source df ≥ 2, per-doc occurrence coverage, per-source rollup.
    "x194_boilerplate" -> {
      import operators.TextAnalysis.{BoilerDfAt, BoilerFlagPpm, BoilerN}
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |           FROM documents),
        |idx AS (SELECT doc_id, source, ws, unnest(range(1, len(ws) - ${BoilerN - 2})) AS i
        |        FROM w WHERE len(ws) >= $BoilerN),
        |occ AS (
        |  SELECT source, array_to_string(ws[i:i+${BoilerN - 1}], ' ') AS gram, doc_id,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM idx GROUP BY 1, 2, 3),
        |gram_df AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS df
        |            FROM occ GROUP BY 1, 2),
        |per_doc AS (
        |  SELECT o.source, o.doc_id,
        |         CAST(sum(o.cnt) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN d.df >= $BoilerDfAt THEN o.cnt ELSE 0 END) AS BIGINT)
        |           AS n_boiler
        |  FROM occ o JOIN gram_df d ON o.source = d.source AND o.gram = d.gram
        |  GROUP BY 1, 2),
        |flagged AS (
        |  SELECT source, doc_id, n_grams, n_boiler,
        |         (1000000 * n_boiler) // n_grams AS doc_ppm
        |  FROM per_doc)
        |SELECT source, n_docs, total_grams, boiler_grams, n_flagged,
        |       (1000000 * boiler_grams) // total_grams AS boiler_ppm
        |FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_grams) AS BIGINT) AS total_grams,
        |             CAST(sum(n_boiler) AS BIGINT) AS boiler_grams,
        |             CAST(sum(CASE WHEN doc_ppm >= $BoilerFlagPpm THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_flagged
        |      FROM flagged GROUP BY 1) t""".stripMargin
    },

    // x195: Theil–Sen monthly-revenue slope — rational pairwise slopes,
    // cross-multiplied multiset rank, lower-median pick with (num, den)
    // tiebreak; no float ordering anywhere.
    "x195_theil_sen" ->
      """WITH monthly AS (
        |  SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS yr,
        |         month(o.o_orderdate) AS mo,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT a.nk, a.yr, b.rev - a.rev AS num, b.mo - a.mo AS den
        |  FROM monthly a JOIN monthly b
        |    ON a.nk = b.nk AND a.yr = b.yr AND a.mo < b.mo),
        |vals AS (SELECT nk, yr, num, den, CAST(count(*) AS BIGINT) AS n_inst
        |         FROM pairs GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT x.nk, x.yr, x.num, x.den,
        |         CAST(sum(CASE WHEN y.num * x.den <= x.num * y.den
        |                       THEN y.n_inst ELSE 0 END) AS BIGINT) AS cnt_le,
        |         CAST(sum(y.n_inst) AS BIGINT) AS n_slopes
        |  FROM vals x JOIN vals y ON x.nk = y.nk AND x.yr = y.yr
        |  GROUP BY 1, 2, 3, 4),
        |med AS (
        |  SELECT nk, yr, num, den, n_slopes,
        |         row_number() OVER (PARTITION BY nk, yr
        |           ORDER BY cnt_le, num, den) AS rn
        |  FROM ranked WHERE cnt_le >= (n_slopes + 1) // 2),
        |months AS (SELECT nk, yr, CAST(count(*) AS BIGINT) AS n_months
        |           FROM monthly GROUP BY 1, 2)
        |SELECT m.nk AS n_nationkey, m.yr, mo.n_months, m.n_slopes,
        |       m.num AS med_num, m.den AS med_den,
        |       CAST(m.num AS DOUBLE) / CAST(m.den AS DOUBLE) AS slope
        |FROM med m JOIN months mo ON m.nk = mo.nk AND m.yr = mo.yr
        |WHERE m.rn = 1""".stripMargin,

    // x196: percentile bootstrap — md5-60 deterministic resampling of
    // the daily-revenue series, pinned order-statistic CI bracket.
    "x196_bootstrap_ci" -> {
      import operators.Forecast.{BootHiRank, BootLoRank, BootReps}
      s"""WITH daily AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS idx,
        |               rev FROM daily),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |               CAST(sum(rev) AS BIGINT) AS observed_cents FROM idx),
        |draws AS (
        |  SELECT r.r, unnest(range(c.n_days)) AS s, c.n_days
        |  FROM (SELECT unnest(range($BootReps)) AS r) r CROSS JOIN cnt c),
        |picks AS (
        |  SELECT r, ('0x' || substr(md5('boot:' || CAST(r AS VARCHAR) || ':'
        |           || CAST(s AS VARCHAR)), 1, 15))::BIGINT % n_days AS pick
        |  FROM draws),
        |rep AS (SELECT p.r, CAST(sum(i.rev) AS BIGINT) AS rep_total
        |        FROM picks p JOIN idx i ON p.pick = i.idx GROUP BY 1),
        |ranked AS (SELECT rep_total,
        |                  row_number() OVER (ORDER BY rep_total, r) AS rk
        |           FROM rep)
        |SELECT c.n_days, c.observed_cents, t.n_reps, t.sum_rep_cents,
        |       t.boot_lo_cents, t.boot_hi_cents
        |FROM (SELECT CAST(count(*) AS BIGINT) AS n_reps,
        |             CAST(sum(rep_total) AS BIGINT) AS sum_rep_cents,
        |             min(CASE WHEN rk = $BootLoRank THEN rep_total END) AS boot_lo_cents,
        |             min(CASE WHEN rk = $BootHiRank THEN rep_total END) AS boot_hi_cents
        |      FROM ranked) t CROSS JOIN cnt c""".stripMargin
    },

    // x197: winsorized/trimmed segment spend — rank-pick percentiles
    // (ceil(p·n/100) over the (spend, custkey) total order), integer
    // clamp and rollup.
    "x197_winsor_spend" -> {
      import operators.Relational.{WinsorHiPct, WinsorLoPct}
      s"""WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |  FROM orders GROUP BY 1),
        |seg AS (SELECT s.o_custkey, s.spend, c.c_mktsegment
        |        FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
        |ranked AS (
        |  SELECT c_mktsegment, o_custkey, spend,
        |         CAST(row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY spend, o_custkey) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM seg),
        |rk AS (SELECT *, (n * $WinsorLoPct + 99) // 100 AS lo_rank,
        |              (n * $WinsorHiPct + 99) // 100 AS hi_rank FROM ranked),
        |bounds AS (
        |  SELECT c_mktsegment AS bseg,
        |         min(CASE WHEN rn = lo_rank THEN spend END) AS p5_cents,
        |         min(CASE WHEN rn = hi_rank THEN spend END) AS p95_cents
        |  FROM rk WHERE rn = lo_rank OR rn = hi_rank GROUP BY 1)
        |SELECT r.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |       min(b.p5_cents) AS p5_cents, min(b.p95_cents) AS p95_cents,
        |       CAST(sum(r.spend) AS BIGINT) AS raw_sum_cents,
        |       CAST(sum(greatest(least(r.spend, b.p95_cents), b.p5_cents)) AS BIGINT)
        |         AS winsor_sum_cents,
        |       CAST(sum(CASE WHEN r.rn >= r.lo_rank AND r.rn <= r.hi_rank
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS trim_n,
        |       CAST(sum(CASE WHEN r.rn >= r.lo_rank AND r.rn <= r.hi_rank
        |                     THEN r.spend ELSE 0 END) AS BIGINT) AS trim_sum_cents
        |FROM rk r JOIN bounds b ON r.c_mktsegment = b.bseg
        |GROUP BY 1""".stripMargin
    },

    // x198: 3-truss of the mutual-kNN graph — x178's exact ranked CTE at
    // the staged depth, reciprocal edges, pinned peel rounds unrolled.
    // MATERIALIZED hints (r17): `topk` feeds r0 TWICE and each round's
    // r/s/sym CTEs are multiply referenced, so the inlined sf1 replay
    // recomputed the corpus² ranked window per reference and spilled
    // >60 GB. Hint-only — measured 56 s at sf1 (StageK=10 stress shape),
    // no spill; this removed x198 from the sf1 skip list.
    "x198_knn_truss" -> {
      import operators.KnnStage.StageK
      import operators.LinkAnalysis.{KnnTrussK, KnnTrussRounds}
      val minSup = KnnTrussK - 2
      val rounds = (1 to KnnTrussRounds).map { i =>
        val prev = s"r${i - 1}"
        s"""sym$i AS MATERIALIZED (SELECT a, b FROM $prev UNION ALL SELECT b, a FROM $prev),
           |s$i AS MATERIALIZED (SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS support
           |        FROM $prev e JOIN sym$i n1 ON e.a = n1.a
           |        JOIN sym$i n2 ON e.b = n2.a AND n1.b = n2.b
           |        GROUP BY 1, 2),
           |r$i AS MATERIALIZED (SELECT a, b FROM s$i WHERE support >= $minSup)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id,
        |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored),
        |topk AS MATERIALIZED (SELECT q_id, vec_id FROM ranked WHERE rank <= $StageK),
        |r0 AS MATERIALIZED (SELECT f.q_id AS a, f.vec_id AS b
        |       FROM topk f JOIN topk r
        |         ON f.q_id = r.vec_id AND f.vec_id = r.q_id
        |       WHERE f.q_id < f.vec_id),
        |$rounds
        |SELECT s.a, s.b, s.support, ea.label AS label_a, eb.label AS label_b
        |FROM s$KnnTrussRounds s
        |JOIN embeddings ea ON s.a = ea.vec_id
        |JOIN embeddings eb ON s.b = eb.vec_id
        |WHERE s.support >= $minSup""".stripMargin
    },

    // x199: per-event-type HLL distinct users — x193's register/
    // harmonic/estimate CTEs on the event stream's natural key.
    "x199_event_hll" -> {
      import operators.Relational.{HllBuckets, HllShiftCap}
      s"""WITH pairs AS (SELECT DISTINCT event_type, user_id AS item FROM events),
        |hashed AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5('hll:' || CAST(item AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM pairs),
        |ranks AS (
        |  SELECT event_type, (h % $HllBuckets) AS bucket,
        |    CASE WHEN (h // $HllBuckets) = 0 THEN 57
        |         ELSE bit_count(((h // $HllBuckets) & -(h // $HllBuckets)) - 1) + 1
        |    END AS rnk
        |  FROM hashed),
        |regs AS (SELECT event_type, bucket, CAST(max(rnk) AS BIGINT) AS register
        |         FROM ranks GROUP BY 1, 2),
        |universe AS (SELECT t.event_type, b.bucket
        |             FROM (SELECT DISTINCT event_type FROM pairs) t
        |             CROSS JOIN (SELECT unnest(range($HllBuckets)) AS bucket) b),
        |full_regs AS (
        |  SELECT u.event_type, coalesce(r.register, 0) AS register
        |  FROM universe u LEFT JOIN regs r
        |    ON u.event_type = r.event_type AND u.bucket = r.bucket),
        |harm AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(1 AS BIGINT)
        |           << CAST($HllShiftCap - least(register, $HllShiftCap) AS INTEGER)) AS BIGINT)
        |           AS harmonic_scaled,
        |         CAST(max(register) AS BIGINT) AS max_register
        |  FROM full_regs GROUP BY 1),
        |exact AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
        |          FROM pairs GROUP BY 1),
        |est AS (
        |  SELECT h.event_type, e.n_exact, h.max_register, h.harmonic_scaled,
        |         CAST(floor((172.288 * 288230376151711744.0)
        |           / CAST(h.harmonic_scaled AS DOUBLE)) AS BIGINT) AS est_hll
        |  FROM harm h JOIN exact e USING (event_type))
        |SELECT event_type, n_exact, max_register, harmonic_scaled, est_hll,
        |       (1000000 * abs(est_hll - n_exact)) // n_exact AS err_ppm
        |FROM est""".stripMargin
    },

    // x200: Good–Turing 5-gram spectrum — N_r rollup, (r+1)·N_{r+1}/N_r
    // rationals, 1-row totals cross.
    "x200_good_turing" -> {
      import operators.TextAnalysis.{GtMaxR, GtN}
      s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT ws, unnest(range(1, len(ws) - ${GtN - 2})) AS i
        |        FROM w WHERE len(ws) >= $GtN),
        |g AS (SELECT array_to_string(ws[i:i+${GtN - 1}], ' ') AS gram FROM idx),
        |tf AS (SELECT gram, CAST(count(*) AS BIGINT) AS r FROM g GROUP BY 1),
        |spec AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS total_grams,
        |               CAST(sum(n_r) AS BIGINT) AS distinct_grams FROM spec),
        |rr AS (SELECT unnest(range(1, ${GtMaxR + 1})) AS r)
        |SELECT rr.r, coalesce(s.n_r, 0) AS n_r, coalesce(s1.n_r, 0) AS n_r1,
        |       (rr.r + 1) * coalesce(s1.n_r, 0) AS gt_num,
        |       coalesce(s.n_r, 0) AS gt_den,
        |       CASE WHEN coalesce(s.n_r, 0) > 0
        |            THEN CAST((rr.r + 1) * coalesce(s1.n_r, 0) AS DOUBLE)
        |                 / coalesce(s.n_r, 0) END AS gt_smoothed_r,
        |       t.total_grams, t.distinct_grams
        |FROM rr LEFT JOIN spec s ON rr.r = s.r
        |LEFT JOIN spec s1 ON s1.r = rr.r + 1
        |CROSS JOIN tot t""".stripMargin
    },

    // x201: exact prefix-filtered Jaccard join — global-rarity shingle
    // order, prefix-token candidates, length filter, exact verification;
    // every comparison an integer cross-multiplied ppm.
    "x201_prefix_jaccard" -> {
      import operators.Dedup.{PjN, PjTauPpm}
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - ${PjN - 2})) AS i
        |        FROM w WHERE len(ws) >= $PjN),
        |toks AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+${PjN - 1}], ' ') AS tok
        |         FROM idx),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
        |ord AS (SELECT t.doc_id, t.tok, s.sz,
        |               CAST(row_number() OVER (PARTITION BY t.doc_id
        |                 ORDER BY d.df, t.tok) AS BIGINT) AS rk
        |        FROM toks t JOIN df d ON t.tok = d.tok
        |        JOIN sz s ON t.doc_id = s.doc_id),
        |pref AS (SELECT * FROM ord
        |         WHERE rk <= sz - (($PjTauPpm * sz) + 999999) // 1000000 + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |                a.sz AS sa, b.sz AS sb
        |         FROM pref a JOIN pref b
        |           ON a.tok = b.tok AND a.doc_id < b.doc_id),
        |candf AS (SELECT * FROM cand
        |          WHERE 1000000 * least(sa, sb) >= $PjTauPpm * greatest(sa, sb)),
        |inter AS (SELECT c.da, c.db, c.sa, c.sb,
        |                 CAST(count(*) AS BIGINT) AS inter_size
        |          FROM candf c JOIN toks x ON x.doc_id = c.da
        |          JOIN toks y ON y.doc_id = c.db AND x.tok = y.tok
        |          GROUP BY 1, 2, 3, 4)
        |SELECT da AS doc_a, db AS doc_b, inter_size,
        |       sa + sb - inter_size AS union_size,
        |       (1000000 * inter_size) // (sa + sb - inter_size) AS jac_ppm
        |FROM inter
        |WHERE 1000000 * inter_size >= $PjTauPpm * (sa + sb - inter_size)""".stripMargin
    },

    // x202: LSH recall-vs-radius curve — x10's signature CTE over ALL
    // queries, Hamming-distance fan-out to nested radii, exact top-k
    // baseline, per-radius recall/candidate rollup. ONE builder shared
    // with the sampled twin (x232) so the two can never drift.
    "x202_lsh_recall_curve" -> recallCurveOracleSql(sampled = false),

    // x203: incremental kNN ingest — the oracle is the FROM-SCRATCH full
    // ranking (x178's CTE at the staged depth): the day-1/day-2 split is
    // a Spark-side plan property, the merged result must be identical.
    "x203_knn_ingest" -> {
      import operators.KnnStage.StageK
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id,
        |    floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 1000000) / 1000000 AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |           ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= $StageK""".stripMargin
    },

    // x204: conformal forecast intervals — x117's residual construction
    // verbatim, rank-picked ⌈(n+1)·α⌉ quantile, realized coverage.
    "x204_conformal" -> {
      import operators.Forecast.{ConformalPct, SeasonalLagDays}
      s"""WITH daily AS (
        |  SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |m AS (SELECT min(day) AS min_day FROM daily),
        |resid AS (
        |  SELECT d.p_brand, d.day,
        |         abs(d.rev_cents - coalesce(f.rev_cents, 0)) AS err
        |  FROM daily d LEFT JOIN daily f
        |    ON d.p_brand = f.p_brand AND f.day = d.day - $SeasonalLagDays
        |  CROSS JOIN m WHERE d.day >= m.min_day + $SeasonalLagDays),
        |ranked AS (
        |  SELECT p_brand, err,
        |         CAST(row_number() OVER (PARTITION BY p_brand
        |           ORDER BY err, day) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
        |  FROM resid),
        |rk AS (SELECT *, least(($ConformalPct * (n + 1) + 99) // 100, n) AS q_rank
        |       FROM ranked),
        |bounds AS (SELECT p_brand AS qb, err AS q_abs_err_cents
        |           FROM rk WHERE rn = q_rank)
        |SELECT p_brand, n_days, q_abs_err_cents, n_within,
        |       (1000000 * n_within) // n_days AS coverage_ppm
        |FROM (SELECT r.p_brand, CAST(count(*) AS BIGINT) AS n_days,
        |             min(b.q_abs_err_cents) AS q_abs_err_cents,
        |             CAST(sum(CASE WHEN r.err <= b.q_abs_err_cents
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_within
        |      FROM rk r JOIN bounds b ON r.p_brand = b.qb
        |      GROUP BY 1) t""".stripMargin
    },

    // x205: byte-stream perceptual-hash near-dup — chunk-hash SimHash
    // (x04's bit-vote CTE over fixed-size byte chunks), 4×16 banding,
    // Hamming verify. Text bytes are ASCII so substr == byte slicing.
    "x205_byte_simhash" -> {
      import operators.Multimodal.{ChunkBytes, PhashMaxHamming}
      val counts = (0 until 60).map(b => s"SUM((h >> $b) & 1) AS c$b").mkString(", ")
      val bits = (0 until 60)
        .map(b => s"(CASE WHEN c$b * 2 > n THEN 1::BIGINT ELSE 0::BIGINT END << $b)")
        .mkString(" + ")
      s"""WITH a AS (SELECT doc_id AS asset_id, text FROM documents),
        |ch AS (SELECT asset_id,
        |         ('0x' || substr(md5(substr(text, 1 + $ChunkBytes * i, $ChunkBytes)), 1, 15))::BIGINT AS h
        |       FROM a, unnest(range(0, (length(text) + ${ChunkBytes - 1}) // $ChunkBytes)) t(i)),
        |agg AS (SELECT asset_id, COUNT(*) AS n, $counts FROM ch GROUP BY asset_id),
        |sig AS (SELECT asset_id, $bits AS sh FROM agg),
        |banded AS (SELECT asset_id, sh, band, (sh >> (band * 16)) & 65535 AS chunk
        |           FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b),
        |cand AS (SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
        |                a.sh AS sh_a, b.sh AS sh_b
        |         FROM banded a JOIN banded b
        |           ON a.band = b.band AND a.chunk = b.chunk
        |          AND a.asset_id < b.asset_id)
        |SELECT asset_a, asset_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $PhashMaxHamming""".stripMargin
    },

    // x206: incremental view maintenance — the oracle is the FULL
    // recompute; the base/delta split is a Spark-side plan property and
    // the maintained aggregate must be identical.
    "x206_ivm_revenue" ->
      """SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,

    // x207: integer-exact power iteration — x175's quantization, pinned
    // unrolled rounds, BIGINT dot/accumulate, sign-split positive-only
    // floor division for the rescale.
    "x207_power_iteration" -> {
      import operators.Similarity.{PiIters, PiScale, QuantLevels}
      val rounds = (1 to PiIters).map { i =>
        val prev = s"v${i - 1}"
        s"""dot$i AS (SELECT qd.vec_id, CAST(sum(qd.qv * $prev.v) AS BIGINT) AS dot
           |          FROM qd JOIN $prev USING (d) GROUP BY 1),
           |raw$i AS (SELECT qd.d, CAST(sum(qd.qv * dot$i.dot) AS BIGINT) AS raw
           |          FROM qd JOIN dot$i USING (vec_id) GROUP BY 1),
           |m$i AS (SELECT max(abs(raw)) AS m FROM raw$i),
           |v$i AS (SELECT d,
           |          CASE WHEN m = 0 THEN 0
           |               WHEN raw >= 0 THEN (raw * $PiScale) // m
           |               ELSE -(((-raw) * $PiScale) // m) END AS v
           |        FROM raw$i, m$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale FROM e),
        |qv AS (SELECT vec_id,
        |         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |           ELSE CAST(floor(x / scale * $QuantLevels.0 + 0.5) AS BIGINT) END) AS q
        |       FROM sc),
        |qd AS (SELECT vec_id, dd.d, q[dd.d + 1] AS qv
        |       FROM qv, (SELECT unnest(range(64)) AS d) dd),
        |v0 AS (SELECT unnest(range(64)) AS d,
        |              CASE WHEN unnest(range(64)) = 0 THEN $PiScale ELSE 0 END AS v),
        |$rounds
        |SELECT CAST(d AS INTEGER) AS dim, CAST(v AS BIGINT) AS v_scaled
        |FROM v$PiIters""".stripMargin
    },

    // x208: equi-depth range boundaries — per-key histogram, running
    // sum over DISTINCT keys, smallest key reaching ⌈i·n/B⌉.
    "x208_range_bounds" -> {
      import operators.Relational.RangeBuckets
      s"""WITH hist AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows
        |              FROM orders GROUP BY 1),
        |cum AS (SELECT o_custkey,
        |               CAST(sum(n_rows) OVER (ORDER BY o_custkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |        FROM hist),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM hist),
        |targets AS (SELECT r.i AS bucket_idx,
        |                   (r.i * t.n_total + ${RangeBuckets - 1}) // $RangeBuckets AS target
        |            FROM (SELECT unnest(range(1, $RangeBuckets)) AS i) r CROSS JOIN tot t),
        |bounds AS (
        |  SELECT g.bucket_idx, g.target, min(c.o_custkey) AS boundary_key
        |  FROM targets g JOIN cum c ON c.cum >= g.target
        |  GROUP BY 1, 2)
        |SELECT b.bucket_idx, b.target, b.boundary_key, c.cum AS cum_rows
        |FROM bounds b JOIN cum c ON b.boundary_key = c.o_custkey""".stripMargin
    },

    // x209: Z-order tile audit — equi-width buckets on (custkey, day),
    // closed-form Morton interleave, per-tile envelopes.
    "x209_zorder_tiles" -> {
      import operators.Relational.ZorderBits
      val m = 1 << ZorderBits
      val interleave = (0 until ZorderBits).map(b =>
        s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
        .mkString(" + ")
      s"""WITH rows_ AS (
        |  SELECT o_custkey AS k,
        |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |  FROM orders),
        |bounds AS (SELECT min(k) AS min_k, max(k) AS max_k,
        |                  min(day) AS min_d, max(day) AS max_d FROM rows_),
        |tiled AS (
        |  SELECT k, day,
        |         ((k - min_k) * $m) // (max_k - min_k + 1) AS bx,
        |         ((day - min_d) * $m) // (max_d - min_d + 1) AS by
        |  FROM rows_ CROSS JOIN bounds)
        |SELECT ($interleave) AS tile, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(k) AS min_key, max(k) AS max_key,
        |       min(day) AS min_day, max(day) AS max_day
        |FROM tiled GROUP BY 1""".stripMargin
    },

    // x210: explicit GROUPING SETS panel with grouping_id — the CUBE/
    // ROLLUP primitive, level list chosen not implied.
    "x210_grouping_sets" ->
      """SELECT c.c_nationkey, year(o.o_orderdate) AS yr,
        |       CAST(GROUPING(c.c_nationkey, year(o.o_orderdate)) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY GROUPING SETS ((c.c_nationkey, year(o.o_orderdate)),
        |                        (c.c_nationkey), (year(o.o_orderdate)), ())""".stripMargin,

    // x211: out-of-orderness histogram under the md5 collector-arrival
    // model — global running-max lateness (the oracle's single window ≡
    // the engine's sharded two-phase prefix max), ⌊log2⌋ via bin().
    "x211_lateness_hist" ->
      """WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |                  ('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS arr
        |           FROM events),
        |l AS (SELECT max(ts_s) OVER (ORDER BY arr, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ts_s
        |               AS lateness_s
        |      FROM e)
        |SELECT CASE WHEN lateness_s = 0 THEN -1
        |            ELSE CAST(length(bin(lateness_s)) - 1 AS BIGINT) END AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(max(lateness_s) AS BIGINT) AS max_lateness_s
        |FROM l GROUP BY 1""".stripMargin,

    // x212: exact watermark drop panel — shared arrival-lateness model,
    // tiny watermark cross, exact per-delay counts.
    "x212_watermark_drops" -> {
      import operators.Sessionize.LatenessWatermarks
      val wmList = LatenessWatermarks.mkString("[", ", ", "]")
      s"""WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |                  ('0x' || substr(md5('arr:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS arr
        |           FROM events),
        |l AS (SELECT max(ts_s) OVER (ORDER BY arr, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ts_s
        |               AS lateness_s
        |      FROM e),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM l),
        |wm AS (SELECT CAST(unnest($wmList) AS BIGINT) AS watermark_s)
        |SELECT w.watermark_s,
        |       CAST(sum(CASE WHEN l.lateness_s > w.watermark_s THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dropped,
        |       t.n_total,
        |       (1000000 * CAST(sum(CASE WHEN l.lateness_s > w.watermark_s
        |                                THEN 1 ELSE 0 END) AS BIGINT)) // t.n_total
        |         AS drop_ppm
        |FROM l CROSS JOIN wm w CROSS JOIN tot t
        |GROUP BY 1, 3""".stripMargin
    },

    // x213: dedup-aggressiveness sweep — x205's banded candidate CTEs,
    // 4-row threshold fan-out, first-occurrence-wins removal ledger.
    "x213_dedup_sweep" -> {
      import operators.Multimodal.{ChunkBytes, PhashMaxHamming, SweepThresholds}
      val counts = (0 until 60).map(b => s"SUM((h >> $b) & 1) AS c$b").mkString(", ")
      val bits = (0 until 60)
        .map(b => s"(CASE WHEN c$b * 2 > n THEN 1::BIGINT ELSE 0::BIGINT END << $b)")
        .mkString(" + ")
      val thList = SweepThresholds.mkString("[", ", ", "]")
      s"""WITH a AS (SELECT doc_id AS asset_id, text, n_chars FROM documents),
        |ch AS (SELECT asset_id,
        |         ('0x' || substr(md5(substr(text, 1 + $ChunkBytes * i, $ChunkBytes)), 1, 15))::BIGINT AS h
        |       FROM a, unnest(range(0, (length(text) + ${ChunkBytes - 1}) // $ChunkBytes)) t(i)),
        |agg AS (SELECT asset_id, COUNT(*) AS n, $counts FROM ch GROUP BY asset_id),
        |sig AS (SELECT asset_id, $bits AS sh FROM agg),
        |banded AS (SELECT asset_id, sh, band, (sh >> (band * 16)) & 65535 AS chunk
        |           FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b),
        |cand AS (SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
        |                bit_count(xor(a.sh, b.sh)) AS hamming
        |         FROM banded a JOIN banded b
        |           ON a.band = b.band AND a.chunk = b.chunk
        |          AND a.asset_id < b.asset_id),
        |pairs AS (SELECT * FROM cand WHERE hamming <= $PhashMaxHamming),
        |th AS (SELECT CAST(unnest($thList) AS BIGINT) AS threshold),
        |fan AS (SELECT t.threshold, p.asset_a, p.asset_b
        |        FROM pairs p JOIN th t ON p.hamming <= t.threshold),
        |np AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM fan GROUP BY 1),
        |rem AS (SELECT f.threshold, CAST(count(*) AS BIGINT) AS n_removable,
        |               CAST(sum(d.n_chars) AS BIGINT) AS bytes_reclaimed
        |        FROM (SELECT DISTINCT threshold, asset_b FROM fan) f
        |        JOIN a d ON f.asset_b = d.asset_id
        |        GROUP BY 1)
        |SELECT t.threshold, coalesce(np.n_pairs, 0) AS n_pairs,
        |       coalesce(rem.n_removable, 0) AS n_removable,
        |       coalesce(rem.bytes_reclaimed, 0) AS bytes_reclaimed
        |FROM th t LEFT JOIN np ON t.threshold = np.threshold
        |LEFT JOIN rem ON t.threshold = rem.threshold""".stripMargin
    },

    // x214: multi-source reachability — x180's edge CTE, deterministic
    // top-4 hub pick, x151's level-synchronous rounds keyed (src, node).
    "x214_reach_panel" -> {
      import operators.LinkAnalysis.{BfsMaxHops, ReachSources, TriMinSupport}
      val rounds = (1 to BfsMaxHops).map { i =>
        val (pv, pf) = (s"v${i - 1}", s"f${i - 1}")
        s"""n$i AS (SELECT DISTINCT f.src, s.b AS node
           |        FROM $pf f JOIN sym s ON f.node = s.a),
           |f$i AS (SELECT n.src, n.node FROM n$i n
           |        WHERE NOT EXISTS (SELECT 1 FROM $pv v
           |                          WHERE v.src = n.src AND v.node = n.node)),
           |v$i AS (SELECT src, node, dist FROM $pv
           |        UNION ALL SELECT src, node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |sym AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |srcs AS (SELECT a AS src FROM deg ORDER BY deg DESC, a LIMIT $ReachSources),
        |v0 AS (SELECT src, src AS node, CAST(0 AS BIGINT) AS dist FROM srcs),
        |f0 AS (SELECT src, node FROM v0),
        |$rounds
        |SELECT src, dist, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM v$BfsMaxHops GROUP BY 1, 2""".stripMargin
    },

    // x215: forecast model duel — x117's residual construction for both
    // lags, exact paired win/loss/tie counts (the sign-test inputs).
    "x215_forecast_duel" -> {
      import operators.Forecast.{DuelChallengerLag, SeasonalLagDays}
      s"""WITH daily AS (
        |  SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |m AS (SELECT min(day) AS min_day FROM daily),
        |j AS (SELECT d.p_brand, d.day,
        |             abs(d.rev_cents - coalesce(f7.rev_cents, 0)) AS e_champ,
        |             abs(d.rev_cents - coalesce(f1.rev_cents, 0)) AS e_chall
        |      FROM daily d
        |      LEFT JOIN daily f7 ON d.p_brand = f7.p_brand
        |        AND f7.day = d.day - $SeasonalLagDays
        |      LEFT JOIN daily f1 ON d.p_brand = f1.p_brand
        |        AND f1.day = d.day - $DuelChallengerLag
        |      CROSS JOIN m WHERE d.day >= m.min_day + $SeasonalLagDays)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(e_champ) AS BIGINT) AS champ_abs_err_cents,
        |       CAST(sum(e_chall) AS BIGINT) AS chall_abs_err_cents,
        |       CAST(sum(CASE WHEN e_champ < e_chall THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_champ_wins,
        |       CAST(sum(CASE WHEN e_chall < e_champ THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_chall_wins,
        |       CAST(sum(CASE WHEN e_champ = e_chall THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_ties
        |FROM j GROUP BY 1""".stripMargin
    },

    // x216: cross-table corpus alignment — full outer id join, one-row
    // referential panel across the document/vector boundary.
    "x216_corpus_alignment" ->
      """WITH d AS (SELECT DISTINCT doc_id FROM documents),
        |v AS (SELECT DISTINCT vec_id FROM embeddings),
        |j AS (SELECT d.doc_id, v.vec_id
        |      FROM d FULL OUTER JOIN v ON d.doc_id = v.vec_id)
        |SELECT CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs,
        |       CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_docs_unembedded,
        |       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_vecs_orphaned,
        |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |       min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
        |FROM j""".stripMargin,

    // x217: label-conditioned term lift — presence counts over the
    // aligned doc/vector ids, integer ppm lift, per-label top-k.
    "x217_label_terms" -> {
      import operators.TextAnalysis.{LabelTermMinDocs, LabelTermTopK}
      s"""WITH lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
        |tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents),
        |o AS (SELECT l.label, t.term, CAST(count(*) AS BIGINT) AS o
        |      FROM tok t JOIN lab l ON t.doc_id = l.doc_id GROUP BY 1, 2),
        |cs AS (SELECT term, CAST(sum(o) AS BIGINT) AS df FROM o GROUP BY 1),
        |rs AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM lab GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM lab),
        |sc AS (SELECT o.label, o.term, o.o, cs.df, rs.n_label, n.n_docs,
        |              (1000000 * o.o * n.n_docs) // (rs.n_label * cs.df) AS lift_ppm
        |       FROM o JOIN cs USING (term) JOIN rs USING (label) CROSS JOIN n
        |       WHERE o.o >= $LabelTermMinDocs),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
        |                 ORDER BY lift_ppm DESC, term) AS BIGINT) AS rank
        |       FROM sc)
        |SELECT label, rank, term, o, df, n_label, n_docs, lift_ppm
        |FROM rk WHERE rank <= $LabelTermTopK""".stripMargin
    },

    // x218: consistent-hash ring churn — the 576-vnode ring as a
    // generated VALUES list (plan-time constants), clockwise-successor
    // argmin with lexicographic (dist, node) tie-break, old/new rings
    // resolved in one grouped pass each.
    "x218_ring_churn" -> {
      import operators.Sampling.{RingNodes, RingVnodes}
      val ring = operators.Sampling.ringPositions(RingNodes + 1, RingVnodes)
      val values = ring.map { case (n, p) => s"($n, $p)" }.mkString(", ")
      val mod = 1L << 60
      s"""WITH ring(node, pos) AS (VALUES $values),
        |k AS (SELECT doc_id,
        |        ('0x' || substr(md5('key:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM documents),
        |d AS (SELECT k.doc_id, r.node,
        |             (((r.pos - k.h) % $mod) + $mod) % $mod AS dist
        |      FROM k CROSS JOIN ring r),
        |a AS (SELECT doc_id,
        |             min(CASE WHEN node < $RingNodes THEN dist END) AS od,
        |             min(dist) AS nd
        |      FROM d GROUP BY 1),
        |sel AS (SELECT a.doc_id,
        |               min(CASE WHEN dd.node < $RingNodes AND dd.dist = a.od
        |                        THEN dd.node END) AS old_node,
        |               min(CASE WHEN dd.dist = a.nd THEN dd.node END) AS new_node
        |        FROM a JOIN d dd USING (doc_id) GROUP BY 1)
        |SELECT CAST(old_node AS BIGINT) AS node,
        |       CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(CASE WHEN old_node <> new_node THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_moved,
        |       (1000000 * CAST(sum(CASE WHEN old_node <> new_node THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS moved_ppm
        |FROM sel GROUP BY 1""".stripMargin
    },

    // x219: duplication–quality interaction — x17's cluster CTEs plus
    // x89's score expression, composed verbatim; size-band rollup with
    // the one-IEEE-division mean.
    "x219_dupe_quality" -> {
      import operators.TextAnalysis._
      s"""$clustersCteSql,
        |${qualityFeatureCtes.stripPrefix("WITH ")},
        |lbl AS (SELECT doc_id, min(label) AS canonical_id FROM reach GROUP BY doc_id),
        |sizes AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS sz
        |          FROM lbl GROUP BY 1),
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT)
        |         AS score_micro
        |  FROM feat),
        |joined AS (
        |  SELECT CASE WHEN s.sz = 1 THEN '1' WHEN s.sz = 2 THEN '2'
        |              WHEN s.sz <= 4 THEN '3-4' ELSE '5+' END AS size_band,
        |         l.canonical_id, q.score_micro
        |  FROM lbl l JOIN sizes s USING (canonical_id)
        |  JOIN scored q USING (doc_id))
        |SELECT size_band, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters,
        |       CAST(sum(score_micro) AS BIGINT) AS sum_score_micro,
        |       min(score_micro) AS min_score_micro,
        |       max(score_micro) AS max_score_micro,
        |       CAST(sum(score_micro) AS DOUBLE) / count(*) AS mean_score
        |FROM joined GROUP BY 1""".stripMargin
    },

    // x220: table checksum manifest — the canonical row strings and the
    // modular md5-60 sum, generated per table from one shared builder.
    // Each field is length-prefixed (`len:value`, NULL → `N`) before the
    // '|' join — Relational.canonField's shape — so a value containing
    // '|' can't shift field boundaries and NULL ≠ empty string.
    "x220_table_checksums" -> {
      import operators.Relational.ChecksumMod
      def cents(c: String) = s"CAST(CAST(round($c * 100) AS BIGINT) AS VARCHAR)"
      def day(c: String) =
        s"CAST((CAST(floor(epoch($c)) AS BIGINT) // 86400) AS VARCHAR)"
      def canon(f: String): String =
        s"CASE WHEN ($f) IS NULL THEN 'N' ELSE CAST(length($f) AS VARCHAR) || ':' || ($f) END"
      def block(table: String, fields: String*): String =
        s"""SELECT '$table' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum((('0x' || substr(md5(concat_ws('|', ${fields.map(canon).mkString(", ")})), 1, 15))::BIGINT)
           |                % $ChecksumMod) AS BIGINT) AS checksum
           |FROM $table""".stripMargin
      Seq(
        block("region", "CAST(r_regionkey AS VARCHAR)", "r_name"),
        block("nation",
          "CAST(n_nationkey AS VARCHAR)", "n_name", "CAST(n_regionkey AS VARCHAR)"),
        block("supplier",
          "CAST(s_suppkey AS VARCHAR)", "s_name", "CAST(s_nationkey AS VARCHAR)", cents("s_acctbal")),
        block("part",
          "CAST(p_partkey AS VARCHAR)", "p_name", "p_brand", "p_type", "CAST(p_size AS VARCHAR)", cents("p_retailprice")),
        block("customer",
          "CAST(c_custkey AS VARCHAR)", "c_name", "CAST(c_nationkey AS VARCHAR)", cents("c_acctbal"), "c_mktsegment"),
        block("orders",
          "CAST(o_orderkey AS VARCHAR)", "CAST(o_custkey AS VARCHAR)", "o_orderstatus", cents("o_totalprice"), day("o_orderdate"), "o_orderpriority"),
        block("lineitem",
          "CAST(l_orderkey AS VARCHAR)", "CAST(l_partkey AS VARCHAR)", "CAST(l_suppkey AS VARCHAR)", "CAST(l_linenumber AS VARCHAR)", cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"), cents("l_tax"), "l_returnflag", "l_linestatus", day("l_shipdate")),
        block("documents",
          "CAST(doc_id AS VARCHAR)", "text", "lang", "source", "CAST(n_chars AS VARCHAR)"),
        block("events",
          "CAST(event_id AS VARCHAR)", "CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR)", "CAST(user_id AS VARCHAR)", "event_type", cents("value"), "props")
      ).mkString("", "\nUNION ALL\n", "")
    },

    // x221: ANN staged-swap fidelity — exact brute-force ranking vs the
    // hyperplane-LSH radius-R candidate ranking (x202's scoring CTEs),
    // per-exact-rank recall + displacement rollup. Builder shared with
    // the sampled twin (x233).
    "x221_ann_swap" -> annSwapOracleSql(sampled = false),

    // x222: zone-map skipping audit — equi-width file/predicate buckets
    // (integer div, x209's rule), min/max skip decision, matching counts.
    "x222_zone_map" -> zoneMapOracleSql,

    // x235: the footer-backed variant — SAME oracle as x222 by design:
    // the written layout partitions rows by the identical bucket rule,
    // so the real footer stats must reproduce the modeled grid exactly.
    "x235_footer_zone_map" -> zoneMapOracleSql,

    // x223: histogram join-cardinality estimator — per-bucket uniformity
    // estimate vs exact sum-of-squares, sign-split error division.
    "x223_join_cardest" -> {
      import operators.Relational.CardBuckets
      s"""WITH kc AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |            FROM lineitem GROUP BY 1),
        |bb AS (SELECT min(k) AS min_k, max(k) AS max_k FROM kc),
        |h AS (SELECT ((k - min_k) * $CardBuckets) // (max_k - min_k + 1) AS b,
        |             CAST(sum(c) AS BIGINT) AS n_rows,
        |             CAST(count(*) AS BIGINT) AS ndv,
        |             CAST(sum(c * c) AS BIGINT) AS exact_rows
        |      FROM kc, bb GROUP BY 1),
        |e AS (SELECT b, n_rows, ndv, exact_rows,
        |             (n_rows * n_rows) // ndv AS est_rows FROM h)
        |SELECT b, n_rows, ndv, est_rows, exact_rows,
        |       CASE WHEN est_rows >= exact_rows
        |            THEN (1000000 * (est_rows - exact_rows)) // exact_rows
        |            ELSE -((1000000 * (exact_rows - est_rows)) // exact_rows)
        |       END AS err_ppm
        |FROM e""".stripMargin
    },

    // x224: per-batch centroid drift — x175's quantization, exact integer
    // sums, sign-split milli-unit rescale, lag-1 L1 distance.
    "x224_centroid_drift" -> {
      import operators.Similarity.{DriftBatches, DriftScale, QuantLevels}
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ids AS (SELECT min(vec_id) AS min_id, max(vec_id) AS max_id FROM e),
        |s AS (SELECT ((vec_id - min_id) * $DriftBatches) // (max_id - min_id + 1) AS batch, v,
        |        list_aggregate(list_transform(v, x -> abs(x)), 'max') AS sc
        |      FROM e, ids),
        |qd AS (SELECT batch, dd.d,
        |         CASE WHEN sc = 0 THEN 0
        |              ELSE CAST(floor(v[dd.d + 1] / sc * $QuantLevels.0 + 0.5) AS BIGINT) END AS qv
        |       FROM s, (SELECT unnest(range(64)) AS d) dd),
        |cent AS (SELECT batch, d, CAST(sum(qv) AS BIGINT) AS sm,
        |                CAST(count(*) AS BIGINT) AS n FROM qd GROUP BY 1, 2),
        |cc AS (SELECT batch, d, n,
        |              CASE WHEN sm >= 0 THEN (sm * $DriftScale) // n
        |                   ELSE -(((-sm) * $DriftScale) // n) END AS c
        |       FROM cent)
        |SELECT cur.batch AS batch, max(cur.n) AS n_vecs,
        |       CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS l1_drift_milli,
        |       CAST(max(abs(cur.c - prev.c)) AS BIGINT) AS max_dim_shift_milli
        |FROM cc cur JOIN cc prev ON cur.batch = prev.batch + 1 AND cur.d = prev.d
        |GROUP BY 1""".stripMargin
    },

    // x225: retrieval eval — exact brute-force top-k (x221's scoring
    // CTEs) + label joins, per-label hit@k and integer reciprocal rank.
    // Builder shared with the sampled twin (x234).
    "x225_retrieval_eval" -> retrievalEvalOracleSql(sampled = false),

    // x226: peak session concurrency — the x11 session CTE, boundary
    // deltas, running-sum sweep, per-day peak + earliest attaining second.
    "x226_peak_concurrency" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts_s - lag(ts_s, 1) OVER w > 1800 THEN 1
        |                 WHEN lag(ts_s, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT user_id, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx,
        |         ts_s
        |  FROM flagged),
        |spans AS (SELECT min(ts_s) AS s0, max(ts_s) AS s1
        |          FROM sess GROUP BY user_id, session_idx),
        |deltas AS (SELECT sec, CAST(sum(d) AS BIGINT) AS d FROM (
        |             SELECT s0 AS sec, 1 AS d FROM spans
        |             UNION ALL SELECT s1 + 1 AS sec, -1 AS d FROM spans) u
        |           GROUP BY 1),
        |conc AS (SELECT sec, sec // 86400 AS day,
        |                CAST(sum(d) OVER (ORDER BY sec
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
        |         FROM deltas),
        |da AS (SELECT day, max(conc) AS day_max,
        |              CAST(count(*) AS BIGINT) AS n_boundaries,
        |              max_by(conc, sec) AS close_conc,
        |              max(CASE WHEN sec = day * 86400 THEN 1 ELSE 0 END) AS has_midnight
        |       FROM conc GROUP BY 1),
        |span AS (SELECT unnest(generate_series((SELECT min(day) FROM conc),
        |                                       (SELECT max(day) FROM conc))) AS day),
        |car AS (SELECT s.day, d.day_max,
        |               CAST(coalesce(d.n_boundaries, 0) AS BIGINT) AS n_boundaries,
        |               d.close_conc, d.has_midnight
        |        FROM span s LEFT JOIN da d ON s.day = d.day),
        |car2 AS (SELECT day, day_max, n_boundaries,
        |                CAST(CASE WHEN coalesce(has_midnight, 0) = 1 THEN -1
        |                     ELSE coalesce(last_value(close_conc IGNORE NULLS) OVER (
        |                       ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                       0) END AS BIGINT) AS carry_in
        |         FROM car),
        |pk AS (SELECT day, CAST(greatest(coalesce(day_max, 0), carry_in) AS BIGINT)
        |                AS peak_concurrency,
        |              n_boundaries, carry_in FROM car2)
        |SELECT p.day, p.peak_concurrency,
        |       CAST(min(CASE WHEN p.carry_in >= p.peak_concurrency THEN p.day * 86400
        |                     WHEN c.conc = p.peak_concurrency THEN c.sec END) AS BIGINT) AS at_s,
        |       p.n_boundaries
        |FROM pk p LEFT JOIN conc c ON c.day = p.day
        |GROUP BY 1, 2, 4""".stripMargin,

    // x227: histogram-sketch quantile vs exact rank pick — equi-width
    // cents buckets, in-bucket interpolation, absolute error ppm.
    "x227_quantile_sketch" -> {
      import operators.Relational.{QsBuckets, QsPcts}
      val pctList = QsPcts.mkString("[", ", ", "]")
      s"""WITH vals AS (SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS BIGINT) AS v,
        |                     CAST(count(*) AS BIGINT) AS cnt
        |              FROM orders GROUP BY 1),
        |b AS (SELECT min(v) AS min_v, max(v) AS max_v,
        |             CAST(sum(cnt) AS BIGINT) AS n FROM vals),
        |hist AS (SELECT ((v - min_v) * $QsBuckets) // (max_v - min_v + 1) AS bk,
        |                CAST(sum(cnt) AS BIGINT) AS bc
        |         FROM vals, b GROUP BY 1),
        |hc AS (SELECT bk, bc, CAST(sum(bc) OVER (ORDER BY bk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM hist),
        |ec AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ecum
        |       FROM vals),
        |p AS (SELECT CAST(unnest($pctList) AS BIGINT) AS pct),
        |t AS (SELECT pct, (pct * n + 99) // 100 AS target, min_v, max_v FROM p, b),
        |estb AS (SELECT t.pct, t.target, t.min_v, t.max_v, min(h.bk) AS bk
        |         FROM t JOIN hc h ON h.cum >= t.target GROUP BY 1, 2, 3, 4),
        |est AS (SELECT e.pct, e.target,
        |          (e.min_v + (e.bk * (e.max_v - e.min_v + 1) + ${QsBuckets - 1}) // $QsBuckets)
        |          + ((e.target - (h.cum - h.bc) - 1) *
        |             ((e.min_v + ((e.bk + 1) * (e.max_v - e.min_v + 1) + ${QsBuckets - 1}) // $QsBuckets - 1)
        |              - (e.min_v + (e.bk * (e.max_v - e.min_v + 1) + ${QsBuckets - 1}) // $QsBuckets) + 1)) // h.bc
        |            AS est_cents
        |        FROM estb e JOIN hc h ON e.bk = h.bk),
        |ex AS (SELECT t.pct, min(ec.v) AS exact_cents
        |       FROM t JOIN ec ON ec.ecum >= t.target GROUP BY 1)
        |SELECT est.pct, t.target, est.est_cents, ex.exact_cents,
        |       (1000000 * abs(est.est_cents - ex.exact_cents)) // ex.exact_cents AS err_ppm
        |FROM est JOIN ex ON est.pct = ex.pct JOIN t ON t.pct = est.pct""".stripMargin
    },

    // x228: browse-run pattern census — gaps-and-islands runs of
    // view/click events, outcome = the event after the run (sentinel
    // '~end~' at stream end so max_by never aggregates a NULL value).
    "x228_browse_runs" -> {
      import operators.Sessionize.RunLenCap
      s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |m AS (SELECT *, row_number() OVER w AS rn,
        |             coalesce(lead(event_type, 1) OVER w, '~end~') AS next_type
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |b AS (SELECT * FROM m WHERE event_type IN ('view', 'click')),
        |r AS (SELECT *, CASE WHEN coalesce(rn - lag(rn, 1) OVER v, 2) > 1
        |                     THEN 1 ELSE 0 END AS run_start
        |      FROM b WINDOW v AS (PARTITION BY user_id ORDER BY rn)),
        |ri AS (SELECT *, CAST(sum(run_start) OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
        |       FROM r),
        |runs AS (SELECT user_id, run_id, CAST(count(*) AS BIGINT) AS run_len,
        |                max_by(next_type, rn) AS after
        |         FROM ri GROUP BY 1, 2),
        |o AS (SELECT user_id, run_len,
        |             CASE WHEN after = '~end~' THEN 'open'
        |                  WHEN after = 'purchase' THEN 'converted'
        |                  ELSE 'abandoned' END AS outcome
        |      FROM runs)
        |SELECT least(run_len, $RunLenCap) AS len_bucket, outcome,
        |       CAST(count(*) AS BIGINT) AS n_runs,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM o GROUP BY 1, 2""".stripMargin
    },

    // x229: clamped stock ledger — prefix sum + running min, the
    // closed form of the non-associative max(0, s+f) recurrence.
    "x229_stock_ledger" ->
      """WITH daily AS (
        |  SELECT l_partkey AS part,
        |         CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CASE WHEN l_returnflag = 'R'
        |                       THEN CAST(round(l_quantity) AS BIGINT)
        |                       ELSE -CAST(round(l_quantity) AS BIGINT) END) AS BIGINT) AS f
        |  FROM lineitem GROUP BY 1, 2),
        |s1 AS (SELECT part, day,
        |              CAST(sum(f) OVER (PARTITION BY part ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        |       FROM daily),
        |s2 AS (SELECT part, day, s,
        |              CAST(min(s) OVER (PARTITION BY part ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
        |       FROM s1),
        |st AS (SELECT part, day, s, s - least(m, CAST(0 AS BIGINT)) AS stock FROM s2)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(max_by(stock, day) AS BIGINT) AS final_stock,
        |       CAST(-least(min(s), 0) AS BIGINT) AS clamp_loss,
        |       CAST(max(stock) AS BIGINT) AS peak_stock
        |FROM st GROUP BY 1""".stripMargin,

    // x230: Kish ESS of the DSIR weights — x95's weight CTEs, HUGEINT
    // moments, decimal-string rationals per the x156 convention.
    "x230_importance_ess" ->
      s"""WITH $dsirWeightsCtes,
        |j AS (SELECT w.imp_per_tok AS wt, d.source
        |      FROM w JOIN documents d USING (doc_id)),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             sum(CAST(wt AS HUGEINT)) AS sw,
        |             sum(CAST(wt AS HUGEINT) * CAST(wt AS HUGEINT)) AS sw2
        |      FROM j GROUP BY 1)
        |SELECT source, n_docs,
        |       CAST(CAST(sw AS DECIMAL(38,0)) AS VARCHAR) AS sum_w,
        |       CAST(CAST(sw * sw AS DECIMAL(38,0)) AS VARCHAR) AS ess_num,
        |       CAST(CAST(sw2 AS DECIMAL(38,0)) AS VARCHAR) AS ess_den
        |FROM a""".stripMargin,

    // x231: the before/after-OPTIMIZE skipping delta — x222's zone-map
    // audit against the current AND the Morton-tiled (3 bits/dim = 64
    // files) layout, rows scanned per predicate on each.
    "x231_zorder_delta" -> zorderDeltaOracleSql,

    // x236: the footer-backed variant — SAME oracle as x231: both written
    // layouts bucket rows by the identical deterministic rules, so the
    // real footer stats must reproduce the modeled delta exactly.
    "x236_footer_zorder_delta" -> zorderDeltaOracleSql,

    // x232/x233/x234: the fidelity audits' bounded-cost production mode —
    // the x202/x221/x225 pipelines restricted to x27's deterministic
    // md5-bucket query sample (salt "qsample", AuditSampleBps/10000 kept).
    // Per-query panels are independent across queries, so sampled ≡ full
    // restricted to the sample; the oracles re-derive that restriction.
    "x232_recall_curve_sampled" -> recallCurveOracleSql(sampled = true),

    "x233_ann_swap_sampled" -> annSwapOracleSql(sampled = true),

    "x234_retrieval_eval_sampled" -> retrievalEvalOracleSql(sampled = true),

    // x241: the retrieval eval SERVED BY the ANN stage — the task-level
    // price of the swap (x221 is rank-level; this is "does hit@k/MRR
    // actually degrade"), oracle = x225's builder over the radius-R ball.
    "x241_retrieval_eval_ann" -> retrievalEvalOracleSql(sampled = false,
      annRadius = Some(operators.AnnStage.AnnRadius)),

    // x242: temperature-scaled mixture — exact integer floor-sqrt
    // (double sqrt + ±1 correction, same text as the Spark side) and
    // integer ppm shares.
    "x242_temperature_mixture" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |w0 AS (SELECT source, n_docs,
        |              CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS i0
        |       FROM c),
        |w1 AS (SELECT source, n_docs,
        |              i0 + (CASE WHEN (i0 + 1) * (i0 + 1) <= n_docs THEN 1 ELSE 0 END) AS i1
        |       FROM w0),
        |w AS (SELECT source, n_docs,
        |             i1 - (CASE WHEN i1 * i1 > n_docs THEN 1 ELSE 0 END) AS w
        |      FROM w1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |             CAST(sum(w) AS BIGINT) AS w_total FROM w),
        |s AS (SELECT source, n_docs, w, n_total, w_total,
        |             (1000000 * n_docs) // n_total AS raw_share_ppm,
        |             (1000000 * w) // w_total AS temp_share_ppm
        |      FROM w, t)
        |SELECT source, n_docs, w, raw_share_ppm, temp_share_ppm,
        |       CASE WHEN raw_share_ppm = 0
        |            THEN (w * ((1000000 * n_total) // n_docs)) // w_total
        |            ELSE (1000000 * temp_share_ppm) // raw_share_ppm END
        |         AS resample_ppm
        |FROM s""".stripMargin,

    // x237: priority sampling (PPSWOR) — md5 uniforms, fixed-point
    // priorities, top-(k+1) threshold, Horvitz–Thompson subset sums.
    "x237_priority_sample" -> {
      import operators.Sampling.{PrioritySampleK, PriorityLevels}
      s"""WITH w AS (SELECT doc_id, source, n_chars AS w,
        |             ('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |               // $PriorityLevels AS h
        |           FROM documents),
        |p AS (SELECT *, (w * $PriorityLevels) // (h + 1) AS prio FROM w),
        |r AS (SELECT *, row_number() OVER (ORDER BY prio DESC, doc_id) AS rn FROM p),
        |tau AS (SELECT coalesce(max(CASE WHEN rn = ${PrioritySampleK + 1} THEN prio END), 0) AS tau
        |        FROM r),
        |s AS (SELECT * FROM r WHERE rn <= $PrioritySampleK),
        |est AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
        |               CAST(sum(greatest(w, tau)) AS BIGINT) AS est_sum
        |        FROM s, tau GROUP BY 1),
        |ex AS (SELECT source, CAST(sum(w) AS BIGINT) AS sum_w FROM w GROUP BY 1)
        |SELECT ex.source, coalesce(est.n_sampled, 0) AS n_sampled, ex.sum_w,
        |       coalesce(est.est_sum, 0) AS est_sum
        |FROM ex LEFT JOIN est ON ex.source = est.source""".stripMargin
    },

    // x238: Matryoshka truncation recall — prefix-sliced cosine rankings
    // per d, x221's exact CTE as the baseline, per-d ledger. ONE builder
    // with its sampled twin (x282) so the two gates can never drift.
    "x238_matryoshka_recall" -> matryoshkaOracleSql(sampled = false),
    // x282: x238's bounded-cost production mode — the r16 skip-list
    // closure: x238's corpus-as-queries cross is the one shape whose
    // DuckDB replay cannot run at sf1 (≈10⁹-row intermediate), so the
    // sampled twin (10% md5 query bucket, restriction commutes with the
    // per-query rollups — spec-proven) carries the oracle evidence at
    // 10× scale.
    "x282_matryoshka_sampled" -> matryoshkaOracleSql(sampled = true),

    // x239: hybrid related-document retrieval — RRF fusion (x137's
    // integer convention) of the exact-kNN ranking (x203's CTE) and the
    // TF-cosine lexical ranking (x163's CTEs, symmetrized).
    "x239_hybrid_related" -> {
      import operators.Retrieval.{HybridK, HybridRrfK}
      s"""WITH $hybridRankingCtes,
        |f AS (SELECT doc_id, rel_id, r_sem, r_lex,
        |             coalesce(1000000 // ($HybridRrfK + r_sem), 0) +
        |             coalesce(1000000 // ($HybridRrfK + r_lex), 0) AS rrf_micro
        |      FROM sem FULL OUTER JOIN lex USING (doc_id, rel_id))
        |SELECT doc_id, rel_id,
        |       coalesce(r_sem, -1) AS r_sem, coalesce(r_lex, -1) AS r_lex,
        |       CAST(rrf_micro AS BIGINT) AS rrf_micro,
        |       CAST(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY rrf_micro DESC, rel_id) AS BIGINT) AS r_fused
        |FROM f""".stripMargin
    },

    // x240: compaction-plan audit — x222's file/predicate CTEs, files
    // coalesced into row-balanced bins by exclusive-prefix div target,
    // the skip grid priced against both file sets.
    "x240_compaction_plan" -> {
      import operators.Relational.{CompactBins, ZoneFiles, ZonePredicates}
      s"""WITH rows_ AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
        |b AS (SELECT min(k) AS min_k, max(k) AS max_k,
        |             min(c) AS min_c, max(c) AS max_c FROM rows_),
        |tagged AS (SELECT ((k - min_k) * $ZoneFiles) // (max_k - min_k + 1) AS f, c
        |           FROM rows_, b),
        |files AS (SELECT f, CAST(count(*) AS BIGINT) AS f_rows,
        |                 min(c) AS f_min, max(c) AS f_max FROM tagged GROUP BY 1),
        |tot AS (SELECT CAST(sum(f_rows) AS BIGINT) AS total FROM files),
        |binned AS (SELECT f, f_rows, f_min, f_max,
        |                  coalesce(sum(f_rows) OVER (ORDER BY f
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                    // ((total + ${CompactBins - 1}) // $CompactBins) AS bin
        |           FROM files, tot),
        |bins AS (SELECT bin AS f, CAST(sum(f_rows) AS BIGINT) AS f_rows,
        |                min(f_min) AS f_min, max(f_max) AS f_max
        |         FROM binned GROUP BY 1),
        |preds AS (SELECT CAST(r.p AS BIGINT) AS p,
        |                 min_c + (r.p * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates AS lo,
        |                 min_c + ((r.p + 1) * (max_c - min_c + 1) + ${ZonePredicates - 1}) // $ZonePredicates - 1 AS hi
        |          FROM (SELECT unnest(range($ZonePredicates)) AS p) r, b),
        |gs AS (SELECT p, lo, hi,
        |              CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0 ELSE 1 END) AS BIGINT) AS files_read_small,
        |              CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0 ELSE f_rows END) AS BIGINT) AS rows_scanned_small
        |       FROM preds, files GROUP BY 1, 2, 3),
        |gc AS (SELECT p,
        |              CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0 ELSE 1 END) AS BIGINT) AS files_read_compacted,
        |              CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0 ELSE f_rows END) AS BIGINT) AS rows_scanned_compacted
        |       FROM preds, bins GROUP BY 1)
        |SELECT gs.p, gs.lo, gs.hi, gs.files_read_small, gs.rows_scanned_small,
        |       gc.files_read_compacted, gc.rows_scanned_compacted,
        |       gc.rows_scanned_compacted - gs.rows_scanned_small AS extra_rows_cost
        |FROM gs JOIN gc ON gs.p = gc.p""".stripMargin
    },

    // x243: compacted-stage equivalence — the query folds the stats FROM
    // the split→commit→compact→GC stage root; the oracle recomputes both
    // panels straight from documents. Hash match ⇒ compaction changed no
    // answers.
    "x243_compacted_stats" ->
      """WITH cs AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |                   min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |            FROM documents)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       cs.n_rows, cs.min_chars, cs.max_chars, cs.sum_chars
        |FROM documents d, cs
        |GROUP BY 1, 3, 4, 5, 6""".stripMargin,

    // x244: MERGE/upsert audit — the oracle replays the join+union
    // rewrite as anti-join + union (matched replaced, unmatched updates
    // inserted, rest kept), folded per priority.
    "x244_upsert_orders" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |                  o_orderpriority AS prio
        |           FROM orders),
        |u0 AS (SELECT k, cents*2 AS cents, 'UPSERTED' AS prio
        |       FROM o WHERE k % 10 = 3),
        |u AS (SELECT * FROM u0
        |      UNION ALL SELECT -k-1, cents, 'INSERTED' FROM u0),
        |m AS (SELECT * FROM u
        |      UNION ALL
        |      SELECT o.* FROM o WHERE k NOT IN (SELECT k FROM u))
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM m GROUP BY 1""".stripMargin,

    // x245: CDC last-wins apply — max_by over the unique seq replays
    // the collapse; HAVING drops keys whose final op is a delete.
    "x245_cdc_apply" -> {
      import operators.Relational.{CdcDeleteAt, CdcDeleteMod, CdcKeySpace}
      s"""WITH feed AS (
        |  SELECT o_orderkey % $CdcKeySpace AS k, o_orderkey AS seq,
        |         CASE WHEN o_orderkey % $CdcDeleteMod = $CdcDeleteAt
        |              THEN 'D' ELSE 'U' END AS op,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         o_orderpriority AS prio
        |  FROM orders)
        |SELECT k, max_by(cents, seq) AS final_cents,
        |       max_by(prio, seq) AS final_prio,
        |       CAST(count(*) AS BIGINT) AS n_ops,
        |       CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_deletes
        |FROM feed GROUP BY 1
        |HAVING max_by(op, seq) <> 'D'""".stripMargin
    },

    // x246: equi-depth histogram — the query folds per-value partials
    // from the compacted stats stage; the oracle recomputes straight
    // from documents (value → exclusive cumulative rank → bucket).
    "x246_equidepth_hist" -> {
      import operators.StatsStage.HistBuckets
      s"""WITH vc AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
        |            FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
        |c AS (SELECT v, cnt,
        |             coalesce(sum(cnt) OVER (ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS cum
        |      FROM vc),
        |b AS (SELECT CAST(($HistBuckets * cum) // n AS BIGINT) AS bucket,
        |             v, cnt FROM c, t)
        |SELECT bucket, min(v) AS lo_chars, max(v) AS hi_chars,
        |       CAST(sum(cnt) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_values
        |FROM b GROUP BY 1""".stripMargin
    },

    // x247: multi-epoch repetition schedule — x242's isqrt CTE for the
    // tempered weights, proportional shares capped at MaxEpochs·supply,
    // one surplus-redistribution round (re-capped), all floor integer.
    "x247_epoch_schedule" -> {
      import operators.Sampling.{EpochBudgetPct, MaxEpochs}
      s"""WITH s AS (SELECT source,
        |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
        |           FROM documents GROUP BY 1),
        |w0 AS (SELECT source, n_toks,
        |              CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT) AS i0
        |       FROM s),
        |w1 AS (SELECT source, n_toks,
        |              i0 + (CASE WHEN (i0 + 1) * (i0 + 1) <= n_toks THEN 1 ELSE 0 END) AS i1
        |       FROM w0),
        |w AS (SELECT source, n_toks,
        |             i1 - (CASE WHEN i1 * i1 > n_toks THEN 1 ELSE 0 END) AS w
        |      FROM w1),
        |t AS (SELECT CAST(sum(n_toks) AS BIGINT) AS total,
        |             CAST(sum(w) AS BIGINT) AS w_total FROM w),
        |sh AS (SELECT source, n_toks, w,
        |              ($EpochBudgetPct * total) // 100 AS budget,
        |              $MaxEpochs * n_toks AS cap,
        |              ((($EpochBudgetPct * total) // 100) * w) // w_total AS share
        |       FROM w, t),
        |a1 AS (SELECT sh.*, least(share, cap) AS a1,
        |              CASE WHEN share >= cap THEN 1 ELSE 0 END AS capped
        |       FROM sh),
        |r2 AS (SELECT CAST(max(budget) - sum(a1) AS BIGINT) AS surplus,
        |              CAST(COALESCE(sum(CASE WHEN capped = 0 THEN w END), 0)
        |                AS BIGINT) AS uw
        |       FROM a1),
        |f AS (SELECT a1.*,
        |             CASE WHEN capped = 0 AND uw > 0
        |                  THEN (surplus * w) // uw ELSE 0 END AS bonus
        |      FROM a1, r2)
        |SELECT source, n_toks, w, share, CAST(capped AS BIGINT) AS capped,
        |       CAST(least(a1 + bonus, cap) AS BIGINT) AS alloc,
        |       CAST((1000000 * least(a1 + bonus, cap)) // n_toks AS BIGINT)
        |         AS epochs_ppm
        |FROM f""".stripMargin
    },

    // x248: k-anonymity census — two-level group-by, QI = priority ×
    // status × order week (x132's day arithmetic // 7).
    "x248_k_anonymity" -> {
      import operators.Relational.KAnonThreshold
      s"""WITH g AS (SELECT o_orderpriority, o_orderstatus,
        |                  (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) // 7 AS wk,
        |                  CAST(count(*) AS BIGINT) AS class_size
        |           FROM orders GROUP BY 1, 2, 3)
        |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(class_size) AS BIGINT) AS n_rows,
        |       CAST(CASE WHEN class_size < $KAnonThreshold THEN 1 ELSE 0 END
        |         AS BIGINT) AS at_risk
        |FROM g GROUP BY 1""".stripMargin
    },

    // x249: bucketed co-located join — the oracle replays the join on
    // the plain parquet tables; a hash match proves the clustered
    // layout (bucketBy 16 + sortBy, one file per bucket) changed no
    // answers. The no-shuffle property is plan-asserted in the spec.
    "x249_bucketed_join" ->
      """SELECT o.o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) AS rev_cents
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin,

    // x250: bucket-pruned point lookup — the oracle's plain IN-list
    // join proves the pruned bucket read misses nothing.
    "x250_bucket_lookup" -> {
      val keys = operators.BucketedStage.LookupKeys.mkString(", ")
      s"""SELECT o.o_orderkey, o.o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) AS rev_cents
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN ($keys) AND l.l_orderkey IN ($keys)
        |GROUP BY 1, 2""".stripMargin
    },

    // x251: selectivity audit — x246's histogram CTEs + equal-width
    // predicate grid; estimate via uniform-within-bucket interpolation,
    // actual via the per-value counts, both exact floor integers.
    "x251_selectivity" -> {
      import operators.StatsStage.{HistBuckets, SelPredicates}
      s"""WITH vc AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
        |            FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
        |c AS (SELECT v, cnt,
        |             coalesce(sum(cnt) OVER (ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS cum
        |      FROM vc),
        |bk AS (SELECT ($HistBuckets * cum) // n AS bucket, v, cnt FROM c, t),
        |h AS (SELECT bucket, min(v) AS lo_chars, max(v) AS hi_chars,
        |             CAST(sum(cnt) AS BIGINT) AS n_rows
        |      FROM bk GROUP BY 1),
        |b AS (SELECT min(lo_chars) AS min_v, max(hi_chars) AS max_v FROM h),
        |preds AS (SELECT CAST(r.p AS BIGINT) AS pid,
        |                 min_v + (r.p * (max_v - min_v + 1)) // $SelPredicates AS lo,
        |                 min_v + ((r.p + 1) * (max_v - min_v + 1)) // $SelPredicates - 1 AS hi
        |          FROM (SELECT unnest(range($SelPredicates)) AS p) r, b),
        |est AS (SELECT pid, lo, hi,
        |               CAST(sum((n_rows * (least(hi, hi_chars) - greatest(lo, lo_chars) + 1))
        |                 // (hi_chars - lo_chars + 1)) AS BIGINT) AS est_rows
        |        FROM preds JOIN h ON hi_chars >= lo AND lo_chars <= hi
        |        GROUP BY 1, 2, 3),
        |act AS (SELECT pid, CAST(sum(cnt) AS BIGINT) AS actual_rows
        |        FROM preds JOIN vc ON v >= lo AND v <= hi GROUP BY 1)
        |SELECT e.pid, e.lo, e.hi, e.est_rows,
        |       CAST(coalesce(a.actual_rows, 0) AS BIGINT) AS actual_rows,
        |       CAST((1000000 * abs(e.est_rows - coalesce(a.actual_rows, 0)))
        |         // (CASE WHEN coalesce(a.actual_rows, 0) > 0
        |                  THEN a.actual_rows ELSE 1 END) AS BIGINT) AS err_ppm
        |FROM est e LEFT JOIN act a ON e.pid = a.pid""".stripMargin
    },

    // x252: schema-evolution read — the oracle replays the generation
    // rule (even keys never had prio) straight from orders.
    "x252_schema_evolution" ->
      """WITH m AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS prio
        |  FROM orders)
        |SELECT coalesce(prio, '<pre-evolution>') AS prio,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM m GROUP BY 1""".stripMargin,

    // x253: point-in-time SCD2 join — x138's interval CTEs + the as-of
    // range condition; census per tier.
    "x253_pit_tier_join" -> {
      import operators.Relational.{TierGoldAt, TierSilverAt}
      def t(e: String) =
        s"CASE WHEN $e < $TierSilverAt THEN 'bronze' WHEN $e < $TierGoldAt THEN 'silver' ELSE 'gold' END"
      s"""WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |  FROM orders),
        |rk AS (SELECT o_custkey, day,
        |              row_number() OVER (PARTITION BY o_custkey
        |                ORDER BY day, o_orderkey) AS rn
        |       FROM o),
        |ep AS (SELECT o_custkey, rn, day AS valid_from_day,
        |              ${t("rn")} AS tier
        |       FROM rk
        |       WHERE rn = 1 OR ${t("rn")} <> ${t("(rn - 1)")}),
        |iv AS (SELECT o_custkey, tier, valid_from_day,
        |              lead(valid_from_day) OVER (PARTITION BY o_custkey
        |                ORDER BY rn) AS valid_to_day
        |       FROM ep)
        |SELECT iv.tier, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        |FROM o JOIN iv ON o.o_custkey = iv.o_custkey
        |  AND o.day >= iv.valid_from_day
        |  AND (iv.valid_to_day IS NULL OR o.day < iv.valid_to_day)
        |GROUP BY 1""".stripMargin
    },

    // x254: salted-join equivalence — the oracle is the PLAIN join, so
    // a hash match proves the salt-and-replicate rewrite is lossless.
    "x254_salted_join" ->
      """SELECT o.o_orderpriority AS prio,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) AS rev_cents,
        |       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    // x132: loyalty-tier transition matrix — point-in-time tier via
    // row_number over (day, orderkey), thresholds shared constants.
    "x132_loyalty_tiers" -> {
      import operators.Relational.{TierGoldAt, TierSilverAt}
      s"""WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |  FROM orders),
        |rk AS (SELECT o_custkey,
        |              row_number() OVER (PARTITION BY o_custkey
        |                ORDER BY day, o_orderkey) AS rn
        |       FROM o),
        |tr AS (SELECT o_custkey,
        |              CASE WHEN rn - 1 < $TierSilverAt THEN 'bronze'
        |                   WHEN rn - 1 < $TierGoldAt THEN 'silver'
        |                   ELSE 'gold' END AS from_tier,
        |              CASE WHEN rn < $TierSilverAt THEN 'bronze'
        |                   WHEN rn < $TierGoldAt THEN 'silver'
        |                   ELSE 'gold' END AS to_tier
        |       FROM rk)
        |SELECT from_tier, to_tier, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM tr GROUP BY 1, 2""".stripMargin
    },

    // x131: lead-time SLA panel — bounded-domain exact quantiles
    // (x29's discipline): cumulative pick over the (priority, lag)
    // count table, never a corpus sort.
    "x131_lead_times" ->
      """WITH lags AS (
        |  SELECT o.o_orderpriority,
        |         CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400
        |           - CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS lag_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |c AS (SELECT o_orderpriority, lag_days, CAST(count(*) AS BIGINT) AS c
        |      FROM lags GROUP BY 1, 2),
        |t AS (SELECT o_orderpriority, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |cum AS (SELECT c.o_orderpriority, c.lag_days, c.c, t.n,
        |               sum(c.c) OVER (PARTITION BY c.o_orderpriority ORDER BY c.lag_days
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM c JOIN t USING (o_orderpriority))
        |SELECT o_orderpriority, max(n) AS n_lines,
        |       min(lag_days) AS min_days,
        |       min(CASE WHEN cum * 2 >= n THEN lag_days END) AS median_days,
        |       min(CASE WHEN cum * 10 >= n * 9 THEN lag_days END) AS p90_days,
        |       max(lag_days) AS max_days
        |FROM cum GROUP BY 1""".stripMargin,

    // x130: per-band LSH precision audit — x03's CTE prefix verbatim,
    // per-band distinct pairs, the same float Jaccard compare.
    "x130_lsh_precision" ->
      s"""$minhashCtePrefix,
        |cand AS (SELECT DISTINCT a.band, a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM banded a JOIN banded b
        |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |v AS (SELECT c.band, len(list_intersect(x.hs, y.hs)) AS inter,
        |             len(x.hs) AS n_a, len(y.hs) AS n_b
        |      FROM cand c JOIN docs x ON c.doc_a = x.doc_id
        |                  JOIN docs y ON c.doc_b = y.doc_id)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_candidates,
        |       CAST(sum(CASE WHEN inter / (n_a + n_b - inter)
        |                          >= ${operators.Dedup.LshPrecisionThreshold}
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
        |       (1000000 * CAST(sum(CASE WHEN inter / (n_a + n_b - inter)
        |                          >= ${operators.Dedup.LshPrecisionThreshold}
        |                     THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS precision_ppm
        |FROM v GROUP BY 1""".stripMargin,

    // x129: per-source quality drift — x89's scored CTE + x125's batch
    // rule + x119's raw rational slope, composed verbatim.
    "x129_quality_drift" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |mxv AS (SELECT max(doc_id) AS mx FROM documents),
        |pts AS (SELECT d.source, (d.doc_id * ${operators.Dedup.NoveltyBatches}) // (mx + 1) AS x,
        |               s.score_micro AS y
        |        FROM documents d JOIN scored s USING (doc_id), mxv)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
        |FROM pts GROUP BY 1""".stripMargin
    },

    // x128: blocked fuzzy-name pairs — the oracle states the SEMANTIC
    // contract (all same-brand pairs within the distance bound); the
    // engine's length-expansion equi-join provably yields the same set
    // (lev <= d forces |len diff| <= d, and each pair meets exactly once).
    "x128_fuzzy_names" ->
      s"""SELECT a.p_brand, a.p_partkey AS key_a, a.p_name AS name_a,
        |       b.p_partkey AS key_b, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= ${operators.Dedup.FuzzyMaxDistance}""".stripMargin,

    // x127: UNPIVOT/melt of the per-flag measure table — UNION ALL is
    // the engine-neutral statement of stack()'s semantics.
    "x127_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS extended_cents,
        |         CAST(sum(CAST(round(l_tax * 100) AS BIGINT)) AS BIGINT) AS tax_cents,
        |         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS discount_cents,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS quantity_centi
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'extended_cents' AS measure, extended_cents AS value FROM w
        |UNION ALL SELECT l_returnflag, 'tax_cents', tax_cents FROM w
        |UNION ALL SELECT l_returnflag, 'discount_cents', discount_cents FROM w
        |UNION ALL SELECT l_returnflag, 'quantity_centi', quantity_centi FROM w""".stripMargin,

    // x126: CUBE over (flag, ship year) — NULL subtotal markers are the
    // shared SQL convention; one expand+shuffle in Spark, GROUP BY CUBE
    // in DuckDB.
    "x126_cube_revenue" ->
      """SELECT l_returnflag, CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS quantity_centi
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, ship_year)""".stripMargin,

    // x125: ingest-batch n-gram novelty curve — x02's shingle CTE shape,
    // md5-60 fingerprints, doc_id-range batches off the 1-row max.
    "x125_novelty_curve" ->
      s"""WITH mxv AS (SELECT max(doc_id) AS mx FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(words[i:i+4], ' ')
        |                 for i in range(1, len(words) - 3)])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t1),
        |bf AS (SELECT DISTINCT (sh.doc_id * ${operators.Dedup.NoveltyBatches}) // (mx + 1) AS batch,
        |              ('0x' || substr(md5(sh.sh), 1, 15))::BIGINT AS fp
        |       FROM sh, mxv),
        |fst AS (SELECT fp, min(batch) AS first_batch FROM bf GROUP BY 1)
        |SELECT batch, CAST(count(*) AS BIGINT) AS n_fps,
        |       CAST(sum(CASE WHEN first_batch = batch THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       (1000000 * CAST(sum(CASE WHEN first_batch = batch THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS novelty_ppm
        |FROM bf JOIN fst USING (fp)
        |GROUP BY 1""".stripMargin,

    // x124: densify + forward-fill the daily brand revenue — x117's
    // daily CTE verbatim, dense grid off the 1-row bounds, IGNORE NULLS
    // last_value ≡ Spark's last(ignoreNulls) over the same frame.
    "x124_gap_fill" ->
      """WITH daily AS (
        |  SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |grid AS (SELECT p_brand, unnest(range(mn, mx + 1)) AS day
        |         FROM (SELECT DISTINCT p_brand FROM daily), b),
        |j AS (SELECT g.p_brand, g.day, d.rev_cents
        |      FROM grid g LEFT JOIN daily d USING (p_brand, day))
        |SELECT p_brand, day, rev_cents,
        |       CAST(CASE WHEN rev_cents IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_filled,
        |       CAST(coalesce(last_value(rev_cents IGNORE NULLS) OVER (
        |         PARTITION BY p_brand ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS filled_cents
        |FROM j""".stripMargin,

    // x123: A/B conversion readout — x27's md5 coin as the arm split,
    // ppm floor-divisions, lift as a subtraction (never signed div).
    "x123_ab_conversion" ->
      s"""WITH u AS (
        |  SELECT user_id,
        |         ('0x' || substr(md5('${operators.Sessionize.AbSalt}:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |         sum(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS rev
        |  FROM events GROUP BY 1),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |             CAST(sum(converted) AS BIGINT) AS n_converted,
        |             CAST(sum(rev) AS BIGINT) AS revenue_cents
        |      FROM u GROUP BY 1),
        |c AS (SELECT (1000000 * n_converted) // n_users AS ctl_ppm FROM a WHERE arm = 0)
        |SELECT arm, n_users, n_converted,
        |       (1000000 * n_converted) // n_users AS conv_ppm,
        |       revenue_cents,
        |       (1000 * revenue_cents) // n_users AS arpu_millicents,
        |       (1000000 * n_converted) // n_users - ctl_ppm AS lift_ppm
        |FROM a, c""".stripMargin,

    // x122: 3-round 2-core peel of the frequent-co-purchase graph —
    // x116's edge CTE, rounds unrolled (the pinned-iteration convention),
    // materialized CTEs + semi joins so DuckDB evaluates each level once.
    "x122_kcore" -> {
      import operators.LinkAnalysis.{KCoreK, KCoreRounds, TriMinSupport}
      val levels = (1 to KCoreRounds).map { i =>
        s"""k$i AS MATERIALIZED (SELECT n FROM (SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) t
          |  GROUP BY 1 HAVING count(*) >= $KCoreK),
          |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
          |  SEMI JOIN k$i ka ON e${i - 1}.a = ka.n
          |  SEMI JOIN k$i kb ON e${i - 1}.b = kb.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= $TriMinSupport),
        |$levels
        |SELECT p.p_partkey, p.p_brand, CAST(count(*) AS BIGINT) AS residual_deg
        |FROM (SELECT a AS n FROM e$KCoreRounds UNION ALL SELECT b FROM e$KCoreRounds) t
        |JOIN part p ON t.n = p.p_partkey
        |GROUP BY 1, 2""".stripMargin
    },

    // x121: session entry-path census — x11's session CTEs verbatim
    // (the x111 convention), positional pivot of the first PathLen
    // event types, concat_ws skipping NULLs identically in both engines.
    "x121_session_paths" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts_s - lag(ts_s, 1) OVER w > 1800 THEN 1
        |                 WHEN lag(ts_s, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged),
        |rk AS (SELECT user_id, session_idx, event_type,
        |              row_number() OVER (PARTITION BY user_id, session_idx
        |                ORDER BY ts_s, event_id) AS rk
        |       FROM sess),
        |p AS (SELECT user_id, session_idx,
        |             max(CASE WHEN rk = 1 THEN event_type END) AS e1,
        |             max(CASE WHEN rk = 2 THEN event_type END) AS e2,
        |             max(CASE WHEN rk = 3 THEN event_type END) AS e3
        |      FROM rk WHERE rk <= ${operators.Sessionize.PathLen} GROUP BY 1, 2)
        |SELECT concat_ws('>', e1, e2, e3) AS path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1""".stripMargin,

    // x120: RFM quartile segmentation — strict-rank quartiles via
    // rank()−1 (ties share a score), the ordered-window twin of the
    // engine's exclusivePrefixSum ranks.
    "x120_rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |         max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) AS last_day,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |g AS (SELECT max(last_day) AS max_day, CAST(count(*) AS BIGINT) AS n FROM base),
        |m AS (SELECT b.o_custkey, g.max_day - b.last_day AS recency_days,
        |             b.n_orders, b.monetary_cents, g.n
        |      FROM base b, g),
        |r AS (SELECT *, rank() OVER (ORDER BY recency_days) - 1 AS rr,
        |               rank() OVER (ORDER BY n_orders) - 1 AS fr,
        |               rank() OVER (ORDER BY monetary_cents) - 1 AS mr
        |      FROM m)
        |SELECT o_custkey AS c_custkey, recency_days, n_orders, monetary_cents,
        |       (4 * rr) // n + 1 AS r_score, (4 * fr) // n + 1 AS f_score,
        |       (4 * mr) // n + 1 AS m_score,
        |       ((4 * rr) // n + 1) * 100 + ((4 * fr) // n + 1) * 10
        |         + (4 * mr) // n + 1 AS rfm_code
        |FROM r""".stripMargin,

    // x119: per-brand OLS slope of quantity on discount — raw exact
    // rationals (num, den), nothing divided (signed div is the
    // floor/truncate cross-engine trap). DuckDB sums go through HUGEINT;
    // the final CAST matches Spark's Long at gate scales.
    "x119_discount_slope" ->
      """WITH l AS (SELECT l_partkey, CAST(round(l_discount * 100) AS BIGINT) AS x,
        |                  CAST(round(l_quantity * 100) AS BIGINT) AS y
        |           FROM lineitem)
        |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
        |FROM l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1""".stripMargin,

    // x118: day-of-week revenue profile — arithmetic weekday
    // ((epoch_day + 4) % 7, 0 = Monday), peak via the ordered
    // row_number twin of the struct extremum (ties → larger dow).
    "x118_dow_profile" ->
      """WITH byd AS (
        |  SELECT p.p_brand,
        |         (CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 + 4) % 7 AS dow,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |pb AS (SELECT p_brand, CAST(sum(rev_cents) AS BIGINT) AS total_cents
        |       FROM byd GROUP BY 1),
        |pk AS (SELECT p_brand, dow AS peak_dow FROM (
        |         SELECT *, row_number() OVER (PARTITION BY p_brand
        |           ORDER BY rev_cents DESC, dow DESC) AS rk FROM byd)
        |       WHERE rk = 1)
        |SELECT b.p_brand, b.dow, b.rev_cents,
        |       (1000000 * b.rev_cents) // t.total_cents AS share_ppm,
        |       CAST(CASE WHEN b.dow = k.peak_dow THEN 1 ELSE 0 END AS INTEGER) AS is_peak
        |FROM byd b JOIN pb t USING (p_brand) JOIN pk k USING (p_brand)""".stripMargin,

    // x117: seasonal-naive backtest — observed-sales daily series,
    // lag-7 equi-join (missing week = 0 forecast), evaluation starts at
    // global min day + 7, WAPE in ppm, signed error left undivided.
    "x117_seasonal_wape" ->
      s"""WITH daily AS (
        |  SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 AS day,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |m AS (SELECT min(day) AS min_day FROM daily),
        |j AS (SELECT d.p_brand, d.day, d.rev_cents,
        |             coalesce(f.rev_cents, 0) AS fc_cents
        |      FROM daily d LEFT JOIN daily f
        |        ON d.p_brand = f.p_brand AND f.day = d.day - ${operators.Forecast.SeasonalLagDays})
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(rev_cents) AS BIGINT) AS actual_cents,
        |       CAST(sum(rev_cents - fc_cents) AS BIGINT) AS err_cents,
        |       CAST(sum(abs(rev_cents - fc_cents)) AS BIGINT) AS abs_err_cents,
        |       (1000000 * CAST(sum(abs(rev_cents - fc_cents)) AS BIGINT))
        |         // CAST(sum(rev_cents) AS BIGINT) AS wape_ppm
        |FROM j, m WHERE day >= min_day + ${operators.Forecast.SeasonalLagDays}
        |GROUP BY 1""".stripMargin,

    // x116: per-node triangle counts on the frequent-co-purchase part
    // graph. The oracle enumerates each triangle once via the canonical
    // a<b<c edge form — equal to the engine's degree-ordered orientation
    // because both schemes list every distinct triangle exactly once.
    "x116_triangles" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING count(*) >= ${operators.LinkAnalysis.TriMinSupport}),
        |t AS (SELECT e1.a AS ca, e1.b AS cb, e2.b AS cc
        |      FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |corners AS (SELECT unnest([ca, cb, cc]) AS node FROM t)
        |SELECT p.p_partkey, p.p_brand, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM corners c JOIN part p ON c.node = p.p_partkey
        |GROUP BY 1, 2""".stripMargin,

    // x115: weighted sample without replacement — x89's scoring CTE,
    // integer A-ES priority h // max(1, score), bottom-k per source.
    "x115_weighted_sample" -> {
      import operators.TextAnalysis._
      s"""$qualityFeatureCtes,
        |scored AS (
        |  SELECT doc_id,
        |       CAST($QwWords * n_words
        |            + $QwMeanLen * CAST(floor(mean_word_len * 1000000) AS BIGINT)
        |            + ($QwStop) * CAST(floor(stopword_ratio * 1000000) AS BIGINT)
        |            + ($QwShort) * CAST(floor(short_word_ratio * 1000000) AS BIGINT)
        |            + ($QwDup) * CAST(floor(dup_ratio * 1000000) AS BIGINT) AS BIGINT) AS score_micro
        |  FROM feat),
        |pr AS (SELECT d.doc_id, d.source,
        |              greatest(1, s.score_micro) AS weight,
        |              ('0x' || substr(md5('ws:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
        |                // greatest(1, s.score_micro) AS priority
        |       FROM documents d JOIN scored s USING (doc_id)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY priority, doc_id) AS rank FROM pr)
        |SELECT doc_id, source, weight, priority, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= ${operators.Sampling.WeightedSampleK}""".stripMargin
    },

    // x114: directional paragraph copy-flow — x39's CDC-paragraph CTEs
    // verbatim, origin = ordered row_number pick (the struct-minimum
    // twin), self-edges kept.
    "x114_copy_directions" ->
      s"""WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, pos, w,
        |         SUM(CASE WHEN ('0x' || substr(md5(w), 1, 15))::BIGINT % ${operators.Dedup.ParagraphBoundaryMod} = 0
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS par_id
        |  FROM w),
        |pars AS (
        |  SELECT doc_id, par_id, md5(array_to_string(list(w ORDER BY pos), ' ')) AS fp
        |  FROM c GROUP BY doc_id, par_id),
        |o AS (SELECT fp, doc_id AS origin_id, par_id AS origin_par
        |      FROM (SELECT *, row_number() OVER (PARTITION BY fp
        |              ORDER BY doc_id ASC, par_id ASC) AS rk,
        |              count(*) OVER (PARTITION BY fp) AS dc
        |            FROM pars)
        |      WHERE rk = 1 AND dc >= 2)
        |SELECT so.source AS origin_source, sc.source AS copier_source,
        |       CAST(count(*) AS BIGINT) AS n_copies,
        |       CAST(count(DISTINCT p.fp) AS BIGINT) AS n_contents
        |FROM pars p JOIN o USING (fp)
        |JOIN documents sc ON p.doc_id = sc.doc_id
        |JOIN documents so ON o.origin_id = so.doc_id
        |WHERE NOT (p.doc_id = o.origin_id AND p.par_id = o.origin_par)
        |GROUP BY 1, 2""".stripMargin,

    // x113: tokenizer fertility per (source, lang) — x63's BPE term CTE
    // chain (the pinned-merge recursive rewrite), word stream joined to
    // per-word token counts, exact ppm + one IEEE division.
    "x113_fertility" ->
      s"""$bpeTermCteSql,
        |occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |doctoks AS (SELECT o.doc_id, CAST(sum(t.n_toks) AS BIGINT) AS toks
        |            FROM occ o JOIN term t USING (w) GROUP BY 1),
        |per AS (SELECT d.source, d.lang,
        |               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nw,
        |               coalesce(t.toks, 0) AS nt
        |        FROM documents d LEFT JOIN doctoks t USING (doc_id))
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS n_words,
        |       CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
        |       (1000000 * CAST(sum(nt) AS BIGINT)) // CAST(sum(nw) AS BIGINT) AS fertility_ppm,
        |       CAST(sum(nt) AS DOUBLE) / CAST(sum(nw) AS BIGINT) AS fertility
        |FROM per GROUP BY 1, 2""".stripMargin,

    // x112: last-touch attribution — equi-join on user with the time
    // residual, winner via the ordered row_number twin of the struct
    // extremum, unattributed purchases kept through the left join.
    "x112_last_touch" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_s AS click_ts_s
        |      FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_s AS purchase_ts_s, value_cents
        |      FROM ev WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.purchase_id, c.click_id, c.click_ts_s
        |          FROM p JOIN c ON p.user_id = c.user_id
        |           AND c.click_ts_s <= p.purchase_ts_s
        |           AND c.click_ts_s > p.purchase_ts_s - ${operators.Sessionize.AttributionWindowS}),
        |best AS (SELECT purchase_id, click_id, click_ts_s FROM (
        |           SELECT *, row_number() OVER (PARTITION BY purchase_id
        |             ORDER BY click_ts_s DESC, click_id DESC) AS rk FROM pairs)
        |         WHERE rk = 1)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts_s, p.value_cents,
        |       b.click_id, b.click_ts_s,
        |       p.purchase_ts_s - b.click_ts_s AS lag_s,
        |       CAST(CASE WHEN b.click_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS attributed
        |FROM p LEFT JOIN best b USING (purchase_id)""".stripMargin,

    // x111: session-basket association rules — x11's session CTEs
    // verbatim, pair self-join on the basket key, ppm/millis fixed-point.
    "x111_assoc_rules" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts_s - lag(ts_s, 1) OVER w > 1800 THEN 1
        |                 WHEN lag(ts_s, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged),
        |it AS (SELECT DISTINCT user_id, session_idx, event_type FROM sess),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT DISTINCT user_id, session_idx FROM it)),
        |ic AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM it GROUP BY 1),
        |pc AS (SELECT a.event_type AS ante, b.event_type AS cons,
        |              CAST(count(*) AS BIGINT) AS n_ab
        |       FROM it a JOIN it b ON a.user_id = b.user_id
        |        AND a.session_idx = b.session_idx AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT ante, cons, ia.c AS n_a, ib.c AS n_b, n_ab,
        |       (1000000 * n_ab) // ns.n AS support_ppm,
        |       (1000000 * n_ab) // ia.c AS conf_ab_ppm,
        |       (1000000 * n_ab) // ib.c AS conf_ba_ppm,
        |       (1000 * n_ab * ns.n) // (ia.c * ib.c) AS lift_millis
        |FROM pc JOIN ic ia ON pc.ante = ia.event_type
        |        JOIN ic ib ON pc.cons = ib.event_type, ns""".stripMargin,

    // x110: quantized-integer HHI per region — same rescale-then-square
    // arithmetic, ppm fixed-point, round() cents convention.
    "x110_market_hhi" -> {
      val q = 1L << operators.Relational.HhiQuantBits
      s"""WITH bs AS (
        |  SELECT r.r_name, l.l_suppkey,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS v_cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |t AS (SELECT r_name, CAST(sum(v_cents) AS BIGINT) AS v_total_cents,
        |             greatest(1, CAST(sum(v_cents) AS BIGINT) // $q) AS scale
        |      FROM bs GROUP BY 1),
        |qv AS (SELECT bs.r_name, t.v_total_cents, bs.v_cents // t.scale AS q
        |       FROM bs JOIN t USING (r_name))
        |SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers, v_total_cents,
        |       (1000000 * CAST(sum(q * q) AS BIGINT)) // (CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT)) AS hhi_ppm,
        |       (1000000 * CAST(max(q) AS BIGINT)) // CAST(sum(q) AS BIGINT) AS top_share_ppm
        |FROM qv GROUP BY 1, 3""".stripMargin
    },

    // x109: code-switch detection — x06's chunk-level scorer (same
    // stopword lists, same precedence CASE), majority via the ordered
    // row_number twin of the struct extrema, one IEEE agreement division.
    "x109_code_switch" -> {
      val cw = operators.TextAnalysis.CodeSwitchChunkWords
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ch AS (SELECT doc_id,
        |         array_to_string(ws[(i * $cw + 1):(i * $cw + $cw)], ' ') AS chunk
        |       FROM tok, unnest(range(0, (len(ws) + ${cw - 1}) // $cw)) AS t(i)),
        |s AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(chunk,' '),
        |      w -> w IN ('the','a','an','of','to','in','and','is','for','on'))) AS INTEGER) AS s_en,
        |    CAST(len(list_filter(string_split(chunk,' '),
        |      w -> w IN ('el','la','de','los','las','es','y','en','un','una'))) AS INTEGER) AS s_es,
        |    CAST(len(list_filter(string_split(chunk,' '),
        |      w -> w IN ('der','die','das','und','ist','ein','eine','zu','mit'))) AS INTEGER) AS s_de,
        |    CAST(len(list_filter(string_split(chunk,' '),
        |      w -> w IN ('le','la','les','des','et','est','un','une','dans'))) AS INTEGER) AS s_fr,
        |    CAST(len(regexp_extract_all(chunk, '[\\x{4e00}-\\x{9fff}]')) AS INTEGER) AS s_zh
        |  FROM ch),
        |lang AS (SELECT doc_id, CASE
        |    WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
        |    WHEN s_de >= greatest(s_fr, s_zh) THEN 'de'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS chunk_lang
        |  FROM s),
        |pl AS (SELECT doc_id, chunk_lang, CAST(count(*) AS BIGINT) AS n
        |       FROM lang GROUP BY 1, 2),
        |r AS (SELECT *,
        |       row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, chunk_lang DESC) AS rk,
        |       CAST(sum(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks,
        |       CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_langs
        |      FROM pl)
        |SELECT doc_id, n_chunks, n_langs, chunk_lang AS majority_lang,
        |       CAST(n AS DOUBLE) / n_chunks AS agreement,
        |       CAST(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END AS INTEGER) AS code_switched
        |FROM r WHERE rk = 1""".stripMargin
    },

    // x107: vocabulary-coverage audit — deterministic top-K vocab
    // (c DESC, token), per-source OOV in exact ppm fixed-point.
    "x107_vocab_coverage" ->
      s"""WITH t AS (SELECT source, u.token
        |           FROM (SELECT source, string_split(text, ' ') AS ws FROM documents),
        |                unnest(ws) AS u(token)),
        |v AS (SELECT token FROM (SELECT token, count(*) AS c FROM t GROUP BY 1)
        |      ORDER BY c DESC, token LIMIT ${operators.TextAnalysis.VocabCoverageK}),
        |j AS (SELECT t.source, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM t LEFT JOIN v ON t.token = v.token)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(oov) AS BIGINT) AS n_oov,
        |       (1000000 * CAST(sum(oov) AS BIGINT)) // CAST(count(*) AS BIGINT) AS oov_ppm,
        |       CAST(count(*) - sum(oov) AS DOUBLE) / CAST(count(*) AS BIGINT) AS coverage
        |FROM j GROUP BY 1""".stripMargin,

    // x106: per-user inter-arrival moments — exact rational variance
    // (var_num/var_den), one IEEE mean division, CV>1 cross-multiplied.
    "x106_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |             (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |           AS gap_s
        |  FROM events),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |             CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
        |             CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
        |      FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, sum_gap_s, sum_gap_sq,
        |       CAST(n_gaps * sum_gap_sq - sum_gap_s * sum_gap_s AS BIGINT) AS var_num,
        |       CAST(n_gaps * n_gaps AS BIGINT) AS var_den,
        |       CAST(sum_gap_s AS DOUBLE) / n_gaps AS mean_gap_s,
        |       CAST(CASE WHEN n_gaps * sum_gap_sq > 2 * sum_gap_s * sum_gap_s
        |             THEN 1 ELSE 0 END AS INTEGER) AS bursty
        |FROM m""".stripMargin,

    // x102: median/MAD robust outlier hours — scaled-integer algebra
    // (med2 = a+b of the middle pair, mad4 = 4*MAD) so the interpolated
    // medians are exact in both engines; flag cross-multiplied.
    "x102_robust_spikes" ->
      s"""WITH h AS (
        |  SELECT event_type,
        |         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_start_s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(2 * median(n) AS BIGINT) AS med2 FROM h GROUP BY 1),
        |d AS (SELECT h.event_type, h.hour_start_s, h.n, m.med2,
        |             abs(2 * h.n - m.med2) AS dev2
        |      FROM h JOIN m USING (event_type)),
        |mm AS (SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4 FROM d GROUP BY 1)
        |SELECT d.event_type, d.hour_start_s, d.n AS n_events, d.med2, mm.mad4,
        |       CAST(CASE WHEN 2 * d.dev2 > ${operators.Sessionize.RobustZ} * mm.mad4
        |             THEN 1 ELSE 0 END AS INTEGER) AS robust_spike
        |FROM d JOIN mm USING (event_type)""".stripMargin,

    // x84: length-bucketed batching — bucket/batch knobs interpolated
    // from Sampling.Batch*; padding waste is pure integer arithmetic.
    "x84_length_batches" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, toks, toks // ${operators.Sampling.BatchBucketTokens} AS bucket FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY toks, doc_id) AS rn FROM b),
        |g AS (SELECT bucket, CAST((rn - 1) // ${operators.Sampling.BatchSize} AS BIGINT) AS batch_id,
        |        toks FROM r)
        |SELECT bucket, batch_id, CAST(count(*) AS BIGINT) AS n_seqs,
        |       MIN(toks) AS min_toks, MAX(toks) AS max_toks,
        |       CAST(SUM(toks) AS BIGINT) AS sum_toks,
        |       CAST(count(*) * MAX(toks) - SUM(toks) AS BIGINT) AS padding_waste
        |FROM g GROUP BY 1, 2""".stripMargin,

    // x74: deterministic epoch-seeded training order — salted md5-60
    // permutation key, shard = high hash bits (exact power-of-two
    // division), in-shard position by window. Epoch/shard knobs
    // interpolated from Sampling.Shuffle* constants.
    "x74_epoch_shuffle" -> {
      val shardWidth = operators.Sampling.HashSpace / operators.Sampling.ShuffleShards
      s"""WITH e AS (SELECT doc_id, epoch
        |           FROM documents,
        |                unnest(range(1, ${operators.Sampling.ShuffleEpochs} + 1)) AS t(epoch)),
        |h AS (SELECT doc_id, epoch,
        |        ('0x' || substr(md5('epoch:' || CAST(epoch AS VARCHAR) || ':'
        |                             || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM e)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |       h // ${shardWidth} AS shard,
        |       CAST(row_number() OVER (PARTITION BY epoch, h // ${shardWidth}
        |                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
        |       doc_id, h
        |FROM h""".stripMargin
    },

    // x75: fractional mixture upsampling — pinned micro-weights
    // interpolated from Sampling.UpsampleWeightsMicro; integer copies via
    // floor division, the fractional copy via the md5-60 mod-1e6 coin,
    // copies materialized with unnest(range) (empty when n = 0).
    "x75_upsample_mixture" -> {
      val rows = operators.Sampling.UpsampleWeightsMicro
        .map { case (s, w) => s"('$s', ${w})" }.mkString(", ")
      s"""WITH w(source, w_micro) AS (VALUES $rows),
        |d AS (SELECT doc_id, d.source,
        |        coalesce(w.w_micro, ${operators.Sampling.UpsampleDefaultMicro}) AS wm,
        |        ('0x' || substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          % 1000000 AS hf
        |      FROM documents d LEFT JOIN w USING (source)),
        |c AS (SELECT doc_id, source,
        |        wm // 1000000 + CASE WHEN hf < wm % 1000000 THEN 1 ELSE 0 END AS n
        |      FROM d)
        |SELECT doc_id, source, CAST(rep AS BIGINT) AS rep
        |FROM c, unnest(range(1, n + 1)) AS t(rep)""".stripMargin
    },

    // x77: integer PageRank, iterations unrolled as chained CTEs (one per
    // pinned iteration) with the SAME floor-division truncation as the
    // Spark plan; damping/unit knobs interpolated from LinkAnalysis.Pr*.
    "x77_pagerank" -> {
      val unit = operators.LinkAnalysis.PrUnit
      val damp = operators.LinkAnalysis.PrDampPct
      val base = unit - unit * damp / 100
      val iters = (1 to operators.LinkAnalysis.PrIters).map { i =>
        val prev = if (i == 1) "r0" else s"it${i - 1}"
        s"""it$i AS (SELECT e.dst AS node,
           |  CAST($base + ($damp * sum(r.rank // d.deg)) // 100 AS BIGINT) AS rank
           |  FROM e JOIN deg d USING (src) JOIN $prev r ON r.node = e.src
           |  GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST($unit AS BIGINT) AS rank FROM deg),
        |$iters
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
        |       CAST(node // 2 AS BIGINT) AS node_key, d.deg,
        |       r.rank AS rank_pts
        |FROM it${operators.LinkAnalysis.PrIters} r JOIN deg d ON d.src = r.node""".stripMargin
    },

    // x82: span-level dedup — per-position anchored grams, min-owner per
    // gram, gaps-and-islands interval merge; pure integer windows
    // replicated verbatim (k and anchor mod interpolated from Dedup.*).
    "x82_span_dedup" -> {
      val k = operators.Dedup.DecontamGramChars
      val mod = operators.Dedup.CrossDocAnchorMod
      s"""WITH g AS (SELECT doc_id, len(text) AS doc_chars, i - 1 AS pos,
        |        ('0x' || substr(md5(substr(text, i, $k)), 1, 15))::BIGINT AS gh
        |      FROM documents, unnest(range(1, len(text) - ${k - 2})) AS t(i)
        |      WHERE len(text) >= $k),
        |a AS (SELECT * FROM g WHERE gh % $mod = 0),
        |o AS (SELECT gh, MIN(doc_id) AS owner FROM a GROUP BY 1),
        |d AS (SELECT a.doc_id, a.doc_chars, a.pos FROM a JOIN o USING (gh)
        |      WHERE a.doc_id > o.owner),
        |c AS (SELECT doc_id, doc_chars, pos,
        |        MAX(pos + $k) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
        |      FROM d),
        |f AS (SELECT doc_id, doc_chars, pos,
        |        CASE WHEN run_end IS NULL OR pos >= run_end THEN 1 ELSE 0 END AS nw
        |      FROM c),
        |isl AS (SELECT doc_id, doc_chars, pos,
        |          SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM f),
        |sp AS (SELECT doc_id, ANY_VALUE(doc_chars) AS doc_chars, island,
        |          MIN(pos) AS s, MAX(pos) + $k AS e
        |       FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(SUM(e - s) AS BIGINT) AS chars_removed,
        |       CAST(ANY_VALUE(doc_chars) - SUM(e - s) AS BIGINT) AS chars_kept
        |FROM sp GROUP BY 1""".stripMargin
    },

    // x59: corpus-weighted adjacent char-pair counts over the word-freq
    // aggregate — the first BPE merge's argmax input.
    "x59_bpe_pair_counts" ->
      """WITH wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
        |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |            GROUP BY 1),
        |p AS (SELECT w, freq, unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
        |      FROM wf WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count,
        |       CAST(count(DISTINCT w) AS BIGINT) AS n_words
        |FROM p GROUP BY 1""".stripMargin,

    // x258: telemetry debounce census — kept iff first-of-key or gap from
    // the PREVIOUS event (kept or not) ≥ the shared constant; one lag
    // window on the (user, type) key, replicated verbatim.
    "x258_event_debounce" -> {
      val gap = operators.Sessionize.DebounceGapSeconds
      s"""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |         CAST(round(value*100) AS BIGINT) AS value_cents
        |  FROM events),
        |f AS (
        |  SELECT *, (lag(ts_s, 1) OVER w IS NULL
        |             OR ts_s - lag(ts_s, 1) OVER w >= $gap) AS kept
        |  FROM ev WINDOW w AS (PARTITION BY user_id, event_type
        |                       ORDER BY ts_s, event_id))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN kept THEN value_cents ELSE 0 END) AS BIGINT)
        |         AS kept_value_cents,
        |       CAST(count(DISTINCT CASE WHEN kept THEN user_id END) AS BIGINT)
        |         AS n_kept_users
        |FROM f GROUP BY 1""".stripMargin
    },

    // x259: multi-format round-trip fidelity — the oracle computes the
    // panel ONCE from the raw table and cross-joins the format list, so
    // a hash match proves all four staged sink→source pairs round-trip
    // the exact-typed projection losslessly.
    "x259_format_roundtrip" -> {
      val fmts = operators.FormatStage.Formats
        .map(f => s"('$f')").mkString(", ")
      s"""WITH panel AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |           AS sum_value_cents,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |         CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS min_ts_s,
        |         CAST(max(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS max_ts_s
        |  FROM events GROUP BY 1)
        |SELECT f.format, p.* FROM panel p
        |CROSS JOIN (VALUES $fmts) AS f(format)""".stripMargin
    },

    // x260: rank-biased overlap between the two x239 systems — same
    // ranking CTEs as x239's oracle, then the per-item telescoped RBO
    // weights (exact integers from Retrieval.rboWeights, shared).
    "x260_rank_agreement" -> {
      val (w, den) = operators.Retrieval.rboWeights(operators.Retrieval.HybridK)
      val cases = w.zipWithIndex
        .map { case (wm, i) => s"WHEN ${i + 1} THEN $wm" }.mkString(" ")
      s"""WITH $hybridRankingCtes,
        |j AS (SELECT doc_id,
        |             CASE greatest(r_sem, r_lex) $cases END AS w_pts
        |      FROM sem JOIN lex USING (doc_id, rel_id)),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_common,
        |             CAST(sum(w_pts) AS BIGINT) AS rbo_num_pts
        |      FROM j GROUP BY 1),
        |base AS (SELECT DISTINCT doc_id FROM sem)
        |SELECT base.doc_id,
        |       CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
        |       CAST(coalesce(rbo_num_pts, 0) AS BIGINT) AS rbo_num_pts,
        |       CAST(coalesce(rbo_num_pts, 0) * 1000000 // $den AS BIGINT)
        |         AS rbo_micro
        |FROM base LEFT JOIN a USING (doc_id)""".stripMargin
    },

    // x261: partition-pruned daily read — the oracle recomputes the
    // probe day's panel from the raw table with the same min+offset
    // literal rule, so a hash match proves the pruned layout read is
    // lossless for that day.
    "x261_partition_pruned" -> {
      val off = operators.PartitionedStage.PruneDayOffset
      s"""WITH ev AS (
        |  SELECT event_type, user_id,
        |         CAST(round(value*100) AS BIGINT) AS value_cents,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |d AS (SELECT min(day) + $off AS probe_day FROM ev)
        |SELECT d.probe_day, ev.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev JOIN d ON ev.day = d.probe_day
        |GROUP BY 1, 2""".stripMargin
    },

    // x262: interpolated Kneser–Ney bigram model — same bigram
    // derivation as x94's oracle, continuation/context counts from the
    // model table, the exact rational over the common denominator, and
    // the one-IEEE-division double.
    "x262_kneser_ney" -> {
      import operators.TextAnalysis.{KnDiscountDen, KnDiscountNum, KnMinCount}
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |model AS (SELECT string_split(bigram, ' ')[1] AS w1,
        |                 string_split(bigram, ' ')[2] AS w2,
        |                 CAST(count(*) AS BIGINT) AS a
        |          FROM bg GROUP BY bigram),
        |ctx AS (SELECT w1, CAST(sum(a) AS BIGINT) AS cu,
        |               CAST(count(*) AS BIGINT) AS n1u FROM model GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nw FROM model GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM model)
        |SELECT w1, w2, a, cu, n1u, nw, nn,
        |       CAST(($KnDiscountDen*a - $KnDiscountNum)*nn
        |            + $KnDiscountNum*n1u*nw AS BIGINT) AS p_num,
        |       CAST($KnDiscountDen*cu*nn AS BIGINT) AS p_den,
        |       CAST(($KnDiscountDen*a - $KnDiscountNum)*nn
        |            + $KnDiscountNum*n1u*nw AS DOUBLE)
        |         / CAST($KnDiscountDen*cu*nn AS DOUBLE) AS kn_dbl
        |FROM model JOIN ctx USING (w1) JOIN cont USING (w2), tot
        |WHERE a >= $KnMinCount""".stripMargin
    },

    // x263: docs↔embeddings coverage — per-source missing-embedding
    // counts plus the two global orphan rows, all plain anti-joins.
    "x263_embedding_coverage" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
        |e AS (SELECT vec_id FROM embeddings),
        |miss AS (SELECT source, CAST(count(*) AS BIGINT) AS n_orphans
        |         FROM d ANTI JOIN e ON d.doc_id = e.vec_id GROUP BY 1),
        |per AS (SELECT 'doc_no_embedding:' || d.source AS relation,
        |               CAST(count(*) AS BIGINT) AS n_rows,
        |               CAST(coalesce(any_value(m.n_orphans), 0) AS BIGINT) AS n_orphans
        |        FROM d LEFT JOIN miss m ON d.source = m.source
        |        GROUP BY d.source),
        |g1 AS (SELECT 'doc_no_embedding' AS relation,
        |              (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_rows,
        |              (SELECT CAST(count(*) AS BIGINT)
        |               FROM d ANTI JOIN e ON d.doc_id = e.vec_id) AS n_orphans),
        |g2 AS (SELECT 'embedding_no_doc' AS relation,
        |              (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_rows,
        |              (SELECT CAST(count(*) AS BIGINT)
        |               FROM e ANTI JOIN d ON e.vec_id = d.doc_id) AS n_orphans)
        |SELECT * FROM per UNION ALL SELECT * FROM g1 UNION ALL SELECT * FROM g2""".stripMargin,

    // x264: x94's per-doc fluency under the x262 KN model (minCount 1)
    // — per-bigram integer ppm points, then the integer fold.
    "x264_kn_fluency" -> {
      import operators.TextAnalysis.{KnDiscountDen, KnDiscountNum}
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |model AS (SELECT bigram, string_split(bigram, ' ')[1] AS w1,
        |                 string_split(bigram, ' ')[2] AS w2,
        |                 CAST(count(*) AS BIGINT) AS a
        |          FROM bg GROUP BY bigram),
        |ctx AS (SELECT w1, CAST(sum(a) AS BIGINT) AS cu,
        |               CAST(count(*) AS BIGINT) AS n1u FROM model GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nw FROM model GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM model),
        |ppm AS (SELECT bigram,
        |          (1000000 * (($KnDiscountDen*a - $KnDiscountNum)*nn
        |                      + $KnDiscountNum*n1u*nw))
        |            // ($KnDiscountDen*cu*nn) AS kn_ppm
        |        FROM model JOIN ctx USING (w1) JOIN cont USING (w2), tot),
        |agg AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |               CAST(sum(p.kn_ppm) AS BIGINT) AS sp
        |        FROM bg b JOIN ppm p USING (bigram) GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(COALESCE(a.sp // a.n_bigrams, 0) AS BIGINT) AS kn_fluency_ppm
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
    },

    // x265: interpolated KN trigram chain — continuation counts at the
    // middle level (distinct left-contexts of each suffix bigram), the
    // x262 bottom level, the exact rational over the common denominator.
    "x265_kn_trigram" -> {
      import operators.TextAnalysis.{KnDiscountDen, KnDiscountNum, KnMinCount}
      val (dn, dd) = (KnDiscountNum, KnDiscountDen)
      s"""WITH tok AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |tg AS (SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM tok, unnest(range(1, len(ws) - 1)) AS t(i)),
        |tri AS (SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
        |               string_split(g, ' ')[3] AS w3, CAST(count(*) AS BIGINT) AS c3
        |        FROM tg GROUP BY g),
        |ctx AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12,
        |               CAST(count(*) AS BIGINT) AS n1u12 FROM tri GROUP BY 1, 2),
        |a2 AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS a2p FROM tri GROUP BY 1, 2),
        |mid AS (SELECT w2, CAST(sum(a2p) AS BIGINT) AS cu2p,
        |               CAST(count(*) AS BIGINT) AS n1u2p FROM a2 GROUP BY 1),
        |bg AS (SELECT DISTINCT ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM tok, unnest(range(1, len(ws))) AS t(i)),
        |bt AS (SELECT string_split(bigram, ' ')[2] AS w3 FROM bg),
        |nwt AS (SELECT w3, CAST(count(*) AS BIGINT) AS nw FROM bt GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM bt)
        |SELECT w1, w2, w3, c3, c12, n1u12, a2p, cu2p, n1u2p, nw, nn,
        |       CAST(($dd*c3 - $dn)*$dd*cu2p*nn
        |            + $dn*n1u12*(($dd*a2p - $dn)*nn + $dn*n1u2p*nw) AS BIGINT) AS p_num,
        |       CAST($dd*$dd*c12*cu2p*nn AS BIGINT) AS p_den,
        |       CAST(($dd*c3 - $dn)*$dd*cu2p*nn
        |            + $dn*n1u12*(($dd*a2p - $dn)*nn + $dn*n1u2p*nw) AS DOUBLE)
        |         / CAST($dd*$dd*c12*cu2p*nn AS DOUBLE) AS kn_dbl
        |FROM tri JOIN ctx USING (w1, w2) JOIN a2 USING (w2, w3)
        |  JOIN mid USING (w2) JOIN nwt USING (w3), tot
        |WHERE c3 >= $KnMinCount""".stripMargin
    },

    // x266: full-sync MERGE classification — the deterministic
    // next-snapshot source (k%10=7 deleted, k%10=3 re-priced 2×,
    // k%10=5 mirrored at -k-1), classified by a full-outer replay.
    "x266_full_sync" ->
      """WITH t AS (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |           FROM orders),
        |s AS (SELECT k, CASE WHEN k % 10 = 3 THEN cents * 2 ELSE cents END AS cents
        |      FROM t WHERE k % 10 <> 7
        |      UNION ALL
        |      SELECT -k - 1 AS k, cents FROM t WHERE k % 10 = 5),
        |j AS (SELECT coalesce(t.k, s.k) AS k,
        |             CASE WHEN t.k IS NULL THEN 'inserted'
        |                  WHEN s.k IS NULL THEN 'deleted'
        |                  WHEN t.cents IS DISTINCT FROM s.cents THEN 'updated'
        |                  ELSE 'unchanged' END AS action,
        |             CASE WHEN s.k IS NOT NULL THEN s.cents ELSE t.cents END
        |               AS cents
        |      FROM t FULL OUTER JOIN s ON t.k = s.k)
        |SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM j GROUP BY 1""".stripMargin,

    // x267: TTL retention panel — same max−window cutoff rule on the
    // raw table; the engine side reads it off the day-partitioned
    // layout via range partition pruning.
    "x267_retention_sweep" -> {
      val w = operators.PartitionedStage.RetentionDays
      s"""WITH ev AS (
        |  SELECT event_type,
        |         CAST(round(value*100) AS BIGINT) AS value_cents,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |b AS (SELECT max(day) - $w + 1 AS cutoff,
        |             count(DISTINCT day) AS n_days FROM ev),
        |k AS (SELECT count(DISTINCT day) AS n_kept_days
        |      FROM ev, b WHERE ev.day >= b.cutoff)
        |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(value_cents) AS BIGINT) AS kept_value_cents,
        |       CAST(min(day) AS BIGINT) AS min_kept_day,
        |       CAST(any_value(b.cutoff) AS BIGINT) AS cutoff_day,
        |       CAST(any_value(b.n_days) - any_value(k.n_kept_days) AS BIGINT)
        |         AS n_days_dropped,
        |       CAST(any_value(k.n_kept_days) AS BIGINT) AS n_days_kept
        |FROM ev, b, k WHERE ev.day >= b.cutoff
        |GROUP BY 1""".stripMargin
    },

    // x268: dense global ranking — the oracle is the plain total-order
    // window; a hash match proves the range-partitioned offset plan is
    // bit-identical to the single-partition semantics it replaces.
    "x268_global_ranking" ->
      """SELECT doc_id, n_chars,
        |       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |         AS BIGINT) AS global_rank
        |FROM documents""".stripMargin,

    // x269: normalization-aware exact dedup — the same mutated-twin
    // injection (UPPER + doubled spaces on every 3rd doc), raw vs
    // casefold/whitespace-collapsed digests.
    "x269_normalized_dedup" -> {
      import operators.Dedup.{NormTwinIdOffset, NormTwinMod}
      s"""WITH base AS (SELECT doc_id, source, text FROM documents),
        |twins AS (SELECT doc_id + $NormTwinIdOffset AS doc_id, source,
        |                 upper(replace(text, ' ', '  ')) AS text
        |          FROM base WHERE doc_id % $NormTwinMod = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
        |h AS (SELECT source, md5(text) AS raw_md5,
        |             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_md5
        |      FROM u)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT raw_md5) AS BIGINT) AS n_raw_groups,
        |       CAST(count(DISTINCT norm_md5) AS BIGINT) AS n_norm_groups,
        |       CAST(count(DISTINCT raw_md5) - count(DISTINCT norm_md5) AS BIGINT)
        |         AS extra_collapsed
        |FROM h GROUP BY 1""".stripMargin
    },

    // x270: Cohen's kappa between the x67 repetition gate and the x40
    // quality label — both decision rules replicated from their own
    // oracles' CTEs, then the exact chance-corrected rational.
    "x270_filter_kappa" -> {
      import operators.TextAnalysis.{RepMaxDup2gramPct, RepMaxDupWordPct, RepMaxTopWordPct}
      s"""$repetitionMetricsCteSql,
        |a AS (SELECT d.doc_id, d.source,
        |        CASE WHEN (m.n_words - m.n_distinct) * 100 <= m.n_words * $RepMaxDupWordPct
        |              AND m.max_tf * 100 <= m.n_words * $RepMaxTopWordPct
        |              AND m.n_dup_2grams * 100 <= m.n_2grams * $RepMaxDup2gramPct
        |             THEN 1 ELSE 0 END AS a
        |      FROM documents d JOIN m USING (doc_id)),
        |b AS (SELECT doc_id,
        |        CAST(least(1.0, len(string_split(text, ' ')) / 100.0) *
        |             (1.0 - len(list_filter(string_split(text, ' '), w -> length(w) = 1))
        |                    / len(string_split(text, ' '))) >= 0.5 AS INTEGER) AS b
        |      FROM documents),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(a*b) AS BIGINT) AS n11,
        |             CAST(sum(a*(1-b)) AS BIGINT) AS n10,
        |             CAST(sum((1-a)*b) AS BIGINT) AS n01,
        |             CAST(sum((1-a)*(1-b)) AS BIGINT) AS n00
        |      FROM a JOIN b USING (doc_id) GROUP BY 1)
        |SELECT source, n, n11, n10, n01, n00,
        |       CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
        |         AS BIGINT) AS kappa_num,
        |       CAST(n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
        |         AS BIGINT) AS kappa_den,
        |       CASE WHEN n*n = (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00) THEN NULL
        |            ELSE CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
        |                   AS DOUBLE)
        |               / CAST(n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
        |                   AS DOUBLE) END AS kappa_dbl
        |FROM c""".stripMargin
    },

    // x271: coalescing-bucket SMB join — the 16-bucket orders table
    // joined to the 8-bucket lineitem table with the coalesced-bucket
    // read (no shuffle on either side, spec plan-asserted); the oracle
    // replays the join + rollup on the plain parquet tables.
    "x271_coalesced_join" ->
      """SELECT o.o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) AS rev_cents,
        |       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin,

    // x272/x273: algorithm oracles (the x10/x13 pattern) — the SQL replays
    // the integer-exact PQ pipeline (quantize → deterministic Lloyd →
    // encode → ADC) from the same constants the operator uses; generated
    // in ProductQuant so the Lloyd-iteration CTE chain and the operator's
    // loop can only move together.
    "x272_pq_adc"        -> operators.ProductQuant.adcOracleSql,
    "x273_pq_distortion" -> operators.ProductQuant.distortionOracleSql,
    "x274_ivf_pq"        -> operators.ProductQuant.ivfPqOracleSql(),

    // x275: AS OF reads over the delta-file ledger — generation g holds
    // exactly the docs with doc_id mod TravelBatches ≤ g, so every
    // recoverable snapshot recomputes from the base table.
    "x275_time_travel" -> {
      import operators.StatsStage.{TravelBatches, TravelCompactAt}
      s"""WITH g AS (SELECT unnest(range($TravelCompactAt, $TravelBatches)) AS as_of),
        |d AS (SELECT doc_id % $TravelBatches AS b, lang FROM documents)
        |SELECT g.as_of, d.lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM g JOIN d ON d.b <= g.as_of
        |GROUP BY 1, 2""".stripMargin
    },

    // x276: the bounded top-k AGGREGATE form of x272 — bit-identical
    // contract, so the oracle IS x272's.
    "x276_pq_adc_agg" -> operators.ProductQuant.adcOracleSql,

    // x277: algorithm oracle — per-file Bloom bitmaps (md5-60 positions,
    // 63-bit words) rebuilt in SQL, probed by the same key ladder.
    "x277_bloom_skipping" ->
      s"""$bloomCtesSql,
        |actual AS (SELECT p.pid, t.f, count(*) AS n
        |           FROM probes p JOIN tagged t ON t.c = p.key GROUP BY 1, 2)
        |SELECT h.pid, CAST(h.key AS BIGINT) AS probe_key,
        |       CAST(sum(h.hit) AS BIGINT) AS n_files_hit,
        |       CAST(count(a.f) AS BIGINT) AS n_files_actual,
        |       CAST(sum(h.hit) - count(a.f) AS BIGINT) AS n_false_pos
        |FROM hits h LEFT JOIN actual a ON a.pid = h.pid AND a.f = h.f
        |GROUP BY 1, 2""".stripMargin,

    // x280: the bloom-SERVED lookup — the oracle answers by DIRECT key
    // lookup with no bloom anywhere, so a hash match proves the pruned
    // path loses nothing (plus the scan-cost column's algorithm replica).
    "x280_bloom_lookup" ->
      s"""$bloomCtesSql,
        |adm AS (SELECT pid, key, CAST(sum(hit) AS BIGINT) AS n_files_scanned
        |        FROM hits GROUP BY 1, 2),
        |d AS (SELECT p.pid, CAST(count(t.c) AS BIGINT) AS n_rows,
        |             CAST(coalesce(sum(t.cents), 0) AS BIGINT) AS sum_cents
        |      FROM probes p LEFT JOIN tagged t ON t.c = p.key GROUP BY 1)
        |SELECT a.pid, CAST(a.key AS BIGINT) AS probe_key, a.n_files_scanned,
        |       d.n_rows, d.sum_cents
        |FROM adm a JOIN d ON d.pid = a.pid""".stripMargin,

    // x278: Morton vs Hilbert under 2-D rectangle predicates — the xy2d
    // unroll shared verbatim with the engine via Relational.hilbertSteps.
    "x278_hilbert_delta" -> hilbertDeltaOracleSql,

    // x279: ADC pool → exact rerank (the PQ serving pattern).
    "x279_pq_rerank" -> operators.ProductQuant.rerankOracleSql,

    // x283: the ADC chain at PRODUCTION geometry (M=8, K=64) — the
    // integer-Lloyd replay parameterized, nothing else moves (r16
    // verdict task 3: the frontier RECALL.md quotes is now
    // hash-verified, not tool-printed).
    "x283_pq_prod_adc" -> operators.ProductQuant.prodAdcOracleSql(),

    // x284: the composed IVF-PQ index at PRODUCTION geometry — x274's
    // oracle with only the PQ chain's shape moved (the coarse quantizer
    // is full-dimension in both geometries).
    "x284_ivf_pq_prod" -> operators.ProductQuant.ivfPqOracleSql(
      operators.ProductQuant.PqProdSubspaces,
      operators.ProductQuant.PqProdSubDim,
      operators.ProductQuant.PqProdCodes),

    // x285/x286: the FULL production K=256 (one-byte codes) — the shape
    // RECALL.md's deployment frontier actually quotes, now hash-verified
    // end to end (r17 verdict task 1). Same parameterized builders and
    // CTE chains as x283/x284; only `codes` moves.
    "x285_pq_adc_k256" -> operators.ProductQuant.prodAdcOracleSql(
      operators.ProductQuant.PqFullCodes),
    "x286_ivf_pq_k256" -> operators.ProductQuant.ivfPqOracleSql(
      operators.ProductQuant.PqProdSubspaces,
      operators.ProductQuant.PqProdSubDim,
      operators.ProductQuant.PqFullCodes),

    // x287–x289: preference-data aggregation (the RLHF side of the
    // pipeline) — deterministic document duels rolled up to the win-rate
    // matrix, the integer-exact Bradley–Terry MM fit, and the
    // BT-vs-winrate Kendall concordance census. Oracles replay the full
    // floor-div MM chain (x77's unrolled-iteration pattern).
    "x287_source_duels" -> operators.Preference.sourceDuelsOracleSql,
    "x288_bt_strengths" -> operators.Preference.btOracleSql(),
    "x289_bt_concordance" -> operators.Preference.concordanceOracleSql(),

    // x290/x291: synchronous LPA communities on the co-purchase graph —
    // three unrolled rounds (x77's pattern), each round a (node, label)
    // support sum + the packed ARGMAX `max(sc·CAP + (CAP−1−label)) % CAP`
    // (the PQ packed-argmin trick pointed the other way), then the
    // per-community internal/boundary support census.
    "x290_lpa_communities" ->
      s"""WITH ${lpaChainSql(operators.LinkAnalysis.LpaIters)}
         |SELECT node AS part_key, label AS community
         |FROM l${operators.LinkAnalysis.LpaIters}""".stripMargin,
    "x291_lpa_census" -> {
      val last = s"l${operators.LinkAnalysis.LpaIters}"
      s"""WITH ${lpaChainSql(operators.LinkAnalysis.LpaIters)},
         |fit AS MATERIALIZED (SELECT node, label FROM $last),
         |pc AS MATERIALIZED (
         |  SELECT e0.w, fa.label AS ca, fb.label AS cb
         |  FROM e0 JOIN fit fa ON fa.node = e0.a
         |          JOIN fit fb ON fb.node = e0.b),
         |nodes AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
         |          FROM fit GROUP BY 1),
         |internal AS (SELECT ca AS community, CAST(sum(w) AS BIGINT) AS internal_w
         |             FROM pc WHERE ca = cb GROUP BY 1),
         |boundary AS (SELECT community, CAST(sum(w) AS BIGINT) AS boundary_w
         |             FROM (SELECT ca AS community, w FROM pc WHERE ca <> cb
         |                   UNION ALL SELECT cb, w FROM pc WHERE ca <> cb)
         |             GROUP BY 1)
         |SELECT n.community, n.n_nodes,
         |  CAST(COALESCE(i.internal_w, 0) AS BIGINT) AS internal_w,
         |  CAST(COALESCE(b.boundary_w, 0) AS BIGINT) AS boundary_w,
         |  CAST(COALESCE(i.internal_w, 0) * 1000000
         |       // GREATEST(COALESCE(i.internal_w, 0) + COALESCE(b.boundary_w, 0), 1)
         |       AS BIGINT) AS internal_share_micro
         |FROM nodes n LEFT JOIN internal i USING (community)
         |             LEFT JOIN boundary b USING (community)""".stripMargin
    },

    // x292/x293: the same propagation on the mutual-kNN embedding graph
    // (document-level semantic communities), plus the purity census —
    // majority true label per community via the packed argmax again.
    "x292_semantic_lpa" -> {
      val last = s"l${operators.LinkAnalysis.LpaIters}"
      s"""WITH ${semanticLpaChainSql(operators.LinkAnalysis.LpaIters)}
         |SELECT l.node AS vec_id, emb.label AS true_label,
         |       l.label AS community
         |FROM $last l JOIN embeddings emb ON emb.vec_id = l.node""".stripMargin
    },
    "x293_semantic_purity" -> {
      val cap = operators.LinkAnalysis.LpaLabelCap
      val last = s"l${operators.LinkAnalysis.LpaIters}"
      s"""WITH ${semanticLpaChainSql(operators.LinkAnalysis.LpaIters)},
         |fit AS MATERIALIZED (
         |  SELECT l.label AS community, emb.label AS true_label
         |  FROM $last l JOIN embeddings emb ON emb.vec_id = l.node),
         |counts AS (
         |  SELECT community, true_label, CAST(count(*) AS BIGINT) AS cnt
         |  FROM fit GROUP BY 1, 2)
         |SELECT community,
         |  CAST(sum(cnt) AS BIGINT) AS n_vecs,
         |  CAST(count(*) AS BIGINT) AS distinct_labels,
         |  CAST($cap - 1 - (max(cnt * $cap + ($cap - 1 - true_label)) % $cap)
         |    AS BIGINT) AS majority_label,
         |  CAST(max(cnt * $cap + ($cap - 1 - true_label)) // $cap AS BIGINT)
         |    AS majority_n,
         |  CAST((max(cnt * $cap + ($cap - 1 - true_label)) // $cap) * 1000000
         |       // sum(cnt) AS BIGINT) AS purity_micro
         |FROM counts GROUP BY 1""".stripMargin
    },
  )
}
