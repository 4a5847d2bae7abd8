package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextOps
import graft.operators.{CorpusOps, DedupOps, EmbeddingOps, EnrichOps, RelationalOps, WindowOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over the driver-generated tables (TESTDATA.md), with an
  * equivalent DuckDB SQL oracle where the semantics are
  * SQL-expressible. Query results are fully ordered and use exact
  * decimal arithmetic for double aggregates so the hash compare is
  * deterministic across engines and partition counts.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6 aggregations (A1-A5, A9)
    "q01_pricing_summary" -> RelationalOps.pricingSummary _,
    // §2.3 projection/filter (T2/T8/T9)
    "q02_filter_project" -> RelationalOps.filterProject _,
    // §2.5 lookup/dim join (JN2), broadcast
    "q03_dim_join" -> RelationalOps.dimJoin _,
    // §2.8 top-k (O4)
    "q04_topk_per_group" -> ((s, d) => RelationalOps.topKPerGroup(s, d)),
    // §2.8 sort+limit (O1/O2)
    "q05_sort_limit" -> ((s, d) => RelationalOps.sortLimit(s, d)),
    // §2.8 union (O3)
    "q06_union" -> RelationalOps.unionMerge _,
    // §2.6 dedup (A7)
    "q07_dedup_exact" -> RelationalOps.dedupExact _,
    // §2.7 windows (W1-W3/W8, A5/A8)
    "q08_window_tumbling" -> WindowOps.tumbling _,
    "q09_window_sliding" -> WindowOps.sliding _,
    "q10_window_session" -> WindowOps.session _,
    // §2.5 interval join (JN1/JN3)
    "q11_interval_join" -> WindowOps.intervalJoin _,
    // §2.3 flatMap/explode (T3/J2)
    "q12_explode_tokens" -> EnrichOps.explodeTokens _,
    // §2.4 JSON parse (J1, T12/T13)
    "q13_json_extract" -> EnrichOps.jsonExtract _,
    // §2.9 scalar function census
    "q14_scalar_census" -> EnrichOps.scalarCensus _,
    // §2.6 distinct agg + having
    "q15_distinct_having" -> EnrichOps.distinctHaving _,
    // §3.2 SQL-text path (T10)
    "q16_sql_lookup_join" -> EnrichOps.sqlLookupJoin _,
    // text analysis: token counting + quality scoring
    "q17_text_stats" -> TextOps.textStats _,
    // text analysis: language-ID heuristic
    "q18_lang_id" -> TextOps.langId _,
    // text analysis: document fingerprinting
    "q19_fingerprint" -> TextOps.fingerprint _,
    // dedup: minhash signatures
    "q20_minhash_signatures" -> DedupOps.minhashSignatures _,
    // dedup: LSH banding candidates
    "q21_lsh_candidates" -> DedupOps.lshCandidates _,
    // dedup: exact n-gram jaccard verification of candidates
    "q22_jaccard_verify" -> DedupOps.jaccardVerify _,
    // dedup: simhash signatures
    "q23_simhash" -> DedupOps.simhash _,
    // dedup: simhash near-dup pairs (banded hamming)
    "q24_simhash_pairs" -> DedupOps.simhashPairs _,
    // similarity: brute-force cosine top-k
    "q25_cosine_topk" -> EmbeddingOps.cosineTopK _,
    // similarity: sign-LSH buckets
    "q26_lsh_buckets" -> EmbeddingOps.lshBuckets _,
    // similarity: ANN within buckets
    "q27_ann_bucketed" -> EmbeddingOps.annBucketed _,
    // similarity: embedding near-dup pairs
    "q28_embed_neardup" -> EmbeddingOps.nearDupPairs _,
    // multimodal: binary media column + typed metadata extraction
    "q29_media_meta" -> graft.functions.Multimodal.mediaMetaQuery _,
    // beyond-reference: rollup/grouping sets
    "q30_rollup" -> RelationalOps.rollupAgg _,
    // §2.5 stream-stream window join (JN1) batch analogue
    "q31_window_join" -> WindowOps.windowJoinQuery _,
    // dedup pipeline end-to-end: surviving corpus after exact+near dedup
    "q32_dedup_keep_list" -> DedupOps.dedupKeepList _,
    // similarity: IVF-style ANN (k-means coarse centroids + inverted lists)
    "q33_ivf_ann" -> ((s, d) => EmbeddingOps.ivfAnn(s, d)),
    // §2.6 A8: stage-2 statistics over the production stats functions
    "q34_stats_minute" -> graft.pipelines.WalmartOrderPipeline.statsMinuteQuery _,
    "q35_stats_user" -> graft.pipelines.WalmartOrderPipeline.statsUserQuery _,
    "q36_stats_item" -> graft.pipelines.WalmartOrderPipeline.statsItemQuery _,
    "q37_stats_status" -> graft.pipelines.WalmartOrderPipeline.statsStatusQuery _,
    // §2.10 ST6: stage-3 anomaly CEP (large / frequent / consecutive)
    "q38_order_anomalies" -> graft.streaming.OrderAnomalyDetector.anomalyQuery _,
    "q39_consecutive_pairs" -> graft.streaming.OrderAnomalyDetector.consecutiveQuery _,
    // beyond-reference temporal joins: as-of (union+window, zero-join)
    // and broadcast range-bin join
    "q40_asof_join" -> graft.operators.AsOfOps.asOfQuery _,
    "q41_range_bin_join" -> graft.operators.AsOfOps.rangeBinQuery _,
    // dedup at the production-recall preset (128 hashes / 16 bands,
    // s-curve threshold ~0.71): the same pipeline hash-verified at the
    // parameters a 100 TB run would use, not just the test-fast 8/4
    "q42_minhash_scale" -> ((s, d) => DedupOps.minhashSignatures(s, d, DedupOps.scaleParams)),
    "q43_lsh_scale" -> ((s, d) => DedupOps.lshCandidates(s, d, DedupOps.scaleParams)),
    "q44_jaccard_scale" -> ((s, d) => DedupOps.jaccardVerify(s, d, DedupOps.scaleParams)),
    // text analysis: Gopher-style repetition filters (drop boilerplate)
    "q45_repetition" -> TextOps.repetitionStats _,
    // text analysis: PII scrub (email/IP/phone redaction census)
    "q46_pii_redact" -> TextOps.piiRedact _,
    // dedup: connected-component clusters over exact + near-dup edges
    "q47_dedup_clusters" -> DedupOps.dedupClusters _,
    // curation: benchmark decontamination (n-gram overlap census)
    "q48_decontaminate" -> CorpusOps.decontaminate _,
    // curation: deterministic stratified sampling (per-lang rates)
    "q49_stratified_sample" -> CorpusOps.stratifiedSample _,
    // curation: balanced domain mixing (downsample to smallest lang)
    "q50_domain_mix" -> CorpusOps.domainMix _,
    // curation: composed quality filter with reject reasons
    "q51_quality_filter" -> CorpusOps.qualityFilter _,
    // curation: sharded contiguous sequence packing
    "q52_pack_bins" -> CorpusOps.packBins _,
    // curation: embedding-space benchmark decontamination (max-cos census)
    "q53_semantic_decontam" -> graft.operators.EmbeddingOps.semanticDecontaminate _,
    // curation: rare-token (OOV) census via the broadcastable common head
    "q54_rare_tokens" -> CorpusOps.rareTokenFilter _,
    // curation: CCNet-style boilerplate chunk (pseudo-line) dedup census
    "q55_boilerplate" -> CorpusOps.boilerplateChunks _,
    // curation: rarity-weighted top-k keywords per document (TF-IDF shape)
    "q56_tfidf_keywords" -> CorpusOps.tfidfKeywords _,
    // curation: char-trigram typicality (integer-exact perplexity proxy)
    "q57_trigram_typicality" -> CorpusOps.trigramTypicality _,
    // curation: deterministic per-epoch shard/order assignment
    "q58_epoch_shuffle" -> CorpusOps.epochShuffle _,
    // similarity: embedding health census (NaN/zero/norm gate)
    "q59_embedding_health" -> graft.operators.EmbeddingOps.embeddingHealth _,
    // dedup: containment pairs via rare-shingle anchoring (doc-inside-doc)
    "q60_containment" -> DedupOps.containmentPairs _,
    // dedup: incremental batch-vs-corpus admission (exact + near verdicts)
    "q61_incremental_dedup" -> DedupOps.incrementalDedup _,
    // curation analytics: cross-source duplication matrix
    "q62_source_overlap" -> DedupOps.sourceOverlapMatrix _,
    // curation analytics: per-stage survival funnel (composition proof)
    "q63_curation_funnel" -> CorpusOps.curationFunnel _,
    // beyond-reference: exact per-group percentiles by rank selection
    "q64_lang_percentiles" -> RelationalOps.langLengthPercentiles _,
    // beyond-reference: ordered event funnel (view -> click -> purchase)
    "q65_event_funnel" -> WindowOps.eventFunnel _,
    // beyond-reference: weekly cohort retention triangle
    "q66_cohort_retention" -> WindowOps.cohortRetention _,
    // beyond-reference warehouse joins: TPC-H Q3/Q5 shapes
    "q67_shipping_priority" -> RelationalOps.shippingPriority _,
    "q68_local_supplier_volume" -> RelationalOps.localSupplierVolume _,
    // beyond-reference: correlated scalar subqueries (TPC-H Q17 shape)
    "q69_small_qty_revenue" -> EnrichOps.smallQuantityRevenue _,
    // beyond-reference: outer-join double aggregation (TPC-H Q13 shape)
    "q70_order_count_dist" -> RelationalOps.orderCountDistribution _,
    // beyond-reference: NOT EXISTS anti join
    "q71_dormant_customers" -> RelationalOps.dormantCustomers _,
    // §2.8 O4 again as a bounded two-phase aggregate (map-side partial
    // top-k heaps) — same oracle as the window form q04
    "q72_topk_agg" -> ((s, d) => RelationalOps.topKPerGroupAgg(s, d)),
    // multimodal: binary frame sampling (fixed-length slices at a stride)
    "q73_frame_sample" -> graft.functions.Multimodal.frameSample _,
    // beyond-reference: EXISTS semi join (TPC-H Q4 shape)
    "q74_priority_check" -> RelationalOps.priorityCheck _,
    // beyond-reference: exact percentiles on a CONTINUOUS domain via
    // range-bucketed rank selection (no per-group single-task sort)
    "q75_price_percentiles" -> RelationalOps.pricePercentiles _,
    // beyond-reference: correlated MIN per group, window-decorrelated
    // (TPC-H Q2 shape)
    "q76_min_cost_supplier" -> RelationalOps.minCostSupplier _,
    // beyond-reference: nested semi joins with a correlated aggregate
    // threshold (TPC-H Q20 shape)
    "q77_dominant_shippers" -> RelationalOps.dominantShippers _,
    // beyond-reference: scalar MAX subquery over an aggregate view
    // (TPC-H Q15 shape)
    "q78_top_revenue_supplier" -> RelationalOps.topRevenueSupplier _,
    // dedup: EXACT-RECALL near-dup pairs (prefix filtering) — the
    // deterministic complement to probabilistic LSH; oracle is the
    // TRUE all-pairs answer
    "q79_prefix_jaccard" -> DedupOps.prefixJaccardPairs _,
    // corpus: cross-doc repeated-span census (sliding window, native
    // one-pass span hashing; exact via string re-group of survivors)
    "q80_repeated_spans" -> CorpusOps.repeatedSpans _,
    "q81_dedup_span_ranges" -> CorpusOps.dedupSpanRanges _,
    // similarity: int8-quantized cosine top-k (compressed-corpus path)
    "q82_quantized_ann" -> EmbeddingOps.quantizedCosineTopK _,
    // similarity: bucketed + IVF ANN probes over the STAGED int8
    // corpus (q27/q33's plans reading ~4x narrower codes at rest)
    "q83_quantized_bucketed_ann" -> EmbeddingOps.quantizedAnnBucketed _,
    "q84_quantized_ivf_ann" -> EmbeddingOps.quantizedIvfAnn _,
    // similarity: multi-plane-set union ANN (the planeSets recall
    // amplifier as a batch query; candidates unioned across 2
    // independent bucket spaces, pair-deduped, quantized cosine)
    "q85_multiset_ann" -> ((s, d) => EmbeddingOps.multiSetAnnBucketed(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> RelationalOps.pricingSummarySql,
    "q02_filter_project" -> RelationalOps.filterProjectSql,
    "q03_dim_join" -> RelationalOps.dimJoinSql,
    "q04_topk_per_group" -> RelationalOps.topKPerGroupSql,
    "q05_sort_limit" -> RelationalOps.sortLimitSql,
    "q06_union" -> RelationalOps.unionMergeSql,
    "q07_dedup_exact" -> RelationalOps.dedupExactSql,
    "q08_window_tumbling" -> WindowOps.tumblingSql,
    "q09_window_sliding" -> WindowOps.slidingSql,
    "q10_window_session" -> WindowOps.sessionSql,
    "q11_interval_join" -> WindowOps.intervalJoinSql,
    "q12_explode_tokens" -> EnrichOps.explodeTokensSql,
    "q13_json_extract" -> EnrichOps.jsonExtractSql,
    "q14_scalar_census" -> EnrichOps.scalarCensusSql,
    "q15_distinct_having" -> EnrichOps.distinctHavingSql,
    "q16_sql_lookup_join" -> EnrichOps.sqlLookupJoinSql,
    "q17_text_stats" -> TextOps.textStatsSql,
    "q18_lang_id" -> TextOps.langIdSql,
    "q19_fingerprint" -> TextOps.fingerprintSql,
    "q20_minhash_signatures" -> DedupOps.minhashSignaturesSql,
    "q21_lsh_candidates" -> DedupOps.lshCandidatesSql,
    "q22_jaccard_verify" -> DedupOps.jaccardVerifySql,
    "q23_simhash" -> DedupOps.simhashSql,
    "q24_simhash_pairs" -> DedupOps.simhashPairsSql,
    "q25_cosine_topk" -> EmbeddingOps.cosineTopKSql,
    "q26_lsh_buckets" -> EmbeddingOps.lshBucketsSql,
    "q27_ann_bucketed" -> EmbeddingOps.annBucketedSql,
    "q28_embed_neardup" -> EmbeddingOps.nearDupPairsSql,
    "q29_media_meta" -> graft.functions.Multimodal.mediaMetaQuerySql,
    "q30_rollup" -> RelationalOps.rollupAggSql,
    "q31_window_join" -> WindowOps.windowJoinQuerySql,
    "q32_dedup_keep_list" -> DedupOps.dedupKeepListSql,
    "q33_ivf_ann" -> EmbeddingOps.ivfAnnSql,
    "q34_stats_minute" -> graft.pipelines.WalmartOrderPipeline.statsMinuteQuerySql,
    "q35_stats_user" -> graft.pipelines.WalmartOrderPipeline.statsUserQuerySql,
    "q36_stats_item" -> graft.pipelines.WalmartOrderPipeline.statsItemQuerySql,
    "q37_stats_status" -> graft.pipelines.WalmartOrderPipeline.statsStatusQuerySql,
    "q38_order_anomalies" -> graft.streaming.OrderAnomalyDetector.anomalyQuerySql,
    "q39_consecutive_pairs" -> graft.streaming.OrderAnomalyDetector.consecutiveQuerySql,
    "q40_asof_join" -> graft.operators.AsOfOps.asOfQuerySql,
    "q41_range_bin_join" -> graft.operators.AsOfOps.rangeBinQuerySql,
    "q42_minhash_scale" -> DedupOps.minhashSignaturesSqlFor(DedupOps.scaleParams),
    "q43_lsh_scale" -> DedupOps.lshCandidatesSqlFor(DedupOps.scaleParams),
    "q44_jaccard_scale" -> DedupOps.jaccardVerifySqlFor(DedupOps.scaleParams),
    "q45_repetition" -> TextOps.repetitionStatsSql,
    "q46_pii_redact" -> TextOps.piiRedactSql,
    "q47_dedup_clusters" -> DedupOps.dedupClustersSql,
    "q48_decontaminate" -> CorpusOps.decontaminateSql,
    "q49_stratified_sample" -> CorpusOps.stratifiedSampleSql,
    "q50_domain_mix" -> CorpusOps.domainMixSql,
    "q51_quality_filter" -> CorpusOps.qualityFilterSql,
    "q52_pack_bins" -> CorpusOps.packBinsSql,
    "q53_semantic_decontam" -> graft.operators.EmbeddingOps.semanticDecontaminateSql,
    "q54_rare_tokens" -> CorpusOps.rareTokenFilterSql,
    "q55_boilerplate" -> CorpusOps.boilerplateChunksSql,
    "q56_tfidf_keywords" -> CorpusOps.tfidfKeywordsSql,
    "q57_trigram_typicality" -> CorpusOps.trigramTypicalitySql,
    "q58_epoch_shuffle" -> CorpusOps.epochShuffleSql,
    "q59_embedding_health" -> graft.operators.EmbeddingOps.embeddingHealthSql,
    "q60_containment" -> DedupOps.containmentPairsSql,
    "q61_incremental_dedup" -> DedupOps.incrementalDedupSql,
    "q62_source_overlap" -> DedupOps.sourceOverlapMatrixSql,
    "q63_curation_funnel" -> CorpusOps.curationFunnelSql,
    "q64_lang_percentiles" -> RelationalOps.langLengthPercentilesSql,
    "q65_event_funnel" -> WindowOps.eventFunnelSql,
    "q66_cohort_retention" -> WindowOps.cohortRetentionSql,
    "q67_shipping_priority" -> RelationalOps.shippingPrioritySql,
    "q68_local_supplier_volume" -> RelationalOps.localSupplierVolumeSql,
    "q69_small_qty_revenue" -> EnrichOps.smallQuantityRevenueSql,
    "q70_order_count_dist" -> RelationalOps.orderCountDistributionSql,
    "q71_dormant_customers" -> RelationalOps.dormantCustomersSql,
    "q72_topk_agg" -> RelationalOps.topKPerGroupSql,
    "q73_frame_sample" -> graft.functions.Multimodal.frameSampleSql,
    "q74_priority_check" -> RelationalOps.priorityCheckSql,
    "q75_price_percentiles" -> RelationalOps.pricePercentilesSql,
    "q76_min_cost_supplier" -> RelationalOps.minCostSupplierSql,
    "q77_dominant_shippers" -> RelationalOps.dominantShippersSql,
    "q78_top_revenue_supplier" -> RelationalOps.topRevenueSupplierSql,
    "q79_prefix_jaccard" -> DedupOps.prefixJaccardPairsSql,
    "q80_repeated_spans" -> CorpusOps.repeatedSpansSql,
    "q81_dedup_span_ranges" -> CorpusOps.dedupSpanRangesSql,
    "q82_quantized_ann" -> EmbeddingOps.quantizedCosineTopKSql,
    "q83_quantized_bucketed_ann" -> EmbeddingOps.quantizedAnnBucketedSql,
    "q84_quantized_ivf_ann" -> EmbeddingOps.quantizedIvfAnnSql,
    "q85_multiset_ann" -> EmbeddingOps.multiSetAnnBucketedSql,
  )
}
