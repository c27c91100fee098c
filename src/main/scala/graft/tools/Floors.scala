package graft.tools

/**
 * Per-query warm-median floors from the last GATE-CLEAN bench pass at
 * each scale (VERDICT r15 next #2: the contention gate's entry/exit
 * probes have a mid-pass blind spot — the committed r15 sf1 leg ran
 * three untouched, plan-gated queries 3-8x their isolated steadies with
 * `sf1_contended:false`, and BASELINE.md had to adjudicate it by hand).
 * The floor gate makes that adjudication mechanical: a warm median
 * far above the recorded clean-window floor on a CLUSTER of queries is
 * host contention by construction (the plans are PlanSpec-gated, the
 * data is fixed per scale), so the pass self-flags and the recovery
 * loop re-runs it.
 *
 * Provenance (update when a cleaner pass lands — these are floors for
 * CONTENTION detection, not regression targets; a genuinely faster
 * engine only ever lowers real medians below floor, which never flags):
 *  - sf1: elementwise MIN of the r14 closing artifact (git
 *    8027241:bench_out.json, contended:false, 65 GB/s) and the r16
 *    closing clean leg (54.0 s warm at 52.6 GB/s, zero retries) —
 *    min-of-clean-passes is the tightest legitimate floor.
 *  - sf0.1: elementwise MIN of the r15 gate-recovered clean pass
 *    (50.8 GB/s) and the r16 closing clean pass 0 (55.7 GB/s).
 * Queries without a floor entry (new rows) are simply unchecked until
 * the next clean pass records them.
 */
object Floors {
  private val sf1: Map[String, Double] = Map("ann_ivf_join" -> 0.647, "ann_lsh_join" -> 2.172, "ann_matryoshka" -> 0.344, "ann_maxsim" -> 1.91, "ann_pq" -> 0.516, "dedup_clusters_stars" -> 1.902, "dedup_exact" -> 0.229, "dedup_minhash" -> 0.108, "dedup_semantic_scaled" -> 1.932, "dedup_substring_clean" -> 0.147, "embed_pool" -> 1.015, "ev_asof" -> 0.177, "ev_funnel" -> 0.463, "ev_hourly" -> 0.253, "ev_hourly_late" -> 0.093, "ev_overlap_join" -> 0.399, "ev_range_join" -> 0.591, "ev_retention" -> 0.296, "ev_sessions" -> 0.519, "ev_sliding" -> 0.651, "ev_transitions" -> 0.598, "graph_pagerank" -> 0.647, "hybrid_rrf" -> 0.947, "hybrid_streamed" -> 0.86, "ingest_dedup" -> 0.226, "ingest_neardedup" -> 0.2, "knn_multiquery_heap" -> 0.315, "knn_tag_filtered_sql" -> 0.209, "knn_topk" -> 0.178, "pipeline_curate" -> 4.175, "q1_agg" -> 0.683, "q3_top_revenue" -> 3.713, "q_assoc_rules" -> 7.191, "q_auto_join" -> 0.533, "q_fuzzy_join" -> 0.331, "q_group_percentile_2pass" -> 1.274, "q_salted_agg" -> 0.41, "q_salted_join" -> 0.847, "q_window_rank" -> 0.715, "serve_streamed" -> 0.1, "text_bm25" -> 0.724, "text_bpe_train" -> 0.884, "text_collocations" -> 1.128, "text_dsir" -> 1.334, "text_heavy_hitters" -> 1.735, "text_pack" -> 1.211, "text_phrase_search" -> 0.934, "text_quality_norm" -> 1.975, "text_rank_eval" -> 2.937, "text_stats" -> 0.127, "text_token_budget_sharded" -> 0.633, "text_weighted_sample" -> 0.129)

  private val sf01: Map[String, Double] = Map("ann_eval" -> 0.911, "ann_ivf" -> 0.274, "ann_ivf_filtered" -> 0.446, "ann_ivf_join" -> 0.422, "ann_ivf_quantized" -> 0.256, "ann_lsh" -> 0.25, "ann_lsh_join" -> 0.606, "ann_matryoshka" -> 0.293, "ann_maxsim" -> 0.498, "ann_pq" -> 0.306, "decontaminate" -> 0.391, "decontaminate_minhash" -> 0.898, "decontaminate_semantic" -> 0.211, "dedup_clusters" -> 0.292, "dedup_clusters_stars" -> 1.013, "dedup_embedding_lsh" -> 0.94, "dedup_exact" -> 0.152, "dedup_minhash" -> 0.123, "dedup_semantic" -> 0.569, "dedup_semantic_scaled" -> 0.72, "dedup_simhash" -> 0.222, "dedup_simhash_pairs" -> 0.923, "dedup_substring" -> 0.606, "dedup_substring_clean" -> 0.145, "embed_hash" -> 0.101, "embed_knn" -> 0.192, "embed_pool" -> 0.26, "ev_anomaly" -> 0.237, "ev_asof" -> 0.125, "ev_asof_fwd" -> 0.126, "ev_asof_within" -> 0.124, "ev_err_click_join" -> 0.171, "ev_funnel" -> 0.319, "ev_funnel_steps" -> 0.357, "ev_hourly" -> 0.149, "ev_hourly_late" -> 0.107, "ev_latency" -> 0.361, "ev_outliers_mad" -> 0.613, "ev_overlap_join" -> 0.372, "ev_range_join" -> 0.26, "ev_retention" -> 0.212, "ev_sessions" -> 0.282, "ev_sliding" -> 0.213, "ev_transitions" -> 0.259, "ev_trending" -> 0.194, "graph_pagerank" -> 0.323, "graph_triangles" -> 2.65, "hybrid_rrf" -> 0.448, "hybrid_streamed" -> 0.773, "ingest_dedup" -> 0.221, "ingest_neardedup" -> 0.205, "knn_classify" -> 0.229, "knn_euclidean" -> 0.151, "knn_multiquery" -> 0.209, "knn_multiquery_heap" -> 0.223, "knn_scores" -> 0.136, "knn_tag_filtered" -> 0.27, "knn_tag_filtered_sql" -> 0.206, "knn_tag_unknown" -> 0.236, "knn_topk" -> 0.135, "mm_audio" -> 0.804, "mm_decode" -> 0.54, "mm_features" -> 0.119, "mm_frames" -> 0.121, "mm_video" -> 0.644, "pairs_hard_negatives" -> 0.686, "pca_project" -> 0.298, "pipeline_curate" -> 0.816, "pipeline_prepare" -> 1.154, "pipeline_web" -> 1.689, "q1_agg" -> 0.196, "q3_top_revenue" -> 0.563, "q_anti" -> 0.221, "q_approx_distinct" -> 0.095, "q_approx_percentile" -> 0.12, "q_assoc_rules" -> 1.037, "q_auto_join" -> 0.368, "q_bloom_semi" -> 0.487, "q_cube" -> 0.297, "q_equidepth" -> 0.765, "q_fuzzy_join" -> 0.289, "q_fuzzy_lookup" -> 0.469, "q_group_percentile_2pass" -> 0.374, "q_grouping_sets" -> 0.268, "q_histogram" -> 0.153, "q_lag_lead" -> 0.104, "q_multi_join" -> 0.351, "q_outer_join" -> 0.222, "q_percentile" -> 0.131, "q_percentile_2pass" -> 0.779, "q_pivot" -> 0.16, "q_rollup" -> 0.243, "q_salted_agg" -> 0.152, "q_salted_join" -> 0.39, "q_semi" -> 0.257, "q_setops" -> 0.303, "q_skew_profile" -> 0.163, "q_topn_parts" -> 0.097, "q_window_rank" -> 0.308, "serve_streamed" -> 0.1, "store_delete" -> 0.557, "text_bm25" -> 0.247, "text_bm25_query" -> 0.33, "text_boilerplate" -> 0.118, "text_bpe_compression" -> 0.72, "text_bpe_tokens" -> 0.792, "text_bpe_tokens_artifact" -> 0.58, "text_bpe_train" -> 0.536, "text_chunks" -> 0.21, "text_cluster" -> 0.286, "text_collocations" -> 0.33, "text_dsir" -> 0.427, "text_fingerprint" -> 0.099, "text_gopher" -> 0.1, "text_heavy_hitters" -> 0.418, "text_html_extract" -> 0.104, "text_keywords" -> 0.624, "text_langid" -> 0.116, "text_line_dedup" -> 0.116, "text_lm_score" -> 0.299, "text_mixture" -> 0.21, "text_pack" -> 0.408, "text_phrase_indexed" -> 0.226, "text_phrase_search" -> 0.277, "text_phrase_topics" -> 0.385, "text_pii" -> 0.111, "text_quality" -> 0.109, "text_quality_norm" -> 0.635, "text_rank_eval" -> 0.807, "text_redact" -> 0.1, "text_repetition" -> 0.19, "text_shards" -> 0.137, "text_split" -> 0.145, "text_split_clustered" -> 0.425, "text_stats" -> 0.105, "text_stratified" -> 0.134, "text_token_budget" -> 0.185, "text_token_budget_bpe" -> 0.977, "text_token_budget_sharded" -> 0.198, "text_tokenize_optimal" -> 0.7, "text_url_filter" -> 0.112, "text_vocab" -> 0.163, "text_weighted_sample" -> 0.115, "text_wordpiece_tokens" -> 0.717, "text_wordpiece_tokens_artifact" -> 0.639, "text_wordpiece_vocab" -> 0.273, "vec_drift" -> 0.269, "vec_table" -> 0.187, "vq_checksum" -> 0.106, "warc_read" -> 0.146, "warc_read_v2" -> 0.097, "warc_streamed" -> 0.423, "warc_streamed_unordered" -> 0.78)

  /** Floor table for a suite tag ("sf1" / "sf01"); empty for others. */
  def of(tag: String): Map[String, Double] = tag match {
    case "sf1" => sf1
    case "sf01" | "sf01warm" => sf01
    case _ => Map.empty
  }
}
