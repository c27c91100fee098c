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
 *  - sf1: round-14 closing artifact (git 8027241:bench_out.json,
 *    queries_sf1_warm, sf1_contended=false, cpu_mt 65 GB/s window).
 *  - sf0.1: round-15 closing artifact (bench_out.json queries_warm —
 *    the gate-recovered clean pass 1, cpu_mt 50.8 GB/s window).
 * Queries without a floor entry (new rows) are simply unchecked until
 * the next clean pass records them.
 */
object Floors {
  private val sf1: Map[String, Double] = Map("ann_ivf_join" -> 0.655, "ann_lsh_join" -> 2.316, "ann_matryoshka" -> 0.345, "ann_maxsim" -> 2.436, "ann_pq" -> 0.516, "dedup_clusters_stars" -> 1.902, "dedup_exact" -> 0.229, "dedup_minhash" -> 0.108, "dedup_semantic_scaled" -> 1.932, "dedup_substring_clean" -> 0.151, "embed_pool" -> 1.037, "ev_asof" -> 0.206, "ev_funnel" -> 0.463, "ev_hourly" -> 0.26, "ev_hourly_late" -> 0.093, "ev_overlap_join" -> 0.935, "ev_range_join" -> 0.637, "ev_retention" -> 0.296, "ev_sessions" -> 0.736, "ev_sliding" -> 0.962, "ev_transitions" -> 0.683, "graph_pagerank" -> 0.647, "hybrid_rrf" -> 0.955, "hybrid_streamed" -> 0.941, "ingest_dedup" -> 0.226, "ingest_neardedup" -> 0.2, "knn_multiquery_heap" -> 0.315, "knn_topk" -> 0.178, "pipeline_curate" -> 7.544, "q1_agg" -> 0.722, "q3_top_revenue" -> 3.713, "q_assoc_rules" -> 7.191, "q_auto_join" -> 0.538, "q_fuzzy_join" -> 0.535, "q_group_percentile_2pass" -> 2.572, "q_salted_agg" -> 0.445, "q_salted_join" -> 0.847, "q_window_rank" -> 0.715, "serve_streamed" -> 0.1, "text_bm25" -> 0.737, "text_bpe_train" -> 0.884, "text_collocations" -> 2.971, "text_dsir" -> 1.37, "text_heavy_hitters" -> 1.918, "text_pack" -> 1.211, "text_phrase_search" -> 0.934, "text_quality_norm" -> 1.975, "text_rank_eval" -> 3.107, "text_stats" -> 0.161, "text_token_budget_sharded" -> 0.71, "text_weighted_sample" -> 0.129)

  private val sf01: Map[String, Double] = Map("ann_eval" -> 0.911, "ann_ivf" -> 0.274, "ann_ivf_filtered" -> 0.512, "ann_ivf_join" -> 0.466, "ann_ivf_quantized" -> 0.283, "ann_lsh" -> 0.25, "ann_lsh_join" -> 0.606, "ann_matryoshka" -> 0.293, "ann_maxsim" -> 0.587, "ann_pq" -> 0.306, "decontaminate" -> 0.391, "decontaminate_minhash" -> 0.898, "decontaminate_semantic" -> 0.211, "dedup_clusters" -> 0.292, "dedup_clusters_stars" -> 1.013, "dedup_embedding_lsh" -> 0.94, "dedup_exact" -> 0.154, "dedup_minhash" -> 0.123, "dedup_semantic" -> 0.569, "dedup_semantic_scaled" -> 0.72, "dedup_simhash" -> 0.231, "dedup_simhash_pairs" -> 1.099, "dedup_substring" -> 0.606, "dedup_substring_clean" -> 0.152, "embed_hash" -> 0.12, "embed_knn" -> 0.267, "embed_pool" -> 0.26, "ev_anomaly" -> 0.237, "ev_asof" -> 0.125, "ev_asof_fwd" -> 0.126, "ev_asof_within" -> 0.124, "ev_err_click_join" -> 0.171, "ev_funnel" -> 0.349, "ev_funnel_steps" -> 0.357, "ev_hourly" -> 0.149, "ev_hourly_late" -> 0.124, "ev_latency" -> 0.361, "ev_outliers_mad" -> 0.699, "ev_overlap_join" -> 0.421, "ev_range_join" -> 0.26, "ev_retention" -> 0.212, "ev_sessions" -> 0.311, "ev_sliding" -> 0.213, "ev_transitions" -> 0.259, "ev_trending" -> 0.229, "graph_pagerank" -> 0.36, "graph_triangles" -> 2.65, "hybrid_rrf" -> 0.546, "hybrid_streamed" -> 0.98, "ingest_dedup" -> 0.221, "ingest_neardedup" -> 0.205, "knn_classify" -> 0.229, "knn_euclidean" -> 0.151, "knn_multiquery" -> 0.214, "knn_multiquery_heap" -> 0.223, "knn_scores" -> 0.136, "knn_tag_filtered" -> 0.283, "knn_tag_filtered_sql" -> 0.275, "knn_tag_unknown" -> 0.236, "knn_topk" -> 0.135, "mm_audio" -> 0.804, "mm_decode" -> 0.54, "mm_features" -> 0.15, "mm_frames" -> 0.121, "mm_video" -> 0.644, "pairs_hard_negatives" -> 0.686, "pca_project" -> 0.352, "pipeline_curate" -> 0.816, "pipeline_prepare" -> 1.189, "pipeline_web" -> 1.689, "q1_agg" -> 0.232, "q3_top_revenue" -> 0.563, "q_anti" -> 0.272, "q_approx_distinct" -> 0.095, "q_approx_percentile" -> 0.12, "q_assoc_rules" -> 1.219, "q_auto_join" -> 0.368, "q_bloom_semi" -> 0.487, "q_cube" -> 0.304, "q_equidepth" -> 0.903, "q_fuzzy_join" -> 0.289, "q_fuzzy_lookup" -> 0.472, "q_group_percentile_2pass" -> 0.453, "q_grouping_sets" -> 0.296, "q_histogram" -> 0.165, "q_lag_lead" -> 0.104, "q_multi_join" -> 0.351, "q_outer_join" -> 0.222, "q_percentile" -> 0.131, "q_percentile_2pass" -> 0.851, "q_pivot" -> 0.167, "q_rollup" -> 0.243, "q_salted_agg" -> 0.152, "q_salted_join" -> 0.39, "q_semi" -> 0.312, "q_setops" -> 0.303, "q_skew_profile" -> 0.163, "q_topn_parts" -> 0.097, "q_window_rank" -> 0.308, "serve_streamed" -> 0.111, "store_delete" -> 0.557, "text_bm25" -> 0.247, "text_bm25_query" -> 0.33, "text_boilerplate" -> 0.118, "text_bpe_compression" -> 0.817, "text_bpe_tokens" -> 0.792, "text_bpe_tokens_artifact" -> 0.58, "text_bpe_train" -> 0.632, "text_chunks" -> 0.21, "text_cluster" -> 0.286, "text_collocations" -> 0.396, "text_dsir" -> 0.427, "text_fingerprint" -> 0.099, "text_gopher" -> 0.1, "text_heavy_hitters" -> 0.418, "text_html_extract" -> 0.107, "text_keywords" -> 0.624, "text_langid" -> 0.116, "text_line_dedup" -> 0.123, "text_lm_score" -> 0.299, "text_mixture" -> 0.21, "text_pack" -> 0.463, "text_phrase_indexed" -> 0.226, "text_phrase_search" -> 0.277, "text_phrase_topics" -> 0.428, "text_pii" -> 0.111, "text_quality" -> 0.121, "text_quality_norm" -> 0.635, "text_rank_eval" -> 0.908, "text_redact" -> 0.1, "text_repetition" -> 0.19, "text_shards" -> 0.137, "text_split" -> 0.161, "text_split_clustered" -> 0.425, "text_stats" -> 0.105, "text_stratified" -> 0.173, "text_token_budget" -> 0.185, "text_token_budget_bpe" -> 0.977, "text_token_budget_sharded" -> 0.198, "text_tokenize_optimal" -> 0.7, "text_url_filter" -> 0.122, "text_vocab" -> 0.163, "text_weighted_sample" -> 0.115, "text_wordpiece_tokens" -> 0.847, "text_wordpiece_tokens_artifact" -> 0.639, "text_wordpiece_vocab" -> 0.275, "vec_drift" -> 0.269, "vec_table" -> 0.229, "vq_checksum" -> 0.137, "warc_read" -> 0.177, "warc_read_v2" -> 0.097, "warc_streamed" -> 0.423)

  /** Floor table for a suite tag ("sf1" / "sf01"); empty for others. */
  def of(tag: String): Map[String, Double] = tag match {
    case "sf1" => sf1
    case "sf01" | "sf01warm" => sf01
    case _ => Map.empty
  }
}
