"""Queries whose plans were restructured in the optimization rounds.

The default pytest run's oracle-parity sweep must always include these
(VERDICT r14 item 2: the driver's verify window re-checks exactly the
touched-but-unsampled queries), plus a deterministic rotating sample of
the rest. The full 406-query sweep runs with SPARK_GRAFT_FULL_PARITY=1
(the builder runs it at least once per round; see OPTIMIZATION_r15.md).
"""

from __future__ import annotations

# r14 optimization round (plans/r14/ stems)
TOUCHED_R14 = {
    "basket_triangle_count", "corpus_dsir_importance",
    "corpus_perplexity_buckets", "crosslingual_margin_pairs",
    "crosslingual_margin_pairs_lsh", "dedup_cluster_connected_components",
    "dedup_embedding_cosine_lsh", "dedup_fuzzy_levenshtein",
    "dedup_minhash_estimate_audit", "dedup_ngram_jaccard_prefix",
    "dedup_survivorship_report", "dq_tukey_fences",
    "graph_pagerank_copurchase", "graph_pagerank_iterations",
    "ml_brier_calibration", "ml_lift_gains_table",
    "ml_mcc_threshold_eval", "ml_naive_bayes_langid",
    "ml_pr_curve_thresholds", "pipeline_dedup_corpus",
    "schema_infer_promotion_census", "scrape_e2e_parse",
    "similarity_ann_frontier_eval", "similarity_ann_recall_eval",
    "similarity_mmr_rerank", "stat_auc_mann_whitney",
    "stat_cliff_delta", "stat_cramer_von_mises",
    "stat_energy_distance", "stat_jonckheere_terpstra",
    "stat_kendall_tau_ordinal", "stat_kruskal_wallis",
    "stat_ks_two_sample", "stat_kuiper_two_sample",
    "stat_lorenz_curve_deciles", "stat_mood_median_test",
    "stat_spearman_corr", "stat_wasserstein_hi_lo",
    "stat_wilcoxon_signed_rank", "text_bigram_surprisal",
    "text_char_entropy", "vector_store_assignment_census",
    "vector_store_compaction_apply", "vector_store_compaction_census",
    "vector_store_incremental_assign", "vector_store_occupancy_psi",
}

# r15 optimization round (plans/r15/ stems; updated as the round adds)
TOUCHED_R15 = {
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_prefix",
    "dedup_incremental_ngram_pairs", "stat_spearman_corr",
    "corpus_shard_manifest", "part_abc_classification",
    "customer_rfm_segments", "text_zipf_fit", "text_zipf_slope",
    "graph_pagerank_copurchase", "graph_pagerank_iterations",
    "similarity_ann_frontier_eval", "similarity_ann_recall_eval",
    "stat_kruskal_wallis", "dq_tukey_fences",
    "vector_store_assignment_census", "vector_store_incremental_assign",
    "vector_store_occupancy_psi", "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh_rowsonly", "dedup_lsh_band_planner",
}

TOUCHED_RECENT = TOUCHED_R14 | TOUCHED_R15

# size of the rotating sample of NOT-recently-touched queries included
# in the default run (the rotation key is the current round number, so
# consecutive rounds cover different subsets; combined with the
# driver's own 50-query rotation, coverage accumulates across rounds)
ROTATING_SAMPLE = 60
