"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
with (usually) a DuckDB-runnable ANSI-SQL oracle string over the same
parquet tables. The driver — and tests/test_oracle.py, which mirrors it —
runs both sides and compares row count, schema, and an order-insensitive
value hash. Column names are aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming, multimodal
decode plumbing) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn
    return deco


# --------------------------------------------------------------------------
# Driver-facing ordering — the single source of truth for the order the
# correctness gate sees (the driver checks queries in iteration order and
# may stop after a budget; round 1 it covered exactly the first 50 of 90,
# leaving the back half dark). Queries are slotted most-scrutiny-first:
# this round's fixed/changed/new queries and the 40 that had no driver row
# in round 1 occupy the front; queries already driver-green in round 1
# follow. load_all() REFUSES to run if a registered query is missing from
# this list (or vice versa), so a new query can never silently land past
# the driver's check window again.
# --------------------------------------------------------------------------
DRIVER_ORDER: list[str] = [
    # === BEGIN GENERATED WINDOW (tools/rotate_window.py) ===
    # Ordered red-latest-row first, then new/zero-evidence, then oldest
    # green evidence; the driver checks slots 1-50. Regenerate after
    # each driver run:  python tools/rotate_window.py
    # churn-pins(r13): incremental_join_maintenance, knn_graph
    # ---- latest green row: rnew/churn ----
    "curation_pipeline_v4",
    "dedup_substring_removal",
    # ---- latest green row: r8 ----
    "incremental_join_maintenance",
    "knn_graph",
    # ---- latest green row: r7 ----
    "streaming_upsert_totals",
    "synthetic_source_rollup",
    "synthetic_stream_rollup",
    "variant_roundtrip_stats",
    "state_store_probe",
    "observed_write_metrics",
    "jsonl_sink_roundtrip",
    "stream_sink_roundtrip",
    "gif_decode_stats",
    "streaming_left_outer_join",
    "png_decode_stats",
    "audio_decode_stats",
    "image_decode_stats",
    "bucketed_join_revenue",
    "salted_event_counts",
    "salted_join_value_by_type",
    "sessionize",
    "session_stats",
    "sessionize_native",
    "kmeans_centroids",
    "longest_streak",
    "range_join_close_events",
    "countmin_user_counts",
    "streaming_sessions",
    "streaming_stream_join",
    "daily_activity_filled",
    "json_flatten",
    "small_quantity_revenue",
    "scd2_customer_balance",
    "user_type_history",
    "pit_order_balance",
    "bloom_semi_join_revenue",
    "bloom_prefilter_stats",
    "histogram_quantiles",
    "incremental_monthly_rollup",
    "assign_shards",
    "interpolate_user_values",
    "array_ops_gauntlet",
    "nullsafe_join_counts",
    "streaming_enriched_counts",
    "rank_fraction_family",
    "weighted_sample",
    "anomalous_days",
    "mixture_sample",
    "dedup_cascade",
    # ---- latest green row: r8 ----
    "bigram_lm_score",
    # ---------------- past the check window ----------------
    "dsir_importance_weights",
    "dedup_exact_substrings",
    "zorder_layout",
    "record_linkage_fs",
    "psi_drift",
    "temperature_mixing",
    "script_mix",
    "event_pmi",
    "triangle_counts",
    "streaming_daily_peak",
    "bm25_search",
    "ks_drift",
    "winsorize_stats",
    "label_propagation",
    "streaming_progress_audit",
    "dedup_prefix_filter",
    "equidepth_histogram",
    "mad_outliers",
    "ewma_user_value",
    "join_size_estimate",
    "curation_pipeline_v3",
    "postings_intersect",
    "phrase_search",
    "postings_compress_stats",
    "wand_bm25_topk",
    "rrf_hybrid_search",
    "heavy_hitters_exact",
    "pareto_frontier",
    "compaction_plan",
    "minmax_prune_plan",
    "ann_pq",
    "deletion_propagation",
    "udtf_run_lengths",
    "ann_ivfpq",
    "bootstrap_ci_revenue",
    "order_cube",
    "sliding_event_counts",
    "moving_avg_value",
    "top_orders",
    "nations_without_suppliers",
    "nations_with_both",
    "all_account_balances",
    "order_rollup",
    "order_grouping_sets",
    "running_total",
    "snapshot_diff_customers",
    # ---- latest green row: r9 ----
    "hll_distinct_users",
    "streaming_heavy_hitters",
    "postings_ef_roundtrip",
    "cohort_ltv",
    "dedup_ngram_containment",
    "rfm_segments",
    "cluster_topics",
    "streaming_sequence_funnel",
    "ab_test_ztest",
    "cusum_changepoint",
    "market_basket_rules",
    "l_diversity_audit",
    "sequence_funnel",
    "contrastive_triplets",
    "nb_quality_classifier",
    "theil_sen_trend",
    "interval_union_days",
    "jpeg_decode_stats",
    "linear_attribution",
    "event_transition_matrix",
    "full_outer_rollup",
    "two_key_join",
    "frame_sample_stats",
    "dedup_canonicalize",
    "mode_per_user",
    "indicator_sums",
    "value_hours_per_user",
    "distinct_purchasers",
    "ever_purchased",
    "recency_filter",
    "per_key_limit",
    "asof_last_click_before_purchase",
    "next_event_gap",
    "funnel_counts",
    "weekly_retention",
    "pivot_event_counts",
    "unpivot_event_counts",
    "value_histogram",
    "value_percentiles_by_type",
    "word_counts",
    "monthly_revenue",
    "approx_distinct_users",
    "shipping_priority",
    "nation_trade_volume",
    "parts_supplier_stats",
    "above_avg_balance_customers",
    "data_quality_checks",
    "order_rank_family",
    "region_status_grid",
    "dedup_exact",
    # ---- latest green row: r10 ----
    "decimal_money_rollup",
    "min_cost_supplier",
    "product_profit_rollup",
    "promotable_part_suppliers",
    "jpeg_lossy_stats",
    "mjpeg_frame_stats",
    "token_pmi",
    "kmv_set_algebra",
    "streaming_dedup_screen",
    "minhash_signatures",
    "dedup_minhash_lsh",
    "simhash_values",
    "dedup_simhash",
    "stratified_sample",
    "train_test_split",
    "normalize_text",
    "multimodal_meta",
    "pricing_summary",
    "earliest_order_per_customer",
    "semi_join_orders",
    "anti_join_customers",
    "map_valued_agg",
    "regex_validity_filter",
    "scalar_gauntlet",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "nations_in_region",
    "sample_10pct",
    "ann_topk",
    "ann_ivf",
    "ann_ivf_multiprobe",
    "ivf_clusters",
    "ivf_clusters_trained",
    "embedding_near_pairs",
    "rhp_signatures",
    "ann_rhp",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_guarded",
    "dedup_clusters",
    "curation_pipeline",
    "pack_sequences",
    "mask_terms",
    "contamination_check",
    "repetition_ratio",
    "tfidf_search",
    "text_stats",
    "revenue_by_nation",
    "price_quantity_corr",
    # ---- latest green row: r11 ----
    "important_part_value",
    "hilbert_layout",
    "schema_drift_union",
    "audio_feature_stats",
    "forget_cascade_audit",
    "link_prediction_aa",
    "shapley_attribution",
    "conformal_value_intervals",
    "ivf_probe_recall_sweep",
    "recursive_category_rollup",
    "lateral_top_balances",
    "session_bounce_stats",
    "acf_daily_revenue",
    "t_closeness_audit",
    "gini_spend",
    "zipf_fit",
    "rater_agreement_kappa",
    "ranking_eval_bm25",
    "lorenz_curve_deciles",
    "prf_expansion_terms",
    "token_chi2_keywords",
    "holt_linear_forecast",
    "dup_cluster_size_stats",
    "source_mix_entropy",
    "tokenizer_fertility_report",
    "embedding_label_outliers",
    "hot_key_skew_report",
    "lang_id_confusion",
    "abc_analysis_parts",
    "roc_auc_per_class",
    "label_centroid_cosine",
    "als_half_step",
    "decile_lift_table",
    "chi2_independence",
    "ols_by_segment",
    "bfs_levels",
    "kcore_peel",
    "streaming_drift_monitor",
    "bpe_merge_step",
    "trailing_hour_value",
    "seasonal_decompose",
    "hierarchy_rollup",
    "apriori_triples",
    "calibration_curve",
    "markov_attribution",
    "logistic_gd_steps",
    "kaplan_meier_retention",
    "stump_split_search",
    "anova_f_segments",
    # ---- latest green row: r12 ----
    "top_event_paths",
    "woe_iv_encoding",
    "textrank_keywords",
    "negative_sampling_table",
    "ann_recall_eval",
    "map_ops_gauntlet",
    "sliding_distinct_users",
    "curation_funnel_audit",
    "boilerplate_ngram_profile",
    "quality_pr_curve",
    "kn_bigram_model",
    "dp_noisy_event_counts",
    "pca_top_component",
    "target_encode_oof",
    "benford_first_digit",
    "csv_sink_roundtrip",
    "column_profile_report",
    "order_priority_checking",
    "forecast_revenue",
    "returned_item_top_customers",
    "priority_line_counts",
    "promo_revenue_pct",
    "top_revenue_suppliers",
    "large_volume_customers",
    "brand_filtered_revenue",
    "customer_order_distribution",
    "sole_late_supplier_blame",
    "idle_balance_customers",
    "national_market_share",
    "streaming_running_totals",
    "pii_scan_docs",
    "pseudonymize_customers",
    "k_anonymize_customers",
    "dedup_semantic",
    "dedup_spans",
    "gopher_quality_filter",
    "unigram_freq_score",
    "fuzzy_match_parts",
    "image_resize_stats",
    "media_embed_fingerprint",
    "curation_pipeline_v2",
    "ann_sq8",
    "dedup_incremental",
    "streaming_hourly_counts",
    "streaming_dedup",
    "kmv_distinct_users",
    "orc_roundtrip_revenue",
    "chunk_documents",
    "schema_evolution_union",
    "supplier_part_pagerank",
    # === END GENERATED WINDOW ===
]

# Bench headline set lives beside the driver order so both gates are
# maintained in one place (bench.py imports this).
BENCH_HEADLINE: list[str] = [
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "nation_trade_volume",
    "earliest_order_per_customer",
    "full_outer_rollup",
    "semi_join_orders",
    "map_valued_agg",
    "mode_per_user",
    "per_key_limit",
    "running_total",
    "recency_filter",
    "asof_last_click_before_purchase",
    "forecast_revenue",
    "returned_item_top_customers",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "ann_topk",
    "ann_ivf",
    "ann_sq8",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "sessionize",
    "longest_streak",
    "stratified_sample",
    "word_counts",
    # Streaming drain time (availableNow to completion): the only perf
    # tracking the streaming family gets, since correctness gates don't
    # time anything.
    "streaming_hourly_counts",
    "streaming_dedup",
    # Round-6 additions: the trained-quantizer semantic dedup (kmeans fit
    # + assign + intra-cluster pair join — the heaviest new pipeline) and
    # the per-source PII scan (the regex-bank scan shape).
    "dedup_semantic",
    "pii_scan_docs",
    # Round-6 late additions: C4 span dedup (chunk -> global MIN ->
    # rebuild, the 3-shuffle exact-substring shape) and the corpus-trained
    # unigram score (explode + vocab agg + token join, the LM-scoring
    # shape). The two cheap scan-shaped newcomers (gopher filter, fuzzy
    # match) are covered by the correctness gate only.
    "dedup_spans",
    "unigram_freq_score",
    # The composed flagship: gopher filter -> span dedup -> unigram
    # scoring on the curated text, one pipeline.
    "curation_pipeline_v2",
    # Round-7 additions: the round-6 families' remaining siblings (blocked
    # fuzzy matching, k-anonymity generalization, eval-contamination
    # screen) and the real-codec multimodal gate, so regressions in the
    # newest operator families show up in the per-round bench record.
    "fuzzy_match_parts",
    "k_anonymize_customers",
    "contamination_check",
    "image_decode_stats",
    # Round-7 late additions: the sliding-window chunker (map-only 1->N
    # explode — the RAG ingestion shape), the partitioned-ORC round-trip
    # (write + read + rollup, the second columnar format), and the
    # fixed-iteration PageRank (join + partial-agg shuffle per iteration,
    # the iterative-algorithm shape).
    "chunk_documents",
    "orc_roundtrip_revenue",
    "supplier_part_pagerank",
    # Spark-4-surface trackers: the VARIANT encode/extract roundtrip
    # (scan-shaped codegen), the single-pass observed write, and the
    # custom-sink roundtrip (staged commit protocol + JSON read-back).
    "variant_roundtrip_stats",
    "observed_write_metrics",
    "jsonl_sink_roundtrip",
    # the newest owned codec (hand-rolled LZW) gets its own perf row
    "gif_decode_stats",
    # the outer stream-stream join: the third streaming state shape
    # (two-sided buffered state + watermark-gated NULL emission)
    "streaming_left_outer_join",
    # Round-8 additions: the two corpus-LM scorers (bigram perplexity =
    # train-on-corpus + score-by-join; DSIR = hashed-unigram importance
    # ratio, broadcast weight table) and the stride-1 exact-substring
    # window dedup (W-times explode + global-MIN + join-back — the
    # heaviest dedup shape per input byte).
    "bigram_lm_score",
    "dsir_importance_weights",
    "dedup_exact_substrings",
    # Round-8 late additions: the LSH kNN-graph (bucket-capped self-join
    # + mutual-edge symmetrization — the graph-construction shape) and
    # incremental join maintenance (three delta joins + combine — the
    # materialized-view shape). The three cheap scan-shaped newcomers
    # (PSI drift, temperature mixing, FS linkage) are covered by the
    # correctness gate only, per the gopher/fuzzy-match precedent.
    "knn_graph",
    "incremental_join_maintenance",
    # the chained window-of-window drain: the fourth streaming state
    # shape (two stacked watermarked aggs, append-mode finalization)
    "streaming_daily_peak",
    # Round-8 second-wave additions: the retrieval stack's pruned and
    # hybrid rankers (bound-and-prune vs the already-tracked brute
    # bm25_search; lexical x vector fusion), the two-pass exact heavy
    # hitters (Arrow MG screen + broadcast-filtered count), the skyline
    # sweep on ranged_cummax, the PQ compressed scan (sibling of the
    # tracked ann_sq8), and the sequential-packing compaction planner.
    "wand_bm25_topk",
    "rrf_hybrid_search",
    "heavy_hitters_exact",
    "pareto_frontier",
    "ann_pq",
    "compaction_plan",
    # the composed production index: partition pruning x code compression
    "ann_ivfpq",
    # Round-9: the sixth owned codec (real Huffman+DCT per doc inside
    # Arrow mapInPandas — replaces the gif-era JPEG stub)
    "jpeg_decode_stats",
    # Round-9 second wave: the portable-register HLL (bounded-key double
    # agg), the stateful CEP funnel drain (applyInPandasWithState buffer
    # + refold), the basket self-join, triple ranged_ntile quintiles,
    # NB train+score, and the trained-quantizer topic labeling (kmeans
    # fit + broadcast argmin + c-TF-IDF window)
    "hll_distinct_users",
    "streaming_sequence_funnel",
    "market_basket_rules",
    "rfm_segments",
    "nb_quality_classifier",
    "cluster_topics",
    # Round-10: the four closing TPC-H shapes (Q2 window-min supplier,
    # Q9 broadcast-dim profit rollup, Q11 integer HAVING-vs-total, Q20
    # nested semi-joins), the JPEG AC-path gate, and the AVI/MJPEG
    # multi-frame demux (1->N frame rows out of Arrow mapInPandas)
    "min_cost_supplier",
    "product_profit_rollup",
    "important_part_value",
    "promotable_part_suppliers",
    "jpeg_lossy_stats",
    "mjpeg_frame_stats",
    # Round-10 second wave: collocation mining (two token passes +
    # broadcast vocab joins) and theta-sketch set algebra (one distinct
    # shuffle + sketch-sized algebra)
    "token_pmi",
    "kmv_set_algebra",
    # Round-11: the rebuilt bounded-state KMV build (kmv_set_algebra above
    # covers the algebra; this tracks the build alone), the Gopher
    # first-fail funnel (scan + 6-row agg), per-source df-threshold
    # boilerplate (gram agg + join-back), and the NB threshold sweep
    # (one scoring pass + 5-key agg)
    "kmv_distinct_users",
    "curation_funnel_audit",
    "boilerplate_ngram_profile",
    "quality_pr_curve",
    # Round-11 second wave: the KenLM counts pass (one corpus shuffle +
    # three model-sized derived aggregations)
    "kn_bigram_model",
    # Round-11 third wave: matrix-free PCA fit (two model-sized collects +
    # driver-exact quantized power iteration)
    "pca_top_component",
    # Round-11 fourth wave — the model-eval and iterative-graph family:
    # rank-free AUC (score-level U statistic on ranged_cumsum), the
    # 64-way posexplode centroid matrix, the ALS normal-equation shuffle,
    # three k-core peel rounds (per-round double semi-gate + degree agg),
    # one BPE merge round (corpus pass -> vocab-sized pair mining), the
    # 7x-explode rolling-reach distinct count, and the foreachBatch
    # mergeable-histogram drift monitor (streaming family's 5th shape)
    "roc_auc_per_class",
    "label_centroid_cosine",
    "als_half_step",
    "kcore_peel",
    "bpe_merge_step",
    "sliding_distinct_users",
    "streaming_drift_monitor",
    # Round-11 fifth wave: the pruned A-priori triple mine (basket
    # explode + three L2 semi-gates before the heaviest agg), TextRank
    # (iterative PageRank over the word graph — the 6th iterative-graph
    # drain), and the Markov attribution fit (one journey sort shuffle +
    # four driver-exact chains)
    "apriori_triples",
    "textrank_keywords",
    "markov_attribution",
    # Round-11 seventh wave: the two ranged-rank shapes (Zipf fit =
    # vocab agg + distributed per-lang rank; Gini = per-customer agg +
    # distributed global rank) and the retrieval eval (BM25 postings
    # pipeline + TakeOrdered cut + metric arithmetic). The scan-shaped
    # newcomers (kappa, t-closeness, bounce, ACF) ride the correctness
    # gate only, per the gopher/fuzzy-match precedent.
    "zipf_fit",
    "gini_spend",
    "ranking_eval_bm25",
    # Round-11 eighth wave: PRF expansion (two-pass retrieval — BM25 cut
    # then candidate-vocab df mining), the chi-square keyword screen
    # (presence distinct + doc-keyed label join), and the Lorenz deciles
    # (ranged_ntile + 10-row windows).
    "prf_expansion_terms",
    "token_chi2_keywords",
    "lorenz_curve_deciles",
    # Round-11 late wave (post driver restart): the Hilbert planner (the
    # rotate-reflect projection's codegen cost vs Morton's), the stack()
    # column profiler (distinct-expansion shuffle), the sampled-wedge
    # link predictor (the wave's one data-scaled heavy), exact Shapley
    # attribution, the erasure cascade, and the WAV DSP features (Arrow
    # stage cost). schema_drift_union rides the correctness gate only
    # (a two-scan union + 2-group agg adds no new plan shape).
    "hilbert_layout",
    "column_profile_report",
    "link_prediction_aa",
    "shapley_attribution",
    "forget_cascade_audit",
    "audio_feature_stats",
    "conformal_value_intervals",
    "ivf_probe_recall_sweep",
    # Round-13: the full multimodal+text+pack composition — four member
    # plans, three gate joins, and the survivor pack window in one
    # lineage; the bench prices the composition overhead the members
    # don't see individually.
    "curation_pipeline_v4",
    # Round-13: the Lee-et-al substring-removal rewrite — the heaviest
    # per-input-byte dedup transform (window explode + coverage explode
    # + doc-keyed rebuild), priced separately from the profile query.
    "dedup_substring_removal",
]


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY) and return
    the registry in DRIVER_ORDER. Raises if the order list and the
    registry ever drift apart — the hygiene gate for the check window."""
    from cliqz_etl_spark.queries import (  # noqa: F401
        advanced,
        analytics,
        cdc,
        curation,
        dedup,
        llmdata,
        mleval,
        multimodal,
        privacy,
        relational,
        retrieval,
        sessions,
        similarity,
        streamq,
        textops,
        timeseries,
        warehouse,
    )
    missing = [n for n in DRIVER_ORDER if n not in REGISTRY]
    unlisted = [n for n in REGISTRY if n not in DRIVER_ORDER]
    from collections import Counter
    dupes = [n for n, c in Counter(DRIVER_ORDER).items() if c > 1]
    if missing or unlisted or dupes:
        raise ValueError(
            f"query registry / DRIVER_ORDER drift: missing={missing} "
            f"unlisted={unlisted} dupes={dupes} — every registered query "
            f"must occupy exactly one slot in DRIVER_ORDER (a duplicate "
            f"makes later slots shadow the window the gates check)")
    return {n: REGISTRY[n] for n in DRIVER_ORDER}
