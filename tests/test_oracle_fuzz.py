"""Oracle fuzzing: random small documents corpora — NULLs, empties,
whitespace, unicode, boilerplate clones, single-word docs — through a
set of text/dedup gate queries, compared against their OWN oracle SQL
over the same rows. The driver corpus is clean ASCII; every latent
cross-engine divergence found this round (size(NULL)=-1, the lang-id
tie-break fallthrough, NULL-doc jaccard-1.0 pairs) lived exactly in the
inputs this fuzz generates."""

from __future__ import annotations

import os
import tempfile

import duckdb
from hypothesis import given, settings, strategies as st

from cliqz_etl_spark.queries import load_all
from tests.oracle_harness import _hash_rows

_REGISTRY = load_all()

# Queries whose inputs are only the documents table and whose semantics
# should hold on ANY corpus (model-training ANN ops excluded: they
# legitimately raise on degenerate corpora).
_FUZZED = [
    "text_stats", "lang_id", "text_quality", "gopher_quality_filter",
    "array_ops_gauntlet", "word_counts", "doc_fingerprint",
    "dedup_exact", "dedup_spans", "unigram_freq_score",
    "normalize_text", "repetition_ratio",
    # second wave: hash-deterministic samplers, curation set, banded dedup
    "stratified_sample", "train_test_split", "sample_10pct",
    "weighted_sample", "mixture_sample", "contamination_check",
    "mask_terms", "pack_sequences", "tfidf_search", "minhash_signatures",
    "simhash_values", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_canonicalize",
    "curation_pipeline", "curation_pipeline_v2", "assign_shards",
    "pii_scan_docs",
    # third wave: the multimodal plumbing family — previously the only
    # documents-only queries outside the fuzz, which let the NULL-blob
    # ok=false contract drift from the oracles unguarded (round-7 fix)
    "multimodal_meta", "frame_sample_stats", "image_resize_stats",
    "media_embed_fingerprint", "image_decode_stats", "audio_decode_stats",
    "png_decode_stats", "gif_decode_stats",
    # round-11: WAV DSP features (doc_id-derived synth stream; the ZCR
    # >=0 sign convention and lag-window NULL exclusion must agree)
    "audio_feature_stats",
    # fifth wave: the dedup composites (cascade = LSH->exact-Jaccard
    # verify; incremental = batch-vs-corpus band join; guarded = the
    # doc-frequency skew cutoff) — documents-only, previously unfuzzed
    "dedup_cascade", "dedup_incremental", "dedup_ngram_jaccard_guarded",
    # round-7 addition: overlapping sliding-window chunking
    "chunk_documents",
    # round-8: bigram reference-LM perplexity bucketing (empty/degenerate
    # train slices, unicode tokens, and the quantized-ln boundary)
    "bigram_lm_score",
    # round-8: hashed-unigram DSIR importance weights (target slice may
    # be empty on tiny corpora; quantized-ln boundary)
    "dsir_importance_weights",
    # round-8: stride-1 exact-substring window dedup (short docs below
    # W, within-doc repeats, clone pair)
    "dedup_exact_substrings",
    # round-13: the removal/rewrite pass over the same window frame —
    # coverage union across overlapping duplicate windows, run-boundary
    # lag, and the character-exact rebuilt length must agree on clone
    # pairs, within-doc repeats, and docs below W
    "dedup_substring_removal",
    # round-8: temperature-scaled language mixing (single-lang corpora,
    # pow/quantize boundary, tiny n_docs)
    "temperature_mixing",
    # round-8: unicode-script histogram — the length-parity gauntlet
    # (CJK, emoji, NULL/empty text, mixed-script ties)
    "script_mix",
    # round-8: BM25 (integer-exact rational k1/b; zero-match corpora,
    # single-doc corpora where dl == avgdl exactly)
    "bm25_search",
    # round-8: the composed v3 selection (script routing x dup screen x
    # DSIR weights must intersect identically on any corpus — the
    # composition joins are what this wave exercises; members are
    # fuzzed standalone above)
    "curation_pipeline_v3",
    # round-13: the v4 composition (media budget x gopher x decontam x
    # span-dedup transform x survivor packing) — the gates must select
    # identical survivor sets and the pack window must replay over
    # text_kept identically on any corpus; members are fuzzed standalone
    "curation_pipeline_v4",
    # round-8: prefix-filtered exact all-pairs Jaccard — the clone pair
    # must always surface (jac=1.0); single-token docs have prefix = the
    # whole set; the no-false-negative guarantee under adversarial text
    "dedup_prefix_filter",
    # custom-sink roundtrip — unicode + NULL text must survive the JSON
    # hop through the staged-commit jsonl_shards writer
    "jsonl_sink_roundtrip",
    # round-8 retrieval family: conjunctive AND on zero-match corpora,
    # the sequence(1, n<1) descending-range trap in phrase matching,
    # bin()-based gap coding on unicode vocab, WAND's prune-vs-brute
    # equality when every doc ties, and the MG screen on corpora where
    # everything (or nothing) is heavy
    "postings_intersect", "phrase_search", "postings_compress_stats",
    "wand_bm25_topk", "heavy_hitters_exact",
    # round-9: NB quality classifier (empty/degenerate train slices, NULL
    # text -> prior-only score, quantized-ln boundary) and the baseline-
    # JPEG codec (doc_id-derived dims; per-block-constant exact roundtrip)
    "nb_quality_classifier", "jpeg_decode_stats",
    # round-9: asymmetric containment near-dup (clone pairs, short-in-long
    # embedding, min-denominator ties)
    "dedup_ngram_containment",
    # round-9: real Elias-Fano roundtrip (singleton lists, dense 0..n
    # ranges where l=0, blank-only corpora -> empty result)
    "postings_ef_roundtrip",
    # round-10: the JPEG AC-path bounded-error gate and the AVI/MJPEG
    # multi-frame demux (doc_id-derived dims/frame counts; per-frame
    # DC-exact checksums) — documents-only like jpeg_decode_stats
    "jpeg_lossy_stats", "mjpeg_frame_stats",
    # round-10: adjacent-pair PMI (support >= 3 rarely met on tiny
    # corpora -> empty result both sides; NULL/blank text filters
    # identically; the ln() runs on one identical IEEE double)
    "token_pmi",
    # round-11: first-fail funnel (NULL metrics -> coalesce(rule, FALSE)
    # attributes to the first stage on BOTH engines), df-threshold
    # boilerplate (NULL/blank/short docs filter identically; single-source
    # fuzz corpora maximize df), and the NB threshold sweep (rides the
    # nb_quality_classifier pipeline already fuzzed above)
    "curation_funnel_audit", "boilerplate_ngram_profile",
    "quality_pr_curve",
    # round-12 audit sweep: the reliability diagram rides the same NB
    # scoring pipeline as quality_pr_curve; fixed score bins must absorb
    # degenerate corpora (all one class, empty train slices) identically
    "calibration_curve",
    # round-11 second wave: KN bigram model build (support >= 3 rarely
    # met on tiny corpora -> empty both sides; the interpolated
    # probability is one shared IEEE expression tree)
    "kn_bigram_model",
    # round-11 fourth wave: one BPE merge round (empty ascii vocab ->
    # NULL argmax row on the Spark side and zero top rows on DuckDB's,
    # both collapsing to an empty pair table; unicode words filtered by
    # the ^[a-z]+$ gate identically; consecutive-pair merge via the
    # doubled-space replace must agree left-to-right)
    "bpe_merge_step",
    # round-11: TextRank (empty supported-pair graphs yield empty top-k
    # on both engines; the md5 word ids and the floor-division PageRank
    # recurrence replay exactly) and the unigram^0.75 negatives table
    # (min-count rarely met on tiny corpora -> empty both sides)
    "textrank_keywords", "negative_sampling_table",
    # round-11 seventh wave: the Zipf fit (degenerate heads — under 3
    # words or zero variance — excluded on both engines; ranked via the
    # ranged rank, exact on any partitioning), the rater-agreement kappa
    # (NULL-text verdicts coalesce to reject; constant raters hit the
    # pe = N^2 guard and yield NULL kappa identically), and the BM25
    # ranking eval (no relevant docs -> NULL NDCG; empty top-10 overlap
    # -> zero MRR/DCG on both engines)
    "zipf_fit", "rater_agreement_kappa", "ranking_eval_bm25",
    # round-11 eighth wave: PRF expansion (empty/degenerate corpora give
    # an empty pseudo-relevant set -> empty candidates; the RSJ guard
    # drops non-positive smoothed numerators identically) and the token
    # chi-square screen (single-class corpora -> empty by the P/F guard;
    # support floor rarely met on tiny corpora -> empty both sides)
    "prf_expansion_terms", "token_chi2_keywords",
    # round-11 ninth wave: the cluster-size histogram (no qualifying
    # near-dup pair -> empty histogram on both engines; the planted
    # clone pair always clusters) and the mix-entropy report (NULL
    # source/lang are real cells; single-cell corpora report exactly 0)
    "dup_cluster_size_stats", "source_mix_entropy",
    # round-11 tenth wave: tokenizer fertility (NULL-text counts are
    # NULL and SUM-ignored identically; an all-blank language reports
    # NULL fertility, not 0; NULL lang is a real group)
    "tokenizer_fertility_report",
    # round-11 eleventh wave: the lang_id confusion matrix (wraps
    # lang_id's oracle verbatim; NULL predicted/labeled langs are real
    # cells, class totals join null-SAFELY on both engines)
    "lang_id_confusion",
]

_WORD = st.one_of(
    st.sampled_from(["the", "a", "of", "and", "to", "ok", "##", "!!",
                     "naïve", "日本", "😀", "x1", "yy"]),
    st.text(alphabet="abcde", min_size=1, max_size=6),
)
_TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.lists(_WORD, min_size=0, max_size=25).map(lambda ws: " ".join(ws)),
)


@settings(max_examples=3, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=14), st.randoms())
def test_text_queries_match_oracles_on_random_corpora(spark, texts, rnd):
    from cliqz_etl_spark.operators.cache import release_all

    # plant a clone pair so dedup paths always have work
    if len(texts) >= 2 and texts[0]:
        texts[-1] = texts[0]
    rows = [(i, t, rnd.choice(["en", "de", "fr", "es"]), "fuzz",
             len(t) if t else 0) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    tmp = tempfile.mkdtemp(prefix="fuzzdocs_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        for name in _FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (name, len(g_rows), len(d_rows),
                                                sorted(g_rows)[:5], sorted(d_rows)[:5])
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, texts, sorted(g_rows)[:6], sorted(d_rows)[:6])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


_VEC = st.one_of(
    st.none(),
    st.just([0.0] * 64),                                  # quantized-zero
    st.just([0.0002] * 64),                               # sub-epsilon
    st.lists(st.floats(-1, 1, allow_nan=False), min_size=3, max_size=5),  # ragged
    st.just([float("nan")] + [0.5] * 63),
    st.just([float("inf")] + [0.5] * 63),
    st.just([401.0] + [0.5] * 63),                        # out of envelope
    st.lists(st.floats(-1, 1, allow_nan=False, width=32),
             min_size=64, max_size=64),                   # valid
)

_EMB_FUZZED = [
    "ann_topk", "rhp_signatures", "embedding_near_pairs",
    # fourth wave: the full ANN/model family. The ValueError arm below
    # covers the degenerate-corpus raise these were originally excluded
    # for; the id scheme makes the strided roles non-trivial.
    "ivf_clusters", "ann_ivf", "ann_ivf_multiprobe", "ann_sq8", "ann_rhp",
    "kmeans_centroids", "ivf_clusters_trained", "dedup_semantic",
    # round-8: LSH kNN-graph (degenerate all-identical buckets hit the
    # fan-in cap; mutual-edge marking under ties)
    "knn_graph",
    # round-8: product quantization — codeword argmin ties must break to
    # the smallest cid on both engines; the no-valid-codebook corpus
    # exercises the ValueError arm; subspace slicing on adversarial ints
    "ann_pq",
    # round-8: the composed IVFPQ — residual arithmetic on adversarial
    # ints, probe masks under centroid ties, and BOTH ValueError arms
    # (no coarse rows / no codebook rows)
    "ann_ivfpq",
    # round-9: triplet mining (corpora with < 2 valid vectors must yield
    # no triple; hash-picked negative under adversarial ids)
    "contrastive_triplets",
    # round-11: rank-free AUC (NULL/NaN/out-of-envelope first components
    # drop identically; single-label corpora divide by zero -> NULL
    # auc_micro on both engines) and the centroid cosine matrix
    # (vector-level validity gate; zero-norm centroids filtered)
    "roc_auc_per_class", "label_centroid_cosine",
    # round-11 tenth wave: the own-centroid label-noise screen (same
    # vector-level validity gate; zero-norm vectors AND zero-norm
    # centroids excluded identically via the integer norm guards)
    "embedding_label_outliers",
    # round-11: the probe-count recall curve (rides ann_ivf/multiprobe's
    # fuzz exposure: centroid/query strides on adversarial ids, the
    # degenerate-corpus ValueError arm, and division by a zero truth
    # count cannot occur — empty truth means empty queries on both sides)
    "ivf_probe_recall_sweep",
    # round-12: the two-index recall eval (IVF + banded RHP vs one truth
    # pass) — rides the same ValueError arm as ann_ivf (IVF quantizer
    # training on a degenerate corpus) and the same division-safety
    # argument as the probe sweep; the RHP side has no model to train,
    # so its recall rows exist whenever truth rows do
    "ann_recall_eval",
    # round-12 audit sweep: the matrix-free PCA fit was the one
    # embeddings-only query outside the fuzz — degenerate corpora hit
    # the training ValueError arm (no valid vectors -> no component),
    # and the quantized power iteration must agree with the MATERIALIZED
    # CTE replay on adversarial (ragged/NaN/zero-norm) vectors
    "pca_top_component",
]

# Row i gets _EMB_IDS[i], not i: sequential ids give a <=18-row corpus
# exactly ONE centroid (vec_id % 100 == 0 -> {0}) and one query
# (% 97 == 0 -> {0}), so the strided-role queries would never see a
# multi-centroid argmin or a multi-query ranking under fuzz. The pattern
# interleaves centroid ids (x100), query ids (x97), plain ids, and 0
# (both roles at once), and any slot can host any adversarial vector.
_EMB_IDS = [0, 1, 100, 97, 2, 200, 194, 3, 300, 291,
            4, 400, 388, 5, 500, 485, 6, 600]


@settings(max_examples=3, deadline=None)
@given(st.lists(_VEC, min_size=6, max_size=14))
def test_embedding_queries_match_oracles_on_adversarial_vectors(spark, vecs):
    """NULL / ragged / NaN / Inf / out-of-envelope / quantized-zero
    vectors through the embedding gate queries vs their own oracle SQL:
    the valid_quantized filter and its DuckDB twin must drop the SAME
    rows, or scores appear on one side only."""
    from cliqz_etl_spark.operators.cache import release_all

    # guarantee a few valid vectors so top-k queries have real work
    vecs = list(vecs) + [[0.1 * ((i + j) % 7 - 3) for j in range(64)]
                         for i in range(4)]
    rows = [(_EMB_IDS[i], v, i % 3) for i, v in enumerate(vecs)]
    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long")
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding DOUBLE[], label BIGINT)")
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    tmp = tempfile.mkdtemp(prefix="fuzzvecs_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        for name in _EMB_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            except ValueError:
                # degenerate model (no valid centroid rows): the operator
                # raises its loud model error; the oracle's centroid CTE is
                # empty, so it must agree the answer is "nothing"
                assert not con.execute(q.oracle).fetchall(), name
                continue
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (name, len(g_rows), len(d_rows))
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows)[:5], sorted(d_rows)[:5])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


_EV_FUZZED = [
    "mode_per_user", "value_histogram", "value_percentiles_by_type",
    "indicator_sums", "distinct_purchasers", "ever_purchased",
    "funnel_counts", "weekly_retention", "sessionize", "next_event_gap",
    "running_total", "pivot_event_counts", "unpivot_event_counts",
    "event_transition_matrix", "longest_streak",
    # second wave: the ts-window-heavy rest of the events-only registry
    "asof_last_click_before_purchase", "sliding_event_counts",
    "moving_avg_value", "anomalous_days", "daily_activity_filled",
    "interpolate_user_values", "linear_attribution", "salted_event_counts",
    "countmin_user_counts", "kmv_distinct_users", "histogram_quantiles",
    "range_join_close_events", "incremental_monthly_rollup",
    "sessionize_native", "session_stats", "two_key_join",
    "full_outer_rollup", "salted_join_value_by_type",
    "value_hours_per_user", "recency_filter",
    # third wave: CDC history building (ASC ts windows) + JSON flattening
    "user_type_history", "json_flatten",
    # fourth wave: the HLL gate — its within-5%-of-exact flag must stay
    # TRUE on adversarial corpora too (sparse encoding is exact at these
    # cardinalities; NULL user_ids are ignored by both engines' distinct)
    "approx_distinct_users",
    # round-7: VARIANT encode->decode roundtrip — to_json drops NULL
    # fields and try_variant_get must surface them back as NULL
    "variant_roundtrip_stats",
    # round-8: user-level event-type PMI (NULL users/types drop on both
    # sides; single-type corpora produce an empty pair frame)
    "event_pmi",
    # round-8: MAD outlier screen (lower-middle median rule under ties,
    # MAD = 0 groups where every value equals the median)
    "mad_outliers",
    # round-8: integer EWMA fold (negative values exercise the
    # double-floor step where div/// semantics diverge; duplicate
    # timestamps pin the struct-sort tie-break)
    "ewma_user_value",
    # round-8: the partitioned-ORDER BY Arrow UDTF vs the gaps-and-
    # islands oracle — NULL users/ts/types filter identically, and the
    # per-partition state machine must match the double-row_number
    # identity on any event soup
    "udtf_run_lengths",
    # round-9: portable-register HyperLogLog (NULL user_ids ignored, NULL
    # event_type is a real group, linear-counting fallback on tiny groups)
    "hll_distinct_users",
    # round-9: strict state-machine funnel (ties at equal ts, NULL ts,
    # repeat steps; fold order must equal the min-chain semantics)
    "sequence_funnel",
    # round-9: hash-split A/B z-test (empty variants, all/none converted
    # -> NULL z on both engines; md5 split under adversarial user ids)
    "ab_test_ztest",
    # round-9: streaming MG heavy-hitter screen (tiny corpora where the
    # threshold passes everyone / no one; NULL users excluded both sides)
    "streaming_heavy_hitters",
    # round-10: KMV/theta set algebra (below-K exact fallback is the only
    # branch tiny corpora reach; NULL users filtered on both sides — the
    # engines sort NULL hashes to opposite ends; empty click/purchase
    # corpora collapse to zero rows through the empty-theta cross join)
    "kmv_set_algebra",
    # round-11: rebuilt bounded-state KMV build (NULL users filtered both
    # sides — fuzz-pinned this round; NULL event_type is still a group,
    # surviving via the null-safe sketch-exact join) and the seeded-
    # Laplace DP release (NULL event_type group -> NULL noise on both
    # engines; ln() runs on one identical IEEE double)
    "kmv_distinct_users", "dp_noisy_event_counts",
    # round-11: Benford audit (NULL types/values excluded both sides;
    # negative/zero cents filtered; digits with zero observations ride
    # the spine; the chi-square term is one shared IEEE tree)
    "benford_first_digit",
    # round-11 fourth wave: decile lift (zero-responder corpora -> NULL
    # lift on both engines; NULL-value events contribute score 0; exact
    # NTILE under n < 10), the chi-square contingency audit (weekday =
    # days-since-Monday mod 7, never engine dow(); NULL types/ts drop),
    # and the 7-day rolling reach (NULL user/ts drop; explode-vs-BETWEEN
    # expansion must agree day-for-day)
    "decile_lift_table", "chi2_independence", "sliding_distinct_users",
    # round-11: Markov removal-effect attribution (journeys truncate at
    # the FIRST purchase on both engines; no-purchase corpora give
    # base=0 -> NULL effect; the four quantized chains replay exactly
    # through the generated CTEs on any event soup)
    "markov_attribution",
    # round-11: the RANGE-frame trailing sum (NULL values sum as 0 via
    # the shared CASE; tied timestamps are a SET under a RANGE frame —
    # integer cents keep the accumulation order-free) and the KM curve
    # (single-day corpora; all-censored corpora hold surv at 1e6; the
    # recursive fold must equal the driver fold row-for-row)
    "trailing_hour_value", "kaplan_meier_retention",
    # round-11: 3-step path mining (journeys under 3 events contribute
    # nothing on both engines; rank ties break on the path triple)
    "top_event_paths",
    # round-11: the MapType gauntlet vs its map-free relational oracle
    # (entry arrays SORT before map_from_entries — collect_list order is
    # partition-arbitrary; absent 'click' keys read NULL; empty filtered
    # key lists are NULL, not '')
    "map_ops_gauntlet",
    # round-11 seventh wave: bounce-rate by session entry type (a NULL-
    # typed entry event groups under the NULL key; single-event sessions
    # bounce at exactly 1000 permille; NULL-ts events never open a
    # session on either engine)
    "session_bounce_stats",
    # round-11: exact 3-channel Shapley attribution (empty coalition
    # cells default v=0 on both engines; NULL users dropped; the one
    # micro-quantized division is a shared IEEE expression)
    "shapley_attribution",
    # round-11: split-conformal intervals (tiny types: ceil(0.9(n+1)) >
    # n_cal yields NULL q_hat and NULL coverage on BOTH engines; types
    # whose rows all land in the calibration slice drop via the inner
    # train/test joins identically; integer mean/nonconformity/ppm)
    "conformal_value_intervals",
]


_TS = st.one_of(
    st.none(),
    st.integers(0, 90 * 86_400).map(
        lambda s: __import__("datetime").datetime(2024, 1, 1)
        + __import__("datetime").timedelta(seconds=s)),
)
_EVENT = st.tuples(
    # NULL user_ids included (round-9: the sequence_funnel NULL-user
    # divergence was invisible while this strategy never generated one)
    st.one_of(st.none(), st.integers(0, 5)),               # user_id
    _TS,
    st.one_of(st.none(),
              st.sampled_from(["click", "view", "purchase", "signup"])),
    st.one_of(st.none(), st.floats(-50, 150, allow_nan=False)),
)


@settings(max_examples=3, deadline=None)
@given(st.lists(_EVENT, min_size=3, max_size=25))
def test_event_queries_match_oracles_on_adversarial_events(spark, evs):
    """NULL timestamps / types / values and duplicate instants through the
    events gate queries vs their own oracle SQL. The known engine trap:
    ascending sorts put NULLs FIRST in Spark and LAST in DuckDB, so any
    window or percentile whose oracle doesn't pin NULL placement diverges
    the moment a NULL ts/value exists."""
    from cliqz_etl_spark.operators.cache import release_all

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, ts, uid, et, v, '{"k": 1}')
            for i, (uid, ts, et, v) in enumerate(evs)]
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    tmp = tempfile.mkdtemp(prefix="fuzzev_")
    try:
        # single FILE, native timestamp[us] — the driver testdata layout
        # (tables.load_table footer-probes the file, a directory fails)
        table = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        })
        pq.write_table(table, f"{tmp}/events.parquet")
        for name in _EV_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (
                name, len(g_rows), len(d_rows),
                sorted(g_rows, key=str)[:4], sorted(d_rows, key=str)[:4])
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows, key=str)[:5], sorted(d_rows, key=str)[:5])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


_WH_FUZZED = [
    "order_rank_family", "top_orders", "customer_order_distribution",
    "above_avg_balance_customers", "idle_balance_customers",
    "snapshot_diff_customers", "all_account_balances", "order_cube",
    "order_rollup", "order_grouping_sets", "monthly_revenue",
    "earliest_order_per_customer", "anti_join_customers",
    "semi_join_orders", "rank_fraction_family", "price_quantity_corr",
    "pricing_summary",
    # second wave (round 7): the CDC/SCD2 family (argmax merge + interval
    # join over NULL-able dates/balances) and the bloom prefilter pair —
    # previously the only orders/customer-driven queries outside the fuzz
    "scd2_customer_balance", "pit_order_balance",
    "bloom_semi_join_revenue", "bloom_prefilter_stats",
    # round-8: z-order layout planner (all-NULL date corpus -> empty
    # bounds row; single-date corpus -> zero-width quantization)
    "zorder_layout",
    # round-11: Hilbert planner (same degenerate-bounds exposure as
    # zorder; the rotate-reflect chain must stay non-negative), the
    # stack() column profile (NULL-heavy columns shift n_null/n_distinct
    # and the lexicographic min/max), and the vintage union (NULL dates
    # drop from BOTH vintages; NULL prices land in n_null_price)
    "hilbert_layout", "column_profile_report", "schema_drift_union",
    # round-11: the recursive-CTE rollup (NULL custkeys drop at the
    # anchor; negative keys terminate via truncating div on both
    # engines; all-NULL-balance categories report NULL sums) and the
    # LATERAL top-N (NULL segments/balances filter identically; the
    # custkey tiebreak keeps the LIMIT cut unique under fuzz ties)
    "recursive_category_rollup", "lateral_top_balances",
    # round-8: FS record linkage (NULL balances/names, constant fields ->
    # u=1 smoothing arm, empty blocks), PSI drift (empty slices, all-one-
    # bucket corpora), and incremental join maintenance (NULL dates land
    # in the old slice; the identity must hold under every split)
    "record_linkage_fs", "psi_drift", "incremental_join_maintenance",
    # round-8: exact KS drift (empty slices -> NULL d_ppm; tied prices
    # across slices) and rank-based winsorization (tiny n where the 5%
    # and 95% cuts coincide; all-equal values)
    "ks_drift", "winsorize_stats",
    # round-8: equi-depth histogram (tie splitting must stay aggregate-
    # deterministic; n < B corpora leave empty bucket ids unemitted)
    "equidepth_histogram",
    # round-9: interval sweep-line union (NULL dates/custkeys filtered,
    # duplicate order dates tie inside one island) and Theil-Sen trend
    # (single-month corpora -> zero pairs -> NULL slope on both engines)
    "interval_union_days", "theil_sen_trend",
    # round-9: l-diversity audit (NULL quasi keys form real cells; NULL
    # balance bands count as one distinct sensitive value on both engines)
    "l_diversity_audit",
    # round-9: CUSUM changepoint (single-day corpora -> zero deviations;
    # NULL dates/prices filtered; argmax tie -> earliest day)
    "cusum_changepoint",
    # round-9: RFM quintiles (ranged_ntile on tiny/NULL-heavy corpora —
    # every N % 5 remainder case; segment CASE chain tie semantics)
    "rfm_segments",
    # round-9: cohort LTV (NULL dates/customers filtered; single-cohort
    # and single-month corpora; per-customer division quantization)
    "cohort_ltv",
    # round-11: out-of-fold target encoding (NULL segments drop through
    # the inner joins identically; NULL prices skip the sum but count in
    # n on both engines; single-fold categories encode NULL via the
    # CASE guard)
    "target_encode_oof",
    # round-11: CSV sink round trip (NULL statuses/prices/dates must
    # survive the sentinel hop; the rollup equals direct aggregation)
    "csv_sink_roundtrip",
    # round-11 seventh wave: daily-revenue ACF (NULL dates/prices drop at
    # scan; sub-8-day spans leave lags unpaired -> absent rows on both
    # engines), the Gini rank statistic (ties rank by custkey; the
    # all-equal-spend corpus yields exactly 0), and the t-closeness TVD
    # (NULL balances excluded from the distribution; NULL quasi keys drop
    # through the equi-joins identically)
    "acf_daily_revenue", "gini_spend", "t_closeness_audit",
    # round-11 eighth wave: the Lorenz deciles (exact NTILE remainder
    # rule under n < 10; ties rank by custkey; all-NULL-price corpora
    # leave an empty spend frame on both engines)
    "lorenz_curve_deciles",
    # round-11 ninth wave: the Holt fold (under-2-month corpora ->
    # empty result via the seed join on both engines; the driver fold
    # TRUNCATES like DuckDB's integer //, pinned by the negative-trend
    # fuzz cases)
    "holt_linear_forecast",
    # round-11 eleventh wave: ABC classification (all-NULL-price corpora
    # -> empty via the t > 0 guard; descending ties rank by part key;
    # the fuzz lineitem's fixed prices exercise the all-equal case where
    # every row lands in one cumulative class boundary order)
    "abc_analysis_parts",
]

_MAYBE_STATUS = st.one_of(st.none(), st.sampled_from(["O", "F", "P"]))
_MAYBE_PRICE = st.one_of(st.none(), st.floats(1, 1000, allow_nan=False))
_MAYBE_DATE = st.one_of(
    st.none(),
    # span reaches 1999+ so the SCD2 family's update branch (orders >=
    # 1999-01-01 restate balances) gets real work, not an empty changelog
    st.integers(0, 1500).map(
        lambda d: __import__("datetime").datetime(1996, 1, 1)
        + __import__("datetime").timedelta(days=d)))


@settings(max_examples=2, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), _MAYBE_STATUS, _MAYBE_PRICE,
                       _MAYBE_DATE, st.one_of(st.none(), st.just("1-URGENT"))),
             min_size=2, max_size=15),
    st.lists(st.tuples(st.one_of(st.none(), st.floats(-999, 9999, allow_nan=False)),
                       st.one_of(st.none(), st.sampled_from(["BUILDING", "AUTOMOBILE"]))),
             min_size=2, max_size=6),
)
def test_warehouse_queries_match_oracles_on_nullable_columns(spark, orows, crows):
    """TPC-H analogue queries over NULL-able status/price/date/balance
    columns vs their own oracle SQL — the windowed ranks and grouped
    aggregates must treat NULL keys/measures identically per engine."""
    from cliqz_etl_spark.operators.cache import release_all

    orders = [(i, i % len(crows), s, p, d, pr)
              for i, (ck, s, p, d, pr) in enumerate(orows)]
    cust = [(i, f"Customer#{i}", i % 3, b, m)
            for i, (b, m) in enumerate(crows)]
    line = [(i, 1, 1, 1, 5.0, (p or 10.0), 0.05, 0.02, "N", "O", d)
            for i, (ck, s, p, d, pr) in enumerate(orows)]
    sup = [(1, "Supplier#1", 0, 100.0)]
    nat = [(i, f"NATION{i}", i % 2) for i in range(3)]
    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
                "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    con.executemany("INSERT INTO orders VALUES (?,?,?,?,?,?)", orders)
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, "
                "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO customer VALUES (?,?,?,?,?)", cust)
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT, "
                "l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
                "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
                "l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)")
    con.executemany("INSERT INTO lineitem VALUES (?,?,?,?,?,?,?,?,?,?,?)", line)
    con.execute("CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR, "
                "s_nationkey INTEGER, s_acctbal DOUBLE)")
    con.executemany("INSERT INTO supplier VALUES (?,?,?,?)", sup)
    con.execute("CREATE TABLE nation(n_nationkey INTEGER, n_name VARCHAR, "
                "n_regionkey INTEGER)")
    con.executemany("INSERT INTO nation VALUES (?,?,?)", nat)
    tmp = tempfile.mkdtemp(prefix="fuzzwh_")
    try:
        for name, schema, rows in [
            ("orders", "o_orderkey long, o_custkey long, o_orderstatus string, "
                       "o_totalprice double, o_orderdate timestamp, "
                       "o_orderpriority string", orders),
            ("customer", "c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string", cust),
            ("lineitem", "l_orderkey long, l_partkey long, l_suppkey long, "
                         "l_linenumber int, l_quantity double, "
                         "l_extendedprice double, l_discount double, "
                         "l_tax double, l_returnflag string, "
                         "l_linestatus string, l_shipdate timestamp", line),
            ("supplier", "s_suppkey long, s_name string, s_nationkey int, "
                         "s_acctbal double", sup),
            ("nation", "n_nationkey int, n_name string, n_regionkey int", nat),
        ]:
            spark.createDataFrame(rows, schema).coalesce(1).write \
                .mode("overwrite").parquet(f"{tmp}/{name}.parquet")
        for name in _WH_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (
                name, len(g_rows), len(d_rows),
                sorted(g_rows, key=str)[:4], sorted(d_rows, key=str)[:4])
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows, key=str)[:5], sorted(d_rows, key=str)[:5])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Fifth wave: the lineitem/part/supplier TPC-H analogues. These queries
# run over the full testdata schemas (brand/type/shipmode-free subset the
# reduced _WH corpus can't host), so instead of synthesizing tables the
# fuzz PERTURBS the real sf0.001 parquet: NULLs injected at a sampled
# rate into every non-key (and some key) column, both engines reading the
# identical perturbed files. The driver corpus is NULL-free in all of
# these columns, which is exactly why this family stayed unfuzzed —
# NULL-key windows, NULL-measure aggregates, and NULL-date arithmetic
# never got a cross-engine trial before this.
# --------------------------------------------------------------------------
_TPCH_FUZZED = [
    "nations_in_region", "nations_with_both", "nations_without_suppliers",
    "revenue_by_nation", "nation_trade_volume", "national_market_share",
    "shipping_priority", "returned_item_top_customers",
    "large_volume_customers", "small_quantity_revenue",
    "priority_line_counts", "order_priority_checking", "promo_revenue_pct",
    "brand_filtered_revenue", "parts_supplier_stats",
    "sole_late_supplier_blame", "top_revenue_suppliers",
    "data_quality_checks", "forecast_revenue", "map_valued_agg",
    "per_key_limit", "scalar_gauntlet", "regex_validity_filter",
    "nullsafe_join_counts", "bucketed_join_revenue", "region_status_grid",
    # customer/part consumers from the privacy + linkage families
    "pseudonymize_customers", "k_anonymize_customers", "fuzzy_match_parts",
    # ORC roundtrip — NULL-injected l_returnflag exercises the
    # __HIVE_DEFAULT_PARTITION__ null-partition round-trip
    "orc_roundtrip_revenue",
    # mergeSchema evolution — NULL-injected o_orderdate/o_orderpriority
    # exercise the epoch-membership exclusion and the absent-column NULLs
    "schema_evolution_union",
    # iterative integer-exact PageRank — NULL part/supp keys drop at scan
    "supplier_part_pagerank",
    # single-pass observed write: NULL-injected prices/dates light up the
    # null-count metrics the clean corpus keeps at zero
    "observed_write_metrics",
    # round-8: triangle census — NULL order/part keys drop at scan; the
    # oriented-edge dedup must agree across engines
    "triangle_counts",
    # round-8: deterministic LPA — vote ties (c equal) must break to the
    # smallest label on both engines; NULL keys drop at edge build
    "label_propagation",
    # round-11: erasure-impact audit — NULL custkeys/orderkeys/user_ids
    # must fall out of every semi-join hop identically on both engines
    "forget_cascade_audit",
    # round-11: Adamic-Adar link prediction — NULL part/order keys drop
    # at edge build; the degree cap, ln quantization, and top-K cut must
    # agree cross-engine on degenerate graphs (all-dup parts, tiny orders)
    "link_prediction_aa",
    # round-8: CountMin join-size estimate — NULL-injected keys drop on
    # both sides; the min-over-depths and the over-estimation invariant
    # must survive perturbed key distributions
    "join_size_estimate",
    # round-8: the skyline sweep must equal the quadratic dominance
    # oracle when price/size go NULL (both guarded out at scan);
    # sequential packing under NULL ship dates; zone maps where a whole
    # month's prices are NULL
    "pareto_frontier", "compaction_plan", "minmax_prune_plan",
    # round-8: the deletion cascade under NULL-injected o_custkey /
    # c_nationkey — inner joins must drop NULL keys identically and the
    # NULL nation group must aggregate identically on both engines
    "deletion_propagation",
    # round-8: DECIMAL(18,2) money rollup — NULL status/price guards,
    # and the cents->DECIMAL presentation must stringify identically
    "decimal_money_rollup",
    # round-8: Poisson bootstrap — the hash-CDF weights and the chained
    # double divisions must agree on NULL-thinned corpora, including
    # resamples that draw zero rows (excluded on both sides)
    "bootstrap_ci_revenue",
    # round-11: per-segment OLS (NULL balances/custkeys drop at scan;
    # det=0 degenerate segments filter identically), the ALS half-step
    # (NULL part/quantity/custkey rows drop before the factor hash), the
    # quantized logistic descent (NULL balances drop; the label join must
    # treat NULL custkeys as non-buyers on both engines), A-priori
    # triples (NULL order/part keys drop at the distinct), and the
    # decimal-id hierarchy rollup (NULL prices drop at scan)
    "ols_by_segment", "als_half_step", "logistic_gd_steps",
    "apriori_triples", "hierarchy_rollup",
    # round-11: STL-lite decomposition — all-NULL-price days carry NULL
    # cents through trend/detrended/residual identically on both engines
    "seasonal_decompose",
    # round-11: the stump split search and WOE/IV encoding (NULL
    # balances drop at scan; NULL-injected o_custkey labels everyone a
    # non-buyer identically; the add-one smoothing keeps degenerate bins
    # finite) and the quantized one-way ANOVA (NULL segments/balances
    # drop; a single surviving segment yields NULL F on both engines)
    "stump_split_search", "woe_iv_encoding", "anova_f_segments",
    # round-12 audit sweep: the last warehouse/graph queries without fuzz
    # exposure. important_part_value (HUGEINT-cast rollup under NULL
    # prices), min_cost_supplier (two-key min-join under NULL supp/cost
    # keys), product_profit_rollup and promotable_part_suppliers (brand/
    # date guards), market_basket_rules (pair supports and confidence
    # divisions on NULL-thinned baskets), hot_key_skew_report (skew
    # shares when hot keys go NULL), and the iterative pair bfs_levels /
    # kcore_peel (frontier/peel fixpoints must agree when NULL keys thin
    # the co-purchase edge list — the triangle_counts discipline)
    "important_part_value", "min_cost_supplier", "product_profit_rollup",
    "promotable_part_suppliers", "market_basket_rules",
    "hot_key_skew_report", "bfs_levels", "kcore_peel",
]

_PERTURB_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate",
                 "l_partkey", "l_suppkey"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority", "o_custkey"],
    "customer": ["c_acctbal", "c_mktsegment", "c_name", "c_nationkey"],
    "part": ["p_brand", "p_type", "p_size", "p_retailprice", "p_name"],
    "supplier": ["s_acctbal", "s_nationkey", "s_name"],
    "nation": ["n_name"],
}

_SRC_SF = os.environ.get("SPARK_GRAFT_FUZZ_SRC", "/root/testdata/sf0.001")


@settings(max_examples=2, deadline=None)
@given(st.integers(0, 2**31 - 1), st.sampled_from([0.03, 0.15, 0.4]))
def test_tpch_queries_match_oracles_on_null_injected_tables(spark, seed, frac):
    """NULLs at rate ``frac`` into measures, dimension strings, dates,
    and even foreign keys of the real TPC-H-ish tables; every analogue
    query must agree with its oracle on the identical perturbed files."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.tables import TABLES

    rng = np.random.default_rng(seed)
    tmp = tempfile.mkdtemp(prefix="fuzztpch_")
    con = duckdb.connect()
    try:
        for t in TABLES:
            src = f"{_SRC_SF}/{t}.parquet"
            dst = f"{tmp}/{t}.parquet"
            targets = _PERTURB_COLS.get(t)
            if not targets:
                shutil.copyfile(src, dst)
            else:
                tab = pq.read_table(src)
                cols, n = {}, len(tab)
                for f in tab.schema:
                    col = tab[f.name].combine_chunks()
                    if f.name in targets:
                        mask = pa.array(rng.random(n) < frac)
                        col = pc.if_else(mask, pa.nulls(n, f.type), col)
                    cols[f.name] = col
                pq.write_table(pa.table(cols), dst)
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{dst}')")
        for name in _TPCH_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (
                name, len(g_rows), len(d_rows),
                sorted(g_rows, key=str)[:4], sorted(d_rows, key=str)[:4])
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows, key=str)[:5], sorted(d_rows, key=str)[:5])
    finally:
        # bucketed_join_revenue tags its catalog tables by md5(sf_dir);
        # tmp dirs are unique per example, so drop them or they accumulate
        import hashlib
        tag = hashlib.md5(tmp.encode()).hexdigest()[:8]
        for tbl in (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Sixth wave: the Structured Streaming family, over the same adversarial
# events corpus as _EV_FUZZED. Streaming adds its own NULL-ts trap: a
# NULL event-time row cannot enter a watermarked computation at all
# (Spark's window()/session_window()/dropDuplicatesWithinWatermark all
# need an event time), so each oracle must model the drop explicitly —
# the batch GROUP BY would otherwise keep a NULL group the stream never
# emits. Fewer examples than the batch waves: every query here pays a
# full drain (start + awaitTermination) per example.
# --------------------------------------------------------------------------
_STREAM_FUZZED = [
    "streaming_hourly_counts", "streaming_sessions", "streaming_dedup",
    "streaming_running_totals", "streaming_enriched_counts",
    "streaming_stream_join",
    # foreachBatch merge sink: per-batch SCD-1 upserts must compose to
    # the batch aggregate; NULL-key rows drop on both sides
    "streaming_upsert_totals",
    # statestore reader: the drained query's state contents must BE the
    # batch aggregate, NULL group keys included
    "state_store_probe",
    # left-outer stream-stream join: the empirically-pinned watermark
    # cutoff for NULL emission must hold on adversarial corpora too
    "streaming_left_outer_join",
    # round-8 chained window-of-window: the non-strict day_end <= wm
    # emission pin and the hourly->daily finalized handoff must hold on
    # adversarial corpora (NULL ts, single-event days, exact-boundary ts)
    "streaming_daily_peak",
    # round-8 listener audit: numInputRows must count EVERY row (NULL
    # ts/key included — no watermark op in this drain) and state rows
    # must count the NULL key group
    "streaming_progress_audit",
    # round-11: the mergeable-histogram drift monitor (NULL value/ts rows
    # drop before the stream; all-reference or all-current corpora leave
    # one side's histogram empty — the +B smoothing keeps every PSI term
    # finite on both engines)
    "streaming_drift_monitor",
    # round-12 audit sweep: the strict in-order funnel drain (NULL ts
    # rows cannot enter the stateful buffer; out-of-order adversarial
    # corpora must not fake a step). streaming_dedup_screen is NOT here —
    # it reads the documents table this harness doesn't stage; its match
    # semantics are dedup_incremental's oracle verbatim, which the text
    # fuzz wave covers, leaving only the drain wrapper outside the fuzz.
    "streaming_sequence_funnel",
]


@settings(max_examples=2, deadline=None)
@given(st.lists(_EVENT, min_size=3, max_size=25))
def test_streaming_queries_match_oracles_on_adversarial_events(spark, evs):
    """NULL timestamps / types / values through the streaming drains vs
    their batch-SQL oracles on the identical parquet."""
    from cliqz_etl_spark.operators.cache import release_all

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, ts, uid, et, v, '{"k": 1}')
            for i, (uid, ts, et, v) in enumerate(evs)]
    # a tiny customer dim for the stream-static enrichment: covers only
    # user_ids 0-3 (so 4/5 miss the join) with one NULL segment
    cust = [(0, "C0", 0, 1.0, "BUILDING"), (1, "C1", 0, 1.0, None),
            (2, "C2", 1, 1.0, "AUTOMOBILE"), (3, "C3", 1, 1.0, "BUILDING")]
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, "
                "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO customer VALUES (?,?,?,?,?)", cust)
    tmp = tempfile.mkdtemp(prefix="fuzzstream_")
    try:
        table = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        })
        pq.write_table(table, f"{tmp}/events.parquet")
        spark.createDataFrame(
            cust, "c_custkey long, c_name string, c_nationkey int, "
                  "c_acctbal double, c_mktsegment string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
        for name in _STREAM_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (
                name, len(g_rows), len(d_rows),
                sorted(g_rows, key=str)[:4], sorted(d_rows, key=str)[:4])
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows, key=str)[:5], sorted(d_rows, key=str)[:5])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Seventh wave: the custom Python DataSource. A generator has no table
# inputs to perturb, so its fuzz axis is the OPTION SPACE: random row
# counts (including 0 and 1), user cardinalities, and partition counts —
# with the oracle SQL rebuilt for each draw from the same md5_long twins.
# Pins that the slice partitioning covers [0, n) exactly once for any
# (n, n_partitions), including n < partitions and the empty source.
# --------------------------------------------------------------------------
@settings(max_examples=4, deadline=None)
@given(st.integers(0, 700), st.integers(1, 40), st.integers(1, 12))
def test_synthetic_source_matches_regenerated_oracle(spark, n, users, parts):
    from cliqz_etl_spark.functions.hashing import md5_long_sql
    from cliqz_etl_spark.sources import SyntheticEventsDataSource

    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass
    df = (spark.read.format("synthetic_events")
          .option("n_rows", n).option("n_users", users)
          .option("n_partitions", parts).load())
    got = sorted(tuple(r) for r in df.collect())
    oracle = f"""
    SELECT i AS event_id,
           TIMESTAMP '2024-01-01'
             + ({md5_long_sql("CAST(i AS VARCHAR) || '#2'")} % {30 * 86_400})
               * INTERVAL 1 SECOND AS ts,
           {md5_long_sql('i')} % {users} AS user_id,
           ['click','error','purchase','signup','view']
             [({md5_long_sql("CAST(i AS VARCHAR) || '#1'")} % 5) + 1] AS event_type,
           CAST({md5_long_sql("CAST(i AS VARCHAR) || '#3'")} % 100000 AS DOUBLE)
             / 100.0 AS value
    FROM (SELECT unnest(range({n})) AS i)
    """
    want = sorted(tuple(r) for r in duckdb.connect().execute(oracle).fetchall())
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.integers(1, 400), st.integers(1, 150))
def test_synthetic_stream_offsets_compose_exactly_once(spark, n, per_batch):
    """Random (cap, batch size): repeated availableNow catch-up runs over
    one checkpoint must deliver every generated row exactly once, for any
    batch/cap ratio (cap < batch, equal, many batches). Routed through
    the CUSTOM stream sink, so one fuzz covers both custom streaming
    halves: source offset composition AND per-epoch staged commits."""
    import math
    import os
    import shutil
    import tempfile

    from cliqz_etl_spark.sources import (JsonlShardDataSource,
                                         SyntheticEventsDataSource)

    for cls in (SyntheticEventsDataSource, JsonlShardDataSource):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass
    root = tempfile.mkdtemp(prefix="fuzzsynstream_")
    out, ckpt = f"{root}/out", f"{root}/ckpt"
    os.makedirs(out)
    try:
        for _ in range(math.ceil(n / per_batch) + 1):
            src = (spark.readStream.format("synthetic_events")
                   .option("n_rows", n).option("rows_per_batch", per_batch)
                   .option("n_users", 7).load())
            (src.writeStream.format("jsonl_shards")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True)
             .start().awaitTermination())
        ids = sorted(r[0] for r in
                     spark.read.json(out).select("event_id").collect())
        assert ids == list(range(n)), (n, per_batch, len(ids))
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# Round-12 audit wave: the two queries that join BOTH the documents and
# embeddings tables (vec_id == doc_id), which neither the text wave (docs
# only) nor the embedding wave (vectors only) could stage. Adversarial
# vectors ride the _VEC strategy, adversarial texts the _TEXT strategy,
# over the SAME id spine so the cross-table joins have real work; the
# ValueError arm mirrors the embedding wave's (cluster_topics trains the
# kmeans quantizer and raises loudly on a degenerate corpus — the oracle's
# centroid CTE must then be empty).
# --------------------------------------------------------------------------
_HYBRID_FUZZED = ["rrf_hybrid_search", "cluster_topics"]


@settings(max_examples=2, deadline=None)
@given(st.lists(_VEC, min_size=6, max_size=12),
       st.lists(_TEXT, min_size=6, max_size=12))
def test_hybrid_docs_embedding_queries_match_oracles(spark, vecs, texts):
    from cliqz_etl_spark.operators.cache import release_all

    # guarantee a few valid vectors and texts so both sides have work
    vecs = list(vecs) + [[0.1 * ((i + j) % 7 - 3) for j in range(64)]
                         for i in range(4)]
    texts = list(texts) + ["the quick brown fox", "a of and to ok",
                           "naïve tokens yy x1", "the quick brown fox"]
    n = max(len(vecs), len(texts))
    ids = (_EMB_IDS * ((n // len(_EMB_IDS)) + 1))[:n]
    vrows = [(ids[i], vecs[i] if i < len(vecs) else None, i % 3)
             for i in range(n)]
    drows = [(ids[i], texts[i] if i < len(texts) else None,
              ["en", "de", "fr"][i % 3], "fuzz",
              len(texts[i]) if i < len(texts) and texts[i] else 0)
             for i in range(n)]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding DOUBLE[], label BIGINT)")
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", vrows)
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", drows)
    tmp = tempfile.mkdtemp(prefix="fuzzhybrid_")
    try:
        spark.createDataFrame(
            vrows, "vec_id long, embedding array<double>, label long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        spark.createDataFrame(
            drows, "doc_id long, text string, lang string, source string, "
                   "n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        for name in _HYBRID_FUZZED:
            q = _REGISTRY[name]
            try:
                got = q.fn(spark, tmp)
                g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
            except ValueError:
                assert not con.execute(q.oracle).fetchall(), name
                continue
            finally:
                release_all()
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            assert sorted(g_cols) == sorted(d_cols), name
            assert len(g_rows) == len(d_rows), (
                name, len(g_rows), len(d_rows))
            assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
                name, sorted(g_rows, key=str)[:5], sorted(d_rows, key=str)[:5])
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


# Queries legitimately outside every fuzz wave, each with the dedicated
# coverage that replaces it. Additions here need the same justification.
_FUZZ_EXEMPT = {
    # drain wrapper over dedup_incremental's fuzzed semantics; reads the
    # documents table the streaming harness doesn't stage
    "streaming_dedup_screen",
    # the custom synthetic stream source -> custom sink path; fuzzed
    # end-to-end by test_synthetic_stream_offsets_compose_exactly_once
    "stream_sink_roundtrip", "synthetic_stream_rollup",
    # the custom batch source; fuzzed by
    # test_synthetic_source_matches_regenerated_oracle
    "synthetic_source_rollup",
}


def test_every_registry_query_is_fuzz_enrolled():
    """Fuzz-coverage gate (round-12 audit): every registered query must
    sit in one of the fuzz waves above or carry a documented exemption —
    so a new wave of queries can't silently ship without adversarial
    input coverage the way 17 round-11 queries briefly did."""
    enrolled = (set(_FUZZED) | set(_EMB_FUZZED) | set(_EV_FUZZED)
                | set(_WH_FUZZED) | set(_TPCH_FUZZED) | set(_STREAM_FUZZED)
                | set(_HYBRID_FUZZED))
    registry = set(_REGISTRY)
    missing = sorted(registry - enrolled - _FUZZ_EXEMPT)
    assert not missing, (
        f"{len(missing)} registry queries have no fuzz enrollment and no "
        f"documented exemption: {missing}")
    ghost = sorted((enrolled | _FUZZ_EXEMPT) - registry)
    assert not ghost, f"fuzz lists name unknown queries: {ghost}"
    double = sorted(enrolled & _FUZZ_EXEMPT)
    assert not double, f"exempt queries are also enrolled: {double}"
