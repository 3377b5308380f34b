"""Plan-hygiene gate: physical-plan properties that make or break 100 TB
runs, asserted over the whole query registry so a regression in any query's
plan fails CI — not just the few plans a human remembered to .explain().
"""

from __future__ import annotations

import pytest

from cliqz_etl_spark.queries import load_all
from tests.conftest import SF_SMOKE

_REGISTRY = load_all()

# Queries whose algorithms intentionally run driver-side iteration or
# Python batch stages.
_PYTHON_OK = {"multimodal_meta"}          # mapInPandas by design
_DRIVER_LOOP = {"dedup_clusters"}         # iterative fixpoint by design


def _plan(spark, name: str) -> str:
    df = _REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_plan_hygiene_sweep(spark, name):
    """One planning pass per registry query, two structural gates:

    - no CartesianProduct anywhere (every intentional cross join in the
      engine broadcasts a tiny side, which plans as
      BroadcastNestedLoopJoin — an unbroadcast cartesian at 100 TB is
      a non-terminating job, and this catches it at plan time);
    - no row-at-a-time Python UDFs outside the whitelisted queries:
      every operator must stay JVM-side (BatchEvalPython/PythonUDF in a
      plan means a 10-100x slowdown at scale; Arrow-batched
      MapInPandas/ArrowEvalPython stages are fine and not matched)."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    if name not in _PYTHON_OK | _DRIVER_LOOP:
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, name


@pytest.mark.parametrize("name", ["pricing_summary", "revenue_by_nation",
                                  "earliest_order_per_customer", "monthly_revenue"])
def test_filter_and_projection_pushdown(spark, name):
    """Scans must show pruned ReadSchema; filtered scans must push
    predicates (a scan reading all columns for a narrow projection would
    read ~10x the bytes at 100 TB)."""
    plan = _plan(spark, name)
    assert "ReadSchema" in plan, name
    # no scan may read every lineitem/orders column
    for line in plan.splitlines():
        if "ReadSchema" in line and "lineitem" in plan:
            assert "l_comment" not in line  # never projected anywhere
    if name == "pricing_summary":
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_star_join_broadcasts_all_dims(spark):
    """revenue_by_nation: every dimension joins as broadcast-hash; the
    only acceptable shuffle is the orders-lineitem fact join."""
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_semi_join_is_broadcast(spark):
    plan = _plan(spark, "semi_join_orders")
    assert "LeftSemi" in plan and "Broadcast" in plan


@pytest.mark.parametrize("name", ["kmv_distinct_users", "kmv_set_algebra"])
def test_kmv_sketch_build_is_bounded(spark, name):
    """Round-11 gate: no data-sized row_number window partitioned by a
    constant-cardinality key. The KMV sketch build must be kmin_hashes'
    mergeable bounded-state pass — a MapInPandas candidate stage — and
    every Window sort in the plan may only consume that stage's bounded
    output: a Window whose subtree reaches a FileScan without passing
    through MapInPandas is sorting the raw data in one task per
    event_type (the round-10 scale flag)."""
    plan = _plan(spark, name)
    assert "MapInPandas" in plan, name
    lines = plan.splitlines()

    def _depth(s: str) -> int:
        i = 0
        while i < len(s) and s[i] in " :+-*(0123456789)":
            i += 1
        return i

    for idx, line in enumerate(lines):
        if "Window" not in line:
            continue
        d = _depth(line)
        subtree = []
        for nxt in lines[idx + 1:]:
            if nxt.strip() and _depth(nxt) <= d and not nxt.startswith("=="):
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        if "FileScan" in sub or "BatchScan" in sub:
            assert "MapInPandas" in sub, (
                f"{name}: Window over a raw scan (data-sized single-task "
                f"sort):\n{line}\n{sub[:500]}")


def test_no_accidental_cartesian(spark):
    """Cartesian products only where the algorithm is genuinely all-pairs
    against a broadcast side (ANN brute force, IVF centroid assignment)."""
    allowed = {"ann_topk", "ann_ivf", "embedding_near_pairs", "ivf_clusters"}
    for name in sorted(set(_REGISTRY) - allowed - _DRIVER_LOOP):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_partial_aggregation_before_shuffle(spark):
    """Grouped aggregates must run map-side partial aggregation (the
    reference chose reduceByKey over groupByKey for exactly this)."""
    plan = _plan(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_range_join_has_bucket_equi_key(spark):
    """range_join_close_events must join on (user_id, time-bucket) — an
    equi-key that bounds pair generation per 10-minute window. A plan
    joining on user_id alone goes quadratic on power users."""
    plan = _plan(spark, "range_join_close_events")
    join_lines = [l for l in plan.splitlines() if "Join" in l and "user_id" in l]
    assert join_lines and all("bkt" in l for l in join_lines), join_lines


def test_ivf_assignment_is_pure_map(spark):
    """Centroid assignment must be a shuffle-free map over the corpus
    (broadcast model + MapInPandas) — no Exchange, no join, and plan size
    independent of K."""
    from pyspark.sql import functions as F

    from cliqz_etl_spark.operators.similarity import ivf_assign_q, quantize
    from cliqz_etl_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    proj = emb.select(F.col("vec_id").alias("_id"), quantize("embedding").alias("_qv"))
    plan = (ivf_assign_q(proj, [0, 1], [[0] * 64, [1] * 64])
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_contamination_broadcasts_eval_postings(spark):
    """The eval-set postings (benchmarks — tiny at scale) must broadcast;
    the train corpus never shuffles for the gram join."""
    plan = _plan(spark, "contamination_check")
    assert "BroadcastHashJoin" in plan


def test_bigram_lm_bucket_has_no_global_ntile(spark):
    """bigram_lm_score's head/middle/tail split must come from the ranged
    prefix-rank (range-repartition, partition-parallel windows), never a
    global ntile window — which would sort every scored document in ONE
    task at 100 TB (round-8 verdict item 3). Equality with real ntile(3)
    stays pinned by the DuckDB oracle gate."""
    plan = _plan(spark, "bigram_lm_score")
    assert "ntile" not in plan, "global ntile window reintroduced"
    assert "rangepartitioning" in plan  # the ranged_cumsum exchange


def test_contrastive_triplets_single_pair_shuffle(spark):
    """Both triplet roles (cosine-top positive, hash-min negative) must
    fold out of ONE per-anchor exchange of the Q x N pair frame — a
    pos-join-neg form would shuffle it twice and re-scan the corpus per
    branch. The only broadcast is the anchor set."""
    plan = _plan(spark, "contrastive_triplets")
    assert plan.count("Exchange hashpartitioning(anchor_id") == 1, plan
    assert "SortMergeJoin" not in plan


def test_interval_union_single_key_exchange(spark):
    """Sweep-line interval union: island marking, island ids, and both
    groupBys all ride one customer-key exchange."""
    plan = _plan(spark, "interval_union_days")
    assert plan.count("Exchange") == 1, plan


def test_pack_sequences_single_shard_shuffle(spark):
    """Per-shard packing: exactly one hash-partition exchange (on source)
    feeds the cumulative window — no global-order sort."""
    plan = _plan(spark, "pack_sequences")
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchanges) == 1 and "source" in exchanges[0], exchanges
    assert "rangepartitioning" not in plan  # a global orderBy would use this


# Round-14 gate (verdict item 9): the r13 multi-consumer persists must
# SURVIVE in the executed plan — nb_quality_classifier proved a persist
# can silently cost AQE's runtime broadcast (cached build side stops
# planning as broadcast -> extra Exchange), and the reverse failure (a
# refactor dropping the persist -> the shared subtree re-executes per
# consumer) is just as silent. Values = (min InMemoryTableScan refs,
# min Broadcast* nodes) measured in the final adaptive plan at SF_SMOKE
# when the persists landed. Queries whose smoke-scale plan collapses to
# an empty relation (important_part_value, markov_attribution,
# conformal_value_intervals) are covered by their exchange budgets only.
_PERSIST_SURVIVAL = {
    "psi_drift": (1, 1),
    "cusum_changepoint": (2, 1),
    "lorenz_curve_deciles": (2, 1),
    "abc_analysis_parts": (2, 1),
    "source_mix_entropy": (1, 1),
    "streaming_drift_monitor": (1, 1),
    "curation_funnel_audit": (1, 1),
    "market_basket_rules": (1, 1),
    "shapley_attribution": (1, 1),
    "forget_cascade_audit": (3, 1),
}


@pytest.mark.parametrize("name", sorted(_PERSIST_SURVIVAL))
def test_persisted_shared_frames_survive(spark, name):
    from cliqz_etl_spark.operators.cache import release_all

    min_imts, min_bcast = _PERSIST_SURVIVAL[name]
    try:
        df = _REGISTRY[name].fn(spark, SF_SMOKE)
        df.collect()
        final = (df._jdf.queryExecution().executedPlan().toString()
                 .split("== Initial Plan ==")[0])
    finally:
        release_all()
    assert final.count("InMemoryTableScan") >= min_imts, name
    assert final.count("Broadcast") >= min_bcast, name


@pytest.mark.parametrize("name", ["dedup_substring_removal",
                                  "dedup_exact_substrings"])
def test_substr_window_subtree_is_shared(spark, name):
    """Round-14 gate: the stride-1 window explode must appear ONCE in the
    executed plan and its h-keyed shuffle must be REUSED by the second
    consumer (MIN-winner aggregate + join probe share one exchange —
    guide §2.4). The reuse depends on canonical-plan equality, which a
    well-meaning persist of the token frame (cached leaves re-instanced
    under a self-join never canonicalize equal in Spark 4) or a drifted
    filter set silently breaks — turning back into TWO corpus x W
    explodes and TWO h shuffles with no visible failure. Executed-plan
    assertion is the only reliable detector."""
    from cliqz_etl_spark.operators.cache import release_all

    try:
        df = _REGISTRY[name].fn(spark, SF_SMOKE)
        df.collect()
        final = (df._jdf.queryExecution().executedPlan().toString()
                 .split("== Initial Plan ==")[0])
    finally:
        release_all()
    assert final.count("posexplode") == 1, name
    assert "ReusedExchange" in final, name


def test_scd2_changelog_single_shuffle(spark):
    """All three window passes of the gaps-and-islands compression must
    share one hash-partition exchange on the key — a second Exchange means
    the window specs drifted apart."""
    plan = _plan(spark, "user_type_history")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 3


def test_scd2_merge_single_pass(spark):
    """The SCD2 merge emits closed+new versions from ONE join via explode
    — no union of per-branch joins (which would re-execute the join)."""
    plan = _plan(spark, "scd2_customer_balance")
    assert plan.count("Generate") == 1          # one explode
    assert plan.count("Union") == 0, "merge must not be a union of joins"


def test_bloom_prefilter_prunes_before_exact_join(spark):
    """Both hashed-bucket prunes must be broadcast semi-joins (map-side,
    no fact shuffle); only pruned survivors may reach the exact join."""
    plan = _plan(spark, "bloom_semi_join_revenue")
    bhj_semi = [l for l in plan.splitlines()
                if "BroadcastHashJoin" in l and "LeftSemi" in l]
    assert len(bhj_semi) >= 2, plan


def test_salted_count_two_phase(spark):
    """Salting must produce two aggregation levels over DIFFERENT keys:
    partial on (key, salt), final on key — visible as >=4 HashAggregate
    nodes (partial+final per level)."""
    plan = _plan(spark, "salted_event_counts")
    assert plan.count("HashAggregate") >= 4, plan


def test_salted_join_key_includes_salt(spark):
    """The salted join's equi-key must include the salt column so each
    (key, salt) pair lands on its own reducer."""
    plan = _plan(spark, "salted_join_value_by_type")
    join_lines = [l for l in plan.splitlines() if "Join" in l and "event_type" in l]
    assert join_lines and all("__salt" in l for l in join_lines), join_lines


def test_pit_join_has_no_range_join(spark):
    """The point-in-time join must be the union+window as-of idiom: no
    nested-loop/theta join anywhere (an interval join would appear as
    BroadcastNestedLoopJoin), and exactly one Window does the lookup."""
    plan = _plan(spark, "pit_order_balance")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Window") == 1


def test_chunk_documents_is_map_only(spark):
    """The sliding-window chunker is a pure scan-side 1->N expansion:
    tokenize once, sequence/transform/explode — NO Exchange anywhere. A
    shuffle in this plan means the expansion stopped being embarrassingly
    parallel and the 100 TB ingestion path pays a needless repartition."""
    plan = _plan(spark, "chunk_documents")
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan or "Generate" in plan, plan


# Post-execution plan budgets: ceilings, not exact counts, so AQE remains
# free to coalesce/broadcast — the test fails only when a code change
# makes a plan structurally WORSE (an extra shuffle, a Python stage
# appearing where none belongs). Values = the PLANS.md digest at the
# time of pinning, verbatim.
#
# Round-14 third element: SOURCE-SCAN ceiling ("Scan parquet" count in
# the final adaptive plan). This is the registry-wide double-execution
# gate the round-13 verdict asked for: a shared frame that silently
# loses its persist (or gains a new uncached consumer) re-executes its
# whole scan-rooted subtree, and the extra source scan is the one
# fingerprint every such regression leaves in the executed plan — the
# 7821cad audit found nine of these by hand; this catches the tenth
# automatically. (Cached relations print their build scan inside each
# InMemoryRelation reference, so the pinned numbers for persisting
# queries count those references too — still deterministic per plan.)
_PLAN_BUDGET = {
    # query: (max shuffles, max python stages)
    "pricing_summary": (1, 0, 1),
    "revenue_by_nation": (1, 0, 5),
    "earliest_order_per_customer": (1, 0, 2),
    "semi_join_orders": (0, 0, 2),
    "per_key_limit": (1, 0, 1),
    "dedup_exact": (1, 0, 1),
    "dedup_minhash_lsh": (2, 0, 1),
    "dedup_spans": (3, 0, 3),
    "ann_topk": (1, 1, 2),
    "dedup_semantic": (2, 3, 3),
    "sessionize": (1, 0, 1),
    "word_counts": (1, 0, 1),
    "chunk_documents": (0, 0, 1),
    "variant_roundtrip_stats": (2, 0, 1),
    "curation_pipeline_v2": (4, 0, 3),
    # round-13: 5 measured = dedup_spans' 3 keyed shuffles + contamination
    # postings agg + the survivor pack window; 1 python = the BMP codec
    # Arrow stage. Ceiling catches a gate join degrading from broadcast
    # to shuffle (doc-id-sized sides must broadcast at gate scale)
    "curation_pipeline_v4": (6, 1, 8),
    # round-13: at smoke scale AQE broadcasts the coverage frame (the
    # h-keyed winner agg + occurrence join live inside the broadcast
    # subtree), so the counted exchanges are the doc-keyed window/agg
    # pair + the spread repartition; the ceiling leaves room for the
    # at-scale SMJ shape while still catching a corpus-sized sort or a
    # Python stage appearing
    "dedup_substring_removal": (3, 0, 2),
    "supplier_part_pagerank": (6, 0, 1),
    # round-8 pins
    "dedup_exact_substrings": (3, 0, 2),
    "zorder_layout": (2, 0, 2),
    "psi_drift": (2, 0, 2),
    "temperature_mixing": (3, 0, 1),
    # 12 = three tiny u-stat frequency joins + counts, all dimension-
    # sized; the budget exists to catch a PAIR-sized shuffle appearing
    "record_linkage_fs": (12, 0, 10),
    "incremental_join_maintenance": (4, 0, 7),
    "knn_graph": (4, 0, 2),
    # exchanges include ranged_cumsum's range repartition + pid window
    # shuffle; the ceiling exists to catch a corpus-sized SINGLE-task
    # sort creeping back in (it would show as Exchange SinglePartition,
    # which also counts here)
    "ks_drift": (4, 0, 1),
    "winsorize_stats": (6, 0, 1),
    # retrieval family: phrase matching is map-only; the boolean AND is
    # two postings-sized shuffles; the compression planner's third
    # exchange is the (term, shard) lag window; WAND/RRF ceilings catch
    # a corpus-sized sort replacing the TakeOrderedAndProject cuts
    "postings_intersect": (2, 0, 1),
    "phrase_search": (0, 0, 1),
    "postings_compress_stats": (3, 0, 1),
    "wand_bm25_topk": (6, 0, 3),
    "rrf_hybrid_search": (6, 0, 6),
    # two-pass heavy hitters: the single python stage is the Arrow MG
    # screen; shuffles carry candidates + the distinct, never raw tokens
    "heavy_hitters_exact": (3, 1, 3),
    # skyline sweep / sequential packer ride ranged_cummax/ranged_cumsum
    # (range repartition + pid window + tiny offset window each); the
    # ceiling catches a corpus-sized single-task sort replacing them
    "pareto_frontier": (6, 0, 2),
    "compaction_plan": (6, 0, 1),
    "minmax_prune_plan": (1, 0, 1),
    # PQ: 3 python stages = validity projection + recode pass + the
    # shared approx kernel; 2 shuffles = the bounded candidate narrow +
    # rerank join — a corpus-sized pair shuffle appearing would breach
    "ann_pq": (2, 3, 3),
    # request set broadcasts into orders; 3 keyed shuffles ceiling
    # (lineitem join + nation aggregates), dimension-sized outputs
    "deletion_propagation": (3, 0, 5),
    # Arrow UDTF over TABLE(... PARTITION BY): one keyed shuffle + the
    # single ArrowEvalPythonUDTF stage — a second shuffle or a
    # BatchEvalPython (row-mode) stage appearing is a regression
    "udtf_run_lengths": (1, 1, 1),
    "decimal_money_rollup": (1, 0, 1),
    # IVFPQ: 3 python stages = validity projection + recode pass + the
    # probed approx kernel; 2 shuffles = candidate narrow + rerank join
    "ann_ivfpq": (2, 3, 3),
    # Poisson bootstrap: the Bx expansion must stay scan-side — one
    # groupBy(b) shuffle of B-row partials plus the 32-row rank window
    "bootstrap_ci_revenue": (2, 0, 1),
    # TPC-H Q2 analogue: one (part,supp) agg shuffle + one partitioned
    # window on partkey; lineitem scanned exactly ONCE (the groupBy-then-
    # self-join alternative re-derives the fact subtree) and every
    # dimension broadcasts
    "min_cost_supplier": (2, 0, 7),
    # TPC-H Q9 analogue: fact-fact join on orderkey + final (nation,year)
    # agg; part/supplier/nation all broadcast
    "product_profit_rollup": (2, 0, 5),
    # TPC-H Q11 analogue: one partkey agg shuffle + the 1-row total's
    # SinglePartition exchange; the HAVING is an integer cross-multiply
    # against the broadcast total, never a float division
    "important_part_value": (2, 0, 0),
    # TPC-H Q20 analogue: nested semi-joins — one (supp,part) agg shuffle;
    # part keys and the qualifying-supplier aggregate both broadcast
    "promotable_part_suppliers": (2, 0, 5),
    # KMV bounded build: exact countDistinct (2 exchanges) + the three
    # sketch-sized exchanges (candidate distinct, k-of-union window,
    # per-type max); the single python stage is the kmin_hashes pass
    "kmv_distinct_users": (4, 1, 2),
    # set algebra adds theta/membership joins over <=2K-row frames
    "kmv_set_algebra": (5, 1, 1),
    # first-fail funnel: stage groupBy + the 6-row-derived total's
    # SinglePartition + its broadcast — ONE scan (a second scan for the
    # total was the round-11 review finding)
    "curation_funnel_audit": (1, 0, 1),
    # df boilerplate: (source,gram) agg + src rollup + join-back + doc agg
    "boilerplate_ngram_profile": (4, 0, 1),
    # PR sweep rides the NB pass; the sweep itself adds ONE 5-key agg
    "quality_pr_curve": (3, 0, 1),
    # KN model: the (w1,w2) count is the ONLY corpus-sized shuffle;
    # derived tables reuse its persisted frame
    "kn_bigram_model": (2, 0, 1),
    # OOF encoding: the (segment,fold) agg + the 25-row-derived category
    # rollup's exchange + one model-sized re-distribution; all joins back
    # onto the facts broadcast
    "target_encode_oof": (3, 0, 4),
    # Benford: one (type,digit) agg + derived type rollup + spine joins
    "benford_first_digit": (3, 0, 2),
    # AUC: persisted (score,label) agg feeds ranged_cumsum + class window;
    # final job is the score-level join + per-class agg
    "roc_auc_per_class": (2, 0, 1),
    # lift: per-user agg + ranged_ntile's two-pass scheme + 10-row rollup
    "decile_lift_table": (5, 0, 1),
    # chi2: persisted contingency agg; marginals/spine are derived tiny
    "chi2_independence": (2, 0, 1),
    # OLS: per-customer agg + per-segment sufficient-statistics agg
    "ols_by_segment": (2, 0, 2),
    # BFS: persisted edges/frontier/visited; final job unions 1-row aggs
    "bfs_levels": (4, 0, 1),
    # 7-day reach: persisted (user,day) distinct + broadcast day spine +
    # the (day,user) distinct-count expand
    "sliding_distinct_users": (3, 0, 1),
    # centroid cosine: persisted (label,dim) integer-sum frame; pair and
    # norm joins are centroid-sized
    "label_centroid_cosine": (2, 0, 1),
    # ALS half-step: the fact join (orders side broadcasts at smoke
    # scale) + ONE per-user sufficient-statistics aggregate
    "als_half_step": (1, 0, 2),
    # k-core: persisted edges/active sets; final job = per-round degree
    # joins + 1-row count aggregates
    "kcore_peel": (5, 0, 1),
    # BPE round: persisted vocab-symbol frame + two pair aggregates and
    # the 1-row argmax broadcast
    "bpe_merge_step": (2, 0, 1),
    # drift monitor: staged stream histogram sum + reference histogram +
    # 10-row spine/total broadcasts
    "streaming_drift_monitor": (2, 0, 2),
    # RANGE frame: one user-keyed exchange, one running-frame pass
    "trailing_hour_value": (1, 0, 1),
    # STL-lite: daily agg + calendar-sized window/dow/join stages
    "seasonal_decompose": (3, 0, 1),
    # path rollup: scan-side 3-way explode + ONE (level, ancestor) agg
    "hierarchy_rollup": (1, 0, 1),
    # A-priori: persisted items/basket/L2 frames; final job = pruning
    # semi-joins + the downward-closed triple aggregate
    "apriori_triples": (3, 0, 1),
    # reliability diagram: rides the persisted NB scoring frame + ONE
    # <=10-bin aggregate
    "calibration_curve": (1, 0, 1),
    # stump search: feature join + persisted grid agg; scoring/argmin on
    # the domain-bounded grid
    "stump_split_search": (3, 0, 2),
    # ANOVA: persisted per-segment sufficient stats; totals/terms derive
    "anova_f_segments": (2, 0, 1),
    # path mining: one user-keyed sort + the alphabet-bounded path agg
    "top_event_paths": (2, 0, 1),
    # WOE/IV: feature join + ONE bin agg; totals from the 10-row frame
    "woe_iv_encoding": (4, 0, 2),
    # TextRank: persisted pair/edge frames + per-iteration join/agg; the
    # report is TakeOrdered + a 20-row window
    "textrank_keywords": (3, 0, 1),
    # word2vec negatives: ONE unigram agg; weights/shares vocab-sized
    "negative_sampling_table": (1, 0, 1),
    # recall eval: persisted truth frame + the IVF bucket join + hit join
    "ann_recall_eval": (1, 0, 2),
    # map gauntlet: (user,type) agg + per-user entry collect; all map
    # ops row-local
    "map_ops_gauntlet": (2, 0, 1),
    # round-11 seventh wave
    # one user_id window shuffle + the entry-type rollup
    "session_bounce_stats": (2, 0, 1),
    # daily rollup + 7-row lag aggregate; day-frame joins broadcast
    "acf_daily_revenue": (2, 0, 1),
    # ONE (cell,band) groupBy (pinned frame feeds all four rollups);
    # a second data-sized exchange appearing means the pin was lost
    "t_closeness_audit": (2, 0, 1),
    # per-customer agg + ranged_cumsum's range repartition/pid window;
    # the ceiling catches a corpus-sized single-task rank sort
    "gini_spend": (4, 0, 1),
    # vocab agg + ranged rank (range repartition + pid window) + the
    # |langs|-row offset rollup; same single-task-sort guard
    "zipf_fit": (4, 0, 1),
    # both raters ride one scan; the only exchange is the 1-row agg
    "rater_agreement_kappa": (1, 0, 1),
    # bm25's postings-bounded shape + TakeOrdered cut + 1-row metric
    # frames; a corpus-sized sort replacing the cut would breach
    "ranking_eval_bm25": (7, 0, 4),
    # per-customer agg + ranged_ntile's bounded stages + the 10-row
    # decile windows (constant-size single-partition frames)
    "lorenz_curve_deciles": (5, 0, 1),
    # bm25 scoring + PRF TakeOrdered cut + candidate-vocab df pass; the
    # pinned tok/cand frames make every reread an InMemoryTableScan
    "prf_expansion_terms": (8, 0, 5),
    # one presence distinct + the doc-keyed label join; chi2 runs on
    # the vocab frame against a broadcast 1-row total
    "token_chi2_keywords": (2, 0, 2),
    # the monthly agg collects to a calendar-bounded driver fold; the
    # returned frame is a LocalTableScan — any exchange beyond the agg
    # means the fold stopped being driver-side
    "holt_linear_forecast": (1, 0, 0),
    # cluster members come from the pinned CC label frame; the size
    # histogram is two cluster-count-sized aggregates
    "dup_cluster_size_stats": (2, 0, 0),
    # one (source,lang) agg + 1-row total + the cell-sized entropy
    # window (Exchange SinglePartition over |cells| rows, constant)
    "source_mix_entropy": (2, 0, 1),
    # one scan-side count projection + the |langs|-row rollup
    "tokenizer_fertility_report": (1, 0, 1),
    # posexplode agg to (label,dim) + broadcast centroid join + the
    # vec-keyed map-side-combined aggregate; a data-sized SORT or a
    # non-broadcast centroid join appearing would breach
    "embedding_label_outliers": (4, 0, 3),
    # key counts + 1-row stats + TakeOrdered cut (no global sort)
    "hot_key_skew_report": (3, 0, 1),
    # one lang_id scan + the |langs|^2 matrix agg + class-total rollup
    "lang_id_confusion": (3, 0, 1),
    # part-revenue agg + ranged_cumsum's bounded stages (descending
    # order key); a data-sized single-task sort appearing would breach
    "abc_analysis_parts": (3, 0, 1),
    # round-11 late wave
    # Hilbert planner: bounds SinglePartition + the 16-group agg; the
    # 4-level rotate-reflect chain must stay a collapsed projection
    "hilbert_layout": (2, 0, 2),
    # stack profile: the two-phase COUNT(DISTINCT) expansion keyed
    # (col_name, val) then col_name — a third exchange means the
    # partial-distinct collapse was lost
    "column_profile_report": (2, 0, 1),
    # vintage union: alignment is a projection (zero exchanges of its
    # own); the 2-group distinct-count agg pays the same two phases
    "schema_drift_union": (2, 0, 2),
    # WAV DSP features: ONE Arrow stage, zero shuffles
    "audio_feature_stats": (0, 1, 1),
    # erasure cascade: 4 distinct-count aggregates at two phases each;
    # the semi-join chain must broadcast/AQE, never add fact shuffles
    # beyond the pinned distinct exchanges
    "forget_cascade_audit": (4, 0, 3),
    # link prediction: edge build + distinct, degree agg + join-back,
    # md5 neighbor-sample window, sampled adjacency agg, anti-join,
    # pair agg, per-source top-K window — all keyed on high-cardinality
    # ids; a pair SELF-JOIN creeping in would breach this ceiling
    "link_prediction_aa": (11, 0, 1),
    # Shapley: per-user agg + 8-cell agg; everything after is 8-row
    # frames (the 1-row channel sums each pay a SinglePartition)
    "shapley_attribution": (3, 0, 1),
    # conformal: the persisted kmin key set is the ONE Arrow stage; the
    # mean/coverage aggregates pay the remaining keyed exchanges — a
    # second python stage means the persist was lost and the bounded
    # pass re-runs per consumer
    "conformal_value_intervals": (3, 1, 2),
    # probe sweep: persisted truth + three bucket-pruned probes; the
    # ceiling leaves room for the Arrow assignment stages AQE sometimes
    # surfaces in the final plan — anything beyond means the truth
    # persist was lost and brute force re-runs per probe
    "ivf_probe_recall_sweep": (4, 2, 2),
    # recursive CTE: the UnionLoop is projection-only per iteration; the
    # single exchange is the category rollup (one spare for AQE variants)
    "recursive_category_rollup": (2, 0, 0),
    # LATERAL top-N: decorrelated to WindowGroupLimit — the segment
    # distinct + the pruned window exchange; a non-decorrelated plan
    # (per-segment subquery re-execution) would breach instantly
    "lateral_top_balances": (3, 0, 2),
    # --- round-12 backfill: every remaining BENCH_HEADLINE query now
    # carries a ceiling, pinned verbatim from the regenerated PLANS.md
    # digests (same method, same smoke scale), so NO headline plan can
    # structurally regress unnoticed. Streaming rows digest the
    # POST-drain batch plan and driver-fit rows the returned model
    # frame, as PLANS.md's header documents; their low ceilings pin
    # exactly that contract.
    "ann_ivf": (1, 2, 3),
    "ann_sq8": (2, 1, 3),
    "asof_last_click_before_purchase": (1, 0, 1),
    "bigram_lm_score": (4, 0, 2),
    "cluster_topics": (2, 1, 2),
    "contamination_check": (2, 0, 2),
    "dedup_incremental": (1, 0, 2),
    "dedup_ngram_jaccard": (1, 0, 1),
    "dedup_simhash": (1, 0, 1),
    "doc_fingerprint": (0, 0, 1),
    "dsir_importance_weights": (2, 0, 2),
    "forecast_revenue": (1, 0, 1),
    "full_outer_rollup": (2, 0, 2),
    "fuzzy_match_parts": (2, 0, 1),
    "gif_decode_stats": (0, 1, 1),
    "hll_distinct_users": (4, 0, 2),
    "image_decode_stats": (0, 1, 1),
    "jpeg_decode_stats": (0, 1, 1),
    "jpeg_lossy_stats": (0, 1, 1),
    "jsonl_sink_roundtrip": (1, 0, 1),
    "k_anonymize_customers": (1, 0, 2),
    "lang_id": (0, 0, 1),
    "longest_streak": (1, 1, 1),
    "map_valued_agg": (1, 0, 2),
    "market_basket_rules": (2, 0, 2),
    "markov_attribution": (0, 0, 0),
    "mjpeg_frame_stats": (0, 1, 1),
    "mode_per_user": (2, 0, 1),
    "nation_trade_volume": (1, 0, 5),
    "nb_quality_classifier": (0, 0, 1),
    "observed_write_metrics": (0, 0, 0),
    "orc_roundtrip_revenue": (1, 0, 1),
    "pca_top_component": (0, 0, 0),
    "pii_scan_docs": (1, 0, 1),
    "recency_filter": (2, 0, 2),
    "returned_item_top_customers": (1, 0, 4),
    "rfm_segments": (7, 0, 1),
    "running_total": (1, 0, 1),
    "shipping_priority": (1, 0, 3),
    "stratified_sample": (1, 0, 1),
    "streaming_daily_peak": (0, 0, 0),
    "streaming_dedup": (1, 0, 0),
    "streaming_hourly_counts": (0, 0, 0),
    "streaming_left_outer_join": (0, 0, 0),
    "streaming_sequence_funnel": (2, 0, 0),
    "text_quality": (0, 0, 1),
    "token_pmi": (1, 0, 1),
    "unigram_freq_score": (2, 0, 2),
}


def test_every_headline_query_has_a_plan_budget():
    """Structural gate (round-12): the plan-budget table must cover the
    whole BENCH_HEADLINE set, so a new headline query cannot ship
    without a pinned shuffle/python ceiling."""
    from cliqz_etl_spark.queries import BENCH_HEADLINE

    missing = sorted(set(BENCH_HEADLINE) - set(_PLAN_BUDGET))
    assert not missing, (
        f"headline queries without a plan budget: {missing}")


@pytest.mark.parametrize("name", sorted(_PLAN_BUDGET))
def test_plan_budget_ceilings(spark, name):
    """Execute the query at smoke scale and digest its FINAL adaptive
    plan (tools/plan_report.py's method): shuffle count, Python-stage
    count and source-scan count must not exceed the pinned ceilings
    (scans = the double-execution gate; see the table comment)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from plan_report import digest

    from cliqz_etl_spark.operators.cache import release_all

    max_shuffles, max_python, max_scans = _PLAN_BUDGET[name]
    try:
        df = _REGISTRY[name].fn(spark, SF_SMOKE)
        df.collect()
        d = digest(df._jdf.queryExecution().executedPlan().toString())
    finally:
        release_all()
    assert d["exchanges"] <= max_shuffles, (name, d)
    assert d["python"] <= max_python, (name, d)
    assert d["scans"] <= max_scans, (name, d)
