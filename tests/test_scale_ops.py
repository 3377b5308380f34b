"""Scale-path operators: salting correctness (same answers as the naive
plan) and bucketed co-located joins (no Exchange in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cliqz_etl_spark.operators.relational import (
    salted_count,
    salted_join,
    write_bucketed,
)


def test_salted_count_matches_plain(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    got = {r["k"]: r["n"] for r in salted_count(df, "k").collect()}
    want = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want


def test_salted_join_matches_plain(spark):
    facts = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["k", "v"]).repartition(8)
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("unused", "U")],
                                ["k", "label"])
    got = sorted(tuple(r) for r in salted_join(facts, dim, "k").select("k", "v", "label").collect())
    want = sorted(tuple(r) for r in facts.join(dim, "k").select("k", "v", "label").collect())
    assert got == want and len(got) == 505


def test_bucketed_join_has_no_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    a = spark.range(0, 10000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("vb", F.col("id") * 3)
    write_bucketed(a, "t_bucket_a", "id", 8)
    write_bucketed(b, "t_bucket_b", "id", 8)
    joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located bucketed join: SMJ with no Exchange on either side
    assert "Exchange" not in plan, plan
    assert joined.count() == 10000
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_write_qualified_name_from_dirty_warehouse(spark):
    """db.table bucketed round-trip must survive an orphaned directory in
    the OWNING database's location (written by a dead session), and the
    orphan cleanup must scope to that database — a same-named directory
    in the default warehouse root is not touched."""
    import os

    from pyspark.sql import functions as F

    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    try:
        db_loc = spark.catalog.getDatabase("bktdb").locationUri
        db_path = db_loc.removeprefix("file:")
        orphan = os.path.join(db_path, "t_qual")
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "junk"), "w") as f:
            f.write("stale")
        # decoy with the same table name under the default db's layout:
        # must survive the qualified write untouched
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        decoy = os.path.join(wh, "t_qual")
        os.makedirs(decoy, exist_ok=True)
        with open(os.path.join(decoy, "keep"), "w") as f:
            f.write("mine")
        df = spark.range(0, 100).withColumn("v", F.col("id") * 7)
        write_bucketed(df, "bktdb.t_qual", "id", 4)
        assert spark.table("bktdb.t_qual").count() == 100
        assert os.path.exists(os.path.join(decoy, "keep"))
        # second overwrite goes through saveAsTable's own analysis
        write_bucketed(df.where("id < 50"), "bktdb.t_qual", "id", 4)
        assert spark.table("bktdb.t_qual").count() == 50
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
        import shutil
        shutil.rmtree(os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            "t_qual"), ignore_errors=True)


def test_bucketed_write_rejects_three_part_names(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError, match="db.table"):
        write_bucketed(df, "cat.db.t", "id", 4)


def test_valid_quantized_drops_unscorable_vectors(spark):
    """Elements outside the exact-int64 envelope — Inf, or merely huge
    finite values — saturate the double->long cast and then WRAP in the
    int64 numpy kernels; such vectors must be filtered out with the
    other un-scorable shapes, never scored. The bound is the SQ8-decode
    envelope (dim*(765*q)^2 <= 2^62): ~1985 at this test's dim=2 and
    ~350 at the engine's dim=64, so ordinary embedding magnitudes always
    pass and the out-of-range fixtures exceed both."""
    from cliqz_etl_spark.operators.similarity import valid_quantized

    rows = [(1, [1.0, 2.0]), (2, [float("inf"), 1.0]),
            (3, [float("-inf"), 1.0]), (4, [float("nan"), 1.0]),
            (5, None), (6, [1.0]), (7, [9.3e15, 1.0]), (8, [-1.0e6, 1.0]),
            (9, [300.0, -300.0]),
            # quantized-all-zero: cosine is 0/0 -> unscorable, dropped
            (10, [0.0, 0.0]), (11, [0.0002, -0.0002]),
            # quantizes to [1, 0]: nonzero, kept
            (12, [0.001, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["_id"] for r in valid_quantized(df, "vec_id", "embedding", 2).collect()}
    assert got == {1, 9, 12}


def test_quantization_envelope_formula():
    """The validity bound must keep EVERY downstream int64 product exact:
    worst case is SQ8's decoded element |rv| <= 765*qmax (mn*255 +
    code*rng with mn,rng <= qmax, 2*qmax), whose dim-length dot/norm
    must stay inside int64. Checked in exact integer arithmetic for the
    dims the engine uses and two extremes."""
    for dim in (1, 2, 64, 1024, 4096):
        qmax = int((2**62 / dim) ** 0.5) // 765
        assert qmax >= 1, f"envelope collapses at dim={dim}"
        worst_elem = 765 * qmax
        assert dim * worst_elem * worst_elem <= 2**63 - 1, dim
        # raw-quantized math (brute-force/IVF kernels) is even safer
        assert dim * qmax * qmax <= 2**63 - 1, dim
    # and normalized embeddings (|x| <= 1 -> q <= 1000) pass at dim=64
    assert 1000 <= int((2**62 / 64) ** 0.5) // 765


def test_sq8_topk_rejects_non_integral_ids(spark):
    import pytest

    from cliqz_etl_spark.operators.similarity import sq8_topk

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [2.0, 1.0])],
        "vec_id string, embedding array<double>")
    with pytest.raises(TypeError, match="integral id"):
        sq8_topk(df, df, "vec_id", "embedding", dim=2)


def test_release_all_covers_broadcasts(spark):
    """Broadcast models registered via track_broadcast are reclaimed by
    the same runner hook that unpersists cached frames."""
    from cliqz_etl_spark.operators.cache import release_all, track_broadcast

    release_all()  # drain anything earlier tests left behind
    bc = track_broadcast(spark.sparkContext.broadcast([1, 2, 3]))
    assert release_all() == 1
    assert bc.value == [1, 2, 3]  # driver copy survives unpersist


def test_connected_components_path_doubling_on_long_chain(spark):
    """A 200-node chain converges within 10 rounds only if the pointer-
    jumping shortcut actually doubles label reach per round (plain
    min-propagation would need ~199 rounds)."""
    from cliqz_etl_spark.operators.graph import connected_components

    n = 200
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]).repartition(8)
    labels = connected_components(edges, max_rounds=10)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """Probing 2 clusters must retrieve at least as many of the brute-force
    true top-k as probing 1 — and the scored candidate set only grows."""
    from tests.conftest import SF_SMOKE

    from cliqz_etl_spark.queries import load_all

    reg = load_all()
    truth = {}
    for r in reg["ann_topk"].fn(spark, SF_SMOKE).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(name):
        got = {}
        for r in reg[name].fn(spark, SF_SMOKE).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r2 = recall("ann_ivf"), recall("ann_ivf_multiprobe")
    assert r2 >= r1, (r1, r2)


def test_sq8_rerank_recovers_exact_topk(spark):
    """With rerank depth 4x k, the SQ8 approximate scan must not lose any
    of the brute-force true top-k on this corpus — 8-bit scalar
    quantization distorts cosines far less than the top-5/top-20 gap."""
    from tests.conftest import SF_SMOKE

    from cliqz_etl_spark.queries import load_all

    reg = load_all()
    truth = {(r["query_id"], r["neighbor_id"])
             for r in reg["ann_topk"].fn(spark, SF_SMOKE).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in reg["ann_sq8"].fn(spark, SF_SMOKE).collect()}
    assert truth, "brute-force baseline returned no pairs"
    assert truth <= got, (
        f"SQ8 lost {len(truth - got)} of {len(truth)} true neighbors")


def test_registered_bucketed_join_plan(spark):
    """The gate query joins its bucketed tables with no join-side Exchange:
    the only shuffle in the whole plan is the year-grouping aggregate."""
    from cliqz_etl_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = load_all()["bucketed_join_revenue"].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange") == 1, plan  # the groupBy agg only


def test_table_diff_null_semantics(spark):
    """A key whose value is NULL in both snapshots is UNCHANGED (dropped);
    NULL->value and value->NULL are 'changed'; presence is judged by the
    row, never by a value column's null-ness."""
    from cliqz_etl_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, 30), (4, 40)], "k int, v int")
    new = spark.createDataFrame(
        [(1, None), (2, 20), (3, None), (5, 50)], "k int, v int")
    got = {r["k"]: (r["change_type"], r["old_v"], r["new_v"])
           for r in table_diff(old, new, "k", ["v"]).collect()}
    assert got == {
        2: ("changed", None, 20),
        3: ("changed", 30, None),
        4: ("removed", 40, None),
        5: ("added", None, 50),
    }


def test_incremental_lsh_excludes_self_pairs_on_overlap(spark):
    """A document present in BOTH batch and corpus (at-least-once
    redelivery) must not match itself, while genuine near-dups of it in
    the corpus still surface."""
    from cliqz_etl_spark.operators.dedup import incremental_lsh_matches

    rows = [(i, "the quick brown fox jumps over the lazy dog every day")
            for i in (1, 2)] + [(3, "a completely different sentence "
                                    "about distributed query engines")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # batch = {1}; corpus = everything INCLUDING 1 (already ingested)
    got = {(r["new_id"], r["corpus_id"])
           for r in incremental_lsh_matches(
               docs.where("doc_id = 1"), docs,
               "doc_id", "text").collect()}
    assert (1, 1) not in got
    assert (1, 2) in got


def test_span_dedup_keeps_earliest_occurrence(spark):
    from cliqz_etl_spark.operators.dedup import span_dedup

    # k=2 chunks: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [a b]
    # "a b" survives only in doc 1 (earliest packed key); doc 3 empties.
    rows = [(1, "a b c d"), (2, "a b x y"), (3, "a b"), (4, "  ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", k=2).collect()}
    assert set(out) == {1, 2, 3}  # empty-trim doc 4 contributes no chunks
    assert out[1]["text_kept"] == "a b c d" and out[1]["n_dropped"] == 0
    assert out[2]["text_kept"] == "x y" and out[2]["n_dropped"] == 1
    assert out[3]["text_kept"] == "" and out[3]["n_kept"] == 0


def test_span_dedup_within_doc_repeats(spark):
    from cliqz_etl_spark.operators.dedup import span_dedup

    # The C4 rule dedupes WITHIN a doc too: [p q][p q] keeps position 0.
    df = spark.createDataFrame([(7, "p q p q")], ["doc_id", "text"])
    row = span_dedup(df, "doc_id", "text", k=2).collect()[0]
    assert row["text_kept"] == "p q"
    assert row["n_kept"] == 1 and row["n_dropped"] == 1


def test_span_dedup_reassembles_in_position_order(spark):
    from cliqz_etl_spark.operators.dedup import span_dedup

    # Doc with >10 unique chunks: order of reassembly must be positional,
    # not lexicographic (chunk_idx 10 sorts after 2 numerically).
    words = [f"w{i:03d} x{i:03d}" for i in range(12)]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = span_dedup(df, "doc_id", "text", k=2).collect()[0]
    assert row["text_kept"] == text and row["n_dropped"] == 0


def test_blocked_fuzzy_pairs_blocking_and_radius(spark):
    from cliqz_etl_spark.operators.relational import blocked_fuzzy_pairs

    rows = [
        (10, "red widget"), (11, "red widget"),  # duplicate name: one rep
        (20, "red widgit"),                      # dist 1 from red widget
        (30, "red gadget"),                      # dist 3 from red widget
        (40, "blue widget"),                     # other block: unseen pair
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = blocked_fuzzy_pairs(
        df, "id", "name", block=lambda c: F.substring_index(c, " ", 1),
        min_dist=1, max_dist=3).collect()
    pairs = {(r["name_a"], r["name_b"]): (r["rep_a"], r["rep_b"], r["dist"])
             for r in out}
    # reps collapse duplicates to min id; cross-block pair absent by design
    assert pairs[("red widget", "red widgit")] == (10, 20, 1)
    assert ("red gadget", "red widget") in pairs
    assert all("blue" not in a and "blue" not in b for a, b in pairs)
    # identical names are NOT pairs (dist 0 < min_dist, and single rep)
    assert all(r["dist"] >= 1 for r in out)


def test_unigram_broadcast_path_matches_shuffled(spark):
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries.textops import unigram_ppm

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a a a a"), (3, "b c d e f"), (4, "")],
        ["doc_id", "text"])
    try:
        plain = sorted(tuple(r) for r in unigram_ppm(df).collect())
        bcast_df = unigram_ppm(df, broadcast_vocab_limit=100)
        bcast = sorted(tuple(r) for r in bcast_df.collect())
        plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_all()
    assert plain == bcast
    assert "BroadcastHashJoin" in plan
    # the guard: a 6-word vocab must refuse a limit of 3
    try:
        unigram_ppm(df, broadcast_vocab_limit=3)
        raise AssertionError("expected ValueError for oversized vocab")
    except ValueError as e:
        assert "broadcast limit" in str(e)
    finally:
        release_all()


def test_kmeans_local_fit_bit_equals_distributed(spark):
    """kmeans_fit's driver-local path (one bounded sample collect, all
    Lloyd's rounds in local numpy) must be BIT-identical to the
    distributed path — same md5-ordered init, same integer argmin ties,
    same floor(sum/n + 0.5) rounding — on both a truncating sample
    (train_limit < n) and a covering one (train_limit >= n, which must
    also equal the unlimited full-corpus fit)."""
    from cliqz_etl_spark.operators.similarity import kmeans_fit
    from cliqz_etl_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    for limit in (120, 100_000):
        local = kmeans_fit(emb, "vec_id", "embedding", k=10, n_iter=2,
                           train_limit=limit, driver_local=True)
        dist = kmeans_fit(emb, "vec_id", "embedding", k=10, n_iter=2,
                          train_limit=limit, driver_local=False)
        assert local == dist, f"train_limit={limit}"
    full = kmeans_fit(emb, "vec_id", "embedding", k=10, n_iter=2)
    covering = kmeans_fit(emb, "vec_id", "embedding", k=10, n_iter=2,
                          train_limit=100_000)
    assert covering == full, "covering sample must equal the unlimited fit"


def test_every_query_survives_an_empty_corpus(spark, tmp_path):
    """Production corpora have empty days/partitions: every registry query
    must either return a (possibly empty) result or fail with a LOUD
    driver-side ValueError — never an opaque worker traceback. The model
    -training family (kmeans/IVF/semantic) is the deliberate ValueError
    set: you cannot train a quantizer on nothing."""
    import duckdb
    import os

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.tables import TABLES

    empty = str(tmp_path / "empty_sf")
    os.makedirs(empty)
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            duckdb.sql(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 0) "
                f"TO '{empty}/{t}.parquet' (FORMAT PARQUET)")
    trains_a_model = {
        "kmeans_centroids", "ivf_clusters", "ivf_clusters_trained",
        "ann_ivf", "ann_ivf_multiprobe", "embedding_near_pairs",
        "dedup_semantic",
        # PQ/IVFPQ cannot build codebooks from nothing (round-8)
        "ann_pq", "ann_ivfpq",
        # topic labeling trains the same coarse quantizer (round-9)
        "cluster_topics",
        # PCA cannot fit a component to an empty corpus (round-11)
        "pca_top_component",
        # the probe-recall curve trains the same coarse quantizer as
        # ann_ivf — no centroids on an empty corpus (round-11)
        "ivf_probe_recall_sweep",
        # the GD fit has no labeled rows, and the recall eval trains the
        # same IVF coarse quantizer as ann_ivf (round-11)
        "logistic_gd_steps", "ann_recall_eval",
    }
    ugly = []
    for name, q in load_all().items():
        try:
            rows = q.fn(spark, empty).collect()
            assert len(rows) >= 0
            assert name not in trains_a_model, (
                f"{name} trained a model on an empty corpus?")
        except ValueError:
            if name not in trains_a_model:
                ugly.append((name, "ValueError outside the training family"))
        except Exception as e:
            ugly.append((name, type(e).__name__))
        finally:
            release_all()
    assert not ugly, ugly


def test_lsh_star_pairs_linear_output_same_components(spark):
    """On a boilerplate-heavy corpus (one big identical group), star mode
    must emit O(n) edges where full mode emits O(n^2) — with exactly the
    same connected components."""
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.dedup import lsh_candidate_pairs
    from cliqz_etl_spark.operators.graph import connected_components

    boiler = "terms of service apply to all users of this site always"
    rows = ([(i, boiler) for i in range(60)]
            + [(100 + i, f"unique document number {i} about topic {i}")
               for i in range(5)])
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def components(pairs):
        edges = (pairs.selectExpr("id_a as src", "id_b as dst")
                 .union(pairs.selectExpr("id_b as src", "id_a as dst")))
        return {(r["node"], r["label"])
                for r in connected_components(edges, max_rounds=8).collect()}

    try:
        full = lsh_candidate_pairs(df, "doc_id", "text").collect()
        release_all()
        star_df = lsh_candidate_pairs(df, "doc_id", "text", star=True)
        star = star_df.collect()
        release_all()
        # 60 identical docs: full mode = 60*59/2 pairs, star mode = 59
        assert len(full) >= 60 * 59 // 2
        assert len(star) <= 59 + 5 * 4  # linear bound (plus any tiny-group links)
        # identical connectivity
        full_df = lsh_candidate_pairs(df, "doc_id", "text")
        assert components(full_df) == components(star_df)
    finally:
        release_all()


def test_dedup_family_null_text_contract(spark):
    """Family-wide NULL semantics: a NULL-text document is excluded from
    every dedup operator's output — it never pairs with another NULL, an
    empty string, or anything else. Empty strings remain comparable
    (two '' docs ARE exact duplicates)."""
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.dedup import (
        exact_duplicates,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )

    rows = [(1, "hello world common text"), (2, "hello world common text"),
            (3, None), (4, None), (5, ""), (6, ""), (7, "quite different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        exact = exact_duplicates(df, "doc_id", "text").collect()
        groups = {r["canonical_id"]: r["n_copies"] for r in exact}
        assert groups == {1: 2, 5: 2, 7: 1}  # no NULL group
        for fn in (lsh_candidate_pairs, simhash_near_pairs, ngram_jaccard_pairs):
            pairs = {(r["id_a"], r["id_b"]) for r in fn(df, "doc_id", "text").collect()}
            release_all()
            assert all(3 not in p and 4 not in p for p in pairs), (fn.__name__, pairs)
            assert (1, 2) in pairs and (5, 6) in pairs, (fn.__name__, pairs)
    finally:
        release_all()


def test_semantic_verdicts_sampled_fit(spark):
    """train_limit caps the k-means fit sample but assignment and the
    verdict join still cover the FULL corpus: every vector gets a verdict,
    planted near-dup pairs still drop their higher id, and the sampled
    model is deterministic across invocations."""
    import random

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.similarity import semantic_verdicts

    r = random.Random(5)
    base = [[r.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    rows = [(i, base[i]) for i in range(40)]
    rows += [(100 + i, [x * 1.0001 for x in base[i]]) for i in range(10)]  # near-dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    try:
        out1 = semantic_verdicts(df, "vec_id", "embedding", 8, k=4,
                                 train_limit=16)
        got1 = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out1.collect()}
        release_all()
        assert set(got1) == {r[0] for r in rows}  # full corpus covered
        # each planted clone pair resolved: the higher id dropped whenever
        # the pair landed in one cluster (cosine ~1 >= 0.4 threshold)
        same_cluster = [i for i in range(10) if got1[i][0] == got1[100 + i][0]]
        assert same_cluster, "expected at least one co-clustered clone pair"
        assert all(got1[100 + i][1] is False for i in same_cluster)
        out2 = semantic_verdicts(df, "vec_id", "embedding", 8, k=4,
                                 train_limit=16)
        got2 = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out2.collect()}
        release_all()
        assert got1 == got2  # deterministic sample -> deterministic model
        try:
            semantic_verdicts(df, "vec_id", "embedding", 8, k=20, train_limit=8)
            raise AssertionError("expected ValueError: train_limit < k")
        except ValueError as e:
            assert "train_limit" in str(e)
    finally:
        release_all()


def test_ranged_cumsum_is_deterministic_and_exact_at_scale(spark):
    """Regression for the round-8 sampled-boundary race: ranged_cumsum's
    range exchange fans out to two consumers (within-range windows,
    per-range totals); before the _pin_ranges persist, each branch could
    re-sample DIFFERENT boundaries when the optimizer did not reuse the
    exchange, and the offsets silently corrected the wrong partials —
    ks_drift returned a different KS max on every run at sf0.01. This
    pins both properties the fix restores on a frame big enough to
    actually split across ranges: equality with the single-task global
    window, and run-to-run stability."""
    from pyspark.sql import Window

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.stats import ranged_cumsum

    df = (spark.range(20_000)
          .select((F.conv(F.substring(F.md5(F.col("id").cast("string")),
                                      1, 15), 16, 10).cast("long"))
                  .alias("k"),
                  (F.col("id") % 97 + 1).alias("v"))
          .groupBy("k").agg(F.sum("v").alias("v")))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["k"]: r["c"]
            for r in df.select("k", F.sum("v").over(w).alias("c")).collect()}
    seen = []
    for _ in range(3):
        got = {r["k"]: r["cum_v"]
               for r in ranged_cumsum(df, "k", ["v"], n_ranges=16).collect()}
        release_all()
        seen.append(got)
    assert seen[0] == want
    assert seen[1] == seen[0] and seen[2] == seen[0]
