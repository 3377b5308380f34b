"""Property-based checks (hypothesis): engine-portable hashing, shingle
semantics vs a plain-Python model, and try-cast error->NULL parity with
DuckDB on arbitrary inputs. Each property batches its examples into one
Spark job — hypothesis drives the data, not the job count."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import md5_long, md5_long_sql
from cliqz_etl_spark.functions.text import tokens, word_shingles

TEXTISH = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=30))
def test_md5_long_cross_engine_parity(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r[0] for r in df.select(md5_long("s")).collect()]
    con = duckdb.connect()
    want = [con.execute(f"SELECT {md5_long_sql('?')}", [s]).fetchone()[0] for s in strings]
    assert got == want


def _py_tokens(s: str) -> list[str]:
    return s.strip().split() if s.strip() else []


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=30))
def test_token_shingle_model(spark, strings):
    """word_shingles matches the plain-Python reference model: all k-grams
    for len>=k, else one whole-text shingle."""
    # Spark's \s+ and Python's str.split() disagree on exotic unicode
    # whitespace; normalize the fixture to ASCII-space-separated.
    strings = [" ".join(_py_tokens(s)) for s in strings]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r[0] for r in df.select(word_shingles("s", 3).alias("sh")).collect()]
    for s, sh in zip(strings, got):
        toks = _py_tokens(s)
        if len(toks) >= 3:
            want = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        else:
            want = [" ".join(toks)]
        assert sh == want, (s, sh, want)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.one_of(TEXTISH, st.integers(-10**17, 10**17).map(str)),
                min_size=1, max_size=30))
def test_try_cast_long_matches_duckdb(spark, strings):
    """clean_cast('long') and its generated DuckDB fragment agree on any
    input: same accepted strings, same NULLs — the pinned cross-engine
    contract behind every oracle that casts. Raw try_cast vs TRY_CAST
    diverge (Spark trims ISO control chars, DuckDB accepts '4.0'/'1e3'/
    '0x10'), which is why both sides run through the guarded pair."""
    from cliqz_etl_spark.functions.scalars import clean_cast, clean_cast_sql

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = [r[0] for r in df.select(clean_cast("s", "long")).collect()]
    con = duckdb.connect()
    frag = clean_cast_sql("s", "long")
    want = [con.execute(f"SELECT {frag} FROM (SELECT ? AS s)", [s]).fetchone()[0]
            for s in strings]
    assert got == want


def test_clean_cast_pinned_divergence_cases(spark):
    """Deterministic pin of the inputs where raw engine casts disagree
    (hypothesis's cached falsifying example '0\\x1f' is machine-local;
    this keeps the contract checked everywhere). Spark's try_cast trims
    ISO control chars ('0\\x1f'->0); DuckDB's TRY_CAST reads '4.0'/'1e3'/
    '0x10' as BIGINT; the guarded pair must NULL all of them, and agree
    on ordinary whitespace-padded integers and overflow."""
    from cliqz_etl_spark.functions.scalars import clean_cast, clean_cast_sql

    cases = ["0\x1f", "\x1f42", "\x0042", "\x7f42", "4.0", "1e3", "0x10",
             " 42 ", "\t+7\n", "-0", "9223372036854775807",
             "9223372036854775808", "", " ", None,
             # Java's $ matches before a final line terminator; the \z
             # anchor in the guard must reject these on BOTH engines
             "42\u0085", "42\u2028", "42\u2029"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r[0] for r in df.select(clean_cast("s", "long")).collect()]
    con = duckdb.connect()
    frag = clean_cast_sql("s", "long")
    want = [con.execute(f"SELECT {frag} FROM (SELECT ? AS s)", [s]).fetchone()[0]
            for s in cases]
    assert got == want
    expect = [None, None, None, None, None, None, None,
              42, 7, 0, 9223372036854775807, None, None, None, None,
              None, None, None]
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=30))
def test_token_count_nonnegative_and_stable(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    a = [r[0] for r in df.select(F.size(tokens("s"))).collect()]
    b = [r[0] for r in df.select(F.size(tokens("s"))).collect()]
    assert a == b
    assert all(x >= 0 for x in a)


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=60,
))
def test_connected_components_matches_union_find(spark, pairs):
    """Path-doubling CC labels equal a plain-Python union-find's component
    minima on arbitrary random graphs."""
    from cliqz_etl_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}

    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"])
    got = {r["node"]: r["label"]
           for r in connected_components(edges, max_rounds=12).collect()}
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.sampled_from("abc"), min_size=1, max_size=40))
def test_scd2_changelog_roundtrip(spark, values):
    """SCD2 compression invariants on one key's log: versions alternate in
    value, n_rows sums to the log length, [valid_from, valid_to) intervals
    chain exactly, and exactly one version is current."""
    from cliqz_etl_spark.operators.merge import scd2_from_changelog

    rows = [(1, v, f"2024-01-01 00:{i:02d}:00", i) for i, v in enumerate(values)]
    log = spark.createDataFrame(rows, ["k", "val", "ts_s", "seq"]).select(
        "k", "val", F.to_timestamp("ts_s").alias("ts"), "seq")
    hist = (scd2_from_changelog(log, "k", "val", "ts", "seq")
            .orderBy("valid_from").collect())
    assert sum(r["n_rows"] for r in hist) == len(values)
    assert [r["is_current"] for r in hist] == [0] * (len(hist) - 1) + [1]
    assert hist[-1]["valid_to"] is None
    for prev, cur in zip(hist, hist[1:]):
        assert prev["valid_to"] == cur["valid_from"]
        assert prev["val"] != cur["val"]
    # compressed values = run-length-collapsed input
    collapsed = [v for i, v in enumerate(values) if i == 0 or v != values[i - 1]]
    assert [r["val"] for r in hist] == collapsed


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
             min_size=1, max_size=15),  # history: (key, t, value)
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)),
             min_size=1, max_size=15),  # facts: (key, t)
)
def test_point_in_time_join_matches_model(spark, hist_rows, fact_rows):
    """PIT join equals the brute-force 'latest version with t <= fact t'
    model on random inputs (versions deduped per (key, t) — SCD2 histories
    have unique version starts)."""
    from cliqz_etl_spark.operators.merge import point_in_time_join

    hist = {}
    for k, t, v in hist_rows:     # last write wins per (key, t) for the model
        hist[(k, t)] = v
    hist_list = [(k, f"{t:04d}", v) for (k, t), v in hist.items()]

    def model(k, t):
        versions = [(vt, v) for (hk, vt), v in hist.items() if hk == k and vt <= t]
        return max(versions)[1] if versions else None

    h = spark.createDataFrame(hist_list, ["k", "vt", "val"])
    f = spark.createDataFrame(
        [(k, f"{t:04d}", i) for i, (k, t) in enumerate(fact_rows)],
        ["k", "ft", "fid"])
    got = {r["fid"]: r["val"]
           for r in point_in_time_join(f, h, "k", "ft", "vt", "val").collect()}
    want = {i: model(k, t) for i, (k, t) in enumerate(fact_rows)}
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12)
      .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=12))
def test_span_dedup_matches_python_model(spark, texts):
    """span_dedup against a plain-Python replay of the C4 rule on random
    small-vocab corpora (tiny alphabet forces chunk collisions): the kept
    text per doc, and the kept/dropped accounting, must match exactly."""
    from cliqz_etl_spark.operators.dedup import span_dedup

    k = 2
    rows = [(i, t) for i, t in enumerate(texts)]
    # python model: earliest (doc_id, chunk_idx) wins per distinct chunk
    chunks = {}  # chunk -> (doc_id, idx)
    per_doc = {}  # doc_id -> [(idx, chunk)]
    for doc_id, t in rows:
        toks = t.split()
        if not t.strip():
            continue
        per_doc[doc_id] = []
        for idx in range(0, (len(toks) + k - 1) // k):
            c = " ".join(toks[idx * k: idx * k + k])
            per_doc[doc_id].append((idx, c))
            if c not in chunks or (doc_id, idx) < chunks[c]:
                chunks[c] = (doc_id, idx)
    want = {}
    for doc_id, cs in per_doc.items():
        kept = [(i, c) for i, c in cs if chunks[c] == (doc_id, i)]
        want[doc_id] = (" ".join(c for _, c in kept), len(kept),
                        len(cs) - len(kept))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_kept"], r["n_kept"], r["n_dropped"])
           for r in span_dedup(df, "doc_id", "text", k).collect()}
    from cliqz_etl_spark.operators.cache import release_all
    release_all()
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["red", "blu", "new"]),
              st.text(alphabet="abcd", min_size=1, max_size=6)),
    min_size=2, max_size=12))
def test_blocked_fuzzy_pairs_matches_bruteforce_model(spark, parts):
    """blocked_fuzzy_pairs vs a plain-Python model: within-block pairs at
    levenshtein 1..3, reps = min id per distinct name. Tiny alphabets force
    name collisions (rep collapse) and near-miss edit distances."""
    from cliqz_etl_spark.operators.relational import blocked_fuzzy_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = [(i, f"{blk} {suf}") for i, (blk, suf) in enumerate(parts)]
    reps = {}
    for i, name in rows:
        reps.setdefault(name, i)
    names = sorted(reps)
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a.split(" ", 1)[0] == b.split(" ", 1)[0] and 1 <= lev(a, b) <= 3:
                want.add((a, b, reps[a], reps[b], lev(a, b)))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {tuple(r) for r in blocked_fuzzy_pairs(
        df, "id", "name", block=lambda c: F.substring_index(c, " ", 1),
        min_dist=1, max_dist=3).collect()}
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(["the", "of", "and", "ab", "xyzw", "##", "!!", "a1"]),
             min_size=0, max_size=16).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=10))
def test_gopher_metrics_match_python_model(spark, texts):
    """gopher_metrics vs a plain-Python replay of the five rule inputs —
    the vocabulary mixes stopwords, symbol runs, and alnum tokens so every
    metric moves."""
    import re

    from cliqz_etl_spark.queries.textops import gopher_metrics

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tok"], r["total_chars"], r["n_alpha"],
                         r["n_sym"], r["n_stop"])
           for r in gopher_metrics(df).collect()}
    stop5 = ["the", "a", "of", "and", "to"]
    for i, t in rows:
        toks = t.strip().split() if t.strip() else []
        want = (
            len(toks),
            sum(len(w) for w in toks),
            sum(1 for w in toks if re.search(r"[A-Za-z]", w)),
            sum(1 for w in toks if not re.search(r"[A-Za-z0-9]", w)),
            sum(1 for w in stop5 if w in toks),
        )
        assert got[i] == want, (t, got[i], want)


def test_text_family_null_text_cross_engine_parity(spark):
    """NULL/empty/regular text through the text-analysis gate queries,
    compared against their OWN oracle SQL over the same rows: Spark's
    size(NULL)=-1 legacy vs DuckDB's len(NULL)=NULL used to silently
    diverge here — nothing in the driver corpus has NULL text, so only
    this fixture exercises the contract."""
    from cliqz_etl_spark.queries import load_all
    from tests.oracle_harness import _hash_rows

    registry = load_all()
    rows = [(1, None, "en", "s", 0), (2, "", "en", "s", 0),
            (3, "the of and to a ok", "en", "s", 18),
            (4, "  ", "de", "s", 2)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    sdf.createOrReplaceTempView("__nulldocs")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    import tempfile
    tmp = tempfile.mkdtemp(prefix="nulldocs_")
    sdf.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    for name in ["text_stats", "lang_id", "text_quality", "gopher_quality_filter",
                 "array_ops_gauntlet"]:
        q = registry[name]
        got = q.fn(spark, tmp)
        g_cols, g_rows = got.columns, [tuple(r) for r in got.collect()]
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
        assert sorted(g_cols) == sorted(d_cols), name
        assert _hash_rows(g_cols, g_rows) == _hash_rows(d_cols, d_rows), (
            name, sorted(g_rows), sorted(d_rows))


def test_fingerprint_and_tokens_unicode_cross_engine_parity(spark):
    """Multi-byte and astral text through the char-slicing fragments:
    Spark's substr and DuckDB's substr must both count CODEPOINTS (a
    UTF-16-code-unit slicer would shear surrogate pairs and hash different
    shingles). Pinned because the driver corpus is pure ASCII."""
    from cliqz_etl_spark.functions.hashing import md5_long_sql
    from cliqz_etl_spark.functions.text import fingerprint, token_count

    cases = ["hello plain ascii text", "naïve café résumé over",
             "日本語のテキストです短い", "emoji 😀😀 in the middle",
             "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral letters", "mixed 😀 日本 ascii ok"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "doc_id long, text string")
    got = {r["doc_id"]: (r["f"], r["n"]) for r in df.select(
        "doc_id", fingerprint("text", 8).alias("f"),
        token_count("text").alias("n")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(cases):
        want_f = con.execute(
            f"""SELECT list_min(list_transform(
                    range(1, greatest(length(text) - 7, 1) + 1),
                    i -> {md5_long_sql("substr(text, CAST(i AS INTEGER), 8)")}))
                FROM (SELECT ? AS text)""", [s]).fetchone()[0]
        want_n = con.execute(
            "SELECT CASE WHEN trim(text)='' THEN 0 ELSE "
            "len(string_split_regex(trim(text),'\\s+')) END "
            "FROM (SELECT ? AS text)", [s]).fetchone()[0]
        assert got[i] == (want_f, want_n), (s, got[i], (want_f, want_n))


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=25,
))
def test_pagerank_matches_python_reference(spark, pairs):
    """The distributed integer-exact PageRank equals a plain-Python replay
    of the same floor-division recurrence on arbitrary random digraphs."""
    from cliqz_etl_spark.operators.graph import pagerank

    SCALE, N_ITER = 1_000_000, 3
    edges = sorted(set(pairs))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    rank = {n: SCALE for n in nodes}
    base = (SCALE * 15) // 100
    for _ in range(N_ITER):
        inbound = {n: 0 for n in nodes}
        for a, b in edges:
            inbound[b] += rank[a] // deg[a]
        rank = {n: base + (85 * inbound[n]) // 100 for n in nodes}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, N_ITER).collect()}
    assert got == rank


@settings(max_examples=4, deadline=None)
@given(st.lists(st.lists(st.sampled_from(
    ["a", "b", "c", "dd", "ee", "ff", "gg", "zz"]),
    min_size=1, max_size=8).map(lambda ws: " ".join(ws)),
    min_size=2, max_size=12))
def test_prefix_filter_equals_bruteforce_allpairs(spark, texts):
    """The prefix-filter theorem, pinned against brute force: on random
    corpora, dedup_prefix_filter must return EXACTLY the pairs whose
    word-SET Jaccard clears the 0.7 threshold — no false negatives from
    prefix indexing, no false positives from the verify step. The tiny
    vocabulary forces heavy token sharing (many candidates, many
    near-threshold pairs — the regime where an off-by-one prefix length
    silently drops pairs)."""
    import tempfile

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all

    # plant a clone pair so at least one jac=1.0 pair always exists
    texts = list(texts)
    texts[-1] = texts[0]
    rows = [(i, t, "en", "fuzz", len(t)) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    tmp = tempfile.mkdtemp(prefix="pfprop_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        q = load_all()["dedup_prefix_filter"]
        try:
            got = {(r["doc_a"], r["doc_b"]): r["jac_x1000"]
                   for r in q.fn(spark, tmp).collect()}
        finally:
            release_all()
        sets = {i: set(t.split()) for i, t in enumerate(texts) if t.strip()}
        want = {}
        ids = sorted(sets)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if 10 * inter >= 7 * union:
                    want[(a, b)] = (1000 * inter) // union
        assert got == want, (texts, got, want)
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(-10**6, 10**6), st.integers(-10**9, 10**9)),
    min_size=1, max_size=60))
def test_ranged_cummax_matches_global_window(spark, rows):
    """ranged_cummax (inclusive and exclusive) equals the single-task
    global-window running max on arbitrary data, including duplicate
    order keys (pre-aggregated away, per the operator's contract) and
    negative values."""
    from pyspark.sql import Window

    from cliqz_etl_spark.operators.stats import ranged_cummax

    df = (spark.createDataFrame(rows, ["k", "v"])
          .groupBy("k").agg(F.max("v").alias("v")))
    for exclusive in (False, True):
        got = {r["k"]: r["cummax_v"]
               for r in ranged_cummax(df, "k", ["v"],
                                      exclusive=exclusive,
                                      n_ranges=4).collect()}
        hi = -1 if exclusive else 0
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
        want = {r["k"]: r["want"]
                for r in df.select("k", F.max("v").over(w).alias("want")).collect()}
        assert got == want, (exclusive, got, want)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200),
       st.integers(2, 8))
def test_mg_candidates_superset_of_heavy_hitters(spark, items, k):
    """The Misra-Gries screen never loses a true heavy hitter
    (count * k > n), for any partitioning — forced here to a skewed
    4-way repartition to exercise the per-partition merge."""
    from collections import Counter

    from cliqz_etl_spark.operators.stats import mg_candidates

    df = spark.createDataFrame([(w,) for w in items], ["w"]).repartition(4)
    cand = {r["w"] for r in mg_candidates(df, "w", k).collect()}
    counts = Counter(items)
    heavy = {w for w, c in counts.items() if c * k > len(items)}
    assert heavy <= cand, (heavy, cand, k)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60,
                unique=True),
       st.integers(2, 7))
def test_ranged_ntile_matches_global_ntile(spark, keys, k):
    """ranged_ntile's closed-form bucket arithmetic over ranged prefix
    ranks equals the real global-window ntile(k) for every N/k remainder
    case, including N < k (each row its own bucket)."""
    from pyspark.sql import Window

    from cliqz_etl_spark.operators.stats import ranged_ntile

    df = spark.createDataFrame([(x,) for x in keys], ["k"])
    got = {r["k"]: r["b"]
           for r in ranged_ntile(df, ["k"], k, "b", n_ranges=4).collect()}
    w = Window.orderBy("k")
    want = {r["k"]: r["want"]
            for r in df.select(
                "k", F.ntile(k).over(w).cast("long").alias("want")).collect()}
    assert got == want, (k, got, want)


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(0, 200_000), min_size=1, max_size=80))
def test_elias_fano_roundtrip_and_size_formula(ids):
    """decode(encode(x)) == x for arbitrary sorted id sets, and the blob
    length equals the closed-form payload size the oracle states."""
    from cliqz_etl_spark.functions.eliasfano import (ef_decode, ef_encode,
                                                     ef_params)

    seq = sorted(ids)
    blob = ef_encode(seq)
    assert ef_decode(blob) == seq
    _, bits = ef_params(len(seq), seq[-1])
    assert len(blob) == 16 + (bits + 7) // 8


def test_elias_fano_rejects_malformed():
    import pytest

    from cliqz_etl_spark.functions.eliasfano import ef_decode, ef_encode

    with pytest.raises(ValueError):
        ef_encode([])
    with pytest.raises(ValueError):
        ef_encode([3, 3])          # not strictly increasing
    with pytest.raises(ValueError):
        ef_encode([-1, 4])
    blob = ef_encode([1, 5, 9])
    with pytest.raises(ValueError):
        ef_decode(blob[:10])       # truncated header
    with pytest.raises(ValueError):
        ef_decode(blob + b"\x00")  # payload size mismatch
    with pytest.raises(ValueError):
        ef_encode([1, 1 << 64])    # id overflows the 64-bit header
    # round-9 advice: a high-bit vector with fewer than n set bits must
    # raise the documented ValueError, not IndexError — n=1, max_id=32
    # makes payload_bits a byte multiple, so the old post-increment guard
    # read one byte past the buffer before it could fire
    ok = ef_encode([32])
    zeroed = bytearray(ok)
    for i in range(16, len(zeroed)):
        zeroed[i] = 0
    with pytest.raises(ValueError, match="high-bit vector"):
        ef_decode(bytes(zeroed))


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14)
    .map(" ".join),
    min_size=1, max_size=10))
def test_substring_removal_matches_python_model(spark, texts):
    """dedup_substring_removal against a plain-Python replay of the
    Lee-et-al rule on tiny-vocab corpora (3-letter alphabet forces
    stride-1 window collisions within and across docs): per-doc token
    totals, survivor counts, removal-run counts, and the rebuilt text
    length must all match exactly. A planted clone pair guarantees the
    cross-doc removal path always fires."""
    import shutil
    import tempfile

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.queries.dedup import SUBSTR_W as W

    if len(texts) >= 2:
        texts[-1] = texts[0]
    rows = [(i, t, "en", "prop", len(t)) for i, t in enumerate(texts)]

    # python model: windows keyed by their TEXT (the engine keys the
    # 60-bit md5; a collision on <=150 windows is ~1e-16); earliest
    # packed (doc_id, win_idx) survives, every later occurrence's W
    # positions are removed
    keep: dict[str, tuple[int, int]] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, t in [(r[0], r[1]) for r in rows]:
        if not t.strip():
            continue
        toks = t.split()
        per_doc[doc_id] = toks
        for i in range(max(len(toks) - W + 1, 0)):
            win = " ".join(toks[i:i + W])
            if win not in keep or (doc_id, i) < keep[win]:
                keep[win] = (doc_id, i)
    want = {}
    for doc_id, toks in per_doc.items():
        covered = set()
        for i in range(max(len(toks) - W + 1, 0)):
            win = " ".join(toks[i:i + W])
            if keep[win] != (doc_id, i):
                covered.update(range(i, i + W))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        runs = sum(1 for p in sorted(covered)
                   if p - 1 not in covered)
        want[doc_id] = (len(toks), len(kept), runs,
                        len(" ".join(kept)))

    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    tmp = tempfile.mkdtemp(prefix="subrm_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet")
        fn = load_all()["dedup_substring_removal"].fn
        got = {r["doc_id"]: (r["n_tok"], r["n_kept_tok"],
                             r["n_removed_runs"], r["kept_len"])
               for r in fn(spark, tmp).collect()}
    finally:
        release_all()
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 10)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=20,
))
def test_pagerank_assume_distinct_matches_default(spark, pairs):
    """``assume_distinct=True`` (the round-13 shuffle-skip for callers
    whose edge list is distinct by construction) must be a pure plan
    optimization: on an already-distinct edge list it returns exactly
    the default path's ranks."""
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.graph import pagerank

    edges = sorted(set(pairs))
    df = spark.createDataFrame(edges, ["src", "dst"])
    try:
        want = {r["node"]: r["rank"] for r in pagerank(df, 3).collect()}
        got = {r["node"]: r["rank"]
               for r in pagerank(df, 3, assume_distinct=True).collect()}
    finally:
        release_all()
    assert got == want


def test_ivf_prebuilt_index_matches_inline_build(spark):
    """``ivf_topk(index=ivf_build_index(...))`` — the round-13 sharing
    path ivf_probe_recall_sweep uses to build the index once across
    probe configs — must return exactly the inline-build result for
    every n_probe it is reused under."""
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.operators.similarity import ivf_build_index, ivf_topk
    from cliqz_etl_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = emb.where(F.col("vec_id") % 25 == 0)
    try:
        index = ivf_build_index(emb, cents, "vec_id", "embedding")
        for n_probe in (1, 2):
            want = ivf_topk(emb, cents, emb.where(F.col("vec_id") % 10 == 0),
                            "vec_id", "embedding", k=3,
                            n_probe=n_probe).collect()
            got = ivf_topk(emb, cents, emb.where(F.col("vec_id") % 10 == 0),
                           "vec_id", "embedding", k=3, n_probe=n_probe,
                           index=index).collect()
            assert sorted(map(tuple, got)) == sorted(map(tuple, want)), n_probe
    finally:
        release_all()
