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
