"""Scale stress harness: does the dedup/ANN family scale ~linearly from
sf0.1 to a 10x corpus? Generates a transient 50k-doc / 32k-vector
dataset under /tmp (Zipfian 10k-word vocabulary so shingle frequencies
look like real text, ~2% planted near-dups) and times the heavy
operators at both scales. Quadratic blowups show up as >>10x time
ratios; expected results are sub-linear (job overhead dominates).

Round-5 run (local[32], 16g heap; 10x docs, 16x vectors, 10x events
vs sf0.1): LSH 0.8x, simhash 2.4x, ngram-jaccard 2.9x, incremental
LSH 1.5x, SQ8 0.8x wall-clock; events family (1M events / 1.5k
Zipf-skewed users): sessionize 2.5x, session_stats 0.9x,
longest_streak 3.2x, as-of join 1.1x, weekly_retention 1.1x, funnel
1.7x, transition matrix 3.0x. The same
run at Spark's default 1g driver heap killed the JVM in the ngram
inverted-index join — see session.py's local-mode heap sizing.

A second data point at 200k docs (40x): LSH 2.3x, simhash 2.8x,
ngram-jaccard 9.6x wall-clock vs sf0.1 — the curve stays sub-linear
across both scale steps.

Usage: python tools/scale_stress.py   (not part of the pytest suite —
it takes minutes and writes ~100 MB under /tmp/sfstress)."""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/tmp/sfstress"
os.makedirs(OUT, exist_ok=True)
random.seed(11)
rng = np.random.default_rng(11)

# realistic shingle sparsity needs a real-sized vocabulary: 10k words
# with a Zipfian skew (a 50-word vocab makes every trigram a hot shingle,
# which no real corpus looks like)
import string as _string
_rw = random.Random(13)
VOCAB = ["".join(_rw.choice(_string.ascii_lowercase)
                 for _ in range(_rw.randint(3, 9)))
         for _ in range(10_000)]
_zipf_w = [1.0 / (i + 1) for i in range(len(VOCAB))]

def _zipf_words(r, n):
    return r.choices(VOCAB, weights=_zipf_w, k=n)

if not os.path.exists(f"{OUT}/documents.parquet"):
    n_docs = 50_000
    texts = []
    for i in range(n_docs):
        n = random.randint(20, 80)
        texts.append(" ".join(_zipf_words(random, n)))
    # plant ~2% near-dups so candidate generation has real work
    for i in range(0, n_docs, 50):
        j = (i + 1) % n_docs
        texts[j] = texts[i] + " extra"
    t = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([random.choice(["en", "de", "fr", "es"])
                          for _ in range(n_docs)]),
        "source": pa.array(["gen"] * n_docs),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, f"{OUT}/documents.parquet")

if not os.path.exists(f"{OUT}/embeddings.parquet"):
    n_vec = 32_000
    V = rng.normal(size=(n_vec, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    t = pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(V.tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array([i % 7 for i in range(n_vec)], pa.int64()),
    })
    pq.write_table(t, f"{OUT}/embeddings.parquet")

if not os.path.exists(f"{OUT}/events.parquet"):
    # 1M events / 1.5k users over 6 months — 10x the sf0.1 event volume,
    # with the same skew shape (a few hot users) the gate data has
    n_ev = 1_000_000
    n_users = 1_500
    user = rng.zipf(1.5, size=n_ev) % n_users
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01 in micros
    ts = base + rng.integers(0, np.int64(180 * 86_400_000_000), size=n_ev)
    types = np.array(["click", "view", "purchase", "signup"])
    t = pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 4, size=n_ev)]),
        "value": pa.array(rng.random(n_ev) * 100, pa.float64()),
        "props": pa.array(['{"k": 1}'] * n_ev),
    })
    pq.write_table(t, f"{OUT}/events.parquet")

from cliqz_etl_spark.operators.cache import release_all
from cliqz_etl_spark.operators.dedup import (
    lsh_candidate_pairs, ngram_jaccard_pairs, simhash_near_pairs,
    incremental_lsh_matches,
)
from cliqz_etl_spark.operators.similarity import sq8_topk
from cliqz_etl_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("stress", master="local[32]",
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()


def docs_at(path):
    return spark.read.parquet(f"{path}/documents.parquet")


def emb_at(path):
    return spark.read.parquet(f"{path}/embeddings.parquet")


def run(label, fn):
    t0 = time.perf_counter()
    n = fn().count()
    dt = time.perf_counter() - t0
    release_all()
    print(f"{label:38s} {dt:7.2f}s  rows={n}")
    return dt


SMALL = "/root/testdata/sf0.1"


def _rows(path, table):
    return pq.ParquetFile(f"{path}/{table}.parquet").metadata.num_rows


_sd, _bd = _rows(SMALL, "documents"), _rows(OUT, "documents")
_sv, _bv = _rows(SMALL, "embeddings"), _rows(OUT, "embeddings")
_se, _be = _rows(SMALL, "events"), _rows(OUT, "events")
print(f"small: {_sd} docs / {_sv} vecs / {_se} events   "
      f"big: {_bd} docs ({_bd/_sd:.0f}x) / {_bv} vecs ({_bv/_sv:.0f}x) / "
      f"{_be} events ({_be/_se:.0f}x)")
for name, make in [
    ("lsh_candidate_pairs", lambda p: lambda: lsh_candidate_pairs(
        docs_at(p), "doc_id", "text")),
    ("simhash_near_pairs", lambda p: lambda: simhash_near_pairs(
        docs_at(p), "doc_id", "text")),
    ("ngram_jaccard_pairs", lambda p: lambda: ngram_jaccard_pairs(
        docs_at(p), "doc_id", "text")),
    ("incremental_lsh_matches", lambda p: lambda: incremental_lsh_matches(
        docs_at(p).where(F.col("doc_id") % 5 == 0),
        docs_at(p).where(F.col("doc_id") % 5 != 0), "doc_id", "text")),
    ("sq8_topk", lambda p: lambda: sq8_topk(
        emb_at(p), emb_at(p).where(F.col("vec_id") % 500 == 0),
        "vec_id", "embedding", 64, 5, 20)),
]:
    t_small = run(f"{name} @small", make(SMALL))
    t_big = run(f"{name} @10x", make(OUT))
    print(f"{name:38s} ratio {t_big / t_small:5.1f}x")

# ---- events family (sessionization / as-of / retention shapes) ----------
# registry queries take an sf_dir; the stress dir has its own 10x events
# (other tables are read from sf0.1 via the small dir)
from cliqz_etl_spark.queries import load_all

registry = load_all()
for qname in ["sessionize", "session_stats", "longest_streak",
              "asof_last_click_before_purchase", "weekly_retention",
              "funnel_counts", "event_transition_matrix"]:
    fn = registry[qname].fn
    t_small = run(f"{qname} @small", lambda: fn(spark, SMALL))
    t_big = run(f"{qname} @10x", lambda: fn(spark, OUT))
    print(f"{qname:38s} ratio {t_big / t_small:5.1f}x")
