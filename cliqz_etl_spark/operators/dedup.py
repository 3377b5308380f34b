"""Deduplication operators for document-scale corpora.

Four families, each designed so candidate generation is a *bucketed
equi-join* — never an all-pairs cross join — because at 100 TB the only
viable dedup shape is "hash rows into buckets, compare within buckets":

- exact:          md5 group-by (one shuffle on the hash).
- MinHash + LSH:  per-row signatures computed columnar (array_min over
                  transform — zero shuffle, zero explode), then banded
                  bucket join. Shuffle width = n_bands × n_docs rows.
- SimHash:        columnar bit-majority fingerprint; candidate pairs via
                  band-chunk equi-join with the pigeonhole guarantee
                  (hamming <= n_bands - 1 implies >= 1 identical chunk, so
                  there are NO false negatives at the configured radius).
- n-gram Jaccard: inverted shingle index join with per-shingle
                  frequency cutoff available for skew control.

All hashing is the engine-portable md5 family (functions/hashing.py), so
every operator here is verifiable against a DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cliqz_etl_spark.functions.hashing import md5_long, md5_long_seeded
from cliqz_etl_spark.functions.text import tokens, word_shingles

# ---------------------------------------------------------------- exact --

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts: (text_md5, canonical_id, n_copies).
    Canonical row = minimum id. One shuffle, map-side partial agg."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -------------------------------------------------------------- MinHash --

def minhash_signature(text_col: str | Column, n_perm: int = 16,
                      shingle_k: int = 3) -> list[Column]:
    """n_perm MinHash values as individual columns ``mh_i``.

    Computed entirely per-row: shingle array -> transform with the seeded
    hash family -> array_min. No explode, no shuffle; at scale this is
    scan-side map work fused into whole-stage codegen.

    NB: the per-seed lambda must be built by a factory with arity 1 —
    F.transform dispatches on lambda arity, so a `lambda s, seed=seed`
    binding would receive the array INDEX as its second argument."""
    sh = word_shingles(text_col, shingle_k)

    def hasher(seed: int):
        return lambda s: md5_long_seeded(s, seed)

    return [
        F.array_min(F.transform(sh, hasher(seed))).alias(f"mh_{seed}")
        for seed in range(n_perm)
    ]


def minhash_band_buckets(df: DataFrame, id_col: str, text_col: str,
                         n_perm: int = 16, n_bands: int = 4,
                         shingle_k: int = 3) -> DataFrame:
    """(id, band, bucket) rows: each doc lands in n_bands buckets, where
    bucket = md5 of its band's signature slice. Docs agreeing on all rows
    of any band share a bucket (the LSH S-curve: t ~ (1/b)^(1/r))."""
    rows_per_band = n_perm // n_bands
    sigs = df.select(F.col(id_col).alias("_id"), *minhash_signature(text_col, n_perm, shingle_k))
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            md5_long(F.concat_ws(",", *[
                F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)
            ])).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return (
        sigs.select("_id", F.explode(bands).alias("bb"))
        .select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_perm: int = 16, n_bands: int = 4,
                        shingle_k: int = 3) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from MinHash-LSH banding.
    The self-join is on (band, bucket) — a bucketed equi-join whose width
    is controlled by n_bands, never an all-pairs comparison."""
    bb = minhash_band_buckets(df, id_col, text_col, n_perm, n_bands, shingle_k)
    a = bb.alias("a")
    b = bb.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


# -------------------------------------------------------------- SimHash --

SIMHASH_BITS = 32
SIMHASH_BANDS = 8  # 4-bit chunks -> pigeonhole guarantee for hamming <= 7


def simhash(text_col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """Bit-majority SimHash over distinct whitespace tokens (weight 1).
    Bit b is set iff at least half the token hashes have bit b set.
    Columnar: ``bits`` filtered array scans per row, no shuffle."""
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, md5_long)
    n = F.size(hashes)

    def bit_test(mask: int):
        # arity-1 factory: see minhash_signature on F.filter lambda arity
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_terms = []
    for b in range(bits):
        mask = 1 << b
        cnt = F.size(F.filter(hashes, bit_test(mask)))
        bit_terms.append(F.when(cnt * 2 >= n, F.lit(mask)).otherwise(F.lit(0)).cast("long"))
    return functools.reduce(_op.add, bit_terms)


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming.

    Candidates come from an equi-join on any shared 4-bit chunk: with 8
    chunks, hamming <= 7 forces at least one chunk to match exactly, so
    the banding loses nothing (requires max_hamming < SIMHASH_BANDS)."""
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("pigeonhole guarantee requires max_hamming < SIMHASH_BANDS")
    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    chunk_mask = (1 << chunk_bits) - 1
    sh = df.select(F.col(id_col).alias("_id"), simhash(text_col).alias("sh"))
    chunks = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("sh"), j * chunk_bits).bitwiseAND(F.lit(chunk_mask)).alias("chunk"),
        )
        for j in range(SIMHASH_BANDS)
    ])
    exploded = sh.select("_id", "sh", F.explode(chunks).alias("c")) \
        .select("_id", "sh", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- n-gram Jaccard --

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_k: int = 3, threshold: float = 0.2,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles, computed via an
    inverted index: explode distinct shingles, self-join on shingle,
    count common, join back the set sizes.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the join — the standard skew guard at scale (a stopword
    shingle otherwise creates a quadratic hot bucket)."""
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(word_shingles(text_col, shingle_k))).alias("s"),
        )
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(freq.where(F.col("df_") <= max_shingle_freq), "s").drop("df_")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.floor(jac * 10000 + 0.5).cast("long").alias("jaccard_x10k"),
        )
        .where(F.col("jaccard_x10k") >= int(threshold * 10000))
    )
