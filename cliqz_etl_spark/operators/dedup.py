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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _materialize(df: DataFrame) -> DataFrame:
    """Persist + force a small intermediate before a self-join.

    Self-joining a derived frame otherwise computes its whole subtree once
    per join side (measured 2-3x the cost on the hashing-heavy frames
    here). The persisted frames are a few dozen bytes per row — at 10^9
    docs that is ~100 GB across a cluster, comfortably MEMORY_AND_DISK.

    Every persisted frame is registered with operators/cache.py; runners
    call ``cache.release_all()`` after their terminal action so repeated
    invocations in one session don't accumulate cached partitions."""
    from cliqz_etl_spark.operators.cache import track

    df = track(df.persist(StorageLevel.MEMORY_AND_DISK))
    df.count()
    return df

from cliqz_etl_spark.functions.hashing import md5_long, md5_long32, perm_col, perm_params
from cliqz_etl_spark.functions.text import tokens, word_shingles_from


def _size_bytes(s: str) -> int:
    """Parse a Spark size conf value ("134217728b", "128MB", "1t")."""
    s = s.strip().lower()
    for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("tb", 1 << 40), ("pb", 1 << 50),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("t", 1 << 40), ("p", 1 << 50),
                      ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(s)


def _scan_partition_estimate(df: DataFrame) -> int | None:
    """Estimate how many partitions the source scan will produce, the way
    Spark sizes file splits: maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, bytesPerCore)), each file contributing at least
    one split — from catalog metadata only, no job. The bytesPerCore term
    matters: a single mid-size file already splits across the cluster, so
    without it the estimate would trigger a needless repartition shuffle
    of the raw text. None when the frame has no file source to
    introspect or any probe fails (callers then repartition, the safe
    default)."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        target = df.sparkSession.sparkContext.defaultParallelism
        if len(files) >= target:
            return len(files)  # >=1 split per file: already enough
        conf = df.sparkSession.conf
        max_pb = _size_bytes(conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 << 20)))
        open_cost = _size_bytes(conf.get(
            "spark.sql.files.openCostInBytes", str(4 << 20)))
        sc = df.sparkSession.sparkContext
        jvm, hconf = sc._jvm, sc._jsc.hadoopConfiguration()
        total = 0
        for uri in files:
            p = jvm.org.apache.hadoop.fs.Path(uri)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        bytes_per_core = (total + len(files) * open_cost) // target
        max_split = max(1, min(max_pb, max(open_cost, bytes_per_core)))
        return max(len(files), -(-total // max_split))
    except Exception:
        return None


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of compute-heavy per-row work iff the source scan
    cannot supply enough partitions to fill the cluster (a small dense
    parquet file otherwise serializes all hashing onto one core; the
    shuffle moves only the raw text once and is immediately amortized).

    Partition count is estimated plan-side from the scan's file metadata
    rather than probing ``df.rdd.getNumPartitions()``, which forces
    physical planning — and, under AQE, can materialize upstream query
    stages — on every dedup build."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = _scan_partition_estimate(df)
    if est is None or est < target:
        return df.repartition(target)
    return df


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str,
                    shingle_k: int, carry: tuple[str, ...] = ()) -> DataFrame:
    """(_id, *carry, _hs): 32-bit md5 per k-word shingle, computed through
    staged projections so tokens/shingles/hashes are each materialized
    once per row (inline subtrees inside transform lambdas re-evaluate
    per element — measured 6x slower). ``carry`` columns ride the
    pipeline untouched (e.g. a batch/corpus tag).

    NULL-text rows are excluded here — the family-wide contract (see
    module tests): a NULL document carries no content, so it must not
    become anyone's near-duplicate (md5/tokens of NULL otherwise funnel
    every NULL doc into ONE bucket and pair them all at jaccard 1.0)."""
    return (
        _spread(df.where(F.col(text_col).isNotNull())
                .select(F.col(id_col).alias("_id"), *carry,
                        F.col(text_col).alias("_text")))
        .select("_id", *carry, tokens(F.col("_text")).alias("_toks"))
        .select("_id", *carry,
                word_shingles_from(F.col("_toks"), shingle_k).alias("_sh"))
        .select("_id", *carry, F.transform("_sh", md5_long32).alias("_hs"))
    )

# ---------------------------------------------------------------- exact --

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts: (text_md5, canonical_id, n_copies).
    Canonical row = minimum id. One shuffle, map-side partial agg.
    NULL-text rows are excluded (family contract): md5(NULL) is NULL, so
    without the filter every NULL doc would aggregate into one group and
    be reported as copies of each other."""
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -------------------------------------------------------------- MinHash --

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_perm: int = 16, shingle_k: int = 3,
                       carry: tuple[str, ...] = ()) -> DataFrame:
    """(_id, mh_0..mh_{n-1}): the MinHash signature per row.

    Two-stage columnar plan, no explode, no shuffle:
    1. one projection materializes the shingle array and md5-hashes each
       shingle ONCE (the expensive part — without this boundary every
       signature column would re-derive split+slice+md5, measured 6x
       slower at sf0.1);
    2. each signature is an array_min over a cheap integer permutation
       (a_i*h + b_i mod P) of the shared hash array.

    NB: per-seed lambdas are built by arity-1 factories — F.transform
    dispatches on lambda arity, and a `lambda h, a=a` binding would
    receive the array INDEX as its second argument."""
    hashed = _shingle_hashes(df, id_col, text_col, shingle_k, carry)

    def perm(a: int, b: int):
        return lambda h: perm_col(h, a, b)

    return hashed.select(
        "_id", *carry,
        *[F.array_min(F.transform("_hs", perm(a, b))).alias(f"mh_{i}")
          for i, (a, b) in enumerate(perm_params(n_perm))],
    )


def minhash_band_buckets(df: DataFrame, id_col: str, text_col: str,
                         n_perm: int = 16, n_bands: int = 4,
                         shingle_k: int = 3,
                         materialize_sigs: bool = True,
                         carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, band, bucket) rows: each doc lands in n_bands buckets, where
    bucket = md5 of its band's signature slice. Docs agreeing on all rows
    of any band share a bucket (the LSH S-curve: t ~ (1/b)^(1/r)).

    Signatures are persisted before the explode by default: Generate
    re-evaluates its child array expression per emitted row, which would
    re-run the whole signature computation n_bands times (measured ~4x)."""
    rows_per_band = n_perm // n_bands
    sigs = minhash_signatures(df, id_col, text_col, n_perm, shingle_k, carry)
    if materialize_sigs:
        sigs = _materialize(sigs)
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
        sigs.select("_id", *carry, F.explode(bands).alias("bb"))
        .select("_id", *carry, F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_perm: int = 16, n_bands: int = 4,
                        shingle_k: int = 3, star: bool = False) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from MinHash-LSH banding.
    The self-join is on (band, bucket) — a bucketed equi-join whose width
    is controlled by n_bands, never an all-pairs comparison.

    ``star=False`` (default) emits ALL within-bucket pairs — required when
    each pair gets individually verified downstream (dedup_cascade's exact
    Jaccard pass). Its output is quadratic in the hottest bucket: a
    boilerplate-heavy corpus putting M identical docs in one bucket emits
    M^2/2 rows. ``star=True`` is the cluster-resolution scale path: each
    bucket member links only to the bucket's MIN id, so the output is
    bounded at n_rows x n_bands while the edge set has exactly the same
    connected components (a star is a spanning structure of the bucket
    clique) — tests pin that equivalence. Use star for keep-one-per-
    cluster dedup; use full pairs when pair-level similarity verification
    follows."""
    bb = minhash_band_buckets(df, id_col, text_col, n_perm, n_bands, shingle_k)
    if star:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        m = bb.withColumn("_min", F.min("_id").over(w))
        return (
            m.where(F.col("_id") != F.col("_min"))
            .select(F.col("_min").alias("id_a"), F.col("_id").alias("id_b"))
            .distinct()
        )
    a = bb.alias("a")
    b = bb.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def incremental_lsh_matches(batch: DataFrame, corpus: DataFrame,
                            id_col: str, text_col: str,
                            n_perm: int = 16, n_bands: int = 4,
                            shingle_k: int = 3) -> DataFrame:
    """Batch-vs-corpus near-dup candidates: (new_id, corpus_id) for every
    new document sharing an LSH band bucket with an existing one — the
    ingest-time dedup shape, where each arriving batch is screened against
    the accumulated corpus instead of re-pairing the corpus with itself.

    Only the (small) batch side computes signatures at ingest time in the
    production layout: the corpus's (band, bucket) index is precomputed
    once and stored bucketed/sorted by (band, bucket), so this equi-join
    shuffles just the batch rows while corpus partitions are read in
    place. Here both sides derive from one table; the join shape — and
    the shuffle-width bound of n_bands x n_batch_docs — is the same.

    Batch and corpus need not be disjoint: re-delivered documents (the
    normal at-least-once ingest case, where the batch was already
    appended to the corpus index) are excluded from their own match list
    by the new_id != corpus_id join condition rather than surfacing as
    degenerate (x, x) self-pairs.

    Execution shape: both sides union into ONE tagged frame whose band
    buckets are computed (and persisted) once, then self-joined with the
    batch/corpus direction expressed in the join condition — so the
    signature pipeline runs once and the join's shuffle is a
    ReusedExchange, exactly like the corpus self-join in
    lsh_candidate_pairs (two separately-built sides cost two signature
    pipelines and two persists; measured ~1.6x slower at sf0.1). When
    the corpus index is precomputed and stored bucketed by (band,
    bucket) — the ingest-time layout in the docstring above — callers
    join the batch's buckets against it directly instead."""
    tagged = (
        batch.select(F.col(id_col), F.col(text_col),
                     F.lit(True).alias("_is_new"))
        .unionByName(corpus.select(F.col(id_col), F.col(text_col),
                                   F.lit(False).alias("_is_new")))
    )
    bb = minhash_band_buckets(tagged, id_col, text_col,
                              n_perm, n_bands, shingle_k,
                              carry=("_is_new",))
    a, b = bb.alias("a"), bb.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & F.col("a._is_new") & ~F.col("b._is_new")
               & (F.col("a._id") != F.col("b._id")))
        .select(F.col("a._id").alias("new_id"),
                F.col("b._id").alias("corpus_id"))
        .distinct()
    )


# -------------------------------------------------------------- SimHash --

# 60 bits in 3 x 20-bit chunks: ~1M buckets per band makes random collisions
# negligible (~B*n^2/2^21 pairs) and the explode fans out 3x, not 5x. The
# 4096-bucket 5x12 layout measured ~2x slower at sf0.1 from hot buckets
# alone; pigeonhole stays exact for hamming < 3, which covers the engine's
# max_hamming=2 radius. Widen SIMHASH_BANDS if a larger radius is needed
# (guarantee: max_hamming < SIMHASH_BANDS).
SIMHASH_BITS = 60
SIMHASH_BANDS = 3


def _simhash_from_hashes(hashes: Column, bits: int, n: Column) -> Column:
    """Bit-majority SimHash in ONE pass over the token-hash array.

    A single F.aggregate carries a `bits`-long count array; each hash
    contributes its bit vector via zip_with. This references `hashes`
    exactly once — the per-bit size(filter(...)) formulation referenced
    it `bits` times, and higher-order functions evaluate interpreted
    with no common-subexpression elimination, so Catalyst re-ran the
    collapsed tokenize+md5 subtree per bit (measured 1.7x slower live
    at sf0.1 even through staged projections). `n` is the token count,
    staged in the same projection as the hash array for the same reason.

    pow(2, b) is exact for b < 62 (powers of two are representable
    doubles), so the column-valued masks are integer-exact."""
    idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def pow2(b: Column) -> Column:
        return F.pow(F.lit(2.0), b.cast("double")).cast("long")

    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(idx, lambda b: F.when(h.bitwiseAND(pow2(b)) != 0,
                                              F.lit(1).cast("long"))
                        .otherwise(F.lit(0).cast("long"))),
            lambda x, y: x + y,
        ),
    )
    return F.aggregate(
        F.zip_with(counts, idx,
                   lambda c, b: F.when(c * 2 >= n, pow2(b))
                   .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def simhash_df(df: DataFrame, id_col: str, text_col: str,
               bits: int = SIMHASH_BITS) -> DataFrame:
    """(_id, sh): SimHash over distinct whitespace tokens (weight 1).
    Bit b is set iff at least half the token hashes have bit b set.
    Zero shuffle; the single-reference aggregate in _simhash_from_hashes
    makes this one pass over the text with no persist needed."""
    hashed = (
        _spread(df.where(F.col(text_col).isNotNull())
                .select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")))
        .select("_id", F.array_distinct(tokens(F.col("_text"))).alias("_toks"))
        .select("_id", F.transform("_toks", md5_long).alias("_hh"),
                F.size("_toks").alias("_n"))
    )
    return hashed.select(
        "_id", _simhash_from_hashes(F.col("_hh"), bits, F.col("_n")).alias("sh")
    )


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 2) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming.

    Candidates come from an equi-join on any shared 20-bit chunk: with 3
    chunks, hamming <= 2 forces at least one chunk to match exactly, so
    the banding loses nothing (requires max_hamming < SIMHASH_BANDS).

    Boilerplate note: M byte-identical documents share ALL chunks, so the
    pair output is inherently M^2/2 (every clone pair IS a hamming-0 near
    pair — no candidate strategy can shrink a quadratic answer). On
    template-heavy corpora run ``exact_duplicates`` first and simhash only
    the per-hash canonical representatives, the cascade ordering that
    keeps every bucket populated by DISTINCT texts."""
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("pigeonhole guarantee requires max_hamming < SIMHASH_BANDS")
    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    chunk_mask = (1 << chunk_bits) - 1
    # persist BEFORE the chunk explode: Generate re-evaluates its child per
    # emitted row, which would recompute the simhash n_bands times
    sh = _materialize(simhash_df(df, id_col, text_col))
    chunks = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("sh"), j * chunk_bits).bitwiseAND(F.lit(chunk_mask)).alias("chunk"),
        )
        for j in range(SIMHASH_BANDS)
    ])
    exploded = (
        sh.select("_id", "sh", F.explode(chunks).alias("c"))
        .select("_id", "sh", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk"))
    )
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

DEFAULT_MAX_SHINGLE_FREQ = 1000


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_k: int = 3, threshold: float = 0.2,
                        max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
                        metric: str = "jaccard",
                        ) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles, computed via an
    inverted index: explode distinct shingles, self-join on shingle,
    count common, join back the set sizes.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the join — the standard skew guard at scale (a stopword
    shingle otherwise creates a quadratic hot bucket: one shingle shared
    by f docs contributes f^2/2 join rows, so an unguarded common trigram
    at 10^9 docs is a single-bucket 10^18-pair explosion). It is ON by
    default; pass ``None`` only for corpora known to be hot-shingle-free.
    Dropping a >f-frequency shingle can only *lower* a pair's Jaccard
    estimate for pairs sharing that stopword shingle — the accepted
    trade everywhere this guard is deployed.

    The set size rides along each inverted-index row (8 bytes of shuffle
    width) so the Jaccard denominator needs no separate size aggregation
    and no join-back — the whole operator is explode -> self-join ->
    one groupBy. With a frequency cutoff the surviving-shingle sizes are
    recounted post-filter (the denominator must match the joined sets).

    Postings carry the shingle as its 60-bit md5 (8 bytes), not the raw
    string (~25 bytes): the self-join — the operator's only big shuffle —
    moves ~45% fewer bytes and compares longs instead of strings
    (measured 6.6 s -> 5.3 s at sf0.1 locally; the byte win grows with
    corpus). md5 is engine-portable, so oracles hash identically and even
    a collision (birthday-bound ~1e3 at 5e10 distinct shingles — noise
    on a Jaccard estimate) would reproduce bit-for-bit."""
    sh = (
        _spread(df.where(F.col(text_col).isNotNull())
                .select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")))
        .select("_id", tokens(F.col("_text")).alias("_toks"))
        .select("_id", F.array_distinct(
            word_shingles_from(F.col("_toks"), shingle_k)).alias("_sh"))
        .select("_id", F.size("_sh").alias("sz"),
                F.explode(F.transform("_sh", md5_long)).alias("s"))
    )
    if max_shingle_freq is not None:
        # persist the raw postings once: the frequency count, the drop
        # counts, the anti-join, and (if no hot shingles exist) the final
        # self-join all read this frame
        sh = _materialize(sh)
        # The postings in >cutoff docs are FEW distinct values (bounded by
        # n_postings/cutoff) but quadratically deadly — that asymmetry is
        # the whole guard. So: materialize just the hot-shingle list and
        # branch on whether it is empty — a driver-side decision on a
        # model-sized table (its count was already forced by persist).
        hot = _materialize(
            sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_shingle_freq).select("s")
        )
        if hot.count() > 0:
            # Broadcast the hot list and drop matching postings with a
            # shuffle-free anti-join. The Jaccard denominators are then
            # ADJUSTED (sz minus the doc's dropped-posting count) rather
            # than recounted with a per-doc window — the drop-count
            # aggregate runs only over the hot-shingle subset, and its
            # join back is left to AQE (broadcast at small scale, shuffle
            # join on _id beyond).
            drops = (
                sh.join(F.broadcast(hot), "s", "left_semi")
                .groupBy("_id").agg(F.count(F.lit(1)).alias("_dropped"))
            )
            sh = _materialize(
                sh.join(F.broadcast(hot), "s", "left_anti")
                .join(drops, "_id", "left")
                .withColumn("sz", F.col("sz") - F.coalesce("_dropped", F.lit(0)))
                .drop("_dropped")
            )
        # else: the cutoff dropped nothing — postings and sizes are
        # already exact, and sh is already persisted for the self-join
    else:
        sh = _materialize(sh)  # both self-join sides read it
    a, b = sh.alias("a"), sh.alias("b")
    # containment = |A ∩ B| / min(|A|, |B|): the ASYMMETRIC near-dup
    # metric — a short document fully embedded in a long one scores 1.0
    # here but a tiny Jaccard (union is dominated by the long side), so
    # subset duplication is invisible to the symmetric metric. Same
    # postings, same join, different denominator.
    if metric == "containment":
        score = F.col("n_common") / F.least("sz_a", "sz_b")
        out_name = "containment_x10k"
    elif metric == "jaccard":
        score = F.col("n_common") / (F.col("sz_a") + F.col("sz_b")
                                     - F.col("n_common"))
        out_name = "jaccard_x10k"
    else:
        raise ValueError(f"unknown ngram pair metric {metric!r}")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
            F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "id_a", "id_b",
            F.floor(score * 10000 + 0.5).cast("long").alias(out_name),
        )
        .where(F.col(out_name) >= int(threshold * 10000))
    )


def lsh_verified_pairs(df: DataFrame, id_col: str, text_col: str,
                       n_perm: int = 16, n_bands: int = 4,
                       shingle_k: int = 3,
                       threshold: float = 0.5) -> DataFrame:
    """The production dedup cascade: cheap LSH candidate generation, then
    EXACT Jaccard verification on candidates only. LSH trades recall for
    a bounded candidate count; the verify stage removes its false
    positives, so surviving pairs carry true similarities — the standard
    two-stage design (generate loosely, verify exactly) that keeps the
    expensive exact comparison off the full pair space.

    Scale shape: the verify stage touches only documents that appear in
    some candidate pair (a broadcast semi-filter on the postings), and
    the exact-overlap count is one join keyed on (doc, shingle-hash) —
    never an all-pairs pass. Returns (id_a, id_b, jaccard_x10k).
    """
    cand = _materialize(
        lsh_candidate_pairs(df, id_col, text_col, n_perm, n_bands, shingle_k)
        .select("id_a", "id_b")
    )
    ids = (cand.select(F.col("id_a").alias("_id"))
           .union(cand.select(F.col("id_b").alias("_id"))).distinct())
    sh = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .join(F.broadcast(ids), "_id", "left_semi")
        .select("_id", tokens(F.col("_text")).alias("_toks"))
        .select("_id", F.array_distinct(
            word_shingles_from(F.col("_toks"), shingle_k)).alias("_sh"))
        .select("_id", F.size("_sh").alias("sz"),
                F.explode(F.transform("_sh", md5_long)).alias("s"))
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("s"),
                  F.col("sz").alias("sz_a"))
    b = sh.select(F.col("_id").alias("_rb"), F.col("s").alias("s_b"),
                  F.col("sz").alias("sz_b"))
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        cand.join(a, "id_a")
        .join(b, (F.col("id_b") == F.col("_rb")) & (F.col("s") == F.col("s_b")))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select("id_a", "id_b",
                F.floor(jac * 10000 + 0.5).cast("long").alias("jaccard_x10k"))
        .where(F.col("jaccard_x10k") >= int(threshold * 10000))
    )


# --------------------------------------------------------------------------
# C4-style exact span dedup: remove repeated k-token chunks corpus-wide,
# keeping exactly one canonical occurrence of each chunk (the
# lexicographically-least (doc, position)), then reassemble the surviving
# text per document. This is the "any N-token span occurring more than
# once in the corpus is deduplicated" rule from the C4 dataset paper
# (Raffel et al. 2020 §2.2) as a pure DataFrame pipeline.
# --------------------------------------------------------------------------

# Chunk index packs into the low bits of a single BIGINT key so "earliest
# occurrence" is a plain MIN — exact in any engine. 2^20 chunks/doc caps
# docs at ~10M tokens (k=10); ids stay safe to ~8.7e12 docs.
SPAN_IDX_BITS = 20


def span_chunks(df: DataFrame, id_col: str, text_col: str,
                k: int = 10) -> DataFrame:
    """Explode documents into consecutive k-token chunks.

    Output: (doc_id, chunk_idx, chunk) — one row per chunk, built from a
    single materialized token array (slice inside transform, so tokenize
    happens once per row, not once per chunk). Empty-trim docs produce no
    rows. Scan-side map + explode; no shuffle."""
    ntile = F.size("_tk")
    n_chunks = ((ntile + F.lit(k - 1)) / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(F.slice(F.col("_tk"), i * k + 1, k), " ").alias("chunk"),
        ),
    )
    return (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tk"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"),
                F.col("c.chunk").alias("chunk"))
    )


def span_dedup(df: DataFrame, id_col: str, text_col: str,
               k: int = 10) -> DataFrame:
    """Corpus-wide duplicate-span removal, C4 rule, 3 keyed shuffles.

    1. chunk the corpus (map-only), 2. MIN(packed (doc,idx) key) per
    distinct chunk text — the canonical occurrence (shuffle on chunk,
    map-side combine collapses per-partition repeats), 3. join chunks back
    to winners on chunk text and keep only canonical rows, 4. reassemble
    per doc via sort_array(collect_list) (shuffle on doc_id). The chunk
    frame is persisted before the self-referencing stages, so chunking
    computes once and feeds the winner agg, the join probe side, and the
    per-doc totals as InMemoryTableScans (visible in .explain) instead of
    three re-derivations of the explode.

    Never an all-pairs comparison: shuffle width is O(total chunks) with
    the combine collapsing duplicates early, so a 100 TB corpus moves at
    most one row per *distinct* chunk into the winner table. Docs whose
    every chunk lost elsewhere come back with empty text (kept, flagged
    n_kept=0) so the output row count always equals the non-empty input
    row count.

    Output: (doc_id, text_kept, n_kept, n_dropped)."""
    ch = span_chunks(df, id_col, text_col, k)
    packed = (F.col("doc_id").cast("long") * F.lit(1 << SPAN_IDX_BITS)
              + F.col("chunk_idx"))
    ch = _materialize(ch.select("doc_id", "chunk_idx", "chunk",
                                packed.alias("_key")))
    winners = ch.groupBy("chunk").agg(F.min("_key").alias("_keep"))
    kept = (ch.join(winners, "chunk")
            .where(F.col("_key") == F.col("_keep"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                         lambda s: s["chunk"]),
                     " ").alias("text_kept")))
    totals = ch.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (totals.join(kept, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text_kept", F.lit("")).alias("text_kept"),
                    F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
                    (F.col("_n") - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_dropped")))
