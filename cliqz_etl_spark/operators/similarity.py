"""Vector similarity operators over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- brute-force cosine top-k: the exactness baseline. Query set broadcast
  against the corpus (queries are few; the corpus never shuffles), dot
  products via zip_with/aggregate — JVM-side, no Python.
- IVF: corpus assigned once to the nearest of K centroids (broadcast
  argmin — a map, not a join-shuffle), search restricted to the probe's
  cluster. At 100 TB the corpus is written bucketed/partitioned by
  ``cluster`` so a probe reads one partition.

Arithmetic discipline: vectors are quantized to integer milli-units
(floor(x*1000+0.5)) before any distance math, so dot products and norms
are integer-exact and the final cosine is a single deterministic double
division — bit-identical across engines, which makes ANN oracle-checkable.
The float fast path (`cosine_float`) exists for production use where
cross-engine bit-equality doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> -> array<long> milli-units; floor(x*scale+0.5) is the
    engine-portable rounding (see queries/textops.py on round() skew)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )


def magnitude_bound(dim: int, scale: int = 1000) -> float:
    """Largest |x| (input units) whose quantized value stays inside the
    exact-int64 envelope of EVERY kernel downstream of valid_quantized —
    worst case is SQ8's decoded element (|rv| <= 765*qmax, see
    sq8_reconstructed), so dim*(765*qmax)^2 <= 2^62. Shared with the
    DuckDB oracle fragments so both engines apply the byte-identical
    threshold."""
    return (int((2**62 / max(dim, 1)) ** 0.5) // 765) / scale


def valid_quantized(df: DataFrame, id_col: str, vec_col: str,
                    dim: int) -> DataFrame:
    """(_id, _qv): the quantized projection every numpy-kernel operator
    consumes, restricted to rows whose vector is actually scorable —
    non-NULL, exactly ``dim`` long, and free of NULL/NaN elements
    (quantize turns a NaN element into a NULL long, and np.asarray of a
    list containing None is an object array that crashes the kernel)
    and of elements too large for exact int64 arithmetic. The magnitude
    bound is the point, not just ±Inf: an Inf (or merely huge finite)
    element saturates the non-ANSI double→long cast toward
    Long.MAX_VALUE, after which the int64 numpy dot/norm products
    silently WRAP — wrong scores, no error. The bound is derived from
    the worst downstream consumer, SQ8's decoded values (|rv| ≤
    765·Qmax per element, see sq8_reconstructed): dim·(765·Qmax)² ≤
    2^62 keeps every norm², dot, and decode product exactly
    representable, so any vector that passes is exact through EVERY
    kernel. At dim=64 that allows |x| ≤ ~350 — three orders of
    magnitude above any normalized embedding, so real corpora lose
    nothing. Vectors that quantize to ALL-ZERO are dropped too: their
    cosine is 0/0, which would flow through ranking as a NULL score and
    silently occupy top-k slots. One definition so the validity rule
    can't drift between the six operators that need it; the filter is a
    scan predicate that costs nothing on clean corpora."""
    c = F.col(vec_col)
    xmax = F.lit(magnitude_bound(dim))
    return (
        df.where(c.isNotNull() & (F.size(c) == dim)
                 & ~F.exists(c, lambda x: x.isNull() | F.isnan(x)
                             | (F.abs(x) > xmax)))
        .select(F.col(id_col).alias("_id"), quantize(vec_col).alias("_qv"))
        .where(F.exists(F.col("_qv"), lambda q: q != 0))
    )


def long_array_expr(values) -> Column:
    """array<long> literal built as ONE parsed expression.

    The Column-graph form (``F.array(*[F.lit(x).cast("long") ...])``)
    costs one py4j round trip per element at plan-BUILD time — the
    round-13 knn_graph lesson, where a ~1.1k-literal graph added 1.0-1.7
    s of data-independent driver cost per build (4-5x the parsed form).
    Use this for any literal numeric array beyond a handful of elements;
    values must be Python ints."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in values) + ")")


def dot_q(a: Column, b: Column) -> Column:
    """Integer-exact dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def cosine_q(a: Column, b: Column) -> Column:
    """Deterministic cosine of quantized vectors (double division of exact
    integers; sqrt is correctly rounded per IEEE-754)."""
    return dot_q(a, b).cast("double") / F.sqrt(
        norm2_q(a).cast("double") * norm2_q(b).cast("double")
    )


def cosine_float(a: Column, b: Column) -> Column:
    """Production float cosine (not oracle-stable across engines)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return dot / F.sqrt(na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5, dim: int = 64) -> DataFrame:
    """Exact top-k neighbors for each query vector (self-match excluded).

    The query side is broadcast — the corpus is scanned once, never
    shuffled; ranking happens in a window partitioned by query id. Each
    side's squared norm is computed once per ROW before the join (the
    naive cosine-per-pair form re-evaluates both O(d) norms for every
    pair); the pair stage is then one O(d) dot + sqrt(na*nb), written
    exactly as the oracle's formula so the double rounds identically.

    Both sides pass through ``valid_quantized`` like every other ANN
    kernel — previously this baseline quantized raw input, so the
    NULL/NaN/magnitude wrap class the shared filter exists for was
    still reachable here."""
    from pyspark.sql import Window

    q = valid_quantized(queries, id_col, vec_col, dim).select(
        F.col("_id").alias("query_id"), F.col("_qv").alias("qv")
    ).withColumn("qn", norm2_q(F.col("qv")).cast("double"))
    c = valid_quantized(corpus, id_col, vec_col, dim).select(
        F.col("_id").alias("neighbor_id"), F.col("_qv").alias("cv")
    ).withColumn("cn", norm2_q(F.col("cv")).cast("double"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot_q(F.col("qv"), F.col("cv")).cast("double")
             / F.sqrt(F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.floor(F.col("cos") * 10000 + 0.5).cast("long").alias("cos_x10k"),
        )
    )


SQ8_LEVELS = 255


def sq8_reconstructed(emb: DataFrame, id_col: str, vec_col: str,
                      dim: int) -> DataFrame:
    """(_id, _qv, _rv): quantized vector plus its SQ8 round-trip — each
    dimension coded to 0..255 against a per-dimension min/max model, then
    decoded back as a 255-scaled integer (rv_d = mn_d*255 + code_d*rng_d,
    integer-exact, so approximate cosines are engine-portable).

    This is the memory story of production vector search: the corpus scan
    reads 1-byte codes (4x smaller than float32; here the decoded ints
    stand in for them), and only rerank touches full vectors.

    The min/max model comes from posexplode -> partial-aggregated groupBy
    (one shuffle of dim rows per input partition) and is fetched to the
    driver as ``dim`` rows — the same K-row model policy as the IVF
    centroid fit — so the decode compiles to ONE transform over literal
    arrays. The previous shape (a 2*dim-column aggregate plus a
    dim-expression decode projection) spent ~2 s per call in whole-stage
    codegen compilation at dim=64, dwarfing the actual work at bench
    scale and growing with dim; this one is O(1) expressions in dim.

    Rows without a valid ``dim``-length vector are dropped up front: an
    un-codable vector cannot enter the index, and the numpy kernels
    (unlike the old null-propagating expressions) would raise on a NULL
    or ragged array instead of ignoring it."""
    q = valid_quantized(emb, id_col, vec_col, dim)

    # Partial min/max per Arrow batch (narrow map, no shuffle), reduced on
    # the driver: the collected payload is n_batches x 2 rows of dim-long
    # arrays — a model fetch. An explode+groupBy formulation shuffles
    # N x dim rows and pays a two-stage job; this is one stage.
    def _minmax(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]],
                         dtype=np.int64)
            yield pd.DataFrame({"mn": [V.min(axis=0).tolist()],
                                "mx": [V.max(axis=0).tolist()]})

    parts = q.select("_qv").mapInPandas(
        _minmax, schema="mn array<long>, mx array<long>").collect()
    if parts:
        mn = [min(int(p["mn"][d]) for p in parts) for d in range(dim)]
        rng = [max(int(p["mx"][d]) for p in parts) - mn[d]
               for d in range(dim)]
    else:
        mn, rng = [0] * dim, [0] * dim
    mn_lit = long_array_expr(mn)
    rng_lit = long_array_expr(rng)

    def decode(v: Column, i: Column) -> Column:
        m = F.element_at(mn_lit, i + 1)
        r = F.element_at(rng_lit, i + 1)
        code = F.when(r == 0, F.lit(0).cast("long")).otherwise(
            F.floor(((v - m) * SQ8_LEVELS).cast("double") / r + 0.5)
            .cast("long"))
        return m * SQ8_LEVELS + code * r

    return q.select("_id", "_qv", F.transform("_qv", decode).alias("_rv"))


def _require_integral_ids(id_col: str, op: str,
                          **frames: DataFrame) -> None:
    """Fail fast when an id column is non-integral: the broadcast query
    models and mapInPandas output schemas carry ids as int64, so a
    string-id corpus should error clearly, not cast-crash inside Arrow."""
    from pyspark.sql.types import IntegralType

    for side, frame in frames.items():
        dt = frame.schema[id_col].dataType
        if not isinstance(dt, IntegralType):
            raise TypeError(
                f"{op} requires an integral id column "
                f"({side}.{id_col} is {dt.simpleString()})")


def pq_reconstructed(corpus: DataFrame, codebook: DataFrame, id_col: str,
                     vec_col: str, dim: int, n_sub: int) -> DataFrame:
    """(_id, _qv, _rv): product-quantization round-trip — each vector
    encoded as ``n_sub`` codebook indices (one per dim/n_sub-wide
    subspace, nearest codeword by exact int64 L2), decoded back as the
    concatenation of its codewords (Jégou et al. 2011). The decoded
    ints stand in for the code bytes the way sq8_reconstructed's do:
    the real layout stores n_sub uint8 codes per vector (dim/n_sub x
    smaller than SQ8, 32x smaller than float32 at dim=64/n_sub=8), and
    only rerank touches full vectors.

    The codebook is model-sized by contract (strided sample or trained
    centroids): it collects to the driver once (same K-row model policy
    as IVF), broadcasts, and encode+decode run as ONE zero-shuffle
    Arrow pass over the corpus — int64 numpy throughout, exact under
    the valid_quantized magnitude envelope (subspace distances are
    strictly smaller than the full-dim norms the bound was sized for).
    Codeword ties break to the smallest codebook id on both engines:
    the model is sorted by id and np.argmin keeps the first minimum,
    mirroring the oracle's ORDER BY d ASC, cid ASC."""
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    q = valid_quantized(corpus, id_col, vec_col, dim)
    model = _collect_centroids(codebook, id_col, vec_col, dim)
    if not model:
        raise ValueError(
            "pq_reconstructed: codebook has no valid rows — cannot encode")
    model.sort(key=lambda t: t[0])
    cents = [v for _, v in model]
    sub = dim // n_sub
    from cliqz_etl_spark.operators.cache import track_broadcast
    bc = track_broadcast(
        q.sparkSession.sparkContext.broadcast((cents, sub)))

    def recode(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(bc.value[0], dtype=np.int64)
        s = bc.value[1]
        n_spaces = C.shape[1] // s
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]],
                         dtype=np.int64)
            rv = np.empty_like(V)
            for m in range(n_spaces):
                Vm = V[:, m * s:(m + 1) * s]
                Cm = C[:, m * s:(m + 1) * s]
                d2 = ((Vm * Vm).sum(axis=1)[:, None]
                      - 2 * (Vm @ Cm.T)
                      + (Cm * Cm).sum(axis=1)[None, :])
                codes = np.argmin(d2, axis=1)  # first min = smallest cid
                rv[:, m * s:(m + 1) * s] = Cm[codes]
            yield pd.DataFrame({
                "_id": pdf["_id"].to_numpy(dtype=np.int64),
                "_qv": list(V.tolist()),
                "_rv": list(rv.tolist()),
            })

    return q.mapInPandas(
        recode, schema="_id long, _qv array<long>, _rv array<long>")


def pq_topk(corpus: DataFrame, queries: DataFrame, codebook: DataFrame,
            id_col: str, vec_col: str, dim: int, n_sub: int,
            k: int = 5, rerank: int = 20) -> DataFrame:
    """ANN via product quantization: approximate cosine (query
    exact-milli x corpus PQ decode — numerically identical to the
    classic per-query ADC table lookup, since dot(q, concat(codewords))
    = sum of per-subspace table entries) prunes to ``rerank`` candidates
    per query; exact cosine reranks candidates only. Same scan shape as
    sq8_topk with a (dim/n_sub)x smaller resident corpus."""
    _require_integral_ids(id_col, "pq_topk", corpus=corpus, queries=queries)
    rec = pq_reconstructed(corpus, codebook, id_col, vec_col, dim, n_sub)
    return _approx_rerank_topk(rec, queries, id_col, vec_col, dim, k, rerank)


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, coarse: DataFrame,
               pq_src: DataFrame, id_col: str, vec_col: str, dim: int,
               n_sub: int, n_probe: int = 2, k: int = 5,
               rerank: int = 20) -> DataFrame:
    """ANN via the composed IVF+PQ index — the production vector-search
    layout (FAISS's IVFPQ; Jégou et al. 2011 §IV): a coarse quantizer
    partitions the corpus, RESIDUALS (vector minus assigned centroid)
    are product-quantized, queries probe only their ``n_probe`` nearest
    coarse cells, and approximate cosine scores the reconstructed
    centroid+decoded-residual vectors of probed rows only — so a query
    touches n_probe/K of the corpus, each row at n_sub code bytes.
    Exact rerank reads full vectors for Q x rerank rows.

    Both models are driver-local by contract: the coarse centroids
    (K rows) and the residual codebook source (model-sized sample, PQ
    codewords = its residuals under the SAME coarse assignment rule)
    collect once; encode+decode is ONE zero-shuffle Arrow pass emitting
    (_id, _qv, _rv, cluster). All arithmetic is exact int64 inside the
    valid_quantized envelope (residuals are at most 2x the input
    magnitude, reconstructions 3x — orders of magnitude inside the
    bound sized for SQ8's 765x decode). Every tie breaks to the
    smallest id on both engines (sorted models + first-minimum
    argmin/stable argsort), mirroring the oracle's ORDER BY d, cid."""
    import numpy as np

    _require_integral_ids(id_col, "ivfpq_topk", corpus=corpus,
                          queries=queries)
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    coarse_model = _collect_centroids(coarse, id_col, vec_col, dim)
    if not coarse_model:
        raise ValueError("ivfpq_topk: coarse quantizer has no valid rows")
    coarse_model.sort(key=lambda t: t[0])
    cids = [c for c, _ in coarse_model]
    C = np.asarray([v for _, v in coarse_model], dtype=np.int64)

    src_model = _collect_centroids(pq_src, id_col, vec_col, dim)
    if not src_model:
        raise ValueError("ivfpq_topk: PQ codebook source has no valid rows")
    src_model.sort(key=lambda t: t[0])
    S = np.asarray([v for _, v in src_model], dtype=np.int64)
    # residual codebook: the sample's residuals under the same coarse
    # assignment every corpus row gets (first-minimum argmin = lowest cid)
    d_src = (C * C).sum(axis=1)[None, :] - 2 * (S @ C.T)
    CB = S - C[np.argmin(d_src, axis=1)]

    sub = dim // n_sub
    from cliqz_etl_spark.operators.cache import track_broadcast
    q_corpus = valid_quantized(corpus, id_col, vec_col, dim)
    bc = track_broadcast(q_corpus.sparkSession.sparkContext.broadcast(
        ([int(c) for c in cids], C.tolist(), CB.tolist(), sub)))

    def recode(batches):
        import numpy as np
        import pandas as pd

        cid_arr, c_mat, cb_mat, s = bc.value
        Cn = np.asarray(c_mat, dtype=np.int64)
        Cb = np.asarray(cb_mat, dtype=np.int64)
        cids_np = np.asarray(cid_arr, dtype=np.int64)
        c_norm = (Cn * Cn).sum(axis=1)
        n_spaces = Cn.shape[1] // s
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]],
                         dtype=np.int64)
            ci = np.argmin(c_norm[None, :] - 2 * (V @ Cn.T), axis=1)
            resid = V - Cn[ci]
            dec = np.empty_like(resid)
            for m in range(n_spaces):
                Rm = resid[:, m * s:(m + 1) * s]
                Bm = Cb[:, m * s:(m + 1) * s]
                d2 = ((Rm * Rm).sum(axis=1)[:, None]
                      - 2 * (Rm @ Bm.T)
                      + (Bm * Bm).sum(axis=1)[None, :])
                dec[:, m * s:(m + 1) * s] = Bm[np.argmin(d2, axis=1)]
            rv = Cn[ci] + dec
            yield pd.DataFrame({
                "_id": pdf["_id"].to_numpy(dtype=np.int64),
                "_qv": list(V.tolist()),
                "_rv": list(rv.tolist()),
                "cluster": cids_np[ci],
            })

    rec = q_corpus.mapInPandas(
        recode,
        schema="_id long, _qv array<long>, _rv array<long>, cluster long")

    # query-side probe lists: Q x K distances on the driver (both are
    # models — Q rows by contract, K centroids), stable argsort so ties
    # break to the lowest centroid id like the oracle's ORDER BY d, cid
    qv_model = _collect_centroids(queries, id_col, vec_col, dim)
    probes: dict[int, list[int]] = {}
    if qv_model:
        qv_model.sort(key=lambda t: t[0])
        Qm = np.asarray([v for _, v in qv_model], dtype=np.int64)
        dq = (C * C).sum(axis=1)[None, :] - 2 * (Qm @ C.T)
        top = np.argsort(dq, axis=1, kind="stable")[:, :min(n_probe, len(cids))]
        probes = {int(qid): [int(cids[i]) for i in row]
                  for (qid, _), row in zip(qv_model, top)}
    return _approx_rerank_topk(rec, queries, id_col, vec_col, dim, k,
                               rerank, probes=probes)


def sq8_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, dim: int, k: int = 5,
             rerank: int = 20) -> DataFrame:
    """ANN via SQ8: approximate cosine (query exact-milli x corpus SQ8
    decode) prunes to ``rerank`` candidates per query, then exact cosine
    reranks candidates only. At 100 TB the pair stage streams the 1-byte
    code corpus against broadcast queries; the rerank join touches full
    vectors for Q x rerank rows — the only rows whose float payload is
    ever read. Cosine is scale-invariant, so the 255x decode scale drops
    out and scores stay deterministic doubles over exact integers.

    ``id_col`` must be integral on both sides: the broadcast query model
    and the kernel's output schema carry ids as int64 (unlike the older
    join-based formulation, which was id-type-generic). Checked up front
    so a string-id corpus fails with a clear error, not a cast crash deep
    inside an Arrow batch."""
    _require_integral_ids(id_col, "sq8_topk", corpus=corpus, queries=queries)
    # No persist on the decoded corpus: the approx scan reads (_id, _rv)
    # and the rerank join reads (_id, _qv), so column pruning gives each
    # branch only its own cheap transform over the scan — an eager
    # persist+count cost a whole extra job, which dominates at bench
    # scale now that the decode is O(1) expressions.
    rec = sq8_reconstructed(corpus, id_col, vec_col, dim)
    return _approx_rerank_topk(rec, queries, id_col, vec_col, dim, k, rerank)


def _approx_rerank_topk(rec: DataFrame, queries: DataFrame, id_col: str,
                        vec_col: str, dim: int, k: int,
                        rerank: int,
                        probes: dict[int, list[int]] | None = None
                        ) -> DataFrame:
    """Shared tail of the compressed-scan ANN family (SQ8, PQ, IVFPQ):
    score the decoded corpus (_id, _qv, _rv) against the broadcast
    exact-milli query model per Arrow batch (batch-local
    top-``rerank``), narrow to the global top-``rerank`` per query,
    exact-rerank those rows only. With ``probes`` (query_id -> probed
    cluster ids; ``rec`` must then carry a ``cluster`` column) each
    query scores ONLY corpus rows in its probed clusters — the IVF
    partition-pruning composed onto the compressed scan."""
    from pyspark.sql import Window

    qs = (
        valid_quantized(queries, id_col, vec_col, dim)
        .select(F.col("_id").alias("query_id"), F.col("_qv").alias("qv"))
        .withColumn("qn", norm2_q(F.col("qv")).cast("double"))
    )
    # Approx scoring: the query set is the MODEL here (few rows by
    # contract, like brute_force_topk's broadcast side), so ship it as a
    # broadcast variable and score each Arrow batch of the decoded corpus
    # with one int64 numpy matmul — the same shape as ivf_assign_q, and
    # ~dim x cheaper than the interpreted per-pair zip_with dot. Each
    # batch emits only its LOCAL top-``rerank`` per query (output bounded
    # by n_batches x Q x rerank, never N x Q), and a global window
    # narrows to the true top-``rerank``. Values are bit-identical to the
    # expression form: integer dot/norms are exact in int64, their
    # float64 conversions are exact (< 2^53), and the final
    # divide-by-sqrt follows the same IEEE order as the SQL fragment.
    q_rows = qs.collect()  # Q-row model fetch
    q_model = ([int(r["query_id"]) for r in q_rows],
               [[int(x) for x in r["qv"]] for r in q_rows],
               None if probes is None
               else [[int(c) for c in probes.get(int(r["query_id"]), [])]
                     for r in q_rows])
    from cliqz_etl_spark.operators.cache import track_broadcast
    bc = track_broadcast(rec.sparkSession.sparkContext.broadcast(q_model))

    def score(batches):
        import numpy as np
        import pandas as pd

        qid_arr, q_mat, probe_lists = bc.value
        if not qid_arr:
            yield pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                "neighbor_id": pd.Series(dtype="int64"),
                                "acos": pd.Series(dtype="float64")})
            return
        Qm = np.asarray(q_mat, dtype=np.int64)
        qid = np.asarray(qid_arr, dtype=np.int64)
        qn = (Qm * Qm).sum(axis=1).astype(np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nid = pdf["_id"].to_numpy(dtype=np.int64)
            cl = (pdf["cluster"].to_numpy(dtype=np.int64)
                  if probe_lists is not None else None)
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_rv"]],
                         dtype=np.int64)
            rn = (V * V).sum(axis=1).astype(np.float64)
            # PQ decode can yield an all-zero vector (every subspace
            # snapping to a zero codeword) even when the ORIGINAL vector
            # passed valid_quantized; its acos would be 0/0 = NaN, which
            # numpy lexsort ranks LAST but DuckDB's float total order
            # ranks greatest — drop such rows from the approx scan, the
            # same rule the all-zero-_qv guard applies on the exact side.
            nz = rn > 0
            if not nz.all():
                nid, V, rn = nid[nz], V[nz], rn[nz]
                if cl is not None:
                    cl = cl[nz]
                if len(nid) == 0:
                    continue
            acos = (V @ Qm.T).astype(np.float64) / np.sqrt(
                rn[:, None] * qn[None, :])
            out_q, out_n, out_a = [], [], []
            for j in range(len(qid)):
                col = acos[:, j]
                keep = nid != qid[j]  # self-match excluded, as in the join
                if probe_lists is not None:
                    keep &= np.isin(cl, np.asarray(probe_lists[j],
                                                   dtype=np.int64))
                # batch-local top-`rerank` by (acos DESC, neighbor_id ASC)
                order = np.lexsort((nid[keep], -col[keep]))[:rerank]
                out_q.append(np.full(len(order), qid[j], dtype=np.int64))
                out_n.append(nid[keep][order])
                out_a.append(col[keep][order])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "acos": np.concatenate(out_a),
            })

    scan_cols = ["_id", "_rv"] + (["cluster"] if probes is not None else [])
    approx = rec.select(*scan_cols).mapInPandas(
        score, schema="query_id long, neighbor_id long, acos double")
    wa = Window.partitionBy("query_id").orderBy(F.desc("acos"),
                                                F.asc("neighbor_id"))
    cand = (
        approx.withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    cq = rec.select(F.col("_id").alias("neighbor_id"),
                    F.col("_qv").alias("cv"))
    exact = (
        F.broadcast(cand)
        .join(cq, "neighbor_id")
        .join(F.broadcast(qs), "query_id")
        .select(
            "query_id", "neighbor_id",
            (dot_q(F.col("qv"), F.col("cv")).cast("double")
             / F.sqrt(F.col("qn") * norm2_q(F.col("cv")).cast("double")))
            .alias("cos"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                                F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(we))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.floor(F.col("cos") * 10000 + 0.5).cast("long")
                .alias("cos_x10k"))
    )


def ivf_assign_q(projected: DataFrame, cids: list[int],
                 cents: list[list[int]]) -> DataFrame:
    """Nearest-centroid assignment for an already-quantized (_id, _qv)
    frame against an in-memory centroid model (the K x dim matrix).

    The model ships to executors as a broadcast variable and each Arrow
    batch is scored with one int64 numpy matmul: argmin_c |v-c|^2 =
    argmin_c (|c|^2 - 2 v.c), |v|^2 being constant per row. Integer-exact
    (milli-unit values keep every product far inside int64), ties break to
    the lowest centroid id (rows sorted by cid; np.argmin takes the first
    minimum). A pure map over the corpus — no shuffle, and unlike the
    earlier K x dim literal expression the plan is O(1) in K, so this is
    the 100 TB design at production K (4096+): plan size constant, per-row
    cost one vectorized BLAS-shaped matmul instead of K codegen'd
    distance subtrees. Returns (_id, _qv, cluster)."""
    from pyspark.sql.types import LongType, StructField, StructType

    order = sorted(range(len(cids)), key=lambda i: cids[i])
    model = ([int(cids[i]) for i in order], [[int(x) for x in cents[i]] for i in order])
    from cliqz_etl_spark.operators.cache import track_broadcast
    bc = track_broadcast(projected.sparkSession.sparkContext.broadcast(model))
    schema = StructType(list(projected.schema.fields)
                        + [StructField("cluster", LongType(), False)])

    def assign(batches):
        import numpy as np

        cid_arr, cent_mat = bc.value
        C = np.asarray(cent_mat, dtype=np.int64)
        cids_np = np.asarray(cid_arr, dtype=np.int64)
        c_norm = (C * C).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cluster=np.array([], dtype=np.int64))
                continue
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]],
                         dtype=np.int64)
            dist = c_norm[None, :] - 2 * (V @ C.T)
            yield pdf.assign(cluster=cids_np[np.argmin(dist, axis=1)])

    return projected.mapInPandas(assign, schema=schema)


def _collect_centroids(centroids: DataFrame, id_col: str, vec_col: str,
                       dim: int | None = None) -> list[tuple[int, list[int]]]:
    """Collect the K-row centroid MODEL to the driver (the legitimate
    collect: model fitting, not data movement).

    The frame passes through valid_quantized first — a NULL/NaN/ragged/
    zero centroid row would otherwise reach the driver as a None (a
    TypeError here) or poison the numpy model matrix; the oracle CTEs
    build their centroid set from the validity-filtered projection, so
    dropping the same rows keeps both engines' models identical. Callers
    that know the corpus dim (every oracle-gated query does — the SQL
    twin hard-codes it) should pass ``dim``; otherwise it is inferred as
    the MODAL vector length across centroid rows (ties to the larger
    dim), so one ragged row gets dropped instead of silently flipping
    the model's dimensionality and dropping every well-formed centroid."""
    if dim is None:
        mode = (centroids.where(F.col(vec_col).isNotNull())
                .groupBy(F.size(F.col(vec_col)).alias("n"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.desc("cnt"), F.desc("n"))
                .first())
        if mode is None:
            return []
        dim = int(mode["n"])
    return [
        (int(r["_id"]), [int(x) for x in r["_qv"]])
        for r in valid_quantized(centroids, id_col, vec_col, dim).collect()
    ]


def ivf_assign_multi_q(projected: DataFrame, cids: list[int],
                       cents: list[list[int]], n_probe: int) -> DataFrame:
    """Top-``n_probe`` nearest centroids per vector — the query-side half
    of multi-probe IVF search. Same broadcast-model numpy scoring as
    ivf_assign_q, but each input row expands to ``n_probe`` output rows
    (cluster, probe 1..n_probe). Ties break to the lowest centroid id
    (stable argsort over cid-sorted rows), bit-matching the oracle's
    ORDER BY d ASC, cid ASC. Still a pure map — no shuffle; only ever run
    this on the QUERY side (small), never the corpus."""
    from pyspark.sql.types import LongType, StructField, StructType

    order = sorted(range(len(cids)), key=lambda i: cids[i])
    model = ([int(cids[i]) for i in order], [[int(x) for x in cents[i]] for i in order])
    from cliqz_etl_spark.operators.cache import track_broadcast
    bc = track_broadcast(projected.sparkSession.sparkContext.broadcast(model))
    schema = StructType(list(projected.schema.fields)
                        + [StructField("cluster", LongType(), False),
                           StructField("probe", LongType(), False)])

    def expand(batches):
        import numpy as np

        cid_arr, cent_mat = bc.value
        C = np.asarray(cent_mat, dtype=np.int64)
        cids_np = np.asarray(cid_arr, dtype=np.int64)
        c_norm = (C * C).sum(axis=1)
        p = min(n_probe, len(cid_arr))
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cluster=np.array([], dtype=np.int64),
                                 probe=np.array([], dtype=np.int64))
                continue
            V = np.array([np.asarray(v, dtype=np.int64) for v in pdf["_qv"]],
                         dtype=np.int64)
            dist = c_norm[None, :] - 2 * (V @ C.T)
            idx = np.argsort(dist, axis=1, kind="stable")[:, :p]
            out = pdf.loc[pdf.index.repeat(p)].reset_index(drop=True)
            out["cluster"] = cids_np[idx.ravel()]
            out["probe"] = np.tile(np.arange(1, p + 1), len(pdf))
            yield out

    return projected.mapInPandas(expand, schema=schema)


def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str, dim: int | None = None) -> DataFrame:
    """Assign every vector to its nearest centroid by squared L2 (integer-
    exact on quantized vectors; ties break to the lowest centroid id).

    The centroid frame is the MODEL — K rows — so collecting it to the
    driver is the correct move (same as fitting any broadcast model); the
    corpus-side work runs through ivf_assign_q's broadcast + numpy argmin
    map. Pass ``dim`` when the corpus dimensionality is known (see
    _collect_centroids on ragged rows). Returns (id, cluster, qv)."""
    cent_rows = _collect_centroids(centroids, id_col, vec_col, dim)
    if not cent_rows:
        raise ValueError("ivf_assign: centroid frame is empty")
    dim = len(cent_rows[0][1])
    projected = valid_quantized(corpus, id_col, vec_col, dim)
    return ivf_assign_q(projected, [c for c, _ in cent_rows], [v for _, v in cent_rows])


def _kmeans_fit_local(ids: list[int], vecs: list[list[int]], k: int,
                      n_iter: int) -> list[list[int]]:
    """Driver-local Lloyd's over an already-collected training sample —
    bit-identical to the distributed path: same md5-ordered init, same
    integer argmin (c_norm - 2 v.c, ties to lowest cid), same
    floor(float(sum)/float(n) + 0.5) means (int64 sums are exact in numpy
    and in Spark's SUM alike, and the double division uses the identical
    operand order), empty clusters keeping their previous centroid."""
    import hashlib
    import math

    import numpy as np

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    order = sorted(range(len(ids)), key=lambda i: (h(ids[i]), ids[i]))[:k]
    cents = [[int(x) for x in vecs[i]] for i in order]
    Vm = np.asarray(vecs, dtype=np.int64)
    for _ in range(n_iter):
        C = np.asarray(cents, dtype=np.int64)
        c_norm = (C * C).sum(axis=1)
        assign = np.argmin(c_norm[None, :] - 2 * (Vm @ C.T), axis=1)
        for c in range(len(cents)):
            mask = assign == c
            n = int(mask.sum())
            if n == 0:
                continue
            sums = Vm[mask].sum(axis=0)
            cents[c] = [int(math.floor(float(int(s)) / float(n) + 0.5))
                        for s in sums]
    return cents


def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, k: int,
               n_iter: int = 2, dim: int = 64,
               train_limit: int | None = None,
               driver_local: bool | None = None) -> list[list[int]]:
    """Deterministic Lloyd's k-means over quantized vectors; returns the
    trained centroid matrix (cid = list index, 0..k-1).

    - init: the k rows with smallest (md5_long(id), id) — a deterministic
      pseudo-random sample expressed as orderBy().limit(k), which Spark
      executes as per-partition top-k + driver merge, not a full sort.
    - each round: broadcast-argmin assignment (ivf_assign_q), then
      per-cluster per-dimension integer means as dim parallel SUM columns
      (map-side partial agg reduces every partition to K rows before the
      one K-row shuffle); new component = floor(sum/n + 0.5) with the
      division done double-precision in the same operand order as the
      DuckDB oracle. Empty clusters keep their previous centroid.

    Only models (K x dim ints) ever reach the driver; the corpus-side work
    is one map + one K-row-wide aggregate per round.

    ``train_limit``: the fit-cost scale knob. When set, Lloyd's rounds run
    on the ``train_limit`` rows with smallest (md5_long(id), id) — the
    SAME deterministic pseudo-random order the init draw uses, so the
    sample is reproducible and oracle-replicable — instead of the full
    corpus. Fit cost drops from O(n_iter * n * K) to O(n_iter * S * K)
    while callers still assign the FULL corpus with the trained model
    once. The default (None) trains on everything.

    ``driver_local``: where the Lloyd's iterations run. None (default)
    auto-selects: a ``train_limit``-bounded sample is fetched to the
    driver ONCE (S x dim int64s — a model-sized payload) and all
    iterations run in local numpy, collapsing the fit from (n_iter + 2)
    Spark jobs to 1; an unbounded fit stays distributed (collecting an
    unbounded corpus is the anti-pattern this module bans). Pass
    True/False to force a path — the equality test pins both paths
    bit-identical, so the choice is pure scheduling, never semantics."""
    import math

    from cliqz_etl_spark.functions.hashing import md5_long
    from cliqz_etl_spark.operators.dedup import _materialize

    local = driver_local if driver_local is not None else (train_limit is not None)
    if local and train_limit is None:
        raise ValueError(
            "driver_local=True requires train_limit: the local path "
            "collects the training sample, which must be bounded")

    proj = valid_quantized(df, id_col, vec_col, dim)
    if train_limit is not None:
        if train_limit < k:
            raise ValueError(
                f"train_limit={train_limit} must be >= k={k} "
                "(the init draw needs k distinct rows)")
        proj = (proj.select(
                    "_id", "_qv",
                    md5_long(F.col("_id").cast("string")).alias("__h"))
                .orderBy(F.asc("__h"), F.asc("_id"))
                .limit(train_limit)
                .drop("__h"))
    if local:
        rows = proj.collect()  # bounded by train_limit: a model fetch
        if not rows:
            raise ValueError(
                "kmeans_fit: no valid training vectors "
                "(empty frame, or every vector failed valid_quantized)")
        return _kmeans_fit_local([int(r["_id"]) for r in rows],
                                 [[int(x) for x in r["_qv"]] for r in rows],
                                 k, n_iter)
    proj = _materialize(proj)
    init_rows = (
        proj.select("_id", "_qv", md5_long(F.col("_id").cast("string")).alias("_h"))
        .orderBy(F.asc("_h"), F.asc("_id"))
        .limit(k)
        .collect()
    )
    if not init_rows:
        # Loud driver-side failure (matching ivf_assign/ivf_topk): training
        # on an empty/all-invalid corpus otherwise surfaces as an opaque
        # numpy worker traceback several stages later.
        raise ValueError(
            "kmeans_fit: no valid training vectors "
            "(empty frame, or every vector failed valid_quantized)")
    cents = [[int(x) for x in r["_qv"]] for r in init_rows]
    for _ in range(n_iter):
        assigned = ivf_assign_q(proj, list(range(len(cents))), cents)
        stats = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("_qv")[d]).alias(f"s{d}") for d in range(dim)],
        ).collect()
        means = {
            int(r["cluster"]): [
                int(math.floor(float(r[f"s{d}"]) / float(r["n"]) + 0.5))
                for d in range(dim)
            ]
            for r in stats
        }
        cents = [means.get(c, cents[c]) for c in range(len(cents))]
    return cents


def ivf_build_index(corpus: DataFrame, centroids: DataFrame, id_col: str,
                    vec_col: str, dim: int | None = None
                    ) -> tuple[list[int], list[list[int]], DataFrame]:
    """The per-index prep ``ivf_topk`` needs: the collected centroid
    model and the persisted full-corpus cluster assignment. Split out so
    a caller probing the SAME index under several configurations
    (ivf_probe_recall_sweep's n_probe curve) builds it once — the
    assignment is the corpus-sized pass, and re-deriving it per probe
    config re-ran both the model collect and the assignment job each
    time. At 100 TB this artifact IS the index: a table bucketed by
    ``cluster``, written once, probed by every query."""
    from cliqz_etl_spark.operators.dedup import _materialize

    cent_rows = _collect_centroids(centroids, id_col, vec_col, dim)
    if not cent_rows:
        raise ValueError("ivf_topk: centroid frame is empty")
    cids = [c for c, _ in cent_rows]
    cents = [v for _, v in cent_rows]
    projected = valid_quantized(corpus, id_col, vec_col, len(cents[0]))
    # both join sides derive from `assigned`; persist so the assignment
    # map evaluates once, not per side
    assigned = _materialize(ivf_assign_q(projected, cids, cents))
    return cids, cents, assigned


def ivf_topk(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
             id_col: str, vec_col: str, k: int = 3,
             n_probe: int = 1, dim: int | None = None,
             index: tuple[list[int], list[list[int]], DataFrame] | None = None,
             ) -> DataFrame:
    """IVF search: rank within the query's ``n_probe`` nearest clusters.
    n_probe=1 is the cheapest/lowest-recall point; raising it trades a
    linear increase in scored candidates for recall, while the corpus
    side stays put (each corpus vector lives in exactly one bucket — only
    the tiny query side fans out, so probed buckets stay disjoint and no
    dedup is needed). The bucketed join is the scale path — at 100 TB,
    `assigned` is a table bucketed by ``cluster``. Pass a prebuilt
    ``index`` (from ``ivf_build_index``) to share the model collect and
    the corpus assignment across probe configurations."""
    from pyspark.sql import Window

    cids, cents, assigned = (index if index is not None else
                             ivf_build_index(corpus, centroids, id_col,
                                             vec_col, dim))
    if n_probe == 1:
        q = assigned.select(
            F.col("_id").alias("query_id"), F.col("_qv").alias("qv"),
            F.col("cluster").alias("qcluster"),
            norm2_q(F.col("_qv")).cast("double").alias("qn"),
        ).join(queries.select(F.col(id_col).alias("query_id")), "query_id")
    else:
        qvecs = assigned.select("_id", "_qv").join(
            queries.select(F.col(id_col).alias("_id")), "_id")
        q = ivf_assign_multi_q(qvecs, cids, cents, n_probe).select(
            F.col("_id").alias("query_id"), F.col("_qv").alias("qv"),
            F.col("cluster").alias("qcluster"),
            norm2_q(F.col("_qv")).cast("double").alias("qn"),
        )
    c = assigned.select(
        F.col("_id").alias("neighbor_id"), F.col("_qv").alias("cv"), "cluster",
        norm2_q(F.col("_qv")).cast("double").alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), (F.col("cluster") == F.col("qcluster"))
               & (F.col("query_id") != F.col("neighbor_id")))
        # norms hoisted to once-per-row above; dot/sqrt(qn*cn) keeps the
        # oracle's exact double operation order (see brute_force_topk)
        .select("query_id", "neighbor_id",
                (dot_q(F.col("qv"), F.col("cv")).cast("double")
                 / F.sqrt(F.col("qn") * F.col("cn"))).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.floor(F.col("cos") * 10000 + 0.5).cast("long").alias("cos_x10k"),
        )
    )


def semantic_verdicts(df: DataFrame, id_col: str, vec_col: str, dim: int,
                      k: int, n_iter: int = 2,
                      thresh_x10k: int = 4000,
                      train_limit: int | None = None) -> DataFrame:
    """SemDeDup-style per-vector near-duplicate verdict.

    Train a k-means coarse quantizer (kmeans_fit), assign every valid
    vector with one broadcast-matmul map, then self-join on the cluster id
    and drop any vector whose cosine to a LOWER-id cluster-mate reaches
    ``thresh_x10k`` / 10000. Returns (id_col, cluster, keep).

    Scale law: candidate pairs are sum_c n_c^2, so ``k`` must grow with
    the corpus to hold the mean cluster size constant (k ~ n / target
    cluster size) — then pair cost is ~linear in n and the shuffle key
    (cluster) stays balanced by construction. The model is k x dim int64s
    on the driver/broadcast; at k=4096, dim=64 that is ~2 MB. Since k
    grows with n, the FIT cost O(n_iter * n * k) grows quadratically-ish
    in n — ``train_limit`` caps the training sample (see kmeans_fit) so
    fit cost is O(n_iter * S * k) while assignment and the pair join
    still cover the full corpus; the registry query keeps the default
    full-corpus fit its oracle replays.
    """
    from cliqz_etl_spark.operators.dedup import _materialize

    cents = kmeans_fit(df, id_col, vec_col, k, n_iter, dim=dim,
                       train_limit=train_limit)
    proj = valid_quantized(df, id_col, vec_col, dim)
    # len(cents), not k: a corpus with fewer valid rows than K yields a
    # short model (cid = list index), exactly like the oracle's LIMIT k
    assigned = _materialize(ivf_assign_q(proj, list(range(len(cents))), cents))
    norm = norm2_q(F.col("_qv")).cast("double")
    a = assigned.select(F.col("_id").alias("id_a"), F.col("_qv").alias("qa"),
                        "cluster", norm.alias("na"))
    b = assigned.select(F.col("_id").alias("id_b"), F.col("_qv").alias("qb"),
                        "cluster", norm.alias("nb"))
    cos = (dot_q(F.col("qa"), F.col("qb")).cast("double")
           / F.sqrt(F.col("na") * F.col("nb")))
    dropped = (
        a.join(b, ["cluster"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.floor(cos * 10000 + 0.5).cast("long") >= thresh_x10k)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(F.col("_id").alias(id_col),
                        F.col("cluster").cast("long").alias("cluster"))
        .join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(id_col, "cluster",
                F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )
