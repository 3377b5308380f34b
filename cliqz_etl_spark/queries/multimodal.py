"""Multimodal plumbing query: binary payload -> Arrow-batched metadata
extraction via mapInPandas. The decode itself is the deterministic stub
(multimodal/binary_ops.py), so the full Spark plumbing — binary column,
batch iteration, error->NULL rows — is oracle-checkable end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliqz_etl_spark.multimodal.binary_ops import (
    attach_binary,
    extract_media_meta,
    frame_sample,
)
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table

# Gate parameters for frame_sample_stats: 64-byte 'frames', every 2nd one
# sampled — sized so the ~300-byte test documents produce multi-chunk blobs
# and the sampling stride actually skips frames.
_FRAME_CHUNK = 64
_FRAME_EVERY = 2


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id AS id,
           octet_length(encode(text))            AS byte_len,
           upper(substring(hex(encode(text)), 1, 8)) AS magic,
           CAST((octet_length(encode(text)) % 640) + 1 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) % 480) + 1 AS INTEGER) AS height,
           TRUE AS ok
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as UTF-8 blobs -> mapInPandas metadata extraction.
    The oracle recomputes the stub decoder's arithmetic in SQL; a real
    image decoder swaps in without touching the plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_binary(docs, "text")
    return extract_media_meta(blobs, "doc_id", "blob")


@query(
    "frame_sample_stats",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS L FROM documents
    ), c AS (
        SELECT doc_id, L,
               unnest(range(0, CAST(ceil(L / {_FRAME_CHUNK}.0) AS BIGINT),
                            {_FRAME_EVERY})) AS i
        FROM b WHERE L > 0
    )
    SELECT doc_id AS doc_id,
           COUNT(*) AS n_frames,
           CAST(SUM(LEAST({_FRAME_CHUNK}, L - i * {_FRAME_CHUNK})) AS BIGINT)
               AS frame_bytes
    FROM c GROUP BY doc_id
    """,
)
def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video-frame-sampling plumbing as a checked gate query: blobs ->
    mapInPandas 1->N frame rows (every 2nd 64-byte 'frame') -> per-doc
    frame count and sampled byte volume. The stub decode is deterministic
    arithmetic on blob length, so the oracle replays it with a range()
    unnest — a real ffmpeg/pyav decoder swaps in without touching the
    plumbing, batch shape, or output schema."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_binary(docs, "text")
    frames = frame_sample(blobs, "doc_id", "blob",
                          every_n=_FRAME_EVERY, chunk_bytes=_FRAME_CHUNK)
    return (
        frames.select(F.col("id").alias("doc_id"), "frame_blob")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.sum(F.length("frame_blob")).cast("long").alias("frame_bytes"))
    )
