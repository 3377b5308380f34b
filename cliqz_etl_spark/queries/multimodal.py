"""Multimodal plumbing query: binary payload -> Arrow-batched metadata
extraction via mapInPandas. The decode itself is the deterministic stub
(multimodal/binary_ops.py), so the full Spark plumbing — binary column,
batch iteration, error->NULL rows — is oracle-checkable end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cliqz_etl_spark.multimodal.binary_ops import attach_binary, extract_media_meta
from cliqz_etl_spark.queries import query
from cliqz_etl_spark.tables import load_table


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
