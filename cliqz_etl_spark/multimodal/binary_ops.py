"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schemas, batch
iteration, partition sizing, zero-copy Arrow transfer. The actual media
decoding is STUBBED (``decoder=None`` uses a deterministic fake; the image/
audio libraries are not in this container): swap in a real decoder callable
(PIL/opencv/ffmpeg) per batch of bytes and everything else stands.

Scale notes:
- binary payloads ride in the same parquet row groups as their metadata;
  ``spark.sql.files.maxPartitionBytes`` governs scan parallelism, and a
  ``repartition`` before heavy decode keeps one task from hoarding blobs.
- mapInPandas streams batches (``spark.sql.execution.arrow.maxRecordsPerBatch``)
  so a partition of large blobs never materializes at once.
- decode runs once per batch with library startup amortized — the correct
  shape for a 100 TB media crawl.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, byte_len long, magic string, width int, height int, ok boolean"
)


def attach_binary(df: DataFrame, src_col: str, out: str = "blob") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of a string column
    — the test stand-in for real media bytes read from a crawl)."""
    return df.withColumn(out, F.encode(F.col(src_col), "UTF-8"))


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives pseudo
    dimensions from the payload. A real implementation would be
    ``PIL.Image.open(io.BytesIO(blob)).size`` — unavailable here (STUB)."""
    if blob is None:
        raise ValueError("null blob")
    n = len(blob)
    return {"width": (n % 640) + 1, "height": (n % 480) + 1}


def extract_media_meta(df: DataFrame, id_col: str, blob_col: str,
                       decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """Decode metadata per blob via mapInPandas (Arrow batches).

    Failures follow the engine-wide error->NULL cell discipline: a blob the
    decoder rejects yields ok=false with NULL dimensions, never a failed
    task — at scale a single corrupt file must not kill a 10^6-task job.
    """
    decode = decoder or fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the select below aliases id_col -> "id" before the Arrow hop
            out = {"id": pdf["id"], "byte_len": [], "magic": [],
                   "width": [], "height": [], "ok": []}
            for blob in pdf[blob_col]:
                try:
                    b = bytes(blob)
                    meta = decode(b)
                    out["byte_len"].append(len(b))
                    out["magic"].append(b[:4].hex().upper())
                    out["width"].append(meta.get("width"))
                    out["height"].append(meta.get("height"))
                    out["ok"].append(True)
                except Exception:
                    out["byte_len"].append(None)
                    out["magic"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(blob_col)).mapInPandas(
        process, schema=MEDIA_META_SCHEMA
    )


def frame_sample(df: DataFrame, id_col: str, blob_col: str,
                 every_n: int = 10, chunk_bytes: int = 1024) -> DataFrame:
    """Video frame sampling STUB: emits (id, frame_idx, frame_blob) rows,
    one per sampled frame. The fake treats each ``chunk_bytes`` slice as a
    'frame'; a real implementation decodes with ffmpeg/pyav per batch. The
    1->N row expansion shape (mapInPandas, not explode over a UDF-built
    array) is the part that matters at scale: frames stream out without
    the whole decoded video ever being a single row value."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, blob in zip(pdf["id"], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                chunks = [b[i:i + chunk_bytes]
                          for i in range(0, len(b), chunk_bytes)]
                for i, chunk in enumerate(chunks[::every_n]):
                    ids.append(rid)
                    idxs.append(i * every_n)
                    frames.append(chunk)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_blob": frames})

    return df.select(F.col(id_col).alias("id"), F.col(blob_col)).mapInPandas(
        process, schema="id long, frame_idx int, frame_blob binary"
    )


RESIZE_SCHEMA = ("id long, in_w int, in_h int, out_w int, out_h int, "
                 "out_blob binary, ok boolean")


def resize_media(df: DataFrame, id_col: str, blob_col: str,
                 target_w: int = 64, target_h: int = 64,
                 resizer: Callable[[bytes, int, int], bytes] | None = None
                 ) -> DataFrame:
    """Image resize STUB over mapInPandas: binary in -> binary out with
    typed dimension metadata. The fake 'resample' keeps the first
    min(len, target_w*target_h//8) payload bytes (deterministic arithmetic
    a SQL oracle can replay); a real implementation is
    ``PIL.Image.open(...).resize((w,h)).tobytes()`` per blob, batch-
    amortized — unavailable in this container (STUB). Failures follow the
    error->NULL discipline: ok=false row, never a failed task."""
    def fake_resize(b: bytes, tw: int, th: int) -> bytes:
        return b[: min(len(b), tw * th // 8)]

    resample = resizer or fake_resize

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": pdf["id"], "in_w": [], "in_h": [], "out_w": [],
                   "out_h": [], "out_blob": [], "ok": []}
            for blob in pdf[blob_col]:
                try:
                    b = bytes(blob)
                    meta = fake_decode(b)
                    out["in_w"].append(meta["width"])
                    out["in_h"].append(meta["height"])
                    out["out_w"].append(target_w)
                    out["out_h"].append(target_h)
                    out["out_blob"].append(resample(b, target_w, target_h))
                    out["ok"].append(True)
                except Exception:
                    for k in ("in_w", "in_h", "out_w", "out_h", "out_blob"):
                        out[k].append(None)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(blob_col)).mapInPandas(
        process, schema=RESIZE_SCHEMA
    )


EMBED_DIM = 8
EMBED_MOD = 10_000


def embed_media(df: DataFrame, id_col: str, blob_col: str,
                dim: int = EMBED_DIM,
                embedder: Callable[[bytes], list] | None = None) -> DataFrame:
    """Feature extraction STUB: blob -> fixed-dim embedding (array<double>)
    via mapInPandas, the media half of the embedding->ANN pipeline (output
    feeds operators/similarity.py unchanged). The fake embedder hashes the
    payload per dimension with the engine-portable md5-60bit family
    (functions/hashing.py semantics, here over raw bytes), component j =
    md5_long(blob + '|' + j) % 10000 / 10000 — so a DuckDB oracle can
    recompute every component exactly. A real embedder (CLIP/wav2vec
    forward pass per Arrow batch) swaps in without touching schema,
    batching, or partitioning (STUB)."""
    import hashlib

    def fake_embed(b: bytes) -> list:
        return [
            (int(hashlib.md5(b + b"|" + str(j).encode()).hexdigest()[:15], 16)
             % EMBED_MOD) / EMBED_MOD
            for j in range(dim)
        ]

    embed = embedder or fake_embed

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs, oks = [], [], []
            for rid, blob in zip(pdf["id"], pdf[blob_col]):
                try:
                    v = embed(bytes(blob))
                    ids.append(rid)
                    vecs.append(v)
                    oks.append(True)
                except Exception:
                    ids.append(rid)
                    vecs.append(None)
                    oks.append(False)
            yield pd.DataFrame({"id": ids, "embedding": vecs, "ok": oks})

    return df.select(F.col(id_col).alias("id"), F.col(blob_col)).mapInPandas(
        process, schema="id long, embedding array<double>, ok boolean"
    )
