"""Multimodal binary plumbing: mapInPandas batch shape, error->NULL rows,
1->N frame sampling expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from cliqz_etl_spark.multimodal.binary_ops import (
    attach_binary,
    extract_media_meta,
    fake_decode,
    frame_sample,
)


def test_extract_media_meta_and_error_rows(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, None)], ["id", "txt"]
    )
    blobs = attach_binary(df, "txt")
    out = {r["id"]: r for r in extract_media_meta(blobs, "id", "blob").collect()}
    assert out[1]["byte_len"] == 11 and out[1]["magic"] == "68656C6C"
    assert out[1]["width"] == 12 and out[1]["height"] == 12 and out[1]["ok"]
    assert out[2]["byte_len"] == 1
    # NULL blob -> decoder raises -> ok=false row, job survives
    assert out[3]["ok"] is False and out[3]["byte_len"] is None


def test_custom_decoder_plugs_in(spark):
    df = attach_binary(spark.createDataFrame([(1, "abc")], ["id", "txt"]), "txt")
    meta = extract_media_meta(df, "id", "blob",
                              decoder=lambda b: {"width": 640, "height": 480})
    row = meta.first()
    assert (row["width"], row["height"]) == (640, 480)


def test_frame_sample_expansion(spark):
    # 3 KiB blob -> 3 chunk-frames at every_n=1
    df = spark.createDataFrame([(7, "z" * 3072)], ["id", "txt"])
    frames = frame_sample(attach_binary(df, "txt"), "id", "blob", every_n=1).collect()
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
    assert all(len(bytes(f["frame_blob"])) == 1024 for f in frames)
    assert {f["id"] for f in frames} == {7}


def test_fake_decode_deterministic():
    assert fake_decode(b"abc") == {"width": 4, "height": 4}


def test_resize_media_caps_payload_and_survives_nulls(spark):
    from pyspark.sql import functions as F

    from cliqz_etl_spark.multimodal.binary_ops import resize_media

    df = spark.createDataFrame([(1, "x" * 1000), (2, "y")], ["id", "txt"])
    blobs = attach_binary(df, "txt").withColumn(
        "blob", F.when(F.col("id") == 2, F.lit(None)).otherwise(F.col("blob")))
    out = {r["id"]: r for r in
           resize_media(blobs, "id", "blob", target_w=8, target_h=8).collect()}
    # cap = 8*8//8 = 8 bytes; short payloads pass through untouched
    assert len(bytes(out[1]["out_blob"])) == 8
    assert (out[1]["out_w"], out[1]["out_h"]) == (8, 8)
    assert out[1]["in_w"] == (1000 % 640) + 1
    # NULL blob -> ok=false row with NULL fields, job survives
    assert out[2]["ok"] is False and out[2]["out_blob"] is None


def test_embed_media_matches_hash_formula_and_feeds_ann(spark):
    import hashlib

    from cliqz_etl_spark.multimodal.binary_ops import EMBED_MOD, embed_media

    df = attach_binary(spark.createDataFrame([(5, "hello")], ["id", "txt"]), "txt")
    row = embed_media(df, "id", "blob", dim=4).first()
    want = [
        (int(hashlib.md5(b"hello|" + str(j).encode()).hexdigest()[:15], 16)
         % EMBED_MOD) / EMBED_MOD
        for j in range(4)
    ]
    assert row["ok"] and list(row["embedding"]) == want
    # output shape is the similarity family's input contract
    assert all(0.0 <= v < 1.0 for v in row["embedding"])


def test_embed_media_custom_embedder_plugs_in(spark):
    from cliqz_etl_spark.multimodal.binary_ops import embed_media

    df = attach_binary(spark.createDataFrame([(9, "abc")], ["id", "txt"]), "txt")
    row = embed_media(df, "id", "blob",
                      embedder=lambda b: [float(len(b))]).first()
    assert list(row["embedding"]) == [3.0]


def test_embed_media_output_feeds_ann_topk(spark):
    """The composition the embedder exists for: blobs -> embed_media ->
    brute_force_topk, no adapters — the embedding column satisfies the
    similarity kernels' array<numeric> + valid_quantized contract."""
    from cliqz_etl_spark.multimodal.binary_ops import EMBED_DIM, embed_media
    from cliqz_etl_spark.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [(i, f"document number {i} with shared words") for i in range(8)],
        ["id", "txt"])
    emb = embed_media(attach_binary(docs, "txt"), "id", "blob")
    out = brute_force_topk(emb, emb.where("id < 2"), "id", "embedding",
                           k=3, dim=EMBED_DIM)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1} and all(len(v) == 3 for v in by_q.values())
    # deterministic embedder -> deterministic neighbors across invocations
    again = brute_force_topk(emb, emb.where("id < 2"), "id", "embedding",
                             k=3, dim=EMBED_DIM).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
