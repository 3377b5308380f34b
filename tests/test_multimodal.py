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


# ---- real BMP/PPM codec ----------------------------------------------------


def test_bmp_codec_known_bytes():
    """decode_bmp against a hand-assembled reference file: 2x2 24-bit BMP,
    bottom-up BGR rows with 2 pad bytes per row — every byte accounted
    for, so a layout regression cannot hide behind a roundtrip."""
    import struct

    from cliqz_etl_spark.multimodal.binary_ops import decode_bmp, encode_bmp

    # top-down RGB pixels: (R0,G0,B0)=(10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    blob = encode_bmp(2, 2, px)
    # file header: magic, size 54 + 2 rows * (6 data + 2 pad), data offset
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 2)[0] == 54 + 16
    assert struct.unpack_from("<I", blob, 10)[0] == 54
    # info header: 40-byte BITMAPINFOHEADER, w=2, h=2 (positive: bottom-up), 24bpp, BI_RGB
    assert struct.unpack_from("<Iii", blob, 14) == (40, 2, 2)
    assert struct.unpack_from("<HHI", blob, 26) == (1, 24, 0)
    # pixel array: BOTTOM row first, BGR order, 2 pad bytes per row
    assert blob[54:62] == bytes([90, 80, 70, 120, 110, 100, 0, 0])
    assert blob[62:70] == bytes([30, 20, 10, 60, 50, 40, 0, 0])
    m = decode_bmp(blob)
    assert (m["width"], m["height"], m["pixels"]) == (2, 2, px)


def test_image_codec_roundtrips_and_rejects():
    from cliqz_etl_spark.multimodal.binary_ops import (
        decode_image, encode_bmp, encode_ppm, nn_resize, resize_image)

    for w, h in [(1, 1), (3, 1), (5, 4), (13, 7)]:
        px = bytes((i * 31 + 7) % 256 for i in range(w * h * 3))
        for enc in (encode_bmp, encode_ppm):
            m = decode_image(enc(w, h, px))
            assert (m["width"], m["height"], m["pixels"]) == (w, h, px)
            rs = decode_image(resize_image(enc(w, h, px), 4, 3))
            assert (rs["width"], rs["height"]) == (4, 3)
            assert rs["pixels"] == nn_resize(px, w, h, 4, 3)
    # malformed payloads raise ValueError (-> family ok=false rows)
    import pytest
    for bad in (None, b"", b"PNG!", b"BM\x00\x01", b"P6\n2 2\n255",
                encode_bmp(2, 2, bytes(12))[:-5]):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_ppm_header_comments_and_whitespace():
    from cliqz_etl_spark.multimodal.binary_ops import decode_ppm

    px = bytes(range(12))
    blob = b"P6\n# a comment line\n 2\t2 \n# another\n255\n" + px
    m = decode_ppm(blob)
    assert (m["width"], m["height"], m["pixels"]) == (2, 2, px)


def test_resize_media_real_path(spark):
    """The plumbing seam carries the REAL codec: resize_media with
    decoder=decode_image / resizer=resize_image over genuine BMP blobs
    yields true dimensions and a decodable resized payload; a non-image
    blob in the same batch follows the ok=false discipline."""
    from cliqz_etl_spark.multimodal.binary_ops import (
        decode_image, encode_bmp, nn_resize, resize_image, resize_media)

    blobs = [(i, encode_bmp(i + 2, i + 1,
                            bytes((i * 7 + j) % 256
                                  for j in range((i + 2) * (i + 1) * 3))))
             for i in range(3)] + [(99, b"not an image")]
    df = spark.createDataFrame(blobs, "id long, blob binary")
    rows = {r["id"]: r for r in resize_media(
        df, "id", "blob", target_w=2, target_h=2,
        resizer=resize_image, decoder=decode_image).collect()}
    assert rows[99]["ok"] is False and rows[99]["out_blob"] is None
    for i in range(3):
        r = rows[i]
        assert (r["in_w"], r["in_h"], r["ok"]) == (i + 2, i + 1, True)
        dec = decode_image(bytes(r["out_blob"]))
        src = bytes((i * 7 + j) % 256 for j in range((i + 2) * (i + 1) * 3))
        assert dec["pixels"] == nn_resize(src, i + 2, i + 1, 2, 2)


def test_wav_codec_known_bytes():
    """decode_wav against hand-assembled reference bytes: canonical 44-byte
    header + little-endian int16 frames, plus chunk-walk tolerance for an
    odd-sized LIST chunk padded to word alignment before data."""
    import struct

    from cliqz_etl_spark.multimodal.binary_ops import decode_wav, encode_wav

    blob = encode_wav(8000, [0, 1000, -1000, 32767, -32768])
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert blob[12:16] == b"fmt " and struct.unpack_from("<I", blob, 16)[0] == 16
    # PCM, mono, 8kHz, byte rate 16k, block align 2, 16-bit
    assert struct.unpack_from("<HHIIHH", blob, 20) == (1, 1, 8000, 16000, 2, 16)
    assert blob[36:40] == b"data" and struct.unpack_from("<I", blob, 40)[0] == 10
    assert blob[44:] == struct.pack("<5h", 0, 1000, -1000, 32767, -32768)
    m = decode_wav(blob)
    assert (m["sample_rate"], m["n_channels"], m["n_samples"]) == (8000, 1, 5)
    assert m["samples"] == [0, 1000, -1000, 32767, -32768]
    # extra odd-sized chunk between fmt and data survives the walk
    fmt_chunk, data_chunk = blob[12:36], blob[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = (b"RIFF" + struct.pack(
        "<I", 4 + len(fmt_chunk) + len(extra) + len(data_chunk)) + b"WAVE"
        + fmt_chunk + extra + data_chunk)
    assert decode_wav(patched)["samples"] == m["samples"]


def test_wav_codec_rejects_malformed():
    import pytest

    from cliqz_etl_spark.multimodal.binary_ops import decode_wav, encode_wav

    good = encode_wav(8000, [1, 2, 3])
    for bad in (None, b"", b"RIFFxxxxWAVE", good[:30],
                b"RIFX" + good[4:],                 # wrong magic
                good.replace(b"data", b"datx")):    # no data chunk
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_resample_audio_floor_index_convention():
    from cliqz_etl_spark.multimodal.binary_ops import resample_audio

    s = list(range(10))
    # 10 samples at 8k -> 4k: every 2nd sample, floor convention
    assert resample_audio(s, 8000, 4000) == [0, 2, 4, 6, 8]
    # upsample 4k -> 8k: each source sample twice
    assert resample_audio([5, 7], 4000, 8000) == [5, 5, 7, 7]
    assert resample_audio([], 8000, 4000) == []


def test_png_codec_roundtrip_and_filter_reversal():
    """decode_png must reverse every row-filter type. The filtered
    scanlines here are built BY HAND (independent of encode_png, which
    only emits filter 0), so the Sub/Up/Average/Paeth paths are checked
    against manually filtered data, not a circular roundtrip."""
    import struct
    import zlib

    from cliqz_etl_spark.multimodal.binary_ops import (
        _PNG_SIG, decode_image, decode_png, encode_png, nn_resize,
        resize_image)

    for w, h in [(1, 1), (3, 2), (13, 7)]:
        px = bytes((i * 31 + 7) % 256 for i in range(w * h * 3))
        m = decode_png(encode_png(w, h, px))
        assert (m["width"], m["height"], m["pixels"]) == (w, h, px)
        rs = decode_image(resize_image(encode_png(w, h, px), 4, 3))
        assert rs["pixels"] == nn_resize(px, w, h, 4, 3)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    w, h = 3, 5
    px = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    stride = w * 3
    rows = [px[y * stride:(y + 1) * stride] for y in range(h)]
    raw, prev = bytearray(), bytes(stride)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        row, f = rows[y], bytearray(rows[y])
        if ft == 1:
            for i in range(stride - 1, 2, -1):
                f[i] = (row[i] - row[i - 3]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                f[i] = (row[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = row[i - 3] if i >= 3 else 0
                f[i] = (row[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = row[i - 3] if i >= 3 else 0
                b, c = prev[i], (prev[i - 3] if i >= 3 else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[i] = (row[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(f)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert decode_png(blob)["pixels"] == px


def test_png_codec_color_normalization_and_crc():
    import struct
    import zlib

    import pytest

    from cliqz_etl_spark.multimodal.binary_ops import (
        _PNG_SIG, decode_png, encode_png)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # RGBA drops alpha; grayscale replicates to RGB
    cases = [
        (6, 4, bytes([10, 20, 30, 255, 40, 50, 60, 128,
                      70, 80, 90, 0, 100, 110, 120, 7]),
         bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])),
        (0, 1, bytes([5, 9, 200, 250]),
         bytes([5, 5, 5, 9, 9, 9, 200, 200, 200, 250, 250, 250])),
    ]
    for ctype, n_ch, src, want in cases:
        raw = b"".join(b"\x00" + src[y * 2 * n_ch:(y + 1) * 2 * n_ch]
                       for y in range(2))
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, ctype, 0, 0, 0)
        blob = (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        assert decode_png(blob)["pixels"] == want
    # corrupted CRC and unsupported variants raise
    bad = bytearray(encode_png(2, 2, bytes(12)))
    bad[-6] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob16 = (_PNG_SIG + chunk(b"IHDR", ihdr16)
              + chunk(b"IDAT", zlib.compress(b"\x00" * 25))
              + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob16)


def test_gif_through_decode_and_resize_seams():
    """GIF participates in the shared dispatch: decode_image sniffs the
    magic, and resize_image transcodes the resampled RGB to BMP (a GIF
    re-encode would need palette re-quantization — documented)."""
    from cliqz_etl_spark.multimodal.binary_ops import (decode_gif,
                                                       decode_image,
                                                       encode_gif,
                                                       nn_resize,
                                                       resize_image)

    w, h = 6, 4
    idx = bytes((5 * i) % 256 for i in range(w * h))
    blob = encode_gif(w, h, idx)
    meta = decode_image(blob)
    assert (meta["format"], meta["width"], meta["height"]) == ("gif", w, h)
    out = resize_image(blob, 3, 2)
    rs = decode_image(out)
    assert rs["format"] == "bmp" and (rs["width"], rs["height"]) == (3, 2)
    want = nn_resize(decode_gif(blob)["pixels"], w, h, 3, 2)
    assert rs["pixels"] == want


def test_gif_lzw_dictionary_reset_roundtrip():
    """A stream long and diverse enough to exhaust the 4096-entry LZW
    dictionary forces the mid-stream clear/reset path on BOTH sides."""
    from cliqz_etl_spark.multimodal.binary_ops import _lzw_decode, _lzw_encode

    data = bytes((i * 17 + (i >> 3)) % 256 for i in range(50_000))
    assert _lzw_decode(_lzw_encode(data)) == data


def test_gif_frame_dims_come_from_image_descriptor():
    """Real-world GIFs routinely declare a logical screen larger than the
    single frame; the decoder must report the frame's own dimensions (the
    image descriptor), not the screen's."""
    from cliqz_etl_spark.multimodal.binary_ops import decode_gif, encode_gif

    w, h = 5, 3
    idx = bytes((3 * i) % 256 for i in range(w * h))
    blob = bytearray(encode_gif(w, h, idx))
    # inflate the logical screen descriptor only (bytes 6..10)
    blob[6:8] = (40).to_bytes(2, "little")
    blob[8:10] = (30).to_bytes(2, "little")
    meta = decode_gif(bytes(blob))
    assert (meta["width"], meta["height"]) == (w, h)
    ref = decode_gif(encode_gif(w, h, idx))
    assert meta["pixels"] == ref["pixels"]


def test_gif_truncation_raises_valueerror_never_indexerror():
    """The multimodal family's contract is error->NULL, which the Arrow
    wrappers implement by catching ValueError — a truncated payload must
    therefore raise ValueError at every cut point, not IndexError."""
    import pytest

    from cliqz_etl_spark.multimodal.binary_ops import decode_gif, encode_gif

    blob = encode_gif(4, 4, bytes(range(16)))
    for cut in (4, 8, 12, 13, 200, 400, len(blob) - 2):
        if cut >= len(blob):
            continue
        with pytest.raises(ValueError):
            decode_gif(blob[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a")


def test_jpeg_flat_blocks_roundtrip_exactly():
    """DC-only blocks under the unit quant table are lossless — the
    property the jpeg_decode_stats oracle rides (binary_ops.py JPEG
    section derivation)."""
    from cliqz_etl_spark.multimodal.binary_ops import (decode_jpeg,
                                                       encode_jpeg_gray)

    for rid in (0, 7, 13, 200, 255):
        w, h = rid % 21 + 4, rid % 11 + 4
        bw = (w + 7) // 8
        px = bytes((rid * 37 + ((y // 8) * bw + x // 8) * 29) % 256
                   for y in range(h) for x in range(w))
        meta = decode_jpeg(encode_jpeg_gray(w, h, px))
        assert meta["pixels"] == px
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["n_components"] == 1
        assert meta["n_mcus"] == bw * ((h + 7) // 8)


def test_jpeg_general_path_within_codec_error_bound():
    """Non-flat blocks exercise the AC machinery (run lengths, ZRL, EOB,
    magnitude categories both signs); the FDCT->unit-quant->IDCT round
    trip is then lossy only through coefficient rounding, which bounds
    per-pixel error by ~1 (64 coefficients x 0.5 rounding each, but the
    orthonormal basis spreads it)."""
    import random

    from cliqz_etl_spark.multimodal.binary_ops import (decode_jpeg,
                                                       encode_jpeg_gray)

    rng = random.Random(42)
    for w, h in ((8, 8), (19, 13), (24, 14), (1, 1), (9, 17)):
        px = bytes(rng.randrange(256) for _ in range(w * h))
        meta = decode_jpeg(encode_jpeg_gray(w, h, px))
        errs = [abs(a - b) for a, b in zip(px, meta["pixels"])]
        assert max(errs) <= 2, (w, h, max(errs))
        # gradient image: long zero runs in AC exercise ZRL
        px2 = bytes(min(255, x * 3 + y) for y in range(h) for x in range(w))
        meta2 = decode_jpeg(encode_jpeg_gray(w, h, px2))
        errs2 = [abs(a - b) for a, b in zip(px2, meta2["pixels"])]
        assert max(errs2) <= 2


def test_jpeg_byte_stuffing_survives_roundtrip():
    """Force entropy bytes worth of 0xFF: the writer must stuff 0xFF00
    and the reader must unstuff it (otherwise the stream misparses as a
    marker)."""
    import random

    from cliqz_etl_spark.multimodal.binary_ops import (decode_jpeg,
                                                       encode_jpeg_gray)

    rng = random.Random(7)
    stuffed = 0
    for _ in range(20):
        w = h = 16
        px = bytes(rng.randrange(256) for _ in range(w * h))
        blob = encode_jpeg_gray(w, h, px)
        # count FF00 pairs inside the entropy segment (after SOS)
        sos = blob.find(b"\xff\xda")
        stuffed += blob.count(b"\xff\x00", sos)
        meta = decode_jpeg(blob)
        assert max(abs(a - b)
                   for a, b in zip(px, meta["pixels"])) <= 2
    assert stuffed > 0, "no 0xFF byte was ever stuffed — weak test corpus"


def test_jpeg_truncation_and_seams_raise_valueerror():
    import pytest

    from cliqz_etl_spark.multimodal.binary_ops import (decode_jpeg,
                                                       encode_jpeg_gray)

    blob = encode_jpeg_gray(9, 9, bytes(81))
    for cut in (1, 3, 10, 25, 100, len(blob) - 3):
        if cut >= len(blob):
            continue
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    # declared seams: subsampling and progressive must fail LOUDLY
    ba = bytearray(blob)
    sof = blob.find(b"\xff\xc0")
    ba[sof + 11] = 0x22  # 2x2 sampling
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(ba))
    ba = bytearray(blob)
    ba[sof + 1] = 0xC2   # progressive SOF2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(ba))


def test_jpeg_through_decode_image_seam():
    from cliqz_etl_spark.multimodal.binary_ops import (decode_image,
                                                       encode_jpeg_gray)

    meta = decode_image(encode_jpeg_gray(8, 8, bytes(range(64))))
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"]) == (8, 8)


def test_jpeg_multi_component_interleaved_scan():
    """The decoder's generality beyond the gray encoder: a hand-crafted
    two-component (1x1 sampling) stream with per-component DC predictors
    must decode to interleaved planes."""
    from cliqz_etl_spark.multimodal.binary_ops import (_JPEG_AC_BITS,
                                                       _JPEG_AC_VALS,
                                                       _JPEG_DC_BITS,
                                                       _JPEG_DC_VALS,
                                                       _huff_codes,
                                                       _jpeg_magnitude,
                                                       _jpeg_seg,
                                                       _JpegBitWriter,
                                                       decode_jpeg)

    dc = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    for value in (100, 200):               # one MCU: comp1 block, comp2 block
        t, amp = _jpeg_magnitude(8 * (value - 128))
        code, ln = dc[t]
        w.write(code, ln)
        if t:
            w.write(amp, t)
        code, ln = ac[0x00]                 # EOB, DC-only block
        w.write(code, ln)
    blob = bytearray(b"\xff\xd8")
    blob += _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    blob += _jpeg_seg(0xC0, bytes([8]) + (8).to_bytes(2, "big")
                      + (8).to_bytes(2, "big")
                      + bytes([2, 1, 0x11, 0, 2, 0x11, 0]))
    blob += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                      + bytes(_JPEG_DC_VALS))
    blob += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                      + bytes(_JPEG_AC_VALS))
    blob += _jpeg_seg(0xDA, bytes([2, 1, 0x00, 2, 0x00, 0, 63, 0]))
    blob += w.flush() + b"\xff\xd9"
    meta = decode_jpeg(bytes(blob))
    assert meta["n_components"] == 2
    assert meta["n_mcus"] == 1
    px = meta["pixels"]
    assert px[0::2] == bytes([100] * 64)    # plane 1 interleaved first
    assert px[1::2] == bytes([200] * 64)


def test_jpeg_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
    (round-9 advice). Inject fill padding before every non-SOI marker of
    a valid file; the decode must be byte-identical to the unpadded one."""
    from cliqz_etl_spark.multimodal.binary_ops import (decode_jpeg,
                                                       encode_jpeg_gray)

    w, h = 12, 9
    bw = (w + 7) // 8
    px = bytes((5 * 37 + ((y // 8) * bw + x // 8) * 29) % 256
               for y in range(h) for x in range(w))
    blob = encode_jpeg_gray(w, h, px)
    # re-emit with fill bytes: after SOI, before each segment marker
    padded = bytearray(blob[:2])
    pos = 2
    import struct
    while pos < len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        padded += b"\xff\xff\xff"          # three fill bytes, then marker
        if marker == 0xDA:                 # SOS: rest is entropy + EOI
            padded += blob[pos:]
            break
        ln = struct.unpack_from(">H", blob, pos + 2)[0]
        padded += blob[pos:pos + 2 + ln]
        pos += 2 + ln
    meta = decode_jpeg(bytes(padded))
    assert meta["pixels"] == px
    assert (meta["width"], meta["height"]) == (w, h)


def test_avi_mjpeg_demux_roundtrip_and_errors():
    """RIFF/AVI MJPG container: encode -> demux recovers every frame blob
    byte-identically (word alignment with odd-length JPEGs included), the
    avih frame count is cross-checked, and malformed input raises
    ValueError per the family's error->NULL discipline."""
    import pytest

    from cliqz_etl_spark.multimodal.binary_ops import (decode_avi_mjpeg,
                                                       decode_jpeg,
                                                       encode_avi_mjpeg,
                                                       encode_jpeg_gray)

    w, h = 11, 6           # odd-ish dims -> odd-length frame blobs likely
    bw = (w + 7) // 8
    frames = []
    for f in range(4):
        px = bytes((9 * 37 + f * 11 + ((y // 8) * bw + x // 8) * 29) % 256
                   for y in range(h) for x in range(w))
        frames.append(encode_jpeg_gray(w, h, px))
    avi = encode_avi_mjpeg(w, h, frames)
    meta = decode_avi_mjpeg(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 4)
    assert meta["frames"] == frames
    for f, jpg in enumerate(meta["frames"]):
        assert decode_jpeg(jpg)["width"] == w

    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")   # wrong form type
    with pytest.raises(ValueError):
        decode_avi_mjpeg(avi[:40])                       # truncated chunk
    with pytest.raises(ValueError):
        encode_avi_mjpeg(8, 8, [])                       # no frames
    # frame-count cross-check: lie in avih
    import struct
    pos = avi.index(b"avih") + 8 + 16
    forged = avi[:pos] + struct.pack("<I", 9) + avi[pos + 4:]
    with pytest.raises(ValueError, match="declares"):
        decode_avi_mjpeg(forged)

    # adversarial nesting (review finding): ~5000 nested LIST headers must
    # walk iteratively to the missing-avih ValueError, never RecursionError
    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"xxxx" + inner
    deep = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    with pytest.raises(ValueError, match="avih"):
        decode_avi_mjpeg(deep)
