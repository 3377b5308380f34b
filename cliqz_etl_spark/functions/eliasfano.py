"""Elias-Fano encoding of monotone integer sequences — the posting-list
layout production search engines actually store (quasi-succinct indexes).

postings_compress_stats (queries/retrieval.py) computes EF's exact bit
COST as arithmetic; this module is the real codec: pack a sorted list of
doc ids into bytes, unpack them back, bit-for-bit. Layout (all integers
little-endian within the byte stream, bits LSB-first inside each byte):

  header   : n (8 bytes LE) | max_id (8 bytes LE)
  low bits : n fields of l = max(0, bit_length(u div n) - 1) bits each,
             u = max_id + 1 (l = 0 stores nothing)
  high bits: unary-ish bit vector of n + (max_id >> l) + 1 bits; element
             i sets bit (ids[i] >> l) + i

Payload size in bits is exactly n*l + n + (max_id >> l) + 1 — an integer
formula both engines can state (floor(log2) via length(bin())), which is
what the postings_ef_roundtrip oracle pins alongside the decoded values.
Dependency-free integer ops only; Arrow-batched callers run it inside
mapInPandas."""

from __future__ import annotations


def ef_params(n: int, max_id: int) -> tuple[int, int]:
    """(l, payload_bits) for n sorted ids with the given maximum."""
    if n <= 0:
        raise ValueError("ef_params: empty sequence")
    u = max_id + 1
    q = u // n
    l = q.bit_length() - 1 if q > 0 else 0
    payload_bits = n * l + n + (max_id >> l) + 1
    return l, payload_bits


def ef_encode(ids: list[int]) -> bytes:
    """Encode a strictly-increasing list of non-negative ints."""
    n = len(ids)
    if n == 0:
        raise ValueError("ef_encode: empty sequence")
    max_id = ids[-1]
    if ids[0] < 0:
        raise ValueError("ef_encode: negative id")
    if max_id >= 1 << 64:
        raise ValueError("ef_encode: id does not fit the 64-bit header")
    l, payload_bits = ef_params(n, max_id)
    buf = bytearray(16 + (payload_bits + 7) // 8)
    buf[0:8] = n.to_bytes(8, "little")
    buf[8:16] = max_id.to_bytes(8, "little")

    def set_bits(bit_pos: int, value: int, width: int) -> None:
        for k in range(width):
            if (value >> k) & 1:
                p = bit_pos + k
                buf[16 + (p >> 3)] |= 1 << (p & 7)

    lo_mask = (1 << l) - 1
    prev = -1
    for i, x in enumerate(ids):
        if x <= prev:
            raise ValueError("ef_encode: ids must be strictly increasing")
        prev = x
        if l:
            set_bits(i * l, x & lo_mask, l)
        hp = n * l + (x >> l) + i
        buf[16 + (hp >> 3)] |= 1 << (hp & 7)
    return bytes(buf)


def ef_decode(blob: bytes) -> list[int]:
    """Inverse of ef_encode. Raises ValueError on malformed input."""
    if len(blob) < 16:
        raise ValueError("ef_decode: truncated header")
    n = int.from_bytes(blob[0:8], "little")
    max_id = int.from_bytes(blob[8:16], "little")
    if n <= 0:
        raise ValueError("ef_decode: bad element count")
    l, payload_bits = ef_params(n, max_id)
    if len(blob) != 16 + (payload_bits + 7) // 8:
        raise ValueError("ef_decode: payload size mismatch")

    def get_bit(p: int) -> int:
        return (blob[16 + (p >> 3)] >> (p & 7)) & 1

    out = []
    i = 0           # elements recovered
    bucket = 0      # current high-bits value (ids[i] >> l)
    p = n * l
    while i < n:
        # bound BEFORE the read: p == payload_bits would index one byte
        # past the buffer when payload_bits % 8 == 0 (a malformed blob
        # with fewer than n set high bits must fail as ValueError, not
        # IndexError)
        if p >= payload_bits:
            raise ValueError("ef_decode: ran past the high-bit vector")
        if get_bit(p):
            lo = 0
            if l:
                for k in range(l):
                    lo |= get_bit(i * l + k) << k
            out.append((bucket << l) | lo)
            i += 1
        else:
            bucket += 1
        p += 1
    return out
