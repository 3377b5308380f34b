"""Minimal pure-Python AES-ECB (FIPS-197), for byte-parity with the
reference's raw-ECB zero-padded producer (testpilot_data.py:98-106:
PyCrypto ``AES.new(key)`` = raw ECB, zero padding, no MAC).

Spark's ``aes_decrypt`` refuses ('ECB','NONE'), so ciphertext from that
producer cannot be decrypted JVM-side; this module backs the guarded
Arrow-batched fallback in scalars.decrypt_aes_ecb_b64. Tables are
computed at import from the GF(2^8) definitions rather than transcribed,
and the implementation is verified against the FIPS-197 Appendix C
known-answer vectors in tests.

Performance: ~µs/block in CPython — fine as a fallback for the minority
of rows the JVM path NULLs out; bulk decryption of PKCS-padded data
should stay on the built-in expression.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    inv = [0] * 256
    for x in range(1, 256):
        if not inv[x]:
            for y in range(1, 256):
                if _gmul(x, y) == 1:
                    inv[x], inv[y] = y, x
                    break
    sbox = [0] * 256
    for i in range(256):
        b = inv[i]
        s = 0x63
        for shift in range(5):
            s ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        sbox[i] = s
    invbox = [0] * 256
    for i, s in enumerate(sbox):
        invbox[s] = i
    return sbox, invbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
for _ in range(13):
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as lists of 16 bytes (FIPS-197 §5.2)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(s: list[int], rk: list[int]) -> list[int]:
    return [a ^ b for a, b in zip(s, rk)]


# state is the FIPS byte order: s[r + 4c] is row r, column c of the block
# laid out column-major, i.e. a plain 16-byte slice of the input.


def _shift_rows(s: list[int], inverse: bool) -> list[int]:
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            src = (c + (-r if inverse else r)) % 4
            out[r + 4 * c] = s[r + 4 * src]
    return out


def _mix_columns(s: list[int], inverse: bool) -> list[int]:
    m = ([14, 11, 13, 9] if inverse else [2, 3, 1, 1])
    out = [0] * 16
    for c in range(4):
        col = s[4 * c:4 * c + 4]
        for r in range(4):
            out[r + 4 * c] = (
                _gmul(col[0], m[(0 - r) % 4]) ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4]) ^ _gmul(col[3], m[(3 - r) % 4])
            )
    return out


def encrypt_block(block: bytes, key: bytes) -> bytes:
    rks = _expand_key(key)
    s = _add_round_key(list(block), rks[0])
    for rnd in range(1, len(rks) - 1):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inverse=False)
        s = _mix_columns(s, inverse=False)
        s = _add_round_key(s, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inverse=False)
    s = _add_round_key(s, rks[-1])
    return bytes(s)


def decrypt_block(block: bytes, key: bytes) -> bytes:
    rks = _expand_key(key)
    s = _add_round_key(list(block), rks[-1])
    for rnd in range(len(rks) - 2, 0, -1):
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
        s = _add_round_key(s, rks[rnd])
        s = _mix_columns(s, inverse=True)
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    s = _add_round_key(s, rks[0])
    return bytes(s)


def encrypt_ecb_zero_pad(data: bytes, key: bytes) -> bytes:
    """Raw ECB with zero padding — the reference producer's exact scheme
    (PyCrypto AES.new(key).encrypt of zero-padded plaintext)."""
    if len(data) % 16:
        data = data + b"\0" * (16 - len(data) % 16)
    return b"".join(encrypt_block(data[i:i + 16], key)
                    for i in range(0, len(data), 16))


def decrypt_ecb(data: bytes, key: bytes) -> bytes:
    """Raw ECB decrypt, no unpadding (callers strip zeros per the
    reference's ``.rstrip("\\0")``)."""
    if not data or len(data) % 16:
        raise ValueError("ciphertext length must be a positive multiple of 16")
    return b"".join(decrypt_block(data[i:i + 16], key)
                    for i in range(0, len(data), 16))
