"""Pure-Python rendering of Spark's ``xxhash64`` expression (XXH64, seed 42).

Why this exists: bucket assignment is ``pmod(xxhash64(key), n_buckets)``
(io_snapshots._bucket_col). When an incremental delta is driver-local (a
few collected conv_ids), discovering which buckets it touches via Spark
costs a full driver job round (`_affected_buckets` collect) PER table —
pure serial latency on the incremental hot path. Hashing the handful of
keys in-process instead makes bucket discovery free.

Agreement with the JVM implementation is pinned by
tests/test_io_snapshots.py::test_python_bucket_matches_spark (random
unicode keys, compared against F.xxhash64 output); any divergence would
mis-prune a bucket read, so the test is the contract.

Reference: XXH64 (Yann Collet, public spec); Spark hashes a string's
UTF-8 bytes with seed 42 (catalyst XxHash64Function).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of `data`. Spark's seed default is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK)) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK), 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Signed-long view of xxh64 — exactly what F.xxhash64 returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
