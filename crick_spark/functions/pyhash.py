"""Driver-side replica of Spark SQL's ``xxhash64`` (seed 42).

Lets batch-bounded store protocols (``streaming/cluster_store.py``)
derive hash-bucket ids for rows the driver already holds without paying
one tiny Spark job per bucket-set, while producing EXACTLY the ids the
distributed ``pmod(xxhash64(col), n)`` expression produces — the two
paths must file rows into the same buckets or the store corrupts.

Spark's XxHash64 expression is a faithful XXH64 port (its test suite
pins the reference vectors): a LongType child hashes as the 8-byte
little-endian two's-complement word, a StringType child as the UTF-8
byte buffer.  ``tests/test_streaming.py::test_pyhash_matches_spark``
pins this module against the engine over negative/boundary longs and
multi-length strings, so an engine-side change would fail loudly rather
than silently splitting the bucket space.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def spark_xxhash64(value: int | str, seed: int = 42) -> int:
    """``xxhash64(value, seed)`` as Spark computes it, as a SIGNED 64-bit
    int (Spark's LongType result) — so ``spark_xxhash64(v) % n`` equals
    the engine's ``pmod(xxhash64(v), n)`` for any positive n."""
    if type(value) is int:
        data = struct.pack("<q", value)
    elif type(value) is str:
        data = value.encode("utf-8")
    else:
        raise TypeError(
            f"spark_xxhash64 replicates long/string children only, "
            f"got {type(value).__name__}"
        )
    h = _xxh64_bytes(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
