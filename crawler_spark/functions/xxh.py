"""Pure-Python XXH64 matching Spark's built-in ``xxhash64`` expression.

Spark's ``xxhash64(col)`` hashes the UTF-8 bytes of a string with the
public XXH64 algorithm (Yann Collet, public-domain spec) using seed 42 and
returns a *signed* 64-bit long. The sequential oracle simulator
(crawler_spark.plans.oracle) needs bit-identical hashes without a JVM, so
we implement XXH64 here and unit-test it against the Spark expression
(tests/test_canon.py).

No third-party xxhash module is available in this environment; this is a
from-scratch implementation of the published algorithm.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data`` → *signed* int64 (Spark LongType convention).

    The stripe/tail rounds are manually inlined (no _round/_rotl calls,
    quads read via one ``struct.unpack_from``): this runs once per URL in
    the fetch stage's Python worker and per simulated fetch in the
    sequential oracle, where the call-per-lane form measured ~4x slower.
    Bit-identical to the published algorithm (test_canon pins it against
    Spark's ``xxhash64`` expression).
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        unpack = struct.unpack_from
        while i + 32 <= n:
            l1, l2, l3, l4 = unpack("<4Q", data, i)
            v1 = (v1 + l1 * _P2) & _M
            v1 = ((((v1 << 31) | (v1 >> 33)) & _M) * _P1) & _M
            v2 = (v2 + l2 * _P2) & _M
            v2 = ((((v2 << 31) | (v2 >> 33)) & _M) * _P1) & _M
            v3 = (v3 + l3 * _P2) & _M
            v3 = ((((v3 << 31) | (v3 >> 33)) & _M) * _P1) & _M
            v4 = (v4 + l4 * _P2) & _M
            v4 = ((((v4 << 31) | (v4 >> 33)) & _M) * _P1) & _M
            i += 32
        h = (
            (((v1 << 1) | (v1 >> 63))
             + ((v2 << 7) | (v2 >> 57))
             + ((v3 << 12) | (v3 >> 52))
             + ((v4 << 18) | (v4 >> 46)))
        ) & _M
        for v in (v1, v2, v3, v4):
            r = (v * _P2) & _M
            r = ((((r << 31) | (r >> 33)) & _M) * _P1) & _M
            h = ((h ^ r) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        r = (int.from_bytes(data[i : i + 8], "little") * _P2) & _M
        r = ((((r << 31) | (r >> 33)) & _M) * _P1) & _M
        h ^= r
        h = ((((h << 27) | (h >> 37)) & _M) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((((h << 23) | (h >> 41)) & _M) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = ((((h << 11) | (h >> 53)) & _M) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    # to signed int64
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    return xxh64(s.encode("utf-8"), seed)
