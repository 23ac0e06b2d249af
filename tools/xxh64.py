#!/usr/bin/env python3
"""Pure-Python XXH64 matching Spark's
`org.apache.spark.sql.catalyst.expressions.XXH64` (the `xxhash64` SQL
function, default seed 42). Used by the independent pipeline oracles
(minhash banding / simhash / hyperplane-LSH reimplementations) and as
the reference the DuckDB SQL hash mirrors are tested against.

Algorithm: the public XXH64 specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
"""
M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc, inp):
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    seed &= M64
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) \
            & M64
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark XXH64.hashLong: the 8-byte little-endian fixed-width path."""
    h = (seed + P5 + 8) & M64
    h ^= _round(0, value & M64)
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_int(value: int, seed: int = 42) -> int:
    """Spark XXH64.hashInt: the 4-byte fixed-width path."""
    h = (seed + P5 + 4) & M64
    h ^= ((value & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def to_signed(h: int) -> int:
    """Unsigned 64-bit -> Java signed long (what Spark columns hold)."""
    return h - (1 << 64) if h >= (1 << 63) else h


if __name__ == "__main__":
    import sys
    for tok in sys.argv[1:]:
        print(tok, to_signed(xxh64(tok.encode("utf-8"))))
