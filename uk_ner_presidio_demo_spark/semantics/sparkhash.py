"""Pure-Python twin of Spark's `xxhash64` for LongType inputs — needed
wherever an output-visible value derives from the engine's hash bucketing
(sequence packing's pack ids, operators/packing.py) so the single-process
oracle can reproduce it bit-for-bit.

Spark evaluates `xxhash64(col)` with seed 42 via the XXH64 one-shot long
path (public xxHash specification, github.com/Cyan4973/xxHash; Spark's
`XxHash64Function.hashLong`): the 8-byte value is mixed as a single k1
lane, then avalanched.  Bit-equality with the JVM implementation is
property-tested in tests/test_sparkhash.py over random and edge-case
longs.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_PRIME1 = 11400714785074694791   # 0x9E3779B185EBCA87
_PRIME2 = 14029467366897019727   # 0xC2B2AE3D27D4EB4F
_PRIME3 = 1609587929392839161    # 0x165667B19E3779F9
_PRIME4 = 9650029242287828579    # 0x85EBCA77C2B2AE63
_PRIME5 = 2870177450012600261    # 0x27D4EB2F165667C5

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(value: int, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed 64-bit XXH64 of one long, matching Spark's `xxhash64(col)`
    for a non-null BIGINT column."""
    v = value & _M64  # two's-complement view of the signed long
    h = (seed + _PRIME5 + 8) & _M64
    k1 = _rotl((v * _PRIME2) & _M64, 31)
    k1 = (k1 * _PRIME1) & _M64
    h ^= k1
    h = ((_rotl(h, 27) * _PRIME1) + _PRIME4) & _M64
    # avalanche
    h ^= h >> 33
    h = (h * _PRIME2) & _M64
    h ^= h >> 29
    h = (h * _PRIME3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod(value: int, n: int) -> int:
    """Spark `pmod` over a signed long: Python's floored % already yields
    the non-negative remainder for positive n."""
    return value % n
