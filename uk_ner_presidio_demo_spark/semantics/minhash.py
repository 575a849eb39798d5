"""MinHash/LSH signatures (F-8) over normalized surfaces — frozen spec.

Hand-rolled (SURVEY.md §2.3 J-2 prefers this over MinHashLSH: deterministic,
no ml-lib vector overhead).  All arithmetic is seed-fixed and pure Python, so
the Spark pandas-UDF kernel and the plain-Python oracle produce bit-identical
signatures.

Spec:
  shingles   : contiguous char 3-grams of the normalized surface; surfaces
               shorter than 3 chars use the whole string as one shingle
  base hash  : zlib.crc32(utf-8 bytes)  (stable across processes/versions)
  k          : 32 permutations h_i(x) = (a_i * x + b_i) mod (2^61 - 1),
               a_i, b_i drawn from random.Random(1337)
  bands      : 8 bands x 4 rows; band key = (band_id, crc32 of the 4 packed
               minhash values)
  verify     : exact Jaccard over the 3-gram sets, threshold JACCARD_THRESHOLD
"""

from __future__ import annotations

import random
import struct
import zlib

NUM_HASHES = 32
NUM_BANDS = 8
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
_MERSENNE = (1 << 61) - 1
JACCARD_THRESHOLD = 0.5

_rng = random.Random(1337)
_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, _MERSENNE), _rng.randrange(0, _MERSENNE))
    for _ in range(NUM_HASHES)
]


def shingles(s: str) -> set[str]:
    if len(s) < 3:
        return {s} if s else set()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def minhash_signature(s: str) -> list[int]:
    sh = shingles(s)
    if not sh:
        return [0] * NUM_HASHES
    xs = [zlib.crc32(g.encode("utf-8")) for g in sh]
    return [
        min((a * x + b) % _MERSENNE for x in xs) for a, b in _COEFFS
    ]


def band_keys(sig: list[int]) -> list[tuple[int, int]]:
    out = []
    for b in range(NUM_BANDS):
        chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        h = zlib.crc32(struct.pack(f"<{ROWS_PER_BAND}Q", *chunk))
        out.append((b, h))
    return out


def jaccard(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0
