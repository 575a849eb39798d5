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


# --- vectorized twin (engine hot path) ---------------------------------------
# (a*x + b) mod (2^61 - 1) computed entirely in uint64 numpy with Mersenne
# arithmetic: a = a1*2^31 + a0 keeps every intermediate product under 2^63,
# reduction is (v & M) + (v >> 61) with one conditional subtract, and the
# *2^31 step is a 31-bit rotation of the 61-bit value (exact because
# 2^61 ≡ 1 mod M).  Bit-identical to the pure-Python minhash_signature —
# equivalence is hypothesis-tested (tests/test_properties.py).

def _np():
    import numpy as np

    return np


def _mersenne_affine_min(xs, starts) -> "list[list[int]]":
    """For each segment of xs (uint64 crc32 values, segment i =
    xs[starts[i]:starts[i+1]]), the 32 permutation minima.  Segments must
    be non-empty (callers map empty shingle sets to [0]*32 directly)."""
    np = _np()
    M = np.uint64(_MERSENNE)
    xs = np.asarray(xs, dtype=np.uint64)
    idx = np.asarray(starts[:-1], dtype=np.int64)
    sig_cols = []
    for a, b in _COEFFS:
        a1 = np.uint64(a >> 31)
        a0 = np.uint64(a & ((1 << 31) - 1))
        bb = np.uint64(b)
        p1 = a1 * xs
        p1 = (p1 & M) + (p1 >> np.uint64(61))
        p1 = np.where(p1 >= M, p1 - M, p1)
        # rotate-left by 31 within 61 bits == multiply by 2^31 mod M
        r = ((p1 & np.uint64((1 << 30) - 1)) << np.uint64(31)) | (
            p1 >> np.uint64(30)
        )
        p0 = a0 * xs
        p0 = (p0 & M) + (p0 >> np.uint64(61))
        p0 = np.where(p0 >= M, p0 - M, p0)
        s = r + p0 + bb
        s = (s & M) + (s >> np.uint64(61))
        s = np.where(s >= M, s - M, s)
        sig_cols.append(np.minimum.reduceat(s, idx))
    sig = np.stack(sig_cols, axis=1)  # (n_segments, NUM_HASHES)
    return [[int(v) for v in row] for row in sig]


def minhash_signatures_batch(shingle_hash_lists) -> "list[list[int]]":
    """Vectorized minhash over many items: input = per-item lists of crc32
    shingle hashes (the `xs` of minhash_signature); output = per-item
    32-value signatures, bit-identical to the scalar function."""
    sizes = [len(h) for h in shingle_hash_lists]
    flat: list[int] = []
    starts = [0]
    for h in shingle_hash_lists:
        flat.extend(h)
        starts.append(len(flat))
    out: list[list[int] | None] = [None] * len(sizes)
    if flat:
        nonempty = [i for i, n in enumerate(sizes) if n]
        ne_starts = [0]
        ne_flat: list[int] = []
        for i in nonempty:
            ne_flat.extend(shingle_hash_lists[i])
            ne_starts.append(len(ne_flat))
        sigs = _mersenne_affine_min(ne_flat, ne_starts)
        for i, sig in zip(nonempty, sigs):
            out[i] = sig
    zero = [0] * NUM_HASHES
    return [sig if sig is not None else list(zero) for sig in out]
