"""Content-defined chunking of token streams (Rabin-style rolling hash)
— the substring-level dedup substrate: whole-doc dedup (exact/MinHash/
SimHash) misses documents that EMBED long shared spans inside otherwise
different text (boilerplate, quoted passages, template wrappers); chunk
fingerprints catch them because boundaries resynchronize on content, not
position (public CDC technique from rsync/LBFS; substring dedup of
training data per Lee et al., "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499 — approximated here at chunk
granularity instead of suffix arrays).

Frozen contract shared by the Spark kernel (operators/chunking.py) and
the plain-Python oracle in tests.

Mechanics: a degree-WINDOW polynomial rolling hash over case-folded
whitespace tokens; a chunk boundary falls after token i when the window
hash has its low BOUNDARY_BITS zero (expected chunk ≈ 2^BOUNDARY_BITS
tokens) subject to MIN_CHUNK/MAX_CHUNK resync bounds.  A boundary
decision depends only on the preceding WINDOW tokens (plus the min/max
clamp), so an edit perturbs boundaries only locally and long shared
spans chunk identically in both documents.
"""

from __future__ import annotations

import hashlib
import zlib

WINDOW = 4
BOUNDARY_BITS = 4          # boundary prob 1/16 per eligible position
_BOUNDARY_MASK = (1 << BOUNDARY_BITS) - 1
MIN_CHUNK = 8              # tokens; resync lower bound
MAX_CHUNK = 64             # tokens; forced cut upper bound
_B = 1000003               # polynomial base
_MOD = (1 << 61) - 1       # Mersenne modulus
_B_POW_W = pow(_B, WINDOW, _MOD)


def token_chunks(text: str) -> list[tuple[int, int, str]]:
    """(start_tok, end_tok, chunk_hash) spans covering the case-folded
    token stream; chunk_hash is the md5 of the space-joined chunk tokens
    (position-independent: equal token spans => equal hashes)."""
    toks = text.lower().split()
    if not toks:
        return []
    out: list[tuple[int, int]] = []
    start = 0
    h = 0
    window: list[int] = []
    for i, t in enumerate(toks):
        ht = zlib.crc32(t.encode("utf-8"))
        window.append(ht)
        h = (h * _B + ht) % _MOD
        if len(window) > WINDOW:
            h = (h - window.pop(0) * _B_POW_W) % _MOD
        size = i - start + 1
        if (size >= MIN_CHUNK and (h & _BOUNDARY_MASK) == 0) \
                or size >= MAX_CHUNK:
            out.append((start, i + 1))
            start = i + 1
    if start < len(toks):
        out.append((start, len(toks)))
    return [
        (s, e,
         hashlib.md5(" ".join(toks[s:e]).encode("utf-8")).hexdigest())
        for s, e in out
    ]


def longest_common_token_span(a: str, b: str) -> int:
    """Length (in tokens) of the longest contiguous token run shared by
    the two case-folded token streams — the exact verify for chunk-based
    candidate pairs (classic O(|a|·|b|) suffix DP, run on CANDIDATES
    only, mirroring bands -> Jaccard)."""
    ta, tb = a.lower().split(), b.lower().split()
    if not ta or not tb:
        return 0
    prev = [0] * (len(tb) + 1)
    best = 0
    for x in ta:
        cur = [0] * (len(tb) + 1)
        for j, y in enumerate(tb, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best
