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
# Ubiquity (boilerplate) blocking parameters shared by the Spark operator
# (operators/chunking.py) and the golden oracle (oracle/docs_golden.py):
# a chunk present in more than MAX_CHUNK_DF_FRAC of documents is dropped
# before pairing (floored at MIN_CHUNK_DF_CAP docs so tiny corpora pair).
MAX_CHUNK_DF_FRAC = 0.02
MIN_CHUNK_DF_CAP = 20
MIN_SHARED_CHUNKS = 2      # candidate threshold: >=2 shared rare chunks
MIN_SPAN_TOKENS = 20       # verify threshold: exact common run length
# Exact-excision pair fan-out bound: a doc's duplicated chunks are
# compared against at most this many owner docs, strongest owners first
# (most shared lost chunks, ties by owner id).  Bounds the per-doc
# matching-statistics work at O(EXCISE_MAX_OWNERS * |doc|) even in the
# pathological corpus where every chunk of a doc is owned by a different
# doc (which would otherwise cost O(|doc|^2 / chunk) per doc).  Part of
# the DOCS golden contract (golden_excised_exact).
EXCISE_MAX_OWNERS = 64
# Opt-in shingle tail pass (r6, VERDICT r5 #4): CDC chunk hashes cannot
# pair runs shorter than the boundary RESYNC HORIZON (~MIN_CHUNK+WINDOW
# tokens of identical context before boundaries re-align), so the
# excision tail (runs of MIN_SPAN_TOKENS..~horizon) needs a
# position-independent candidate source.  Winnowed k-gram fingerprints
# (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
# Document Fingerprinting", SIGMOD 2003) give a DETERMINISTIC guarantee:
# selecting the (rightmost) minimum k-gram hash in every window of
# SHINGLE_W consecutive k-grams guarantees any shared token run of
# length >= SHINGLE_K + SHINGLE_W - 1 shares a selected fingerprint.
# The constants are tied so that guarantee threshold == MIN_SPAN_TOKENS:
# every run the verify stage would accept is guaranteed a candidate.
SHINGLE_K = 8
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


SHINGLE_W = MIN_SPAN_TOKENS - SHINGLE_K + 1  # guarantee == MIN_SPAN_TOKENS


def shingle_fingerprints(text: str, k: int = SHINGLE_K,
                         w: int = SHINGLE_W) -> set[int]:
    """Winnowed k-gram fingerprint VALUE set of the case-folded token
    stream: the minimum k-gram hash of every window of `w` consecutive
    k-grams (SIGMOD'03 winnowing; only values are kept, so the paper's
    tie rule is immaterial — equal minima select the same value).  Any
    two documents sharing a token run of length >= k + w - 1 contain a
    full common window and therefore share that window's minimum — the
    deterministic candidate guarantee the excision tail pass builds
    on."""
    toks = text.lower().split()
    n = len(toks) - k + 1
    if n <= 0:
        return set()
    hs = [zlib.crc32(" ".join(toks[i:i + k]).encode("utf-8"))
          for i in range(n)]
    if n <= w:
        return {min(hs)}
    return {min(hs[i:i + w]) for i in range(n - w + 1)}


def longest_common_token_span(a: str, b: str) -> int:
    """Length (in tokens) of the longest contiguous token run shared by
    the two case-folded token streams — the ORACLE twin of the exact
    verify (classic O(|a|·|b|) suffix DP).  The Spark kernel uses the
    equivalent linear-time `longest_common_token_run` (VERDICT r3 #1:
    the quadratic DP is minutes per pair at the 100k-char doc cap);
    TestLcsEquivalence in tests/test_chunking.py property-tests the two
    equal, so goldens produced by either are identical."""
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


class TokenSuffixAutomaton:
    """Suffix automaton over a token sequence — O(n) states/transitions,
    built once per document and reusable across every candidate pair the
    document appears in (a boilerplate-heavy shard pairs one doc with
    thousands of others; the r3 DP re-paid O(|a|·|b|) for each)."""

    __slots__ = ("next", "link", "length")

    def __init__(self, tokens: list[str]) -> None:
        # state 0 is the initial state
        self.next: list[dict[str, int]] = [{}]
        self.link: list[int] = [-1]
        self.length: list[int] = [0]
        last = 0
        nxt, link, length = self.next, self.link, self.length
        for tok in tokens:
            cur = len(nxt)
            nxt.append({})
            link.append(-1)
            length.append(length[last] + 1)
            p = last
            while p != -1 and tok not in nxt[p]:
                nxt[p][tok] = cur
                p = link[p]
            if p == -1:
                link[cur] = 0
            else:
                q = nxt[p][tok]
                if length[p] + 1 == length[q]:
                    link[cur] = q
                else:
                    clone = len(nxt)
                    nxt.append(dict(nxt[q]))
                    link.append(link[q])
                    length.append(length[p] + 1)
                    while p != -1 and nxt[p].get(tok) == q:
                        nxt[p][tok] = clone
                        p = link[p]
                    link[q] = clone
                    link[cur] = clone
            last = cur

    def longest_match(self, tokens: list[str]) -> int:
        """Longest contiguous run of `tokens` that is a factor of the
        indexed document — O(|tokens|) amortized."""
        ms = self.matching_statistics(tokens)
        return max(ms, default=0)

    def matching_statistics(self, tokens: list[str]) -> list[int]:
        """ms[j] = length of the longest suffix of tokens[:j+1] that is
        a factor of the indexed document (textbook SAM matching
        statistics — the same scan as longest-common-substring, keeping
        the per-position run instead of only the max).  O(|tokens|)
        amortized.  The quadratic oracle twin is
        `matching_statistics_dp`; TestMatchingStatsEquivalence in
        tests/test_chunking.py property-tests them equal."""
        nxt, link, length = self.next, self.link, self.length
        v = 0
        run = 0
        ms = []
        for tok in tokens:
            while v != 0 and tok not in nxt[v]:
                v = link[v]
                run = length[v]
            if tok in nxt[v]:
                v = nxt[v][tok]
                run += 1
            else:
                run = 0
            ms.append(run)
        return ms


def matching_statistics_dp(doc_tokens: list[str],
                           query_tokens: list[str]) -> list[int]:
    """Quadratic ORACLE twin of TokenSuffixAutomaton.matching_statistics:
    ms[j] = longest common suffix of query_tokens[:j+1] and ANY prefix of
    doc_tokens — i.e. the longest factor of `doc_tokens` ending at j in
    `query_tokens` (classic longest-common-suffix DP, column max).  Used
    by the golden oracle so engine (SAM) and oracle (DP) agree through
    genuinely different algorithms."""
    n = len(doc_tokens)
    prev = [0] * (n + 1)
    ms = []
    for y in query_tokens:
        cur = [0] * (n + 1)
        best = 0
        for i, x in enumerate(doc_tokens, 1):
            if x == y:
                cur[i] = prev[i - 1] + 1
                if cur[i] > best:
                    best = cur[i]
        ms.append(best)
        prev = cur
    return ms


def maximal_duplicated_runs(ms: list[int],
                            min_tokens: int) -> list[tuple[int, int]]:
    """Maximal token intervals [start, end) whose content is a factor of
    the indexed document, length >= min_tokens, from matching statistics.
    The interval ending at j is [j+1-ms[j], j+1); it is maximal iff the
    next position does not extend it (ms[j+1] < ms[j]+1).  Shared by the
    Spark excision kernel and the golden oracle — the exact-boundary
    contract of Lee et al.-style substring excision."""
    runs = []
    n = len(ms)
    for j in range(n):
        if ms[j] >= min_tokens and (j + 1 == n or ms[j + 1] < ms[j] + 1):
            runs.append((j + 1 - ms[j], j + 1))
    return runs


def longest_common_token_run(a: str, b: str,
                             sam: TokenSuffixAutomaton | None = None) -> int:
    """Exact longest common contiguous token run in O(|a| + |b|) — the
    verify kernel.  Equals longest_common_token_span on every input (the
    suffix automaton of `a` accepts exactly the token factors of `a`, so
    the longest factor of `a` seen while scanning `b` IS the longest
    common run — textbook SAM longest-common-substring, e.g.
    cp-algorithms.com/string/suffix-automaton).  Pass a prebuilt `sam`
    for `a` to amortize the build across many candidate pairs."""
    ta, tb = a.lower().split(), b.lower().split()
    if not ta or not tb:
        return 0
    if sam is None:
        sam = TokenSuffixAutomaton(ta)
    return sam.longest_match(tb)
