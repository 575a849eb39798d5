"""Byte-pair-encoding tokenizer induction — frozen spec shared by the
Spark operators (operators/bpe.py) and the plain-Python oracle twin.

Classic BPE (Sennrich et al., arXiv:1508.07909): start from character
symbols per word, repeatedly merge the most frequent adjacent symbol
pair (weighted by word frequency), record the merge list; encoding
replays the merges in training order.

Everything here is deterministic: pair selection breaks ties on the
lexicographically smallest pair; merging within a word is a single
left-to-right non-overlapping pass per merge.  The trainer operates on
a WORD-FREQUENCY table, not the corpus — the standard decomposition
that makes corpus-scale BPE tractable (the corpus is scanned once for
counts; training touches only the bounded vocabulary).
"""

from __future__ import annotations

import re

# THE BPE word tokenizer, frozen as Java-regex `\s` (ASCII whitespace):
# the corpus-scale count aggregate stays a pure-Catalyst
# split(text, '\\s+') (codegen, no Python in the one full scan), and the
# Python side — encoding kernels and the oracle twin — splits on the
# SAME character class.  str.split() (Unicode whitespace) would diverge
# on NBSP/ideographic-space corpora (ADVICE r5 #2): a word glued by
# NBSP is ONE token on both sides now, by spec.
_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokens under the frozen ASCII-`\\s` tokenizer —
    bit-identical to Spark's split(text, '\\s+') + != '' filter."""
    return [t for t in _WS_RE.split(text) if t]


BPE_N_MERGES = 64        # default merge budget
BPE_MAX_WORDS = 10_000   # bounded training vocabulary (top by count;
                         # the trainer's driver collect is O(this),
                         # corpus-size independent — the ANN_Q pattern)


def word_symbols(word: str) -> list[str]:
    """Initial symbol sequence: the word's characters (no end marker —
    whitespace tokenization already bounds words)."""
    return list(word)


def merge_pair(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """One left-to-right non-overlapping replacement pass of `pair`."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def count_pairs(seqs: dict[str, list[str]],
                counts: dict[str, int]) -> dict[tuple[str, str], int]:
    """Adjacent-pair frequencies over the current symbol sequences,
    weighted by word frequency (overlapping occurrences each count —
    e.g. 'aaa' contributes ('a','a') twice)."""
    pc: dict[tuple[str, str], int] = {}
    for w, syms in seqs.items():
        c = counts[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] = pc.get(p, 0) + c
    return pc


def train_bpe_from_counts(word_counts: list[tuple[str, int]],
                          n_merges: int = BPE_N_MERGES,
                          ) -> list[tuple[str, str]]:
    """Greedy merge induction over a word-frequency list.  Deterministic:
    each step merges the (max count, then lexicographically smallest)
    pair; stops early when no pair repeats."""
    counts = dict(word_counts)
    seqs = {w: word_symbols(w) for w in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = count_pairs(seqs, counts)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break  # nothing repeats; further merges are memorization
        merges.append(best)
        seqs = {w: merge_pair(s, best) for w, s in seqs.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word by replaying the merges in training order."""
    syms = word_symbols(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = merge_pair(syms, pair)
    return syms


def encode_text(text: str, merges: list[tuple[str, str]],
                _cache: dict[str, list[str]] | None = None) -> list[str]:
    """Tokenize with the frozen ws_tokens (same set as the Spark count
    scan), encode each word; optional per-call word cache (corpora repeat
    words heavily — the cache is the fast path)."""
    out: list[str] = []
    for w in ws_tokens(text):
        if _cache is not None:
            enc = _cache.get(w)
            if enc is None:
                enc = _cache[w] = encode_word(w, merges)
        else:
            enc = encode_word(w, merges)
        out.extend(enc)
    return out
