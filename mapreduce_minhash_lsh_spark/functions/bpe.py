"""Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) —
training, encoding, and the shipped merge asset for token accounting.

A training-data pipeline budgets documents in TOKENS, not characters —
packing, mixture weights and dedup thresholds all key off subword
counts.  This module implements the classic whole-word BPE:

* ``train_bpe``: greedy most-frequent-adjacent-pair merging over a
  word-frequency table, deterministic tie-break (count desc, pair
  lexicographic) so the same corpus always yields the same merges.
* ``encode_word``: apply merges by rank (lowest-rank mergeable pair
  first — the standard priority scheme), so encoding is independent of
  scan order.
* ``BPE_MERGES``: the shipped tokenizer asset — trained once by
  ``train_bpe`` on the synthetic corpus' word-frequency table (sf0.1,
  whose 31-word vocabulary is identical at every SF) and frozen as a
  literal, exactly how production pipelines ship a tokenizer file.
  The ``bpe_token_counts`` oracle replays ``encode_word`` over the
  same asset at import, so the distributed application is checked by
  value.

Training is driver-side over a bounded frequency table (the corpus
vocabulary, not the corpus); encoding runs in Arrow-batched
``pandas_udf`` with a per-batch word cache — the repo's standard
Python-boundary stance.
"""

from __future__ import annotations

from functools import lru_cache


def _pair_counts(splits: dict[str, list[str]], freqs: dict[str, int]):
    counts: dict[tuple[str, str], int] = {}
    for word, syms in splits.items():
        f = freqs[word]
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE training over a word-frequency table.  Deterministic:
    ties between equally frequent pairs break lexicographically."""
    splits = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(splits, word_freqs)
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        for word, syms in splits.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            splits[word] = out
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges by rank: repeatedly merge the lowest-rank adjacent
    pair present (the standard BPE priority scheme — scan-order
    independent, so any engine applying the same ranks agrees)."""
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best_i = -1
        best_rank = len(merges)
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = rank.get(pair, len(merges))
            if r < best_rank:
                best_rank, best_i = r, i
        if best_i < 0 or best_rank == len(merges):
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# The shipped tokenizer asset: the word-frequency table of the
# synthetic corpus at sf0.1 (vocabulary identical at every SF — the
# generator's 31 words), frozen as a literal exactly how production
# pipelines ship a tokenizer file.  BPE_MERGES derives from it at
# import (31 words x 25 merges — microseconds), so asset and training
# can never drift; tests/test_bpe.py pins the resulting merge list.
_TRAIN_FREQS: dict[str, int] = {
    "a": 8877, "agg": 8912, "batch": 8829, "big": 9057, "column": 9127,
    "customer": 9017, "data": 9104, "dup": 255, "fast": 8926,
    "filter": 9063, "group": 9040, "hash": 9024, "join": 9080,
    "key": 8893, "line": 8951, "merge": 9157, "order": 8971,
    "part": 8929, "query": 8881, "row": 8925, "scan": 8863,
    "slow": 8960, "small": 9100, "sort": 9005, "spark": 9182,
    "stream": 9117, "table": 9144, "the": 8925, "value": 9112,
    "vector": 9119, "window": 9159,
}

N_MERGES = 25
BPE_MERGES: list[tuple[str, str]] = train_bpe(_TRAIN_FREQS, N_MERGES)


def n_tokens_map(merges: list[tuple[str, str]], words) -> dict[str, int]:
    """word -> subword count under the given merges (the oracle twin)."""
    return {w: len(encode_word(w, merges)) for w in words}


@lru_cache(maxsize=65536)
def _cached_count(word: str) -> int:
    return len(encode_word(word, BPE_MERGES))


def count_text_tokens(text: str) -> int:
    """Total BPE tokens of a single-space-separated text under the
    shipped asset (per-word cache — corpus vocabularies are tiny
    relative to corpora)."""
    if not text:
        return 0
    return sum(_cached_count(w) for w in text.split(" "))
