"""BPE tokenizer: training determinism, encode properties, the shipped
asset pin, and token accounting.  Corpus-level value parity of
bpe_token_counts is covered by the oracle sweep."""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.functions import bpe


def test_training_is_deterministic_and_greedy():
    freqs = {"low": 5, "lowest": 2, "newer": 6, "wider": 3}
    merges = bpe.train_bpe(freqs, 3)
    assert merges == bpe.train_bpe(freqs, 3)
    # most frequent pair first: 'er' appears in newer(6) + wider(3) = 9
    assert merges[0] == ("e", "r")


def test_encode_is_lossless_and_monotone():
    freqs = dict(bpe._TRAIN_FREQS)
    for n in (0, 5, 15, 25):
        merges = bpe.train_bpe(freqs, n)
        counts = [len(bpe.encode_word(w, merges)) for w in freqs]
        for w in freqs:
            assert "".join(bpe.encode_word(w, merges)) == w
        if n == 0:
            prev = counts
        else:
            assert all(c <= p for c, p in zip(counts, prev))
            prev = counts


def test_rank_priority_beats_scan_order():
    # merges: rank0 = ('b','c'), rank1 = ('a','b').  A left-to-right
    # scanner would merge 'ab' first in 'abc'; rank priority must apply
    # ('b','c') first.
    merges = [("b", "c"), ("a", "b")]
    assert bpe.encode_word("abc", merges) == ["a", "bc"]


def test_shipped_asset_pin():
    assert len(bpe.BPE_MERGES) == bpe.N_MERGES == 25
    assert bpe.BPE_MERGES[:5] == [
        ("e", "r"), ("i", "n"), ("o", "r"), ("s", "t"), ("o", "w"),
    ]
    # whole-word tokens exist for the most frequent long words
    counts = bpe.n_tokens_map(bpe.BPE_MERGES, bpe._TRAIN_FREQS)
    assert counts["spark"] == 1 and counts["window"] == 1
    assert counts["dup"] == 2  # rare word stays multi-token


def test_count_text_tokens():
    counts = bpe.n_tokens_map(bpe.BPE_MERGES, bpe._TRAIN_FREQS)
    text = "spark merge dup"
    assert bpe.count_text_tokens(text) == counts["spark"] + counts["merge"] + counts["dup"]
    assert bpe.count_text_tokens("") == 0


def test_oov_word_still_lossless():
    # unseen words get whatever merges match; concatenation is identity
    for w in ("sparkle", "zzz", "windowless"):
        assert "".join(bpe.encode_word(w, bpe.BPE_MERGES)) == w
