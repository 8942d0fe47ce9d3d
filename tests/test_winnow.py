"""Winnowing fingerprints (operators/winnow.py): Python-mirror
equality, the paper's substring-match guarantee, and expected density."""

from __future__ import annotations

import hashlib

from mapreduce_minhash_lsh_spark.operators.winnow import winnow_fingerprints


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mirror(text: str, k: int, w: int) -> set[tuple[int, int]]:
    if len(text) < k + w - 1:
        return set()
    hs = [_md5_long(text[i:i + k]) for i in range(len(text) - k + 1)]
    out = set()
    for s in range(len(hs) - w + 1):
        best_v, best_p = None, None
        for j in range(s, s + w):
            if best_v is None or hs[j] <= best_v:
                best_v, best_p = hs[j], j
        out.add((best_p + 1, best_v))  # 1-based positions
    return out


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )


def test_matches_python_mirror(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "abcabcabcabcabc",   # heavy hash ties — exercises rightmost-min
        3: "short",             # < k+w-1: no window, no rows
        4: "exactly8",          # == k+w-1: exactly one window
    }
    got: dict[int, set] = {}
    for r in winnow_fingerprints(_docs_df(spark, docs), k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in docs.items():
        assert got.get(i, set()) == _mirror(t, 5, 4), f"doc {i}"


def test_substring_match_guarantee(spark):
    """Thm 1: docs sharing a substring of length >= w + k - 1 = 8 share
    at least one fingerprint VALUE."""
    shared = "CommonPassageXYZ"  # 16 chars, well past the guarantee
    docs = {
        1: f"totally unrelated prefix {shared} and a suffix",
        2: f"{shared} starts this other document entirely",
    }
    rows = winnow_fingerprints(_docs_df(spark, docs), k=5, w=4).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2]


def test_density_bound(spark):
    """Expected selection density is ~2/(w+1) of the grams; assert a
    generous envelope so a regression to all-grams (or to near-none)
    fails loudly."""
    import random

    random.seed(7)
    text = "".join(random.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))
    rows = winnow_fingerprints(_docs_df(spark, {1: text}), k=5, w=4).collect()
    n_grams = len(text) - 4
    density = len(rows) / n_grams
    assert 0.2 < density < 0.6  # 2/(w+1) = 0.4 expected


def test_match_pairs_finds_planted_pair(spark):
    from mapreduce_minhash_lsh_spark.operators.winnow import winnow_match_pairs

    shared = "this exact passage is replicated between the two documents"
    docs = {
        1: f"prefix one {shared} suffix one",
        2: f"{shared} completely different remainder here",
        3: "unrelated text with nothing in common whatsoever today",
    }
    rows = winnow_match_pairs(
        _docs_df(spark, docs), k=5, w=4, min_shared=3, max_df=None
    ).collect()
    pairs = {(r.doc_id_a, r.doc_id_b) for r in rows}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_match_pairs_max_df_drops_boilerplate(spark):
    """A fingerprint present in every doc is boilerplate: with max_df
    below the corpus size it must not create pairs on its own."""
    from mapreduce_minhash_lsh_spark.operators.winnow import winnow_match_pairs

    boiler = "standard footer attached everywhere"
    docs = {i: f"document number {i} body {boiler}" for i in range(1, 7)}
    # every pair shares ONLY the boilerplate; max_df=3 < 6 docs kills it
    rows = winnow_match_pairs(
        _docs_df(spark, docs), k=5, w=4, min_shared=1, max_df=3
    ).collect()
    boiler_only = {(a, b) for a in range(1, 7) for b in range(a + 1, 7)}
    got = {(r.doc_id_a, r.doc_id_b) for r in rows}
    # "document number X body" prefixes still share grams across docs —
    # but those grams also appear in all 6 docs, so df-bounding kills
    # them too; nothing survives
    assert got == set() or got < boiler_only


def test_empty_corpus_and_short_docs(spark):
    from mapreduce_minhash_lsh_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert winnow_fingerprints(empty).count() == 0
    assert winnow_match_pairs(empty).count() == 0
    short = _docs_df(spark, {1: "", 2: "1234567"})  # both below k+w-1
    assert winnow_fingerprints(short, k=5, w=4).count() == 0
