"""N-gram LM scoring (operators/lm.py): hand-computed cross-entropy on a
tiny corpus, the external-LM (unseen bigram) smoothing path, and
partition invariance of the quantized integer sums."""

from __future__ import annotations

import math

from mapreduce_minhash_lsh_spark.operators.lm import (
    LM_LOG_SCALE,
    bigram_lm_scores,
    train_bigram_lm,
)


def _expected(corpus: dict[int, str], score_docs: dict[int, str]):
    """Driver-side reimplementation: Laplace bigram LM trained on
    ``corpus``, scoring ``score_docs`` — mirrors the operator spec."""
    def bigrams(text):
        toks = text.split(" ")
        return [(toks[i], f"{toks[i]} {toks[i + 1]}") for i in range(len(toks) - 1)]

    c_bg: dict[str, int] = {}
    c_w1: dict[str, int] = {}
    vocab = set()
    for text in corpus.values():
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        vocab.update(toks)
        for w1, bg in bigrams(text):
            c_bg[bg] = c_bg.get(bg, 0) + 1
            c_w1[w1] = c_w1.get(w1, 0) + 1
    out = {}
    for doc_id, text in score_docs.items():
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        s = 0
        grams = bigrams(text)
        for w1, bg in grams:
            p = (c_bg.get(bg, 0) + 1.0) / (c_w1.get(w1, 0) + float(len(vocab)))
            s += math.floor(LM_LOG_SCALE * math.log(p))
        out[doc_id] = (len(grams), s, (-s) / float(LM_LOG_SCALE) / len(grams))
    return out


CORPUS = {
    1: "the cat sat on the mat",
    2: "the cat ran",
    3: "a dog sat",
    4: "solo",  # < 2 tokens: contributes nothing, scored as nothing
}


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )


def test_self_lm_matches_hand_computation(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.logp_scaled, r.avg_nll)
        for r in bigram_lm_scores(_docs_df(spark, CORPUS)).collect()
    }
    assert got == _expected(CORPUS, CORPUS)
    assert 4 not in got  # single-token doc has no bigrams


def test_external_lm_smooths_unseen_bigrams(spark):
    lm = train_bigram_lm(_docs_df(spark, CORPUS))
    new = {10: "the cat sat", 11: "zebra quark flux"}  # 11: fully unseen
    got = {
        r.doc_id: (r.n_bigrams, r.logp_scaled, r.avg_nll)
        for r in bigram_lm_scores(_docs_df(spark, new), lm=lm).collect()
    }
    assert got == _expected(CORPUS, new)
    # the unseen doc scores exactly the novel-bigram floor: p = 1/V
    vsz = 8  # the cat sat on mat ran a dog
    lp = math.floor(LM_LOG_SCALE * math.log(1.0 / vsz))
    assert got[11] == (2, 2 * lp, (-2 * lp) / float(LM_LOG_SCALE) / 2)
    # corpus-typical text is less surprising than novel text
    assert got[10][2] < got[11][2]


def test_partition_invariance(spark):
    docs = _docs_df(spark, CORPUS)
    a = {r.doc_id: r.logp_scaled for r in bigram_lm_scores(docs).collect()}
    b = {
        r.doc_id: r.logp_scaled
        for r in bigram_lm_scores(docs.repartition(7)).collect()
    }
    assert a == b


def _sb_expected(corpus: dict[int, str], score_docs: dict[int, str]):
    """Driver-side stupid backoff mirror (Laplace-floored base level)."""
    c3: dict[str, int] = {}
    c2: dict[str, int] = {}
    c1: dict[str, int] = {}
    n_tokens = 0
    for text in corpus.values():
        toks = text.split(" ")
        n_tokens += len(toks)
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for i in range(len(toks) - 1):
            bg = f"{toks[i]} {toks[i + 1]}"
            c2[bg] = c2.get(bg, 0) + 1
        for i in range(len(toks) - 2):
            tg = f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
            c3[tg] = c3.get(tg, 0) + 1
    vsz = len(c1)
    out = {}
    for doc_id, text in score_docs.items():
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        s, n = 0, 0
        for i in range(len(toks) - 2):
            w1, w2, w3 = toks[i], toks[i + 1], toks[i + 2]
            tg, b12, b23 = f"{w1} {w2} {w3}", f"{w1} {w2}", f"{w2} {w3}"
            if c3.get(tg, 0) > 0 and c2.get(b12, 0) > 0:
                sb = c3[tg] / c2[b12]
            elif c2.get(b23, 0) > 0 and c1.get(w2, 0) > 0:
                sb = 0.4 * (c2[b23] / c1[w2])
            else:
                sb = 0.4 * 0.4 * ((c1.get(w3, 0) + 1.0) / (n_tokens + float(vsz)))
            s += math.floor(LM_LOG_SCALE * math.log(sb))
            n += 1
        out[doc_id] = (n, s, (-s) / float(LM_LOG_SCALE) / n)
    return out


def test_stupid_backoff_matches_hand_computation(spark):
    from mapreduce_minhash_lsh_spark.operators.lm import stupid_backoff_scores

    got = {
        r.doc_id: (r.n_trigrams, r.logsb_scaled, r.avg_nls)
        for r in stupid_backoff_scores(_docs_df(spark, CORPUS)).collect()
    }
    assert got == _sb_expected(CORPUS, CORPUS)
    assert 4 not in got and 3 in got  # <3 tokens unscored; exactly 3 scored


def test_stupid_backoff_hits_all_three_levels(spark):
    """An external-LM scoring doc engineered so its trigrams exercise
    the trigram hit, the bigram backoff, and the Laplace base level."""
    from mapreduce_minhash_lsh_spark.operators.lm import (
        stupid_backoff_scores,
        train_trigram_lm,
    )

    lm = train_trigram_lm(_docs_df(spark, CORPUS))
    # "the cat sat": trigram hit.  "cat ran on": c3=0, suffix bigram
    # "ran on"? not in corpus -> base; "sat on the": c3=0 but "on the"
    # is a corpus bigram -> bigram backoff level.
    new = {20: "the cat sat", 21: "ran sat on the mat"}
    got = {
        r.doc_id: (r.n_trigrams, r.logsb_scaled, r.avg_nls)
        for r in stupid_backoff_scores(_docs_df(spark, new), lm=lm).collect()
    }
    exp = _sb_expected(CORPUS, new)
    assert got == exp
    # doc 20's single trigram is a trigram HIT with S = c3/c12 = 1/2
    # ("the cat sat" once over "the cat" twice) — pin the level's value
    lp = math.floor(LM_LOG_SCALE * math.log(0.5))
    assert got[20] == (1, lp, -lp / float(LM_LOG_SCALE))


def test_streaming_lm_state_fingerprint_guard(spark, tmp_path):
    """Reusing a count-log state_dir against a different corpus must
    fail fast, not silently return the previous LM's scores."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_lm_scores
    from tests.conftest import SF_SMALL

    state = str(tmp_path / "lm_state")
    a = streaming_lm_scores(spark, SF_SMALL, state_dir=state)
    assert a.count() > 0
    with pytest.raises(ValueError, match="refusing to resume"):
        streaming_lm_scores(spark, "/root/testdata/sf0.01", state_dir=state)
    # same corpus resumes fine (checkpoint replays cleanly; idempotent)
    b = streaming_lm_scores(spark, SF_SMALL, state_dir=state)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_and_degenerate_corpora(spark):
    """No-bigram corpora (empty table, single tokens, empty strings)
    score to empty results, not errors."""
    from mapreduce_minhash_lsh_spark.operators.lm import (
        bigram_lm_scores,
        stupid_backoff_scores,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bigram_lm_scores(empty).count() == 0
    assert stupid_backoff_scores(empty).count() == 0
    degen = _docs_df(spark, {1: "", 2: "one", 3: "  "})  # "  " -> 3 empty toks
    assert bigram_lm_scores(degen).count() == 1   # doc 3 has 2 bigrams of ""
    assert stupid_backoff_scores(degen).count() == 1
