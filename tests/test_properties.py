"""Property-based checks (SURVEY.md §5.4): the Spark expressions must
agree with the plain-Python spec on arbitrary inputs, and the exact
Jaccard must satisfy the metric axioms."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.operators.similarity import exact_jaccard
from tests.test_shingling import shingles_py

# Text without surrogates; includes whitespace/quotes/delimiters the
# reference corrupts (SURVEY.md §2.7).
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(texts, min_size=1, max_size=6))
def test_shingling_matches_python_spec(spark, docs_texts):
    docs = spark.createDataFrame(list(enumerate(docs_texts)), ["doc_id", "text"])
    got = (
        explode_shingles(docs, k=3, distinct=False)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("s"))
        .collect()
    )
    got_map = {r.doc_id: r.s for r in got}
    for i, t in enumerate(docs_texts):
        assert got_map.get(i, []) == sorted(shingles_py(t)), repr(t)


@SLOW
@given(st.lists(texts.filter(lambda t: len(t) > 0), min_size=2, max_size=5))
def test_jaccard_axioms(spark, docs_texts):
    """j(a,a)=1; 0<j<=1; spark == python on every co-shingled pair."""
    docs = spark.createDataFrame(list(enumerate(docs_texts)), ["doc_id", "text"])
    sh = explode_shingles(docs, k=3)
    ids = list(range(len(docs_texts)))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.product(ids, ids)], ["doc_id_a", "doc_id_b"]
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in exact_jaccard(pairs, sh).collect()
    }
    sets = {i: set(shingles_py(t)) for i, t in enumerate(docs_texts)}
    for a, b in itertools.product(ids, ids):
        inter = sets[a] & sets[b]
        expected = len(inter) / len(sets[a] | sets[b]) if inter else None
        if expected is None:
            assert (a, b) not in got
        else:
            assert abs(got[(a, b)] - expected) < 1e-12
            if a == b:
                assert got[(a, b)] == 1.0
            assert got[(a, b)] == got[(b, a)]


@SLOW
@given(st.lists(texts, min_size=1, max_size=8))
def test_redact_pii_idempotent_and_digit_free_tags(spark, raw_texts):
    """Scrubbing twice equals scrubbing once (no tag re-mangling), and a
    planted email/phone/URL never survives a single pass."""
    from mapreduce_minhash_lsh_spark.functions.redact import redact_pii

    rows = [
        (i, f"{t} u{i}@ex.example https://ex.example/{i} +1 555 123 4567")
        for i, t in enumerate(raw_texts)
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    once = df.select("id", redact_pii(F.col("t")).alias("c"))
    twice = once.select("id", redact_pii(F.col("c")).alias("c"))
    a = {r.id: r.c for r in once.collect()}
    b = {r.id: r.c for r in twice.collect()}
    assert a == b
    for c in a.values():
        assert "@ex.example" not in c and "https://" not in c
        assert "555 123 4567" not in c


@SLOW
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_hash_bucket_matches_python_md5(spark, key):
    """The Spark bucket equals a plain-Python md5 recomputation — the
    same cross-engine contract the DuckDB oracle relies on."""
    import hashlib

    from mapreduce_minhash_lsh_spark.operators.sampling import (
        DEFAULT_BUCKETS,
        hash_bucket,
    )

    df = spark.createDataFrame([(key,)], ["k"])
    got = df.select(hash_bucket(F.col("k")).alias("b")).first().b
    want = int(hashlib.md5(f"{key}:42".encode()).hexdigest()[:15], 16) % DEFAULT_BUCKETS
    assert got == want


def test_signature_prefilter_survives_prime_above_int_range(spark):
    """ADVICE r6: __post_init__ puts no upper bound on prime, so a cfg
    with prime > 2^31 must NOT take the int-cast payload-shrink path —
    under ANSI mode the cast of a >2^31 signature value would throw
    CAST_OVERFLOW (and silently wrap with ANSI off).  The long path
    computes the same agreement counts."""
    from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        signature_prefilter,
    )

    big_prime = 2_147_483_659  # smallest prime above 2^31
    cfg = MinHashLSHConfig(
        num_hashes=4, num_bands=2, threshold=0.8, prime=big_prime,
        id_strategy="md5",
    )
    hi = 2**31 + 7  # a legitimate mod-p signature value that overflows int
    sigs = spark.createDataFrame(
        [
            (1, [hi, hi + 1, hi + 2, hi + 3]),
            (2, [hi, hi + 1, hi + 2, 5]),      # agrees with 1 in 3 of 4
            (3, [hi, 9, 9, 5]),                # agrees with 1 in 1 of 4
        ],
        ["doc_id", "sig"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], ["doc_id_a", "doc_id_b"]
    )
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in signature_prefilter(pairs, sigs, cfg, cfg.threshold).collect()
    }
    # cut = ceil((0.8 - 0.21) * 4) = 3 agreements
    assert got == {(1, 2)}


# ---------------------------------------------------------------------------
# Codec properties (round 8): arbitrary pixel arrays through the real
# dependency-free containers — pure numpy, no Spark session needed.
# ---------------------------------------------------------------------------

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(0, 2**32 - 1))
def test_png_bmp_ppm_roundtrip_lossless_property(dims, seed):
    """PNG/BMP/PPM are lossless containers: encode->decode must be the
    identity on ANY uint8 RGB array (dims not multiples of anything)."""
    import numpy as np

    from mapreduce_minhash_lsh_spark.multimodal.binary import (
        bmp_pixels,
        pixels_to_bmp,
        pixels_to_png,
        pixels_to_ppm,
        png_pixels,
        ppm_pixels,
    )

    w, h = dims
    arr = np.random.RandomState(seed % 2**31).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    assert (png_pixels(pixels_to_png(arr)) == arr).all()
    assert (bmp_pixels(pixels_to_bmp(arr)) == arr).all()
    assert (ppm_pixels(pixels_to_ppm(arr)) == arr).all()


@settings(max_examples=15, deadline=None)
@given(_dims, st.integers(0, 255), st.booleans())
def test_jpeg_constant_exact_property(dims, gray, subsample):
    """All-ones-quant JPEG is EXACT on constant images for any dims and
    gray level, with or without 4:2:0 subsampling — the property the
    multimodal_jpeg oracle relies on."""
    import numpy as np

    from mapreduce_minhash_lsh_spark.multimodal.jpeg import (
        encode_baseline,
        jpeg_pixels,
    )

    w, h = dims
    arr = np.full((h, w, 3), gray, dtype=np.uint8)
    out = jpeg_pixels(encode_baseline(arr, subsample=subsample))
    assert out.shape == arr.shape
    assert (out == arr).all()


@settings(max_examples=10, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.integers(0, 3))
def test_jpeg_q1_bounded_error_property(dims, seed, restart):
    """q=1 baseline JPEG on ARBITRARY content: decode is within a few
    LSBs of the source (DCT float rounding + one chroma round trip),
    for any dims and any restart interval."""
    import numpy as np

    from mapreduce_minhash_lsh_spark.multimodal.jpeg import (
        encode_baseline,
        jpeg_pixels,
    )

    w, h = dims
    arr = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = jpeg_pixels(encode_baseline(arr, restart_interval=restart))
    assert out.shape == arr.shape
    # chroma rounding through YCbCr costs up to ~2 LSB; DCT rounding ~1
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 4


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=3, max_value=8),
)
def test_ivf_fast_assign_agrees_or_tied(spark, seed, k_cents, dim):
    """On arbitrary vectors the Arrow-matmul assignment must pick the
    same nearest centroid as the exact scaled-int expression — or, when
    they differ, the two centroids' cosines to the vector must be a
    genuine near-tie (the only divergence float64-vs-exact rounding can
    produce)."""
    import numpy as np

    from mapreduce_minhash_lsh_spark.operators.ann import _assign_col

    rng = np.random.default_rng(seed)
    n = 12
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    cents = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(k_cents)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    rows = df.select(
        "vec_id", "embedding",
        F.element_at(_assign_col(cents, F.col("embedding"), 1, "exact"), 1).alias("e"),
        F.element_at(_assign_col(cents, F.col("embedding"), 1, "fast"), 1).alias("f"),
    ).collect()
    mat = np.array([c[1] for c in cents], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    for r in rows:
        if r.e == r.f:
            continue
        v = np.array(r.embedding, dtype=np.float64)
        cos = (mat @ v) / (np.where(nrm > 0, nrm, 1.0) * max(np.linalg.norm(v), 1e-300))
        assert abs(cos[r.e] - cos[r.f]) < 1e-9, (r.vec_id, r.e, r.f, cos)


@SLOW
@given(st.lists(texts, min_size=1, max_size=5))
def test_winnowing_matches_python_spec(spark, docs_texts):
    """Winnowed fingerprint sets equal the plain-Python rightmost-min
    spec on arbitrary text (incl. whitespace/quotes/unicode)."""
    from mapreduce_minhash_lsh_spark.operators.winnow import winnow_fingerprints
    from tests.test_winnow import _mirror

    docs = spark.createDataFrame(list(enumerate(docs_texts)), ["doc_id", "text"])
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=3, w=2).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(docs_texts):
        assert got.get(i, set()) == _mirror(t, 3, 2), repr(t)


# space-joined word docs: the LM tokenization is a plain ' ' split, so
# build inputs from words (possibly empty -> consecutive spaces)
_words = st.text(alphabet=st.sampled_from("ab "), min_size=0, max_size=12)


@SLOW
@given(st.lists(_words, min_size=1, max_size=5))
def test_bigram_lm_matches_python_spec(spark, docs_texts):
    from mapreduce_minhash_lsh_spark.operators.lm import bigram_lm_scores
    from tests.test_lm import _expected

    corpus = {i: t for i, t in enumerate(docs_texts)}
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.logp_scaled, r.avg_nll)
        for r in bigram_lm_scores(docs).collect()
    }
    assert got == _expected(corpus, corpus)


@SLOW
@given(st.lists(_words, min_size=1, max_size=4))
def test_stupid_backoff_matches_python_spec(spark, docs_texts):
    from mapreduce_minhash_lsh_spark.operators.lm import stupid_backoff_scores
    from tests.test_lm import _sb_expected

    corpus = {i: t for i, t in enumerate(docs_texts)}
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_trigrams, r.logsb_scaled, r.avg_nls)
        for r in stupid_backoff_scores(docs).collect()
    }
    assert got == _sb_expected(corpus, corpus)
