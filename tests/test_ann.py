"""ANN operators: brute-force correctness and SRP-LSH recall."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.ann import cosine_pairs, cosine_topk, lsh_topk
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_cosine_topk_matches_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(100).cache()
    queries = emb.where(F.col("vec_id") % 20 == 0)
    got = cosine_topk(emb, queries, k=3).collect()

    rows = {r.vec_id: r.embedding for r in emb.collect()}
    for q in [v for v in rows if v % 20 == 0]:
        qv = rows[q]
        sims = []
        for c, cv in rows.items():
            if c == q:
                continue
            dot = sum(float(a) * float(b) for a, b in zip(qv, cv))
            na = math.sqrt(sum(float(a) ** 2 for a in qv))
            nb = math.sqrt(sum(float(b) ** 2 for b in cv))
            sims.append((c, dot / (na * nb)))
        expected = sorted(sims, key=lambda t: (-t[1], t[0]))[:3]
        got_q = sorted(
            [(r.neighbor_id, r.cosine) for r in got if r.query_id == q],
            key=lambda t: -t[1],
        )
        assert [c for c, _ in got_q] == [c for c, _ in expected]
        for (_, a), (_, b) in zip(got_q, expected):
            assert abs(a - b) < 1e-9


def test_lsh_topk_recall(spark):
    """SRP bucketing must recover a solid fraction of true top-5 at 8 planes
    (single-probe; recall < 1 by design, see operators/ann.py)."""
    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    queries = emb.where(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, n_planes=4).collect()
    true_sets = {}
    for r in exact:
        true_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    got_sets = {}
    for r in approx:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.3  # single-probe 4-plane baseline; multiprobe raises it
    # every returned neighbour must be genuinely in the query's bucket-local
    # ranking: cosine values must match the exact computation
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.query_id, r.neighbor_id)]) < 1e-12


def test_cosine_pairs_symmetric_threshold(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(60).cache()
    pairs = cosine_pairs(emb, threshold=-1.0).collect()
    n = emb.count()
    assert len(pairs) == n * (n - 1) // 2  # threshold -1 keeps all pairs
    for r in pairs:
        assert r.vec_id_a < r.vec_id_b
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_ivf_topk_recall(spark):
    from mapreduce_minhash_lsh_spark.operators.ann import ivf_topk

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    queries = emb.where(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect()
    true_sets, got_sets = {}, {}
    for r in exact:
        true_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.5  # 3-of-8 lists probed on near-random data
    # determinism: same call twice -> identical result
    again = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_ivf_train_cap_bounds_driver_materialization(spark, monkeypatch):
    """_centroids is the only driver-side materialization in the ANN
    family; the sample must honor IVF_TRAIN_CAP so an edit can't
    silently unbound it.  Shrink the cap and check the quantizer still
    works and trains on exactly the capped lowest-id prefix."""
    from mapreduce_minhash_lsh_spark.operators import ann

    assert ann.IVF_TRAIN_CAP == 4096
    emb = load_table(spark, SF_SMALL, "embeddings").cache()

    full = ann._centroids(emb, k=4, iters=1, id_col="vec_id", vec_col="embedding")
    monkeypatch.setattr(ann, "IVF_TRAIN_CAP", 32)
    capped = ann._centroids(emb, k=4, iters=1, id_col="vec_id", vec_col="embedding")
    prefix = ann._centroids(
        emb.orderBy("vec_id").limit(32), k=4, iters=1,
        id_col="vec_id", vec_col="embedding",
    )
    assert len(capped) == 4
    assert capped == prefix  # cap == training on the lowest-id prefix
    assert capped != full    # and the cap actually bit


def test_ivf_fast_assign_matches_exact(spark):
    """The Arrow-batch matmul assignment (the large-n_lists scale path)
    must agree with the oracle-exact expression assignment: same
    nearest-list choice per vector and the same final top-k on data
    without engineered cosine ties."""
    from mapreduce_minhash_lsh_spark.operators.ann import (
        _assign_col,
        _centroids,
        ivf_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    cents = _centroids(emb, k=8, iters=2, id_col="vec_id", vec_col="embedding")
    a = emb.select(
        F.element_at(_assign_col(cents, F.col("embedding"), 1, "exact"), 1).alias("e"),
        F.element_at(_assign_col(cents, F.col("embedding"), 1, "fast"), 1).alias("f"),
    )
    agg = a.agg(
        F.count("*").alias("n"),
        F.sum((F.col("e") == F.col("f")).cast("int")).alias("same"),
    ).collect()[0]
    assert agg.same == agg.n

    queries = emb.where(F.col("vec_id") % 25 == 0)
    ex = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3, assign="exact")
    fa = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3, assign="fast")
    assert sorted(map(tuple, ex.collect())) == sorted(map(tuple, fa.collect()))


def test_ivf_auto_threshold_and_bad_strategy(spark):
    """'auto' stays on the oracle-exact expression path at every
    registered configuration (n_lists <= ASSIGN_FAST_THRESHOLD) and a
    bogus strategy fails loudly."""
    import pytest

    from mapreduce_minhash_lsh_spark.operators import ann

    assert ann.ASSIGN_FAST_THRESHOLD >= 16  # registered oracles use 16
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    with pytest.raises(ValueError, match="assign"):
        ann._assign_col(cents, F.array(F.lit(1.0), F.lit(0.0)), 1, "bogus")


def test_ivf_index_query_split_equals_fused(spark):
    """ivf_index + ivf_query (the persist-the-index production shape)
    must return exactly what the fused ivf_topk returns, including when
    the assigned corpus round-trips through parquet."""
    import tempfile

    from mapreduce_minhash_lsh_spark.operators.ann import (
        ivf_index,
        ivf_query,
        ivf_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    queries = emb.where(F.col("vec_id") % 40 == 0)
    fused = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3)
    cents, corpus = ivf_index(emb, n_lists=8)
    tmp = tempfile.mkdtemp(prefix="ivf_idx_") + "/corpus"
    corpus.write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    reread = spark.read.parquet(tmp)
    split = ivf_query(cents, reread, queries, k=5, n_probe=3)
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, (r for r in split.select(*fused.columns).collect()))
    )


def test_ivf_index_incremental_ingest(spark):
    """Passing a previous build's centroids skips retraining and
    assigns a new batch consistently with the stored index: the union
    of (old index) + (new batch indexed with old cents) must equal
    indexing the union corpus with those same cents."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivf_index

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    old = emb.where(F.col("vec_id") % 3 != 0)
    new = emb.where(F.col("vec_id") % 3 == 0)
    cents, old_idx = ivf_index(old, n_lists=8)
    cents2, new_idx = ivf_index(new, cents=cents)
    assert cents2 == cents  # no retraining happened
    _, full_idx = ivf_index(emb, cents=cents)
    merged = {(r.neighbor_id, r.list_id) for r in old_idx.unionByName(new_idx).collect()}
    full = {(r.neighbor_id, r.list_id) for r in full_idx.collect()}
    assert merged == full


def test_ivf_query_prune_equals_unpruned(spark):
    """prune=True (collected-list partition pruning, the small-batch
    path) must not change results — it only narrows the corpus scan to
    lists the probes touch, which is exactly the set the join keeps."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivf_index, ivf_query

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    cents, corpus = ivf_index(emb, n_lists=8)
    q = emb.where(F.col("vec_id") % 100 == 0)
    a = ivf_query(cents, corpus, q, k=5, n_probe=3, prune=False)
    b = ivf_query(cents, corpus, q, k=5, n_probe=3, prune=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_recall_floor(spark):
    """PQ + exact re-rank recall@5 against brute force: measured 0.78
    at the registered configuration (m=8, 16 codewords, rerank=60) on
    this corpus; gate at 0.6.  Deterministic quantizer, so stable."""
    from mapreduce_minhash_lsh_spark.operators.ann import cosine_topk, pq_topk

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in pq_topk(emb, q, dim=64, k=5, m=8, n_codes=16, rerank=60).collect()}
    assert len(pq & exact) / len(exact) >= 0.6


def test_pq_codes_are_m_small_ints(spark):
    """The compressed representation really is m codes in [0, n_codes):
    the 64x memory argument rests on it."""
    from mapreduce_minhash_lsh_spark.operators.ann import pq_codebooks, pq_encode

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, n_codes=16)
    codes = pq_encode(emb, books, dim=64)
    assert codes.columns == ["neighbor_id", "code0", "code1", "code2", "code3"]
    agg = codes.agg(
        *[F.min(f"code{j}").alias(f"lo{j}") for j in range(4)],
        *[F.max(f"code{j}").alias(f"hi{j}") for j in range(4)],
        F.count("*").alias("n"),
    ).first()
    assert agg["n"] == emb.count()
    for j in range(4):
        assert 0 <= agg[f"lo{j}"] and agg[f"hi{j}"] < 16


def test_pq_rejects_indivisible_dim(spark):
    from mapreduce_minhash_lsh_spark.operators.ann import pq_codebooks

    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, dim=64, m=5)


def test_pq_corpus_scan_side_has_no_vector_join(spark):
    """Plan shape of the ADC stage: query LUTs broadcast against the
    code relation — the corpus float vectors must not appear before the
    rerank cut (the compressed-scan contract)."""
    from mapreduce_minhash_lsh_spark.operators.ann import pq_codebooks, pq_encode

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, n_codes=16)
    codes = pq_encode(emb, books, dim=64)
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.lit(1).alias("x")
    )
    p = (
        codes.crossJoin(F.broadcast(q))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_pq_split_equals_fused(spark):
    """pq_codebooks + pq_encode + pq_query (the build-once/query-many
    production split) must equal the fused pq_topk exactly."""
    from mapreduce_minhash_lsh_spark.operators.ann import (
        pq_codebooks, pq_encode, pq_query, pq_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.where(F.col("vec_id") % 100 == 0)
    books = pq_codebooks(emb, dim=64, m=4, n_codes=16)
    codes = pq_encode(emb, books, dim=64)
    a = sorted(map(tuple, pq_query(books, codes, emb, q, dim=64, k=5).collect()))
    b = sorted(map(tuple, pq_topk(emb, q, dim=64, k=5, m=4, n_codes=16).collect()))
    assert a == b


def test_ivfpq_recall_floor(spark):
    """IVF-PQ recall@5 against brute force: measured 0.78 at the
    registered configuration (16 lists, n_probe=8, m=8, 16 codewords,
    rerank=120) — identical to the full-scan PQ at the same rerank, so
    the coarse pruning cost no recall on this corpus.  Gate at 0.6.
    Deterministic quantizers, so stable."""
    from mapreduce_minhash_lsh_spark.operators.ann import cosine_topk, ivfpq_topk

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, q, dim=64, k=5, n_lists=16, n_probe=8, m=8, n_codes=16, rerank=120
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.6


def test_ivfpq_split_equals_fused(spark):
    """ivfpq_index + ivfpq_query (build-once/query-many) must equal the
    fused ivfpq_topk exactly."""
    from mapreduce_minhash_lsh_spark.operators.ann import (
        ivfpq_index, ivfpq_query, ivfpq_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.where(F.col("vec_id") % 100 == 0)
    cents, books, codes = ivfpq_index(emb, dim=64, n_lists=8, m=4, n_codes=16)
    a = sorted(map(tuple, ivfpq_query(
        cents, books, codes, emb, q, dim=64, k=5, n_probe=3).collect()))
    b = sorted(map(tuple, ivfpq_topk(
        emb, q, dim=64, k=5, n_lists=8, n_probe=3, m=4, n_codes=16).collect()))
    assert a == b


def test_ivfpq_prune_equals_unpruned(spark):
    """prune=True only narrows the code scan to probed lists — the set
    the join keeps anyway — so results must be identical."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivfpq_index, ivfpq_query

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    cents, books, codes = ivfpq_index(emb, dim=64, n_lists=8, m=4, n_codes=16)
    q = emb.where(F.col("vec_id") % 100 == 0)
    a = ivfpq_query(cents, books, codes, emb, q, dim=64, k=5, n_probe=3, prune=False)
    b = ivfpq_query(cents, books, codes, emb, q, dim=64, k=5, n_probe=3, prune=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivfpq_codes_carry_list_and_codes(spark):
    """The index relation is (neighbor_id, list_id, m codes) — the
    partitionBy(list_id) + int-columns-only scan contract."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivfpq_index

    emb = load_table(spark, SF_SMALL, "embeddings")
    _cents, _books, codes = ivfpq_index(emb, dim=64, n_lists=8, m=4, n_codes=16)
    assert codes.columns == ["neighbor_id", "list_id", "code0", "code1", "code2", "code3"]
    agg = codes.agg(
        F.min("list_id").alias("llo"), F.max("list_id").alias("lhi"),
        *[F.max(f"code{j}").alias(f"hi{j}") for j in range(4)],
        F.count("*").alias("n"),
    ).first()
    assert agg["n"] == emb.count()
    assert 0 <= agg["llo"] and agg["lhi"] < 8
    for j in range(4):
        assert agg[f"hi{j}"] < 16


def test_quantizer_literals_reject_non_finite():
    """ADVICE r10: repr(nan)+'D' would emit the unparseable SQL token
    'nanD' — a NaN/Inf quantizer component must fail loudly at literal
    emission, naming the input-cleaning remedy."""
    from mapreduce_minhash_lsh_spark.operators.ann import _cent_literal, _dfmt

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _dfmt(bad)
    with pytest.raises(ValueError, match="NaN/Inf"):
        _cent_literal([(0, [1.0, float("nan")])])
    # the finite path is unchanged: exact repr round-trip
    assert _dfmt(0.1) == "0.1D"


def test_centroids_warns_on_legacy_fast_rederivation(spark):
    """ADVICE r10 migration note: re-deriving a pre-r10 'fast'/'auto'
    quantizer at k above ASSIGN_FAST_THRESHOLD may not reproduce its
    float-matmul-trained centroids — _centroids must say so."""
    import warnings

    from mapreduce_minhash_lsh_spark.operators.ann import (
        ASSIGN_FAST_THRESHOLD,
        _centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").limit(64)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _centroids(emb, ASSIGN_FAST_THRESHOLD + 1, 1, "vec_id", "embedding",
                   assign="fast")
    assert any("pin the persisted quantizer" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _centroids(emb, 8, 1, "vec_id", "embedding", assign="exact")
    assert not any("pin the persisted quantizer" in str(w.message) for w in rec)


def test_ivfpq_parquet_index_partition_prunes(spark, tmp_path):
    """The 100 TB claim made literal: with the code relation stored
    partitionBy(list_id) and prune=True, the scan plan must carry a
    PartitionFilter on list_id restricted to the probed lists — a
    query batch reads only its lists' FILES, not the whole index."""
    import re

    from mapreduce_minhash_lsh_spark.operators.ann import ivfpq_index, ivfpq_query

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents, books, codes = ivfpq_index(emb, dim=64, n_lists=8, m=4, n_codes=16)
    path = str(tmp_path / "codes")
    codes.write.partitionBy("list_id").parquet(path)
    stored = spark.read.parquet(path)
    q = emb.where(F.col("vec_id") % 250 == 0)  # few queries -> few lists
    out = ivfpq_query(
        cents, books, stored, emb, q, dim=64, k=5, n_probe=1, prune=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]* IN \(([^)]*)\)", plan)
    assert m, "no IN-list partition filter on list_id in the scan"
    assert len(m.group(1).split(",")) < 8  # strictly fewer than all lists
    # and the pruned result equals the unpruned one
    full = ivfpq_query(
        cents, books, stored, emb, q, dim=64, k=5, n_probe=1, prune=False
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))


def test_lut_sql_matches_column_path(spark):
    """The SQL-text ADC lookup tables (_lut_cols / dot_scaled_sql — the
    r14 driver-side construction fix) must be BIT-IDENTICAL to the
    Column-API dot_scaled form they replaced, per subspace and per
    codebook entry."""
    from mapreduce_minhash_lsh_spark.functions.vectors import dot_scaled
    from mapreduce_minhash_lsh_spark.operators.ann import (
        _dlit_array,
        _lut_cols,
        pq_codebooks,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    books = pq_codebooks(emb, dim=64, m=4, n_codes=8, iters=2)
    sub = 64 // len(books)
    old = emb.select(
        "vec_id",
        *[
            F.array(
                *[
                    dot_scaled(
                        F.slice(F.col("embedding"), j * sub + 1, sub),
                        _dlit_array(cvec),
                    )
                    for _cid, cvec in books[j]
                ]
            ).alias(f"lut{j}")
            for j in range(len(books))
        ],
    )
    new = emb.select("vec_id", *_lut_cols(books, "embedding", sub))
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_assign_sql_matches_column_path(spark):
    """The SQL-text centroid assignment (_assign_expr with a string vec
    — the r15 construction fix) must be BIT-IDENTICAL and PLAN-IDENTICAL
    (modulo expr/plan ids) to the Column-API form it replaces, for both
    top=1 (encode/corpus assignment) and top=2 (probes), on whole
    vectors and on subspace slices."""
    import re as _re

    from mapreduce_minhash_lsh_spark.operators.ann import (
        _assign_expr,
        _centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = _centroids(emb, 8, 2, "vec_id", "embedding")

    def norm_plan(df):
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        s = df._jdf.queryExecution().explainString(mode)
        s = _re.sub(r"#\d+L?", "#X", s)
        s = _re.sub(r"plan_id=\d+", "plan_id=X", s)
        # lambda variable ids differ per construction
        return _re.sub(r"lambda '?\w+", "lambda X", s)

    for top, vec_col, vec_sql in [
        (1, F.col("embedding"), "`embedding`"),
        (2, F.col("embedding"), "`embedding`"),
        (1, F.slice(F.col("embedding"), 17, 16), "slice(`embedding`, 17, 16)"),
    ]:
        old = emb.select("vec_id", _assign_expr(cents, vec_col, top).alias("a"))
        new = emb.select("vec_id", _assign_expr(cents, vec_sql, top).alias("a"))
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0
        assert norm_plan(old) == norm_plan(new), (top, vec_sql)
