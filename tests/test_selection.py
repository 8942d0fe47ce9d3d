"""Operator-level tests for the round-11 data-selection family:
DSIR importance weights (operators/dsir.py) and SemDeDup
(operators/semdedup.py).  Oracle parity is covered by the registry
sweep (tests/test_oracle_parity.py); these pin the operators' own
semantics and scale-shape contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.dsir import (
    DSIR_LOG_SCALE,
    doc_feature_buckets,
    dsir_logweights,
)
from mapreduce_minhash_lsh_spark.operators.semdedup import (
    semdedup_drop_ids,
    semdedup_pairs,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_dsir_targets_score_higher(spark):
    """The semantic point of DSIR: documents FROM the target
    distribution must average a higher importance weight than the
    rest of the background corpus."""
    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_logweights(docs, docs.where(F.col("lang") == "en"), n_buckets=4096)
    rows = (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("avg_logw").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_dsir_predicate_path_equals_dataframe_path(spark):
    """The single-aggregation subset fast path (target_pred) must
    produce byte-identical weights to the general two-corpus form with
    target = docs.where(pred)."""
    docs = load_table(spark, SF_SMALL, "documents")
    a = sorted(
        map(
            tuple,
            dsir_logweights(
                docs, docs.where(F.col("lang") == "en"), n_buckets=512
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dsir_logweights(
                docs, n_buckets=512, target_pred=F.col("lang") == "en"
            ).collect(),
        )
    )
    assert a == b


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    feats = doc_feature_buckets(docs, 4096)
    got = {r.doc_id: r.n for r in feats.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    toks = F.size(F.split(F.col("text"), " "))
    expect = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.when(toks >= 2, toks * 2 - 1).otherwise(toks).alias("n"),
        ).collect()
    }
    assert got == expect


def test_dsir_weights_are_quantized_int_sums(spark):
    """logw_scaled is an exact int64; avg_logw is the pinned
    re-derivation — no independent float accumulation."""
    docs = load_table(spark, SF_SMALL, "documents").limit(100)
    w = dsir_logweights(docs, docs.where(F.col("lang") == "en")).collect()
    assert w
    for r in w:
        assert isinstance(r.logw_scaled, int)
        assert r.avg_logw == r.logw_scaled / DSIR_LOG_SCALE / r.n_feats


def test_semdedup_pairs_subset_of_exact_pairs(spark):
    """Cluster-scoping only PRUNES comparisons: every SemDeDup pair
    must appear (with the identical exact cosine) in the exhaustive
    cosine_pairs output at the same threshold."""
    from mapreduce_minhash_lsh_spark.operators.ann import cosine_pairs

    emb = load_table(spark, SF_SMALL, "embeddings")
    sd = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in semdedup_pairs(emb, threshold=0.35, n_lists=4).collect()
    }
    exact = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in cosine_pairs(emb, threshold=0.35).collect()
    }
    assert sd
    assert set(sd) <= set(exact)
    for k, v in sd.items():
        assert exact[k] == v


def test_semdedup_single_cluster_equals_exact(spark):
    """n_lists=1 removes the pruning, so the pair set must equal the
    exhaustive one exactly."""
    from mapreduce_minhash_lsh_spark.operators.ann import cosine_pairs

    emb = load_table(spark, SF_SMALL, "embeddings").where(F.col("vec_id") < 200)
    sd = sorted(
        (r.vec_id_a, r.vec_id_b, r.cosine)
        for r in semdedup_pairs(emb, threshold=0.3, n_lists=1).collect()
    )
    exact = sorted(
        (r.vec_id_a, r.vec_id_b, r.cosine)
        for r in cosine_pairs(emb, threshold=0.3).collect()
    )
    assert sd == exact


def test_semdedup_drop_keeps_chain_minimum(spark):
    """Every dropped id has an above-threshold lower-id neighbor in its
    cluster, and no pair's LOWER id is ever dropped unless it is
    itself someone's higher end."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    pairs = semdedup_pairs(emb, threshold=0.35, n_lists=4).collect()
    drops = {r.vec_id for r in semdedup_drop_ids(emb, threshold=0.35, n_lists=4).collect()}
    assert drops == {r.vec_id_b for r in pairs}
    higher_ends = {r.vec_id_b for r in pairs}
    chain_minima = {r.vec_id_a for r in pairs} - higher_ends
    assert chain_minima.isdisjoint(drops)


def test_semdedup_plan_has_no_corpus_shuffle_join(spark):
    """Scale shape: the candidate stage is one groupBy(list_id) over
    the assigned corpus — cluster assignment itself must be map-side
    (no join/exchange between the scan and the cell grouping)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    plan = semdedup_pairs(emb, threshold=0.35, n_lists=4)._jdf.queryExecution().executedPlan().toString()
    # exactly the expected exchanges: the applyInPandas groupBy, plus the
    # confirm joins against the (tiny) candidate set; the assignment
    # stage must not introduce a join against a centroid relation.
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
    assert "CartesianProduct" not in plan


def test_bloom_no_false_negatives_and_bounded(spark):
    """Bloom axioms: every inserted value tests positive (no false
    negatives), the word array is exactly ceil(m/60) longs regardless
    of set size, and the false-positive rate on a disjoint probe set
    stays near the (1 - e^(-kn/m))^k design point."""
    from mapreduce_minhash_lsh_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    m_bits, k = 1 << 14, 4
    vals = spark.range(2000).select(F.concat(F.lit("v"), F.col("id")).alias("s"))
    words = bloom_build(vals, "s", m_bits=m_bits, k=k)
    assert len(words) == -(-m_bits // 60)
    member = vals.where(
        bloom_might_contain(F.col("s"), words, m_bits, k)
    ).count()
    assert member == 2000
    probes = spark.range(20000).select(
        F.concat(F.lit("w"), F.col("id")).alias("s")
    )
    fp = probes.where(bloom_might_contain(F.col("s"), words, m_bits, k)).count()
    import math

    design = (1 - math.exp(-k * 2000 / m_bits)) ** k
    assert fp / 20000 < 3 * design + 0.01


def test_bloom_membership_is_map_side(spark):
    """The 100 TB claim: scoring a corpus against the filter is pure
    expression code — the plan between scan and aggregate must contain
    no join and no extra exchange."""
    from mapreduce_minhash_lsh_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    m_bits, k = 1 << 14, 4
    vals = spark.range(500).select(F.concat(F.lit("v"), F.col("id")).alias("s"))
    words = bloom_build(vals, "s", m_bits=m_bits, k=k)
    probe = spark.range(5000).select(F.concat(F.lit("p"), F.col("id")).alias("s"))
    plan = (
        probe.where(bloom_might_contain(F.col("s"), words, m_bits, k))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_dsir_general_two_corpus_counts_all_target_features(spark):
    """Regression (r11 self-review): with a TRUE two-corpus target,
    buckets the background never produces must still count toward N_t
    — a post-join sum would shrink the smoothing denominator.  Expected
    weights computed independently in Python with the same md5 bucket
    function, exact integer compare."""
    import hashlib
    import math

    B = 4096
    S = DSIR_LOG_SCALE
    doc_rows = [(0, "aa bb"), (1, "bb cc aa")]
    tgt_rows = [(10, "zz qq"), (11, "zz")]
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    target = spark.createDataFrame(tgt_rows, "doc_id long, text string")

    def feats(text):
        toks = text.split(" ")
        out = list(toks)
        if len(toks) >= 2:
            out += [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return out

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    bg: dict[int, int] = {}
    tg: dict[int, int] = {}
    for _i, text in doc_rows:
        for f in feats(text):
            bg[bucket(f)] = bg.get(bucket(f), 0) + 1
    for _i, text in tgt_rows:
        for f in feats(text):
            tg[bucket(f)] = tg.get(bucket(f), 0) + 1
    n_bg, n_tg = sum(bg.values()), sum(tg.values())

    def lq(b):
        pt = (tg.get(b, 0) + 1.0) / (n_tg + float(B))
        pb = (bg[b] + 1.0) / (n_bg + float(B))
        return math.floor(S * math.log(pt)) - math.floor(S * math.log(pb))

    expected = {}
    for i, text in doc_rows:
        bs = [bucket(f) for f in feats(text)]
        expected[i] = (len(bs), sum(lq(b) for b in bs))
    got = {
        r.doc_id: (r.n_feats, r.logw_scaled)
        for r in dsir_logweights(docs, target, n_buckets=B).collect()
    }
    assert got == expected


def test_dsir_select_keeps_nontrivial_en_enriched_subset(spark):
    """The closed loop (VERDICT r11 #2): dsir_select must deliver a
    corpus SUBSET — strictly smaller than the input, non-empty, and
    enriched toward the target distribution (en share among kept docs
    above the corpus base rate)."""
    from mapreduce_minhash_lsh_spark.operators.dsir import dsir_select

    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_logweights(docs, n_buckets=4096, target_pred=F.col("lang") == "en")
    kept = dsir_select(w)
    n_all = w.count()
    n_kept = kept.count()
    assert 0 < n_kept < n_all
    en_kept = (
        kept.join(docs.select("doc_id", "lang"), "doc_id")
        .where(F.col("lang") == "en")
        .count()
    )
    en_all = docs.where(F.col("lang") == "en").count()
    assert en_kept / n_kept > en_all / n_all


def test_dsir_select_is_partition_invariant(spark):
    """A doc's keep/drop must depend only on its own id and weight —
    the streaming-ingest property: same kept set under any
    repartitioning of the input."""
    from mapreduce_minhash_lsh_spark.operators.dsir import dsir_select

    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_logweights(docs, n_buckets=512, target_pred=F.col("lang") == "en")
    a = sorted(r.doc_id for r in dsir_select(w).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in dsir_select(w.repartition(13)).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_dsir_exp_grid_realizes_exponential_keep_rate(spark):
    """P(keep | z) = #{b : L[b] > -z} / grid must approximate
    e^(z / (S*T)) — check the table against the closed form at a few
    z values (grid quantization allows 1/grid slack per cell)."""
    import math

    from mapreduce_minhash_lsh_spark.operators.dsir import (
        DSIR_SELECT_GRID,
        exp_grid_table,
    )

    tbl = exp_grid_table()
    assert tbl == sorted(tbl, reverse=True)  # monotone in u
    st = DSIR_LOG_SCALE * 0.05
    for z in (-250, -500, -1000, -2000):
        realized = sum(1 for v in tbl if v > -z) / DSIR_SELECT_GRID
        assert abs(realized - math.exp(z / st)) <= 2.0 / DSIR_SELECT_GRID


def test_bloom_sizing_formula():
    """m = n*ln(1/p)/ln^2 2, power-of-2 rounded up, floored at 2^16:
    the 10^6-gram eval suite that saturates the 2^16 default must
    auto-size to a sound geometry (2^24 bits ~ 2 MB, not 'a few KB
    forever')."""
    from mapreduce_minhash_lsh_spark.operators.bloom import bloom_sized_m_bits

    assert bloom_sized_m_bits(1_000) == 1 << 16  # floor
    assert bloom_sized_m_bits(1_000_000, 0.01) == 1 << 24
    m = bloom_sized_m_bits(1_000_000, 0.01)
    import math
    fill = 1 - math.exp(-4 * 1_000_000 / m)
    assert fill < 0.5


def test_bloom_build_guard_trips_on_saturation(spark):
    """A 10^6-value reference set against the 2^16 default must be
    REFUSED (VERDICT r11 #3) — the silent failure mode is every probe
    answering 'contaminated'."""
    import pytest

    from mapreduce_minhash_lsh_spark.operators.bloom import bloom_build

    vals = spark.range(1_000_000).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="saturated"):
        bloom_build(vals, "v", m_bits=1 << 16, k=4)


def test_bloom_auto_sized_build_stays_sound(spark):
    """bloom_auto_m_bits -> bloom_build end-to-end: the derived
    geometry keeps fill under the guard and preserves the
    no-false-negative contract."""
    from mapreduce_minhash_lsh_spark.operators.bloom import (
        bloom_auto_m_bits,
        bloom_build,
        bloom_might_contain,
    )

    vals = spark.range(20_000).select(F.col("id").cast("string").alias("v"))
    m = bloom_auto_m_bits(vals, "v", p_fp=0.01)
    words = bloom_build(vals, "v", m_bits=m, k=4)  # guard on: must pass
    fill = sum(w.bit_count() for w in words) / m
    assert fill < 0.5
    # no false negatives on the members themselves
    misses = vals.where(
        ~bloom_might_contain(F.col("v"), words, m_bits=m, k=4)
    ).count()
    assert misses == 0


def test_semdedup_soft_assign_superset_and_same_semantics(spark):
    """soft_assign=2 must find every hard-assignment pair (superset —
    each vector's top-1 cell is among its top-2) and keep exact-confirm
    semantics (all emitted cosines >= threshold)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    hard = {
        (r.vec_id_a, r.vec_id_b)
        for r in semdedup_pairs(emb, 0.4, n_lists=8, lloyd_iters=2).collect()
    }
    soft_rows = semdedup_pairs(
        emb, 0.4, n_lists=8, lloyd_iters=2, soft_assign=2
    ).collect()
    soft = {(r.vec_id_a, r.vec_id_b) for r in soft_rows}
    assert hard <= soft
    assert len(soft_rows) == len(soft)  # lowest-cell dedup: one row per pair
    assert all(r.cosine >= 0.4 for r in soft_rows)
