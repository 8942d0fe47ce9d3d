from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.redact import redact_pii
from mapreduce_minhash_lsh_spark.operators.sampling import (
    DEFAULT_BUCKETS,
    hash_bucket,
    hash_sample,
    split_assign,
    stratified_sample,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 100_000).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(13), "doc_id", 100_000).collect()}
    assert a == b and len(a) > 0
    # fraction lands in a loose binomial window around 10%
    n = docs.count()
    assert 0.03 * n < len(a) < 0.25 * n


def test_hash_sample_is_subset_monotone(spark):
    # a 5% sample is exactly the low-bucket half of the 10% sample —
    # nested samples, the property rank-based sampling is used for
    docs = load_table(spark, SF_SMALL, "documents")
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 50_000).collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 100_000).collect()}
    assert small <= big


def test_split_assign_total_and_disjoint(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = split_assign(docs, "doc_id", [("train", 98), ("valid", 1), ("test", 1)])
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "valid", "test"}
    assert counts["train"] > counts.get("valid", 0)
    # windows tile the bucket space: re-running flips nothing
    again = {
        (r.doc_id, r.split)
        for r in split_assign(docs, "doc_id", [("train", 98), ("valid", 1), ("test", 1)]).select("doc_id", "split").collect()
    }
    first = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    assert first == again


def test_stratified_sample_exact_k_and_partition_invariant(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    got = stratified_sample(docs, ["lang"], k=7).select("doc_id", "lang", "rn")
    per = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(7, n) for lang, n in sizes.items()}
    # same rows and same ranks under a different partitioning
    again = stratified_sample(docs.repartition(13), ["lang"], k=7)
    key = lambda r: (r.lang, r.rn, r.doc_id)
    assert sorted(got.collect(), key=key) == sorted(
        again.select("doc_id", "lang", "rn").collect(), key=key
    )


def test_hash_bucket_range(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    row = docs.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= row.lo and row.hi < DEFAULT_BUCKETS


def test_redact_pii_tags(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org please"),
            (2, "see https://a.example/path?q=1 and http://b.example"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "no pii here"),
        ],
        ["id", "t"],
    )
    got = {r.id: r.clean for r in df.select("id", redact_pii(F.col("t")).alias("clean")).collect()}
    assert got[1] == "mail me at <EMAIL> please"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "no pii here"


def test_rp_project_exact_and_distance_preserving(spark):
    import math

    from mapreduce_minhash_lsh_spark.functions.vectors import (
        rademacher_signs,
        rp_project,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").limit(40)
    signs = rademacher_signs(64, 16, seed=7)
    proj = emb.select("vec_id", rp_project(F.col("embedding"), signs).alias("p"))
    rows = {r.vec_id: r.p for r in proj.collect()}
    again = {
        r.vec_id: r.p
        for r in emb.repartition(7)
        .select("vec_id", rp_project(F.col("embedding"), signs).alias("p"))
        .collect()
    }
    assert rows == again  # bit-exact under repartitioning
    assert all(len(p) == 16 for p in rows.values())

    # JL sanity: projected pairwise distances stay within a loose band
    # of sqrt(out/in)-scaled originals for most pairs
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    ids = sorted(orig)[:10]
    ok = 0
    total = 0
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d0 = math.dist(orig[a], orig[b]) * math.sqrt(16)
            d1 = math.dist(rows[a], rows[b])
            total += 1
            if d0 == 0 or 0.4 < d1 / d0 < 2.5:
                ok += 1
    assert ok / total > 0.9


def test_example_pipeline_end_to_end(spark, tmp_path):
    import examples.dedup_pipeline as pipe

    stats = pipe.run(spark, SF_SMALL, str(tmp_path / "out"))
    assert stats["kept"] + stats["dropped"] == stats["raw"]
    # the 28 planted near-dup pairs collapse into fewer drops when pairs
    # share docs (each group keeps one representative)
    assert stats["dropped"] >= 20
    assert 0 < stats["train"] <= stats["kept"]


def test_null_keys_drop_from_sample_and_null_split(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "k bigint")
    sampled = hash_sample(df, "k", DEFAULT_BUCKETS)  # fraction 1.0
    assert {r.k for r in sampled.collect()} == {1, 3}
    out = split_assign(df, "k", [("train", 9), ("test", 1)])
    got = {r.k: r.split for r in out.collect()}
    assert got[None] is None
    assert got[1] in ("train", "test") and got[3] in ("train", "test")


def test_rebalance_to_uniform_caps_overrepresented_groups(spark):
    from mapreduce_minhash_lsh_spark.operators.sampling import rebalance_to_uniform
    from mapreduce_minhash_lsh_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    out = rebalance_to_uniform(docs, "lang")
    after = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    share = sum(before.values()) / len(before)
    for lang, n in before.items():
        if n <= share:
            # at-or-under-share groups keep every row
            assert after.get(lang) == n, lang
        else:
            # over-share groups land near the uniform share (hash
            # Bernoulli with cut = share/n of bucket space)
            assert after[lang] < n
            assert abs(after[lang] - share) < 0.35 * share, (lang, after[lang], share)
    # deterministic under repartitioning
    again = rebalance_to_uniform(docs.repartition(17, "source"), "lang")
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    assert again.count() == out.count()


def test_rebalance_excludes_null_groups_from_totals(spark):
    """NULL-group rows are dropped AND excluded from the totals — they
    must not deflate other groups' retention cuts (NULL never equi-joins,
    so counting them would silently shrink every kept group)."""
    from mapreduce_minhash_lsh_spark.operators.sampling import rebalance_to_uniform

    rows = (
        [(i, "en") for i in range(900)]
        + [(1000 + i, "fr") for i in range(100)]
    )
    clean = spark.createDataFrame(rows, "doc_id long, lang string")
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(5000 + i, None) for i in range(400)], "doc_id long, lang string"
        )
    )
    kept_clean = sorted(r.doc_id for r in rebalance_to_uniform(clean, "lang").collect())
    kept_noisy = sorted(r.doc_id for r in rebalance_to_uniform(noisy, "lang").collect())
    # identical keep-set: NULL rows neither survive nor shift the cuts
    assert kept_clean == kept_noisy
    assert all(d < 2000 for d in kept_noisy)


def test_cluster_balanced_sample_covers_every_cell(spark):
    """Every quantizer cell contributes up to per_cluster rows, no cell
    exceeds the quota, and the choice is deterministic across calls."""
    from mapreduce_minhash_lsh_spark.operators.sampling import cluster_balanced_sample
    from mapreduce_minhash_lsh_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    out = cluster_balanced_sample(emb, per_cluster=7, n_lists=8).collect()
    per_list = {}
    for r in out:
        per_list.setdefault(r.list_id, []).append(r.vec_id)
    assert len(per_list) == 8  # every cell represented on this corpus
    assert all(len(v) <= 7 for v in per_list.values())
    again = cluster_balanced_sample(emb, per_cluster=7, n_lists=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# --- round 14: source frequency capping + token-budget selection -----------


def test_cap_per_key_caps_and_is_partition_invariant(spark):
    from mapreduce_minhash_lsh_spark.operators.sampling import cap_per_key

    docs = load_table(spark, SF_SMALL, "documents")
    kept = cap_per_key(docs, "source", 20, "doc_id")
    per_key = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_key and all(n <= 20 for n in per_key.values())
    a = {(r.source, r.doc_id) for r in kept.collect()}
    b = {
        (r.source, r.doc_id)
        for r in cap_per_key(docs.repartition(13), "source", 20, "doc_id").collect()
    }
    assert a == b


def test_budget_prefix_select_matches_global_window(spark):
    """The distributed two-pass cumsum must keep EXACTLY the rows the
    naive single-partition window keeps, with identical running sums."""
    from pyspark.sql import Window

    from mapreduce_minhash_lsh_spark.operators.sampling import budget_prefix_select

    docs = load_table(spark, SF_SMALL, "documents").where(F.length("text") > 0)
    scored = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("w")
    )
    budget = 5_000
    got = {
        (r.doc_id, r.running)
        for r in budget_prefix_select(
            scored, [F.col("w").desc(), F.col("doc_id").asc()], "w", budget
        ).collect()
    }
    naive_w = Window.orderBy(F.col("w").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r.doc_id, r.running)
        for r in scored.withColumn("running", F.sum("w").over(naive_w))
        .where(F.col("running") <= budget)
        .collect()
    }
    assert got == want and len(got) > 0


def test_budget_prefix_select_bucketing_invariance(spark):
    """Bucket count changes the plan, never the kept set."""
    from mapreduce_minhash_lsh_spark.operators.sampling import budget_prefix_select

    docs = load_table(spark, SF_SMALL, "documents").where(F.length("text") > 0)
    scored = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("w")
    )
    order = [F.col("w").desc(), F.col("doc_id").asc()]
    one = {
        (r.doc_id, r.running)
        for r in budget_prefix_select(scored, order, "w", 5_000, n_buckets=1).collect()
    }
    many = {
        (r.doc_id, r.running)
        for r in budget_prefix_select(scored, order, "w", 5_000, n_buckets=11).collect()
    }
    assert one == many and len(one) > 0


def test_budget_prefix_select_tiny_budget(spark):
    """A budget below the first row's weight keeps nothing (inclusive
    prefix semantics); a budget of exactly the first weight keeps one."""
    from mapreduce_minhash_lsh_spark.operators.sampling import budget_prefix_select

    rows = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["doc_id", "w"]
    )
    order = [F.col("doc_id").asc()]
    assert budget_prefix_select(rows, order, "w", 9).count() == 0
    got = budget_prefix_select(rows, order, "w", 10).collect()
    assert [(r.doc_id, r.running) for r in got] == [(1, 10)]
