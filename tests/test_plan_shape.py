"""Physical-plan assertions — the 100 TB contract, checked in CI.

Correctness tests prove the VALUES; these prove the SHAPES: filters
reach the parquet scan, small dimensions broadcast, no single-partition
window ships in a hot path, and no row-at-a-time Python UDF exists
anywhere.  A regression here is invisible at sf0.001 and fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    p = plan(registry.queries()["q6_forecast_revenue"](spark, SF_SMALL))
    assert "PushedFilters: [" in p
    # the selective predicates must appear inside the pushed list, not
    # only as a post-scan Filter
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed


def test_q5_broadcasts_small_dimensions(spark):
    p = plan(registry.queries()["q5_region_revenue"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert p.count("BroadcastExchange") >= 2  # region + nation at least


def test_scan_reads_only_needed_columns(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    p = plan(li.where(F.col("l_shipdate") <= "1998-09-02").select("l_quantity"))
    rs = p.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_quantity" in rs and "l_shipdate" in rs
    assert "l_comment" not in rs and "l_extendedprice" not in rs


def test_flagship_has_no_unpartitioned_window(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs

    p = plan(similar_pairs(docs, registry.PIPELINE_CFG))
    # an empty window partition spec prints as "windowspecdefinition(<sort>"
    # with no partition columns before the sort spec; the robust check is
    # simply that no Window node exists at all on the md5 path
    assert "Window" not in p


def test_vocabulary_window_is_partitioned(spark):
    from mapreduce_minhash_lsh_spark.operators.shingling import (
        explode_shingles,
        vocabulary,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    p = plan(vocabulary(explode_shingles(docs, 3)))
    assert "Window" in p
    # the per-shingle rank window must carry its prefix-bucket partition
    # key; only the tiny per-prefix offset window may be global
    big_window = [
        ln for ln in p.splitlines() if "row_number()" in ln and "Window" in ln
    ]
    assert big_window and all("_bkt" in ln for ln in big_window)


def test_no_python_row_udfs_anywhere():
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "mapreduce_minhash_lsh_spark"
    offenders = []
    for f in pkg.rglob("*.py"):
        src = f.read_text()
        if "F.udf(" in src or "@udf" in src or "functions.udf(" in src:
            offenders.append(str(f))
    assert not offenders, offenders


def test_flagship_whole_stage_codegen_spans(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    from mapreduce_minhash_lsh_spark.operators.minhash import minhash_signatures
    from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles

    df = minhash_signatures(explode_shingles(docs, 3), registry.PIPELINE_CFG)
    # AQE finalizes the plan only once THIS dataframe's own query
    # execution runs (count() would plan a separate aggregate query)
    df.collect()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(mode)
    assert "isFinalPlan" not in p or "Final Plan" in p
    # codegen'd operators carry the '*' marker; the 128-buffer signature
    # aggregate must be inside whole-stage codegen (session raises
    # spark.sql.codegen.maxFields above the 100 default for exactly this)
    assert any(
        ln.strip().startswith(("+- * HashAggregate", "* HashAggregate"))
        or "- * HashAggregate" in ln
        for ln in p.splitlines()
    ), p[:1500]


def test_banded_pairs_has_no_dedup_aggregate(spark):
    """The lowest-band emission contract: the uncapped candidate join
    must contain NO aggregate (the r3 form paid a global distinct —
    ~b rows per true pair through one extra shuffle).  A regression
    re-introducing the distinct is invisible at sf0.001 and a full
    extra shuffle of the widest relation at 100 TB."""
    from mapreduce_minhash_lsh_spark.operators.lsh import banded_pairs
    from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        signature_set_relation,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    rel = signature_set_relation(
        explode_shingles(docs, 3), registry.PIPELINE_CFG
    )
    p = plan(banded_pairs(rel, registry.PIPELINE_CFG))
    assert "Aggregate" not in p, p[:1200]
    assert "Join" in p


def test_signature_set_relation_single_aggregate(spark):
    """The fused (sig, sh_set) relation must be ONE aggregate over the
    shingle relation — not a join of two (which would shuffle the wide
    relation twice)."""
    from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        signature_set_relation,
    )
    import re

    docs = load_table(spark, SF_SMALL, "documents")
    # build WITHOUT materializing: call through and introspect the
    # checkpointed plan's parent by rebuilding the lazy form
    from mapreduce_minhash_lsh_spark.functions.hashing import (
        affine_hash,
        md5_id,
        md5_long,
    )

    cfg = registry.PIPELINE_CFG
    sh = explode_shingles(docs, cfg.k)
    base = sh.select(
        "doc_id",
        md5_id(F.col("shingle"), cfg.prime).alias("shingle_id"),
        md5_long(F.col("shingle")).alias("sid"),
    )
    aggs = [
        F.min(affine_hash(F.col("shingle_id"), a, b, cfg.prime)).alias(f"mh_{j}")
        for j, (a, b) in enumerate(cfg.hash_params())
    ]
    aggs.append(F.collect_set("sid").alias("sh_set"))
    p = plan(base.groupBy("doc_id").agg(*aggs))
    # exactly one exchange: the partial->final aggregate pair rides it
    assert len(re.findall(r"Exchange", p)) == 1, p[:1200]


def test_ivf_query_broadcasts_probes_never_shuffles_corpus(spark):
    """The IVF probe join must broadcast the (|Q| x n_probe)-row probe
    side; the corpus is scanned once, never exchanged — at 100 TB a
    SortMergeJoin here would shuffle the whole index per query batch."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivf_index, ivf_query

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents, corpus = ivf_index(emb, n_lists=8)
    q = emb.where(F.col("vec_id") % 40 == 0)
    p = plan(ivf_query(cents, corpus, q, k=5, n_probe=3))
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "SortMergeJoin" not in p, p[:1500]


def test_winnow_fingerprints_is_shuffle_free(spark):
    """The winnowing selection is pure map-side array math — at 100 TB
    an Exchange here would shuffle every document's hash array for an
    operator that needs no cross-row state."""
    from mapreduce_minhash_lsh_spark.operators.winnow import winnow_fingerprints

    docs = load_table(spark, SF_SMALL, "documents")
    p = plan(winnow_fingerprints(docs, k=5, w=4))
    assert "Exchange" not in p, p[:1500]


def test_ivfpq_query_broadcasts_probes_never_shuffles_codes(spark):
    """Same contract as the IVF guard, on the compressed index: the
    probe+LUT side broadcasts, the code relation is scanned once —
    never sort-merge-shuffled — before the rerank cut."""
    from mapreduce_minhash_lsh_spark.operators.ann import ivfpq_index, ivfpq_query

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents, books, codes = ivfpq_index(emb, dim=64, n_lists=8, m=4, n_codes=16)
    q = emb.where(F.col("vec_id") % 40 == 0)
    p = plan(ivfpq_query(cents, books, codes, emb, q, dim=64, k=5, n_probe=3))
    assert "BroadcastHashJoin" in p, p[:1500]
    # the only allowed exchanges are on the tiny candidate/rank side;
    # the full code relation must join the probes via broadcast hash
    assert "SortMergeJoin" not in p, p[:1500]


def test_lm_scores_aggregates_before_driver(spark):
    """The LM score plan must keep per-bigram rows executor-side: the
    output aggregate is per-doc, and the plan carries map-side partial
    aggregation (two-phase HashAggregate) for the count relations."""
    import re

    from mapreduce_minhash_lsh_spark.operators.lm import bigram_lm_scores

    docs = load_table(spark, SF_SMALL, "documents")
    p = plan(bigram_lm_scores(docs))
    # partial+final pairs for bigram counts, prefix counts, vocab and
    # the per-doc rollup — at least 4 HashAggregate pairs
    assert len(re.findall(r"HashAggregate", p)) >= 8, p[:2000]
    assert "CollectLimit" not in p


def test_dsir_select_adds_no_exchange(spark):
    """The selection step must be a pure map-side filter on the weight
    relation: the dsir_selected_sample plan has EXACTLY the same
    Exchange count as the weight computation it filters (zero added
    shuffles — at 100 TB the selection is free)."""
    from mapreduce_minhash_lsh_spark.operators.dsir import (
        dsir_logweights,
        dsir_select,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_logweights(docs, n_buckets=512, target_pred=F.col("lang") == "en")
    base = plan(w).count("Exchange")
    sel = plan(dsir_select(w)).count("Exchange")
    assert sel == base


def test_cms_topk_candidate_sample_pushed_to_docs_scan(spark):
    """Round 13 (VERDICT r12 #3): the candidate side must sample
    DOCUMENTS before exploding — the md5-bucket sample predicate
    belongs on the docs scan side of the generate, not after a
    corpus-wide explode.  The plan therefore contains a Filter with
    the bucket predicate BELOW a Generate (explode), and exactly two
    scans of documents (sketch side + sampled candidate side)."""
    from mapreduce_minhash_lsh_spark.queries.llm import _CMS_SAMPLE_NUM

    p = plan(registry.queries()["cms_topk_grams"](spark, SF_SMALL))
    lines = p.splitlines()
    # the md5-bucket sample predicate is a Filter BELOW the Generate
    # (explode) — i.e. on the scan side, not after a corpus-wide
    # explode.  Derived from _CMS_SAMPLE_NUM and checked by relative
    # position, not exact adjacency, so a constant change or minor
    # optimizer re-formatting doesn't false-alarm (ADVICE r13).
    pred = f"< {_CMS_SAMPLE_NUM}"
    filt = [i for i, ln in enumerate(lines) if "Filter" in ln and pred in ln]
    assert filt, "sample predicate not found as a Filter"
    gen = [i for i, ln in enumerate(lines) if "Generate explode(" in ln]
    assert gen, "candidate explode not found"
    assert filt[0] > gen[0], "sample Filter sits above the explode"
    assert any(
        "FileScan parquet" in ln for ln in lines[filt[0] + 1 :]
    ), "no scan below the sample Filter"
    # candidate explode path: array_distinct rides the generate, proving
    # per-document pre-dedup happens before the candidate exchange
    assert any("Generate explode(array_distinct(" in ln for ln in lines)
    # the global candidate distinct stays a partial+final aggregate
    # (map-side combine), not a repartition-then-distinct
    assert "HashAggregate" in p


def test_token_budget_selection_no_global_window(spark):
    """Round 14: budget selection must never run a no-partition window
    (that moves the whole corpus to ONE task); every Window in the plan
    partitions by the range bucket, and the bounded bucket-offset
    relation joins back via broadcast."""
    p = plan(registry.queries()["token_budget_selection"](spark, SF_SMALL))
    win = [ln for ln in p.splitlines() if "Window" in ln]
    assert win, "expected a per-bucket window"
    assert all("_bucket" in ln for ln in win), win
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p


def test_bpe_argmax_is_take_ordered(spark):
    """The per-iteration winning pair (round 14) must be a
    TakeOrderedAndProject over partially-aggregated pair counts — a
    global Sort exchange for a LIMIT-1 argmax would shuffle the whole
    pair vocabulary every merge iteration."""
    from mapreduce_minhash_lsh_spark.operators.bpe import (
        _pair_argmax,
        word_frequencies,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    vocab = word_frequencies(docs, word_pattern="^[a-z]+$").select(
        "cnt", F.array_remove(F.split(F.col("word"), ""), "").alias("seq")
    )
    p = plan(_pair_argmax(vocab))
    assert "TakeOrderedAndProject" in p
    assert "partial_sum" in p
    assert p.count("Sort ") == 0  # no global sort node


def test_bpe_trained_token_counts_single_exchange_chained_folds(spark):
    """Round 14: the train-then-encode apply path must stay K chained
    Projects (one per merge — CollapseProject re-inlining would
    rebuild the 3^K expression tree) feeding ONE partial-aggregated
    exchange on doc_id."""
    from mapreduce_minhash_lsh_spark.operators.bpe import (
        trained_token_counts,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    df = trained_token_counts(docs, 8, word_pattern="^[a-z]+$")
    p = plan(df)
    assert p.count("Exchange") == 1
    assert p.count("+- Project") >= 8  # one surviving Project per merge
    assert "partial_count" in p or "partial_sum" in p
    # the chained-alias structure keeps the plan string linear in K
    assert len(p) < 200_000


def test_batched_signature_aggregate_plan_and_values_match_r14_form(spark):
    """r15: the flagship's 128 min-aggregates ride ONE array-valued
    F.expr instead of one expr per aggregate (a ~0.7 s driver-side
    construction saving at n=128, paid by every similarity query).  The
    optimized physical plan must be BYTE-IDENTICAL to the r14
    column-per-aggregate + array() projection form (modulo plan/expr
    ids) and the (sig, sh_set) values bit-equal — the batched text is a
    pure construction-cost change, not a plan change."""
    import re as _re

    from mapreduce_minhash_lsh_spark.functions.hashing import md5_id, md5_long
    from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
    from mapreduce_minhash_lsh_spark.operators.similarity import _sig_set_from_base

    cfg = registry.PIPELINE_CFG
    docs = load_table(spark, SF_SMALL, "documents")
    sh = explode_shingles(docs, cfg.k)
    base = sh.select(
        "doc_id",
        md5_id(F.col("shingle"), cfg.prime).alias("shingle_id"),
        md5_long(F.col("shingle")).alias("sid"),
    )

    def r14_form(base, cfg):
        aggs = [
            F.expr(f"min(({a} * shingle_id + {b}) % {cfg.prime})").alias(f"mh_{j}")
            for j, (a, b) in enumerate(cfg.hash_params())
        ]
        aggs.append(F.collect_set("sid").alias("sh_set"))
        return base.groupBy("doc_id").agg(*aggs).select(
            "doc_id",
            F.expr(
                "array(" + ",".join(f"mh_{j}" for j in range(cfg.num_hashes)) + ")"
            ).alias("sig"),
            "sh_set",
        )

    def r15_form(base, cfg):
        mins = ",".join(
            f"min(({a} * shingle_id + {b}) % {cfg.prime})"
            for a, b in cfg.hash_params()
        )
        return base.groupBy("doc_id").agg(
            F.expr(f"array({mins}) AS sig"), F.expr("collect_set(sid) AS sh_set")
        )

    def norm(df):
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        s = df._jdf.queryExecution().explainString(mode)
        s = _re.sub(r"#\d+L?", "#X", s)
        return _re.sub(r"plan_id=\d+", "plan_id=X", s)

    old_df, new_df = r14_form(base, cfg), r15_form(base, cfg)
    assert norm(old_df) == norm(new_df)
    key = lambda r: (r.doc_id, tuple(r.sig), tuple(sorted(r.sh_set)))  # noqa: E731
    assert sorted(map(key, old_df.collect())) == sorted(map(key, new_df.collect()))
