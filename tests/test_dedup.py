"""Connected-component semantics of near_dup_groups: equivalence with a
plain union-find, and the pointer-jumping convergence bound (O(log D)
rounds on chains instead of O(D))."""

from __future__ import annotations

import random

from mapreduce_minhash_lsh_spark.operators.dedup import near_dup_groups


def _union_find_groups(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


def test_long_chain_converges_within_log_rounds(spark):
    """A 300-edge chain has diameter 300: plain min-label propagation
    needs ~300 rounds, pointer jumping ~log2(300)+slack.  max_iter=16
    would raise without the jump step."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_id_a long, doc_id_b long"
    )
    labels = near_dup_groups(edges, max_iter=16).collect()
    assert len(labels) == 301
    assert all(r.group_id == 0 for r in labels)


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find_groups(edges)
    got = {
        r.doc_id: r.group_id
        for r in near_dup_groups(
            spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
        ).collect()
    }
    assert got == want


def test_empty_inputs_flow_through(spark):
    """An empty corpus (or an empty edge list) must produce empty output,
    not an error — partitions of a 100 TB run routinely see zero rows."""
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        cross_corpus_pairs,
        similar_pairs,
    )
    from mapreduce_minhash_lsh_spark.registry import PIPELINE_CFG

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert similar_pairs(empty_docs, PIPELINE_CFG).count() == 0
    assert cross_corpus_pairs(empty_docs, empty_docs, PIPELINE_CFG).count() == 0
    empty_edges = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    assert near_dup_groups(empty_edges).count() == 0
