"""Sequence-packing invariants (operators/packing.py): total/disjoint
assignment, offset arithmetic, chunk-boundary semantics, and stability
under repartitioning — the properties a training job relies on when it
re-reads the packed layout on a different cluster."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_minhash_lsh_spark.operators.packing import (
    pack_sequences,
    whitespace_token_count,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE

CTX = 64
SHARDS = 4


@pytest.fixture(scope="module")
def packed(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    return pack_sequences(docs, ctx_len=CTX, n_shards=SHARDS).cache()


def test_every_nonempty_doc_assigned_exactly_once(spark, packed):
    docs = load_table(spark, SF_ORACLE, "documents")
    n_nonempty = docs.where(
        whitespace_token_count(F.col("text")) > 0
    ).count()
    assert packed.count() == n_nonempty
    assert packed.select("doc_id").distinct().count() == n_nonempty


def test_offsets_are_a_contiguous_token_stream(packed):
    # Within each shard, sorted by start_offset, each doc begins exactly
    # where the previous one ended: the shard is one gapless stream.
    rows = packed.orderBy("shard", "start_offset").collect()
    pos: dict[int, int] = {}
    for r in rows:
        expected = pos.get(r.shard, 0)
        assert r.start_offset == expected, (r.shard, r.doc_id)
        pos[r.shard] = expected + r.n_tokens


def test_chunk_id_is_start_offset_window(packed):
    bad = packed.where(
        F.col("chunk_id") != F.expr(f"start_offset div {CTX}")
    ).count()
    assert bad == 0
    # chunk-relative start position is always inside the context window
    bad = packed.where(
        (F.col("start_offset") - F.col("chunk_id") * CTX) >= CTX
    ).count()
    assert bad == 0


def test_assignment_invariant_under_repartitioning(spark, packed):
    docs = load_table(spark, SF_ORACLE, "documents").repartition(13, "lang")
    again = pack_sequences(docs, ctx_len=CTX, n_shards=SHARDS)
    diff = packed.exceptAll(again).count() + again.exceptAll(packed).count()
    assert diff == 0


def test_rejects_nonpositive_params(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(ValueError):
        pack_sequences(docs, ctx_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)


def test_greedy_packing_never_overflows_ctx(spark):
    from mapreduce_minhash_lsh_spark.operators.packing import pack_sequences_greedy

    docs = load_table(spark, SF_ORACLE, "documents")
    packed = pack_sequences_greedy(docs, ctx_len=CTX, n_shards=SHARDS).cache()
    fills = packed.groupBy("shard", "chunk_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n_docs")
    )
    # multi-doc chunks never exceed the budget; only a single oversized
    # document may overflow alone
    bad = fills.where((F.col("fill") > CTX) & (F.col("n_docs") > 1)).count()
    assert bad == 0
    # same doc set as boundary packing, chunk ids contiguous from 0
    docs_boundary = pack_sequences(docs, ctx_len=CTX, n_shards=SHARDS)
    assert packed.count() == docs_boundary.count()
    per_shard = packed.groupBy("shard").agg(
        F.max("chunk_id").alias("mx"),
        F.countDistinct("chunk_id").alias("nd"),
        F.min("chunk_id").alias("mn"),
    )
    assert per_shard.where(
        (F.col("mn") != 0) | (F.col("nd") != F.col("mx") + 1)
    ).count() == 0


def test_greedy_packing_invariant_under_repartitioning(spark):
    from mapreduce_minhash_lsh_spark.operators.packing import pack_sequences_greedy

    docs = load_table(spark, SF_ORACLE, "documents")
    a = pack_sequences_greedy(docs, ctx_len=CTX, n_shards=SHARDS)
    b = pack_sequences_greedy(
        docs.repartition(13, "lang"), ctx_len=CTX, n_shards=SHARDS
    )
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_greedy_packing_accepts_string_doc_ids(spark):
    """The applyInPandas output schema derives the id field's dtype from
    the input, so non-long (e.g. string URL) doc ids pack fine."""
    from mapreduce_minhash_lsh_spark.operators.packing import pack_sequences_greedy

    rows = [(f"doc-{i:04d}", "alpha beta gamma " * (i % 5 + 1)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    packed = pack_sequences_greedy(docs, ctx_len=16, n_shards=3)
    assert dict(packed.dtypes)["doc_id"] == "string"
    assert packed.count() == 60
    fills = packed.groupBy("shard", "chunk_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
    assert fills.where((F.col("fill") > 16) & (F.col("n") > 1)).count() == 0


def test_pack_sequences_equals_python_replay_on_random_docs(spark):
    """Seeded random corpus: the distributed packing equals a plain
    Python replay of the spec (md5 shard, (bucket, id) order, running
    offset, floor-div chunk) — independent of the parquet corpus the
    oracle checks."""
    import hashlib
    import random

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "", "delta epsilon", "zeta  eta theta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 6))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.shard, r.chunk_id, r.n_tokens, r.start_offset)
        for r in pack_sequences(docs, ctx_len=10, n_shards=3).collect()
    }

    def bucket(doc_id):
        return int(hashlib.md5(f"{doc_id}:42".encode()).hexdigest()[:15], 16) % 1_000_000

    import re

    sized = []
    for doc_id, text in rows:
        if not text:
            continue
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if toks:
            sized.append((bucket(doc_id) % 3, bucket(doc_id), doc_id, len(toks)))
    want = {}
    offsets = {}
    for shard, b, doc_id, n in sorted(sized):
        off = offsets.get(shard, 0)
        want[doc_id] = (shard, off // 10, n, off)
        offsets[shard] = off + n
    assert got == want
