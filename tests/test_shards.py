"""Training-shard sink (sources/shards.py): deterministic layout,
manifest integrity, subset reads, tamper detection."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.shards import (
    read_training_shards,
    verify_training_shards,
    write_training_shards,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_shards_round_trip_and_manifest(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        spark, docs, path, key_col="doc_id", rows_per_shard=100
    )
    assert manifest["n_rows"] == docs.count()
    assert manifest["n_shards"] == 5
    assert sum(s["rows"] for s in manifest["shards"]) == manifest["n_rows"]
    # manifest on disk equals the returned one
    assert json.loads((tmp_path / "shards" / "manifest.json").read_text()) == manifest
    back = read_training_shards(spark, path)
    assert sorted(back.columns) == sorted(docs.columns)
    a = {tuple(r) for r in back.select(*sorted(back.columns)).collect()}
    b = {tuple(r) for r in docs.select(*sorted(docs.columns)).collect()}
    assert a == b
    assert verify_training_shards(spark, path)["ok"]


def test_shards_assignment_is_partitioning_invariant(spark, tmp_path):
    """Same input at different parallelism -> identical shard
    membership and fingerprints (md5 keys, associative fingerprint)."""
    docs = load_table(spark, SF_SMALL, "documents")
    m1 = write_training_shards(
        spark, docs.repartition(1), str(tmp_path / "a"), rows_per_shard=100
    )
    m2 = write_training_shards(
        spark, docs.repartition(17), str(tmp_path / "b"), rows_per_shard=100
    )
    assert m1["shards"] == m2["shards"]


def test_shards_subset_read_prunes(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(spark, docs, path, rows_per_shard=100)
    want = [0, 2]
    sub = read_training_shards(spark, path, shards=want)
    expect = sum(s["rows"] for s in manifest["shards"] if s["shard"] in want)
    assert sub.count() == expect
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan


def test_shards_tamper_detection(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    write_training_shards(spark, docs, path, rows_per_shard=100)
    # drop one shard directory wholesale
    import shutil

    shutil.rmtree(str(tmp_path / "shards" / "data" / "shard=1"))
    res = verify_training_shards(spark, path)
    assert not res["ok"]
    assert 1 in res["mismatched_shards"]


def test_shards_refuse_duplicate_keys(spark, tmp_path):
    """ADVICE r11: a duplicated key XOR-cancels out of the fingerprint
    (pairing it is indistinguishable from absence), so non-unique
    key_col must fail LOUDLY at write time, not blind the integrity
    check."""
    import pytest

    from mapreduce_minhash_lsh_spark.sources.shards import write_training_shards

    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    dup = docs.unionByName(docs.limit(5))
    with pytest.raises(ValueError, match="not unique"):
        write_training_shards(spark, dup, str(tmp_path / "dup"), rows_per_shard=100)
    # ADVICE r12: validation must run BEFORE the write — a refused sink
    # must not leave a committed-but-manifestless shard store behind.
    assert not (tmp_path / "dup" / "data").exists()
    assert not (tmp_path / "dup" / "manifest.json").exists()


def test_shards_manifest_has_md5_twin(spark, tmp_path):
    """The engine-portable md5 fingerprint twin rides the manifest next
    to the xxhash64 one, and verify checks both."""
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(spark, docs, path, rows_per_shard=200)
    for entry in manifest["shards"]:
        assert "fingerprint_md5" in entry and "fingerprint" in entry
        assert 0 <= entry["fingerprint_md5"] < (1 << 60)
    from mapreduce_minhash_lsh_spark.sources.shards import verify_training_shards

    assert verify_training_shards(spark, path)["ok"]
