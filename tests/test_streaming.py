"""Structured Streaming jobs drained with AvailableNow must equal their
batch twins on the static testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.plans.events import hourly_rollup, sessionize
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.sources.tables import load_table
from mapreduce_minhash_lsh_spark.streaming.jobs import (
    incremental_similar_pairs,
    streaming_dedup,
    streaming_hourly_rollup,
    streaming_hourly_users,
)
from tests.conftest import SF_SMALL


def test_streaming_hourly_equals_batch(spark):
    got = streaming_hourly_rollup(spark, SF_SMALL)
    batch = hourly_rollup(spark, SF_SMALL).drop("n_users")
    g = {(r.event_type, r.hour_epoch): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(r.event_type, r.hour_epoch): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b


def test_streaming_hourly_users_equals_batch_distinct(spark):
    """The HLL++ streaming variant restores the distinct-user column the
    plain streaming rollup must drop; at the default rsd=0.005 no group
    collides a register on this corpus, so the sketch lands on the exact
    count (rsd=0.02 under-counts four sf0.01 groups by one)."""
    got = streaming_hourly_users(spark, SF_SMALL)
    batch = hourly_rollup(spark, SF_SMALL)
    g = {(r.event_type, r.hour_epoch): (r.approx_users, r.n_events) for r in got.collect()}
    b = {(r.event_type, r.hour_epoch): (r.n_users, r.n_events) for r in batch.collect()}
    assert g == b


def test_streaming_dedup_keeps_each_id_once(spark):
    got = streaming_dedup(spark, SF_SMALL)
    n_ids = load_table(spark, SF_SMALL, "events").select("event_id").distinct().count()
    assert got.count() == n_ids
    assert got.select("event_id").distinct().count() == n_ids


def test_incremental_similar_pairs_equals_batch(spark):
    """The foreachBatch incremental pipeline must find the same pair SET
    as one batch run (same seeded config => same signatures/buckets;
    candidate generation is batch-order-independent because every
    cross/intra-batch bucket pair is considered)."""
    cfg = MinHashLSHConfig(num_hashes=32, num_bands=4)
    inc = incremental_similar_pairs(spark, SF_SMALL, cfg)
    batch = similar_pairs(load_table(spark, SF_SMALL, "documents"), cfg)
    inc_pairs = {(r.doc_id_a, r.doc_id_b) for r in inc.collect()}
    batch_pairs = {(r.doc_id_a, r.doc_id_b) for r in batch.collect()}
    assert inc_pairs == batch_pairs


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState closed sessions == batch sessions minus each
    user's final (still-open) session."""
    from mapreduce_minhash_lsh_spark.streaming.sessions import streaming_sessionize

    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in streaming_sessionize(spark, SF_SMALL).collect()
    }
    batch = sessionize(spark, SF_SMALL).collect()
    last_session = {}
    for r in batch:
        if r.user_id not in last_session or r.session_id > last_session[r.user_id]:
            last_session[r.user_id] = r.session_id
    expected = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in batch
        if r.session_id != last_session[r.user_id]
    }
    assert got == expected


def test_incremental_pairs_rerun_over_same_state_is_idempotent(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.config import GOLDEN
    from mapreduce_minhash_lsh_spark.streaming.jobs import incremental_similar_pairs

    state = str(tmp_path / "state")
    first = {
        (r.doc_id_a, r.doc_id_b)
        for r in incremental_similar_pairs(
            spark, SF_SMALL, GOLDEN, threshold=0.3, state_dir=state
        ).collect()
    }
    assert first
    # A second run over the SAME state_dir replays nothing (offsets are
    # committed in the checkpoint) and must not double-count: the
    # per-batch dynamic-partition writes are idempotent.
    second = {
        (r.doc_id_a, r.doc_id_b)
        for r in incremental_similar_pairs(
            spark, SF_SMALL, GOLDEN, threshold=0.3, state_dir=state
        ).collect()
    }
    assert second == first
