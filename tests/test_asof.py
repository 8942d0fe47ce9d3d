"""As-of join semantics: backward match, inclusive ties, inner behavior."""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.operators.asof import asof_join


def test_asof_backward_inclusive_and_inner(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 10),   # matches right at 90
            (1, 50, 11),    # nothing at-or-before 50 -> dropped (inner)
            (1, 90, 12),    # exact-timestamp tie -> matches right at 90
            (2, 200, 20),   # matches right at 150, not user 1's rows
        ],
        ["user_id", "l_ts", "l_id"],
    )
    right = spark.createDataFrame(
        [(1, 90, 900), (1, 60, 600), (2, 150, 1500), (2, 300, 3000)],
        ["user_id", "r_ts", "r_id"],
    )
    got = {
        r.l_id: r.right_r_id
        for r in asof_join(
            left, right,
            key="user_id", left_ts="l_ts", right_ts="r_ts",
            right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
        ).collect()
    }
    assert got == {10: 900, 12: 900, 20: 1500}


def test_asof_picks_latest_of_equal_right_timestamps(spark):
    left = spark.createDataFrame([(1, 100, 1)], ["user_id", "l_ts", "l_id"])
    right = spark.createDataFrame(
        [(1, 90, 901), (1, 90, 902)], ["user_id", "r_ts", "r_id"]
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="l_ts", right_ts="r_ts",
        right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
    ).collect()
    assert [r.right_r_id for r in rows] == [902]  # higher tie id wins


def test_asof_null_payload_is_matched_not_stale(spark):
    """A matched right row whose payload is NULL must (a) be kept by the
    inner join and (b) NOT be papered over with an older right row's
    non-null payload."""
    left = spark.createDataFrame([(1, 100, 1)], ["user_id", "l_ts", "l_id"])
    right = spark.createDataFrame(
        [(1, 60, 600), (1, 90, None)], ["user_id", "r_ts", "r_id"]
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="l_ts", right_ts="r_ts",
        right_payload=["r_id"], left_tie="l_ts", right_tie="r_ts",
    ).collect()
    assert len(rows) == 1 and rows[0].right_r_id is None


def test_asof_mismatched_tie_types_raise(spark):
    import pytest

    left = spark.createDataFrame([(1, 100, "a")], ["user_id", "l_ts", "l_id"])
    right = spark.createDataFrame([(1, 90, 900)], ["user_id", "r_ts", "r_id"])
    with pytest.raises(ValueError, match="tie columns"):
        asof_join(
            left, right, key="user_id", left_ts="l_ts", right_ts="r_ts",
            right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
        )


def test_uniform_range_join_unaligned_wide_intervals(spark):
    """Intervals off the grid and wider than step must not lose matches."""
    from mapreduce_minhash_lsh_spark.operators.rangejoin import (
        range_join,
        uniform_range_join,
    )

    rows = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100)], ["rid", "v"]
    )
    ivs = spark.createDataFrame(
        [(7.5, 43.25, "wide"), (50.0, 50.5, "narrow"), (80.1, 99.9, "tail")],
        ["lo", "hi", "name"],
    )
    a = sorted((r.rid, r.name) for r in range_join(rows, ivs, "v").collect())
    b = sorted(
        (r.rid, r.name)
        for r in uniform_range_join(rows, ivs, "v", step=10.0).collect()
    )
    assert a == b and len(a) > 0


def test_uniform_range_join_equals_general(spark):
    from mapreduce_minhash_lsh_spark.operators.rangejoin import (
        range_join,
        uniform_range_join,
    )
    from mapreduce_minhash_lsh_spark.sources.tables import load_table

    parts = load_table(spark, "/root/testdata/sf0.001", "part")
    bands = spark.createDataFrame(
        [(float(lo), float(lo + 250), f"b{lo}") for lo in range(0, 2500, 250)],
        ["lo", "hi", "band"],
    )
    a = sorted(
        (r.p_partkey, r.band)
        for r in range_join(parts, bands, "p_retailprice").collect()
    )
    b = sorted(
        (r.p_partkey, r.band)
        for r in uniform_range_join(parts, bands, "p_retailprice", step=250.0).collect()
    )
    assert a == b and len(a) > 0


def test_asof_forward_inclusive_and_inner(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 10),   # matches right at 110 (earliest at-or-after)
            (1, 250, 11),   # nothing at-or-after 250 -> dropped (inner)
            (1, 110, 12),   # exact-timestamp tie -> matches right at 110
            (2, 100, 20),   # matches right at 150, not user 1's rows
        ],
        ["user_id", "l_ts", "l_id"],
    )
    right = spark.createDataFrame(
        [(1, 110, 1100), (1, 200, 2000), (2, 150, 1500), (2, 90, 900)],
        ["user_id", "r_ts", "r_id"],
    )
    got = {
        r.l_id: r.right_r_id
        for r in asof_join(
            left, right,
            key="user_id", left_ts="l_ts", right_ts="r_ts",
            right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
            direction="forward",
        ).collect()
    }
    assert got == {10: 1100, 12: 1100, 20: 1500}


def test_asof_forward_picks_earliest_of_equal_right_timestamps(spark):
    left = spark.createDataFrame([(1, 100, 1)], ["user_id", "l_ts", "l_id"])
    right = spark.createDataFrame(
        [(1, 110, 901), (1, 110, 902)], ["user_id", "r_ts", "r_id"]
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="l_ts", right_ts="r_ts",
        right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
        direction="forward",
    ).collect()
    # the reversed scan carries the LAST right row it passed: the
    # smallest tie among equal timestamps
    assert [r.right_r_id for r in rows] == [901]


def test_asof_rejects_unknown_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, 1)], ["user_id", "l_ts", "l_id"])
    with pytest.raises(ValueError):
        asof_join(
            left, left, key="user_id", left_ts="l_ts", right_ts="l_ts",
            right_payload=["l_id"], direction="sideways",
        )


def test_interval_overlap_join_equals_naive(spark):
    """Seeded random intervals: the grid-bucketed overlap join must
    produce exactly the naive cross-join-filter pair set, for step
    sizes smaller, comparable, and larger than the interval widths."""
    import random

    from pyspark.sql import functions as F

    from mapreduce_minhash_lsh_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(7)
    rows_a, rows_b = [], []
    for i in range(120):
        lo = rng.randint(-500, 500)
        rows_a.append((i, lo, lo + rng.randint(0, 80)))
    for j in range(90):
        lo = rng.randint(-500, 500)
        rows_b.append((j, lo, lo + rng.randint(0, 120)))
    a = spark.createDataFrame(rows_a, ["a_id", "a_lo", "a_hi"])
    b = spark.createDataFrame(rows_b, ["b_id", "b_lo", "b_hi"])
    naive = {
        (ra[0], rb[0])
        for ra in rows_a
        for rb in rows_b
        if ra[1] <= rb[2] and rb[1] <= ra[2]
    }
    for step in (7, 64, 1000):
        got = {
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_lo", "a_hi", "b_lo", "b_hi", step=step
            ).collect()
        }
        assert got == naive, f"step={step}"


def test_interval_overlap_join_nanosecond_epochs(spark):
    """Values beyond 2^53 (nanosecond epochs): bucket ids must come from
    exact integer floor division — double-based floor(col/step) is
    inexact there and the exact-bucket-equality dedup can then drop or
    duplicate a pair."""
    import random

    from mapreduce_minhash_lsh_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = 1_700_000_000_000_000_000  # ~2023 in ns, well beyond 2^53
    rng = random.Random(13)
    rows_a, rows_b = [], []
    for i in range(60):
        lo = base + rng.randint(0, 10_000)
        rows_a.append((i, lo, lo + rng.randint(0, 800)))
    for j in range(60):
        lo = base + rng.randint(0, 10_000)
        rows_b.append((j, lo, lo + rng.randint(0, 800)))
    a = spark.createDataFrame(rows_a, "a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame(rows_b, "b_id long, b_lo long, b_hi long")
    naive = sorted(
        (ra[0], rb[0])
        for ra in rows_a
        for rb in rows_b
        if ra[1] <= rb[2] and rb[1] <= ra[2]
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", step=512
        ).collect()
    )
    # sorted lists (not sets) so a double-emitted pair also fails
    assert got == naive


def test_asof_join_equals_naive_both_directions(spark):
    """Seeded random events: both as-of directions must equal the naive
    per-row scan (backward: max (ts, tie) right at-or-before; forward:
    min (ts, tie) right at-or-after)."""
    import random

    rng = random.Random(11)
    lefts = [
        (rng.randint(1, 5), rng.randint(0, 200), i) for i in range(150)
    ]
    rights = [
        (rng.randint(1, 5), rng.randint(0, 200), 1000 + j) for j in range(100)
    ]
    left = spark.createDataFrame(lefts, ["k", "l_ts", "l_id"])
    right = spark.createDataFrame(rights, ["k", "r_ts", "r_id"])

    def naive(direction):
        out = {}
        for k, lts, lid in lefts:
            if direction == "backward":
                cand = [(rts, rid) for rk, rts, rid in rights if rk == k and rts <= lts]
                if cand:
                    out[lid] = max(cand)[1]
            else:
                cand = [(rts, rid) for rk, rts, rid in rights if rk == k and rts >= lts]
                if cand:
                    out[lid] = min(cand)[1]
        return out

    for direction in ("backward", "forward"):
        got = {
            r.l_id: r.right_r_id
            for r in asof_join(
                left, right, key="k", left_ts="l_ts", right_ts="r_ts",
                right_payload=["r_id"], left_tie="l_id", right_tie="r_id",
                direction=direction,
            ).collect()
        }
        assert got == naive(direction), direction
