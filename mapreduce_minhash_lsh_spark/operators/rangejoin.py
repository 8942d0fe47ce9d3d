"""Range (interval) join: match rows to [lo, hi) intervals.

Spark has no dedicated range-join operator (Databricks' runtime adds
hints; OSS plans non-equi joins as BroadcastNestedLoopJoin).  Two
formulations:

  * ``range_join`` — general: broadcast the (small) interval table and
    join on the non-equi predicate.  Correct for arbitrary intervals;
    cost = |rows| x |intervals| comparisons, fine while intervals fit a
    broadcast and number in the thousands.
  * ``uniform_range_join`` — scale path when intervals form a uniform
    grid: compute the bucket index arithmetically and equi-join on it —
    a hash join, no nested loop, no comparison blowup.  (The same trick
    that turns the LSH band join and price_histogram into equi-joins.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    rows: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """rows ⨝ intervals on lo <= value < hi (intervals broadcast)."""
    pred = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return rows.join(F.broadcast(intervals), pred)


def uniform_range_join(
    rows: DataFrame,
    intervals: DataFrame,
    value_col: str,
    step: float,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Equi-join formulation on a bucket grid of width ``step``.

    Each interval is exploded over EVERY bucket it overlaps
    (``sequence(bucket(lo), bucket(hi))``), so results are complete for
    arbitrary intervals — not just grid-aligned ones no wider than
    ``step``; a value in a later bucket than ``bucket(lo)`` still meets
    its interval.  The exact predicate re-applied after the equi-join
    removes the boundary over-replication (``bucket(hi)`` when ``hi`` is
    exactly grid-aligned).  Replication factor per interval is
    ~width/step + 1 — choose ``step`` near the typical interval width.
    """
    bucket = lambda c: F.floor(c / F.lit(step)).cast("long")  # noqa: E731
    r = rows.withColumn("_bucket", bucket(F.col(value_col)))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket(F.col(lo_col)), bucket(F.col(hi_col)))),
    )
    return (
        r.join(F.broadcast(iv), "_bucket")
        .where(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str, a_hi: str,
    b_lo: str, b_hi: str,
    step: int,
    extra_pred: F.Column | None = None,
) -> DataFrame:
    """Interval-vs-interval join: every (a, b) pair whose [lo, hi] ranges
    overlap (inclusive) — the third range-join kind after point-in-grid
    and point-in-broadcast-interval.

    Scale formulation: both sides explode onto a bucket grid of width
    ``step`` and hash-equi-join on the bucket — no broadcast, no nested
    loop, works when BOTH interval tables are large.  A pair co-occupies
    every bucket its overlap spans; it is emitted exactly once, in the
    bucket where the LATER interval starts (``max(bucket(a_lo),
    bucket(b_lo))``) — an arithmetic dedup, no ``distinct`` shuffle.
    The exact overlap predicate is re-applied after the join, so results
    are exact for any interval shapes; choose ``step`` near the typical
    interval length (replication/interval ~ width/step + 1).

    Column names of ``a`` and ``b`` must be disjoint; ``extra_pred``
    (e.g. different-user) is applied with the overlap test.
    """
    # Exact integer floor division: F.floor(col / step) goes through a
    # double and is inexact beyond 2^53 (nanosecond-epoch intervals),
    # which would break the exact-bucket-equality dedup below.  pmod
    # makes the numerator an exact multiple of step, so integer `div`
    # (which truncates toward zero) equals true floor for any sign.
    bucket = lambda c: F.expr(  # noqa: E731
        f"((`{c}` - pmod(`{c}`, {int(step)})) div {int(step)})"
    ).cast("long")
    ea = a.withColumn("_bucket", F.explode(F.sequence(bucket(a_lo), bucket(a_hi))))
    eb = b.withColumn("_bucket", F.explode(F.sequence(bucket(b_lo), bucket(b_hi))))
    out = (
        ea.join(eb, "_bucket")
        .where((F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi)))
        .where(F.col("_bucket") == F.greatest(bucket(a_lo), bucket(b_lo)))
        .drop("_bucket")
    )
    return out.where(extra_pred) if extra_pred is not None else out
