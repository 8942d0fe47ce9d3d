"""As-of (point-in-time) join — an operator Spark's built-in join set
lacks, composed from union + ordered window (no UDF, no state).

For each left row, attach the most recent right row with the same key
whose timestamp is <= the left timestamp.  The classic scalable
formulation: tag both inputs, union them, and carry the right side's
payload forward with ``last(..., ignorenulls=True)`` over a per-key
time-ordered window — one shuffle on the key, no range explosion, skew
bounded per key.  (A backward as-of join; TimescaleDB/kdb semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    left_tie: str | None = None,
    right_tie: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """left columns + ``right_payload`` columns from the latest right row
    at-or-before each left row's timestamp (``direction="backward"``,
    the default) or the EARLIEST right row at-or-after it
    (``direction="forward"``).  Inner semantics: left rows with no
    matching-side right row are dropped.

    Determinism: rows order by (_ts, _side, _tie) — time-reversed for
    the forward direction, which is the same carried-last scan walked
    from the future.  At equal timestamps the right row sorts BEFORE
    the left row (side 0 < 1) in either direction, so a right event
    exactly at the left timestamp matches; ``left_tie`` / ``right_tie``
    (default: the ts column itself) break remaining ties — pass a
    unique id column whenever timestamps can collide within a key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_tie = left_tie or left_ts
    right_tie = right_tie or right_ts
    lt_type = left.schema[left_tie].dataType
    rt_type = right.schema[right_tie].dataType
    if lt_type != rt_type:
        raise ValueError(
            f"asof_join tie columns must have identical types to order the "
            f"unioned stream: {left_tie}:{lt_type.simpleString()} vs "
            f"{right_tie}:{rt_type.simpleString()}"
        )
    from pyspark.sql.types import StructField, StructType

    l_cols = [c for c in left.columns if c != key]
    # The whole right payload rides in ONE struct: a right row's struct is
    # non-null even when every field inside is null, so (a) the carried
    # last(ignorenulls) can never splice a STALE field value from an older
    # right row over the latest row's legitimate NULL, and (b) struct
    # null-ness is an exact "was there any earlier right row" marker —
    # "no match" and "matched, payload NULL" stay distinct.
    pay_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_payload]
    )
    tagged_l = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.col(left_tie).alias("_tie"),
        F.lit(None).cast(pay_type).alias("_r_pay"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    tagged_r = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.col(right_tie).alias("_tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r_pay"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in l_cols
        ],
    )
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tie").desc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*", F.last("_r_pay", ignorenulls=True).over(w).alias("_m_pay")
    )
    return (
        carried.where(F.col("_side") == 1)
        .where(F.col("_m_pay").isNotNull())
        .select(
            F.col(key),
            *[F.col(f"_l_{c}").alias(c) for c in l_cols],
            *[F.col("_m_pay")[c].alias(f"right_{c}") for c in right_payload],
        )
    )
