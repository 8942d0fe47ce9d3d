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
) -> DataFrame:
    """left columns + ``right_payload`` columns from the latest right row
    at-or-before each left row's timestamp (inner: left rows with nothing
    earlier on the right are dropped).

    Determinism: rows order by (_ts, _side, _tie).  At equal timestamps
    the right row sorts BEFORE the left row (side 0 < 1), so a right
    event exactly at the left timestamp matches; ``left_tie`` /
    ``right_tie`` (default: the ts column itself) break remaining ties —
    pass a unique id column whenever timestamps can collide within a key.
    """
    left_tie = left_tie or left_ts
    right_tie = right_tie or right_ts
    l_cols = [c for c in left.columns if c != key]
    tagged_l = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.col(left_tie).cast("long").alias("_tie"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_payload
        ],
    )
    tagged_r = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.col(right_tie).cast("long").alias("_tie"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in l_cols
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_payload
        ],
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(
            F.col(key),
            *[F.col(f"_l_{c}").alias(c) for c in l_cols],
            *[F.col(f"_m_{c}").alias(f"right_{c}") for c in right_payload],
        )
        .where(F.col(f"right_{right_payload[0]}").isNotNull())
    )
