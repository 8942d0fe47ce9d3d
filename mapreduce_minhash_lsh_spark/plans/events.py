"""Time-series analytics over the events table.

All bucketing/gap arithmetic is done on integer epochs (unix seconds /
microseconds), never on session-timezone-dependent calendar functions,
so results are identical on any driver configuration and match the
naive-UTC parquet data exactly.  The streaming variants of these live in
``streaming/`` (same logic via Structured Streaming windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.tables import load_table

SESSION_GAP_US = 1_800 * 1_000_000  # 30 min


def hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1h windows per event type: counts, distinct users, exact sum."""
    e = load_table(spark, sf, "events")
    # floor division, not `div` (which truncates toward zero): pre-1970
    # timestamps must land in the same bucket as DuckDB's `//` and the
    # streaming window twin.  (ts_us - pmod) is an exact multiple of the
    # divisor and < 2^53, so the double division is exact.
    us_per_hour = F.lit(3_600_000_000)
    hour = (
        ((F.col("ts_us") - F.pmod(F.col("ts_us"), us_per_hour)) / us_per_hour)
        .cast("long") * 3600
    )
    return (
        e.groupBy("event_type", hour.alias("hour_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("sum_value"),
        )
    )


def sessionize(spark: SparkSession, sf: str, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min idle.

    Classic two-window formulation (lag -> boundary flag -> running sum);
    both windows share one hash-partition-by-user shuffle — Catalyst plans
    a single Exchange.  Scale note: state per user is one row ordering,
    no driver involvement; skewed power-users are bounded by their own
    event counts.
    """
    e = load_table(spark, sf, "events").select(
        "user_id", "event_id", F.col("ts_us").alias("us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id", "event_id", "us", "value",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0).alias("is_new"),
    )
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select(
        "user_id", "us", "value", F.sum("is_new").over(run).alias("session_id")
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("sum_value"),
        )
    )


def event_type_shares(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type share of total events — scalar-subquery/window-total shape."""
    e = load_table(spark, sf, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("n_events"))
    total = Window.partitionBy()
    return counts.select(
        "event_type",
        "n_events",
        (F.col("n_events").cast("double") / F.sum("n_events").over(total)).alias("share"),
    )


def user_value_moving_avg(spark: SparkSession, sf: str, frame: int = 3) -> DataFrame:
    """Per-user trailing moving average of event value over the last
    ``frame`` events (ROWS frame, ordered by event time with event_id as
    the tie-break).  Exact-decimal sum over the frame so the average is
    bit-identical across engines and partitionings."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(frame - 1), 0)
    )
    msum = F.sum(F.col("value").cast("decimal(38,6)")).over(w)
    mcnt = F.count("*").over(w)
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        (msum.cast("double") / mcnt).alias("moving_avg"),
    )


def funnel_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: users reaching each
    stage IN ORDER (a click only counts after the user's first view; a
    purchase only after that first qualifying click).  Three tiny
    per-user aggregates chained by time joins — integer-epoch exact.
    """
    e = load_table(spark, sf, "events").select("user_id", "event_type", "ts_us")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_us") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_us") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_view_click_purchase")))
    )
