"""Events + streaming: tumbling/sliding windows, sessionization,
funnels, retention, as-of joins, stream-stream joins, anomalies.
"""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    F,
    Window,
    load_table,
    register,
)
from mapreduce_minhash_lsh_spark.queries._shared import (  # noqa: F401
    _events,
)



# --------------------------------------------------------------------------
# Events: tumbling-window rollup, sessionization, shares (all integer-epoch
# based -> timezone-independent)
# --------------------------------------------------------------------------

register(
    "events_hourly",
    """SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type, (epoch_us(ts) // 3600000000) * 3600""",
)(_events.hourly_rollup)

register(
    "events_sessionize",
    f"""WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_events.SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT user_id, us, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, session_id""",
)(_events.sessionize)

register(
    "event_type_shares",
    """WITH counts AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type)
SELECT event_type, n_events,
       CAST(n_events AS DOUBLE) / SUM(n_events) OVER () AS share
FROM counts""",
)(_events.event_type_shares)


@register(
    "streaming_events_hourly",
    """SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type, (epoch_us(ts) // 3600000000) * 3600""",
)
def q_streaming_events_hourly(spark, sf):
    """Structured Streaming tumbling-window rollup drained with
    AvailableNow.  On a static source the drained stream is
    value-identical to the batch rollup (exact decimal sums, tumbling
    windows == epoch-hour buckets), so the batch SQL IS the oracle —
    the streaming path gets a full hash gate, not a rows-only check."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_hourly_rollup

    return streaming_hourly_rollup(spark, sf)


@register(
    "streaming_hourly_users",
    """SELECT event_type,
       (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type, (epoch_us(ts) // 3600000000) * 3600""",
)
def q_streaming_hourly_users(spark, sf):
    """Streaming tumbling-window distinct users via HLL++ — the sketch
    whose state is streaming-legal where exact distinct is not.  The
    oracle is the EXACT batch distinct count: at rsd=0.005 every
    per-(type,hour) group is register-collision-free on this corpus, so
    the sketch lands on truth (a live accuracy gate; rsd=0.02 under-
    counts four sf0.01 groups by one — see streaming/jobs.py)."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import streaming_hourly_users

    return streaming_hourly_users(spark, sf)


# --------------------------------------------------------------------------
# Sketches: approximate distinct counts / quantiles (rows-only — sketch
# internals differ across engines by design; accuracy bounds are asserted
# against exact twins in tests/test_sketches.py)
# --------------------------------------------------------------------------

# Both sketch queries carry FULL oracles: on this corpus the sketches land
# exactly on the true values, deterministically, so the driver's hash
# compare is a live accuracy gate rather than a rows-only check.
#   * approx_count_distinct(rsd=0.02) uses 2^12 registers; per-type user
#     cardinality here sits in the linear-counting regime where the
#     estimate equals the exact count (verified at sf0.001 and sf0.01).
#   * percentile_approx(accuracy=10000) has rank error <= n/10000; with
#     ~400 rows per distinct quantity value the error never crosses a
#     value boundary, so it equals DuckDB's exact quantile_disc.
# Statistical bounds across arbitrary data remain asserted in
# tests/test_sketches.py.

register(
    "events_users_hll",
    """SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type""",
)(
    lambda spark, sf: load_table(spark, sf, "events")
    .groupBy("event_type")
    .agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
)


# --------------------------------------------------------------------------
# Semi-structured (JSON) extraction + correlated-subquery shape
# --------------------------------------------------------------------------

register(
    "events_json_extract",
    """SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type""",
)(
    lambda spark, sf: load_table(spark, sf, "events")
    .groupBy("event_type")
    .agg(
        F.count("*").alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.max(F.get_json_object("props", "$.k").cast("long")).alias("max_k"),
    )
)


@register(
    "purchases_with_last_view",
    """WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS _ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS _side,
         event_id AS _tie,
         CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
         CASE WHEN event_type = 'purchase' THEN value END AS p_value,
         -- whole payload in ONE struct, non-null for every view row even
         -- if a field inside is null — mirrors operators/asof.py exactly
         -- (no per-column IGNORE NULLS splicing of stale values)
         CASE WHEN event_type = 'view'
              THEN struct_pack(v_id := event_id, v_ts := epoch_us(ts)) END AS pay
  FROM events WHERE event_type IN ('purchase', 'view')
),
carried AS (
  SELECT user_id, _side, p_id, p_value,
         last_value(pay IGNORE NULLS) OVER w AS m_pay,
         _ts AS purchase_ts_us
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _side, _tie
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, p_id AS purchase_event_id, purchase_ts_us, p_value AS purchase_value,
       (m_pay).v_id AS view_event_id, (m_pay).v_ts AS view_ts_us
FROM carried
WHERE _side = 1 AND m_pay IS NOT NULL""",
)
def q_purchases_with_last_view(spark, sf):
    """As-of join (operators/asof.py): each purchase matched to the same
    user's most recent preceding view — the point-in-time lookup Spark
    has no built-in operator for, composed as union + ordered window."""
    from mapreduce_minhash_lsh_spark.operators.asof import asof_join

    e = load_table(spark, sf, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("ts_us").alias("view_ts_us"),
    )
    return asof_join(
        purchases, views,
        key="user_id",
        left_ts="purchase_ts_us", right_ts="view_ts_us",
        right_payload=["view_event_id", "view_ts_us"],
        left_tie="purchase_event_id", right_tie="view_event_id",
    ).select(
        "user_id", "purchase_event_id", "purchase_ts_us", "purchase_value",
        F.col("right_view_event_id").alias("view_event_id"),
        F.col("right_view_ts_us").alias("view_ts_us"),
    )


@register(
    "events_session_window",
    """WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
b AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e),
s AS (SELECT user_id, us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM b)
SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid""",
)
def q_events_session_window(spark, sf):
    """Native ``session_window`` sessionization (30-min gap) — the
    built-in operator twin of the lag-based plans/events.sessionize
    (which remains for engines/queries needing explicit session ids).
    Two events merge iff the later starts before the earlier's
    window end (gap strictly less than 30 min), which the oracle
    mirrors as a >=-gap break flag.  One shuffle on user_id."""
    e = load_table(spark, sf, "events").withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )
    return (
        e.groupBy(
            F.session_window("event_time", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.min("ts_us").cast("long").alias("start_us"),
            F.max("ts_us").cast("long").alias("end_us"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select("user_id", "start_us", "end_us", "n_events")
    )


@register(
    "events_moving_avg",
    """SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
)
def q_events_moving_avg(spark, sf):
    """Trailing 3-event moving average per user (plans/events.py:
    user_value_moving_avg): ROWS window frame with event_id tie-break;
    exact-decimal frame sum so both engines agree bit-for-bit."""
    return _events.user_value_moving_avg(spark, sf)


@register(
    "events_funnel",
    """WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_ts
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_ts
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_purchase""",
)
def q_events_funnel(spark, sf):
    """Ordered conversion funnel (plans/events.py:funnel_counts):
    view -> click -> purchase with strict temporal ordering per user."""
    return _events.funnel_counts(spark, sf)


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_daily",
    f"""SELECT (epoch_us(ts) // 86400000000) AS day,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _PIVOT_TYPES)}
FROM events
GROUP BY (epoch_us(ts) // 86400000000)""",
)
def q_events_pivot_daily(spark, sf):
    """Wide daily event-type matrix via the DataFrame ``pivot()`` API
    with an EXPLICIT value list — without it Spark runs an extra
    distinct scan to discover the columns and the output schema becomes
    data-dependent (both wrong at 100 TB).  Oracle = conditional
    aggregation, the relational equivalent."""
    e = load_table(spark, sf, "events")
    # floor division, not `div` (truncates toward zero): pre-1970
    # timestamps must bucket like DuckDB's `//` — same rule as
    # plans/events.py:hourly_rollup.
    us_per_day = F.lit(86_400_000_000)
    day = (
        (F.col("ts_us") - F.pmod(F.col("ts_us"), us_per_day)) / us_per_day
    ).cast("long")
    wide = (
        e.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
    )
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    )


# --------------------------------------------------------------------------
# Stream-stream interval join (streaming/jobs.py) — the last Structured
# Streaming join pattern: watermarked view->click attribution.
# --------------------------------------------------------------------------


@register(
    "streaming_view_clicks",
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
       CAST(epoch_us(v.ts) AS BIGINT) AS view_ts_us,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR""",
)
def q_streaming_view_clicks(spark, sf):
    """Watermarked stream-stream interval join, drained with AvailableNow
    and compared against the identical batch interval join in DuckDB.
    The time-range predicate + watermarks bound the buffered state (a
    view is evicted once no future click can land in its window), which
    is what makes the join runnable indefinitely — see
    streaming/jobs.py:streaming_view_click_join."""
    from mapreduce_minhash_lsh_spark.streaming.jobs import (
        streaming_view_click_join,
    )

    # 8 state stores: sized to the driver/bench corpus (stateful
    # per-store overhead dominates at this scale); production sizes
    # this to cluster parallelism — see the operator docstring.
    return streaming_view_click_join(spark, sf, state_partitions=8)


@register(
    "events_retention_cohorts",
    """WITH d AS (
  SELECT user_id, (epoch_us(ts) // 86400000000) AS day
  FROM events
),
first_day AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day, CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM d JOIN first_day f USING (user_id)
GROUP BY f.cohort_day, d.day - f.cohort_day""",
)
def q_events_retention_cohorts(spark, sf):
    """Retention-cohort matrix: users grouped by their first active day,
    counted distinct on each subsequent day offset — the standard
    engagement rollup.  SINGLE-PASS (r15, guide §2.4): cohort_day is a
    min() WINDOW over the user_id partition (unbounded frame — no sort
    needed beyond the window's own, and no second consumer of the
    events relation), where the r14 form aggregated first days and
    joined back — one extra join (and at scale, when the scan is not
    pre-partitioned by user_id, a second full exchange of the events
    relation feeding it).  cohort_day per user is identical either way,
    so the (cohort_day, day_offset, count distinct user) rollup — and
    the DuckDB oracle — are unchanged.  Epoch-day integer buckets keep
    both engines exact, pre-1970 included (pmod floor rule, same as
    events_pivot_daily)."""
    e = load_table(spark, sf, "events")
    us_per_day = F.lit(86_400_000_000)
    day = (
        (F.col("ts_us") - F.pmod(F.col("ts_us"), us_per_day)) / us_per_day
    ).cast("long")
    d = e.select("user_id", day.alias("day"))
    cohort = F.min("day").over(Window.partitionBy("user_id"))
    return (
        d.select("user_id", "day", cohort.alias("cohort_day"))
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "events_trailing_hour_stats",
    """SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def q_events_trailing_hour_stats(spark, sf):
    """Trailing ONE-HOUR window per user — a RANGE frame over event-time
    microseconds, the value-based twin of events_moving_avg's ROWS
    frame (a row's frame spans whatever number of events fell in the
    last hour, ties included).  One shuffle on user_id; the frame sum
    is an exact decimal so both engines agree bit-for-bit."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count("*").over(w).cast("long").alias("n_trailing_hour"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
        .alias("sum_trailing_hour"),
    )


@register(
    "purchases_with_next_view",
    """WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS _ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS _side,
         event_id AS _tie,
         CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
         CASE WHEN event_type = 'purchase' THEN value END AS p_value,
         CASE WHEN event_type = 'view'
              THEN struct_pack(v_id := event_id, v_ts := epoch_us(ts)) END AS pay
  FROM events WHERE event_type IN ('purchase', 'view')
),
carried AS (
  SELECT user_id, _side, p_id, p_value,
         last_value(pay IGNORE NULLS) OVER w AS m_pay,
         _ts AS purchase_ts_us
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts DESC, _side ASC, _tie DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, p_id AS purchase_event_id, purchase_ts_us, p_value AS purchase_value,
       (m_pay).v_id AS view_event_id, (m_pay).v_ts AS view_ts_us
FROM carried
WHERE _side = 1 AND m_pay IS NOT NULL""",
)
def q_purchases_with_next_view(spark, sf):
    """FORWARD as-of join (operators/asof.py, direction='forward'):
    each purchase matched to the same user's EARLIEST view at-or-after
    it — the time-reversed twin of purchases_with_last_view, same
    union + carried-window plan walked from the future."""
    from mapreduce_minhash_lsh_spark.operators.asof import asof_join

    e = load_table(spark, sf, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("ts_us").alias("view_ts_us"),
    )
    return asof_join(
        purchases, views,
        key="user_id",
        left_ts="purchase_ts_us", right_ts="view_ts_us",
        right_payload=["view_event_id", "view_ts_us"],
        left_tie="purchase_event_id", right_tie="view_event_id",
        direction="forward",
    ).select(
        "user_id", "purchase_event_id", "purchase_ts_us", "purchase_value",
        F.col("right_view_event_id").alias("view_event_id"),
        F.col("right_view_ts_us").alias("view_ts_us"),
    )


@register(
    "concurrent_sessions",
    """WITH d AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
flagged AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
              OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s2 AS (SELECT user_id, us,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       FROM flagged),
sess AS (SELECT user_id, CAST(MIN(us) AS BIGINT) AS lo, CAST(MAX(us) AS BIGINT) AS hi
         FROM s2 GROUP BY user_id, sid)
SELECT a.user_id AS user_a, a.lo AS lo_a, b.user_id AS user_b, b.lo AS lo_b,
       CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT) AS overlap_us
FROM sess a JOIN sess b
  ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id < b.user_id""",
)
def q_concurrent_sessions(spark, sf):
    """Interval-overlap self-join (operators/rangejoin.py:
    interval_overlap_join): which users' 30-min-gap sessions overlapped
    in wall-clock time, with the shared duration.  Sessions come from
    the same lag/running-sum plan as events_sessionize; the overlap
    join buckets both sides onto a 1-hour grid and equi-joins — no
    broadcast, no nested loop, one arithmetic dedup — so it scales to
    two LARGE interval tables.  All integers: engine-exact."""
    from mapreduce_minhash_lsh_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    from mapreduce_minhash_lsh_spark.plans.events import sessionize

    s = sessionize(spark, sf).select(
        "user_id",
        F.col("start_us").cast("long").alias("lo"),
        F.col("end_us").cast("long").alias("hi"),
    )
    a = s.select(
        F.col("user_id").alias("user_a"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = s.select(
        F.col("user_id").alias("user_b"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    out = interval_overlap_join(
        a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        step=3_600_000_000,
        extra_pred=F.col("user_a") < F.col("user_b"),
    )
    return out.select(
        "user_a", "lo_a", "user_b", "lo_b",
        (F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")).cast("long")
        .alias("overlap_us"),
    )


@register(
    "events_sliding_windows",
    """SELECT w_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type, value,
         (epoch_us(ts) // 1800000000 - s) * 1800 AS w_start
  FROM events, (SELECT unnest([0, 1]) AS s)
)
GROUP BY w_start, event_type""",
)
def q_events_sliding_windows(spark, sf):
    """SLIDING 1-hour windows every 30 minutes per event type — each
    event lands in exactly two windows (the two half-hour slots its
    timestamp covers as a start).  Batch twin of the streaming
    ``window(..., '1 hour', '30 minutes')`` semantics, expressed as an
    explicit 2-element slide explode so the oracle reproduces every
    window assignment exactly; epoch-second window starts, exact
    decimal sums."""
    e = load_table(spark, sf, "events")
    us_per_slot = F.lit(1_800_000_000)
    slot = (
        (F.col("ts_us") - F.pmod(F.col("ts_us"), us_per_slot)) / us_per_slot
    ).cast("long")
    s = F.explode(F.array(F.lit(0), F.lit(1))).alias("s")
    ex = e.select("event_type", "value", slot.alias("slot"), s)
    return (
        ex.groupBy(
            ((F.col("slot") - F.col("s")) * 1800).alias("w_start"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "user_lifetime_profile",
    """SELECT user_id,
       CAST(MIN(epoch_us(ts) // 86400000000) AS BIGINT) AS first_day,
       CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT) AS last_day,
       CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id""",
)
def q_user_lifetime_profile(spark, sf):
    """Per-user lifetime rollup: first/last active epoch-day, distinct
    active days, event count, exact value total — the profile table
    every engagement analysis starts from.  One shuffle on user_id;
    COUNT(DISTINCT day) expands to the standard two-phase distinct
    aggregate."""
    e = load_table(spark, sf, "events")
    us_per_day = F.lit(86_400_000_000)
    day = (
        (F.col("ts_us") - F.pmod(F.col("ts_us"), us_per_day)) / us_per_day
    ).cast("long")
    return (
        e.select("user_id", day.alias("day"), "value")
        .groupBy("user_id")
        .agg(
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.countDistinct("day").cast("long").alias("active_days"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double")
            .alias("total_value"),
        )
    )


@register(
    "user_first_last_event",
    """SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       first_value(epoch_us(ts)) OVER w AS first_ts_us,
       last_value(epoch_us(ts)) OVER w AS last_ts_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def q_user_first_last_event(spark, sf):
    """first_value/last_value over an unbounded frame with an event_id
    tie-break — each user's entry and exit event in one windowed pass
    (the frame must be explicitly unbounded: last_value's default frame
    ends at CURRENT ROW and silently returns the current row).  One
    user_id shuffle; DISTINCT collapses the per-event rows to one per
    user."""
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.first("ts_us").over(w).alias("first_ts_us"),
            F.last("ts_us").over(w).alias("last_ts_us"),
        )
        .distinct()
    )


@register(
    "events_debounce",
    """SELECT event_id, user_id, event_type, ts_us FROM (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events)
WHERE prev_us IS NULL OR ts_us - prev_us >= 60000000""",
)
def q_events_debounce(spark, sf):
    """Telemetry DEBOUNCE: drop an event that follows another event of
    the same (user, type) within 60 s — duplicate-click / retry-storm
    suppression, the batch twin of streaming watermarked dedup.  One
    keyed window (lag on integer micros, deterministic event_id
    tie-break), no self-join; the gap test is exact int64 arithmetic so
    both engines agree bitwise.  Semantics note: the gap is measured
    from the previous RAW event (standard lag form), not the previous
    kept one — the sequential variant is what the streaming
    dropDuplicates-within-watermark path provides."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts_us",
                  prev.alias("prev_us"))
        .where(F.col("prev_us").isNull()
               | (F.col("ts_us") - F.col("prev_us") >= 60_000_000))
        .drop("prev_us")
    )


@register(
    "events_hourly_anomalies",
    """WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS s1,
         CAST(SUM(n * n) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hour_bucket, h.n,
       (h.n - CAST(m.s1 AS DOUBLE) / m.k)
         / sqrt(CAST(m.s2 AS DOUBLE) / m.k
                - (CAST(m.s1 AS DOUBLE) / m.k) * (CAST(m.s1 AS DOUBLE) / m.k)) AS z
FROM hourly h JOIN moments m USING (event_type)
WHERE abs((h.n - CAST(m.s1 AS DOUBLE) / m.k)
         / sqrt(CAST(m.s2 AS DOUBLE) / m.k
                - (CAST(m.s1 AS DOUBLE) / m.k) * (CAST(m.s1 AS DOUBLE) / m.k))) >= 2.0""",
)
def q_events_hourly_anomalies(spark, sf):
    """Ops anomaly detection: hours whose per-type event volume is >= 2
    population standard deviations from that type's mean — the rate
    monitor an ingestion pipeline alarms on.  Counts and moment sums
    are exact integers; the z formula is the SAME pinned IEEE double
    expression in both engines (the quantity_price_correlation
    pattern), so results are bit-reproducible at any parallelism.  Two
    aggregates (hour rollup, then per-type moments over the small hourly
    relation) + one broadcast-size join — no window, no global sort."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("ts_us div 3600000000").alias("hour_bucket"),
    ).agg(F.count("*").alias("n"))
    moments = hourly.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("k")
    z = (F.col("n") - mean) / F.sqrt(
        F.col("s2").cast("double") / F.col("k") - mean * mean
    )
    return (
        hourly.join(moments, "event_type")
        .select("event_type", "hour_bucket", "n", z.alias("z"))
        .where(F.abs(F.col("z")) >= 2.0)
    )


@register(
    "stateful_closed_sessions",
    f"""WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_events.SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT user_id, us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
agg AS (
  SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(us) AS start_us, MAX(us) AS end_us,
         MAX(session_id) OVER (PARTITION BY user_id) AS last_sid
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, start_us, end_us, n_events
FROM agg WHERE session_id < last_sid""",
)
def q_stateful_closed_sessions(spark, sf):
    """The CUSTOM stateful streaming operator's driver row (round 12):
    gap-based sessionization via applyInPandasWithState
    (streaming/sessions.py) — per-user open-session state carried
    across micro-batches, closed sessions emitted in append mode, the
    shape the built-in session_window cannot express when the state
    transition is bespoke.  Batch-equivalence oracle: the streamed
    drain emits exactly the batch sessions MINUS each user's final
    (still-open-in-state) session — SQL-expressible, so this member of
    the streaming family is hash-checked like the rest.  sum_value is
    excluded from the checked relation: the stateful operator
    accumulates it in float64 event order while the exact oracle sums
    in DECIMAL, an ULP-class divergence the integer columns don't
    have."""
    from mapreduce_minhash_lsh_spark.streaming.sessions import (
        streaming_sessionize,
    )

    return streaming_sessionize(spark, sf).select(
        "user_id", "start_us", "end_us", "n_events"
    )
