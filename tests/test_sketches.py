"""Sketch aggregates: approximate results must sit inside their error
bounds relative to exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_hll_within_rsd(spark):
    e = load_table(spark, SF_SMALL, "events")
    approx = {
        r.event_type: r.a
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.x
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for k, x in exact.items():
        assert abs(approx[k] - x) <= max(1, 0.1 * x), (k, approx[k], x)


def test_percentile_approx_brackets_exact_median(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_med"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_med"),
    ).collect()
    for r in rows:
        assert abs(r.approx_med - r.exact_med) <= 1.0, r
