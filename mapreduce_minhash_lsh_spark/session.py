"""SparkSession builder tuned for this engine.

Local testing runs on local[N] (single JVM), but every setting here is
chosen for the 1000-executor / 100 TB deployment described in SCALE.md:
AQE re-plans shuffles at runtime (partition coalescing + skew-join
splitting — our band-key self-join is the skew hot spot), Arrow makes the
few pandas-UDF paths batch-transfer instead of row-at-a-time, and the
session timezone is pinned to UTC so timestamp semantics match the
naive-UTC parquet testdata and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduce-minhash-lsh-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The flagship's signature aggregate carries num_hashes (128)
        # min-buffers; the default codegen field cap (100) silently
        # drops it to interpreted mode — measured 2-2.5x slower at the
        # 10x probe.  300 covers n=128 with headroom.
        .config("spark.sql.codegen.maxFields", "300")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); load_table also sets
        # this per-read, but parquet schema inference can run on driver
        # thread pools where a just-set session conf is not reliably
        # visible — baking it into the session's base conf closes that
        # (rare, order-dependent) race.  See sources/tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # In local mode the executor and driver share one JVM, so a long
        # full-GC pause (large heaps at the 160x probe) or heavy external
        # CPU contention can delay executor heartbeats past the 120 s
        # default — the HeartbeatReceiver then evicts the only executor
        # and wedges the context (observed once at the 160x groups probe:
        # "Removing executor driver with no recent heartbeats: 129525 ms").
        # A generous network timeout costs nothing in local mode and, on a
        # real cluster, only delays detection of a genuinely dead executor.
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeatInterval", "20s")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable knobs to a session we didn't build (the
    driver hands us one in ``__spark_entry__.entry``)."""
    for key, val in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.codegen.maxFields", "300"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(key, val)
        except Exception:  # pragma: no cover - conf may be static
            pass
    return spark
