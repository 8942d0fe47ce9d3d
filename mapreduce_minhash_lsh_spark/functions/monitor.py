"""Zero-extra-scan pipeline metrics via ``Dataset.observe``.

A 100 TB job cannot afford a second pass to learn what it just
processed; ``observe`` attaches aggregate metrics to a plan that are
computed DURING the next action and delivered to the driver afterwards
— the mechanism near_dup_groups already uses for its convergence
count, generalized here for data-quality monitoring.

    docs, obs = observed_quality(docs, "docs_in", ["text", "lang"])
    docs.write.parquet(out)          # the write computes the metrics
    obs.get                         # {'n_rows': ..., 'null_text': ...}

Metrics ride map-side partial aggregation inside whichever action runs
the plan: no shuffle added, no re-read, works identically under
whole-stage codegen and AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame, name: str, null_check_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row-count and per-column null-count metrics to ``df``.

    Returns (df_with_observation, observation); read
    ``observation.get`` AFTER the next action on the returned frame.
    Metric keys: ``n_rows`` plus ``null_<col>`` for each requested
    column.
    """
    cols = null_check_cols or []
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"observed_quality: unknown columns {missing}")
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
        .alias(f"null_{c}")
        for c in cols
    ]
    return df.observe(obs, *metrics), obs
