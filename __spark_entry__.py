"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship similar-pairs query on sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 (+ the
                  training-data-pipeline extensions), as (spark, sf_dir)
                  callables.
oracle_sql()   -> DuckDB twins computing identical results (same seeded
                  hash literals, same aliases); see
                  mapreduce_minhash_lsh_spark/registry.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file from anywhere; make the package importable.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mapreduce_minhash_lsh_spark import registry
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.session import tune_existing
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate pairs of the sf0.001 documents corpus with
    exact Jaccard >= 0.8 (finds the 28 planted near-dup pairs)."""
    tune_existing(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return similar_pairs(docs, registry.PIPELINE_CFG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
