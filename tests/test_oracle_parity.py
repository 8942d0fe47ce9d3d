"""Driver-emulating oracle parity: run every queries() entry on Spark AND
its oracle_sql() twin on DuckDB over the same parquet tables; compare
row count, column set, and (order-insensitively) every value.  This is a
local rehearsal of the driver's CORRECTNESS gate, at sf0.001 for speed.

DRIVER-SCALE SWEEP (slow target — run before shipping a round): the
same sweep at the driver's sf0.01, where scale-dependent divergences
(e.g. round 2's HLL-precision bug) actually show up:

    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \\
        python -m pytest tests/test_oracle_parity.py -q

Measured 2026-08-15 (r10): 138 passed in 420 s (SCALE.md §9)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from mapreduce_minhash_lsh_spark.sources.tables import TABLES
from tests.conftest import SF_ORACLE

QUERY_NAMES = sorted(entrymod.queries())


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    oracles = entrymod.oracle_sql()
    q = entrymod.queries()[name]
    sdf = q(spark, SF_ORACLE).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check, like the driver's weak path
        return
    odf = duck.execute(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column sets differ"
    assert len(sdf) == len(odf), f"{name}: row counts differ {len(sdf)} vs {len(odf)}"
    s, o = normalize(sdf), normalize(odf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            pd.testing.assert_series_equal(
                sv.astype("float64"), ov.astype("float64"),
                check_names=False, check_exact=True, obj=f"{name}.{col}",
            )
        else:
            assert sv.astype(str).tolist() == ov.astype(str).tolist(), f"{name}.{col}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(df.schema.fields) == 3
    assert len(rows) > 0
