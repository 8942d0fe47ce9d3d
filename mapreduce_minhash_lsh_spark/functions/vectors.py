"""Vector expressions over array<float> embedding columns.

Dot products are accumulated as *scaled integers*: each elementwise
product is computed exactly in IEEE double, scaled by 10^12, floored to
a long, and summed in int64.  Integer addition is associative, so the
result is independent of element order, partitioning, and engine —
Spark and the DuckDB oracle produce bit-identical doubles.  (A plain
double fold is order-dependent: at 1000 executors that means run-to-run
drift; and Spark's decimal ``aggregate`` can't hold a stable accumulator
type.)  The 1e-12 quantization is ~1e5 x finer than float32 input
precision — no observable accuracy cost.

Pure built-in ``zip_with``/``aggregate`` expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE_POW = 12
SCALE = float(10**SCALE_POW)  # exactly representable in double


def dot_scaled(a: Column, b: Column) -> Column:
    """Exact scaled-integer dot product of two float arrays, as long."""
    terms = F.zip_with(
        a, b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(SCALE)).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent dot product, as double."""
    return dot_scaled(a, b) / F.lit(SCALE)


def norm2_exact(a: Column) -> Column:
    """Order-independent squared L2 norm, as double."""
    return dot_exact(a, a)


def cosine_from_parts(dot: Column, n2_a: Column, n2_b: Column) -> Column:
    """cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)) — fixed evaluation order."""
    return dot / (F.sqrt(n2_a) * F.sqrt(n2_b))
