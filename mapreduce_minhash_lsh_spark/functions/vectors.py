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


def dot_scaled_sql(a_sql: str, b_sql: str) -> str:
    """SQL-text twin of :func:`dot_scaled` — parses to the semantically
    identical expression (same casts, same double scale literal, same
    int64 fold), producing bit-identical values.

    Exists for the literal-enumerating callers (ADC lookup tables:
    m x n_codes dot products against codebook literals).  Built through
    the Column API each ``dot_scaled`` costs ~40 py4j round trips for
    its two lambdas; at 8 x 16 codebook entries that is ~5 s of
    DRIVER-SIDE PYTHON per query construction (measured, r14 — the
    dominant cost of ann_ivfpq_topk at bench scale).  One
    ``F.expr(...)`` over this string is a single round trip.  Kept in
    lockstep with ``dot_scaled`` and pinned bit-equal by
    tests/test_ann.py::test_lut_sql_matches_column_path."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        f"(x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {SCALE!r}D) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent dot product, as double."""
    return dot_scaled(a, b) / F.lit(SCALE)


def norm2_exact(a: Column) -> Column:
    """Order-independent squared L2 norm, as double."""
    return dot_exact(a, a)


def cosine_from_parts(dot: Column, n2_a: Column, n2_b: Column) -> Column:
    """cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)) — fixed evaluation order."""
    return dot / (F.sqrt(n2_a) * F.sqrt(n2_b))


def rademacher_signs(in_dim: int, out_dim: int, seed: int = 42) -> list[list[int]]:
    """Seeded +-1 projection matrix (out_dim rows of in_dim signs).

    Rademacher entries satisfy the Johnson-Lindenstrauss lemma like
    Gaussians do (Achlioptas 2003) but make the projection EXACT in
    integer arithmetic: with inputs quantized once to 1e-12 quanta,
    out_j = sum_i (+-q_i) is an int64 sum — associative, so identical
    on any engine/partitioning, like the dot products above.
    """
    import random

    rng = random.Random(seed)
    return [
        [1 if rng.random() < 0.5 else -1 for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def rp_project(vec: Column, signs: list[list[int]]) -> Column:
    """Project an array<float> column to len(signs) dims: array<double>.

    Quantize each input element once (floor(x * 1e12) as long), then each
    output dim is an exact +-1-weighted int64 sum, scaled back to double.
    Pure zip_with/aggregate expressions — no UDF, no shuffle.
    """
    q = F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(SCALE)).cast("long")
    )
    outs = []
    for row in signs:
        srow = F.array(*[F.lit(s).cast("long") for s in row])
        acc = F.aggregate(
            F.zip_with(q, srow, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        outs.append(acc / F.lit(SCALE))
    return F.array(*outs)
