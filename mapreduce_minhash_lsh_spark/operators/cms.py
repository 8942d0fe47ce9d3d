"""Count-Min Sketch — constant-memory frequency estimation.

The counting counterpart of the Bloom filter (operators/bloom.py): a
``depth x width`` grid of int64 counters answers "how often does this
value occur in the corpus?" with a one-sided error (estimate >= true
count, overshoot <= e*N/width with probability 1 - e^-depth per query)
in ``depth*width*8`` bytes no matter how large the corpus is.  That is
the 100 TB swap for exact n-gram frequency queries: an exact count
needs a gram-keyed shuffle of every token in the corpus, while the
sketch is ONE bounded aggregation (<= depth*width rows — 8192 at the
default 4x2048 geometry) plus a map-side estimate against broadcast
literals.  The classic use here is boilerplate / heavy-hitter
detection: estimate the global frequency of a bounded WATCHLIST of
grams (a benchmark suite, a template library, grams surfaced by a
sample) without ever shuffling the corpus by gram.

Engine-portable by construction (the Bloom/Bloom-words idiom):

* row ``i``'s bucket for a value is ``md5_long(value || '#cmsi') %
  width`` — the repo-wide cross-engine hash, so the DuckDB oracle
  rebuilds the sketch AND its estimates bit-for-bit, INCLUDING the
  deterministic overcounts (a deterministic sketch has deterministic
  errors — the oracle checks them too);
* counters are exact int64 sums of +1s — no floats anywhere;
* building is one posexplode + one bounded groupBy collected
  driver-side exactly like bloom_build (<= depth*width rows; the
  corpus never touches the driver), then the grid ships as ``depth``
  array literals so ESTIMATION IS PURE MAP-SIDE expression code: no
  join, no shuffle, whole-stage codegen.

Sizing: width >= e*N/eps for absolute error eps*N; the saturation
analogue of the Bloom guard is unnecessary (estimates degrade
gracefully — they grow, never lie low), but callers sizing for tight
bounds should scale width with corpus token count.

Reference anchor: the reference engine has no sketches (Main.java:
1-89); this extends the mandated LLM-pipeline surface next to Bloom
decontamination and the MinHash family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.functions.hashing import md5_long

CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_positions(col: Column, width: int, depth: int) -> list[Column]:
    """Row i's bucket for a value — shared by build and estimate so
    they can never drift apart (the bloom_positions convention)."""
    return [
        md5_long(F.concat(col, F.lit(f"#cms{i}"))) % F.lit(width)
        for i in range(depth)
    ]


def cms_build(
    items: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    weight_col: str | None = None,
) -> list[list[int]]:
    """Build the ``depth x width`` counter grid from an items relation
    (WITH multiplicity — each row adds 1, or ``weight_col`` if given).
    One posexplode + one bounded groupBy (<= depth*width rows) + one
    bounded collect; the corpus never touches the driver."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pos = items.select(
        F.posexplode(
            F.array(*cms_positions(F.col(col), width, depth))
        ).alias("row", "bucket"),
        w.alias("w"),
    )
    rows = (
        pos.groupBy("row", "bucket")
        .agg(F.sum("w").alias("c"))
        .collect()
    )
    grid = [[0] * width for _ in range(depth)]
    for r in rows:
        grid[r["row"]][r["bucket"]] = r["c"]
    return grid


def cms_estimate(
    col: Column, grid: list[list[int]], width: int | None = None
) -> Column:
    """Map-side frequency estimate against a built sketch: the MIN over
    the depth rows of each row's counter.  The grid rides along as
    ``depth`` array<bigint> literals (~64 KB at 4x2048) — no join, no
    shuffle, stays inside whole-stage codegen."""
    depth = len(grid)
    width = len(grid[0]) if width is None else width
    ests = []
    for i, p in enumerate(cms_positions(col, width, depth)):
        arr = F.expr(
            "array(" + ",".join(str(int(c)) + "L" for c in grid[i]) + ")"
        )
        ests.append(F.element_at(arr, (p + F.lit(1)).cast("int")))
    return F.least(*ests)
