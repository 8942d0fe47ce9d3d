#!/usr/bin/env python3
"""Vocabulary-scale probe for the distributed BPE trainer — round 14.

SCALE.md §18 claims the trainer's per-iteration cost is bounded by the
PRUNED VOCABULARY, not the corpus: after the one word-count shuffle,
each merge iteration is a pair explode + partial-aggregated argmax +
map-side fold over (word, cnt) rows.  The corpus tables here can't
exercise that claim (the generator's vocabulary is 31 words at every
SF), so this probe trains on SYNTHETIC frequency tables of increasing
size — deterministic pseudo-words (seeded md5-ish mixing, no RNG
state) at n ∈ {10k, 100k, 1M} — and records per-iteration wall
seconds.  The prediction: per-iteration time grows ~linearly in the
vocabulary row count (the pair-explode volume) with a fixed Spark
job-overhead floor, and NO dependence on any "corpus size" (there is
none here — which is the point: at 100 TB the iterations never touch
the corpus again).

    python3 experiments/bpe_scale_probe.py [OUT.json]

Appends a "bpe_scale" record: per n, total train seconds for K=8
merges, per-iteration mean, and the learned merge count (8 — synthetic
words are 8 chars, so pairs never exhaust).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from mapreduce_minhash_lsh_spark.operators.bpe import (  # noqa: E402
    learn_bpe_merges_from_freqs,
)
from mapreduce_minhash_lsh_spark.session import get_spark  # noqa: E402

K = 8
SIZES = [10_000, 100_000, 1_000_000]
ALPHA = 16  # distinct chars -> 8-char words over a 16-letter alphabet


def synthetic_freqs(spark, n: int):
    """(word, cnt) with n distinct deterministic 8-char pseudo-words:
    word i spells the 8 hex-ish letters of xxhash64(i) — uniform pair
    structure, no driver-side generation (sequence -> map-side)."""
    base = spark.range(n).select(
        F.abs(F.xxhash64(F.col("id"))).alias("h"),
        (F.col("id") % 997 + 1).cast("long").alias("cnt"),
    )
    letters = F.expr(
        f"transform(sequence(0, 7),"
        f" i -> char(97 + (abs(shiftright(h, i * 4)) % {ALPHA})))"
    )
    return (
        base.select(F.concat_ws("", letters).alias("word"), "cnt")
        .groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "experiments/results_r14.json"
    spark = get_spark(app_name="bpe_scale_probe", shuffle_partitions=32)
    record = {"probe": "bpe_scale", "k_merges": K, "sizes": []}
    # Untimed warmup: the first train pays codegen/JIT for every loop
    # shape (the r7 bench lesson) — without it the smallest size reads
    # 2x its steady-state cost and the scaling curve is garbage.
    warm = synthetic_freqs(spark, 1000).persist()
    warm.count()
    learn_bpe_merges_from_freqs(warm, K).collect()
    warm.unpersist()
    for n in SIZES:
        freqs = synthetic_freqs(spark, n).persist()
        rows = freqs.count()  # materialize outside the timed window
        t0 = time.monotonic()
        merges = learn_bpe_merges_from_freqs(freqs, K).collect()
        dt = time.monotonic() - t0
        freqs.unpersist()
        record["sizes"].append(
            {
                "n_requested": n,
                "vocab_rows": rows,
                "train_sec": round(dt, 2),
                "sec_per_iteration": round(dt / max(len(merges), 1), 2),
                "merges_learned": len(merges),
            }
        )
        print(f"n={n}: {rows} rows, {dt:.2f}s total, {len(merges)} merges")
    try:
        existing = json.load(open(out_path))
        if not isinstance(existing, list):
            existing = [existing]
    except Exception:
        existing = []
    existing.append(record)
    json.dump(existing, open(out_path, "w"), indent=2)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
