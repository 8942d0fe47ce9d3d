#!/usr/bin/env python3
"""Boundary-recall probe for SemDeDup (VERDICT r11 #5).

The r11 scale probe planted near-IDENTICAL duplicates, which virtually
never straddle a quantizer cell — so it could not observe the
documented loss mode ("pairs split across cells are lost",
operators/semdedup.py).  This probe plants BORDERLINE pairs: partner
vectors at exact cosine within ±0.02 of the 0.95 threshold, in random
directions, so a realistic fraction lands across cell boundaries.  It
then measures, against brute-force exact ground truth:

* straddle fraction — how many true pairs hard assignment separates;
* recall of semdedup_pairs at n_lists in {sqrt(n), 2*sqrt(n),
  4*sqrt(n)} with hard assignment (soft_assign=1);
* recall with soft_assign=2 (each vector joins its 2 nearest cells) —
  the recall knob, at ~2x pairwise work.

Planted cosines avoid [0.9495, 0.9505] so numpy-vs-scaled-int rounding
at the threshold cannot miscount a pair.

    python3 experiments/semdedup_recall_probe.py [n] [n_pairs]

Prints one JSON line (recorded in results_r12.json).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyspark.sql import functions as F  # noqa: F401  (session import side effects)

from mapreduce_minhash_lsh_spark.operators.semdedup import semdedup_pairs
from mapreduce_minhash_lsh_spark.session import get_spark

THRESHOLD = 0.95
DIM = 64


def make_corpus(n: int, n_pairs: int, seed: int = 7):
    """n unit vectors, the first 2*n_pairs of which form planted pairs
    at cosine ~ Uniform([0.93, 0.9495] U [0.9505, 0.97])."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    cos = rng.uniform(0.93, 0.97, size=n_pairs)
    cos = np.where(np.abs(cos - THRESHOLD) < 5e-4,
                   THRESHOLD + np.sign(cos - THRESHOLD + 1e-12) * 5e-3, cos)
    for i in range(n_pairs):
        u = base[2 * i]
        w = rng.standard_normal(DIM)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        base[2 * i + 1] = cos[i] * u + math.sqrt(1 - cos[i] ** 2) * w
    return base


def truth_pairs(mat: np.ndarray) -> set[tuple[int, int]]:
    cos = mat @ mat.T
    ai, bi = np.nonzero(np.triu(cos >= THRESHOLD, k=1))
    return {(int(a), int(b)) for a, b in zip(ai, bi)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    mat = make_corpus(n, n_pairs)
    truth = truth_pairs(mat)

    spark = get_spark(shuffle_partitions=16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    emb.count()

    root = int(math.sqrt(n))
    out = {
        "n": n, "n_pairs_planted": n_pairs, "threshold": THRESHOLD,
        "n_truth": len(truth), "grid": {},
    }
    for n_lists in (root, 2 * root, 4 * root):
        row = {}
        for soft in (1, 2):
            t0 = time.monotonic()
            got = {
                (int(r.vec_id_a), int(r.vec_id_b))
                for r in semdedup_pairs(
                    emb, THRESHOLD, n_lists=n_lists, lloyd_iters=2,
                    assign="auto", soft_assign=soft,
                ).collect()
            }
            wall = round(time.monotonic() - t0, 2)
            assert got <= truth, f"precision break: {sorted(got - truth)[:5]}"
            row[f"recall_soft{soft}"] = round(len(got & truth) / len(truth), 4)
            row[f"wall_soft{soft}"] = wall
        out["grid"][f"n_lists={n_lists}"] = row
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
