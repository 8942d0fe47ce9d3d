#!/usr/bin/env python3
"""Cross-path recall/agreement at sf0.1 (VERDICT r3 #7): the explicit
operator flagship (operators/similarity.similar_pairs) vs the MLlib path
(operators/mllib.mllib_similar_pairs) on the full sf0.1 documents table.

Both implement the same intended algorithm with DIFFERENT hash families,
so their verified pair sets are independent samples of the same
ground-truth-above-threshold set; agreement between them bounds each
path's recall from below.  Exact Jaccard is identical on both sides
(MLlib's JaccardDistance on binary vectors == shingle-set Jaccard), so
any pair found by either path is a TRUE >=threshold pair — disagreement
is pure candidate-recall difference, never precision.

    python3 experiments/mllib_agreement.py [SF_DIR=/root/testdata/sf0.1]

Prints one JSON line: sizes, intersection, Jaccard-agreement, and each
path's recall against the union (the best available ground-truth proxy).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.mllib import mllib_similar_pairs
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="mllib-agreement")
    spark.range(1).count()
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    cfg = MinHashLSHConfig(
        num_hashes=128, num_bands=8, threshold=0.8, id_strategy="md5"
    )

    t0 = time.perf_counter()
    explicit = {
        (r.doc_id_a, r.doc_id_b)
        for r in similar_pairs(docs, cfg).collect()
    }
    t_explicit = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    mllib = {
        (r.doc_id_a, r.doc_id_b)
        for r in mllib_similar_pairs(docs, cfg).collect()
    }
    t_mllib = round(time.perf_counter() - t0, 2)

    union = explicit | mllib
    inter = explicit & mllib
    out = {
        "sf_dir": sf_dir,
        "threshold": cfg.threshold,
        "explicit_pairs": len(explicit),
        "mllib_pairs": len(mllib),
        "intersection": len(inter),
        "union": len(union),
        "agreement_jaccard": round(len(inter) / len(union), 4) if union else 1.0,
        "explicit_recall_vs_union": round(len(explicit) / len(union), 4) if union else 1.0,
        "mllib_recall_vs_union": round(len(mllib) / len(union), 4) if union else 1.0,
        "explicit_sec": t_explicit,
        "mllib_sec": t_mllib,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
