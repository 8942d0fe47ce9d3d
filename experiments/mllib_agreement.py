#!/usr/bin/env python3
"""Cross-path recall/agreement at sf0.1 (VERDICT r3 #7): the explicit
operator flagship (operators/similarity.similar_pairs) vs the MLlib path
(operators/mllib.mllib_similar_pairs) on a deterministic md5-bucket
sample of the sf0.1 documents table.

Why a sample, and why MLlib gets FEWER hash tables: MLlib's MinHashLSH
ORs across numHashTables single-hash tables — banding with r=1.  On
this corpus (char-3-gram background similarity j~0.6) a single-hash
table matches a background pair w.p. ~j, so at 128 tables virtually
EVERY pair becomes a candidate: at the full sf0.1 the candidate join
materializes ~12.5M pairs x sparse vectors (observed: an 8.2 GiB
broadcast attempt).  That is the measured reason the explicit r=16
banded pipeline is the scale path and the MLlib path is kept as a
cross-check: r>1 banding is not expressible with MLlib's API.  The
comparison below therefore runs both paths on a 1/5 md5 sample
(~1 000 docs) with numHashTables=16 for MLlib.

Exact Jaccard is identical on both sides (MLlib's JaccardDistance on
binary vectors == shingle-set Jaccard), so any pair either path emits
is a TRUE >=threshold pair — disagreement is candidate recall only.

    python3 experiments/mllib_agreement.py [SF_DIR=/root/testdata/sf0.1]

Prints one JSON line: sizes, intersection, agreement, per-path recall
vs the union (best available ground-truth proxy), and wall times.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import md5_long
from mapreduce_minhash_lsh_spark.operators.mllib import mllib_similar_pairs
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="mllib-agreement")
    # The MLlib candidate explode at 16 tables is row-few but byte-huge;
    # keep it off the broadcast path.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1).count()
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(5)) == 0)
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    explicit_cfg = MinHashLSHConfig(
        num_hashes=128, num_bands=8, threshold=0.8, id_strategy="md5"
    )
    mllib_cfg = MinHashLSHConfig(
        num_hashes=16, num_bands=1, threshold=0.8, id_strategy="md5"
    )

    t0 = time.perf_counter()
    explicit = {
        (r.doc_id_a, r.doc_id_b)
        for r in similar_pairs(docs, explicit_cfg).collect()
    }
    t_explicit = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    mllib = {
        (r.doc_id_a, r.doc_id_b)
        for r in mllib_similar_pairs(docs, mllib_cfg).collect()
    }
    t_mllib = round(time.perf_counter() - t0, 2)

    union = explicit | mllib
    inter = explicit & mllib
    out = {
        "sf_dir": sf_dir,
        "sampled_docs": n_docs,
        "threshold": 0.8,
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
