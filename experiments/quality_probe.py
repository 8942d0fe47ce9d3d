#!/usr/bin/env python3
"""Scaling probe for the round-10 corpus-quality + search operators:
replicate the sf0.1 documents corpus REPLICAS-fold and measure

  * gopher_quality_flags / c4_line_filter — claimed map-side
    single-scan (no Exchange): wall must track corpus size ~linearly,
    and the executed plan is asserted Exchange-free at probe scale;
  * bm25_topk — claimed |terms|-bounded shuffle: records the size of
    the exploded hits relation (the ONLY shuffled data) next to the
    corpus size, plus wall.

    python3 experiments/quality_probe.py [REPLICAS ...]

Prints one JSON line per replica count so results can be tracked
across rounds (experiments/results_r10.json quality_probe).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.search import bm25_topk
from mapreduce_minhash_lsh_spark.queries.quality import _BM25_TERMS
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _replicated(spark, replicas: int):
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    return (
        base.crossJoin(F.broadcast(spark.range(replicas).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    replicas_list = [int(a) for a in sys.argv[1:]] or [50, 200, 400]
    spark = get_spark(app_name="quality_probe")
    for replicas in replicas_list:
        docs = _replicated(spark, replicas)
        n_docs = docs.count()

        # Monkey-substitute the corpus into the registered query bodies
        # by calling the underlying operators directly on the replicated
        # relation (same expressions the queries register).
        from mapreduce_minhash_lsh_spark.functions import quality as q

        t = F.col("text")
        gopher = (
            docs.where(F.length("text") > 0)
            .select(
                "doc_id",
                F.size(F.split(t, " ")).cast("long").alias("n_words"),
                q.mean_word_len(t).alias("mean_word_len"),
                q.distinct_stopword_hits(t).alias("stop_hits"),
                q.alpha_word_frac(t).alias("alpha_frac"),
                q.symbol_to_word_ratio(t).alias("symbol_ratio"),
            )
        )
        gopher_plan = gopher._jdf.queryExecution().executedPlan().toString()
        # corpus prep owns two exchanges (load_table's REPARTITION_BY_NUM
        # fan-out of the single-file parquet + the replication
        # BroadcastExchange); the claim is the OPERATOR adds no shuffle
        import re

        shuffles = [
            ln for ln in gopher_plan.splitlines()
            if re.search(r"\bExchange ", ln)
            and "REPARTITION_BY_NUM" not in ln
        ]
        assert not shuffles, f"gopher scan grew a shuffle: {shuffles}"
        gopher_s = _noop(gopher)

        toks = F.split(t, " ")
        kept = q.c4_kept_lines(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size(toks).cast("long") + 11) / F.lit(12)).cast("int") - 1,
                ),
                lambda i: F.concat(
                    F.concat_ws(" ", F.slice(toks, i * 12 + 1, 12)),
                    F.when(i % 3 < 2, F.lit(".")).otherwise(F.lit("")),
                ),
            )
        )
        c4 = docs.where(F.length("text") > 0).select(
            "doc_id", F.size(kept).cast("long").alias("n_kept")
        )
        c4_s = _noop(c4)

        # the shuffled relation bm25 builds: term-filtered explode
        hits_rows = (
            docs.where(F.length("text") > 0)
            .select(F.explode(F.filter(toks, lambda x: x.isin(*_BM25_TERMS))).alias("t"))
            .count()
        )
        t0 = time.perf_counter()
        top = bm25_topk(docs, _BM25_TERMS, k=20, idf="rational")
        n_top = top.count()
        bm25_s = time.perf_counter() - t0

        print(json.dumps({
            "mode": "quality_probe",
            "replicas": replicas,
            "docs": n_docs,
            "gopher_wall_s": round(gopher_s, 2),
            "c4_wall_s": round(c4_s, 2),
            "bm25_wall_s": round(bm25_s, 2),
            "bm25_hits_rows": hits_rows,
            "bm25_hits_frac_of_tokens": round(
                hits_rows / max(n_docs * 54.3, 1), 4
            ),
            "topk_rows": n_top,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
