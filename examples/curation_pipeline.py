#!/usr/bin/env python3
"""Quality-first curation flow over the documents corpus — the round-10
operator set composed end to end:

  1. Gopher document rules (map-side flags, single scan) — drop docs
     failing the published word-count / word-length / stopword /
     alpha-fraction / symbol-ratio conjunction;
  2. C4 line cleanup — strip boilerplate lines, drop thin documents;
  3. near-duplicate thinning (the MinHash/LSH flagship) — keep the
     lowest doc_id of each similar pair's group;
  4. bigram-LM perplexity (session 4) — drop the most corpus-atypical
     tail (the CCNet-style cut, self-trained here);
  4b. DSIR importance selection (round 11) — keep the half of the
     corpus most like the 'en' target by hashed-n-gram log-weight;
  4c. SemDeDup (round 11) — drop semantic duplicates found by
     cluster-scoped embedding comparison;
  4d. Bloom decontamination (round 11) — drop documents whose 3-grams
     mostly hit the held-out benchmark sketch (map-side bitmap test);
  5. BPE token accounting (the shipped merge asset) — the budget unit;
  5b. corpus-fit tokenizer (round 14) — learn merges ON the surviving
     corpus (learn_bpe_merges) and recount the budget under them: the
     shipped-vs-fit delta is the tokenizer-drift question;
  6. a BM25 spot check that the surviving corpus still answers a
     relevance query.

    python3 examples/curation_pipeline.py [SF_DIR]

Every stage is an operator with its own oracle-checked registry entry
(gopher_quality_flags, c4_line_filter, similar_pairs, ngram_lm_scores,
dsir_logweights, semdedup_drop_ids, bloom_contamination,
bpe_token_counts, bm25_topk) — this script is the composition, not new
logic.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions import quality as q
from mapreduce_minhash_lsh_spark.functions.bpe import count_text_tokens
from mapreduce_minhash_lsh_spark.functions.text import word_ngrams
from mapreduce_minhash_lsh_spark.operators.bpe import trained_token_counts
from mapreduce_minhash_lsh_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)
from mapreduce_minhash_lsh_spark.operators.dsir import dsir_logweights
from mapreduce_minhash_lsh_spark.operators.lm import bigram_lm_scores
from mapreduce_minhash_lsh_spark.operators.semdedup import semdedup_drop_ids
from mapreduce_minhash_lsh_spark.operators.search import bm25_topk
from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs
from mapreduce_minhash_lsh_spark.session import get_spark
from mapreduce_minhash_lsh_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation_pipeline", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    n0 = docs.count()

    # 1. Gopher rules — one scan, zero shuffle
    t = F.col("text")
    keep = q.gopher_keep(
        F.size(F.split(t, " ")).cast("long"),
        q.mean_word_len(t),
        q.distinct_stopword_hits(t),
        q.alpha_word_frac(t),
        q.symbol_to_word_ratio(t),
    )
    docs = docs.where(keep == 1)
    n1 = docs.count()

    # 2. C4 line cleanup on synthesized lines (single-line corpus; a
    #    real multi-line corpus would split on "\n")
    toks = F.split(t, " ")
    n_lines = F.floor((F.size(toks).cast("long") + 11) / F.lit(12)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.concat_ws(" ", F.slice(toks, i * 12 + 1, 12)),
            F.when(i % 3 < 2, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    kept = q.c4_kept_lines(lines)
    docs = (
        docs.withColumn("clean_text", F.array_join(kept, "\n"))
        .where(F.size(kept) >= q.C4_MIN_KEPT_LINES)
    )
    n2 = docs.count()

    # 3. near-dup thinning on the CLEANED text
    clean = docs.select("doc_id", F.col("clean_text").alias("text"))
    cfg = MinHashLSHConfig(num_hashes=128, num_bands=8, threshold=0.8,
                           id_strategy="md5")
    pairs = similar_pairs(clean, cfg)
    drop = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    docs = clean.join(drop, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. LM-perplexity cut: drop docs whose cross-entropy under the
    #    (self-trained) corpus bigram LM exceeds a fixed ceiling —
    #    ceiling = this corpus's own p95 (one bounded-scalar action);
    #    production trains on a held-out clean corpus and fixes the
    #    ceiling from ITS score distribution instead.
    scores = bigram_lm_scores(docs)
    ceiling = scores.agg(F.expr("percentile(avg_nll, 0.95)")).first()[0]
    docs = (
        docs.join(scores.select("doc_id", "avg_nll"), "doc_id", "left")
        .where(F.coalesce(F.col("avg_nll"), F.lit(0.0)) <= ceiling)
        .drop("avg_nll")
    )
    n4 = docs.count()

    # 4b. DSIR importance selection (round 11): weight every survivor
    #     toward the 'en' target distribution and keep the top half by
    #     hashed-n-gram importance (median cut = one bounded action;
    #     the paper samples proportionally — a threshold is the
    #     deterministic equivalent).
    with_lang = docs.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
    )
    w = dsir_logweights(with_lang, target_pred=F.col("lang") == "en")
    cut = w.agg(F.expr("percentile(avg_logw, 0.5)")).first()[0]
    docs = docs.join(
        w.where(F.col("avg_logw") >= cut).select("doc_id"), "doc_id"
    )
    n5 = docs.count()

    # 4c. SemDeDup (round 11): semantic near-dups in embedding space
    #     (vec_id == doc_id in the testdata), cluster-scoped compare.
    emb = load_table(spark, sf_dir, "embeddings")
    sem_drop = semdedup_drop_ids(emb, threshold=0.4, n_lists=8).select(
        F.col("vec_id").alias("doc_id")
    )
    docs = docs.join(sem_drop, "doc_id", "left_anti")
    n6 = docs.count()

    # 4d. Bloom decontamination (round 11): drop any document whose
    #     3-grams mostly hit the held-out benchmark sketch (~9 KB
    #     bitmap, membership fully map-side).
    toks3 = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks3) >= 3).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias("gram"),
    )
    bench = grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    bloom_words = bloom_build(bench, "gram", m_bits=1 << 16, k=4)
    contaminated = (
        grams.where(F.col("doc_id") % 97 != 0)
        .groupBy("doc_id")
        .agg(
            F.avg(
                bloom_might_contain(F.col("gram"), bloom_words, 1 << 16, 4)
                .cast("double")
            ).alias("hit_frac")
        )
        .where(F.col("hit_frac") > 0.5)
        .select("doc_id")
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")
    n7 = docs.count()

    # 5. token budget under the shipped BPE asset
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def counts(texts):
        return texts.map(count_text_tokens)

    counts.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    budget = docs.select(pandas_udf(counts, "long")(F.col("text")).alias("n")) \
                 .agg(F.sum("n").alias("tokens")).first()["tokens"]

    # 5b. tokenizer fit to the survivors: 12 merges learned
    # distributed, budget recounted under them
    fit_budget = (
        trained_token_counts(docs, 12, word_pattern="^[a-z]+$")
        .agg(F.sum("n_bpe_tokens").alias("t")).first()["t"]
    )

    # 6. relevance spot check on the survivors
    top = bm25_topk(docs, ("merge", "scan"), k=5).collect()

    print(f"ingested            {n0}")
    print(f"after gopher rules  {n1}")
    print(f"after c4 cleanup    {n2}")
    print(f"after near-dup drop {n3}")
    print(f"after LM-ppl cut    {n4}")
    print(f"after DSIR cut      {n5}")
    print(f"after SemDeDup      {n6}")
    print(f"after bloom decon   {n7}")
    print(f"BPE token budget    {budget}")
    print(f"corpus-fit budget   {fit_budget} (12 learned merges)")
    print("top-5 bm25:", [(r['doc_id'], round(r['bm25'], 3)) for r in top])
    spark.stop()


if __name__ == "__main__":
    main()
