"""Sequence packing: assign documents to fixed-token-budget training
chunks.

An LLM training pipeline ends by packing tokenized documents into
context-window-sized sequences.  The classic single-writer algorithm
("concatenate the corpus, cut every ctx_len tokens") is inherently
serial; the distributed form used here shards the corpus into
``n_shards`` independent streams by content hash, packs each stream
separately, and keys the output by (shard, chunk_id):

  1. shard   = md5_bucket(doc_id) % n_shards      -- map-side, no driver
  2. order   = (md5_bucket(doc_id), doc_id)       -- deterministic, no
                                                     global sort
  3. offset  = running token count of PRIOR docs in the shard
  4. chunk   = offset // ctx_len                  -- a doc starts in the
                                                     chunk its offset
                                                     falls in

A document whose tokens straddle a chunk boundary stays with its
starting chunk (document-boundary packing); the trailing overflow is the
downstream tokenizer's truncate/continue decision, recoverable from
``start_offset`` + ``n_tokens``.  Every assignment is a pure function of
(doc_id, corpus membership): stable under repartitioning, retries, and
engines — the same guarantee the sampling operators give (see
operators/sampling.py), extended with ONE window per shard.

Scale: one shuffle (hash partition on shard), then a per-shard sorted
running sum.  Shards are independent, so parallelism = n_shards; size
n_shards to a few x cluster cores and each task scans its shard once.
No collect, no global sort, no skew (md5 sharding is uniform).

The reference has no packing surface; this extends it for the
LLM-pipeline brief (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.sampling import hash_bucket


def whitespace_token_count(text: Column) -> Column:
    """Token count under the corpus tokenization used by frequent_tokens /
    distinctive_terms: lowercase split on non-alphanumeric runs, empties
    dropped.  Integer, engine-portable."""
    toks = F.split(F.lower(text), "[^a-z0-9]+")
    return F.size(F.filter(toks, lambda t: t != F.lit(""))).cast("long")


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Pack documents into (shard, chunk_id) training sequences of
    ``ctx_len`` tokens.

    Returns one row per non-empty document:
      id_col, shard, chunk_id, n_tokens, start_offset
    where start_offset is the token position of the document inside its
    shard's concatenated stream; ``start_offset - chunk_id * ctx_len``
    is its position inside the chunk.  Empty documents (zero tokens)
    are dropped — they contribute nothing to a sequence.
    """
    if ctx_len <= 0 or n_shards <= 0:
        raise ValueError("ctx_len and n_shards must be positive")
    sized = (
        docs.where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            hash_bucket(F.col(id_col), seed=seed).alias("_b"),
            whitespace_token_count(F.col(text_col)).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("shard", (F.col("_b") % F.lit(n_shards)).cast("long"))
    )
    # Running offset of all PRIOR docs in the shard's deterministic
    # (bucket, id) order.  rowsBetween(unboundedPreceding, -1) so a doc
    # never counts itself; first doc of a shard gets NULL -> 0.
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_b"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.select(
        id_col,
        "shard",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_offset"),
        "n_tokens",
    ).select(
        id_col,
        "shard",
        # Integer `div`, not float `/` + cast: exact at any offset
        # magnitude (a 100 TB shard stream can pass 2^53 tokens).
        F.expr(f"start_offset div {int(ctx_len)}").alias("chunk_id"),
        "n_tokens",
        "start_offset",
    )


def pack_sequences_greedy(
    docs: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Next-fit greedy packing: walk each shard's deterministic doc order
    and CLOSE the current chunk when the next document would overflow it
    — so no chunk exceeds ctx_len tokens unless a single document alone
    does (it then gets its own chunk).

    This is the sequential variant of :func:`pack_sequences` — the
    chunk decision depends on the running fill, a loop-carried state no
    window frame expresses — so it runs as an Arrow-batched
    ``applyInPandas`` over shards: Python touches each row once inside
    a vectorized batch, and the per-shard loop is the algorithm itself,
    not a serialization detail.  Shards stay independent, so the scale
    story is identical to pack_sequences (one shuffle, n_shards
    parallel walks).  The DuckDB oracle replays the same walk as a
    recursive CTE (queries/llm.py:packed_sequences_greedy).
    """
    if ctx_len <= 0 or n_shards <= 0:
        raise ValueError("ctx_len and n_shards must be positive")
    import pandas as pd

    sized = (
        docs.where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            hash_bucket(F.col(id_col), seed=seed).alias("_b"),
            whitespace_token_count(F.col(text_col)).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("shard", (F.col("_b") % F.lit(n_shards)).cast("long"))
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_b", id_col], kind="mergesort").reset_index(drop=True)
        chunks = []
        chunk, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > ctx_len:
                chunk += 1
                fill = 0
            chunks.append(chunk)
            fill += n
        out = pdf[[id_col, "shard", "n_tokens"]].copy()
        out["chunk_id"] = pd.Series(chunks, dtype="int64")
        return out[[id_col, "shard", "chunk_id", "n_tokens"]]

    # id dtype follows the input (string ids work, not just long)
    id_type = sized.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_type}, shard long, chunk_id long, n_tokens long"
    return sized.groupBy("shard").applyInPandas(walk, schema=schema)
