"""SimHash document fingerprints (near-dup dedup family).

32-bit SimHash over the document's shingle set: each shingle hashes to a
32-bit value via the seeded affine family; bit b of the fingerprint is
the majority vote of bit b across the document's shingle hashes
(Charikar 2002).  Near-duplicates differ in few bits (small Hamming
distance), so fingerprints can be banded/bucketed exactly like MinHash
signatures — one long per doc instead of num_hashes values.

Long-format bit explosion keeps this pure built-in expressions and
SQL-mirrorable (the DuckDB twin in registry.py computes the identical
fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import affine_hash
from mapreduce_minhash_lsh_spark.operators.minhash import shingle_ids

N_BITS = 32
_POW2 = [1 << b for b in range(N_BITS)]


def simhash(doc_shingles: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, simhash: long).

    Uses the first (a, b) pair of cfg's hash family for the 32-bit
    shingle hash.  Two shuffles: (doc_id, bit) majority then doc_id
    pack — both partial-aggregated map-side.
    """
    a, b = cfg.hash_params()[0]
    ids = shingle_ids(doc_shingles, cfg)
    hashed = ids.select(
        "doc_id", affine_hash(F.col("shingle_id"), a, b, cfg.prime).alias("h")
    )
    pows = F.array(*[F.lit(p) for p in _POW2])
    bits = hashed.select(
        "doc_id", "h", F.posexplode(pows).alias("bit", "pw")
    ).select(
        "doc_id", "bit", "pw",
        F.when(F.expr("(h div pw) % 2") == 1, 1).otherwise(-1).alias("vote"),
    )
    majority = bits.groupBy("doc_id", "bit", "pw").agg(F.sum("vote").alias("s"))
    return (
        majority.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("s") > 0, F.col("pw")).otherwise(0)).alias("simhash")
        )
    )


def hamming_distance(a: F.Column, b: F.Column) -> F.Column:
    """Popcount of XOR — via bin() + counting '1' chars (no UDF)."""
    x = F.bin(a.bitwiseXOR(b))
    return (F.length(x) - F.length(F.replace(x, F.lit("1"), F.lit("")))).cast("int")


def simhash_near_pairs(
    fingerprints: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Pairs of docs whose SimHash differs in <= max_hamming bits.

    Banding trick: split the 32 bits into max_hamming+1 chunks — any pair
    within distance d agrees exactly on >= 1 chunk, so an equi-join per
    chunk finds all of them (no quadratic scan).
    """
    n_chunks = max_hamming + 1
    chunk_bits = N_BITS // n_chunks
    chunks = F.array(*[
        F.expr(f"(simhash div {1 << (c * chunk_bits)}) % {1 << chunk_bits}")
        for c in range(n_chunks)
    ])
    banded = fingerprints.select(
        "doc_id", "simhash", F.posexplode(chunks).alias("chunk", "chunk_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["chunk", "chunk_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_id_a", "doc_id_b",
            hamming_distance(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        ).where(F.col("hamming") <= max_hamming)
    )
