"""Universal hashing expressions shared by MinHash / SimHash / fingerprints.

h_j(x) = (a_j * x + b_j) mod p with p = 2^31-1 replaces the reference's
explicit Fisher-Yates permutations (reference MinHashLSH.java:248-266):
for MinHash only the *relative order* the hash induces matters, and a
seeded affine family over Z_p is the standard, scalable substitute (also
what MLlib's MinHashLSH uses).  All coefficients come from
``MinHashLSHConfig.hash_params()`` so Spark and the DuckDB oracle use the
same literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MERSENNE_PRIME


def affine_hash(x: Column, a: int, b: int, prime: int = MERSENNE_PRIME) -> Column:
    """(a*x + b) mod p on a positive bigint column — exact in int64."""
    return (F.lit(a) * x + F.lit(b)) % F.lit(prime)


def md5_id(col: Column, prime: int = MERSENNE_PRIME) -> Column:
    """Bigint id in [0, p) from the first 15 hex chars (60 bits) of
    md5 — pure map-side like 'xxhash', but md5 is identical in every
    engine, so the DuckDB oracle reproduces it bit-for-bit (the SQL twin
    parses the same 15 hex chars with literal powers of 16).  The mod-p
    reduction keeps a*id + b inside int64 for the affine family."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % F.lit(prime)


def xxhash_id(col: Column, prime: int = MERSENNE_PRIME) -> Column:
    """Positive bigint id in [1, p] straight from xxhash64 — the no-vocabulary
    scale path (no global rank, no shuffle on shingle).  Not reproducible in
    the DuckDB oracle (different hash function), so only the 'xxhash'
    id_strategy uses it."""
    return F.pmod(F.xxhash64(col), F.lit(prime)) + F.lit(1)
