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


def md5_long(col: Column) -> Column:
    """Bigint in [0, 2^60) from the first 15 hex chars of md5 — THE
    engine-portable hash of this repo.  md5 is identical in every
    engine, so the DuckDB oracle reproduces the value bit-for-bit
    (queries/_base.py _md5_parse_sql parses the same 15 chars with literal
    powers of 16).  Every md5-derived id/bucket/band hash MUST route
    through this one expression: shingle ids, exact-Jaccard set ids,
    compact band keys, and sampling buckets all share it, so a change
    here is a change to the cross-engine contract."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_id(col: Column, prime: int = MERSENNE_PRIME) -> Column:
    """``md5_long`` reduced mod p — the 'md5' shingle-id strategy.  The
    mod-p reduction keeps a*id + b inside int64 for the affine family."""
    return md5_long(col) % F.lit(prime)


def xxhash_id(col: Column, prime: int = MERSENNE_PRIME) -> Column:
    """Positive bigint id in [1, p] straight from xxhash64 — the no-vocabulary
    scale path (no global rank, no shuffle on shingle).  Not reproducible in
    the DuckDB oracle (different hash function), so only the 'xxhash'
    id_strategy uses it."""
    return F.pmod(F.xxhash64(col), F.lit(prime)) + F.lit(1)
