"""MinHash signatures (P3) — the algorithmic core of reference job 2.

Reference: per line, build a dense one-hot against the vocabulary
(MinHashLSH.java:74-85, O(vocab) per doc) then for each permutation scan
for the first hot position (:87-109, O(n^2) via indexOf).  Rebuild: the
textbook equivalent min over a universal hash family,

    sig_j(doc) = min over shingles s of  (a_j * id(s) + b_j) mod p

computed as ONE ``groupBy(doc_id)`` with ``num_hashes`` min-aggregates —
a single shuffle, map-side partial aggregation for free, no vectors
materialized, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import (
    affine_hash,
    md5_id,
    xxhash_id,
)
from mapreduce_minhash_lsh_spark.operators.shingling import vocabulary


def shingle_ids(doc_shingles: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, shingle_id) under cfg.id_strategy.

    'rank'  : broadcast-join against the lexicographic vocabulary (small
              vocab) or shuffle-join (large) — Catalyst/AQE picks; exactly
              reproducible in SQL for the oracle.
    'md5'   : pure map-side md5-derived id — no vocabulary, no extra
              shuffle, AND engine-portable (the oracle parses the same
              hex): scale path + oracle-checkable at once.
    'xxhash': pure map-side xxhash64 — cheapest, not oracle-checkable.
    """
    if cfg.id_strategy == "md5":
        return doc_shingles.select(
            "doc_id", md5_id(F.col("shingle"), cfg.prime).alias("shingle_id")
        )
    if cfg.id_strategy == "xxhash":
        return doc_shingles.select(
            "doc_id", xxhash_id(F.col("shingle"), cfg.prime).alias("shingle_id")
        )
    vocab = vocabulary(doc_shingles)
    return doc_shingles.join(vocab, "shingle").select("doc_id", "shingle_id")


def minhash_signatures_array(
    doc_shingles: DataFrame, cfg: MinHashLSHConfig
) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, sig: array<long>) — the primary shape.

    The wide num_hashes-min-aggregate plan packed into an array by a pure
    projection.  Shapes measured at sf0.1 (5k docs, n=128, local[32]):

    * wide named min-aggregates: ~1.3 s warm, whole-stage-codegen'd
      (the one-off Janino compile of the 128-agg signature measured
      <1 s in-process — the ~6 s cold-start billed to it in BENCH_r01
      was page-cache/JIT, not codegen);
    * collect_list + nested expression ``transform``: ~2 s warm —
      higher-order functions stay outside whole-stage codegen, so the
      128 x |shingles| lambda evals are interpreted;
    * explode-by-params long formulation: ~1.5-2 s warm and a recurring
      128x row fan-out before the partial aggregate.

    The wide aggregate also streams (constant per-group state — no
    per-doc shingle list materialized), which is the property that
    matters for multi-GB documents at 100 TB.
    """
    wide = minhash_signatures(doc_shingles, cfg)
    return wide.select(
        "doc_id",
        F.array(*[F.col(f"mh_{j}") for j in range(cfg.num_hashes)]).alias("sig"),
    )


def minhash_signatures(doc_shingles: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, mh_0 .. mh_{n-1}) wide signature.

    One shuffle on doc_id; the n mins ride the same exchange and the
    whole aggregate is whole-stage-codegen'd (the reference needed a
    whole MR job plus a distributed-cache fan-out for this step —
    MinHashLSH.java:43-143).
    """
    ids = shingle_ids(doc_shingles, cfg)
    aggs = [
        F.min(affine_hash(F.col("shingle_id"), a, b, cfg.prime)).alias(f"mh_{j}")
        for j, (a, b) in enumerate(cfg.hash_params())
    ]
    return ids.groupBy("doc_id").agg(*aggs)


def signatures_long(doc_shingles: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """(doc_id, h, minhash) long format — the SQL-oracle-friendly shape."""
    arr = minhash_signatures_array(doc_shingles, cfg)
    return arr.select("doc_id", F.posexplode("sig").alias("h", "minhash"))


def oph_signatures_array(
    doc_shingles: DataFrame, cfg: MinHashLSHConfig
) -> DataFrame:
    """(doc_id, shingle) -> (doc_id, sig: array<long>) via ONE-PERMUTATION
    HASHING with rotation densification — cfg.sig_strategy='oph'.

    The affine family pays num_hashes multiply-mods per shingle row; at
    100 TB the signature stage is corpus_size x num_hashes of CPU.  OPH
    (Li/Owen/Zhang 2012) hashes each shingle ONCE, partitions the hash
    space into num_hashes buckets (shingle_id mod n), and takes the min
    per non-empty bucket; empty buckets borrow the next non-empty
    bucket's min circularly (Shrivastava/Li 2014 rotation), offset by
    prime * borrow-distance so two docs that borrow from different
    distances can never spuriously agree.  Per-shingle work drops
    ~num_hashes-fold; collision probability per position remains ~J.

    Plan: one aggregate over the big shingle relation (groupBy doc_id,
    bucket — map-side partials shrink it to <=n rows/doc/partition),
    then the densification runs on the TINY (doc x 2n)-slot relation:
    explode 2n slots (circular unroll), left-join the bucket mins, one
    `first(..., ignorenulls)` window forward-scan, re-collect to the
    n-array.  Every post-aggregate relation is n-bounded per doc, so
    the 100 TB cost is the single pass over the shingles.

    Engine-portable under the 'md5'/'rank' id strategies (integer mins
    and distances only) — the DuckDB oracle replays it exactly.
    """
    ids = shingle_ids(doc_shingles, cfg)
    b1 = ids.groupBy(
        "doc_id", (F.col("shingle_id") % cfg.num_hashes).alias("bucket")
    ).agg(F.min("shingle_id").alias("bmin"))
    return oph_sig_from_buckets(b1, cfg)


def oph_sig_from_buckets(b1: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """(doc_id, bucket, bmin) -> (doc_id, sig) — the densification half
    of OPH, shared by :func:`oph_signatures_array` and the fused
    ``signature_set_relation`` (which carries per-bucket shingle sets
    through the same aggregate)."""
    n = cfg.num_hashes
    slots = (
        b1.select("doc_id")
        .distinct()
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(2 * n - 1))).alias("slot"),
        )
    )
    unrolled = b1.select(
        "doc_id", F.col("bucket").alias("slot"), "bmin"
    ).unionByName(
        b1.select("doc_id", (F.col("bucket") + n).alias("slot"), "bmin")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = (
        slots.join(unrolled, ["doc_id", "slot"], "left")
        .select(
            "doc_id",
            "slot",
            F.first("bmin", ignorenulls=True).over(w).alias("fv"),
            F.first(
                F.when(F.col("bmin").isNotNull(), F.col("slot")),
                ignorenulls=True,
            ).over(w).alias("fs"),
        )
        .where(F.col("slot") < n)
    )
    sig_rows = filled.select(
        "doc_id",
        "slot",
        # prime * distance must multiply as LONG: prime fits int32, so an
        # int-typed product overflows at distance >= 2
        (
            F.col("fv")
            + F.lit(cfg.prime).cast("long")
            * (F.col("fs") - F.col("slot")).cast("long")
        ).alias("mh"),
    )
    return sig_rows.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("slot", "mh"))),
            lambda s: s["mh"],
        ).alias("sig")
    )
