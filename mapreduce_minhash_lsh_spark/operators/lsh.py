"""LSH banding + candidate generation (P4, J1, F2) — reference job 2's
shuffle/reduce side, rebuilt as a band-key equi-self-join.

Reference: signatures are split into bands whose values (comma-joined,
WITHOUT the band index — a defect: buckets from different bands merge,
MinHashLSH.java:138-142) key an MR shuffle; one reducer then does an
O(m^2) nested-loop over each bucket (MinHashLSH.java:168-193) with a
vacuous similarity filter (it compares a signature to itself, :176).

Rebuild: band key = (band_idx, joined values) — band-indexed, fixing the
collision defect — and candidates come from a hash/sort-merge *equi-join*
of the band table with itself, which Spark shuffles, spills, and
AQE-skew-splits; the quadratic work is bounded per bucket and
parallelized instead of serialized into one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import md5_long
from mapreduce_minhash_lsh_spark.operators.minhash import minhash_signatures


def band_keys(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """Signatures -> (doc_id, band, band_key).

    Accepts either shape: the array form (doc_id, sig) from
    ``minhash_signatures_array`` (primary — small generated code) or the
    wide (mh_0..mh_{n-1}) form.  band_key joins the band's r minhash
    values with ',' in hash order — same encoding as the reference
    (MinHashLSH.java:135-141) plus the band index carried alongside.
    posexplode keeps this a pure map-side reshape (no shuffle).
    """
    r = cfg.rows_per_band
    if "sig" in signatures.columns:
        keys = F.array(*[
            F.array_join(
                F.transform(
                    F.slice("sig", band * r + 1, r), lambda x: x.cast("string")
                ),
                ",",
            )
            for band in range(cfg.num_bands)
        ])
    else:
        keys = F.array(*[
            F.concat_ws(",", *[F.col(f"mh_{band * r + i}") for i in range(r)])
            for band in range(cfg.num_bands)
        ])
    return signatures.select(
        "doc_id", F.posexplode(keys).alias("band", "band_key")
    )


def compact_band_keys(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """``band_keys`` with the key bucketed to a 60-bit md5 long.

    The comma-joined band key is ~10 chars per minhash value (~170 B at
    r=16); the bucket self-join shuffles and hash-probes it once per
    band row, and at the 10x probe that string handling was most of the
    join's 3.6 s.  Hashing the key to the 60-bit md5 prefix (same parse
    the DuckDB oracle replays — functions/hashing.py:md5_id) cuts the
    key to 8 B.  A 60-bit collision would only ADD a candidate pair
    (p ~ n_buckets^2/2^61 — vanishing), and every candidate still passes
    exact verification, so the pipeline result is unchanged; the oracle
    buckets on the identical hash, so even the candidate list stays
    bit-exact across engines.
    """
    bk = band_keys(signatures, cfg)
    return bk.select(
        "doc_id", "band", md5_long(F.col("band_key")).alias("band_key")
    )


def xxhash_band_keys(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """``band_keys`` semantics with the key computed as ONE ``xxhash64``
    over (band index, the band's r minhash longs) — the production band
    strategy.

    Versus :func:`compact_band_keys` this skips BOTH intermediate
    representations: no comma-joined string is ever materialized (the r
    longs are hashed directly, seeded by the band index so identical
    value-slices in different bands cannot collide into one bucket) and
    no cryptographic md5 runs per band row.  At N docs x b bands that
    removes ~170 B of string building plus an md5 per row from the
    widest relation the flagship shuffles.  Not oracle-replayable
    (DuckDB has no xxhash64), so the md5 form stays the default for
    checked queries; a 64-bit collision only ADDs a candidate pair,
    which exact verification then scores — tests pin that the verified
    output is identical to the md5 path.
    """
    r = cfg.rows_per_band
    if "sig" in signatures.columns:
        def cols(band: int) -> list:
            return [F.col("sig")[band * r + i] for i in range(r)]
    else:
        def cols(band: int) -> list:
            return [F.col(f"mh_{band * r + i}") for i in range(r)]
    keys = F.array(*[
        F.xxhash64(F.lit(band), *cols(band)) for band in range(cfg.num_bands)
    ])
    return signatures.select(
        "doc_id", F.posexplode(keys).alias("band", "band_key")
    )


def bands_for(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """Dispatch on ``cfg.band_key_strategy``: 'md5' (engine-portable,
    oracle-checkable — default) or 'xxhash' (cheapest; production)."""
    if cfg.band_key_strategy == "xxhash":
        return xxhash_band_keys(signatures, cfg)
    return compact_band_keys(signatures, cfg)


def _key_array(signatures: DataFrame, cfg: MinHashLSHConfig):
    """Column: array of num_bands compact band keys (one long per band),
    under cfg.band_key_strategy — the per-doc band-key vector."""
    r = cfg.rows_per_band
    if "sig" in signatures.columns:
        def cols(band: int) -> list:
            return [F.col("sig")[band * r + i] for i in range(r)]
        def joined(band: int):
            return F.array_join(
                F.transform(
                    F.slice("sig", band * r + 1, r), lambda x: x.cast("string")
                ),
                ",",
            )
    else:
        def cols(band: int) -> list:
            return [F.col(f"mh_{band * r + i}") for i in range(r)]
        def joined(band: int):
            return F.concat_ws(",", *cols(band))
    if cfg.band_key_strategy == "xxhash":
        return F.array(*[
            F.xxhash64(F.lit(band), *cols(band)) for band in range(cfg.num_bands)
        ])
    return F.array(*[md5_long(joined(band)) for band in range(cfg.num_bands)])


def banded_pairs(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """Uncapped candidate pairs WITHOUT the global distinct: each pair is
    emitted exactly once, by its LOWEST agreeing band.

    ``candidate_pairs`` emits a pair once per agreeing band and
    deduplicates with a ``.distinct()`` — for near-identical docs all b
    bands agree, so the distinct shuffles ~b rows per true pair (the
    widest shuffle of the flagship at the 10x probe).  Here each band
    row carries the doc's full band-key vector (b longs — +~64 B on the
    band relation, negligible), and after the equi-join a codegen'd
    CASE-over-band filter keeps the match only if NO earlier band also
    matched.  Two docs can match a given band in exactly one bucket
    (the bucket IS their shared key), so "lowest agreeing band" is
    unique — each pair survives exactly once and the distinct (a full
    shuffle + hash-dedup of the pair fan-out) disappears.

    Only for the UNCAPPED path: with ``max_bucket_size`` dropping
    oversized buckets, a pair whose lowest agreeing band was dropped
    would be suppressed in its surviving later band (the filter checks
    key equality, not bucket survival) — ``candidate_pairs`` keeps the
    distinct-based form for the capped modes.
    """
    bands = signatures.select(
        "doc_id", _key_array(signatures, cfg).alias("keys")
    ).select("doc_id", "keys", F.posexplode("keys").alias("band", "band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    # CASE band WHEN i: did any band j < i match?  Plain getItem+OR chains
    # stay inside whole-stage codegen (no higher-order functions).
    not_earlier = F.when(F.col("band") == 0, F.lit(True))
    for bi in range(1, cfg.num_bands):
        earlier = F.col("a.keys")[0] == F.col("b.keys")[0]
        for j in range(1, bi):
            earlier = earlier | (F.col("a.keys")[j] == F.col("b.keys")[j])
        not_earlier = not_earlier.when(F.col("band") == bi, ~earlier)
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(not_earlier)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )


def _pairs_from(bands: DataFrame, keys: list[str]) -> DataFrame:
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, keys)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )


def banded_cross_pairs(
    sig_a: DataFrame, sig_b: DataFrame, cfg: MinHashLSHConfig
) -> DataFrame:
    """Asymmetric (a-side vs b-side) candidate pairs with lowest-band
    emission — the cross-corpus twin of :func:`banded_pairs`: each
    (a, b) pair is emitted by its lowest agreeing band only, so no
    global distinct over the band fan-out.  Returns (doc_id_a,
    doc_id_b) with a-side ids always in doc_id_a.  Uncapped only, same
    reasoning as banded_pairs."""
    def _bands(sig: DataFrame, side: str) -> DataFrame:
        return sig.select(
            "doc_id", _key_array(sig, cfg).alias("keys")
        ).select(
            F.col("doc_id").alias(f"doc_id_{side}"),
            F.col("keys").alias(f"keys_{side}"),
            F.posexplode("keys").alias("band", "band_key"),
        )

    a, b = _bands(sig_a, "a"), _bands(sig_b, "b")
    not_earlier = F.when(F.col("band") == 0, F.lit(True))
    for bi in range(1, cfg.num_bands):
        earlier = F.col("keys_a")[0] == F.col("keys_b")[0]
        for j in range(1, bi):
            earlier = earlier | (F.col("keys_a")[j] == F.col("keys_b")[j])
        not_earlier = not_earlier.when(F.col("band") == bi, ~earlier)
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .where(not_earlier)
        .select("doc_id_a", "doc_id_b")
    )


def candidate_pairs(
    bands: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int | None = None,
    oversize: str = "drop",
) -> DataFrame:
    """(doc_id, band, band_key) -> distinct (doc_id_a < doc_id_b) pairs.

    ``max_bucket_size`` bounds pathological buckets (near-identical
    boilerplate at web scale makes single buckets with 10^6 members ->
    10^12 pairs).  Two policies:

    - ``oversize="drop"``: oversized buckets are discarded — trades
      recall for survival.
    - ``oversize="split"``: full recall with the SAME per-task bound.
      Each oversized bucket's members are hashed into ``B = ceil(n /
      max_bucket_size)`` sub-blocks (xxhash64 — uniform regardless of id
      structure) and replicated to the B unordered block-pairs they
      participate in — the triangle decomposition proven in
      ``ann.cosine_pairs``.  The equi-join is then keyed by (band,
      band_key, gi, gj), so per-join-key membership is <= 2 blocks ~
      2*max_bucket_size rows and the quadratic work is sliced across
      B*(B+1)/2 independent keys instead of one hot key.  An unordered
      pair (p-block, q-block) co-occupies exactly one group when p != q;
      intra-block pairs are claimed only by the diagonal group (gi==gj)
      — so every pair is emitted exactly once before the final distinct.
      Replication cost: n*B ~ n^2/cap rows per hot bucket — same order
      as the pair output itself, i.e. the unavoidable price of full
      recall, NOT an extra asymptotic term.

    AQE skew-join handles moderate skew below the cap in both modes.
    """
    if max_bucket_size is None:
        return _pairs_from(bands, ["band", "band_key"]).distinct()
    if oversize not in ("drop", "split"):
        raise ValueError("oversize must be 'drop' or 'split'")
    sized = bands.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
    bands = bands.join(sized, ["band", "band_key"])
    small = _pairs_from(
        bands.where(F.col("_n") <= max_bucket_size).drop("_n"),
        ["band", "band_key"],
    )
    if oversize == "drop":
        return small.distinct()
    nblk = F.ceil(F.col("_n") / F.lit(max_bucket_size)).cast("int")
    big = (
        bands.where(F.col("_n") > max_bucket_size)
        .select(
            "doc_id", "band", "band_key",
            F.pmod(F.xxhash64("doc_id"), nblk).cast("int").alias("blk"),
            nblk.alias("_nblk"),
        )
        .select(
            "doc_id", "band", "band_key", "blk",
            F.explode(F.sequence(F.lit(0), F.col("_nblk") - 1)).alias("h"),
        )
        .select(
            "doc_id", "band", "band_key", "blk",
            F.least("blk", "h").alias("gi"),
            F.greatest("blk", "h").alias("gj"),
        )
    )
    a, b = big.alias("a"), big.alias("b")
    big_pairs = (
        a.join(b, ["band", "band_key", "gi", "gj"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        # exactly-once claim: diagonal groups own intra-block pairs,
        # off-diagonal groups own cross-block pairs
        .where(
            F.when(F.col("gi") == F.col("gj"), F.col("a.blk") == F.col("b.blk"))
            .otherwise(F.col("a.blk") != F.col("b.blk"))
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    return small.unionByName(big_pairs).distinct()


def lsh_candidates(
    doc_shingles: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int | None = None,
    oversize: str = "drop",
) -> DataFrame:
    """(doc_id, shingle) -> candidate pairs, end to end."""
    return candidate_pairs(
        bands_for(minhash_signatures(doc_shingles, cfg), cfg),
        cfg,
        max_bucket_size,
        oversize,
    )
