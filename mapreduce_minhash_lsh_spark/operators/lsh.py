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
    under cfg.band_key_strategy — the per-doc band-key vector.

    Built as ONE SQL-parsed expression (r14): the Column form cost
    ~0.2-0.5 s of driver-side py4j per construction, paid by every
    similarity-family query; the parsed tree (and so the plan and every
    key value) is identical — md5_long's conv/substring parse and the
    band-indexed xxhash64 are rendered verbatim."""
    r = cfg.rows_per_band
    if "sig" in signatures.columns:
        def cols_sql(band: int) -> list[str]:
            return [f"sig[{band * r + i}]" for i in range(r)]
        def joined_sql(band: int) -> str:
            return (
                f"array_join(transform(slice(sig, {band * r + 1}, {r}), "
                "x -> CAST(x AS STRING)), ',')"
            )
    else:
        def cols_sql(band: int) -> list[str]:
            return [f"mh_{band * r + i}" for i in range(r)]
        def joined_sql(band: int) -> str:
            return "concat_ws(','," + ",".join(cols_sql(band)) + ")"
    if cfg.band_key_strategy == "xxhash":
        keys = ",".join(
            f"xxhash64({band}," + ",".join(cols_sql(band)) + ")"
            for band in range(cfg.num_bands)
        )
    else:
        keys = ",".join(
            f"CAST(conv(substring(md5({joined_sql(band)}), 1, 15), 16, 10) AS BIGINT)"
            for band in range(cfg.num_bands)
        )
    return F.expr(f"array({keys})")


def _not_earlier(
    cfg: MinHashLSHConfig,
    keys_a: str,
    keys_b: str,
    survs_a: str | None = None,
):
    """CASE-over-band filter: keep a band match only if NO earlier band
    also matched (and, when a survival vector is supplied, survived the
    bucket-size cap).  ``keys_a``/``keys_b``/``survs_a`` are SQL
    fragment templates with a ``{j}`` placeholder (e.g. ``"a.keys[{j}]"``)
    — the whole CASE is rendered as text and parsed once (r14: the
    Column-built chain cost ~0.4-0.5 s of driver-side py4j per
    construction; the parsed tree is identical).  Plain getItem+AND/OR
    chains stay inside whole-stage codegen (no higher-order functions);
    survival is a bucket property, so when keys agree at band j both
    sides' survival flags are equal and side a's suffices."""
    def match(j: int) -> str:
        c = f"({keys_a.format(j=j)} = {keys_b.format(j=j)})"
        if survs_a is not None:
            c = f"({c} AND {survs_a.format(j=j)})"
        return c

    whens = ["WHEN band = 0 THEN true"]
    for bi in range(1, cfg.num_bands):
        earlier = " OR ".join(match(j) for j in range(bi))
        whens.append(f"WHEN band = {bi} THEN NOT ({earlier})")
    return F.expr("CASE " + " ".join(whens) + " END")


def banded_pairs(signatures: DataFrame, cfg: MinHashLSHConfig) -> DataFrame:
    """Uncapped candidate pairs WITHOUT the global distinct: each pair is
    emitted exactly once, by its LOWEST agreeing band.

    The distinct-based form emits a pair once per agreeing band and
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

    Capped twin: :func:`banded_pairs_capped` (lowest SURVIVING band).
    """
    bands = signatures.select(
        "doc_id", _key_array(signatures, cfg).alias("keys")
    ).select("doc_id", "keys", F.posexplode("keys").alias("band", "band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(_not_earlier(cfg, "a.keys[{j}]", "b.keys[{j}]"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )


def candidate_volume_bound(
    rel: DataFrame,
    cfg: MinHashLSHConfig,
    rel_b: DataFrame | None = None,
    bucket_cap: int | None = None,
) -> int:
    """Upper bound on the DISTINCT candidate pairs the band join over
    ``rel`` (x ``rel_b`` cross-corpus) can emit — sum over (band,
    bucket) of C(n, 2) (or n_a * n_b) — computed BEFORE any pair
    exists: one partial-aggregated shuffle of (band_key, count) rows,
    never the pairs themselves.  It is a bound, not an estimate:
    lowest-band emission / the cross-corpus distinct only ever emit
    FEWER distinct pairs than the per-band sum, so "bound <= budget"
    proves the unbarriered verify join is safe.

    This is the pair-volume valve's cheap trigger (VERDICT r9 #2): the
    always-on persist+count of the full candidate list — a 12%
    flagship premium at benign scale — is replaced by this scalar; the
    exact count is paid only when the bound exceeds budget, i.e. when
    chunking is already on the table.

    ``bucket_cap`` mirrors ``oversize='drop'`` (a capped bucket emits
    nothing).  Under 'split'/'auto' leave it None: splitting preserves
    the bucket's pair set, so C(n, 2) still bounds it.
    """
    def _bands(r: DataFrame) -> DataFrame:
        return r.select(
            F.posexplode(_key_array(r, cfg)).alias("band", "band_key")
        )

    if rel_b is None:
        sized = _bands(rel).groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("na")
        )
        contrib = F.expr("na * (na - 1) div 2")
        fits = F.col("na") <= bucket_cap if bucket_cap is not None else None
    else:
        sized = (
            _bands(rel).withColumn("side", F.lit(0))
            .unionByName(_bands(rel_b).withColumn("side", F.lit(1)))
            .groupBy("band", "band_key")
            .agg(
                F.count(F.when(F.col("side") == 0, 1)).alias("na"),
                F.count(F.when(F.col("side") == 1, 1)).alias("nb"),
            )
        )
        contrib = F.col("na") * F.col("nb")
        fits = (
            (F.col("na") <= bucket_cap) & (F.col("nb") <= bucket_cap)
            if bucket_cap is not None else None
        )
    if fits is not None:
        contrib = F.when(fits, contrib).otherwise(F.lit(0))
    row = sized.agg(F.sum(contrib).alias("est")).first()
    return int(row.est or 0)


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
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .where(_not_earlier(cfg, "keys_a[{j}]", "keys_b[{j}]"))
        .select("doc_id_a", "doc_id_b")
    )


# Buckets above this many members go through the triangle split under
# oversize='auto'; smaller ones take the plain per-bucket join, which AQE
# handles comfortably.  Measured crossover (SCALE.md §7): a 1 250-member
# bucket is pure overhead to split (plain join 0.77 s vs split 2.94 s),
# a 5 000-member bucket splits 1.9x faster than AQE-only (21.9 s vs
# 42.0 s) — the boundary sits between 10^3 and 10^4.
AUTO_SPLIT_THRESHOLD = 2048


def candidate_pairs(
    bands: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int | None = None,
    oversize: str = "drop",
    auto_split_threshold: int = AUTO_SPLIT_THRESHOLD,
) -> DataFrame:
    """(doc_id, band, band_key) -> distinct (doc_id_a < doc_id_b) pairs.

    ``max_bucket_size`` bounds pathological buckets (near-identical
    boilerplate at web scale makes single buckets with 10^6 members ->
    10^12 pairs).  Three policies:

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
      — so every pair is emitted exactly once.  Replication cost: n*B ~
      n^2/cap rows per hot bucket — same order as the pair output
      itself, i.e. the unavoidable price of full recall, NOT an extra
      asymptotic term.
    - ``oversize="auto"``: full recall like 'split', but the triangle
      decomposition is engaged only for buckets above
      ``auto_split_threshold`` (default the measured plain-join/split
      crossover); buckets between ``max_bucket_size`` and the threshold
      take the plain join, where AQE's skew handling is measured faster
      than paying the split's block replication.

    Since round 5 every capped mode emits each pair EXACTLY ONCE — by
    its lowest agreeing band whose bucket survived the cap — so the
    global pair ``.distinct()`` (the widest shuffle of the capped
    pipeline: ~num_bands rows per true pair) is gone from the
    production path too, matching :func:`banded_pairs`.  The price is
    one groupBy(doc_id) over the docs x num_bands band relation to
    rebuild each doc's per-band (key, survival) vectors — bounded by
    corpus size, never by pair volume.  Prefer
    :func:`banded_pairs_capped` when signatures are at hand: it skips
    that regroup entirely for the full-recall modes.

    AQE skew-join handles moderate skew below the cap in all modes.
    """
    if max_bucket_size is None:
        return _pairs_from(bands, ["band", "band_key"]).distinct()
    _check_oversize(oversize)
    docvec = bands.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("band", "band_key"))),
            lambda s: s["band_key"],
        ).alias("keys")
    )
    return _capped_pairs(docvec, cfg, max_bucket_size, oversize, auto_split_threshold)


def banded_pairs_capped(
    signatures: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int,
    oversize: str = "drop",
    auto_split_threshold: int = AUTO_SPLIT_THRESHOLD,
) -> DataFrame:
    """Capped candidate pairs straight from signatures — the production
    entry: the per-doc band-key vector is computed MAP-SIDE from the
    signature (no regroup), so the full-recall modes ('split'/'auto')
    add zero shuffles over the uncapped :func:`banded_pairs` beyond the
    bucket-size aggregate, and 'drop' pays only the docs x num_bands
    survival regroup.  Policies and exactly-once emission as documented
    on :func:`candidate_pairs`."""
    _check_oversize(oversize)
    docvec = signatures.select(
        "doc_id", _key_array(signatures, cfg).alias("keys")
    )
    return _capped_pairs(docvec, cfg, max_bucket_size, oversize, auto_split_threshold)


def _check_oversize(oversize: str) -> None:
    if oversize not in ("drop", "split", "auto"):
        raise ValueError("oversize must be 'drop', 'split' or 'auto'")


def _capped_pairs(
    docvec: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int,
    oversize: str,
    auto_split_threshold: int,
) -> DataFrame:
    """(doc_id, keys: array<long>) -> capped candidate pairs, each pair
    emitted exactly once by its lowest surviving agreeing band."""
    rows = docvec.select(
        "doc_id", "keys", F.posexplode("keys").alias("band", "band_key")
    )
    sized = rows.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
    rows = rows.join(sized, ["band", "band_key"])

    if oversize == "drop":
        # Survival is a global bucket property, so each doc's per-band
        # survival vector needs one regroup of the docs x num_bands
        # relation — the (bounded) price of dropping the pair-fanout
        # distinct.  The join then runs on surviving rows only, and the
        # lowest-band filter checks key equality AND survival.
        flagged = rows.select(
            "doc_id", "band", "band_key",
            (F.col("_n") <= max_bucket_size).alias("_s"),
        )
        vecs = flagged.groupBy("doc_id").agg(
            F.array_sort(
                F.collect_list(F.struct("band", "band_key", "_s"))
            ).alias("v")
        )
        surv_rows = (
            vecs.select(
                "doc_id",
                F.transform("v", lambda s: s["band_key"]).alias("keys"),
                F.transform("v", lambda s: s["_s"]).alias("survs"),
            )
            .select(
                "doc_id", "keys", "survs",
                F.posexplode("keys").alias("band", "band_key"),
            )
            .where(F.element_at("survs", F.col("band") + 1))
        )
        a, b = surv_rows.alias("a"), surv_rows.alias("b")
        return (
            a.join(b, ["band", "band_key"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .where(
                _not_earlier(
                    cfg, "a.keys[{j}]", "b.keys[{j}]", "a.survs[{j}]"
                )
            )
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
        )

    # Full-recall modes: every bucket emits (plain join below the split
    # threshold, triangle decomposition above), so survival is vacuous
    # and the lowest-band filter needs keys only.
    thr = (
        max_bucket_size
        if oversize == "split"
        else max(max_bucket_size, auto_split_threshold)
    )
    ne = _not_earlier(cfg, "a.keys[{j}]", "b.keys[{j}]")
    small_rows = rows.where(F.col("_n") <= thr).drop("_n")
    a, b = small_rows.alias("a"), small_rows.alias("b")
    small = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ne)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    # The lowest-band filter only inspects keys at bands EARLIER than
    # the row's own band, so the ~nblk-fold triangle-split replication
    # carries the prefix slice keys[0..band-1] (avg num_bands/2 longs,
    # zero for band 0) instead of the full vector — roughly halving the
    # widest shuffle of the hot-bucket path.  (Re-attaching keys via a
    # post-join against the doc-bounded docvec was considered and
    # rejected: it would shuffle the PAIR relation — per hot bucket
    # ~n^2/2 rows, vs n^2/cap replica rows here — twice, strictly more
    # bytes whenever cap >> num_bands/2.)
    nblk = F.ceil(F.col("_n") / F.lit(max_bucket_size)).cast("int")
    ne_prefix = _not_earlier(cfg, "a.pkeys[{j}]", "b.pkeys[{j}]")
    big_rows = (
        rows.where(F.col("_n") > thr)
        .select(
            "doc_id",
            F.slice("keys", F.lit(1), F.col("band")).alias("pkeys"),
            "band", "band_key",
            F.pmod(F.xxhash64("doc_id"), nblk).cast("int").alias("blk"),
            nblk.alias("_nblk"),
        )
        .select(
            "doc_id", "pkeys", "band", "band_key", "blk",
            F.explode(F.sequence(F.lit(0), F.col("_nblk") - 1)).alias("h"),
        )
        .select(
            "doc_id", "pkeys", "band", "band_key", "blk",
            F.least("blk", "h").alias("gi"),
            F.greatest("blk", "h").alias("gj"),
        )
    )
    a, b = big_rows.alias("a"), big_rows.alias("b")
    big_pairs = (
        a.join(b, ["band", "band_key", "gi", "gj"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        # exactly-once claim within the bucket: diagonal groups own
        # intra-block pairs, off-diagonal groups own cross-block pairs
        .where(
            F.when(F.col("gi") == F.col("gj"), F.col("a.blk") == F.col("b.blk"))
            .otherwise(F.col("a.blk") != F.col("b.blk"))
        )
        .where(ne_prefix)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    return small.unionByName(big_pairs)


def lsh_candidates(
    doc_shingles: DataFrame,
    cfg: MinHashLSHConfig,
    max_bucket_size: int | None = None,
    oversize: str = "drop",
    auto_split_threshold: int = AUTO_SPLIT_THRESHOLD,
) -> DataFrame:
    """(doc_id, shingle) -> candidate pairs, end to end.  Signatures are
    at hand here, so the capped modes take the regroup-free
    :func:`banded_pairs_capped` production path."""
    sig = minhash_signatures(doc_shingles, cfg)
    if max_bucket_size is None:
        return candidate_pairs(bands_for(sig, cfg), cfg)
    return banded_pairs_capped(
        sig, cfg, max_bucket_size, oversize, auto_split_threshold
    )
