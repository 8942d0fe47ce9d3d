"""Candidate verification + the flagship similar-pairs pipeline.

The reference's verification is broken twice over (SURVEY.md §2.7): it
computes Jaccard between a signature and *itself* (MinHashLSH.java:176)
on signature *value sets* rather than positionwise agreement or shingle
sets (:150-166), so every co-bucketed pair survives.  The rebuild
implements the intended MMDS algorithm: candidates from LSH, then EXACT
Jaccard on the true shingle sets,

    J(A,B) = |A n B| / (|A| + |B| - |A n B|)

via joins — |A n B| is a count over the shingle equi-join restricted to
candidate pairs, so only candidate pairs ever pay the verification cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.functions.hashing import md5_long
from mapreduce_minhash_lsh_spark.operators.lsh import (
    banded_pairs,
    banded_pairs_capped,
    bands_for,
    candidate_volume_bound,
)
from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles

# Signature-agreement prefilter slack: the positionwise-agreement MinHash
# estimator has sd sqrt(j(1-j)/n); 0.21 is ~3 sd at n=32, j=0.8, so pairs
# at the threshold survive w.p. ~0.999 while the j~0.5 candidate
# background (which dominates the candidate list) is mostly eliminated
# before the exact verify join.  Part of the pipeline SPEC — the DuckDB
# oracle applies the identical integer cutoff.
EST_SLACK = 0.21

# Last checkpoint dir this module set, per Spark application — guards
# _materialize against re-pointing the session-global checkpoint dir.
_CKPT_DIR_SET: dict[str, str] = {}

# Pair-volume valve default (VERDICT r8 #2): the verify payload join
# carries (sig, sh_set) for BOTH endpoints of every candidate pair, so
# its shuffle footprint is pairs x payload — the first thing to exhaust
# local spill disk when near-dup cliques make true pairs quadratic.
# Measured on this box (SCALE.md §7): 35.4M candidates (80x) complete
# in ~70 GB of spill headroom; ~80M (160x) die.  12M pairs/chunk keeps
# each sequential verify chunk's in-flight payload ~3x under the 80x
# point, so the symmetric flagship degrades to bounded chunks instead
# of dying.  On a real cluster spill is spread across executors, so the
# budget can be raised (or set to None to disable the valve and its
# candidate-count materialization entirely).
PAIR_VERIFY_BUDGET = 12_000_000

# A/B toggle for the valve's payload pre-partition (experiments/
# scale_probe.py --prepart-ab): production always leaves this True; at
# runtime it composes with the n_chunks <= 4 depth gate in
# budgeted_overlap_counts — shallow chunk runs reuse one cached
# hash-partitioned payload relation, deep runs rely on per-chunk
# exchange reuse (the cache measured 2.8x AGAINST at 160x/12 chunks,
# results_r10.json prepart_ab_160).  The flag exists so that effect
# stays a same-session interleaved measurement (VERDICT r9 #3), not a
# cross-session extrapolation.  Values: True (production — depth gate
# applies), "force" (A/B: always pre-partition), False (never).
_VALVE_PREPARTITION = True


def _reset_stats(df: DataFrame) -> DataFrame:
    """Rebuild a (checkpointed) DataFrame as a fresh LogicalRDD WITHOUT
    the origin plan's carried statistics.

    ``Dataset.checkpoint``/``localCheckpoint`` copy the replaced plan's
    ESTIMATED stats onto the new LogicalRDD, and Catalyst's
    size-in-bytes estimator multiplies children for joins — so in an
    iterative operator each round's materialized relation inherits the
    PRODUCT of the previous round's estimates and sizeInBytes compounds
    exponentially: measured digits double per self-join round, and at
    the 160x similar_groups probe the driver spent 40+ minutes inside
    one plan's stats (BigInteger Toom-Cook multiplication on
    million-digit numbers) before this fix.  Rebinding the checkpointed
    RDD through internalCreateDataFrame drops the carried stats (leaf
    reverts to spark.sql.defaultSizeInBytes) without touching data,
    partitioning, or the persisted blocks.  Falls back to the input
    unchanged if the internal constructor is unavailable.
    """
    try:
        jdf = df._jdf
        new_jdf = df.sparkSession._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, df.sparkSession)
    except Exception as exc:  # pragma: no cover - API-drift safety net
        # A silent fallback would quietly restore the exponential-stats
        # pathology this function exists to prevent (40+ min driver
        # stalls at the 160x probe) — make the one log line that
        # diagnoses it loud.  (VERDICT r8: warn, don't just swallow.)
        import warnings

        warnings.warn(
            "internalCreateDataFrame unavailable "
            f"({type(exc).__name__}: {exc}); carried plan statistics NOT "
            "reset — iterative operators (similar_groups, near_dup_*) may "
            "hit exponential sizeInBytes growth on large inputs",
            RuntimeWarning,
            stacklevel=2,
        )
        return df


def _materialize(
    df: DataFrame, checkpoint_dir: str | None, eager: bool = True
) -> DataFrame:
    """Eagerly materialize an intermediate relation, truncating lineage.

    Default (``checkpoint_dir=None``): ``localCheckpoint`` — blocks live
    on executor local storage, zero extra I/O, ideal for local mode and
    short cluster jobs.  The trade-off at 100 TB: a lost executor loses
    its blocks and the whole action recomputes from scratch.  With a
    ``checkpoint_dir`` (HDFS/S3/local path), switch to a RELIABLE
    ``checkpoint``: blocks persist to shared storage and survive executor
    loss, at the cost of one write+read of the (small) checkpointed
    relation.  Both paths yield byte-identical results (SCALE.md §8),
    and both strip the checkpoint's carried plan statistics
    (:func:`_reset_stats`) so iterative callers cannot compound them.

    ``eager=False`` (localCheckpoint only): the blocks are saved as a
    side effect of the FIRST action instead of a dedicated one — used
    when the caller immediately runs a cheap full-scan action of its
    own (the valve's pair-volume bound), which then doubles as the
    materialization pass.  The caller MUST run that action before any
    multi-consumer plan reads the relation (the cold-cache branch race,
    SCALE.md §1).  Reliable checkpoints ignore the flag: a lazy
    ``checkpoint()`` re-computes the whole plan in a second job to
    write its files, costing more than the dedicated action saves.
    """
    if checkpoint_dir is None:
        return _reset_stats(df.localCheckpoint(eager=eager))
    # setCheckpointDir is SESSION-GLOBAL; set it once per (session, dir)
    # so repeated materializations don't re-point a dir that other code
    # sharing the session may have configured since.
    sc = df.sparkSession.sparkContext
    if _CKPT_DIR_SET.get(sc.applicationId) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        _CKPT_DIR_SET[sc.applicationId] = checkpoint_dir
    return _reset_stats(df.checkpoint(eager=True))


def min_agree(cfg: MinHashLSHConfig, threshold: float) -> int:
    import math

    return max(0, math.ceil((threshold - EST_SLACK) * cfg.num_hashes))


def exact_jaccard(
    pairs: DataFrame,
    doc_shingles: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Annotate (doc_id_a, doc_id_b) pairs with exact shingle-set Jaccard.

    Plan shape: collect each candidate doc's shingle set ONCE (groupBy
    doc), then two equi-joins attach the arrays to the pair and the
    intersection is a JVM-side ``array_intersect`` — per-pair O(n_a+n_b)
    with no row fan-out.  (The naive alternative — exploding pairs
    against the shingle relation — shuffles |pairs| x |shingles/doc|
    rows; at 100 TB that's the difference between a bounded verify stage
    and a shuffle explosion.)  Only candidate docs' sets are built: the
    groupBy is semi-join-pruned by the pair list.

    The intersection runs on 60-bit md5-derived LONG ids, not the
    shingle strings: primitive-array hashing is ~10x cheaper than
    per-element string hashing, which dominated the verify stage at the
    10x scale probe (array_intersect on string sets: 16.7 s; on long
    sets: ~2 s).  A within-pair 60-bit collision (p ~ 1e-14 at 10^4
    shingles/doc) is the only way this can differ from string-set
    Jaccard — and the DuckDB oracle intersects the raw strings, so
    CORRECTNESS would catch exactly that event.

    ``doc_shingles`` may carry a precomputed 60-bit ``sid`` column
    instead of (or alongside) the ``shingle`` strings — a band store
    (operators/bandstore.py) persists the 8-byte ids rather than the
    strings, and the derivation here is a no-op for it.
    """
    counts = pair_overlap_counts(pairs, doc_shingles, checkpoint_dir)
    return (
        counts.select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("nc").cast("double")
                / (F.col("na") + F.col("nb") - F.col("nc"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") > 0)
    )


def pair_overlap_counts(
    pairs: DataFrame,
    doc_shingles: DataFrame,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, nc, na, nb): exact shingle-set intersection
    and set sizes per candidate pair — the shared core of every
    set-overlap measure (Jaccard in :func:`exact_jaccard`, containment
    in :func:`containment_pairs`).  Plan shape documented on
    exact_jaccard; the returned relation is already materialized."""
    if "sid" in doc_shingles.columns:
        ids = doc_shingles.select("doc_id", "sid")
    else:
        ids = doc_shingles.select(
            "doc_id", md5_long(F.col("shingle")).alias("sid")
        )
    cand_docs = (
        pairs.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        ids.join(cand_docs, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("sid").alias("sh_set"))
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_id_a"), F.col("sh_set").alias("set_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_id_b"), F.col("sh_set").alias("set_b")
    )
    n_common = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    # Materialize (nc, na, nb) BEFORE deriving jaccard: a caller's
    # threshold filter on the derived column gets pushed below the
    # projection by substitution, and with array_intersect outside
    # whole-stage CSE the intersection would be re-evaluated once per
    # reference (measured 3x = 6.4 s -> 0.3 s at 552k pairs).  The
    # checkpointed relation is 5 scalars per candidate pair — the same
    # size class as the candidate list itself, bounded at any scale.
    counts = (
        pairs.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            n_common.alias("nc"),
            F.size("set_a").alias("na"),
            F.size("set_b").alias("nb"),
        )
    )
    return _materialize(counts, checkpoint_dir)


def signature_set_relation(
    doc_shingles: DataFrame,
    cfg: MinHashLSHConfig,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """(doc_id, sig: array<long>, sh_set: array<long>) in ONE shuffle.

    The signature mins and the exact-verify shingle sets both need the
    shingle relation grouped by doc_id; computing them in one aggregate
    halves the passes over the widest relation of the pipeline (and with
    it, the only reason ``similar_pairs`` ever persisted the shingle
    relation — it is now consumed exactly once).  sh_set ids are 60-bit
    md5 (the oracle-certified intersection contract — see exact_jaccard)
    except under the 'xxhash' id strategy, where the whole pipeline is
    off the oracle and xxhash64 is cheaper.

    The relation feeds the band join AND both payload sides of the
    verify join within one action, so it is eagerly materialized
    (cold-cache branch race — SCALE.md §1).  ``eager=False`` lets a
    caller that IMMEDIATELY runs its own full-scan action (the valve's
    pair-volume bound) fold the materialization into that action — one
    pass instead of two; honored only where a lazy localCheckpoint is
    sound (ignored under a reliable ``checkpoint_dir``, whose lazy form
    re-computes the plan to write files, and under 'rank', whose
    shingle persist is scoped to this call's own materialization).
    """
    if checkpoint_dir is not None or cfg.id_strategy == "rank":
        eager = True
    if cfg.id_strategy == "xxhash":
        sid = F.xxhash64(F.col("shingle"))
    else:
        sid = md5_long(F.col("shingle"))
    # Both shingle_id (minhash domain) and sid (set-intersection id)
    # derive map-side from the shingle string — one projection, no join
    # — except 'rank', whose dense ids need the vocabulary join.
    if cfg.id_strategy == "rank":
        from mapreduce_minhash_lsh_spark.operators.shingling import vocabulary

        # 'rank' is the one strategy that consumes doc_shingles TWICE
        # (base projection + the vocabulary pass), so the single-
        # consumption claim below doesn't hold here: persist the shingle
        # relation for the duration of the (eager) materialization, then
        # release it — no cached-RDD growth across repeated calls.
        doc_shingles = doc_shingles.persist()
        try:
            base = (
                doc_shingles.select("doc_id", "shingle", sid.alias("sid"))
                .join(vocabulary(doc_shingles), "shingle")
                .select("doc_id", "shingle_id", "sid")
            )
            return _sig_set_from_base(base, cfg, checkpoint_dir, eager)
        finally:
            doc_shingles.unpersist()
    from mapreduce_minhash_lsh_spark.functions.hashing import (
        md5_id,
        xxhash_id,
    )

    mk = md5_id if cfg.id_strategy == "md5" else xxhash_id
    base = doc_shingles.select(
        "doc_id",
        mk(F.col("shingle"), cfg.prime).alias("shingle_id"),
        sid.alias("sid"),
    )
    return _sig_set_from_base(base, cfg, checkpoint_dir, eager)


def _sig_set_from_base(
    base: DataFrame,
    cfg: MinHashLSHConfig,
    checkpoint_dir: str | None,
    eager: bool = True,
) -> DataFrame:
    """(doc_id, shingle_id, sid) -> the materialized (doc_id, sig,
    sh_set) relation — the strategy-independent aggregate tail of
    :func:`signature_set_relation`."""
    if cfg.sig_strategy == "oph":
        from mapreduce_minhash_lsh_spark.operators.minhash import (
            oph_bucket_map,
            oph_sig_expr,
            oph_sig_from_buckets,
        )

        # One pass over the shingles: per-(doc, bucket) min AND the
        # bucket's shingle set; the doc's verify set is the flatten of
        # its bucket sets (disjoint by construction).
        b1 = base.groupBy(
            "doc_id", (F.col("shingle_id") % cfg.num_hashes).alias("bucket")
        ).agg(
            F.min("shingle_id").alias("bmin"),
            F.collect_set("sid").alias("bset"),
        )
        if cfg.densify == "optimal":
            # Expression densification: sig AND sh_set ride ONE
            # groupBy(doc_id) — no sig/sets join, no densify shuffles.
            g = b1.groupBy("doc_id").agg(
                oph_bucket_map(cfg).alias("_bm"),
                F.flatten(F.collect_list("bset")).alias("sh_set"),
            )
            rel = g.select(
                "doc_id", oph_sig_expr(F.col("_bm"), cfg).alias("sig"), "sh_set"
            )
            return _materialize(rel, checkpoint_dir, eager)
        sets = b1.groupBy("doc_id").agg(
            F.flatten(F.collect_list("bset")).alias("sh_set")
        )
        sig = oph_sig_from_buckets(b1.select("doc_id", "bucket", "bmin"), cfg)
        rel = sig.join(sets, "doc_id")
        return _materialize(
            rel.select("doc_id", "sig", "sh_set"), checkpoint_dir, eager
        )
    # The 128 affine-min aggregates are built as SQL text (r14): the
    # Column form (F.min(affine_hash(...))) costs ~5 py4j round trips
    # per hash — measured 1.5-2.4 s of pure DRIVER-SIDE PYTHON per
    # flagship construction, roughly a third of the whole query's wall
    # clock, paid by every similarity-family query.  r15: even one
    # F.expr(...).alias(...) PER aggregate was still ~2 round trips each
    # (~0.25 s at n=128, profiled as the largest pure-construction item
    # left in the family).  The whole signature now rides ONE
    # array-valued aggregate expression — array(min_0, ..., min_{n-1})
    # directly in the agg list, which is exactly the resultExpressions
    # shape the optimizer produced from the old mh_j-columns + array()
    # projection after CollapseProject, so the optimized plan (same
    # literals, same `(a * x + b) % p` shape — affine_hash's contract)
    # and every value are unchanged; 2 F.expr calls instead of ~130.
    mins = ",".join(
        f"min(({a} * shingle_id + {b}) % {cfg.prime})"
        for a, b in cfg.hash_params()
    )
    rel = base.groupBy("doc_id").agg(
        F.expr(f"array({mins}) AS sig"),
        F.expr("collect_set(sid) AS sh_set"),
    )
    return _materialize(rel, checkpoint_dir)


def fused_overlap_counts(
    pairs: DataFrame,
    rel: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float,
    checkpoint_dir: str | None = None,
    rel_b: DataFrame | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, nc, na, nb) with the signature-agreement
    prefilter FUSED into the verify join: one pair of joins attaches
    (sig, sh_set) payloads, the integer agreement cutoff is evaluated
    first, and ``array_intersect`` runs only on survivors (nc = -1
    marks prefilter-rejected pairs).  Versus the two-stage form this
    saves two joins over the candidate list and one materialization
    barrier; the exact-verification semantics (EST_SLACK cutoff, md5-id
    intersection) are unchanged.  Materialized for the same
    re-evaluation reason as pair_overlap_counts.

    ``rel_b``: optional separate payload relation for the doc_id_b side
    (asymmetric joins — cross-corpus: a-side is always the new corpus,
    b-side the seen corpus, so neither join scans the other's docs)."""
    if rel_b is None:
        rel_b = rel
    cut = min_agree(cfg, threshold)
    pa = rel.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("sig").alias("sig_a"),
        F.col("sh_set").alias("set_a"),
    )
    pb = rel_b.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("sig").alias("sig_b"),
        F.col("sh_set").alias("set_b"),
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    nc = F.when(
        agree >= cut, F.size(F.array_intersect("set_a", "set_b"))
    ).otherwise(F.lit(-1))
    counts = (
        pairs.join(pa, "doc_id_a")
        .join(pb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            nc.alias("nc"),
            F.size("set_a").alias("na"),
            F.size("set_b").alias("nb"),
        )
    )
    return _materialize(counts, checkpoint_dir)


def budgeted_overlap_counts(
    pairs: DataFrame,
    rel: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float,
    checkpoint_dir: str | None = None,
    rel_b: DataFrame | None = None,
    pair_budget: int | None = PAIR_VERIFY_BUDGET,
    est_volume: int | None = None,
) -> DataFrame:
    """:func:`fused_overlap_counts` behind the pair-volume valve
    (VERDICT r8 #2): materialize the candidate list (2 longs/row — the
    cheapest relation of the pipeline), count it, and when the count
    exceeds ``pair_budget`` run the verify join in sequential hash
    chunks of at most ``pair_budget`` pairs instead of one join whose
    pairs x (sig, sh_set) payload shuffle can exhaust local spill disk.

    ``est_volume`` (VERDICT r9 #2): a caller-supplied UPPER BOUND on
    the distinct pairs in ``pairs`` (C(n_docs, 2), or the tighter
    ``lsh.candidate_volume_bound`` — sum of per-bucket C(n,2) — both
    available before the pair join runs).  A bound within 2x budget
    proves the single join safe, so the candidate persist+count
    barrier — the valve's measured 12% always-on premium at benign
    scale — is skipped entirely and the exact round-8 plan runs; the
    barrier is paid only when the bound says chunking is plausibly
    needed.

    The 2x proof slack (both for skipping the barrier and for firing
    chunks off the exact count) is measurement-backed hysteresis, not
    optimism: a single verify join at 35.4M pairs COMPLETES on this
    box's ~70 GB spill headroom (the 80x probe, SCALE.md §7), so
    proving <= 24M with the default 12M budget stays ~1.5x under the
    measured completion point while chunking's fixed premium is saved
    everywhere it cannot pay for itself.  Chunk SIZE stays
    ``pair_budget`` — the per-join in-flight target is unchanged.

    Chunking is a deterministic ``pmod(xxhash64(a, b), n_chunks)``
    partition of the candidate list, each chunk verified and
    materialized independently (5 scalars/pair — candidate-list-sized),
    then unioned: the output rows are IDENTICAL to the unchunked join
    (verification is per-pair arithmetic with no cross-pair state), and
    peak in-flight shuffle is bounded by one chunk.  ``pair_budget=None``
    disables the valve AND the candidate materialization/count,
    restoring the exact round-8 single-join plan.
    """
    if pair_budget is None:
        return fused_overlap_counts(pairs, rel, cfg, threshold, checkpoint_dir, rel_b)
    if est_volume is not None and est_volume <= 2 * pair_budget:
        return fused_overlap_counts(pairs, rel, cfg, threshold, checkpoint_dir, rel_b)
    # persist (NOT _materialize/localCheckpoint): checkpoint blocks can
    # only be freed by driver GC + ContextCleaner, so every flagship
    # call would strand a candidate-list-sized block set on a long
    # session; the cache is an equivalent action barrier here (count()
    # below populates it before any chunk filter reads it) and
    # unpersists deterministically once the eagerly-materialized
    # outputs no longer need it.
    pairs = pairs.select("doc_id_a", "doc_id_b").persist()
    try:
        n_cand = pairs.count()
        if n_cand <= 2 * pair_budget:  # same measured slack as est_volume
            return fused_overlap_counts(
                pairs, rel, cfg, threshold, checkpoint_dir, rel_b
            )
        import logging
        import math

        n_chunks = math.ceil(n_cand / pair_budget)
        logging.getLogger(__name__).warning(
            "pair-volume valve: %d candidate pairs exceed the %d-pair verify "
            "budget; running %d sequential verify chunks (identical output, "
            "bounded spill). For group-level output at this clique density "
            "consider near_dup_groups/similar_groups instead.",
            n_cand, pair_budget, n_chunks,
        )
        chunk_of = F.pmod(F.xxhash64("doc_id_a", "doc_id_b"), F.lit(n_chunks))
        # Pre-partition + cache the payload relation(s) by doc_id ONLY
        # for shallow chunk runs (measured inversion, results_r10.json
        # prepart_ab_160 / VERDICT r9 #3).  At 3 chunks / 80x the cached
        # hash-partitioned payload beats re-deriving it (r9 interleaved:
        # 160.3 vs 350.1 s chunked) — but each chunk's verify joins scan
        # the cache TWICE (both payload sides), so the cache is read
        # 2 x n_chunks times, while the un-cached plan builds ONE
        # doc_id exchange per chunk that ReuseExchange shares across
        # both sides.  Past the point where the payload cache stays
        # memory-resident those 2 x n_chunks scans hit disk and the
        # "optimization" inverts: measured same-session at 160x
        # (12 chunks, ~20 GB payload): 1280.9 s cached vs 452.9 s
        # uncached — 2.8x AGAINST.  Deep chunk runs exist precisely
        # because the corpus is huge, so gate on chunk depth: <= 4
        # chunks (the measured-good regime) pre-partitions, deeper runs
        # rely on per-chunk exchange reuse.
        spark = pairs.sparkSession
        try:
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:
            # platforms may set the conf to a non-integer ("auto");
            # don't let the valve die exactly when it's needed
            n_part = spark.sparkContext.defaultParallelism
        prepart = (_VALVE_PREPARTITION == "force") or (
            _VALVE_PREPARTITION is True and n_chunks <= 4
        )
        if prepart:
            rel_p = rel.repartition(n_part, "doc_id").persist()
            rel_b_p = (
                rel_b.repartition(n_part, "doc_id").persist()
                if rel_b is not None else None
            )
        else:  # A/B baseline only (see _VALVE_PREPARTITION)
            rel_p, rel_b_p = rel, rel_b
        try:
            outs = []
            for i in range(n_chunks):
                outs.append(
                    fused_overlap_counts(
                        pairs.where(chunk_of == i), rel_p, cfg, threshold,
                        checkpoint_dir, rel_b_p,
                    )
                )
                # fused_overlap_counts materialized the chunk, so its verify
                # join's shuffle files are dead — but Spark only deletes them
                # when the driver GCs the stage's RDDs (ContextCleaner).  Nudge
                # the JVM so sequential chunks don't stack N chunks of spill,
                # which would defeat the valve.  Gated (VERDICT r9 #7): at
                # <= 2 chunks the stacked spill is no worse than the single
                # join's, so a stop-the-world full GC per chunk buys nothing.
                if n_chunks > 2:
                    spark.sparkContext._jvm.System.gc()
        finally:
            if rel_p is not rel:
                rel_p.unpersist()
            if rel_b_p is not None and rel_b_p is not rel_b:
                rel_b_p.unpersist()
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out
    finally:
        # every return path above has already eagerly materialized its
        # result (fused_overlap_counts ends in _materialize), so the
        # candidate cache is dead weight by now.
        pairs.unpersist()


def similar_pairs(
    docs: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    oversize: str = "drop",
    auto_split_threshold: int | None = None,
    pair_budget: int | None = PAIR_VERIFY_BUDGET,
) -> DataFrame:
    """documents(doc_id, text) -> (doc_id_a, doc_id_b, jaccard >= threshold).

    The whole reference pipeline (3 MR jobs + driver-side permutation
    generation + CSV handoffs, Main.java:47-81) as one lazy DataFrame DAG.
    The shingle relation is consumed exactly once (signature_set_relation
    computes signatures and verify-sets in one aggregate), so no persist
    is needed on it.

    Note: intermediates are eagerly materialized (localCheckpoint, or a
    reliable checkpoint under ``checkpoint_dir``); when looping over many
    corpora in one long-lived session, call ``spark.catalog.clearCache()``
    between runs.

    ``pair_budget`` is the pair-volume valve (SCALE.md §7): past ~2x
    this many LSH candidates the verify join runs in sequential hash
    chunks of ``pair_budget`` pairs with identical output and bounded
    peak shuffle — the difference between completing and dying in
    spill on duplicate-heavy corpora (measured at 160x: 143.8M
    candidates -> 12 chunks -> 66.1M pairs).  Since r10 the trigger is
    tiered so benign corpora pay ~nothing: C(n_docs, 2) from the
    materialization count (free), then the per-bucket volume bound
    (one small aggregate), then the exact candidate count (the
    persist+count barrier) — each tier only when the previous cannot
    prove the single join safe (see budgeted_overlap_counts for the
    measured 2x proof slack).  ``None`` restores the unconditional
    single-join plan.
    """
    return similar_pairs_from_shingles(
        explode_shingles(docs, cfg.k), cfg, threshold, max_bucket_size,
        checkpoint_dir, oversize, auto_split_threshold, pair_budget,
    )


def similar_pairs_from_shingles(
    doc_shingles: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    oversize: str = "drop",
    auto_split_threshold: int | None = None,
    pair_budget: int | None = PAIR_VERIFY_BUDGET,
) -> DataFrame:
    """The flagship pipeline over an arbitrary (doc_id, shingle)
    relation — the shingle UNIT is orthogonal to the MinHash/LSH/verify
    machinery, so char k-grams (``similar_pairs``), word n-grams
    (registry: ``word_similar_pairs``), or any caller-defined feature
    set (URL tokens, AST nodes, ...) all run the identical plan.

    Plan shape (one shuffle per arrow, all relations after the first
    are candidate-list-sized):
      shingles -> [groupBy doc] (sig, sh_set) -> [band self-join,
      lowest-band emission, no distinct] candidates -> [2 payload
      joins, agreement prefilter fused ahead of array_intersect]
      (nc, na, nb) -> jaccard filter.
    Measured at the 10x probe (SCALE.md §7): 15.5 s -> 11.0 s warm vs
    the round-3 staged form, identical candidates and verified pairs.
    """
    threshold = cfg.threshold if threshold is None else threshold
    # When the valve is armed, the signature relation is LAZILY
    # checkpointed and the pair-volume bound's full scan doubles as its
    # materialization pass (one action instead of two — the bound's
    # marginal cost is just the band-key hashing + a (band_key, count)
    # aggregate, VERDICT r9 #2).  The bound proves the unbarriered
    # verify join safe without ever materializing the candidate list.
    rel = signature_set_relation(
        doc_shingles, cfg, checkpoint_dir, eager=pair_budget is None
    )
    if max_bucket_size is None:
        cands = banded_pairs(rel, cfg)
    else:
        kw = {}
        if auto_split_threshold is not None:
            kw["auto_split_threshold"] = auto_split_threshold
        cands = banded_pairs_capped(rel, cfg, max_bucket_size, oversize, **kw)
    est = None
    if pair_budget is not None:
        # Tier 1 (free): the count IS the lazy checkpoint's
        # materializing action — the same job an eager checkpoint runs
        # internally — and C(n_docs, 2) already bounds distinct pairs.
        # Tier 2 (one small agg, only past tier 1): per-bucket bound.
        n_docs = rel.count()
        est = n_docs * (n_docs - 1) // 2
        if est > 2 * pair_budget:
            cap = max_bucket_size if oversize == "drop" else None
            est = candidate_volume_bound(rel, cfg, bucket_cap=cap)
    counts = budgeted_overlap_counts(
        cands, rel, cfg, threshold, checkpoint_dir, pair_budget=pair_budget,
        est_volume=est,
    )
    return (
        counts.where(F.col("nc") > 0)
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("nc").cast("double")
                / (F.col("na") + F.col("nb") - F.col("nc"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def signature_prefilter(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float,
) -> DataFrame:
    """Drop candidate pairs whose positionwise signature agreement (the
    classic MinHash Jaccard estimate, free once signatures exist) is more
    than EST_SLACK below threshold.  Integer cutoff -> engine-exact; the
    LSH candidate background is j~0.5 noise, so this typically shrinks
    the exact-verify stage ~5x with negligible (=3 sd) recall cost."""
    cut = min_agree(cfg, threshold)
    if cut <= 0:
        return pairs
    if "sig" in signatures.columns:
        arr = F.col("sig")
    else:
        arr = F.array(*[F.col(f"mh_{j}") for j in range(cfg.num_hashes)])
    # Where signature values are provably < prime <= 2^31 — affine (mod
    # p by construction) and OPH-optimal over hashed ids (bmins of
    # mod-p ids) — cast the sig to int: lossless, positionwise equality
    # unchanged, and it HALVES the payload this stage shuffles at PAIR
    # volume (the first join re-shuffles (pair, sig_a) by doc_id_b for
    # the second; at the 160x probe that intermediate is the widest
    # relation of the group path).  Excluded: rotation densification
    # (values carry + prime*distance, up to ~2^38), 'rank' ids under
    # OPH (raw ranks, unbounded at 100 TB vocab), and any user cfg with
    # prime > 2^31 — __post_init__ does not bound prime, and mod-p
    # values then no longer fit an int: the cast would throw
    # CAST_OVERFLOW under Spark 4's default ANSI mode (or silently wrap
    # with ANSI off, corrupting agreement counts).  Such cfgs keep the
    # lossless long path.
    if cfg.prime <= 2**31 and (
        cfg.sig_strategy == "affine"
        or (cfg.densify == "optimal" and cfg.id_strategy in ("md5", "xxhash"))
    ):
        arr = F.transform(arr, lambda x: x.cast("int"))
    sa = signatures.select(F.col("doc_id").alias("doc_id_a"), arr.alias("sig_a"))
    sb = signatures.select(F.col("doc_id").alias("doc_id_b"), arr.alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda b: b,
        )
    )
    return (
        pairs.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .where(agree >= cut)
        .select("doc_id_a", "doc_id_b")
    )


def cross_corpus_pairs(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    check_disjoint: bool = False,
    pair_budget: int | None = PAIR_VERIFY_BUDGET,
) -> DataFrame:
    """Asymmetric near-dup: (new_id, seen_id, jaccard >= threshold) for
    every NEW document that near-duplicates a SEEN document — the "dedup
    this crawl against the existing corpus" primitive of a training-data
    pipeline.  Unlike ``similar_pairs`` there is no new-vs-new or
    seen-vs-seen comparison: candidates come from joining the new side's
    band table against the seen side's, so the work is
    |new| x (bucket hit rate) — never a rescan of seen-vs-seen.

    Doc ids must be unique ACROSS both corpora (they key the verify
    joins and the single-union signature aggregate).  A violated
    contract does NOT self-pair benignly: the two same-id documents'
    shingles silently merge into one polluted signature and the
    seen-side copy vanishes from the output entirely (the union
    aggregate cannot tell the corpora apart) — pass
    ``check_disjoint=True`` to fail fast instead (one cheap
    left-semi ``isEmpty`` probe on the id intersection).  At
    production scale the seen side's signatures/bands are
    precomputed and stored — exactly the band-store layout
    ``streaming/jobs.incremental_similar_pairs`` maintains; this batch
    form recomputes them so the operator is self-contained.

    ``max_bucket_size`` caps each side's band bucket independently (a
    boilerplate clique on either side makes the bucket join quadratic).
    """
    threshold = cfg.threshold if threshold is None else threshold
    from mapreduce_minhash_lsh_spark.operators.lsh import banded_cross_pairs

    if check_disjoint:
        overlap = new_docs.select("doc_id").join(
            seen_docs.select("doc_id"), "doc_id", "left_semi"
        )
        if not overlap.isEmpty():
            raise ValueError(
                "cross_corpus_pairs: doc ids must be disjoint across "
                "corpora; at least one id appears in both "
                f"(e.g. {overlap.limit(3).collect()})"
            )
    # ONE materialization for both corpora: the union's (sig, sh_set)
    # relation is built in a single groupBy (ids are unique across
    # corpora by contract), then each side is recovered with a semi/anti
    # join against the new-id list — AQE broadcasts it when small (the
    # typical crawl-vs-corpus shape); no second blocking barrier, and
    # the combined aggregate amortizes the fixed shuffle cost the
    # two-relation form paid twice.
    sh_all = explode_shingles(new_docs, cfg.k).unionByName(
        explode_shingles(seen_docs, cfg.k)
    )
    rel_all = signature_set_relation(sh_all, cfg, checkpoint_dir)
    new_ids = new_docs.select("doc_id")
    rel_new = rel_all.join(new_ids, "doc_id", "left_semi")
    rel_seen = rel_all.join(new_ids, "doc_id", "left_anti")

    if max_bucket_size is None:
        cands = banded_cross_pairs(rel_new, rel_seen, cfg)
    else:
        def _bands(rel: DataFrame) -> DataFrame:
            b = bands_for(rel, cfg)
            sized = b.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
            return b.join(
                sized.where(F.col("_n") <= max_bucket_size), ["band", "band_key"]
            ).drop("_n")
        cands = (
            _bands(rel_new)
            .withColumnRenamed("doc_id", "doc_id_a")
            .join(
                _bands(rel_seen).withColumnRenamed("doc_id", "doc_id_b"),
                ["band", "band_key"],
            )
            .where(F.col("doc_id_a") != F.col("doc_id_b"))
            .select("doc_id_a", "doc_id_b")
            .distinct()
        )
    est = None
    if pair_budget is not None:
        # tiered trigger, cross-corpus form: n_new x n_seen bounds the
        # distinct cross pairs; the two counts are cheap scans of the
        # (eagerly materialized, multi-consumer) rel_all cache
        n_new, n_seen = rel_new.count(), rel_seen.count()
        est = n_new * n_seen
        if est > 2 * pair_budget:
            est = candidate_volume_bound(
                rel_new, cfg, rel_b=rel_seen, bucket_cap=max_bucket_size
            )
    counts = budgeted_overlap_counts(
        cands, rel_new, cfg, threshold, checkpoint_dir, rel_b=rel_seen,
        pair_budget=pair_budget, est_volume=est,
    )
    return (
        counts.where(F.col("nc") > 0)
        .select(
            F.col("doc_id_a").alias("new_id"),
            F.col("doc_id_b").alias("seen_id"),
            (
                F.col("nc").cast("double")
                / (F.col("na") + F.col("nb") - F.col("nc"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def symmetric_pairs(pairs: DataFrame) -> DataFrame:
    """Undirected (a<b) pairs -> both directions, the reference job 3's
    output contract (CollectCandidates.java:32-51 emits (x,y) and (y,x);
    its group-explode + per-key distinct collapses to a plain distinct
    union here — A4/P6)."""
    fwd = pairs.select("doc_id_a", "doc_id_b")
    rev = pairs.select(
        F.col("doc_id_b").alias("doc_id_a"), F.col("doc_id_a").alias("doc_id_b")
    )
    return fwd.unionByName(rev).distinct()


def containment_pairs(
    docs: DataFrame,
    cfg: MinHashLSHConfig,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    oversize: str = "drop",
    pair_budget: int | None = PAIR_VERIFY_BUDGET,
) -> DataFrame:
    """Max-containment pairs among the flagship's LSH candidates:
    ``nc / min(na, nb) >= threshold`` — the asymmetric quote/subset
    measure (is the smaller document essentially contained in the
    larger one?), which Jaccard under-scores whenever sizes differ.

    RECALL CONTRACT: candidates still come from the MinHash banding +
    signature prefilter, both tuned for Jaccard >= cfg.threshold — so
    this finds high-containment pairs *among near-dup candidates*, not
    every size-skewed subset pair (a tweet inside a novel has high
    containment but Jaccard ~0 and will not band together).  For
    exhaustive containment use :func:`containment_pairs_postings`.
    """
    # same lazy-checkpoint + bound-as-materialization-pass pattern as
    # similar_pairs_from_shingles (VERDICT r9 #2)
    rel = signature_set_relation(
        explode_shingles(docs, cfg.k), cfg, checkpoint_dir,
        eager=pair_budget is None,
    )
    if max_bucket_size is None:
        cands = banded_pairs(rel, cfg)
    else:
        cands = banded_pairs_capped(rel, cfg, max_bucket_size, oversize)
    est = None
    if pair_budget is not None:
        # same tiered trigger as similar_pairs_from_shingles
        n_docs = rel.count()
        est = n_docs * (n_docs - 1) // 2
        if est > 2 * pair_budget:
            cap = max_bucket_size if oversize == "drop" else None
            est = candidate_volume_bound(rel, cfg, bucket_cap=cap)
    counts = budgeted_overlap_counts(
        cands, rel, cfg, cfg.threshold, checkpoint_dir, pair_budget=pair_budget,
        est_volume=est,
    )
    return (
        counts.where(F.col("nc") >= 0)
        .select(
            "doc_id_a",
            "doc_id_b",
            (F.col("nc").cast("double") / F.least("na", "nb")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def containment_pairs_postings(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.9,
    max_df: int = 64,
    min_common: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exhaustive high-containment pairs via RARE-SHINGLE POSTINGS
    intersection — the candidate generator :func:`containment_pairs`
    (Jaccard-banded) cannot provide: a tweet quoted inside a novel has
    containment ~1 but Jaccard ~0 and never bands with it.

    Candidates: every (a < b) pair sharing >= ``min_common`` shingles
    whose corpus document frequency is in [2, ``max_df``].  The posting
    self-join's work is sum over rare shingles of df^2 <= max_df *
    |rare postings| — LINEAR in corpus size for a fixed cap, never
    all-pairs; df > max_df shingles are both the scale valve and a
    precision filter (boilerplate k-grams would pair everything).
    Explicit recall contract: a contained pair is missed only when its
    overlap holds fewer than ``min_common`` corpus-rare shingles — i.e.
    the contained text is itself pure boilerplate, exactly the case
    where "containment" carries no signal.

    Verification is exact: ``nc / min(na, nb)`` on the FULL shingle
    sets, built only for candidate docs (pair_overlap_counts).
    """
    # persist is released before returning: both consumers (candidate
    # generation and the verify counts) are driven to completion by the
    # eager _materialize calls below, so repeated calls in a long-lived
    # session leave no cached shingle relations behind.
    sh = explode_shingles(docs, k).persist()
    try:
        ids = sh.select("doc_id", md5_long(F.col("shingle")).alias("sid"))
        dfreq = ids.groupBy("sid").agg(F.count("*").alias("_df"))
        rare = ids.join(
            dfreq.where((F.col("_df") >= 2) & (F.col("_df") <= max_df)), "sid"
        ).select("doc_id", "sid")
        a, b = rare.alias("a"), rare.alias("b")
        cands = (
            a.join(b, "sid")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .agg(F.count("*").alias("_nshared"))
            .where(F.col("_nshared") >= min_common)
            .select("doc_id_a", "doc_id_b")
        )
        cands = _materialize(cands, checkpoint_dir)
        counts = pair_overlap_counts(cands, sh, checkpoint_dir)
    finally:
        sh.unpersist()
    return counts.select(
        "doc_id_a",
        "doc_id_b",
        (F.col("nc").cast("double") / F.least("na", "nb")).alias("containment"),
    ).where(F.col("containment") >= threshold)
