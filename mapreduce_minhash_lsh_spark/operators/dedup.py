"""Deduplication family for training-data pipelines.

  * exact_dedup        — hash-groupBy on content (or any key columns)
  * ngram_jaccard_pairs— exact all-pairs n-gram Jaccard (brute force via
                         the shingle equi-join; quadratic in co-occurring
                         docs — use on samples/buckets, the LSH pipeline
                         in operators/similarity.py is the scale path)
  * near_dup_groups    — connected components over a similar-pairs edge
                         list (iterative min-label propagation — no
                         GraphFrames dependency), giving dedup group ids
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.operators.shingling import explode_shingles
from mapreduce_minhash_lsh_spark.operators.similarity import (
    PAIR_VERIFY_BUDGET,
    _materialize,
    _reset_stats,
    exact_jaccard,
)


def exact_dedup(df: DataFrame, keys: list[str], id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 row per key tuple: representative (min id) + count.
    One shuffle on the key hash; at 100 TB dedup on a digest column
    (xxhash64/sha2 of content) instead of raw text to shrink the exchange."""
    return (
        df.groupBy(*keys)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def duplicate_ids(df: DataFrame, keys: list[str], id_col: str = "doc_id") -> DataFrame:
    """Ids to DROP under exact dedup (everything but the min id per group)."""
    w_keys = [F.col(k) for k in keys]
    keep = df.groupBy(*w_keys).agg(F.min(id_col).alias("keep_id"))
    return (
        df.join(keep, keys)
        .where(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col).alias("drop_id"), "keep_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard for every co-shingled pair (doc_id_a < doc_id_b).

    Ground truth for LSH recall measurement.  The shingle self-join is
    quadratic in documents sharing a shingle — bound the input (sample,
    bucket, or partition) before calling at scale.
    """
    sh = explode_shingles(docs, k)
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    return exact_jaccard(pairs, sh).where(F.col("jaccard") >= threshold)


# Incident-edge nominations per component per Borůvka round in
# similar_groups.  1 = classic Borůvka (one edge per component); 4
# drains the false-candidate residual 4x faster and gives a component
# whose first-choice edge is false more chances at a true one per
# round.  Nomination picks each class's min-xxhash edge (a long min =
# plain HashAggregate; a struct min would sort the residual).
# Exactness is schedule-independent, so this only shifts wall-clock.
_NOMINATIONS = 4


def near_dup_groups(
    pairs: DataFrame, max_iter: int | None = None, prepared: bool = False
) -> DataFrame:
    """Connected components over an undirected edge list
    (doc_id_a, doc_id_b) -> (doc_id, group_id = min doc id of component).

    Iterative label propagation with POINTER JUMPING: every node adopts
    the min label among itself and its neighbours (one join + one
    groupBy per round), then labels shortcut through themselves
    (label <- label's label — one self-join on the small label table),
    so a chain of length D converges in O(log D) rounds instead of
    O(D).  Near-dup components are tiny cliques in practice (jumping is
    a no-op there), but transitive near-dup CHAINS — templated pages
    drifting a little per hop — are exactly the pathological input a
    100 TB run will eventually meet.  localCheckpoint per step truncates
    the growing lineage so Catalyst doesn't replan an ever-deeper DAG.

    Runs to CONVERGENCE by default — a silent iteration cap would return
    wrong labels on a long-chain component (and diverge from the
    transitive-closure oracle).  Pass ``max_iter`` to bound rounds
    explicitly; exhaustion then raises rather than mislabeling.

    ``prepared=True`` (r15, guide §2.4 — remove shuffles outright) is a
    PERFORMANCE hint for composition callers whose ``pairs`` is already
    a unique (a < b) edge list projected off an eagerly materialized
    relation — exactly what the flagship's verified output is: a
    filter + select over the checkpointed overlap-counts relation.  For
    such input the symmetrizing ``distinct`` is a no-op shuffle (the
    union of the two directions of unique a < b rows cannot collide)
    and the eager localCheckpoint is a redundant barrier (the lineage
    each iteration replays is one map-side filter over checkpointed
    blocks).  The labels themselves are provably unchanged either way:
    duplicate or self-loop edges cannot alter connected components
    (min over a multiset ignores multiplicity), so the hint can only
    ever cost performance, never correctness — tests pin both paths
    output-equal on the flagship composition.
    """
    # Materialize the edge list eagerly: the incoming pairs may carry an
    # arbitrarily deep lineage (e.g. the whole LSH pipeline) that must not
    # be replayed once per iteration.  (Skipped under ``prepared`` — see
    # docstring; the per-iteration replay is then a map-side projection.)
    edges = pairs.select("doc_id_a", "doc_id_b").unionByName(
        pairs.select(
            F.col("doc_id_b").alias("doc_id_a"),
            F.col("doc_id_a").alias("doc_id_b"),
        )
    )
    if not prepared:
        edges = _reset_stats(edges.distinct().localCheckpoint(eager=True))
    labels = (
        edges.select(F.col("doc_id_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("group_id"))
    )
    iteration = 0
    while True:
        iteration += 1
        neighbor_min = (
            edges.join(labels, edges.doc_id_b == labels.doc_id)
            .groupBy("doc_id_a")
            .agg(F.min("group_id").alias("nbr_min"))
            .withColumnRenamed("doc_id_a", "doc_id")
        )
        # The pre-least label IS the old label, so the convergence flag
        # rides the same plan — no second join over the label table — and
        # the observe() metric rides the eager-checkpoint job itself:
        # exactly ONE action (and one scan) per propagation round.
        obs = Observation()
        flagged = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"), F.coalesce(F.col("nbr_min"), F.col("group_id"))
                ).alias("group_id"),
                (F.col("nbr_min") < F.col("group_id")).alias("_changed"),
            )
            .observe(obs, F.sum(F.col("_changed").cast("long")).alias("n_changed"))
            .localCheckpoint(eager=True)
        )
        flagged = _reset_stats(flagged)
        changed = int(obs.get["n_changed"] or 0)
        labels = flagged.drop("_changed")
        if changed == 0:
            return labels
        if max_iter is not None and iteration >= max_iter:
            raise RuntimeError(
                f"near_dup_groups did not converge within max_iter={max_iter} "
                "rounds; raise the bound (component diameter exceeds it)"
            )
        # Pointer jump: label <- min(label, label(label)).  Labels are
        # node ids, so the lookup is a self-join on the label table —
        # candidate-list-sized, far smaller than the edge join above.
        # Chains contract geometrically.  Skipped in round 1: cliques
        # (the common near-dup shape) converge at round 2's zero-change
        # probe and would pay for a jump that cannot help them.
        if iteration == 1:
            continue
        lookup = labels.select(
            F.col("doc_id").alias("_g"), F.col("group_id").alias("_gg")
        )
        labels = (
            labels.join(lookup, labels.group_id == lookup._g, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"), F.coalesce(F.col("_gg"), F.col("group_id"))
                ).alias("group_id"),
            )
            .localCheckpoint(eager=True)
        )
        labels = _reset_stats(labels)


def similar_groups(
    docs: DataFrame,
    cfg,
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    oversize: str = "auto",
    max_iter: int | None = None,
    direct_verify_budget: int | None = PAIR_VERIFY_BUDGET,
) -> DataFrame:
    """(doc_id, group_id) — output-equivalent to
    ``near_dup_groups(similar_pairs(docs, cfg, threshold))`` but WITHOUT
    materializing the full verified pair list: the dedup-by-group answer
    that breaks the quadratic output wall (SCALE.md §7: the verify
    payload join over all O(k²) clique pairs is what exhausts spill at
    the 160× probe; the group answer needs only a spanning structure).

    TIERED (r14): when the prefiltered candidate edge list fits
    ``direct_verify_budget`` (default: the flagship's
    PAIR_VERIFY_BUDGET — the same volume the verify valve proves safe
    for one fused join), every edge is verified outright and plain CC
    labels the result: the contract expression itself, at a fraction of
    the Borůvka loop's per-round job overhead (measured 57 jobs → ~12
    at sf0.1).  The loop below engages only above the budget — the
    quadratic-clique regime it was built for.  ``None`` forces the
    loop; tests pin both paths output-equal.

    Algorithm past the budget — Borůvka-style connected components with
    VERIFICATION AS THE EDGE ORACLE:

    1. LSH candidates (lowest-band emission, optionally capped) are
       prefiltered once by the signature-agreement cutoff — the cheap
       (sig-only payload) half of the flagship's verification SPEC,
       which kills most of the j≈0.5 candidate background so later
       rounds converge on true edges.
    2. Each round, every current component nominates ONE incident
       candidate edge (its minimum, for determinism); only those
       O(#components) representative edges pay the exact shingle-set
       verification (``fused_overlap_counts`` — the expensive sh_set
       payload join never sees the full candidate list).  Verified
       edges merge components (min-label, via :func:`near_dup_groups`
       on the component graph); failed edges are deleted.
    3. Candidate edges whose endpoints land in one component are
       discarded UNVERIFIED — their endpoints are already connected by
       verified edges, so they cannot change the components.

    Exactness: let E* be the candidate edges that would pass the full
    flagship verification and W ⊆ E* the edges this routine verified
    true.  Every e ∈ E* \\ W was discarded only while its endpoints
    were already W-connected, so components(W) = components(E*) — and
    a doc appears in a multi-doc component iff it has a true edge, so
    filtering to components of size ≥ 2 reproduces
    ``near_dup_groups(similar_pairs(...))`` exactly (tests pin this).

    Cost: a k-clique verifies O(k) edges (members nominate toward the
    min members) instead of k(k-1)/2; false candidate edges each cost
    one verification at most.  Each component nominates up to
    ``_NOMINATIONS`` incident edges per round (the min-xxhash edge
    within each of that many hash-salted edge classes — a plain long
    HashAggregate with map-side combine, where ``min(struct)`` would
    plan a SortAggregate over the residual): more of the false residual
    drains per round and a component whose min edge is false still gets
    other chances at a true one, so the merge phase needs fewer rounds.
    When nomination stops being productive — the round verifies fewer
    than ~2% of its nominations (r6's 160x probe spent 20+ rounds in a
    tail where a handful of borderline edges verified per round while
    each round paid a full ~60M-edge relabel join), or one round of
    nominations already covers a quarter of the remaining edges — the
    loop escalates to ONE exhaustive sweep of the residual
    inter-component edges and finishes.  That residual cost is
    unavoidable for any exact algorithm (a false edge between two
    components that never merge must be inspected to be rejected); the
    quadratic savings come from the intra-component skips, which
    happened in the earlier rounds.  Early escalation never breaks
    exactness — it only moves inspection of still-live inter-component
    edges into the sweep — and its sweep volume is bounded: a <2%
    verify rate means the residual is ≥98% false edges any exact
    algorithm pays for anyway.  Total verifications
    O(docs · log max-component + residual), rounds
    O(log max-component) + 1.  Pass ``max_iter`` to bound rounds
    explicitly; exhaustion raises rather than mislabeling.
    """
    from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig  # noqa: F401
    from mapreduce_minhash_lsh_spark.operators.lsh import (
        banded_pairs,
        banded_pairs_capped,
    )
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        _materialize,
        fused_overlap_counts,
        signature_prefilter,
        signature_set_relation,
    )

    threshold = cfg.threshold if threshold is None else threshold
    rel = signature_set_relation(
        explode_shingles(docs, cfg.k), cfg, checkpoint_dir
    )
    if max_bucket_size is None:
        cands = banded_pairs(rel, cfg)
    else:
        cands = banded_pairs_capped(rel, cfg, max_bucket_size, oversize)
    obs_edges = Observation()
    edges = _materialize(
        signature_prefilter(
            cands, rel.select("doc_id", "sig"), cfg, threshold
        )
        .select("doc_id_a", "doc_id_b")
        .observe(obs_edges, F.count(F.lit(1)).alias("n")),
        checkpoint_dir,
    )
    n_edges = int(obs_edges.get["n"] or 0)
    # DIRECT-VERIFY TIER (r14, guide §1.2): Borůvka's per-round
    # bookkeeping (nomination, semi-join recovery, component CC,
    # relabel — measured 57 Spark jobs / ~7 s at sf0.1, nearly all
    # fixed per-job overhead) only pays for itself when the candidate
    # edge volume is too large to verify outright — the quadratic-
    # clique regime it exists for.  When the PREFILTERED edge list fits
    # the same pair budget the flagship's verify valve uses, verify
    # every edge in ONE fused join and run plain label-propagation CC:
    # literally the ``near_dup_groups(similar_pairs(...))`` contract
    # expression this operator is pinned output-equal to, at ~1/5 the
    # job count.  The tier is input-volume-driven (never scale-factor-
    # driven): a 100 TB corpus with benign duplication takes the direct
    # path too, and a clique-heavy corpus at ANY scale escalates to
    # Borůvka.  ``direct_verify_budget=None`` forces the loop (tests
    # pin both paths equal).
    if direct_verify_budget is not None and n_edges <= direct_verify_budget:
        counts = fused_overlap_counts(edges, rel, cfg, threshold, checkpoint_dir)
        verified = counts.where(F.col("nc") > 0).where(
            F.col("nc").cast("double")
            / (F.col("na") + F.col("nb") - F.col("nc"))
            >= threshold
        ).select("doc_id_a", "doc_id_b")
        # every endpoint of a verified edge is in a >= 2-doc component,
        # so near_dup_groups' labels are exactly this operator's output.
        # prepared: verified is a unique (a < b) filter over the
        # checkpointed counts relation — CC needs no dedup shuffle and
        # no second materialization barrier (r15).
        return near_dup_groups(verified, max_iter=max_iter, prepared=True)
    labels = _materialize(
        edges.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(edges.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("group_id")),
        checkpoint_dir,
    )
    iteration = 0
    exhaustive = False
    # Edges nominated (and therefore inspected — verified or failed)
    # last round.  Pruned from the edge set LAZILY in the next round's
    # live plan: reps is component-count-sized, so the anti-join is a
    # broadcast against the one 60M-edge scan that round pays anyway —
    # the former eager `edges \\ failed` re-materialization wrote the
    # whole residual back out once per round for nothing (r6's 160x
    # probe: one of ~4 per-round materializations over ~60M edges).
    excluded = None
    while True:
        iteration += 1
        la = labels.select(
            F.col("doc_id").alias("doc_id_a"), F.col("group_id").alias("_la")
        )
        lb = labels.select(
            F.col("doc_id").alias("doc_id_b"), F.col("group_id").alias("_lb")
        )
        # Every per-round count rides its relation's materialization
        # action via observe() — one job per materialized relation, no
        # separate count()/isEmpty() jobs (VERDICT r5 nit).
        base = edges
        if excluded is not None:
            base = base.join(excluded, ["doc_id_a", "doc_id_b"], "left_anti")
        obs_live = Observation()
        live = _materialize(
            base.join(la, "doc_id_a").join(lb, "doc_id_b")
            .where(F.col("_la") != F.col("_lb"))
            .select("doc_id_a", "doc_id_b", "_la", "_lb")
            .observe(obs_live, F.count(F.lit(1)).alias("n")),
            checkpoint_dir,
        )
        n_live = int(obs_live.get["n"] or 0)
        if n_live == 0:
            break
        if max_iter is not None and iteration > max_iter:
            raise RuntimeError(
                f"similar_groups did not converge within max_iter={max_iter} "
                "rounds; raise the bound"
            )
        # live IS the pruned, still-contested edge set — materialized, so
        # reassigning is free (no separate prune job).
        edges = live.select("doc_id_a", "doc_id_b")
        excluded = None
        if exhaustive:
            reps = edges
            n_reps = n_live
        else:
            # Borůvka nomination: each component's min-HASH incident
            # edge within each of _NOMINATIONS hash-salted edge classes.
            # The nomination key is the edge's xxhash64 — a LONG, so the
            # per-(component, class) min is a plain HashAggregate with
            # map-side partial combine; ``min(struct(a, b))`` is not
            # hash-aggregable and planned as a SortAggregate, i.e. TWO
            # sorts of the (2×residual)-row union per round (measured in
            # the plan; the r6 single-min form paid the same sorts).
            # The nominated edges are recovered with a semi-join of the
            # residual against the (component-count-sized) hash list —
            # AQE broadcasts it when small.  A hash collision inside one
            # class only nominates an extra edge: exactness is
            # nomination-schedule-independent.  Determinism holds (the
            # min hash is a pure function of the edge list).
            h = F.xxhash64("doc_id_a", "doc_id_b")
            nom = (
                live.select(F.col("_la").alias("_c"), h.alias("_h"))
                .unionByName(live.select(F.col("_lb").alias("_c"), h.alias("_h")))
                .groupBy("_c", F.pmod(F.col("_h"), F.lit(_NOMINATIONS)).alias("_s"))
                .agg(F.min("_h").alias("_h"))
                .select("_h")
                .distinct()
            )
            obs_reps = Observation()
            reps = _materialize(
                live.select("doc_id_a", "doc_id_b")
                .join(nom, h == F.col("_h"), "left_semi")
                .observe(obs_reps, F.count(F.lit(1)).alias("n")),
                checkpoint_dir,
            )
            n_reps = int(obs_reps.get["n"] or 0)
            if n_reps * 4 >= n_live:
                # one nomination round already covers most of the
                # residual: the per-round bookkeeping costs more than it
                # saves — sweep everything that is left
                reps = edges
                n_reps = n_live
                exhaustive = True
        counts = fused_overlap_counts(reps, rel, cfg, threshold, checkpoint_dir)
        verified = counts.where(F.col("nc") > 0).where(
            F.col("nc").cast("double")
            / (F.col("na") + F.col("nb") - F.col("nc"))
            >= threshold
        ).select("doc_id_a", "doc_id_b")
        # Contract: components over the (tiny) component graph of the
        # verified representative edges, then relabel every doc.
        # Materialized (it feeds near_dup_groups' own edge checkpoint)
        # with its emptiness probe riding the same action.
        obs_comp = Observation()
        comp_edges = _materialize(
            verified.join(la, "doc_id_a").join(lb, "doc_id_b")
            .select(F.col("_la").alias("doc_id_a"), F.col("_lb").alias("doc_id_b"))
            .observe(obs_comp, F.count(F.lit(1)).alias("n")),
            checkpoint_dir,
        )
        n_verified = int(obs_comp.get["n"] or 0)
        if exhaustive:
            # Every live edge was inspected this round: the survivors
            # are exactly the verified ones (failed edges die, and the
            # verified merge below turns their endpoints same-label, so
            # the next live probe is over this small set and terminates).
            edges = verified
            if n_verified == 0:
                break
        else:
            # Nominated edges were all inspected: prune them from the
            # residual (verified ones would die at the next label filter
            # anyway, failed ones must not be re-nominated forever).
            excluded = reps
            if n_verified == 0:
                # an unproductive nomination round: the surviving
                # residual is dominated by false edges — verify it
                # wholesale next round instead of draining a few edges
                # per component per round
                exhaustive = True
                continue
            if n_verified * 50 < n_reps:
                # nearly unproductive (<2% of nominations verified —
                # the r6 160x tail: ~20 rounds of a handful of
                # borderline merges, each paying a full residual
                # relabel join): take this round's merges, then sweep.
                exhaustive = True
        # prepared: comp_edges is eagerly materialized just above (its
        # possible duplicate component pairs cannot change CC labels —
        # see near_dup_groups' hint contract), so the per-round dedup
        # shuffle + checkpoint barrier inside CC are both redundant.
        cc = near_dup_groups(comp_edges, prepared=True).select(
            F.col("doc_id").alias("_c"), F.col("group_id").alias("_g")
        )
        labels = _materialize(
            labels.join(cc, labels.group_id == cc._c, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("_g"), F.col("group_id")).alias("group_id"),
            ),
            checkpoint_dir,
        )
    # Docs whose component stayed a singleton have no verified edge —
    # they are not part of any near-dup group.
    sizes = labels.groupBy("group_id").agg(F.count("*").alias("_n"))
    return labels.join(
        sizes.where(F.col("_n") >= 2), "group_id", "left_semi"
    ).select("doc_id", "group_id")


def quality_drop_ids(
    groups: DataFrame,
    scored: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup drop list: per dedup group keep the
    HIGHEST-quality member (ties to the lowest id) instead of the lowest
    id — min-id keeps whichever duplicate happened to crawl first; a
    training pipeline wants the best copy.

    ``groups`` is near_dup_groups' (doc_id, group_id); ``scored`` maps
    id -> quality.  One join + one per-group window (WindowGroupLimit'd
    rank) + one self-join on group_id to attach each drop's keeper —
    all keyed on group_id, no global operation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("group_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    ranked = (
        groups.join(scored.select(id_col, quality_col), id_col)
        .withColumn("_rn", F.row_number().over(w))
    )
    keep = ranked.where(F.col("_rn") == 1).select(
        "group_id", F.col(id_col).alias("keep_id")
    )
    return (
        ranked.where(F.col("_rn") > 1)
        .join(keep, "group_id")
        .select(F.col(id_col).alias("drop_id"), "keep_id", "group_id")
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 5,
    min_grams: int = 2,
    max_df: int = 10_000,
    id_strategy: str = "md5",
) -> DataFrame:
    """Passage-level duplication: maximal word spans made of ``n``-gram
    windows that also occur in at least one OTHER document — the
    boilerplate/license/quoted-passage detector that whole-document
    near-dup (``similar_pairs``) and doc-level containment cannot give
    you, and the span-granular form of "dedup the repeated passages,
    not the documents" (Lee et al., Deduplicating Training Data).

    documents(doc_id, text) -> (doc_id, span_start, span_end, n_grams):
    1-based word positions of each maximal run of >= ``min_grams``
    consecutive duplicated n-gram starts (the span covers
    span_end - span_start + 1 words).  A gram is "duplicated" when its
    md5-long id appears in >= 2 distinct documents; ``max_df`` drops
    stop-phrase grams shared by more than that many docs — the same
    postings bound as ``containment_pairs_postings``, keeping the
    gram join linear instead of quadratic in corpus-wide df.

    Plan: one map-side gram explode (the transform building the gram
    array is the generator's ARGUMENT, evaluated once per doc — the
    generator-sibling rule, SCALE.md §4), one df aggregate + equi-join
    on gram id, one per-doc window for gaps-and-islands merging.
    Default gram ids are md5-long (the engine-portable contract), so
    the DuckDB twin reproduces every span bit-for-bit;
    ``id_strategy='xxhash'`` is the production option — identical spans
    (any collision-free 64-bit id yields the same duplicated-position
    set up to negligible collision odds), cheaper per gram, off the
    oracle — mirroring the flagship's id_strategy split.
    """
    from pyspark.sql import Window

    from mapreduce_minhash_lsh_spark.functions.hashing import md5_long

    if id_strategy not in ("md5", "xxhash"):
        raise ValueError(f"id_strategy must be 'md5' or 'xxhash', got {id_strategy!r}")
    gid_of = md5_long if id_strategy == "md5" else F.xxhash64
    toks = F.split(F.col("text"), " ")
    d = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= n)
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - F.lit(n - 1)),
        lambda i: gid_of(F.concat_ws(" ", F.slice(F.col("toks"), i, n))),
    )
    # Persisted because consumed TWICE (df aggregate, then the hits
    # join); a single-pass collect_list-per-gid alternative would build
    # an unbounded group for stock phrases BEFORE the df filter could
    # drop them.  Scoped to THIS call (VERDICT r9 #6, same
    # deterministic-release convention as the valve): the span result is
    # eagerly materialized below, so the cache is dead by return and is
    # unpersisted in the finally — repeated calls in a long session (and
    # every strip_repeated_spans, which calls this internally) strand
    # nothing.
    grams = d.select(
        "doc_id", F.posexplode(gram_arr).alias("pos0", "gid")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gid").persist()
    try:
        dup = (
            grams.groupBy("gid")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("gid")
        )
        hits = grams.join(dup, "gid").select("doc_id", "pos")
        w = Window.partitionBy("doc_id").orderBy("pos")
        isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        spans = (
            isl.groupBy("doc_id", "grp")
            .agg(
                F.min("pos").cast("long").alias("span_start"),
                (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
                F.count(F.lit(1)).cast("long").alias("n_grams"),
            )
            .where(F.col("n_grams") >= min_grams)
            .select("doc_id", "span_start", "span_end", "n_grams")
        )
        from mapreduce_minhash_lsh_spark.operators.similarity import _materialize

        return _materialize(spans, None)
    finally:
        grams.unpersist()


def strip_repeated_spans(
    docs: DataFrame,
    n: int = 5,
    min_grams: int = 2,
    max_df: int = 10_000,
    id_strategy: str = "md5",
) -> DataFrame:
    """The actionable form of :func:`repeated_spans`: rewrite every
    document with its duplicated passages REMOVED — passage-level dedup
    as a corpus transform (documents(doc_id, text) -> (doc_id, text)),
    the "train on the unique residue" step downstream pipelines consume.

    Every input doc survives (possibly with empty text when it was
    boilerplate end to end); word order outside flagged spans is
    preserved by rebuilding from (position, token) pairs, so the output
    is deterministic under any partitioning.  One extra shuffle on top
    of repeated_spans (the per-doc rebuild aggregate); the span join is
    an anti-join on (doc_id, pos) — span positions, not text, move
    through the shuffle.  ``id_strategy`` passes through to
    :func:`repeated_spans` ('md5' oracle-exact default, 'xxhash' the
    cheaper production gram id — identical spans either way up to
    negligible 64-bit collision odds)."""
    spans = repeated_spans(docs, n, min_grams, max_df, id_strategy)
    drop = spans.select(
        "doc_id", F.explode(F.sequence("span_start", "span_end")).alias("pos")
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = toks.join(drop, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text")
    )
    # docs whose every token was flagged vanish from the rebuild group;
    # re-attach them with empty text so the corpus row set is stable.
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    )


def hybrid_dedup_drop_ids(
    docs: DataFrame,
    emb: DataFrame,
    cfg,
    threshold: float = 0.4,
    n_lists: int | None = None,
    lloyd_iters: int = 2,
    soft_assign: int = 1,
) -> DataFrame:
    """The production text+embedding dedup composition, parameterized
    (round 13 — VERDICT r12 #3/hybrid): drop a document if its TEXT is a
    MinHash/LSH near-duplicate (connected-component min-id policy) OR
    its EMBEDDING is a semantic duplicate (SemDeDup cell-scoped cosine),
    with reason flags (by_text, by_embedding) so every removal is
    attributable.

    ``n_lists=None`` (the default) applies the documented sqrt(n)
    guidance from operators/semdedup.py: per-cell exact work is
    O((n/n_lists)^2), so a FIXED cell count means O(n^2/const) growth —
    at 100x corpus size a caller keeping ``n_lists=8`` pays 10,000x per
    cell.  sqrt(n) cells keep expected total comparison work O(n)
    (costs one count action).  ``soft_assign=2`` is the boundary-recall
    knob (hard assignment loses 19-32% of borderline pairs on the
    measured grid; top-2 cell assignment recovers >= 99.5% at ~2x cell
    work — experiments/results_r12.json).

    The registered query (queries/llm.py) pins ``n_lists=8,
    lloyd_iters=2, soft_assign=1`` so its DuckDB oracle can replay the
    exact geometry; library callers should take these defaults instead.

    Plan: the two chains are independent (no cross shuffle) and meet in
    one full outer join on bounded drop lists.  Since r15 they are
    CONSTRUCTED from two driver threads (guide §2.6 — overlap
    independent jobs): both chains run eager materialization actions
    (the text chain's signature/verify checkpoints, the embedding
    chain's quantizer sample collect), and sequential construction
    serialized them — the embedding chain's small jobs now back-fill
    executors freed by the text chain's stage tails.  Each chain's
    result is deterministic in isolation and they share no state beyond
    the (lock-guarded) table memos and idempotent session confs, so the
    output is schedule-independent; ``inheritable_thread_target`` keeps
    JVM thread-local job properties sane on both."""
    import math
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from mapreduce_minhash_lsh_spark.operators.semdedup import semdedup_drop_ids
    from mapreduce_minhash_lsh_spark.operators.similarity import similar_pairs

    if n_lists is None:
        n_lists = max(1, math.isqrt(emb.count()))

    def text_chain() -> DataFrame:
        pairs = similar_pairs(docs, cfg)
        # prepared: the flagship's verified pairs are unique (a < b)
        # rows projected off the checkpointed counts relation (r15).
        groups = near_dup_groups(pairs, prepared=True)
        return groups.where(F.col("doc_id") != F.col("group_id")).select(
            "doc_id", F.lit(True).alias("by_text")
        )

    def emb_chain() -> DataFrame:
        return semdedup_drop_ids(
            emb,
            threshold=threshold,
            n_lists=n_lists,
            lloyd_iters=lloyd_iters,
            soft_assign=soft_assign,
        ).select(
            F.col("vec_id").alias("doc_id"), F.lit(True).alias("by_embedding")
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        ft = pool.submit(inheritable_thread_target(text_chain))
        fs = pool.submit(inheritable_thread_target(emb_chain))
        t, s = ft.result(), fs.result()
    return t.join(s, "doc_id", "full").select(
        "doc_id",
        F.coalesce(F.col("by_text"), F.lit(False)).alias("by_text"),
        F.coalesce(F.col("by_embedding"), F.lit(False)).alias("by_embedding"),
    )
