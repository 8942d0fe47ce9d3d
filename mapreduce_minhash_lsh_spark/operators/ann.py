"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

  * ``cosine_topk`` — brute force: broadcast the (small) query set and
    scan the corpus once; exact, O(|Q| * |corpus|).  The correctness
    baseline, and the right plan whenever |Q| is small.
  * ``lsh_topk`` — random-hyperplane (SRP) bucketing: 100 TB scale path.
    Corpus is hashed once to sign-pattern buckets; queries probe only
    their own bucket.  Approximate (recall < 1); cross-checked against
    brute force in tests.

Everything is built-in expressions; the exact-decimal dot products make
results bit-stable across partitionings (see functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MERSENNE_PRIME
from mapreduce_minhash_lsh_spark.functions.vectors import (
    cosine_from_parts,
    dot_exact,
    dot_scaled,
    norm2_exact,
)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared tail of every top-k variant: deterministic per-query rank
    over (cosine desc, neighbor_id asc), keep k."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank")
        ).where(F.col("rank") <= k)
    )


def norms(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return emb.select(F.col(id_col), norm2_exact(F.col(vec_col)).alias("n2"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Plan: broadcast queries against the corpus scan (one pass, no
    shuffle of the corpus), then a per-query window top-k.
    """
    n = norms(emb, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    nq = n.select(F.col(id_col).alias("query_id"), F.col("n2").alias("n2_q"))
    nc = n.select(F.col(id_col).alias("neighbor_id"), F.col("n2").alias("n2_c"))
    scored = (
        pairs.select(
            "query_id", "neighbor_id",
            dot_exact(F.col("q_vec"), F.col("c_vec")).alias("dot"),
        )
        .join(F.broadcast(nq), "query_id")
        .join(nc, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            cosine_from_parts(F.col("dot"), F.col("n2_q"), F.col("n2_c")).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter_margin: float = 1e-6,
    n_blocks: int = 8,
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold — embedding near-dup.

    Exact all-pairs is inherently O(n^2) comparisons; the design goal is
    to distribute that work with bounded per-task memory and ZERO driver
    materialization (no ``toPandas``/``collect`` of the corpus):

      1. *Triangle block self-join*: every vector is hashed into one of
         ``n_blocks`` blocks (xxhash64 — uniform regardless of id
         structure) and replicated to each of the ``n_blocks`` unordered
         block-pairs it participates in: (g,g) and (min(g,h),max(g,h))
         for h != g.  Each unordered vector pair (a,b) lands in exactly
         one group — the one keyed by its two block ids — so coverage is
         complete and duplicate-free at ANY threshold (no LSH recall
         loss; a threshold like 0.5 is far below where SRP banding could
         be exhaustive).
      2. *Prefilter*: per group, one Arrow-batched NumPy matmul
         (``applyInPandas``) scores the left block against the right
         block in a single BLAS call.  Candidates are kept at
         ``threshold - prefilter_margin``; the margin (1e-6) exceeds the
         ~1e-11 double-vs-scaled-int gap by 5 orders of magnitude, so no
         true pair can be lost.
      3. *Confirm*: survivors (a tiny set) are re-scored with the exact
         order-independent scaled-integer dot (functions/vectors.py) —
         the values the DuckDB oracle reproduces bit-for-bit.

    Scale contract: shuffle volume is ``n_blocks`` x corpus; per-task
    memory is ~2n/n_blocks vectors (two blocks).  Size ``n_blocks`` ~
    n_vectors x dim x 16 B / task_budget on a real cluster; parallelism
    is n_blocks*(n_blocks+1)/2 groups.  Nothing touches the driver.
    """
    import numpy as np
    import pandas as pd

    cut = threshold - prefilter_margin
    blocks = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    group_pairs = F.array(
        *[
            F.struct(
                F.least(F.col("blk"), F.lit(h)).alias("gi"),
                F.greatest(F.col("blk"), F.lit(h)).alias("gj"),
            )
            for h in range(n_blocks)
        ]
    )
    repl = (
        emb.select(F.col(id_col), F.col(vec_col), blocks.alias("blk"))
        .select(id_col, vec_col, "blk", F.explode(group_pairs).alias("grp"))
        .select(
            id_col, vec_col, "blk",
            F.col("grp.gi").alias("gi"), F.col("grp.gj").alias("gj"),
        )
    )

    def score_group(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        ids = np.asarray(pdf[id_col].values, dtype=np.int64)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        if len(ids) == 0:
            return pd.DataFrame({"vec_id_a": ids, "vec_id_b": ids})
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0] = np.inf
        unit = mat / nrm[:, None]
        if gi == gj:
            cos = unit @ unit.T
            ai, bi = np.nonzero((cos >= cut) & (ids[:, None] < ids[None, :]))
            a_ids, b_ids = ids[ai], ids[bi]
        else:
            left = np.asarray(pdf["blk"].values, dtype=np.int64) == gi
            cos = unit[left] @ unit[~left].T
            ai, bi = np.nonzero(cos >= cut)
            la, rb = ids[left][ai], ids[~left][bi]
            a_ids, b_ids = np.minimum(la, rb), np.maximum(la, rb)
        return pd.DataFrame({"vec_id_a": a_ids, "vec_id_b": b_ids})

    cand = repl.groupBy("gi", "gj").applyInPandas(
        score_group, schema="vec_id_a long, vec_id_b long"
    )
    # exact confirm on the (small) candidate set
    a = emb.select(F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .select(
            "vec_id_a", "vec_id_b",
            cosine_from_parts(
                dot_exact(F.col("va"), F.col("vb")),
                norm2_exact(F.col("va")),
                norm2_exact(F.col("vb")),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _srp_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5) from the
    affine family — no RNG state, reproducible everywhere."""
    planes = []
    for j in range(n_planes):
        a = (2 * seed + 1) * (2 * j + 3) % MERSENNE_PRIME
        row = [
            (((a * (i + 1) + j + 1) * 2654435761) % MERSENNE_PRIME)
            / MERSENNE_PRIME - 0.5
            for i in range(dim)
        ]
        planes.append(row)
    return planes


def srp_bucket(
    vec_col: F.Column | str, dim: int, n_planes: int = 8, seed: int = 42
) -> F.Column:
    """Signed-random-projection bucket id: n_planes sign bits packed into
    a long.  Map-side only — the corpus is hashed in one pass.

    The projection uses the scaled-integer dot (functions/vectors.py), so
    the sign — and therefore the bucket id — is independent of summation
    order and identical across engines: the DuckDB oracle for
    ``ann_lsh_topk`` reproduces the exact same buckets.  (A float fold
    could flip the sign of a near-zero projection between engines.)

    Accepts a plain Column (original loop) or a column NAME, which
    builds the whole bucket as ONE SQL-parsed expression — the r14
    construction fix (see functions/vectors.dot_scaled_sql): the
    Column-API loop costs n_planes x (dim F.lit + two lambdas) of py4j
    round trips per call, pure driver-side Python."""
    from mapreduce_minhash_lsh_spark.functions.vectors import (
        dot_scaled,
        dot_scaled_sql,
    )

    planes = _srp_planes(dim, n_planes, seed)
    if isinstance(vec_col, str):
        terms = " + ".join(
            f"(CASE WHEN {dot_scaled_sql(f'`{vec_col}`', 'array(' + ','.join(_dfmt(x) for x in plane) + ')')}"
            f" > CAST(0 AS BIGINT) THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j, plane in enumerate(planes)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {terms}")
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = dot_scaled(vec_col, lit_plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP-bucket the corpus once, multi-probe each
    query's bucket plus its n_planes hamming-1 neighbours (flip one sign
    bit — the standard multiprobe trick), exact-rank within the probed
    set.  Work per query ~ (n_planes+1)/2^n_planes of the corpus; recall
    measured in tests/test_ann.py."""
    cb = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    base = srp_bucket(vec_col, dim, n_planes, seed)
    probes = F.array(base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probes).alias("bucket"),
    )
    pairs = cb.join(F.broadcast(qb), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id",
        cosine_from_parts(
            dot_exact(F.col("q_vec"), F.col("c_vec")),
            norm2_exact(F.col("q_vec")),
            norm2_exact(F.col("c_vec")),
        ).alias("cosine"),
    )
    return _rank_topk(scored, k)


# Hard cap on the quantizer training sample.  This is the ONLY driver-side
# materialization in the ANN family: k x dim centroid doubles plus per-round
# (k x dim) sum rows — never the corpus.  Keep the bound a named constant so
# an edit can't silently unbound it (guarded by tests/test_ann.py).
IVF_TRAIN_CAP = 4096


def _dfmt(x: float) -> str:
    """SQL double literal with exact bit round-trip: Python repr() emits
    the shortest digits that uniquely identify the double, and Spark's
    parser recovers it via Double.parseDouble (correctly rounded).

    Non-finite values fail LOUDLY here: repr(nan) would render as the
    unparseable SQL token 'nanD' (and upstream, numpy's NaN floor in
    _centroids is undefined while Spark's double->long cast yields 0),
    so a NaN/Inf-bearing quantizer must never reach literal emission —
    clean the embedding column first (ADVICE r10)."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(
            f"non-finite value {x!r} in a quantizer literal: embeddings "
            "containing NaN/Inf must be filtered or imputed before "
            "training (a NaN component would otherwise produce an "
            "unparseable SQL literal and driver/engine divergence)"
        )
    return repr(x) + "D"


def _lut_cols(
    books: list[list[tuple[int, list[float]]]], vec_col: str, sub: int
) -> list[F.Column]:
    """Per-subspace ADC lookup arrays (``lut{j}`` = the query
    subvector's scaled-int dot against each codebook entry) built as
    ONE SQL-parsed expression per subspace.

    The Column-API form (m x n_codes ``dot_scaled`` calls, two lambdas
    each) costs thousands of py4j round trips — measured 5-6 s of
    driver-side Python per ivfpq_query construction at the bench
    config (8 x 16), which dominated ann_ivfpq_topk's wall clock.  The
    SQL text parses to the semantically identical tree
    (functions/vectors.dot_scaled_sql — bit-equal, pinned by test), so
    the scan arithmetic and every downstream value are unchanged."""
    from mapreduce_minhash_lsh_spark.functions.vectors import dot_scaled_sql

    return [
        F.expr(
            "array(" + ",".join(
                dot_scaled_sql(
                    f"slice(`{vec_col}`, {j * sub + 1}, {sub})",
                    f"array({','.join(_dfmt(x) for x in cvec)})",
                )
                for _cid, cvec in books[j]
            ) + ")"
        ).alias(f"lut{j}")
        for j in range(len(books))
    ]


def _dlit_array(vals: list[float]) -> F.Column:
    """array<double> literal built as ONE SQL-parsed expression.  The
    Column-API equivalent (F.array of per-element F.lit) costs a py4j
    round trip per element — ~1 s to construct a 16 x 64 centroid tree,
    paid per Lloyd round per quantizer, which dominated small-corpus
    IVF/PQ wall time (measured 350x faster this way, bit-identical)."""
    return F.expr(f"array({','.join(_dfmt(x) for x in vals)})")


def _cent_sql(cents: list[tuple[int, list[float]]]) -> str:
    """Centroids as array<struct<cid,cvec>> literal SQL text."""
    parts = ",".join(
        f"struct({int(cid)} AS cid, array({','.join(_dfmt(x) for x in vec)}) AS cvec)"
        for cid, vec in cents
    )
    return f"array({parts})"


def _cent_literal(cents: list[tuple[int, list[float]]]) -> F.Column:
    """Centroids as an array<struct<cid,cvec>> literal (broadcast-sized);
    single SQL-parsed expression — see :func:`_dlit_array` for why."""
    return F.expr(_cent_sql(cents))


def _assign_expr(
    cents: list[tuple[int, list[float]]], vec: F.Column | str, top: int
) -> F.Column:
    """Array of the `top` nearest centroid ids by exact cosine,
    deterministic tie-break (cosine desc, cid asc).

    Accepts a plain Column (original form) or a SQL fragment STRING
    naming the vector (e.g. ``"`embedding`"`` or a slice(...) text),
    which renders the whole assignment as ONE SQL-parsed expression —
    the r15 construction fix, same recipe as ``_lut_cols``/``srp_bucket``:
    the Column form's three ``dot_scaled`` lambdas cost ~120 py4j round
    trips (~0.12 s measured) PER call, and an IVF-PQ index build makes
    1 + m + 1 such calls.  The parsed tree is identical (same scaled-int
    dot, same neg-cos/cid sort key — pinned bit-equal and plan-equal by
    tests/test_ann.py::test_assign_sql_matches_column_path)."""
    if isinstance(vec, str):
        from mapreduce_minhash_lsh_spark.functions.vectors import (
            SCALE,
            dot_scaled_sql,
        )

        s = f"{SCALE!r}D"
        dot = f"({dot_scaled_sql(vec, 'c.cvec')} / {s})"
        n2v = f"({dot_scaled_sql(vec, vec)} / {s})"
        n2c = f"({dot_scaled_sql('c.cvec', 'c.cvec')} / {s})"
        cos = f"({dot} / (SQRT({n2v}) * SQRT({n2c})))"
        scored = (
            f"transform({_cent_sql(cents)}, "
            f"c -> struct(-{cos} AS neg_cos, c.cid AS cid))"
        )
        return F.expr(
            f"transform(slice(array_sort({scored}), 1, {top}), s -> s.cid)"
        )
    scored = F.transform(
        _cent_literal(cents),
        lambda c: F.struct(
            (-cosine_from_parts(
                dot_exact(vec, c["cvec"]),
                norm2_exact(vec),
                norm2_exact(c["cvec"]),
            )).alias("neg_cos"),
            c["cid"].alias("cid"),
        ),
    )
    return F.transform(F.slice(F.array_sort(scored), 1, top), lambda s: s["cid"])


# Above this many centroids the expression-based exact assignment
# (O(n_lists x dim) of interpreted higher-order-function arithmetic PER
# ROW) stops being viable — at n_lists ~ sqrt(1M) = 1024 it is ~100x the
# work of the n_lists=16 oracle configuration.  The fast path below does
# the same argmax as ONE numpy matmul per Arrow batch; 'auto' switches
# to it past this threshold.
ASSIGN_FAST_THRESHOLD = 32


def _assign_fast_udf(cents: list[tuple[int, list[float]]], top: int):
    """Arrow-batched centroid assignment: rank by cosine == rank by dot
    against unit-normalized centroids (query norm is a positive scale),
    computed as a (batch x dim) @ (dim x k) float64 matmul — the
    FAISS-style scale path for large ``n_lists``.  Tie-break matches
    :func:`_assign_expr` (cosine desc, cid asc) via a stable argsort
    over cid-ascending centroid columns; exact-decimal vs float64
    rounding can still order true near-ties differently, which only
    perturbs which list a borderline vector lands in (recall-neutral),
    so 'fast' is for the large-n_lists regime where the oracle-exact
    expression path is off the table anyway."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    order0 = sorted(range(len(cents)), key=lambda i: cents[i][0])
    cids = np.array([cents[i][0] for i in order0], dtype=np.int64)
    mat = np.array([cents[i][1] for i in order0], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    matn = (mat / np.where(nrm > 0, nrm, 1.0)).T  # dim x k

    def assign(vs):
        if not len(vs):
            return pd.Series([], dtype=object)
        sims = np.stack(vs.to_numpy()).astype(np.float64) @ matn
        # stable sort on -cos over cid-ascending columns == (cos desc,
        # cid asc); full per-row argsort is k log k — noise next to the
        # matmul for any top we use.
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :top]
        return pd.Series([cids[r].tolist() for r in idx])

    # pd is function-local, so string type hints would not resolve;
    # attach real annotation objects instead.
    assign.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "array<long>")


def _assign_col(
    cents: list[tuple[int, list[float]]],
    vec: F.Column | str,
    top: int,
    assign: str,
) -> F.Column:
    """Nearest-``top`` centroid ids for ``vec`` under the chosen
    strategy: 'exact' (oracle-bit-reproducible expression arithmetic),
    'fast' (Arrow-batch matmul), or 'auto' (fast iff
    len(cents) > ASSIGN_FAST_THRESHOLD).  ``vec`` may be a Column or a
    SQL fragment string (see :func:`_assign_expr`); the string form is
    the cheap-construction path every internal caller uses."""
    if assign == "auto":
        assign = "fast" if len(cents) > ASSIGN_FAST_THRESHOLD else "exact"
    if assign == "exact":
        return _assign_expr(cents, vec, top)
    if assign == "fast":
        if isinstance(vec, str):
            vec = F.expr(vec)
        return _assign_fast_udf(cents, top)(vec)
    raise ValueError(f"assign must be 'exact', 'fast' or 'auto', got {assign!r}")


def _centroids(
    emb: DataFrame, k: int, iters: int, id_col: str, vec_col: str,
    assign: str = "auto",
    sample_mat=None,
) -> list[tuple[int, list[float]]]:
    """Deterministic, engine-portable coarse quantizer.

    ``assign`` picks the Lloyd-round assignment strategy (see
    :func:`_assign_col`): at k beyond ASSIGN_FAST_THRESHOLD the exact
    expression is a k x dim literal tree (65k nodes at k=1024) whose
    analysis alone dwarfs the arithmetic, so 'auto' moves training to
    the same Arrow matmul the corpus assignment uses; the quantized
    int64 UPDATE step below is strategy-independent, so the rounds stay
    partition-order deterministic either way.

    Seed centroids = the k lowest-id vectors; then ``iters`` Lloyd rounds
    over a bounded deterministic sample (lowest IVF_TRAIN_CAP ids), with
    every arithmetic step exact and order-independent so the DuckDB
    oracle reproduces the centroids BIT-FOR-BIT:

      * assignment: argmax of the scaled-integer cosine
        (functions/vectors.py) — doubles derived from int64 sums, ties to
        the lower cid;
      * update: per-dimension sums of 1e-12-quantized components in
        int64 (associative — partitioning-independent), then
        mean = (double(sum) / 1e12) / double(n) in a pinned evaluation
        order.  Empty clusters keep their previous centroid.

    A float-mean Lloyd (np.mean) would be pairwise-summation-order
    dependent and unreproducible in SQL; this one is plain integer
    arithmetic plus IEEE ops every engine rounds identically.

    Execution (round 10): the Lloyd loop runs DRIVER-SIDE in numpy over
    the collected sample.  The sample was always driver-bounded
    (<= IVF_TRAIN_CAP rows — ~2 MB at 4096 x 64 doubles, independent of
    corpus size); the earlier cluster-side loop scheduled
    iters x quantizers small jobs whose latency, not compute, dominated
    every small-corpus index build (measured: the 9-quantizer IVF-PQ
    config spent ~5.4 s in 27 bounded-sample jobs).  Every numpy op
    used is IEEE-exact (float64 multiply, floor, int64 sum, pinned-
    order division) or correctly rounded (sqrt), and the rank-1 pick is
    a stable ascending argsort on (neg_cos, cid-order) — NaN-last, the
    same total order Spark's array_sort and DuckDB's row_number apply —
    so the centroids are BIT-IDENTICAL to the cluster-side loop and to
    the unrolled-CTE oracles (gated by the oracle-parity sweep over
    every quantizer-backed query).  ``assign`` is retained for API
    compatibility; training now always uses the exact quantized
    arithmetic (the numpy matmul-with-floor is fast at any supported
    k), while corpus/probe ASSIGNMENT strategy remains the caller's
    choice and stays distributed."""
    import numpy as np

    from mapreduce_minhash_lsh_spark.functions.vectors import SCALE

    # Training arithmetic is strategy-independent since round 10 (see
    # above).  MIGRATION NOTE (ADVICE r10): indexes built before that
    # with assign='fast'/'auto' above ASSIGN_FAST_THRESHOLD trained
    # through the float matmul and can yield DIFFERENT centroids than a
    # re-derivation under this exact-quantized path — stored list
    # assignments / PQ codes from such builds must be used with their
    # PERSISTED quantizers (the cents= pin of ivf_index), never
    # re-derived.  Warn in exactly that re-derivation scenario.
    if assign in ("fast", "auto") and k > ASSIGN_FAST_THRESHOLD:
        import warnings

        warnings.warn(
            "quantizer training is now always exact-quantized; a "
            f"{assign!r}-mode index built before round 10 at k={k} > "
            f"{ASSIGN_FAST_THRESHOLD} may not reproduce its original "
            "centroids — pin the persisted quantizer (cents=/books=) "
            "instead of re-deriving it",
            stacklevel=3,
        )
    del assign
    if sample_mat is not None:
        # pre-collected (n, dim) float64 sample — multi-quantizer
        # builders (pq_codebooks, ivfpq_index) collect the sample ONCE
        # and slice it driver-side instead of scheduling one
        # TakeOrdered job per sub-quantizer
        V = np.asarray(sample_mat, dtype=np.float64)
    else:
        rows = (
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
            .orderBy("vec_id")
            .limit(IVF_TRAIN_CAP)
            .collect()
        )
        V = np.asarray([[float(x) for x in r["vec"]] for r in rows], dtype=np.float64)
    n, dim = V.shape if V.ndim == 2 else (0, 0)
    cents = [(i, [float(x) for x in V[i]]) for i in range(min(k, n))]
    if n == 0:
        return cents
    # constants across rounds: 1e-12-quantized components (the update
    # step's summand) and each sample vector's scaled-int squared norm
    quant = np.floor(V * SCALE).astype(np.int64)
    n2v = (np.floor(V * V * SCALE).astype(np.int64).sum(axis=1)).astype(
        np.float64
    ) / SCALE

    def scaled_dots(B: np.ndarray) -> np.ndarray:
        """(n, |B|) doubles: int64 sums of floor(v_i * b_i * 1e12) / 1e12
        — elementwise floor BEFORE the sum, exactly the engine's
        dot_scaled.  Chunked over sample rows to bound the (rows x k x
        dim) temporary."""
        out = np.empty((n, B.shape[0]), dtype=np.float64)
        step = max(1, (1 << 24) // max(1, B.shape[0] * dim))
        for s in range(0, n, step):
            blk = V[s : s + step, None, :] * B[None, :, :] * SCALE
            out[s : s + step] = np.floor(blk).astype(np.int64).sum(axis=2) / SCALE
        return out

    for _ in range(iters):
        C = np.asarray([vec for _cid, vec in cents], dtype=np.float64)
        n2c = (np.floor(C * C * SCALE).astype(np.int64).sum(axis=1)).astype(
            np.float64
        ) / SCALE
        neg_cos = -(scaled_dots(C) / (np.sqrt(n2v)[:, None] * np.sqrt(n2c)[None, :]))
        # rank-1 centroid per row: ascending stable argsort keeps the
        # lower cid on exact ties and sorts NaN last (zero-norm rows)
        pick = np.argsort(neg_cos, axis=1, kind="stable")[:, 0]
        sums = np.zeros((len(cents), dim), dtype=np.int64)
        np.add.at(sums, pick, quant)
        counts = np.bincount(pick, minlength=len(cents)).astype(np.float64)
        means = (sums.astype(np.float64) / SCALE) / np.where(counts == 0, 1.0, counts)[:, None]
        cents = [
            (cid, [float(x) for x in means[j]] if counts[j] else prev)
            for j, (cid, prev) in enumerate(cents)
        ]
    return cents


def ivf_index(
    emb: DataFrame,
    n_lists: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
    cents: list[tuple[int, list[float]]] | None = None,
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Build the IVF inverted-list index once: train the coarse
    quantizer on a bounded driver-side sample, then assign every corpus
    vector to its nearest centroid fully distributed (one map-side
    argmax against broadcast centroids — no shuffle).

    Returns ``(centroids, corpus)`` with corpus =
    (neighbor_id, c_vec, list_id).  The split from :func:`ivf_query`
    is the production shape: at 100 TB the assigned corpus is written
    to parquet PARTITIONED BY list_id once per ingest, and every later
    query batch reads only its probed lists (partition pruning) —
    re-deriving the index per batch, as a fused call does, re-pays the
    assignment scan every time.

    Pass ``cents`` (a previous build's centroids) to SKIP training and
    assign ``emb`` with the existing quantizer — the incremental-ingest
    path: a new crawl's vectors get list ids consistent with the stored
    index, so its partitionBy(list_id) parquet APPENDS into the same
    lists and every prior list assignment stays valid (retraining would
    silently re-map them)."""
    if cents is None:
        cents = _centroids(emb, n_lists, lloyd_iters, id_col, vec_col, assign)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(_assign_col(cents, f"`{vec_col}`", 1, assign), 1).alias("list_id"),
    )
    return cents, corpus


def ivf_query(
    cents: list[tuple[int, list[float]]],
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
    prune: bool = False,
) -> DataFrame:
    """Query a prebuilt IVF index (see :func:`ivf_index`): probe the
    n_probe nearest lists per query, exact-rank within the probed
    union.  The probe side is |Q| x n_probe rows — broadcast — so the
    corpus is never shuffled.

    ``prune=True`` collects the probed list ids (bounded by
    |Q| x n_probe ints) and filters the corpus to them BEFORE the join:
    against a corpus written ``partitionBy('list_id')`` this is literal
    partition pruning — the scan reads only the probed lists' files.
    The win is for small query batches; a large diverse batch probes
    nearly every list, so the default skips the extra probe-side
    action."""
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_assign_col(cents, f"`{vec_col}`", n_probe, assign)).alias("list_id"),
    )
    if prune:
        lists = [r.list_id for r in probes.select("list_id").distinct().collect()]
        corpus = corpus.where(F.col("list_id").isin(lists))
    pairs = corpus.join(F.broadcast(probes), "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id",
        cosine_from_parts(
            dot_exact(F.col("q_vec"), F.col("c_vec")),
            norm2_exact(F.col("q_vec")),
            norm2_exact(F.col("c_vec")),
        ).alias("cosine"),
    )
    return _rank_topk(scored, k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """IVF-style ANN in one call: :func:`ivf_index` then
    :func:`ivf_query`.  The fused form re-derives the corpus assignment
    every call — fine for one-shot queries; for repeated query batches
    build the index once and persist it (the split API's point).

    ``assign='auto'`` keeps the oracle-bit-exact expression arithmetic
    up to ASSIGN_FAST_THRESHOLD centroids (every registered oracle
    configuration) and switches to the Arrow-batch matmul beyond it,
    where the expression path's per-row O(n_lists x dim) interpreted
    cost is the difference between viable and not (SCALE.md §3).
    Recall vs brute force measured in tests."""
    cents, corpus = ivf_index(emb, n_lists, lloyd_iters, id_col, vec_col, assign)
    return ivf_query(cents, corpus, queries, k, n_probe, id_col, vec_col, assign)


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-compressed ANN codes + ADC scoring
# ---------------------------------------------------------------------------

PQ_RERANK_DEFAULT = 30


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
    sample_mat=None,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace codebooks: split the vector into ``m`` contiguous
    sub-vectors of dim/m and run the shared deterministic quantizer
    (:func:`_centroids`) on each slice.  Codewords quantize sub-vector
    DIRECTION (the scaled-int cosine assignment every ANN path here
    shares) — "spherical PQ", matched to the dot/cosine scoring the
    queries rank by; magnitude error is absorbed by the exact re-rank.
    Same oracle-bit-exactness as the IVF quantizer: seeds are the
    n_codes lowest-id sub-vectors, Lloyd updates are int64 sums of
    1e-12-quantized components."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    if sample_mat is None:
        sample_mat = _collect_sample(emb, id_col, vec_col)
    # slicing the ONE collected sample replaces m TakeOrdered jobs; the
    # per-subspace Lloyd is driver-side numpy (see _centroids), so the
    # whole codebook build is one Spark job + arithmetic
    return [
        _centroids(
            emb, n_codes, iters, id_col, vec_col, assign,
            sample_mat=sample_mat[:, j * sub : (j + 1) * sub],
        )
        for j in range(m)
    ]


def _collect_sample(emb: DataFrame, id_col: str, vec_col: str):
    """The shared bounded training sample (lowest IVF_TRAIN_CAP ids) as
    an (n, dim) float64 matrix — collected once, sliced per quantizer."""
    import numpy as np

    rows = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .orderBy("vec_id")
        .limit(IVF_TRAIN_CAP)
        .collect()
    )
    return np.asarray([[float(x) for x in r["vec"]] for r in rows], dtype=np.float64)


def pq_encode(
    emb: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
) -> DataFrame:
    """(id, code0..code{m-1}) — each vector compressed to m small ints
    (m * log2(n_codes) bits: 4x16 -> 2 bytes for a 256-byte float64
    vector).  Map-side only: the codebooks ride into the task as
    literals/broadcast, the corpus is never shuffled."""
    sub = dim // len(books)
    cols = [
        F.element_at(
            _assign_col(books[j], f"slice(`{vec_col}`, {j * sub + 1}, {sub})", 1, assign),
            1,
        ).cast("integer").alias(f"code{j}")
        for j in range(len(books))
    ]
    return emb.select(F.col(id_col).alias("neighbor_id"), *cols)


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 2,
    rerank: int = PQ_RERANK_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank — the FAISS-style
    compressed-scan design, Spark-shaped.

    100 TB story: the scan side touches only the code columns (m ints
    per vector — memory-resident at billions of vectors where the float
    corpus is not); per-query lookup tables (m x n_codes scaled-int
    dots) broadcast; the ADC score is m integer array lookups + adds
    per (vector, query) — no float math, no UDF, no corpus shuffle
    until the |Q| x rerank candidate relation (tiny) joins back to
    fetch true vectors for the exact re-rank.

    Determinism: ADC scores are int64 sums of scaled-int dots, the
    candidate cut ties on neighbor_id, and the re-rank reuses the exact
    cosine tail every other ANN path shares — so the DuckDB oracle
    reproduces the full result bit-for-bit (queries/ann.py
    _pq_oracle_sql).

    The fused form re-trains and re-encodes per call — one-shot use.
    For repeated query batches build once (pq_codebooks + pq_encode,
    codes written to parquet) and call :func:`pq_query` per batch, the
    same production split as ivf_index/ivf_query."""
    books = pq_codebooks(emb, dim, m, n_codes, iters, id_col, vec_col, assign)
    codes = pq_encode(emb, books, dim, id_col, vec_col, assign)
    return pq_query(
        books, codes, emb, queries, dim,
        k=k, rerank=rerank, id_col=id_col, vec_col=vec_col,
    )


def pq_query(
    books: list[list[tuple[int, list[float]]]],
    codes: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    rerank: int = PQ_RERANK_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a prebuilt PQ index (``codes`` from :func:`pq_encode`,
    typically read back from parquet): broadcast per-query LUTs, int64
    ADC scan over the code columns, top-``rerank`` candidate cut
    (WindowGroupLimit — per-partition heaps before the shuffle), exact
    cosine re-rank of the candidates against ``emb``."""
    m = len(books)
    sub = dim // m
    luts = queries.select(
        F.col(id_col).alias("query_id"),
        *_lut_cols(books, vec_col, sub),
    )
    adc = _adc_score(m)
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    cand = _adc_candidates(scored, rerank)
    return _exact_rerank(cand, emb, queries, k, id_col, vec_col)


def _adc_score(m: int):
    """Σ_j lut{j}[code{j}] — the pure-int64 ADC score expression."""
    adc = None
    for j in range(m):
        term = F.element_at(F.col(f"lut{j}"), F.col(f"code{j}") + 1)
        adc = term if adc is None else adc + term
    return adc


def _adc_candidates(scored: DataFrame, rerank: int) -> DataFrame:
    """Top-``rerank`` neighbors per query by ADC score (ties on
    neighbor_id — engine-exact cut): WindowGroupLimit pushes
    per-partition heaps below the shuffle."""
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("prank")
        )
        .where(F.col("prank") <= rerank)
        .select("query_id", "neighbor_id")
    )


def _exact_rerank(
    cand: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine rank of (query_id, neighbor_id) candidates — the
    shared tail of the compressed-scan paths (PQ, IVF-PQ).  The
    candidate relation is |Q| x rerank rows (tiny); only it joins back
    to the float corpus, so the re-rank never rescans unprobed
    vectors."""
    n = norms(emb, id_col, vec_col)
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    nq = n.select(F.col(id_col).alias("query_id"), F.col("n2").alias("n2_q"))
    nc = n.select(F.col(id_col).alias("neighbor_id"), F.col("n2").alias("n2_c"))
    exact = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            dot_exact(F.col("q_vec"), F.col("c_vec")).alias("dot"),
        )
        .join(F.broadcast(nq), "query_id")
        .join(nc, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            cosine_from_parts(F.col("dot"), F.col("n2_q"), F.col("n2_c")).alias("cosine"),
        )
    )
    return _rank_topk(exact, k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + compressed ADC scan within probed lists
# ---------------------------------------------------------------------------


def ivfpq_index(
    emb: DataFrame,
    dim: int,
    n_lists: int = 16,
    m: int = 4,
    n_codes: int = 16,
    lloyd_iters: int = 2,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]], DataFrame]:
    """Build the combined FAISS-IVFPQ-style index: the IVF coarse
    quantizer prunes WHICH vectors a query scans (partition the corpus
    into ``n_lists`` inverted lists), PQ compresses WHAT the scan reads
    (m small int codes instead of the float vector).  Returns
    ``(cents, books, codes)`` with codes = (neighbor_id, list_id,
    code0..code{m-1}) — derived in ONE map-side projection over the
    corpus (quantizers ride in as literals; no join, no shuffle).

    Codes are quantized on the RAW vector, not the IVF residual
    (``by_residual=false`` in FAISS terms): the repo's spherical PQ
    quantizes sub-vector direction for the cosine/dot scoring every ANN
    path shares, a geometry residuals would break — and the exact
    re-rank absorbs the coarser approximation either way.

    100 TB story: write ``codes`` to parquet ``partitionBy('list_id')``
    once per ingest — each query batch then scans only its probed
    lists' files (literal partition pruning, the IVF win) AND reads
    only m int columns per vector instead of the float corpus (the PQ
    win, ~64x smaller at the registered 8x16 config).  Incremental
    ingest pins both quantizers exactly like :func:`ivf_index`'s
    ``cents`` path: re-deriving them per batch would re-map every
    stored list and code."""
    # ONE sample collect feeds all 1 + m quantizers (Lloyd itself is
    # driver-side numpy — _centroids), so the whole training phase is
    # a single Spark job plus arithmetic.
    sample_mat = _collect_sample(emb, id_col, vec_col)
    cents = _centroids(
        emb, n_lists, lloyd_iters, id_col, vec_col, assign, sample_mat=sample_mat
    )
    books = pq_codebooks(
        emb, dim, m, n_codes, pq_iters, id_col, vec_col, assign,
        sample_mat=sample_mat,
    )
    sub = dim // m
    codes = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_assign_col(cents, f"`{vec_col}`", 1, assign), 1).alias("list_id"),
        *[
            F.element_at(
                _assign_col(
                    books[j], f"slice(`{vec_col}`, {j * sub + 1}, {sub})", 1, assign
                ),
                1,
            ).cast("integer").alias(f"code{j}")
            for j in range(m)
        ],
    )
    return cents, books, codes


def ivfpq_query(
    cents: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    codes: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_probe: int = 2,
    rerank: int = PQ_RERANK_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
    prune: bool = False,
) -> DataFrame:
    """Query a prebuilt IVF-PQ index: assign each query its ``n_probe``
    nearest coarse lists and its per-subspace ADC lookup tables in one
    probe-side projection (|Q| x n_probe rows — broadcast; the LUT
    arrays ride along), equi-join on list_id so the ADC scan touches
    only probed lists, int64 ADC cut to ``rerank`` candidates, exact
    cosine re-rank.  ``prune=True`` filters the code relation to the
    probed list ids before the join (literal partition pruning against
    a partitionBy('list_id') parquet index), same trade-off as
    :func:`ivf_query`."""
    m = len(books)
    sub = dim // m
    luts = queries.select(
        F.col(id_col).alias("query_id"),
        *_lut_cols(books, vec_col, sub),
        F.explode(_assign_col(cents, f"`{vec_col}`", n_probe, assign)).alias("list_id"),
    )
    if prune:
        lists = [r.list_id for r in luts.select("list_id").distinct().collect()]
        codes = codes.where(F.col("list_id").isin(lists))
    scored = (
        codes.join(F.broadcast(luts), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _adc_score(m).alias("adc"))
    )
    cand = _adc_candidates(scored, rerank)
    return _exact_rerank(cand, emb, queries, k, id_col, vec_col)


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    lloyd_iters: int = 2,
    pq_iters: int = 2,
    rerank: int = PQ_RERANK_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "exact",
) -> DataFrame:
    """IVF-PQ in one call (:func:`ivfpq_index` + :func:`ivfpq_query`) —
    one-shot form; for repeated batches build once and persist the code
    relation, the same split as every other index here."""
    cents, books, codes = ivfpq_index(
        emb, dim, n_lists, m, n_codes, lloyd_iters, pq_iters, id_col, vec_col, assign
    )
    return ivfpq_query(
        cents, books, codes, emb, queries, dim,
        k=k, n_probe=n_probe, rerank=rerank,
        id_col=id_col, vec_col=vec_col, assign=assign,
    )
