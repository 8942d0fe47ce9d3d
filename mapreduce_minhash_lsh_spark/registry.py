"""Query registry: the driver-contract surface (__spark_entry__).

Every entry pairs a Spark DataFrame callable with a DuckDB oracle SQL
twin that computes the *identical* result — same seeded hash literals,
same column names, same (deterministic) value arithmetic.  Design rules
that make cross-engine value-hash equality hold:

  * integer arithmetic everywhere possible (ids, counts, epochs);
  * double outputs are either raw column pass-throughs, ratios of
    identical integers, or exact decimal sums cast to double — never
    order-dependent float accumulation;
  * every computed column aliased identically on both sides;
  * all randomness is seeded config literals embedded in both texts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.config import MinHashLSHConfig
from mapreduce_minhash_lsh_spark.operators.lsh import band_keys, candidate_pairs
from mapreduce_minhash_lsh_spark.operators.minhash import (
    minhash_signatures,
    signatures_long,
)
from mapreduce_minhash_lsh_spark.operators.shingling import (
    explode_shingles,
    shingle_postings,
    vocabulary,
)
from mapreduce_minhash_lsh_spark.operators.similarity import (
    exact_jaccard,
    similar_pairs,
    symmetric_pairs,
)
from mapreduce_minhash_lsh_spark.sources.tables import load_table

# Oracle-checked pipeline config: 32 hashes in 4 bands of 8 rows puts the
# LSH s-curve threshold at (1/4)^(1/8) ~= 0.84 — steep between the
# corpus's j~0.5 word-soup background and the j>=0.9 planted near-dups,
# which keeps the candidate set (and so the verification join) bounded at
# sf0.01 driver scale.  'rank' strategy so the DuckDB twin is exact.
PIPELINE_CFG = MinHashLSHConfig(num_hashes=32, num_bands=4, threshold=0.8)

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect), kept in lockstep with the
# operator implementations they mirror.
# --------------------------------------------------------------------------

_CFG = PIPELINE_CFG
_PARAMS = _CFG.hash_params()
_A = [a for a, _ in _PARAMS]
_B = [b for _, b in _PARAMS]
_P = _CFG.prime
_K = _CFG.k
_R = _CFG.rows_per_band

# (doc_id, shingle) distinct — mirror of operators.shingling.explode_shingles
_SH_CTE = f"""
sh AS (
  SELECT DISTINCT doc_id, rpad(substr(text, CAST(i AS INTEGER), {_K}), {_K}, ' ') AS shingle
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
    FROM documents WHERE length(text) > 0
  )
)"""

_VOCAB_CTE = """
vocab AS (
  SELECT shingle, CAST(row_number() OVER (ORDER BY shingle) AS BIGINT) AS shingle_id
  FROM (SELECT DISTINCT shingle FROM sh)
)"""

_SIG_CTE = f"""
ids AS (SELECT sh.doc_id, v.shingle_id FROM sh JOIN vocab v USING (shingle)),
params AS (SELECT unnest({_A}) AS a, unnest({_B}) AS b, unnest({list(range(_CFG.num_hashes))}) AS h),
sig AS (
  SELECT doc_id, h, min((CAST(a AS BIGINT) * shingle_id + b) % {_P}) AS minhash
  FROM ids CROSS JOIN params
  GROUP BY doc_id, h
)"""

_BANDS_CTE = f"""
bands AS (
  SELECT doc_id, CAST(h // {_R} AS INTEGER) AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY h) AS band_key
  FROM sig GROUP BY doc_id, h // {_R}
)"""

_CAND_CTE = """
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

_JACCARD_CTE = """
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_a, c.doc_id_b, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_id_a
  JOIN sh sb ON sb.doc_id = c.doc_id_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_id_a, c.doc_id_b
),
jac AS (
  SELECT i.doc_id_a, i.doc_id_b,
         CAST(i.n_common AS DOUBLE) / (na.n + nb.n - i.n_common) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_id_a
  JOIN sizes nb ON nb.doc_id = i.doc_id_b
)"""

_PIPELINE_CTES = ",".join([_SH_CTE, _VOCAB_CTE, _SIG_CTE, _BANDS_CTE, _CAND_CTE, _JACCARD_CTE])


# --------------------------------------------------------------------------
# Pipeline queries (SURVEY.md §2: P1-P6, A1-A4, J1, F1-F4)
# --------------------------------------------------------------------------

@register("shingling", f"WITH {_SH_CTE} SELECT doc_id, shingle FROM sh")
def q_shingling(spark: SparkSession, sf: str) -> DataFrame:
    """P1: overlapping char-3-shingles, set semantics (Shingling.java:33-42)."""
    return explode_shingles(load_table(spark, sf, "documents"), _CFG.k)


@register(
    "shingle_postings",
    f"""WITH psh AS (
  SELECT doc_id, rpad(substr(text, CAST(i AS INTEGER), {_K}), {_K}, ' ') AS shingle
  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents WHERE length(text) > 0)
)
SELECT shingle,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
       count(*) AS n_postings
FROM psh GROUP BY shingle""",
)
def q_shingle_postings(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2: inverted index with multiplicity (Shingling.java:45-65);
    posting list as a sorted comma-joined string for cross-engine hashing."""
    docs = load_table(spark, sf, "documents")
    return shingle_postings(docs).select(
        "shingle",
        F.array_join(F.col("doc_ids").cast("array<string>"), ",").alias("doc_ids"),
        F.size("doc_ids").cast("long").alias("n_postings"),
    )


@register("vocabulary", f"WITH {_SH_CTE}, {_VOCAB_CTE} SELECT shingle, shingle_id FROM vocab")
def q_vocabulary(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic vocabulary (fixes MinHashLSH.java:55-80 HashMap order)."""
    return vocabulary(explode_shingles(load_table(spark, sf, "documents"), _CFG.k))


@register(
    "minhash_signatures",
    f"WITH {_SH_CTE}, {_VOCAB_CTE}, {_SIG_CTE} "
    "SELECT doc_id, CAST(h AS INTEGER) AS h, minhash FROM sig",
)
def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """P3: seeded universal-hash MinHash (replaces MinHashLSH.java:87-109)."""
    sh = explode_shingles(load_table(spark, sf, "documents"), _CFG.k)
    return signatures_long(sh, _CFG)


@register(
    "lsh_bands",
    f"WITH {_SH_CTE}, {_VOCAB_CTE}, {_SIG_CTE}, {_BANDS_CTE} "
    "SELECT doc_id, band, band_key FROM bands",
)
def q_lsh_bands(spark: SparkSession, sf: str) -> DataFrame:
    """P4 with the band index IN the key (fixes MinHashLSH.java:138-142)."""
    sh = explode_shingles(load_table(spark, sf, "documents"), _CFG.k)
    return band_keys(minhash_signatures(sh, _CFG), _CFG)


@register(
    "candidate_pairs",
    f"WITH {_SH_CTE}, {_VOCAB_CTE}, {_SIG_CTE}, {_BANDS_CTE}, {_CAND_CTE} "
    "SELECT doc_id_a, doc_id_b FROM cand",
)
def q_candidate_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """J1/F2: band-bucket equi-self-join candidates (MinHashLSH.java:168-193
    rebuilt as a join, not a single quadratic reducer)."""
    sh = explode_shingles(load_table(spark, sf, "documents"), _CFG.k)
    return candidate_pairs(band_keys(minhash_signatures(sh, _CFG), _CFG), _CFG)


@register(
    "similar_pairs",
    f"WITH {_PIPELINE_CTES} "
    f"SELECT doc_id_a, doc_id_b, jaccard FROM jac WHERE jaccard >= {_CFG.threshold}",
)
def q_similar_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship: LSH candidates + exact shingle-set Jaccard >= 0.8 — the
    intended semantics of the whole reference pipeline (README.md:2-3)."""
    return similar_pairs(load_table(spark, sf, "documents"), _CFG)


@register(
    "similar_pairs_symmetric",
    f"""WITH {_PIPELINE_CTES},
undirected AS (SELECT doc_id_a, doc_id_b FROM jac WHERE jaccard >= {_CFG.threshold})
SELECT doc_id_a, doc_id_b FROM undirected
UNION
SELECT doc_id_b AS doc_id_a, doc_id_a AS doc_id_b FROM undirected""",
)
def q_similar_pairs_symmetric(spark: SparkSession, sf: str) -> DataFrame:
    """P6/A4: both directions, distinct — reference job 3's output contract
    (CollectCandidates.java:32-51)."""
    return symmetric_pairs(similar_pairs(load_table(spark, sf, "documents"), _CFG))
