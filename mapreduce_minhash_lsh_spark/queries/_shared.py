"""Helpers used by more than one query-family module (hoisted so the
family modules never import from each other - no cycles by
construction).  Everything here is byte-identical to its pre-split
form in registry.py.
"""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    _md5_parse_sql,
)



# --------------------------------------------------------------------------
# Relational plans (the general query-engine surface: scan/filter/project,
# aggregation, broadcast star joins, windows, rollup, distinct)
# --------------------------------------------------------------------------

from mapreduce_minhash_lsh_spark.plans import events as _events  # noqa: E402


# --------------------------------------------------------------------------
# Text analysis (tokens, quality, language ID, fingerprints) + dedup family
# --------------------------------------------------------------------------

from mapreduce_minhash_lsh_spark.functions import text as _text  # noqa: E402
from mapreduce_minhash_lsh_spark.operators import dedup as _dedup  # noqa: E402


# --------------------------------------------------------------------------
# Deterministic sampling / splits / PII redaction (operators/sampling.py,
# functions/redact.py) — reproducible-per-key md5 bucketing, exact oracle.
# --------------------------------------------------------------------------

_DOC_KEY_SQL = "CAST(doc_id AS VARCHAR) || ':42'"
_BUCKET_SQL = f"({_md5_parse_sql(_DOC_KEY_SQL)}) % 1000000"
