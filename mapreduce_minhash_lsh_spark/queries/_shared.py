"""Helpers used by more than one query-family module (hoisted so the
family modules never import from each other - no cycles by
construction).  Everything here is byte-identical to its pre-split
form in registry.py.
"""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    _md5_parse_sql,
)



# Operator-module aliases used by several families (events plans by the
# events AND llm modules; text/dedup by llm AND pipeline/ann variants).
from mapreduce_minhash_lsh_spark.plans import events as _events  # noqa: E402
from mapreduce_minhash_lsh_spark.functions import text as _text  # noqa: E402
from mapreduce_minhash_lsh_spark.operators import dedup as _dedup  # noqa: E402

# Reproducible-per-key md5 bucketing (operators/sampling.py twin) — the
# sampling/split family's oracle key, also reused by the llm profiling
# and pipeline sample queries.
_DOC_KEY_SQL = "CAST(doc_id AS VARCHAR) || ':42'"
_BUCKET_SQL = f"({_md5_parse_sql(_DOC_KEY_SQL)}) % 1000000"
