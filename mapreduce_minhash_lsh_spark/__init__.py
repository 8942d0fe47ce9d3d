"""PySpark-native analytics engine with the capabilities of
``alecuba16/mapreduce_minhash_lsh`` (shingling -> MinHash -> LSH ->
candidate verification), rebuilt Spark-first.

The reference (/root/reference) is a 3-job Hadoop MapReduce pipeline
(Shingling.java, MinHashLSH.java, CollectCandidates.java). This package
re-expresses that capability surface as composable DataFrame operators
planned by Catalyst, plus the large-scale training-data-pipeline
extensions (dedup families, similarity search, text analysis,
multimodal plumbing) described in SURVEY.md.

Layout:
  config.py      -- seeded, deterministic pipeline configuration
  session.py     -- tuned SparkSession builder (AQE, shuffle sizing)
  functions/     -- Column-level building blocks (shingles, hashing, text)
  operators/     -- DataFrame -> DataFrame operators (shingling, minhash,
                    lsh, similarity, dedup, simhash, ann)
  sources/       -- table catalog / text source with stable doc ids
  plans/         -- relational query plans over the TPC-H-ish testdata
  streaming/     -- Structured Streaming variants (incremental dedup)
  multimodal/    -- binary-column plumbing; real WAV/BMP/PPM codecs,
                    compressed formats (JPEG/MP4) stubbed
  queries/       -- registered queries + DuckDB oracle twins by family
                    (public surface: the registry module)
"""

from mapreduce_minhash_lsh_spark.config import FLAGSHIP, GOLDEN, MinHashLSHConfig
from mapreduce_minhash_lsh_spark.session import get_spark

__all__ = ["MinHashLSHConfig", "FLAGSHIP", "GOLDEN", "get_spark", "similar_pairs"]
__version__ = "0.1.0"


def similar_pairs(docs, cfg=None, **kwargs):
    """Convenience re-export of the flagship operator
    (operators/similarity.similar_pairs) with the default config."""
    from mapreduce_minhash_lsh_spark.operators.similarity import (
        similar_pairs as _sp,
    )

    return _sp(docs, cfg or FLAGSHIP, **kwargs)
