"""Seeded synthetic-documents source via the PySpark 4 Python DataSource
API (`pyspark.sql.datasource`).

The reference's only source is a text file scan; this adds the other
source kind a pipeline needs — a GENERATOR for soak/scale testing —
as a first-class `spark.read.format("docgen")` source rather than a
driver-side loop:

    from mapreduce_minhash_lsh_spark.sources.docgen import register_docgen
    register_docgen(spark)
    docs = (spark.read.format("docgen")
            .option("rows", 100_000).option("parts", 64)
            .option("seed", 7).load())

Every cell is a pure function of (seed, doc_id): row i is identical no
matter how many partitions generate it, which executor runs it, or how
often a retry replays it — the same determinism contract as the
sampling operators.  Partitions carry disjoint [start, end) id ranges,
so generation parallelism = `parts` with zero coordination; at 100 TB
this is how you synthesize a corpus without a driver bottleneck.

Text is word-soup over a small vocabulary with planted near-duplicates
(every ``dup_every``-th doc repeats the previous doc's text plus one
token), mirroring the testdata's shape so the flagship MinHash/LSH
pipeline finds a predictable pair set — see tests/test_docgen.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_LANGS = ("en", "es", "fr", "de", "zh")
_VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup row col agg map shuffle band doc text token"
).split()


def _h(seed: int, *parts: int) -> int:
    """Deterministic 60-bit integer from (seed, *parts) — the md5-prefix
    parse every other seeded operator in this repo uses."""
    tag = ":".join(str(p) for p in (seed, *parts))
    return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)


def _doc_text(seed: int, doc_id: int, min_tokens: int, max_tokens: int) -> str:
    n = min_tokens + _h(seed, doc_id, 0) % (max_tokens - min_tokens + 1)
    return " ".join(
        _VOCAB[_h(seed, doc_id, i + 1) % len(_VOCAB)] for i in range(n)
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))
        self.seed = int(options.get("seed", 42))
        self.min_tokens = int(options.get("min_tokens", 8))
        self.max_tokens = int(options.get("max_tokens", 40))
        self.dup_every = int(options.get("dup_every", 10))
        if self.rows < 0 or self.parts <= 0:
            raise ValueError("rows must be >= 0 and parts > 0")
        if not 0 < self.min_tokens <= self.max_tokens:
            raise ValueError("need 0 < min_tokens <= max_tokens")

    def partitions(self) -> list[InputPartition]:
        # ceil-div, clamped to >=1 so rows=0 yields one empty range
        # instead of range(0, 0, 0) raising ValueError.
        step = max(1, -(-self.rows // self.parts))
        return [
            _Range(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ] or [_Range(0, 0)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            if self.dup_every and i % self.dup_every == self.dup_every - 1:
                # planted near-dup: previous doc's text + one extra token
                base = _doc_text(self.seed, i - 1, self.min_tokens, self.max_tokens)
                text = base + " " + _VOCAB[_h(self.seed, i, 0) % len(_VOCAB)]
            else:
                text = _doc_text(self.seed, i, self.min_tokens, self.max_tokens)
            lang = _LANGS[_h(self.seed, i, 90) % len(_LANGS)]
            source = f"src{_h(self.seed, i, 91) % 20}"
            yield (i, text, lang, source, len(text))


class DocGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the SAME seeded corpus arrives in micro-batches of
    ``batch_rows`` ids per trigger until ``rows`` are emitted — a
    replayable ingest feed for exercising the streaming jobs without a
    directory of files.  Offsets are just the next doc_id, so replaying
    any offset range regenerates byte-identical rows (exactly-once under
    retries for free)."""

    def __init__(self, options: dict):
        self.inner = DocGenReader(options)
        self.batch_rows = int(options.get("batch_rows", 100))
        if self.batch_rows <= 0:
            raise ValueError("batch_rows must be positive")

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int):
        # materialized list, not a generator: the runner pickles the
        # prefetched batch to replay it at execution; bounded by
        # batch_rows so this is never large.
        return list(self.inner.read(_Range(start, end)))

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.inner.rows)
        if lo >= hi:
            return iter([]), {"next": lo}
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])


class DocGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)

    def simpleStreamReader(self, schema) -> DocGenStreamReader:
        return DocGenStreamReader(self.options)


def register_docgen(spark: SparkSession) -> None:
    """Register the 'docgen' format on this session (idempotent)."""
    spark.dataSource.register(DocGenDataSource)
