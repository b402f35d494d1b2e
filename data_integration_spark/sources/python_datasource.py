"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

A deterministic synthetic-corpus source: given ``n_docs`` and
``n_partitions``, each partition generates its id range independently — the
executor-side generator shape used to materialize synthetic / augmented
training corpora without a driver-side createDataFrame (the driver never
holds the rows; each partition streams its own slice).

Registered per-session with ``spark.dataSource.register(SyntheticDocs)``
and read via ``spark.read.format("synthetic_docs")`` — the full custom
source lifecycle: schema declaration, partition planning, per-partition
iteration.
"""

from __future__ import annotations

try:  # pyspark>=4 only
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_PYDS = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment]
    DataSourceReader = object  # type: ignore[assignment]
    InputPartition = object  # type: ignore[assignment]
    _HAS_PYDS = False

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def synth_text(doc_id: int) -> str:
    """Deterministic pseudo-text for one doc id (pure function — the
    partition that generates it is irrelevant)."""
    k = 5 + doc_id % 7
    return " ".join(
        _WORDS[(doc_id * 31 + j * 17) % len(_WORDS)] for j in range(k)
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("n_partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_docs // self.n_parts))
        return [
            _Range(i, min(i + step, self.n_docs))
            for i in range(0, self.n_docs, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, synth_text(doc_id), len(synth_text(doc_id)))


class SyntheticDocs(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N)``."""

    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)
