"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API):
a deterministic generated table, registered like any format and read
with normal `spark.read.format(...).load()`.

Why it matters for the engine: the Python DataSource API is the
modern extension point for sources Spark lacks built-ins for
(internal services, bespoke formats, synthetic generators) — readers
declare PARTITIONS, so the scan parallelizes across executors exactly
like a file source, and each partition's rows stream out of a plain
generator (Arrow-batched by the runtime).

The generated values are md5-derived (same portable construction as
text.analysis.md5_hash32), so a SQL oracle can reproduce every row —
the source itself sits under the correctness gate.

IMPLEMENTATION NOTE: the DataSource classes are defined INSIDE
`make_datasource()` so cloudpickle serializes them BY VALUE — a
module-level class pickles by reference and Python workers launched
from a foreign cwd cannot import this package (the same
self-contained rule every UDF closure here follows).
"""

from __future__ import annotations


def make_datasource():
    """Build the `detrange` DataSource class (self-contained: only
    stdlib + pyspark imports inside)."""
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class DeterministicRangeReader(DataSourceReader):
        """Rows (id, val, part) for id in [0, n): val = md5_32(id) % mod."""

        def __init__(self, n: int, n_partitions: int, mod: int) -> None:
            self.n = n
            self.n_partitions = n_partitions
            self.mod = mod

        def partitions(self):
            # contiguous id ranges — each executor task generates its slice
            return [InputPartition(i) for i in range(self.n_partitions)]

        def read(self, partition):
            i = partition.value
            per = -(-self.n // self.n_partitions)  # ceil
            lo, hi = i * per, min((i + 1) * per, self.n)
            for ident in range(lo, hi):
                val = int(hashlib.md5(str(ident).encode()).hexdigest()[:8], 16)
                yield (ident, val % self.mod, i)

    class DeterministicRangeDataSource(DataSource):
        """`detrange` format. Options: n (rows, default 1000),
        partitions (default 4), mod (default 1000)."""

        @classmethod
        def name(cls) -> str:
            return "detrange"

        def schema(self) -> str:
            return "id long, val long, part int"

        def reader(self, schema):
            return DeterministicRangeReader(
                n=int(self.options.get("n", 1000)),
                n_partitions=int(self.options.get("partitions", 4)),
                mod=int(self.options.get("mod", 1000)),
            )

    return DeterministicRangeDataSource


def register(spark) -> None:
    """Idempotent `detrange` format registration."""
    spark.dataSource.register(make_datasource())


def make_stream_datasource():
    """Build the `detstream` STREAMING DataSource class (Spark 4
    `SimpleDataSourceStreamReader`): an offset-tracked deterministic
    generator — each micro-batch advances `pos` by `per_batch` rows
    whose values are the same md5-derived construction as `detrange`,
    so a SQL oracle reproduces the drained stream exactly. The
    simple-reader variant reads on the driver and is meant for
    low-throughput sources; the partitioned `DataSourceStreamReader`
    is the executor-parallel path (same offset contract). Classes are
    defined inside the factory for by-value pickling, like the batch
    source."""
    import hashlib

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def _rows(lo: int, hi: int, mod: int):
        # materialized LIST, not a generator: the simple-reader runner
        # prefetches and PICKLES the batch rows (generators are not
        # picklable); batches are per_batch-bounded so this is small
        return [
            (
                ident,
                int(hashlib.md5(str(ident).encode()).hexdigest()[:8], 16) % mod,
            )
            for ident in range(lo, hi)
        ]

    class DetStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, per_batch: int, mod: int) -> None:
            self.per_batch = per_batch
            self.mod = mod

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = pos + self.per_batch
            return (_rows(pos, end, self.mod), {"pos": end})

        def readBetweenOffsets(self, start, end):
            # replay path: offsets fully determine the data — the
            # property that makes the source exactly-once replayable
            return _rows(start["pos"], end["pos"], self.mod)

    class DetStreamDataSource(DataSource):
        """`detstream` format. Options: per_batch (rows per
        micro-batch, default 100), mod (default 1000)."""

        @classmethod
        def name(cls) -> str:
            return "detstream"

        def schema(self) -> str:
            return "id long, val long"

        def simpleStreamReader(self, schema):
            return DetStreamReader(
                per_batch=int(self.options.get("per_batch", 100)),
                mod=int(self.options.get("mod", 1000)),
            )

    return DetStreamDataSource


def register_stream(spark) -> None:
    """Idempotent `detstream` format registration."""
    spark.dataSource.register(make_stream_datasource())
