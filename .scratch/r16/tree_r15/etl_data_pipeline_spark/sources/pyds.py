"""Custom Python DataSource (Spark 4 DataSource API) — a deterministic
sequence source used to demonstrate the engine's extensible-source
surface (SURVEY.md §2 category A; the same API would back a real
internal-format reader).

The generator is pure integer arithmetic on the row id, so the exact
same rows are reproducible in ANSI SQL (``RANGE`` + the multiplicative
hash) — which is what makes a custom source *oracle-checkable*: the
contract is the data contract, not "whatever the reader happened to
yield".

Scale posture: ``partitions()`` splits the id space into equal slices,
each read independently on an executor — the source parallelizes like
any file scan, and a real implementation would map slices to shard/byte
ranges.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SEQ_MULT = 2654435761
SEQ_MOD = 97


class SeqInputPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SeqSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 4096))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, (self.n + self.num_partitions - 1) // self.num_partitions)
        return [
            SeqInputPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: SeqInputPartition):
        for i in range(partition.start, partition.end):
            yield (i, (i * SEQ_MULT) % SEQ_MOD)


class SeqDataSource(DataSource):
    """``spark.read.format("seqsource").option("n", N).load()`` ->
    (id long, val long) with val = (id * 2654435761) % 97."""

    @classmethod
    def name(cls) -> str:
        return "seqsource"

    def schema(self) -> str:
        return "id long, val long"

    def reader(self, schema) -> SeqSourceReader:
        return SeqSourceReader(self.options)


def register_seq_source(spark) -> None:
    """Idempotently register the custom source with this session."""
    spark.dataSource.register(SeqDataSource)
