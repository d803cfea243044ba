"""Custom Python data source (Spark 4 DataSource API, SURVEY §2.A4's
plugin story taken to the source layer).

The reference's container instantiates source operators by class name
(``OpContainer``'s registry dispatch); Spark 4's Python DataSource API
is the engine-native equivalent for the SCAN itself: a pure-Python
class registered by name becomes a ``spark.read.format(...)`` source
with real partition planning — each ``InputPartition`` is read by a
separate task, so a custom feed (internal API, tape format, synthetic
generator) scales out like any file source instead of funneling
through a driver-side collect.

The demo source generates a deterministic integer sequence split
across N partitions — trivially replayable in the DuckDB oracle, so
the full read path (partition planning → per-task generators → Arrow
conversion) is value-hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class DemoRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DemoRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        per = -(-self.n // self.parts)
        return [
            DemoRangePartition(i * per, min((i + 1) * per, self.n))
            for i in range(self.parts)
            if i * per < self.n
        ]

    def read(self, partition: DemoRangePartition):
        # deterministic per-row payload, pure integer math (portable)
        for i in range(partition.start, partition.end):
            yield (i, (i * i) % 97, float((i * 31) % 1000) / 10.0)


class DemoRangeSource(DataSource):
    """``spark.read.format("demo_range").option("n", ...)`` source."""

    @classmethod
    def name(cls) -> str:
        return "demo_range"

    def schema(self) -> str:
        return "id BIGINT, mod97 BIGINT, val DOUBLE"

    def reader(self, schema) -> DataSourceReader:
        return DemoRangeReader(self.options)


def register_demo_source(spark) -> None:
    """Idempotently register the demo source on a session."""
    try:
        spark.dataSource.register(DemoRangeSource)
    except Exception:  # already registered on this session
        pass
