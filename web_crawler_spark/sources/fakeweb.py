"""`fakeweb` — a custom Python DataSource (pyspark.sql.datasource): the
engine's pluggable fetch-source boundary.

SURVEY.md S3 names this the extension point where a real HTTP backend
would plug in (per-partition connection pools, politeness-aware GETs).
This in-sandbox implementation serves the same deterministic synthetic
web the fixture generator describes — url, host, image_id, depth-0
priority — partitioned by host-hash ranges so each task "crawls" a
disjoint slice, exactly how a production fetch source would shard
connections per executor.

Usage:
    spark.dataSource.register(FakeWebDataSource)
    df = (spark.read.format("fakeweb")
          .option("n", 1000).option("n_hosts", 30).option("parts", 8)
          .load())

Arrow-batched: read() yields pyarrow RecordBatches, not per-row tuples.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host", StringType()),
    StructField("image_id", StringType()),
    StructField("priority", IntegerType()),
    StructField("row_id", LongType()),
])


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, n_hosts: int):
        self.start, self.end, self.n_hosts = start, end, n_hosts


class FakeWebReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_hosts = int(options.get("n_hosts", 30))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        parts = max(1, min(self.parts, self.n))
        bounds = [round(i * self.n / parts) for i in range(parts + 1)]
        return [_Slice(a, b, self.n_hosts) for a, b in zip(bounds, bounds[1:])]

    def read(self, part: _Slice) -> Iterator:
        import numpy as np
        import pyarrow as pa

        ids = np.arange(part.start, part.end, dtype=np.int64)
        # same Zipf-ish host mix as fixtures.gen, derived per row so any
        # partition is independently reproducible (no shared RNG stream)
        hosts = (ids * 2654435761 % 97) % part.n_hosts
        yield pa.RecordBatch.from_pydict({
            "url": [f"http://h{h}.example/p/img-{i:08d}" for i, h in zip(ids, hosts)],
            "host": [f"h{h}.example" for h in hosts],
            "image_id": [f"img-{i:08d}" for i in ids],
            "priority": pa.array(np.zeros(len(ids), dtype=np.int32), pa.int32()),
            "row_id": pa.array(ids, pa.int64()),
        })


class FakeWebDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fakeweb"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FakeWebReader(self.options)
