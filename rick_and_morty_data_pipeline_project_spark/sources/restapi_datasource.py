"""A Spark 4 Python DataSource exposing the (fake) episode REST API.

Demonstrates the engine's custom-source surface (SURVEY.md §2.1 SRC-1/
SRC-2): the reference fetches `rickandmortyapi.com/api/episode/{n}` per
episode in a driver loop; a scalable engine wraps the source in the
DataSource API so reads are *partitioned* (each partition fetches a
disjoint id range) and the result is a first-class DataFrame.

Network access is neither available nor deterministic here, so the
reader serves the same frozen payload as
``sources/reference_fixtures.episode_rows`` — the partitioning and
plumbing are the real thing; swap ``_fetch_range`` with an HTTP call in
a connected deployment.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("episode_id", IntegerType()),
        StructField("episode_name", StringType()),
    ]
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EpisodeApiReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "41"))
        self.num_partitions = int(options.get("numPartitions", "4"))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        parts = []
        start = 1
        while start <= self.n:
            parts.append(_RangePartition(start, min(start + step - 1, self.n)))
            start += step
        return parts

    def read(self, partition: _RangePartition):
        # deterministic stand-in for the per-id HTTP GET
        from rick_and_morty_data_pipeline_project_spark.sources.reference_fixtures import (
            episode_rows,
        )

        for eid, name in episode_rows():
            if partition.start <= eid <= partition.end:
                yield (eid, name)


class EpisodeApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "episode_api"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return EpisodeApiReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EpisodeApiDataSource)
