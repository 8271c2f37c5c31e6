"""A Spark 4 Python DataSource exposing the episode REST API.

Demonstrates the engine's custom-source surface (SURVEY.md §2.1 SRC-1/
SRC-2): the reference fetches `rickandmortyapi.com/api/episode/{n}` per
episode in a driver loop (reference Scraper.py:218-233); a scalable
engine wraps the source in the DataSource API so reads are
*partitioned* (each partition fetches a disjoint id range) and the
result is a first-class DataFrame.

Two modes, selected by the ``endpoint`` reader option:

* default (no ``endpoint``): deterministic offline mode — serves the
  frozen payload from ``sources/reference_fixtures.episode_rows``.
  This sandbox has no network, and the oracle gate needs determinism.
* ``endpoint=<base-url>``: LIVE mode — each partition GETs
  ``{base-url}/{id}`` for its id range with stdlib urllib (executor-
  side, no extra dependency), parsing the ``{"id":…,"name":…}`` JSON
  the public API returns.  Closes the only reference-surface gap (the
  real SRC-1/SRC-2 fetch); tests/test_sinks_catalog.py gates its test
  on actual network reachability, skipping offline.
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
        # live-HTTP mode: base URL like https://rickandmortyapi.com/api/episode
        self.endpoint = options.get("endpoint")
        self.timeout = float(options.get("timeoutSec", "10"))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        parts = []
        start = 1
        while start <= self.n:
            parts.append(_RangePartition(start, min(start + step - 1, self.n)))
            start += step
        return parts

    def read(self, partition: _RangePartition):
        if self.endpoint:
            yield from self._read_live(partition)
            return
        # deterministic offline stand-in for the per-id HTTP GET
        from rick_and_morty_data_pipeline_project_spark.sources.reference_fixtures import (
            episode_rows,
        )

        for eid, name in episode_rows():
            if partition.start <= eid <= partition.end:
                yield (eid, name)

    def _read_live(self, partition: _RangePartition):
        """Executor-side per-id GET over the partition's id range —
        the reference's driver loop (Scraper.py:218-233), distributed.
        stdlib urllib: no extra dependency on the executors."""
        import json as _json
        import urllib.request

        base = self.endpoint.rstrip("/")
        for eid in range(partition.start, partition.end + 1):
            with urllib.request.urlopen(
                f"{base}/{eid}", timeout=self.timeout
            ) as resp:
                payload = _json.loads(resp.read().decode("utf-8"))
            yield (int(payload["id"]), str(payload["name"]))


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
