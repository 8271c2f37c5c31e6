"""Spark 4 Python STREAMING DataSource over the episode REST API.

The batch DataSource (``restapi_datasource.py``) partitions one bulk
read; this is the incremental form — a ``SimpleDataSourceStreamReader``
whose offset is the next unfetched episode id, so a long-running query
ingests new ids as they appear and a restarted query resumes from the
checkpointed offset instead of refetching (the reference's driver loop
at Scraper.py:218-233 refetches everything every run).

Determinism: rows come from the frozen reference fixture
(``reference_fixtures.episode_rows``) — same offline stance as the
batch source; a live ``endpoint`` variant would drop into ``_rows``
exactly like the batch reader's ``_read_live``.

Offset contract (exercised in tests/test_etl_pipeline.py):
* ``initialOffset`` → ``{"next_id": 1}``
* ``read(start)`` returns up to ``maxIdsPerBatch`` rows and the next
  offset; at end-of-fixture it returns an empty iterator with an
  unchanged offset (a live query would poll; AvailableNow terminates).
* ``readBetweenOffsets(start, end)`` replays a committed range —
  Spark calls it when recovering a batch whose offsets are in the
  checkpoint but whose data was lost with the failed run.

Kept in its own module so additive growth never stales the batch
source's certification fingerprints.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from rick_and_morty_data_pipeline_project_spark.sources.restapi_datasource import (
    SCHEMA,
)


def _rows(lo: int, hi: int) -> list:
    # a LIST, not a generator: the prefetching scaffold pickles the
    # returned records between the driver-side read and planPartitions,
    # and generators cannot be pickled.  Bounded by maxIdsPerBatch.
    from rick_and_morty_data_pipeline_project_spark.sources.reference_fixtures import (
        episode_rows,
    )

    return [(eid, name) for eid, name in episode_rows() if lo <= eid <= hi]


class EpisodeApiStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", "41"))
        self.batch = int(options.get("maxIdsPerBatch", "10"))

    def initialOffset(self) -> dict:
        return {"next_id": 1}

    def read(self, start: dict):
        lo = int(start["next_id"])
        if lo > self.n:
            return iter([]), {"next_id": lo}
        hi = min(self.n, lo + self.batch - 1)
        # iter(list), not a bare list or generator: the prefetch cache
        # calls next() on it AND deep-copies/pickles the entry — a list
        # iterator satisfies both, a generator neither
        return iter(_rows(lo, hi)), {"next_id": hi + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_rows(int(start["next_id"]), int(end["next_id"]) - 1))

    def commit(self, end: dict) -> None:
        # fixture-backed: nothing to acknowledge upstream
        pass


class EpisodeApiStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "episode_api_stream"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema) -> EpisodeApiStreamReader:
        return EpisodeApiStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(EpisodeApiStreamDataSource)
