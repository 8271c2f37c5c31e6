"""Replicates the driver's t2 gate for every catalog query that declares
an oracle, at sf0.01 — the same data the driver uses."""

from __future__ import annotations

import pytest

from rick_and_morty_data_pipeline_project_spark.queries.catalog import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_run

ORACLE_QUERIES = sorted(
    name for name, q in QUERIES.items() if q.sql is not None
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_ORACLE)
    odf = duckdb_run(q.sql, SF_ORACLE)
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "; ".join(issues)


def test_rows_only_queries_run(spark):
    for name, q in QUERIES.items():
        if q.sql is None:
            df = q.fn(spark, SF_ORACLE)
            assert df.count() >= 0, name
