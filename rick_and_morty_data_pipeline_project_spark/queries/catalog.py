"""The complete named-query catalog exported through __spark_entry__.py.

Each entry is an operator-family exemplar from SURVEY.md §2 (plus the
§2.10 training-data-pipeline extensions).  Entries with ``sql`` set are
fully hash-verified against DuckDB by the driver; ``sql=None`` entries
(sequential greedy matching, LSH with engine-side constants) get the
rows-only check and are covered by Python oracles in tests/.
"""

from __future__ import annotations

from rick_and_morty_data_pipeline_project_spark.queries import (
    extraq,
    mmq,
    reference,
    textq,
    tpch,
    tpchf,
    tpchx,
    vecq,
)
from rick_and_morty_data_pipeline_project_spark.queries._util import Q

QUERIES: dict[str, Q] = {}
for mod in (tpch, tpchx, tpchf, textq, vecq, extraq, mmq, reference):
    for name, q in mod.QUERIES.items():
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = q


def queries_dict():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_dict():
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
