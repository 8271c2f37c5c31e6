"""SCD2 operator semantics beyond the catalog oracle: interval
invariants, NULL-safe change detection, closed-history passthrough."""

from __future__ import annotations

from collections import defaultdict

from rick_and_morty_data_pipeline_project_spark.operators.scd import (
    OPEN_END,
    scd2_apply,
)
from rick_and_morty_data_pipeline_project_spark.queries.extraq import (
    scd2_customer_segments,
)
from tests.conftest import SF_ORACLE

CUR_SCHEMA = (
    "k long, attr string, valid_from string, valid_to string, is_current int"
)
UPD_SCHEMA = "k long, attr string, effective_date string"


def test_change_noop_newkey_and_history_passthrough(spark):
    current = spark.createDataFrame(
        [
            (1, "A", "2000-01-01", "2001-01-01", 0),  # closed history
            (1, "B", "2001-01-01", OPEN_END, 1),
            (2, "X", "2000-01-01", OPEN_END, 1),
            (3, None, "2000-01-01", OPEN_END, 1),  # NULL attr open row
        ],
        CUR_SCHEMA,
    )
    updates = spark.createDataFrame(
        [
            (1, "C", "2002-06-01"),    # change
            (2, "X", "2002-06-01"),    # no-op
            (3, None, "2002-06-01"),   # NULL == NULL → no-op
            (9, "NEW", "2002-06-01"),  # brand-new key
        ],
        UPD_SCHEMA,
    )
    rows = {
        tuple(r)
        for r in scd2_apply(
            current, updates, key="k", tracked=["attr"]
        ).collect()
    }
    assert rows == {
        (1, "A", "2000-01-01", "2001-01-01", 0),
        (1, "B", "2001-01-01", "2002-06-01", 0),
        (1, "C", "2002-06-01", OPEN_END, 1),
        (2, "X", "2000-01-01", OPEN_END, 1),
        (3, None, "2000-01-01", OPEN_END, 1),
        (9, "NEW", "2002-06-01", OPEN_END, 1),
    }


def test_catalog_scd2_interval_invariants(spark):
    """Per key: exactly one open row, no zero-length intervals, and
    closed rows chain into the next row's valid_from (as-of joins see a
    gapless partition of time)."""
    rows = scd2_customer_segments(spark, SF_ORACLE).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["c_custkey"]].append(r)
    assert len(by_key) > 0
    changed = 0
    for k, rs in by_key.items():
        opens = [r for r in rs if r["is_current"] == 1]
        assert len(opens) == 1 and opens[0]["valid_to"] == OPEN_END, k
        for r in rs:
            assert r["valid_from"] < r["valid_to"], k
        rs_sorted = sorted(rs, key=lambda r: r["valid_from"])
        for a, b in zip(rs_sorted, rs_sorted[1:]):
            assert a["valid_to"] == b["valid_from"], k
        if len(rs) > 1:
            changed += 1
    assert changed > 0  # the %5==0 batch really produced history


def test_dormant_key_reopens(spark):
    """A key whose rows are ALL closed (dormant) must be reopened by a
    fresh update — the brand-new anti-join runs against open keys, not
    all current keys, so the update is neither dropped nor duplicated."""
    current = spark.createDataFrame(
        [(7, "OLD", "2000-01-01", "2001-01-01", 0)], CUR_SCHEMA
    )
    updates = spark.createDataFrame([(7, "BACK", "2005-01-01")], UPD_SCHEMA)
    rows = {
        tuple(r)
        for r in scd2_apply(
            current, updates, key="k", tracked=["attr"]
        ).collect()
    }
    assert rows == {
        (7, "OLD", "2000-01-01", "2001-01-01", 0),
        (7, "BACK", "2005-01-01", OPEN_END, 1),
    }


def test_multiple_updates_per_key_collapse_to_latest(spark):
    """A batch carrying two versions of one key must not fan out the
    open row: last-writer-wins within the apply (latest effective date),
    preserving the exactly-one-open-row invariant."""
    current = spark.createDataFrame(
        [(1, "A", "2000-01-01", OPEN_END, 1)], CUR_SCHEMA
    )
    updates = spark.createDataFrame(
        [(1, "B", "2002-01-01"), (1, "C", "2003-01-01")], UPD_SCHEMA
    )
    rows = {
        tuple(r)
        for r in scd2_apply(
            current, updates, key="k", tracked=["attr"]
        ).collect()
    }
    assert rows == {
        (1, "A", "2000-01-01", "2003-01-01", 0),
        (1, "C", "2003-01-01", OPEN_END, 1),
    }
