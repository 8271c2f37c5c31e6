"""Property-based tests (hypothesis): operators whose semantics have a
trivially-correct Python oracle get hammered with randomized inputs —
the cases a hand-written fixture never thinks of (empty updates,
all-deletes, delete-of-absent-key, duplicate-free invariants).

Examples are kept small and few (each runs Spark jobs); the value is
input SHAPE coverage, not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=0, max_value=99)


@st.composite
def merge_scenario(draw):
    base = draw(st.dictionaries(KEYS, VALS, max_size=8))
    # updates: key → (value, delete_flag or None); key-unique by
    # construction (the operator's documented precondition)
    updates = draw(
        st.dictionaries(
            KEYS,
            st.tuples(VALS, st.sampled_from([True, False, None])),
            min_size=0,
            max_size=8,
        )
    )
    return base, updates


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenario=merge_scenario())
def test_merge_upsert_matches_dict_semantics(spark, tmp_path_factory, scenario):
    from rick_and_morty_data_pipeline_project_spark.operators.merge import (
        merge_upsert,
    )

    base, updates = scenario
    path = str(tmp_path_factory.mktemp("merge") / "target")
    spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "id int, val int",
    ).where("id IS NOT NULL").write.mode("overwrite").parquet(path)

    upd_rows = [
        (k, v, flag) for k, (v, flag) in updates.items()
    ]
    upd = spark.createDataFrame(
        upd_rows or [(None, None, None)],
        "id int, val int, _delete boolean",
    ).where("id IS NOT NULL")

    n = merge_upsert(spark, path, upd, ["id"], delete_col="_delete")

    # dict-semantics oracle: delete=True removes, else upsert
    want = dict(base)
    for k, (v, flag) in updates.items():
        if flag:  # True ⇒ delete; False/None ⇒ upsert
            want.pop(k, None)
        else:
            want[k] = v

    got = {
        r["id"]: r["val"] for r in spark.read.parquet(path).collect()
    }
    assert got == want
    assert n == len(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab ",
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_matches_set_semantics(spark, texts):
    """exact_dedup_keep_first keeps exactly the lowest id per normalized
    fingerprint, for ANY input — including empty strings, whitespace-only
    strings, and heavy duplication."""
    from rick_and_morty_data_pipeline_project_spark.operators.dedup import (
        exact_dedup_keep_first,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = sorted(
        r["doc_id"]
        for r in exact_dedup_keep_first(df, "doc_id", "text").collect()
    )

    def norm(s: str) -> str:
        return " ".join(s.lower().split())

    first_seen: dict[str, int] = {}
    for i, s in rows:
        first_seen.setdefault(norm(s), i)
    assert kept == sorted(first_seen.values())
