"""The rotation/fingerprint tooling is process-load-bearing (rule 2 of
the window policy is only as good as the stale detector), so its
change-detection behavior is pinned here.

No SparkSession needed — fingerprints are computed from source text and
module constants only."""

from __future__ import annotations

import importlib.util
import sys


def _load_rotation_report():
    spec = importlib.util.spec_from_file_location(
        "rotation_report", "/root/repo/tools/rotation_report.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fingerprints_deterministic():
    rr = _load_rotation_report()
    a = rr.query_fingerprints()
    b = rr.query_fingerprints()
    assert a == b
    assert len(a) > 150  # whole catalog covered


def test_dict_constant_edit_flags_dependent_queries_stale():
    """The round-5 advisory: module-level dict/list constants a query
    reads (LANG_MARKERS and friends) must be part of its fingerprint —
    editing one has to flag the query stale.  Simulated by mutating the
    live constant between two fingerprint passes."""
    rr = _load_rotation_report()
    from rick_and_morty_data_pipeline_project_spark.queries import extraq

    name = "LANG_MARKERS"  # the advisory's own example constant
    assert isinstance(getattr(extraq, name), dict)

    before = rr.query_fingerprints()
    original = getattr(extraq, name)
    try:
        mutated = dict(original)
        mutated["__fingerprint_canary__"] = ["xx"]
        setattr(extraq, name, mutated)
        after = rr.query_fingerprints()
    finally:
        setattr(extraq, name, original)

    changed = sorted(n for n in before if before[n] != after.get(n))
    assert changed, (
        f"mutating {name} changed no fingerprints — dict constants "
        "are not covered by the stale detector"
    )
    # and restoring the constant restores the fingerprints
    restored = rr.query_fingerprints()
    assert restored == before
