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


def test_max_age_rule_flags_old_certificates():
    """Round-6 item 3: a green driver row older than MAX_GREEN_AGE
    rounds is an expired certificate — compute_debt must flag it
    unless the query is scheduled back into the window."""
    rr = _load_rotation_report()
    oracled = ["old_q", "fresh_q", "scheduled_old_q"]
    newest_green = {"old_q": 1, "fresh_q": 6, "scheduled_old_q": 1}
    fps = {n: "fp" for n in oracled}
    failed, unscheduled, overage, _, _, _ = rr.compute_debt(
        oracled,
        newest_green,
        attempted=set(oracled),
        frozen=fps,
        fps=fps,
        window=("scheduled_old_q",),
        max_round=6,
        pending={},
    )
    assert overage == ["old_q"]            # age 5 > 4, not in window
    assert failed == [] and unscheduled == []
    # exactly at the limit (age == MAX_GREEN_AGE) is still fresh
    newest_green["old_q"] = 2
    _, _, overage, _, _, _ = rr.compute_debt(
        oracled, newest_green, set(oracled), fps, fps,
        ("scheduled_old_q",), 6, {},
    )
    assert overage == []


def test_birth_exemption_lasts_one_cycle_only():
    """Round-6 advisory: an oracled query born after the freeze (no
    fingerprint in the manifest) is exempt from 'green or scheduled'
    for ONE cycle.  Once a newer CORRECTNESS round exists, a still
    unfingerprinted, unscheduled query is debt — it cannot evade the
    driver forever by never re-freezing the manifest."""
    rr = _load_rotation_report()
    oracled = ["newborn"]
    fps = {"newborn": "fp"}
    # cycle 1: first sighting at round 6 — exempt, recorded in pending
    failed, unscheduled, overage, pending, _, _ = rr.compute_debt(
        oracled, {}, set(), frozen={}, fps=fps, window=(),
        max_round=6, pending={},
    )
    assert unscheduled == [] and pending == {"newborn": 6}
    # cycle 2: round 7 landed, still unfingerprinted + unscheduled
    failed, unscheduled, overage, pending, _, _ = rr.compute_debt(
        oracled, {}, set(), frozen={}, fps=fps, window=(),
        max_round=7, pending=pending,
    )
    assert unscheduled == ["newborn"]
    # ... but being in the window clears it
    _, unscheduled, _, _, _, _ = rr.compute_debt(
        oracled, {}, set(), frozen={}, fps=fps, window=("newborn",),
        max_round=7, pending=pending,
    )
    assert unscheduled == []
    # ... and once fingerprinted, pending entry is dropped and the
    # standard manifest rule applies
    _, unscheduled, _, pending, _, _ = rr.compute_debt(
        oracled, {}, set(), frozen=fps, fps=fps, window=(),
        max_round=7, pending=pending,
    )
    assert pending == {} and unscheduled == ["newborn"]


def test_fingerprints_stable_across_processes():
    """Fingerprints must be process-stable: audit_row_constraints'
    closure includes _ROW_RULES, a constant table holding lambdas whose
    default repr embeds a per-process memory address — the r08 manifest
    drift bug.  Two fresh interpreters (one with the oracle env var
    set, which changes import-time state) must agree on every
    fingerprint."""
    import json
    import os
    import subprocess
    import sys

    code = (
        "import sys, json; sys.path.insert(0, '.'); sys.argv=['x']\n"
        "from tools.rotation_report import query_fingerprints\n"
        "print(json.dumps(query_fingerprints(), sort_keys=True))\n"
    )
    outs = []
    for extra in ({}, {"SPARK_GRAFT_ORACLE_SF_DIR": "/root/testdata/sf0.1"}):
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
        env.update(extra)
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(json.loads(r.stdout))
    assert outs[0] == outs[1], {
        k: (outs[0][k], outs[1][k])
        for k in outs[0]
        if outs[0].get(k) != outs[1].get(k)
    }


def test_sweep_artifact_extends_overage_certificates():
    """Policy v2 (round 9): an over-age green is compliant if the
    CURRENT round's full-catalog sweep shows it hash-green; a sweep
    row never substitutes for the never-attempted or red rules."""
    rr = _load_rotation_report()
    oracled = ["old_swept", "old_unswept", "never_ran"]
    newest_green = {"old_swept": 1, "old_unswept": 1}
    fps = {n: "fp" for n in oracled}
    failed, unscheduled, overage, _, carry_debt, _ = rr.compute_debt(
        oracled,
        newest_green,
        attempted={"old_swept", "old_unswept"},
        frozen=fps,
        fps=fps,
        window=(),
        max_round=6,
        pending={},
        sweep_green={"old_swept", "never_ran"},
    )
    assert overage == ["old_unswept"]      # sweep covered old_swept
    assert unscheduled == ["never_ran"]    # sweep does NOT cover births
    assert failed == [] and carry_debt == []


def test_stale_carryover_one_cycle_then_debt():
    """Policy v2: a query whose fingerprint changed at a freeze while
    unscheduled must re-earn a DRIVER row within one cycle.  Cleared
    only by a green NEWER than the recording round (or by being
    scheduled); a sweep row does not clear it."""
    rr = _load_rotation_report()
    oracled = ["changed_q"]
    fps = {"changed_q": "fp2"}
    # same-round grace: carryover recorded at r6, max_round still 6
    _, _, _, _, carry_debt, carry = rr.compute_debt(
        oracled, {"changed_q": 5}, {"changed_q"}, fps, fps, (),
        6, {}, carryover={"changed_q": 6},
    )
    assert carry_debt == [] and carry == {"changed_q": 6}
    # a round landed; unscheduled, old green (r5 <= record round) -> debt,
    # even though the sweep shows it green
    _, _, _, _, carry_debt, carry = rr.compute_debt(
        oracled, {"changed_q": 5}, {"changed_q"}, fps, fps, (),
        7, {}, sweep_green={"changed_q"}, carryover={"changed_q": 6},
    )
    assert carry_debt == ["changed_q"]
    # scheduled into the window -> not debt (will re-earn its row)
    _, _, _, _, carry_debt, _ = rr.compute_debt(
        oracled, {"changed_q": 5}, {"changed_q"}, fps, fps,
        ("changed_q",), 7, {}, carryover={"changed_q": 6},
    )
    assert carry_debt == []
    # re-greened AFTER the recording round -> entry clears entirely
    _, _, _, _, carry_debt, carry = rr.compute_debt(
        oracled, {"changed_q": 7}, {"changed_q"}, fps, fps, (),
        7, {}, carryover={"changed_q": 6},
    )
    assert carry_debt == [] and carry == {}
    # deleted/renamed queries drop off the ledger
    _, _, _, _, _, carry = rr.compute_debt(
        [], {}, set(), {}, {}, (), 7, {}, carryover={"gone_q": 6},
    )
    assert carry == {}


# The FROZEN rows-only core (round 10; adjudications in COVERAGE.md
# §"Rows-only core — frozen at 4").  Each entry has a written one-
# paragraph adjudication of why no DuckDB oracle can exist plus a
# Python-oracle/property test; any NEW rows-only entry must either be
# oracled or have its adjudication written and this pin updated —
# silently growing the set fails here.
ROWS_ONLY_CORE = frozenset(
    {
        "agg_approx_distinct",
        "events_hourly_percentiles_approx",
        "customer_rfm_segments_approx",
        "multimodal_decode_real",
    }
)


def test_rows_only_core_frozen_at_four():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    rows_only = q - o
    assert rows_only == ROWS_ONLY_CORE, (
        "the rows-only set drifted from the frozen core: "
        f"extra={sorted(rows_only - ROWS_ONLY_CORE)} "
        f"missing={sorted(ROWS_ONLY_CORE - rows_only)} — a new "
        "rows-only birth must be oracled or explicitly adjudicated "
        "in COVERAGE.md and this pin updated"
    )
