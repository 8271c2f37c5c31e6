"""Print the driver-window rotation state: which oracled catalog
queries have never held a CORRECTNESS_r*.json row, which window slots
are re-checking already-green queries, and — rule 2 of the rotation
policy (queries/catalog.py docstring) made EXECUTABLE — which queries'
implementations changed since their certification fingerprint was
frozen and therefore must re-enter the window.

Fingerprints: md5 over (query function source + oracle SQL + the file
bytes of every ``operators.*`` / ``functions.*`` module the function
references).  Function-level granularity for the query itself (so
adding one query to a 2,000-line module doesn't stale its siblings),
file-level for operator modules (they are cohesive units).  The
manifest ``tools/query_fingerprints.json`` is refreshed with
``--update-fingerprints`` when a round's window is frozen; the default
report diffs the live tree against it.

Usage:
  python tools/rotation_report.py                      # report
  python tools/rotation_report.py --update-fingerprints  # freeze state
  python tools/rotation_report.py --assert-no-debt     # round-close
      # gate: exit 1 if any oracled query is red-and-unfixed, has no
      # driver row AND no window slot scheduled to earn one, or holds
      # only a green row older than MAX_GREEN_AGE rounds while
      # unscheduled (certificate max-age, round-6 item 3)

Gate invariants (round 7):

* **Max-age**: a green driver row is a certificate with a shelf life.
  Any oracled query whose NEWEST green row is more than
  ``MAX_GREEN_AGE`` rounds behind the latest recorded round must be
  back in the window, or the gate fails — the r01-only q7–q22 class
  can never silently age past the rotation again.
* **One-cycle birth exemption**: queries absent from the fingerprint
  manifest (born after the freeze) are exempt from the "green or
  scheduled" rule for EXACTLY ONE cycle.  The gate records first
  sightings in ``tools/pending_births.json`` keyed by the round it saw
  them; once a newer CORRECTNESS round lands, a still-unfingerprinted,
  unscheduled query trips the gate — a new oracled query cannot evade
  driver verification indefinitely by never re-running
  ``--update-fingerprints``.

Gate invariants v2 (round 9) — the catalog outgrew the window:

* **Sweep-artifact freshness.** With 237 oracled queries, a 50-slot
  window and a 4-round shelf life can keep at most 200 certificates
  fresh (50 × MAX_GREEN_AGE) — the max-age treadmill hits an
  arithmetic wall regardless of scheduling (the r08-vintage block
  alone is 50 + flagship slots at r13).  The amended rule: an
  over-age driver certificate is still compliant if the CURRENT
  round's committed full-catalog sweep (``SWEEP_r{N}.json``, written
  by ``tools/driver_sim_sweep.py --artifact``, N > newest CORRECTNESS
  round) shows the query hash-green.  The sweep runs the same
  comparator over the same oracles and is judge-re-runnable; the
  window still refreshes oldest-first at full width, so driver rows
  keep cycling — the sweep covers the tail the window arithmetic
  cannot.
* **Stale-carryover ledger.** ``--update-fingerprints`` previously
  ERASED rule-2 staleness for queries not in the window being frozen
  (the new manifest matches the new code while the standing green row
  certified the old code).  The freeze now records those names in
  ``tools/stale_carryover.json``; like births they get exactly one
  cycle to re-earn a DRIVER row (a sweep row does not clear changed
  code) before the gate fails.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "query_fingerprints.json")
PENDING = os.path.join(REPO, "tools", "pending_births.json")
CARRYOVER = os.path.join(REPO, "tools", "stale_carryover.json")
PKG = "rick_and_morty_data_pipeline_project_spark"

# A green driver row certifies unchanged code for at most this many
# rounds; older certificates must be re-earned (gate fails otherwise).
MAX_GREEN_AGE = 4

_REF_RE = re.compile(
    r"(?:operators|functions|streaming|sources)\.(\w+)"
)


def _module_import_map(module_name: str) -> dict[str, str]:
    """name → package-module file path, for every ``from <pkg>.<kind>.
    <mod> import name`` at the top of the query module (so a query
    whose operator import sits at module level — the common style —
    still fingerprints its operator's file)."""
    import ast
    import importlib

    mod = importlib.import_module(module_name)
    try:
        tree = ast.parse(inspect.getsource(mod))
    except (OSError, TypeError):
        return {}
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.ImportFrom) and node.module):
            continue
        if not node.module.startswith(PKG + "."):
            continue
        sub = node.module[len(PKG) + 1 :].split(".")
        if len(sub) == 2 and sub[0] in (
            "operators", "functions", "streaming", "sources"
        ):
            path = os.path.join(REPO, PKG, sub[0], sub[1] + ".py")
            for alias in node.names:
                out[alias.asname or alias.name] = path
    return out


_ADDR_RE = re.compile(r" at 0x[0-9a-fA-F]+")


def _stable_repr(obj) -> str:
    """repr that is stable across processes: container reprs embed a
    per-process memory address for any callable element (lambda rule
    predicates, bound methods); normalize those addresses away, and for
    module-level functions substitute their SOURCE so editing a lambda
    inside a constant table still flags the query stale."""
    import inspect as _inspect

    if callable(obj):
        try:
            return _ADDR_RE.sub("", _inspect.getsource(obj))
        except (OSError, TypeError):
            return _ADDR_RE.sub("", repr(obj))
    if isinstance(obj, (list, tuple)):
        inner = ", ".join(_stable_repr(v) for v in obj)
        return f"[{inner}]" if isinstance(obj, list) else f"({inner})"
    if isinstance(obj, dict):
        return (
            "{"
            + ", ".join(
                f"{k!r}: {_stable_repr(v)}" for k, v in obj.items()
            )
            + "}"
        )
    return _ADDR_RE.sub("", repr(obj))


def query_fingerprints() -> dict[str, str]:
    from rick_and_morty_data_pipeline_project_spark.queries.catalog import _ALL

    import_maps: dict[str, dict[str, str]] = {}
    file_cache: dict[str, str] = {}

    def file_text(path: str) -> str:
        if path not in file_cache:
            with open(path, "rb") as f:
                file_cache[path] = f.read().decode("utf-8", "replace")
        return file_cache[path]

    fps: dict[str, str] = {}
    for name, q in _ALL.items():
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            src = repr(q.fn)
        parts = [src, q.sql or ""]
        paths: set[str] = set()
        # inline `from ...operators.x import` / `operators.x` references
        for m in _REF_RE.finditer(src):
            kind = m.group(0).split(".")[0]
            paths.add(os.path.join(REPO, PKG, kind, m.group(1) + ".py"))
        # module-level imports actually used by this function
        mod_name = getattr(q.fn, "__module__", "")
        if mod_name and mod_name not in import_maps:
            import_maps[mod_name] = _module_import_map(mod_name)
        words = set(re.findall(r"\w+", src))
        for nm, path in import_maps.get(mod_name, {}).items():
            if nm in words:
                paths.add(path)
        # SAME-MODULE helpers (e.g. quality_classifier_score,
        # remove_boilerplate_spans live next to their queries): pull
        # the source of every module-level function/constant the query
        # references by name, to a fixpoint, so refactoring query logic
        # into a sibling helper cannot hide it from the stale detector.
        if mod_name:
            import importlib

            mod = importlib.import_module(mod_name)
            helpers: dict[str, str] = {}
            pending, included = sorted(words), set()
            while pending:
                nm = pending.pop(0)
                if nm in included:
                    continue
                included.add(nm)
                obj = getattr(mod, nm, None)
                if obj is None or obj is q.fn:
                    continue
                if callable(obj) and getattr(obj, "__module__", None) == mod_name:
                    try:
                        hsrc = inspect.getsource(obj)
                    except (OSError, TypeError):
                        hsrc = repr(obj)
                    helpers[nm] = hsrc
                    pending.extend(
                        sorted(set(re.findall(r"\w+", hsrc)) - included)
                    )
                    for m in _REF_RE.finditer(hsrc):
                        kind = m.group(0).split(".")[0]
                        paths.add(
                            os.path.join(REPO, PKG, kind, m.group(1) + ".py")
                        )
                elif isinstance(obj, (str, int, float, tuple, list, dict)):
                    # dict/list included too: queries depend on module-
                    # level tables like LANG_MARKERS / _LSH_TABLES, and
                    # editing those must flag the query stale.  repr of
                    # dict/list is deterministic (insertion-ordered) —
                    # EXCEPT when a container holds callables (e.g.
                    # _ROW_RULES' lambda predicates), whose default
                    # repr embeds a per-process memory address; mask
                    # those or the fingerprint drifts every run (the
                    # r08 audit_row_constraints manifest bug).
                    helpers[nm] = f"{nm}={_stable_repr(obj)}"
                elif isinstance(obj, (set, frozenset)):
                    # sets have no stable iteration order — sort reprs
                    helpers[nm] = (
                        f"{nm}={sorted(_stable_repr(v) for v in obj)!r}"
                    )
            # deterministic order — a set-iteration order here would
            # make the fingerprints themselves nondeterministic
            parts.extend(helpers[nm] for nm in sorted(helpers))
        # TRANSITIVE closure: an operator module that itself imports
        # functions/textfns (etc.) must pull that file into the
        # fingerprint too, or an edit to the shared helper silently
        # escapes the rule-2 stale detector.
        frontier = [p2 for p2 in paths if os.path.exists(p2)]
        seen_files = set(frontier)
        while frontier:
            fsrc = file_text(frontier.pop())
            for m in _REF_RE.finditer(fsrc):
                kind = m.group(0).split(".")[0]
                p2 = os.path.join(REPO, PKG, kind, m.group(1) + ".py")
                if p2 not in seen_files and os.path.exists(p2):
                    seen_files.add(p2)
                    frontier.append(p2)
        for path in sorted(seen_files):
            parts.append(file_text(path))
        # The profile_table_files oracles are PATH-PARAMETERIZED by
        # design (SPARK_GRAFT_ORACLE_SF_DIR is captured into their SQL
        # at import); mask the configured dir so the fingerprint
        # reflects the query, not which SF the current process happens
        # to point at.
        sf_mask = os.environ.get(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
        blob = "\n".join(parts).replace(sf_mask, "<SF_DIR>")
        fps[name] = hashlib.md5(blob.encode()).hexdigest()
    return fps


def compute_debt(
    oracled: list[str],
    newest_green: dict[str, int],
    attempted: set[str],
    frozen: dict[str, str],
    fps: dict[str, str],
    window: tuple[str, ...],
    max_round: int,
    pending: dict[str, int],
    sweep_green: set[str] | None = None,
    carryover: dict[str, int] | None = None,
) -> tuple[list[str], list[str], list[str], dict[str, int], list[str], dict[str, int]]:
    """Pure debt computation (unit-testable without touching repo
    state).  Returns (attempted-but-never-green, unscheduled-no-row,
    over-age-unscheduled, updated pending-births map,
    carryover-debt, updated carryover map).

    ``sweep_green``: queries hash-green in the current round's
    committed full-catalog sweep artifact (SWEEP_r{N}.json with
    N > max_round).  Policy v2 (round 9): an over-age driver
    certificate is still compliant if the CURRENT sweep re-verified
    the query — the 237-oracled catalog outgrew the 50-slot × 4-round
    window capacity (200), so pure driver-row freshness would hit an
    arithmetic wall (50 × MAX_GREEN_AGE < |catalog|) regardless of
    scheduling; the window keeps refreshing oldest-first at full
    width, and the sweep (same comparator, same oracles, judge-
    re-runnable) certifies the tail every round.

    ``carryover``: the rule-2 stale ledger persisted at freeze time —
    queries whose fingerprint CHANGED at an --update-fingerprints
    freeze while NOT in that freeze's window.  The freeze would
    otherwise erase the staleness (the new manifest matches the new
    code, but the standing green row certified the OLD code).  Like
    births, each entry gets exactly one cycle: once a newer
    CORRECTNESS round lands it must be in the window or re-green, or
    it's debt.  A sweep row does NOT clear carryover — changed code
    must re-earn a DRIVER row."""
    sweep_green = sweep_green or set()
    carryover = dict(carryover or {})
    oracled_set = set(oracled)
    never = [n for n in oracled if n not in attempted]
    failed_only = sorted(
        n for n in oracled if n in attempted and n not in newest_green
    )
    # pending births: drop names the manifest now governs, names that
    # no longer exist (deleted/renamed queries), and rows-only entries
    # (sql=None can never be scheduled or become debt); record the
    # first sighting round for still-unfingerprinted oracled ones
    pending = {
        n: r
        for n, r in pending.items()
        if n in fps and n not in frozen and n in oracled_set
    }
    for n in fps:
        if n not in frozen and n in oracled_set:
            pending.setdefault(n, max_round)
    debt_unscheduled = sorted(
        n
        for n in never
        if n not in window
        and (
            n in frozen
            # one-cycle exemption expired: first seen in an EARLIER
            # round and still not fingerprinted/scheduled
            or pending.get(n, max_round) < max_round
        )
    )
    overage = sorted(
        n
        for n in oracled
        if n in newest_green
        and (max_round - newest_green[n]) > MAX_GREEN_AGE
        and n not in window
        and n not in sweep_green
    )
    # carryover lifecycle: cleared by a NEWER driver green (row earned
    # after the freeze that recorded the change); dropped for names no
    # longer in the catalog; debt once a newer round landed while the
    # entry is neither re-greened nor scheduled.
    carryover = {
        n: r
        for n, r in carryover.items()
        if n in oracled_set and newest_green.get(n, -1) <= r
    }
    carry_debt = sorted(
        n
        for n, r in carryover.items()
        if max_round > r and n not in window
    )
    return failed_only, debt_unscheduled, overage, pending, carry_debt, carryover


def main() -> None:
    from rick_and_morty_data_pipeline_project_spark.queries.catalog import (
        DRIVER_WINDOW,
        QUERIES,
    )

    fps = query_fingerprints()
    if "--update-fingerprints" in sys.argv:
        # Stale-carryover ledger (policy v2, round 9): re-freezing the
        # manifest ERASES rule-2 staleness (the new manifest matches
        # the new code), but any standing green row still certifies
        # the OLD code.  Record every changed-fingerprint query that
        # is NOT in the window being frozen — each must re-earn a
        # driver row within one cycle (compute_debt enforces it).
        old: dict[str, str] = {}
        if os.path.exists(MANIFEST):
            with open(MANIFEST) as f:
                old = json.load(f)
        changed_out = sorted(
            n
            for n, fp in fps.items()
            if old.get(n) not in (None, fp) and n not in DRIVER_WINDOW
        )
        if changed_out or os.path.exists(CARRYOVER):
            max_round = 0
            for path in glob.glob(
                os.path.join(REPO, "CORRECTNESS_r*.json")
            ):
                max_round = max(
                    max_round,
                    int(re.search(r"_r(\d+)", os.path.basename(path)).group(1)),
                )
            carry: dict[str, int] = {}
            if os.path.exists(CARRYOVER):
                with open(CARRYOVER) as f:
                    carry = json.load(f)
            for n in changed_out:
                carry.setdefault(n, max_round)
            with open(CARRYOVER, "w") as f:
                json.dump(carry, f, indent=1, sort_keys=True)
            if changed_out:
                print(
                    f"stale-carryover: {len(changed_out)} changed "
                    f"queries not in this window recorded in "
                    f"{CARRYOVER} (must re-earn a driver row within "
                    f"one cycle):"
                )
                for n in changed_out:
                    print(f"  {n}")
        with open(MANIFEST, "w") as f:
            json.dump(fps, f, indent=1, sort_keys=True)
        print(f"wrote {len(fps)} fingerprints to {MANIFEST}")
        return

    newest_green: dict[str, int] = {}
    attempted: set[str] = set()
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        rnum = int(
            re.search(r"_r(\d+)", os.path.basename(path)).group(1)
        )
        max_round = max(max_round, rnum)
        green = {
            name
            for name, r in rows.items()
            if r.get("rows_match") and r.get("schema_match")
            and r.get("hash_match") and not r.get("err")
        }
        attempted |= set(rows)
        for name in green:
            newest_green[name] = max(newest_green.get(name, 0), rnum)
        print(f"{os.path.basename(path)}: {len(green)} green / {len(rows)} rows")

    green_ever = set(newest_green)
    oracled = [n for n, q in QUERIES.items() if q.sql is not None]
    never = [n for n in oracled if n not in attempted]
    stale_slots = [n for n in DRIVER_WINDOW if n in green_ever]
    # ONE debt computation feeds both the report and the gate (so a
    # rule change can never make them disagree); the pending-births
    # file is persisted only under --assert-no-debt.
    frozen: dict[str, str] = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            frozen = json.load(f)
    pending: dict[str, int] = {}
    if os.path.exists(PENDING):
        with open(PENDING) as f:
            pending = json.load(f)
    carryover: dict[str, int] = {}
    if os.path.exists(CARRYOVER):
        with open(CARRYOVER) as f:
            carryover = json.load(f)
    # Sweep-artifact freshness (policy v2): a SWEEP_r{N}.json for the
    # round IN PROGRESS (N > newest CORRECTNESS round) extends over-age
    # certificates for every query it shows hash-green.
    sweep_green: set[str] = set()
    sweep_round = None
    # order by NUMERIC round (lexicographic %02d sorting breaks at
    # round 100 and would trust a stale higher-named artifact)
    for path in sorted(
        glob.glob(os.path.join(REPO, "SWEEP_r*.json")),
        key=lambda p: int(
            re.search(r"_r(\d+)", os.path.basename(p)).group(1)
        ),
    ):
        rnum = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        if rnum > max_round:
            with open(path) as f:
                sweep = json.load(f)
            sweep_round = rnum
            sweep_green = {
                n
                for n, r in sweep.items()
                if not n.startswith("_")
                and r.get("rows_match")
                and r.get("hash_match")
                and not r.get("err")
            }
    failed_only, debt_unscheduled, overage, pending, carry_debt, carryover = (
        compute_debt(
            oracled, newest_green, attempted, frozen, fps,
            DRIVER_WINDOW, max_round, pending,
            sweep_green=sweep_green, carryover=carryover,
        )
    )

    print(f"\noracled: {len(oracled)}; ever-green: "
          f"{len(green_ever & set(oracled))}; never-attempted: {len(never)}; "
          f"attempted-but-never-green: {len(failed_only)}")
    if failed_only:
        print("\nattempted but NEVER green (fix before rotating out!):")
        for n in failed_only:
            print(f"  {n}")
    print("\nnever-attempted oracled queries (rotate these in):")
    for n in never:
        print(f"  {n}")

    # Rule 2: implementation changed since the frozen manifest.
    if frozen:
        changed = sorted(
            n for n, fp in fps.items() if frozen.get(n) not in (None, fp)
        )
        new = sorted(n for n in fps if n not in frozen)
        print(f"\nrule-2 stale (fingerprint changed since manifest): "
              f"{len(changed)}")
        for n in changed:
            mark = "" if n in DRIVER_WINDOW else "  <-- NOT in window"
            print(f"  {n}{mark}")
        if new:
            print(f"new since manifest (no fingerprint): {len(new)}")
            for n in new:
                print(f"  {n}")
    else:
        print("\n(no fingerprint manifest yet — run with "
              "--update-fingerprints at window freeze)")

    # Max-age report: certificates older than MAX_GREEN_AGE rounds.
    aged = sorted(
        (n for n in oracled
         if n in newest_green
         and (max_round - newest_green[n]) > MAX_GREEN_AGE),
        key=lambda n: (newest_green[n], n),
    )
    print(f"\nover-age greens (newest green row > {MAX_GREEN_AGE} rounds "
          f"behind r{max_round:02d}): {len(aged)}")
    if sweep_round is not None:
        print(f"  (current sweep artifact: SWEEP_r{sweep_round:02d}.json, "
              f"{len(sweep_green)} hash-green — covers over-age entries)")
    for n in aged:
        mark = "" if n in DRIVER_WINDOW else (
            "  <-- sweep-covered" if n in sweep_green else "  <-- NOT in window"
        )
        print(f"  {n} (r{newest_green[n]:02d}){mark}")

    # --project-next: the NEXT round's over-age wave, assuming the
    # current window lands green (r12 verdict stretch 9 asked for this
    # number; note the conservation law — scheduling cohort X instead
    # of cohort Y displaces refreshes one-for-one, so the projected
    # total is invariant under window composition: the treadmill
    # refreshes ≤ 50 certificates/round against len(oracled) queries
    # with a MAX_GREEN_AGE shelf life, and policy v2's per-round sweep
    # artifact covers the arithmetic remainder by design).
    if "--project-next" in sys.argv:
        ng = dict(newest_green)
        for n in DRIVER_WINDOW:
            ng[n] = max_round + 1
        # Never-certified oracled queries are MAXIMALLY stale — treat a
        # missing newest_green as round 0 so they surface in the
        # projection instead of being silently dropped (they are also
        # rule-1 debt, reported above, but the projected wave should
        # not under-count them).
        nxt = sorted(
            (n for n in oracled
             if (max_round + 1 - ng.get(n, 0)) > MAX_GREEN_AGE),
            key=lambda n: (ng.get(n, 0), n),
        )
        floor_n = max(0, len(oracled) - 50 * MAX_GREEN_AGE)
        print(f"\nprojected over-age at r{max_round + 2:02d}-start "
              f"(assuming the r{max_round + 1:02d} window lands green): "
              f"{len(nxt)}")
        print(f"  (steady-state floor for {len(oracled)} oracled / "
              f"50-slot window / {MAX_GREEN_AGE}-round shelf: "
              f"≥ {floor_n} — sweep coverage is the standing mechanism "
              f"for this remainder, policy v2)")
        for n in nxt:
            tag = (f"r{ng[n]:02d}" if n in ng else "never-certified")
            print(f"  {n} ({tag})")

    if carryover:
        print(f"\nstale-carryover (changed at a freeze while unscheduled; "
              f"must re-earn a driver row): {len(carryover)}")
        for n, r in sorted(carryover.items()):
            mark = "" if n in DRIVER_WINDOW else "  <-- NOT in window"
            print(f"  {n} (changed at r{r:02d}){mark}")

    print(f"\nwindow slots already green in a prior round "
          f"(candidates to rotate out): {len(stale_slots)}")
    for n in stale_slots:
        print(f"  {n}")

    # --assert-no-debt: gate a round close on the standing invariant
    # "every oracled query is green, fresh enough, or scheduled".
    # Debt = attempted-but-never-green (a red row nobody fixed), or
    # never-attempted AND not in the current window (a query with no
    # driver row that is not even scheduled to earn one next run), or
    # a green certificate older than MAX_GREEN_AGE rounds while
    # unscheduled.  Never-attempted queries IN the window are the
    # normal steady state of a rotating 50-slot window, not debt.
    # Born-after-freeze queries (absent from the manifest) are exempt
    # for ONE cycle, tracked in tools/pending_births.json.
    if "--assert-no-debt" in sys.argv:
        with open(PENDING, "w") as f:
            json.dump(pending, f, indent=1, sort_keys=True)
        with open(CARRYOVER, "w") as f:
            json.dump(carryover, f, indent=1, sort_keys=True)
        debt = failed_only + debt_unscheduled + overage + carry_debt
        if debt:
            print(f"\nDEBT ({len(debt)} queries — red, unscheduled, "
                  f"over-age, or stale-carryover):")
            for n in failed_only:
                print(f"  {n}  [red]")
            for n in debt_unscheduled:
                print(f"  {n}  [no driver row, not scheduled]")
            for n in overage:
                print(f"  {n}  [green r{newest_green[n]:02d}, "
                      f"> {MAX_GREEN_AGE} rounds old, not scheduled, "
                      f"not sweep-covered]")
            for n in carry_debt:
                print(f"  {n}  [fingerprint changed at r"
                      f"{carryover[n]:02d} freeze, not re-greened or "
                      f"scheduled]")
            sys.exit(1)
        print("\nno debt: every oracled query is green-and-fresh, "
              "sweep-covered, or in-window")


if __name__ == "__main__":
    main()
