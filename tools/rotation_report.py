"""Print the driver-window rotation state: which oracled catalog
queries have never held a CORRECTNESS_r*.json row, which window slots
are re-checking already-green queries, and the suggested next window.

Usage: python tools/rotation_report.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from rick_and_morty_data_pipeline_project_spark.queries.catalog import (
        DRIVER_WINDOW,
        QUERIES,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green_ever: set[str] = set()
    attempted: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        green = {
            name
            for name, r in rows.items()
            if r.get("rows_match") and r.get("schema_match")
            and r.get("hash_match") and not r.get("err")
        }
        attempted |= set(rows)
        green_ever |= green
        print(f"{os.path.basename(path)}: {len(green)} green / {len(rows)} rows")

    oracled = [n for n, q in QUERIES.items() if q.sql is not None]
    never = [n for n in oracled if n not in attempted]
    failed_only = sorted(
        n for n in oracled if n in attempted and n not in green_ever
    )
    stale_slots = [n for n in DRIVER_WINDOW if n in green_ever]
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
    print(f"\nwindow slots already green in a prior round "
          f"(candidates to rotate out): {len(stale_slots)}")
    for n in stale_slots:
        print(f"  {n}")


if __name__ == "__main__":
    main()
