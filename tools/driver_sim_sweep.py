"""Strict driver-sim sweep: replicate the verification driver's t2 gate
over EVERY oracled catalog query under a PLAIN SparkSession (ANSI
defaults, none of the package session's tuning) and compare against
DuckDB by sorted-column/sorted-row repr-hash — stricter than
tests/oracle_harness.compare because dtype differences (e.g. DuckDB
HUGEINT → float64) change the repr and fail here.

Usage: python tools/driver_sim_sweep.py [sf_dir] [--window-only]
           [--artifact] [--round=N]

``--artifact`` writes the committed per-round certificate
``SWEEP_r{N}.json`` consumed by tools/rotation_report.py's max-age
gate (policy v2, round 9).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Queries whose DuckDB oracle inlines canonical literals fit from the
# sf0.01 testdata at import (the documented canonical-literal pattern:
# PCA components, k-means/PQ/OPQ codebooks, the BFD compaction plan).
# At any OTHER scale factor the literal side diverges BY DESIGN — the
# r12 sf0.1 sweep confirmed exactly this set and nothing else (after
# fixing the two real divergences it caught, see PERFORMANCE.md).
# A non-sf0.01 sweep reports them as SKIP instead of FAIL so the exit
# code stays meaningful for the entries whose oracles ARE portable.
CANONICAL_SF001_ORACLES = {
    "embedding_pca_project",
    "knn_cosine_ivf_kmeans",
    "knn_cosine_pq",
    "knn_cosine_ivfpq",
    "knn_cosine_opq",
    "compact_layout_audit",
}


def norm_hash(df) -> str:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    # to_csv with a 17-significant-digit float format: full double
    # round-trip precision.  (to_string truncates floats at display
    # precision — ~6 digits — which would hash bit-different doubles
    # identically and false-pass the gate.)
    # na_rep sentinel: bare to_csv renders NULL and '' identically,
    # which would false-pass a query where one engine returns NULL and
    # the other an empty string.  The dtype KIND signature is hashed
    # too: %.17g prints an int-valued float64 exactly like an int64
    # ("157"), so without it the HUGEINT→float64 oracle skew (the
    # documented round-2 failure mode) would slip through value
    # formatting.  KIND, not exact width: int32-vs-int64 (Spark size()/
    # row_number() are IntegerType, DuckDB len/count BIGINT) is
    # driver-proven benign — those queries hold triple-green rows.
    dtype_sig = ";".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    return hashlib.md5(
        (
            dtype_sig
            + "\n"
            + df.to_csv(index=False, float_format="%.17g", na_rep="<NULL>")
        ).encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    window_only = "--window-only" in sys.argv
    # Path-parameterized oracles (PROFILE_FILES_SQL) capture this at
    # entry-point import — set it BEFORE importing __spark_entry__ so
    # the file-audit oracles read the swept SF's tree, not sf0.01.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[:50] if window_only else [n for n in qs if n in osql]
    skipped = []
    if os.path.realpath(sf_dir) != os.path.realpath("/root/testdata/sf0.01"):
        skipped = [n for n in names if n in CANONICAL_SF001_ORACLES]
        names = [n for n in names if n not in CANONICAL_SF001_ORACLES]
        for n in skipped:
            print(f"{n}: SKIP (canonical-literal sf0.01 oracle)", flush=True)
    bad = []
    rows: dict[str, dict] = {}
    for name in names:
        if name not in osql:
            bad.append((name, "WINDOW ENTRY WITHOUT ORACLE"))
            continue
        try:
            s = qs[name](spark, sf_dir).toPandas()
            o = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            rows[name] = {
                "rows_match": False,
                "hash_match": False,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
            print(f"{name}: ERROR {exc}", flush=True)
            continue
        rows[name] = {
            "rows_match": len(s) == len(o),
            "hash_match": norm_hash(s) == norm_hash(o),
            "err": None,
            "spark_rows": len(s),
            "oracle_rows": len(o),
        }
        if len(s) != len(o):
            bad.append((name, f"rows {len(s)} vs {len(o)}"))
        elif not rows[name]["hash_match"]:
            bad.append((name, f"hash mismatch ({len(s)} rows)"))
        else:
            print(f"{name}: OK ({len(s)} rows)", flush=True)
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    tail = f" ({len(skipped)} canonical-literal skips)" if skipped else ""
    print(f"\n{len(names) - len(bad)}/{len(names)} OK{tail}")
    if "--artifact" in sys.argv:
        # SWEEP_r{N}.json: the committed full-catalog certificate for
        # the round IN PROGRESS (N = newest CORRECTNESS round + 1, i.e.
        # this sweep was run after that round's verdict landed and
        # before the next driver run).  rotation_report's max-age gate
        # accepts a hash-green sweep row as freshness evidence for
        # over-age driver certificates — see the policy note there.
        import glob
        import re as _re

        rounds = [
            int(_re.search(r"_r(\d+)", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        ]
        n = max(rounds, default=0) + 1
        for a in sys.argv:
            if a.startswith("--round="):
                n = int(a.split("=", 1)[1])
        out = {
            "_meta": {
                "round": n,
                "sf_dir": sf_dir,
                "n_total": len(names),
                "n_ok": len(names) - len(bad),
            }
        }
        out.update(dict(sorted(rows.items())))
        path = os.path.join(REPO, f"SWEEP_r{n:02d}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=False)
        print(f"wrote {path} ({len(rows)} rows, round {n})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
