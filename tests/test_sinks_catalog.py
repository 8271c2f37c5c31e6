"""Sink/source coverage beyond parquet scans: CSV round-trip (SNK-3/
SRC-9), partitioned parquet writes with partition pruning (SNK-1 at
scale), catalog introspection (SRC-8), and streaming sessionization."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rick_and_morty_data_pipeline_project_spark.plans.explain_utils import (
    formatted_plan,
)
from rick_and_morty_data_pipeline_project_spark.sources.corpus import (
    register_views,
)
from rick_and_morty_data_pipeline_project_spark.streaming.stateful import (
    sessionize_builtin,
)
from tests.conftest import SF_SMALL


def test_csv_round_trip(spark):
    """SNK-3 (to_csv, Scraper.py:369-371) + SRC-9 (manual header-skip
    read, Scraper.py:394-399) → header-aware distributed CSV I/O."""
    df = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").csv(f"{d}/nation_csv", header=True)
        back = spark.read.csv(f"{d}/nation_csv", header=True, inferSchema=True)
        assert back.count() == df.count()
        assert set(back.columns) == set(df.columns)
        a = {tuple(r) for r in df.collect()}
        b = {tuple(r) for r in back.collect()}
        assert a == b


def test_partitioned_write_prunes(spark):
    """Hive-style partitioned layout: a filter on the partition column
    must prune directories (PartitionFilters), not scan everything."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").partitionBy("l_returnflag").parquet(
            f"{d}/li"
        )
        back = spark.read.parquet(f"{d}/li")
        q = back.filter(F.col("l_returnflag") == "R").select("l_orderkey")
        plan = formatted_plan(q)
        assert "PartitionFilters" in plan
        assert "l_returnflag" in plan.split("PartitionFilters", 1)[1][:200]
        want = li.filter(F.col("l_returnflag") == "R").count()
        assert q.count() == want


def test_bucketed_join_has_no_exchange(spark):
    """Bucketing both join sides on the key makes the join exchange-free
    (the write paid the shuffle once) — the co-located-join layout a
    100 TB fact-fact join needs."""
    from rick_and_morty_data_pipeline_project_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "bkt_orders", "okey", 8
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"), "bkt_lineitem", "okey", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_orders", "bkt_lineitem", "okey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_catalog_introspection(spark):
    """SRC-8 (sqlite_master listing, Scraper.py:445-449)."""
    register_views(spark, SF_SMALL)
    names = {t.name for t in spark.catalog.listTables()}
    assert {"lineitem", "orders", "documents", "embeddings"} <= names
    cols = {f.name for f in spark.catalog.listColumns("lineitem")}
    assert "l_orderkey" in cols


def test_sessionize_builtin_batch(spark):
    """Gap-based sessions over the events table (batch form of the
    streaming operator): session bounds must cover their events and
    per-user event counts must be conserved."""
    from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table

    events = load_table(spark, SF_SMALL, "events")
    sessions = sessionize_builtin(events, gap="30 minutes")
    rows = sessions.collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()
    by_user = events.groupBy("user_id").count().collect()
    per_user_sessions = {}
    for r in rows:
        per_user_sessions.setdefault(r["user_id"], 0)
        per_user_sessions[r["user_id"]] += r["n_events"]
    for r in by_user:
        assert per_user_sessions[r["user_id"]] == r["count"]


def test_json_round_trip(spark):
    """JSON lines source/sink (beyond ref): schema-preserving round trip
    including nested/array columns."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        "source",
        F.split("text", " ").alias("tokens"),
        F.struct(F.col("n_chars").alias("chars"), F.col("lang")).alias("meta"),
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").json(f"{d}/docs_json")
        back = spark.read.schema(df.schema).json(f"{d}/docs_json")
        assert back.count() == df.count()
        a = {(r["doc_id"], tuple(r["tokens"]), r["meta"]["chars"]) for r in df.collect()}
        b = {(r["doc_id"], tuple(r["tokens"]), r["meta"]["chars"]) for r in back.collect()}
        assert a == b


def test_orc_round_trip(spark):
    """ORC source/sink (beyond ref): schema-preserving round trip with
    zlib compression, including nested/array columns — the
    Hive-ecosystem interchange format next to parquet."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        "source",
        F.split("text", " ").alias("tokens"),
        F.struct(F.col("n_chars").alias("chars"), F.col("lang")).alias("meta"),
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").option("compression", "zlib").orc(
            f"{d}/docs_orc"
        )
        back = spark.read.orc(f"{d}/docs_orc")
        # ORC read-back relaxes nullability (file-level nullable); names
        # and types must survive exactly
        assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
            (f.name, f.dataType.simpleString()) for f in df.schema
        ]
        a = {
            (r["doc_id"], tuple(r["tokens"]), r["meta"]["chars"])
            for r in df.collect()
        }
        b = {
            (r["doc_id"], tuple(r["tokens"]), r["meta"]["chars"])
            for r in back.collect()
        }
        assert a == b


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    """Full MERGE triad over parquet: matched keys replaced, new keys
    inserted, delete-flagged keys removed; untouched rows survive."""
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.operators.merge import (
        merge_upsert,
    )

    path = str(tmp_path / "merge_target")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["id", "name", "score"],
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [
            (2, "b2", 21.0, False),   # update
            (5, "e", 50.0, False),    # insert
            (3, None, 0.0, True),     # delete
            (4, "d2", 41.0, None),    # NULL flag (left-join artifact) = update
        ],
        ["id", "name", "score", "_delete"],
    )
    n = merge_upsert(spark, path, updates, ["id"], delete_col="_delete")
    got = {
        (r["id"], r["name"], r["score"])
        for r in spark.read.parquet(path).collect()
    }
    assert n == 4
    assert got == {
        (1, "a", 10.0),
        (2, "b2", 21.0),
        (4, "d2", 41.0),
        (5, "e", 50.0),
    }
    # idempotent re-merge of the same updates changes nothing
    n2 = merge_upsert(spark, path, updates, ["id"], delete_col="_delete")
    assert n2 == 4
    got2 = {
        (r["id"], r["name"], r["score"])
        for r in spark.read.parquet(path).collect()
    }
    assert got2 == got


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on read: two parquet batches with different
    column sets union under mergeSchema=true (missing columns null),
    and the widened schema is what downstream queries see."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], ["id", "name"]
    ).write.parquet(path + "/b1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(path + "/b2")
    df = spark.read.option("mergeSchema", "true").parquet(
        path + "/b1", path + "/b2"
    )
    assert set(df.columns) == {"id", "name", "score"}
    rows = {(r["id"], r["name"], r["score"]) for r in df.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}


def test_sql_entry_point_matches_dataframe(spark):
    """Raw-SQL interface ≡ the DataFrame catalog: the same statement a
    SQLite-first reference user would write runs through spark.sql over
    the registered views and matches the DataFrame twin exactly."""
    from rick_and_morty_data_pipeline_project_spark.sql import sql

    got = {
        tuple(r)
        for r in sql(
            spark,
            SF_SMALL,
            """
            SELECT o_orderpriority, count(*) AS n
            FROM orders
            WHERE o_orderstatus = 'F'
            GROUP BY o_orderpriority
            """,
        ).collect()
    }
    from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table

    want = {
        tuple(r)
        for r in load_table(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0

    # the SQL path must also see the normalized events.ts (TIMESTAMP,
    # not raw NTZ/bigint) — the loader feeds the views
    ts_type = dict(
        sql(spark, SF_SMALL, "SELECT ts FROM events LIMIT 1").dtypes
    )["ts"]
    assert ts_type == "timestamp", ts_type


def test_globally_sorted_export(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions yields a true global
    order: every file internally sorted, file key-ranges disjoint and
    ordered by part index — no single-task total sort anywhere."""
    import glob
    import os

    from rick_and_morty_data_pipeline_project_spark.operators.sort_export import (
        write_globally_sorted,
    )

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "sorted_out")
    write_globally_sorted(orders, "o_totalprice", path, num_files=6)

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) >= 2
    prev_max = None
    total = 0
    for f in files:
        vals = [
            r["o_totalprice"] for r in spark.read.parquet(f).collect()
        ]
        if not vals:
            continue
        assert vals == sorted(vals), f"file {f} not internally sorted"
        if prev_max is not None:
            assert vals[0] >= prev_max, "file ranges overlap out of order"
        prev_max = vals[-1]
        total += len(vals)
    assert total == orders.count()


def test_compaction_routes_unplanned_files_to_leftover_bin(
    spark, tmp_path, monkeypatch
):
    """A file landing in src between the plan's listing and the
    rewrite's re-listing (streaming ingest mid-compaction) must reach
    the output — in a dedicated leftover bin — not silently vanish
    (the round-2 inner-join routing dropped it)."""
    import rick_and_morty_data_pipeline_project_spark.operators.compaction as C

    src = str(tmp_path / "racing")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    orders.repartition(4).write.parquet(src)
    n_before = orders.count()

    late = spark.range(100).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) if f.name != "o_orderkey"
          else (F.col("id") + 10_000_000).alias(f.name)
          for f in orders.schema.fields]
    )

    orig_plan = C.plan_compaction
    landed = {"done": False}

    def racing_plan(*args, **kwargs):
        plan = orig_plan(*args, **kwargs)
        plan = plan.localCheckpoint()  # freeze the listing, then race
        if not landed["done"]:
            late.write.mode("append").parquet(src)
            landed["done"] = True
        return plan

    monkeypatch.setattr(C, "plan_compaction", racing_plan)
    dst = str(tmp_path / "compacted")
    n_bins = C.compact(spark, src, dst, target_rows=8000)
    back = spark.read.parquet(dst)
    assert back.count() == n_before + 100  # nothing lost
    # the late rows sit in the highest (leftover) bin
    top_bin = back.agg(F.max("_bin")).first()[0]
    assert n_bins == top_bin + 1
    late_rows = back.filter(F.col("o_orderkey") >= 10_000_000)
    assert late_rows.count() == 100
    assert {r["_bin"] for r in late_rows.select("_bin").distinct().collect()} == {top_bin}


def test_compaction_plan_and_execute(spark, tmp_path):
    """Compaction planning: bins respect the row target (oversized
    files get singleton bins), every file is covered exactly once, and
    executing the plan conserves rows while reducing file count."""
    import glob
    import os

    from rick_and_morty_data_pipeline_project_spark.operators.compaction import (
        compact,
        plan_compaction,
    )

    src = str(tmp_path / "fragmented")
    # 8 small fragments of orders (~1875 rows each)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    orders.repartition(8).write.parquet(src)
    n_src_files = len(glob.glob(os.path.join(src, "part-*.parquet")))
    assert n_src_files == 8

    plan = plan_compaction(spark, src, target_rows=8000).collect()
    assert {r["file"] for r in plan} and len(plan) == n_src_files
    by_bin = {}
    for r in plan:
        by_bin.setdefault(r["bin_id"], []).append(r["n_rows"])
    for rows in by_bin.values():
        assert sum(rows) <= 8000 or len(rows) == 1
    assert len(by_bin) < n_src_files  # actually compacting

    dst = str(tmp_path / "compacted")
    n_bins = compact(spark, src, dst, target_rows=8000)
    assert n_bins == len(by_bin)
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    assert set(back.drop("_bin").columns) == set(orders.columns)
    # hive layout: one directory per bin, ONE data file per directory
    # (hash-collided bins must still split into their own files)
    bin_dirs = sorted(glob.glob(os.path.join(dst, "_bin=*")))
    assert len(bin_dirs) == n_bins
    n_dst_files = 0
    for d in bin_dirs:
        files = glob.glob(os.path.join(d, "part-*.parquet"))
        assert len(files) == 1, d
        n_dst_files += len(files)
    assert n_dst_files < n_src_files


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering: after a morton-clustered write, a box
    predicate over BOTH key columns intersects (by file-level min/max
    stats) a small fraction of files; a single-column-sorted layout
    prunes only its own column."""
    import glob

    import pyarrow.parquet as pq

    from rick_and_morty_data_pipeline_project_spark.operators.zorder import (
        zorder_write,
    )

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") / 1000).cast("int").alias("price_k"),
    )
    lo_c, hi_c = 100, 200        # custkey box
    lo_p, hi_p = 50, 100         # price_k box

    def files_hit(path: str) -> tuple[int, int]:
        hit, total = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins: dict = {}
            maxs: dict = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None:
                        continue
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            total += 1
            if (
                mins["o_custkey"] <= hi_c
                and maxs["o_custkey"] >= lo_c
                and mins["price_k"] <= hi_p
                and maxs["price_k"] >= lo_p
            ):
                hit += 1
        return hit, total

    zpath = str(tmp_path / "zorders")
    zorder_write(orders, zpath, "o_custkey", "price_k", n_files=16)
    # baseline: hash-partitioned (unclustered) layout, same file count
    upath = str(tmp_path / "unordered")
    orders.repartition(16).write.parquet(upath)

    z_hit, z_total = files_hit(zpath)
    u_hit, u_total = files_hit(upath)
    assert z_total == u_total == 16
    # every unclustered file spans the whole key space → all hit;
    # the z-ordered layout must prune a solid majority
    assert u_hit == 16, u_hit
    assert z_hit <= 6, (z_hit, z_total)

    # correctness: clustering is a pure relayout
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )


def test_packed_shards_round_trip(spark, tmp_path):
    """Packed-shard export: every document's bytes must be recoverable
    from (blob, offset, n_bytes) — including multi-byte UTF-8 — and the
    index offsets must tile each blob exactly."""
    from rick_and_morty_data_pipeline_project_spark.operators.shards import (
        write_packed_shards,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        # exercise multi-byte UTF-8 in the offset arithmetic
        F.concat(F.col("text"), F.lit(" é→")).alias("text"),
        (F.col("doc_id") % 4).cast("int").alias("shard"),
    )
    out = str(tmp_path / "packed")
    write_packed_shards(docs, out)

    blobs = {
        r["shard"]: r for r in spark.read.parquet(f"{out}/blobs").collect()
    }
    index = spark.read.parquet(f"{out}/index").collect()
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}

    assert set(blobs) == {0, 1, 2, 3}
    seen = 0
    per_shard_bytes: dict = {}
    for r in index:
        blob = bytes(blobs[r["shard"]]["blob"])
        piece = blob[r["offset"] : r["offset"] + r["n_bytes"]]
        assert piece.decode("utf-8") == originals[r["doc_id"]], r["doc_id"]
        per_shard_bytes[r["shard"]] = per_shard_bytes.get(r["shard"], 0) + r["n_bytes"]
        seen += 1
    assert seen == len(originals)
    # offsets tile the blob exactly: sum of lengths == blob size
    for s, r in blobs.items():
        assert per_shard_bytes[s] == r["n_bytes"] == len(bytes(r["blob"]))
        assert r["n_docs"] == sum(1 for i in index if i["shard"] == s)


def test_packed_shards_null_text_alignment(spark, tmp_path):
    """A NULL text row contributes ZERO bytes in BOTH the blob and the
    index, so later documents' offsets stay aligned (a stringified
    'None' would silently shift every following slice)."""
    from rick_and_morty_data_pipeline_project_spark.operators.shards import (
        write_packed_shards,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", 0), (2, None, 0), (3, "omega", 0)],
        "doc_id long, text string, shard int",
    )
    out = str(tmp_path / "nullpacked")
    write_packed_shards(docs, out)
    (blob_row,) = spark.read.parquet(f"{out}/blobs").collect()
    blob = bytes(blob_row["blob"])
    assert blob == b"alphaomega"
    idx = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/index").collect()}
    assert (idx[2]["offset"], idx[2]["n_bytes"]) == (5, 0)
    assert blob[idx[3]["offset"] : idx[3]["offset"] + idx[3]["n_bytes"]] == b"omega"


def test_atomic_overwrite_recovers_mid_swap_crash(spark, tmp_path):
    """Crash between the two swap renames leaves the table at
    .__merge_old__; the next overwrite (and any read-modify-write sink)
    must RESTORE it, never delete it as stale — and the subsequent
    merge must see the recovered content."""
    from rick_and_morty_data_pipeline_project_spark.operators.merge import (
        atomic_overwrite,
        recover_table,
    )

    target = str(tmp_path / "table")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(
        target
    )
    # simulate the crash window: target moved aside, new table not yet in
    import shutil

    shutil.move(target, target + ".__merge_old__")
    assert recover_table(spark, target) is True
    assert {r["k"] for r in spark.read.parquet(target).collect()} == {1, 2}

    # same crash again, but now recovery rides atomic_overwrite itself:
    # the overwrite READS the recovered table, so content must survive
    shutil.move(target, target + ".__merge_old__")
    recover_table(spark, target)
    merged = spark.read.parquet(target).unionByName(
        spark.createDataFrame([(3, "c")], "k long, v string")
    )
    atomic_overwrite(spark, merged, target)
    assert {r["k"] for r in spark.read.parquet(target).collect()} == {1, 2, 3}


def test_zorder_write_rejects_null_keys(spark, tmp_path):
    from rick_and_morty_data_pipeline_project_spark.operators.zorder import (
        zorder_write,
    )
    import pytest

    df = spark.createDataFrame(
        [(1, 2), (3, None), (5, 6)], "a long, b long"
    )
    with pytest.raises(ValueError, match="NULL"):
        zorder_write(df, str(tmp_path / "z1"), "a", "b")
    # all-NULL column: clean ValueError, not a TypeError crash
    df2 = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b long"
    )
    with pytest.raises(ValueError, match="NULL"):
        zorder_write(df2, str(tmp_path / "z2"), "a", "b")


def test_profile_table_files_multi_file(spark, tmp_path):
    """The per-file audit over a genuinely multi-file table: one row
    per underlying parquet file, counts and key bounds matching a
    pyarrow ground-truth read of each file."""
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.queries.catalog import _ALL

    src = spark.range(0, 1000).select(
        F.col("id").alias("l_orderkey"),
        (F.col("id") % 7).alias("v"),
    )
    # write as {tmp}/lineitem.parquet so the REAL catalog query audits it
    out = str(tmp_path / "lineitem.parquet")
    src.repartition(4, "l_orderkey").write.parquet(out)

    audited = _ALL["profile_table_files"].fn(spark, str(tmp_path)).collect()
    got = {r["file"]: (r["n_rows"], r["min_orderkey"], r["max_orderkey"]) for r in audited}
    files = [f for f in _glob.glob(f"{out}/*.parquet")]
    assert len(files) == 4 and len(got) == 4
    for f in files:
        t = _pq.read_table(f)
        ks = t.column("l_orderkey").to_pylist()
        base = f.rsplit("/", 1)[1]
        assert got[base] == (len(ks), min(ks), max(ks)), base


def test_footer_stats_match_scanning_audit(spark, tmp_path):
    """The footer-only stats equal the full-scan audit row-for-row over
    a genuinely multi-file table — metadata and data agree."""
    from pyspark.sql import functions as F

    from rick_and_morty_data_pipeline_project_spark.operators.tablestats import (
        parquet_footer_stats,
    )

    src = spark.range(0, 5000).select(
        F.col("id").alias("l_orderkey"), (F.col("id") * 3).alias("v")
    )
    out = str(tmp_path / "lineitem.parquet")
    src.repartition(6, "l_orderkey").write.parquet(out)

    from rick_and_morty_data_pipeline_project_spark.queries.catalog import _ALL

    scan = {
        r["file"]: (r["n_rows"], r["min_orderkey"], r["max_orderkey"])
        for r in _ALL["profile_table_files"].fn(spark, str(tmp_path)).collect()
    }
    footer = {
        r["file"]: (r["n_rows"], r["min_key"], r["max_key"])
        for r in parquet_footer_stats(spark, out, "l_orderkey").collect()
    }
    assert footer == scan and len(footer) == 6

    # partitioned (subdirectory) layout: the recursive walk must see
    # exactly the files spark.read.parquet's partition discovery sees
    pout = str(tmp_path / "parted")
    src.withColumn("pk", (F.col("l_orderkey") % 3).cast("int")).write.partitionBy(
        "pk"
    ).parquet(pout)
    footer_p = parquet_footer_stats(spark, pout, "l_orderkey").collect()
    n_files = spark.read.parquet(pout).select(
        F.input_file_name()
    ).distinct().count()
    assert len(footer_p) == n_files
    assert sum(r["n_rows"] for r in footer_p) == 5000


def test_footer_stats_missing_flagged(spark, tmp_path):
    """A legal parquet file whose writer omitted column statistics
    (has_min_max false) reports NULL bounds WITH stats_missing=true —
    distinguishable from a genuinely NULL-keyed file; a zero-row file
    reports NULL bounds with stats_missing=false."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rick_and_morty_data_pipeline_project_spark.operators.tablestats import (
        parquet_footer_stats,
    )

    d = tmp_path / "t.parquet"
    d.mkdir()
    pq.write_table(
        pa.table({"l_orderkey": [5, 1, 9]}),
        str(d / "nostats.parquet"),
        write_statistics=False,
    )
    pq.write_table(
        pa.table({"l_orderkey": [2, 7]}), str(d / "stats.parquet")
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([], type=pa.int64())}),
        str(d / "empty.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([None, None], type=pa.int64())}),
        str(d / "allnull.parquet"),
    )
    got = {
        r["file"]: (r["n_rows"], r["min_key"], r["max_key"], r["stats_missing"])
        for r in parquet_footer_stats(spark, str(d), "l_orderkey").collect()
    }
    assert got["nostats.parquet"] == (3, None, None, True)
    assert got["stats.parquet"] == (2, 2, 7, False)
    assert got["empty.parquet"] == (0, None, None, False)
    # all-NULL key: stats present, has_min_max false BECAUSE
    # null_count == num_rows — genuinely NULL-keyed, not flagged
    assert got["allnull.parquet"] == (2, None, None, False)


def test_compaction_plan_invariants(spark):
    """The running-sum bin packer must produce CONTIGUOUS groups in
    partition order, with every group except possibly the last
    reaching the row target once its final partition lands (greedy
    first-fit semantics — the exact values are oracle-checked; this
    pins the plan's shape as a valid compaction plan)."""
    from rick_and_morty_data_pipeline_project_spark.queries.extraq import (
        _COMPACTION_TARGET_ROWS,
        profile_compaction_plan,
    )
    from tests.conftest import SF_SMALL

    rows = sorted(
        profile_compaction_plan(spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    # group ids are non-decreasing along partition order (contiguity)
    grps = [r["grp"] for r in rows]
    assert grps == sorted(grps), grps
    # group_rows/group_parts are consistent per group
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    for g, members in by_grp.items():
        total = sum(r["n_rows"] for r in members)
        assert all(r["group_rows"] == total for r in members)
        assert all(r["group_parts"] == len(members) for r in members)
    # greedy fill: every group but the last crosses the target once its
    # last member is added (otherwise the next partition would have
    # joined it)
    last_g = max(by_grp)
    for g, members in by_grp.items():
        if g != last_g:
            assert sum(r["n_rows"] for r in members) >= _COMPACTION_TARGET_ROWS - max(
                r["n_rows"] for r in members
            )


def test_observation_metrics_ride_the_write(spark):
    """df.observe() collects audit counters ON the write pass — row
    count and a violation count come back from the SAME job that
    materialized the data, no second scan (the free version of the
    audit_row_constraints pattern for in-pipeline gating)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("load_audit")
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "nonpositive_price"
        ),
        F.max("o_orderkey").alias("max_key"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    want_n = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert got["n_rows"] == want_n
    assert got["nonpositive_price"] == 0
    assert got["max_key"] == want_n - 1  # dense 0-based keys
