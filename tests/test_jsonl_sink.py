"""Python DataSource writer: sharded JSONL export with a manifest
commit protocol — committed exports round-trip and verify; failed
jobs leave no shard and no manifest."""

from __future__ import annotations

import hashlib
import json
import os

import pyspark.sql.functions as F
import pytest

from rick_and_morty_data_pipeline_project_spark.sources.jsonl_sink import (
    MANIFEST,
    JsonlShardDataSource,
    read_manifest,
)
from rick_and_morty_data_pipeline_project_spark.sources.corpus import load_table
from tests.conftest import SF_SMALL


def _register(spark):
    try:
        spark.dataSource.register(JsonlShardDataSource)
    except Exception as e:  # already registered in this session
        if "already" not in str(e).lower():
            raise


def test_jsonl_export_commits_shards_and_manifest(spark, tmp_path):
    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "export")
    os.makedirs(out)
    docs.repartition(4, "doc_id").write.format("jsonl_shards").mode(
        "overwrite"
    ).save(out)

    man = read_manifest(out)
    assert man["n_shards"] == 4
    assert man["total_rows"] == docs.count()
    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert files == sorted(s["shard"] for s in man["shards"])
    assert not os.path.exists(os.path.join(out, "_staging"))

    # per-shard checksums verify, and the export round-trips exactly
    for s in man["shards"]:
        with open(os.path.join(out, s["shard"]), "rb") as f:
            blob = f.read()
        assert hashlib.md5(blob).hexdigest() == s["md5"]
        assert blob.count(b"\n") == s["n_rows"]
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    got = {r["doc_id"]: (r["source"], r["text"]) for r in back.collect()}
    want = {r["doc_id"]: (r["source"], r["text"]) for r in docs.collect()}
    assert got == want


def test_jsonl_export_failed_job_leaves_no_artifacts(spark, tmp_path):
    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")

    @F.udf("string")
    def boom(doc_id):
        if doc_id is not None:
            raise ValueError("injected failure")
        return ""

    out = str(tmp_path / "export_fail")
    os.makedirs(out)
    with pytest.raises(Exception):
        docs.withColumn("text", boom("doc_id")).repartition(3).write.format(
            "jsonl_shards"
        ).save(out)
    # abort contract: no manifest, no final shard, staging swept
    assert not os.path.exists(os.path.join(out, MANIFEST))
    assert [f for f in os.listdir(out) if f.endswith(".jsonl")] == []


def test_jsonl_overwrite_replaces_previous_export(spark, tmp_path):
    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = str(tmp_path / "export_ow")
    os.makedirs(out)
    docs.repartition(5).write.format("jsonl_shards").mode("overwrite").save(
        out
    )
    docs.limit(7).repartition(2).write.format("jsonl_shards").mode(
        "overwrite"
    ).save(out)
    man = read_manifest(out)
    assert man["n_shards"] == 2 and man["total_rows"] == 7
    assert (
        len([f for f in os.listdir(out) if f.endswith(".jsonl")]) == 2
    )  # the 5 old shards are gone


def test_jsonl_stream_writer_per_batch_manifests(spark, tmp_path):
    """Streaming quadrant: three micro-batches each commit
    batch-stamped shards + their own manifest; the combined manifest
    view equals the full input; a replayed commit is a no-op."""
    from rick_and_morty_data_pipeline_project_spark.sources.jsonl_sink import (
        read_stream_manifests,
    )

    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(in_dir / f"chunk_{i}.parquet")
        )
    out = str(tmp_path / "stream_export")
    os.makedirs(out)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*/")
        .writeStream.format("jsonl_shards")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    view = read_stream_manifests(out)
    assert view["n_batches"] == 3
    assert view["total_rows"] == docs.count()
    on_disk = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert on_disk == sorted(view["shards"])  # no orphan shards
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }


def test_jsonl_stream_commit_is_replay_idempotent(spark, tmp_path):
    """Driving commit() twice with the same batch id (the
    at-least-once replay) must not duplicate shards, double-count the
    manifest, or fail on the already-promoted temp."""
    from rick_and_morty_data_pipeline_project_spark.sources.jsonl_sink import (
        JsonlShardStreamWriter,
        ShardCommit,
        read_stream_manifests,
    )
    from pyspark.sql import types as T

    out = str(tmp_path / "replay")
    os.makedirs(out)
    schema = T.StructType([T.StructField("x", T.LongType())])
    w = JsonlShardStreamWriter({"path": out}, schema)
    staging = os.path.join(out, "_staging")

    def mk_temp(name, payload):
        with open(os.path.join(staging, name), "wb") as f:
            f.write(payload)

    payload = b'{"x": 1}\n'
    mk_temp("attempt-a.jsonl.tmp", payload)
    msg = ShardCommit(
        tmp_name="attempt-a.jsonl.tmp",
        final_name="shard-00000.jsonl",
        n_rows=1,
        md5=hashlib.md5(payload).hexdigest(),
    )
    w.commit([msg], batchId=0)
    # replay: same batch id, fresh attempt temp (real replays re-run
    # write), must change nothing
    mk_temp("attempt-b.jsonl.tmp", payload)
    replay = ShardCommit(
        tmp_name="attempt-b.jsonl.tmp",
        final_name="shard-00000.jsonl",
        n_rows=1,
        md5=msg.md5,
    )
    w.commit([replay], batchId=0)

    view = read_stream_manifests(out)
    assert view["total_rows"] == 1 and view["n_batches"] == 1
    shards = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert shards == ["batch-000000-shard-00000.jsonl"]
    assert os.listdir(staging) == []  # replay temp swept


def test_jsonl_failed_overwrite_preserves_previous_export(spark, tmp_path):
    """Overwrite deletion happens inside commit(), after every task
    succeeded — a failed overwrite job must leave the prior committed
    export fully readable."""
    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = str(tmp_path / "export_keep")
    os.makedirs(out)
    docs.repartition(3).write.format("jsonl_shards").mode("overwrite").save(
        out
    )
    first = read_manifest(out)

    @F.udf("long")
    def boom(doc_id):
        raise ValueError("injected failure")

    with pytest.raises(Exception):
        docs.withColumn("doc_id", boom("doc_id")).write.format(
            "jsonl_shards"
        ).mode("overwrite").save(out)
    # the old export is byte-for-byte still there
    assert read_manifest(out) == first
    assert sorted(
        f for f in os.listdir(out) if f.endswith(".jsonl")
    ) == sorted(s["shard"] for s in first["shards"])


def test_jsonl_stream_commit_sweeps_loser_attempts(spark, tmp_path):
    """A loser-attempt temp (speculation/crashed task of THIS batch)
    is swept by the batch's commit, and a crash-leftover manifest temp
    can never be mistaken for a committed manifest."""
    from rick_and_morty_data_pipeline_project_spark.sources.jsonl_sink import (
        JsonlShardStreamWriter,
        ShardCommit,
        read_stream_manifests,
    )
    from pyspark.sql import types as T

    out = str(tmp_path / "sweep")
    os.makedirs(out)
    w = JsonlShardStreamWriter(
        {"path": out}, T.StructType([T.StructField("x", T.LongType())])
    )
    staging = os.path.join(out, "_staging")
    payload = b'{"x": 1}\n'
    for name in ("attempt-winner.jsonl.tmp", "attempt-loser.jsonl.tmp"):
        with open(os.path.join(staging, name), "wb") as f:
            f.write(payload)
    # a crash between json.dump and os.replace of a PREVIOUS attempt
    with open(os.path.join(out, "_MANIFEST-000009.tmp"), "w") as f:
        f.write("{ half written")

    msg = ShardCommit(
        tmp_name="attempt-winner.jsonl.tmp",
        final_name="shard-00000.jsonl",
        n_rows=1,
        md5=hashlib.md5(payload).hexdigest(),
    )
    w.commit([msg], batchId=0)
    assert os.listdir(staging) == []  # loser swept with the commit
    view = read_stream_manifests(out)  # stray .tmp never parsed
    assert view["n_batches"] == 1 and view["total_rows"] == 1


def test_jsonl_batch_overwrite_refuses_streaming_directory(spark, tmp_path):
    """A batch overwrite into a directory holding streaming manifests
    must refuse (r08 advisory): a blanket *.jsonl sweep would delete
    ``batch-NNNNNN-shard-*.jsonl`` shards while leaving their
    ``_MANIFEST-NNNNNN`` sidecars — readers would then report shards
    that no longer exist.  And the scoped sweep never touches
    stream-named shards even when no stream manifest is present."""
    _register(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = str(tmp_path / "mixed")
    os.makedirs(out)
    # simulate a committed streaming batch in the same directory
    with open(os.path.join(out, "batch-000000-shard-00000.jsonl"), "w") as f:
        f.write('{"doc_id": 1}\n')
    with open(os.path.join(out, "_MANIFEST-000000"), "w") as f:
        f.write(
            '{"batch_id": 0, "shards": [{"shard": '
            '"batch-000000-shard-00000.jsonl", "n_rows": 1, "md5": "x"}], '
            '"total_rows": 1, "n_shards": 1}'
        )
    with pytest.raises(Exception, match="streaming manifests"):
        docs.write.format("jsonl_shards").mode("overwrite").save(out)
    # the streaming artifacts survived the refused overwrite
    assert os.path.exists(os.path.join(out, "batch-000000-shard-00000.jsonl"))
    assert os.path.exists(os.path.join(out, "_MANIFEST-000000"))

    # a stream-NAMED shard without its manifest (orphan) is also not
    # swept: the scoped pattern only matches shard-NNNNN.jsonl
    out2 = str(tmp_path / "orphan")
    os.makedirs(out2)
    orphan = os.path.join(out2, "batch-000001-shard-00000.jsonl")
    with open(orphan, "w") as f:
        f.write('{"doc_id": 2}\n')
    docs.repartition(2).write.format("jsonl_shards").mode(
        "overwrite"
    ).save(out2)
    assert os.path.exists(orphan)
    m = read_manifest(out2)
    assert m["n_shards"] == 2


def test_read_stream_manifests_orders_numerically_past_1e6(tmp_path):
    """Regression (r10 advisory): the manifest regex admits batch ids
    past 10^6 where '{:06d}' stops zero-padding, and '-1000000' sorts
    LEXICOGRAPHICALLY before '-999999' — the shard list must be ordered
    by the numeric batch id."""
    import json

    from rick_and_morty_data_pipeline_project_spark.sources.jsonl_sink import (
        read_stream_manifests,
    )

    out = str(tmp_path)
    for bid in (999999, 1000000, 7):
        man = {
            "batch_id": bid,
            "shards": [{"shard": f"shard-{bid}.jsonl", "n_rows": 1}],
            "total_rows": 1,
            "n_shards": 1,
        }
        with open(f"{out}/_MANIFEST-{bid:06d}", "w") as f:
            json.dump(man, f)

    view = read_stream_manifests(out)
    assert view["n_batches"] == 3
    assert view["shards"] == [
        "shard-7.jsonl",
        "shard-999999.jsonl",
        "shard-1000000.jsonl",
    ]
