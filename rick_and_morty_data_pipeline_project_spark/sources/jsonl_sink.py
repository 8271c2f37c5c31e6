"""Spark 4 Python DataSource WRITER: sharded-JSONL corpus export.

Completes the engine's Python DataSource surface — batch reader
(restapi_datasource.py) and streaming reader (restapi_stream.py)
already exist; this is the write side, the training-data export shape:
``df.write.format("jsonl_shards").mode("overwrite").save(dir)``
produces one canonical-JSON shard per partition plus a ``_MANIFEST``
with per-shard row counts and md5 checksums — what a downstream
tokenizer/loader consumes to verify and schedule shards.

The interesting part is the COMMIT PROTOCOL, the Hadoop
FileOutputCommitter idea re-expressed in the Python DataSource API:

* each task writes to a UNIQUE temp name under ``_staging/`` and
  returns a :class:`WriterCommitMessage` naming (temp, final, rows,
  md5) — a speculative or retried attempt leaves a second temp file
  but only the attempt whose message reaches the driver is promoted;
* ``commit()`` (driver, runs only if ALL tasks succeeded) promotes
  temp → final via rename, removes the staging dir (sweeping loser
  attempts), and lands ``_MANIFEST`` LAST via write-temp + rename —
  a reader that requires the manifest therefore never observes a
  partial export;
* ``abort()`` (driver, any task failed) removes the staging dir; no
  final shard or manifest ever appears.

Scale: one shard per upstream partition, no driver data movement —
the driver handles only commit messages (one tiny tuple per task).
Shard sizing is the caller's ``repartition(n)``/coarsening choice.
This exemplar targets a filesystem all tasks share (local/NFS in this
container; object stores would swap the ``os`` calls for their
client).  A vectorized variant would subclass
``DataSourceArrowWriter`` and stream RecordBatches; the protocol is
identical.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST"
STAGING = "_staging"


@dataclass
class ShardCommit(WriterCommitMessage):
    tmp_name: str
    final_name: str
    n_rows: int
    md5: str


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards: save(path) is required")
        self.columns = list(schema.fieldNames())
        self.overwrite = overwrite
        os.makedirs(os.path.join(self.path, STAGING), exist_ok=True)

    # -- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp_name = f"attempt-{pid:05d}-{uuid.uuid4().hex}.jsonl.tmp"
        tmp = os.path.join(self.path, STAGING, tmp_name)
        digest = hashlib.md5()
        n = 0
        with open(tmp, "wb") as out:
            for row in iterator:
                line = (
                    json.dumps(
                        {c: row[c] for c in self.columns},
                        sort_keys=True,
                        default=str,
                    )
                    + "\n"
                ).encode("utf-8")
                out.write(line)
                digest.update(line)
                n += 1
        return ShardCommit(
            tmp_name=tmp_name,
            final_name=f"shard-{pid:05d}.jsonl",
            n_rows=n,
            md5=digest.hexdigest(),
        )

    # -- driver side ----------------------------------------------------
    def commit(self, messages: List[Optional[ShardCommit]]) -> None:
        # overwrite semantics live HERE, after every task succeeded —
        # a failed job must leave the previous committed export
        # untouched (deleting in __init__ would destroy it before the
        # first task even ran).  Order: old manifest first (readers
        # now honestly see "uncommitted"), old shards, promote, new
        # manifest LAST — a crash at any point leaves either the old
        # export intact or a manifest-less (= uncommitted) directory,
        # never a manifest describing mixed generations.
        if self.overwrite:
            # The sweep is scoped to the BATCH naming pattern
            # (``shard-*.jsonl``): streaming shards are
            # ``batch-NNNNNN-shard-*.jsonl`` with their own
            # ``_MANIFEST-NNNNNN`` sidecars, and a blanket *.jsonl
            # delete would orphan those manifests — readers would then
            # report shards that no longer exist (r08 advisory).
            # Sharing one directory between the two quadrants is a
            # layout error; refuse loudly rather than half-delete.
            stream_manifests = [
                f
                for f in os.listdir(self.path)
                if re.fullmatch(MANIFEST + r"-\d{6,}", f)
            ]
            if stream_manifests:
                raise IOError(
                    "jsonl_shards overwrite: directory contains "
                    f"streaming manifests ({stream_manifests[:3]}…); "
                    "batch overwrite into a streaming sink directory "
                    "would orphan them — use a separate path"
                )
            old_manifest = os.path.join(self.path, MANIFEST)
            if os.path.exists(old_manifest):
                os.remove(old_manifest)
            for f in os.listdir(self.path):
                if re.fullmatch(r"shard-\d{5,}\.jsonl", f):
                    os.remove(os.path.join(self.path, f))
        shards = []
        for m in messages:
            if m is None:  # contract: only on failure, but stay safe
                raise IOError("jsonl_shards: missing commit message")
            os.replace(
                os.path.join(self.path, STAGING, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
            shards.append(
                {"shard": m.final_name, "n_rows": m.n_rows, "md5": m.md5}
            )
        # sweep loser attempts (speculation/retries), then the manifest
        # lands LAST, atomically — its presence certifies completeness
        staging = os.path.join(self.path, STAGING)
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)
        manifest = {
            "shards": sorted(shards, key=lambda s: s["shard"]),
            "total_rows": sum(s["n_rows"] for s in shards),
            "n_shards": len(shards),
        }
        tmp = os.path.join(self.path, MANIFEST + ".tmp")
        with open(tmp, "w", encoding="utf-8") as out:
            json.dump(manifest, out, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages: List[Optional[ShardCommit]]) -> None:
        staging = os.path.join(self.path, STAGING)
        if os.path.isdir(staging):
            for leftover in os.listdir(staging):
                os.remove(os.path.join(staging, leftover))
            os.rmdir(staging)


class JsonlShardStreamWriter(DataSourceStreamWriter):
    """The STREAMING quadrant of the same sink: each micro-batch
    exports batch-id-stamped shards (``batch-{id:06d}-shard-{pid:05d}
    .jsonl``) plus its own ``_MANIFEST-{id:06d}``, landing LAST and
    atomically.  The batch id is only known driver-side, so tasks
    write anonymous staging temps and ``commit(messages, batchId)``
    stamps the final names.  Replay safety (the at-least-once
    foreachBatch/streaming-sink contract): a replayed batch's commit
    sees its manifest already present and no-ops — the same
    batch-id-inside-the-atomic-unit idea as ``streaming/_durable``.
    Readers consume only shards named in manifests, so an uncommitted
    batch is invisible."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards: option('path', …) is required")
        self.columns = list(schema.fieldNames())
        os.makedirs(os.path.join(self.path, STAGING), exist_ok=True)

    write = JsonlShardWriter.write  # same staging-temp task protocol

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.path, f"{MANIFEST}-{batch_id:06d}")

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        staging = os.path.join(self.path, STAGING)
        if os.path.exists(self._manifest_path(batchId)):
            # at-least-once replay of a committed batch: sweep this
            # attempt's temps, change nothing else
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(staging, m.tmp_name))
                    except FileNotFoundError:
                        pass
            return
        shards = []
        for m in messages:
            if m is None:
                raise IOError("jsonl_shards: missing commit message")
            # m.final_name carries the task's own partition id — never
            # trust the list position (collection order is not a
            # contract)
            final = f"batch-{batchId:06d}-{m.final_name}"
            os.replace(
                os.path.join(staging, m.tmp_name),
                os.path.join(self.path, final),
            )
            shards.append({"shard": final, "n_rows": m.n_rows, "md5": m.md5})
        # loser attempts (speculation, retries that lost the commit
        # race, crashed tasks that never produced a message) leave
        # temps no message names — sweep them now, batches are
        # sequential so nothing else can own a staging temp here
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        manifest = {
            "batch_id": batchId,
            "shards": shards,
            "total_rows": sum(s["n_rows"] for s in shards),
            "n_shards": len(shards),
        }
        # the temp lives in _staging so no manifest reader can ever
        # glob a half-written file or a crash leftover
        tmp = os.path.join(staging, f"manifest-{batchId:06d}.tmp")
        with open(tmp, "w", encoding="utf-8") as out:
            json.dump(manifest, out, sort_keys=True)
        os.replace(tmp, self._manifest_path(batchId))

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        staging = os.path.join(self.path, STAGING)
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(staging, m.tmp_name))
                except FileNotFoundError:
                    pass


def read_stream_manifests(path: str) -> dict:
    """Combined view over every committed micro-batch: total rows and
    the ordered shard list.  Shards without a manifest do not exist as
    far as a reader is concerned.  Only exact ``_MANIFEST-{digits}``
    names count (``{:06d}`` zero-pads to AT LEAST six — batch ids past
    10^6 grow wider, so the width is a floor, not a cap) — temps and
    strays never match."""
    import re

    pat = re.compile(rf"^{MANIFEST}-\d{{6,}}$")
    # sort by the NUMERIC batch id, not lexicographically: the regex
    # admits ids past 10^6 (the {:06d} pad is a floor), and at that
    # boundary "-1000000" sorts lexicographically before "-999999"
    batches = sorted(
        (f for f in os.listdir(path) if pat.match(f)),
        key=lambda f: int(f.rsplit("-", 1)[1]),
    )
    shards, total = [], 0
    for b in batches:
        with open(os.path.join(path, b), encoding="utf-8") as f:
            man = json.load(f)
        shards += [s["shard"] for s in man["shards"]]
        total += man["total_rows"]
    return {"n_batches": len(batches), "total_rows": total, "shards": shards}


class JsonlShardDataSource(DataSource):
    """``spark.dataSource.register(JsonlShardDataSource)`` then
    ``df.write.format("jsonl_shards").save(dir)`` (batch) or
    ``df.writeStream.format("jsonl_shards").option("path", dir)``
    (streaming, exactly-once per batch via manifest idempotence)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options, schema, overwrite)

    def streamWriter(  # noqa: N802 — Spark API name
        self, schema: StructType, overwrite: bool
    ) -> JsonlShardStreamWriter:
        return JsonlShardStreamWriter(self.options, schema)


def read_manifest(path: str) -> dict:
    """The reader half of the contract: parse ``_MANIFEST`` (raises if
    the export never committed)."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        return json.load(f)
