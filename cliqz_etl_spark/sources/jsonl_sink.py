"""A JSONL-shard batch SINK as a custom Spark DataSource writer — the
write half of the Python DataSource API (sources/synthetic.py holds the
read half), with the two-phase commit protocol implemented for real:

- ``write(iterator)`` runs PER TASK in the executor: rows stream to a
  shard file under a hidden staging directory, and the task returns a
  commit message carrying (staged file, rows, bytes) — nothing is
  visible to readers yet.
- ``commit(messages)`` runs ON THE DRIVER exactly once, only after
  EVERY task succeeded: staged shards rename into the target directory
  (rename is the atomic unit) and a ``_SUCCESS`` manifest records the
  per-shard accounting. A reader listing the directory therefore sees
  either the complete dataset or nothing.
- ``abort(messages)`` removes the staging directory, so failed or
  speculated jobs leave zero partial output.

This is the same job-commit discipline Spark's built-in file sinks get
from Hadoop committers, expressed in the Python API — the part a naive
custom sink always gets wrong (writing directly to the target, where a
mid-job failure strands half the shards). Like those committers, the
protocol assumes ``path`` is on storage every task AND the driver can
reach (shared FS / NFS / fuse-mounted object store); on executor-local
disks the driver-side rename would not see the staged files.

Usage:
    spark.dataSource.register(JsonlShardDataSource)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource,
                                    DataSourceStreamWriter,
                                    DataSourceWriter,
                                    WriterCommitMessage)


@dataclass
class _ShardCommit(WriterCommitMessage):
    staged: str
    filename: str
    n_rows: int
    n_bytes: int


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")

    def write(self, rows):
        os.makedirs(self.staging, exist_ok=True)
        name = f"shard-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.staging, name)
        n = b = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in rows:
                line = json.dumps(row.asDict(recursive=True),
                                  ensure_ascii=False, default=str)
                f.write(line + "\n")
                n += 1
                b += len(line.encode("utf-8")) + 1
        return _ShardCommit(staged=staged, filename=name, n_rows=n, n_bytes=b)

    def commit(self, messages):
        import shutil

        if self.overwrite:
            for existing in os.listdir(self.path):
                # never touch in-flight staging — ours, a concurrent batch
                # writer's, or the stream writer's epoch staging
                if not existing.startswith((".staging-", ".stream-staging")):
                    target = os.path.join(self.path, existing)
                    if os.path.isdir(target):
                        shutil.rmtree(target)
                    else:
                        os.remove(target)
        manifest = []
        for m in messages:
            os.rename(m.staged, os.path.join(self.path, m.filename))
            manifest.append({"file": m.filename, "rows": m.n_rows,
                             "bytes": m.n_bytes})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"shards": manifest,
                       "total_rows": sum(x["rows"] for x in manifest)}, f)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class JsonlShardDataSource(DataSource):
    """format name: ``jsonl_shards``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlStreamWriter(self.options)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink: same staged-write discipline, with the
    commit unit the MICRO-BATCH (epoch). Shards commit under an
    epoch-tagged name and the per-epoch manifest `_batch-{id}.json`
    records them; a batch REPLAY after a failure (foreach-style sinks are
    at-least-once per epoch) overwrites the same epoch's manifest and its
    shards are re-renamed idempotently — readers that trust manifests see
    exactly-once, readers that glob shards see at-least-once, which is
    the honest contract of every file-based streaming sink without a
    transaction log."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires .option('path', ...)")

    def write(self, rows):
        staging = os.path.join(self.path, ".stream-staging")
        os.makedirs(staging, exist_ok=True)
        name = f"shard-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(staging, name)
        n = b = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in rows:
                line = json.dumps(row.asDict(recursive=True),
                                  ensure_ascii=False, default=str)
                f.write(line + "\n")
                n += 1
                b += len(line.encode("utf-8")) + 1
        return _ShardCommit(staged=staged, filename=name, n_rows=n, n_bytes=b)

    def commit(self, messages, batchId: int) -> None:
        # Shard names carry a fresh uuid per task attempt, so a REPLAYED
        # epoch would otherwise leave the previous attempt's already-
        # renamed batch-{id}-* shards beside the new ones: the manifest
        # is overwritten correctly, but glob-based readers (spark.read
        # .json(dir)) would double-count. Purge the epoch's old shards
        # first so even glob readers see the replay exactly once. Listing
        # + startswith, NOT glob: a sink path containing glob
        # metacharacters ([ ] ? *) would make the pattern silently match
        # nothing and leave the duplicate shards in place.
        prefix = f"batch-{batchId}-"
        for entry in os.listdir(self.path):
            if entry.startswith(prefix):
                os.remove(os.path.join(self.path, entry))
        manifest = []
        for m in messages:
            if m is None:
                continue
            final = f"batch-{batchId}-{m.filename}"
            os.rename(m.staged, os.path.join(self.path, final))
            manifest.append({"file": final, "rows": m.n_rows,
                             "bytes": m.n_bytes})
        with open(os.path.join(self.path, f"_batch-{batchId}.json"), "w") as f:
            json.dump({"batch_id": batchId, "shards": manifest,
                       "rows": sum(x["rows"] for x in manifest)}, f)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, ".stream-staging"),
                      ignore_errors=True)
