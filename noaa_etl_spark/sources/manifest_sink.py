"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
manifest-committed JSONL sink — the write-side twin of the custom
reader in :mod:`noaa_etl_spark.sources.synthetic`.

This demonstrates the engine's extension point for sinks Spark lacks
(internal services, bespoke formats) with the commit protocol a
production sink needs at scale:

- ``write()`` runs ON EXECUTORS, one task per partition: each task
  streams its rows to a uniquely-named part file under ``<path>/data/``
  and returns a :class:`WriterCommitMessage` naming the file. No driver
  funnel — write bandwidth scales with the cluster.
- ``commit()`` runs on the driver only after EVERY task succeeded: it
  records the batch's part files in ``<path>/_manifest/<id>.json``,
  written tmp-then-rename so the manifest appears atomically. Readers
  list manifests, never the data directory, so half-written batches are
  invisible (the same reader-side contract as parquet's _SUCCESS /
  Delta's transaction log).
- ``abort()`` deletes the orphan part files of the failed batch.
- Streaming ``commit(messages, batchId)`` is IDEMPOTENT by batchId: if
  the manifest for ``batchId`` already exists (a restarted query
  replaying its last uncommitted-at-the-sink micro-batch), the new part
  files are discarded and the original manifest stands — exactly-once
  output on top of Structured Streaming's at-least-once replay.

Payload format is JSON-lines for inspectability; the contract under
test is the commit protocol, not the byte format (a real deployment
would emit parquet/Arrow part files through the same protocol).

Register + use::

    spark.dataSource.register(ManifestSinkDataSource)
    df.write.format("manifest_sink").option("path", p).mode("append").save()
    df.writeStream.format("manifest_sink").option("path", p)...start()
    read_manifest_sink(spark, p, schema)   # only committed files
"""

from __future__ import annotations

import json
import os
import uuid
import time
from dataclasses import dataclass

try:  # Spark 4+ only; the engine degrades gracefully without it.
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    _HAS_WRITER_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore
    DataSourceArrowWriter = object  # type: ignore
    DataSourceStreamWriter = object  # type: ignore
    DataSourceWriter = object  # type: ignore
    WriterCommitMessage = object  # type: ignore
    _HAS_WRITER_API = False


@dataclass
class _PartFileMessage(WriterCommitMessage):
    file: str | None  # None: the task saw zero rows (no file written)
    rows: int


def _write_part(path: str, iterator) -> "_PartFileMessage":
    """Executor-side: stream one partition to one uniquely-named part
    file. Runs concurrently across the cluster; uuid names make tasks
    collision-free without coordination."""
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _PartFileMessage(file=fname, rows=n)


def _commit_manifest(path: str, manifest_id: str, messages, fmt: str = "jsonl") -> bool:
    """Driver-side: atomically publish the batch's file list. Returns
    False (and discards the new files) if ``manifest_id`` was already
    committed — the idempotent-replay case."""
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{manifest_id}.json")
    files = [m.file for m in messages if m is not None and m.file is not None]
    if os.path.exists(final):  # replayed batch: keep the original commit
        for f in files:
            if os.path.exists(f):
                os.remove(f)
        return False
    existing = [f for f in os.listdir(mdir) if f.endswith(".json")]
    payload = {
        "format": fmt,
        "files": [os.path.basename(f) for f in files],
        "rows": sum(m.rows for m in messages if m is not None),
        # Monotonic commit sequence (single committer — the driver) so
        # snapshot reads have a total order even though batch manifest
        # ids are uuids. Wall time is informational only.
        "seq": len(existing),
        "committed_at": time.time(),
    }
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.rename(tmp, final)  # atomic within a filesystem
    return True


def _abort_files(messages) -> None:
    for m in messages:
        if m is not None and m.file is not None and os.path.exists(m.file):
            os.remove(m.file)


class ManifestBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = bool(overwrite)

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages):
        if self.overwrite:  # publish under a fresh epoch, drop old manifests
            mdir = os.path.join(self.path, "_manifest")
            if os.path.isdir(mdir):
                for f in os.listdir(mdir):
                    os.remove(os.path.join(mdir, f))
        _commit_manifest(self.path, f"batch-{uuid.uuid4().hex}", messages)

    def abort(self, messages):
        _abort_files(messages)


class ManifestArrowWriter(DataSourceArrowWriter):
    """Arrow fast path for the same manifest protocol: ``write`` receives
    PyArrow RecordBatches (zero per-row Python objects — the batches
    stream JVM→Python over Arrow IPC) and appends them to a PARQUET part
    file. This is the scale-path writer: row-at-a-time JSONL costs a
    Python object + dict + dumps per row, the Arrow path a columnar
    copy per batch (measured 2.1× end-to-end at 2M narrow rows,
    SCALING.md — the gap widens with payload width). Commit / abort /
    replay semantics are shared with the row writer."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = bool(overwrite)

    def write(self, iterator):
        import pyarrow.parquet as pq

        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.parquet")
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(fname, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is None:  # empty partition: nothing to publish
            return _PartFileMessage(file=None, rows=0)
        writer.close()
        return _PartFileMessage(file=fname, rows=n)

    def commit(self, messages):
        if self.overwrite:
            mdir = os.path.join(self.path, "_manifest")
            if os.path.isdir(mdir):
                for f in os.listdir(mdir):
                    os.remove(os.path.join(mdir, f))
        _commit_manifest(self.path, f"batch-{uuid.uuid4().hex}", messages, fmt="parquet")

    def abort(self, messages):
        _abort_files(messages)


class ManifestStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId: int):
        # Keyed by batchId ⇒ a restarted query re-emitting the same
        # micro-batch commits exactly once (see module docstring).
        _commit_manifest(self.path, f"{batchId:020d}", messages)

    def abort(self, messages, batchId: int):
        _abort_files(messages)


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "manifest_sink"

    def schema(self):  # write-only source; schema comes from the frame
        return "placeholder string"

    def writer(self, schema, overwrite: bool):
        if "path" not in self.options:
            raise ValueError("manifest_sink requires option 'path'")
        if self.options.get("use_arrow", "false").lower() == "true":
            return ManifestArrowWriter(self.options, overwrite)
        return ManifestBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        if "path" not in self.options:
            raise ValueError("manifest_sink requires option 'path'")
        return ManifestStreamWriter(self.options)


def snapshots(path: str) -> list[dict]:
    """Commit history, oldest first: one dict per manifest with
    ``id`` (filename stem), ``seq``, ``rows``, ``files``, ``format``.
    Ordered by the commit sequence stamped at commit time (filename
    order as tiebreak/fallback for pre-seq manifests)."""
    mdir = os.path.join(path, "_manifest")
    if not os.path.isdir(mdir):
        return []
    entries = []
    for mf in sorted(os.listdir(mdir)):
        if not mf.endswith(".json"):
            continue
        with open(os.path.join(mdir, mf)) as fh:
            payload = json.load(fh)
        entries.append(
            {
                "id": mf[: -len(".json")],
                "seq": payload.get("seq", -1),
                "rows": payload.get("rows", 0),
                "files": payload["files"],
                "format": payload.get("format", "jsonl"),
            }
        )
    entries.sort(key=lambda e: (e["seq"], e["id"]))
    return entries


def _snapshot_prefix(path: str, as_of: str | None) -> list[dict]:
    entries = snapshots(path)
    if as_of is None:
        return entries
    ids = [e["id"] for e in entries]
    if as_of not in ids:
        raise ValueError(f"unknown manifest id {as_of!r}; have {ids}")
    return entries[: ids.index(as_of) + 1]


def committed_files(path: str, as_of: str | None = None) -> list[str]:
    """Part files named by committed manifests, in commit order.
    Orphans in data/ (aborted or not-yet-committed batches) are
    invisible — this is the reader half of the exactly-once contract.
    ``as_of`` restricts to the snapshot up to that manifest id
    (inclusive) — time travel over append history."""
    return [
        os.path.join(path, "data", f)
        for e in _snapshot_prefix(path, as_of)
        for f in e["files"]
    ]


def _committed_by_format(path: str, as_of: str | None = None) -> dict[str, list[str]]:
    """Committed files grouped by the format each manifest declares
    (manifests written before the Arrow writer existed carry no format
    key → jsonl)."""
    groups: dict[str, list[str]] = {}
    for e in _snapshot_prefix(path, as_of):
        groups.setdefault(e["format"], []).extend(
            os.path.join(path, "data", f) for f in e["files"]
        )
    return groups


def read_manifest_sink(spark, path: str, schema, as_of: str | None = None):
    """Read back ONLY committed data (all formats present, unioned).
    Empty-manifest case returns an empty frame with the requested
    schema. ``as_of`` reads the snapshot as of that manifest id —
    overwrite epochs drop earlier manifests, so travel spans the
    current epoch's append history."""
    groups = _committed_by_format(path, as_of)
    out = None
    for fmt, files in groups.items():
        if not files:
            continue
        if fmt == "parquet":
            part = spark.read.schema(schema).parquet(*files)
        else:
            part = spark.read.schema(schema).json(files)
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame([], schema)
    return out


def vacuum(path: str, grace_seconds: float = 3600.0) -> dict:
    """Delete orphan data files — present in data/ but referenced by no
    committed manifest — older than ``grace_seconds``.

    Orphans accumulate from aborted batches whose executor died before
    the driver's abort() could clean up, and from crashes between part
    writes and manifest commit. Readers never see them (committed_files
    is the read surface), so vacuum is pure storage reclamation and is
    safe to run concurrently with readers. The grace period is what
    makes it safe under concurrent WRITERS too: a part file younger
    than the grace window may belong to a batch whose manifest simply
    hasn't committed yet, so it is left alone — mirror of the
    VACUUM-retention rule every manifest-based table format ships.

    Returns {"deleted": [...], "kept_recent": n, "committed": n}.
    """
    ddir = os.path.join(path, "data")
    if not os.path.isdir(ddir):
        return {"deleted": [], "kept_recent": 0, "committed": 0}
    committed = {os.path.basename(f) for f in committed_files(path)}
    now = time.time()
    deleted: list[str] = []
    kept_recent = 0
    for name in os.listdir(ddir):
        full = os.path.join(ddir, name)
        if not os.path.isfile(full) or name in committed:
            continue
        if now - os.path.getmtime(full) < grace_seconds:
            kept_recent += 1
            continue
        os.remove(full)
        deleted.append(name)
    return {
        "deleted": sorted(deleted),
        "kept_recent": kept_recent,
        "committed": len(committed),
    }
