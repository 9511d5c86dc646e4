"""Versioned table as a STREAMING SOURCE (round 9) — the read-side
twin of `streaming/versioned_sink.py`, completing Delta's
streaming-source parity: a Structured Streaming query subscribes to
an append-only versioned table and receives each committed version's
new rows exactly once.

    spark.dataSource.register(VersionedTableStreamSource)
    s = (spark.readStream.format("versioned_table")
         .option("path", "/data/tables/events").load())

Why this composes correctly:

- OFFSETS ARE VERSION NUMBERS: ``{"version": N}`` means "versions
  <= N consumed". Manifests are immutable once committed, so
  ``partitions(start, end)`` is deterministic — the replay contract
  Structured Streaming requires — and exactly-once composes from
  these offsets plus any idempotent sink (including the versioned
  sink itself, giving table-to-table incremental pipelines).
- PARTITIONED READS: each appended data FILE becomes one
  InputPartition, so a micro-batch's rows are read executor-parallel
  (this is the full ``DataSourceStreamReader`` API, not the
  driver-side Simple reader — a version's append may be arbitrarily
  large).
- APPEND-ONLY CONTRACT: a version that rewrites history
  (overwrite/delete/merge/optimize) raises — same stance as Delta's
  streaming source without ignoreChanges; ``op=analyze`` versions are
  metadata-only and skipped. `operators/cdf.table_changes` is the
  batch path for rewritten ranges.
- SCHEMA comes from the latest manifest's recorded schema (write-path
  schema evolution records it per version); pre-evolution files
  null-fill the missing columns at read, mirroring `read_table`'s
  mergeSchema semantics.

The log is read with plain-Python filesystem IO because DataSource
code runs in Python workers without a JVM session — local-FS paths
(and ``file:`` URIs) only in this environment, the same documented
boundary as the footer-stats reader.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_LOG_DIR = "_log"


def _local(path: str) -> str:
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path if parsed.scheme else path
    raise NotImplementedError(
        f"versioned_table streaming source is local-FS-only here: {path}"
    )


def _py_list_versions(table_path: str) -> list[int]:
    log = os.path.join(_local(table_path), _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        stem = name[: -len(".json")]
        if name.endswith(".json") and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _py_read_manifest(table_path: str, version: int) -> dict:
    p = os.path.join(_local(table_path), _LOG_DIR, f"{version:08d}.json")
    with open(p) as f:
        return json.load(f)


def _py_resolve_files(table_path: str, version: int) -> list[str]:
    """Python twin of `sources/versioned._resolve_files` (the
    DataSource runs in workers without a JVM session): a version's
    full file list via the checkpoint-or-full-manifest walk, local
    paths."""
    adds: list[str] = []
    v = version
    while True:
        ckpt = os.path.join(_local(table_path), _LOG_DIR, f"_ckpt-{v:08d}.json")
        if os.path.exists(ckpt):
            with open(ckpt) as f:
                return sorted({_local(p) for p in json.load(f)["files"]}.union(adds))
        m = _py_read_manifest(table_path, v)
        if "files" in m:
            return sorted({_local(p) for p in m["files"]}.union(adds))
        adds.extend(_local(p) for p in m["add"])
        v = m["parent"]


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]) -> None:
        self.path = path
        self.columns = columns


class VersionedTableStreamSource(DataSource):
    """``format("versioned_table")``: incremental appends as a stream."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self):
        from pyspark.sql.types import StructType

        path = self.options.get("path")
        if not path:
            raise ValueError("versioned_table needs option 'path'")
        versions = _py_list_versions(path)
        if not versions:
            raise ValueError(f"not a versioned table (no log): {path}")
        m = _py_read_manifest(path, versions[-1])
        if "schema" not in m:
            raise ValueError(
                "latest manifest records no schema (pre-r9 table) — pass an "
                "explicit .schema(...)"
            )
        return StructType.fromJson(json.loads(m["schema"]))

    def streamReader(self, schema) -> "VersionedTableStreamReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("versioned_table needs option 'path'")
        starting = self.options.get("startingVersion", "-1")
        return VersionedTableStreamReader(path, schema, int(starting))


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema, starting_version: int) -> None:
        self._path = table_path
        self._schema = schema
        self._start = starting_version

    def initialOffset(self) -> dict:
        # versions <= startingVersion are considered already consumed;
        # the default -1 streams the table's entire history first
        return {"version": self._start}

    def latestOffset(self) -> dict:
        versions = _py_list_versions(self._path)
        return {"version": versions[-1] if versions else self._start}

    def partitions(self, start: dict, end: dict) -> list[_FilePartition]:
        cols = [f.name for f in self._schema.fields]
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m = _py_read_manifest(self._path, v)
            if m["op"] == "analyze":
                continue  # metadata-only
            if m["op"] == "create":
                files = m["files"]
            elif m["op"] == "append":
                if "add" in m:
                    files = m["add"]
                else:
                    # pre-round-9 append manifest: full "files" list,
                    # no "add" — recover the added set as a local-path
                    # diff against the parent snapshot (round-10
                    # advisory fix, same contract as cdf.table_appends)
                    parent = set(_py_resolve_files(self._path, v - 1))
                    files = [
                        f for f in _py_resolve_files(self._path, v)
                        if f not in parent
                    ]
            else:
                raise ValueError(
                    f"version {v} is op={m['op']!r} — the streaming source "
                    "consumes append-only tables (use operators/cdf."
                    "table_changes for rewritten ranges)"
                )
            parts.extend(_FilePartition(_local(f), cols) for f in files)
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        file_cols = set(pf.schema_arrow.names)
        # read ONLY the declared columns the file actually has (column
        # pruning at the parquet reader, not after materialization)
        wanted = [c for c in partition.columns if c in file_cols]
        table = pf.read(columns=wanted)
        rows = table.to_pylist()
        for r in rows:
            # null-fill pre-evolution files' missing columns, declared order
            yield tuple(r.get(c) for c in partition.columns)

    def commit(self, end: dict) -> None:
        pass  # offsets are derived from the immutable log; nothing to ack
