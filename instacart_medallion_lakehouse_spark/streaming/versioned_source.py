"""Structured Streaming SOURCE over versioned tables — the Delta
"streaming table read" contract on the plain-parquet manifest store,
built on Spark 4's Python DataSource API.

``stream_to_versioned`` made versioned tables a streaming SINK; this
module closes the loop so a versioned table is also a streaming
SOURCE, which is what chains pipelines together (bronze drain →
versioned silver → THIS → gold aggregation) without Kafka in between:

    spark.dataSource.register(VersionedStreamDataSource)
    df = (spark.readStream.format("versioned")
          .option("path", root)
          .load())

Offsets are COMMITTED VERSION NUMBERS — exactly Delta's streaming
model, where the reservoir version is the offset. A micro-batch covers
versions (start, end]; each version's contribution is the set of data
dirs its manifest ADDED over its parent (manifest-level appends record
exactly the new batch dir), one InputPartition per added dir, read on
EXECUTORS via pyarrow and yielded as Arrow record batches — the driver
never touches row data, and a drain's parallelism is the number of
newly-committed dirs.

Snapshot REWRITES (write_versioned over an existing table, upsert,
compaction) do not append — their manifest drops the parent's dirs.
Delta raises on such commits unless told otherwise; same here:

- ``on_rewrite=error`` (default): loud failure naming the version.
- ``on_rewrite=skip``: emit nothing for rewrite versions. This is the
  right setting when the only rewrites are ``compact_versioned``
  maintenance (same rows, new layout — re-emitting would duplicate).

Schema is pinned at stream start from the latest manifest (evolution
mid-stream follows the usual Structured Streaming rule: restart to
pick up new columns); constituent dirs missing a pinned column yield
typed NULLs, Hive-partitioned dirs recover their partition columns.
The format also supports BATCH reads (``spark.read.format(...)``) of
the latest version for symmetry, though ``read_versioned`` (a native
parquet scan) is the better batch path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..versioned import _manifest_dirs, _manifest_path, list_versions


class _DirPartition(InputPartition):
    def __init__(self, path: str, schema_json: str):
        self.path = path
        self.schema_json = schema_json


def _read_dir_as_arrow(partition: _DirPartition):
    """Executor-side: scan one data dir with pyarrow, align to the
    pinned schema (missing columns -> typed NULLs, Hive partition
    columns cast to their recorded types), yield Arrow batches."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(
        StructType.fromJson(json.loads(partition.schema_json))
    )
    dset = pads.dataset(partition.path, format="parquet", partitioning="hive")
    tbl = dset.to_table()
    cols = []
    for field in target:
        if field.name in tbl.column_names:
            cols.append(tbl[field.name].cast(field.type))
        else:
            cols.append(pa.nulls(len(tbl), field.type))
    aligned = pa.table(cols, schema=target)
    yield from aligned.to_batches()


def _added_dirs(root: str, version: int) -> list[str] | None:
    """Data dirs version ``version`` ADDED over its parent, or None if
    the commit was a REWRITE (dropped parent dirs — not an append)."""
    with open(_manifest_path(root, version)) as f:
        cur = set(_manifest_dirs(json.load(f)))
    prior_versions = [v for v in list_versions(root) if v < version]
    if not prior_versions:
        return sorted(cur)  # the bootstrap commit: everything is new
    with open(_manifest_path(root, max(prior_versions))) as f:
        parent = set(_manifest_dirs(json.load(f)))
    if not parent <= cur:
        return None  # rewrite: parent data replaced, not extended
    return sorted(cur - parent)


class _VersionedStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema_json: str, options):
        self._root = root
        self._schema_json = schema_json
        self._start = int(options.get("starting_version", 1)) - 1
        self._on_rewrite = (options.get("on_rewrite") or "error").lower()
        if self._on_rewrite not in ("error", "skip"):
            raise ValueError(
                f"on_rewrite must be 'error' or 'skip', got "
                f"{self._on_rewrite!r}"
            )

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": max(list_versions(self._root), default=self._start)}

    def partitions(self, start: dict, end: dict):
        parts: list[_DirPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            added = _added_dirs(self._root, v)
            if added is None:
                if self._on_rewrite == "error":
                    raise RuntimeError(
                        f"version {v} of {self._root} is a snapshot "
                        "rewrite, not an append — a streaming read "
                        "cannot express it as new rows. Pass "
                        "option('on_rewrite', 'skip') if rewrites here "
                        "are row-preserving maintenance (compaction)."
                    )
                continue
            parts.extend(
                _DirPartition(os.path.join(self._root, rel), self._schema_json)
                for rel in added
            )
        # Spark requires >= 1 partition per micro-batch; an all-skip
        # range still needs an empty contribution
        return parts or [_DirPartition("", self._schema_json)]

    def read(self, partition: _DirPartition):
        if not partition.path:
            return iter(())
        return _read_dir_as_arrow(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; the table needs nothing


class _VersionedBatchReader(DataSourceReader):
    def __init__(self, root: str, schema_json: str):
        self._root = root
        self._schema_json = schema_json

    def partitions(self):
        versions = list_versions(self._root)
        if not versions:
            raise FileNotFoundError(f"no committed versions under {self._root}")
        with open(_manifest_path(self._root, versions[-1])) as f:
            dirs = _manifest_dirs(json.load(f))
        return [
            _DirPartition(os.path.join(self._root, rel), self._schema_json)
            for rel in dirs
        ]

    def read(self, partition: _DirPartition):
        return _read_dir_as_arrow(partition)


class VersionedStreamDataSource(DataSource):
    """``format("versioned")`` — register with
    ``spark.dataSource.register(VersionedStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "format('versioned') requires .option('path', <table root>)"
            )
        return root

    def _latest_schema_json(self) -> str:
        root = self._root()
        versions = list_versions(root)
        if not versions:
            raise FileNotFoundError(f"no committed versions under {root}")
        with open(_manifest_path(root, versions[-1])) as f:
            return json.dumps(json.load(f)["schema"])

    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._latest_schema_json()))

    def streamReader(self, schema: StructType) -> _VersionedStreamReader:
        return _VersionedStreamReader(
            self._root(), json.dumps(schema.jsonValue()), self.options
        )

    def reader(self, schema: StructType) -> _VersionedBatchReader:
        return _VersionedBatchReader(
            self._root(), json.dumps(schema.jsonValue())
        )
