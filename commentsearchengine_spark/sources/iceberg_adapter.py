"""Real-Apache-Iceberg adapter (SURVEY.md §1.3 swap-in path).

icelite exists ONLY because this sandbox has no `iceberg-spark-runtime`
jar and no network to fetch one (SURVEY §0.4).  This module is the
promised isolation proof: the same catalog surface the engine consumes
(`scan` / `stage_write` / `stage_entries` / `commit` / `load_snapshot`,
see icelite.Catalog), expressed over a genuine Iceberg catalog via
nothing but public Spark SQL — `spark.table`, `df.writeTo(...).append()`
and `VERSION AS OF` time travel.  Nothing above the Catalog interface
changes (plans/wave.py, operators/*, bench).

Semantics mapping, one line each:

- icelite snapshot scan        -> `SELECT * FROM cat.db.t VERSION AS OF s`
- icelite stage_write append   -> `df.writeTo("cat.db.t").append()`
- icelite stage_write overwrite-> `df.writeTo("cat.db.t").overwritePartitions()`
  (wave tables are replaced whole; Iceberg makes this a snapshot commit)
- icelite manifest pruning     -> Iceberg scan planning (free: its
  manifests carry per-file column bounds; the engine's `where` hints
  become ordinary pushed filters)
- icelite multi-table commit   -> one row appended to a tiny
  `checkpoints` table pinning (wave, per-table Iceberg snapshot-id,
  state JSON); engine resume reads the latest checkpoint row and scans
  each table `VERSION AS OF` its pinned id.  Iceberg commits are atomic
  per table; the checkpoint row is written LAST, so a crash between
  table commits leaves orphan snapshots that are invisible to resume —
  the same unreachable-files-swept-lazily story as icelite (§3.3).

The carry-forward trick (stage_entries: deep frontier files carried
byte-untouched) is NATIVE to Iceberg — an append commit never rewrites
existing data files — so the adapter's stage_entries is a no-op and the
frontier "rewrite touched head files" step becomes a positional/row
delete + append (MERGE) on the head tier.

SCOPE (honest, per ADVICE r4): this is a SKETCH OF THE BOUNDARY, not
yet a full drop-in for everything plans/wave.py consumes.  Implemented:
scan (with VERSION AS OF), stage_write (snapshot-pin bookkeeping),
stage_entries (native no-op), commit (checkpoint row).  Still required
for a true swap-in, mapped but unwritten because nothing here can ever
execute without the jar: `init` / `load_snapshot` (read the latest
checkpoints row into an icelite.Snapshot), `scan_entries` /
`staged_entries` / `table_files` (become `VERSION AS OF` scans over the
staged pin — Iceberg owns file lists, so entry-level re-reads translate
to snapshot-diff scans), and stage_write returning entries (callers
that re-read a write's output would instead scan the pinned snapshot's
incremental diff).  Everything here is import-safe without the jar;
constructing the adapter raises a clear error when the runtime is
absent, and the accompanying test (tests/test_iceberg_adapter.py)
skips itself in this sandbox.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_DDL = (
    "wave int, snapshot_pins string, state string, metrics string, "
    "created_at timestamp"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SQL extension + catalog impl is on the
    classpath (the `iceberg-spark-runtime-<ver>` jar)."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe needs the JVM
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergCatalog:
    """Boundary sketch of an icelite.Catalog swap-in over real Iceberg
    (see module docstring for what a full drop-in still needs).

    ``namespace`` is the `catalog.db` prefix (the Spark session must be
    configured with `spark.sql.catalog.<name>=org.apache.iceberg...`).
    Tables are addressed `<namespace>.<table>`.
    """

    def __init__(self, spark: SparkSession, namespace: str) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime jar not on the classpath; use "
                "icelite.Catalog (this sandbox) or add the jar via "
                "spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-3.5_2.12:<ver>"
            )
        self.spark = spark
        self.namespace = namespace
        self._pins: dict[str, int] = {}   # staged per-table snapshot ids

    def _qualified(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    # ------------------------------------------------------------ reads
    def scan(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None,
             schema_ddl: str | None = None,
             where: list[tuple] | None = None) -> DataFrame:
        """`VERSION AS OF` when pinned; Iceberg scan planning replaces
        icelite's manifest pruning, so ``where`` hints become ordinary
        filters Catalyst pushes into the Iceberg scan."""
        q = self._qualified(table)
        if snapshot_id is not None:
            df = spark.read.option("snapshot-id", str(snapshot_id)).table(q)
        else:
            df = spark.table(q)
        for col, op, value in where or []:
            sql_op = "=" if op == "==" else op
            df = df.filter(f"{col} {sql_op} {value!r}")
        return df

    # ----------------------------------------------------------- writes
    def stage_entries(self, table: str, entries: list[Any]) -> None:
        """No-op: Iceberg never rewrites carried data files on append —
        the carry-forward icelite emulates is its native behavior."""

    def stage_write(self, df: DataFrame, table: str, mode: str = "overwrite",
                    partitions: int | None = None,
                    partition_cols: list[str] | None = None) -> list[dict]:
        if partitions is not None:
            df = df.repartition(partitions)
        writer = df.writeTo(self._qualified(table))
        if mode in ("append", "stage-append"):
            # partitionedBy on DataFrameWriterV2 applies only to table
            # CREATION — appends inherit the table's existing partition
            # spec, so passing it here would error (ADVICE r4)
            writer.append()
        else:
            if partition_cols:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(
                    *[F.col(c) for c in partition_cols])
            writer.createOrReplace()
        self._pins[table] = self._current_snapshot_id(table)
        return []  # Iceberg owns the manifests; callers re-scan by pin

    def _current_snapshot_id(self, table: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._qualified(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row[0])

    def commit(self, wave: int, state: dict[str, Any] | None = None,
               metrics: dict[str, Any] | None = None,
               carry_tables: list[str] | None = None) -> int:
        """Engine checkpoint = ONE row in the `checkpoints` table
        pinning every staged table's Iceberg snapshot id.  Written last;
        a crash before this append leaves per-table snapshots that no
        checkpoint references (resume never sees them)."""
        import datetime

        pins = dict(self._pins)
        row = (
            wave,
            json.dumps(pins, sort_keys=True),
            json.dumps(state or {}, sort_keys=True),
            json.dumps(metrics or {}, sort_keys=True),
            datetime.datetime.now(datetime.timezone.utc),
        )
        self.spark.createDataFrame([row], CHECKPOINT_DDL).writeTo(
            self._qualified("checkpoints")
        ).append()
        self._pins = {}
        return wave
