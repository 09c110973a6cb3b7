"""Property test: icelite manifest pruning is SOUND — a pruned scan
never loses a row an exact filter would keep (SURVEY §1.3; the
row-group-coverage fix in sources/icelite.py::_file_stats).

Strategy: random little tables (ints, doubles with NaN/None holes,
strings) written as several files, then random single-column predicates;
``scan(where=...)`` + exact filter must equal full scan + exact filter,
row for row.  NaN-holed doubles are the historical hazard: a row group
without min/max stats must void that column's file stats, not shrink
them."""

from __future__ import annotations

import math
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from commentsearchengine_spark.sources.icelite import Catalog

DDL = "id long, a long, x double, s string"

OPS = {
    "==": lambda c, v: c == v,
    "<=": lambda c, v: c <= v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    ">": lambda c, v: c > v,
}


def _mk_rows(seed: int, n: int) -> pd.DataFrame:
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = rng.choice(
            [float(rng.randint(-5, 5)), float("nan"), None,
             rng.uniform(-10, 10)])
        rows.append((i, rng.randint(-50, 50), x, f"s{rng.randint(0, 9)}"))
    return pd.DataFrame(rows, columns=["id", "a", "x", "s"])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pruned_scan_equals_full_scan(spark, seed):
    root = tempfile.mkdtemp(prefix="icelite-prune-prop-")
    try:
        cat = Catalog(root).init()
        # several files with disjoint-ish value ranges => pruning bites
        for part in range(4):
            pdf = _mk_rows(seed * 10 + part, 60)
            pdf["a"] = pdf["a"] + part * 40  # shift ranges per file
            cat.stage_write(
                spark.createDataFrame(pdf, DDL).coalesce(1),
                "t", mode="stage-append")
        cat.commit(wave=0)

        import random

        rng = random.Random(seed)
        for _ in range(12):
            col = rng.choice(["a", "x", "id"])
            op = rng.choice(list(OPS))
            val = rng.randint(-60, 220) if col != "x" else rng.uniform(-8, 8)
            cond = OPS[op](F.col(col), F.lit(val))

            pruned = sorted(
                tuple(r) for r in cat.scan(
                    spark, "t", schema_ddl=DDL, where=[(col, op, val)]
                ).filter(cond).collect())
            full = sorted(
                tuple(r) for r in cat.scan(spark, "t", schema_ddl=DDL)
                .filter(cond).collect())

            def canon(rows):
                return [
                    tuple("NaN" if isinstance(v, float) and math.isnan(v)
                          else v for v in row)
                    for row in rows
                ]

            assert canon(pruned) == canon(full), (col, op, val)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_float_predicates_never_prune(spark, tmp_path):
    """Floats carry no manifest stats (Spark orders NaN ABOVE +inf, so
    min/max-based elimination would be unsound): a float `where` must be
    a no-op for pruning, and the NaN rows — which Spark's `>=` KEEPS —
    must survive."""
    root = str(tmp_path / "cat")
    cat = Catalog(root).init()
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "x": [float("nan"), float("nan"), 7.5, -3.25],
    })
    cat.stage_write(
        spark.createDataFrame(pdf, "id long, x double").coalesce(1),
        "t", mode="stage-append")
    cat.commit(wave=0)
    assert len(cat.table_files("t", where=[("x", ">=", 100.0)])) == 1
    got = sorted(
        r["id"] for r in cat.scan(
            spark, "t", schema_ddl="id long, x double",
            where=[("x", ">=", -10.0)],
        ).filter(F.col("x") >= -10.0).collect())
    assert got == [1, 2, 3, 4]  # NaN > every number in Spark SQL


def test_entries_overlapping_segs():
    """Backstop seg pruning (plans/wave.py): conservative set-membership
    file elimination over url_hash range stats."""
    from commentsearchengine_spark.sources.icelite import (
        entries_overlapping_segs,
    )

    shift = 48
    w = 1 << shift

    def entry(lo, hi, path="f"):
        return {"path": path, "rows": 1, "stats": {"url_hash": [lo, hi]}}

    stats_less = {"path": "legacy", "rows": 1, "stats": {}}
    ents = [
        entry(0, w - 1, "seg0"),              # exactly seg 0
        entry(5 * w + 3, 5 * w + 9, "seg5"),  # inside seg 5
        entry(2 * w, 4 * w - 1, "seg2_3"),    # spans segs 2..3
        entry(-2 * w, -w - 1, "neg2"),        # seg -2 (signed hashes)
        stats_less,
    ]
    paths = lambda segs: sorted(  # noqa: E731
        e["path"] for e in entries_overlapping_segs(ents, segs, shift))
    assert paths({0}) == ["legacy", "seg0"]
    assert paths({5}) == ["legacy", "seg5"]
    assert paths({3}) == ["legacy", "seg2_3"]
    assert paths({-2}) == ["legacy", "neg2"]
    assert paths({7}) == ["legacy"]           # only the conservative keep
    assert paths({-2, 0, 5}) == ["legacy", "neg2", "seg0", "seg5"]
    # empty seg set => no probe keys => nothing can match
    assert entries_overlapping_segs(ents, set(), shift) == []


def test_backstop_prunes_clustered_seen(spark, tmp_path):
    """End-to-end: a crawl's per-wave metrics record the backstop scan
    as a subset of the manifest whenever the maybe segments allow it,
    and the clustered seen files carry tight url_hash stats."""
    from commentsearchengine_spark.config import EngineConfig
    from commentsearchengine_spark.plans.wave import (
        BACKSTOP_SEG_SHIFT, run_crawl,
    )

    cfg = EngineConfig(n_seeds=25, n_waves=3, n_buckets=32)
    cat = run_crawl(spark, str(tmp_path / "cat"), cfg)
    snap = cat.load_snapshot()
    b = snap.metrics["backstop"]
    assert b["seen_files_scanned"] <= b["seen_files_total"]
    assert b["frontier_files_scanned"] <= b["frontier_files_total"]
    # every seen file is hash-clustered: its url_hash span is a narrow
    # slice, not the whole int64 space (the property pruning relies on)
    for e in cat.table_files("seen"):
        lo, hi = e["stats"]["url_hash"]
        assert hi - lo < (1 << 63)  # strictly narrower than half-space
