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
