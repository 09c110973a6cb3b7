"""Local pre-flight for the driver's CORRECTNESS gate (SURVEY.md §5.6).

Runs every ``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count + column names + order-insensitive normalized values —
mirroring the driver's compare so mismatches surface before a round
ends.

Usage:  python tools/check_conformance.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "item"):  # numpy scalar
        return normalize_cell(v.item())
    return str(v)


def normalize_df(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def compare(name: str, spark_df, sql: str | None, con) -> tuple[bool, str]:
    pdf_s = spark_df.toPandas()
    if sql is None:
        return True, f"rows-only ({len(pdf_s)} rows)"
    pdf_o = con.execute(sql).fetchdf()
    cols_s, rows_s = normalize_df(pdf_s)
    cols_o, rows_o = normalize_df(pdf_o)
    if cols_s != cols_o:
        return False, f"columns differ: spark={cols_s} oracle={cols_o}"
    if len(rows_s) != len(rows_o):
        return False, f"row count differs: spark={len(rows_s)} oracle={len(rows_o)}"
    if rows_s != rows_o:
        diff_s = [r for r in rows_s if r not in set(rows_o)][:3]
        diff_o = [r for r in rows_o if r not in set(rows_s)][:3]
        return False, f"values differ; spark-only={diff_s} oracle-only={diff_o}"
    return True, f"match ({len(rows_s)} rows)"


def run(sf_dir: str, name_filter: str = "") -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("conformance")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            ok, msg = compare(name, fn(spark, sf_dir), oracles.get(name), con)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(ex).__name__}: {str(ex)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}", flush=True)
        failures += 0 if ok else 1
        # several queries persist intermediates that are only meaningful
        # within their own job; don't let caches pile up across the suite
        spark.catalog.clearCache()
    # entry() smoke
    try:
        n = e.entry(spark).count()
        print(f"PASS  entry(): {n} rows", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"FAIL  entry(): {type(ex).__name__}: {str(ex)[:300]}")
        failures += 1
    print(f"{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    raise SystemExit(1 if run(sf, filt) else 0)
