"""Shared helpers for the driver-facing query surface (SURVEY.md §2.B/C).

Conventions binding for every query in this package (SURVEY.md §3.2):

- every computed column is explicitly aliased AND explicitly cast so the
  Spark schema equals the DuckDB oracle schema (counts -> bigint, money /
  ratios -> double, timestamps -> formatted strings);
- floating aggregates are rounded (2-6 dp) on BOTH sides so reduction
  order can never flip the driver's value hash;
- every ORDER BY ... LIMIT k carries a unique-key tiebreak so the
  selected row SET is deterministic;
- session timezone is pinned to UTC so Spark timestamp arithmetic agrees
  with DuckDB's naive timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read testdata parquet tables; pins session TZ to UTC (see above)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return [
        spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names
    ]


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Create temp views for queries expressed as SQL text."""
    for n, df in zip(names, load(spark, sf_dir, *names)):
        df.createOrReplaceTempView(n)
