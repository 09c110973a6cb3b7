"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The implementations live in ``commentsearchengine_spark.relational``
(SURVEY.md §2.B/C); the crawl engine itself (SURVEY.md §2.A) is
exercised by the rows-only ``crawl_*`` / ``pages_*`` entries and,
bit-exactly against the sequential oracle, by the pytest suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # defensive: driver may import from another cwd
    sys.path.insert(0, _REPO)

from commentsearchengine_spark.relational import registry  # noqa: E402
from commentsearchengine_spark.relational.search import q_tfidf_search

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference is a comment *search engine*, so the flagship is its
    headline capability re-expressed Spark-first: tf-idf ranked search
    over the inverted-index token relation (SURVEY.md §2.C).
    """
    return q_tfidf_search(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (rows-only entries omitted:
    crawl_* / pages_* / image_* are stateful multi-wave or binary-codec
    pipelines, approx_distinct is estimator-specific)."""
    return registry.oracle_sqls()
