"""Assembled driver-facing query registry (SURVEY.md §2.B/C + pipeline).

`QUERIES[name] = (fn, oracle_sql_or_None)` where
`fn(spark, sf_dir) -> DataFrame` and the SQL runs under DuckDB against
views named region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings over the same parquet files.
"""

from __future__ import annotations

from . import core, engine_queries, extras, pipeline, search, streaming_queries

QUERIES: dict[str, tuple] = {}
for mod in (core, search, pipeline, extras, engine_queries, streaming_queries):
    overlap = QUERIES.keys() & mod.QUERIES.keys()
    assert not overlap, f"duplicate query names: {overlap}"
    QUERIES.update(mod.QUERIES)


def spark_queries() -> dict:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: sql.strip()
        for name, (_fn, sql) in QUERIES.items()
        if sql is not None
    }
