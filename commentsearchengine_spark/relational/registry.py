"""Assembled driver-facing query registry (SURVEY.md §2.B/C + pipeline).

`QUERIES[name] = (fn, oracle_sql_or_None)` where
`fn(spark, sf_dir) -> DataFrame` and the SQL runs under DuckDB against
views named region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings over the same parquet files.

The driver's correctness gate checks exactly the FIRST ``GATE_WINDOW``
entries of the dict, in insertion order.  ``GATE_ORDER`` pins that window
explicitly so adding a query can never silently evict a gated one: the
round-3 window leads with the 32 entries that had never been
driver-certified (17 oracle-paired, 12 rows-only, 3 evicted r01 greens),
then 18 previously-green entries as regression canaries.  Everything
else — including the two rows-only-by-design entries ``approx_distinct``
and ``search_stemmed_index`` — sits past the window; unknown newcomers
are appended at the END (never inside the window).
``tests/test_registry_gate.py`` enforces these invariants.
"""

from __future__ import annotations

from . import core, engine_queries, extras, pipeline, search, streaming_queries

GATE_WINDOW = 50

# First-50 driver window: 32 never/no-longer-certified + 18 canaries.
GATE_ORDER = [
    # -- 20 oracle-paired entries with no green driver row: 3 evicted
    #    from the r01 window (simhash_near_pairs/fingerprint/langid) +
    #    17 never checked ---------------------------------------------
    "simhash_near_pairs",
    "fingerprint",
    "langid",
    "quality_score",
    "token_counts",
    "cosine_topk",
    "ann_lsh_buckets",
    "ann_lsh_pairs",
    "ivf_ann_topk",
    "array_hof",
    "udtf_tokenize",
    "bucketed_colocated_join",
    "regression_aggs",
    "grouped_agg_pandas",
    "scalar_pandas_udf",
    "grouped_map_normalize",
    "orc_roundtrip",
    "unpivot_revenue",
    "grouped_arrow_stats",
    "map_in_arrow_doclen",
    # -- 12 rows-only entries (crawl / image / streaming / sketches) ----
    "hll_sketch_distinct",
    "csv_roundtrip",
    "json_roundtrip",
    "crawl_log",
    "crawl_frontier_depth",
    "crawl_lineage",
    "pages_payload_verify",
    "image_feature_extract",
    "image_resize_thumbs",
    "streaming_watermark_counts",
    "streaming_token_bucket",
    "streaming_icelite_sink",
    # -- 18 previously-green regression canaries ------------------------
    "pricing_summary",
    "predicates",
    "broadcast_part_revenue",
    "asof_purchase_click",
    "salted_skew_join",
    "cube_flag_status",
    "median_quantity",
    "window_rank_orders",
    "topk_orders",
    "set_ops_all",
    "pivot_region_revenue",
    "date_funcs",
    "json_props",
    "session_windows",
    "search_phrase",
    "search_tfidf",
    "dedup_exact",
    "lsh_near_dup_pairs",
]

# Rows-only-by-design entries allowed inside the gate window (no DuckDB
# oracle can express them; the driver records a rows>0 check instead).
GATE_ROWS_ONLY_OK = {
    "hll_sketch_distinct",
    "csv_roundtrip",
    "json_roundtrip",
    "crawl_log",
    "crawl_frontier_depth",
    "crawl_lineage",
    "pages_payload_verify",
    "image_feature_extract",
    "image_resize_thumbs",
    "streaming_watermark_counts",
    "streaming_token_bucket",
    "streaming_icelite_sink",
}

_ALL: dict[str, tuple] = {}
for mod in (core, search, pipeline, extras, engine_queries, streaming_queries):
    overlap = _ALL.keys() & mod.QUERIES.keys()
    assert not overlap, f"duplicate query names: {overlap}"
    _ALL.update(mod.QUERIES)

_missing = [k for k in GATE_ORDER if k not in _ALL]
assert not _missing, f"GATE_ORDER names unknown queries: {_missing}"
assert len(GATE_ORDER) == len(set(GATE_ORDER)) == GATE_WINDOW

QUERIES: dict[str, tuple] = {k: _ALL[k] for k in GATE_ORDER}
QUERIES.update((k, v) for k, v in _ALL.items() if k not in QUERIES)


def spark_queries() -> dict:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: sql.strip()
        for name, (_fn, sql) in QUERIES.items()
        if sql is not None
    }
