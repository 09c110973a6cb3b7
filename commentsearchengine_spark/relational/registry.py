"""Assembled driver-facing query registry (SURVEY.md §2.B/C + pipeline).

`QUERIES[name] = (fn, oracle_sql_or_None)` where
`fn(spark, sf_dir) -> DataFrame` and the SQL runs under DuckDB against
views named region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings over the same parquet files.

The driver's correctness gate checks exactly the FIRST ``GATE_WINDOW``
entries of the dict, in insertion order.  ``GATE_ORDER`` pins that window
explicitly so adding a query can never silently evict a gated one.  The
round-4 rotation (VERDICT r3 task #1): slots 1–3 are the only entries
never driver-certified (judge-verified green in r3:
``cosine_near_dup_pairs`` / ``ann_lsh_recall`` / ``ivf_ann_recall``),
slot 4 is this round's new ``ann_lsh_recall_sampled``, slots 5–6 are the
two queries whose plans were rewritten this round (``search_tfidf``,
``search_boolean``), slots 7–35 re-certify the 29 oracle-paired entries
whose last green row dates to r01/r02, and the final 15 slots are 13
r03-green regression canaries + this round's two other new queries
(``ngram_jaccard_pairs``, oracle-paired, and ``video_frame_sample``,
rows-only by design — binary codec pipeline), so that after r04 every
registry entry has a driver-recorded row in some round.  The 12
remaining rows-only entries were driver-recorded in r03 and sit past
the window, as do the two rows-only-by-design entries
``approx_distinct`` and ``search_stemmed_index``; unknown newcomers are
appended at the END (never inside the window).
``tests/test_registry_gate.py`` enforces these invariants.
"""

from __future__ import annotations

from . import core, engine_queries, extras, pipeline, search, streaming_queries

GATE_WINDOW = 50

# Round-4 first-50 driver window: 3 never-driver-certified + 1 new +
# 2 rewritten-this-round + 29 oldest-certification (r01/r02 only) +
# 13 r03-green canaries + 2 more new entries.  All oracle-paired except
# video_frame_sample (rows-only by design, allowlisted below).
GATE_ORDER = [
    # -- the 3 entries no driver round has ever checked ------------------
    "cosine_near_dup_pairs",
    "ann_lsh_recall",
    "ivf_ann_recall",
    # -- new this round ---------------------------------------------------
    "ann_lsh_recall_sampled",
    # -- plans rewritten this round (single-scan token relation) ----------
    "search_tfidf",
    "search_boolean",
    # -- 29 oracle-paired entries whose last green row is r01/r02 ---------
    "join_orders_customer",
    "outer_customer_orders",
    "full_outer_daily_activity",
    "semi_customers_with_orders",
    "anti_customers_without_orders",
    "theta_nation_region",
    "range_join_value_bins",
    "count_distinct",
    "rollup_flag_status",
    "grouping_sets",
    "stats_aggregates",
    "collect_sorted_list",
    "window_lag_events",
    "window_running_sum",
    "window_range_frame",
    "ntile_customers",
    "set_ops",
    "exists_subquery",
    "string_funcs",
    "regexp_funcs",
    "math_funcs",
    "map_funcs",
    "tumbling_hourly",
    "sliding_1h_15m",
    "search_tokenize_counts",
    "search_inverted_index",
    "search_prefix",
    "minhash_signatures",
    "simhash",
    # -- 15 r03-green regression canaries ---------------------------------
    "pricing_summary",
    "predicates",
    "broadcast_part_revenue",
    "asof_purchase_click",
    "salted_skew_join",
    "cube_flag_status",
    "search_phrase",
    "dedup_exact",
    "lsh_near_dup_pairs",
    "simhash_near_pairs",
    "cosine_topk",
    "ann_lsh_pairs",
    "ivf_ann_topk",
    # -- new this round (slot traded from two r03-green canaries whose
    #    components remain covered: session_windows by the r03 record,
    #    udtf_tokenize by r03 + pytest) — after r04 every one of the
    #    registry's entries has a driver-recorded row in some round
    "ngram_jaccard_pairs",
    "video_frame_sample",
]

# Rows-only-by-design entries allowed inside the gate window (no DuckDB
# oracle can express them; the driver records a rows>0 check instead).
GATE_ROWS_ONLY_OK = {
    "video_frame_sample",
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

# Import-time invariants raise real exceptions (not asserts, which
# python -O strips and would leave the driver's gate window unguarded
# outside pytest — ADVICE r3).
_ALL: dict[str, tuple] = {}
for mod in (core, search, pipeline, extras, engine_queries, streaming_queries):
    overlap = _ALL.keys() & mod.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    _ALL.update(mod.QUERIES)

_missing = [k for k in GATE_ORDER if k not in _ALL]
if _missing:
    raise RuntimeError(f"GATE_ORDER names unknown queries: {_missing}")
if not (len(GATE_ORDER) == len(set(GATE_ORDER)) == GATE_WINDOW):
    raise RuntimeError(
        f"GATE_ORDER must hold exactly {GATE_WINDOW} unique names, got "
        f"{len(GATE_ORDER)} ({len(set(GATE_ORDER))} unique)"
    )

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
