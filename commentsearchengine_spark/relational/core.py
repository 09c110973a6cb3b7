"""Core relational surface (SURVEY.md §2.B) over the driver testdata.

Each entry pairs a DataFrame-API implementation with a DuckDB oracle SQL
string (None => rows-only check).  Reference capability being proven:
the engine's query layer must cover scan/filter/join/agg/window/setop/
scalar families the reference's data processing implied (SURVEY.md §2.B,
ref:∅ — reconstruction; no reference file exists to cite, SURVEY.md §0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .util import load, register_views

# --------------------------------------------------------------------------
# scan / project / filter / agg
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with partial/final split by Spark."""
    (li,) = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 4)                              AS avg_qty,
       round(avg(l_discount), 4)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate family: BETWEEN / IN / LIKE / IS NULL / AND-OR-NOT."""
    (li,) = load(spark, sf, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "N")
        & F.col("l_linestatus").like("%O%")
        & F.col("l_extendedprice").isNotNull()
        & ~(F.col("l_discount") > 0.08)
    ).select(
        "l_orderkey",
        "l_linenumber",
        # unrounded: a single IEEE multiply is bit-identical across engines,
        # while round(x, 2) can straddle a half-even boundary
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_price"
        ),
    )


SQL_PREDICATES = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40
  AND l_returnflag IN ('A', 'N')
  AND l_linestatus LIKE '%O%'
  AND l_extendedprice IS NOT NULL
  AND NOT (l_discount > 0.08)
"""


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


def q_join_orders_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join (Spark/AQE pick SMJ vs SHJ) + re-aggregation."""
    orders, customer = load(spark, sf, "orders", "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


SQL_JOIN_ORDERS_CUSTOMER = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_broadcast_part_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast hash join: `part` is the small dim -> ship it to executors
    instead of shuffling 100 TB of lineitem (SURVEY.md §4)."""
    li, part = load(spark, sf, "lineitem", "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("brand_revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_BROADCAST_PART_REVENUE = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS brand_revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_outer_customer_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    customer, orders = load(spark, sf, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


SQL_OUTER_CUSTOMER_ORDERS = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def q_full_outer_daily_activity(spark: SparkSession, sf: str) -> DataFrame:
    """Full (and implicitly right) outer join: order-days vs event-days."""
    orders, events = load(spark, sf, "orders", "events")
    od = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_orders"))
    ed = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"))
    return (
        od.join(ed, "day", "full")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


SQL_FULL_OUTER_DAILY_ACTIVITY = """
WITH od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   count(*) AS n_orders FROM orders GROUP BY 1),
     ed AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS n_events FROM events GROUP BY 1)
SELECT coalesce(od.day, ed.day) AS day,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_events, 0) AS n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
"""


def q_semi_customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (the engine uses the anti twin as op B3)."""
    customer, orders = load(spark, sf, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_SEMI_CUSTOMERS_WITH_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
GROUP BY c_mktsegment
"""


def q_anti_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join — exactly the engine's exact-seen filter (op B3)."""
    customer, orders = load(spark, sf, "customer", "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_ANTI_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_theta_nation_region(spark: SparkSession, sf: str) -> DataFrame:
    """Cross join + theta (non-equi) filter -> nested-loop territory."""
    nation, region = load(spark, sf, "nation", "region")
    return (
        nation.crossJoin(region)
        .filter(F.col("n_regionkey") < F.col("r_regionkey"))
        .select("n_name", "r_name")
    )


SQL_THETA_NATION_REGION = """
SELECT n_name, r_name FROM nation, region WHERE n_regionkey < r_regionkey
"""


def q_asof_purchase_click(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it.  Spark has no native ASOF; the linear-time shape is the
    union+window trick (SURVEY §2.B): interleave both streams ordered by
    (ts, kind) per user and carry `last(click_ts, ignoreNulls)` forward.
    One shuffle, no k-clicks x m-purchases intermediate blowup (the old
    join + row_number()=1 plan materialized every earlier click per
    purchase).  DuckDB: native ASOF LEFT JOIN."""
    (events,) = load(spark, sf, "events")
    both = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_id",
        "user_id",
        "ts",
        # clicks sort before purchases at equal ts, so a click at
        # exactly purchase-ts is visible to it (ASOF >= semantics)
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        both.withColumn(
            "last_click_ts_raw", F.last("click_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click_ts_raw", "yyyy-MM-dd HH:mm:ss").alias(
                "last_click_ts"
            ),
        )
    )


SQL_ASOF_PURCHASE_CLICK = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit skew-salting for a hot join key (the query-level twin of
    the engine's hot-host fetch salting, op P0b): ~70% of events collapse
    onto one synthetic key, so an unsalted shuffle join would put 70% of
    the rows in one task.  The fact side salts the key with
    pmod(hash(event_id), SALT); the dim side replicates each row SALT
    times; the join key becomes (key, salt) and the hot key spreads over
    SALT tasks.  (AQE's skew handling only splits sort-merge join
    partitions after the fact; explicit salting is the portable fix and
    the one usable for window/groupBy skew.)  Results are salt-invariant,
    so the DuckDB oracle is the plain unsalted join."""
    salt_n = 8
    (events,) = load(spark, sf, "events")
    fact = events.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(1))
        .otherwise(F.col("user_id")).alias("skew_key"),
        "value",
        F.pmod(F.hash("event_id"), F.lit(salt_n)).alias("salt"),
    )
    dim = spark.range(0, 501).select(
        F.col("id").alias("skew_key"),
        F.concat(F.lit("grp"), (F.col("id") % 7).cast("string")).alias(
            "grp"
        ),
    )
    dim_salted = dim.crossJoin(
        spark.range(0, salt_n).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        # merge hint: at testdata scale the tiny dim would broadcast and
        # hide the salted shuffle the query exists to demonstrate
        fact.join(dim_salted.hint("merge"), ["skew_key", "salt"])
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_SALTED_SKEW_JOIN = """
WITH fact AS (
  SELECT CASE WHEN user_id % 10 < 7 THEN 1 ELSE user_id END AS skew_key,
         value
  FROM events),
dim AS (
  SELECT r.range AS skew_key, 'grp' || (r.range % 7)::VARCHAR AS grp
  FROM range(0, 501) r)
SELECT grp, count(*) AS n, round(sum(value), 2) AS sum_value
FROM fact JOIN dim USING (skew_key)
GROUP BY grp
"""


def q_range_join_value_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Interval (range) join of events against a bins dimension."""
    (events,) = load(spark, sf, "events")
    bins = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1e6, "high")],
        "lo double, hi double, bin string",
    )
    return (
        events.join(
            F.broadcast(bins),
            (events.value >= bins.lo) & (events.value < bins.hi),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_RANGE_JOIN_VALUE_BINS = """
WITH bins(lo, hi, bin) AS (
  VALUES (0.0, 50.0, 'low'), (50.0, 200.0, 'mid'), (200.0, 1e6, 'high'))
SELECT event_type, bin, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events JOIN bins ON value >= lo AND value < hi
GROUP BY event_type, bin
"""


# --------------------------------------------------------------------------
# aggregation variants
# --------------------------------------------------------------------------


def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    (orders,) = load(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


SQL_COUNT_DISTINCT = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderstatus) AS n_statuses
FROM orders GROUP BY o_orderpriority
"""


def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL approx distinct — rows-only (estimators differ by engine)."""
    (orders,) = load(spark, sf, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


def q_rollup_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP with grouping id; null group keys coalesced to 'ALL'."""
    (li,) = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
            "sum_qty",
            "gid",
        )
    )


SQL_ROLLUP_FLAG_STATUS = """
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set combos
    (completes the rollup/cube/grouping-sets family of SURVEY §2.B)."""
    (li,) = load(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
            "sum_qty",
            "gid",
        )
    )


SQL_CUBE_FLAG_STATUS = """
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS through the SQL surface (spark.sql)."""
    register_views(spark, sf, "orders")
    return spark.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_stats_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    (events,) = load(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias(
            "corr_value_user"
        ),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


SQL_STATS_AGGREGATES = """
SELECT event_type,
       round(avg(value), 4) AS avg_value,
       round(stddev_samp(value), 4) AS sd_value,
       round(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_value_user,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events GROUP BY event_type
"""


def q_median_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentile (Spark percentile == quantile_cont)."""
    (li,) = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )


SQL_MEDIAN_QUANTITY = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_collect_sorted_list(spark: SparkSession, sf: str) -> DataFrame:
    """collect_set + sort_array, stringified for stable hashing."""
    (nation,) = load(spark, sf, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(
            F.sort_array(F.collect_set("n_name")), ","
        ).alias("nations")
    )


SQL_COLLECT_SORTED_LIST = """
SELECT n_regionkey,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
FROM nation GROUP BY n_regionkey
"""


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


def q_window_rank_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders per customer — the same window-rank shape as the
    engine's admission operator Q1 (SURVEY.md §2.A)."""
    (orders,) = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_WINDOW_RANK_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_window_lag_events(spark: SparkSession, sf: str) -> DataFrame:
    (events,) = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias(
            "delta_prev"
        ),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


SQL_WINDOW_LAG_EVENTS = """
SELECT user_id, event_id,
       round(value - lag(value, 1) OVER w, 4) AS delta_prev,
       lead(event_type, 1) OVER w AS next_type
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    (events,) = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


SQL_WINDOW_RUNNING_SUM = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW), 4) AS running_value
FROM events
"""


def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame (peer rows by value distance, not row offsets)."""
    (orders,) = load(spark, sf, "orders")
    # double-valued RANGE offsets need the SQL window syntax (the python
    # Window API only accepts long offsets)
    return orders.selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice"
        " RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"
        " AS n_within_10k_below",
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_orderstatus,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
         AS n_within_10k_below
FROM orders
"""


def q_ntile_customers(spark: SparkSession, sf: str) -> DataFrame:
    (customer,) = load(spark, sf, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("balance_quartile"),
    )


SQL_NTILE_CUSTOMERS = """
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
         AS balance_quartile
FROM customer
"""


# --------------------------------------------------------------------------
# sort / limit / set ops
# --------------------------------------------------------------------------


def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k with unique tiebreak (deterministic row SET)."""
    (orders,) = load(spark, sf, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """intersect / except / union-distinct — the seen-set algebra family.

    The three set-op branches are tagged, unioned, and folded by ONE
    aggregation, so the whole summary is a single Spark job (the old
    shape ran three driver-side .count() actions for one output row)."""
    (orders,) = load(spark, sf, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    both = y95.intersect(y96)
    only95 = y95.distinct().subtract(y96)  # EXCEPT (distinct)
    union_d = y95.union(y96).distinct()

    def tag(df: DataFrame, t: str) -> DataFrame:
        return df.select(F.lit(t).alias("t"))

    return (
        tag(both, "b").unionAll(tag(only95, "o")).unionAll(tag(union_d, "e"))
        .agg(
            F.sum((F.col("t") == "b").cast("long")).alias("n_both"),
            F.sum((F.col("t") == "o").cast("long")).alias("n_only95"),
            F.sum((F.col("t") == "e").cast("long")).alias("n_either"),
        )
    )


SQL_SET_OPS = """
WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT (SELECT count(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96))
         AS n_both,
       (SELECT count(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))
         AS n_only95,
       (SELECT count(*) FROM (SELECT * FROM y95 UNION SELECT * FROM y96))
         AS n_either
"""


def q_set_ops_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset set ops: intersectAll / exceptAll keep duplicate
    multiplicities (min / truncated-difference of per-value counts), and
    unionByName resolves columns by NAME across different column orders.
    Per-priority result rows make the multiplicities visible to the
    value-hash compare."""
    (orders,) = load(spark, sf, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(
        "o_orderpriority"
    )
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(
        "o_orderpriority"
    )
    ia = (
        y95.intersectAll(y96)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_intersect_all"))
    )
    ea = (
        y95.exceptAll(y96)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_except_all"))
    )
    # deliberately different column ORDER on the two sides: unionByName
    # must match by name (positional union would mis-zip these)
    ua = (
        y95.select("o_orderpriority", F.lit(1995).alias("yr"))
        .unionByName(
            y96.select(F.lit(1996).alias("yr"), "o_orderpriority")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_union_all"))
    )
    return (
        ua.join(ia, "o_orderpriority", "left")
        .join(ea, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_union_all",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


SQL_SET_OPS_ALL = """
WITH y95 AS (SELECT o_orderpriority FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT o_orderpriority FROM orders
             WHERE year(o_orderdate) = 1996),
ia AS (SELECT o_orderpriority, count(*) AS n_intersect_all
       FROM (SELECT * FROM y95 INTERSECT ALL SELECT * FROM y96)
       GROUP BY 1),
ea AS (SELECT o_orderpriority, count(*) AS n_except_all
       FROM (SELECT * FROM y95 EXCEPT ALL SELECT * FROM y96)
       GROUP BY 1),
ua AS (SELECT o_orderpriority, count(*) AS n_union_all
       FROM (SELECT * FROM y95 UNION ALL SELECT * FROM y96)
       GROUP BY 1)
SELECT ua.o_orderpriority, ua.n_union_all,
       coalesce(ia.n_intersect_all, 0) AS n_intersect_all,
       coalesce(ea.n_except_all, 0) AS n_except_all
FROM ua
LEFT JOIN ia ON ia.o_orderpriority = ua.o_orderpriority
LEFT JOIN ea ON ea.o_orderpriority = ua.o_orderpriority
"""


def q_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS through spark.sql (Catalyst decorrelates it)."""
    register_views(spark, sf, "customer", "orders")
    return spark.sql("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
        GROUP BY c_mktsegment
    """)


SQL_EXISTS_SUBQUERY = """
SELECT c_mktsegment, count(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
GROUP BY c_mktsegment
"""


def q_pivot_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Manual pivot (sum-case) over a 4-table join chain."""
    orders, customer, nation, region = load(
        spark, sf, "orders", "customer", "nation", "region"
    )
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    year = F.year("o_orderdate")

    def bucket(rname: str):
        return F.round(
            F.sum(
                F.when(F.col("r_name") == rname, F.col("o_totalprice")).otherwise(
                    0.0
                )
            ),
            2,
        )

    return j.groupBy(year.cast("long").alias("order_year")).agg(
        bucket("AMERICA").alias("america_rev"),
        bucket("ASIA").alias("asia_rev"),
        bucket("EUROPE").alias("europe_rev"),
    )


SQL_PIVOT_REGION_REVENUE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       round(sum(CASE WHEN r_name = 'AMERICA' THEN o_totalprice ELSE 0 END), 2)
         AS america_rev,
       round(sum(CASE WHEN r_name = 'ASIA' THEN o_totalprice ELSE 0 END), 2)
         AS asia_rev,
       round(sum(CASE WHEN r_name = 'EUROPE' THEN o_totalprice ELSE 0 END), 2)
         AS europe_rev
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# scalar function families
# --------------------------------------------------------------------------


def q_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    (docs,) = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.instr("text", "spark").cast("long").alias("spark_pos"),
        F.levenshtein("source", F.lit("src1")).cast("long").alias(
            "src_dist"
        ),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.trim(F.substring("text", 1, 6)).alias("head_trim"),
    )


SQL_STRING_FUNCS = """
SELECT doc_id,
       upper(substr(text, 1, 10)) AS head_upper,
       CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos,
       CAST(levenshtein(source, 'src1') AS BIGINT) AS src_dist,
       concat_ws('|', lang, source) AS lang_source,
       trim(substr(text, 1, 6)) AS head_trim
FROM documents
"""


def q_regexp_funcs(spark: SparkSession, sf: str) -> DataFrame:
    (docs,) = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.size(F.regexp_extract_all("text", F.lit("(ba[a-z]+)"))).cast(
            "long"
        ).alias("n_ba_words"),
        F.regexp_replace("text", "[aeiou]", "").substr(1, 12).alias(
            "devoweled_head"
        ),
    )


SQL_REGEXP_FUNCS = """
SELECT doc_id,
       regexp_extract(source, '([0-9]+)', 1) AS src_num,
       CAST(len(regexp_extract_all(text, '(ba[a-z]+)')) AS BIGINT)
         AS n_ba_words,
       substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 12)
         AS devoweled_head
FROM documents
"""


def q_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    (orders,) = load(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
        F.date_format(
            F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd"
        ).alias("quarter_start"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_95,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
         AS quarter_start
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    (li,) = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.pow("l_quantity", 2), 4).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
    )


SQL_MATH_FUNCS = """
SELECT l_orderkey, l_linenumber,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       round(ln(l_extendedprice + 1), 6) AS log_price,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       round(sqrt(l_extendedprice), 6) AS sqrt_price
FROM lineitem
"""


def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction both via path string and via from_json(schema)."""
    (events,) = load(spark, sf, "events")
    parsed = F.from_json("props", "k BIGINT")
    return (
        events.withColumn(
            "k1", F.get_json_object("props", "$.k").cast("long")
        )
        .withColumn("k2", parsed.getField("k"))
        .filter(F.col("k1") == F.col("k2"))  # both paths agree
        .groupBy("event_type")
        .agg(
            F.sum("k1").alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


# WHERE k IS NOT NULL mirrors the Spark side's k1 == k2 filter (NULL ==
# NULL is not true, so Spark drops rows whose props lacks 'k'); without
# it the two engines would diverge on any row missing the key.
SQL_JSON_PROPS = """
SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n
FROM (SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
WHERE k IS NOT NULL
GROUP BY event_type
"""


def q_map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """MapType construction + element_at; oracle computes the same values
    directly (the map is Spark-side plumbing being exercised)."""
    (events,) = load(spark, sf, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("val")),
        F.array(F.col("event_type"), F.round("value", 2).cast("string")),
    )
    return events.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "val").alias("m_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


SQL_MAP_FUNCS = """
SELECT event_id, event_type AS m_type,
       CAST(round(value, 2) AS VARCHAR) AS m_val,
       CAST(2 AS BIGINT) AS n_keys
FROM events
"""


# --------------------------------------------------------------------------
# time windows (batch equivalents of the streaming surface, SURVEY §2.B)
# --------------------------------------------------------------------------


def q_tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    (events,) = load(spark, sf, "events")
    win = F.window("ts", "1 hour")
    return (
        events.groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


SQL_TUMBLING_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sliding_1h_15m(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding window: each event lands in 4 overlapping 1-hour windows."""
    (events,) = load(spark, sf, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        events.groupBy(win)
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )


SQL_SLIDING_1H_15M = """
SELECT strftime(
         make_timestamp(((epoch_us(ts) // 1000000 // 900) * 900 - k.k * 900)
                        * 1000000),
         '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
GROUP BY 1
"""


def q_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """30-minute-gap session windows per user (native session_window vs
    DuckDB gap-island SQL)."""
    (events,) = load(spark, sf, "events")
    win = F.session_window("ts", "30 minutes")
    return (
        events.groupBy(win, "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"),
                          "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


SQL_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
islands AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM islands GROUP BY user_id, sess
"""


QUERIES: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "predicates": (q_predicates, SQL_PREDICATES),
    "join_orders_customer": (q_join_orders_customer, SQL_JOIN_ORDERS_CUSTOMER),
    "broadcast_part_revenue": (
        q_broadcast_part_revenue, SQL_BROADCAST_PART_REVENUE),
    "outer_customer_orders": (
        q_outer_customer_orders, SQL_OUTER_CUSTOMER_ORDERS),
    "full_outer_daily_activity": (
        q_full_outer_daily_activity, SQL_FULL_OUTER_DAILY_ACTIVITY),
    "semi_customers_with_orders": (
        q_semi_customers_with_orders, SQL_SEMI_CUSTOMERS_WITH_ORDERS),
    "anti_customers_without_orders": (
        q_anti_customers_without_orders, SQL_ANTI_CUSTOMERS_WITHOUT_ORDERS),
    "theta_nation_region": (q_theta_nation_region, SQL_THETA_NATION_REGION),
    "asof_purchase_click": (q_asof_purchase_click, SQL_ASOF_PURCHASE_CLICK),
    "range_join_value_bins": (
        q_range_join_value_bins, SQL_RANGE_JOIN_VALUE_BINS),
    "salted_skew_join": (q_salted_skew_join, SQL_SALTED_SKEW_JOIN),
    "count_distinct": (q_count_distinct, SQL_COUNT_DISTINCT),
    "approx_distinct": (q_approx_distinct, None),
    "rollup_flag_status": (q_rollup_flag_status, SQL_ROLLUP_FLAG_STATUS),
    "cube_flag_status": (q_cube_flag_status, SQL_CUBE_FLAG_STATUS),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "stats_aggregates": (q_stats_aggregates, SQL_STATS_AGGREGATES),
    "median_quantity": (q_median_quantity, SQL_MEDIAN_QUANTITY),
    "collect_sorted_list": (q_collect_sorted_list, SQL_COLLECT_SORTED_LIST),
    "window_rank_orders": (q_window_rank_orders, SQL_WINDOW_RANK_ORDERS),
    "window_lag_events": (q_window_lag_events, SQL_WINDOW_LAG_EVENTS),
    "window_running_sum": (q_window_running_sum, SQL_WINDOW_RUNNING_SUM),
    "window_range_frame": (q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "ntile_customers": (q_ntile_customers, SQL_NTILE_CUSTOMERS),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "set_ops_all": (q_set_ops_all, SQL_SET_OPS_ALL),
    "exists_subquery": (q_exists_subquery, SQL_EXISTS_SUBQUERY),
    "pivot_region_revenue": (q_pivot_region_revenue, SQL_PIVOT_REGION_REVENUE),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "regexp_funcs": (q_regexp_funcs, SQL_REGEXP_FUNCS),
    "date_funcs": (q_date_funcs, SQL_DATE_FUNCS),
    "math_funcs": (q_math_funcs, SQL_MATH_FUNCS),
    "json_props": (q_json_props, SQL_JSON_PROPS),
    "map_funcs": (q_map_funcs, SQL_MAP_FUNCS),
    "tumbling_hourly": (q_tumbling_hourly, SQL_TUMBLING_HOURLY),
    "sliding_1h_15m": (q_sliding_1h_15m, SQL_SLIDING_1H_15M),
    "session_windows": (q_session_windows, SQL_SESSION_WINDOWS),
}
