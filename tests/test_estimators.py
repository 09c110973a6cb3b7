"""Accuracy bounds for the two estimator demos (rows-only in the driver
gate because estimates are estimator-specific — DuckDB's HLL is a
different implementation).  This pins the SEMANTICS locally instead:
the estimates must land within a generous multiple of the configured /
rated relative standard error of the exact answer, and the sketch-union
path must agree with the flat estimate (re-aggregation changes the
grouping, not the multiset of values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commentsearchengine_spark.relational.core import q_approx_distinct
from commentsearchengine_spark.relational.extras import q_hll_sketch_distinct
from commentsearchengine_spark.relational.util import load


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = q_approx_distinct(spark, sf_dir).collect()[0]
    exact, approx = row["exact_customers"], row["approx_customers"]
    assert exact > 0
    # configured rsd=0.02; 5 sigma keeps the test deterministic-safe
    assert abs(approx - exact) <= max(5 * 0.02 * exact, 1.0), (approx, exact)


def test_hll_sketch_union_within_rated_error(spark, sf_dir):
    row = q_hll_sketch_distinct(spark, sf_dir).collect()[0]
    (orders,) = load(spark, sf_dir, "orders")
    exact = orders.select(
        F.countDistinct("o_custkey").alias("n")
    ).collect()[0]["n"]
    approx = row["approx_total_customers"]
    # default lgConfigK=12 -> rsd ~ 1.04/sqrt(2^12) ~ 1.6%; allow 5 sigma
    assert abs(approx - exact) <= max(5 * 0.016 * exact, 1.0), (approx, exact)
    # union of per-priority sketches == one flat sketch over the column
    flat = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).collect()[0]["n"]
    assert approx == flat
    assert row["n_orders"] == orders.count()
