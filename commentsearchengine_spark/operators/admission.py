"""Ops Q1/O1/P1 — priority-queue admission, crawl-order assembly, and
token-bucket update (SURVEY.md §2.A) — all native Column API.

Admission reproduces the oracle's per-host total order exactly:
rank by (priority, disc_wave, disc_seq, canon_url) inside a host
partition, admit the first floor(tokens(host)).  The window shuffle is
the engine's explicit host-hash partitioning (op P0) — rows for one
host meet in one partition; the per-host budget is ≤ capacity (≤16),
so the admitted set is tiny relative to the frontier.

Crawl-order (op O1) avoids a global single-partition sort: per-host
admitted counts (≤ #hosts rows) get a prefix-sum window, and the
offsets broadcast-join back — global_seq = base + offset(host) + rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ORDER_COLS = ["priority", "disc_wave", "disc_seq", "canon_url"]


def admit(frontier: DataFrame, hosts: DataFrame) -> DataFrame:
    """Returns frontier columns + rank_in_host for admitted rows only."""
    budgets = hosts.select(
        "host", F.floor("tokens").cast("long").alias("budget"))
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in ORDER_COLS])
    return (
        frontier.withColumn("rank_in_host", F.row_number().over(w))
        .join(F.broadcast(budgets), "host", "left")
        .filter(F.col("rank_in_host") <= F.coalesce("budget", F.lit(0)))
        .drop("budget")
    )


def assign_global_seq(admitted: DataFrame, base: int) -> DataFrame:
    """global_seq = base + prefix_sum(admitted counts by host ASC) + rank."""
    counts = admitted.groupBy("host").agg(
        F.count("*").alias("cnt"))
    w = Window.orderBy("host").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w), F.lit(0))).select(
        "host", "offset")
    return (
        admitted.join(F.broadcast(offsets), "host")
        .withColumn(
            "global_seq",
            F.lit(base) + F.col("offset") + F.col("rank_in_host"))
        .drop("offset")
    )


def update_tokens(hosts: DataFrame, admitted: DataFrame) -> DataFrame:
    """tokens' = min(capacity, tokens − admitted + refill_per_wave / max(1, crawl_delay)).

    Same expression tree as the oracle so IEEE double results are
    bit-identical."""
    admitted_counts = admitted.groupBy("host").agg(
        F.count("*").cast("double").alias("admitted_n"))
    return (
        hosts.join(admitted_counts, "host", "left")
        .withColumn("admitted_n", F.coalesce("admitted_n", F.lit(0.0)))
        .withColumn(
            "tokens",
            F.least(
                F.col("capacity"),
                F.col("tokens") - F.col("admitted_n")
                + F.col("refill_per_wave")
                / F.greatest(F.lit(1.0), F.col("crawl_delay")),
            ),
        )
        .drop("admitted_n")
    )
