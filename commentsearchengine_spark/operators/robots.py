"""Op P2 — robots.txt rule evaluation, fully native (SURVEY.md §2.A).

Semantics (shared with oracle.seqcrawl.robots_allows): RFC 9309
longest-prefix match wins; tie → allow; no matching rule → allow.

Plan shape: the per-host rules are pre-aggregated into
``host → array<struct<plen,allow,prefix>>`` and broadcast; candidates
equi-join on host (broadcast hash join, no shuffle), then a higher-order
``array_max(filter(...))`` picks the longest matching rule inside
whole-stage codegen — zero Python workers, zero extra shuffles.
Struct comparison is field-order lexicographic, so max of
(plen, allow) == "longest prefix, tie → allow" exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fixtures import synth
from .. import schemas


def robots_table(spark: SparkSession, hosts: list[str]) -> DataFrame:
    """Materialize the deterministic synthetic rule corpus for a host
    universe (in production this table would be fed by robots.txt
    fetches; here rules derive from fixtures/synth.py)."""
    rows = []
    for h in hosts:
        for rule, prefix, order in synth.robots_rules(h):
            rows.append((h, rule, prefix, order))
    if not rows:
        return spark.createDataFrame([], schemas.ROBOTS)
    return spark.createDataFrame(rows, schemas.ROBOTS)


def aggregate_rules(robots: DataFrame) -> DataFrame:
    """host → sorted array<struct<plen int, allow int, prefix string>>."""
    return robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path_prefix").alias("plen"),
                (F.col("rule") == "allow").cast("int").alias("allow"),
                F.col("path_prefix").alias("prefix"),
            )
        ).alias("rules")
    )


def with_robots_verdict(candidates: DataFrame, rules_agg: DataFrame,
                        path_col: str = "path") -> DataFrame:
    """Adds boolean ``robots_allowed``.  ``candidates`` needs (host, path)."""
    joined = candidates.join(F.broadcast(rules_agg), "host", "left")
    matching = F.filter(
        "rules", lambda r: F.col(path_col).startswith(r["prefix"])
    )
    best = F.array_max(matching)
    return joined.withColumn(
        "robots_allowed",
        F.coalesce(best["allow"] == 1, F.lit(True)),
    ).drop("rules")
