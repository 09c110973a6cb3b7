"""Frontier-machinery scale drive (no fetch): evidence that per-wave
scheduler cost is bounded by the ADMITTED set, not the frontier size.

Builds an icelite catalog whose frontier has a FIXED head tier
(admissible shallow rows) and a GROWING deep tail — the shape of a
10^10-row production frontier, where discoveries pile up far faster
than politeness budgets drain them — then times:

- ``admit_pruned`` (manifest-pruned two-pass Q1): reads only head files;
  should stay near-FLAT as the tail grows 5M -> 20M -> 80M;
- plain ``admit`` over the full frontier (the pre-pruning plan): scales
  with total rows — the O(frontier)-per-wave term the pruned path
  removes;
- within-wave dedup + token update over the same admitted set.

Usage: python tools/frontier_scale.py [n_rows] [cores] [head_rows]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_rows: int, cores: int, head_rows: int) -> None:
    from pyspark.sql import SparkSession, functions as F

    import commentsearchengine_spark.schemas as S
    from commentsearchengine_spark.operators import admission
    from commentsearchengine_spark.operators.dedup import dedup_within_wave
    from commentsearchengine_spark.sources.icelite import Catalog

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("frontier-scale")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_hosts = 20_000

    def synth_frontier(n: int, priority_expr):
        return (
            spark.range(n)
            .withColumn(
                "host",
                F.concat(
                    F.lit("site"),
                    F.pmod(F.hash("id"), F.lit(n_hosts)).cast("string"),
                    F.lit(".example.org"),
                ),
            )
            .select(
                F.concat(
                    F.lit("https://"), F.col("host"), F.lit("/p/"),
                    F.hex(F.xxhash64("id")), F.lit("/"),
                ).alias("canon_url"),
                "host",
                F.xxhash64("id").alias("url_hash"),
                priority_expr.cast("int").alias("priority"),
                F.lit(1).alias("depth"),
                F.lit(1).alias("disc_wave"),
                F.col("id").alias("disc_seq"),
                F.lit(0).cast("long").alias("parent_hash"),
            )
        )

    tail_rows = max(0, n_rows - head_rows)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="frontier_scale_", dir=base)
    try:
        cat = Catalog(root).init()
        head = synth_frontier(head_rows, F.pmod(F.col("id"), F.lit(2)))
        tail = synth_frontier(tail_rows, F.lit(5) + F.pmod(F.col("id"), F.lit(4)))
        t0 = time.monotonic()
        cat.stage_write(
            head.repartitionByRange(max(1, cores), "priority", "disc_seq"),
            "frontier", mode="stage-append")
        if tail_rows:
            cat.stage_write(
                tail.repartitionByRange(
                    max(1, tail_rows // 2_500_000 + 1), "priority",
                    "disc_seq"),
                "frontier", mode="stage-append")
        cat.commit(wave=0)
        t_build = time.monotonic() - t0

        hosts = (
            spark.range(n_hosts)
            .select(
                F.concat(F.lit("site"), F.col("id").cast("string"),
                         F.lit(".example.org")).alias("host"),
                F.lit(16.0).alias("tokens"),
                F.lit(16.0).alias("capacity"),
                F.lit(8.0).alias("refill_per_wave"),
                F.lit(1.0).alias("crawl_delay"),
                # accurate live backlog, as the engine maintains it
                F.lit((n_rows + n_hosts - 1) // n_hosts).cast("long")
                .alias("frontier_rows"),
            )
            .persist()
        )
        hosts.count()

        t0 = time.monotonic()
        persists: list = []
        ranked = admission.admit_pruned(
            spark, cat, hosts, S.FRONTIER, persists=persists).persist()
        admitted = admission.assign_global_seq(ranked, 0)
        n_admitted = admitted.count()
        t_pruned = time.monotonic() - t0

        frontier_full = cat.scan(spark, "frontier", schema_ddl=S.FRONTIER)
        t0 = time.monotonic()
        n_admitted_full = admission.admit(frontier_full, hosts).count()
        t_full = time.monotonic() - t0

        admitted_p = admitted.persist()
        admitted_p.count()
        t0 = time.monotonic()
        admission.update_tokens(hosts, admitted_p).count()
        t_tokens = time.monotonic() - t0

        t0 = time.monotonic()
        n_dedup = dedup_within_wave(
            frontier_full.filter(F.col("priority") <= 1)).count()
        t_dedup = time.monotonic() - t0

        print(json.dumps({
            "frontier_rows": n_rows,
            "head_rows": head_rows,
            "cores": cores,
            "build_sec": round(t_build, 2),
            "admitted": n_admitted,
            "admitted_full_plan": n_admitted_full,
            "admission_pruned_sec": round(t_pruned, 2),
            "admission_full_sec": round(t_full, 2),
            "full_rows_per_sec": round(n_rows / t_full),
            "head_dedup_rows": n_dedup,
            "head_dedup_sec": round(t_dedup, 2),
            "token_update_sec": round(t_tokens, 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
        int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000,
    )
