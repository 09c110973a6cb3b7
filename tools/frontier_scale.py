"""Frontier-machinery scale drive (no fetch): admission window + prefix-sum
global ordering + within-wave dedup over a multi-million-row synthetic
frontier — evidence that the scheduler core (ops Q1/O1/D1/P1) sustains
frontier sizes far beyond what the full-crawl bench materializes.

Usage: python tools/frontier_scale.py [n_rows] [cores]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_rows: int, cores: int) -> None:
    from pyspark.sql import SparkSession, functions as F

    from commentsearchengine_spark.operators import admission
    from commentsearchengine_spark.operators.dedup import dedup_within_wave

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
    frontier = (
        spark.range(n_rows)
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
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("priority"),
            F.lit(1).alias("depth"),
            F.lit(1).alias("disc_wave"),
            F.col("id").alias("disc_seq"),
            F.lit(0).cast("long").alias("parent_hash"),
        )
        .persist()
    )
    frontier.count()
    hosts = (
        frontier.select("host").distinct()
        .withColumn("tokens", F.lit(64.0))
        .withColumn("capacity", F.lit(64.0))
        .withColumn("refill_per_wave", F.lit(32.0))
        .withColumn("crawl_delay", F.lit(1.0))
    ).persist()
    n_hosts_live = hosts.count()

    t0 = time.monotonic()
    admitted = admission.assign_global_seq(
        admission.admit(frontier, hosts), 0
    )
    n_admitted = admitted.count()
    t_admit = time.monotonic() - t0

    t0 = time.monotonic()
    n_dedup = dedup_within_wave(frontier).count()
    t_dedup = time.monotonic() - t0

    t0 = time.monotonic()
    hosts_next = admission.update_tokens(hosts, admitted)
    hosts_next.count()
    t_tokens = time.monotonic() - t0

    print(json.dumps({
        "frontier_rows": n_rows,
        "live_hosts": n_hosts_live,
        "cores": cores,
        "admitted": n_admitted,
        "admission_sec": round(t_admit, 2),
        "admission_rows_per_sec": round(n_rows / t_admit),
        "dedup_rows": n_dedup,
        "dedup_sec": round(t_dedup, 2),
        "token_update_sec": round(t_tokens, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
