"""Round benchmark (SURVEY.md §6) — prints ONE JSON line.

Measures three things:

1. ``queries`` — headline relational/search/pipeline queries at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` (default 32): per-query seconds.
2. ``crawl`` — full wave-synchronous crawl throughput (admitted+fetched
   URLs per second), the graft metric (BASELINE.json:2).
3. ``scaling`` — the N -> 4N evidence (BASELINE.json:14): the same
   fetch-dominated job at local[CPUS/4] vs local[CPUS] on the same
   input; efficiency = (thr_4N / thr_N) / 4.  This sandbox has no
   multi-node cluster, so parallelism levels stand in for executor
   counts (driver instruction; see BENCH section in BASELINE.md).

The fetch stage (image synth + codec + phash via mapInPandas) is the
scalable work; the scaling bench sizes it so it dominates wall-clock,
matching §6's protocol note.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FETCH = int(os.environ.get("SPARK_GRAFT_BENCH_FETCH", "60000"))

HEADLINE = [
    "pricing_summary",
    "broadcast_part_revenue",
    "outer_customer_orders",
    "window_rank_orders",
    "session_windows",
    "search_tfidf",
    "lsh_near_dup_pairs",
    "simhash",
    "cosine_topk",
    "ann_lsh_pairs",
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_queries(spark) -> dict[str, float]:
    from commentsearchengine_spark.relational.registry import QUERIES

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def bench_crawl(spark, cores: int) -> dict:
    """Full engine run: throughput = admitted URLs / total wall."""
    from commentsearchengine_spark.config import EngineConfig
    from commentsearchengine_spark.plans.wave import run_crawl
    from commentsearchengine_spark.sources.icelite import Catalog

    cfg = EngineConfig(
        n_seeds=40, n_waves=4, n_buckets=64, n_hosts=2000, bloom_shards=8
    )
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        t0 = time.monotonic()
        run_crawl(spark, root, cfg)
        wall = time.monotonic() - t0
        snap = Catalog(root).load_snapshot()
        admitted = int(snap.state["global_seq"])
        return {
            "cores": cores,
            "waves": cfg.n_waves,
            "urls_admitted": admitted,
            "wall_sec": round(wall, 2),
            "urls_per_sec": round(admitted / wall, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def fetch_job(spark, n_urls: int, cores: int) -> float:
    """The fetch-dominated stage (ops F1/F2/F3) over a synthetic
    frontier generated Spark-natively (no Python until the Arrow UDF)."""
    from pyspark.sql import functions as F

    from commentsearchengine_spark.operators.fetch import fetch_pages

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    frontier = (
        spark.range(n_urls)
        .withColumn(
            "host",
            F.concat(
                F.lit("site"),
                F.lpad(F.pmod(F.hash("id"), F.lit(2000)).cast("string"), 3, "0"),
                F.lit(".example.org"),
            ),
        )
        .withColumn(
            "canon_url",
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/politics/pg/"),
                F.hex(F.xxhash64("id")), F.lit("/"),
            ),
        )
        .select(
            "canon_url",
            "host",
            F.xxhash64("canon_url").alias("url_hash"),
            F.lit(1).alias("depth"),
            F.col("id").alias("global_seq"),
        )
        .repartition(cores * 4, "host")
    )
    t0 = time.monotonic()
    fetch_pages(frontier, wave=1, n_hosts=2000).select("phash").count()
    return time.monotonic() - t0


def main() -> None:
    results: dict = {"sf": SF_DIR, "cpus": CPUS}

    spark = make_spark(CPUS)
    t_all = time.monotonic()
    results["queries"] = bench_queries(spark)
    results["crawl"] = bench_crawl(spark, CPUS)
    thr_4n_wall = fetch_job(spark, N_FETCH, CPUS)
    spark.stop()

    small = max(1, CPUS // 4)
    spark_n = make_spark(small)
    thr_n_wall = fetch_job(spark_n, N_FETCH, small)
    crawl_n = bench_crawl(spark_n, small)
    spark_n.stop()

    thr_n = N_FETCH / thr_n_wall
    thr_4n = N_FETCH / thr_4n_wall
    results["scaling"] = {
        "job": f"fetch+codec+phash over {N_FETCH} URLs",
        "cores_n": small,
        "cores_4n": CPUS,
        "urls_per_sec_n": round(thr_n, 1),
        "urls_per_sec_4n": round(thr_4n, 1),
        "efficiency": round((thr_4n / thr_n) / (CPUS / small), 3),
        "crawl_urls_per_sec_n": crawl_n["urls_per_sec"],
        "crawl_urls_per_sec_4n": results["crawl"]["urls_per_sec"],
        "crawl_efficiency": round(
            (results["crawl"]["urls_per_sec"] / crawl_n["urls_per_sec"])
            / (CPUS / small),
            3,
        ),
    }
    total = round(time.monotonic() - t_all, 2)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": results["queries"],
                "sf": SF_DIR,
                "crawl": results["crawl"],
                "scaling": results["scaling"],
            }
        )
    )


if __name__ == "__main__":
    main()
