"""Wave-synchronous crawl plan (SURVEY.md §3.1) — the production path.

Each crawl wave is ONE Spark batch job ending in ONE atomic icelite
snapshot commit (the wave barrier), per BASELINE.json:6.  The dataflow:

  frontier ──admit(Q1: host-window rank ≤ floor(tokens))──▶ admitted
     │                │
     │                ├─ global_seq (O1: prefix-sum offsets, no global sort)
     │                ├─ crawl_log / seen append
     │                ├─ token-bucket update (P1)
     │                └─ fetch (F1/F2/F3: mapInPandas, salted repartition P0b)
     │                        └─ outlinks ─ canonicalize (C1, Arrow UDF)
     │                             └─ robots gate (P2, broadcast+HOF)
     │                                  └─ D1 dedup ─ bloom B2 ─ B3 anti-joins
     └──────────────── remaining ────────────────────▶ frontier′ = remaining ∪ new

Every ordering decision uses the total orders of §1.4, so the result is
bit-identical to oracle/seqcrawl.py at ANY partition count — that is the
"crawl-order + URL-seen exact match vs reference" gate (BASELINE.json:2).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import schemas
from ..config import DISC_SEQ_STRIDE, EngineConfig
from ..fixtures import synth
from ..functions.spark_cols import bucket_col, murmur64_col
from ..operators import admission, bloom
from ..operators.canonicalize import with_canonical
from ..operators.dedup import anti_join_exact, dedup_within_wave, host_budget_udf
from ..operators.robots import aggregate_rules, robots_table, with_robots_verdict
from ..sources.icelite import Catalog

FRONTIER_COLS = [c.split(" ")[0] for c in schemas.FRONTIER.split(", ")]
PAGES_COLS = [c.split(" ")[0] for c in schemas.PAGES.split(", ")]


def _bucket_counts(df: DataFrame, n_buckets: int, name: str) -> DataFrame:
    return (
        df.groupBy(bucket_col(F.col("host"), n_buckets).alias("bucket"))
        .agg(F.count("*").alias(name))
    )


def _lineage_df(spark: SparkSession, wave: int, n_buckets: int,
                **counts: DataFrame) -> DataFrame:
    """Full-outer join per-bucket counters into one lineage frame."""
    out: DataFrame | None = None
    for _name, cdf in counts.items():
        out = cdf if out is None else out.join(cdf, "bucket", "full")
    assert out is not None
    cols = ["fetched", "queued", "deduped", "robots_blocked",
            "politeness_deferred"]
    for c in cols:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(0))
    return out.select(
        F.lit(wave).alias("wave"), "bucket",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in cols],
    )


def universe_hosts(cfg: EngineConfig) -> list[str]:
    return [synth.SEED_HOST] + [synth.host_name(i) for i in range(cfg.n_hosts)]


def bootstrap(spark: SparkSession, cat: Catalog, cfg: EngineConfig) -> int:
    """Wave 0 — robots table + seed ingest (op S1) → first snapshot."""
    cat.init()
    robots = robots_table(spark, universe_hosts(cfg))
    rules_agg = aggregate_rules(robots)

    seeds = spark.createDataFrame(
        list(enumerate(synth.seed_urls(cfg.n_seeds))), "disc_seq long, url string")
    cand = with_canonical(seeds)  # adds canon_url, host, path

    w = Window.partitionBy("canon_url").orderBy("disc_seq")
    first = cand.withColumn("_rn", F.row_number().over(w))
    survivors = first.filter(F.col("_rn") == 1).drop("_rn")
    dups = first.filter(F.col("_rn") > 1)

    judged = with_robots_verdict(survivors, rules_agg).persist()
    allowed = judged.filter(F.col("robots_allowed"))
    blocked = judged.filter(~F.col("robots_allowed"))

    frontier = allowed.select(
        F.col("canon_url"),
        F.col("host"),
        murmur64_col(F.col("canon_url")).alias("url_hash"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("disc_wave"),
        F.col("disc_seq"),
        F.lit(0).cast("long").alias("parent_hash"),
    ).persist()

    hosts = (
        frontier.select("host").distinct()
        .withColumn("_b", host_budget_udf(F.col("host")))
        .select(
            "host", F.col("_b.capacity").alias("tokens"),
            F.col("_b.capacity"), F.col("_b.refill_per_wave"),
            F.col("_b.crawl_delay"))
    )

    lineage = _lineage_df(
        spark, 0, cfg.n_buckets,
        queued=_bucket_counts(frontier, cfg.n_buckets, "queued"),
        deduped=_bucket_counts(dups, cfg.n_buckets, "deduped"),
        robots_blocked=_bucket_counts(blocked, cfg.n_buckets, "robots_blocked"),
    )

    cat.stage_write(robots, "robots")
    cat.stage_write(frontier.repartition(4, "host"), "frontier")
    cat.stage_write(hosts, "hosts")
    cat.stage_write(lineage, "lineage")
    sid = cat.commit(
        wave=0,
        state={"global_seq": 0, "config_hash": cfg.config_hash()},
        metrics={"seeds": cfg.n_seeds},
    )
    judged.unpersist()
    frontier.unpersist()
    return sid


def run_wave(spark: SparkSession, cat: Catalog, cfg: EngineConfig) -> dict:
    """One crawl wave = one batch job + one snapshot commit."""
    t0 = time.monotonic()
    snap = cat.load_snapshot()
    assert snap is not None, "bootstrap first"
    assert snap.state["config_hash"] == cfg.config_hash(), "config drift"
    wave = snap.wave + 1
    base = int(snap.state["global_seq"])
    nb = cfg.n_buckets

    frontier = cat.scan(spark, "frontier", schema_ddl=schemas.FRONTIER).persist()
    hosts = cat.scan(spark, "hosts", schema_ddl=schemas.HOSTS)
    seen = cat.scan(spark, "seen", schema_ddl=schemas.SEEN)
    shards = cat.scan(spark, "bloom_shards", schema_ddl=schemas.BLOOM_SHARDS)
    rules_agg = aggregate_rules(cat.scan(spark, "robots", schema_ddl=schemas.ROBOTS))

    # ---- Q1/O1: admission + crawl order -----------------------------------
    admitted = admission.assign_global_seq(
        admission.admit(frontier, hosts), base).persist()
    n_admitted = admitted.count()

    crawl_log_new = admitted.select(
        F.lit(wave).alias("wave"), "host", "rank_in_host", "canon_url",
        "global_seq")
    seen_new = admitted.select(
        "canon_url", "url_hash", F.lit(wave).alias("first_wave"))
    seen_updated = seen.unionByName(seen_new)
    hosts_updated = admission.update_tokens(hosts, admitted)
    remaining = frontier.join(
        admitted.select("canon_url"), "canon_url", "left_anti").persist()

    # ---- B1: bloom covers seen_updated BEFORE any probe this wave ---------
    shards_updated = bloom.build_shards(seen_new, shards, cfg).persist()

    # ---- P0b + F1/F2/F3: salted fetch -------------------------------------
    par = spark.sparkContext.defaultParallelism
    salted = admitted.withColumn(
        "salt", F.pmod(F.hash("canon_url"), F.lit(cfg.salt_factor)))
    from ..operators.fetch import fetch_pages

    fetched = fetch_pages(
        salted.repartition(par, "host", "salt"), wave, cfg.n_hosts).persist()
    pages_new = fetched.select(*PAGES_COLS)

    # ---- expansion: C1 → P2 → D1 → B2/B3 ----------------------------------
    links = fetched.select(
        F.col("parent_url_hash").alias("parent_hash"),
        F.col("depth").alias("parent_depth"),
        F.col("fetched_seq").alias("parent_seq"),
        F.explode("outlinks").alias("ol"),
    ).select("parent_hash", "parent_depth", "parent_seq",
             F.col("ol.j").alias("j"), F.col("ol.raw").alias("url"))

    cand = with_canonical(links)
    judged = with_robots_verdict(cand, rules_agg).persist()
    blocked = judged.filter(~F.col("robots_allowed"))
    allowed = judged.filter(F.col("robots_allowed")).select(
        "canon_url", "host",
        murmur64_col(F.col("canon_url")).alias("url_hash"),
        (F.col("parent_depth") + 1).alias("priority"),
        (F.col("parent_depth") + 1).alias("depth"),
        F.lit(wave).alias("disc_wave"),
        (F.lit(DISC_SEQ_STRIDE).cast("long") * F.col("parent_seq")
         + F.col("j")).alias("disc_seq"),
        F.col("parent_hash"),
    ).persist()

    uniq = dedup_within_wave(allowed)
    probed = bloom.probe(uniq, shards_updated, cfg)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    not_seen = fresh.unionByName(anti_join_exact(maybe, seen_updated))
    new_entries = anti_join_exact(not_seen, remaining).select(
        *FRONTIER_COLS).persist()

    frontier_next = remaining.unionByName(new_entries)

    new_hosts = (
        new_entries.select("host").distinct()
        .join(hosts_updated.select("host"), "host", "left_anti")
        .withColumn("_b", host_budget_udf(F.col("host")))
        .select("host", F.col("_b.capacity").alias("tokens"),
                F.col("_b.capacity"), F.col("_b.refill_per_wave"),
                F.col("_b.crawl_delay")))
    hosts_next = hosts_updated.unionByName(new_hosts)

    # ---- L1: lineage -------------------------------------------------------
    frontier_b = _bucket_counts(frontier, nb, "f_total")
    admitted_b = _bucket_counts(admitted, nb, "fetched")
    deferred = (
        frontier_b.join(admitted_b.withColumnRenamed("fetched", "adm"),
                        "bucket", "full")
        .select("bucket",
                (F.coalesce("f_total", F.lit(0))
                 - F.coalesce("adm", F.lit(0))).alias("politeness_deferred")))
    allowed_b = _bucket_counts(allowed, nb, "a_total")
    queued_b = _bucket_counts(new_entries, nb, "queued")
    deduped = (
        allowed_b.join(queued_b.withColumnRenamed("queued", "q"),
                       "bucket", "full")
        .select("bucket",
                (F.coalesce("a_total", F.lit(0))
                 - F.coalesce("q", F.lit(0))).alias("deduped")))
    lineage = _lineage_df(
        spark, wave, nb,
        fetched=admitted_b,
        queued=queued_b,
        deduped=deduped,
        robots_blocked=_bucket_counts(blocked, nb, "robots_blocked"),
        politeness_deferred=deferred,
    ).filter(
        (F.col("fetched") + F.col("queued") + F.col("deduped")
         + F.col("robots_blocked") + F.col("politeness_deferred")) > 0)

    # ---- S3/K1: writes + atomic snapshot commit ---------------------------
    n_new = new_entries.count()
    cat.stage_write(frontier_next.repartition(
        max(4, min(nb, par)), "host"), "frontier")
    cat.stage_write(seen_new.repartition(2), "seen", mode="append")
    cat.stage_write(hosts_next.coalesce(1), "hosts")
    cat.stage_write(crawl_log_new.coalesce(1), "crawl_log", mode="append")
    cat.stage_write(lineage.coalesce(1), "lineage", mode="append")
    cat.stage_write(pages_new, "pages", mode="append")
    cat.stage_write(shards_updated, "bloom_shards")
    wall = time.monotonic() - t0
    metrics = {
        "wave": wave, "admitted": n_admitted, "new_frontier": n_new,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_admitted / wall, 2) if wall > 0 else None,
    }
    cat.commit(
        wave=wave,
        state={"global_seq": base + n_admitted,
               "config_hash": cfg.config_hash()},
        metrics=metrics)

    for df in (frontier, admitted, remaining, shards_updated, fetched,
               judged, allowed, new_entries):
        df.unpersist()
    return metrics


def run_crawl(spark: SparkSession, root: str, cfg: EngineConfig) -> Catalog:
    """Run (or resume — op K2) a crawl to cfg.n_waves.  Resume = point at
    an existing catalog root; the current snapshot carries wave number,
    global_seq and every table's file pins, so the next wave continues
    exactly where the last commit left off."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(cfg.arrow_batch_rows))
    cat = Catalog(root)
    snap = Catalog(root).init().load_snapshot()
    if snap is None:
        bootstrap(spark, cat, cfg)
        snap = cat.load_snapshot()
    while snap.wave < cfg.n_waves:
        run_wave(spark, cat, cfg)
        snap = cat.load_snapshot()
    return cat
