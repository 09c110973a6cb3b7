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
from ..operators.dedup import anti_join_exact, dedup_within_wave, make_host_budget_udf
from ..operators.robots import aggregate_rules, robots_table, with_robots_verdict
from ..sources.icelite import Catalog

FRONTIER_COLS = [c.split(" ")[0] for c in schemas.FRONTIER.split(", ")]
PAGES_COLS = [c.split(" ")[0] for c in schemas.PAGES.split(", ")]


def _lineage_singlepass(wave: int, n_buckets: int,
                        sources: dict[str, DataFrame]) -> DataFrame:
    """Per-bucket lineage counters in ONE shuffle: tag each contributing
    relation with its counter name, union, and pivot with sum(when) —
    instead of one groupBy + full-outer join per counter (which costs a
    job chain per wave; at 100 TB each extra barrier is a cluster-wide
    stall).  Derived counters: politeness_deferred = frontier - admitted,
    deduped = allowed - queued (same algebra as the oracle)."""

    def tag(name: str) -> DataFrame:
        return sources[name].select(
            bucket_col(F.col("host"), n_buckets).alias("bucket"),
            F.lit(name).alias("tag"),
        )

    tagged = None
    for name in sources:
        t = tag(name)
        tagged = t if tagged is None else tagged.unionByName(t)

    def n(name: str | None):
        if name is None or name not in sources:
            return F.lit(0).cast("long")
        return F.sum(F.when(F.col("tag") == name, 1).otherwise(0)).cast("long")

    # counter -> (positive tag, negative tag)
    spec: dict[str, tuple[str | None, str | None]] = {
        "fetched": ("admitted", None),
        "queued": ("queued", None),
        "deduped": ("allowed", "queued") if "allowed" in sources
        else ("deduped", None),
        "robots_blocked": ("robots_blocked", None),
        "politeness_deferred": ("frontier", "admitted"),
    }
    return tagged.groupBy("bucket").agg(
        *[(n(pos) - n(neg)).alias(col) for col, (pos, neg) in spec.items()]
    ).select(
        F.lit(wave).alias("wave"), "bucket",
        *[F.col(c).cast("long").alias(c) for c in spec],
    )


def universe_hosts(cfg: EngineConfig) -> list[str]:
    return [synth.SEED_HOST] + [synth.host_name(i) for i in range(cfg.n_hosts)]


def bootstrap(spark: SparkSession, cat: Catalog, cfg: EngineConfig) -> int:
    """Wave 0 — robots table + seed ingest (op S1) → first snapshot."""
    cat.init()
    robots = robots_table(spark, universe_hosts(cfg))
    rules_agg = aggregate_rules(robots)

    import pandas as pd

    urls = synth.seed_urls(cfg.n_seeds, cfg.seed_spread_hosts)
    seeds = spark.createDataFrame(  # pandas -> Arrow path: a plain list of
        # tuples serializes row-by-row through py4j (seconds at 10^5 seeds)
        pd.DataFrame({"disc_seq": range(len(urls)), "url": urls}),
        "disc_seq long, url string")
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
        .withColumn("_b", make_host_budget_udf(cfg.budget_scale)(F.col("host")))
        .select(
            "host", F.col("_b.capacity").alias("tokens"),
            F.col("_b.capacity"), F.col("_b.refill_per_wave"),
            F.col("_b.crawl_delay"))
    )

    lineage = _lineage_singlepass(
        0, cfg.n_buckets,
        {"queued": frontier, "deduped": dups, "robots_blocked": blocked},
    )

    from concurrent.futures import ThreadPoolExecutor

    boot_writes = [
        ("robots", robots, "overwrite"),
        ("frontier", frontier.repartition(4, "host"), "overwrite"),
        ("hosts", hosts, "overwrite"),
        ("lineage", lineage, "overwrite"),
    ]
    with ThreadPoolExecutor(max_workers=len(boot_writes)) as pool:
        for fut in [
            pool.submit(cat.stage_write, df, name, mode)
            for name, df, mode in boot_writes
        ]:
            fut.result()
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

    timings: dict[str, float] = {}

    def _mark(name: str, since: list[float]) -> None:
        now = time.monotonic()
        timings[name] = round(now - since[0], 3)
        since[0] = now

    tick = [time.monotonic()]

    # ---- Q1/O1: admission + crawl order -----------------------------------
    admitted = admission.assign_global_seq(
        admission.admit(frontier, hosts), base).persist()
    n_admitted = admitted.count()
    _mark("admit", tick)

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
        salted.repartition(par * 4, "host", "salt"), wave, cfg.n_hosts).persist()
    pages_new = fetched.select(*PAGES_COLS)

    # ---- expansion: C1 → P2 → D1 → B2/B3 ----------------------------------
    # outlinks arrive pre-canonicalized from the fetch pass (see fetch.py)
    cand = fetched.select(
        F.col("parent_url_hash").alias("parent_hash"),
        F.col("depth").alias("parent_depth"),
        F.col("fetched_seq").alias("parent_seq"),
        F.explode("outlinks").alias("ol"),
    ).select(
        "parent_hash", "parent_depth", "parent_seq",
        F.col("ol.j").alias("j"),
        F.col("ol.canon_url").alias("canon_url"),
        F.col("ol.host").alias("host"), F.col("ol.path").alias("path"),
    )
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
        .withColumn("_b", make_host_budget_udf(cfg.budget_scale)(F.col("host")))
        .select("host", F.col("_b.capacity").alias("tokens"),
                F.col("_b.capacity"), F.col("_b.refill_per_wave"),
                F.col("_b.crawl_delay")))
    hosts_next = hosts_updated.unionByName(new_hosts)

    # ---- L1: lineage (one shuffle for all five counters) ------------------
    lineage = _lineage_singlepass(
        wave, nb,
        {
            "frontier": frontier,
            "admitted": admitted,
            "allowed": allowed,
            "queued": new_entries,
            "robots_blocked": blocked,
        },
    )

    # ---- S3/K1: writes + atomic snapshot commit ---------------------------
    # materialize the expansion chain once (fills the persists) ...
    n_new = new_entries.count()
    _mark("expand", tick)
    # ... then the seven table writes are independent jobs over persisted
    # inputs: run them from concurrent driver threads so wall-time is
    # max(write) not sum(write).  On a cluster this overlaps executor IO
    # with the driver's job-scheduling latency per table.
    writes: list[tuple[str, DataFrame, str]] = [
        ("frontier", frontier_next.repartition(
            max(4, min(nb, par)), "host"), "overwrite"),
        ("seen", seen_new.repartition(2), "append"),
        ("hosts", hosts_next.coalesce(1), "overwrite"),
        ("crawl_log", crawl_log_new.coalesce(1), "append"),
        ("lineage", lineage.coalesce(1), "append"),
        ("pages", pages_new, "append"),
        ("bloom_shards", shards_updated, "overwrite"),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        futs = {
            name: pool.submit(cat.stage_write, df, name, mode)
            for name, df, mode in writes
        }
        for name, fut in futs.items():
            fut.result()
    _mark("writes", tick)
    wall = time.monotonic() - t0
    metrics = {
        "wave": wave, "admitted": n_admitted, "new_frontier": n_new,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_admitted / wall, 2) if wall > 0 else None,
        "phases": timings,
    }
    cat.commit(
        wave=wave,
        state={"global_seq": base + n_admitted,
               "config_hash": cfg.config_hash()},
        metrics=metrics)

    for df in (frontier, admitted, remaining, shards_updated, fetched,
               judged, allowed, new_entries):
        df.unpersist()
    bloom.release_broadcasts()  # probe jobs are done once writes commit
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
    elif snap.state.get("config_hash") != cfg.config_hash():
        # resuming with different semantics-affecting knobs would silently
        # mix two crawl definitions and break oracle parity — the exact
        # guarantee the recorded hash exists to protect
        raise ValueError(
            f"resume config mismatch at {root}: snapshot has "
            f"config_hash={snap.state.get('config_hash')!r}, requested "
            f"{cfg.config_hash()!r}; start a fresh catalog root or rerun "
            "with the original EngineConfig"
        )
    while snap.wave < cfg.n_waves:
        run_wave(spark, cat, cfg)
        snap = cat.load_snapshot()
    return cat
