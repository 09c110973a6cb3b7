"""admit_pruned == admit, bit for bit (SURVEY §2.A op Q1).

The pruned two-pass admission (head-tier manifest scan + pass-2
fallback) must reproduce the plain whole-frontier window rank exactly,
including the awkward host shapes: deep-only hosts (zero head rows, must
reach pass 2), hosts with fewer rows than budget, zero-budget hosts, and
hosts whose head tier only partially covers their budget."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import commentsearchengine_spark.schemas as S
from commentsearchengine_spark.operators import admission
from commentsearchengine_spark.sources.icelite import Catalog


def _frontier_rows():
    rows = []
    seq = 0

    def add(host, priority, n):
        nonlocal seq
        for _ in range(n):
            seq += 1
            rows.append((
                f"https://{host}/p/{seq:06d}/", host, seq * 7919,
                priority, priority, 0, seq, 0,
            ))

    add("head.example.org", 0, 20)      # fully head-resident
    add("mixed.example.org", 0, 2)      # head cannot cover budget 5
    add("mixed.example.org", 6, 10)     # ... tail rows complete it (pass 2)
    add("deep.example.org", 7, 15)      # zero head rows (pass 2)
    add("tiny.example.org", 1, 3)       # fewer rows than budget
    add("nobudget.example.org", 0, 8)   # tokens 0 -> never admitted
    return rows


_BUDGETS = {
    "head.example.org": 6.7,
    "mixed.example.org": 5.2,
    "deep.example.org": 4.9,
    "tiny.example.org": 9.0,
    "nobudget.example.org": 0.4,  # floor == 0
}


def test_admit_pruned_matches_admit(spark):
    rows = _frontier_rows()
    frontier = spark.createDataFrame(rows, S.FRONTIER)
    counts = {h: sum(1 for r in rows if r[1] == h) for h in _BUDGETS}
    hosts = spark.createDataFrame(
        [(h, t, 16.0, 4.0, 1.0, counts[h], 0, 0) for h, t in _BUDGETS.items()],
        S.HOSTS,
    )

    root = tempfile.mkdtemp(prefix="admit-pruned-")
    try:
        cat = Catalog(root).init()
        # priority-tiered files, as plans/wave.py writes them
        cat.stage_write(
            frontier.filter(F.col("priority") <= 1).coalesce(1),
            "frontier", mode="stage-append")
        cat.stage_write(
            frontier.filter(F.col("priority") > 1).coalesce(1),
            "frontier", mode="stage-append")
        cat.commit(wave=0)

        def norm(df):
            # _src_file is admit_pruned's internal provenance column for
            # the wave's file-precise carry-forward — not part of the
            # admission result contract
            df = df.drop("_src_file")
            return sorted(
                tuple(r) for r in df.select(*sorted(df.columns)).collect()
            )

        want = norm(admission.admit(frontier, hosts))
        persists = []
        got = norm(admission.admit_pruned(
            spark, cat, hosts, S.FRONTIER, persists=persists))
        assert got == want
        assert len(want) > 0
        # sanity on the shapes the test exists for
        hosts_admitted = {
            r["host"]
            for r in admission.admit(frontier, hosts)
            .select("host").distinct().collect()
        }
        assert "deep.example.org" in hosts_admitted        # pass-2 only
        assert "mixed.example.org" in hosts_admitted       # split head/tail
        assert "nobudget.example.org" not in hosts_admitted
        for df in persists:
            df.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_admit_pruned_matches_admit_randomized(spark, seed):
    """Randomized frontiers: arbitrary priority mixes, lumpy budgets,
    files that straddle tiers, random head_factor — pruned admission
    must stay bit-equal to the whole-frontier rank."""
    import random

    rng = random.Random(seed)
    rows, budgets, seq = [], {}, 0
    for hi in range(25):
        host = f"h{hi:02d}.example.org"
        budgets[host] = rng.uniform(0.0, 20.0)
        n = rng.randint(0, 30)
        for _ in range(n):
            seq += 1
            rows.append((
                f"https://{host}/p/{seq:06d}/", host, seq * 31,
                rng.randint(0, 9), 0, rng.randint(0, 3), seq, 0,
            ))
    rng.shuffle(rows)
    frontier = spark.createDataFrame(rows, S.FRONTIER)
    counts = {h: sum(1 for r in rows if r[1] == h) for h in budgets}
    hosts = spark.createDataFrame(
        [(h, t, 20.0, 4.0, 1.0, counts[h], 0, 0) for h, t in budgets.items()],
        S.HOSTS,
    )

    root = tempfile.mkdtemp(prefix="admit-rand-")
    try:
        cat = Catalog(root).init()
        # random file layout, including tier-straddling files
        cuts = sorted(rng.sample(range(1, 9), 2))
        splits = [
            frontier.filter(F.col("priority") < cuts[0]),
            frontier.filter(
                (F.col("priority") >= cuts[0])
                & (F.col("priority") < cuts[1])),
            frontier.filter(F.col("priority") >= cuts[1]),
        ]
        for part in splits:
            cat.stage_write(part.coalesce(1), "frontier",
                            mode="stage-append")
        cat.commit(wave=0)

        def norm(df):
            # _src_file is admit_pruned's internal provenance column for
            # the wave's file-precise carry-forward — not part of the
            # admission result contract
            df = df.drop("_src_file")
            return sorted(
                tuple(r) for r in df.select(*sorted(df.columns)).collect()
            )

        want = norm(admission.admit(frontier, hosts))
        persists = []
        got = norm(admission.admit_pruned(
            spark, cat, hosts, S.FRONTIER,
            head_factor=rng.randint(1, 8), persists=persists))
        assert got == want, seed
        for df in persists:
            df.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_choose_cut_prefers_smallest_covering_tier():
    entries = [
        {"rows": 100, "stats": {"priority": [0, 0]}},
        {"rows": 100, "stats": {"priority": [1, 1]}},
        {"rows": 10_000, "stats": {"priority": [5, 9]}},
    ]
    assert admission.choose_cut(entries, 50) == 0
    assert admission.choose_cut(entries, 150) == 1
    assert admission.choose_cut(entries, 500) == 5
    # statless file => no pruning possible
    assert admission.choose_cut(
        entries + [{"rows": 1, "stats": {}}], 50) is None
    assert admission.choose_cut([], 10) is None
