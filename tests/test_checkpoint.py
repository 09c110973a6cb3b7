"""Resume equivalence (SURVEY §5.5): N waves straight == k waves, stop,
resume to N — final tables identical (op K2)."""

import shutil
import tempfile

import commentsearchengine_spark.schemas as S
from commentsearchengine_spark.config import EngineConfig
from commentsearchengine_spark.plans.wave import run_crawl
from commentsearchengine_spark.sources.icelite import Catalog


def _tables(spark, cat):
    out = {}
    for t in ("crawl_log", "seen", "frontier", "hosts", "lineage"):
        df = cat.scan(spark, t, schema_ddl=S.ALL_TABLES[t])
        out[t] = sorted(tuple(r) for r in df.collect())
    return out


def test_resume_equivalence(spark):
    straight_root = tempfile.mkdtemp(prefix="icelite-straight-")
    resumed_root = tempfile.mkdtemp(prefix="icelite-resumed-")
    try:
        cat_a = run_crawl(spark, straight_root,
                          EngineConfig(n_seeds=8, n_waves=4, n_buckets=16))
        # run 2 waves, "crash" (just stop), then resume to 4
        run_crawl(spark, resumed_root,
                  EngineConfig(n_seeds=8, n_waves=2, n_buckets=16))
        cat_b = run_crawl(spark, resumed_root,
                          EngineConfig(n_seeds=8, n_waves=4, n_buckets=16))
        assert _tables(spark, cat_a) == _tables(spark, cat_b)
    finally:
        shutil.rmtree(straight_root, ignore_errors=True)
        shutil.rmtree(resumed_root, ignore_errors=True)


def test_failed_wave_is_resumable(spark, monkeypatch):
    """A write failure mid-wave (here: the seen append, one of the
    early writes that overlap the fetch) must abort the wave — surfaced
    by the fail-fast poll at the next phase boundary — WITHOUT
    committing anything; re-running the crawl then produces tables
    bit-identical to a never-failed run (staged files of the dead wave
    are replaced, the snapshot chain never saw it)."""
    straight_root = tempfile.mkdtemp(prefix="icelite-nofail-")
    failed_root = tempfile.mkdtemp(prefix="icelite-failed-")
    cfg = EngineConfig(n_seeds=8, n_waves=2, n_buckets=16)
    orig = Catalog.stage_write
    boom = {"armed": True}

    def flaky(self, df, table, mode="overwrite", partitions=None,
              partition_cols=None):
        if boom["armed"] and table == "seen" and mode == "append":
            boom["armed"] = False
            raise RuntimeError("injected seen-write failure")
        return orig(self, df, table, mode, partitions, partition_cols)

    try:
        cat_a = run_crawl(spark, straight_root, cfg)
        monkeypatch.setattr(Catalog, "stage_write", flaky)
        try:
            run_crawl(spark, failed_root, cfg)
            raise AssertionError("injected failure did not propagate")
        except RuntimeError as e:
            assert "injected seen-write failure" in str(e)
        # the dead wave must not have committed
        snap = Catalog(failed_root).load_snapshot()
        assert snap.wave == 0
        # resume after the fault clears: identical final state
        cat_b = run_crawl(spark, failed_root, cfg)
        assert _tables(spark, cat_a) == _tables(spark, cat_b)
    finally:
        shutil.rmtree(straight_root, ignore_errors=True)
        shutil.rmtree(failed_root, ignore_errors=True)


def test_time_travel(spark):
    root = tempfile.mkdtemp(prefix="icelite-tt-")
    try:
        cat = run_crawl(spark, root,
                        EngineConfig(n_seeds=5, n_waves=3, n_buckets=16))
        snaps = cat.snapshots()
        assert len(snaps) == 4  # bootstrap + 3 waves
        # crawl_log as of wave 1 is a strict prefix of wave 3's
        log_w1 = sorted(
            tuple(r) for r in cat.scan(
                spark, "crawl_log", snapshot_id=snaps[1],
                schema_ddl=S.CRAWL_LOG).collect())
        log_w3 = sorted(
            tuple(r) for r in cat.scan(
                spark, "crawl_log", schema_ddl=S.CRAWL_LOG).collect())
        assert set(log_w1) < set(log_w3)
        assert all(r[0] == 1 for r in log_w1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stale_or_failing_handoff_falls_back(spark):
    """The overlapped-admission guard: a handoff for the wrong wave, a
    wrong global_seq base, or one whose speculative job FAILED must be
    discarded (its cached relations released) with admission falling
    back to the normal path — crawl output identical either way."""
    from concurrent.futures import ThreadPoolExecutor

    from commentsearchengine_spark.plans import wave as W

    cfg = EngineConfig(n_seeds=8, n_waves=2, n_buckets=16)
    clean_root = tempfile.mkdtemp(prefix="handoff-clean-")
    poisoned_root = tempfile.mkdtemp(prefix="handoff-poisoned-")
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        cat_clean = run_crawl(spark, clean_root, cfg)

        cat = Catalog(poisoned_root)
        W.bootstrap(spark, cat.init(), cfg)
        released: list = []

        class FakeDF:
            def unpersist(self):
                released.append(True)

        def boom():
            raise RuntimeError("speculative job died")

        stale = {"wave": 999, "base": 0, "config_hash": cfg.config_hash(),
                 "future": pool.submit(lambda: None),
                 "persists": [FakeDF()]}
        failing = {"wave": 1, "base": 0, "config_hash": cfg.config_hash(),
                   "future": pool.submit(boom), "persists": [FakeDF()]}
        W.run_wave(spark, cat, cfg, handoff_slot=[stale])
        W.run_wave(spark, cat, cfg, handoff_slot=[failing])
        assert len(released) == 2  # both handoffs fully released
        assert _tables(spark, cat) == _tables(spark, cat_clean)
    finally:
        pool.shutdown(wait=True)
        shutil.rmtree(clean_root, ignore_errors=True)
        shutil.rmtree(poisoned_root, ignore_errors=True)


def test_resume_refuses_wrong_layout_or_config(spark):
    """Resuming a catalog written under an older on-disk layout (e.g. a
    bloom probed at the wrong bitmap size) or with drifted
    semantics-affecting config must fail loud, never silently corrupt
    dedup (op K2 guards)."""
    import json
    import os

    import pytest

    cfg = EngineConfig(n_seeds=4, n_waves=1, n_buckets=8)
    root = tempfile.mkdtemp(prefix="layout-guard-")
    try:
        cat = run_crawl(spark, root, cfg)
        with pytest.raises(ValueError, match="config_hash"):
            run_crawl(spark, root,
                      EngineConfig(n_seeds=4, n_waves=2, n_buckets=8,
                                   bloom_k=7))
        # doctor the current snapshot to an older layout version
        snap_path = os.path.join(
            root, "metadata",
            f"snap-{cat.current_snapshot_id():06d}.json")
        with open(snap_path) as f:
            d = json.load(f)
        d["state"]["layout_version"] = 2
        with open(snap_path, "w") as f:
            json.dump(d, f)
        with pytest.raises(ValueError, match="layout_version"):
            run_crawl(spark, root,
                      EngineConfig(n_seeds=4, n_waves=2, n_buckets=8))
    finally:
        shutil.rmtree(root, ignore_errors=True)
