"""Full-crawl scaling ladder — the dedicated-run producer behind the
BENCH/BASELINE.md crawl table.

Runs the bench-shaped crawl (same config as bench.py's bench_crawl:
320k spread seeds, 3 waves, 4096x politeness budgets => 2.09M URLs) at
one pinned parallelism level and prints per-rep wall, URLs/s, and
per-wave phase timings.  Invoke once per level, each under taskset so
the JVM + Python workers see exactly that many CPUs:

    taskset -c 0-1  python tools/crawl_ladder.py 2
    taskset -c 0-7  python tools/crawl_ladder.py 8
    taskset -c 0-31 python tools/crawl_ladder.py 32

Efficiency N->4N = (urls_per_sec_4N / urls_per_sec_N) / 4, taking
min-wall (max URLs/s) per level across reps — the least-interfered
estimate on a VM with 6-22% hypervisor steal and 1.5-2x run variance.
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


def main(cores: int, reps: int) -> None:
    import bench

    from commentsearchengine_spark.config import EngineConfig
    from commentsearchengine_spark.plans.wave import run_crawl

    spark = bench.make_spark(cores)
    cfg = EngineConfig(
        n_seeds=320_000, n_waves=3, n_buckets=64, n_hosts=2000,
        bloom_shards=32, seed_spread_hosts=2000, budget_scale=4096.0,
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    results = []
    for rep in range(reps):
        root = tempfile.mkdtemp(prefix="ladder_", dir=base)
        try:
            t0 = time.monotonic()
            cat = run_crawl(spark, root, cfg)
            wall = time.monotonic() - t0
            snap = cat.load_snapshot()
            waves = []
            sid = snap.snapshot_id
            while sid is not None:
                s = cat.load_snapshot(sid)
                waves.append({"wave": s.wave, **(s.metrics or {})})
                sid = s.parent_id
            results.append({
                "rep": rep, "wall": round(wall, 2),
                "urls_per_sec": round(
                    int(snap.state["global_seq"]) / wall, 1),
                "waves": waves,
            })
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print("LADDER " + json.dumps({"cores": cores, "runs": results}))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
    )
