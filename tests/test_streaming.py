"""Streaming surface tests (SURVEY.md §2.B streaming rows, §5 layer 6).

Deterministic micro-batching: each test writes one source file, drains
the query with trigger(availableNow) into a restartable sink, writes the
next file, and resumes from the same checkpoint — the offset log carries
the event-time watermark and the state store across runs, so watermark
advancement and per-key state transitions are exactly predictable.
"""

from __future__ import annotations

import pandas as pd

from commentsearchengine_spark.sources.icelite import Catalog
from commentsearchengine_spark.streaming import demo


def _write_batch(spark, path: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf, demo.EVENTS_DDL)
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def drain():
        demo.run_to_parquet(
            demo.windowed_counts_with_watermark(
                demo.read_event_stream(spark, src)),
            out, ck)

    # batch 1: events up to 12:00 -> watermark after batch = 11:50
    _write_batch(spark, src, [
        (1, "2024-01-01 10:10:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:40:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 12:00:00", 1, "view", 1.0, "{}"),
    ])
    drain()
    # batch 2: one on-time row + one too-late row (09:30 < 11:50)
    _write_batch(spark, src, [
        (4, "2024-01-01 12:10:00", 1, "view", 1.0, "{}"),
        (5, "2024-01-01 09:30:00", 1, "view", 99.0, "{}"),  # LATE -> dropped
    ])
    drain()
    # batch 3: advance watermark past 13:10 so the 12:00 window emits
    _write_batch(spark, src, [
        (6, "2024-01-01 15:00:00", 1, "view", 1.0, "{}"),
    ])
    drain()

    rows = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window emitted both on-time rows; the late 09:30 row was
    # dropped (no 09:00 window); the 12:00 window has rows 3 and 4
    assert rows[("2024-01-01 10:00:00", "view")] == 2
    assert ("2024-01-01 09:00:00", "view") not in rows
    assert rows[("2024-01-01 12:00:00", "view")] == 2


def test_stateful_token_bucket_across_batches(spark, tmp_path):
    src, ck = (str(tmp_path / d) for d in ("src", "ck"))
    collected: list[tuple] = []

    def sink(batch_df, _epoch):
        collected.extend(
            (r["batch_requests"], r["admitted"], r["tokens"])
            for r in batch_df.collect()
        )

    def drain():
        demo.run_foreach_batch(
            demo.stateful_token_bucket(demo.read_event_stream(spark, src)),
            sink, ck)

    mk = lambda i, n: [  # noqa: E731
        (i * 100 + j, f"2024-01-01 10:0{i}:00", 7, "req", 1.0, "{}")
        for j in range(n)
    ]
    _write_batch(spark, src, mk(0, 8))   # 8 requests, capacity 5
    drain()
    _write_batch(spark, src, mk(1, 1))   # 1 request
    drain()
    # batch 1: tokens=5 -> admit 5 of 8, tokens -> min(5, 5-5+2)=2
    # batch 2: tokens=2 -> admit 1 of 1, tokens -> min(5, 2-1+2)=3
    assert sorted(collected) == [(1, 1, 3.0), (8, 5, 2.0)]


def test_foreach_batch_icelite_sink(spark, tmp_path):
    src, ck = (str(tmp_path / d) for d in ("src", "ck"))
    root = str(tmp_path / "cat")
    _write_batch(spark, src, [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 2, "view", 1.0, "{}"),
    ])
    commits = demo.run_icelite_sink(
        demo.read_event_stream(spark, src), root, ck)
    _write_batch(spark, src, [
        (3, "2024-01-01 10:02:00", 3, "view", 1.0, "{}"),
    ])
    commits += demo.run_icelite_sink(
        demo.read_event_stream(spark, src), root, ck)
    assert [c["rows"] for c in commits] == [2, 1]
    cat = Catalog(root)
    total = cat.scan(spark, "events", schema_ddl=demo.EVENTS_DDL).count()
    assert total == 3
    # time travel: first snapshot sees only micro-batch 0
    first = cat.scan(spark, "events", snapshot_id=commits[0]["snapshot_id"],
                     schema_ddl=demo.EVENTS_DDL).count()
    assert first == 2
