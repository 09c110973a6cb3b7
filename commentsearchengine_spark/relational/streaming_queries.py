"""Rows-only driver queries exercising the Structured Streaming surface.

SURVEY.md §2.B's streaming rows (watermark + late-drop, stateful
per-key, foreachBatch sink) were previously covered by pytest only;
these entries put the same machinery under the driver's CORRECTNESS
gate.  Each drives a REAL multi-micro-batch streaming job over the
`events` table replayed as a deterministic file stream (3 chronological
chunks, one drain per chunk with trigger(availableNow), shared
checkpoint — so the event-time watermark and the state store advance
across drains exactly as they would across live triggers).

Not SQL-expressible (watermark/state semantics live in the streaming
runtime), so the driver records the weaker rows-only check, like the
crawl_* entries.
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming import demo

# one replayed stream per (sf_dir, flavor) per process
_cache: dict[tuple, object] = {}

N_CHUNKS = 3
LATE_SLICE = 50  # oldest rows replayed in the LAST chunk => late


def _chunk_frames(spark: SparkSession, sf: str) -> list[pd.DataFrame]:
    """`events` split into N_CHUNKS chronological pandas chunks, except
    the LATE_SLICE oldest rows which are held back into the final chunk
    (they arrive behind the watermark -> exercise the late-drop path).

    CAVEAT (scale): this REPLAY HARNESS — not the streaming query it
    feeds — round-trips the events table through the driver (orderBy +
    toPandas + a per-process cache) to build a deterministic
    micro-batch sequence the DuckDB-checked gate can replay.  That is
    fine for the sf0.01 demo tables it serves; a production source
    would be Kafka/files via readStream with no driver materialization.
    Do not grow this path past demo scale."""
    key = (sf, "chunks")
    if key in _cache:
        return _cache[key]  # type: ignore[return-value]
    # driver collection bound: the whole demo events table — 15k rows at
    # sf0.01, ~150k at sf0.1 (a few MB); safe only because this replay
    # source is capped at demo scale by design (see module docstring)
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    late, on_time = ev.iloc[:LATE_SLICE], ev.iloc[LATE_SLICE:]
    n = len(on_time)
    bounds = [(i * n) // N_CHUNKS for i in range(N_CHUNKS + 1)]
    chunks = []
    for i in range(N_CHUNKS):
        chunk = on_time.iloc[bounds[i]:bounds[i + 1]]
        if i == N_CHUNKS - 1:
            chunk = pd.concat([chunk, late])
        chunks.append(chunk)
    _cache[key] = chunks
    return chunks


def _drain_chunks(spark: SparkSession, sf: str, build, run, tag: str):
    """Write chunk i into the query's source dir, then drain it with
    trigger(availableNow) against a SHARED checkpoint; repeat.  Chunk
    boundaries become micro-batch boundaries, and the checkpoint carries
    the event-time watermark + state store across drains (exactly the
    tests/test_streaming.py protocol)."""
    chunks = _chunk_frames(spark, sf)
    work = tempfile.mkdtemp(prefix=f"cse_stream_{tag}_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    results = []
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, demo.EVENTS_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(demo.EVENTS_DDL).parquet(src)
        results.append(run(build(stream), out, ck, i))
    return work, out, results


def q_streaming_watermark_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark + tumbling-window agg in append mode over 3
    micro-batches; windows emit only once the watermark passes them and
    the held-back oldest rows are dropped as late."""
    key = (sf, "wm")
    if key not in _cache:

        def run(df, out, ck, _i):
            demo.run_to_parquet(df, out, ck)

        work, out, _ = _drain_chunks(
            spark, sf, demo.windowed_counts_with_watermark, run, "wm"
        )
        # cache the materialized result and drop the work dir (source
        # replay + sink + checkpoint) — tmpfs-backed /tmp otherwise
        # accumulates a full events copy per process.  Driver collection
        # bound: the windowed AGGREGATE (hour x event_type ≈ thousands
        # of rows), never the raw events
        _cache[key] = spark.read.parquet(out).toPandas()
        shutil.rmtree(work, ignore_errors=True)
    return (
        spark.createDataFrame(
            _cache[key], "window_start string, event_type string, n long"
        )
        .groupBy("window_start", "event_type")
        .agg(F.sum("n").alias("n"))
        .orderBy("window_start", "event_type")
    )


def q_streaming_token_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful per-key streaming (applyInPandasWithState): the per-user
    token bucket carries tokens across micro-batches — the streaming
    analogue of the engine's per-host politeness op P1."""
    key = (sf, "bucket")
    if key not in _cache:
        frames: list[pd.DataFrame] = []

        def run(df, out, ck, i):
            def sink(batch_df: DataFrame, epoch_id: int) -> None:
                # driver collection bound: one micro-batch of per-user
                # bucket STATE rows (≤ distinct user_ids ≈ 150 at
                # sf0.01) — never raw events
                pdf = batch_df.toPandas()
                pdf["chunk"] = i
                frames.append(pdf)

            demo.run_foreach_batch(df, sink, ck, output_mode="update")

        work, _out, _ = _drain_chunks(
            spark, sf, demo.stateful_token_bucket, run, "bk")
        shutil.rmtree(work, ignore_errors=True)
        _cache[key] = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(
        _cache[key],
        "user_id long, batch_requests long, admitted long, tokens double,"
        " chunk int",
    ).orderBy("chunk", "user_id")


def q_streaming_icelite_sink(spark: SparkSession, sf: str) -> DataFrame:
    """foreachBatch -> icelite sink: each micro-batch commits one atomic
    snapshot (the streaming mirror of wave=batch); returns the commit
    ledger with per-snapshot row counts."""
    key = (sf, "sink")
    if key not in _cache:
        commits: list[dict] = []

        def run(df, out, ck, i):
            root = f"{out}_icelite"
            commits.extend(demo.run_icelite_sink(df, root, ck))

        work, _out, _ = _drain_chunks(
            spark, sf, lambda stream: stream, run, "ice"
        )
        shutil.rmtree(work, ignore_errors=True)
        _cache[key] = pd.DataFrame(commits)
    return spark.createDataFrame(
        _cache[key], "snapshot_id long, epoch long, rows long"
    ).orderBy("snapshot_id")


QUERIES: dict[str, tuple] = {
    "streaming_watermark_counts": (q_streaming_watermark_counts, None),
    "streaming_token_bucket": (q_streaming_token_bucket, None),
    "streaming_icelite_sink": (q_streaming_icelite_sink, None),
}
