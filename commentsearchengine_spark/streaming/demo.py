"""Structured Streaming surface (SURVEY.md §2.B streaming rows).

The engine's production path is wave-batch by design (each crawl wave is
one Spark batch job ending in one atomic snapshot commit — BASELINE.json:6),
so streaming is exposed as the same operators over an event stream:

- watermark + windowed aggregation with late-data drop (append mode);
- stateful per-key processing via ``applyInPandasWithState`` — the
  streaming analogue of the engine's per-host politeness token bucket
  (op P1), state carried across micro-batches instead of across waves;
- ``foreachBatch`` -> icelite sink: one micro-batch == one snapshot
  commit, mirroring the wave=batch equivalence.

All demos read a file source with ``maxFilesPerTrigger=1`` so
micro-batch boundaries are deterministic for tests.

Spark 4.x also offers ``transformWithStateInPandas`` (StatefulProcessor
API); probed in this environment and NOT usable offline — its streaming
Python runner requires ``google.protobuf`` (broken/absent here, no pip):
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE … ImportError: cannot
import name 'descriptor' from 'google.protobuf'``.  The stateful surface
therefore ships on ``applyInPandasWithState``, which has identical
per-key state semantics for this use.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream: one file per micro-batch (deterministic)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def windowed_counts_with_watermark(events: DataFrame) -> DataFrame:
    """Tumbling 1h counts; rows later than watermark-10min are dropped.

    Append output mode: a window only emits once the watermark passes
    its end — the standard late-data-tolerant streaming aggregation.
    """
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )


# ------------------------------------------------------------------ stateful

BUCKET_STATE_DDL = "tokens double"
BUCKET_OUT_DDL = "user_id long, batch_requests long, admitted long, tokens double"
BUCKET_CAPACITY = 5.0
BUCKET_REFILL = 2.0


def token_bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user token bucket across micro-batches (engine op P1 analogue:
    admit floor(tokens) requests per batch, then refill, clamp)."""
    (user_id,) = key
    tokens = state.get[0] if state.exists else BUCKET_CAPACITY
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    admitted = min(int(tokens), n)
    tokens = min(BUCKET_CAPACITY, tokens - admitted + BUCKET_REFILL)
    state.update((tokens,))
    yield pd.DataFrame(
        [
            {
                "user_id": int(user_id),
                "batch_requests": n,
                "admitted": admitted,
                "tokens": float(tokens),
            }
        ]
    )


def stateful_token_bucket(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        token_bucket_fn,
        outputStructType=BUCKET_OUT_DDL,
        stateStructType=BUCKET_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------- sinks


def run_to_parquet(df: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain all currently-available input into a parquet sink (append).

    Restartable: the checkpoint carries offsets AND the event-time
    watermark, so calling this again after new files arrive resumes with
    the previous watermark — which is how the tests drive deterministic
    multi-batch watermark semantics."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch(df: DataFrame, sink, checkpoint: str,
                      output_mode: str = "update") -> None:
    """Drain available input through a foreachBatch sink (restartable)."""
    q = (
        df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_icelite_sink(events: DataFrame, catalog_root: str,
                     checkpoint: str) -> list[dict[str, Any]]:
    """foreachBatch -> icelite: each micro-batch commits one snapshot
    (exactly the wave=batch design of the crawl engine; replaying a
    failed batch re-stages files and the commit rename stays atomic)."""
    from ..sources.icelite import Catalog

    cat = Catalog(catalog_root).init()
    commits: list[dict[str, Any]] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        cat.stage_write(batch_df.coalesce(1), "events", mode="append")
        sid = cat.commit(wave=int(epoch_id),
                         metrics={"epoch": int(epoch_id), "rows": n})
        commits.append({"snapshot_id": sid, "epoch": int(epoch_id), "rows": n})

    run_foreach_batch(events, sink, checkpoint, output_mode="append")
    return commits
