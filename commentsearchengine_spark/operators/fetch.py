"""Ops F1/F2/F3 — deterministic simulated fetch + codecs + phash.

``mapInPandas`` over the admitted URLs: one Arrow batch in, one out.
Page content is a pure function of the 64-bit URL id (same numpy code
as the sequential oracle — functions/imagecodec.py, fixtures/synth.py),
so engine and reference produce bit-identical payloads and outlink sets.

Python iterates over *rows* of each batch only to drive per-image numpy
kernels (pixel synthesis, codec, phash are all vectorized per image);
pixels never see a Python loop (SURVEY §7 hard-part 3).  Batch size is
capped via spark.sql.execution.arrow.maxRecordsPerBatch because image
rows are fat (SURVEY §4).

In a real crawler this stage would be the HTTP fetch; its simulation
keeps the scheduler's contract (CPU-heavy, per-URL independent work)
without network access.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..fixtures import synth
from ..functions.imagecodec import payload_for
from ..functions.urlnorm import canonicalize, host_of, path_of

# outlinks leave the fetch stage ALREADY canonicalized (op C1 runs inside
# this same Python pass): a separate canonicalizer UDF downstream would be
# another full ArrowEvalPython round-trip over ~4x the admitted rows —
# serialize every raw link to the JVM, back to a Python worker, and back —
# for work this worker can do while the strings are already in hand.  The
# canonicalize/host_of/path_of functions are the exact ones the sequential
# oracle uses, so parity is unchanged.
FETCHED_SCHEMA = (
    schemas.PAGES
    + ", depth int, parent_url_hash long, outlinks array<struct<"
    "j: int, raw: string, canon_url: string, host: string, path: string>>"
)


def fetch_pages(admitted: DataFrame, wave: int, n_hosts: int) -> DataFrame:
    """admitted (canon_url, host, url_hash, depth, global_seq) → pages rows
    + canonicalized outlinks for expansion."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cu, host, uh, depth, gseq in zip(
                pdf["canon_url"], pdf["host"], pdf["url_hash"],
                pdf["depth"], pdf["global_seq"], strict=True,
            ):
                links = []
                for j, raw in enumerate(synth.outlinks(cu, n_hosts)):
                    ccu = canonicalize(raw)
                    links.append({
                        "j": j, "raw": raw, "canon_url": ccu,
                        "host": host_of(ccu), "path": path_of(ccu),
                    })
                p = payload_for(int(uh), host, wave)
                p.update(
                    url=cu, canon_url=cu, host=host, wave=wave,
                    fetched_seq=int(gseq), depth=int(depth),
                    parent_url_hash=int(uh),
                    outlinks=links,
                )
                rows.append(p)
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                    "url", "canon_url", "host", "wave", "fetched_seq",
                    "depth", "parent_url_hash", "outlinks",
                ],
            )

    return admitted.mapInPandas(gen, schema=FETCHED_SCHEMA)
