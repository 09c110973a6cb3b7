"""Ops B1/B2 — partitioned Bloom-filter URL-seen pre-filter (SURVEY §2.A).

Sharded by ``shard = pmod(url_hash, n_shards)``; each shard is a packed
numpy bitmap stored as one ``binary`` row in the ``bloom_shards`` table.
Bit positions use Kirsch–Mitzenmacher double hashing
``(h1 + i·h2) mod nbits`` where h1/h2 are the high/low 32-bit halves of
the murmur64 URL id — both halves are independent murmur3 runs (op H2),
so no extra hash evaluation is needed anywhere.

Build and probe are cogrouped ``applyInPandas`` passes: candidates and
the shard bitmap meet in the same task, so the filter scales out with
``n_shards`` instead of broadcasting one giant bitmap (at 10^10 URLs a
monolithic bloom would be tens of GB; shards keep each task's slice
bounded).  Exactness is NOT bloom's job: op B3 (left_anti against the
``seen`` table) guarantees the exact URL-seen semantics; bloom only
spares "definitely new" rows that shuffle.

Bloom (not cuckoo) is chosen deliberately: the URL-seen set is
insert-only (no deletions ever), bitmaps OR-merge trivially across
waves and shards, and the exactness backstop makes the FPR a pure
performance knob.  A cuckoo filter's only advantage — deletion — is
unused here (SURVEY §2.A note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from .. import schemas
from ..config import EngineConfig


def shard_col(url_hash_col, n_shards: int):
    return F.pmod(url_hash_col, F.lit(n_shards)).cast("int")


def _positions(url_hashes: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch–Mitzenmacher double hashing."""
    uh = url_hashes.astype(np.int64).astype(np.uint64)
    h1 = (uh >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    h2 = uh & np.uint64(0xFFFFFFFF)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(nbits)


def build_shards(new_urls: DataFrame, shards: DataFrame,
                 cfg: EngineConfig) -> DataFrame:
    """OR the url_hashes of ``new_urls`` into the existing shard bitmaps
    (op B1).  Shards with no new rows pass through unchanged; new shards
    start from a zero bitmap."""
    nbits, k, n_shards = cfg.bloom_nbits, cfg.bloom_k, cfg.bloom_shards
    left = new_urls.select(
        shard_col(F.col("url_hash"), n_shards).alias("shard"), "url_hash")

    def fn(key, new_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if len(shard_pdf):
            bits = np.frombuffer(shard_pdf["bits"].iloc[0], dtype=np.uint8).copy()
        else:
            bits = np.zeros(nbits // 8, dtype=np.uint8)
        if len(new_pdf):
            pos = _positions(new_pdf["url_hash"].to_numpy(), nbits, k)
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).ravel(),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).ravel(),
            )
        return pd.DataFrame(
            {"shard": [shard], "nbits": [nbits], "k": [k],
             "bits": [bits.tobytes()]})

    return (
        left.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(fn, schema=schemas.BLOOM_SHARDS)
    )


def probe(candidates: DataFrame, shards: DataFrame,
          cfg: EngineConfig) -> DataFrame:
    """Op B2 — adds boolean ``maybe_seen``.  False ⇒ definitely new
    (bloom has no false negatives); True ⇒ must be checked exactly (B3)."""
    nbits, k, n_shards = cfg.bloom_nbits, cfg.bloom_k, cfg.bloom_shards
    cands = candidates.withColumn(
        "shard", shard_col(F.col("url_hash"), n_shards))
    out_schema = StructType(
        cands.schema.fields + [StructField("maybe_seen", BooleanType())])

    def fn(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if not len(shard_pdf):
            cand_pdf["maybe_seen"] = False
            return cand_pdf
        bits = np.frombuffer(shard_pdf["bits"].iloc[0], dtype=np.uint8)
        pos = _positions(cand_pdf["url_hash"].to_numpy(), nbits, k)
        byte = bits[(pos >> np.uint64(3))]
        hit = (byte & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
        cand_pdf["maybe_seen"] = hit.all(axis=1)
        return cand_pdf

    return (
        cands.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(fn, schema=out_schema)
        .drop("shard")
    )
