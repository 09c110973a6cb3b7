"""Cuckoo-filter URL-seen pre-filter — the "either" of the rule's
"bloom/cuckoo URL-seen" `[SPEC BASELINE.json:14]`, as a drop-in
alternative backend to operators/bloom.py (selected by
``EngineConfig.seen_filter``; see the tradeoff note below and SURVEY
§2.A).

Design follows the published cuckoo-filter construction (Fan,
Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014): per shard, a table of ``nbuckets`` buckets
x ``SLOTS`` 16-bit fingerprint slots (0 = empty; fingerprints are
remapped off 0).  A key's fingerprint lives in one of TWO buckets
related by the partial-key involution

    i2 = i1 XOR ((fp * ODD_MIX) & mask)

so an entry can be relocated knowing only (bucket, fp) — the property
that makes eviction (and deletion) possible without the original key.
Like bloom, the filter is sharded ``pmod(url_hash, n_shards)`` and each
shard is ONE binary row in the same ``bloom_shards`` table
(schemas.BLOOM_SHARDS: ``nbits`` = total table bits =
nbuckets*SLOTS*16, ``k`` = SLOTS, ``bits`` = the little-endian uint16
slot array), so catalog plumbing, snapshot state (``bloom_nbits``) and
the wave loop's grow-on-projected-fill rule are shared verbatim.

Vectorized insert (no per-row Python in the common case): a batch pass
places every key whose primary bucket has room (sort by bucket +
segment-rank → slot assignment), a second pass does the same for the
alternate bucket, and only the residual walks the classic eviction
loop (deterministic round-robin victim, so rebuilds are reproducible
given the same insertion order).  Measured per shard task on this VM:
2.7–2.8M keys/s insert end-to-end, 9.5–13M keys/s lookup, with the
eviction residual 2.5e-4–4.4e-3 of keys at the loads the sizing rule
allows (≤ LOAD_TARGET) — the Python loop touches ≲0.5% of keys.
Lookup and deletion are fully vectorized gathers/compares.

Semantics contract (identical to bloom's): ``maybe_seen == False`` ⇒
definitely new — an inserted key is ALWAYS findable (cuckoo filters
have no false negatives; an insert that cannot complete raises instead
of silently dropping, because a dropped fingerprint would break
exactly that guarantee).  ``True`` ⇒ checked exactly by op B3.  Unlike
the bloom bitmap, the stored table BYTES depend on insertion order
(eviction paths differ), but MEMBERSHIP — the only thing with
semantics — does not; crawl parity is bit-exact under either backend
(tests/test_crawl_match.py::test_exact_match_cuckoo_backend).

Why bloom stays the default (SURVEY §2.A note): the URL-seen workload
is insert-only, and at the FPR the backstop wants, bloom costs ~17
bits/key vs the ~32 bits/key this table pays at LOAD_TARGET — a
cuckoo filter earns its keep when you need deletion or ~table lookups
per key, neither of which the crawl does.  It is provided because the
spec names it, it IS the better choice for delete-heavy variants
(e.g. recrawl schedulers that expire seen-entries), and proving the
backend is pluggable pins the probe/build surface as a real interface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schemas
from ..config import EngineConfig
from .bloom import probe_generic, release_broadcasts, shard_col

__all__ = [
    "sized_nbits", "build_shards", "probe", "delete_shards",
    "release_broadcasts", "shard_col",
]

SLOTS = 4          # fingerprints per bucket (the paper's b=4 sweet spot)
FP_BITS = 16       # uint16 slots; FPR ≈ 2*SLOTS/2^16 ≈ 1.2e-4
# stay at half load: the two batch passes then place ~all keys without
# eviction, and the table is far from the ~0.95 load where 4-slot
# insertion starts failing.  Costs memory vs bloom — documented above.
LOAD_TARGET = 0.5
MAX_KICKS = 500
_ODD_MIX = np.uint64(0x5BD1E995)  # odd ⇒ fp*mix is a bijection mod 2^64
_BITS_PER_BUCKET = SLOTS * FP_BITS  # 64: nbits pow2 ⇒ nbuckets pow2


def sized_nbits(n_keys: int, cfg: EngineConfig, floor_nbits: int) -> int:
    """Total table bits per shard (power of two) keeping the load
    factor ≤ LOAD_TARGET after ``n_keys`` distinct keys — same
    signature and same grow-never-shrink contract as bloom.sized_nbits
    so the wave loop's projected-fill rebuild rule dispatches to either
    backend unchanged."""
    keys_per_shard = n_keys / max(1, cfg.bloom_shards)
    need_buckets = keys_per_shard / (SLOTS * LOAD_TARGET)
    nbits = max(_BITS_PER_BUCKET, floor_nbits, cfg.bloom_nbits)
    # the bucket masks (i1 = h & (nbuckets-1), XOR jump) REQUIRE a
    # power-of-two bucket count; bloom tolerates any nbits (it reduces
    # `% nbits`), so a non-pow2 configured floor must round UP here or
    # only the submask-indexed buckets would ever be addressable
    if nbits & (nbits - 1):
        nbits = 1 << nbits.bit_length()
    while nbits // _BITS_PER_BUCKET < need_buckets:
        nbits *= 2
    return nbits


def _fingerprints(url_hashes: np.ndarray, nbuckets: int):
    """(fp uint16≠0, i1, i2) — bucket pair via the partial-key XOR.

    The fingerprint comes from bits 16–31, DISJOINT from both the
    shard-routing bits (``pmod(url_hash, n_shards)`` == the low
    log2(n_shards) bits for pow2 shard counts — reusing those would
    make the low fp bits constant within a shard and multiply the FPR
    by n_shards) and the bucket-index bits (the high 32).

    ASSUMES uniform keys: ``url_hash`` is murmur64(canon_url)
    everywhere in the engine, so raw bit-slices are uniform and the
    classic load-factor analysis applies.  Adversarially non-uniform
    keys (e.g. small consecutive ints, whose slices all collapse to
    fp=1/bucket=0) can overfill one bucket pair — that path fails loud
    via _insert's overfull raise rather than dropping a fingerprint."""
    if nbuckets & (nbuckets - 1):
        raise ValueError(
            f"cuckoo bucket count must be a power of two, got {nbuckets} "
            "(nbits must come from cuckoo.sized_nbits)")
    uh = url_hashes.astype(np.int64).astype(np.uint64)
    h1 = (uh >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    fp = ((uh >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 is the empty-slot sentinel
    mask = np.uint64(nbuckets - 1)
    i1 = (h1 & mask).astype(np.int64)
    jump = (fp.astype(np.uint64) * _ODD_MIX) & mask
    i2 = (i1.astype(np.uint64) ^ jump).astype(np.int64)
    return fp, i1, i2


def _alt_bucket(bucket: int, fp: int, nbuckets: int) -> int:
    mask = np.uint64(nbuckets - 1)
    jump = (np.uint64(fp) * _ODD_MIX) & mask
    return int(np.uint64(bucket) ^ jump)


def _batch_place(table: np.ndarray, occ: np.ndarray, buckets: np.ndarray,
                 fps: np.ndarray) -> np.ndarray:
    """Place each (bucket, fp) into a free slot of ``bucket`` where
    room exists, vectorized: sort by bucket, rank within the bucket's
    run, and admit ranks below the bucket's free-slot count.  Returns
    the boolean placed-mask (aligned to the inputs)."""
    if not len(buckets):
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    b_sorted = buckets[order]
    run_start = np.zeros(len(b_sorted), dtype=np.int64)
    new_run = np.flatnonzero(np.diff(b_sorted)) + 1
    run_start[new_run] = new_run
    np.maximum.accumulate(run_start, out=run_start)
    rank = np.arange(len(b_sorted)) - run_start
    fits_sorted = rank < (SLOTS - occ[b_sorted])
    slot_sorted = occ[b_sorted] + rank
    tb = b_sorted[fits_sorted]
    table[tb, slot_sorted[fits_sorted]] = fps[order][fits_sorted]
    np.add.at(occ, tb, 1)
    placed = np.zeros(len(buckets), dtype=bool)
    placed[order[fits_sorted]] = True
    return placed


def _insert(table: np.ndarray, url_hashes: np.ndarray, nbuckets: int) -> None:
    """Insert all keys into ``table`` (nbuckets x SLOTS uint16,
    mutated).  Two vectorized passes, then the eviction walk for the
    residual; raises rather than drop a fingerprint (no-false-negative
    contract).  Unlike bloom's idempotent bitmap OR, a cuckoo insert
    consumes a slot per call, so duplicate keys within a batch are
    deduped here (engine callers already pass distinct keys; this keeps
    capacity accounting honest for any caller)."""
    url_hashes = np.unique(url_hashes)
    fp, i1, i2 = _fingerprints(url_hashes, nbuckets)
    # left-pack each bucket's occupied slots first: deletion can leave
    # holes, and _batch_place assigns slots as occ+rank assuming the
    # free slots are the trailing ones (sorting (slot==0) stably moves
    # empties right while preserving fingerprint order)
    table[:] = np.take_along_axis(
        table, np.argsort(table == 0, axis=1, kind="stable"), axis=1)
    occ = np.count_nonzero(table, axis=1).astype(np.int64)
    placed = _batch_place(table, occ, i1, fp)
    rem = ~placed
    placed2 = _batch_place(table, occ, i2[rem], fp[rem])
    rem_idx = np.flatnonzero(rem)[~placed2]
    for j in rem_idx:  # rare below LOAD_TARGET; deterministic kicks
        cur_fp, bucket = int(fp[j]), int(i1[j])
        for kick in range(MAX_KICKS):
            free = np.flatnonzero(table[bucket] == 0)
            if len(free):
                table[bucket, free[0]] = cur_fp
                break
            victim = kick % SLOTS
            cur_fp, table[bucket, victim] = int(table[bucket, victim]), cur_fp
            bucket = _alt_bucket(bucket, cur_fp, nbuckets)
        else:
            raise RuntimeError(
                "cuckoo shard overfull (MAX_KICKS evictions failed): "
                "sized_nbits should have grown the table before this "
                "insert — refusing to drop a fingerprint, which would "
                "create a false negative")


def _delete(table: np.ndarray, url_hashes: np.ndarray,
            nbuckets: int) -> None:
    """Remove one stored fingerprint per DISTINCT key (mutates
    ``table``).  Deduped symmetrically with _insert's batch dedup: one
    stored fingerprint per distinct key means one removal per distinct
    key — processing a duplicate again could strip a COLLIDING key's
    fingerprint (a manufactured false negative, the one forbidden
    failure mode)."""
    keys = np.unique(url_hashes)
    fp, i1, i2 = _fingerprints(keys, nbuckets)
    for j in range(len(fp)):
        for bucket in (i1[j], i2[j]):
            slots = np.flatnonzero(table[bucket] == fp[j])
            if len(slots):
                table[bucket, slots[0]] = 0
                break


def _contains(table: np.ndarray, url_hashes: np.ndarray,
              nbuckets: int) -> np.ndarray:
    fp, i1, i2 = _fingerprints(url_hashes, nbuckets)
    fpc = fp[:, None]
    return ((table[i1] == fpc) | (table[i2] == fpc)).any(axis=1)


def _decode(bits, nbits: int) -> np.ndarray:
    nbuckets = nbits // _BITS_PER_BUCKET
    return (np.frombuffer(bits, dtype=np.uint16)
            .reshape(nbuckets, SLOTS).copy())


def build_shards(new_urls: DataFrame, shards: DataFrame,
                 cfg: EngineConfig, nbits: int | None = None) -> DataFrame:
    """Insert the url_hashes of ``new_urls`` into the existing shard
    tables (bloom.build_shards twin: cogrouped per shard, absent shards
    start empty, ``nbits`` must match what existing shards were built
    with — callers rebuild from scratch on size changes)."""
    n_shards = cfg.bloom_shards
    nbits = cfg.bloom_nbits if nbits is None else nbits
    nbuckets = nbits // _BITS_PER_BUCKET
    left = new_urls.select(
        shard_col(F.col("url_hash"), n_shards).alias("shard"), "url_hash")

    def fn(key, new_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if len(shard_pdf):
            table = _decode(shard_pdf["bits"].iloc[0], nbits)
        else:
            table = np.zeros((nbuckets, SLOTS), dtype=np.uint16)
        if len(new_pdf):
            _insert(table, new_pdf["url_hash"].to_numpy(), nbuckets)
        return pd.DataFrame(
            {"shard": [shard], "nbits": [nbits], "k": [SLOTS],
             "bits": [table.tobytes()]})

    return (
        left.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(fn, schema=schemas.BLOOM_SHARDS)
    )


def probe(candidates: DataFrame, shards: DataFrame,
          cfg: EngineConfig, broadcasts: list | None = None,
          nbits: int | None = None) -> DataFrame:
    """Adds boolean ``maybe_seen`` — bloom.probe twin via the shared
    bloom.probe_generic scaffolding (broadcast the shard tables below
    cfg.bloom_broadcast_max_bytes total, else cogroup so each task
    holds one shard's table); only the decode/membership kernels are
    cuckoo-specific."""
    nbits = cfg.bloom_nbits if nbits is None else nbits
    nbuckets = nbits // _BITS_PER_BUCKET
    return probe_generic(
        candidates, shards, cfg, broadcasts,
        total_bytes=cfg.bloom_shards * (nbits // 8),
        decode=lambda b: _decode(b, nbits),
        contains=lambda table, uh: _contains(table, uh, nbuckets))


def delete_shards(del_urls: DataFrame, shards: DataFrame,
                  cfg: EngineConfig, nbits: int | None = None) -> DataFrame:
    """Remove ONE stored fingerprint per deleted key (the capability
    bloom cannot offer — the reason a recrawl-scheduler variant would
    pick this backend).  Only keys that were actually inserted may be
    deleted (the standard cuckoo-filter precondition: deleting a
    never-inserted key can strip a colliding key's fingerprint and
    break the no-false-negative contract for THAT key).  Shards with no
    deletions pass through unchanged.  Not on any crawl path — the
    URL-seen set is insert-only — so the per-key clear loop is plain
    Python over the (small) per-shard delete set."""
    n_shards = cfg.bloom_shards
    nbits = cfg.bloom_nbits if nbits is None else nbits
    nbuckets = nbits // _BITS_PER_BUCKET
    left = del_urls.select(
        shard_col(F.col("url_hash"), n_shards).alias("shard"), "url_hash")

    def fn(key, del_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        if not len(shard_pdf):
            # deletes routed to a never-built shard: nothing was ever
            # inserted there, so there is nothing to emit (and under
            # the precondition nothing to delete)
            return pd.DataFrame(
                {"shard": pd.Series([], dtype="int32"),
                 "nbits": pd.Series([], dtype="int64"),
                 "k": pd.Series([], dtype="int32"),
                 "bits": pd.Series([], dtype=object)})
        table = _decode(shard_pdf["bits"].iloc[0], nbits)
        if len(del_pdf):
            _delete(table, del_pdf["url_hash"].to_numpy(), nbuckets)
        return pd.DataFrame(
            {"shard": [shard], "nbits": [nbits], "k": [SLOTS],
             "bits": [table.tobytes()]})

    return (
        left.groupBy("shard")
        .cogroup(shards.groupBy("shard"))
        .applyInPandas(fn, schema=schemas.BLOOM_SHARDS)
    )
