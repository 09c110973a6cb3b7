"""Operator tests for the cuckoo-filter URL-seen backend
(operators/cuckoo.py) — the spec's "bloom/cuckoo" alternative.  Crawl
drop-in parity is tested where the other backends' parity lives
(tests/test_crawl_match.py::test_exact_match_cuckoo_backend); this file
pins the filter semantics themselves: the no-false-negative contract,
the FPR regime, membership-equivalence of incremental vs from-scratch
builds, physical-path equivalence (broadcast vs cogroup probe), the
deletion capability bloom lacks, the fail-loud overfull path, and the
sizing rule the wave loop's growth check dispatches to."""

from __future__ import annotations

import numpy as np
import pytest

from commentsearchengine_spark import schemas
from commentsearchengine_spark.config import EngineConfig
from commentsearchengine_spark.operators import cuckoo


CFG = EngineConfig(bloom_shards=4)


def _keys_df(spark, keys: np.ndarray):
    return spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long")


def _probe_map(spark, shards, keys: np.ndarray, cfg, nbits: int) -> dict:
    out = cuckoo.probe(_keys_df(spark, keys), shards, cfg, nbits=nbits)
    return {r["url_hash"]: r["maybe_seen"] for r in out.collect()}


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(42)
    ins = np.unique(rng.integers(-2**62, 2**62, size=20_000, dtype=np.int64))
    other = np.unique(
        rng.integers(-2**62, 2**62, size=20_000, dtype=np.int64))
    return ins, np.setdiff1d(other, ins)


@pytest.fixture(scope="module")
def built(spark, keys):
    ins, _ = keys
    nbits = cuckoo.sized_nbits(len(ins), CFG, 0)
    empty = spark.createDataFrame([], schemas.BLOOM_SHARDS)
    shards = cuckoo.build_shards(
        _keys_df(spark, ins), empty, CFG, nbits=nbits).cache()
    shards.count()
    return shards, nbits


def test_no_false_negatives(spark, keys, built):
    ins, _ = keys
    shards, nbits = built
    got = _probe_map(spark, shards, ins, CFG, nbits)
    assert len(got) == len(ins)
    assert all(got.values()), "cuckoo filter produced a false negative"


def test_fpr_bound(spark, keys, built):
    _, other = keys
    shards, nbits = built
    got = _probe_map(spark, shards, other, CFG, nbits)
    fpr = sum(got.values()) / len(got)
    # theory: ~2*SLOTS/2^16 ≈ 1.2e-4 at full load; generous margin
    assert fpr < 0.005, fpr


def test_incremental_build_membership_equals_rebuild(spark, keys):
    """Insertion order changes the stored BYTES (eviction paths) but
    never membership — the only thing with semantics."""
    ins, other = keys
    nbits = cuckoo.sized_nbits(len(ins), CFG, 0)
    empty = spark.createDataFrame([], schemas.BLOOM_SHARDS)
    once = cuckoo.build_shards(_keys_df(spark, ins), empty, CFG, nbits=nbits)
    half = len(ins) // 2
    steps = cuckoo.build_shards(
        _keys_df(spark, ins[half:]),
        cuckoo.build_shards(
            _keys_df(spark, ins[:half]), empty, CFG, nbits=nbits),
        CFG, nbits=nbits)
    sample = np.concatenate([ins, other[:2000]])
    assert (_probe_map(spark, once, sample, CFG, nbits)
            == _probe_map(spark, steps, sample, CFG, nbits))


def test_broadcast_and_cogroup_paths_agree(spark, keys, built):
    ins, other = keys
    shards, nbits = built
    sample = np.concatenate([ins[:3000], other[:3000]])
    bcast = _probe_map(spark, shards, sample, CFG, nbits)
    cfg_cg = EngineConfig(bloom_shards=4, bloom_broadcast_max_bytes=0)
    cg = _probe_map(spark, shards, sample, cfg_cg, nbits)
    assert bcast == cg


def test_delete_restores_empty_filter(spark, keys, built):
    ins, other = keys
    shards, nbits = built
    emptied = cuckoo.delete_shards(
        _keys_df(spark, ins), shards, CFG, nbits=nbits).cache()
    rows = emptied.collect()
    assert all(
        np.count_nonzero(np.frombuffer(bytes(r["bits"]), dtype=np.uint16))
        == 0 for r in rows), "deleting every inserted key must empty it"
    got = _probe_map(spark, emptied, np.concatenate([ins[:2000], other[:2000]]),
                     CFG, nbits)
    assert not any(got.values())
    emptied.unpersist()


def test_delete_routed_to_never_built_shard(spark, keys):
    """A delete batch whose keys pmod into a shard that was never built
    (nothing inserted there) must pass the other shards through
    unchanged instead of crashing — regression for the empty-branch
    AttributeError found in review."""
    ins, _ = keys
    nbits = cuckoo.sized_nbits(len(ins), CFG, 0)
    empty = spark.createDataFrame([], schemas.BLOOM_SHARDS)
    # build ONLY shard 0's keys; then delete keys spread over ALL
    # shards, so shards 1..3 hit the del-present/shard-absent branch
    sh = (ins % CFG.bloom_shards + CFG.bloom_shards) % CFG.bloom_shards
    shard0 = ins[sh == 0]
    built0 = cuckoo.build_shards(
        _keys_df(spark, shard0), empty, CFG, nbits=nbits)
    dels = np.concatenate([shard0[:50], ins[sh != 0][:150]])
    out = cuckoo.delete_shards(
        _keys_df(spark, dels), built0, CFG, nbits=nbits)
    rows = {r["shard"]: r for r in out.collect()}
    assert set(rows) == {0}  # never-built shards emit nothing
    got = _probe_map(spark, out, shard0[:50], CFG, nbits)
    assert sum(got.values()) <= 2  # deleted (colliding fps may remain)
    kept = _probe_map(spark, out, shard0[50:500], CFG, nbits)
    assert all(kept.values())  # undeleted keys untouched


def test_nonpow2_floor_rounds_up(spark, keys):
    """bloom tolerates any nbits (modulo reduction); cuckoo's masks
    need pow2 — a non-pow2 configured floor must round up, not
    silently collapse the addressable bucket space (review finding)."""
    ins, _ = keys
    nbits = cuckoo.sized_nbits(len(ins), CFG, 1_000_000)
    assert nbits & (nbits - 1) == 0 and nbits >= 1_000_000
    with pytest.raises(ValueError, match="power of two"):
        cuckoo._fingerprints(np.array([1], dtype=np.int64), 1000)


def test_fpr_with_pow2_shard_count(spark):
    """Fingerprint bits must be disjoint from the pmod shard-routing
    bits: with bloom_shards=16 (pow2 ⇒ routing == low 4 bits) a
    fingerprint taken from the low 16 bits would have 4 constant bits
    per shard and ~16x the rated FPR (review finding).  1e-3 cleanly
    separates the rated ~1.2e-4 from the degraded ~2e-3."""
    cfg = EngineConfig(bloom_shards=16)
    rng = np.random.default_rng(7)
    ins = np.unique(rng.integers(-2**62, 2**62, size=40_000, dtype=np.int64))
    other = np.setdiff1d(np.unique(
        rng.integers(-2**62, 2**62, size=60_000, dtype=np.int64)), ins)
    nbits = cuckoo.sized_nbits(len(ins), cfg, 0)
    empty = spark.createDataFrame([], schemas.BLOOM_SHARDS)
    shards = cuckoo.build_shards(_keys_df(spark, ins), empty, cfg,
                                 nbits=nbits)
    got = _probe_map(spark, shards, other, cfg, nbits)
    assert sum(got.values()) / len(got) < 1e-3


def test_sized_nbits_rule():
    cfg = EngineConfig(bloom_shards=16)
    for n in (10, 10_000, 5_000_000):
        nbits = cuckoo.sized_nbits(n, cfg, 0)
        assert nbits & (nbits - 1) == 0  # power of two
        capacity = (nbits // (cuckoo.SLOTS * cuckoo.FP_BITS)) * cuckoo.SLOTS
        assert n / cfg.bloom_shards <= capacity * cuckoo.LOAD_TARGET + 1
        # grow-never-shrink floor contract (wave resume passes the
        # snapshot's current size as the floor)
        assert cuckoo.sized_nbits(n, cfg, nbits * 4) == nbits * 4


def test_overfull_insert_fails_loud(spark, keys):
    """An insert that cannot complete must raise, never drop a
    fingerprint — a silent drop would be a false negative, the one
    failure mode the pre-filter may not have."""
    ins, _ = keys
    empty = spark.createDataFrame([], schemas.BLOOM_SHARDS)
    bad = cuckoo.build_shards(
        _keys_df(spark, ins[:2000]), empty, CFG,
        nbits=cuckoo.SLOTS * cuckoo.FP_BITS * 2)  # 2 buckets/shard
    with pytest.raises(Exception, match="overfull"):
        bad.collect()


def test_model_based_no_false_negatives_under_insert_delete():
    """Model-based property check of the numpy kernels: across random
    interleavings of insert/delete batches (with duplicate keys inside
    batches and re-insertions across batches), every key the model says
    is live (inserted more often than deleted) must probe True — the
    no-false-negative contract under the documented delete
    precondition.  The reverse direction (dead keys probing False) is
    deliberately NOT asserted: false positives are allowed by design."""
    from hypothesis import given, settings, strategies as st

    nbuckets = 1024  # 4096 slots; pools below keep load well under 1

    def mix64(x: int) -> int:
        """splitmix64 finalizer: engine keys are murmur64(url) — uniform
        over int64 — and the kernel's raw fp/bucket bit-slices assume
        that (hypothesis biases raw draws toward small ints, which all
        collapse to fp=1/bucket=0 and legitimately overfill a bucket
        pair — the raise-don't-drop path, not a membership bug)."""
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        return x - 2**64 if x >= 2**63 else x

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        rng_keys = data.draw(st.lists(
            st.integers(min_value=-2**62, max_value=2**62),
            min_size=1, max_size=300, unique=True))
        pool = np.array(sorted({mix64(k) for k in rng_keys}),
                        dtype=np.int64)
        table = np.zeros((nbuckets, cuckoo.SLOTS), dtype=np.uint16)
        live: dict[int, int] = {}
        for _ in range(data.draw(st.integers(1, 6))):
            candidates = [k for k, c in live.items() if c > 0]
            if candidates and data.draw(st.booleans()):
                batch = data.draw(st.lists(
                    st.sampled_from(candidates), min_size=1,
                    max_size=len(candidates)))
                distinct = set(batch)
                cuckoo._delete(
                    table, np.array(batch, dtype=np.int64), nbuckets)
                for k in distinct:
                    live[k] -= 1
            else:
                batch = data.draw(st.lists(
                    st.sampled_from(list(pool)), min_size=1, max_size=100))
                distinct = set(batch)
                cuckoo._insert(
                    table, np.array(batch, dtype=np.int64), nbuckets)
                for k in distinct:
                    live[k] = live.get(k, 0) + 1
            alive = np.array([k for k, c in live.items() if c > 0],
                             dtype=np.int64)
            if len(alive):
                assert cuckoo._contains(table, alive, nbuckets).all()

    run()


def test_backend_is_resume_guarded():
    """seen_filter participates in config_hash: resuming a bloom-built
    catalog with the cuckoo backend (or vice versa) would misread the
    shard bytes as false negatives, so the wave loop's config-hash
    resume guard must see different hashes."""
    a = EngineConfig(seen_filter="bloom").config_hash()
    b = EngineConfig(seen_filter="cuckoo").config_hash()
    assert a != b


def test_unknown_backend_rejected(spark):
    from commentsearchengine_spark.plans.wave import _seen_filter

    with pytest.raises(ValueError, match="seen_filter"):
        _seen_filter(EngineConfig(seen_filter="xor"))
