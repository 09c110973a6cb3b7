"""Engine configuration (SURVEY.md §1.4, §4)."""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json

from .fixtures import synth

# disc_seq = DISC_SEQ_STRIDE * global_seq(parent) + link_index — a single
# int64 that totally orders discoveries without any cross-partition
# coordination (SURVEY §1.4.3).  Safe while global_seq < 2^63 / 10^6.
DISC_SEQ_STRIDE = 1_000_000


@dataclass(frozen=True)
class EngineConfig:
    n_seeds: int = 10
    n_waves: int = 5
    n_buckets: int = 64          # logical host-hash partition space (op P0)
    n_hosts: int = synth.N_HOSTS
    # bloom pre-filter (op B1/B2); exactness is guaranteed by B3 regardless
    bloom_shards: int = 16
    bloom_nbits: int = 1 << 20   # bits per shard
    bloom_k: int = 5
    # hot-host salting (op P0b): hosts with more admitted rows than this
    # per wave get split into `salt_factor` sub-partitions for fetch
    skew_threshold: int = 10_000
    salt_factor: int = 8
    # Arrow batch sizing: image rows are fat (SURVEY §4)
    arrow_batch_rows: int = 512

    def config_hash(self) -> str:
        """Hash of the semantics-affecting parameters.  ``n_waves`` is a
        run target, not state semantics — resuming a 2-wave run with
        n_waves=4 must be legal (SURVEY §5.5)."""
        d = asdict(self)
        d.pop("n_waves")
        return hashlib.sha256(
            json.dumps(d, sort_keys=True).encode()).hexdigest()[:16]
