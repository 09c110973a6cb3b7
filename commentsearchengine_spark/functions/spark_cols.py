"""Native Column helpers — JVM-side twins of the pure-Python functions.

Zero Python workers: these compile to Catalyst expressions inside
whole-stage codegen.  Pinned against the pure twins in tests/test_mmh3.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .mmh3 import H2_SUFFIX


def murmur64_col(c: Column) -> Column:
    """64-bit URL id — twin of mmh3.murmur64 (SURVEY.md §2.A op H2)."""
    hi = F.hash(c).cast("long")
    lo = F.hash(F.concat(c, F.lit(H2_SUFFIX))).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(0xFFFFFFFF).cast("long")))


def bucket_col(host: Column, n_buckets: int) -> Column:
    """Host-hash bucket — twin of ``hash_str(host) % n_buckets`` (op P0)."""
    return F.pmod(F.hash(host), F.lit(n_buckets))
