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


def mix_col(prefix: str, i: Column) -> Column:
    """Twin of ``mmh3.mix(prefix, i)`` for an integer column — native
    ``F.hash`` over the same ``"prefix:i"`` string, masked to the
    non-negative 32-bit range."""
    h = F.hash(F.concat_ws(":", F.lit(prefix), i.cast("string")))
    return h.cast("long").bitwiseAND(F.lit(0xFFFFFFFF).cast("long"))


def seed_urls_df(spark, n: int, spread_hosts: int = 0):
    """Distributed twin of ``fixtures.synth.seed_urls`` (op S1).

    The sequential oracle builds its seed list with pure-Python murmur
    mixes; at bench scale that is 4 hash calls x n seeds of serial
    driver CPU (measured ~10 s for 320k seeds), and at the 10^10 target
    scale a driver-side list is impossible.  This twin emits the SAME
    strings from ``spark.range(n)`` with native Column expressions only
    (F.hash is the verified murmur3 twin; format_string matches
    Python's %0Nd padding where lpad would truncate 4-digit host
    indexes).  Parity pinned by tests/test_mmh3.py::test_seed_urls_df.
    """
    from ..fixtures import synth

    i = F.col("disc_seq")
    if spread_hosts <= 0:
        host = F.lit(synth.SEED_HOST)
    else:
        host = F.format_string(
            "site%03d.example.org", F.pmod(i, F.lit(spread_hosts)))
    n_sect = len(synth.SECTIONS)
    section = F.element_at(
        F.array(*[F.lit(s) for s in synth.SECTIONS]),
        (mix_col("seed-section", i) % n_sect + 1).cast("int"))
    yyyy = F.lit(2020) + mix_col("seed-y", i) % 6
    mm = F.lit(1) + mix_col("seed-m", i) % 12
    dd = F.lit(1) + mix_col("seed-d", i) % 28
    return spark.range(n).select(F.col("id").alias("disc_seq")).select(
        "disc_seq",
        F.format_string(
            "https://%s/%s/%d/%02d/%02d/art%06d/",
            host, section, yyyy, mm, dd, i).alias("url"))
