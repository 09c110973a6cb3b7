"""Pure-Python twin of Spark's ``F.hash`` (Murmur3_x86_32, seed 42).

Spark's ``org.apache.spark.sql.catalyst.expressions.Murmur3Hash`` hashes a
UTF-8 string column with ``Murmur3_x86_32.hashUnsafeBytes(bytes, seed=42)``.
That implementation deviates from canonical murmur3 in the tail handling:
it consumes the input as little-endian 4-byte blocks, each a full mix round,
then mixes EACH remaining trailing byte (sign-extended to int32) as its own
full round, finally mixing in the total byte length (fmix).  Verified
experimentally against PySpark 4.1.2 (SURVEY.md §0.4 [V]).

This module is dependency-free (no Spark, no numpy) so the sequential
oracle (oracle/seqcrawl.py) and the Spark engine share bit-identical hash
semantics: the engine uses native ``F.hash`` / Column ops, the oracle uses
these functions, and tests assert equality on random strings.

Reference semantics source: the public Apache Spark source
(``common/sketch/.../Murmur3_x86_32.java``) — public knowledge, no
proprietary inputs.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF
C1 = 0xCC9E2D51
C2 = 0x1B873593
SPARK_HASH_SEED = 42


def _rotl32(x: int, r: int) -> int:
    x &= _MASK32
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * C1) & _MASK32
    k1 = _rotl32(k1, 15)
    k1 = (k1 * C2) & _MASK32
    return k1


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    return h1


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _to_i32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def _to_i64(x: int) -> int:
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def hash_bytes(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Spark ``Murmur3_x86_32.hashUnsafeBytes`` — returns signed int32."""
    h1 = seed & _MASK32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        k1 = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    # Spark quirk: each trailing byte is sign-extended and gets a FULL round.
    for i in range(4 * n_blocks, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256  # sign-extend (Java byte is signed)
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _to_i32(_fmix(h1, len(data)))


def hash_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """Twin of ``F.hash(string_col)`` — signed int32."""
    return hash_bytes(s.encode("utf-8"), seed)


H2_SUFFIX = "#h2"


def murmur64(s: str) -> int:
    """64-bit URL id shared with the engine (SURVEY.md §2.A op H2).

    Engine-side equivalent (native Column ops, no Python):
        (F.hash(c).cast('long') << 32) | (F.hash(F.concat(c, F.lit('#h2'))).cast('long') & 0xffffffff)
    """
    hi = hash_str(s)
    lo = hash_str(s + H2_SUFFIX)
    return _to_i64((hi << 32) | (lo & _MASK32))


def mix(*parts: object) -> int:
    """Deterministic non-negative 32-bit mixer for fixture synthesis.

    Shared by the oracle and the engine's Python (pandas/Arrow UDF) stages;
    never needs a Spark-native twin.
    """
    return hash_str(":".join(str(p) for p in parts)) & _MASK32


_M64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """SplitMix64 finalizer (public-domain PRNG mixer, Steele et al.,
    "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).

    ~10x cheaper than a murmur-over-string round; used for the per-link
    / per-image field derivation inside the fetch hot loop, where the
    murmur-based ``mix`` was the dominant Python cost.  Shared by oracle
    and engine, so the synthetic universe stays bit-identical between
    them."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return x
