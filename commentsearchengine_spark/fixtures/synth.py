"""Synthetic crawl universe (FIXTURES.md §2) — deterministic, seed-free.

Everything is a pure function of murmur3 mixes of strings, so the
sequential oracle and the Spark engine synthesize bit-identical inputs
independently (no golden files, no RNG state threading, no network).

The shapes model the reference crawler's world (WaPo article seeds,
comment-page pagination cursors as outlinks, per-host politeness,
robots.txt) re-typed to the graft's image+caption payload.
"""

from __future__ import annotations

from ..functions.mmh3 import mix, murmur64, splitmix64

SECTIONS = ("politics", "world", "sports", "opinions", "technology")
SEED_HOST = "www.washingtonpost.com"
N_HOSTS = 200  # host universe; hosts 0-4 are the hot ones (~60% of links)
MAX_OUT = 8
DUP_POOL = 500  # small path pool → ~10% natural cross-parent duplicates

DEFAULT_CAPACITY = 4.0
DEFAULT_REFILL = 2.0
HOT_CAPACITY = 16.0
HOT_REFILL = 8.0


# ------------------------------------------------------------------- seeds

def seed_urls(n: int, spread_hosts: int = 0) -> list[str]:
    """WaPo-shaped article URLs: deterministic, canonical already.

    ``spread_hosts > 0`` distributes seeds round-robin over the host
    universe instead of the single WaPo host — used by the throughput
    bench so wave-1 admission is not throttled by one host's politeness
    budget.  Semantics are identical in oracle and engine (both call
    this function), so parity tests cover spread mode too."""
    out = []
    for i in range(n):
        host = SEED_HOST if spread_hosts <= 0 else host_name(i % spread_hosts)
        section = SECTIONS[mix("seed-section", i) % len(SECTIONS)]
        yyyy = 2020 + mix("seed-y", i) % 6
        mm = 1 + mix("seed-m", i) % 12
        dd = 1 + mix("seed-d", i) % 28
        out.append(
            f"https://{host}/{section}/{yyyy}/{mm:02d}/{dd:02d}/art{i:06d}/"
        )
    return out


# ------------------------------------------------------------------- hosts

def host_name(idx: int) -> str:
    return f"site{idx:03d}.example.org"


# ---------------------------------------------------------------- outlinks

def outlinks(canon_url: str, n_hosts: int = N_HOSTS,
             uh: int | None = None) -> list[str]:
    """Raw (pre-canonicalization) outlinks of a fetched page.

    ``k = splitmix64(uh) mod (MAX_OUT+1)`` links; ~10% drawn from a small
    shared pool (natural duplicates), ~5% mangled with fragments/utm/case/
    default ports (canonicalizer work), ~5% robots-trap ``/private/`` paths.

    Hot-loop note: all per-link fields come from two splitmix64 rounds
    (bit-sliced) instead of murmur-over-string mixes — this function runs
    once per fetched page inside the engine's Arrow batches and was the
    dominant Python cost of the fetch stage.  Callers that already hold
    the URL's murmur64 id (the engine carries it as the ``url_hash``
    column) pass it via ``uh`` to skip recomputing the pure-Python hash;
    passing anything other than ``murmur64(canon_url)`` would fork the
    synthetic universe and break oracle parity.
    """
    if uh is None:
        uh = murmur64(canon_url)
    k = splitmix64(uh) % (MAX_OUT + 1)
    links = []
    for j in range(k):
        z = splitmix64(uh ^ (0xD1B54A32D192ED03 * (j + 1) & 0xFFFFFFFFFFFFFFFF))
        z2 = splitmix64(z)
        hostsel = z % 100
        if hostsel < 60:  # Zipf-ish head: hosts 0-4 get ~60%
            host = host_name(hostsel % 5)
        else:
            host = host_name(5 + (z >> 7) % max(1, n_hosts - 5))
        section = SECTIONS[(z >> 28) % len(SECTIONS)]
        sel = (z >> 33) % 20
        if sel < 2:  # ~10%: duplicate pool
            path = f"/{section}/pg/pool{(z >> 38) % DUP_POOL:04d}/"
        elif sel == 2:  # ~5%: robots trap
            path = f"/private/{(z >> 48) % 10_000:04x}/"
        else:
            path = f"/{section}/pg/{z2 & 0xFFFFFFFF:08x}{(z2 >> 32) & 0xFFFF:04x}/"
        url = f"https://{host}{path}"
        mangle = (z2 >> 48) % 20
        if mangle == 0:  # fragment + tracking params + stray param order
            url += "?utm_source=feed&b=2&a=1#comments"
        elif mangle == 1:  # uppercase host + default port
            url = f"https://{host.upper()}:443{path}"
        links.append(url)
    return links


# ----------------------------------------------- outlinks, batch-canonical
#
# Vectorized twin of ``outlinks()`` + ``urlnorm.canonicalize()`` for the
# engine's fetch batches.  The synthetic link space has exactly three
# shapes (see outlinks() above):
#
#   clean      — lowercase https URL, canonical by construction
#   mangle==0  — clean + "?utm_source=feed&b=2&a=1#comments"; canonical
#                form strips the fragment, drops utm_*, sorts the rest:
#                clean + "?a=1&b=2"
#   mangle==1  — uppercase host + ":443"; canonical form lowercases the
#                host and strips the default port: identical to clean
#
# so the canonical (host, canon_url, path) of every link is a pure
# function of the splitmix64 fields and can be emitted directly, without
# building the raw string or running the canonicalizer.  All numeric
# derivation is numpy over the whole batch; Python touches each link once
# for string assembly.  Parity with the scalar path (what the sequential
# oracle runs) is pinned by tests/test_properties.py::
# test_outlinks_batch_matches_scalar — any drift also trips the bit-exact
# engine-vs-oracle crawl match.

import numpy as np

_U64 = np.uint64
_GOLD = 0xD1B54A32D192ED03
_MANGLE0_Q = "?a=1&b=2"  # == canonicalize of "?utm_source=feed&b=2&a=1#comments"


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    """SplitMix64 over a uint64 ndarray (wrapping mul/add, same bits as
    the scalar ``mmh3.splitmix64``)."""
    x = x + _U64(0x9E3779B97F4A7C15)
    x = x ^ (x >> _U64(30))
    x = x * _U64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> _U64(27))
    x = x * _U64(0x94D049BB133111EB)
    x = x ^ (x >> _U64(31))
    return x


_hosts_cache: dict[int, list[str]] = {}
_SECT_PG = [f"/{s}/pg/" for s in SECTIONS]
_POOL_PATHS = [
    [f"/{s}/pg/pool{p:04d}/" for p in range(DUP_POOL)] for s in SECTIONS
]


def _hosts_list(n_hosts: int) -> list[str]:
    hosts = _hosts_cache.get(n_hosts)
    if hosts is None:
        hosts = _hosts_cache[n_hosts] = [host_name(i) for i in range(n_hosts)]
    return hosts


def outlinks_canon_batch(
    uh: np.ndarray, n_hosts: int = N_HOSTS,
) -> list[list[dict]]:
    """Per input url_hash, its outlinks ALREADY canonicalized:
    ``[{j, canon_url, host, path}, ...]`` in link order.

    ``uh`` is the murmur64 id column of the fetched pages (int64 or
    uint64; signed values reinterpret as the same 64 bits, matching the
    scalar path's Python-int masking).  Bit-identical to
    ``[canonicalize-parts(outlinks(u)) for u]`` — see module comment.
    """
    n = len(uh)
    if n == 0:
        return []
    uhv = np.asarray(uh).astype(np.uint64, copy=False)
    k = (_splitmix64_np(uhv) % _U64(MAX_OUT + 1)).astype(np.int64)

    j_consts = (
        np.arange(1, MAX_OUT + 1, dtype=np.uint64) * _U64(_GOLD)
    )  # wraps mod 2^64, == (GOLD * (j+1)) & M64
    z = _splitmix64_np(uhv[:, None] ^ j_consts[None, :])
    z2 = _splitmix64_np(z)
    valid = np.arange(MAX_OUT, dtype=np.int64)[None, :] < k[:, None]
    zf, z2f = z[valid], z2[valid]  # row-major flatten → grouped by row, j asc

    hostsel = zf % _U64(100)
    host_idx = np.where(
        hostsel < _U64(60),
        hostsel % _U64(5),
        _U64(5) + (zf >> _U64(7)) % _U64(max(1, n_hosts - 5)),
    ).astype(np.int64)
    sect = ((zf >> _U64(28)) % _U64(len(SECTIONS))).astype(np.int64)
    sel = ((zf >> _U64(33)) % _U64(20)).astype(np.int64)
    poolid = ((zf >> _U64(38)) % _U64(DUP_POOL)).astype(np.int64)
    privid = ((zf >> _U64(48)) % _U64(10_000)).astype(np.int64)
    # "%012x" of this == f"{z2 & 0xFFFFFFFF:08x}{(z2 >> 32) & 0xFFFF:04x}"
    hexv = ((z2f & _U64(0xFFFFFFFF)) << _U64(16)) | (
        (z2f >> _U64(32)) & _U64(0xFFFF)
    )
    mangle0 = ((z2f >> _U64(48)) % _U64(20)) == 0

    # n_hosts <= 5 degenerates the cold-host branch to index 5 exactly
    # (5 + z % max(1, n_hosts-5) == 5); the scalar twin calls
    # host_name(5) directly, so the lookup list must reach index 5 even
    # when the universe is smaller
    hosts = _hosts_list(max(n_hosts, 6))
    host_l = host_idx.tolist()
    sect_l = sect.tolist()
    sel_l = sel.tolist()
    pool_l = poolid.tolist()
    priv_l = privid.tolist()
    hex_l = hexv.tolist()
    m0_l = mangle0.tolist()

    out: list[list[dict]] = []
    pos = 0
    for kk in k.tolist():
        row = []
        for j in range(kk):
            i = pos + j
            s = sel_l[i]
            if s < 2:
                path = _POOL_PATHS[sect_l[i]][pool_l[i]]
            elif s == 2:
                path = f"/private/{priv_l[i]:04x}/"
            else:
                path = _SECT_PG[sect_l[i]] + format(hex_l[i], "012x") + "/"
            host = hosts[host_l[i]]
            if m0_l[i]:
                path += _MANGLE0_Q
            row.append({
                "j": j,
                "canon_url": "https://" + host + path,
                "host": host,
                "path": path,
            })
        pos += kk
        out.append(row)
    return out


# ------------------------------------------------------------------ robots

def robots_rules(host: str) -> list[tuple[str, str, int]]:
    """Deterministic per-host rules: list of (rule, path_prefix, order).

    rule ∈ {'allow','disallow'}; evaluation = longest-prefix match wins,
    tie → allow, no match → allow (see operators/robots.py + oracle).
    """
    hh = mix("robots", host)
    rules: list[tuple[str, str, int]] = []
    order = 0
    if hh % 10 < 8:  # 80% of hosts disallow /private/
        rules.append(("disallow", "/private/", order))
        order += 1
    n_extra = mix(hh, "n") % 4
    for r in range(n_extra):
        section = SECTIONS[mix(hh, r, "sec") % len(SECTIONS)]
        kind = mix(hh, r, "kind") % 3
        if kind == 0:
            rules.append(("disallow", f"/{section}/", order))
        elif kind == 1:
            # allow-override longer than a disallow (exercises longest-match)
            rules.append(("disallow", f"/{section}/", order))
            rules.append(("allow", f"/{section}/pg/", order + 1))
            order += 1
        else:
            rules.append(("disallow", f"/{section}/pg/pool", order))
        order += 1
    return rules


def crawl_delay(host: str) -> float:
    """~20% of hosts set Crawl-delay 1|2|5 (feeds token-bucket refill)."""
    hh = mix("cdelay", host)
    if hh % 5 == 0:
        return float((1, 2, 5)[mix(hh, "v") % 3])
    return 1.0


def robots_txt(host: str) -> str:
    """Render the host's rules as a robots.txt body (for parser tests
    against stdlib urllib.robotparser).

    stdlib uses first-match-in-order; our evaluator is RFC 9309
    longest-match (tie → allow).  Rendering rules longest-prefix-first
    with allow before disallow on ties makes the two semantics coincide,
    so the stdlib cross-check exercises our evaluator meaningfully.
    """
    lines = ["User-agent: *"]
    ordered = sorted(robots_rules(host),
                     key=lambda r: (-len(r[1]), r[0] != "allow"))
    for rule, prefix, _ in ordered:
        lines.append(("Allow: " if rule == "allow" else "Disallow: ") + prefix)
    cd = crawl_delay(host)
    if cd != 1.0:
        lines.append(f"Crawl-delay: {int(cd)}")
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------- politeness

def budget_for(host: str, scale: float = 1.0) -> tuple[float, float]:
    """(capacity, refill_per_wave) — hot hosts get a bigger budget.

    ``scale`` multiplies both (bench knob: larger politeness budgets =>
    larger waves, so fetch CPU dominates fixed per-wave overhead —
    SURVEY.md §6 protocol note).  Oracle and engine receive the same
    scale through their configs."""
    if host in {host_name(i) for i in range(5)}:
        return HOT_CAPACITY * scale, HOT_REFILL * scale
    return DEFAULT_CAPACITY * scale, DEFAULT_REFILL * scale
