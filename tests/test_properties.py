"""Property-based tests (SURVEY.md §5.4) — no Spark, pure Python, fast.

- oracle determinism: same config → bit-identical crawl;
- robots longest-match stability: verdict independent of rule order;
- splitmix64/outlinks determinism + structural bounds;
- minhash monotonicity: signature min is over the shingle set, so
  supersets can only lower each component.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from commentsearchengine_spark.fixtures import synth
from oracle.seqcrawl import CrawlConfig, SeqCrawl, robots_allows


@settings(max_examples=10, deadline=None)
@given(
    n_seeds=st.integers(min_value=1, max_value=8),
    n_waves=st.integers(min_value=1, max_value=3),
    n_buckets=st.sampled_from([4, 64]),
)
def test_oracle_deterministic(n_seeds, n_waves, n_buckets):
    def run():
        o = SeqCrawl(CrawlConfig(
            n_seeds=n_seeds, n_waves=n_waves, n_buckets=n_buckets,
            n_hosts=50)).run()
        return (tuple(o.crawl_log), tuple(sorted(o.seen)),
                tuple(sorted(o.lineage)))

    assert run() == run()


@settings(max_examples=50, deadline=None)
@given(
    host_i=st.integers(min_value=0, max_value=199),
    section=st.sampled_from(synth.SECTIONS),
    tail=st.text(alphabet="abcdef0123456789/", max_size=20),
)
def test_robots_longest_match_order_independent(host_i, section, tail):
    """The evaluator folds over rules; permuting rule order must never
    change the verdict (longest-prefix + tie->allow is order-free)."""
    host = synth.host_name(host_i)
    path = f"/{section}/{tail}"
    rules = synth.robots_rules(host)

    def verdict(rule_list):
        best_len, best_allow = -1, True
        for rule, prefix, _ in rule_list:
            if path.startswith(prefix):
                plen = len(prefix)
                if plen > best_len:
                    best_len, best_allow = plen, (rule == "allow")
                elif plen == best_len and rule == "allow":
                    best_allow = True
        return best_allow

    base = robots_allows(host, path)
    assert verdict(rules) == base
    assert verdict(list(reversed(rules))) == base


@settings(max_examples=50, deadline=None)
@given(url_i=st.integers(min_value=0, max_value=10_000))
def test_outlinks_deterministic_and_bounded(url_i):
    url = f"https://site{url_i % 200:03d}.example.org/politics/pg/{url_i:08x}/"
    links = synth.outlinks(url)
    assert links == synth.outlinks(url)
    assert len(links) <= synth.MAX_OUT
    for raw in links:
        assert raw.startswith("https://")


@settings(max_examples=20, deadline=None)
@given(
    uhs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0, max_size=64),
    # include universes at/below the 5 hot hosts: the cold-host branch
    # degenerates to index 5 there and must still match the scalar twin
    n_hosts=st.sampled_from([2, 5, 6, 37]),
)
def test_outlinks_batch_matches_scalar(uhs, n_hosts):
    """The engine's vectorized batch generator must emit exactly the
    canonical parts the oracle derives via outlinks()+canonicalize() —
    any drift forks the synthetic universe and breaks crawl parity."""
    import numpy as np

    from commentsearchengine_spark.functions.urlnorm import (
        canonicalize, fast_canonical_parts, host_of, path_of,
    )

    batch = synth.outlinks_canon_batch(
        np.array(uhs, dtype=np.int64), n_hosts=n_hosts)
    assert len(batch) == len(uhs)
    for uh, row in zip(uhs, batch, strict=True):
        raws = synth.outlinks("ignored", n_hosts=n_hosts, uh=uh)
        assert len(row) == len(raws)
        for j, (raw, link) in enumerate(zip(raws, row, strict=True)):
            fast = fast_canonical_parts(raw)
            if fast is not None:
                cu, host, path = raw, fast[0], fast[1]
            else:
                cu = canonicalize(raw)
                host, path = host_of(cu), path_of(cu)
            assert link == {
                "j": j, "canon_url": cu, "host": host, "path": path,
            }


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=2, max_size=20, unique=True),
)
def test_minhash_superset_monotone(words):
    """min over md5 of a SUPERSET of shingles is component-wise <= the
    subset's min — the property that makes minhash a valid set sketch."""

    def sig(ws):
        return [
            min(hashlib.md5(f"{i}|{w}".encode()).hexdigest() for w in ws)
            for i in range(8)
        ]

    subset = words[: len(words) // 2] or words[:1]
    s_sub, s_all = sig(subset), sig(words)
    assert all(a <= b for a, b in zip(s_all, s_sub))
