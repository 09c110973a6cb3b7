"""Sequential pure-Python reference crawler (SURVEY.md §1.4).

The upstream reference snapshot is empty (SURVEY.md §0.1), so THIS module
IS the reference the Spark engine must match bit-for-bit: crawl ordering
(``crawl_log``), URL-seen membership (``seen``), per-bucket lineage
counters, and per-row image+caption payloads.  It is deliberately tiny,
single-threaded and obviously-correct; no Spark, no numpy outside the
shared codec module.

Wave-synchronous semantics (every tiebreak is a total order, so the
distributed engine reproduces this EXACTLY at any partition count):

wave 0   seed ingest: canonicalize, within-batch dedup (keep min seed
         index), robots filter, insert into frontier with priority=0,
         depth=0, disc_wave=0, disc_seq=seed index.
wave t≥1 1. admission: per host, order frontier entries by
            (priority, disc_wave, disc_seq, canon_url) and admit the
            first floor(tokens(host)); rank_in_host is 1-based.
         2. global_seq: admitted rows ordered by (host ASC, rank ASC)
            continue a global 1-based counter; crawl_log row =
            (wave, host, rank_in_host, canon_url, global_seq).
         3. seen += admitted (first_wave = t); frontier -= admitted;
            politeness_deferred = what stayed behind.
         4. tokens(h) = min(capacity, tokens - admitted(h) + refill)
            for every host already tracked; refill =
            refill_per_wave / max(1, crawl_delay).
         5. fetch (simulated, deterministic): payload_for(url_hash) +
            outlinks(canon_url).
         6. expansion: canonicalize → robots filter (robots_blocked) →
            within-wave dedup keeping min (priority, disc_seq) → drop
            seen members → drop current-frontier members (all counted
            deduped) → insert survivors with disc_seq =
            1_000_000·global_seq(parent) + link_index, priority = depth.
         7. lineage row per (wave, bucket): fetched/queued/deduped/
            robots_blocked/politeness_deferred.  New hosts get
            tokens = capacity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from commentsearchengine_spark.config import DISC_SEQ_STRIDE
from commentsearchengine_spark.fixtures import synth
from commentsearchengine_spark.functions.imagecodec import payload_for
from commentsearchengine_spark.functions.mmh3 import hash_str, murmur64
from commentsearchengine_spark.functions.urlnorm import canonicalize, host_of, path_of


@dataclass
class FrontierEntry:
    canon_url: str
    host: str
    url_hash: int
    priority: int
    depth: int
    disc_wave: int
    disc_seq: int
    parent_hash: int

    def order_key(self):
        return (self.priority, self.disc_wave, self.disc_seq, self.canon_url)


@dataclass
class CrawlConfig:
    n_seeds: int = 10
    n_waves: int = 5
    n_buckets: int = 64
    n_hosts: int = synth.N_HOSTS
    seed_spread_hosts: int = 0   # mirror of EngineConfig.seed_spread_hosts
    budget_scale: float = 1.0    # mirror of EngineConfig.budget_scale


def robots_allows(host: str, path: str) -> bool:
    """Longest-prefix match wins; tie → allow; no match → allow."""
    best_len, best_allow = -1, True
    for rule, prefix, _ in synth.robots_rules(host):
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len:
                best_len, best_allow = plen, (rule == "allow")
            elif plen == best_len and rule == "allow":
                best_allow = True
    return best_allow


@dataclass
class SeqCrawl:
    cfg: CrawlConfig
    frontier: dict[str, FrontierEntry] = field(default_factory=dict)
    seen: dict[str, tuple[int, int]] = field(default_factory=dict)  # url -> (hash, wave)
    tokens: dict[str, float] = field(default_factory=dict)
    crawl_log: list[tuple] = field(default_factory=list)  # (wave, host, rank, url, seq)
    lineage: list[tuple] = field(default_factory=list)
    pages: list[dict] = field(default_factory=list)
    global_seq: int = 0
    wave: int = 0

    def bucket(self, host: str) -> int:
        return hash_str(host) % self.cfg.n_buckets

    # ------------------------------------------------------------- wave 0
    def ingest_seeds(self) -> None:
        counters: dict[int, dict[str, int]] = {}
        seen_batch: set[str] = set()
        for i, raw in enumerate(synth.seed_urls(
                self.cfg.n_seeds, self.cfg.seed_spread_hosts)):
            cu = canonicalize(raw)
            host = host_of(cu)
            b = self.bucket(host)
            c = counters.setdefault(
                b, dict(fetched=0, queued=0, deduped=0, robots_blocked=0,
                        politeness_deferred=0))
            if cu in seen_batch:
                c["deduped"] += 1
                continue
            seen_batch.add(cu)
            if not robots_allows(host, path_of(cu)):
                c["robots_blocked"] += 1
                continue
            self.frontier[cu] = FrontierEntry(
                canon_url=cu, host=host, url_hash=murmur64(cu), priority=0,
                depth=0, disc_wave=0, disc_seq=i, parent_hash=0)
            if host not in self.tokens:
                self.tokens[host] = synth.budget_for(host, self.cfg.budget_scale)[0]
            c["queued"] += 1
        for b in sorted(counters):
            c = counters[b]
            self.lineage.append((0, b, c["fetched"], c["queued"], c["deduped"],
                                 c["robots_blocked"], c["politeness_deferred"]))

    # ------------------------------------------------------------ wave t≥1
    def run_wave(self) -> int:
        self.wave += 1
        t = self.wave
        counters: dict[int, dict[str, int]] = {}

        def ctr(host: str) -> dict[str, int]:
            return counters.setdefault(
                self.bucket(host),
                dict(fetched=0, queued=0, deduped=0, robots_blocked=0,
                     politeness_deferred=0))

        # 1. admission (per-host total order)
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in self.frontier.values():
            by_host.setdefault(e.host, []).append(e)
        admitted: list[tuple[str, int, FrontierEntry]] = []  # (host, rank, e)
        admitted_count: dict[str, int] = {}
        for host in sorted(by_host):
            entries = sorted(by_host[host], key=FrontierEntry.order_key)
            budget = int(math.floor(self.tokens.get(
                host, synth.budget_for(host, self.cfg.budget_scale)[0])))
            take = entries[: max(0, budget)]
            admitted_count[host] = len(take)
            for rank, e in enumerate(take, start=1):
                admitted.append((host, rank, e))
            ctr(host)["politeness_deferred"] += len(entries) - len(take)

        # 2. global_seq over (host ASC, rank ASC) — `admitted` is already in
        # that order because hosts were visited sorted.
        wave_log: list[tuple] = []
        for host, rank, e in admitted:
            self.global_seq += 1
            wave_log.append((t, host, rank, e.canon_url, self.global_seq))
            ctr(host)["fetched"] += 1
        self.crawl_log.extend(wave_log)

        # 3. seen += admitted; frontier -= admitted
        for host, _rank, e in admitted:
            self.seen[e.canon_url] = (e.url_hash, t)
            del self.frontier[e.canon_url]

        # 4. token-bucket refill for every tracked host
        for host in list(self.tokens):
            cap, refill_per_wave = synth.budget_for(host, self.cfg.budget_scale)
            refill = refill_per_wave / max(1.0, synth.crawl_delay(host))
            self.tokens[host] = min(
                cap, self.tokens[host] - admitted_count.get(host, 0) + refill)

        # 5. fetch + 6. expansion
        candidates: dict[str, FrontierEntry] = {}
        for (_t, host, _rank, cu, gseq), (_h2, _r2, e) in zip(wave_log, admitted):
            payload = payload_for(e.url_hash, host, t)
            payload.update(url=cu, canon_url=cu, host=host, wave=t,
                           fetched_seq=gseq)
            self.pages.append(payload)
            for j, raw in enumerate(synth.outlinks(cu, self.cfg.n_hosts)):
                ccu = canonicalize(raw)
                chost = host_of(ccu)
                if not robots_allows(chost, path_of(ccu)):
                    ctr(chost)["robots_blocked"] += 1
                    continue
                cand = FrontierEntry(
                    canon_url=ccu, host=chost, url_hash=murmur64(ccu),
                    priority=e.depth + 1, depth=e.depth + 1, disc_wave=t,
                    disc_seq=DISC_SEQ_STRIDE * gseq + j, parent_hash=e.url_hash)
                prev = candidates.get(ccu)
                if prev is None:
                    candidates[ccu] = cand
                elif (cand.priority, cand.disc_seq) < (prev.priority, prev.disc_seq):
                    candidates[ccu] = cand
                    ctr(chost)["deduped"] += 1
                else:
                    ctr(chost)["deduped"] += 1

        for ccu, cand in candidates.items():
            if ccu in self.seen or ccu in self.frontier:
                ctr(cand.host)["deduped"] += 1
                continue
            self.frontier[ccu] = cand
            if cand.host not in self.tokens:
                self.tokens[cand.host] = synth.budget_for(
                    cand.host, self.cfg.budget_scale)[0]
            ctr(cand.host)["queued"] += 1

        # 7. lineage
        for b in sorted(counters):
            c = counters[b]
            self.lineage.append((t, b, c["fetched"], c["queued"], c["deduped"],
                                 c["robots_blocked"], c["politeness_deferred"]))
        return len(admitted)

    def run(self) -> "SeqCrawl":
        self.ingest_seeds()
        for _ in range(self.cfg.n_waves):
            self.run_wave()
        return self


def run_oracle(n_seeds: int, n_waves: int, n_buckets: int = 64,
               n_hosts: int = synth.N_HOSTS, seed_spread_hosts: int = 0,
               budget_scale: float = 1.0) -> SeqCrawl:
    return SeqCrawl(CrawlConfig(
        n_seeds=n_seeds, n_waves=n_waves, n_buckets=n_buckets,
        n_hosts=n_hosts, seed_spread_hosts=seed_spread_hosts,
        budget_scale=budget_scale)).run()
