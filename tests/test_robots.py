"""Robots evaluator vs stdlib urllib.robotparser on the synthetic corpus."""

import io
import urllib.robotparser

from commentsearchengine_spark.fixtures import synth
from oracle.seqcrawl import robots_allows


def _stdlib_verdict(host: str, path: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(io.StringIO(synth.robots_txt(host)).read().splitlines())
    return rp.can_fetch("*", path)


def test_matches_stdlib_on_corpus():
    paths = [
        "/private/abcd/", "/politics/pg/pool0001/", "/politics/2024/01/01/x/",
        "/world/pg/deadbeef0001/", "/sports/", "/", "/opinions/pg/pool0499/",
        "/technology/pg/0123456789ab/",
    ]
    checked = disagreements = 0
    for i in range(60):
        host = synth.host_name(i)
        for p in paths:
            ours = robots_allows(host, p)
            std = _stdlib_verdict(host, p)
            checked += 1
            if ours != std:
                disagreements += 1
                print("DISAGREE", host, p, "ours", ours, "std", std,
                      synth.robots_txt(host))
    assert disagreements == 0, f"{disagreements}/{checked} verdicts differ"


def test_longest_match_tie_allows():
    # synthetic: disallow /a/ + allow /a/b/ → /a/b/c allowed, /a/x denied
    from oracle import seqcrawl

    orig = synth.robots_rules
    try:
        synth.robots_rules = lambda host: [
            ("disallow", "/a/", 0), ("allow", "/a/b/", 1)]
        assert seqcrawl.robots_allows("h", "/a/b/c")
        assert not seqcrawl.robots_allows("h", "/a/x")
        assert seqcrawl.robots_allows("h", "/zzz")
    finally:
        synth.robots_rules = orig
