"""Regression tests for the round-5 pipeline fixes (ADVICE r4 medium,
VERDICT r4 tasks #5/#6): short-document shingle safety under ANSI mode,
the shuffle-free simhash plan, and the ngram validation-scale guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commentsearchengine_spark.relational import pipeline as P


@pytest.fixture(scope="module")
def short_docs_dir(spark, tmp_path_factory) -> str:
    """documents table containing 0/1/2/3-token docs — the inputs that
    made the unguarded sequence() shingles throw INVALID_ARRAY_INDEX."""
    d = tmp_path_factory.mktemp("shortdocs")
    spark.createDataFrame(
        [
            (1, "one"),
            (2, "two words"),
            (3, "three word doc"),
            (4, ""),
            (5, "a much longer document a much longer document indeed"),
            (25, "sampled query doc with several tokens inside it"),
            (50, "three word doc"),  # exact dup of 3 -> a real pair
        ],
        "doc_id int, text string",
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_ngram_jaccard_survives_short_docs(spark, short_docs_dir):
    # pre-fix this threw INVALID_ARRAY_INDEX on the 2-token doc (Spark
    # sequence(1, 0) is the DESCENDING [1, 0], indexing _toks[2])
    rows = P.q_ngram_jaccard_pairs(spark, short_docs_dir).collect()
    # doc 25 is the only sampled query (doc_id % 25 == 0 and 3+ tokens
    # worth of shingles); doc 0/50's identical text isn't similar to it
    for r in rows:
        assert r.query_doc % P.NGRAM_SAMPLE_MOD == 0


def test_bigram_shingles_survive_short_docs(spark, short_docs_dir):
    # _SHINGLES (bigrams) had the same latent bug for 0/1-token docs
    docs = spark.read.parquet(short_docs_dir + "/documents.parquet")
    out = P._shingled(docs).collect()
    by_id = {r.doc_id: r.sh for r in out}
    assert by_id[1] == []  # 1 token -> no bigram
    assert by_id[4] == []  # 0 tokens
    assert by_id[2] == ["two words"]


def test_simhash_short_docs_and_plan(spark, short_docs_dir):
    df = P.q_simhash(spark, short_docs_dir)
    rows = {r.doc_id: r.simhash for r in df.collect()}
    assert 4 not in rows  # zero-token docs drop (oracle/unnest parity)
    assert rows[3] == rows[50]  # identical text -> identical simhash
    # the rewrite's whole point: a pure projection, zero Exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_guard_raises_past_validation_scale(
    spark, short_docs_dir, monkeypatch
):
    monkeypatch.setattr(P, "NGRAM_QUERY_MAX_DOCS", -1)
    with pytest.raises(ValueError, match="validation-scale"):
        P.q_ngram_jaccard_pairs(spark, short_docs_dir)


def test_cosine_guard_still_raises(spark, sf_dir, monkeypatch):
    # sibling guard (ADVICE r3) keeps working: shrink the limit under
    # the sf0.001 corpus size
    import commentsearchengine_spark.relational.pipeline as pl

    real = pl.q_cosine_near_dup_pairs.__wrapped__ if hasattr(
        pl.q_cosine_near_dup_pairs, "__wrapped__") else None
    assert real is None  # plain function, no decorator surprises
    with pytest.raises(ValueError, match="validation-scale"):
        # monkeypatch the literal via a tiny shim: rebuild with n>limit
        # is impractical, so instead call with a fake load returning a
        # big count
        class FakeDF:
            def count(self):
                return 2_000_000

        monkeypatch.setattr(
            pl, "load", lambda spark, sf, *t: (FakeDF(),))
        pl.q_cosine_near_dup_pairs(spark, sf_dir)
