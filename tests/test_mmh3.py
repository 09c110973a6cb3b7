"""Pin the pure-Python murmur3 twin to Spark's native F.hash (SURVEY §0.4)."""

import random
import string

from pyspark.sql import functions as F

from commentsearchengine_spark.functions.mmh3 import hash_str, murmur64
from commentsearchengine_spark.functions.spark_cols import murmur64_col


def _random_strings(n: int, seed: int = 42) -> list[str]:
    rnd = random.Random(seed)
    alphabet = string.printable + "üñîçødé✓漢字"
    out = []
    for _ in range(n):
        k = rnd.randrange(0, 50)
        out.append("".join(rnd.choice(alphabet) for _ in range(k)))
    return out


def test_hash32_matches_spark(spark):
    samples = _random_strings(500) + ["", "a", "ab", "abc", "abcd",
                                      "http://x.io/p?q=1"]
    df = spark.createDataFrame([(s,) for s in samples], "u string")
    rows = df.select("u", F.hash("u").alias("h")).collect()
    for r in rows:
        assert hash_str(r["u"]) == r["h"], repr(r["u"])


def test_murmur64_matches_spark_column(spark):
    samples = _random_strings(300, seed=7)
    df = spark.createDataFrame([(s,) for s in samples], "u string")
    rows = df.select("u", murmur64_col(F.col("u")).alias("h")).collect()
    for r in rows:
        assert murmur64(r["u"]) == r["h"], repr(r["u"])


def test_seed_urls_df_matches_python_twin(spark):
    """The engine's distributed seed synthesis must emit exactly the
    strings the oracle's pure-Python synth.seed_urls builds — including
    4-digit host indexes, where lpad-style padding would truncate."""
    from commentsearchengine_spark.fixtures import synth
    from commentsearchengine_spark.functions.spark_cols import seed_urls_df

    for n, spread in [(500, 0), (500, 37), (2500, 2000)]:
        want = synth.seed_urls(n, spread)
        got = [
            r["url"]
            for r in seed_urls_df(spark, n, spread)
            .orderBy("disc_seq").collect()
        ]
        assert got == want, (n, spread)
