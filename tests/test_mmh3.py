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
