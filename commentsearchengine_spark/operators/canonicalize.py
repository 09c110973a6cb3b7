"""Op C1 — URL canonicalization on Spark (SURVEY.md §2.A).

The full canonicalizer spec (percent-encoding normalization, dot-segment
resolution, tracking-param removal, param sort) is not expressible as a
composition of native Column functions, so it runs as an Arrow-batched
pandas UDF sharing the exact pure function with the sequential oracle
(functions/urlnorm.py).  Batches cross the JVM<->Python boundary once per
Arrow batch — never per row (BASELINE.json:15).

ONE struct-returning UDF produces (canon_url, host, path) together:
three chained scalar UDFs would be three sequential ArrowEvalPython
passes over the whole relation (each UDF depends on the previous
column), tripling boundary crossings and re-parsing every URL — measured
as a material share of wave wall-time at bench scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.urlnorm import (
    canonicalize,
    fast_canonical_parts,
    host_of,
    path_of,
)

_CANON_SCHEMA = StructType([
    StructField("canon_url", StringType()),
    StructField("host", StringType()),
    StructField("path", StringType()),
])


def _canon_parts(url: str) -> tuple[str, str, str]:
    # already-canonical URLs (most of a real link stream) skip the full
    # urlsplit pipeline — fast_canonical_parts claims identity only when
    # provable (property-tested in tests/test_urlnorm.py)
    fast = fast_canonical_parts(url)
    if fast is not None:
        return url, fast[0], fast[1]
    c = canonicalize(url)
    return c, host_of(c), path_of(c)


@pandas_udf(_CANON_SCHEMA)
def canon_struct_udf(urls: pd.Series) -> pd.DataFrame:
    rows = [_canon_parts(u) for u in urls]
    return pd.DataFrame(rows, columns=["canon_url", "host", "path"])


def with_canonical(df, url_col: str = "url"):
    """url → (canon_url, host, path) columns in one Python pass."""
    return (
        df.withColumn("_c", canon_struct_udf(F.col(url_col)))
        .withColumn("canon_url", F.col("_c.canon_url"))
        .withColumn("host", F.col("_c.host"))
        .withColumn("path", F.col("_c.path"))
        .drop("_c")
    )
