"""Op C1 — URL canonicalization on Spark (SURVEY.md §2.A).

The full canonicalizer spec (percent-encoding normalization, dot-segment
resolution, tracking-param removal, param sort) is not expressible as a
composition of native Column functions, so it runs as an Arrow-batched
pandas UDF sharing the exact pure function with the sequential oracle
(functions/urlnorm.py).  Batches cross the JVM↔Python boundary once per
Arrow batch — never per row (BASELINE.json:15).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..functions.urlnorm import canonicalize, host_of, path_of


@pandas_udf(StringType())
def canon_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


@pandas_udf(StringType())
def host_udf(canon_urls: pd.Series) -> pd.Series:
    return canon_urls.map(host_of)


@pandas_udf(StringType())
def path_udf(canon_urls: pd.Series) -> pd.Series:
    return canon_urls.map(path_of)


def with_canonical(df, url_col: str = "url"):
    """url → (canon_url, host, path) columns."""
    return (
        df.withColumn("canon_url", canon_udf(F.col(url_col)))
        .withColumn("host", host_udf(F.col("canon_url")))
        .withColumn("path", path_udf(F.col("canon_url")))
    )
