"""Remaining §2.B operator categories: Python UDTF, grouped-agg pandas
UDF, scalar pandas UDF, and CSV/JSON source round-trips.

The UDTF reimplements the shared token relation, so its DuckDB oracle is
exact — the driver's value-hash check then covers the UDTF row-expansion
path, not just its row count.
"""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from .search import _SQL_TOKENS
from .util import load


def q_udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (Spark 4.x): 1 -> N row expansion per document,
    lateral-joined — the same shape as the engine's outlink expansion."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, term string")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401
            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            for pos, term in enumerate(toks):
                yield pos, term

    spark.udtf.register("cse_tokenize", Tokenize)
    (docs,) = load(spark, sf, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM udtf_docs d, LATERAL cse_tokenize(d.text) t
        """
    )


SQL_UDTF_TOKENIZE = f"""
SELECT doc_id, pos, term FROM ({_SQL_TOKENS})
"""


def q_grouped_agg_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: geometric mean of event values."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(math.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
        # agg() — so the count is a pandas aggregate too
        return len(v)

    (events,) = load(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.round(geo_mean("value"), 4).alias("geo_mean_value"),
        n_rows("value").alias("n"),
    )


SQL_GROUPED_AGG_PANDAS = """
SELECT event_type, round(exp(avg(ln(value))), 4) AS geo_mean_value,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_scalar_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar (series->series) pandas UDF with an exact SQL oracle."""

    @pandas_udf("double")
    def signed_log(v: pd.Series) -> pd.Series:
        import numpy as np

        a = v.to_numpy()
        return pd.Series(np.sign(a) * np.log1p(np.abs(a)))

    (events,) = load(spark, sf, "events")
    return events.select(
        "event_id",
        F.round(signed_log("value"), 6).alias("signed_log_value"),
    )


SQL_SCALAR_PANDAS_UDF = """
SELECT event_id,
       round(sign(value) * ln(1 + abs(value)), 6) AS signed_log_value
FROM events
"""


def q_grouped_map_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: z-normalize event values per type.
    Exact oracle: the same algebra as SQL window avg/stddev_samp."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        pdf["z"] = ((v - v.mean()) / sd).round(4)
        return pdf[["event_id", "event_type", "z"]]

    (events,) = load(spark, sf, "events")
    return events.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, z double"
    )


SQL_GROUPED_MAP_NORMALIZE = """
SELECT event_id, event_type,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS z
FROM events WINDOW w AS (PARTITION BY event_type)
"""


def _roundtrip_dir(sf: str, fmt: str) -> str:
    key = os.path.basename(os.path.normpath(sf))
    return os.path.join(tempfile.gettempdir(), f"cse_{fmt}_{key}")


def q_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """CSV sink+source: write `nation` as CSV, read it back with an
    explicit schema, aggregate.  Rows-only (the oracle views see only
    the parquet tables, not the derived temp files)."""
    (nation,) = load(spark, sf, "nation")
    path = _roundtrip_dir(sf, "csv")
    nation.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", True).csv(path)
    return back.groupBy("n_regionkey").agg(F.count("*").alias("n_nations"))


def q_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-lines sink+source round-trip over `region` (rows-only)."""
    (region,) = load(spark, sf, "region")
    path = _roundtrip_dir(sf, "json")
    region.coalesce(1).write.mode("overwrite").json(path)
    back = spark.read.schema("r_regionkey int, r_name string").json(path)
    return back.orderBy("r_regionkey").select("r_regionkey", "r_name")


QUERIES: dict[str, tuple] = {
    "udtf_tokenize": (q_udtf_tokenize, SQL_UDTF_TOKENIZE),
    "grouped_agg_pandas": (q_grouped_agg_pandas, SQL_GROUPED_AGG_PANDAS),
    "scalar_pandas_udf": (q_scalar_pandas_udf, SQL_SCALAR_PANDAS_UDF),
    "grouped_map_normalize": (
        q_grouped_map_normalize, SQL_GROUPED_MAP_NORMALIZE),
    "csv_roundtrip": (q_csv_roundtrip, None),
    "json_roundtrip": (q_json_roundtrip, None),
}
