"""Driver-contract conformance (SURVEY.md §5.6).

Pre-flight for the driver's CORRECTNESS gate: every queries() entry
with an oracle_sql() twin must agree with DuckDB on row count, column
names, and the order-insensitive normalized value multiset at sf0.001.
Engine-backed rows-only entries are exercised in the crawl/e2e tests,
not here (they run a multi-wave crawl and would dominate suite time).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from check_conformance import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_ORACLED = sorted(entry_mod.oracle_sql())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_oracle_key_has_a_query():
    qs = entry_mod.queries()
    missing = set(entry_mod.oracle_sql()) - set(qs)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "score", "rank"]


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ok, msg = compare(name, fn(spark, SF_DIR), sql, duck)
    assert ok, f"{name}: {msg}"
