"""The real-Iceberg swap-in boundary (SURVEY.md §1.3, VERDICT r3 #8).

This sandbox ships no iceberg-spark-runtime jar, so the round-trip test
skips itself here; what runs everywhere is the import-safety and the
fail-loud constructor contract.  On a cluster with the jar the skipped
test exercises write -> checkpoint-pin -> VERSION-AS-OF scan.
"""

import pytest

from commentsearchengine_spark.sources import iceberg_adapter


def test_import_safe_and_probe_false_without_jar(spark):
    # capability probe must not raise without the jar...
    available = iceberg_adapter.iceberg_available(spark)
    if available:  # pragma: no cover - only on a real cluster
        pytest.skip("jar present; covered by the round-trip test")
    # ...and constructing the adapter without it fails loud, naming both
    # the local fallback and the spark-submit fix
    with pytest.raises(RuntimeError, match="icelite"):
        iceberg_adapter.IcebergCatalog(spark, "demo.db")


def test_roundtrip_with_real_iceberg(spark):
    if not iceberg_adapter.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not available in sandbox")
    cat = iceberg_adapter.IcebergCatalog(spark, "demo.db")  # pragma: no cover
    df = spark.range(5).withColumnRenamed("id", "x")
    cat.stage_write(df, "t", mode="overwrite")
    sid = cat._current_snapshot_id("t")
    cat.commit(wave=1, state={"k": "v"})
    assert cat.scan(spark, "t", snapshot_id=sid).count() == 5
