"""Scan-width rescue (io.table_wide): the row-group-starved fixture scan
must widen to the session's parallelism, the footer probe must cache, and
a wide input must pass through untouched (the 100 TB no-op guarantee)."""

from __future__ import annotations

from vcf2db_spark import io as vio

SF = "/root/testdata/sf0.001"


def test_narrow_fixture_widens(spark):
    cores = spark.sparkContext.defaultParallelism
    plain = vio.table(spark, SF, "documents")
    wide = vio.table_wide(spark, SF, "documents", "doc_id")
    assert plain.rdd.getNumPartitions() < cores
    assert wide.rdd.getNumPartitions() == cores


def test_rows_unchanged(spark):
    plain = sorted(r["doc_id"] for r in vio.table(spark, SF, "documents").collect())
    wide = sorted(
        r["doc_id"] for r in vio.table_wide(spark, SF, "documents", "doc_id").collect()
    )
    assert plain == wide


def test_probe_caches_per_path(spark):
    vio.table_wide(spark, SF, "embeddings", "vec_id")
    cores = spark.sparkContext.defaultParallelism
    key = (f"{SF}/embeddings.parquet", cores)
    assert key in vio._NARROW_SCAN
    assert vio._NARROW_SCAN[key] is True  # single-row-group fixture


def test_wide_input_is_noop(spark, tmp_path):
    # production-shaped input (multi-file directory): the footer probe
    # takes the defensive no-rescue branch — NO repartition is added, so
    # at scale table_wide is plan-identical to table()
    cores = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide")
    spark.range(0, 100_000).selectExpr("id", "id % 7 AS k").repartition(
        max(2, cores // 2)
    ).write.parquet(path)
    import shutil

    shutil.move(path, str(tmp_path / "t.parquet"))
    df = vio.table_wide(spark, str(tmp_path), "t", "id")
    assert vio._NARROW_SCAN[(f"{tmp_path}/t.parquet", cores)] is False
    assert "RepartitionByExpression" not in df._jdf.queryExecution().toString()
