"""Continuous VCF ingest (streaming/vcf_ingest.py): incremental shard
pickup, exactly-once per file via checkpoint, derived stats parity with
the batch pipeline."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tests.fixtures.make_mini_vcf import BODY, HEADER, write_fixture
from vcf2db_spark.streaming.vcf_ingest import stream_load_vcf

#: second sequencing batch — same cohort/header, new loci
SHARD2 = """\
chr2\t500\t.\tA\tT\t44.0\tPASS\tAC=2;AF=0.333;DP=19\tGT:GQ:DP:AD\t0/1:70:9:5,4\t0/1:66:8:4,4\t0/0:81:7:7,0
chr2\t600\t.\tC\tG\t55.0\tPASS\tAC=1;AF=0.167;DP=23;PASSFLAG\tGT:GQ:DP:AD\t0/0:90:11:11,0\t0/0:85:10:10,0\t0/1:77:9:5,4
"""


@pytest.fixture()
def dirs(tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    out = tmp_path / "variants_out"
    ckpt = tmp_path / "ckpt"
    header_vcf, _ = write_fixture(str(tmp_path / "hdr"))
    return watch, str(out), str(ckpt), header_vcf


def _drain(spark, watch, out, ckpt, header_vcf):
    q = stream_load_vcf(spark, str(watch), header_vcf, out, ckpt)
    q.awaitTermination(120)
    return q


def test_incremental_shards_exactly_once(spark, dirs):
    watch, out, ckpt, header_vcf = dirs

    (watch / "shard1.vcf").write_text(HEADER + BODY)  # full file w/ header
    _drain(spark, watch, out, ckpt, header_vcf)
    df1 = spark.read.parquet(out)
    assert df1.count() == 6  # header lines skipped, 6 records parsed

    (watch / "shard2.vcf").write_text(SHARD2)  # headerless data shard
    _drain(spark, watch, out, ckpt, header_vcf)
    df2 = spark.read.parquet(out)
    # shard1 NOT re-processed (checkpoint), shard2 appended
    assert df2.count() == 8
    assert df2.filter(F.col("start") == 499).count() == 1


def test_streamed_stats_match_batch_pipeline(spark, dirs):
    watch, out, ckpt, header_vcf = dirs
    (watch / "shard1.vcf").write_text(HEADER + BODY)
    _drain(spark, watch, out, ckpt, header_vcf)

    from vcf2db_spark.pipeline import load_vcf

    streamed = (
        spark.read.parquet(out)
        .select("chrom", "start", "ref", "alt", "type", "sub_type", "num_het", "aaf")
        .collect()
    )
    batch = (
        load_vcf(spark, header_vcf)
        .variants.select("chrom", "start", "ref", "alt", "type", "sub_type", "num_het", "aaf")
        .collect()
    )
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


def test_no_variant_id_in_stream_mode(spark, dirs):
    watch, out, ckpt, header_vcf = dirs
    (watch / "s.vcf").write_text(HEADER + BODY)
    _drain(spark, watch, out, ckpt, header_vcf)
    assert "variant_id" not in spark.read.parquet(out).columns


def test_stream_decompose_split(spark, dirs):
    """Streaming ingest with in-engine decomposition: a multi-allelic
    shard yields one row per alt."""
    watch, out, ckpt, header_vcf = dirs
    (watch / "multi.vcf").write_text(
        "chr1\t700\t.\tA\tG,T\t40.0\tPASS\tAC=1,2;AF=0.167,0.333;DP=21"
        "\tGT:GQ:DP:AD\t1/2:50:9:1,4,4\t0/1:60:8:4,4,0\t0/0:70:7:7,0,0\n"
    )
    q = stream_load_vcf(spark, str(watch), header_vcf, out, ckpt, decompose="split")
    q.awaitTermination(120)
    df = spark.read.parquet(out).filter(F.col("start") == 699)
    rows = {r["alt"]: r for r in df.collect()}
    assert set(rows) == {"G", "T"}
    assert rows["G"]["ac"] == 1 and rows["T"]["ac"] == 2
    assert rows["G"]["gt_types"] == [2, 1, 0]  # 1/2→./1 unknown; 0/1→het
    assert rows["T"]["gt_types"] == [2, 2, 0]
