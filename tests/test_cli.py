"""CLI entry-point test: `python -m vcf2db_spark vcf ped out_dir` writes
the reference's table set as parquet datasets (SURVEY.md §3 entry 1)."""

from __future__ import annotations

import os

from vcf2db_spark.__main__ import main
from tests.fixtures.make_mini_vcf import write_fixture


def test_cli_parquet_load(spark, tmp_path):
    vcf, ped = write_fixture(str(tmp_path / "src"))
    out = str(tmp_path / "db")
    rc = main(
        [vcf, ped, out, "--expand", "gt_types", "--legacy-compression",
         "--black-list", "culprit"]
    )
    assert rc == 0
    for t in ("variants", "variant_impacts", "samples", "vcf_header", "expanded_gt_types"):
        assert os.path.isdir(os.path.join(out, t)), t

    v = spark.read.parquet(os.path.join(out, "variants"))
    assert v.count() == 6
    assert "culprit" not in v.columns  # black-listed
    assert "gt_types_blob" in v.columns  # legacy blobs
    assert "chrom" in v.columns  # partition column round-trips

    ex = spark.read.parquet(os.path.join(out, "expanded_gt_types"))
    assert ex.count() == 6 * 3
    assert set(ex.columns) == {"variant_id", "sample_idx", "value", "sample_name"}
    names = {r["sample_name"] for r in ex.select("sample_name").distinct().collect()}
    assert names == {"NA001", "NA002", "NA003"}


def test_cli_rejects_unknown_expand(tmp_path):
    vcf, ped = write_fixture(str(tmp_path / "src2"))
    rc = main([vcf, ped, str(tmp_path / "db2"), "--expand", "nope"])
    assert rc == 2


def test_cli_sqlite_artifact(spark, tmp_path):
    """Reference drop-in: `python -m vcf2db_spark mini.vcf mini.ped mini.db`
    produces a queryable gemini-compatible SQLite file."""
    import sqlite3

    vcf, ped = write_fixture(str(tmp_path / "src3"))
    db_path = str(tmp_path / "mini.db")
    rc = main([vcf, ped, db_path, "--expand", "gt_types"])
    assert rc == 0
    con = sqlite3.connect(db_path)
    try:
        tables = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"variants", "variant_impacts", "samples", "vcf_header", "expanded_gt_types"} <= tables
        (n,) = con.execute("SELECT count(*) FROM variants").fetchone()
        assert n == 6
        (nx,) = con.execute("SELECT count(*) FROM expanded_gt_types").fetchone()
        assert nx == 18
    finally:
        con.close()


def test_cli_query_subcommand(spark, tmp_path, capsys):
    """`python -m vcf2db_spark query <artifact> -q ... --gt-filter ...` —
    the gemini-query shape over both artifact kinds (parquet dir, .db)."""
    vcf, ped = write_fixture(str(tmp_path / "src4"))
    for target in ("pq_out", "mini2.db"):
        out = str(tmp_path / target)
        assert main([vcf, ped, out]) == 0
        capsys.readouterr()  # drain the loader's progress line
        rc = main(
            [
                "query",
                out,
                "-q",
                "SELECT chrom, start, gene FROM variants "
                "WHERE impact_severity = 'HIGH' ORDER BY chrom, start",
                "--gt-filter",
                "gt_types.NA001 == HET",
            ]
        )
        assert rc == 0
        got = capsys.readouterr().out.strip().splitlines()
        assert got[0] == "chrom\tstart\tgene"
        # HIGH-severity variants: chr1:300 frameshift BRCA2 (NA001 is 1/1,
        # filtered out) and chr2:150 stop_gained MLH1 (NA001 is 0/1 = HET)
        assert got[1:] == ["chr2\t149\tMLH1"], (target, got)
