"""CLI entry-point test: `python -m vcf2db_spark vcf ped out_dir` writes
the reference's table set as parquet datasets (SURVEY.md §3 entry 1)."""

from __future__ import annotations

import os

import pytest

from vcf2db_spark.__main__ import main
from tests.fixtures.make_mini_vcf import write_fixture

# Each CLI test drives `python -m vcf2db_spark` end to end — its OWN
# SparkSession per invocation (~40 s apiece, ~4.5 min for the module).
# The layers under the CLI (sources, sinks, operators, queries) all have
# direct in-session tests; the subprocess-shaped sweep is opt-in via
# `-m slow_sweep` so the default suite fits the driver's pytest window.
pytestmark = pytest.mark.slow_sweep


def test_cli_parquet_load(spark, tmp_path):
    vcf, ped = write_fixture(str(tmp_path / "src"))
    out = str(tmp_path / "db")
    rc = main(
        [vcf, ped, out, "--expand", "gt_types", "--expand-wide", "gt_types",
         "--legacy-compression", "--black-list", "culprit"]
    )
    assert rc == 0
    for t in ("variants", "variant_impacts", "samples", "vcf_header",
              "expanded_gt_types", "expanded_wide_gt_types"):
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

    wide = spark.read.parquet(os.path.join(out, "expanded_wide_gt_types"))
    assert set(wide.columns) == {
        "variant_id", "gt_types_NA001", "gt_types_NA002", "gt_types_NA003"
    }
    assert wide.count() == 6
    # wide row == long rows for the same variant
    w1 = wide.filter(wide.variant_id == 1).collect()[0]
    l1 = {r["sample_name"]: r["value"] for r in ex.filter(ex.variant_id == 1).collect()}
    assert [w1[f"gt_types_{s}"] for s in ("NA001", "NA002", "NA003")] == [
        l1["NA001"], l1["NA002"], l1["NA003"]
    ]


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


def test_cli_stats_subcommand(spark, tmp_path, capsys):
    """`python -m vcf2db_spark stats <artifact> --tstv/--burden/--roh` —
    the gemini-stats tool shape."""
    vcf, ped = write_fixture(str(tmp_path / "src5"))
    out = str(tmp_path / "stats_out")
    assert main([vcf, ped, out]) == 0
    capsys.readouterr()

    assert main(["stats", out, "--tstv"]) == 0
    tstv_out = capsys.readouterr().out.strip().splitlines()
    assert tstv_out[0].split("\t")[:2] == ["n_ts", "n_tv"]
    assert len(tstv_out) == 2

    assert main(["stats", out, "--burden"]) == 0
    burden_out = capsys.readouterr().out.strip().splitlines()
    assert any("MLH1" in ln or "BRCA2" in ln for ln in burden_out[1:])

    assert main(["stats", out, "--roh", "--min-snps", "1", "--min-size-bp", "1"]) == 0
    roh_out = capsys.readouterr().out.strip().splitlines()
    assert len(roh_out) >= 2  # header + at least one degenerate run

    assert main(
        ["stats", out, "--roh-tolerant", "--min-snps", "1", "--min-size-bp", "1",
         "--max-hets", "1", "--max-unknowns", "1"]
    ) == 0
    tol_out = capsys.readouterr().out.strip().splitlines()
    # tolerant runs absorb interruptions → at least as many/long runs
    assert len(tol_out) >= len(roh_out)


def test_cli_inheritance_subcommand(spark, tmp_path, capsys):
    """`python -m vcf2db_spark inheritance <artifact> --model ...`."""
    vcf, ped = write_fixture(str(tmp_path / "src6"))
    out = str(tmp_path / "inh_out")
    assert main([vcf, ped, out]) == 0
    capsys.readouterr()

    assert main(["inheritance", out, "--model", "mendel_errors"]) == 0
    me = capsys.readouterr().out.strip().splitlines()
    assert me and "variant_id" in me[0].split("\t")

    assert main(["inheritance", out, "--model", "de_novo"]) == 0
    dn = capsys.readouterr().out.strip().splitlines()
    assert dn  # header row prints even when no trio qualifies


def test_cli_annotate_subcommand(spark, tmp_path, capsys):
    """`python -m vcf2db_spark annotate <artifact> <bed> ...` — the
    gemini-annotate tool shape end-to-end."""
    vcf, ped = write_fixture(str(tmp_path / "src7"))
    out = str(tmp_path / "anno_src")
    assert main([vcf, ped, out]) == 0
    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t0\t250\tregionA\t5\t+\nchr2\t100\t200\tregionB\t7\t-\n")
    aug = str(tmp_path / "augmented")
    rc = main(
        [
            "annotate", out, str(bed),
            "--boolean", "in_region", "--count", "n_regions",
            "--extract", "region_names:name:uniq", "max_score:score:max",
            "-o", aug,
        ]
    )
    assert rc == 0
    got = {
        r["start"]: (r["in_region"], r["n_regions"], r["region_names"], r["max_score"])
        for r in spark.read.parquet(aug).collect()
    }
    assert len(got) == 6
    assert got[99] == (True, 1, ["regionA"], 5.0)    # chr1:99 in regionA
    assert got[199] == (True, 1, ["regionA"], 5.0)   # chr1:199 in regionA
    assert got[299] == (False, 0, None, None)        # chr1:299 outside
    assert got[149] == (True, 1, ["regionB"], 7.0)   # chr2:149 in regionB
    assert got[249] == (False, 0, None, None)        # chr2:249 outside


def test_cli_curate_and_export_subcommands(spark, tmp_path, capsys):
    """curate → export round-trip through the CLI: per-stage report JSON,
    then a verified shard manifest over the curated output."""
    import json

    from vcf2db_spark.__main__ import main
    from vcf2db_spark.sinks.export import read_training_shards

    docs = "/root/testdata/sf0.001/documents.parquet"
    curated_dir = str(tmp_path / "curated")
    rc = main(
        ["curate", docs, curated_dir, "--min-quality", "0.3", "--report"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_input"] == 500
    assert (
        rep["n_input"]
        >= rep["n_after_quality"]
        >= rep["n_after_exact"]
        >= rep["n_after_neardup"]
        > 0
    )

    shard_dir = str(tmp_path / "shards")
    rc = main(["export", curated_dir, shard_dir, "--shards", "4"])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["total_rows"] == rep["n_after_neardup"]
    back = read_training_shards(spark, shard_dir)  # verify=True
    assert back.count() == manifest["total_rows"]
