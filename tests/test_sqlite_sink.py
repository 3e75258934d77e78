"""Gemini-compatible SQLite sink round-trip (SURVEY.md §2A A10-A12).

End-to-end: mini-VCF → Spark pipeline → sample.db → stdlib sqlite3
queries. Verifies row counts, value parity against the DataFrames, blob
byte-parity with the reference's --legacy-compression zlib format
[U vcf2db.py §pack_blob ~L60], array→TEXT serialization, PRAGMA-era
indexes, and that gemini-style SQL runs against the artifact unchanged.
"""

from __future__ import annotations

import sqlite3
import zlib

import numpy as np
import pytest

from tests.fixtures.make_mini_vcf import write_fixture
from vcf2db_spark.pipeline import load_vcf
from vcf2db_spark.sinks.sqlite import write_gemini_db


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sqlite_sink")
    vcf, ped = write_fixture(str(tmp))
    tables = load_vcf(spark, vcf, ped_path=ped, cache_parse=True)
    outputs = {
        "variants": tables.variants,
        "variant_impacts": tables.variant_impacts,
        "samples": tables.samples,
        "vcf_header": tables.vcf_header,
    }
    db_path = str(tmp / "mini.db")
    counts = write_gemini_db(db_path, outputs, batch_size=2, legacy=True)
    con = sqlite3.connect(db_path)
    yield con, counts, tables
    con.close()


def test_row_counts(db):
    con, counts, tables = db
    for name, df in (
        ("variants", tables.variants),
        ("variant_impacts", tables.variant_impacts),
        ("samples", tables.samples),
    ):
        (got,) = con.execute(f"SELECT count(*) FROM {name}").fetchone()
        assert got == counts[name] == df.count(), name


def test_variant_values_match_dataframe(db):
    con, _, tables = db
    want = [
        (r["chrom"], r["start"], r["end"], r["ref"], r["alt"], r["gene"])
        for r in tables.variants.orderBy("variant_id")
        .select("chrom", "start", "end", "ref", "alt", "gene")
        .collect()
    ]
    got = con.execute(
        'SELECT chrom, start, "end", ref, alt, gene FROM variants ORDER BY variant_id'
    ).fetchall()
    assert got == want


def test_genotype_blob_byte_parity(db):
    """Blobs must decode with plain zlib + int32 frombuffer — exactly what
    a gemini consumer of a --legacy-compression database does."""
    con, _, tables = db
    want = {
        r["variant_id"]: list(r["gt_types"])
        for r in tables.variants.select("variant_id", "gt_types").collect()
    }
    for vid, blob in con.execute("SELECT variant_id, gt_types FROM variants"):
        arr = np.frombuffer(zlib.decompress(blob), dtype="<i4").tolist()
        assert arr == want[vid]


def test_array_and_flag_serialization(db):
    con, _, _ = db
    # Number=A under the decompose precondition → scalar REAL; Flag → 0/1
    rows = dict(con.execute("SELECT variant_id, af FROM variants").fetchall())
    assert all(isinstance(v, float) for v in rows.values() if v is not None)
    flags = [r[0] for r in con.execute("SELECT passflag FROM variants").fetchall()]
    assert set(flags) <= {0, 1, None}
    # PASS filter stored as NULL (gemini convention)
    (n_null,) = con.execute("SELECT count(*) FROM variants WHERE filter IS NULL").fetchone()
    assert n_null == 4


def test_indexes_created(db):
    con, _, _ = db
    names = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='index'")}
    assert "idx_variants_chrom_start" in names
    assert "idx_variants_gene" in names
    assert "idx_variant_impacts_variant_id" in names
    assert "idx_samples_name" in names


def test_gemini_style_sql_runs(db):
    """The artifact serves the reference's downstream query surface
    (SURVEY §3 entry point 3) without modification."""
    con, _, _ = db
    rows = con.execute(
        """
        SELECT v.gene, count(*) AS n
        FROM variants v JOIN variant_impacts i USING (variant_id)
        WHERE v.impact_severity = 'HIGH'
        GROUP BY v.gene ORDER BY n DESC, v.gene
        """
    ).fetchall()
    assert rows  # HIGH-severity genes exist in the fixture (BRCA2, MLH1)
    genes = {g for g, _ in rows}
    assert genes <= {"BRCA2", "MLH1", "TP53"}


def test_generic_array_struct_timestamp_serialization(spark, tmp_path):
    """Non-genotype arrays → comma-joined TEXT (the reference's
    Number=R/G/. join rule); structs → JSON; timestamps → ISO TEXT."""
    import datetime

    from vcf2db_spark.sinks.sqlite import write_gemini_db

    df = spark.createDataFrame(
        [(1, [1.5, 2.0], {"a": 7}, datetime.datetime(2024, 1, 2, 3, 4, 5))],
        "id bigint, xs array<double>, st struct<a:int>, ts timestamp",
    )
    path = str(tmp_path / "generic.db")
    write_gemini_db(path, {"t": df}, legacy=True)
    con = sqlite3.connect(path)
    try:
        row = con.execute("SELECT id, xs, st, ts FROM t").fetchone()
    finally:
        con.close()
    assert row == (1, "1.5,2.0", '{"a":7}', "2024-01-02 03:04:05")


def test_vcf_header_roundtrip(db):
    con, _, tables = db
    (text,) = con.execute("SELECT header_text FROM vcf_header").fetchone()
    assert text.startswith("##fileformat=VCFv4.2")
    assert text == tables.header.raw
