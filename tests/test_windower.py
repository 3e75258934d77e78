"""gemini-windower analog (operators/windower.py): tumbling and sliding
genome-window stats, golden-checked on the mini fixture and
brute-force-checked for the sliding explode."""

from __future__ import annotations

import pytest

from tests.fixtures.make_mini_vcf import write_fixture
from vcf2db_spark.operators.windower import window_stats
from vcf2db_spark.pipeline import load_vcf


@pytest.fixture(scope="module")
def variants(spark, tmp_path_factory):
    vcf, ped = write_fixture(str(tmp_path_factory.mktemp("windower")))
    return load_vcf(spark, vcf).variants.cache()


def test_tumbling_golden(spark, variants):
    """Mini fixture loci: chr1 @ 99,199,299,399; chr2 @ 149,249 (0-based).
    Window 200 → chr1:[0,200)=2, [200,400)=2; chr2:[0,200)=1, [200,400)=1."""
    rows = window_stats(variants, size=200).collect()
    got = {(r["chrom"], r["win_start"]): r["n_variants"] for r in rows}
    assert got == {
        ("chr1", 0): 2,
        ("chr1", 200): 2,
        ("chr2", 0): 1,
        ("chr2", 200): 1,
    }
    r0 = next(r for r in rows if (r["chrom"], r["win_start"]) == ("chr1", 0))
    assert r0["win_end"] == 200
    assert r0["n_snps"] == 2 and r0["n_indels"] == 0
    assert r0["avg_qual"] == pytest.approx((50.0 + 12.5) / 2)


def test_sliding_matches_bruteforce(spark, variants):
    """Sliding windows (size 200, step 50): every (chrom, win) count must
    equal the brute-force membership count, and each variant appears in
    exactly size/step windows (no boundary drop/dup)."""
    size, step = 200, 50
    rows = window_stats(variants, size=size, step=step).collect()
    data = [(r["chrom"], r["start"]) for r in variants.select("chrom", "start").collect()]
    want: dict[tuple[str, int], int] = {}
    for chrom, start in data:
        w = 0
        while True:
            if w + size > start and w <= start:
                want[(chrom, w)] = want.get((chrom, w), 0) + 1
            if w > start:
                break
            w += step
    got = {(r["chrom"], r["win_start"]): r["n_variants"] for r in rows}
    assert got == want
    # membership fan-out is bounded by size/step (fewer only near pos 0,
    # where window starts clamp at the chromosome origin)
    assert all(v <= size // step for v in got.values())


def test_validates_params(variants):
    with pytest.raises(ValueError, match="positive"):
        window_stats(variants, size=0)
    with pytest.raises(ValueError, match="step must be <="):
        window_stats(variants, size=100, step=200)
