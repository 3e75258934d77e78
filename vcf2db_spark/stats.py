"""Cohort statistics, runs of homozygosity, and gene burden (parity with
the public gemini analysis tools that consume the reference's database:
``gemini stats``, ``gemini roh``, ``gemini burden``).

Everything here is expressed over the loaded tables (``pipeline.VCFTables``
schema): ``variants`` with its typed genotype arrays, ``variant_impacts``
for gene/severity. Genotype coding is cyvcf2 (HOM_REF=0, HET=1, UNKNOWN=2,
HOM_ALT=3), same as ``inheritance.py``.

Scale design (100 TB): the per-sample analyses go through ONE long-form
``posexplode`` of the genotype array — (n_variants × n_samples) rows
partitioned by (sample, chrom), which is the natural parallelism unit:
every window/group below stays inside that partition, so there is exactly
one shuffle for the whole family of analyses. Sample names resolve via an
in-plan array literal (the cohort list is driver-memory-small, as in the
reference, which holds the PED in memory).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from vcf2db_spark.inheritance import HET, HOM_ALT, HOM_REF, UNKNOWN

# --------------------------------------------------------------------------
# gemini stats --tstv / --snp-counts / --sfs
# --------------------------------------------------------------------------


def tstv(variants: DataFrame) -> DataFrame:
    """Transition/transversion summary (``gemini stats --tstv``): one row
    (n_ts, n_tv, tstv). Uses the ``sub_type`` column derived at load
    (operators/variants.py ``with_variant_type``); map-side partial
    aggregation, no shuffle beyond the final 1-row combine."""
    return variants.agg(
        F.count_if(F.col("sub_type") == "ts").alias("n_ts"),
        F.count_if(F.col("sub_type") == "tv").alias("n_tv"),
    ).select(
        "n_ts",
        "n_tv",
        F.when(
            F.col("n_tv") > 0,
            F.round(F.col("n_ts").cast("double") / F.col("n_tv"), 4),
        ).alias("tstv"),
    )


def snp_counts(variants: DataFrame) -> DataFrame:
    """Counts per SNP substitution (``gemini stats --snp-counts``):
    (ref, alt, n) for single-nucleotide sites, descending."""
    return (
        variants.filter(F.col("type") == "snp")
        .groupBy("ref", "alt")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "ref", "alt")
    )


def site_frequency_spectrum(variants: DataFrame, bins: int = 10) -> DataFrame:
    """Folded-free SFS (``gemini stats --sfs``): histogram of the
    alternate-allele frequency ``aaf`` (derived at load) into ``bins``
    equal-width buckets over [0, 1]. Returns (bucket, lo, hi, n)."""
    b = F.least(
        F.floor(F.col("aaf") * bins).cast("int"), F.lit(bins - 1)
    ).alias("bucket")
    return (
        variants.filter(F.col("aaf").isNotNull())
        .groupBy(b)
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            F.round(F.col("bucket").cast("double") / bins, 6).alias("lo"),
            F.round((F.col("bucket") + 1).cast("double") / bins, 6).alias("hi"),
            "n",
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# long-form genotype helper (shared by roh / burden)
# --------------------------------------------------------------------------


def gt_long(variants: DataFrame, sample_names: list[str], cols: list[str]) -> DataFrame:
    """Explode ``gt_types`` to one row per (variant, sample):
    ``cols + [sample, gt]``. The explode is the one data-expansion step of
    the per-sample analyses; everything downstream partitions by sample."""
    names = F.array(*[F.lit(n) for n in sample_names])
    return variants.select(
        *cols, F.posexplode("gt_types").alias("_sidx", "gt")
    ).select(*cols, F.element_at(names, F.col("_sidx") + 1).alias("sample"), "gt")


# --------------------------------------------------------------------------
# gemini roh — runs of homozygosity
# --------------------------------------------------------------------------


def roh(
    variants: DataFrame,
    sample_names: list[str],
    min_snps: int = 25,
    min_size_bp: int = 100_000,
) -> DataFrame:
    """Strict runs of homozygosity per (sample, chrom): maximal stretches
    of consecutive called homozygous sites (HOM_REF or HOM_ALT — any het
    or uncalled site breaks the run), kept when they span ≥ ``min_snps``
    sites and ≥ ``min_size_bp`` bases. This is ``gemini roh`` with its
    interruption tolerances at zero (``roh_tolerant`` relaxes them).

    Catalyst-only gaps-and-islands: two ``row_number`` windows over the
    same (sample, chrom, start) ordering — their difference is constant
    within a run — then one group-by per run. Both windows and the final
    aggregation share the (sample, chrom) partitioning: one shuffle total
    after the explode."""
    long = gt_long(variants, sample_names, ["chrom", "start", "end"])
    is_hom = F.col("gt").isin(HOM_REF, HOM_ALT)
    w_all = Window.partitionBy("sample", "chrom").orderBy("start", "end")
    w_hom = Window.partitionBy("sample", "chrom", "_hom").orderBy("start", "end")
    runs = (
        long.withColumn("_hom", is_hom)
        .withColumn("_grp", F.row_number().over(w_all) - F.row_number().over(w_hom))
        .filter(F.col("_hom"))
        .groupBy("sample", "chrom", "_grp")
        .agg(
            F.count("*").alias("n_snps"),
            F.min("start").alias("run_start"),
            F.max("end").alias("run_end"),
        )
        .drop("_grp")
        .withColumn("size_bp", F.col("run_end") - F.col("run_start"))
    )
    return runs.filter(
        (F.col("n_snps") >= min_snps) & (F.col("size_bp") >= min_size_bp)
    ).orderBy("sample", "chrom", "run_start")


_ROH_SCHEMA = StructType(
    [
        StructField("sample", StringType()),
        StructField("chrom", StringType()),
        StructField("n_snps", LongType()),
        StructField("run_start", LongType()),
        StructField("run_end", LongType()),
        StructField("size_bp", LongType()),
        StructField("n_hets", LongType()),
        StructField("n_unknowns", LongType()),
    ]
)


def roh_tolerant(
    variants: DataFrame,
    sample_names: list[str],
    min_snps: int = 25,
    min_size_bp: int = 100_000,
    max_hets: int = 1,
    max_unknowns: int = 3,
) -> DataFrame:
    """Interruption-tolerant ROH: a run absorbs up to ``max_hets`` het and
    ``max_unknowns`` uncalled sites before it is closed (gemini's roh
    defaults are min 25 snps / 100 kb / 1 het / 3 unknowns; the greedy
    left-to-right extension here is a reconstruction of its published
    behavior — UNCERTAIN: gemini's exact window advance on rejection).

    The scan is order-dependent per (sample, chrom), so it runs as an
    ``applyInPandas`` over exactly that grouping — sequential inside a group,
    parallel across the (samples × chroms) grid, state bounded by one
    group's rows."""
    long = gt_long(variants, sample_names, ["chrom", "start", "end"])

    def find_runs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start", "end"])
        sample, chrom = pdf["sample"].iloc[0], pdf["chrom"].iloc[0]
        out: list[tuple] = []
        run: dict | None = None

        def close(r):
            if r is not None and r["n_snps"] >= min_snps and (
                r["end"] - r["start"] >= min_size_bp
            ):
                out.append(
                    (
                        sample,
                        chrom,
                        r["n_snps"],
                        r["start"],
                        r["end"],
                        r["end"] - r["start"],
                        r["hets"],
                        r["unks"],
                    )
                )

        for start, end, gt in zip(pdf["start"], pdf["end"], pdf["gt"]):
            if gt in (HOM_REF, HOM_ALT):
                if run is None:
                    run = {"start": start, "end": end, "n_snps": 0, "hets": 0, "unks": 0}
                run["n_snps"] += 1
                run["end"] = end
            elif run is not None:
                key = "hets" if gt == HET else "unks"
                cap = max_hets if gt == HET else max_unknowns
                run[key] += 1
                if run[key] > cap:
                    close(run)
                    run = None
        close(run)
        return pd.DataFrame(out, columns=[f.name for f in _ROH_SCHEMA.fields])

    return (
        long.groupBy("sample", "chrom")
        .applyInPandas(find_runs, schema=_ROH_SCHEMA)
        .orderBy("sample", "chrom", "run_start")
    )


# --------------------------------------------------------------------------
# gemini burden — per-gene per-sample qualifying-variant counts
# --------------------------------------------------------------------------


def burden(
    variants: DataFrame,
    variant_impacts: DataFrame,
    sample_names: list[str],
    severities: tuple[str, ...] = ("HIGH", "MED"),
) -> DataFrame:
    """Gene-burden counts (``gemini burden`` default mode): for each
    (gene, sample), the number of qualifying variants — impact severity in
    ``severities`` — where the sample carries an alternate allele (HET or
    HOM_ALT). Long form (gene, sample, n_variants): the wide per-sample
    matrix the gemini CLI prints is a pivot away, but long form is the
    shape that scales and joins.

    Plan: severity filter prunes impacts before the distinct (a variant
    with several qualifying transcripts counts once); the carrier explode
    joins on variant_id — both sides shuffle-partition on variant_id, and
    the aggregation reuses the join's (gene-independent) row stream with
    map-side partial counts."""
    qualifying = (
        variant_impacts.filter(F.col("impact_severity").isin(*severities))
        .select("variant_id", "gene")
        .filter(F.col("gene").isNotNull())
        .distinct()
    )
    carriers = gt_long(variants, sample_names, ["variant_id"]).filter(
        F.col("gt").isin(HET, HOM_ALT)
    )
    return (
        carriers.join(qualifying, "variant_id")
        .groupBy("gene", "sample")
        .agg(F.count("*").alias("n_variants"))
        .orderBy("gene", "sample")
    )


def burden_wide(
    variants: DataFrame,
    variant_impacts: DataFrame,
    sample_names: list[str],
    severities: tuple[str, ...] = ("HIGH", "MED"),
) -> DataFrame:
    """The gene × sample matrix ``gemini burden`` prints: one row per
    gene, one column per sample, zero-filled. Pivot values are passed
    explicitly (the cohort list is already known from the header), which
    skips Spark's extra distinct-scan pass and keeps the plan a single
    shuffle over gene. Column width = cohort size — fine for the trio/
    cohort scale gemini targets; at biobank width stay on the long form."""
    long = burden(variants, variant_impacts, sample_names, severities)
    return (
        long.groupBy("gene")
        .pivot("sample", sample_names)
        .agg(F.first("n_variants"))
        .na.fill(0, subset=list(sample_names))
        .orderBy("gene")
    )
