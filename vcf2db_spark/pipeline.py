"""End-to-end VCF → tables pipeline (SURVEY.md §3 lifecycle).

Spark equivalent of the reference's load loop [U vcf2db.py §VCFDB.load
~L640]: read VCF (header-inferred schema, contig partitions) → derive
per-variant stats → assign deterministic variant_id → explode annotations
into variant_impacts → denormalize top impact → load PED samples → emit
the four-table GEMINI-shaped output.

Each returned DataFrame is a lazy plan; callers pick the sink
(``sinks.write_parquet`` / ``sinks.write_jdbc``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from vcf2db_spark.operators.impacts import explode_impacts, with_top_impact
from vcf2db_spark.operators.variants import (
    assign_variant_id,
    with_genotype_stats,
    with_variant_type,
)
from vcf2db_spark.sources.header import VCFHeader, clean, parse_header, read_header_text
from vcf2db_spark.sources.ped import read_ped
from vcf2db_spark.sources.vcf import read_vcf


@dataclass
class VCFTables:
    """The reference's output data model (SURVEY §1.2)."""

    variants: DataFrame
    variant_impacts: DataFrame | None
    samples: DataFrame | None
    vcf_header: DataFrame
    header: VCFHeader


def load_vcf(
    spark: SparkSession,
    vcf_path: str,
    ped_path: str | None = None,
    black_list: tuple[str, ...] = (),
    include_genotypes: bool = True,
    num_partitions: int | None = None,
    cache_parse: bool = False,
) -> VCFTables:
    """``cache_parse=True`` persists the parsed stream so the downstream
    consumers (variant_id's range sampling, the variants sink, the impacts
    sink) share ONE Python-parse pass instead of re-reading the text. Use
    when the parsed batch fits cluster memory/disk; at larger scale write
    the parsed stage to parquet and continue from there instead."""
    header = parse_header(read_header_text(vcf_path))

    raw = read_vcf(
        spark,
        vcf_path,
        black_list=black_list,
        include_genotypes=include_genotypes and bool(header.samples),
    )
    if cache_parse:
        raw = raw.persist()
    v = with_variant_type(raw)
    if include_genotypes and header.samples:
        v = with_genotype_stats(v)
    v = assign_variant_id(v, num_partitions=num_partitions)

    impacts = None
    ann_key = header.annotation_key
    if ann_key is not None and clean(ann_key) in v.columns:
        impacts = explode_impacts(v, header)
        v = with_top_impact(v.drop(clean(ann_key)), impacts)

    samples = None
    if ped_path is not None:
        samples = read_ped(spark, ped_path, vcf_samples=header.samples or None)

    vcf_header_df = spark.createDataFrame([(header.raw,)], "header_text string")
    return VCFTables(
        variants=v,
        variant_impacts=impacts,
        samples=samples,
        vcf_header=vcf_header_df,
        header=header,
    )
