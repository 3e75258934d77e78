"""Annotation explode + severity ranking (SURVEY.md §2A A6/A7).

Reimplements the geneimpacts pipeline the reference delegates to
[U vcf2db.py §gene_info ~L680; geneimpacts Effect.top_severity]: the VEP
``CSQ`` (or SnpEff ``ANN``) INFO string is a comma-separated list of
transcript annotations, each a ``|``-separated record whose keys come from
the header Description — split → explode → struct, then an argmax per
variant picks the top-severity impact to denormalize into ``variants``.

Severity order is the published Ensembl VEP consequence ranking collapsed
to gemini's HIGH/MED/LOW, ties broken by transcript id (lowest first) —
deterministic, unit-tested against a golden table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf2db_spark.sources.header import VCFHeader, clean

# Ensembl VEP consequence severity order (most → least severe), public table.
SEVERITY_ORDER: tuple[str, ...] = (
    "transcript_ablation",
    "splice_acceptor_variant",
    "splice_donor_variant",
    "stop_gained",
    "frameshift_variant",
    "stop_lost",
    "start_lost",
    "transcript_amplification",
    "feature_elongation",
    "feature_truncation",
    "inframe_insertion",
    "inframe_deletion",
    "missense_variant",
    "protein_altering_variant",
    "splice_donor_5th_base_variant",
    "splice_region_variant",
    "splice_donor_region_variant",
    "splice_polypyrimidine_tract_variant",
    "incomplete_terminal_codon_variant",
    "start_retained_variant",
    "stop_retained_variant",
    "synonymous_variant",
    "coding_sequence_variant",
    "mature_mirna_variant",
    "5_prime_utr_variant",
    "3_prime_utr_variant",
    "non_coding_transcript_exon_variant",
    "intron_variant",
    "nmd_transcript_variant",
    "non_coding_transcript_variant",
    "coding_transcript_variant",
    "upstream_gene_variant",
    "downstream_gene_variant",
    "tfbs_ablation",
    "tfbs_amplification",
    "tf_binding_site_variant",
    "regulatory_region_ablation",
    "regulatory_region_amplification",
    "regulatory_region_variant",
    "intergenic_variant",
    "sequence_variant",
)

RANK: dict[str, int] = {so: i for i, so in enumerate(SEVERITY_ORDER)}
_UNKNOWN_RANK = len(SEVERITY_ORDER)

# gemini-style 3-level severity: VEP HIGH → HIGH, MODERATE → MED, else LOW.
_HIGH_MAX = SEVERITY_ORDER.index("feature_truncation")
_MED_MAX = SEVERITY_ORDER.index("protein_altering_variant")

LOF_SO = {
    "transcript_ablation",
    "splice_acceptor_variant",
    "splice_donor_variant",
    "stop_gained",
    "frameshift_variant",
    "stop_lost",
    "start_lost",
}
EXONIC_SO = {
    "stop_gained", "frameshift_variant", "stop_lost", "start_lost",
    "inframe_insertion", "inframe_deletion", "missense_variant",
    "protein_altering_variant", "incomplete_terminal_codon_variant",
    "start_retained_variant", "stop_retained_variant", "synonymous_variant",
    "coding_sequence_variant", "5_prime_utr_variant", "3_prime_utr_variant",
    "non_coding_transcript_exon_variant",
}
CODING_SO = EXONIC_SO - {
    "5_prime_utr_variant", "3_prime_utr_variant", "non_coding_transcript_exon_variant",
}


def severity_category(rank_idx: int) -> str:
    if rank_idx <= _HIGH_MAX:
        return "HIGH"
    if rank_idx <= _MED_MAX:
        return "MED"
    return "LOW"


def _rank_map_expr():
    pairs = []
    for so, i in RANK.items():
        pairs.extend([F.lit(so), F.lit(i)])
    return F.create_map(*pairs)


# canonical column ← VEP subfield candidates (first present wins)
_CANON = {
    "gene": ("symbol", "gene"),
    "transcript": ("feature", "transcript"),
    "biotype": ("biotype",),
    "exon": ("exon",),
    "codon_change": ("codons",),
    "aa_change": ("amino_acids",),
    "aa_length": ("protein_position",),
}


def explode_impacts(
    df: DataFrame,
    header: VCFHeader,
    id_col: str = "variant_id",
) -> DataFrame:
    """One row per (variant, transcript annotation) — the
    ``variant_impacts`` table. split + explode + struct projection; at
    scale this is a narrow op (no shuffle)."""
    key = header.annotation_key
    if key is None:
        raise ValueError("no annotation INFO field (CSQ/ANN/EFF/BCSQ) in header")
    subfields = [clean(s) for s in header.annotation_subfields]
    ann_col = clean(key)

    ann_type = dict(df.dtypes).get(ann_col, "string")
    ann_items = (
        F.col(ann_col) if ann_type.startswith("array") else F.split(F.col(ann_col), ",")
    )
    out = df.filter(F.col(ann_col).isNotNull()).select(
        id_col, F.explode(ann_items).alias("_ann")
    )
    toks = F.split(F.col("_ann"), r"\|")
    cols = {name: F.nullif(toks.getItem(i), F.lit("")) for i, name in enumerate(subfields)}
    out = out.withColumns(cols).drop("_ann")

    # a VEP Consequence may be '&'-joined; severity = the most severe member
    so_terms = F.transform(F.split(F.lower(F.col("consequence")), "&"), lambda s: s)
    rank_map = _rank_map_expr()
    ranks = F.transform(so_terms, lambda s: F.coalesce(rank_map[s], F.lit(_UNKNOWN_RANK)))
    out = out.withColumns(
        {
            "impact_so": F.element_at(so_terms, 1),
            "severity_rank": F.array_min(ranks),
        }
    )

    canon = {}
    names = set(out.columns)
    for target, candidates in _CANON.items():
        present = [c for c in candidates if c in names]
        if present and target not in names:
            canon[target] = F.coalesce(*[F.col(c) for c in present])
    sev_cases = (
        F.when(F.col("severity_rank") <= _HIGH_MAX, "HIGH")
        .when(F.col("severity_rank") <= _MED_MAX, "MED")
        .otherwise("LOW")
    )
    lof_arr = F.array(*[F.lit(s) for s in sorted(LOF_SO)])
    exonic_arr = F.array(*[F.lit(s) for s in sorted(EXONIC_SO)])
    coding_arr = F.array(*[F.lit(s) for s in sorted(CODING_SO)])
    canon.update(
        {
            "impact_severity": sev_cases,
            "is_lof": F.arrays_overlap(so_terms, lof_arr),
            "is_exonic": F.arrays_overlap(so_terms, exonic_arr),
            "is_coding": F.arrays_overlap(so_terms, coding_arr),
        }
    )
    out = out.withColumns(canon)

    # polyphen/sift arrive as 'probably_damaging(0.957)' → pred + score
    for tool in ("polyphen", "sift"):
        if tool in names:
            out = out.withColumns(
                {
                    f"{tool}_pred": F.nullif(
                        F.regexp_extract(F.col(tool), r"^([^(]+)", 1), F.lit("")
                    ),
                    f"{tool}_score": F.regexp_extract(
                        F.col(tool), r"\(([\d.]+)\)", 1
                    ).cast("double"),
                }
            )
    return out


def top_impacts(impacts: DataFrame, id_col: str = "variant_id") -> DataFrame:
    """Argmax per variant: most severe impact, ties → lowest transcript —
    ``min(struct(rank, transcript, ...))`` = one partial-aggregated shuffle,
    no window sort (geneimpacts Effect.top_severity semantics)."""
    payload = [c for c in impacts.columns if c != id_col]
    best = F.min(
        F.struct(
            F.col("severity_rank").alias("_r"),
            F.coalesce(F.col("transcript"), F.lit("~")).alias("_t"),
            *[F.col(c).alias(c) for c in payload],
        )
    ).alias("_best")
    agg = impacts.groupBy(id_col).agg(best)
    return agg.select(id_col, *[F.col(f"_best.{c}").alias(c) for c in payload])


def with_top_impact(
    variants: DataFrame,
    impacts: DataFrame,
    id_col: str = "variant_id",
    columns: tuple[str, ...] = (
        "gene", "transcript", "is_exonic", "is_coding", "is_lof", "exon",
        "codon_change", "aa_change", "aa_length", "biotype", "impact_so",
        "impact_severity", "polyphen_pred", "polyphen_score", "sift_pred",
        "sift_score",
    ),
) -> DataFrame:
    """Denormalize the top impact onto variants (left join keeps
    un-annotated variants with null impact columns, as the reference does)."""
    top = top_impacts(impacts, id_col)
    keep = [c for c in columns if c in top.columns]
    return variants.join(top.select(id_col, *keep), on=id_col, how="left")
