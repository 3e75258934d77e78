"""Region-annotation operator — the `gemini annotate` tool surface
(SURVEY.md §2B B7 downstream idiom; gemini annotate -a boolean|count|extract).

The reference ecosystem's `gemini annotate` adds columns to the variants
table from a tabixed BED/VCF of intervals: a boolean (any overlap), a
count (number of overlapping intervals), or extracted values from an
annotation column reduced by an op (mean/sum/min/max/first/last/list/uniq).

Spark-first shape: one binned interval join (`operators.intervals`,
shuffle bounded by bins-touched, no all-pairs product), one hash
aggregation keyed by `variant_id`, one left join back onto `variants`
(broadcast when the aggregated side is small — typical, since only
variants that overlap anything appear). All ops are built-in JVM
aggregates; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf2db_spark.operators.intervals import interval_join

#: extract-op name → aggregate over the joined (variant × region) rows.
#: Deterministic: first/last order by region (start, end, value); list/uniq
#: are sorted arrays, not collection order.
_EXTRACT_OPS = {
    "mean": lambda c, o: F.avg(c),
    "sum": lambda c, o: F.sum(c),
    "min": lambda c, o: F.min(c),
    "max": lambda c, o: F.max(c),
    "first": lambda c, o: F.min_by(c, o),
    "last": lambda c, o: F.max_by(c, o),
    "list": lambda c, o: F.array_sort(F.collect_list(c)),
    "uniq": lambda c, o: F.array_sort(F.collect_set(c)),
    "count": lambda c, o: F.count(c),
}


def annotate_variants(
    variants: DataFrame,
    regions: DataFrame,
    extract: dict[str, tuple[str, str]] | None = None,
    boolean_col: str | None = None,
    count_col: str | None = None,
    key: str = "variant_id",
    on: str = "chrom",
    region_start: str = "start",
    region_end: str = "end",
    bin_width: int = 100_000,
) -> DataFrame:
    """Annotate ``variants`` with overlap-derived columns from ``regions``.

    - ``boolean_col='in_cpg'`` → true/false any-overlap flag;
    - ``count_col='n_dgv'`` → number of overlapping intervals (0 when none);
    - ``extract={'gerp_mean': ('score', 'mean'), ...}`` → reduce a region
      column over the variant's overlaps with the named op
      (mean/sum/min/max/first/last/list/uniq/count).

    Variants with no overlap keep NULL extracts (count 0, flag false) —
    left-join semantics, every input variant survives exactly once.
    """
    extract = extract or {}
    bad = [op for _, op in extract.values() if op not in _EXTRACT_OPS]
    if bad:
        raise ValueError(f"unknown extract op(s) {bad}; choose from {sorted(_EXTRACT_OPS)}")
    if not (extract or boolean_col or count_col):
        raise ValueError("nothing to annotate: pass extract/boolean_col/count_col")

    need = {on, region_start, region_end} | {src for src, _ in extract.values()}
    r = regions.select(*sorted(need))

    pairs = interval_join(
        variants.select(key, on, "start", "end"),
        r,
        on=on,
        right_start=region_start,
        right_end=region_end,
        bin_width=bin_width,
    )
    # interval_join suffixes colliding right-side names with _r
    rs = f"{region_start}_r" if region_start in ("start", "end", on, key) else region_start
    re_ = f"{region_end}_r" if region_end in ("start", "end", on, key) else region_end

    order = F.struct(F.col(rs), F.col(re_))
    aggs = []
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    if boolean_col:
        aggs.append(F.lit(True).alias(boolean_col))
    for out, (src, op) in extract.items():
        src_col = F.col(f"{src}_r" if src in variants.columns else src)
        aggs.append(_EXTRACT_OPS[op](src_col, order).alias(out))

    per_variant = pairs.groupBy(key).agg(*aggs)
    out = variants.join(per_variant, key, "left")
    if count_col:
        out = out.withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
    if boolean_col:
        out = out.withColumn(boolean_col, F.coalesce(F.col(boolean_col), F.lit(False)))
    return out
