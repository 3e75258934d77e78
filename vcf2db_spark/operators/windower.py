"""Genome-window statistics — the `gemini windower` tool shape
(SURVEY.md §2B ecosystem; gemini windower -w <size> -s <step> -t {nucl_div,
hwe} style summaries over fixed genomic windows).

Spark-first: a window assignment is integer arithmetic (`start div step`),
so tumbling windows are ONE hash aggregation — no Spark window function,
no sort. Overlapping (sliding) windows explode each variant onto the
ceil(size/step) windows it falls in (bounded fan-out, same pattern as the
binned interval join) and then aggregate once. Both shapes partial-agg
map-side and shuffle only (chrom, win) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: summary expressions per window; every value deterministic
_STATS = lambda: [  # noqa: E731 - tiny factory keeps agg list in one place
    F.count(F.lit(1)).alias("n_variants"),
    F.round(F.avg("qual"), 6).alias("avg_qual"),
    F.round(F.avg("aaf"), 6).alias("avg_aaf"),
    F.sum(F.when(F.col("type") == "snp", 1).otherwise(0)).alias("n_snps"),
    F.sum(F.when(F.col("type") == "indel", 1).otherwise(0)).alias("n_indels"),
]


def window_stats(
    variants: DataFrame,
    size: int = 100_000,
    step: int | None = None,
) -> DataFrame:
    """Per-(chrom, window) variant summaries.

    ``step`` defaults to ``size`` (tumbling). ``step < size`` gives
    overlapping windows (gemini windower's -s): each variant contributes
    to every window whose [win_start, win_start+size) contains its start.
    Output: chrom, win_start, win_end, n_variants, avg_qual, avg_aaf,
    n_snps, n_indels — ordered by (chrom, win_start).
    """
    step = size if step is None else step
    if step <= 0 or size <= 0:
        raise ValueError("size and step must be positive")
    if step > size:
        raise ValueError("step must be <= size (gaps would drop variants)")

    if step == size:
        win_start = (F.col("start") - (F.col("start") % size)).alias("win_start")
        assigned = variants.withColumn("win_start", win_start)
    else:
        # windows containing position p start in (p-size, p] on the step
        # grid: explode onto that bounded range (ceil(size/step) entries)
        first = F.greatest(
            F.lit(0), (F.floor((F.col("start") - size) / step) + 1) * step
        )
        last = F.floor(F.col("start") / step) * step
        assigned = variants.withColumn(
            "win_start", F.explode(F.sequence(first, last, F.lit(step)))
        )
    out = (
        assigned.groupBy("chrom", "win_start")
        .agg(*_STATS())
        .withColumn("win_end", F.col("win_start") + size)
    )
    cols = ["chrom", "win_start", "win_end", "n_variants", "avg_qual", "avg_aaf", "n_snps", "n_indels"]
    return out.select(*cols).orderBy("chrom", "win_start")
