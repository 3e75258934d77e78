"""Interval (region-overlap) join — the genomic range-join pattern
(SURVEY.md §2B B7, §4 custom work item 2).

The reference's query surface includes locus-overlap joins
(variants whose [start, end) overlaps a gene/regulatory region — gemini's
``--region`` / bedtools-style idioms). Spark has no native interval-join
physical strategy; a raw theta join (``a.start < b.end AND a.end >
b.start``) degenerates to a per-key nested loop. The scalable pattern is
**binning**:

1. assign every interval to each fixed-width bin it touches
   (``explode(sequence(start div W, (end-1) div W))``),
2. equi-join on (chrom, bin) — a plain shuffled/broadcast hash join,
3. apply the exact overlap predicate as a residual filter,
4. drop the (rare) duplicate pairs that co-occur in multiple bins via the
   half-open ownership rule: keep a pair only in the FIRST shared bin
   (``bin == greatest(a_first_bin, b_first_bin)``) — dedup without a
   distinct/shuffle.

Cost: |rows| × avg-bins-per-interval shuffle rows, then per-bin products —
bounded by bin width W chosen ≈ median interval length. No all-pairs
product at any scale; skewed bins (centromere pileups) split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_bins(df: DataFrame, start: str, end: str, width: int, prefix: str) -> DataFrame:
    """Explode interval [start, end) onto every width-sized bin it touches;
    carry the first bin for ownership dedup."""
    first_bin = (F.col(start) / width).cast("long")
    last_bin = ((F.col(end) - 1) / width).cast("long")
    return df.withColumn(f"{prefix}_first_bin", first_bin).withColumn(
        "_bin", F.explode(F.sequence(first_bin, F.greatest(last_bin, first_bin)))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "chrom",
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bin_width: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Overlap-join two interval tables (half-open [start, end)).

    Columns from both sides are kept (right side's key/bounds suffixed
    ``_r`` when names collide). ``how='inner'`` only — outer variants
    compose from a semi/anti join on the same bins.
    """
    if how != "inner":
        raise NotImplementedError("interval_join supports how='inner'")
    lcols = set(left.columns)
    renames = {c: f"{c}_r" for c in right.columns if c in lcols}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_on = renames.get(on, on)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)

    lb = _with_bins(left, left_start, left_end, bin_width, "l")
    rb = _with_bins(r, r_start, r_end, bin_width, "r")

    overlap = (F.col(left_start) < F.col(r_end)) & (F.col(left_end) > F.col(r_start))
    own = F.col("lb._bin") == F.greatest(F.col("l_first_bin"), F.col("r_first_bin"))
    joined = (
        lb.alias("lb")
        .join(
            rb.alias("rb"),
            (F.col(on) == F.col(r_on)) & (F.col("lb._bin") == F.col("rb._bin")),
            "inner",
        )
        .filter(overlap & own)
    )
    return joined.drop("_bin", "l_first_bin", "r_first_bin")


def interval_join_naive(
    left: DataFrame,
    right: DataFrame,
    on: str = "chrom",
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """Theta-join reference implementation (exact twin for tests; per-key
    nested loop — do not use at scale)."""
    lcols = set(left.columns)
    renames = {c: f"{c}_r" for c in right.columns if c in lcols}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_on = renames.get(on, on)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)
    cond = (
        (F.col(on) == F.col(r_on))
        & (F.col(left_start) < F.col(r_end))
        & (F.col(left_end) > F.col(r_start))
    )
    return left.join(r, cond, "inner")
