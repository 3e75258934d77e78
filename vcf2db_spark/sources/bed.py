"""BED interval source — the annotation-file side of `gemini annotate`
(SURVEY.md §2B B7 ecosystem; UCSC BED3..BED12, plain or bgzip/gzip).

BED is the interval format the reference ecosystem feeds to region
annotation (CpG islands, segdups, DGV, custom capture regions). Columns
are positional and optional past the first three; coordinates are already
half-open 0-based — the same convention as our variants table, so BED
rows join against variants with no coordinate shift.

Spark-first: `spark.read.csv` with an explicit schema — a splittable,
predicate-pushable scan (plain text and bgzip both decompress per-split;
plain .gz falls back to one partition, same as any Spark text source).
`track`/`browser`/`#` header lines are filtered out relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: BED12 positional columns (UCSC); everything past chrom/start/end optional
BED_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("chrom", T.StringType()),
    ("start", T.LongType()),
    ("end", T.LongType()),
    ("name", T.StringType()),
    ("score", T.DoubleType()),
    ("strand", T.StringType()),
    ("thick_start", T.LongType()),
    ("thick_end", T.LongType()),
    ("item_rgb", T.StringType()),
    ("block_count", T.LongType()),
    ("block_sizes", T.StringType()),
    ("block_starts", T.StringType()),
)


def read_bed(spark: SparkSession, path: str, n_cols: int | None = None) -> DataFrame:
    """Read a BED file into (chrom, start, end, ...) with typed columns.

    ``n_cols`` caps the parsed width (default: infer from the first data
    line). Extra non-standard columns beyond BED12 are kept as strings
    named ``extra_13``, ``extra_14``, …
    """
    if n_cols is None:
        head = (
            spark.read.text(path)
            .filter(~F.col("value").rlike(r"^(#|track\b|browser\b)|^\s*$"))
            .limit(1)
            .collect()
        )
        if not head:
            raise ValueError(f"no data lines in BED file {path!r}")
        n_cols = len(head[0]["value"].split("\t"))
    if n_cols < 3:
        raise ValueError(f"BED needs >=3 columns, found {n_cols} in {path!r}")

    fields = [
        T.StructField(name, dt, nullable=i >= 3)
        for i, (name, dt) in enumerate(BED_FIELDS[:n_cols])
    ]
    fields += [
        T.StructField(f"extra_{i + 1}", T.StringType(), True)
        for i in range(len(BED_FIELDS), n_cols)
    ]
    schema = T.StructType(fields)
    df = (
        spark.read.csv(
            path,
            sep="\t",
            schema=schema,
            comment="#",
            mode="PERMISSIVE",
        )
        # track/browser definition lines parse as chrom strings; drop them
        .filter(~F.col("chrom").rlike(r"^(track|browser)\b"))
        .filter(F.col("start").isNotNull() & F.col("end").isNotNull())
    )
    return df
