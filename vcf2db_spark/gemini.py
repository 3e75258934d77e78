"""Gemini-style query surface over the loaded tables (SURVEY.md §3 entry
point 3; §2B).

The reference's whole purpose is serving gemini-shaped SQL over
variants ⋈ variant_impacts ⋈ samples, including gemini's signature
``--gt-filter`` mini-language over the per-sample genotype arrays
[U gemini docs; vcf2db README]. This module reproduces that surface on
Spark SQL:

- ``GeminiEngine.query(sql)`` — plain SQL over the registered views
  ``variants / variant_impacts / samples / vcf_header``.
- ``GeminiEngine.query(sql, gt_filter=...)`` — gemini genotype filters:

  * column.sample access: ``gt_types.NA001 == HET``,
    ``gt_depths.NA002 >= 20`` — compiled to ``element_at(col, idx)``
    using the header's sample order (the same index discipline the
    reference encodes into its blob columns).
  * symbolic constants ``HOM_REF / HET / UNKNOWN / HOM_ALT`` (cyvcf2
    coding 0/1/2/3).
  * wildcards ``(column).(sample_selector).(rule).(mode)``, e.g.
    ``(gt_types).(phenotype==2).(==HET).(all)``; sample_selector is SQL
    over the ``samples`` view (``*`` = everyone); mode is ``all | any |
    none | count<op><n>``.

Scale notes: the filter compiles to pure Catalyst expressions
(``element_at`` on array columns — no UDF, no explode), so it pushes into
the same scan pipeline as any other predicate. The sample dimension is
driver-side only for name→index resolution (bounded by cohort size, the
same assumption the reference makes holding the PED in memory).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from vcf2db_spark.pipeline import VCFTables

GT_CONSTANTS = {"HOM_REF": 0, "HET": 1, "UNKNOWN": 2, "HOM_ALT": 3}

#: genotype array columns addressable in gt-filters
GT_COLUMNS = (
    "gts",
    "gt_types",
    "gt_phases",
    "gt_depths",
    "gt_ref_depths",
    "gt_alt_depths",
    "gt_quals",
)

_WILDCARD_RE = re.compile(
    r"\(\s*(?P<col>\w+)\s*\)\s*\.\s*\((?P<sel>[^)]*)\)\s*\.\s*"
    r"\((?P<rule>[^)]*)\)\s*\.\s*\((?P<mode>[^)]*)\)"
)
_SAMPLE_RE = re.compile(
    r"\b(?P<col>" + "|".join(GT_COLUMNS) + r")\s*\.\s*(?P<sample>[A-Za-z_][\w-]*)"
)
_COUNT_RE = re.compile(r"^count\s*(?P<op>==|!=|<>|>=|<=|>|<)\s*(?P<n>\d+)$")


class GeminiEngine:
    """Register a loaded ``VCFTables`` and serve gemini-style queries."""

    def __init__(self, spark: SparkSession, tables: VCFTables):
        self.spark = spark
        self.tables = tables
        tables.variants.createOrReplaceTempView("variants")
        if tables.variant_impacts is not None:
            tables.variant_impacts.createOrReplaceTempView("variant_impacts")
        if tables.samples is not None:
            tables.samples.createOrReplaceTempView("samples")
        tables.vcf_header.createOrReplaceTempView("vcf_header")
        names = tables.header.samples or []
        # element_at is 1-based; header order == array slot order (A9)
        self.sample_idx = {name: i + 1 for i, name in enumerate(names)}

    # -- gt-filter compilation ------------------------------------------------

    def _subst_constants(self, expr: str) -> str:
        for name, val in GT_CONSTANTS.items():
            expr = re.sub(rf"\b{name}\b", str(val), expr)
        return expr

    def _subst_sample_access(self, expr: str) -> str:
        def repl(m: re.Match) -> str:
            col, sample = m.group("col"), m.group("sample")
            if sample not in self.sample_idx:
                raise KeyError(
                    f"unknown sample {sample!r}; known: {sorted(self.sample_idx)}"
                )
            return f"element_at({col}, {self.sample_idx[sample]})"

        return _SAMPLE_RE.sub(repl, expr)

    def _select_samples(self, selector: str) -> list[str]:
        selector = selector.strip()
        if selector in ("*", ""):
            names = list(self.sample_idx)
        else:
            if self.tables.samples is None:
                raise ValueError("wildcard sample selector requires a PED/samples table")
            rows = self.spark.sql(f"SELECT name FROM samples WHERE {selector}").collect()
            names = [r["name"] for r in rows if r["name"] in self.sample_idx]
        if not names:
            raise ValueError(f"sample selector {selector!r} matched no samples")
        return names

    def _expand_wildcard(self, m: re.Match) -> str:
        col, sel, rule, mode = (
            m.group("col"),
            m.group("sel"),
            self._subst_constants(m.group("rule").strip()),
            m.group("mode").strip().lower(),
        )
        if col not in GT_COLUMNS:
            raise KeyError(f"unknown genotype column {col!r}; known: {GT_COLUMNS}")
        per_sample = [
            f"coalesce(element_at({col}, {self.sample_idx[s]}) {rule}, false)"
            for s in self._select_samples(sel)
        ]
        if mode == "all":
            return "(" + " AND ".join(per_sample) + ")"
        if mode == "any":
            return "(" + " OR ".join(per_sample) + ")"
        if mode == "none":
            return "(NOT (" + " OR ".join(per_sample) + "))"
        cm = _COUNT_RE.match(mode)
        if cm:
            total = " + ".join(f"CAST({p} AS INT)" for p in per_sample)
            op = "<>" if cm.group("op") == "!=" else cm.group("op")
            return f"(({total}) {op} {cm.group('n')})"
        raise ValueError(
            f"unknown wildcard mode {mode!r}: expected all|any|none|count<op><n>"
        )

    def compile_gt_filter(self, gt_filter: str) -> str:
        """gemini gt-filter string → Spark SQL boolean expression."""
        out = _WILDCARD_RE.sub(self._expand_wildcard, gt_filter)
        out = self._subst_constants(out)
        out = self._subst_sample_access(out)
        return out

    # -- query entry points ---------------------------------------------------

    def query(self, sql: str, gt_filter: str | None = None) -> DataFrame:
        """Run gemini-shaped SQL; ``gt_filter`` is applied to the variants
        rows BEFORE the query's projection (gemini semantics: the filter
        may reference genotype columns the SELECT drops). Implementation:
        swap in a filtered ``variants`` view for the duration of analysis —
        ``spark.sql`` resolves views eagerly, so restoring right after is
        safe and the returned plan keeps the filter."""
        if not gt_filter:
            return self.spark.sql(sql)
        filtered = self.tables.variants.filter(self.compile_gt_filter(gt_filter))
        filtered.createOrReplaceTempView("variants")
        try:
            return self.spark.sql(sql)
        finally:
            self.tables.variants.createOrReplaceTempView("variants")

    def inheritance(self):
        """Mendelian model engine (de_novo / autosomal_recessive /
        autosomal_dominant / compound_hets / x_linked_recessive /
        x_linked_dominant / x_linked_de_novo / mendel_errors) over the
        same tables."""
        from vcf2db_spark.inheritance import InheritanceEngine

        return InheritanceEngine(self.tables)

    def region(self, chrom: str, start: int, end: int) -> DataFrame:
        """Locus window query — the tabix-seek idiom. With the variants
        table partitioned by chrom and row-groups sorted by start
        (sinks.write_parquet), both predicates prune storage."""
        return self.spark.sql(
            f"SELECT * FROM variants WHERE chrom = '{chrom}' "
            f"AND start >= {int(start)} AND `end` <= {int(end)}"
        )
