"""Mendelian inheritance-model queries (gemini tool parity: `gemini
de_novo / autosomal_recessive / autosomal_dominant` over the loaded
tables — the flagship downstream use of the reference's schema).

Each model compiles, per family trio from the PED, to pure
``element_at(gt_types, idx)`` predicates OR-ed across trios — the same
Catalyst-only discipline as gemini.py's gt-filters (no UDF, no explode;
the predicate pushes into the variants scan). Cohort size bounds the
expression width, mirroring the reference holding the PED in memory.

Genotype coding is cyvcf2: HOM_REF=0, HET=1, UNKNOWN=2, HOM_ALT=3.

Model semantics (gemini defaults, strict callable-trio form):
- **de_novo**: affected child HET; both parents HOM_REF; all three called.
- **autosomal_recessive**: affected child HOM_ALT; both parents HET.
- **autosomal_dominant**: affected child HET; at least one affected
  parent HET (supporting inherited dominance).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf2db_spark.pipeline import VCFTables

HOM_REF, HET, UNKNOWN, HOM_ALT = 0, 1, 2, 3
AFFECTED = 2  # PED phenotype coding: 1=unaffected, 2=affected


@dataclass(frozen=True)
class Trio:
    child: str
    father: str
    mother: str
    child_affected: bool
    father_affected: bool
    mother_affected: bool


def trios_from_samples(samples: DataFrame) -> list[Trio]:
    """Complete trios from the PED dimension (child + both parents known
    and present in the cohort)."""
    rows = {r["name"]: r for r in samples.collect()}

    def aff(name: str) -> bool:
        r = rows.get(name)
        return bool(r is not None and r["phenotype"] == AFFECTED)

    out = []
    for name, r in rows.items():
        f, m = r["paternal_id"], r["maternal_id"]
        if f in rows and m in rows and f not in ("0", None) and m not in ("0", None):
            out.append(Trio(name, f, m, aff(name), aff(f), aff(m)))
    return out


class InheritanceEngine:
    def __init__(self, tables: VCFTables):
        if tables.samples is None:
            raise ValueError("inheritance models require a PED/samples table")
        self.tables = tables
        names = tables.header.samples or []
        self.idx = {n: i + 1 for i, n in enumerate(names)}  # element_at is 1-based
        self.trios = [
            t
            for t in trios_from_samples(tables.samples)
            if t.child in self.idx and t.father in self.idx and t.mother in self.idx
        ]

    def _gt(self, sample: str) -> Column:
        return F.element_at("gt_types", self.idx[sample])

    def _per_trio(self, pred) -> Column | None:
        conds = [pred(t) for t in self.trios]
        conds = [c for c in conds if c is not None]
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def _model(self, pred, label: str) -> DataFrame:
        cond = self._per_trio(pred)
        v = self.tables.variants
        if cond is None:
            return v.filter(F.lit(False)).withColumn("model", F.lit(label))
        return v.filter(cond).withColumn("model", F.lit(label))

    def de_novo(self) -> DataFrame:
        def pred(t: Trio):
            if not t.child_affected:
                return None
            return (
                (self._gt(t.child) == HET)
                & (self._gt(t.father) == HOM_REF)
                & (self._gt(t.mother) == HOM_REF)
            )

        return self._model(pred, "de_novo")

    def autosomal_recessive(self) -> DataFrame:
        def pred(t: Trio):
            if not t.child_affected:
                return None
            return (
                (self._gt(t.child) == HOM_ALT)
                & (self._gt(t.father) == HET)
                & (self._gt(t.mother) == HET)
            )

        return self._model(pred, "autosomal_recessive")

    def autosomal_dominant(self) -> DataFrame:
        def pred(t: Trio):
            if not t.child_affected:
                return None
            father_ok = (self._gt(t.father) == HET) if t.father_affected else F.lit(False)
            mother_ok = (self._gt(t.mother) == HET) if t.mother_affected else F.lit(False)
            return (self._gt(t.child) == HET) & (father_ok | mother_ok)

        return self._model(pred, "autosomal_dominant")


def _origin_label(father, mother):
    """Unphased parental-origin classification for a child-HET site."""
    return (
        F.when((father == HET) & (mother == HOM_REF), F.lit("paternal"))
        .when((mother == HET) & (father == HOM_REF), F.lit("maternal"))
        .otherwise(F.lit(None))
    )


class CompHetMixin:
    """gemini `comp_hets` (unphased candidate form): two HET variants in
    the SAME gene in an affected child, one inherited from each parent.
    Composition: per-trio origin labeling (element_at predicates) →
    self-join on (trio, gene) with opposite origins — the join key is
    (gene), so the shuffle is bounded by per-gene variant counts, never
    all-pairs."""

    def compound_hets(self) -> DataFrame:
        v = self.tables.variants
        if "gene" not in v.columns:
            raise ValueError("compound_hets requires the denormalized gene column")
        outs = []
        for t in self.trios:
            if not t.child_affected:
                continue
            origin = _origin_label(self._gt(t.father), self._gt(t.mother))
            cand = (
                v.filter((self._gt(t.child) == HET) & F.col("gene").isNotNull())
                .withColumn("origin", origin)
                .filter(F.col("origin").isNotNull())
                .select("variant_id", "gene", "origin")
            )
            pat = cand.filter(F.col("origin") == "paternal").select(
                F.col("gene"), F.col("variant_id").alias("paternal_variant_id")
            )
            mat = cand.filter(F.col("origin") == "maternal").select(
                F.col("gene").alias("gene_m"), F.col("variant_id").alias("maternal_variant_id")
            )
            pairs = pat.join(mat, pat.gene == mat.gene_m).select(
                F.lit(t.child).alias("child"),
                "gene",
                "paternal_variant_id",
                "maternal_variant_id",
            )
            outs.append(pairs)
        if not outs:
            schema = "child string, gene string, paternal_variant_id long, maternal_variant_id long"
            return v.sparkSession.createDataFrame([], schema)
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out


# attach to the engine (defined after the class to keep the base models
# and the pair-join composition separately readable)
InheritanceEngine.compound_hets = CompHetMixin.compound_hets
