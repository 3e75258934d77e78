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
- **x_linked_***: same shapes restricted to chrX with sex-aware zygosity
  (hemizygous males carry as HET-or-HOM_ALT; no father→son X
  transmission). Reconstructed from gemini's public docs (UNCERTAIN:
  exact strictness knobs — see each method's docstring).
- **mendel_errors**: per-trio Mendelian-violation classifier (gemini's
  four categories: plausible/implausible de novo, uniparental disomy,
  loss of heterozygosity).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf2db_spark.pipeline import VCFTables

HOM_REF, HET, UNKNOWN, HOM_ALT = 0, 1, 2, 3
AFFECTED = 2  # PED phenotype coding: 1=unaffected, 2=affected
MALE, FEMALE = 1, 2  # PED sex coding

#: chrom spellings accepted as the X chromosome by the x_linked_* models
X_CHROMS = ("chrX", "X", "x", "23")


@dataclass(frozen=True)
class Trio:
    child: str
    father: str
    mother: str
    child_affected: bool
    father_affected: bool
    mother_affected: bool
    child_sex: int = 0  # PED coding: 1=male, 2=female, other=unknown


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
            sex = r["sex"] if r["sex"] is not None else 0
            out.append(Trio(name, f, m, aff(name), aff(f), aff(m), sex))
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

    # -- X-linked models ------------------------------------------------------
    # Restricted to chrX rows; the chrom predicate is a plain Catalyst
    # IN-list, so it prunes a chrom-partitioned variants layout down to the
    # single X partition before any genotype test runs (docs/SCALE.md §write
    # layout). Semantics reconstructed from gemini's public model docs
    # (SURVEY.md §0 convention; UNCERTAIN: strictness of parent checks).

    def _x_model(self, pred, label: str) -> DataFrame:
        cond = self._per_trio(pred)
        v = self.tables.variants.filter(F.col("chrom").isin(*X_CHROMS))
        if cond is None:
            return v.filter(F.lit(False)).withColumn("model", F.lit(label))
        return v.filter(cond).withColumn("model", F.lit(label))

    def _carries_alt(self, sample: str, sex: int) -> Column:
        """Sex-aware 'carries the alt' test: hemizygous males surface as
        HET or HOM_ALT depending on the caller's ploidy convention, so
        accept both; females must be HET (dominant-carrier shape)."""
        g = self._gt(sample)
        if sex == MALE:
            return (g == HET) | (g == HOM_ALT)
        return g == HET

    def x_linked_de_novo(self) -> DataFrame:
        """Affected child carries a new X allele; both parents HOM_REF.
        Male child: HET or HOM_ALT (hemizygous call conventions vary);
        female child: HET."""

        def pred(t: Trio):
            if not t.child_affected:
                return None
            return (
                self._carries_alt(t.child, t.child_sex)
                & (self._gt(t.father) == HOM_REF)
                & (self._gt(t.mother) == HOM_REF)
            )

        return self._x_model(pred, "x_linked_de_novo")

    def x_linked_recessive(self) -> DataFrame:
        """Affected male child: hemizygous alt with carrier (HET) mother,
        father HOM_REF (fathers pass no X to sons). Affected female child:
        HOM_ALT with carrier mother and a father who carries (HET or
        hemizygous HOM_ALT)."""

        def pred(t: Trio):
            if not t.child_affected:
                return None
            mother_carrier = self._gt(t.mother) == HET
            if t.child_sex == MALE:
                return (
                    self._carries_alt(t.child, MALE)
                    & mother_carrier
                    & (self._gt(t.father) == HOM_REF)
                )
            father_g = self._gt(t.father)
            return (
                (self._gt(t.child) == HOM_ALT)
                & mother_carrier
                & ((father_g == HET) | (father_g == HOM_ALT))
            )

        return self._x_model(pred, "x_linked_recessive")

    def x_linked_dominant(self) -> DataFrame:
        """Affected child carries; the transmitting parent is affected and
        carries. Male child: mother only (no father→son X). Female child:
        either affected parent."""

        def pred(t: Trio):
            if not t.child_affected:
                return None
            mother_ok = (
                self._carries_alt(t.mother, FEMALE)
                if t.mother_affected
                else F.lit(False)
            )
            if t.child_sex == MALE:
                parent_ok = mother_ok
            else:
                father_ok = (
                    self._carries_alt(t.father, MALE)
                    if t.father_affected
                    else F.lit(False)
                )
                parent_ok = mother_ok | father_ok
            return self._carries_alt(t.child, t.child_sex) & parent_ok

        return self._x_model(pred, "x_linked_dominant")

    # -- Mendelian-error scan -------------------------------------------------

    def _mendel_case(self, t: Trio) -> Column:
        """gemini `mendel_errors` four-way classification for one trio.
        NULL = consistent (or uncallable) transmission."""
        c, f, m = self._gt(t.child), self._gt(t.father), self._gt(t.mother)
        both_ref = (f == HOM_REF) & (m == HOM_REF)
        both_alt = (f == HOM_ALT) & (m == HOM_ALT)
        opp_homs = ((f == HOM_REF) & (m == HOM_ALT)) | ((f == HOM_ALT) & (m == HOM_REF))
        return (
            F.when(both_ref & (c == HET), F.lit("plausible de novo"))
            .when(both_alt & (c == HET), F.lit("plausible de novo"))
            .when(both_ref & (c == HOM_ALT), F.lit("implausible de novo"))
            .when(both_alt & (c == HOM_REF), F.lit("implausible de novo"))
            .when(opp_homs & ((c == HOM_REF) | (c == HOM_ALT)), F.lit("uniparental disomy"))
            .when((f == HET) & (m == HOM_REF) & (c == HOM_ALT), F.lit("loss of heterozygosity"))
            .when((f == HET) & (m == HOM_ALT) & (c == HOM_REF), F.lit("loss of heterozygosity"))
            .when((m == HET) & (f == HOM_REF) & (c == HOM_ALT), F.lit("loss of heterozygosity"))
            .when((m == HET) & (f == HOM_ALT) & (c == HOM_REF), F.lit("loss of heterozygosity"))
            .otherwise(F.lit(None).cast("string"))
        )

    def mendel_errors(self) -> DataFrame:
        """One row per (variant, trio) whose genotypes violate Mendelian
        transmission, labeled with gemini's error category. Single scan:
        each trio contributes one slot to a constant-width array of
        (child, error) structs, exploded then null-filtered — no per-trio
        union, no UDF; cost is O(rows × trios) inside codegen."""
        v = self.tables.variants
        entries = [
            F.struct(
                F.lit(t.child).alias("child"), self._mendel_case(t).alias("error")
            )
            for t in self.trios
        ]
        if not entries:
            return v.sparkSession.createDataFrame(
                [], "variant_id long, chrom string, start long, ref string, "
                "alt string, child string, error string"
            )
        return (
            v.select(
                "variant_id", "chrom", "start", "ref", "alt",
                F.explode(F.array(*entries)).alias("e"),
            )
            .filter(F.col("e.error").isNotNull())
            .select(
                "variant_id", "chrom", "start", "ref", "alt",
                F.col("e.child").alias("child"),
                F.col("e.error").alias("error"),
            )
        )


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
    all-pairs.

    ``pattern_only=True`` is gemini's ``comp_hets --pattern-only``:
    affection status is ignored and no per-site parental origin is
    required — any two child-HET sites in the same gene qualify unless a
    single parent carries the alternate allele at BOTH sites (the pair
    could then be in cis on that parent's haplotype). Reconstructed from
    gemini's public docs (UNCERTAIN: upstream also consults phase when
    available; we are unphased-only)."""

    def compound_hets(self, pattern_only: bool = False) -> DataFrame:
        if pattern_only:
            return self._compound_hets_pattern_only()
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

    def _compound_hets_pattern_only(self) -> DataFrame:
        """Pattern-only pairs: child HET at both sites of a gene; excluded
        when one parent carries alt (HET/HOM_ALT) at both sites. Same
        gene-keyed self-join shape as the strict form — per-trio candidate
        sets are filtered scans of the one variants table, and the
        ``vid <`` inequality halves the pair space."""
        v = self.tables.variants
        if "gene" not in v.columns:
            raise ValueError("compound_hets requires the denormalized gene column")
        carries = lambda g: g.isin(HET, HOM_ALT)  # noqa: E731
        outs = []
        for t in self.trios:
            cand = (
                v.filter((self._gt(t.child) == HET) & F.col("gene").isNotNull())
                .select(
                    "variant_id",
                    "gene",
                    carries(self._gt(t.father)).alias("dad_carries"),
                    carries(self._gt(t.mother)).alias("mom_carries"),
                )
            )
            a = cand.select(
                F.col("gene"),
                F.col("variant_id").alias("variant_id_1"),
                F.col("dad_carries").alias("dad_1"),
                F.col("mom_carries").alias("mom_1"),
            )
            b = cand.select(
                F.col("gene").alias("gene_b"),
                F.col("variant_id").alias("variant_id_2"),
                F.col("dad_carries").alias("dad_2"),
                F.col("mom_carries").alias("mom_2"),
            )
            pairs = (
                a.join(b, a.gene == b.gene_b)
                .filter(F.col("variant_id_1") < F.col("variant_id_2"))
                # a pair both of whose sites sit on one parent's carried
                # haplotype set is potentially cis → not a candidate
                .filter(~(F.col("dad_1") & F.col("dad_2")))
                .filter(~(F.col("mom_1") & F.col("mom_2")))
                .select(
                    F.lit(t.child).alias("child"),
                    "gene",
                    "variant_id_1",
                    "variant_id_2",
                )
            )
            outs.append(pairs)
        if not outs:
            schema = "child string, gene string, variant_id_1 long, variant_id_2 long"
            return v.sparkSession.createDataFrame([], schema)
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out


# attach to the engine (defined after the class to keep the base models
# and the pair-join composition separately readable)
InheritanceEngine.compound_hets = CompHetMixin.compound_hets
InheritanceEngine._compound_hets_pattern_only = (
    CompHetMixin._compound_hets_pattern_only
)
