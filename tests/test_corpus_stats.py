"""Hand-computed semantics for the round-5 corpus/statistics queries:
rolling_distinct (cover-set window counting), mutual_info (independence
→ 0 / determinism → ln 2), token_entropy (uniform → ln k, constant → 0),
zipf_slope (exact power law → slope −1), ngram_lm (add-one smoothing
formula), welch_ttest (textbook two-sample case), autocorr_daily
(consecutive-day pairing + gap handling), seasonal_profile (hour-cell
means and deviations). These pin the FORMULAS independently of the
DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import vcf2db_spark.queries.analytics as qa
import vcf2db_spark.queries.pipeline_ext as qp
from vcf2db_spark.queries import QUERIES

_DAY_US = 86_400_000_000


def _events(spark, rows):
    """rows: (event_id, user_id, day, value) → events-shaped frame."""
    return spark.createDataFrame(
        rows, "event_id: bigint, user_id: bigint, day: bigint, value: double"
    ).select(
        "event_id",
        "user_id",
        "value",
        F.expr(f"timestamp_micros(day * {_DAY_US} + 3600000000)")
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("T").alias("event_type"),
    )


def _docs(spark, rows):
    """rows: (doc_id, lang, text) → documents-shaped frame."""
    return spark.createDataFrame(rows, "doc_id: bigint, lang: string, text: string").select(
        "doc_id",
        "text",
        "lang",
        F.lit("web").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _with_table(module, df, name, spark):
    orig = module.table_wide
    try:
        module.table_wide = lambda *a, **k: df
        return QUERIES[name](spark, "unused").collect()
    finally:
        module.table_wide = orig


def test_rolling_distinct_cover_counting(spark):
    # user 1 active days 0 and 8, user 2 active day 3. Observed days:
    #   day 0: trailing {u1}            -> 1
    #   day 3: trailing days 0..3 {u1,u2} -> 2
    #   day 8: trailing days 2..8 {u2(d3), u1(d8)} -> 2
    rows = [(1, 1, 0, 1.0), (2, 2, 3, 1.0), (3, 1, 8, 1.0),
            (4, 1, 8, 2.0)]  # second same-day event: distinct grain absorbs
    out = _with_table(qa, _events(spark, rows), "rolling_distinct", spark)
    got = {r["day"]: (r["n_active_1d"], r["n_active_7d"]) for r in out}
    day0 = min(got)
    assert got == {day0: (1, 1), day0 + 3: (1, 2), day0 + 8: (1, 2)}


def test_mutual_info_independent_zero_dependent_ln2(spark):
    # independent 2x2: each type hits both bins equally -> MI 0, chi2 0
    rows = [(1, 1, 0, 10.0), (2, 1, 0, 60.0),
            (3, 1, 0, 10.0), (4, 1, 0, 60.0)]
    df = _events(spark, rows).withColumn(
        "event_type", F.when(F.col("event_id") <= 2, "A").otherwise("B")
    )
    (r,) = _with_table(qa, df, "mutual_info", spark)
    assert (r["n"], r["n_cells"]) == (4, 4)
    assert r["mi_nats"] == 0.0 and r["chi2"] == 0.0

    # deterministic: type A always bin 0, type B always bin 1 -> MI ln2,
    # chi2 = n
    rows2 = [(1, 1, 0, 10.0), (2, 1, 0, 10.0),
             (3, 1, 0, 60.0), (4, 1, 0, 60.0)]
    df2 = _events(spark, rows2).withColumn(
        "event_type", F.when(F.col("event_id") <= 2, "A").otherwise("B")
    )
    (r2,) = _with_table(qa, df2, "mutual_info", spark)
    # two observed cells of the 2x2 grid; the two ZERO cells contribute
    # their expected count to chi2 (textbook chi2 = n for a deterministic
    # 2x2) and 0 to MI. Each observed MI term rounds to fixed point
    # BEFORE summing: round(0.5*ln2 * 1e6) = 346574 -> 0.693148.
    assert r2["n_cells"] == 2
    assert r2["mi_nats"] == 0.693148
    assert r2["chi2"] == 4.0


def test_token_entropy_uniform_and_constant(spark):
    docs = [(1, "en", "a a a a"), (2, "en", "a b"), (3, "en", "a a b b")]
    out = _with_table(qp, _docs(spark, docs), "token_entropy", spark)
    got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_nats"])
           for r in out}
    # per-cell fixed-point rounding: each (1/2)*ln2 term rounds to
    # 346574 units before the exact sum -> 0.693148 (not round(ln2, 6))
    ln2_cells = 0.693148
    assert got[1] == (4, 1, 0.0)
    assert got[2] == (2, 2, ln2_cells)
    assert got[3] == (4, 2, ln2_cells)


def test_zipf_slope_exact_power_law(spark):
    # counts proportional to 1/rank (c*r = 12): y = ln 12 - x exactly.
    text = " ".join(["t1"] * 12 + ["t2"] * 6 + ["t3"] * 4 + ["t4"] * 3)
    (r,) = _with_table(qp, _docs(spark, [(1, "en", text)]), "zipf_slope", spark)
    assert r["n_pts"] == 4
    assert abs(r["zipf_slope"] + 1.0) < 1e-4
    assert abs(r["intercept"] - math.log(12.0)) < 1e-4


def test_ngram_lm_add_one_smoothing(spark):
    docs = [(1, "en", "a b"), (2, "en", "a b"), (3, "en", "a c")]
    out = _with_table(qp, _docs(spark, docs), "ngram_lm", spark)
    got = {(r["w1"], r["w2"]): (r["n"], r["n1"], r["vsz"], r["p_smoothed"])
           for r in out}
    # context 'a' seen 3 times, successor vocab {b, c} size 2:
    # p(b|a) = (2+1)/(3+2) = 0.6, p(c|a) = (1+1)/(3+2) = 0.4
    assert got == {("a", "b"): (2, 3, 2, 0.6), ("a", "c"): (1, 3, 2, 0.4)}


def _events_us(spark, rows):
    """rows: (event_id, user_id, uts_micros, event_type, value)."""
    return spark.createDataFrame(
        rows,
        "event_id: bigint, user_id: bigint, uts: bigint,"
        " event_type: string, value: double",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("timestamp_micros(uts)").cast("timestamp_ntz").alias("ts"),
    )


_BEFORE = 1_705_000_000_000_000   # 2024-01-11, before the PSI split
_AFTER = 1_705_800_000_000_000    # 2024-01-21, after


def test_welch_ttest_hand_computed(spark):
    # ref half [1, 3]: mean 2, var 2; cur half [5, 9]: mean 7, var 8.
    # t = (2-7)/sqrt(2/2 + 8/2) = -sqrt(5) -> -2.236068
    # df = (1+4)^2 / (1^2/1 + 4^2/1) = 25/17 -> 1.470588
    rows = [(1, 1, _BEFORE, "T", 1.0), (2, 1, _BEFORE + 1, "T", 3.0),
            (3, 1, _AFTER, "T", 5.0), (4, 1, _AFTER + 1, "T", 9.0)]
    (r,) = _with_table(qa, _events_us(spark, rows), "welch_ttest", spark)
    assert (r["n_ref"], r["n_cur"]) == (2, 2)
    assert (r["mean_ref"], r["mean_cur"]) == (2.0, 7.0)
    assert r["t_stat"] == round(-math.sqrt(5.0), 6)
    assert r["df_welch"] == round(25.0 / 17.0, 6)


def test_autocorr_daily_hand_computed(spark):
    # type A: daily counts [1,2,3,4] on consecutive days -> mean 2.5,
    # num = 0.75 - 0.25 + 0.75 = 1.25, den = 5 -> r1 = 0.25.
    # type B: counts 1 on days 0,1,3 -> only (0,1) is a pair.
    rows = []
    eid = 0
    for d, c in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, d * _DAY_US + 1, "A", 1.0))
    for d in (0, 1, 3):
        eid += 1
        rows.append((eid, 1, d * _DAY_US + 1, "B", 1.0))
    out = _with_table(qa, _events_us(spark, rows), "autocorr_daily", spark)
    got = {r["event_type"]: (r["n_days"], r["n_pairs"], r["r1"]) for r in out}
    assert got["A"] == (4, 3, 0.25)
    # B: all counts equal -> den = 0 -> filtered out
    assert "B" not in got


def test_seasonal_profile_hand_computed(spark):
    # hour 0 values [1, 3] -> mean 2; hour 1 [4] -> mean 4;
    # type mean 8/3 -> 2.666667 in rounded units.
    h = 3_600_000_000
    rows = [(1, 1, 0 * h + 5, "T", 1.0), (2, 1, 0 * h + 6, "T", 3.0),
            (3, 1, 1 * h + 5, "T", 4.0)]
    out = _with_table(qa, _events_us(spark, rows), "seasonal_profile", spark)
    got = {r["hod"]: (r["n"], r["hod_mean"], r["dev_from_mean"]) for r in out}
    assert got[0] == (2, 2.0, -0.666667)
    assert got[1] == (1, 4.0, 1.333333)


def test_survival_km_product_limit(spark):
    # one cohort (all first events day 0), horizon = day 20, cutoff 13:
    #   u1: days 0,2   -> duration 2,  churned
    #   u2: day 0      -> duration 0,  churned
    #   u3: days 0,20  -> duration 20, censored
    # life table: t=0 (d=1,n=3) S=2/3; t=2 (d=1,n=2) S=1/3;
    #             t=20 (c=1,n=1) S stays 1/3
    rows = [(1, 1, 0, 1.0), (2, 1, 2, 1.0), (3, 2, 0, 1.0),
            (4, 3, 0, 1.0), (5, 3, 20, 1.0)]
    out = _with_table(qa, _events(spark, rows), "survival_km", spark)
    by_t = {r["duration_days"]: r for r in out}
    assert set(by_t) == {0, 2, 20}
    assert (by_t[0]["d_events"], by_t[0]["n_at_risk"]) == (1, 3)
    assert (by_t[2]["d_events"], by_t[2]["n_at_risk"]) == (1, 2)
    assert (by_t[20]["c_censored"], by_t[20]["n_at_risk"]) == (1, 1)
    assert abs(by_t[0]["survival"] - 2 / 3) < 2e-6
    assert abs(by_t[2]["survival"] - 1 / 3) < 2e-6
    assert abs(by_t[20]["survival"] - 1 / 3) < 2e-6


def test_lorenz_gini_bounds(spark):
    # uniform values -> G = 0 exactly; all mass on one row of n=4 ->
    # G = (n-1)/n = 0.75
    rows_uniform = [(i, 1, 0, 5.0) for i in range(1, 7)]
    (r,) = _with_table(qa, _events(spark, rows_uniform), "lorenz_gini", spark)
    assert r["n"] == 6 and r["gini"] == 0.0
    rows_conc = [(1, 1, 0, 0.0), (2, 1, 0, 0.0), (3, 1, 0, 0.0),
                 (4, 1, 0, 100.0)]
    (r,) = _with_table(qa, _events(spark, rows_conc), "lorenz_gini", spark)
    assert r["n"] == 4 and abs(r["gini"] - 0.75) < 2e-6


@pytest.mark.slow_sweep  # 1M-row overflow-cliff probe (~16 s); driver-window fit
def test_lorenz_gini_cliff_1m_single_group(spark, tmp_path):
    """Property test AT the headroom cliff: 1M events in ONE event_type.
    With the raw rank folded into the 1e-6-unit sum this overflows
    BIGINT (ANSI abort) past ~2.3e5 rows at this value range; the
    normalized-rank form must RUN, match the DuckDB oracle bitwise on
    the same parquet, and recover the closed-form Gini of a discrete
    uniform ramp, G = (n-1)/(3n) -> 1/3."""
    import duckdb

    from tools.check import compare
    from vcf2db_spark.queries import ORACLES, QUERIES

    n = 1_000_000
    path = str(tmp_path / "events.parquet")
    # value = rank ramp 1..n scaled to the fixture range (x/2000 <= 500)
    (spark.range(1, n + 1).select(
        F.col("id").alias("event_id"),
        F.lit(1).cast("bigint").alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") / 2000.0).alias("value"),
        F.expr("timestamp_micros(1700000000000000 + id)")
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        sdf = QUERIES["lorenz_gini"](spark, "unused").toPandas()
    finally:
        qa.table_wide = orig
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    odf = con.execute(ORACLES["lorenz_gini"]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, msg
    assert len(sdf) == 1 and sdf["n"].iloc[0] == n
    want = (n - 1) / (3.0 * n)
    assert abs(sdf["gini"].iloc[0] - want) < 1e-4
