"""Statistical-analytics query tier (round-4 window): per-entity trend
fitting and robust outlier detection — the monitoring passes a training-
data pipeline runs over its telemetry/metadata tables.

Determinism strategy shared by both queries: every aggregate input is an
INTEGER (seconds-from-entity-start, 1e-6 value units), the sums are exact
BIGINT, and the only floating-point ops are final arithmetic over those
identical integers plus one ROUND(…, 6) — the same convention as the
registry's fixed-point sums, extended to second-order moments.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vcf2db_spark.io import table, table_wide
from vcf2db_spark.registry import OSUM, OZ6, dq, dsum, z6

# --------------------------------------------------------------------------
# per-group ordinary least squares: value ~ time, one closed-form fit per
# user from five exact integer sums (no iteration, no matrix library)
# --------------------------------------------------------------------------


@dq(
    "grouped_ols",
    oracle="""
    WITH w AS (
      SELECT user_id,
             epoch_us(ts) // 1000000
               - MIN(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)
               AS xs,
             CASE WHEN MAX(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)
                       - MIN(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)
                       > 3000000
                  THEN 60 ELSE 1 END AS unit_s,
             CAST(ROUND(value * 1000000.0) AS BIGINT) AS yu
      FROM events
    ),
    e AS (SELECT user_id, xs // unit_s AS x, unit_s, yu FROM w),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(unit_s) AS unit_s,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(yu) AS BIGINT) AS sy,
             CAST(SUM(x * yu) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM e GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / 1000000.0 * (3600.0 / CAST(unit_s AS DOUBLE)), 6) + 0.0
             AS slope_per_hour,
           ROUND((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy
                  - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
                 / n / 1000000.0, 6) + 0.0 AS intercept
    FROM s WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
    """,
)
def grouped_ols(spark, sf_dir):
    """Per-user linear trend of `value` over time, closed-form OLS from
    five exact integer sums (n, Σx, Σy, Σxy, Σx²): x is whole SECONDS
    from the user's own first event (bounds Σxy below the BIGINT range —
    raw epoch micros would overflow the cross-moment), y is 1e-6 fixed-
    point units. The slope/intercept doubles derive from identical
    integers in both engines, so ROUND(…,6) cannot diverge. Shape: one
    window for the per-user origin (same user_id partitioning the
    aggregate reuses) + one partial-agged exchange — no per-group
    matrices, no Python. Degenerate single-instant users (zero time
    variance) are excluded by the determinant filter (computed in
    double space — the BIGINT products overflow near ~2000 events per
    entity-month; the exact-integer guarantee covers the five SUMS).
    OVERFLOW GUARD (VERDICT r3 item 9): an entity whose observed span
    exceeds 3e6 s (~35 days — above every fixture span, so fixture
    hashes are unchanged) rebases x to MINUTES for that entity only
    (integer DIV, identical both engines; slope rescaled by
    3600/unit_s), pushing the Σx² cliff from ~1e5 to ~4e6
    events/entity. Cliff behaviour is property-tested in
    tests/test_stats.py."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ)) DIV 1000000")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    span = F.max(sec).over(w) - F.min(sec).over(w)
    unit_s = F.when(span > 3_000_000, F.lit(60)).otherwise(F.lit(1))
    base = e.select(
        "user_id",
        (sec - F.min(sec).over(w)).alias("_xs"),
        unit_s.alias("unit_s"),
        F.round(F.col("value") * 1_000_000.0).cast("long").alias("yu"),
    ).select(
        "user_id",
        F.expr("_xs DIV unit_s").alias("x"),
        "unit_s",
        "yu",
    )
    s = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("unit_s").alias("unit_s"),
        F.sum("x").alias("sx"),
        F.sum("yu").alias("sy"),
        F.sum(F.col("x") * F.col("yu")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    det = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    slope_u = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / det
    # determinant test in DOUBLE: the BIGINT products n*sxx and sx*sx
    # overflow around ~2000 events/entity-month (sx ~ 2.6e9 squared);
    # the double forms lose only ulps, harmless for a >0 test
    # z6: slope/intercept are signed — a tiny-negative value ROUNDs to
    # -0.0 in DuckDB but +0.0 in Spark (BigDecimal drops the sign); the
    # +0.0 normalization (registry z6 convention) closes the class.
    return s.filter(det > 0).select(
        "user_id",
        "n",
        z6(
            slope_u / 1_000_000.0 * (F.lit(3600.0) / F.col("unit_s").cast("double")),
        ).alias("slope_per_hour"),
        z6(
            (F.col("sy").cast("double") - slope_u * F.col("sx")) / F.col("n") / 1_000_000.0,
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# robust outliers: median absolute deviation per event_type (median via
# the exact interpolated percentile both engines share — agg_percentile
# proved the parity), flag |x - med| > 3 * MAD
# --------------------------------------------------------------------------

from vcf2db_spark.lifecycle import Lifecycle

_MAD_LC = Lifecycle()


@dq(
    "anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
             ABS(e.value - med.med) AS adev
      FROM events e JOIN med ON e.event_type = med.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type,
           ROUND(dev.value, 6) AS value,
           ROUND(dev.med, 6) AS med,
           ROUND(mad.mad, 6) AS mad
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    WHERE dev.adev > 3 * mad.mad
    """,
)
def anomaly_mad(spark, sf_dir):
    """Median-absolute-deviation outliers per event_type: two grouped
    exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    parity proven by agg_percentile) with the tiny per-type stats
    broadcast back onto the stream — the robust z-score screen that
    survives the heavy-tailed metrics a mean/stddev screen dies on.
    The 3×MAD comparison runs on raw doubles derived identically in
    both engines; only the REPORT columns round. `dev` feeds both the
    MAD aggregate and the final filter, so it is persisted (release-on-
    next-call, the curate.py lifecycle) — without it the events scan and
    the median percentile both run twice in the one action."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    _MAD_LC.release()
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    ).persist()
    _MAD_LC.hold_df(dev)
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


# --------------------------------------------------------------------------
# gaps-and-islands: run-length encoding of each user's event-type stream
# (the rn - rn_per_type grouping trick). All integers + strings — exact.
# --------------------------------------------------------------------------


@dq(
    "runs_encode",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS uts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           CAST(MIN(uts) AS BIGINT) AS start_us,
           CAST(MAX(uts) AS BIGINT) AS end_us
    FROM o GROUP BY user_id, event_type, rn - rnt
    HAVING COUNT(*) >= 3
    """,
)
def runs_encode(spark, sf_dir):
    """Run-length encoding of consecutive same-type events per user —
    the gaps-and-islands idiom: two ROW_NUMBERs over the same (ts,
    event_id)-total order differ by a constant within a run, so
    (rn − rn_per_type) is the island key and one aggregate collapses
    each run. Both windows and the aggregate share the user_id hash
    partitioning (one exchange family). Runs shorter than 3 are
    dropped to keep the report the interesting tail. Everything is
    integer/string — no float boundary at all."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    uts = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        uts.alias("uts"),
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("_isl"),
    )
    return (
        o.groupBy("user_id", "event_type", "_isl")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("uts").alias("start_us"),
            F.max("uts").alias("end_us"),
        )
        .filter(F.col("run_len") >= 3)
        .drop("_isl")
    )


# --------------------------------------------------------------------------
# interval union/coverage: merge overlapping per-event windows and report
# each user's merged-interval count + total covered time. The island
# boundary is "start > running max of prior ends" — integer micros only.
# --------------------------------------------------------------------------


@dq(
    "interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e,
             event_id
      FROM events
    ),
    b AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    g AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM b
    ),
    m AS (
      SELECT user_id, grp, MIN(s) AS ms, MAX(e) AS me
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_us
    FROM m GROUP BY user_id
    """,
)
def interval_merge(spark, sf_dir):
    """Interval union: each event opens a 5-minute window; overlapping
    windows merge and the report is per-user merged-interval count +
    total covered microseconds. The island boundary test compares each
    start to the RUNNING MAX of all prior ends (rows unbounded-preceding
    to 1-preceding) — the standard coverage idiom that stays one
    window-partition pass; a lag(end) comparison would under-merge when
    an early long interval swallows later short ones. Integer micros
    end to end. The genomic twin of this op is exon→gene footprint
    computation (operators/intervals.py serves the join side)."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    uts = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        "user_id", uts.alias("s"), (uts + 300_000_000).alias("e"), "event_id"
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    b = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    # event_id tie-break: two events at the same (user, ts) must take a
    # deterministic order through the running sum, or the second row's
    # island assignment is engine-dependent (registry tie convention)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = b.withColumn("grp", F.sum("new_island").over(w_run))
    m = g.groupBy("user_id", "grp").agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_us"),
    )


# --------------------------------------------------------------------------
# distribution drift: two-sample Kolmogorov-Smirnov statistic per
# event_type between the first and second half of the observation window
# — the data-drift monitor a training pipeline runs on every new batch.
# --------------------------------------------------------------------------


@dq(
    "drift_ks",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS in_a
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type, value,
             CAST(SUM(in_a) AS BIGINT) AS ca,
             CAST(SUM(1 - in_a) AS BIGINT) AS cb
      FROM s GROUP BY event_type, value
    ),
    t AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
          FROM c GROUP BY event_type),
    k AS (
      SELECT c.event_type,
             SUM(ca) OVER (PARTITION BY c.event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (PARTITION BY c.event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             t.na, t.nb
      FROM c JOIN t ON c.event_type = t.event_type
      WHERE t.na > 0 AND t.nb > 0
    )
    SELECT event_type,
           CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / na
                         - CAST(cum_b AS DOUBLE) / nb)), 6) AS ks_stat
    FROM k GROUP BY event_type
    """,
)
def drift_ks(spark, sf_dir):
    """Two-sample KS drift statistic per event_type (first vs second half
    of the month): counts collapse per distinct value first (the cum
    windows then run over value-distinct rows — ties between the two
    samples are handled by construction), cumulative counts are exact
    BIGINT window sums, and the empirical-CDF gap divides identical
    integers in both engines before one final ROUND. MAX(|·|) is
    order-free. At 100 TB the per-value pre-aggregation is what keeps
    the window input at distinct-value cardinality instead of row
    count — the same partial-agg-before-window shape as dedup_window."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id").filter(
        F.col("value").isNotNull()
    )
    in_a = (F.col("ts") < F.lit("2024-01-15").cast("timestamp")).cast("int")
    c = (
        e.select("event_type", "value", in_a.alias("in_a"))
        .groupBy("event_type", "value")
        .agg(
            F.sum("in_a").alias("ca"),
            F.sum(1 - F.col("in_a")).alias("cb"),
        )
    )
    t = c.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a segment living entirely in one half has an empty opposing
    # sample: the KS statistic is undefined there, and under ANSI the
    # division would abort the whole query — exclude such segments in
    # BOTH engines
    t = t.filter((F.col("na") > 0) & (F.col("nb") > 0))
    k = c.join(F.broadcast(t), "event_type").select(
        "event_type",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        "na",
        "nb",
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("na")
        - F.col("cum_b").cast("double") / F.col("nb")
    )
    return k.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.round(F.max(gap), 6).alias("ks_stat"),
    )


# --------------------------------------------------------------------------
# ordered funnel: signup → view → click → purchase, each stage's first
# event strictly after the previous stage's. Four chained min-aggregates —
# all timestamps, all exact.
# --------------------------------------------------------------------------


@dq(
    "funnel_stages",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           WHERE e.event_type = 'view' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 1 AS stage_idx, 'signup' AS stage,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 2, 'view', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL SELECT 3, 'click', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    UNION ALL SELECT 4, 'purchase', CAST((SELECT COUNT(*) FROM s4) AS BIGINT)
    """,
)
def funnel_stages(spark, sf_dir):
    """Ordered conversion funnel: stage k counts users whose first
    stage-k event is STRICTLY after their first stage-(k-1) event.
    SINGLE-PASS shape: one groupBy collects each user's per-stage
    timestamp array (bounded by events-per-user), then the four chained
    mins are pure array HOFs over that one row — array_min of the
    filter(x > t_prev) survivors. The naive chained-join form scans the
    fact 1+2+3+4 times in one action (each union branch recomputes its
    whole upstream lineage); this shape scans it ONCE and shuffles once.
    Counts are exact integers; timestamps never leave the JVM."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    stages = ["signup", "view", "click", "purchase"]

    def arr(t):
        return F.sort_array(
            F.collect_list(F.when(F.col("event_type") == t, F.col("ts")))
        ).alias(f"_a_{t}")

    g = (
        e.filter(F.col("event_type").isin(*stages))
        .groupBy("user_id")
        .agg(*[arr(t) for t in stages])
    )
    g = g.withColumn("t1", F.array_min("_a_signup"))
    g = g.withColumn(
        "t2", F.array_min(F.filter("_a_view", lambda x: x > F.col("t1")))
    )
    g = g.withColumn(
        "t3", F.array_min(F.filter("_a_click", lambda x: x > F.col("t2")))
    )
    g = g.withColumn(
        "t4", F.array_min(F.filter("_a_purchase", lambda x: x > F.col("t3")))
    )
    cnt = g.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in (1, 2, 3, 4)]
    )
    return cnt.select(
        F.expr(
            "stack(4, 1, 'signup', n1, 2, 'view', n2, 3, 'click', n3,"
            " 4, 'purchase', n4) AS (stage_idx, stage, n_users)"
        )
    )


# --------------------------------------------------------------------------
# cohort retention: users grouped by first-activity week; cell (cohort,
# offset) counts cohort members active offset weeks later. Integer weeks.
# --------------------------------------------------------------------------


@dq(
    "retention_cohort",
    oracle="""
    WITH w AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id),
    act AS (SELECT DISTINCT w.user_id, first.cohort_wk,
                   w.wk - first.cohort_wk AS offset_wk
            FROM w JOIN first ON w.user_id = first.user_id)
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(offset_wk AS BIGINT) AS offset_wk,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_wk, offset_wk
    """,
)
def retention_cohort(spark, sf_dir):
    """Cohort retention matrix: cohort = the user's first active epoch-
    week (integer DIV of epoch micros — no calendar/timezone semantics
    to diverge on), cell value = distinct cohort members active at each
    week offset. The distinct collapses (user, week) activity before the
    matrix aggregate — the same pre-shrink-then-aggregate shape as
    drift_ks; everything is BIGINT."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    wk = F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ)) DIV 604800000000")
    w = e.select("user_id", wk.alias("wk"))
    first = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = (
        w.join(first, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .distinct()
    )
    return act.groupBy("cohort_wk", "offset_wk").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# --------------------------------------------------------------------------
# population stability index: the industry-standard binned drift metric
# (complement of drift_ks's exact-CDF statistic) — reference window vs
# current window per event_type, Laplace-smoothed so empty bins are
# defined. Every ratio derives from exact integer counts → identical
# doubles both engines.
# --------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"
# Same instant as epoch micros (UTC): the Spark side compares via
# timestamp_micros so the split never depends on how a string literal
# parses under the session timezone (the oracle's naive DuckDB TIMESTAMP
# literal compares naive-vs-naive, equally TZ-free).
_PSI_SPLIT_US = 1_705_363_200_000_000
_PSI_BINS = 10
_PSI_WIDTH = 50.0  # value ∈ [0, 500) in the fixtures


@dq(
    "drift_psi",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 0 ELSE 1 END AS half,
             LEAST({_PSI_BINS - 1},
                   CAST(FLOOR(value / {_PSI_WIDTH}) AS INT)) AS bin
      FROM events
    ),
    c AS (SELECT event_type, half, bin, CAST(COUNT(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2, 3),
    f AS (
      SELECT g.event_type, g.bin,
             COALESCE(r.n, 0) AS n_ref, COALESCE(q.n, 0) AS n_cur,
             COALESCE(tr.tot, 0) AS tot_ref, COALESCE(tq.tot, 0) AS tot_cur
      FROM (SELECT DISTINCT event_type, bin
            FROM (SELECT event_type, unnest(range({_PSI_BINS})) AS bin
                  FROM (SELECT DISTINCT event_type FROM events))) g
      LEFT JOIN c r ON r.event_type = g.event_type AND r.bin = g.bin
                    AND r.half = 0
      LEFT JOIN c q ON q.event_type = g.event_type AND q.bin = g.bin
                    AND q.half = 1
      LEFT JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS tot FROM b
            WHERE half = 0 GROUP BY 1) tr ON tr.event_type = g.event_type
      LEFT JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS tot FROM b
            WHERE half = 1 GROUP BY 1) tq ON tq.event_type = g.event_type
    )
    SELECT event_type,
           ROUND(SUM(
             (CAST(n_ref + 1 AS DOUBLE) / (tot_ref + {_PSI_BINS})
              - CAST(n_cur + 1 AS DOUBLE) / (tot_cur + {_PSI_BINS}))
             * LN((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + {_PSI_BINS}))
                  / (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + {_PSI_BINS})))
           ), 6) AS psi
    FROM f GROUP BY event_type
    """,
)
def drift_psi(spark, sf_dir):
    """Population stability index per event_type between the first and
    second half of the observation window — the standard production
    drift monitor (PSI > 0.2 = investigate). Shape: one (type, half,
    bin) pre-aggregation (the shuffle moves bin-cardinality counts, not
    rows), the full bin grid generated executor-side so empty bins
    participate (oracle totals LEFT-join + COALESCE 0 so a type present
    in only one half survives on both sides, matching the window-sum
    semantics here), Laplace +1 smoothing so the log is always defined, and
    the final PSI is a bin-cardinality aggregate. Every p/q ratio
    derives from exact BIGINT counts — both engines compute identical
    doubles."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    # ONE scan, one conditional aggregate: (type, bin) cells carry both
    # halves' counts as conditional sums (the r4 bench caught the naive
    # three-scan shape — counts, totals, and the type list each re-read
    # events — at 1.16 s; this is 3×). Totals come from a window over
    # the ~types×bins cell table, the bin grid explodes from the
    # post-aggregate type list, never from the raw scan.
    is_ref = F.col("ts") < F.timestamp_micros(F.lit(_PSI_SPLIT_US))
    c = (
        e.select(
            "event_type",
            is_ref.alias("_r"),
            F.least(
                F.lit(_PSI_BINS - 1),
                F.floor(F.col("value") / _PSI_WIDTH).cast("int"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("_r"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("_r"), 0).otherwise(1)).alias("n_cur"),
        )
    )
    grid = (
        c.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
    )
    from pyspark.sql import Window

    f = grid.join(c, ["event_type", "bin"], "left").fillna(
        0, ["n_ref", "n_cur"]
    )
    wt = Window.partitionBy("event_type")
    f = f.withColumn("tot_ref", F.sum("n_ref").over(wt)).withColumn(
        "tot_cur", F.sum("n_cur").over(wt)
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tot_ref") + _PSI_BINS)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tot_cur") + _PSI_BINS)
    return f.groupBy("event_type").agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi")
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: the behavioral
# fingerprint (what follows what) — lead() within user, global transition
# counts, row-normalized probabilities. Exact integers + one division.
# --------------------------------------------------------------------------


@dq(
    "markov_transitions",
    oracle="""
    WITH s AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
          FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
    FROM c JOIN t ON t.from_type = c.from_type
    """,
)
def markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    lead() inside the user partition (tie-break on event_id) pairs each
    event with its successor, transition counts aggregate globally, and
    probabilities row-normalize by the from-state total. One window
    exchange on user_id + one pair-cardinality aggregate; the from-state
    totals (≤ |event types|) ride a broadcast. The sequence-model
    shape behind session behavioral fingerprints and churn features."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = s.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
        )
    )


# --------------------------------------------------------------------------
# quantile-boundary feature bucketing: the fit/transform pair of a
# feature-engineering pipeline in one declared pass — exact quartile
# boundaries (the percentile parity agg_percentile proved) broadcast back
# onto the stream as CASE comparisons.
# --------------------------------------------------------------------------


@dq(
    "feature_bucketize",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events
    )
    SELECT CASE WHEN value < q.q1 THEN 0 WHEN value < q.q2 THEN 1
                WHEN value < q.q3 THEN 2 ELSE 3 END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM events, q
    GROUP BY 1
    """,
)
def feature_bucketize(spark, sf_dir):
    """Quantile bucketizer (fit + transform): exact quartile boundaries
    from one grouped-percentile pass (Spark `percentile` ≡ DuckDB
    `quantile_cont` — parity proven by agg_percentile), broadcast as a
    1-row relation, and applied as branch-free CASE comparisons in the
    scan projection. The report aggregates per bucket. At 100 TB the
    boundaries are the stored 'model'; the transform is a map-only pass
    that never re-sees the fit data. MIN/MAX over identically-derived
    doubles are order-free, so the report is hash-exact."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    q = e.agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.50)).alias("q2"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    b = e.crossJoin(F.broadcast(q)).select(
        "value",
        F.when(F.col("value") < F.col("q1"), 0)
        .when(F.col("value") < F.col("q2"), 1)
        .when(F.col("value") < F.col("q3"), 2)
        .otherwise(3)
        .alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


# --------------------------------------------------------------------------
# rolling exact distinct: 7-day active users per day. Window DISTINCT
# aggregates don't exist in Spark's window functions; the distributed
# rewrite is cover-set expansion — each (user, active_day) contributes to
# the 7 trailing windows it falls into, then one distinct + count per day.
# Bounded 7× row multiplier, all shuffles on (user, day) / day keys; at
# 100 TB this beats a range self-join (which would re-scan 7× the rows
# per window end) and never builds per-day user sets in memory.
# --------------------------------------------------------------------------


@dq(
    "rolling_distinct",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    cov AS (
      SELECT DISTINCT user_id, ud.day + x.i AS day
      FROM ud, (SELECT unnest(range(7)) AS i) x
    ),
    days AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active_1d
      FROM ud GROUP BY day
    )
    SELECT d.day, d.n_active_1d, CAST(COUNT(*) AS BIGINT) AS n_active_7d
    FROM days d JOIN cov c ON c.day = d.day
    GROUP BY d.day, d.n_active_1d
    """,
)
def rolling_distinct(spark, sf_dir):
    """Exact trailing-7-day distinct active users per observed day.

    COUNT(DISTINCT) over a sliding range frame has no distributed window
    implementation; the classic rewrite is cover-set expansion: each
    distinct (user, active_day) is exploded to the 7 window-end days it
    covers, deduplicated on (user, covered_day), and counted per day.
    Row growth is a bounded 7× of the DISTINCT (user, day) grain (not of
    raw events), every stage is a keyed partial-aggregated shuffle, and
    only days observed in the data are reported. The same-day exact
    distinct (n_active_1d) rides along from the pre-expansion grain."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ)) DIV 86400000000")
    ud = e.select("user_id", day.alias("day")).distinct()
    days = ud.groupBy("day").agg(F.count(F.lit(1)).alias("n_active_1d"))
    cov = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias("day"),
    ).distinct()
    return (
        days.join(cov, "day")
        .groupBy("day", "n_active_1d")
        .agg(F.count(F.lit(1)).alias("n_active_7d"))
    )


# --------------------------------------------------------------------------
# mutual information + chi-square: dependence between event_type and the
# binned value distribution — the feature-relevance / independence audit
# of a feature store. All probabilities derive from exact BIGINT cell
# counts; the only doubles are per-cell terms computed identically in
# both engines, combined with the registry's fixed-point sum.
# --------------------------------------------------------------------------

_MI_BINS = 10
_MI_WIDTH = 50.0
_MI_LC = Lifecycle()


@dq(
    "mutual_info",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             LEAST({_MI_BINS - 1},
                   CAST(FLOOR(value / {_MI_WIDTH}) AS INT)) AS bin
      FROM events
    ),
    c AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
          FROM b GROUP BY 1, 2),
    nx AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nx
           FROM c GROUP BY 1),
    ny AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS ny FROM c GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
    g AS (
      SELECT nx.nx, ny.ny, tot.nn, COALESCE(c.n, 0) AS n
      FROM nx CROSS JOIN ny CROSS JOIN tot
      LEFT JOIN c ON c.event_type = nx.event_type AND c.bin = ny.bin
    )
    SELECT CAST(MAX(nn) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cells,
           {OSUM("CASE WHEN n > 0 THEN (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) * LN((CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)) / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) ELSE 0.0 END")} AS mi_nats,
           {OSUM("((CAST(n AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE))) / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE))")} AS chi2
    FROM g
    """,
)
def mutual_info(spark, sf_dir):
    """Mutual information (nats) and the chi-square statistic between
    event_type and the decile-binned value — one (type, bin) contingency
    aggregation (the shuffle carries cell counts, never rows), marginals
    re-aggregated from the cell table, and the FULL types×bins grid
    rebuilt by crossing the two marginal tables (zero cells participate:
    chi-square requires them — each contributes its expected count; the
    MI term at n=0 is the p·ln p → 0 limit, written as an explicit
    CASE so both engines emit literal 0.0). Per-cell terms are
    identically-shaped double arithmetic over exact integers; the final
    reduction goes through the fixed-point sum so summation order can't
    perturb the hash. One-row output; every post-scan relation is
    marginal-sized (types, bins, types×bins). The cell table feeds four
    consumers (nx, ny, tot, the grid join), so it is persisted
    (release-on-next-call) — without it each marginal re-runs the events
    scan (measured 3× at sf1)."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    _MI_LC.release()
    c = (
        e.select(
            "event_type",
            F.least(
                F.lit(_MI_BINS - 1),
                F.floor(F.col("value") / _MI_WIDTH).cast("int"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    _MI_LC.hold_df(c)
    nx = c.groupBy("event_type").agg(F.sum("n").alias("nx"))
    ny = c.groupBy("bin").agg(F.sum("n").alias("ny"))
    tot = c.agg(F.sum("n").alias("nn"))
    g = (
        nx.crossJoin(ny)
        .crossJoin(F.broadcast(tot))
        .join(c, ["event_type", "bin"], "left")
        .select("nx", "ny", "nn", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    nd = F.col("n").cast("double")
    nxd = F.col("nx").cast("double")
    nyd = F.col("ny").cast("double")
    nnd = F.col("nn").cast("double")
    exy = nxd * nyd / nnd
    mi_term = F.when(
        F.col("n") > 0, (nd / nnd) * F.ln((nd * nnd) / (nxd * nyd))
    ).otherwise(F.lit(0.0))
    return g.agg(
        F.max("nn").alias("n"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).alias("n_cells"),
        dsum(mi_term).alias("mi_nats"),
        dsum(((nd - exy) * (nd - exy)) / exy).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Welch two-sample t-test per event_type between the reference and current
# time halves — the significance companion to drift_psi's magnitude
# metric. One conditional aggregate; all moments exact BIGINT.
# --------------------------------------------------------------------------


@dq(
    "welch_ttest",
    oracle=f"""
    WITH w AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS r,
             CAST(ROUND(value * 1000.0) AS BIGINT) AS yu
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(SUM(r) AS BIGINT) AS n1,
             CAST(SUM(1 - r) AS BIGINT) AS n2,
             CAST(SUM(r * yu) AS BIGINT) AS sy1,
             CAST(SUM((1 - r) * yu) AS BIGINT) AS sy2,
             CAST(SUM(r * yu * yu) AS BIGINT) AS syy1,
             CAST(SUM((1 - r) * yu * yu) AS BIGINT) AS syy2
      FROM w GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n1, n2,
             CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1000.0 AS m1,
             CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 1000.0 AS m2,
             (CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
                / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) / 1000000.0
               AS v1,
             (CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
                / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) / 1000000.0
               AS v2
      FROM s WHERE n1 > 1 AND n2 > 1
    )
    SELECT event_type, n1 AS n_ref, n2 AS n_cur,
           {OZ6("m1")} AS mean_ref, {OZ6("m2")} AS mean_cur,
           {OZ6("(m1 - m2) / SQRT(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))")} AS t_stat,
           {OZ6("((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))) / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE))")} AS df_welch
    FROM v
    """,
)
def welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test of the value mean per event_type,
    reference half vs current half (the drift_psi split): ONE scan, one
    conditional-moment aggregate per type (n, Σy, Σy² per half as six
    exact BIGINT sums), then the t statistic and Welch–Satterthwaite df
    as identically-shaped double arithmetic. Moments use 1e-3 units so
    Σy² stays exact in BIGINT (~3e11 per row, exact to ~3e7 rows/type —
    bound documented vs the 1e-6 linear-sum convention; Σy·Σy is formed
    in DOUBLE on both sides because its exact form overflows). sqrt is
    correctly-rounded IEEE in both engines."""
    e = table_wide(spark, sf_dir, "events", "user_id")
    r = (F.col("ts") < F.timestamp_micros(F.lit(_PSI_SPLIT_US))).cast("long")
    yu = F.round(F.col("value") * 1000.0).cast("long")
    s = (
        e.select("event_type", r.alias("r"), yu.alias("yu"))
        .groupBy("event_type")
        .agg(
            F.sum("r").alias("n1"),
            F.sum(1 - F.col("r")).alias("n2"),
            F.sum(F.col("r") * F.col("yu")).alias("sy1"),
            F.sum((1 - F.col("r")) * F.col("yu")).alias("sy2"),
            F.sum(F.col("r") * F.col("yu") * F.col("yu")).alias("syy1"),
            F.sum((1 - F.col("r")) * F.col("yu") * F.col("yu")).alias("syy2"),
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("sy1").cast("double") / n1d / 1000.0
    m2 = F.col("sy2").cast("double") / n2d / 1000.0
    v1 = (
        (F.col("syy1").cast("double") - F.col("sy1").cast("double") * F.col("sy1").cast("double") / n1d)
        / (F.col("n1") - 1).cast("double") / 1_000_000.0
    )
    v2 = (
        (F.col("syy2").cast("double") - F.col("sy2").cast("double") * F.col("sy2").cast("double") / n2d)
        / (F.col("n2") - 1).cast("double") / 1_000_000.0
    )
    v = s.filter((F.col("n1") > 1) & (F.col("n2") > 1)).select(
        "event_type",
        F.col("n1").alias("n_ref"),
        F.col("n2").alias("n_cur"),
        m1.alias("m1"),
        m2.alias("m2"),
        v1.alias("v1"),
        v2.alias("v2"),
        n1d.alias("n1d"),
        n2d.alias("n2d"),
        (F.col("n1") - 1).cast("double").alias("df1"),
        (F.col("n2") - 1).cast("double").alias("df2"),
    )
    se1 = F.col("v1") / F.col("n1d")
    se2 = F.col("v2") / F.col("n2d")
    return v.select(
        "event_type",
        "n_ref",
        "n_cur",
        z6(F.col("m1")).alias("mean_ref"),
        z6(F.col("m2")).alias("mean_cur"),
        z6((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        z6(
            ((se1 + se2) * (se1 + se2))
            / (se1 * se1 / F.col("df1") + se2 * se2 / F.col("df2"))
        ).alias("df_welch"),
    )


# --------------------------------------------------------------------------
# lag-1 autocorrelation of the daily event-count series per type — the
# burstiness / seasonality detector over ingestion telemetry. The series
# is the (type, day) count table; everything after the first aggregate is
# days×types-sized.
# --------------------------------------------------------------------------


@dq(
    "autocorr_daily",
    oracle=f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM d GROUP BY 1
    ),
    l AS (
      SELECT event_type, day, c,
             LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS c_prev,
             LAG(day) OVER (PARTITION BY event_type ORDER BY day) AS day_prev
      FROM d
    ),
    t AS (
      SELECT l.event_type, m.n_days, m.mu, l.c, l.c_prev,
             CASE WHEN l.day_prev = l.day - 1 THEN 1 ELSE 0 END AS is_pair
      FROM l JOIN m ON m.event_type = l.event_type
    ),
    s AS (
      SELECT event_type, n_days,
             CAST(SUM(is_pair) AS BIGINT) AS n_pairs,
             {OSUM("CASE WHEN is_pair = 1 THEN (CAST(c AS DOUBLE) - mu) * (CAST(c_prev AS DOUBLE) - mu) ELSE 0.0 END")} AS num,
             {OSUM("(CAST(c AS DOUBLE) - mu) * (CAST(c AS DOUBLE) - mu)")} AS den
      FROM t GROUP BY event_type, n_days
    )
    SELECT event_type, n_days, n_pairs,
           {OZ6("num / den")} AS r1
    FROM s WHERE den > 0
    """,
)
def autocorr_daily(spark, sf_dir):
    """Lag-1 autocorrelation of each type's daily event counts: one
    (type, day) count aggregate off the scan, per-type mean from the
    count table, adjacent days paired with a lag window partitioned by
    type (only true day→day+1 gaps count as pairs), deviation products
    reduced through the fixed-point sum. r1 near 0 = Poisson-ish arrival,
    near 1 = trending/bursty. Every relation after the first aggregate
    is (types × days)-sized."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ)) DIV 86400000000")
    d = (
        e.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = d.groupBy("event_type").agg(
        (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = d.select(
        "event_type",
        "day",
        "c",
        F.lag("c").over(w).alias("c_prev"),
        F.lag("day").over(w).alias("day_prev"),
    )
    t = lagd.join(F.broadcast(m), "event_type").select(
        "event_type",
        "n_days",
        "mu",
        "c",
        "c_prev",
        F.when(F.col("day_prev") == F.col("day") - 1, 1).otherwise(0).alias("is_pair"),
    )
    cd = F.col("c").cast("double") - F.col("mu")
    cp = F.col("c_prev").cast("double") - F.col("mu")
    s = t.groupBy("event_type", "n_days").agg(
        F.sum("is_pair").alias("n_pairs"),
        dsum(F.when(F.col("is_pair") == 1, cd * cp).otherwise(F.lit(0.0))).alias("num"),
        dsum(cd * cd).alias("den"),
    )
    return s.filter(F.col("den") > 0).select(
        "event_type",
        "n_days",
        "n_pairs",
        z6(F.col("num") / F.col("den")).alias("r1"),
    )


# --------------------------------------------------------------------------
# hour-of-day seasonal profile per event_type: cell means + deviation
# from the type's overall mean — the seasonality decomposition a
# telemetry dashboard draws. Hour derives from epoch arithmetic (TZ-free
# on both engines).
# --------------------------------------------------------------------------


@dq(
    "seasonal_profile",
    oracle="""
    WITH c AS (
      SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
               AS su
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, hod, n, su,
             CAST(SUM(su) OVER (PARTITION BY event_type) AS BIGINT) AS su_t,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_t
      FROM c
    )
    SELECT event_type, hod, n,
           (CAST(ROUND(CAST(su AS DOUBLE) / CAST(n AS DOUBLE)) AS DOUBLE)
              / 1000000.0) AS hod_mean,
           (ROUND((CAST(ROUND(CAST(su AS DOUBLE) / CAST(n AS DOUBLE)) AS DOUBLE)
              - CAST(ROUND(CAST(su_t AS DOUBLE) / CAST(n_t AS DOUBLE)) AS DOUBLE))
              / 1000000.0, 6) + 0.0) AS dev_from_mean
    FROM t
    """,
)
def seasonal_profile(spark, sf_dir):
    """Per-(type, hour-of-day) mean value and its deviation from the
    type's overall mean: one conditional-moment aggregate to the ≤
    types×24 cell table (exact 1e-6-unit sums), type totals via window
    sums over the cells (same integers the cells carry — no second
    scan), means rounded in integer units (the davg convention) so both
    engines divide identical integers. Hour-of-day is pure epoch
    arithmetic — no calendar/timezone dependence."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    hod = F.expr("(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) DIV 3600000000) % 24")
    c = (
        e.select(
            "event_type",
            hod.alias("hod"),
            F.round(F.col("value") * 1_000_000.0).cast("long").alias("vu"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vu").alias("su"))
    )
    w = Window.partitionBy("event_type")
    t = c.select(
        "event_type",
        "hod",
        "n",
        "su",
        F.sum("su").over(w).alias("su_t"),
        F.sum("n").over(w).alias("n_t"),
    )
    hod_mean_u = F.round(F.col("su").cast("double") / F.col("n").cast("double"))
    type_mean_u = F.round(F.col("su_t").cast("double") / F.col("n_t").cast("double"))
    return t.select(
        "event_type",
        "hod",
        "n",
        (hod_mean_u / 1_000_000.0).alias("hod_mean"),
        z6((hod_mean_u - type_mean_u) / 1_000_000.0).alias("dev_from_mean"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival (churn) curves per signup-week cohort: the
# censoring-aware retention statistic (retention_cohort counts raw
# activity; KM corrects for users whose observation window simply ended).
# Everything is exact integer counting until ln(); the cumulative product
# Π(1 - d/n) runs as an exact fixed-point cumulative SUM of rounded ln
# terms inside a per-cohort window (a raw double running product/sum
# would be engine-order-dependent), then one exp() at the end.
# --------------------------------------------------------------------------


@dq(
    "survival_km",
    oracle="""
    WITH u AS (
      SELECT user_id, event_type, MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY user_id, event_type
    ),
    h AS (SELECT MAX(ts) AS max_ts FROM events),
    f AS (
      SELECT user_id,
             DATEDIFF('day', DATE '1970-01-01', CAST(first_ts AS DATE)) // 7
               AS cohort_week,
             DATEDIFF('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
               AS duration_days,
             CASE WHEN last_ts < max_ts - INTERVAL 7 DAY THEN 1 ELSE 0 END
               AS churned
      FROM u, h
    ),
    g AS (
      SELECT cohort_week, duration_days,
             CAST(SUM(churned) AS BIGINT) AS d_events,
             CAST(SUM(1 - churned) AS BIGINT) AS c_censored
      FROM f GROUP BY 1, 2
    ),
    t AS (SELECT cohort_week,
                 CAST(SUM(d_events + c_censored) AS BIGINT) AS n_cohort
          FROM g GROUP BY 1),
    r AS (
      SELECT g.cohort_week, g.duration_days, g.d_events, g.c_censored,
             CAST(t.n_cohort - COALESCE(SUM(g.d_events + g.c_censored) OVER (
               PARTITION BY g.cohort_week ORDER BY g.duration_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
      FROM g JOIN t USING (cohort_week)
    ),
    s AS (
      SELECT cohort_week, duration_days, d_events, c_censored, n_at_risk,
             SUM(CASE WHEN d_events > 0
                      THEN CAST(ROUND(LN(1.0 - CAST(d_events AS DOUBLE)
                             / CAST(n_at_risk AS DOUBLE)) * 1000000.0)
                           AS BIGINT)
                      ELSE 0 END) OVER (
               PARTITION BY cohort_week ORDER BY duration_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ln_units
      FROM r WHERE n_at_risk > d_events
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week, duration_days,
           d_events, c_censored, n_at_risk,
           (ROUND(EXP(CAST(ln_units AS DOUBLE) / 1000000.0), 6) + 0.0)
             AS survival
    FROM s
    """,
)
def survival_km(spark, sf_dir):
    """Per-(user, event_type) subject lifespan (first → last event of
    that type, censored when the last activity falls inside the final
    7 days of the observation horizon), grouped to a duration-grain
    life table per signup-week cohort, then the KM product-limit
    estimator. Shapes: one subject-keyed aggregate off the scan;
    everything after is life-table-sized
    (cohorts × distinct durations). Both windows partition by cohort.
    Cohort weeks use an epoch-day integer DIV (identical both engines;
    format-token week numbering is not cross-engine-stable)."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    u = e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    h = e.agg(F.max("ts").alias("max_ts"))
    f = u.crossJoin(F.broadcast(h)).select(
        F.expr(
            "DATEDIFF(CAST(first_ts AS DATE), DATE '1970-01-01') DIV 7"
        ).alias("cohort_week"),
        F.datediff(
            F.col("last_ts").cast("date"), F.col("first_ts").cast("date")
        ).alias("duration_days"),
        (F.col("last_ts") < F.col("max_ts") - F.expr("INTERVAL 7 DAY"))
        .cast("long")
        .alias("churned"),
    )
    g = f.groupBy("cohort_week", "duration_days").agg(
        F.sum("churned").alias("d_events"),
        F.sum(1 - F.col("churned")).alias("c_censored"),
    )
    t = g.groupBy("cohort_week").agg(
        F.sum(F.col("d_events") + F.col("c_censored")).alias("n_cohort")
    )
    w_prev = (
        Window.partitionBy("cohort_week")
        .orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.join(t, "cohort_week").select(
        "cohort_week",
        "duration_days",
        "d_events",
        "c_censored",
        (
            F.col("n_cohort")
            - F.coalesce(
                F.sum(F.col("d_events") + F.col("c_censored")).over(w_prev),
                F.lit(0),
            )
        ).alias("n_at_risk"),
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    term = F.when(
        F.col("d_events") > 0,
        F.round(
            F.log(
                1.0
                - F.col("d_events").cast("double") / F.col("n_at_risk").cast("double")
            )
            * 1_000_000.0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    s = r.filter(F.col("n_at_risk") > F.col("d_events")).select(
        "cohort_week",
        "duration_days",
        "d_events",
        "c_censored",
        "n_at_risk",
        F.sum(term).over(w_cum).alias("ln_units"),
    )
    return s.select(
        F.col("cohort_week").cast("bigint").alias("cohort_week"),
        "duration_days",
        "d_events",
        "c_censored",
        "n_at_risk",
        z6(F.exp(F.col("ln_units").cast("double") / 1_000_000.0)).alias("survival"),
    )


# --------------------------------------------------------------------------
# Lorenz/Gini concentration of the value mass per event_type — the
# inequality statistic curation pipelines use for "how concentrated is
# the corpus across domains / the spend across users". Exact rank-sum
# formulation: G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over values ranked
# ascending with a unique tie-break. Both Σ run in 1e-6 fixed point
# (rank·value stays within BIGINT-unit headroom to ~2e7 rows/group at
# this value range — docs/SCALE.md).
# --------------------------------------------------------------------------


@dq(
    "lorenz_gini",
    oracle=f"""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nt
      FROM events
    ),
    a AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             {OSUM("value")} AS su,
             {OSUM("(CAST(rn AS DOUBLE) / CAST(nt AS DOUBLE)) * value")} AS swr
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           {OZ6("2.0 * swr / su - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)")}
             AS gini
    FROM a
    """,
)
def lorenz_gini(spark, sf_dir):
    """Gini coefficient of value concentration per event_type via the
    exact rank-sum identity, with the rank folded in NORMALIZED
    (rn/n ≤ 1) before the fixed-point rounding: G = 2·Σ((rn/n)·x)/Σx −
    (n+1)/n. Folding the raw rank into the 1e-6-unit sum instead caps
    the group at ~2.3e5 rows at this value range (rank·value·1e6
    exceeds BIGINT — just inside at sf1, overflow under ANSI at sf2);
    normalized terms are value-bounded, good to ~1e10 rows/group
    (pinned by the 1M-row single-group cliff test). The rank window
    partitions by event_type (group-sized partitions; at extreme group
    cardinality switch to the two-phase distributed ranking in
    operators/ranking.py)."""
    from pyspark.sql import Window

    e = table_wide(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nt"),
    )
    a = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("su"),
        dsum(
            (F.col("rn").cast("double") / F.col("nt").cast("double"))
            * F.col("value")
        ).alias("swr"),
    )
    nd = F.col("n").cast("double")
    return a.select(
        "event_type",
        "n",
        z6(
            2.0 * F.col("swr") / F.col("su")
            - (F.col("n") + 1).cast("double") / nd
        ).alias("gini"),
    )
