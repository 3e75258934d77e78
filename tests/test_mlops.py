"""Hand-computed semantics for the ML-ops batch (queries/mlops.py):
rank_fusion (RRF formula on known ranks), churn_label (horizon
boundary), null_impute (per-type valid-mean fill), pmi_pairs (PMI of
hand-counted co-occurrences), hard_negatives (label exclusion +
ordering), quantile_normalize (normalized ranks incl. ties),
purge_audit (purge/keep partition of hand-built orders), winsorize
(order-statistic fences + clamped mean), log_odds_tokens (two-source
separation), embed_outliers (fixed-point z-score replica), twa_value
(forward-interval weighting), whale_share (minimal 50% prefix),
rfm_segments (aligned quintiles), session_paths (gap splitting +
path ordering). These pin the FORMULAS independently
of the DuckDB oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import vcf2db_spark.queries.mlops as qm
from vcf2db_spark.queries import QUERIES

_DAY_US = 86_400_000_000


def _events(spark, rows):
    """rows: (event_id, user_id, day, event_type, value)."""
    return spark.createDataFrame(
        rows,
        "event_id: bigint, user_id: bigint, day: bigint,"
        " event_type: string, value: double",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr(f"timestamp_micros(day * {_DAY_US})")
        .cast("timestamp_ntz")
        .alias("ts"),
    )


def _docs(spark, rows):
    """rows: (doc_id, text)."""
    return spark.createDataFrame(rows, "doc_id: bigint, text: string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _embs(spark, rows):
    """rows: (vec_id, label, embedding list[float])."""
    return spark.createDataFrame(
        rows, "vec_id: bigint, label: int, embedding: array<float>"
    )


def _run(name, spark, tables):
    """Run a declared query with table/table_wide dispatched to the
    constructed frames by table name."""
    orig_w, orig_t = qm.table_wide, qm.table

    def lookup(spark_, sf_dir_, tname, *a, **k):
        return tables[tname]

    try:
        qm.table_wide = lookup
        qm.table = lookup
        return QUERIES[name](spark, "unused").collect()
    finally:
        qm.table_wide = orig_w
        qm.table = orig_t


# ---------------------------------------------------------------- winsorize


def test_winsorize_order_stat_fences_and_clamped_mean(spark):
    # one type, values 1..20 once each: tot=20, ceil(.05*20)=1 -> lo=1,
    # ceil(.95*20)=19 -> hi=19; clamped mean = (sum(1..19) + 19)/20
    rows = [(i, 1, 0, "T", float(i)) for i in range(1, 21)]
    out = _run("winsorize", spark, {"events": _events(spark, rows)})
    assert len(out) == 1
    r = out[0]
    assert r.n == 20 and r.lo == 1.0 and r.hi == 19.0
    assert r.wmean == (sum(range(1, 20)) + 19) / 20.0  # 10.45


# --------------------------------------------------------------- churn_label


def test_churn_label_horizon_boundary(spark):
    # gmax = day 20. u1 last day 0 (churned), u2 last day 20 (active),
    # u3 last day 13 (exactly gmax - 7: NOT strictly before -> active)
    rows = [
        (1, 1, 0, "T", 10.0),
        (2, 2, 0, "T", 1.0),
        (3, 2, 20, "T", 3.0),
        (4, 3, 13, "T", 5.0),
    ]
    out = {r.user_id: r for r in _run("churn_label", spark, {"events": _events(spark, rows)})}
    assert out[1].churned == 1 and out[2].churned == 0
    assert out[3].churned == 0  # boundary is strict <
    assert out[2].n_events == 2 and out[2].avg_value == 2.0
    assert out[1].last_seen == "1970-01-01 00:00:00"


# --------------------------------------------------------------- null_impute


def test_null_impute_fills_invalid_with_valid_type_mean(spark):
    rows = [
        (1, 1, 0, "A", 100.0),
        (2, 1, 0, "A", 200.0),
        (3, 1, 0, "A", 400.0),  # invalid -> imputed with (100+200)/2
        (4, 1, 0, "B", 50.0),
    ]
    out = {r.event_id: r for r in _run("null_impute", spark, {"events": _events(spark, rows)})}
    assert out[3].value_filled == 150.0 and out[3].was_imputed == 1
    assert out[1].value_filled == 100.0 and out[1].was_imputed == 0
    assert out[4].value_filled == 50.0


# ---------------------------------------------------------------- pmi_pairs


def test_pmi_pairs_hand_counted(spark):
    docs = _docs(
        spark, [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b c")]
    )
    out = {(r.ta, r.tb): r for r in _run("pmi_pairs", spark, {"documents": docs})}
    # df: a=3, b=3, c=2; co-occurrence: (a,b)=2, (a,c)=1, (b,c)=1; N=4
    assert out[("a", "b")].n_ab == 2
    assert out[("a", "b")].n_a == 3 and out[("a", "b")].n_b == 3
    assert out[("a", "b")].pmi == round(math.log(2 * 4 / (3 * 3)), 6)
    assert out[("a", "c")].pmi == round(math.log(1 * 4 / (3 * 2)), 6)
    assert len(out) == 3


# ------------------------------------------------------------ hard_negatives


def test_hard_negatives_excludes_anchor_label_and_orders(spark):
    embs = _embs(
        spark,
        [
            (0, 0, [1.0, 0.0]),  # anchor
            (10, 1, [1.0, 0.0]),  # cos 1
            (11, 1, [0.0, 1.0]),  # cos 0
            (12, 0, [1.0, 0.0]),  # same label -> excluded
            (13, 2, [-1.0, 0.0]),  # cos -1
        ],
    )
    out = _run("hard_negatives", spark, {"embeddings": embs})
    mine = sorted((r for r in out if r.anchor_id == 0), key=lambda r: r.rk)
    assert [r.vec_id for r in mine] == [10, 11, 13]
    assert [r.cosine for r in mine] == [1.0, 0.0, -1.0]
    assert all(r.vec_id != 12 for r in out)


# -------------------------------------------------------- quantile_normalize


def test_quantile_normalize_normalized_ranks(spark):
    embs = _embs(
        spark,
        [
            (0, 0, [0.0, 10.0]),
            (1, 0, [5.0, 5.0]),
            (2, 0, [10.0, 0.0]),
            (3, 0, [20.0, 20.0]),
        ],
    )
    out = {r.vec_id: r.mean_qn for r in _run("quantile_normalize", spark, {"embeddings": embs})}
    # pos0 ranks: 0,5,10,20 -> qn 0,1/3,2/3,1; pos1: 0(v2),5(v1),10(v0),20(v3)
    # v1 = (1/3 + 1/3)/2: units 333333+333333 -> 666666/2 -> 0.333333
    # v0 = (0 + 2/3)/2:   units 0+666667     -> 333333.5 rounds HALF-UP
    #      (davg rounds in integer units at the END) -> 0.333334
    assert out[3] == 1.0
    assert out[1] == 0.333333
    assert out[0] == 0.333334 and out[2] == 0.333334


# ---------------------------------------------------------------- purge_audit


def test_purge_audit_partitions_by_deletion_list(spark):
    cust = spark.createDataFrame(
        [(1, -5.0), (2, 10.0), (3, 7.0)],
        "c_custkey: bigint, c_acctbal: double",
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "1-URGENT", 50.0),
            (101, 2, "1-URGENT", 30.0),
            (102, 1, "2-HIGH", 20.0),
            (103, 3, "2-HIGH", 40.0),
        ],
        "o_orderkey: bigint, o_custkey: bigint, o_orderpriority: string,"
        " o_totalprice: double",
    )
    out = {
        r.o_orderpriority: r
        for r in _run("purge_audit", spark, {"customer": cust, "orders": orders})
    }
    u = out["1-URGENT"]
    assert u.n_total == 2 and u.n_purged == 1 and u.n_kept == 1
    assert u.kept_value == 30.0
    h = out["2-HIGH"]
    assert h.n_purged == 1 and h.kept_value == 40.0


# ---------------------------------------------------------------- rank_fusion


def test_rank_fusion_rrf_formula(spark):
    docs = _docs(
        spark,
        [(1, "join window scan join"), (2, "join"), (3, "window")],
    )
    embs = _embs(
        spark,
        [
            (0, 0, [1.0, 0.0]),  # query
            (1, 0, [2.0, 0.0]),  # cos 1 -> sem rank 1
            (2, 0, [0.0, 1.0]),  # cos 0 -> sem rank 2
            (3, 0, [-1.0, 0.0]),  # cos -1 -> sem rank 3
        ],
    )
    out = _run(
        "rank_fusion", spark, {"documents": docs, "embeddings": embs}
    )
    rows = {r.doc_id: r for r in out}
    # lexical: d1 has the highest tf-idf (every term incl. the rare
    # 'scan'), d2/d3 tie broken by doc_id -> ranks 1,2,3; semantic
    # ranks are 1,2,3 by construction -> both legs agree per id
    assert (rows[1].lex_rank, rows[1].sem_rank) == (1, 1)
    assert (rows[2].lex_rank, rows[2].sem_rank) == (2, 2)
    assert (rows[3].lex_rank, rows[3].sem_rank) == (3, 3)
    assert rows[1].rrf == round(2 / 61.0, 6)
    assert rows[2].rrf == round(2 / 62.0, 6)
    assert rows[3].rrf == round(2 / 63.0, 6)
    # output ordered by rrf desc
    assert [r.doc_id for r in out] == [1, 2, 3]


# ------------------------------------------------------------ log_odds_tokens


def test_log_odds_tokens_two_source_separation(spark):
    rows = [(i, "x", "A") for i in range(20)] + [
        (100 + i, "y", "B") for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: bigint, text: string, source: string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"), "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    out = {(r.source, r.tok): r for r in _run("log_odds_tokens", spark, {"documents": docs})}
    # c(A,x)=20, c_w(x)=20, tot_A=20, T=40:
    # lo = ln(20.5/0.5) - ln(0.5/20.5) = 2 ln 41
    assert out[("A", "x")].log_odds == round(2 * math.log(41), 6)
    assert out[("B", "y")].log_odds == round(2 * math.log(41), 6)
    # only observed (source, token) pairs rank — the foreign token has
    # no count row, so each source surfaces exactly its own token
    assert set(out) == {("A", "x"), ("B", "y")}
    assert out[("A", "x")].n == 20


# ------------------------------------------------------------- embed_outliers


def test_embed_outliers_flags_far_vector(spark):
    vecs = [(i, 0, [0.0, 0.0]) for i in range(10)] + [(10, 0, [10.0, 10.0])]
    out = _run("embed_outliers", spark, {"embeddings": _embs(spark, vecs)})
    assert [r.vec_id for r in out] == [10]
    r = out[0]
    # replicate the fixed-point pipeline exactly
    c = round((10 / 11) * 1e6) / 1e6  # davg centroid per pos
    d2_n = 2 * round(c * c * 1e6) / 1e6
    d2_o = 2 * round((10 - c) ** 2 * 1e6) / 1e6
    assert r.d2 == round(d2_o, 6)
    s1 = 10 * round(d2_n * 1e6) + round(d2_o * 1e6)
    s2 = 10 * round(d2_n * d2_n * 1e6) + round(d2_o * d2_o * 1e6)
    s1, s2, n = s1 / 1e6, s2 / 1e6, 11.0
    z = (d2_o - s1 / n) / math.sqrt(s2 / n - (s1 / n) ** 2)
    assert r.z == round(z, 6) + 0.0 and r.z > 2.0


# ----------------------------------------------------------------- twa_value


def test_twa_value_forward_interval_weighting(spark):
    # v=10 holds 10 s, v=20 holds 20 s, final reading weightless
    rows = [(1, 1, 0, "T", 10.0), (2, 1, 0, "T", 20.0), (3, 1, 0, "T", 99.0)]
    e = spark.createDataFrame(
        [(1, 1, 0, "T", 10.0), (2, 1, 10, "T", 20.0), (3, 1, 30, "T", 99.0)],
        "event_id: bigint, user_id: bigint, sec: bigint,"
        " event_type: string, value: double",
    ).select(
        "event_id", "user_id", "event_type", "value",
        F.expr("timestamp_micros(sec * 1000000)")
        .cast("timestamp_ntz").alias("ts"),
    )
    out = _run("twa_value", spark, {"events": e})
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 2 and r.span_s == 30
    assert r.twa == round((10 * 10 + 20 * 20) / 30.0, 6)


# --------------------------------------------------------------- whale_share


def test_whale_share_minimal_prefix(spark):
    # contributions 50/30/20: only the top user is needed to reach 50%
    rows = [(1, 1, 0, "T", 50.0), (2, 2, 0, "T", 30.0), (3, 3, 0, "T", 20.0)]
    out = _run("whale_share", spark, {"events": _events(spark, rows)})
    assert len(out) == 1
    r = out[0]
    assert r.n_users == 3 and r.n_whales == 1
    assert r.top1_share == 0.5 and r.total_value == 100.0


# -------------------------------------------------------------- rfm_segments


def test_rfm_segments_aligned_quintiles(spark):
    # user i: i events, last day i, total value 10*i -> every metric
    # orders users identically -> five diagonal segments of one user
    rows = []
    eid = 0
    for u in range(1, 6):
        for j in range(u):
            eid += 1
            rows.append((eid, u, u if j == u - 1 else 0, "T", 10.0 * u / u))
    # make monetary distinct per user: value 10*u on the last event only
    rows = [
        (i + 1, u, d, t, (10.0 * u if i + 1 == sum(range(1, u + 1)) else 1.0))
        for i, (_, u, d, t, _v) in enumerate(rows)
    ]
    out = _run("rfm_segments", spark, {"events": _events(spark, rows)})
    assert sum(r.n_users for r in out) == 5
    diag = {r for r in out if r.r_q == r.f_q == r.m_q}
    assert len(diag) == 5  # all five users land on the diagonal


# -------------------------------------------------------------- session_paths


def test_session_paths_gap_splitting_and_ordering(spark):
    # user 1: view,click 5 min apart (one session), then purchase 2 h
    # later (new session); user 2: one view session
    e = spark.createDataFrame(
        [
            (1, 1, 0, "view"),
            (2, 1, 300, "click"),
            (3, 1, 8000, "purchase"),
            (4, 2, 0, "view"),
        ],
        "event_id: bigint, user_id: bigint, sec: bigint, event_type: string",
    ).select(
        "event_id", "user_id", "event_type", F.lit(1.0).alias("value"),
        F.expr("timestamp_micros(sec * 1000000)")
        .cast("timestamp_ntz").alias("ts"),
    )
    out = {r.path: r for r in _run("session_paths", spark, {"events": e})}
    assert out["view>click"].n_sessions == 1
    assert out["view>click"].total_events == 2
    assert out["purchase"].n_sessions == 1
    assert out["view"].n_sessions == 1
    assert set(out) == {"view>click", "purchase", "view"}


# -------------------------------------------------------------- ngram_novelty


def test_ngram_novelty_split_and_unseen_counting(spark):
    # find ids on each side of the 80/20 Knuth split
    K, MOD = 2654435761, 4294967296

    def knuth(x):
        e = x % MOD
        return ((e // 65536) * K % MOD * 65536 + (e % 65536) * K) % MOD

    train_ids = [i for i in range(1, 200) if knuth(i) % 100 < 80]
    test_ids = [i for i in range(1, 200) if knuth(i) % 100 >= 80]
    tr, te1, te2 = train_ids[0], test_ids[0], test_ids[1]
    docs = _docs(
        spark,
        [
            (tr, "a b c d"),          # train trigrams: 'a b c', 'b c d'
            (te1, "a b c x"),         # 'a b c' seen, 'b c x' novel
            (te2, "p q r s"),         # all novel
        ],
    )
    out = {r.doc_id: r for r in _run("ngram_novelty", spark, {"documents": docs})}
    assert set(out) == {te1, te2}
    assert (out[te1].n_tri, out[te1].n_unseen) == (2, 1)
    assert out[te1].novelty == 0.5
    assert (out[te2].n_tri, out[te2].n_unseen) == (2, 2)
    assert out[te2].novelty == 1.0


# ---------------------------------------------------------- calibration_bins


def test_calibration_bins_outcome_and_score(spark):
    # one user, two events 30 min apart: y = [1, 0]; values 10 and 20
    e = spark.createDataFrame(
        [(1, 1, 0, 10.0), (2, 1, 1800, 20.0)],
        "event_id: bigint, user_id: bigint, sec: bigint, value: double",
    ).select(
        "event_id", "user_id", F.lit("T").alias("event_type"), "value",
        F.expr("timestamp_micros(sec * 1000000)")
        .cast("timestamp_ntz").alias("ts"),
    )
    out = _run("calibration_bins", spark, {"events": e})
    # mu = 15 (davg exact), s2 = 500, var = 500/2 - 225 = 25, std = 5
    # z = -1 and +1 -> p = 1/(1+e^1), 1/(1+e^-1) ~ .2689, .7311
    import math as _m

    p_lo = 1 / (1 + _m.exp(1.0))
    p_hi = 1 / (1 + _m.exp(-1.0))
    rows = {r.bin: r for r in out}
    assert set(rows) == {int(p_lo * 10), int(p_hi * 10)}
    lo, hi = rows[int(p_lo * 10)], rows[int(p_hi * 10)]
    # the early event (value 10, z=-1) has a successor within the hour
    assert lo.obs_rate == 1.0 and hi.obs_rate == 0.0
    assert lo.avg_score == round(round(p_lo * 1e6) / 1e6, 6)
    assert hi.avg_score == round(round(p_hi * 1e6) / 1e6, 6)


# ---------------------------------------------------------------- embed_drift


def test_embed_drift_centroid_shift(spark):
    # find ids on each side of the Knuth %2 split, then plant a known
    # centroid gap: half-0 vectors at [0,0], half-1 at [3,4] -> L2 = 5
    K, MOD = 2654435761, 4294967296

    def knuth(x):
        e = x % MOD
        return ((e // 65536) * K % MOD * 65536 + (e % 65536) * K) % MOD

    zeros = [i for i in range(1, 100) if knuth(i) % 2 == 0][:2]
    ones = [i for i in range(1, 100) if knuth(i) % 2 == 1][:2]
    vecs = [(i, 0, [0.0, 0.0]) for i in zeros] + [
        (i, 0, [3.0, 4.0]) for i in ones
    ]
    out = _run("embed_drift", spark, {"embeddings": _embs(spark, vecs)})
    assert len(out) == 1
    r = out[0]
    assert (r.label, r.n_a, r.n_b) == (0, 2, 2)
    assert r.l2_shift == 5.0
