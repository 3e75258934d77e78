"""Seeded-random differential tests for the ML-ops batch: each query's
output is recomputed by an independent pure-Python replica (including
the exact fixed-point steps), so the formulas are pinned on randomized
inputs, not just the hand-computed cases in test_mlops.py.

Values are generated 2-decimal (the events fixture convention) and
timestamps integer-second so every replica step is exact."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

import vcf2db_spark.queries.mlops as qm
from vcf2db_spark.queries import QUERIES

def _r(x: float) -> int:
    """HALF-UP (ties away from zero) — the engines' ROUND; Python's
    built-in round is banker's and diverges on exact .5 ties."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

SEEDS = [1, 2, 3]


def _run(name, spark, tables):
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


def _events_frame(spark, rows):
    """rows: (event_id, user_id, sec, event_type, value)."""
    return spark.createDataFrame(
        rows,
        "event_id: bigint, user_id: bigint, sec: bigint,"
        " event_type: string, value: double",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("timestamp_micros(sec * 1000000)")
        .cast("timestamp_ntz")
        .alias("ts"),
    )


def _rand_events(seed, n_types=3, n_users=5, n_rows=60):
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        rows.append(
            (
                i,
                rng.randint(1, n_users),
                rng.randint(0, 10_000),
                f"T{rng.randint(1, n_types)}",
                round(rng.uniform(0.01, 120.0), 2),
            )
        )
    return rows


def test_winsorize_matches_python_replica(spark):
    for seed in SEEDS:
        rows = _rand_events(seed)
        got = {
            r.event_type: r
            for r in _run(
                "winsorize", spark, {"events": _events_frame(spark, rows)}
            )
        }
        by_type: dict[str, list[float]] = {}
        for _, _, _, t, v in rows:
            by_type.setdefault(t, []).append(v)
        for t, vals in by_type.items():
            # distinct-value histogram cumsum, fences at ceil(q*n)
            hist = sorted(
                (v, sum(1 for x in vals if x == v)) for v in set(vals)
            )
            n = len(vals)
            cum = 0
            lo = hi = None
            for v, c in hist:
                cum += c
                if lo is None and cum >= math.ceil(0.05 * n):
                    lo = v
                if hi is None and cum >= math.ceil(0.95 * n):
                    hi = v
            units = sum(
                _r(min(max(v, lo), hi) * 1e6) * c for v, c in hist
            )
            wmean = _r(units / n) / 1e6
            r = got[t]
            assert (r.n, r.lo, r.hi) == (n, lo, hi), (seed, t)
            assert r.wmean == wmean, (seed, t)


def test_twa_matches_python_replica(spark):
    for seed in SEEDS:
        rows = _rand_events(seed, n_users=4, n_rows=40)
        got = {
            r.user_id: r
            for r in _run(
                "twa_value", spark, {"events": _events_frame(spark, rows)}
            )
        }
        by_user: dict[int, list[tuple[int, int, float]]] = {}
        for eid, u, sec, _, v in rows:
            by_user.setdefault(u, []).append((sec * 1_000_000, eid, v))
        for u, evs in by_user.items():
            evs.sort()  # (uts, event_id) — the query's tie-break
            num = den = 0
            cnt = 0
            for (uts, _, v), (nxt, _, _) in zip(evs, evs[1:]):
                dt = (nxt - uts) // 1_000_000
                num += _r(v * 100) * dt
                den += dt
                cnt += 1
            if den > 0:
                r = got[u]
                assert (r.n_events, r.span_s) == (cnt, den), (seed, u)
                assert r.twa == round(num / (100.0 * den), 6) + 0.0, (seed, u)
            else:
                assert u not in got


def test_whale_share_matches_python_replica(spark):
    for seed in SEEDS:
        rows = _rand_events(seed)
        got = {
            r.event_type: r
            for r in _run(
                "whale_share", spark, {"events": _events_frame(spark, rows)}
            )
        }
        agg: dict[str, dict[int, int]] = {}
        for _, u, _, t, v in rows:
            agg.setdefault(t, {}).setdefault(u, 0)
            agg[t][u] += _r(v * 100)
        for t, per_user in agg.items():
            order = sorted(per_user.items(), key=lambda kv: (-kv[1], kv[0]))
            tot = sum(c for _, c in order)
            cum = 0
            whales = 0
            for _, c in order:
                if cum < 0.5 * tot:
                    whales += 1
                cum += c
            r = got[t]
            assert r.n_users == len(order) and r.n_whales == whales, (seed, t)
            assert r.top1_share == round(order[0][1] / tot, 6) + 0.0
            assert r.total_value == tot / 100.0


def test_quantile_normalize_matches_python_replica(spark):
    for seed in SEEDS:
        rng = random.Random(seed + 77)
        vecs = [
            (i, i % 3, [round(rng.uniform(-2, 2), 3) for _ in range(8)])
            for i in range(30)
        ]
        embs = spark.createDataFrame(
            vecs, "vec_id: bigint, label: int, embedding: array<float>"
        )
        got = {
            r.vec_id: r.mean_qn
            for r in _run("quantile_normalize", spark, {"embeddings": embs})
        }
        dims = len(vecs[0][2])
        n = len(vecs)
        qn: dict[int, list[float]] = {v[0]: [] for v in vecs}
        for pos in range(dims):
            # replicate the float32 storage: rank on the float32 value
            import struct as _s

            f32 = lambda x: _s.unpack("f", _s.pack("f", x))[0]
            order = sorted(
                ((f32(v[2][pos]), v[0]) for v in vecs)
            )
            for rank0, (_, vid) in enumerate(order):
                qn[vid].append(rank0 / (n - 1))
        for vid, qs in qn.items():
            units = sum(_r(q * 1e6) for q in qs)
            assert got[vid] == _r(units / len(qs)) / 1e6, (seed, vid)


def test_bootstrap_ci_matches_python_replica(spark):
    """Replicate the Poisson-bootstrap end to end: Knuth hash ->
    uniform -> Poisson counts -> replicate means -> order-stat CI."""
    K, MOD, B = 2654435761, 4294967296, 40
    CDF = [0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
           0.9963401532]

    def knuth(x):
        e = x % MOD
        return ((e // 65536) * K % MOD * 65536 + (e % 65536) * K) % MOD

    def pois(u):
        for k, t in enumerate(CDF):
            if u < t:
                return k
        return 5

    for seed in SEEDS:
        rows = _rand_events(seed, n_types=2, n_users=3, n_rows=50)
        got = {
            r.event_type: r
            for r in _run(
                "bootstrap_ci", spark, {"events": _events_frame(spark, rows)}
            )
        }
        by_type: dict[str, list[tuple[int, float]]] = {}
        for eid, _, _, t, v in rows:
            by_type.setdefault(t, []).append((eid, v))
        for t, evs in by_type.items():
            means = []
            for rep in range(B):
                su = sc = 0
                for eid, v in evs:
                    c = pois(knuth(eid * B * 2 + rep) / MOD)
                    su += _r(v * 1e6) * c
                    sc += c
                if sc > 0:
                    means.append((su / sc / 1e6, rep))
            means.sort()
            nb = len(means)
            lo = means[math.ceil(0.025 * nb) - 1][0]
            hi = means[math.ceil(0.975 * nb) - 1][0]
            r = got[t]
            assert r.n_rows == len(evs)
            assert r.ci_lo == round(lo, 6) + 0.0, (seed, t)
            assert r.ci_hi == round(hi, 6) + 0.0, (seed, t)
            assert r.ci_lo <= r.mean_value <= r.ci_hi  # sanity
