"""Hand-computed semantics for the round-5 classifier/curation additions:
contain_shingle (asymmetric containment: subset doc scores 1.0 toward its
superset, 0.5 back), nb_classify (multinomial NB with add-one smoothing
against a pure-Python twin), kfold_stratified (deterministic Knuth-hash
folds, exact balance identity). These pin the FORMULAS independently of
the DuckDB oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import vcf2db_spark.queries.pipeline_ext as qp
import vcf2db_spark.queries.training as qt
from vcf2db_spark.queries import QUERIES

_K = 2654435761
_MOD = 4294967296


def _docs(spark, rows):
    """rows: (doc_id, lang, text) → documents-shaped frame."""
    return spark.createDataFrame(
        rows, "doc_id: bigint, lang: string, text: string"
    ).select(
        "doc_id",
        "text",
        "lang",
        F.lit("web").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _run(module, attr, df, name, spark):
    orig = getattr(module, attr)
    try:
        setattr(module, attr, lambda *a, **k: df)
        return QUERIES[name](spark, "unused").collect()
    finally:
        setattr(module, attr, orig)


def test_containment_asymmetry(spark):
    # A = "a b c d" → distinct 3-shingles {"a b c", "b c d"} (2)
    # B = "a b c d e f" → {"a b c", "b c d", "c d e", "d e f"} (4)
    # C(A,B) = 2/2 = 1.0 (emitted), C(B,A) = 2/4 = 0.5 (below 0.8).
    # Z shares nothing.
    rows = [(1, "en", "a b c d"), (2, "en", "a b c d e f"), (3, "en", "x y z w")]
    out = _run(qp, "table", _docs(spark, rows), "contain_shingle", spark)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
    assert got == {(1, 2): 1.0}


def test_containment_short_doc_partial_shingle(spark):
    # docs shorter than the shingle width collapse to one whole-doc
    # shingle; identical short docs are mutual containment 1.0.
    rows = [(1, "en", "a b"), (2, "en", "a b")]
    out = _run(qp, "table", _docs(spark, rows), "contain_shingle", spark)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def _nb_twin(train, test_doc_tokens, labels):
    """Pure-Python multinomial NB twin with the registry's fixed-point
    token-sum convention. train: {(lang, token): count}; returns
    {lang: score} for the given test doc token list."""
    tot = {}
    for (lang, _t), n in train.items():
        tot[lang] = tot.get(lang, 0) + n
    vocab = {t for (_l, t) in train}
    vsz = len(vocab)
    scores = {}
    for lang in labels:
        n_docs, n_total = labels[lang]
        s1_units = 0
        for t in set(test_doc_tokens):
            tf = test_doc_tokens.count(t)
            n = train.get((lang, t), 0)
            if n > 0:
                s1_units += math.floor(tf * math.log(n + 1) * 1e6 + 0.5)
        scores[lang] = (
            math.log(n_docs / n_total)
            - len(test_doc_tokens) * math.log(tot[lang] + vsz)
            + s1_units / 1e6
        )
    return scores


def test_nb_classify_hand_computed(spark):
    # train (doc_id % 5 != 0): en docs say "hello world", fr docs say
    # "bonjour monde". held-out docs 5 (en-ish) and 10 (fr-ish).
    rows = [
        (1, "en", "hello world hello"),
        (2, "en", "hello world"),
        (3, "fr", "bonjour monde bonjour"),
        (4, "fr", "bonjour monde"),
        (5, "en", "hello hello world"),
        (10, "fr", "bonjour monde monde"),
    ]
    out = _run(qp, "table_wide", _docs(spark, rows), "nb_classify", spark)
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {5, 10}
    assert got[5]["lang_pred"] == "en" and got[5]["hit"] == 1
    assert got[10]["lang_pred"] == "fr" and got[10]["hit"] == 1
    # margin matches the pure-Python twin to rounding
    train = {
        ("en", "hello"): 3,
        ("en", "world"): 2,
        ("fr", "bonjour"): 3,
        ("fr", "monde"): 2,
    }
    labels = {"en": (2, 4), "fr": (2, 4)}
    sc = _nb_twin(train, ["hello", "hello", "world"], labels)
    want = sorted(sc.values(), reverse=True)
    assert abs(got[5]["margin"] - (want[0] - want[1])) < 2e-6


def test_nb_classify_unseen_tokens_fall_to_prior(spark):
    # a held-out doc of only unseen tokens: token-sum term is 0 for every
    # label, so the ranking is prior + n·ln(tot+V) — with equal totals the
    # larger-prior class wins; tie-break is label order.
    rows = [
        (1, "en", "hello world"),
        (2, "en", "hello world"),
        (3, "fr", "bonjour monde"),
        (5, "fr", "zzz qqq"),
    ]
    out = _run(qp, "table_wide", _docs(spark, rows), "nb_classify", spark)
    (r,) = out
    # en prior 2/3 vs fr 1/3; en totals 4+4=8 vs fr 2+4=6 tokens+V —
    # score_en = ln(2/3) - 2 ln 8, score_fr = ln(1/3) - 2 ln 6
    s_en = math.log(2 / 3) - 2 * math.log(8)
    s_fr = math.log(1 / 3) - 2 * math.log(6)
    assert r["lang_pred"] == ("en" if s_en > s_fr else "fr")
    assert abs(r["margin"] - abs(s_en - s_fr)) < 2e-6


def _knuth_fold(doc_id: int, k: int = 5) -> int:
    e = doc_id % _MOD
    h = ((e // 65536) * _K % _MOD * 65536 + (e % 65536) * _K) % _MOD
    return h % k


def test_kfold_deterministic_and_balanced(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr", f"tok{i} x y") for i in range(100)]
    out = _run(qt, "table", _docs(spark, rows), "kfold_stratified", spark)
    # exact per-(lang, fold) counts from the Python hash twin
    want = {}
    for i, lang in [(i, "en" if i % 2 == 0 else "fr") for i in range(100)]:
        key = (lang, _knuth_fold(i))
        want[key] = want.get(key, 0) + 1
    got = {(r["lang"], r["fold"]): r["n_docs"] for r in out}
    assert got == want
    # balance identity: sum over folds of (dev+1) * ideal = class total
    for lang in ("en", "fr"):
        tot = sum(n for (l, f), n in got.items() if l == lang)
        for r in out:
            if r["lang"] == lang:
                ideal = tot / 5.0
                assert abs((r["balance_dev"] + 1.0) * ideal - r["n_docs"]) < 1e-3


def test_corpus_kl_identical_halves_zero(spark):
    # even/odd docs carry identical token multisets -> p == q exactly,
    # every divergence is 0.0
    rows = [(0, "en", "a b b"), (1, "en", "a b b"),
            (2, "en", "c a"), (3, "en", "c a")]
    (r,) = _run(qp, "table_wide", _docs(spark, rows), "corpus_kl", spark)
    assert (r["n_ref"], r["n_cur"], r["vsz"]) == (5, 5, 3)
    assert r["kl_ref_cur"] == 0.0 and r["kl_cur_ref"] == 0.0 and r["jsd"] == 0.0


def test_corpus_kl_hand_computed(spark):
    # ref = {a:2}, cur = {b:1}; vocab {a,b}, smoothing +1:
    # p = [(2+1)/4, (0+1)/4], q = [(0+1)/3, (1+1)/3]
    rows = [(0, "en", "a a"), (1, "en", "b")]
    (r,) = _run(qp, "table_wide", _docs(spark, rows), "corpus_kl", spark)
    p = [3 / 4, 1 / 4]
    q = [1 / 3, 2 / 3]
    kl_rc = sum(pi * math.log(pi / qi) for pi, qi in zip(p, q))
    kl_cr = sum(qi * math.log(qi / pi) for pi, qi in zip(p, q))
    jsd = sum(
        0.5 * pi * math.log(pi / ((pi + qi) / 2))
        + 0.5 * qi * math.log(qi / ((pi + qi) / 2))
        for pi, qi in zip(p, q)
    )
    assert abs(r["kl_ref_cur"] - kl_rc) < 3e-6
    assert abs(r["kl_cur_ref"] - kl_cr) < 3e-6
    assert abs(r["jsd"] - jsd) < 3e-6
