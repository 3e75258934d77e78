"""Text analysis for training-data pipelines (SURVEY.md §2C C5 + north
star): tokenization, token/quality stats, language ID heuristic, document
fingerprinting. All built-in expressions (HOFs, regex, md5) — JVM-side,
no UDFs, fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny function-word lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "a", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "que"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]

BPE_ISH_TOKEN_RE = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Sub-word-ish tokenization via regexp_extract_all — the cheap stand-in
    for a BPE vocabulary pass (real BPE = broadcast merges table + the same
    shape of narrow map)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), 0)


def token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(ws_tokens(text), lambda t: F.array_contains(arr, t)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens / n_alpha_tokens / avg_token_len / stopword_ratio — the raw
    signals quality filters cut on."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    return df.withColumns(
        {
            "n_tokens": n,
            "n_alpha_tokens": F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))),
            "avg_token_len": F.round(
                (F.length(text_col) - (n - 1)).cast("double") / n, 6
            ),
            "stopword_ratio": F.round(stopword_count(text_col).cast("double") / n, 6),
        }
    )


def quality_score(text_col: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword density and
    moderate length; the shape (logistic over linear signals) matches
    published quality-filter recipes (e.g. C4/Gopher rules)."""
    toks = ws_tokens(text_col)
    n = F.size(toks).cast("double")
    stop_ratio = stopword_count(text_col).cast("double") / n
    avg_len = (F.length(text_col) - (n - 1)) / n
    z = 0.05 * n + 3.0 * stop_ratio - 0.2 * F.abs(avg_len - F.lit(5.0))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def doc_fingerprint(text_col: str = "text") -> Column:
    """Content fingerprint: md5 of the sorted distinct token set — the
    exact signature the shingle-dedup DQ groups on, in constant space.
    (Cross-engine: Spark md5 == DuckDB md5.)"""
    sig = F.array_join(F.array_sort(F.array_distinct(ws_tokens(text_col))), " ")
    return F.md5(sig)


def lang_id(text_col: str = "text") -> Column:
    """Stopword-vote language heuristic: argmax over per-language function-
    word hit counts; CJK-character ratio short-circuits to 'zh'. Returns
    'und' when nothing scores."""
    toks = ws_tokens(text_col)
    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # negate hits so array_min picks the best; tie → lexicographic lang
        scores.append(F.struct((-hits).alias("neg"), F.lit(lang).alias("lang"), hits.alias("hits")))
    best = F.array_min(F.array(*scores))
    # regexp_count: single counting pass, no replaced-string materialization
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]"))
    return (
        F.when(cjk * 2 > F.length(F.col(text_col)), "zh")
        .when(best["hits"] > 0, best["lang"])
        .otherwise("und")
    )
