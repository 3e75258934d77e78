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


def token_ngrams(text_col: Column | str, n: int) -> Column:
    """Token n-grams as space-joined strings, built with transform over an
    index sequence + slice — a narrow JVM-side expression (no explode, no
    shuffle); the caller decides whether to explode. Empty array when the
    document is shorter than ``n`` (sequence() would otherwise count
    DOWNWARD from 1 to a negative stop — a silent corruption, so guard)."""
    toks = ws_tokens(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col))
    n_toks = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n_toks - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(n_toks >= n, grams).otherwise(F.array().cast("array<string>"))


def token_ngram_hashes(text_col: Column | str, n: int) -> Column:
    """xxhash64 of each token n-gram slice — same windows as
    ``token_ngrams`` but the gram never materializes as a string: the
    slice array hashes directly (arrays are hashable JVM-side), saving
    ~n_tokens concat allocations per document and shrinking any
    downstream set/join payload to 8 bytes per gram. Token→string-gram is
    injective for whitespace-split tokens, so distinct-hash cardinalities
    match distinct-gram cardinalities up to 2⁻⁶⁴ collisions."""
    toks = ws_tokens(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col))
    n_toks = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n_toks - n + 1),
        lambda i: F.xxhash64(F.slice(toks, i, n)),
    )
    return F.when(n_toks >= n, grams).otherwise(F.array().cast("array<bigint>"))


def explode_token_ngram_hashes(df, text_col: str, n: int, keep: tuple[str, ...] = ("doc_id",)):
    """One row per token n-gram hash: (keep..., gh bigint). Scan-local, no
    shuffle — the fan-out path for n-gram joins (decontamination, n-gram
    indexes).

    Plan-shape note (measured 3.5× at sf0.1): exploding the *array of
    hashes* (``explode(token_ngram_hashes(...))``) is a Spark pothole —
    InferFiltersFromGenerate clones the whole higher-order-function
    expression into a non-codegen Filter, so the interpreted HOF runs 2-3×
    per row. Exploding a cheap POSITION sequence instead and doing
    slice+xxhash64 in the post-Generate projection keeps every expensive
    expression inside whole-stage codegen, evaluated once per output row.
    """
    toks = ws_tokens(F.trim(F.col(text_col)))
    # guard: sequence(1, 0) counts DOWNWARD (emitting an invalid slice
    # start of 0), so documents shorter than n tokens must produce an
    # EMPTY position array, not a descending one
    n_t = F.size("_t")
    positions = F.when(
        n_t >= n, F.sequence(F.lit(1), n_t - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(*keep, toks.alias("_t"))
        .select(*keep, "_t", F.explode(positions).alias("_i"))
        .select(*keep, F.xxhash64(F.slice("_t", F.col("_i"), n)).alias("gh"))
    )


def token_chunks(text_col: Column | str, chunk_size: int) -> Column:
    """Fixed-token-count document chunking (the pre-training shard step):
    array of (chunk_idx, chunk_text, n_tokens) structs. Same narrow
    transform/slice shape as token_ngrams — chunking 100 TB is then a
    map-only pass, with the explode fanning rows out scan-locally."""
    toks = ws_tokens(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col))
    n_toks = F.size(toks)
    n_chunks = F.ceil(n_toks / F.lit(float(chunk_size))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(F.slice(toks, i * chunk_size + 1, chunk_size), " ").alias(
                "chunk_text"
            ),
            F.size(F.slice(toks, i * chunk_size + 1, chunk_size))
            .cast("long")
            .alias("n_tokens"),
        ),
    )


#: default PII-ish scrub patterns (email, long digit runs / phone shapes)
SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def scrub_text(
    text_col: Column | str,
    patterns: tuple[tuple[str, str], ...] = SCRUB_PATTERNS,
) -> Column:
    """PII-style redaction: struct(scrubbed, n_redactions). Chained
    regexp_replace + regexp_count — pure codegen'd expressions, so the
    scrub rides the same scan as every other narrow stage."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    scrubbed = c
    n_red = F.lit(0).cast("long")
    for pat, repl in patterns:
        n_red = n_red + F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return F.struct(scrubbed.alias("scrubbed"), n_red.alias("n_redactions"))


def lang_id_table(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, detected_lang) via the SAME stopword-vote heuristic as
    ``lang_id`` (argmax hits, lexicographic ties, CJK short-circuit,
    'und' on zero hits) — but as an exploded broadcast-join vote count
    instead of per-row HOF filters. Higher-order functions are
    CodegenFallback (interpreted per row); for a whole-table pass the
    explode + 40-row broadcast dim + two partial-agg reductions stay
    entirely inside whole-stage codegen (~3× at sf0.1). Use the
    expression form when composing per-row columns; use this for
    table-level classification."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(w, lang) for lang, words in sorted(LANG_STOPWORDS.items()) for w in words],
        "token string, _lang string",
    )
    tok = df.select(id_col, F.explode(ws_tokens(text_col)).alias("token"))
    votes = (
        tok.join(F.broadcast(dim), "token")
        .groupBy(id_col, "_lang")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("_hits")).alias("neg"),
                    F.col("_lang").alias("lang"),
                    F.col("_hits").alias("hits"),
                )
            ).alias("_best")
        )
    )
    return (
        df.select(id_col, F.col(text_col).alias("_txt"))
        .join(votes, id_col, "left")
        .select(
            id_col,
            F.when(
                F.regexp_count(F.col("_txt"), F.lit(r"[一-鿿]")) * 2
                > F.length(F.col("_txt")),
                F.lit("zh"),
            )
            .when(F.col("_best.hits") > 0, F.col("_best.lang"))
            .otherwise(F.lit("und"))
            .alias("detected_lang"),
        )
    )


def lang_id(text_col: str = "text") -> Column:
    """Stopword-vote language heuristic: argmax over per-language function-
    word hit counts; CJK-character ratio short-circuits to 'zh'. Returns
    'und' when nothing scores."""
    # NOTE: a create_map literal lookup per token benchmarked 2× SLOWER
    # here — GetMapValue on a literal map is a linear key scan, so it costs
    # the same comparisons as array_contains while also materializing a
    # votes array. The per-language filter stays.
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
