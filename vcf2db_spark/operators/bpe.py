"""Byte-pair-encoding merge-rule training over a distributed corpus.

The tokenizer-preparation pass of an LLM data pipeline: learn the top-N
BPE merges from corpus statistics. Spark-first decomposition:

1. ONE corpus pass builds the word-frequency dictionary (groupBy on the
   token — the only row-count-sized aggregation). Classic BPE
   (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
   with Subword Units" — public algorithm) trains on exactly this
   dict, so every later iteration is CORPUS-SIZE-INDEPENDENT: it
   touches |vocab| rows, not |corpus|.
2. Each merge iteration: count adjacent symbol pairs weighted by word
   frequency (explode + partial-agged groupBy over the dict), take the
   argmax pair (1-row collect — a scalar merge RULE, the same bounded
   driver transfer as k-means centroids), and apply the merge to every
   word's symbol array with a left-to-right ``aggregate`` fold (JVM
   HOF, no Python).

Determinism: ties on pair frequency break lexicographically on
(left, right); the fold is sequential per word. The pure-Python twin in
tests/test_extensions.py must reproduce the merge list exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


def _merge_fold_expr(ea: str, eb: str) -> str:
    """One left-to-right merge pass over symbol array ``s`` as a JVM
    ``aggregate`` fold (SQL-escaped pair ``ea``/``eb``). Greedy
    non-overlapping, exactly the classic BPE apply order — shared by the
    trainer's per-iteration apply and the corpus-wide encoder."""
    return (
        "aggregate(s, CAST(array() AS array<string>), (acc, x) ->"
        f" CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{ea}'"
        f"           AND x = '{eb}'"
        f"      THEN concat(slice(acc, 1, size(acc) - 1),"
        f"                  array('{ea}{eb}'))"
        "       ELSE concat(acc, array(x)) END)"
    )


def bpe_train_merges(words: DataFrame, n_merges: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a (w, freq) dictionary.

    ``words`` must have columns ``w`` (string) and ``freq`` (long).
    Returns the ordered merge list. Driver state: the merge rules only
    (O(n_merges) strings); the symbol table stays distributed, with a
    localCheckpoint per iteration to keep the fold expressions from
    nesting into one deep tree (the dict is vocab-sized — tiny).
    """
    syms = words.select(
        "w",
        "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("s"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            syms.filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(s) - 2),"
                        " i -> struct(s[i] AS a, s[i + 1] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not top or top[0]["n"] is None:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms = syms.withColumn(
            "s", F.expr(_merge_fold_expr(_esc(a), _esc(b)))
        ).localCheckpoint(eager=False)
    return merges


def bpe_encode_vocab(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize a (w, freq) VOCABULARY with a trained merge list: apply
    every rule in rank order as a JVM fold over the character array.
    Returns (w, freq, tokens array<string>).

    This is the scale pivot of the distributed *encode* pass: the merge
    loop is vocab-bounded (apply |merges| folds to |vocab| rows), and
    the corpus-sized tokenization is then a broadcast join of documents'
    words onto this encoded dictionary — the corpus is never re-scanned
    per rule. At 100 TB: |vocab| ≪ |corpus|, so per-rule work is
    constant in corpus size, exactly like training."""
    enc = words.select(
        "w",
        "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("s"),
    )
    for i, (a, b) in enumerate(merges):
        enc = enc.withColumn("s", F.expr(_merge_fold_expr(_esc(a), _esc(b))))
        # checkpoint every few rules: keeps the nested fold expression
        # tree (and its codegen unit) shallow without materializing per
        # rule — the dict is vocab-sized, this is cheap
        if (i + 1) % 4 == 0:
            enc = enc.localCheckpoint(eager=False)
    return enc.withColumnRenamed("s", "tokens")


def bpe_encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python twin of one vocab row through ``bpe_encode_vocab``
    (same rank-ordered rules, same greedy left-to-right pass per rule)."""
    s = list(word)
    for a, b in merges:
        out: list[str] = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        s = out
    return s


def bpe_train_py(word_freqs: dict[str, int], n_merges: int = 8) -> list[tuple[str, str]]:
    """Pure-Python twin of ``bpe_train_merges`` (same tie-breaks, same
    left-to-right merge application) — the pytest correctness anchor."""
    syms = {w: [c for c in w] for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            f = word_freqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges
