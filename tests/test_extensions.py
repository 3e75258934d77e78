"""Extension-operator tests (SURVEY.md §2C): approximate tiers validated
against their exact twins (the property the oracles can't check), text
function goldens, multimodal plumbing round-trips.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf2db_spark.functions import multimodal as mm
from vcf2db_spark.functions.text import doc_fingerprint, lang_id, quality_score
from vcf2db_spark.io import table
from vcf2db_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    simhash_near_pairs,
)
from vcf2db_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings")


# ---- dedup ---------------------------------------------------------------


def test_exact_dedup_deterministic(docs):
    out = exact_dedup(docs.select("doc_id", "lang", "n_chars"), ["lang", "n_chars"], "doc_id")
    pdf = out.toPandas()
    assert pdf["group_size"].sum() == docs.count()
    # representative is the min doc_id of its group
    grp = docs.groupBy("lang", "n_chars").agg(F.min("doc_id").alias("m")).toPandas()
    merged = pdf.merge(grp, on=["lang", "n_chars"])
    assert (merged["doc_id"] == merged["m"]).all()


def test_minhash_recall_vs_exact(docs):
    """MinHash estimates SHINGLE-set Jaccard: every exact shingle-Jaccard
    ≥0.9 pair must surface as an LSH candidate (a ≥0.9-similar pair misses
    all 16 bands of 4 rows with probability (1-0.9⁴)¹⁶ ≈ 0.2%)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, threshold=0.9, shingle=3).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs).collect()
    }
    assert exact, "fixture should contain near-dup docs"
    missed = exact - cand
    assert len(missed) <= max(1, len(exact) // 10), f"LSH recall too low: missed {missed}"


def test_minhash_estimates_jaccard(docs):
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(docs).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.7, shingle=3).collect()
    }
    common = set(est) & set(exact)
    assert common
    for k in common:
        assert abs(est[k] - exact[k]) < 0.35  # 64 hashes → σ≈0.06, generous bound


def test_simhash_identical_docs_collide(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # identical
        (3, "alpha beta gamma delta epsilon eta"),  # 1 token differs
        (4, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(df, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs and (2, 4) not in pairs


# ---- similarity ------------------------------------------------------------


def _query_vec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]


def test_lsh_topk_subset_of_corpus_ranked(emb):
    q = _query_vec(emb)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in brute_force_topk(corpus, q, k=20).collect()]
    approx = lsh_topk(corpus, q, k=5, max_hamming=4).collect()
    assert len(approx) > 0
    # approximate hits must be genuinely similar: within exact top-20 mostly
    hits = sum(1 for r in approx if r["vec_id"] in exact)
    assert hits >= max(1, len(approx) // 2)


def test_ivf_topk_recall(emb):
    q = _query_vec(emb)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in brute_force_topk(corpus, q, k=5).collect()]
    got = [r["vec_id"] for r in ivf_topk(corpus, q, k=5, n_lists=8, nprobe=4).collect()]
    assert len(set(exact) & set(got)) >= 2  # nprobe=4 of 8 lists → ≥half overlap expected


def test_brute_force_topk_matches_registry(emb, spark):
    from vcf2db_spark.queries import QUERIES

    q = _query_vec(emb)
    a = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(emb.filter("vec_id != 0"), q, 5).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in QUERIES["sim_topk"](spark, SF).collect()]
    assert [x[0] for x in a] == [x[0] for x in b]
    for (_, ca), (_, cb) in zip(a, b):
        assert abs(ca - cb) < 1e-5


# ---- text ------------------------------------------------------------------


def test_lang_id_golden(spark):
    rows = [
        (1, "the cat sat on the mat and it is happy"),
        (2, "el perro que corre en la casa es grande y no come"),
        (3, "der hund ist nicht von den anderen und die katze"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_and_fingerprint(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "dog lazy the over jumps fox brown quick the"),  # same token set
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id", quality_score().alias("q"), doc_fingerprint().alias("fp")
    ).collect()
    d = {r["doc_id"]: r for r in out}
    assert d[1]["fp"] == d[2]["fp"] != d[3]["fp"]
    assert 0.0 <= d[3]["q"] < d[1]["q"] <= 1.0


# ---- multimodal -------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", mm.encode_fake(16, 8, 3, seed=1), "application/x-fake", 16, 8, None),
        (2, "image", mm.encode_fake(32, 32, 1, seed=2), "application/x-fake", 32, 32, None),
        (3, "image", None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


@pytest.mark.slow_sweep  # media decode over synthetic containers (~25 s); driver-window fit
def test_extract_features(media):
    out = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 8 and out[1]["channels"] == 3
    assert out[2]["n_bytes"] == 9 + 32 * 32
    assert out[3]["width"] is None
    assert 0 <= out[1]["mean_intensity"] <= 255


@pytest.mark.slow_sweep  # media resize round trip (~29 s); driver-window fit
def test_resize_composes(media):
    small = mm.resize(media, 8, 4)
    feats = {r["media_id"]: r for r in mm.extract_features(small).collect()}
    assert feats[1]["width"] == 8 and feats[1]["height"] == 4 and feats[1]["channels"] == 3


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_n_rows=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1]  # height 8, every 4 rows
    assert sorted(by_id[2]) == list(range(8))  # height 32
    assert 3 not in by_id


def test_real_codec_is_stubbed(spark):
    df = spark.createDataFrame(
        [(9, "image", b"\x89PNG...", "image/png", None, None, None)], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKE|PIL|ffmpeg"):
        mm.extract_features(df).collect()


def test_sample_stratified_proportions(spark, sf_dir):
    """sampleBy draws ≈ the requested fraction per stratum and is
    deterministic for a fixed seed."""
    from vcf2db_spark.io import table as _table
    from vcf2db_spark.queries import QUERIES

    li = _table(spark, sf_dir, "lineitem")
    totals = {r["l_returnflag"]: r["n"] for r in li.groupBy("l_returnflag").count().withColumnRenamed("count", "n").collect()}
    got1 = {r["l_returnflag"]: r["n_sampled"] for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    got2 = {r["l_returnflag"]: r["n_sampled"] for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    assert got1 == got2  # seed-deterministic
    for flag, frac in (("R", 0.5), ("N", 0.05), ("A", 0.2)):
        expect = totals[flag] * frac
        assert abs(got1.get(flag, 0) - expect) < max(30, 0.25 * expect), (flag, got1, expect)


# ---- chunking / ngrams / scrubbing helpers ---------------------------------


def test_token_chunks_reassemble(spark):
    """Chunks of any size must reassemble to the original token stream and
    carry correct per-chunk token counts (last chunk ragged)."""
    from vcf2db_spark.functions.text import token_chunks

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "  p  q  ")], "id long, text string"
    )
    rows = (
        df.select("id", F.explode(token_chunks("text", 3)).alias("c"))
        .select("id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
        .collect()
    )
    by_id = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["chunk_idx"])):
        by_id.setdefault(r["id"], []).append(r)
    assert [r["chunk_text"] for r in by_id[1]] == ["a b c", "d e f", "g"]
    assert [r["n_tokens"] for r in by_id[1]] == [3, 3, 1]
    assert [r["chunk_text"] for r in by_id[2]] == ["x"]
    # interior whitespace collapses via the \s+ split; trim kills the edges
    assert [r["chunk_text"] for r in by_id[3]] == ["p q"]


def test_token_ngrams_short_doc_guard(spark):
    """Docs shorter than n yield an EMPTY array — not a descending
    sequence() artifact."""
    from vcf2db_spark.functions.text import token_ngrams

    df = spark.createDataFrame([(1, "a b"), (2, "a b c")], "id long, text string")
    got = {r["id"]: r["g"] for r in df.select("id", token_ngrams("text", 3).alias("g")).collect()}
    assert got[1] == []
    assert got[2] == ["a b c"]


def test_scrub_text_default_patterns(spark):
    from vcf2db_spark.functions.text import scrub_text

    df = spark.createDataFrame(
        [(1, "mail bob@example.com or call +1 (555) 123-4567 now"), (2, "clean")],
        "id long, text string",
    )
    rows = {r["id"]: r["s"] for r in df.select("id", scrub_text("text").alias("s")).collect()}
    assert rows[1]["n_redactions"] == 2
    assert "<EMAIL>" in rows[1]["scrubbed"] and "<PHONE>" in rows[1]["scrubbed"]
    assert "bob@" not in rows[1]["scrubbed"] and "555" not in rows[1]["scrubbed"]
    assert rows[2].asDict() == {"scrubbed": "clean", "n_redactions": 0}


def test_lang_id_table_matches_expression(spark, sf_dir):
    """The exploded broadcast-join lang classifier must agree row-for-row
    with the per-row expression form on the full fixture."""
    from vcf2db_spark.functions.text import lang_id, lang_id_table

    d = table(spark, sf_dir, "documents")
    expr = {r["doc_id"]: r["l"] for r in d.select("doc_id", lang_id("text").alias("l")).collect()}
    tab = {r["doc_id"]: r["detected_lang"] for r in lang_id_table(d).collect()}
    assert expr == tab


def test_duplicate_clusters_semantics(spark):
    """Connected components: transitive merge (a~b, b~c → one cluster),
    min-id labels, singletons label themselves, chain graphs converge
    (pointer jumping), input pair order irrelevant."""
    from vcf2db_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id bigint")
    # components: {1,2,3} via chain 3-2, 2-1; {5,6,7,8} via 8-7,7-6,6-5
    # (a 4-chain); {9,10}; 4 is a singleton
    pairs = spark.createDataFrame(
        [(3, 2), (2, 1), (8, 7), (7, 6), (6, 5), (10, 9)],
        "id_a bigint, id_b bigint",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, nodes).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 5), (8, 5),
        (9, 9), (10, 9),
    }


def test_duplicate_clusters_empty_pairs(spark):
    """No pairs → every node is its own cluster (and the loop exits on
    the first unchanged checksum, not after max_iters)."""
    from vcf2db_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in (7, 3, 5)], "doc_id bigint")
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(empty, nodes).collect()
    }
    assert got == {(7, 7), (3, 3), (5, 5)}


def test_duplicate_clusters_paths_agree(spark):
    """Size dispatch: the driver union-find (small path) and the
    iterative min-label loop (scale path, forced via small_threshold=0)
    must produce identical labelings — including transitive chains and
    singletons."""
    from vcf2db_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in range(1, 31)], "doc_id bigint")
    # a long chain (worst case for propagation), a star, and a pair
    chain = [(i + 1, i) for i in range(1, 10)]          # 1..10 linked
    star = [(20, j) for j in (21, 22, 23, 24)]          # 20-centered
    pairs = spark.createDataFrame(
        chain + star + [(29, 28)], "id_a bigint, id_b bigint"
    )

    def canon(df):
        return sorted((r["doc_id"], r["cluster_id"]) for r in df.collect())

    small = duplicate_clusters(pairs, nodes)
    iterative = duplicate_clusters(pairs, nodes, small_threshold=0)
    assert canon(small) == canon(iterative)
    assert dict(canon(small))[10] == 1  # chain fully collapsed to min id


def test_sketch_distinct_error_bound(spark):
    """HLL sketch estimates (lgK=14) stay within 2% of exact per group,
    and the union-of-group-sketches global estimate matches a directly
    built global sketch exactly (mergeability — the property that makes
    sketches the scale path)."""
    from pyspark.sql import functions as F

    from vcf2db_spark.queries import QUERIES

    out = {r["l_returnflag"]: r["est_distinct"]
           for r in QUERIES["sketch_distinct"](spark, SF).collect()}
    li = table(spark, SF, "lineitem")
    exact = {r["l_returnflag"]: r["n"]
             for r in li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("n")).collect()}
    exact["ALL"] = li.select("l_partkey").distinct().count()
    for k, exp in exact.items():
        assert abs(out[k] - exp) <= max(1, 0.02 * exp), (k, out[k], exp)
    direct = (li.agg(F.hll_sketch_agg("l_partkey", F.lit(14)).alias("s"))
              .select(F.hll_sketch_estimate("s").alias("e")).collect()[0]["e"])
    assert out["ALL"] == direct


def test_sketch_quantile_error_bound(spark):
    """Histogram-sketch quantiles (256 bins over [0,51]) must land within
    one value step + one bin width of the exact interpolated percentile:
    the sketch guarantees the estimate lies in the bin covering rank p·n,
    while percentile() targets rank (n-1)p — over integer-valued
    l_quantity those ranks can straddle one discrete step (1.0), plus the
    in-bin interpolation slack (51/256). Also proves mergeability: the
    ALL row equals the same read-out over the summed per-group bins."""
    from pyspark.sql import functions as F

    from vcf2db_spark.queries import QUERIES

    width = 51.0 / 256
    out = {r["l_returnflag"]: (r["est_p50"], r["est_p90"])
           for r in QUERIES["sketch_quantile"](spark, SF).collect()}
    li = table(spark, SF, "lineitem")
    exact = {r["l_returnflag"]: (r["p50"], r["p90"])
             for r in li.groupBy("l_returnflag").agg(
                 F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
                 F.percentile("l_quantity", F.lit(0.9)).alias("p90")).collect()}
    row = li.agg(F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
                 F.percentile("l_quantity", F.lit(0.9)).alias("p90")).collect()[0]
    exact["ALL"] = (row["p50"], row["p90"])
    assert set(out) == set(exact)
    for k, (e50, e90) in exact.items():
        assert abs(out[k][0] - e50) <= 1.0 + width, (k, out[k][0], e50)
        assert abs(out[k][1] - e90) <= 1.0 + width, (k, out[k][1], e90)


def test_sketch_freq_cms_upper_bound(spark):
    """Count-min property: the sketch estimate is ALWAYS >= the exact
    count (counters only ever add collisions), and with d=3 x w=256 over
    2k keys the top-10 overestimates stay within the expected collision
    mass (< N/w per row, take the min of 3)."""
    from vcf2db_spark.queries import QUERIES

    rows = QUERIES["sketch_freq"](spark, SF).collect()
    assert len(rows) == 10
    n_total = table(spark, SF, "lineitem").count()
    for r in rows:
        assert r["est_n"] >= r["exact_n"], r
        assert r["est_n"] - r["exact_n"] <= n_total // 256 * 3, r


def test_sample_bottomk_merge_property(spark):
    """Bottom-k mergeability: bottom-k over the union of two halves ==
    bottom-k of (bottom-k(half1) UNION bottom-k(half2)) — the property
    that lets every executor sample independently and a k-row merge
    produce the global uniform sample."""
    from pyspark.sql import functions as F

    from vcf2db_spark.queries.training import knuth_hash_sql

    d = table(spark, SF, "documents").select("doc_id").withColumn(
        "hkey", F.expr(knuth_hash_sql("doc_id", "DIV"))
    )
    k = 50
    h1 = d.filter(F.col("doc_id") % 2 == 0)
    h2 = d.filter(F.col("doc_id") % 2 == 1)
    direct = [tuple(r) for r in d.orderBy("hkey", "doc_id").limit(k).collect()]
    merged = [
        tuple(r)
        for r in (
            h1.orderBy("hkey", "doc_id").limit(k)
            .unionAll(h2.orderBy("hkey", "doc_id").limit(k))
            .orderBy("hkey", "doc_id")
            .limit(k)
            .collect()
        )
    ]
    assert direct == merged


def test_bpe_train_matches_python_twin(spark):
    """The distributed BPE trainer must reproduce the pure-Python
    reference merge list EXACTLY (same pair counts, same lexicographic
    tie-break, same left-to-right merge application) on the identical
    word-frequency dict."""
    from pyspark.sql import functions as F

    from vcf2db_spark.functions.text import ws_tokens
    from vcf2db_spark.operators.bpe import bpe_train_merges, bpe_train_py
    from vcf2db_spark.queries import QUERIES

    d = table(spark, SF, "documents").filter(F.col("doc_id") < 500)
    words = (
        d.select(F.explode(ws_tokens(F.lower(F.trim(F.col("text"))))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    freqs = {r["w"]: r["freq"] for r in words.collect()}
    expected = bpe_train_py(freqs, n_merges=8)
    got = bpe_train_merges(words, n_merges=8)
    assert got == expected
    assert len(got) == 8
    # and the declared query reports the same rules in rank order
    rows = QUERIES["bpe_train"](spark, SF).collect()
    assert [(r["left"], r["right"]) for r in sorted(rows, key=lambda r: r["rank"])] == expected


def test_bpe_encode_matches_python_twin(spark):
    """The distributed corpus encode (vocab-fold + broadcast join) must
    reproduce, EXACTLY, a pure-Python tokenization of every document
    with the same trained merges: per-doc token counts and the top-20
    corpus token-frequency head."""
    import re

    from vcf2db_spark.operators.bpe import bpe_encode_py, bpe_train_py
    from vcf2db_spark.queries import QUERIES

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
        .collect()
    }
    # twin tokenization — identical to ws_tokens(lower(trim(text)))
    doc_words = {d: [w for w in re.split(r"\s+", t.strip().lower()) if w]
                 for d, t in docs.items()}
    freqs: dict[str, int] = {}
    for ws in doc_words.values():
        for w in ws:
            freqs[w] = freqs.get(w, 0) + 1
    merges = bpe_train_py(freqs, n_merges=8)
    enc = {w: bpe_encode_py(w, merges) for w in freqs}
    exp_doc = {
        str(d): sum(len(enc[w]) for w in ws) for d, ws in doc_words.items()
    }
    tok_freq: dict[str, int] = {}
    for w, f in freqs.items():
        for t in enc[w]:
            tok_freq[t] = tok_freq.get(t, 0) + f
    exp_head = dict(
        sorted(tok_freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )

    rows = QUERIES["bpe_encode"](spark, SF).collect()
    got_doc = {r["key"]: r["n"] for r in rows if r["kind"] == "doc"}
    got_head = {r["key"]: r["n"] for r in rows if r["kind"] == "token"}
    assert got_doc == exp_doc
    assert got_head == exp_head


def test_fingerprint_store_roundtrip_and_incremental(spark, tmp_path):
    """write_fingerprint_store → read_training_shards round-trips with a
    verified manifest; a tampered store fails verification; and the
    dedup_incremental declared query equals a driver-side two-set
    difference of deterministic fingerprints."""
    import glob
    import os

    from vcf2db_spark.functions.text import doc_fingerprint
    from vcf2db_spark.queries import QUERIES
    from vcf2db_spark.sinks.export import (
        read_training_shards,
        write_fingerprint_store,
    )

    d = table(spark, SF, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fp")
    )
    hist = d.filter(F.col("doc_id") % 5 != 0)
    out = str(tmp_path / "fpstore")
    manifest = write_fingerprint_store(hist, out, n_shards=4)
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == hist.select("fp").distinct().count()
    # one data file per shard (repartition aligned tasks to partitions)
    for shard_dir in glob.glob(os.path.join(out, "shard=*")):
        files = [f for f in os.listdir(shard_dir) if f.endswith(".parquet")]
        assert len(files) == 1, shard_dir
    back = read_training_shards(spark, out, verify=True)
    assert sorted(r["fp"] for r in back.collect()) == sorted(
        r["fp"] for r in hist.select("fp").distinct().collect()
    )
    # the declared query == two-set difference on the same fingerprints
    hist_fps = {r["fp"] for r in hist.collect()}
    new = d.filter(F.col("doc_id") % 5 == 0).collect()
    expected = sorted(
        (r["doc_id"], r["fp"]) for r in new if r["fp"] not in hist_fps
    )
    got = sorted(
        (r["doc_id"], r["fp"])
        for r in QUERIES["dedup_incremental"](spark, SF).collect()
    )
    assert got == expected and len(got) > 0
    # tamper: drop one shard file → verification must raise
    victims = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    os.remove(victims[0])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="manifest mismatch"):
        read_training_shards(spark, out, verify=True).collect()


def test_salted_join_equals_plain_join(spark):
    """salted_join (salt-and-replicate hot-key device) must be
    semantics-neutral vs the plain join — inner AND left — and spread a
    hot key across multiple salt buckets."""
    from vcf2db_spark.operators.skew import salted_join

    li = table(spark, SF, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .cast("bigint")
        .alias("k"),
        "l_extendedprice",
    )
    s = table(spark, SF, "supplier").select("s_suppkey", "s_nationkey")
    for how in ("inner", "left"):
        plain = (
            li.join(s, li.k == s.s_suppkey, how)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        salted = (
            salted_join(
                li, s, "k", "s_suppkey",
                salt_src=["l_orderkey", "l_linenumber"], n_salt=8, how=how,
            )
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how
    # the hot key actually spreads: >1 distinct salt among k=1 rows
    from pyspark.sql import functions as SF_  # noqa: N813
    n_salts = (
        li.filter(F.col("k") == 1)
        .select(
            F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")), F.lit(8)
            ).alias("salt")
        )
        .agg(F.countDistinct("salt").alias("d"))
        .collect()[0]["d"]
    )
    assert n_salts > 1


def test_minhash_lsh_bucket_cap(spark):
    """bucket_cap drops only pairs whose EVERY shared band bucket is
    oversized: a planted spam cluster (identical text → all 16 bands
    collide at cluster size) vanishes under a cap below its size, while
    organic near-dup pairs (small buckets) survive byte-identically."""
    from vcf2db_spark.operators.dedup import minhash_lsh_candidates

    docs = table(spark, SF, "documents").limit(120).select("doc_id", "text")
    spam = docs.limit(30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit("lorem boiler plate lorem boiler plate lorem boiler").alias("text"),
    )
    corpus = docs.unionByName(spam)
    base = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_lsh_candidates(corpus).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_lsh_candidates(corpus, bucket_cap=20).collect()
    }
    spam_ids = set(range(100000, 100030))
    spam_pairs = {t for t in base if t[0] in spam_ids and t[1] in spam_ids}
    assert len(spam_pairs) == 30 * 29 // 2  # the quadratic blowup exists
    assert capped == base - spam_pairs  # and ONLY it is dropped
