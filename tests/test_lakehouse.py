"""Format mechanics for sinks/lakehouse.py: atomic commit conflicts,
snapshot isolation / time travel, COW rewrite scope, manifest-stat
pruning, compaction, vacuum, and schema enforcement. The value-level
correctness of the version states is the driver differential's job
(lakehouse_timetravel / lakehouse_prune_scan oracles)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vcf2db_spark.sinks import lakehouse as lh


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, lo, hi, bump=0.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") + F.lit(bump)).alias("v"),
    )


def test_create_append_read_latest(spark, root):
    assert lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",)) == 0
    assert lh.append(spark, root, _mk(spark, 100, 150)) == 1
    assert lh.read(spark, root).count() == 150
    assert lh.latest_version(root) == 1


def test_time_travel_pins_old_versions(spark, root):
    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 100, 150))
    lh.merge(spark, root, _mk(spark, 0, 10, bump=1000.0), key="k")
    # v0/v1 read their at-commit states even after the merge rewrote files
    assert lh.read(spark, root, 0).count() == 100
    assert lh.read(spark, root, 1).count() == 150
    v2 = lh.read(spark, root, 2)
    assert v2.count() == 150
    assert v2.filter("v >= 1000.0").count() == 10


def test_commit_conflict_is_detected(spark, root):
    lh.create(spark, root, _mk(spark, 0, 10), stat_cols=("k",))
    cur = lh.snapshot(root)
    # a concurrent writer wins version 1 first
    lh.append(spark, root, _mk(spark, 10, 20))
    with pytest.raises(lh.CommitConflict):
        lh._commit(root, {**cur, "parent": cur["version"]})
    # retry against the new head succeeds
    head = lh.snapshot(root)
    assert lh._commit(root, {**head, "parent": head["version"]}) == 2


def test_merge_rewrites_only_overlapping_files(spark, root):
    # two disjoint key-range commits → two file populations
    lh.create(
        spark, root, _mk(spark, 0, 1000).coalesce(1), stat_cols=("k",)
    )
    lh.append(spark, root, _mk(spark, 1000, 2000).coalesce(1))
    before = {f["path"] for f in lh.snapshot(root)["files"]}
    low_file = {
        f["path"] for f in lh.snapshot(root)["files"] if f["stats"]["k"][0] == 0
    }
    lh.merge(spark, root, _mk(spark, 1500, 1510, bump=9.0), key="k")
    after = {f["path"] for f in lh.snapshot(root)["files"]}
    # the low-range file entry carried into the new manifest VERBATIM
    assert low_file <= after
    # the high-range file was rewritten (its old path dropped)
    assert (before - low_file) - after == before - low_file
    got = lh.read(spark, root).filter("k between 1500 and 1509")
    assert got.filter("v = k + 9.0").count() == 10


def test_merge_inserts_unmatched_keys(spark, root):
    lh.create(spark, root, _mk(spark, 0, 50), stat_cols=("k",))
    lh.merge(spark, root, _mk(spark, 40, 60), key="k")
    assert lh.read(spark, root).count() == 60


def test_plan_files_prunes_by_stats(spark, root):
    df = _mk(spark, 0, 10000).repartitionByRange(8, "k")
    lh.create(spark, root, df, stat_cols=("k",))
    selected, skipped = lh.plan_files(root, {"k": (9000, None)})
    assert skipped >= 6 and len(selected) >= 1
    pruned = lh.read_pruned(spark, root, {"k": (9000, None)}).filter("k >= 9000")
    assert pruned.count() == 1000


def test_compact_bins_and_preserves(spark, root):
    lh.create(spark, root, _mk(spark, 0, 500).repartition(16), stat_cols=("k",))
    n_before = len(lh.snapshot(root)["files"])
    lh.compact(spark, root, target_bytes=1 << 30)
    man = lh.snapshot(root)
    assert man["operation"] == "compact"
    assert len(man["files"]) < n_before
    assert lh.read(spark, root).count() == 500
    # the pre-compaction version still reads its own files
    assert lh.read(spark, root, 0).count() == 500


def test_vacuum_drops_unreferenced_files(spark, root):
    lh.create(spark, root, _mk(spark, 0, 500).repartition(8), stat_cols=("k",))
    lh.compact(spark, root, target_bytes=1 << 30)
    # default retention age guards in-flight writers: nothing this fresh
    # may be reclaimed (ADVICE r6 — vacuum racing a staged-but-uncommitted
    # writer must not delete its data files)
    assert lh.vacuum(root, retain_versions=1) == 0
    removed = lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)
    assert removed >= 8
    assert lh.read(spark, root).count() == 500  # head unaffected
    with pytest.raises(Exception):
        lh.read(spark, root, 0).count()  # vacuumed version is gone


def test_append_rejects_schema_drift(spark, root):
    lh.create(spark, root, _mk(spark, 0, 10), stat_cols=("k",))
    bad = spark.range(5).select(F.col("id").alias("k"))  # missing v
    with pytest.raises(ValueError, match="schema mismatch"):
        lh.append(spark, root, bad)


def test_table_changes_cdf(spark, root):
    lh.create(spark, root, _mk(spark, 0, 1000).coalesce(1), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 1000, 2000).coalesce(1))
    # 5 updates in the low file + 3 inserts past the high range: the key
    # bounds span both files, so BOTH are rewritten — the feed must still
    # emit ONLY the 8 changed rows (carried-along equal rows drop out)
    batch = _mk(spark, 100, 105, bump=7.0).unionByName(
        spark.range(3).select(
            (F.col("id") + 2000).alias("k"),
            F.col("id").cast("double").alias("v"),
        )
    )
    lh.merge(spark, root, batch, key="k")
    feed = lh.table_changes(spark, root, 1, 2, key="k").collect()
    by = {}
    for r in feed:
        by.setdefault(r["_change"], []).append((r["k"], r["v"]))
    assert sorted(by["insert"]) == [(2000, 0.0), (2001, 1.0), (2002, 2.0)]
    assert sorted(by["update_postimage"]) == [
        (k, k + 7.0) for k in range(100, 105)
    ]
    assert "delete" not in by  # no delete op in this history
    # compaction produces NO changes: all rows carry over equal
    lh.compact(spark, root, target_bytes=1 << 30)
    assert lh.table_changes(spark, root, 2, 3, key="k").count() == 0


# seed 11 runs in the default suite; the other two replicas are the
# same property at different interleavings — opt-in (driver-window fit)
@pytest.mark.parametrize(
    "seed",
    [11]
    + [pytest.param(s, marks=pytest.mark.slow_sweep) for s in (23, 47)],
)
def test_merge_history_matches_dict_replica(spark, tmp_path, seed):
    """Randomized create/append/merge histories: after every commit the
    table must equal a plain-dict replica of the same operations, and
    every PRIOR version must still read its own at-commit state (the
    snapshot-isolation property, checked across the whole history)."""
    import random

    rng = random.Random(seed)
    root = str(tmp_path / f"tbl{seed}")
    replica: dict[int, float] = {k: float(k) for k in range(200)}
    lh.create(spark, root, _mk(spark, 0, 200), stat_cols=("k",))
    states = [dict(replica)]
    for _step in range(4):
        keys = sorted(rng.sample(range(400), rng.randint(1, 40)))
        bump = float(rng.randint(1, 9)) * 1000.0
        rows = [(k, k + bump) for k in keys]
        batch = spark.createDataFrame(rows, "k: long, v: double")
        lh.merge(spark, root, batch, key="k")
        replica.update(dict(rows))
        states.append(dict(replica))
    for v, want in enumerate(states):
        got = {
            r["k"]: r["v"] for r in lh.read(spark, root, v).collect()
        }
        assert got == want, f"seed={seed} version={v}"


def test_merge_sparse_batch_skips_unhit_files(spark, root):
    """A batch hitting both ENDS of the keyspace must not rewrite the
    middle file (exact per-file hit detection, not [min,max]-span
    overlap — the COW write-amplification worst case)."""
    lh.create(spark, root, _mk(spark, 0, 1000).coalesce(1), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 1000, 2000).coalesce(1))
    lh.append(spark, root, _mk(spark, 2000, 3000).coalesce(1))
    mid = {
        f["path"]
        for f in lh.snapshot(root)["files"]
        if f["stats"]["k"][0] == 1000
    }
    assert len(mid) == 1
    batch = _mk(spark, 5, 10, bump=3.0).unionByName(
        _mk(spark, 2990, 2995, bump=3.0)
    )
    lh.merge(spark, root, batch, key="k")
    after = {f["path"] for f in lh.snapshot(root)["files"]}
    assert mid <= after, "middle file must carry over un-rewritten"
    got = lh.read(spark, root)
    assert got.count() == 3000
    assert got.filter("v = k + 3.0").count() == 10


def test_optimize_zorder_prunes_box_predicates(spark, tmp_path):
    """OPTIMIZE ZORDER BY (x, y): after clustering, a box predicate on
    BOTH dimensions prunes most files via manifest stats; the same box
    against the row-order layout prunes (almost) nothing on the second
    dimension. Same rows either way."""
    root = str(tmp_path / "ztbl")
    # 64x64 grid in row-major order: x is the slow dimension, y cycles
    df = spark.range(4096).select(
        (F.col("id") / 64).cast("long").alias("x"),
        (F.col("id") % 64).alias("y"),
    )
    lh.create(spark, root, df.repartitionByRange(16, "id"),
              stat_cols=("x", "y"))
    box = {"x": (8, 15), "y": (8, 15)}
    _sel_row, skipped_roworder = lh.plan_files(root, box)
    lh.compact(spark, root, target_bytes=1 << 10, zorder_cols=("x", "y"))
    man = lh.snapshot(root)
    assert man["operation"] == "zorder"
    assert len(man["files"]) >= 8, "need several files for pruning to bite"
    sel_z, skipped_z = lh.plan_files(root, box)
    frac_z = skipped_z / (skipped_z + len(sel_z))
    assert frac_z >= 0.5, f"zorder should skip most files, got {frac_z}"
    assert skipped_z > skipped_roworder
    got = (
        lh.read_pruned(spark, root, box)
        .filter("x between 8 and 15 and y between 8 and 15")
        .count()
    )
    assert got == 64


def test_stream_sink_exactly_once(spark, tmp_path):
    """foreachBatch → lakehouse: drain a multi-batch file stream into the
    table, then prove the exactly-once contract — a replayed batch id is
    a no-op, the txn watermark survives unrelated commits (compaction),
    and a genuinely new batch id still lands."""
    src = str(tmp_path / "src")
    for i in range(3):  # three files → three micro-batches at 1 file/trigger
        _mk(spark, i * 100, (i + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    root = str(tmp_path / "sink_tbl")
    lh.create(spark, root, _mk(spark, 0, 0), stat_cols=("k",))  # empty v0
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(lh.stream_sink(root, "app1"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert lh.read(spark, root).count() == 300
    last = lh.txn_version(root, "app1")
    assert last >= 0
    # replay of an already-committed batch: NO-OP
    assert lh.append_stream_batch(root, _mk(spark, 0, 100), "app1", last) is None
    assert lh.read(spark, root).count() == 300
    # the watermark survives an unrelated commit (compaction)
    lh.compact(spark, root, target_bytes=1 << 30)
    assert lh.txn_version(root, "app1") == last
    assert lh.append_stream_batch(root, _mk(spark, 0, 100), "app1", last) is None
    # a NEW batch id commits; a second app has its own watermark
    assert lh.append_stream_batch(
        root, _mk(spark, 300, 310), "app1", last + 1
    ) is not None
    assert lh.read(spark, root).count() == 310
    assert lh.txn_version(root, "app2") == -1


def test_schema_evolution_add_column(spark, root):
    """ALTER TABLE ADD COLUMN as an O(1)-metadata commit: no file is
    rewritten, old rows read NULL for the new column, appends in the
    widened shape land, and time travel to the pre-evolution version
    still presents the narrow schema."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    files_before = [f["path"] for f in lh.snapshot(root)["files"]]
    wide = StructType(
        [
            StructField("k", LongType()),
            StructField("v", DoubleType()),
            StructField("tag", StringType(), nullable=True),
        ]
    )
    lh.evolve_schema(root, wide)
    assert [f["path"] for f in lh.snapshot(root)["files"]] == files_before
    head = lh.read(spark, root)
    assert head.schema.fieldNames() == ["k", "v", "tag"]
    assert head.filter("tag IS NULL").count() == 100  # old rows backfill NULL
    lh.append(
        spark,
        root,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("v"),
            F.lit("new").alias("tag"),
        ),
    )
    got = lh.read(spark, root)
    assert got.count() == 110 and got.filter("tag = 'new'").count() == 10
    assert lh.read(spark, root, 0).schema.fieldNames() == ["k", "v"]
    # guardrails: reorder/retype/drop or non-appended columns are rejected
    bad = StructType([StructField("v", DoubleType()), StructField("k", LongType())])
    with pytest.raises(ValueError, match="prefix"):
        lh.evolve_schema(root, bad)


def test_concurrent_appends_no_lost_update(spark, root):
    """Two writers appending through the same version race: appends
    commute, so the loser must rebase on the winner's head and re-commit
    — every row lands exactly once, no lost update, version count =
    create + both appends."""
    import threading

    lh.create(spark, root, _mk(spark, 0, 10), stat_cols=("k",))
    barrier = threading.Barrier(2)
    errors = []

    def writer(lo):
        try:
            df = _mk(spark, lo, lo + 10)
            barrier.wait()
            lh.append(spark, root, df)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    ts = [threading.Thread(target=writer, args=(lo,)) for lo in (100, 200)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert lh.latest_version(root) == 2
    got = sorted(r["k"] for r in lh.read(spark, root).collect())
    assert got == list(range(0, 10)) + list(range(100, 110)) + list(
        range(200, 210)
    )


def test_merge_null_update_values_overwrite(spark, root):
    """ADVICE r6 (medium): a NULL in an update column must OVERWRITE the
    old value — the coalesce-based merge silently kept it."""
    lh.create(spark, root, _mk(spark, 0, 20), stat_cols=("k",))
    batch = spark.createDataFrame([(5, None), (6, 99.0)], "k: long, v: double")
    lh.merge(spark, root, batch, key="k")
    got = {r["k"]: r["v"] for r in lh.read(spark, root).collect()}
    assert got[5] is None and got[6] == 99.0 and got[7] == 7.0


def test_merge_duplicate_update_keys_raise(spark, root):
    """ADVICE r6 (medium): duplicate keys in the update batch multiply
    matched target rows through the join — raise like Delta does."""
    lh.create(spark, root, _mk(spark, 0, 20), stat_cols=("k",))
    dup = spark.createDataFrame(
        [(5, 1.0), (5, 2.0), (9, 3.0)], "k: long, v: double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        lh.merge(spark, root, dup, key="k")
    assert lh.latest_version(root) == 0  # nothing committed
    assert lh.read(spark, root).count() == 20


def test_txlog_delta_checkpoint_bounded_cost(root, monkeypatch):
    """VERDICT r6 item 1: 1,000 commits at the log layer (synthetic file
    entries — the log is Spark-free). Asserts the three boundedness
    contracts: (a) commit bytes stay delta-sized (independent of total
    file count), (b) snapshot() reads one checkpoint + at most an
    interval of delta manifests — never the whole history, (c)
    latest_version probes forward from the checkpoint hint. Plus
    exactness: the folded head and pre-checkpoint time travel equal a
    serial dict replay of all 1,000 deltas."""
    import os

    schema = {"type": "struct", "fields": []}
    lh._commit(
        root,
        {
            "parent": -1,
            "operation": "create",
            "schema": schema,
            "stat_cols": ["k"],
            "txn": {},
            "add": [{"path": "data/f0", "rows": 1, "stats": {}}],
            "remove": [],
        },
    )
    expect = ["data/f0"]
    states = {0: list(expect)}
    cur = lh._head_meta(root)
    for i in range(1, 1001):
        add = [{"path": f"data/f{i}", "rows": 1, "stats": {}}]
        remove = [f"data/f{i - 50}"] if i % 7 == 0 and i >= 50 else []
        lh._commit(root, lh._child_manifest(cur, "append", add, remove))
        cur = lh._head_meta(root)
        expect = [p for p in expect if p not in set(remove)] + [
            e["path"] for e in add
        ]
        if i % 100 == 0:
            states[i] = list(expect)

    assert lh.latest_version(root) == 1000
    head = lh.snapshot(root)
    assert [e["path"] for e in head["files"]] == expect
    assert len(expect) > 800  # the table really grew

    # (a) delta manifests stay small while the table holds ~900 files
    sizes = [
        os.path.getsize(lh._manifest_path(root, v)) for v in range(990, 1001)
    ]
    assert max(sizes) < 1200, f"commit bytes grew with history: {sizes}"
    # checkpoints exist on the interval and are the only O(files) objects
    assert os.path.exists(lh._ckpt_path(root, 992))
    assert lh._last_checkpoint_hint(root) >= 992

    # (b) snapshot reads ≤ 1 checkpoint + interval deltas + head probe
    reads = {"n": 0}
    real = lh._read_json

    def counting(path):
        reads["n"] += 1
        return real(path)

    monkeypatch.setattr(lh, "_read_json", counting)
    lh.snapshot(root, 1000)
    assert reads["n"] <= lh.CHECKPOINT_INTERVAL + 3, reads["n"]
    # (c) latest_version is hint + forward probes, not a full listing
    reads["n"] = 0
    assert lh.latest_version(root) == 1000
    assert reads["n"] <= 2
    monkeypatch.undo()

    # time travel to pre-checkpoint versions replays exactly
    for v, want in states.items():
        assert [e["path"] for e in lh.snapshot(root, v)["files"]] == want


def test_txlog_checkpointed_history_reads_with_spark(spark, tmp_path,
                                                     monkeypatch):
    """Checkpoint folding under REAL commits: shrink the interval so a
    short create/append/merge/compact history crosses several
    checkpoints, then every version must read its exact at-commit state
    (including versions whose nearest checkpoint is above them)."""
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 3)
    root = str(tmp_path / "ckpt_tbl")
    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    counts = {0: 100}
    lh.append(spark, root, _mk(spark, 100, 200))
    counts[1] = 200
    lh.merge(spark, root, _mk(spark, 0, 5, bump=500.0), key="k")
    counts[2] = 200
    lh.append(spark, root, _mk(spark, 200, 250))
    counts[3] = 250
    lh.compact(spark, root, target_bytes=1 << 30)
    counts[4] = 250
    lh.append(spark, root, _mk(spark, 250, 260))
    counts[5] = 260
    assert os.path.exists(lh._ckpt_path(root, 3))
    for v, n in counts.items():
        assert lh.read(spark, root, v).count() == n, f"version {v}"
    assert lh.read(spark, root, 2).filter("v >= 500.0").count() == 5
    assert lh.read(spark, root, 1).filter("v >= 500.0").count() == 0


def test_delete_cow_with_prune(spark, root):
    """COW DELETE (r7): only stat-overlapping candidate files rewrite;
    out-of-bounds files carry verbatim; prior versions keep the rows."""
    lh.create(spark, root, _mk(spark, 0, 1000).coalesce(1), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 1000, 2000).coalesce(1))
    lh.append(spark, root, _mk(spark, 2000, 3000).coalesce(1))
    untouched = {
        f["path"] for f in lh.snapshot(root)["files"]
        if f["stats"]["k"][0] >= 1000
    }
    assert len(untouched) == 2
    lh.delete(spark, root, "k % 2 = 0 AND k < 1000", prune={"k": (None, 999)})
    after = {f["path"] for f in lh.snapshot(root)["files"]}
    assert untouched <= after, "non-overlapping files must carry verbatim"
    got = lh.read(spark, root)
    assert got.count() == 2500
    assert got.filter("k < 1000 AND k % 2 = 0").count() == 0
    assert got.filter("k >= 1000").count() == 2000  # untouched rows intact
    assert lh.read(spark, root, 2).count() == 3000  # time travel keeps them
    # delete with no matches in candidates is still a valid commit
    lh.delete(spark, root, "k = -1", prune={"k": (None, -1)})
    assert lh.read(spark, root).count() == 2500


def test_delete_null_predicate_rows_survive(spark, root):
    """SQL DELETE three-valued semantics: rows where the predicate is
    NULL are NOT matched and must survive (code-review r7 finding — a
    bare NOT(pred) filter silently dropped them)."""
    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 9.0), (3, None)], "k: long, v: double"
    )
    lh.create(spark, root, df, stat_cols=("k",))
    lh.delete(spark, root, "v > 5.0")
    got = sorted((r["k"], r["v"]) for r in lh.read(spark, root).collect())
    assert got == [(0, 1.0), (1, None), (3, None)]


def test_restore_is_metadata_only(spark, root):
    """RESTORE (r7): the head becomes the target version's exact state
    via a pure-metadata commit — no data file written; history intact;
    vacuumed targets are refused."""
    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 100, 200))
    lh.merge(spark, root, _mk(spark, 0, 5, bump=900.0), key="k")
    n_files_before = sum(
        len(files) for _, _, files in os.walk(os.path.join(root, "data"))
    )
    v = lh.restore(root, 1)
    n_files_after = sum(
        len(files) for _, _, files in os.walk(os.path.join(root, "data"))
    )
    assert n_files_after == n_files_before  # metadata-only
    assert v == 3 and lh.latest_version(root) == 3
    head = lh.read(spark, root)
    assert head.count() == 200 and head.filter("v >= 900").count() == 0
    assert lh.read(spark, root, 2).filter("v >= 900").count() == 5  # audit
    # restore across a compact re-adds the dropped file entries
    lh.compact(spark, root, target_bytes=1 << 30)
    lh.restore(root, 1)
    assert lh.read(spark, root).count() == 200
    # vacuumed target refused
    lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        lh.restore(root, 2)


def test_feed_stream_incremental_and_exactly_once(spark, tmp_path):
    """lakehouse_feed streaming source (r7): one drain consumes the
    whole history; a SECOND drain against the same checkpoint consumes
    ONLY commits made in between (offsets = version ints in the engine
    checkpoint); compaction adds are skipped (no logical change)."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream

    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    lh.create(spark, root, _mk(spark, 0, 50), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 50, 80))

    def drain():
        # parquet sink: the recoverable-checkpoint path (memory sink
        # cannot resume), i.e. the real incremental-consumer shape
        q = (
            read_feed_stream(spark, root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    first = drain()
    assert len(first) == 80
    assert {r["_change"] for r in first} == {"insert"}
    assert sorted({r["_commit_version"] for r in first}) == [0, 1]

    # between drains: a compact (must NOT stream) and a real append
    lh.compact(spark, root, target_bytes=1 << 30)
    lh.append(spark, root, _mk(spark, 80, 90))
    second = drain()
    assert len(second) == 90, "restart must consume only the new commit"
    new = [r for r in second if r["_commit_version"] > 1]
    assert {r["_commit_version"] for r in new} == {3}
    assert sorted(r["k"] for r in new) == list(range(80, 90))


def test_feed_stream_delete_and_restore_tags(spark, tmp_path):
    """COW delete post-images stream as delete_postimage; restore's
    re-added files stream tagged restore."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream
    from vcf2db_spark.streaming.pipelines import run_to_memory

    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 30).coalesce(1), stat_cols=("k",))
    lh.delete(spark, root, "k >= 20")
    lh.restore(root, 0)
    out = run_to_memory(read_feed_stream(spark, root), "feed_dr").collect()
    by = {}
    for r in out:
        by.setdefault(r["_change"], []).append(r["k"])
    assert sorted(by["insert"]) == list(range(30))
    assert sorted(by["delete_postimage"]) == list(range(20))  # survivors
    # restore re-added the ORIGINAL create file (dropped by the delete)
    assert sorted(by["restore"]) == list(range(30))


def test_feed_stream_schema_evolution_null_backfill(spark, tmp_path):
    """Files written BEFORE an evolve_schema stream with NULL for the
    appended column (schema pinned at stream start, cast per file)."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream
    from vcf2db_spark.streaming.pipelines import run_to_memory

    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 10), stat_cols=("k",))
    wide = StructType(
        [
            StructField("k", LongType()),
            StructField("v", DoubleType()),
            StructField("w", DoubleType(), nullable=True),
        ]
    )
    lh.evolve_schema(root, wide)
    lh.append(
        spark,
        root,
        spark.range(10, 15).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id*2 AS DOUBLE) AS w"
        ),
    )
    out = run_to_memory(read_feed_stream(spark, root), "feed_evo").collect()
    assert len(out) == 15
    olds = [r for r in out if r["k"] < 10]
    news = [r for r in out if r["k"] >= 10]
    assert all(r["w"] is None for r in olds)
    assert all(r["w"] == r["k"] * 2.0 for r in news)


def _run_concurrency_seed(spark, tmp_path, monkeypatch, seed: int) -> None:
    """One seeded interleaving of append / MERGE / OPTIMIZE /
    evolve_schema where a phantom writer steals the version slot ahead
    of roughly half the commits (the real race, deterministically
    scheduled). Asserts the three VERDICT r6 item-3 properties:
    (a) every CommitConflict resolves per contract — appends/compacts
        rebase internally, merges surface and re-run cleanly;
    (b) the final snapshot equals a serial dict replay of the committed
        operations in commit order (serializable history);
    (c) vacuum never deletes a file a retained version references."""
    import random

    rng = random.Random(seed)
    root = str(tmp_path / f"conc{seed}")
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 3)

    cols = ["v"]
    replica: dict[int, dict[str, float | None]] = {}

    def schema_str() -> str:
        return "k: long, " + ", ".join(f"{c}: double" for c in cols)

    def to_df(rows: dict[int, dict[str, float | None]]):
        data = [
            tuple([k] + [vals.get(c) for c in cols])
            for k, vals in sorted(rows.items())
        ]
        return spark.createDataFrame(data, schema_str())

    init = {k: {"v": float(k)} for k in range(10)}
    lh.create(spark, root, to_df(init), stat_cols=("k",))
    replica.update(init)
    next_k = 10

    # phantom slot-stealer: fires once per flagged op, on the FIRST
    # commit attempt only — retries/re-runs then see a clean head
    real_commit = lh._commit
    pending = {"steal": False}

    def stealing_commit(r, man):
        if pending["steal"]:
            pending["steal"] = False
            head = lh._head_meta(r)
            real_commit(r, lh._child_manifest(head, "append", []))
        return real_commit(r, man)

    monkeypatch.setattr(lh, "_commit", stealing_commit)

    for _ in range(5):
        op = rng.choices(
            ["append", "merge", "compact", "evolve", "delete"],
            weights=[4, 4, 1, 1, 2],
        )[0]
        pending["steal"] = rng.random() < 0.5
        if op == "append":
            rows = {
                k: {c: float(rng.randint(0, 99)) for c in cols}
                for k in range(next_k, next_k + rng.randint(1, 4))
            }
            next_k += len(rows)
            lh.append(spark, root, to_df(rows))
            replica.update(rows)
        elif op == "merge":
            keys = rng.sample(
                sorted(replica), min(len(replica), rng.randint(1, 5))
            )
            if rng.random() < 0.5:
                keys.append(next_k)  # an insert alongside the updates
                next_k += 1
            rows = {
                k: {
                    c: (None if rng.random() < 0.2 else float(rng.randint(0, 99)))
                    for c in cols
                }
                for k in keys
            }
            try:
                lh.merge(spark, root, to_df(rows), key="k")
            except lh.CommitConflict:
                lh.merge(spark, root, to_df(rows), key="k")  # re-run per contract
            for k, vals in rows.items():
                replica[k] = dict(vals)
        elif op == "delete":
            m = rng.randint(3, 6)
            pred = f"k % {m} = 0"
            try:
                lh.delete(spark, root, pred)
            except lh.CommitConflict:  # rewrite read-set invalidated: re-run
                lh.delete(spark, root, pred)
            for k in [k for k in replica if k % m == 0]:
                del replica[k]
        elif op == "compact":
            try:
                lh.compact(spark, root, target_bytes=1 << 30)
            except lh.CommitConflict:  # rewrite read-set invalidated: re-run
                lh.compact(spark, root, target_bytes=1 << 30)
        else:
            cols.append(f"c{len(cols) + 1}")
            from pyspark.sql.types import StructType

            wide = StructType.fromDDL(schema_str())
            try:
                lh.evolve_schema(root, wide)
            except lh.CommitConflict:
                lh.evolve_schema(root, wide)
            for vals in replica.values():
                vals.setdefault(cols[-1], None)

    monkeypatch.setattr(lh, "_commit", real_commit)

    # (b) final snapshot == serial replay of committed ops
    got = {
        r["k"]: {c: r[c] for c in cols}
        for r in lh.read(spark, root).collect()
    }
    assert got == replica, f"seed={seed}"

    # (c) vacuum keeps every file a retained version references
    newest = lh.latest_version(root)
    retained = set()
    for v in range(max(0, newest - 2), newest + 1):
        retained.update(f["path"] for f in lh.snapshot(root, v)["files"])
    lh.vacuum(root, retain_versions=3, min_age_seconds=0.0)
    missing = [p for p in retained if not os.path.exists(os.path.join(root, p))]
    assert not missing, f"seed={seed} vacuumed live files: {missing}"
    assert {
        r["k"]: {c: r[c] for c in cols}
        for r in lh.read(spark, root).collect()
    } == replica


# seeds 0-1 run in the default suite; 2-9 are opt-in (driver-window
# fit); the 100-seed sweep stays behind SPARK_GRAFT_LAKEHOUSE_SEEDS
@pytest.mark.parametrize(
    "seed",
    [0, 1]
    + [pytest.param(s, marks=pytest.mark.slow_sweep) for s in range(2, 10)],
)
def test_concurrency_property(spark, tmp_path, monkeypatch, seed):
    _run_concurrency_seed(spark, tmp_path, monkeypatch, seed)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_LAKEHOUSE_SEEDS"),
    reason="full 100-seed sweep is opt-in (SPARK_GRAFT_LAKEHOUSE_SEEDS=1); "
    "seeds 0-9 run unconditionally above",
)
def test_concurrency_property_full_sweep(spark, tmp_path, monkeypatch):
    for seed in range(10, 100):
        _run_concurrency_seed(spark, tmp_path, monkeypatch, seed)
        monkeypatch.undo()


def test_merge_conflict_surfaces_not_rebases(spark, root, monkeypatch):
    """A commit that lands between a MERGE's snapshot read and its
    publish invalidates the merge's read set — the merge must raise
    CommitConflict (caller re-runs), never silently rebase."""
    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    real_commit = lh._commit
    fired = {"done": False}

    def racing_commit(r, man):
        if not fired["done"] and man.get("operation") == "merge":
            fired["done"] = True
            # a concurrent writer wins the version slot first
            head = lh.snapshot(r)
            real_commit(r, lh._child_manifest(head, "append", []))
        return real_commit(r, man)

    monkeypatch.setattr(lh, "_commit", racing_commit)
    with pytest.raises(lh.CommitConflict):
        lh.merge(spark, root, _mk(spark, 0, 5, bump=9.0), key="k")


# -- round 8: txlog retention / expiry + bounded deep history ---------------


def _synthetic_history(root, n_commits, interval_states=3):
    """Spark-free log-layer history: create + n appends with periodic
    removes; returns {version: expected file-path list}."""
    schema = {"type": "struct", "fields": []}
    lh._commit(
        root,
        {
            "parent": -1,
            "operation": "create",
            "schema": schema,
            "stat_cols": ["k"],
            "txn": {},
            "add": [{"path": "data/f0", "rows": 1, "stats": {}}],
            "remove": [],
        },
    )
    expect = ["data/f0"]
    states = {0: list(expect)}
    cur = lh._head_meta(root)
    for i in range(1, n_commits + 1):
        add = [{"path": f"data/f{i}", "rows": 1, "stats": {}}]
        remove = [f"data/f{i - 8}"] if i % 3 == 0 and i >= 8 else []
        lh._commit(root, lh._child_manifest(cur, "append", add, remove))
        cur = lh._head_meta(root)
        expect = [p for p in expect if p not in set(remove)] + [
            e["path"] for e in add
        ]
        states[i] = list(expect)
    return states


def test_expire_log_three_generations(root, monkeypatch):
    """VERDICT r7 item 1: log expiry across three horizon generations.
    (a) expired delta manifests and superseded checkpoints are gone from
    disk; (b) every retained version still snapshots exactly, with reads
    bounded by checkpoint + interval (counted); (c) expired-version
    access raises the clear retention error; (d) the horizon never moves
    backward and re-runs are idempotent."""
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 4)
    states = _synthetic_history(root, 30)

    # generation 1: keep the newest 16 versions → horizon 15
    assert lh.expire_log(root, retain_versions=16) > 0
    assert lh.log_horizon(root) == 15
    for v in range(15):  # (a) expired objects gone
        assert not os.path.exists(lh._manifest_path(root, v))
        assert not os.path.exists(lh._ckpt_path(root, v))
    assert os.path.exists(lh._ckpt_path(root, 15))  # horizon checkpoint
    with pytest.raises(ValueError, match="retention horizon"):  # (c)
        lh.snapshot(root, 14)
    with pytest.raises(ValueError, match="retention horizon"):
        lh.snapshot(root, 0)

    # (b) every retained version folds exactly, from a checkpoint at or
    # above the horizon — reads stay ≤ markers + 1 ckpt + interval deltas
    reads = {"n": 0}
    real = lh._read_json

    def counting(path):
        reads["n"] += 1
        return real(path)

    monkeypatch.setattr(lh, "_read_json", counting)
    for v in range(15, 31):
        reads["n"] = 0
        got = [e["path"] for e in lh.snapshot(root, v)["files"]]
        assert got == states[v], f"version {v}"
        assert reads["n"] <= lh.CHECKPOINT_INTERVAL + 4, (v, reads["n"])
    monkeypatch.setattr(lh, "_read_json", real)

    # generation 2: grow, expire again — horizon advances
    cur = lh._head_meta(root)
    expect = list(states[30])
    for i in range(31, 41):
        add = [{"path": f"data/f{i}", "rows": 1, "stats": {}}]
        lh._commit(root, lh._child_manifest(cur, "append", add))
        cur = lh._head_meta(root)
        expect = expect + [e["path"] for e in add]
        states[i] = list(expect)
    lh.expire_log(root, retain_versions=16)
    assert lh.log_horizon(root) == 25
    # (d) a LARGER retention never moves the horizon backward
    assert lh.expire_log(root, retain_versions=40) == 0
    assert lh.log_horizon(root) == 25
    assert [e["path"] for e in lh.snapshot(root, 25)["files"]] == states[25]

    # generation 3: tighten hard
    lh.expire_log(root, retain_versions=4)
    assert lh.log_horizon(root) == 37
    with pytest.raises(ValueError, match="retention horizon"):
        lh.snapshot(root, 36)
    assert lh.latest_version(root) == 40
    for v in range(37, 41):
        assert [e["path"] for e in lh.snapshot(root, v)["files"]] == states[v]


def test_expire_log_then_spark_reads_and_appends(spark, root, monkeypatch):
    """Retention under REAL commits: after expiry the retained versions
    read their exact row states through Spark and the table still
    accepts appends (head metadata never needs expired manifests)."""
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 3)
    lh.create(spark, root, _mk(spark, 0, 50), stat_cols=("k",))
    for i in range(1, 8):
        lh.append(spark, root, _mk(spark, 50 * i, 50 * (i + 1)))
    lh.expire_log(root, retain_versions=3)  # horizon 5
    assert lh.log_horizon(root) == 5
    with pytest.raises(ValueError, match="retention horizon"):
        lh.read(spark, root, 2).count()
    for v in (5, 6, 7):
        assert lh.read(spark, root, v).count() == 50 * (v + 1)
    lh.append(spark, root, _mk(spark, 400, 410))
    assert lh.read(spark, root).count() == 410


def test_latest_version_listing_fallback(root):
    """ADVICE r7: a hint pointing at a missing manifest (truncated or
    partially-copied log) must fall back to a directory listing, not
    report the table as empty."""
    _synthetic_history(root, 5)
    # corrupt the hint: point it far beyond the real head
    with open(lh._last_ckpt_path(root), "w") as fh:
        fh.write('{"version": 99}')
    assert lh.latest_version(root) == 5
    # snapshot of the head still folds correctly through the fallback
    assert lh.snapshot(root)["version"] == 5


def test_snapshot_hint_locates_checkpoint_past_scan_window(root, monkeypatch):
    """ADVICE r7: when no checkpoint lives inside the backward-scan
    window (interval raised after the fact, crashed checkpoints), the
    _last_checkpoint hint is consulted before degrading to a full fold."""
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 4)
    states = _synthetic_history(root, 80)
    # delete every checkpoint above v4 — the scan window (max(16,64)=64)
    # below v=80 reaches v16, missing them all
    for v in range(5, 81):
        try:
            os.unlink(lh._ckpt_path(root, v))
        except FileNotFoundError:
            pass
    lh._publish_int_forward(root, lh._last_ckpt_path(root), 4)
    with open(lh._last_ckpt_path(root), "w") as fh:
        fh.write('{"version": 4}')  # force the hint BACK to v4
    got = [e["path"] for e in lh.snapshot(root, 80)["files"]]
    assert got == states[80]
    # scan-limit tracks the interval at call time (ADVICE r7)
    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 256)
    assert lh._ckpt_scan_limit() == 1024


def test_vacuum_records_watermark_and_restore_uses_it(spark, root):
    """VERDICT r7 item 1: restore's vacuumed-target guard is ONE marker
    read (the watermark vacuum records), not an O(files) exists sweep."""
    lh.create(spark, root, _mk(spark, 0, 100), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 100, 200))
    lh.compact(spark, root, target_bytes=1 << 30)
    assert lh.vacuum_watermark(root) == -1  # never vacuumed
    lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)
    assert lh.vacuum_watermark(root) == 2
    with pytest.raises(ValueError, match="vacuum"):
        lh.restore(root, 1)
    # at-or-above the watermark restores without any file stats
    lh.append(spark, root, _mk(spark, 200, 210))
    lh.restore(root, 2)
    assert lh.read(spark, root).count() == 200


# -- round 8: feed admission control + data-loss guard ----------------------


def test_feed_max_files_per_trigger(spark, tmp_path):
    """VERDICT r7 item 2: maxFilesPerTrigger bounds every micro-batch to
    N files from the FIRST trigger (cold start drains incrementally, not
    the whole history as batch 0), with exactly-once row totals."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream

    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 10).coalesce(1), stat_cols=("k",))
    for i in range(1, 4):
        lh.append(spark, root, _mk(spark, 10 * i, 10 * (i + 1)).coalesce(1))

    q = (
        read_feed_stream(spark, root, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("feed_mft")
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM feed_mft").collect()
        # exactly-once: all 40 keys, no duplicates
        assert sorted(r["k"] for r in rows) == list(range(40))
        batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(batches) >= 4, (
            f"expected >=4 bounded batches, got "
            f"{[(p['batchId'], p['numInputRows']) for p in q.recentProgress]}"
        )
        assert all(p["numInputRows"] <= 10 for p in batches)
    finally:
        q.stop()


def test_feed_vacuumed_history_data_loss_guard(spark, tmp_path):
    """ADVICE r7 (medium): replaying history whose add-files were
    vacuumed raises the actionable error by default; with
    failOnDataLoss=false the lost files are skipped and the surviving
    versions still stream exactly."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream
    from vcf2db_spark.streaming.pipelines import run_to_memory

    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 10).coalesce(1), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 10, 20).coalesce(1))
    lh.compact(spark, root, target_bytes=1 << 30)  # v2 carries all rows
    lh.append(spark, root, _mk(spark, 20, 30).coalesce(1))  # v3
    lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)  # v0/v1 files gone

    with pytest.raises(Exception, match="vacuumed"):
        run_to_memory(read_feed_stream(spark, root), "feed_loss1").collect()

    out = run_to_memory(
        read_feed_stream(spark, root, fail_on_data_loss=False), "feed_loss2"
    ).collect()
    # v0/v1 lost (skipped), v2 is a compact (not a logical change), v3 streams
    assert sorted(r["k"] for r in out) == list(range(20, 30))
    assert {r["_commit_version"] for r in out} == {3}


# -- round 8: cross-process commit atomicity property -----------------------


def _xproc_writer(args):
    """One writer process: commutative appends with rebase-on-conflict.
    Pure log-layer (no Spark) — the claim under test is os.link
    put-if-absent atomicity ACROSS processes."""
    root, wid, n_commits, seed = args
    import random
    import time as _t

    from vcf2db_spark.sinks import lakehouse as lh2

    rng = random.Random(seed * 1000 + wid)
    out = []
    for j in range(n_commits):
        add = [{"path": f"data/w{wid}_{j}", "rows": 1, "stats": {}}]
        while True:
            head = lh2._head_meta(root)
            try:
                v = lh2._commit(
                    root, lh2._child_manifest(head, "append", add)
                )
                out.append((v, add[0]["path"]))
                break
            except lh2.CommitConflict:
                _t.sleep(rng.random() * 0.002)
    return out


def test_cross_process_concurrent_appends(tmp_path):
    """VERDICT r7 item 7: the 100-seed interleaving property runs
    threads in one process; this proves the os.link atomicity claim
    ACROSS real processes — 3 writers × 12 commutative appends per
    seed, 20 seeds on a reused fork pool. Serializable history: every
    version slot won by exactly one writer, no lost update, final
    snapshot = union of all adds."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Pool(3) as pool:
        for seed in range(20):
            root = str(tmp_path / f"x{seed}")
            _synthetic_history(root, 0)  # just the create at v0
            results = pool.map(
                _xproc_writer,
                [(root, wid, 12, seed) for wid in range(3)],
            )
            flat = [item for sub in results for item in sub]
            versions = [v for v, _ in flat]
            assert len(flat) == 36, f"seed={seed}"
            assert sorted(versions) == list(range(1, 37)), (
                f"seed={seed}: version slots not uniquely won: {versions}"
            )
            paths = {p for _, p in flat}
            head = {e["path"] for e in lh.snapshot(root)["files"]}
            assert head == paths | {"data/f0"}, f"seed={seed}: lost update"
            assert lh.latest_version(root) == 36


def test_feed_max_bytes_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger (r8): manifests record per-file bytes; the
    byte cap bounds each micro-batch (≥1 file so the stream always
    progresses), and files/bytes caps compose — whichever binds first."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream

    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 10).coalesce(1), stat_cols=("k",))
    for i in range(1, 4):
        lh.append(spark, root, _mk(spark, 10 * i, 10 * (i + 1)).coalesce(1))
    entries = lh.snapshot(root)["files"]
    assert all(e["bytes"] > 0 for e in entries)

    q = (
        read_feed_stream(spark, root, max_bytes_per_trigger=1)
        .writeStream.format("memory")
        .queryName("feed_mbt")
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM feed_mbt").collect()
        assert sorted(r["k"] for r in rows) == list(range(40))
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 4  # 1-byte cap → one file per batch
        assert all(p["numInputRows"] <= 10 for p in batches)
    finally:
        q.stop()


def test_feed_from_expired_history_raises_clearly(spark, tmp_path,
                                                  monkeypatch):
    """A feed startVersion below the retention horizon surfaces the
    horizon in the error, not a raw FileNotFoundError."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream
    from vcf2db_spark.streaming.pipelines import run_to_memory

    monkeypatch.setattr(lh, "CHECKPOINT_INTERVAL", 2)
    root = str(tmp_path / "tbl")
    lh.create(spark, root, _mk(spark, 0, 10).coalesce(1), stat_cols=("k",))
    for i in range(1, 6):
        lh.append(spark, root, _mk(spark, 10 * i, 10 * (i + 1)).coalesce(1))
    lh.expire_log(root, retain_versions=2)  # horizon 4
    with pytest.raises(Exception, match="retention horizon"):
        run_to_memory(read_feed_stream(spark, root), "feed_exp").collect()
    # starting at the horizon's delta window still streams
    out = run_to_memory(
        read_feed_stream(spark, root, start_version=3), "feed_exp2"
    ).collect()
    assert sorted(r["k"] for r in out) == list(range(40, 60))


def _xproc_stream_writer(args):
    """Replay-storm writer: every process tries to commit the SAME
    (app, batch) sequence — the cross-process exactly-once claim of the
    streaming sink's txn watermark (log layer; no Spark in children)."""
    root, wid, n_batches = args
    from vcf2db_spark.sinks import lakehouse as lh2

    committed = []
    for batch_id in range(n_batches):
        while True:
            cur = lh2._head_meta(root)
            if int(cur.get("txn", {}).get("app", -1)) >= batch_id:
                break  # another process won this batch — exactly-once skip
            man = lh2._child_manifest(
                cur, "stream_append",
                [{"path": f"data/b{batch_id}_w{wid}", "rows": 1, "stats": {}}],
            )
            man["txn"] = {**man["txn"], "app": batch_id}
            try:
                lh2._commit(root, man)
                committed.append(batch_id)
                break
            except lh2.CommitConflict:
                continue  # re-read head; watermark check decides
    return committed


def test_cross_process_stream_batch_exactly_once(tmp_path):
    """3 processes replay the SAME 10 micro-batch ids against one table
    (the restart/replay storm): the (app, batch) watermark in the
    atomic manifest publish must land every batch EXACTLY once across
    processes — no batch duplicated, none lost. 10 seeds."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Pool(3) as pool:
        for seed in range(10):
            root = str(tmp_path / f"sx{seed}")
            _synthetic_history(root, 0)
            results = pool.map(
                _xproc_stream_writer, [(root, wid, 10) for wid in range(3)]
            )
            all_committed = sorted(b for sub in results for b in sub)
            assert all_committed == list(range(10)), (
                f"seed={seed}: batches not exactly-once: {all_committed}"
            )
            head = lh.snapshot(root)
            batch_files = [
                e["path"] for e in head["files"] if e["path"].startswith("data/b")
            ]
            assert len(batch_files) == 10, f"seed={seed}: {batch_files}"
            assert int(head["txn"]["app"]) == 9


# ---- bloom-filter data skipping (r8) ----------------------------------------


def _mk_scattered(spark, lo, hi, files=8):
    """Rows whose k range spans EVERY file (hash-distributed on a second
    column) — the shape min/max stats cannot prune for k equality."""
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 131).alias("g"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("tag"),
        )
        .repartition(files, "g")
    )


def test_bloom_sidecars_skip_files_never_rows(spark, root):
    """Point lookup on an unclustered key: stats keep everything, blooms
    skip all-but-the-containing file(s), and the result stays exact."""
    lh.create(
        spark, root, _mk_scattered(spark, 0, 4000),
        stat_cols=("k",), bloom_cols=("k",),
    )
    n_files = len(lh.snapshot(root)["files"])
    assert n_files >= 4
    kept, skipped_stats, skipped_bloom = lh.plan_files_bloom(root, {"k": 1234})
    # stats are powerless here (every file spans the k range)...
    assert skipped_stats == 0
    # ...blooms drop almost everything (≈1% fp: allow 1 stray keep)
    assert skipped_bloom >= n_files - 2
    rows = lh.read_point(spark, root, {"k": 1234}).collect()
    assert [(r["k"], r["g"]) for r in rows] == [(1234, 1234 % 131)]


def test_bloom_no_false_negatives_randomized(spark, root):
    """Every present key must be found — bloom skipping may only ever
    drop files that DEFINITELY lack the key (the bloom contract)."""
    import random

    lh.create(
        spark, root, _mk_scattered(spark, 0, 3000),
        stat_cols=(), bloom_cols=("k", "tag"),
    )
    rng = random.Random(8)
    keys = rng.sample(range(3000), 60)
    for k in keys:
        got = lh.read_point(spark, root, {"k": k}).collect()
        assert len(got) == 1 and got[0]["k"] == k
    # conjunctive probe: both columns must pass
    got = lh.read_point(spark, root, {"k": 7, "tag": "t2"}).collect()
    assert [(r["k"], r["tag"]) for r in got] == [(7, "t2")]
    assert lh.read_point(spark, root, {"k": 7, "tag": "t3"}).count() == 0


def test_bloom_absent_keys_skip_without_stats_help(spark, root):
    """Keys inside the stats range but absent from the table: stats keep
    every file; blooms must skip nearly all lookups outright."""
    # only even keys exist — odd probes are in-range but absent
    df = (
        spark.range(0, 2000)
        .select((F.col("id") * 2).alias("k"), (F.col("id") % 97).alias("g"))
        .repartition(8, "g")
    )
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    n_files = len(lh.snapshot(root)["files"])
    kept_total = 0
    probes = list(range(1, 400, 8))  # odd → absent
    for k in probes:
        kept, _, _ = lh.plan_files_bloom(root, {"k": k})
        kept_total += len(kept)
    # expectation is fp_rate × files per probe ≈ 0.01 × 8; allow 10× slack
    assert kept_total <= max(4, int(0.1 * n_files * len(probes)))


def test_bloom_carried_through_all_writers(spark, root):
    """bloom_cols is table metadata: append / merge / delete / compact
    all build sidecars for the files they write."""
    lh.create(
        spark, root, _mk_scattered(spark, 0, 1000, files=4),
        stat_cols=("k",), bloom_cols=("k",),
    )
    lh.append(spark, root, _mk_scattered(spark, 1000, 1500, files=4))
    upd = _mk_scattered(spark, 10, 20, files=1).withColumn(
        "tag", F.lit("merged")
    )
    lh.merge(spark, root, upd, key="k")
    lh.delete(spark, root, "k >= 1400")
    lh.compact(spark, root)
    man = lh.snapshot(root)
    for e in man["files"]:
        assert os.path.exists(
            lh._bloom_sidecar_path(root, e["path"])
        ), f"sidecar missing for {e['path']} after rewrite chain"
    got = lh.read_point(spark, root, {"k": 15}).collect()
    assert [(r["k"], r["tag"]) for r in got] == [(15, "merged")]
    assert lh.read_point(spark, root, {"k": 1450}).count() == 0  # deleted


def test_bloom_missing_sidecar_is_conservative(spark, root):
    """A lost/never-built sidecar keeps the file — degraded pruning,
    never a lost row (same contract as missing footer stats)."""
    lh.create(
        spark, root, _mk_scattered(spark, 0, 1000),
        stat_cols=(), bloom_cols=("k",),
    )
    man = lh.snapshot(root)
    victim = man["files"][0]["path"]
    os.unlink(lh._bloom_sidecar_path(root, victim))
    kept, _, _ = lh.plan_files_bloom(root, {"k": 123456789})  # absent key
    assert [e["path"] for e in kept] == [victim]  # only the blind file stays
    for k in (0, 1, 999):
        assert lh.read_point(spark, root, {"k": k}).count() == 1


def test_vacuum_reclaims_bloom_sidecars(spark, root):
    lh.create(
        spark, root, _mk_scattered(spark, 0, 500, files=4),
        stat_cols=(), bloom_cols=("k",),
    )
    old_files = [e["path"] for e in lh.snapshot(root)["files"]]
    lh.compact(spark, root)  # rewrites everything; old files unreferenced
    removed = lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)
    assert removed == len(old_files)
    for p in old_files:
        assert not os.path.exists(lh._bloom_sidecar_path(root, p))
    # surviving files keep their sidecars and still probe
    for e in lh.snapshot(root)["files"]:
        assert os.path.exists(lh._bloom_sidecar_path(root, e["path"]))
    assert lh.read_point(spark, root, {"k": 42}).count() == 1


def test_bloom_tables_without_bloom_cols_unaffected(spark, root):
    """No bloom_cols → no sidecars, no extra scan at write time, and the
    probe degrades to stats-only planning."""
    lh.create(spark, root, _mk_scattered(spark, 0, 500), stat_cols=("k",))
    assert not os.path.isdir(os.path.join(root, "_bloom"))
    kept, skipped_stats, skipped_bloom = lh.plan_files_bloom(root, {"k": 7})
    assert skipped_bloom == 0 and len(kept) + skipped_stats == len(
        lh.snapshot(root)["files"]
    )
    assert lh.read_point(spark, root, {"k": 7}).count() == 1


# ---- partial OPTIMIZE (r8: Delta minFileSize behavior) ----------------------


def test_compact_is_partial_carries_packed_files(spark, root):
    """OPTIMIZE must rewrite only under-sized files: the already-packed
    file's manifest entry carries VERBATIM (same path on disk), and the
    table still reads exactly once per row."""
    lh.create(spark, root, _mk(spark, 0, 1000).coalesce(1), stat_cols=("k",))
    big = lh.snapshot(root)["files"][0]
    assert big["rows"] == 1000
    # three small appends — the classic streaming small-files shape
    for lo in (1000, 1010, 1020):
        lh.append(spark, root, _mk(spark, lo, lo + 10).coalesce(1))
    v = lh.compact(spark, root, target_bytes=1 << 30,
                   min_file_bytes=big["bytes"])  # big file is "packed"
    man = lh.snapshot(root, v)
    paths = [e["path"] for e in man["files"]]
    assert big["path"] in paths, "packed file must carry verbatim"
    assert len(paths) == 2  # carried big + one packed bin
    assert lh.read(spark, root).count() == 1030
    assert lh.read(spark, root).select("k").distinct().count() == 1030


def test_compact_nothing_to_pack_is_a_no_op(spark, root):
    """<2 qualifying files → no commit at all (Delta: OPTIMIZE with no
    work writes nothing), so the log doesn't grow with empty commits."""
    lh.create(spark, root, _mk(spark, 0, 100).coalesce(1), stat_cols=("k",))
    v0 = lh.latest_version(root)
    assert lh.compact(spark, root, min_file_bytes=1) == v0
    assert lh.latest_version(root) == v0


def test_compact_zorder_remains_global(spark, root):
    """ZORDER is a clustering change — every file rewrites regardless of
    size (rows must relocate across the whole key space)."""
    lh.create(
        spark, root,
        spark.range(0, 1000).select(
            (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
        ).repartition(4),
        stat_cols=("x", "y"),
    )
    old = {e["path"] for e in lh.snapshot(root)["files"]}
    v = lh.compact(spark, root, target_bytes=1 << 10, zorder_cols=("x", "y"))
    new = {e["path"] for e in lh.snapshot(root, v)["files"]}
    assert not (old & new)


def test_history_audit_rows(spark, root):
    """DESCRIBE HISTORY: newest-first delta-manifest audit — operations,
    add/remove counts, restore target; bounded by limit and horizon."""
    lh.create(spark, root, _mk(spark, 0, 100).coalesce(1), stat_cols=("k",))
    lh.append(spark, root, _mk(spark, 100, 150).coalesce(1))
    lh.delete(spark, root, "k >= 140")
    lh.restore(root, 1)
    h = lh.history(root)
    assert [r["operation"] for r in h] == [
        "restore", "delete", "append", "create"
    ]
    assert h[0]["restored_version"] == 1
    assert h[2]["n_added"] == 1 and h[2]["rows_added"] == 50
    assert h[1]["n_removed"] >= 1
    assert [r["version"] for r in lh.history(root, limit=2)] == [3, 2]
    assert lh.history(str(root) + "_nope") == []


def test_merge_scope_refined_by_bloom(spark, root):
    """COW merge on a bloom-indexed UNCLUSTERED key: range containment
    alone would rewrite every file (each file's [min,max] spans the
    keyspace); the sidecar probe must narrow the rewrite to files that
    actually contain an update key, with results exactly unchanged."""
    df = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("g"),
            F.lit("orig").alias("tag"),
        )
        .repartition(8, "g")
    )
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    before = {e["path"] for e in lh.snapshot(root)["files"]}
    assert len(before) == 8
    # 3 update keys + 1 insert key — the keys land in ≤3 files
    upd = spark.createDataFrame(
        [(5, 0, "upd"), (700, 0, "upd"), (1400, 0, "upd"), (9999, 0, "new")],
        "k long, g long, tag string",
    )
    lh.merge(spark, root, upd, key="k")
    man = lh.snapshot(root)
    carried = {e["path"] for e in man["files"]} & before
    rewritten = len(before) - len(carried)
    assert rewritten <= 4, f"bloom scope failed: rewrote {rewritten}/8"
    # exactness: updates applied, insert present, everything else intact
    got = {r["k"]: r["tag"] for r in lh.read(spark, root).collect()}
    assert len(got) == 2001
    assert got[5] == got[700] == got[1400] == "upd" and got[9999] == "new"
    assert got[6] == "orig"


def test_merge_bloom_refinement_never_loses_updates(spark, root):
    """Randomized: every update key must land regardless of which files
    the probe rules out (the no-false-negative contract end-to-end)."""
    import random

    rng = random.Random(13)
    df = (
        spark.range(0, 1000)
        .select(F.col("id").alias("k"), (F.col("id") % 53).alias("g"))
        .repartition(6, "g")
    )
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    keys = rng.sample(range(1000), 25)
    upd = spark.createDataFrame([(k, -1) for k in keys], "k long, g long")
    lh.merge(spark, root, upd, key="k")
    got = {r["k"]: r["g"] for r in lh.read(spark, root).collect()}
    assert len(got) == 1000
    for k in keys:
        assert got[k] == -1, f"update for key {k} lost"
    missed = [k for k in range(1000) if k not in keys and got[k] != k % 53]
    assert not missed


def test_delete_rewrites_only_files_with_matches(spark, root):
    """Two-phase DELETE: the find-touched scan must narrow the rewrite
    to files actually holding a matching row — stats-candidate files
    with zero matches carry verbatim."""
    df = (
        spark.range(0, 800)
        .select(F.col("id").alias("k"), (F.col("id") % 8).alias("g"))
        .repartitionByRange(8, "g")  # equal g → same file; k spans files
    )
    lh.create(spark, root, df, stat_cols=("k",))
    before = {e["path"] for e in lh.snapshot(root)["files"]}
    assert len(before) >= 4
    lh.delete(spark, root, "g = 3")  # all matching rows live in ONE file
    man = lh.snapshot(root)
    carried = {e["path"] for e in man["files"]} & before
    assert len(before) - len(carried) == 1, "should rewrite exactly 1 file"
    got = lh.read(spark, root)
    assert got.count() == 700 and got.filter("g = 3").count() == 0
    # no-match predicate → pure no-op delta commit, nothing rewritten
    v = lh.delete(spark, root, "k > 100000")
    assert {e["path"] for e in lh.snapshot(root, v)["files"]} == {
        e["path"] for e in man["files"]
    }


# ---- bloom type contract (code-review r8 findings) --------------------------


def test_merge_bloom_survives_null_keys_in_batch(spark, root):
    """Arrow→pandas coerces an int64 key column WITH NULLs to float64;
    the probe must still hash integral values through the integer
    family, or updates co-batched with a NULL key are silently lost
    (reproduced pre-fix)."""
    df = (
        spark.range(0, 400)
        .select(F.col("id").alias("k"),
                (F.col("id") % 37).alias("g"),
                F.lit("orig").alias("tag"))
        .repartition(4, "g")
    )
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    upd = spark.createDataFrame(
        [(5, 0, "upd"), (None, 0, "nullkey"), (200, 0, "upd")],
        "k long, g long, tag string",
    )
    lh.merge(spark, root, upd, key="k")
    got = {r["k"]: r["tag"] for r in lh.read(spark, root).collect()}
    assert got[5] == "upd" and got[200] == "upd", "NULL co-batch lost updates"
    assert got[6] == "orig"


def test_point_lookup_probe_type_mismatch_is_not_false_negative(spark, root):
    """Family-typed filters: an int column probed with a float (and a
    float column probed with an int) must still find the row; a value
    that CANNOT exist in the family (5.5 on int) plans zero files."""
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") / 2).alias("v"),
        (F.col("id") % 29).alias("g"),
    ).repartition(4, "g")
    lh.create(spark, root, df, stat_cols=(), bloom_cols=("k", "v"))
    assert lh.read_point(spark, root, {"k": 7.0}).count() == 1  # float→int
    assert lh.read_point(spark, root, {"v": 5}).count() == 1    # int→float (v=5.0 at k=10)
    kept, _, skipped = lh.plan_files_bloom(root, {"k": 7.5})
    assert not kept and skipped == 4  # non-integral int-probe: definitely absent


def test_bloom_cols_unsupported_type_rejected_at_create(spark, root):
    """Temporal bloom columns would break the no-false-negative contract
    through representation mismatch — create() must refuse them."""
    df = spark.sql(
        "SELECT id AS k, TIMESTAMP '2021-01-01' AS ts FROM range(10)"
    )
    with pytest.raises(ValueError, match="unsupported types"):
        lh.create(spark, root, df, bloom_cols=("ts",))
    lh.create(spark, root, df, bloom_cols=("k",))  # int col still fine
    assert lh.read_point(spark, root, {"k": 3}).count() == 1


def test_merge_nan_key_update_not_lost(spark, root):
    """ADVICE r9: Spark joins treat NaN == NaN as TRUE, but the bloom
    probe's pandas batch cannot tell NaN from NULL (Arrow→pandas folds
    them) and used to dropna() both — marking the NaN-holding file
    non-overlapping (update skipped) while the insert anti-join still
    matched the existing NaN row (insert suppressed): a silently lost
    update. Float-family filters must never prune when the batch holds
    a NaN key."""
    df = spark.createDataFrame(
        [(float(i), "orig") for i in range(400)] + [(float("nan"), "orig")],
        "k double, tag string",
    ).repartition(6)
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    upd = spark.createDataFrame([(float("nan"), "upd")], "k double, tag string")
    lh.merge(spark, root, upd, key="k")
    rows = lh.read(spark, root).collect()
    nan_rows = [(r["k"], r["tag"]) for r in rows if r["k"] != r["k"]]
    assert nan_rows == [(float("nan"), "upd")] or (
        len(nan_rows) == 1 and nan_rows[0][1] == "upd"
    ), f"NaN-keyed update lost or duplicated: {nan_rows}"
    assert len(rows) == 401  # no spurious insert


def test_bloom_probe_exotic_types_keep_file(spark, root):
    """ADVICE r9: probe values outside the documented int/float
    cross-coercions (decimal.Decimal on a double column; a numeric
    probe of a string column, where Spark's implicit cast makes
    "02" == 2 true row-level) must KEEP the file — only the documented
    non-integral-float-vs-int case may prune."""
    import decimal

    from vcf2db_spark.operators.bloom import bloom_contains, build_bloom

    fb = build_bloom([1.5, 2.5], m=1 << 13, k=7, fam="f")
    assert bloom_contains(fb, decimal.Decimal("99.9"))  # conservative keep
    sb = build_bloom(["02", "x"], m=1 << 13, k=7, fam="s")
    assert bloom_contains(sb, 2)  # "02" == 2 under Spark implicit cast
    ib = build_bloom([1, 2, 3], m=1 << 13, k=7, fam="i")
    assert bloom_contains(ib, decimal.Decimal("2"))  # keep, not absent
    assert not bloom_contains(ib, 7.5)  # the documented prune stays
    # end-to-end: Decimal point probe on a double bloom column plans >0 files
    df = spark.range(0, 50).select((F.col("id").cast("double")).alias("v"))
    lh.create(spark, root, df, stat_cols=(), bloom_cols=("v",))
    kept, _, _ = lh.plan_files_bloom(root, {"v": decimal.Decimal("7")})
    assert kept, "Decimal probe must not false-negative the whole table"


def test_bloom_sidecar_write_is_atomic(spark, root):
    """ADVICE r9: sidecars go through tmp + os.replace — no partially
    written sidecar can ever be visible, and no tmp droppings linger."""
    df = spark.range(0, 200).select(F.col("id").alias("k")).repartition(4)
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    bloom_dir = os.path.join(root, "_bloom")
    leftovers = [
        f
        for _, _, files in os.walk(bloom_dir)
        for f in files
        if ".tmp-" in f
    ]
    assert not leftovers, f"sidecar tmp files left behind: {leftovers}"
    for e in lh.snapshot(root)["files"]:
        side = lh._bloom_sidecar_path(root, e["path"])
        assert os.path.exists(side)


# ---- deletion vectors / merge-on-read (r9) -----------------------------------


def _dv_table(spark, root, n=400, parts=4):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id").cast("double") * 1.5).alias("v"),
    ).repartition(parts)
    return lh.create(spark, root, df, stat_cols=("k",))


def test_dv_delete_one_row_rewrites_zero_data_files(spark, root):
    """The headline merge-on-read property: a 1-row delete commits a
    KB-scale bitmap sidecar and writes ZERO data files — the data file
    set of the new version is identical to the old one."""
    v0 = _dv_table(spark, root)
    before = {e["path"] for e in lh.snapshot(root, v0)["files"]}
    v1 = lh.dv_delete(spark, root, "k = 123")
    after = lh.snapshot(root, v1)
    assert {e["path"] for e in after["files"]} == before
    delta = lh._read_json(lh._manifest_path(root, v1))
    assert not {e["path"] for e in delta["add"]} - before
    dved = [e for e in after["files"] if e.get("dv")]
    assert len(dved) == 1 and dved[0]["dv"]["n_deleted"] == 1
    assert os.path.exists(os.path.join(root, dved[0]["dv"]["path"]))
    assert lh.read(spark, root).count() == 399
    assert lh.read(spark, root).filter("k = 123").count() == 0


def test_dv_delete_time_travel_and_restore(spark, root):
    """DVs must not leak backward: the pre-delete version's entries
    carry no DV ref, so time travel sees the full data; RESTORE to it
    is pure metadata and un-deletes."""
    v0 = _dv_table(spark, root)
    lh.dv_delete(spark, root, "k < 100")
    assert lh.read(spark, root).count() == 300
    assert lh.read(spark, root, v0).count() == 400
    lh.restore(root, v0)
    assert lh.read(spark, root).count() == 400


def test_dv_delete_is_cumulative_or(spark, root):
    """A second delete on the same file ORs into the existing bitmap
    (re-deleting a masked row is a no-op, new positions accumulate)."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k in (1, 2)")
    lh.dv_delete(spark, root, "k in (2, 3)")
    got = lh.read(spark, root)
    assert got.count() == 397
    assert got.filter("k in (1, 2, 3)").count() == 0


def test_dv_delete_null_predicate_rows_survive(spark, root):
    """Three-valued SQL: only positively-TRUE rows are masked."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k long, v double"
    )
    lh.create(spark, root, df, stat_cols=("k",))
    lh.dv_delete(spark, root, "v > 20.0")
    got = {r["k"] for r in lh.read(spark, root).collect()}
    assert got == {1, 2}, "NULL-predicate row must survive a DV delete"


def test_dv_delete_drops_fully_deleted_files(spark, root):
    """A file whose every row is masked is dropped from the manifest
    outright — no empty tombstone entries."""
    _dv_table(spark, root, n=100, parts=2)
    v = lh.dv_delete(spark, root, "k >= 0")  # everything
    snap = lh.snapshot(root, v)
    assert snap["files"] == []
    assert lh.read(spark, root).count() == 0


def test_dv_merge_reinserts_deleted_key_and_never_resurrects(spark, root):
    """MERGE on a DV'd table: (a) an update keyed on a DV-deleted row
    must INSERT (the key is logically absent), (b) a COW rewrite of a
    DV'd file must not resurrect its masked rows."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k in (5, 6)")
    upd = spark.createDataFrame(
        [(5, 0, 99.0), (7, 0, 77.0)], "k long, g long, v double"
    )
    lh.merge(spark, root, upd, key="k")
    rows = {r["k"]: r["v"] for r in lh.read(spark, root).collect()}
    assert rows[5] == 99.0, "dv-deleted key must re-insert"
    assert rows[7] == 77.0
    assert 6 not in rows, "masked row resurrected by the merge rewrite"
    assert lh.read(spark, root).count() == 399  # 400 - {5,6} + insert 5


def test_dv_cow_delete_coexists(spark, root):
    """COW delete over a DV'd table reads through the bitmaps: masked
    rows neither resurrect nor count as matches."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k in (10, 11)")
    lh.delete(spark, root, "g = 3")
    got = lh.read(spark, root)
    assert got.filter("g = 3").count() == 0
    assert got.filter("k in (10, 11)").count() == 0


def test_dv_cdf_shows_masked_deletes(spark, root):
    """table_changes diffs ENTRIES (path + dv ref), so a DV-only commit
    surfaces its masked rows as `_change = delete`."""
    v0 = _dv_table(spark, root)
    v1 = lh.dv_delete(spark, root, "k in (42, 43)")
    ch = lh.table_changes(spark, root, v0, v1, key="k")
    got = {(r["k"], r["_change"]) for r in ch.collect()}
    assert got == {(42, "delete"), (43, "delete")}


def test_dv_feed_streams_survivors_as_delete_postimage(spark, tmp_path):
    """The streaming feed applies each entry's DV executor-side: a
    dv_delete commit streams the file's SURVIVING rows tagged
    delete_postimage — the same contract as COW delete."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream

    root = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("k").alias("k") if False else F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
    ).repartition(2)
    lh.create(spark, root, df, stat_cols=("k",))
    lh.dv_delete(spark, root, "k < 10")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_feed_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    tags = {
        r["_change"]: r["n"]
        for r in got.groupBy("_change").agg(F.count("*").alias("n")).collect()
    }
    assert tags == {"insert": 100, "delete_postimage": 90}
    assert got.filter("_change = 'delete_postimage' AND k < 10").count() == 0


def test_dv_compact_purges_past_ratio(spark, root):
    """OPTIMIZE retires DVs once a file's deleted ratio crosses the
    threshold: the rewrite applies the bitmap and drops the ref, so
    read-side anti-join work stays bounded."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k % 2 = 0")  # 50% of every file
    assert all(e.get("dv") for e in lh.snapshot(root)["files"])
    lh.compact(spark, root, target_bytes=1 << 30, min_file_bytes=1)
    snap = lh.snapshot(root)
    assert not any(e.get("dv") for e in snap["files"]), "DV not retired"
    got = lh.read(spark, root)
    assert got.count() == 200 and got.filter("k % 2 = 0").count() == 0


def test_dv_compact_below_ratio_keeps_dv(spark, root):
    """A lightly-deleted file stays DV'd (rewriting it would be the COW
    write amplification DVs exist to avoid)."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k = 7")  # ~0.25% of one file
    v = lh.compact(spark, root, target_bytes=1 << 30, min_file_bytes=1)
    assert sum(1 for e in lh.snapshot(root)["files"] if e.get("dv")) == 1
    assert lh.read(spark, root).count() == 399


def test_dv_vacuum_reclaims_superseded_sidecars(spark, root):
    """DV sidecars follow the data-file retention window: superseded
    generations (older bitmaps of the same file) and retired DVs are
    reclaimed; the retained version's sidecars survive."""
    _dv_table(spark, root)
    lh.dv_delete(spark, root, "k = 1")
    lh.dv_delete(spark, root, "k = 2")  # supersedes the first generation
    dv_dir = os.path.join(root, "_dv")
    assert len(os.listdir(dv_dir)) >= 2
    lh.vacuum(root, retain_versions=1, min_age_seconds=0.0)
    live = {
        os.path.basename(e["dv"]["path"])
        for e in lh.snapshot(root)["files"]
        if e.get("dv")
    }
    on_disk = set(os.listdir(dv_dir))
    assert on_disk == live, f"sidecars on disk {on_disk} != live {live}"
    got = lh.read(spark, root)
    assert got.count() == 398 and got.filter("k in (1,2)").count() == 0


def test_dv_read_pruned_and_point_apply_mask(spark, root):
    """Every reader path applies DVs: pruned range scans and bloom
    point lookups must not see masked rows."""
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("g"),
        F.col("id").cast("double").alias("v"),
    ).repartition(3)
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    lh.dv_delete(spark, root, "k in (50, 150)")
    pruned = lh.read_pruned(spark, root, {"k": (0, 100)}).filter(
        "k >= 0 AND k <= 100"
    )
    assert pruned.count() == 100 and pruned.filter("k = 50").count() == 0
    assert lh.read_point(spark, root, {"k": 150}).count() == 0
    assert lh.read_point(spark, root, {"k": 151}).count() == 1


# ---- cross-process CONFLICTING writers (r9, VERDICT r8 item 6) ---------------


def _xproc_merge_writer(args):
    """One writer process issuing CONFLICTING key updates/deletes with
    full read-modify-write retry on CommitConflict — the merge()
    protocol at the log layer (no Spark in children; data files are
    tiny JSON key→value maps so the final STATE is checkable). Each op:
    read the head snapshot, find the files holding its target keys,
    rewrite them (COW) with its updates applied / keys deleted, commit
    remove+add; a CommitConflict rebases the WHOLE cycle (re-read,
    re-plan) exactly as a merge() caller must. Returns
    [(version, op_kind, {key: value} | [keys])] for the serial replay."""
    root, wid, ops, seed = args
    import json as _json
    import os as _os
    import random
    import time as _t
    import uuid as _uuid

    from vcf2db_spark.sinks import lakehouse as lh2

    rng = random.Random(seed * 7919 + wid)
    out = []
    for j, (kind, keys) in enumerate(ops):
        while True:
            snap = lh2.snapshot(root)
            state = {}
            holders = []
            for e in snap["files"]:
                with open(_os.path.join(root, e["path"])) as fh:
                    content = _json.load(fh)
                if set(content) & set(keys):
                    holders.append(e["path"])
                    state.update(content)
            payload = {k: v for k, v in state.items() if k not in keys}
            if kind == "merge":
                vals = {k: f"w{wid}op{j}" for k in keys}
                payload.update(vals)
            rel = f"data/m_{wid}_{j}_{_uuid.uuid4().hex[:6]}.json"
            full = _os.path.join(root, rel)
            _os.makedirs(_os.path.dirname(full), exist_ok=True)
            with open(full, "w") as fh:
                _json.dump(payload, fh)
            man = lh2._child_manifest(
                snap,
                kind,
                [{"path": rel, "rows": len(payload), "stats": {}}],
                remove=holders,
            )
            try:
                v = lh2._commit(root, man)
                out.append(
                    (v, kind, vals if kind == "merge" else list(keys))
                )
                break
            except lh2.CommitConflict:
                _os.unlink(full)  # staged file of the losing attempt
                _t.sleep(rng.random() * 0.002)
    return out


def test_cross_process_conflicting_merges_serialize(tmp_path):
    """VERDICT r8 item 6: 3 forked writers issue OVERLAPPING key
    updates and deletes; each must end in either a clean CommitConflict
    (retried with a fresh read) or a serializable outcome — never a
    lost update or a torn manifest. 20 seeds; final state must equal
    the serial replay of the committed operations in version order."""
    import json as _json
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Pool(3) as pool:
        for seed in range(20):
            import random

            rng = random.Random(seed)
            root = str(tmp_path / f"c{seed}")
            os.makedirs(os.path.join(root, "data"), exist_ok=True)
            init = {f"k{i}": "init" for i in range(10)}
            with open(os.path.join(root, "data", "f0.json"), "w") as fh:
                _json.dump(init, fh)
            lh._commit(
                root,
                {
                    "parent": -1,
                    "operation": "create",
                    "schema": {"type": "struct", "fields": []},
                    "stat_cols": [],
                    "txn": {},
                    "add": [{"path": "data/f0.json", "rows": 10, "stats": {}}],
                    "remove": [],
                },
            )
            # overlapping ops: every writer touches keys from the SAME
            # 10-key space, mixing merges and deletes
            jobs = []
            for wid in range(3):
                ops = []
                for _ in range(4):
                    kind = "merge" if rng.random() < 0.75 else "delete"
                    ks = tuple(
                        sorted(rng.sample([f"k{i}" for i in range(10)], 3))
                    )
                    ops.append((kind, ks))
                jobs.append((root, wid, ops, seed))
            results = pool.map(_xproc_merge_writer, jobs)
            committed = sorted(
                (item for sub in results for item in sub),
                key=lambda t: t[0],
            )
            versions = [v for v, _, _ in committed]
            assert versions == list(range(1, 13)), (
                f"seed={seed}: version slots not uniquely won: {versions}"
            )
            # serial replay in version order
            expect = dict(init)
            for _, kind, payload in committed:
                if kind == "merge":
                    expect.update(payload)
                else:
                    for k in payload:
                        expect.pop(k, None)
            # actual final state: fold the log (raises on a torn
            # manifest) and read the surviving files
            snap = lh.snapshot(root)
            actual = {}
            for e in snap["files"]:
                with open(os.path.join(root, e["path"])) as fh:
                    actual.update(_json.load(fh))
            assert actual == expect, (
                f"seed={seed}: final state is not the serial replay "
                f"(lost update) — actual={actual} expect={expect}"
            )


def test_dv_merge_writes_only_the_batch(spark, root):
    """Merge-on-read MERGE: matched rows are DV-masked, replacements +
    inserts land in ONE appended file — zero touched-file rewrites."""
    _dv_table(spark, root)
    before = {e["path"] for e in lh.snapshot(root)["files"]}
    upd = spark.createDataFrame(
        [(5, 0, 99.0), (250, 1, 88.0), (9999, 2, 77.0)],
        "k long, g long, v double",
    )
    v1 = lh.dv_merge(spark, root, upd, key="k")
    delta = lh._read_json(lh._manifest_path(root, v1))
    added_paths = {e["path"] for e in delta["add"]}
    assert len(added_paths - before) == 1, "exactly one appended data file"
    assert not (added_paths - before) & before
    rows = {r["k"]: r["v"] for r in lh.read(spark, root).collect()}
    assert rows[5] == 99.0 and rows[250] == 88.0
    assert rows[9999] == 77.0  # not-matched insert
    assert rows[6] == 9.0  # untouched
    assert len(rows) == 401


def test_dv_merge_matches_cow_merge_semantics(spark, root):
    """dv_merge and merge produce the SAME logical table for the same
    batch (duplicate-batch-key raise, NULL-key handling, update-all
    columns) — only the write amplification differs."""
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
        F.col("id").cast("double").alias("v"),
    ).repartition(3)
    root2 = root + "_cow"
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    lh.create(spark, root2, df, stat_cols=("k",), bloom_cols=("k",))
    upd = spark.createDataFrame(
        [(7, 9, 70.0), (500, 9, 50.0), (None, 9, 40.0)],
        "k long, g long, v double",
    )
    lh.dv_merge(spark, root, upd, key="k")
    lh.merge(spark, root2, upd, key="k")
    keyf = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    a = sorted(map(tuple, lh.read(spark, root).collect()), key=keyf)
    b = sorted(map(tuple, lh.read(spark, root2).collect()), key=keyf)
    assert a == b  # incl. the NULL-keyed row: both verbs INSERT it
    dup = spark.createDataFrame(
        [(1, 0, 1.0), (1, 0, 2.0)], "k long, g long, v double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        lh.dv_merge(spark, root, dup, key="k")


def test_dv_merge_preserves_duplicate_target_keys(spark, root):
    """Every COPY of a duplicated target key is matched: one replacement
    row appends per matched target row (Delta MERGE multiplicity)."""
    df = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0)], "k long, v double"
    )
    lh.create(spark, root, df, stat_cols=("k",))
    lh.dv_merge(
        spark, root,
        spark.createDataFrame([(1, 99.0)], "k long, v double"), key="k",
    )
    got = sorted((r["k"], r["v"]) for r in lh.read(spark, root).collect())
    assert got == [(1, 99.0), (1, 99.0), (2, 20.0)]


def test_dv_merge_feed_and_cdf(spark, tmp_path):
    """dv_merge streams merge_postimage (survivors of masked files +
    the appended batch — the same logical multiset COW merge streams)
    and CDF tags update_postimage/insert across the commit."""
    from vcf2db_spark.sources.lakehouse_feed import read_feed_stream

    root = str(tmp_path / "t")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    ).coalesce(1)
    v0 = lh.create(spark, root, df, stat_cols=("k",))
    upd = spark.createDataFrame([(7, 70.0), (99, 9.0)], "k long, v double")
    v1 = lh.dv_merge(spark, root, upd, key="k")
    ch = lh.table_changes(spark, root, v0, v1, key="k")
    assert sorted((r["k"], r["_change"]) for r in ch.collect()) == [
        (7, "update_postimage"), (99, "insert"),
    ]
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_feed_stream(spark, root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    tags = {
        r["_change"]: r["n"]
        for r in got.groupBy("_change").agg(F.count("*").alias("n")).collect()
    }
    assert tags == {"insert": 50, "merge_postimage": 51}
    assert got.filter("_change='merge_postimage' AND k=7 AND v=7.0").count() == 0
    assert got.filter("_change='merge_postimage' AND k=7 AND v=70.0").count() == 1


# ---- all-NULL-key batches + dv_merge broadcast gate (ADVICE r9) -------------


def test_merge_all_null_key_batch_inserts_both_verbs(spark, root, tmp_path):
    """A NON-empty batch whose keys are ALL NULL must not be mistaken
    for an empty batch: NULL matches nothing (documented contract), so
    every row INSERTS — and in COW merge no existing file is rewritten
    (NULL can't match, so nothing is touched). Reproduced pre-fix: both
    verbs committed a silent no-op and dropped the rows."""
    df = _mk(spark, 0, 100).coalesce(1)
    root2 = str(tmp_path / "cow2")
    lh.create(spark, root, df, stat_cols=("k",), bloom_cols=("k",))
    lh.create(spark, root2, df, stat_cols=("k",), bloom_cols=("k",))
    upd = spark.createDataFrame(
        [(None, 111.0), (None, 222.0)], "k long, v double"
    )
    before = {e["path"] for e in lh.snapshot(root2)["files"]}
    lh.dv_merge(spark, root, upd, key="k")
    lh.merge(spark, root2, upd, key="k")
    for r in (root, root2):
        got = lh.read(spark, r)
        assert got.count() == 102
        assert sorted(
            x["v"] for x in got.filter("k IS NULL").collect()
        ) == [111.0, 222.0]
    # COW merge carried every pre-existing file verbatim (nothing matched)
    assert before <= {e["path"] for e in lh.snapshot(root2)["files"]}


def test_dv_merge_correct_past_broadcast_gate(spark, root, monkeypatch):
    """dv_merge's update-batch broadcast is gated on the batch row count
    (O(batch)-bounded writes must not imply batch-sized executor
    memory); past the gate the planner picks the strategy and the
    result is unchanged."""
    lh.create(
        spark, root, _mk(spark, 0, 500).repartition(3),
        stat_cols=("k",), bloom_cols=("k",),
    )
    monkeypatch.setattr(lh, "_MERGE_BROADCAST_ROWS", 1)  # force the fallback
    upd = spark.createDataFrame(
        [(5, 55.0), (9000, 90.0), (17, 77.0)], "k long, v double"
    )
    lh.dv_merge(spark, root, upd, key="k")
    rows = {r["k"]: r["v"] for r in lh.read(spark, root).collect()}
    assert rows[5] == 55.0 and rows[17] == 77.0 and rows[9000] == 90.0
    assert len(rows) == 501 and rows[6] == 6.0


# ---- cross-process CONFLICTING DV writers (r10, VERDICT r9 item 4) -----------


def _xproc_dv_writer(args):
    """One writer process issuing dv_delete / dv_merge / COW merge /
    compact ops with full read-modify-write retry on CommitConflict —
    the DV protocol at the log layer (no Spark in children). Data files
    are JSON key→value maps whose POSITIONS are the sorted-key indexes
    fixed at write time (parquet row_index twin); a DV sidecar is a
    content-addressed ``_dv/<uuid>.json`` list of dead positions, and a
    dv op's read-modify-write is exactly the verb's: read the head,
    find holders among LIVE rows, OR the new positions into each
    holder's EXISTING sidecar, commit remove+add with the new ref. The
    interleaving class under test: two writers OR-ing the same file's
    DV from the same base version — the loser must CommitConflict and
    rebase onto the winner's sidecar, never losing a position. compact
    purges DVs (applies the mask, rewrites, drops the ref), racing the
    dv writers' refs. Returns [(version, kind, payload)] for replay."""
    root, wid, ops, seed = args
    import json as _json
    import os as _os
    import random
    import time as _t
    import uuid as _uuid

    from vcf2db_spark.sinks import lakehouse as lh2

    rng = random.Random(seed * 104729 + wid)

    def read_file(rel):
        with open(_os.path.join(root, rel)) as fh:
            return _json.load(fh)

    def live_items(entry):
        content = read_file(entry["path"])
        keys = sorted(content)
        dead = set()
        if entry.get("dv"):
            dead = set(read_file(entry["dv"]["path"]))
        return {k: content[k] for i, k in enumerate(keys) if i not in dead}

    def write_json(prefix, payload):
        rel = f"{prefix}/{_uuid.uuid4().hex[:12]}.json"
        full = _os.path.join(root, rel)
        _os.makedirs(_os.path.dirname(full), exist_ok=True)
        with open(full, "w") as fh:
            _json.dump(payload, fh)
        return rel

    def dv_for(entry, hit_keys):
        """OR hit positions into the entry's existing sidecar; returns
        the replacement entry (or None when fully masked) and whether
        any NEW position was added."""
        content = read_file(entry["path"])
        keys = sorted(content)
        old = set(read_file(entry["dv"]["path"])) if entry.get("dv") else set()
        new = old | {i for i, k in enumerate(keys) if k in hit_keys}
        if new == old:
            return entry, False
        if len(new) >= len(keys):
            return None, True
        rel = write_json("_dv", sorted(new))
        return {**entry, "dv": {"path": rel, "n_deleted": len(new)}}, True

    out = []
    for j, (kind, keys) in enumerate(ops):
        while True:
            snap = lh2.snapshot(root)
            add, remove = [], []
            payload = None
            if kind in ("dv_delete", "dv_merge"):
                matched = {}
                for e in snap["files"]:
                    hit = set(live_items(e)) & set(keys)
                    if not hit:
                        continue
                    repl, changed = dv_for(e, hit)
                    if not changed:
                        continue
                    matched[e["path"]] = repl
                for path, repl in matched.items():
                    remove.append(path)
                    if repl is not None:
                        add.append(repl)
                if kind == "dv_merge":
                    payload = {k: f"w{wid}op{j}" for k in keys}
                    rel = write_json("data", payload)
                    add.append({"path": rel, "rows": len(payload), "stats": {}})
                else:
                    payload = list(keys)
            elif kind == "merge":  # COW: rewrite holders minus keys + new file
                state = {}
                for e in snap["files"]:
                    live = live_items(e)
                    if set(live) & set(keys):
                        remove.append(e["path"])
                        state.update(live)
                payload = {k: f"w{wid}op{j}" for k in keys}
                merged = {k: v for k, v in state.items() if k not in keys}
                merged.update(payload)
                rel = write_json("data", merged)
                add.append({"path": rel, "rows": len(merged), "stats": {}})
            else:  # compact: purge every DV'd file (apply mask, drop ref)
                payload = []
                folded = {}
                for e in snap["files"]:
                    if not e.get("dv"):
                        continue
                    remove.append(e["path"])
                    folded.update(live_items(e))
                if remove:
                    rel = write_json("data", folded)
                    add.append({"path": rel, "rows": len(folded), "stats": {}})
            man = lh2._child_manifest(snap, kind, add, remove=remove)
            try:
                v = lh2._commit(root, man)
                out.append((v, kind, payload))
                break
            except lh2.CommitConflict:
                _t.sleep(rng.random() * 0.002)
    return out


def test_cross_process_conflicting_dv_writers_serialize(tmp_path):
    """VERDICT r9 item 4: 3 forked writers mix dv_delete / dv_merge /
    COW merge / compact over the SAME 10-key space, 20 seeds. Every DV
    op read-modify-writes an EXISTING sidecar (old ∪ new), so a lost
    CommitConflict would silently drop a deleted position (a resurrected
    row) or a masked update; compact's purge races the refs. The final
    state must equal the serial replay of the committed ops in version
    order — same oracle as the COW property."""
    import json as _json
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Pool(3) as pool:
        for seed in range(20):
            import random

            rng = random.Random(seed + 5000)
            root = str(tmp_path / f"dv{seed}")
            os.makedirs(os.path.join(root, "data"), exist_ok=True)
            # two initial files so dv ops hit distinct holders
            init_a = {f"k{i}": "init" for i in range(5)}
            init_b = {f"k{i}": "init" for i in range(5, 10)}
            with open(os.path.join(root, "data", "f0.json"), "w") as fh:
                _json.dump(init_a, fh)
            with open(os.path.join(root, "data", "f1.json"), "w") as fh:
                _json.dump(init_b, fh)
            lh._commit(
                root,
                {
                    "parent": -1,
                    "operation": "create",
                    "schema": {"type": "struct", "fields": []},
                    "stat_cols": [],
                    "txn": {},
                    "add": [
                        {"path": "data/f0.json", "rows": 5, "stats": {}},
                        {"path": "data/f1.json", "rows": 5, "stats": {}},
                    ],
                    "remove": [],
                },
            )
            jobs = []
            for wid in range(3):
                ops = []
                for _ in range(4):
                    r = rng.random()
                    if r < 0.35:
                        kind = "dv_delete"
                    elif r < 0.65:
                        kind = "dv_merge"
                    elif r < 0.85:
                        kind = "merge"
                    else:
                        kind = "compact"
                    ks = tuple(
                        sorted(rng.sample([f"k{i}" for i in range(10)], 3))
                    )
                    ops.append((kind, ks))
                jobs.append((root, wid, ops, seed))
            results = pool.map(_xproc_dv_writer, jobs)
            committed = sorted(
                (item for sub in results for item in sub),
                key=lambda t: t[0],
            )
            versions = [v for v, _, _ in committed]
            assert versions == list(range(1, 13)), (
                f"seed={seed}: version slots not uniquely won: {versions}"
            )
            expect = {**init_a, **init_b}
            for _, kind, payload in committed:
                if kind in ("dv_merge", "merge"):
                    expect.update(payload)
                elif kind == "dv_delete":
                    for k in payload:
                        expect.pop(k, None)
                # compact: no logical-state change
            snap = lh.snapshot(root)
            actual = {}
            for e in snap["files"]:
                with open(os.path.join(root, e["path"])) as fh:
                    content = _json.load(fh)
                keys = sorted(content)
                dead = set()
                if e.get("dv"):
                    with open(os.path.join(root, e["dv"]["path"])) as fh:
                        dead = set(_json.load(fh))
                actual.update(
                    {k: content[k] for i, k in enumerate(keys) if i not in dead}
                )
            assert actual == expect, (
                f"seed={seed}: final state is not the serial replay "
                f"(lost DV position or masked update) — "
                f"actual={actual} expect={expect}"
            )


def test_zorder_compaction_applies_and_drops_dvs(spark, root):
    """OPTIMIZE ZORDER on a DV'd table (r10, VERDICT r9 item 6): the
    z-ordered rewrite must APPLY every deletion vector (a rewrite that
    resurrected masked rows would be a silent correctness hole) and
    DROP the sidecar refs from the new manifest — the rewrite is what
    retires the DVs, same as the plain-compact purge path."""
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7) % 400).alias("x"),
        F.col("id").cast("double").alias("v"),
    ).repartition(4)
    lh.create(spark, root, df, stat_cols=("k", "x"))
    lh.dv_delete(spark, root, "k % 10 = 3")
    assert any(e.get("dv") for e in lh.snapshot(root)["files"])
    lh.compact(spark, root, zorder_cols=("k", "x"))
    man = lh.snapshot(root)
    assert man["operation"] == "zorder"
    assert not any(e.get("dv") for e in man["files"]), "DV refs must retire"
    live = {i for i in range(400) if i % 10 != 3}
    assert {r["k"] for r in lh.read(spark, root).collect()} == live
    # manifest pruning still serves the z-ordered head correctly
    pruned = lh.read_pruned(spark, root, {"k": (100, 199)})
    assert {
        r["k"] for r in pruned.filter("k BETWEEN 100 AND 199").collect()
    } == {i for i in range(100, 200) if i % 10 != 3}
    # time travel to the DV'd version still applies the old DV
    assert lh.read(spark, root, 1).count() == len(live)
    assert lh.read(spark, root, 0).count() == 400
