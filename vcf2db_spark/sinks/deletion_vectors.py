"""Deletion vectors — merge-on-read row-level deletes (VERDICT r8 item 4).

Copy-on-write DELETE rewrites every file holding a matching row: a 1-row
GDPR delete in a 1 GB file rewrites 1 GB, and at 100 TB with trickle
deletes the write amplification is the cost center. The modern public
pattern is Delta's deletion vectors / Iceberg v2 position deletes:
commit a POSITION BITMAP sidecar per touched file, apply it at read,
and compact lazily once a file's deleted ratio crosses a threshold.

Layout and lifecycle (mirrors the bloom-sidecar design):

- A DV is an immutable JSON sidecar ``_dv/<hex>.json`` holding a packed
  little-endian bitmap of the file's row positions (bit i set = row i
  deleted) — ``n_rows/8`` bytes per file, NEVER inlined into the txlog
  (commit bytes stay O(delta), the checkpoint-design bound).
- The manifest FILE ENTRY carries only a tiny ref
  ``{"dv": {"path": rel, "n_deleted": k}}``; a later delete on the same
  file writes a NEW sidecar (old ∪ new positions — bitmaps are OR-able)
  and the commit replaces the entry (remove+add of the same data path),
  so snapshots stay immutable and time travel reads the old DV.
- DV bytes are written EXECUTOR-side (one ``applyInPandas`` group per
  touched file); the driver collects one (file, dv_ref, count) row per
  file — file-count-bounded, like the bloom build.
- Readers subtract positions with a LEFT ANTI join on
  ``(_metadata.file_name, _metadata.row_index)`` against a positions
  DataFrame exploded executor-side from the sidecars — whole plan stays
  JVM + one Arrow-batched decode; files WITHOUT a DV take the untouched
  fast path (the common case: compaction keeps the DV'd fraction small).
- ``vacuum`` reclaims sidecars referenced by no retained version, the
  same retention window as data files.

Determinism: positions come from parquet's physical row order
(``_metadata.row_index``), which is immutable for an immutable file.

Reference parity: Delta Lake deletion vectors (delta.enableDeletionVectors),
Iceberg v2 position delete files [public Delta/Iceberg docs].
"""

from __future__ import annotations

import base64
import json
import os
import uuid

import numpy as np


def encode_dv(positions, n_rows: int) -> dict:
    """Sidecar payload from 0-based row positions: packed little-endian
    bitmap (bit i of byte j = row 8j+i), base64 for JSON transport."""
    bits = np.zeros(int(n_rows), dtype=bool)
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size:
        bits[pos] = True
    return {
        "bits": base64.b64encode(
            np.packbits(bits, bitorder="little").tobytes()
        ).decode(),
        "n_rows": int(n_rows),
        "n_deleted": int(bits.sum()),
    }


def decode_mask(dv: dict) -> np.ndarray:
    """Boolean deleted-mask of length ``n_rows`` from a sidecar payload."""
    raw = np.frombuffer(base64.b64decode(dv["bits"]), dtype=np.uint8)
    return np.unpackbits(raw, bitorder="little")[: int(dv["n_rows"])].astype(bool)


def merge_positions(old_dv: dict | None, positions, n_rows: int) -> dict:
    """OR new positions into an existing sidecar payload (idempotent —
    re-deleting an already-deleted position is a no-op)."""
    if old_dv is None:
        return encode_dv(positions, n_rows)
    mask = decode_mask(old_dv)
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size:
        mask[pos] = True
    return encode_dv(np.flatnonzero(mask), n_rows)


def write_dv_sidecar(root: str, dv: dict) -> str:
    """Persist one sidecar under ``_dv/`` (tmp + os.replace — whole or
    absent, the bloom-sidecar atomicity contract); returns the rel path
    the manifest entry references. Runs executor-side."""
    rel = os.path.join("_dv", f"{uuid.uuid4().hex}.json")
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    tmp = full + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(dv, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, full)
    return rel


def read_dv_sidecar(root: str, rel: str) -> dict:
    with open(os.path.join(root, rel)) as fh:
        return json.load(fh)


def positions_df(spark, root: str, entries: list[dict]):
    """(__dv_base, __dv_pos) rows for every deleted position of the
    DV-carrying ``entries`` — the anti-join's right side. The seed is
    one row PER FILE (file-count-bounded); sidecar decode and the
    explode to ``n_deleted`` rows happen executor-side in one
    Arrow-batched pass, so DV bytes never touch the driver."""
    import pandas as pd

    seed = spark.createDataFrame(
        [
            (os.path.basename(e["path"]), os.path.join(root, e["dv"]["path"]))
            for e in entries
        ],
        "__dv_base string, __dv_path string",
    ).repartition(max(1, min(len(entries), 64)))

    def gen(batches):
        for pdf in batches:
            for b, p in zip(pdf["__dv_base"], pdf["__dv_path"]):
                with open(p) as fh:
                    dv = json.load(fh)
                pos = np.flatnonzero(decode_mask(dv)).astype("int64")
                if pos.size:
                    yield pd.DataFrame({"__dv_base": b, "__dv_pos": pos})

    return seed.mapInPandas(gen, schema="__dv_base string, __dv_pos long")
