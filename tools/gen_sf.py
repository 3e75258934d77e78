"""Scale up the driver-generated fixtures by key-shifted replication.

The driver ships sf0.001/0.01/0.1; the floor-amortization argument in
BASELINE.md needs a measured point at sf≥1 (VERDICT r2 item 5). Rather
than re-deriving the driver's generator, this replicates sf0.1 K times
with disjoint key ranges — every marginal distribution (flags, dates,
prices, text lengths, per-user event densities) is preserved exactly,
and all foreign keys stay consistent because each copy shifts parent and
child keys by the same stride:

    customer +15000*c   supplier +1000*c    part +20000*c
    orders   +150000*c (o_custkey follows customer)
    lineitem +150000*c / +20000*c / +1000*c (follows its parents)
    events   +100000*c (user_id +1500*c keeps per-user window density)
    documents +5000*c (text gets a per-copy suffix so cross-copy rows
                       are near- but not exact-duplicates)
    embeddings +2000*c (vectors unchanged; the vector queries are
                        scope-bounded by design)

region/nation are dimension constants and copy through once.

Usage: python tools/gen_sf.py [--mult 10] [--out /root/repo/.bench_data/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride} shifts applied per copy
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
DIMS = ["region", "nation"]


def generate(out_dir: str, mult: int, src: str = SRC) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sels = []
        for col in cols:
            if col in shifts:
                sels.append(f"{col} + CAST(c * {shifts[col]} AS BIGINT) AS {col}")
            elif t == "documents" and col == "text":
                # per-copy suffix: keeps length/ngram distributions intact
                # while avoiding 10x exact-duplicate inflation that would
                # distort the dedup operators' output cardinalities
                sels.append(
                    "CASE WHEN c = 0 THEN text "
                    "ELSE text || ' #c' || CAST(c AS VARCHAR) END AS text"
                )
            elif t == "documents" and col == "n_chars":
                sels.append(
                    "CASE WHEN c = 0 THEN n_chars "
                    "ELSE n_chars + 4 + CAST(c >= 10 AS BIGINT) END AS n_chars"
                )
            else:
                sels.append(col)
        sql = (
            f"COPY (SELECT {', '.join(sels)} "
            f"FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({mult})) AS c) "
            f"ORDER BY c) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.bench_data/sf1")
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()
    generate(args.out, args.mult, args.src)


if __name__ == "__main__":
    main()
