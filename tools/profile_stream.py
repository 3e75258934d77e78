"""Decompose the availableNow drain startup constant on the stream_* DQ
rows (VERDICT r10 item 1): run each declared stream query, capture every
micro-batch's StreamingQueryProgress.durationMs breakdown (triggerExecution
= addBatch + getBatch + latestOffset + queryPlanning + walCommit +
commitOffsets + stateStoreCommit ...), plus the wall time outside the
trigger loop (query start/stop machinery), and print a per-query table.

Usage:
    python tools/profile_stream.py [--sf-dir /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_QUERIES = [
    "stream_dedup_wm",
    "stream_watermark_append",
    "stream_session_stream",
    "stream_stateful_totals",
    "stream_slide_stream",
    "stream_stream_join",
    "stream_sink_parquet",
    "stream_upsert",
    "stream_lakehouse_feed",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or STREAM_QUERIES

    from vcf2db_spark.queries import QUERIES
    from vcf2db_spark.session import get_spark

    spark = get_spark("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")

    # progress capture: a streaming listener records every progress event
    # (availableNow drains stop before lastProgress is reliably readable)
    from pyspark.sql.streaming import StreamingQueryListener

    events: list[dict] = []

    class _Cap(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append({"kind": "start", "t": time.perf_counter(), "id": str(e.id)})

        def onQueryProgress(self, e):
            p = e.progress
            events.append(
                {
                    "kind": "progress",
                    "t": time.perf_counter(),
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events.append({"kind": "stop", "t": time.perf_counter(), "id": str(e.id)})

    spark.streams.addListener(_Cap())

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(QUERIES["agg_group"](spark, args.sf_dir))  # warm-up

    report = {}
    for name in names:
        per_run = []
        for i in range(args.n):
            events.clear()
            t0 = time.perf_counter()
            run(QUERIES[name](spark, args.sf_dir))
            wall = time.perf_counter() - t0
            # listener events are async; give the bus a moment to drain
            time.sleep(0.3)
            batches = [e for e in events if e["kind"] == "progress"]
            dur_total: dict[str, float] = {}
            for b in batches:
                for k, v in b["durationMs"].items():
                    dur_total[k] = dur_total.get(k, 0.0) + v / 1000.0
            starts = [e["t"] for e in events if e["kind"] == "start"]
            stops = [e["t"] for e in events if e["kind"] == "stop"]
            stream_span = (max(stops) - min(starts)) if starts and stops else None
            per_run.append(
                {
                    "wall_s": round(wall, 3),
                    "n_streams": len(starts),
                    "n_batches": len(batches),
                    "n_data_batches": sum(1 for b in batches if b["numInputRows"] > 0),
                    "stream_span_s": round(stream_span, 3) if stream_span else None,
                    "trigger_ms": {k: round(v, 3) for k, v in sorted(dur_total.items())},
                }
            )
        report[name] = per_run
        print(f"== {name}", flush=True)
        for r in per_run:
            print(json.dumps(r), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r11", "stream_profile.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
