#!/usr/bin/env python
"""Streaming-drain profiler for the optimization rounds (guide §1).

Every registered streaming topology drains with Trigger.AvailableNow and
pays a fixed per-micro-batch cost (offset/commit log writes, state-store
init per partition per store).  This tool answers, per drain:

  - wall-clock per repetition (same noop/collect surface as the query),
  - how many micro-batches ran,
  - where each batch spent its time (StreamingQueryProgress.durationMs:
    triggerExecution / addBatch / walCommit / commitOffsets /
    latestOffset / queryPlanning / getBatch),
  - state operator row counts (memory-used, rows updated/total).

Usage:
    python tools/profile_streams.py streaming_hourly_counts rocksdb_...
    python tools/profile_streams.py --all                # every drain
    python tools/profile_streams.py --conf k=v ... q     # A/B a conf
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_pandas_spark.queries import queries
from mini_pandas_spark.session import get_spark

# Streaming rows benched in bench.py HEADLINE plus the registered
# drains outside it (the whole family shares the fixed-cost floor).
STREAM_QUERIES = [
    "streaming_hourly_counts",
    "stream_static_enrich",
    "streaming_sliding_counts",
    "streaming_hourly_approx_uniques",
    "streaming_anomaly_windows",
    "streaming_topk_trending",
    "streaming_manifest_sink",
    "stream_static_dedup",
    "streaming_user_totals",
    "streaming_dedup_events",
    "stream_stream_join",
    "streaming_neardup_lsh",
    "streaming_coreset_moments",
    "streaming_dedup_user_days",
    "streaming_epoch_log_sink",
    "streaming_outer_join_attribution",
    "streaming_full_outer_reconcile",
    "rocksdb_daily_type_rollup",
    "streaming_table_sink_daily",
    "incremental_ingest_totals",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


class _ProgressTap:
    """Collects StreamingQueryProgress rows from a listener."""

    def __init__(self):
        self.rows = []

    def listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        tap = self

        class Tap(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                try:
                    dur = dict(p.durationMs or {})
                except Exception:
                    dur = {}
                state = []
                try:
                    for so in p.stateOperators or []:
                        state.append(
                            {
                                "op": so.operatorName,
                                "rows_total": so.numRowsTotal,
                                "rows_updated": so.numRowsUpdated,
                                "commit_ms": so.allUpdatesTimeMs
                                + so.allRemovalsTimeMs
                                + so.commitTimeMs,
                            }
                        )
                except Exception:
                    pass
                tap.rows.append(
                    {
                        "name": p.name,
                        "batch": p.batchId,
                        "rows_in": p.numInputRows,
                        "dur": dur,
                        "state": state,
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return Tap()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[], metavar="K=V")
    ap.add_argument("--json", metavar="PATH")
    ap.add_argument("--skip-warmups", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mini-pandas-spark-stream-profile")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    qs = queries()
    names = STREAM_QUERIES if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.skip_warmups:
        from profile_queries import run_warmups

        run_warmups(spark, sf_dir, qs)

    tap = _ProgressTap()
    spark.streams.addListener(tap.listener())

    results = {}
    for name in names:
        reps = []
        for rep in range(args.reps):
            mark = len(tap.rows)
            spark.sparkContext.setJobDescription(f"stream-profile:{name}:r{rep}")
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            wall = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            time.sleep(0.3)  # listener delivery is async
            batches = tap.rows[mark:]
            reps.append({"wall": wall, "batches": batches})
        walls = sorted(r["wall"] for r in reps)
        results[name] = {"min": walls[0], "med": walls[len(walls) // 2], "reps": reps}
        last = reps[-1]["batches"]
        summary = "; ".join(
            "b{b} in={i} trig={t}ms add={a}ms wal={w}ms off={o}ms".format(
                b=r["batch"],
                i=r["rows_in"],
                t=r["dur"].get("triggerExecution", "?"),
                a=r["dur"].get("addBatch", "?"),
                w=r["dur"].get("walCommit", "?"),
                o=r["dur"].get("commitOffsets", "?"),
            )
            for r in last
        )
        print(
            f"{name:38s} min={walls[0]:6.2f} med={walls[len(walls)//2]:6.2f} "
            f"n_batches={len(last)}  {summary}",
            flush=True,
        )

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
