#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

Usage:
    python tools/profile_queries.py q1 q2 ...        # time N runs of each
    python tools/profile_queries.py --plans DIR q1   # also dump explain()
    python tools/profile_queries.py --all            # the whole HEADLINE list

Methodology matches bench.py (same session confs, same unbilled warmups,
noop-sink materialization) so numbers are comparable with BASELINE.md
close tables, but each query is timed REPS times and the min/median are
reported — isolating steady-state per-query cost from run-order noise.
Also records the number of Spark jobs each query launches (scheduling
overhead is a first-order cost at sf0.1 fixture sizes).
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


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_warmups(spark, sf_dir: str, qs) -> None:
    """The same unbilled warmups bench.py performs."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from mini_pandas_spark.sources import TABLE_NAMES, load_table

    materialize(qs["flagship_filter"](spark, sf_dir))
    warm_udf = pandas_udf(lambda s: s * 1, "long")
    materialize(
        spark.range(1000).repartition(64).select(warm_udf(F.col("id")).alias("v"))
    )
    for t in TABLE_NAMES:
        materialize(load_table(spark, sf_dir, t))
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = warm_sf if os.path.isdir(warm_sf) else sf_dir
    qs["streaming_hourly_counts"](spark, warm_dir).count()
    from mini_pandas_spark.streaming.windows import (
        _events_dir_with_sentinels,
        _standing_index_tables,
    )

    _standing_index_tables(spark, sf_dir)
    _events_dir_with_sentinels(spark, sf_dir)
    from mini_pandas_spark.streaming.state_reader import (
        build_standing_state_checkpoints,
    )

    build_standing_state_checkpoints(spark, sf_dir)
    from mini_pandas_spark.streaming.ingest import _ingest_artifacts

    _ingest_artifacts(spark, sf_dir)
    from mini_pandas_spark.operators.layout import (
        hilbert_layout_table,
        quantized_layout_table,
        zorder_layout_table,
    )

    for build in (zorder_layout_table, hilbert_layout_table, quantized_layout_table):
        build(spark, sf_dir)
    qs["streaming_neardup_lsh"](spark, warm_dir).count()
    qs["manifest_roundtrip_stats"](spark, warm_dir).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names to profile")
    ap.add_argument("--all", action="store_true", help="profile the HEADLINE list")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", metavar="DIR", help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="", help="plan file suffix (before/after)")
    ap.add_argument("--json", metavar="PATH", help="write results as JSON")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mini-pandas-spark-profile")
    qs = queries()
    if args.all:
        from bench import HEADLINE

        names = list(HEADLINE)
    else:
        names = args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    run_warmups(spark, sf_dir, qs)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        if args.plans:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, sf_dir)
            suffix = f"_{args.suffix}" if args.suffix else ""
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        times = []
        # count jobs in a query-unique group, so concurrent streaming /
        # maintenance jobs (and the --plans explain pass) cannot skew
        # the metric (ADVICE r11)
        group = f"profile:{name}"
        sc.setJobGroup(group, f"profile {name}")
        for rep in range(args.reps):
            sc.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        n_jobs = len(tracker.getJobIdsForGroup(group) or []) / max(args.reps, 1)
        sc.setLocalProperty("spark.jobGroup.id", None)
        times_sorted = sorted(times)
        results[name] = {
            "min": times_sorted[0],
            "med": times_sorted[len(times_sorted) // 2],
            "all": times,
            "jobs_per_run": round(n_jobs, 1),
        }
        print(
            f"{name:45s} min={times_sorted[0]:6.2f} med="
            f"{times_sorted[len(times_sorted)//2]:6.2f} jobs/run={n_jobs:5.1f}",
            flush=True,
        )

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
