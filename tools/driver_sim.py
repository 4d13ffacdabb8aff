#!/usr/bin/env python
"""Simulate the grading driver as closely as possible: fresh bare
SparkSession (no tuned confs at build time), foreign cwd, non-UTC host
timezone, every query value-compared against its oracle.

Usage: cd /tmp && TZ=America/New_York python /root/repo/tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    print("entry rows:", entrymod.entry(spark).count())
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = set(sys.argv[1:])  # optional name subset, like check_correctness
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
        except Exception as ex:
            print(f"FAIL {name}: spark {type(ex).__name__}: {str(ex)[:100]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)})")
            continue
        drows = sorted(tuple(str(x) for x in r) for r in con.sql(oracles[name]).fetchall())
        if srows == drows:
            print(f"ok   {name}: {len(srows)} rows value-match")
        else:
            print(f"FAIL {name}: values differ ({len(srows)} vs {len(drows)})")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
