#!/usr/bin/env python
"""Scale-stress the z-order layout: does a fixed 2-D box query stay
OUTPUT-bound (scan rows ~constant) while the corpus grows 16x?

Corpus: sf0.1 lineitem (600k rows) replicated m in {1, 4, 16}; copy c
shifts l_partkey by c * 20_000, so the key DOMAIN grows with the data
(the TPC-H scaling shape) and the fixed box (partkey 0-99 x suppkey
0-4) keeps a constant result set.  The registered 20-bit interleave
covers the 16x shifted domain; widths below the domain WRAP shifted
partkeys back into the box's z-region and silently destroy pruning
(the documented domain cap of a fixed-width curve; at 100 TB you size
Z_BITS to the key domain, or quantize keys to ranks first).

Per m it writes the z-clustered layout (16*m files — constant file
size) and an identically-partitioned unclustered control, runs the box
query on both, and records scan-output rows (rows surviving row-group
stats pruning), result rows, and wall.  The claim being measured: scan
rows over the z layout stay ~flat as the corpus grows 16x, while the
control's scan rows grow ~16x — box cost is output-bound, not
corpus-bound.

Usage: python tools/scale_stress_layout.py [--mults 1,4,16]
Prints one markdown table (paste into SCALE.md §6p) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mini_pandas_spark.plans import scan_output_rows  # noqa: E402
from mini_pandas_spark.operators.layout import (
    BOX_PART_HI,
    BOX_PART_LO,
    BOX_SUPP_HI,
    BOX_SUPP_LO,
    zvalue_sql,
)

BASE = "/root/testdata/sf0.1"
# Z_BITS (20) covers the 16x shifted domain (320k < 1,048,576)
PART_SHIFT = 20_000


def build_corpus(spark: SparkSession, m: int):
    base = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    parts = [base]
    for c in range(1, m):
        parts.append(
            base.select(
                (F.col("l_partkey") + c * PART_SHIFT).alias("l_partkey"),
                "l_suppkey",
                "cents",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def box_scan(spark: SparkSession, path: str):
    t0 = time.time()
    df = (
        spark.read.parquet(path)
        .where(
            (F.col("l_partkey").between(BOX_PART_LO, BOX_PART_HI))
            & (F.col("l_suppkey").between(BOX_SUPP_LO, BOX_SUPP_HI))
        )
        .select("l_partkey", "l_suppkey", "cents")
    )
    n = len(df.collect())
    wall = time.time() - t0
    return n, scan_output_rows(df), wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    args = ap.parse_args()
    mults = [int(x) for x in args.mults.split(",")]

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    print(
        "| mult | rows | layout | files | box rows | scan rows "
        "| scan/corpus | box wall (s) |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for m in mults:
        corpus = build_corpus(spark, m)
        n_files = 16 * m
        z = F.expr(zvalue_sql("l_partkey", "l_suppkey")).cast("bigint")
        zdir = tempfile.mkdtemp(prefix=f"stress_z_{m}x_")
        (
            corpus.withColumn("z", z)
            .repartitionByRange(n_files, "z")
            .sortWithinPartitions("z")
            .write.mode("overwrite")
            .parquet(zdir)
        )
        cdir = tempfile.mkdtemp(prefix=f"stress_c_{m}x_")
        (
            corpus.withColumn("z", z)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(cdir)
        )
        total = spark.read.parquet(zdir).count()
        for label, path in (("zorder", zdir), ("control", cdir)):
            n, scan, wall = box_scan(spark, path)
            r = {
                "mult": m,
                "rows": total,
                "layout": label,
                "files": n_files,
                "box_rows": n,
                "scan_rows": scan,
                "scan_frac": round(scan / total, 4),
                "wall_s": round(wall, 2),
            }
            rows.append(r)
            print(
                f"| {m}x | {total} | {label} | {n_files} | {n} | {scan} "
                f"| {r['scan_frac']} | {r['wall_s']} |"
            )
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(cdir, ignore_errors=True)
    spark.stop()
    # box result must be m-invariant on the z path, and z must beat
    # control at every size
    zs = [r for r in rows if r["layout"] == "zorder"]
    cs = [r for r in rows if r["layout"] == "control"]
    ok = (
        len({r["box_rows"] for r in zs}) == 1
        and all(
            z["scan_rows"] < 0.5 * c["scan_rows"] for z, c in zip(zs, cs)
        )
    )
    print(json.dumps({"metric": "layout_scale_stress", "ok": ok, "rows": rows}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
