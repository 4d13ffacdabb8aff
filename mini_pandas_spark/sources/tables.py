"""Canonical loaders for the driver's star-schema parquet tables.

Every query in the engine goes through :func:`load_table` so dataset quirks
(nanosecond timestamps in ``events``) are fixed in exactly one place and all
scans stay plain ``spark.read.parquet`` — predicate pushdown and column
pruning reach the parquet reader untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor we target;
# used by operators to hint broadcast-hash joins explicitly.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def _events_fixup(df: DataFrame) -> DataFrame:
    """events.ts is stored as parquet TIMESTAMP(NANOS); with
    ``nanosAsLong`` it arrives as epoch-nanos LongType.  Convert to
    TIMESTAMP_NTZ via epoch arithmetic — timezone-independent, so results
    match DuckDB's naive reading of the same file bit-for-bit."""
    if dict(df.dtypes).get("ts") == "bigint":
        ntz = F.expr(
            "timestampadd(MICROSECOND, ts div 1000, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
        df = df.withColumn("ts", ntz)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``sf_dir``."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _events_fixup(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every fixture table as a temp view (optionally prefixed)
    so the whole engine surface is reachable from ``spark.sql`` — the
    SQL-frontend entry point for users who never touch the DataFrame API.
    Returns the registered view names."""
    names = []
    for name in TABLE_NAMES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
