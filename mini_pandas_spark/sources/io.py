"""Generic read/write helpers.

Kept deliberately thin: Spark's DataSource V2 already provides distributed,
splittable, pushdown-capable scans.  The wrappers add the engine's defaults
(schema handling, partitioned sinks) without hiding the underlying reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import ensure_runtime_confs


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    ensure_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink.  ``partition_by`` gives directory partition pruning;
    at 100 TB choose low-cardinality columns (date, source) only.  For
    bucketed layouts use :func:`write_bucketed_table` — Spark only honors
    ``bucketBy`` through the table catalog, not a bare path sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet sink via ``saveAsTable`` (the only API through
    which Spark persists bucket metadata).  Both sides of a repeated
    fact-to-fact join written with the same ``n_buckets``/``bucket_cols``
    join with ZERO Exchange nodes — the layout that amortizes the shuffle
    of a 100 TB join across every downstream query
    (demonstrated in tests/test_scale_techniques.py)."""
    writer = (
        df.write.format("parquet").mode(mode).option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan — same splittable, predicate-pushdown-capable columnar
    path as parquet (Spark's native ORC reader supports filter pushdown
    and column pruning identically)."""
    ensure_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented text scan (one string column ``value``); with
    ``whole=True`` each file becomes one row — the raw-corpus ingestion
    shape before structured parsing."""
    return spark.read.option("wholetext", whole).text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: requires exactly one string column."""
    df.write.mode(mode).text(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content) rows —
    the ingestion path for image/audio/video corpora (multimodal/binary.py
    operators consume the ``content`` column).  Files are not splittable;
    at 100 TB parallelism comes from file count, so shard corpora into
    many objects and set maxPartitionBytes accordingly."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(n / target_rows_per_file) evenly sized files and return the
    file count written.

    The table-maintenance op every long-running 100 TB pipeline needs:
    streaming sinks and partitioned appends accrete thousands of KB-size
    files, and scan throughput collapses under per-file open/footer
    costs.  Rewrites via round-robin ``repartition(n)`` (even sizes
    without a key; a range partitioner would need a sort key and skew
    handling).  The sizing count is a zero-column scan (Spark reads only
    row-group metadata pages for COUNT(*) over parquet), so the real
    cluster work is the single read→shuffle→write pass.
    """
    import math

    ensure_runtime_confs(spark)
    df = spark.read.parquet(in_path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
