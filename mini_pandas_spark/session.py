"""SparkSession construction and runtime configuration.

The engine targets a large multi-executor cluster; locally we run
``local[N]``.  All scale-relevant settings (AQE, shuffle partitions,
broadcast threshold) are centralized here so bench/tests/driver share one
tuned profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must be present for this repo's datasets / plan quality.
# They are all session-settable at runtime (verified on pyspark 4.1).
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read as epoch-nanos long and convert (see sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones, convert sort-merge to broadcast when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs evaluate through Arrow batches (ArrowEvalPythonUDTF)
    # instead of row-at-a-time BatchEvalPythonUDTF pickling.
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # Deterministic timestamp rendering regardless of host zone.
    "spark.sql.session.timeZone": "UTC",
    # Custom Python DataSources may implement pushFilters (sources/
    # synthetic.py); planning asserts this flag when they do.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply RUNTIME_CONFS to an externally-created session (e.g. the
    driver's).  Safe to call repeatedly."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime on this build — leave as-is.
            pass
    return spark


def get_spark(
    app_name: str = "mini-pandas-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned local session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores.  On a real
    cluster the same confs apply; only ``master`` changes.
    ``extra_confs`` are applied at BUILD time — required for static
    confs (e.g. spark.io.compression.codec) that reject runtime sets;
    they only take effect when this call actually creates the session.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_runtime_confs(spark)
