"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry from
``mini_pandas_spark.queries`` (each Spark query paired with a DuckDB
oracle where SQL-expressible; rows-only otherwise).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference tests.py:133-144 recast, SURVEY.md §7.1)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from mini_pandas_spark.queries import queries as _queries

    return _queries()["flagship_filter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mini_pandas_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from mini_pandas_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
