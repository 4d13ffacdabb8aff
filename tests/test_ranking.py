"""ranking.with_global_rank / ntile_from_rank / bucket_start_from_ntile
must reproduce the single-task window functions BIT-FOR-BIT — they are
the scale-safe substitute the registry's former global windows now use.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_pandas_spark.operators.ranking import (
    bucket_start_from_ntile,
    ntile_from_rank,
    with_global_rank,
)


def _fixture(spark, n=997, parts=7):
    # non-contiguous ids, duplicate values, adversarial ordering
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            (F.col("id") * 37 % 1000).alias("tie"),
            (F.col("id") % 13).alias("val"),
        )
        .distinct()
    )


def test_global_rank_matches_row_number(spark):
    df = _fixture(spark)
    got = with_global_rank(df, ["val", "tie"], rank_col="rk", num_parts=5)
    w = Window.orderBy("val", "tie")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(got.select("val", "tie", "rk").collect()) == sorted(
        want.select("val", "tie", "rk").collect()
    )


def test_global_rank_total_col(spark):
    df = _fixture(spark, n=100)
    got = with_global_rank(df, ["val", "tie"], rank_col="rk", total_col="n")
    rows = got.select("rk", "n").collect()
    n = df.count()
    assert all(r.n == n for r in rows)
    assert sorted(r.rk for r in rows) == list(range(1, n + 1))


@pytest.mark.parametrize("n,b", [(100, 10), (97, 10), (5, 8), (1, 4), (16, 16)])
def test_ntile_from_rank_matches_window_ntile(spark, n, b):
    df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
    got = df.select(
        "rk", ntile_from_rank(F.col("rk"), F.lit(n), b).alias("bucket")
    )
    w = Window.orderBy("rk")
    want = df.select("rk", F.ntile(b).over(w).alias("bucket"))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n,b", [(100, 10), (97, 10), (23, 8), (7, 8)])
def test_bucket_start_is_inverse_of_ntile(spark, n, b):
    # rows before bucket k == count of ranks assigned to buckets < k
    df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
    assigned = df.select(
        ntile_from_rank(F.col("rk"), F.lit(n), b).alias("bucket")
    ).groupBy("bucket").count()
    counts = {r.bucket: r["count"] for r in assigned.collect()}
    starts = (
        spark.range(1, max(counts) + 1)
        .select(
            F.col("id").alias("bucket"),
            bucket_start_from_ntile(F.col("id"), F.lit(n), b).alias("start"),
        )
        .collect()
    )
    for r in starts:
        expect = sum(counts.get(k, 0) for k in range(1, r.bucket))
        assert r.start == expect, (r.bucket, r.start, expect)


@pytest.mark.parametrize(
    "desc,val_expr",
    [
        ("all_equal", "0"),                      # every row same value
        ("heavy_skew", "CASE WHEN id % 100 < 99 THEN 7 ELSE id END"),
        ("dense_dupes", "id % 3"),
    ],
)
def test_global_rank_boundary_regimes(spark, desc, val_expr):
    """Adversarial value distributions for the range partitioner: ties
    spanning partition boundaries, 99%-one-value skew, and tiny
    cardinality.  The round-4 sf0.1 bug was boundary-sampling drift
    between plan branches — these regimes maximize boundary pressure."""
    df = spark.range(2000).selectExpr(
        f"CAST({val_expr} AS BIGINT) AS val", "id AS tie"
    )
    got = with_global_rank(df, ["val", "tie"], rank_col="rk", num_parts=11)
    w = Window.orderBy("val", "tie")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(got.select("val", "tie", "rk").collect()) == sorted(
        want.select("val", "tie", "rk").collect()
    ), desc


def test_global_rank_more_partitions_than_rows(spark):
    """num_parts far above the row count leaves most range partitions
    EMPTY — prefix offsets must still line up over the sparse pid set."""
    df = spark.range(17).selectExpr("id % 5 AS val", "id AS tie")
    got = with_global_rank(df, ["val", "tie"], rank_col="rk", num_parts=64)
    w = Window.orderBy("val", "tie")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(got.select("val", "tie", "rk").collect()) == sorted(
        want.select("val", "tie", "rk").collect()
    )


def test_grouped_rank_matches_partitioned_row_number(spark):
    """with_grouped_rank must reproduce
    row_number() OVER (PARTITION BY g ORDER BY ...) bit-for-bit — it is
    the scale-safe substitute for low-cardinality-partitioned windows
    (round-6 verdict item #1)."""
    from mini_pandas_spark.operators.ranking import with_grouped_rank

    df = (
        spark.range(997)
        .repartition(7)
        .select(
            (F.col("id") % 5).alias("g"),
            (F.col("id") * 37 % 100).alias("val"),
            F.col("id").alias("tie"),
        )
    )
    got = with_grouped_rank(
        df, ["g"], ["val", "tie"], rank_col="rk", num_parts=5
    )
    w = Window.partitionBy("g").orderBy("val", "tie")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert sorted(got.select("g", "val", "tie", "rk").collect()) == sorted(
        want.select("g", "val", "tie", "rk").collect()
    )


def test_grouped_rank_total_col_and_boundary_regimes(spark):
    """n_src must equal the group size; adversarial regimes: one giant
    group (all rows one key), singleton groups (key == row), and more
    partitions than rows."""
    from mini_pandas_spark.operators.ranking import with_grouped_rank

    # one giant group
    one = spark.range(200).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    got = with_grouped_rank(one, ["g"], ["v"], rank_col="rk", total_col="n")
    rows = got.collect()
    assert all(r.n == 200 for r in rows)
    assert sorted(r.rk for r in rows) == list(range(1, 201))

    # singleton groups
    single = spark.range(50).select(
        F.col("id").alias("g"), (F.col("id") * 3).alias("v")
    )
    got = with_grouped_rank(single, ["g"], ["v"], rank_col="rk", total_col="n")
    assert all(r.rk == 1 and r.n == 1 for r in got.collect())

    # more partitions than rows
    tiny = spark.range(3).select((F.col("id") % 2).alias("g"), F.col("id").alias("v"))
    got = with_grouped_rank(
        tiny, ["g"], ["v"], rank_col="rk", num_parts=16, total_col="n"
    )
    assert sorted((r.g, r.rk) for r in got.collect()) == [(0, 1), (0, 2), (1, 1)]
