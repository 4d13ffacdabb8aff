"""Distributed exact global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with an EMPTY partition spec.

A global window funnels the entire input through ONE task; at 100 TB that
task is the job.  The textbook distributed alternative (the same scheme
Spark's own ``orderBy`` uses for its sort, extended with rank offsets):

  1. ``repartitionByRange(P, keys)`` — sampled range boundaries, every
     partition holds a contiguous key range (parallel, P tunable);
  2. per-partition local ``row_number`` — a window PARTITIONED on the
     physical partition id, so the largest single window group is one
     range partition (~input/P rows), never the corpus;
  3. per-partition row counts → prefix offsets over a P-row aggregated
     frame (tiny window, the `quantile_binning_orders` pattern) →
     broadcast join;
  4. global rank = prefix offset + local row number.  EXACT for any
     partition boundaries, so the (deterministically seeded) boundary
     sampling never affects output values.

``ntile_from_rank`` reproduces SQL NTILE(b) arithmetic from that rank —
first (n % b) buckets get ceil(n/b) rows — bit-identical to the window
function on a unique total ordering, so DuckDB oracles keep plain
``ntile(b) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "grk",
    total_col: str | None = None,
    num_parts: int | None = None,
) -> DataFrame:
    """Attach the exact 1-based global rank of ``order_cols`` (must be a
    UNIQUE total ordering — include a tiebreak key) without any
    single-task global window.  Optionally also attaches the total row
    count as ``total_col`` (rank-to-percentile math needs it).
    """
    if num_parts is None:
        num_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    # localCheckpoint is LOAD-BEARING, not an optimization: the offsets
    # branch and the window branch prune to different columns, so
    # without it Catalyst plans TWO range exchanges whose boundary
    # sampling draws from different RDD seeds — boundary-adjacent rows
    # can land in different partitions per branch and the offsets no
    # longer describe the window's partitions (caught by the sf0.1
    # oracle sweep as small rank drift).  Materializing the ranged
    # frame once makes the pid assignment a single physical fact both
    # branches share.  eager=False keeps plan-build side-effect-free.
    part = (
        df.repartitionByRange(num_parts, *order_cols)
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    counts = part.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("_gr_cnt"))
    w_off = Window.orderBy("_gr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_gr_off", F.coalesce(F.sum("_gr_cnt").over(w_off), F.lit(0))
    )
    if total_col is not None:
        total = offsets.agg(F.sum("_gr_cnt").cast("bigint").alias(total_col))
        offsets = offsets.crossJoin(F.broadcast(total))
    keep = ["_gr_pid", "_gr_off"] + ([total_col] if total_col else [])
    out = (
        part.withColumn("_gr_lrk", F.row_number().over(w_local))
        .join(F.broadcast(offsets.select(*keep)), "_gr_pid")
        .withColumn(
            rank_col, (F.col("_gr_off") + F.col("_gr_lrk")).cast("bigint")
        )
        .drop("_gr_pid", "_gr_lrk", "_gr_off")
    )
    return out


def with_grouped_rank(
    df: DataFrame,
    group_cols,
    order_cols,
    rank_col: str = "grk",
    total_col: str | None = None,
    num_parts: int | None = None,
) -> DataFrame:
    """Attach the exact 1-based rank of ``order_cols`` WITHIN each
    ``group_cols`` group (a unique total ordering per group — include a
    tiebreak key) without ever sorting a whole group in one task — the
    scale-safe replacement for ``Window.partitionBy(<low-cardinality
    key>)``: a window partitioned by a ~20-value ``source`` column
    funnels ~5 TB through one task at 100 TB (round-6 verdict item #1).

    Same scheme as :func:`with_global_rank`, range-keyed on
    (group_cols + order_cols) so each physical partition holds a
    contiguous slice of each group's order: local window partitioned by
    (pid, group) — largest single sort is one range partition — then
    per-(pid, group) counts roll up to broadcast prefix offsets
    (P × |groups| rows, tiny).  Optionally attaches the group's total
    row count as ``total_col`` (percent-rank math needs it).
    """
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    if num_parts is None:
        num_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    # localCheckpoint load-bearing exactly as in with_global_rank: both
    # plan branches must observe ONE physical pid assignment.
    part = (
        df.repartitionByRange(num_parts, *(group_cols + order_cols))
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_gr_pid", *group_cols).orderBy(*order_cols)
    counts = part.groupBy("_gr_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_gr_cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_gr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_gr_off", F.coalesce(F.sum("_gr_cnt").over(w_off), F.lit(0))
    )
    if total_col is not None:
        w_tot = Window.partitionBy(*group_cols)
        offsets = offsets.withColumn(
            total_col, F.sum("_gr_cnt").over(w_tot).cast("bigint")
        )
    keep = ["_gr_pid", *group_cols, "_gr_off"] + (
        [total_col] if total_col else []
    )
    return (
        part.withColumn("_gr_lrk", F.row_number().over(w_local))
        .join(F.broadcast(offsets.select(*keep)), ["_gr_pid", *group_cols])
        .withColumn(
            rank_col, (F.col("_gr_off") + F.col("_gr_lrk")).cast("bigint")
        )
        .drop("_gr_pid", "_gr_lrk", "_gr_off")
    )


def ntile_from_rank(rk: Column, n: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) of the row with global rank ``rk`` (1-based)
    out of ``n`` rows: bucket sizes differ by at most one, the first
    ``n % buckets`` buckets take the extra row — exactly the window
    function's assignment on a unique ordering.  Pure bigint arithmetic.
    """
    b = F.lit(buckets).cast("bigint")
    rk = rk.cast("bigint")
    n = n.cast("bigint")
    sz = (n / b).cast("bigint")  # floor division: n, b nonnegative
    rem = n % b
    big = rem * (sz + 1)
    # sz==0 ⇒ every row satisfies rk <= big; greatest() keeps the (then
    # unreachable) otherwise-branch free of a /0→Inf→bigint ANSI cast.
    safe_sz = F.greatest(sz, F.lit(1).cast("bigint"))
    return (
        F.when(rk <= big, ((rk - 1) / (sz + 1)).cast("bigint") + 1)
        .otherwise(rem + ((rk - big - 1) / safe_sz).cast("bigint") + 1)
        .cast("int")
    )


def bucket_start_from_ntile(bucket: Column, n: Column, buckets: int) -> Column:
    """Number of rows in buckets BEFORE ``bucket`` under NTILE(buckets)
    of ``n`` rows (the inverse companion of ntile_from_rank): the first
    ``n % buckets`` buckets hold ceil(n/buckets) rows each.
    """
    b = F.lit(buckets).cast("bigint")
    bucket = bucket.cast("bigint")
    n = n.cast("bigint")
    sz = (n / b).cast("bigint")
    rem = n % b
    prior_big = F.least(bucket - 1, rem)
    prior_small = F.greatest(bucket - 1 - rem, F.lit(0).cast("bigint"))
    return prior_big * (sz + 1) + prior_small * sz
