"""Mergeable-sketch aggregation operators.

The reference has no aggregation at all (SURVEY.md §2.2); this module
extends the §2.3 aggregate surface with the two sketch families a
100 TB pipeline leans on when exact answers are unaffordable:

- **HyperLogLog sketches as first-class values** (Datasketches HLL via
  ``hll_sketch_agg`` / ``hll_union_agg``): build per-partition-key
  sketches ONCE, then answer coarser-grain distinct-count questions by
  unioning the stored sketches — never re-scanning the fact table.
  This is the materialized-rollup pattern exact COUNT(DISTINCT) cannot
  support (distinct counts are not additive; sketches are mergeable).
- **Approximate quantiles** (``percentile_approx``): bounded-memory
  mergeable quantile summaries vs the exact interpolated percentiles in
  relational.quantiles_prices.

Estimates are engine-specific, so these queries are rows-only in the
driver gate; tests/test_pipeline_operators.py pins estimate accuracy
against the exact answers computed by the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def hll_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer estimates per order-month from HLL sketches,
    plus an ALL row unioning the monthly sketches — one scan builds the
    monthly sketches, the grand total merges them without touching
    orders again (exact distincts cannot roll up this way).

    Scale: the shuffle carries one ~KB sketch per month instead of the
    distinct key expansion; the union pass reads 12 rows.  At 100 TB the
    monthly sketch table is a stored artifact refreshed incrementally,
    and every coarser rollup (quarter, year, lifetime) is a sketch-union
    over it.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly_sk = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.hll_sketch_agg("o_custkey", 14).alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    monthly = monthly_sk.select(
        "month",
        F.hll_sketch_estimate("sk").alias("est_distinct_custs"),
        "n_orders",
    )
    total = monthly_sk.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_orders").alias("n_orders"),
    ).select(
        F.lit("ALL").alias("month"),
        F.hll_sketch_estimate("sk").alias("est_distinct_custs"),
        "n_orders",
    )
    return monthly.unionByName(total)


def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of extended price per return flag via
    mergeable quantile summaries (percentile_approx, accuracy 10000),
    the bounded-memory counterpart of relational.quantiles_prices.

    Scale: exact percentiles need a full sort (or per-group collect) —
    the sketch is built map-side and merged, one tiny-keyed shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("qs"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            "l_returnflag",
            F.col("qs")[0].alias("p50_approx"),
            F.col("qs")[1].alias("p90_approx"),
            F.col("qs")[2].alias("p99_approx"),
            "n_rows",
        )
    )
