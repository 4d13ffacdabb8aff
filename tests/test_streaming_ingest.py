"""Restart-resume ingest (streaming/ingest.py) and TABLESAMPLE pins."""

import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_incremental_ingest_resumes_from_checkpoint(spark):
    """The restart-resume receipt behind incremental_ingest_totals'
    oracle: drain 2 (same checkpoint) processes ONLY the newly arrived
    file.  Pins: sink batch 0 == per-type totals of arrivals 0-1
    (event_id % 3 in {0, 1}), sink batch 1 == totals of arrival 2, and
    exactly two batches exist."""
    from mini_pandas_spark.streaming.ingest import _ingest_artifacts

    sink, _ck, _src = _ingest_artifacts(spark, SF)
    back = spark.read.parquet(sink)
    assert sorted(
        r.batch_id for r in back.select("batch_id").distinct().collect()
    ) == [0, 1]
    ev = spark.read.parquet(os.path.join(SF, "events.parquet")).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def totals(df):
        return {
            r.event_type: (r.n, r.c)
            for r in df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
            .collect()
        }

    def sink_totals(bid):
        return {
            r.event_type: (r.n, r.c)
            for r in back.where(F.col("batch_id") == bid)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"), F.sum("cents").alias("c"))
            .collect()
        }

    assert sink_totals(0) == totals(ev.where(F.col("event_id") % 3 != 2))
    assert sink_totals(1) == totals(ev.where(F.col("event_id") % 3 == 2))


def test_tablesample_repeatable_is_deterministic(spark):
    """TABLESAMPLE (10 PERCENT) REPEATABLE(42) is a pure function of
    (seed, partition layout): twin runs return identical rows, and the
    realized fraction sits in a generous binomial band around 10%."""
    from mini_pandas_spark.queries import queries

    q = queries()["tablesample_priority_profile"]
    a = [tuple(r) for r in q(spark, SF).collect()]
    b = [tuple(r) for r in q(spark, SF).collect()]
    assert a == b and a
    total = spark.read.parquet(os.path.join(SF, "orders.parquet")).count()
    sampled = sum(r[1] for r in a)
    # n=1500 at sf0.001: 5 sigma ≈ 0.039
    assert 0.04 * total < sampled < 0.16 * total, (sampled, total)
