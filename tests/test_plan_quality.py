"""Physical-plan regression tests: the 100 TB design properties SURVEY.md
§4 commits to must stay visible in the executed plans — pushed filters,
broadcast dims, heap top-k, bounded shuffle counts, no Python eval in
JVM-only pipelines, no cartesian products."""

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def qs():
    from mini_pandas_spark.queries import queries

    return queries()


def plan_of(spark, qs, name):
    return qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, qs):
    p = plan_of(spark, qs, "flagship_filter")
    assert "PushedFilters: [IsNotNull" in p
    assert "Exchange" not in p  # scan+filter+project: one stage


def test_q1_single_shuffle_with_date_pushdown(spark, qs):
    p = plan_of(spark, qs, "q1_pricing_summary")
    assert p.count("Exchange") <= 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p


def test_topk_uses_heap_not_global_sort(spark, qs):
    p = plan_of(spark, qs, "topk_orders")
    assert "TakeOrderedAndProject" in p


def test_dim_joins_are_broadcast(spark, qs):
    p = plan_of(spark, qs, "join_broadcast_dims")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_window_ops_single_shuffle(spark, qs):
    for name in ("window_rank_orders", "window_running_sum", "events_hourly"):
        p = plan_of(spark, qs, name)
        assert p.count("Exchange") <= 1, name


def test_text_pipeline_stays_jvm_side(spark, qs):
    for name in ("token_count_docs", "text_quality", "lang_id_heuristic", "doc_fingerprint"):
        p = plan_of(spark, qs, name)
        assert "EvalPython" not in p, name
        assert "Exchange" not in p, name


def test_pandas_udf_variant_uses_arrow(spark, qs):
    p = plan_of(spark, qs, "text_quality_pandas_udf")
    assert "ArrowEvalPython" in p  # vectorized, not row-at-a-time


def test_asof_join_is_window_not_range_join(spark, qs):
    p = plan_of(spark, qs, "asof_join_purchase")
    assert "NestedLoop" not in p
    assert "Window" in p


def test_no_cartesian_anywhere_in_headline(spark, qs):
    import bench

    for name in bench.HEADLINE:
        if name == "streaming_hourly_counts":
            continue  # starts a stream; covered by its oracle check
        p = plan_of(spark, qs, name)
        assert "CartesianProduct" not in p, name


# Keep in sync with test_plan_lint_registry.STREAMING_DRAINS: building
# any of these runs a full micro-batch drain, so the plan sweep skips
# them (their outputs are oracle-gated instead).
STREAMING_QUERIES = {
    "streaming_hourly_counts",
    "session_window_agg",
    "streaming_user_totals",
    "streaming_dedup_events",
    "stream_stream_join",
    "stream_static_enrich",
    "synthetic_stream_rollup",
    "streaming_hourly_approx_uniques",
    "streaming_topk_trending",
    "streaming_manifest_sink",
    "stream_static_dedup",
    "streaming_neardup_lsh",
    "streaming_coreset_moments",
}


def test_coreset_topm_is_bounded_heap(spark, qs):
    """coreset_kmeans_sample's top-M selection must plan as
    TakeOrderedAndProject (bounded driver heap), never a corpus-global
    Sort — the property that keeps the one-pass coreset one-pass."""
    p = plan_of(spark, qs, "coreset_kmeans_sample")
    assert "TakeOrderedAndProject" in p


def test_arrow_histogram_prunes_to_two_columns(spark, qs):
    """arrow_byte_histogram's parquet scan must read ONLY (doc_id, text):
    column pruning has to survive the mapInArrow boundary."""
    p = plan_of(spark, qs, "arrow_byte_histogram")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_global_plan_sweep_all_queries(spark, qs):
    """Every registered batch query: no CartesianProduct, no row-at-a-time
    BatchEvalPython anywhere in the executed plan."""
    from mini_pandas_spark import plans

    for name, fn in qs.items():
        if name in STREAMING_QUERIES:
            continue  # building them runs a stream; covered by oracles
        df = fn(spark, SF)
        plan = plans.executed_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
