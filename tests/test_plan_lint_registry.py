"""Registry-wide plan lint: every SQL-oracled batch query's physical plan
must be free of scale-killers — no CartesianProduct, no row-at-a-time
Python evaluation (BatchEvalPython; Arrow-vectorized nodes are fine).

Queries that execute work at build time (streaming drains, iterative
driver loops) are excluded: linting them would run them, and their
plan quality is pinned separately in test_plan_quality / the streaming
suites.
"""

import pytest

SF = "/root/testdata/sf0.001"

# Build-time executors (streaming drains / iterative collects) — their
# callables run jobs, so building them here would be an execution test.
EXECUTES_ON_BUILD = {
    "streaming_hourly_counts",
    "session_window_agg",
    "streaming_user_totals",
    "streaming_dedup_events",
    "stream_stream_join",
    "stream_static_enrich",
    "synthetic_stream_rollup",
    "streaming_hourly_approx_uniques",
    "ivf_ann_topk",
    "pca_project_embeddings",
    "dedup_clusters",
    "embedding_near_dup_pairs",
    "pagerank_copurchase",
    "pq_ann_topk",
    "mahalanobis_outliers",
    "connected_components_stars",
}

FORBIDDEN = ["CartesianProduct", "BatchEvalPython"]


def test_registry_plans_have_no_scale_killers(spark):
    from mini_pandas_spark.queries import queries

    failures = {}
    for name, fn in queries().items():
        if name in EXECUTES_ON_BUILD:
            continue
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [bad for bad in FORBIDDEN if bad in plan]
        if hits:
            failures[name] = hits
    assert not failures, failures
