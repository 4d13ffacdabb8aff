"""The plans.inspect helpers report the properties the scale discipline
depends on; checked against queries with known plan shapes."""

import os

from mini_pandas_spark import plans

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _q(name):
    from mini_pandas_spark.queries import queries

    return queries()[name]


def test_shuffle_count_distinguishes_broadcast(spark):
    df = _q("join_broadcast_dims")(spark, SF)
    # broadcast exchanges must not count as shuffles
    assert plans.broadcast_join_count(df) >= 2
    assert plans.shuffle_count(df) <= 3


def test_pushed_filters_detected(spark):
    assert plans.has_pushed_filters(_q("flagship_filter")(spark, SF))


def test_take_ordered_detected(spark):
    assert plans.uses_take_ordered(_q("topk_orders")(spark, SF))


def test_python_eval_nodes_classified(spark):
    assert plans.python_eval_nodes(_q("text_quality")(spark, SF)) == []
    nodes = plans.python_eval_nodes(_q("text_quality_pandas_udf")(spark, SF))
    assert "ArrowEvalPython" in nodes
    assert "BatchEvalPython" not in nodes


def test_no_cartesian_in_sql_frontend(spark):
    df = _q("sql_frontend_revenue")(spark, SF)
    assert not plans.has_cartesian_product(df)


def test_codegen_stage_count_after_execution(spark):
    # AQE reveals codegen ids only in the executed final plan
    df = _q("q1_pricing_summary")(spark, SF)
    df.collect()
    assert plans.codegen_stage_count(df) >= 1
