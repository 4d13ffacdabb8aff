"""UDF registration surface (SURVEY.md §2.4): both the row-at-a-time and
Arrow-vectorized paths register for SQL use and compute correctly."""

from pyspark.sql import functions as F

from mini_pandas_spark.functions.udf import register_pandas_udf, register_python_udf


def test_register_python_udf(spark):
    register_python_udf(spark, "add_one_py", lambda x: x + 1, "long")
    out = spark.sql("SELECT add_one_py(41) AS v").collect()
    assert out[0]["v"] == 42


def test_register_pandas_udf(spark):
    register_pandas_udf(spark, "times_two_pd", lambda s: s * 2, "long")
    df = spark.range(5).select(F.expr("times_two_pd(id)").alias("v"))
    assert sorted(r["v"] for r in df.collect()) == [0, 2, 4, 6, 8]
