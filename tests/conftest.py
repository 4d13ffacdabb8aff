import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_pandas_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mini-pandas-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_oracle():
    return SF_DIR_ORACLE


@pytest.fixture()
def products(spark):
    """The reference's main fixture (reference tests.py:4-11)."""
    from mini_pandas_spark import MiniFrame

    return MiniFrame.from_dict(
        spark,
        {
            "SKU": ["X4E", "T3D", "F8D", "C7X"],
            "price": [7.0, 3.5, 8.0, 5.0],
            "sales": [5, 3, 1, 10],
            "taxed": [False, False, True, False],
        },
    )


@pytest.fixture()
def sku_ids(spark):
    """Join right side (reference tests.py:13-18)."""
    from mini_pandas_spark import MiniFrame

    return MiniFrame.from_dict(
        spark,
        {"SKU": ["X4E", "T3D", "F8D", "C7X"], "id": [1, 2, 3, 4]},
    )
