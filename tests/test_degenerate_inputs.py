"""Degenerate-input robustness: every batch query must survive tables
reduced to a SINGLE row (the other boundary next to empty) — this is
where divide-by-zero, var=0, single-category, and self-join edge paths
live (a 100 TB job's weirdest partition is usually one of these).

No value assertions — the contract is "no exception, list result";
value correctness is the oracle sweep's job."""

import pytest

from tests.test_empty_inputs import EMPTY_OK_ZERO_ROWS

SF_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, tmp_path_factory):
    from mini_pandas_spark.sources import load_table

    out = tmp_path_factory.mktemp("sf_single")
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = load_table(spark, SF_SRC, name)
        df.limit(1).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_queries_survive_single_row_tables(spark, single_row_sf_dir):
    from mini_pandas_spark.queries import queries

    qs = queries()
    failures = {}
    for name in EMPTY_OK_ZERO_ROWS:
        try:
            rows = qs[name](spark, single_row_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as ex:  # noqa: BLE001 — we want the full list
            failures[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
    assert not failures, failures
