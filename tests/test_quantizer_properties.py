"""Property tests for the driver-local quantizer trainer — pure numpy,
no SparkSession: the properties that make the memoized sampled trainer
safe to share across queries and partitionings.

- ORDER INVARIANCE: _lloyd_local sorts its sample internally, so any
  permutation of the collected rows (collect order is partition order,
  which is not deterministic in general) yields identical centroids.
- CONTRACT: cell ids ascending; centroids L2-normalized; k cells unless
  Lloyd emptied some (then fewer, never more).
"""

import math

from hypothesis import given, settings, strategies as st


def _rows(vecs):
    return [{"vec_id": i, "v": v} for i, v in enumerate(vecs)]


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
        ),
        min_size=4,
        max_size=4,
    ).filter(lambda v: sum(x * x for x in v) > 1e-6),
    min_size=4,
    max_size=24,
)


@settings(max_examples=60, deadline=None)
@given(vecs=vec_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_lloyd_local_is_sample_order_invariant(vecs, seed):
    import random

    from mini_pandas_spark.operators.similarity import _lloyd_local

    k = min(3, len(vecs))
    rows = _rows(vecs)
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    cids_a, cn_a = _lloyd_local(rows, k, iters=1)
    cids_b, cn_b = _lloyd_local(shuffled, k, iters=1)
    assert cids_a == cids_b
    assert cn_a == cn_b  # bit-identical: same sorted fold order inside


@settings(max_examples=60, deadline=None)
@given(vecs=vec_strategy)
def test_lloyd_local_contract(vecs):
    from mini_pandas_spark.operators.similarity import _lloyd_local

    k = min(3, len(vecs))
    cids, cn = _lloyd_local(_rows(vecs), k, iters=1)
    assert cids == sorted(cids)
    assert 1 <= len(cids) <= k
    assert len(cn) == len(cids)
    for c in cn:
        assert math.isclose(sum(x * x for x in c), 1.0, rel_tol=1e-9)
