"""Property-based null-semantics tests (SURVEY.md §5 strategy b):
randomized None injection, engine output compared against a tiny
independent model of the reference's documented semantics (SURVEY.md
§1.3 — written from the spec, not copied from the reference).

One Spark job per example is slow, so each property batches all its
hypothesis-generated cases into one frame and runs a single collect.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from mini_pandas_spark import MiniFrame

floats_or_none = st.lists(
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    min_size=1,
    max_size=8,
)
bools_or_none = st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=8)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=floats_or_none, threshold=st.floats(-1e6, 1e6))
@SLOW
def test_comparison_coerces_null_to_false(spark, values, threshold):
    # model: x > t is False when x is None; output never optional
    expected = [(v is not None) and (v > threshold) for v in values]
    s = MiniFrame.from_dict(spark, {"x": values})["x"]
    if s.dtype is type(None):
        return  # all-None column: comparisons raise (non-numeric dtype)
    m = s > threshold
    assert m.optional is False
    assert m.to_list() == expected


@given(values=floats_or_none, delta=st.floats(-1e6, 1e6, allow_nan=False))
@SLOW
def test_arithmetic_propagates_null(spark, values, delta):
    s = MiniFrame.from_dict(spark, {"x": values})["x"]
    if s.dtype is type(None):
        return
    r = s + delta
    out = r.to_list()
    for v, o in zip(values, out):
        if v is None:
            assert o is None
        else:
            assert o is not None
    assert r.optional == (None in values)


@given(a=bools_or_none, b=bools_or_none)
@SLOW
def test_boolean_and_non_kleene(spark, a, b):
    # model: None on either side => None (NOT Spark's Kleene false)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    fa = MiniFrame.from_dict(spark, {"a": a})
    fb = MiniFrame.from_dict(spark, {"b": b})
    if fa["a"].dtype is not bool or fb["b"].dtype is not bool:
        return
    r = fa["a"] & fb["b"]
    expected = [
        None if (x is None or y is None) else (x and y) for x, y in zip(a, b)
    ]
    assert r.to_list() == expected


@given(values=floats_or_none)
@SLOW
def test_mask_of_comparison_always_usable(spark, values):
    # comparisons yield non-optional masks, so filtering always works and
    # keeps exactly the True rows
    f = MiniFrame.from_dict(spark, {"x": values})
    if f["x"].dtype is type(None):
        return
    kept = f[f["x"] > 0.0]["x"].to_list()
    assert kept == [v for v in values if v is not None and v > 0.0]
