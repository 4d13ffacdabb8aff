"""Asserting ports of the reference's 12 smoke tests (reference tests.py —
which has no asserts at all; expected values here were pinned by executing
the reference, see SURVEY.md §1.3 ✔exec markers and FIXTURES.md §A)."""

import pytest

from mini_pandas_spark import MiniFrame, MiniSeries, infer_dtype


# -- inference (reference tests.py:39-51, 101-108) -------------------------


def test_infer_non_optional_floats(spark):
    s = MiniSeries.from_array_like(spark, [1.2, 2.3, 4.5], name="floats")
    assert s.dtype is float
    assert s.optional is False
    assert s.to_list() == [1.2, 2.3, 4.5]


def test_infer_mixed_types_raises(spark):
    with pytest.raises(ValueError, match="All values must have the same type"):
        MiniSeries.from_array_like(spark, [1.2, 2.3, 4.5, "hello"])


def test_infer_no_int_float_widening(spark):
    # strict: [1, 2, 3.0] raises (reference data_frame.py:105-106 ✔exec)
    with pytest.raises(ValueError, match="All values must have the same type"):
        MiniSeries.from_array_like(spark, [1, 2, 3.0])


def test_infer_all_none(spark):
    s = MiniSeries.from_array_like(spark, [None, None, None, None])
    assert s.dtype is type(None)
    assert s.optional is True
    assert s.to_list() == [None, None, None, None]


def test_infer_optional_floats(spark):
    s = MiniSeries.from_array_like(spark, [1.2, None, 2.3, 4.5])
    assert s.dtype is float
    assert s.optional is True


def test_infer_bool_not_numeric():
    # bool is not numeric (reference data_frame.py:7-8 ✔exec)
    dtype, optional = infer_dtype([True, False])
    assert dtype is bool and not optional


# -- comparisons incl. null coercion (tests.py:53-61; SURVEY §1.3) ---------


def test_comparison_scalar(spark):
    s = MiniSeries.from_array_like(spark, [1.0, 2.0, 3.0])
    assert (s > 2).to_list() == [False, False, True]
    assert (s <= 2).to_list() == [True, True, False]
    assert (s == 2.0).to_list() == [False, True, False]
    assert (s != 2.0).to_list() == [True, False, True]


def test_reflected_comparison(spark):
    # 4 < s dispatches to s.__gt__(4) via Python reflection (SURVEY §2.1 #7)
    s = MiniSeries.from_array_like(spark, [3.0, 5.0])
    assert (2.0 < s).to_list() == [True, True]
    assert (4.0 < s).to_list() == [False, True]
    assert (4.0 >= s).to_list() == [True, False]


def test_null_comparison_coerces_false(spark):
    # [1.0, None, 3.0] > 2 -> [False, False, True], NON-optional
    s = MiniSeries.from_array_like(spark, [1.0, None, 3.0])
    m = s > 2
    assert m.to_list() == [False, False, True]
    assert m.optional is False
    assert m.dtype is bool


def test_comparison_type_mismatch_raises(spark):
    s = MiniSeries.from_array_like(spark, ["a", "b"])
    with pytest.raises(ValueError):
        s > 1
    b = MiniSeries.from_array_like(spark, [True, False])
    with pytest.raises(ValueError):
        b > 0


def test_equality_cross_type_raises(spark):
    s = MiniSeries.from_array_like(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        s == "x"
    # both-numeric equality is allowed (int vs float)
    assert (s == 2).to_list() == [False, True]


# -- arithmetic (tests.py:110-115; SURVEY §1.3) ----------------------------


def test_null_arithmetic_propagates(spark):
    s = MiniSeries.from_array_like(spark, [1.0, None, 3.0])
    r = s + 1
    assert r.to_list() == [2.0, None, 4.0]
    assert r.optional is True
    assert r.dtype is float


def test_arithmetic_dtype_promotion(spark):
    i = MiniSeries.from_array_like(spark, [1, 2, 3])
    assert (i + 1).dtype is int
    assert (i + 1.0).dtype is float
    assert (i * 2).to_list() == [2, 4, 6]
    # division is always float (documented divergence, SURVEY §7.4)
    d = i / 2
    assert d.dtype is float
    assert d.to_list() == [0.5, 1.0, 1.5]


def test_arithmetic_reflected(spark):
    i = MiniSeries.from_array_like(spark, [1, 2, 3])
    assert (10 - i).to_list() == [9, 8, 7]
    assert (10 / i).to_list() == [10.0, 5.0, pytest.approx(10 / 3)]
    assert (7 % i).to_list() == [0, 1, 1]


def test_arithmetic_type_mismatch_raises(spark):
    fs = MiniSeries.from_array_like(spark, [1.0, 2.0])
    bs = MiniSeries.from_array_like(spark, [True, False])
    with pytest.raises(ValueError):
        fs + bs
    with pytest.raises(ValueError):
        fs ^ bs
    with pytest.raises(ValueError):
        False & fs


def test_series_series_arithmetic_cross_frame(spark):
    # standalone series + frame column, aligned positionally
    # (reference tests.py:110-115: [1.2,None,2.3,4.5] + price)
    df = MiniFrame.from_dict(
        spark, {"price": [7.0, 3.5, 8.0, 5.0]}
    )
    fs = MiniSeries.from_array_like(spark, [1.2, None, 2.3, 4.5])
    r = df["price"] + fs
    assert r.to_list() == [8.2, None, 10.3, 9.5]
    assert r.optional is True


def test_length_mismatch_raises(spark):
    a = MiniSeries.from_array_like(spark, [1.0, 2.0, 3.0])
    b = MiniSeries.from_array_like(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        a + b


# -- boolean ops (tests.py:117-122) ----------------------------------------


def test_boolean_ops(spark):
    a = MiniSeries.from_array_like(spark, [True, True, False, False])
    b = MiniSeries.from_array_like(spark, [True, False, True, False])
    assert (a & b).to_list() == [True, False, False, False]
    assert (a | b).to_list() == [True, True, True, False]
    assert (a ^ b).to_list() == [False, True, True, False]
    assert (~a).to_list() == [False, False, True, True]


def test_boolean_null_propagates_non_kleene(spark):
    # False & NULL -> NULL (reference ✔exec; Spark Kleene would give False)
    a = MiniSeries.from_array_like(spark, [False, True, None])
    b = MiniSeries.from_array_like(spark, [None, None, None])
    # all-None has dtype NoneType, not bool -> ValueError
    with pytest.raises(ValueError):
        a & b
    c = MiniSeries.from_array_like(spark, [None, False, True])
    r = a & c
    assert r.to_list() == [None, False, None]
    assert r.optional is True


# -- masking / projection / frame ops (tests.py:97-99, 124-130) ------------


def test_mask_series(spark):
    s = MiniSeries.from_array_like(spark, [1.0, 2.0, 3.0, 4.0])
    m = s > 2
    assert s[m].to_list() == [3.0, 4.0]


def test_mask_must_be_bool_non_optional(spark):
    s = MiniSeries.from_array_like(spark, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        s.apply_mask(MiniSeries.from_array_like(spark, [1, 0, 1]))
    opt = MiniSeries.from_array_like(spark, [True, None, False])
    with pytest.raises(ValueError):
        s.apply_mask(opt)


def test_mask_length_mismatch_raises(spark):
    s = MiniSeries.from_array_like(spark, [1.0, 2.0, 3.0])
    m = MiniSeries.from_array_like(spark, [True, False]) == True  # noqa: E712
    with pytest.raises(ValueError):
        s.apply_mask(m)


def test_projection(spark, products):
    assert products["SKU"].to_list() == ["X4E", "T3D", "F8D", "C7X"]
    with pytest.raises(ValueError, match="Column not found"):
        products["nope"]


def test_frame_filter(spark, products):
    out = products[products["price"] > 4.0]
    assert out["SKU"].to_list() == ["X4E", "F8D", "C7X"]


# -- the flagship integration query (tests.py:133-144) ---------------------


def test_flagship_query(spark, products):
    # ✔exec against the reference: mask = [True, False, False, False]
    # → ["X4E"].  (FIXTURES.md §A1 claims ["C7X"], but 5.0+5.0 > 10.0 is
    # False; executing the reference confirms ["X4E"].)
    mask = (
        (products["price"] + 5.0 > 10.0)
        & (products["sales"] > 3)
        & ~products["taxed"]
    )
    assert products[mask]["SKU"].to_list() == ["X4E"]


# -- left join (intended semantics of the broken reference join) -----------


def test_left_join(spark, products, sku_ids):
    out = products.left_join(sku_ids, "SKU")
    d = out.to_dict()
    by_sku = dict(zip(d["SKU"], d["id"]))
    assert by_sku == {"X4E": 1, "T3D": 2, "F8D": 3, "C7X": 4}


def test_left_join_unmatched_right_is_null(spark, products):
    right = MiniFrame.from_dict(spark, {"SKU": ["X4E"], "id": [1]})
    out = products.left_join(right, "SKU")
    d = out.to_dict()
    by_sku = dict(zip(d["SKU"], d["id"]))
    assert by_sku["X4E"] == 1
    assert by_sku["T3D"] is None


def test_left_join_missing_column_raises(spark, products, sku_ids):
    with pytest.raises(ValueError, match="Column not found"):
        products.left_join(sku_ids, "nope")


# -- from_dict validation (data_frame.py:391-406) --------------------------


def test_from_dict_rectangularity(spark):
    with pytest.raises(ValueError):
        MiniFrame.from_dict(spark, {"a": [1, 2], "b": [1]})


def test_frame_len(spark, products):
    assert len(products) == 4
    assert len(products["price"]) == 4


def test_multi_column_projection(spark, products):
    sub = products[["SKU", "price"]]
    assert sub.names == ["SKU", "price"]
    assert sub.to_dict() == {
        "SKU": ["X4E", "T3D", "F8D", "C7X"],
        "price": [7.0, 3.5, 8.0, 5.0],
    }
    with pytest.raises(ValueError, match="Column not found"):
        products[["SKU", "nope"]]


def test_to_spark_escape_hatch(spark, products):
    sdf = products.to_spark()
    assert sorted(sdf.columns) == ["SKU", "price", "sales", "taxed"]
    assert sdf.count() == 4
