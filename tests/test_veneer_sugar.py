"""Pandas-like sugar on the veneer (sort_values / head / rename / drop /
with_column / fillna / dropna / groupby / merge / series reductions).

These verbs are NOT in the reference (it stops at a broken left_join,
data_frame.py:357-370); they extend the veneer with the pandas verbs its
API shape implies, compiled to the same lazy Spark plans as the query
registry.  Reference type discipline (numeric-only math, strict fills,
eager errors) still applies.
"""

import pytest

from mini_pandas_spark import MiniFrame


@pytest.fixture()
def frame(spark):
    return MiniFrame.from_dict(
        spark,
        {
            "SKU": ["X4E", "T3D", "F8D", "C7X"],
            "price": [7.0, 3.5, 8.0, 5.0],
            "sales": [5, 3, 1, 10],
            "taxed": [False, False, True, False],
        },
    )


def test_sort_values_stable_and_positional(spark, frame):
    s = frame.sort_values("price")
    assert s.to_dict()["SKU"] == ["T3D", "C7X", "X4E", "F8D"]
    # positional ops (head, masks) see the new order
    assert s.head(2).to_dict()["price"] == [3.5, 5.0]
    # multi-key with per-key direction
    d = frame.sort_values(["taxed", "sales"], ascending=[True, False])
    assert d.to_dict()["SKU"] == ["C7X", "X4E", "T3D", "F8D"]
    with pytest.raises(ValueError):
        frame.sort_values("nope")


def test_head_rename_drop(spark, frame):
    assert frame.head(2).to_dict()["SKU"] == ["X4E", "T3D"]
    r = frame.rename({"SKU": "sku_code"})
    assert "sku_code" in r.names and "SKU" not in r.names
    assert r["sku_code"].to_list() == ["X4E", "T3D", "F8D", "C7X"]
    d = frame.drop("taxed")
    assert d.names == ["SKU", "price", "sales"]
    with pytest.raises(ValueError):
        frame.rename({"nope": "x"})
    with pytest.raises(ValueError):
        frame.drop(["SKU", "nope"])


def test_with_column_and_mask_interplay(spark, frame):
    f = frame.with_column("total", frame["price"] * frame["sales"])
    assert f.to_dict()["total"] == [35.0, 10.5, 8.0, 50.0]
    assert f._dtypes["total"] is float
    hits = f[f["total"] > 30.0]
    assert hits.to_dict()["SKU"] == ["X4E", "C7X"]
    with pytest.raises(ValueError):
        frame.with_column("x", f["total"])  # series from another frame


def test_fillna_dropna_strict(spark):
    f = MiniFrame.from_dict(
        spark, {"a": [1.0, None, 3.0], "b": ["x", None, "z"], "c": [1, 2, 3]}
    )
    filled = f.fillna(0.0)
    assert filled.to_dict()["a"] == [1.0, 0.0, 3.0]
    assert filled.to_dict()["b"] == ["x", None, "z"]  # dtype mismatch: untouched
    assert filled._optionals["a"] is False and filled._optionals["b"] is True
    with pytest.raises(ValueError):
        f.fillna("?", subset=["a"])  # strict: wrong-typed fill raises
    assert f.dropna().to_dict()["c"] == [1, 3]
    assert f.dropna(subset=["b"]).to_dict()["b"] == ["x", "z"]


def test_groupby_agg(spark):
    f = MiniFrame.from_dict(
        spark,
        {
            "k": ["a", "a", "b", "b", "b"],
            "v": [1, 2, 3, None, 5],
            "s": ["p", "q", "r", "s", "t"],
        },
    )
    out = f.groupby("k").agg({"v": ["sum", "mean", "count"]}).sort_values("k")
    got = out.to_dict()
    assert got["k"] == ["a", "b"]
    assert got["v_sum"] == [3, 8]
    assert got["v_mean"] == [1.5, 4.0]
    assert got["v_count"] == [2, 2]  # null excluded
    sizes = f.groupby("k").count().sort_values("k").to_dict()
    assert sizes["size"] == [2, 3]
    with pytest.raises(ValueError):
        f.groupby("k").agg({"s": "sum"})  # numeric-only math
    with pytest.raises(ValueError):
        f.groupby("nope")


def test_merge_family(spark):
    left = MiniFrame.from_dict(
        spark, {"k": [1, 2, 3], "v": [10, 20, 30]}
    )
    right = MiniFrame.from_dict(
        spark, {"k": [2, 3, 4], "v": [200, 300, 400]}
    )
    inner = left.merge(right, on="k")
    assert sorted(inner.collect()) == [(2, 20, 200), (3, 30, 300)]
    assert inner.names == ["k", "v", "v_right"]
    lj = left.merge(right, on="k", how="left")
    assert lj._optionals["v_right"] is True
    assert sorted(lj.collect()) == [(1, 10, None), (2, 20, 200), (3, 30, 300)]
    semi = left.merge(right, on="k", how="semi")
    assert semi.names == ["k", "v"]
    assert sorted(r[0] for r in semi.collect()) == [2, 3]
    anti = left.merge(right, on="k", how="anti")
    assert [r[0] for r in anti.collect()] == [1]
    with pytest.raises(ValueError):
        left.merge(right, on="k", how="cross")
    with pytest.raises(ValueError):
        left.merge(right, on="nope")


def test_series_reductions(spark, frame):
    assert frame["sales"].sum() == 19
    assert frame["price"].mean() == pytest.approx(5.875)
    assert frame["price"].min() == 3.5
    assert frame["SKU"].max() == "X4E"
    assert frame["sales"].count() == 4
    assert frame["taxed"].n_unique() == 2
    assert frame["taxed"].value_counts() == [(False, 3), (True, 1)]
    with pytest.raises(ValueError):
        frame["SKU"].sum()
    null_frame = MiniFrame.from_dict(spark, {"x": [1.0, None, 3.0]})
    assert null_frame["x"].sum() == 4.0  # null-skipping
    assert null_frame["x"].count() == 2


def test_sugar_on_scan_backed_frame(spark, sf_dir):
    from mini_pandas_spark.sources import load_table

    part = MiniFrame.from_spark(load_table(spark, sf_dir, "part"))
    top = part.sort_values("p_retailprice", ascending=False).head(3)
    prices = [r["p_retailprice"] for r in top.to_spark().collect()]
    assert prices == sorted(prices, reverse=True) and len(prices) == 3
    agg = part.groupby("p_brand").agg({"p_retailprice": "mean"})
    assert agg.to_spark().count() > 0


def test_rename_swap_is_atomic(spark, frame):
    """All rename mappings apply simultaneously: a swap must exchange the
    columns, not duplicate one (review finding: sequential
    withColumnRenamed collided mid-sequence and silently lost data)."""
    f = MiniFrame.from_dict(spark, {"a": [1, 2], "b": [10, 20], "c": [5, 6]})
    swapped = f.rename({"a": "b", "b": "a"})
    assert swapped.names == ["b", "a", "c"]
    got = swapped.to_dict()
    assert got["b"] == [1, 2] and got["a"] == [10, 20] and got["c"] == [5, 6]
    with pytest.raises(ValueError):
        f.rename({"a": "c"})  # collides with an unrenamed column


def test_merge_suffix_collision_free(spark):
    """A pre-existing v_right on the left must not produce duplicate
    output names: the suffix extends until free."""
    left = MiniFrame.from_dict(
        spark, {"k": [1, 2], "v": [1, 2], "v_right": [7, 8]}
    )
    right = MiniFrame.from_dict(spark, {"k": [1, 2], "v": [10, 20]})
    out = left.merge(right, on="k")
    assert sorted(out.names) == sorted(["k", "v", "v_right", "v_right_right"])
    assert len(set(out.names)) == len(out.names)


def test_merge_outer_key_nullability(spark):
    """right/outer joins surface the other side's null keys — the key's
    optional flag must reflect that."""
    left = MiniFrame.from_dict(spark, {"k": [1, 2], "v": [10, 20]})
    right = MiniFrame.from_dict(spark, {"k": [2, None], "w": [200, 300]})
    assert left.merge(right, on="k", how="outer")._optionals["k"] is True
    assert left.merge(right, on="k", how="right")._optionals["k"] is True
    assert left.merge(right, on="k", how="left")._optionals["k"] is False


def test_fillna_allnull_explicit_subset_raises(spark):
    """Explicitly requesting a fill on an all-None (NoneType) column must
    raise, not silently no-op (strict no-widening contract)."""
    f = MiniFrame.from_dict(spark, {"x": [None, None], "y": [1.0, None]})
    with pytest.raises(ValueError):
        f.fillna(0.0, subset=["x"])
    assert f.fillna(0.0).to_dict()["y"] == [1.0, 0.0]  # implicit: skips x


def test_groupby_alias_collision_raises(spark):
    f = MiniFrame.from_dict(
        spark, {"v_sum": ["a", "b"], "v": [1, 2], "size": [3, 4]}
    )
    with pytest.raises(ValueError):
        f.groupby("v_sum").agg({"v": "sum"})  # output alias = key name
    with pytest.raises(ValueError):
        f.groupby("size").count()


def test_drop_duplicates_deterministic_survivor(spark):
    from mini_pandas_spark import MiniFrame

    df = MiniFrame.from_dict(
        spark,
        {
            "k": ["a", "a", "b", "b", "b"],
            "v": [3, 1, 9, 9, 2],
        },
    )
    out = df.drop_duplicates(subset="k").sort_values("k")
    assert out.to_dict() == {"k": ["a", "b"], "v": [1, 2]}
    # full-row dedup falls back to distinct
    full = df.drop_duplicates().sort_values(["k", "v"])
    assert len(full) == 4


def test_describe_single_pass(spark):
    from mini_pandas_spark import MiniFrame

    df = MiniFrame.from_dict(
        spark,
        {
            "s": ["x", "y", "z"],
            "a": [1, 2, 3],
            "b": [1.0, 2.0, 4.0],
            "t": [True, False, True],
        },
    )
    d = df.describe()
    assert set(d) == {"a", "b"}
    assert d["a"]["count"] == 3 and d["a"]["min"] == 1 and d["a"]["max"] == 3
    assert abs(d["b"]["mean"] - 7.0 / 3) < 1e-12
