"""MiniFrame / MiniSeries — the reference-compatible API veneer.

Replicates the user-visible semantics of the reference engine
(/root/reference/data_frame.py: ``Series`` at :77-344, ``DataFrame`` at
:347-406) on top of **lazy Spark plans**.  Where the reference runs eager
single-threaded Python loops, this veneer only *validates* eagerly (schema,
dtypes, lengths — so errors surface at the same call site as the reference)
and defers all computation to Catalyst.

Semantics replicated exactly (SURVEY.md §1.2-1.3, verified against the
reference by execution):

- strict type inference: first non-None value's exact ``type()`` becomes the
  dtype; any other type (including int vs float) raises
  ``ValueError("All values must have the same type")``
  (reference data_frame.py:91-118);
- ``None`` ⇒ ``optional=True``; all-``None`` column ⇒ dtype ``NoneType``
  (data_frame.py:102-114);
- comparisons (``< <= > >= == !=``) coerce null results to **False** and
  always produce a *non-optional* bool (reference
  ``ReplaceOutputNoneHandler(False)``, data_frame.py:49-68) — implemented as
  ``F.coalesce(pred, F.lit(False))``, NOT SQL three-valued logic;
- arithmetic (``+ - * / %``) propagates null (``PropagateNoneHandler``,
  data_frame.py:19-29) — Spark-native;
- boolean ops (``& | ^ ~``) require bool dtype on both sides and propagate
  null *non-Kleene* (``False & NULL`` is ``NULL``, unlike Spark's Kleene
  ``false``) — implemented with an explicit isNull guard;
- masks must be same-length non-optional boolean (data_frame.py:161-168);
- comparisons are numeric-only; equality needs same dtype or both-numeric;
  arithmetic numeric-only; boolean ops bool-only (data_frame.py:223-243).

Documented divergences (SURVEY.md §7.4): ``int/int`` division yields float
(the reference labels it int but stores floats); ``x/0`` yields null, not
``ZeroDivisionError``; invalid masks *raise* (the reference returns the
exception object, data_frame.py:161-164); ``raise NotImplementedError``
instead of the reference's ``raise NotImplemented``.

Scale note: two series of the **same** frame compose into one Column
expression — the flagship filter compiles to a single scan+filter stage with
no join and no shuffle.  Positional (zip) alignment of series from
*different* frames — which no distributed engine can do for free — is
supported only for driver-local frames via a hidden ``_rid`` row index and
an equi-join, mirroring the only pattern the reference's own tests use.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator

from pyspark.sql import Column, DataFrame as SparkDataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)

RID = "__rid__"

_ALIGN_COUNTER = itertools.count()

_SPARK_TYPE: dict[type, DataType] = {
    int: LongType(),
    float: DoubleType(),
    bool: BooleanType(),
    str: StringType(),
    type(None): NullType(),
}

_NUMERIC = (int, float)


def _is_numeric(dtype: type) -> bool:
    # bool is NOT numeric in the reference (data_frame.py:7-8 excludes it).
    return dtype in _NUMERIC


def infer_dtype(values: list) -> tuple[type, bool]:
    """Strict dtype inference, mirroring Series.from_array_like
    (reference data_frame.py:91-118): exact-type match, no widening."""
    dtype: type | None = None
    optional = False
    for v in values:
        if v is None:
            optional = True
            continue
        if dtype is None:
            dtype = type(v)
        elif type(v) is not dtype:
            raise ValueError("All values must have the same type")
    if dtype is None:
        dtype = type(None)
    return dtype, optional


def _suffix_right(
    left_cols: list[str], other: "MiniFrame", keys: list[str]
) -> tuple[SparkDataFrame, dict[str, str]]:
    """Shared join bookkeeping (left_join and merge): drop the right
    side's row index and suffix right-side names that clash with the
    left, extending the ``_right`` suffix until the name is actually
    free (so a pre-existing ``v_right`` on the left cannot produce
    duplicate output columns)."""
    right = other.sdf.drop(RID) if RID in other.sdf.columns else other.sdf
    taken = set(left_cols)
    rename: dict[str, str] = {}
    for n in right.columns:
        if n in keys or n not in taken:
            taken.add(n)
            continue
        new = f"{n}_right"
        while new in taken or new in right.columns:
            new += "_right"
        rename[n] = new
        taken.add(new)
    for old, new in rename.items():
        right = right.withColumnRenamed(old, new)
    return right, rename


class MiniFrame:
    """A named collection of columns backed by a lazy Spark DataFrame."""

    def __init__(
        self,
        sdf: SparkDataFrame,
        length: int | None = None,
        dtypes: dict[str, type] | None = None,
        optionals: dict[str, bool] | None = None,
    ):
        self.sdf = sdf
        self.length = length  # known only for driver-local frames
        self.names = [c for c in sdf.columns if c != RID]
        self._dtypes = dtypes or {}
        self._optionals = optionals or {}
        if not self._dtypes:
            for f in sdf.schema.fields:
                if f.name == RID:
                    continue
                self._dtypes[f.name] = _py_type_of(f.dataType)
                self._optionals[f.name] = f.nullable

    # -- construction ------------------------------------------------------

    @classmethod
    def from_dict(cls, spark: SparkSession, data: dict[str, list]) -> "MiniFrame":
        """Mirror of reference DataFrame.from_dict (data_frame.py:391-406):
        per-column strict inference + rectangularity check, eager."""
        if not isinstance(data, dict):
            raise ValueError("from_dict expects a dict of name -> list")
        names = list(data.keys())
        length: int | None = None
        dtypes: dict[str, type] = {}
        optionals: dict[str, bool] = {}
        for name, values in data.items():
            if not isinstance(values, (list, tuple)):
                raise ValueError("All columns must be array-like")
            if length is None:
                length = len(values)
            elif len(values) != length:
                raise ValueError("All columns must have the same length")
            dtypes[name], optionals[name] = infer_dtype(list(values))
        length = length or 0
        fields = [StructField(RID, LongType(), False)] + [
            StructField(n, _SPARK_TYPE[dtypes[n]], optionals[n]) for n in names
        ]
        rows = [
            (i, *vals) for i, vals in enumerate(zip(*(data[n] for n in names)))
        ] if names else []
        sdf = spark.createDataFrame(rows, StructType(fields))
        return cls(sdf, length=length, dtypes=dtypes, optionals=optionals)

    @classmethod
    def from_spark(cls, sdf: SparkDataFrame) -> "MiniFrame":
        """Wrap an arbitrary Spark DataFrame (e.g. a parquet scan)."""
        return cls(sdf)

    # -- projection / filter ----------------------------------------------

    def get_column(self, name: str) -> "MiniSeries":
        if name not in self.names:
            # exact reference message (data_frame.py:354)
            raise ValueError("Column not found")
        return MiniSeries(
            parent=self,
            expr=F.col(name),
            dtype=self._dtypes[name],
            optional=self._optionals[name],
            name=name,
        )

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.get_column(key)
        if isinstance(key, list):
            for k in key:
                if k not in self.names:
                    raise ValueError("Column not found")
            sel = ([RID] if RID in self.sdf.columns else []) + key
            return MiniFrame(
                self.sdf.select(*sel),
                length=self.length,
                dtypes={k: self._dtypes[k] for k in key},
                optionals={k: self._optionals[k] for k in key},
            )
        if isinstance(key, MiniSeries):
            return self.apply_mask(key)
        raise NotImplementedError(f"unsupported key type {type(key).__name__}")

    def apply_mask(self, mask: "MiniSeries") -> "MiniFrame":
        """Filter rows by a boolean mask (reference df[mask],
        data_frame.py:374-385; mask validation :161-168).

        Optional-mask policy: driver-local frames (the reference-fixture
        world, where nullability is inferred from actual data) keep the
        reference's strict raise on optional masks.  Scan-backed frames
        are schema-pessimistic (parquet marks everything nullable), so an
        optional mask is accepted and coerced null→False — which in
        filter position is exactly the reference's
        ReplaceOutputNoneHandler(False) semantics."""
        strict = RID in self.sdf.columns
        _validate_mask(mask, self.length, strict_optional=strict)
        if mask.parent is self:
            cond = mask.filter_expr
            if mask.optional:
                cond = F.coalesce(cond, F.lit(False))
            return MiniFrame(
                self.sdf.filter(cond),
                length=None,
                dtypes=dict(self._dtypes),
                optionals=dict(self._optionals),
            )
        # Mask built from a different (local) frame: align positionally.
        if RID not in self.sdf.columns or RID not in mask.parent.sdf.columns:
            raise ValueError(
                "Masks from a different frame require driver-local frames"
            )
        keep = mask.parent.sdf.filter(mask.filter_expr).select(RID)
        return MiniFrame(
            self.sdf.join(keep, on=RID, how="left_semi"),
            length=None,
            dtypes=dict(self._dtypes),
            optionals=dict(self._optionals),
        )

    # -- join --------------------------------------------------------------

    def left_join(self, other: "MiniFrame", column: str) -> "MiniFrame":
        """The *intended* semantics of the reference's broken hash join
        (data_frame.py:357-370, crashes with NameError — SURVEY.md §2.1 #14):
        single-key left-outer equi join; clashing right names get a
        ``_right`` suffix.  Spark chooses broadcast-hash vs sort-merge."""
        if column not in self.names or column not in other.names:
            raise ValueError("Column not found")
        right, rename = _suffix_right(self.sdf.columns, other, keys=[column])
        joined = self.sdf.join(right, on=column, how="left")
        dtypes = dict(self._dtypes)
        optionals = dict(self._optionals)
        for n in other.names:
            if n == column:
                continue
            out = rename.get(n, n)
            dtypes[out] = other._dtypes[n]
            optionals[out] = True  # left join may null right side
        return MiniFrame(joined, length=None, dtypes=dtypes, optionals=optionals)

    # -- pandas-like sugar (beyond the reference surface) ------------------
    #
    # The reference never got past its broken left_join, but its API is
    # visibly pandas-shaped; these helpers give a reference user the
    # pandas verbs they'd reach for next, as thin lazy wrappers over the
    # Spark ops this engine already exposes.  Validation stays eager
    # (reference error-at-call-site discipline); execution stays deferred.

    def _copy(self, sdf: SparkDataFrame, length=None, dtypes=None, optionals=None):
        return MiniFrame(
            sdf,
            length=length,
            dtypes=dtypes or dict(self._dtypes),
            optionals=optionals or dict(self._optionals),
        )

    def sort_values(self, by, ascending=True) -> "MiniFrame":
        """Stable multi-key sort.  Driver-local frames reassign the hidden
        row index to the new order so later positional ops see the sorted
        sequence; scan-backed frames compile to a plain global orderBy
        (range-partitioned exchange at scale)."""
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        if len(asc) != len(by):
            raise ValueError("ascending must match by in length")
        for c in by:
            if c not in self.names:
                raise ValueError("Column not found")
        keys = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(by, asc)]
        if RID in self.sdf.columns:
            from pyspark.sql.window import Window

            w = Window.orderBy(*keys, F.col(RID).asc())  # RID tiebreak = stable
            sdf = (
                self.sdf.withColumn("__new_rid__", F.row_number().over(w) - 1)
                .drop(RID)
                .withColumnRenamed("__new_rid__", RID)
            )
            return self._copy(sdf, length=self.length)
        return self._copy(self.sdf.orderBy(*keys))

    def head(self, n: int = 5) -> "MiniFrame":
        """First n rows (positional order for driver-local frames; for
        scan-backed frames simply a limit — Spark relations are unordered,
        matching the reference's lack of an index)."""
        if RID in self.sdf.columns:
            return self._copy(self.sdf.orderBy(RID).limit(n))
        return self._copy(self.sdf.limit(n))

    def rename(self, mapping: dict[str, str]) -> "MiniFrame":
        """Atomic column rename: all mappings apply simultaneously (a
        swap like ``{"a": "b", "b": "a"}`` is valid), implemented as one
        aliasing projection rather than sequential withColumnRenamed
        (which would collide mid-sequence)."""
        for old in mapping:
            if old not in self.names:
                raise ValueError("Column not found")
        targets = [mapping.get(n, n) for n in self.names]
        dupes = {t for t in targets if targets.count(t) > 1}
        if dupes:
            raise ValueError(f"Column already exists: {sorted(dupes)[0]}")
        sel = ([F.col(RID)] if RID in self.sdf.columns else []) + [
            F.col(n).alias(mapping.get(n, n)) for n in self.names
        ]
        dtypes = {mapping.get(k, k): v for k, v in self._dtypes.items()}
        optionals = {mapping.get(k, k): v for k, v in self._optionals.items()}
        return self._copy(
            self.sdf.select(*sel), length=self.length, dtypes=dtypes, optionals=optionals
        )

    def drop(self, columns) -> "MiniFrame":
        columns = [columns] if isinstance(columns, str) else list(columns)
        for c in columns:
            if c not in self.names:
                raise ValueError("Column not found")
        dtypes = {k: v for k, v in self._dtypes.items() if k not in columns}
        optionals = {k: v for k, v in self._optionals.items() if k not in columns}
        return self._copy(
            self.sdf.drop(*columns), length=self.length, dtypes=dtypes, optionals=optionals
        )

    def with_column(self, name: str, series: "MiniSeries") -> "MiniFrame":
        """Attach a computed series (built from this frame's columns) as a
        new column — the veneer's projection-extension verb."""
        if not isinstance(series, MiniSeries):
            raise ValueError("with_column expects a MiniSeries")
        if series.parent is not self:
            raise ValueError("Series must derive from this frame")
        dtypes = dict(self._dtypes)
        optionals = dict(self._optionals)
        dtypes[name] = series.dtype
        optionals[name] = series.optional
        return self._copy(
            self.sdf.withColumn(name, series.expr),
            length=self.length,
            dtypes=dtypes,
            optionals=optionals,
        )

    def fillna(self, value, subset=None) -> "MiniFrame":
        """Replace nulls with ``value`` in columns of the matching dtype
        (strict: filling a column with a differently-typed value raises,
        per the reference's no-widening rule).  Filled columns become
        non-optional."""
        cols = subset if subset is not None else self.names
        cols = [cols] if isinstance(cols, str) else list(cols)
        for c in cols:
            if c not in self.names:
                raise ValueError("Column not found")
        targets = []
        for c in cols:
            dt = self._dtypes[c]
            if subset is not None and type(value) is not dt:
                # strict no-widening: an explicitly requested fill with a
                # mismatched type (incl. any fill of an all-None column,
                # whose dtype is NoneType) must raise, never no-op
                raise ValueError("All values must have the same type")
            if dt is type(None):
                continue  # implicit subset: all-null column untouched
            if type(value) is dt and self._optionals[c]:
                targets.append(c)
        sdf = self.sdf.fillna(value, subset=targets) if targets else self.sdf
        optionals = dict(self._optionals)
        for c in targets:
            optionals[c] = False
        return self._copy(sdf, length=self.length, optionals=optionals)

    def dropna(self, subset=None) -> "MiniFrame":
        cols = subset if subset is not None else self.names
        cols = [cols] if isinstance(cols, str) else list(cols)
        for c in cols:
            if c not in self.names:
                raise ValueError("Column not found")
        return self._copy(self.sdf.dropna(subset=cols))

    def drop_duplicates(self, subset=None) -> "MiniFrame":
        """Deterministic dedup: keeps the first row per key under the
        frame's current column order (min of the remaining columns as the
        canonical survivor — NOT Spark's nondeterministic dropDuplicates,
        whose survivor depends on partitioning)."""
        cols = subset if subset is not None else self.names
        cols = [cols] if isinstance(cols, str) else list(cols)
        for c in cols:
            if c not in self.names:
                raise ValueError("Column not found")
        others = [c for c in self.names if c not in cols]
        if not others:
            return self._copy(self.sdf.select(*self.names).distinct())
        from pyspark.sql.window import Window

        order = [F.col(c).asc_nulls_last() for c in others]
        if RID in self.sdf.columns:
            order.append(F.col(RID).asc())
        w = Window.partitionBy(*cols).orderBy(*order)
        sdf = (
            self.sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return self._copy(sdf, length=None)

    def describe(self) -> dict:
        """Summary stats for numeric columns (count / mean / min / max),
        computed in ONE aggregation pass (not pandas' quantile sweep)."""
        nums = [
            c
            for c in self.names
            if _is_numeric(self._dtypes[c]) and self._dtypes[c] is not bool
        ]
        aggs = []
        for c in nums:
            aggs += [
                F.count(F.col(c)).alias(f"{c}__count"),
                F.avg(F.col(c)).alias(f"{c}__mean"),
                F.min(F.col(c)).alias(f"{c}__min"),
                F.max(F.col(c)).alias(f"{c}__max"),
            ]
        if not aggs:
            return {}
        row = self.sdf.agg(*aggs).collect()[0].asDict()
        return {
            c: {
                "count": row[f"{c}__count"],
                "mean": row[f"{c}__mean"],
                "min": row[f"{c}__min"],
                "max": row[f"{c}__max"],
            }
            for c in nums
        }

    def groupby(self, by) -> "MiniGroupBy":
        by = [by] if isinstance(by, str) else list(by)
        for c in by:
            if c not in self.names:
                raise ValueError("Column not found")
        return MiniGroupBy(self, by)

    def merge(self, other: "MiniFrame", on, how: str = "inner") -> "MiniFrame":
        """Key-equality join family (generalizes :meth:`left_join`, which
        replicates the reference's intended single-key left join).
        ``how`` ∈ inner/left/right/outer/semi/anti; clashing right-side
        names get a ``_right`` suffix.  Spark picks broadcast-hash vs
        sort-merge; result order is undefined (it's a shuffle)."""
        hows = {
            "inner": "inner",
            "left": "left",
            "right": "right",
            "outer": "full",
            "semi": "left_semi",
            "anti": "left_anti",
        }
        if how not in hows:
            raise ValueError(f"how must be one of {sorted(hows)}")
        on = [on] if isinstance(on, str) else list(on)
        for c in on:
            if c not in self.names or c not in other.names:
                raise ValueError("Column not found")
        left = self.sdf.drop(RID) if RID in self.sdf.columns else self.sdf
        right, rename = _suffix_right(left.columns, other, keys=on)
        joined = left.join(right, on=on, how=hows[how])
        dtypes, optionals = {}, {}
        right_nullable = how in ("left", "outer")
        left_nullable = how in ("right", "outer")
        for n in self.names:
            dtypes[n] = self._dtypes[n]
            if n in on:
                # join keys: the side(s) whose rows survive determine
                # whether a null key can appear in the output
                if how == "right":
                    optionals[n] = other._optionals[n]
                elif how == "outer":
                    optionals[n] = self._optionals[n] or other._optionals[n]
                else:
                    optionals[n] = self._optionals[n]
            else:
                optionals[n] = self._optionals[n] or left_nullable
        if how not in ("semi", "anti"):
            for n in other.names:
                if n in on:
                    continue
                out = rename.get(n, n)
                dtypes[out] = other._dtypes[n]
                optionals[out] = other._optionals[n] or right_nullable
        return MiniFrame(joined, length=None, dtypes=dtypes, optionals=optionals)

    # -- materialization (driver-side; small data only) --------------------

    def _ordered(self) -> SparkDataFrame:
        if RID in self.sdf.columns:
            return self.sdf.orderBy(RID).drop(RID)
        return self.sdf

    def collect(self) -> list[tuple]:
        return [tuple(r) for r in self._ordered().collect()]

    def to_dict(self) -> dict[str, list]:
        rows = self._ordered().collect()
        return {n: [r[n] for r in rows] for n in self.names}

    def __len__(self) -> int:
        if self.length is not None:
            return self.length
        return self.sdf.count()

    def __repr__(self) -> str:
        pdf = self._ordered().limit(20).toPandas()
        return pdf.to_string(index=False)

    def to_spark(self) -> SparkDataFrame:
        """Escape hatch to the full Spark DataFrame API (the scale path)."""
        return self.sdf.drop(RID) if RID in self.sdf.columns else self.sdf


class MiniGroupBy:
    """Deferred group-by handle returned by :meth:`MiniFrame.groupby`.

    ``agg`` takes a ``{column: func | [funcs]}`` spec with funcs from
    sum/mean/min/max/count; output columns are named ``{col}_{func}``.
    Compiles to one hash aggregation (map-side partial + single shuffle
    on the group keys)."""

    _FUNCS = {"sum", "mean", "min", "max", "count"}

    def __init__(self, frame: MiniFrame, by: list[str]):
        self._frame = frame
        self._by = by

    def agg(self, spec: dict) -> MiniFrame:
        if not isinstance(spec, dict) or not spec:
            raise ValueError("agg expects a non-empty dict of column -> func(s)")
        frame = self._frame
        exprs, dtypes, optionals = [], {}, {}
        for k in self._by:
            dtypes[k] = frame._dtypes[k]
            optionals[k] = frame._optionals[k]
        for col, funcs in spec.items():
            if col not in frame.names:
                raise ValueError("Column not found")
            funcs = [funcs] if isinstance(funcs, str) else list(funcs)
            for fn in funcs:
                if fn not in self._FUNCS:
                    raise ValueError(f"Unsupported aggregate: {fn}")
                if fn in ("sum", "mean") and not _is_numeric(frame._dtypes[col]):
                    # reference type discipline: numeric-only math
                    raise ValueError("Unsupported operand type")
                out = f"{col}_{fn}"
                if out in dtypes:  # clashes a group key or another agg
                    raise ValueError(f"Column already exists: {out}")
                if fn == "count":
                    exprs.append(F.count(F.col(col)).alias(out))
                    dtypes[out], optionals[out] = int, False
                elif fn == "mean":
                    exprs.append(F.avg(F.col(col)).alias(out))
                    dtypes[out], optionals[out] = float, True
                else:
                    exprs.append(getattr(F, fn)(F.col(col)).alias(out))
                    dtypes[out] = frame._dtypes[col]
                    optionals[out] = True
        sdf = frame.to_spark().groupBy(*self._by).agg(*exprs)
        return MiniFrame(sdf, length=None, dtypes=dtypes, optionals=optionals)

    def count(self) -> MiniFrame:
        """Group sizes as a ``size`` column (pandas .size() analogue)."""
        frame = self._frame
        if "size" in self._by:
            raise ValueError("Column already exists: size")
        sdf = frame.to_spark().groupBy(*self._by).agg(F.count(F.lit(1)).alias("size"))
        dtypes = {k: frame._dtypes[k] for k in self._by} | {"size": int}
        optionals = {k: frame._optionals[k] for k in self._by} | {"size": False}
        return MiniFrame(sdf, length=None, dtypes=dtypes, optionals=optionals)


def _py_type_of(dt: DataType) -> type:
    """Collapse any Spark type onto the reference's four-dtype model:
    integral → int, fractional/decimal → float, everything else exact."""
    from pyspark.sql.types import (
        ByteType,
        DateType,
        DecimalType,
        FloatType,
        IntegerType,
        ShortType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return int
    if isinstance(dt, (FloatType, DoubleType, DecimalType)):
        return float
    if isinstance(dt, BooleanType):
        return bool
    if isinstance(dt, StringType):
        return str
    if isinstance(dt, NullType):
        return type(None)
    if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
        return object  # orderable via Spark API directly; veneer ops N/A
    return object


def _validate_mask(mask: Any, length: int | None, strict_optional: bool = True) -> None:
    if not isinstance(mask, MiniSeries):
        raise ValueError("Mask must be a Series")
    if mask.dtype is not bool:
        raise ValueError("Mask must be a boolean Series")
    if mask.optional and strict_optional:
        # reference raises on optional masks (data_frame.py:167-168)
        raise ValueError("Mask must not be optional")
    if (
        length is not None
        and mask.parent.length is not None
        and mask.parent.length != length
    ):
        raise ValueError("Mask length must match")


class MiniSeries:
    """A named, typed, nullable column expression bound to a MiniFrame."""

    def __init__(
        self,
        parent: MiniFrame,
        expr: Column,
        dtype: type,
        optional: bool,
        name: str | None = None,
        filter_expr: Column | None = None,
    ):
        self.parent = parent
        self.expr = expr
        self.dtype = dtype
        self.optional = optional
        self.name = name
        # ``filter_expr`` is an expression equivalent to ``expr`` *in filter
        # position only* (WHERE drops null predicates, so the null→False
        # coalesce wrapper is redundant there).  Filters use it so raw
        # comparisons reach the parquet scan as PushedFilters; materializing
        # the mask as a column still uses the coerced ``expr``.
        self.filter_expr = filter_expr if filter_expr is not None else expr

    # -- construction ------------------------------------------------------

    @classmethod
    def from_array_like(
        cls, spark: SparkSession, values: list, name: str | None = None
    ) -> "MiniSeries":
        if not isinstance(values, (list, tuple)):
            raise ValueError("Series data must be array-like")
        dtype, optional = infer_dtype(list(values))
        col = name or "value"
        frame = MiniFrame.from_dict(spark, {col: list(values)})
        s = frame.get_column(col)
        s.name = name
        return s

    # -- materialization ---------------------------------------------------

    def to_list(self) -> list:
        col = self.expr.alias("__v__")
        sdf = self.parent.sdf
        if RID in sdf.columns:
            rows = sdf.select(F.col(RID), col).orderBy(RID).collect()
        else:
            rows = sdf.select(col).collect()
        return [r["__v__"] for r in rows]

    def __len__(self) -> int:
        return len(self.parent)

    def __iter__(self) -> Iterator:
        return iter(self.to_list())

    def __getitem__(self, key):
        if isinstance(key, MiniSeries):
            return self.apply_mask(key)
        if isinstance(key, int):
            return self.to_list()[key]
        raise NotImplementedError(f"unsupported key type {type(key).__name__}")

    def apply_mask(self, mask: "MiniSeries") -> "MiniSeries":
        filtered = self.parent.apply_mask(mask)
        out = self.name or "value"
        proj = filtered.sdf.select(
            *([RID] if RID in filtered.sdf.columns else []),
            self.expr.alias(out),
        )
        frame = MiniFrame(
            proj,
            length=None,
            dtypes={out: self.dtype},
            optionals={out: self.optional},
        )
        return frame.get_column(out)

    def __repr__(self) -> str:
        return f"MiniSeries(name={self.name!r}, dtype={self.dtype.__name__}, optional={self.optional}, data={self.to_list()!r})"

    # -- operator dispatch (mirrors reference _execute, data_frame.py:208-257)

    def _resolve(self, other: Any) -> tuple[Column, type, bool, bool]:
        """Return (expr, dtype, optional, is_scalar) for the RHS."""
        if isinstance(other, MiniSeries):
            if other.parent is self.parent:
                return other.expr, other.dtype, other.optional, False
            return self._align(other)
        if other is None:
            raise ValueError("Cannot operate with a bare None scalar")
        return F.lit(other), type(other), False, True

    def _align(self, other: "MiniSeries") -> tuple[Column, type, bool, bool]:
        """Positional alignment of a series from another frame via the
        hidden row index (driver-local frames only).  Eagerly checks the
        length like the reference's _biop (data_frame.py:199-200)."""
        left, right = self.parent, other.parent
        if left.length is None or right.length is None:
            raise ValueError(
                "Positional ops across frames need driver-local frames"
            )
        if left.length != right.length:
            raise ValueError("Series must have the same length")
        if RID not in left.sdf.columns or RID not in right.sdf.columns:
            raise ValueError("Positional ops across frames need row ids")
        rname = f"__rhs_{next(_ALIGN_COUNTER)}__"
        joined = left.sdf.join(
            other.parent.sdf.select(F.col(RID), other.expr.alias(rname)),
            on=RID,
            how="inner",
        )
        merged = MiniFrame(
            joined,
            length=left.length,
            dtypes={**left._dtypes, rname: other.dtype},
            optionals={**left._optionals, rname: other.optional},
        )
        # Rebind self onto the merged frame so the caller composes there.
        self.parent = merged
        return F.col(rname), other.dtype, other.optional, False

    # comparison ops: numeric-only, null -> False, output non-optional
    # (reference data_frame.py:223-227, 272-282 + ReplaceOutputNoneHandler)
    def _compare(self, other: Any, op) -> "MiniSeries":
        rexpr, rdtype, _, _ = self._resolve(other)
        if not (_is_numeric(self.dtype) and _is_numeric(rdtype)):
            raise ValueError("Comparison requires numeric operands")
        raw = op(self.expr, rexpr)
        return MiniSeries(
            self.parent,
            F.coalesce(raw, F.lit(False)),
            bool,
            False,
            filter_expr=raw,
        )

    def __lt__(self, other):
        return self._compare(other, lambda a, b: a < b)

    def __le__(self, other):
        return self._compare(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._compare(other, lambda a, b: a > b)

    def __ge__(self, other):
        return self._compare(other, lambda a, b: a >= b)

    # equality: same dtype or both numeric (reference data_frame.py:228-233)
    def _equality(self, other: Any, op) -> "MiniSeries":
        rexpr, rdtype, _, _ = self._resolve(other)
        if self.dtype is not rdtype and not (
            _is_numeric(self.dtype) and _is_numeric(rdtype)
        ):
            raise ValueError("Equality requires same or numeric dtypes")
        raw = op(self.expr, rexpr)
        return MiniSeries(
            self.parent,
            F.coalesce(raw, F.lit(False)),
            bool,
            False,
            filter_expr=raw,
        )

    def __eq__(self, other):  # type: ignore[override]
        return self._equality(other, lambda a, b: a == b)

    def __ne__(self, other):  # type: ignore[override]
        return self._equality(other, lambda a, b: a != b)

    def __hash__(self):
        return id(self)

    # arithmetic: numeric-only, null propagates, float wins
    # (reference data_frame.py:234-238, 292-320)
    def _arith(self, other: Any, op, out_float: bool = False, swap: bool = False) -> "MiniSeries":
        rexpr, rdtype, ropt, _ = self._resolve(other)
        if not (_is_numeric(self.dtype) and _is_numeric(rdtype)):
            raise ValueError("Arithmetic requires numeric operands")
        a, b = (rexpr, self.expr) if swap else (self.expr, rexpr)
        out = float if (out_float or self.dtype is float or rdtype is float) else int
        raw = op(a, b)
        if out is int:
            raw = raw.cast(LongType())
        return MiniSeries(self.parent, raw, out, self.optional or ropt)

    def __add__(self, other):
        return self._arith(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._arith(other, lambda a, b: a + b, swap=True)

    def __sub__(self, other):
        return self._arith(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._arith(other, lambda a, b: a - b, swap=True)

    def __mul__(self, other):
        return self._arith(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._arith(other, lambda a, b: a * b, swap=True)

    def __truediv__(self, other):
        # always float (documented divergence, SURVEY.md §7.4); x/0 -> null
        return self._arith(other, lambda a, b: a / b, out_float=True)

    def __rtruediv__(self, other):
        return self._arith(other, lambda a, b: a / b, out_float=True, swap=True)

    def __mod__(self, other):
        # F.pmod matches Python % for positive divisors (the only case the
        # reference's tests exercise); Spark's % matches C semantics.
        return self._arith(other, lambda a, b: F.pmod(a, b))

    def __rmod__(self, other):
        return self._arith(other, lambda a, b: F.pmod(a, b), swap=True)

    # boolean ops: bool-only, null propagates NON-Kleene
    # (reference data_frame.py:239-243, 323-339; False & NULL -> NULL)
    def _boolop(self, other: Any, op, conjunctive: bool = False) -> "MiniSeries":
        same_frame = isinstance(other, MiniSeries) and other.parent is self.parent
        rexpr, rdtype, ropt, _ = self._resolve(other)
        if self.dtype is not bool or rdtype is not bool:
            raise ValueError("Boolean ops require boolean operands")
        raw = op(self.expr, rexpr)
        optional = self.optional or ropt
        if optional:
            raw = F.when(
                self.expr.isNull() | rexpr.isNull(), F.lit(None).cast(BooleanType())
            ).otherwise(raw)
        # For AND/OR of non-optional masks, combining the *raw* filter
        # expressions is filter-equivalent (null ⇒ row dropped ⇒ same as
        # False on either side of AND/OR-of-conjuncts) and stays pushdown-
        # friendly.  Not valid for XOR (False≠NULL differs), so XOR keeps
        # the coerced expression.
        fexpr = None
        if conjunctive and not optional:
            rfilter = other.filter_expr if same_frame else rexpr
            fexpr = op(self.filter_expr, rfilter)
        return MiniSeries(self.parent, raw, bool, optional, filter_expr=fexpr)

    def __and__(self, other):
        return self._boolop(other, lambda a, b: a & b, conjunctive=True)

    def __rand__(self, other):
        return self._boolop(other, lambda a, b: a & b, conjunctive=True)

    def __or__(self, other):
        return self._boolop(other, lambda a, b: a | b, conjunctive=True)

    def __ror__(self, other):
        return self._boolop(other, lambda a, b: a | b, conjunctive=True)

    def __xor__(self, other):
        return self._boolop(other, lambda a, b: a != b)

    def __rxor__(self, other):
        return self._boolop(other, lambda a, b: a != b)

    def __invert__(self):
        if self.dtype is not bool:
            raise ValueError("Boolean ops require boolean operands")
        return MiniSeries(self.parent, ~self.expr, bool, self.optional)

    # -- reductions & profiling (pandas-like sugar; one agg job each) ------

    def _agg_scalar(self, expr: Column):
        return self.parent.sdf.agg(expr.alias("__v__")).collect()[0]["__v__"]

    def sum(self):
        """Null-skipping sum (numeric-only, reference type discipline;
        all-null → None, Spark semantics)."""
        if not _is_numeric(self.dtype):
            raise ValueError("Unsupported operand type")
        return self._agg_scalar(F.sum(self.expr))

    def mean(self):
        if not _is_numeric(self.dtype):
            raise ValueError("Unsupported operand type")
        return self._agg_scalar(F.avg(self.expr))

    def min(self):
        if not (_is_numeric(self.dtype) or self.dtype is str):
            raise ValueError("Unsupported operand type")
        return self._agg_scalar(F.min(self.expr))

    def max(self):
        if not (_is_numeric(self.dtype) or self.dtype is str):
            raise ValueError("Unsupported operand type")
        return self._agg_scalar(F.max(self.expr))

    def count(self) -> int:
        """Number of non-null values (pandas semantics; len() counts all)."""
        return int(self._agg_scalar(F.count(self.expr)))

    def n_unique(self) -> int:
        """Exact distinct count (nulls excluded).  At scale prefer
        approx: the engine exposes approx_count_distinct via queries."""
        return int(self._agg_scalar(F.count_distinct(self.expr)))

    def value_counts(self) -> list[tuple]:
        """(value, count) pairs, most frequent first (value ascending as
        tiebreak), nulls excluded — driver-side list, small data only."""
        rows = (
            self.parent.sdf.select(self.expr.alias("__v__"))
            .filter(F.col("__v__").isNotNull())
            .groupBy("__v__")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .orderBy(F.col("__n__").desc(), F.col("__v__").asc())
            .collect()
        )
        return [(r["__v__"], r["__n__"]) for r in rows]
