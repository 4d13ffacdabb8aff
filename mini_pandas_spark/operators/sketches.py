"""Mergeable-sketch aggregation operators.

The reference has no aggregation at all (SURVEY.md §2.2); this module
extends the §2.3 aggregate surface with the two sketch families a
100 TB pipeline leans on when exact answers are unaffordable:

- **HyperLogLog sketches as first-class values** (Datasketches HLL via
  ``hll_sketch_agg`` / ``hll_union_agg``): build per-partition-key
  sketches ONCE, then answer coarser-grain distinct-count questions by
  unioning the stored sketches — never re-scanning the fact table.
  This is the materialized-rollup pattern exact COUNT(DISTINCT) cannot
  support (distinct counts are not additive; sketches are mergeable).
- **Approximate quantiles** (``percentile_approx``): bounded-memory
  mergeable quantile summaries vs the exact interpolated percentiles in
  relational.quantiles_prices.

Estimates are engine-specific, so these queries are rows-only in the
driver gate; tests/test_pipeline_operators.py pins estimate accuracy
against the exact answers computed by the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def hll_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer estimates per order-month from HLL sketches,
    plus an ALL row unioning the monthly sketches — one scan builds the
    monthly sketches, the grand total merges them without touching
    orders again (exact distincts cannot roll up this way).

    Scale: the shuffle carries one ~KB sketch per month instead of the
    distinct key expansion; the union pass reads 12 rows.  At 100 TB the
    monthly sketch table is a stored artifact refreshed incrementally,
    and every coarser rollup (quarter, year, lifetime) is a sketch-union
    over it.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly_sk = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.hll_sketch_agg("o_custkey", 14).alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    monthly = monthly_sk.select(
        "month",
        F.hll_sketch_estimate("sk").alias("est_distinct_custs"),
        "n_orders",
    )
    total = monthly_sk.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_orders").alias("n_orders"),
    ).select(
        F.lit("ALL").alias("month"),
        F.hll_sketch_estimate("sk").alias("est_distinct_custs"),
        "n_orders",
    )
    return monthly.unionByName(total)


def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of extended price per return flag via
    mergeable quantile summaries (percentile_approx, accuracy 10000),
    the bounded-memory counterpart of relational.quantiles_prices.

    Scale: exact percentiles need a full sort (or per-group collect) —
    the sketch is built map-side and merged, one tiny-keyed shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("qs"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            "l_returnflag",
            F.col("qs")[0].alias("p50_approx"),
            F.col("qs")[1].alias("p90_approx"),
            F.col("qs")[2].alias("p99_approx"),
            "n_rows",
        )
    )


KMV_K = 256
_KMV_M = float(1 << 63)  # hash range after the unsigned shift: [0, 2^63)


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketches with SET OPERATIONS: distinct
    estimates for the events user set and the customer key set, their
    union, and their intersection (via the merged sketch's Jaccard
    estimate) — the sketch family that answers |A ∪ B| / |A ∩ B|
    questions HLL union alone cannot (no native intersection), using
    only k stored hashes per set (k=256: ~6% std error on distincts;
    sets smaller than k are EXACT — the sketch holds every hash).

    Estimator: with h uniform on [0, M), E[|S|] ≈ (k-1)·M / h_(k) where
    h_(k) is the k-th smallest hash; below k distinct values the sketch
    is exact.  Intersection: ρ = |k-mins of A∪B present in both A and
    B| / k, |A∩B| ≈ ρ·|A∪B|.

    Scale: each sketch is distinct-then-TakeOrdered(k) — a per-partition
    k-heap, shuffling only k×partitions rows; merging unions two k-row
    frames.  Everything stays in DataFrames (1-row aggregate crossJoins,
    no driver collect).  Rows-only in the driver gate (xxhash64 is
    engine-specific); accuracy pinned vs exact counts in pytest.
    """
    k = KMV_K

    def mins(df: DataFrame) -> DataFrame:
        h = F.shiftrightunsigned(F.xxhash64(F.col("key")), 1).alias("h")
        return df.select("key").distinct().select(h).orderBy("h").limit(k)

    def est_stats(m: DataFrame, name: str) -> DataFrame:
        s = m.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
            (F.col("n") - 1) * F.lit(_KMV_M) / F.col("kth")
        )
        return s.select(
            F.lit(name).alias("set_name"),
            F.round(est).cast("long").alias("est_distinct"),
        )

    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    me, mc = mins(e), mins(c)
    merged = me.unionByName(mc).select("h").distinct().orderBy("h").limit(k)

    union_stats = merged.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    union_est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        (F.col("n") - 1) * F.lit(_KMV_M) / F.col("kth")
    )
    shared = (
        merged.join(me, "h").join(mc, "h").agg(F.count(F.lit(1)).alias("n_shared"))
    )
    inter_row = (
        union_stats.crossJoin(F.broadcast(shared))
        .select(
            F.lit("intersection").alias("set_name"),
            F.round(union_est * F.col("n_shared") / F.lit(k))
            .cast("long")
            .alias("est_distinct"),
        )
    )
    union_row = union_stats.select(
        F.lit("union").alias("set_name"),
        F.round(union_est).cast("long").alias("est_distinct"),
    )
    return (
        est_stats(me, "events_users")
        .unionByName(est_stats(mc, "customers"))
        .unionByName(union_row)
        .unionByName(inter_row)
        .orderBy("set_name")
    )


MG_CAPACITY = 256
HH_TOP = 20


def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over document tokens via per-partition Misra-Gries
    summaries: each Arrow batch partition keeps a 256-counter summary
    (any token with global frequency > N/256 is guaranteed to survive),
    the merged candidate set is then re-counted EXACTLY with one JVM
    explode pass restricted to candidates, and the top 20 are emitted.
    This is the two-phase candidates→verify shape that finds frequent
    items at 100 TB without a full-vocabulary shuffle.

    Scale: the Python pass ships one ≤256-row summary per partition; the
    verify pass semi-joins the (broadcast) candidate set before the
    aggregation, so the shuffle carries only candidate tokens.  Oracle:
    the exact top-20 (MG guarantee makes candidates ⊇ true top-20 at
    this corpus's skew).
    """
    d = load_table(spark, sf_dir, "documents").select("text")

    def mg_partials(batches):
        import pandas as pd

        cap = 256
        counters: dict = {}
        for pdf in batches:
            for text in pdf["text"]:
                for tok in text.split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < cap:
                        counters[tok] = 1
                    else:
                        dead = []
                        for t2 in counters:
                            counters[t2] -= 1
                            if counters[t2] == 0:
                                dead.append(t2)
                        for t2 in dead:
                            del counters[t2]
        yield pd.DataFrame(
            {"token": list(counters.keys()), "bound": list(counters.values())}
        )

    candidates = (
        d.mapInPandas(mg_partials, "token string, bound long")
        .select("token")
        .distinct()
    )
    toks = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(HH_TOP)
    )


TDIGEST_MAX_CENTROIDS = 64


def tdigest_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest-style mergeable quantile sketch over ``events.value``:
    each partition compresses its values into ≤64 (mean, weight)
    centroids in one Arrow pass; the tiny centroid set (partitions×64
    rows) is merged and re-compressed once, then p50/p90/p99 are read
    off the cumulative-weight curve.

    This is the pattern that replaces exact global percentiles at
    100 TB: the data is touched exactly once, the shuffle moves only
    centroids (KB, not TB), and — unlike percentile_approx's opaque
    internal state — the sketch is a plain DataFrame you can persist to
    parquet and merge across days/runs (mergeable-summary property).

    Estimates are partitioning-dependent (compression boundaries move),
    so the query is rows-only in the driver gate;
    tests/test_pipeline_operators.py pins the estimates against the
    exact percentiles within rank-error tolerance.
    """
    e = load_table(spark, sf_dir, "events").select("value")

    def partials(batches):
        import numpy as np
        import pandas as pd

        cap = 64
        vals = [pdf["value"].to_numpy(dtype="float64") for pdf in batches]
        v = np.sort(np.concatenate(vals)) if vals else np.empty(0)
        v = v[~np.isnan(v)]
        if v.size == 0:
            yield pd.DataFrame({"mean": pd.Series(dtype="float64"),
                                "weight": pd.Series(dtype="int64")})
            return
        chunks = np.array_split(v, min(cap, v.size))
        yield pd.DataFrame(
            {
                "mean": [c.mean() for c in chunks],
                "weight": [int(c.size) for c in chunks],
            }
        )

    sketch = e.mapInPandas(partials, "mean double, weight long")

    def merge(batches):
        import numpy as np
        import pandas as pd

        cap = 64
        frames = [pdf for pdf in batches]
        if not frames:
            return
        allc = pd.concat(frames, ignore_index=True)
        allc = allc[allc["weight"] > 0].sort_values("mean")
        if len(allc) == 0:
            return
        m = allc["mean"].to_numpy()
        wgt = allc["weight"].to_numpy(dtype="float64")
        # re-compress: group consecutive centroids into <=cap buckets of
        # ~equal weight (uniform-k t-digest; tails are bounded by the
        # per-bucket weight, giving O(1/cap) rank error)
        target = wgt.sum() / cap
        out_m, out_w = [], []
        acc_m, acc_w = 0.0, 0.0
        for mi, wi in zip(m, wgt):
            acc_m += mi * wi
            acc_w += wi
            if acc_w >= target:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
                acc_m, acc_w = 0.0, 0.0
        if acc_w > 0:
            out_m.append(acc_m / acc_w)
            out_w.append(acc_w)
        cm = np.cumsum(out_w)
        total = cm[-1]

        def q(p):
            rank = p * total
            i = int(np.searchsorted(cm, rank))
            i = min(i, len(out_m) - 1)
            return float(out_m[i])

        yield pd.DataFrame(
            {
                "n": [int(total)],
                "n_centroids": [len(out_m)],
                "p50_est": [q(0.50)],
                "p90_est": [q(0.90)],
                "p99_est": [q(0.99)],
            }
        )

    return sketch.repartition(1).mapInPandas(
        merge, "n long, n_centroids int, p50_est double, p90_est double, p99_est double"
    )


def tdigest_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key quantile sketches: one ≤64-centroid digest per
    event_type via applyInPandas — the grouped variant of
    tdigest_quantiles_events (global).  At 100 TB the shuffle moves raw
    values once into key groups, each group compresses independently,
    and the stored per-key digests answer later percentile queries (and
    coarser-key rollups, by merging digests) without rescanning.

    Rows-only (estimates are partitioning/compression dependent);
    tests/test_pipeline_operators.py pins every key's estimates inside
    the rank-error band of its exact per-key percentiles.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")

    def digest(pdf):
        import numpy as np
        import pandas as pd

        cap = 64
        key = pdf["event_type"].iloc[0]
        v = np.sort(pdf["value"].to_numpy(dtype="float64"))
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pd.DataFrame(
                {"event_type": pd.Series(dtype="object"),
                 "n": pd.Series(dtype="int64"),
                 "p50_est": pd.Series(dtype="float64"),
                 "p90_est": pd.Series(dtype="float64"),
                 "p99_est": pd.Series(dtype="float64")}
            )
        chunks = np.array_split(v, min(cap, v.size))
        means = np.array([c.mean() for c in chunks])
        wgt = np.array([c.size for c in chunks], dtype="float64")
        cm = np.cumsum(wgt)
        total = cm[-1]

        def q(p):
            i = int(np.searchsorted(cm, p * total))
            return float(means[min(i, len(means) - 1)])

        return pd.DataFrame(
            {
                "event_type": [key],
                "n": [int(total)],
                "p50_est": [q(0.50)],
                "p90_est": [q(0.90)],
                "p99_est": [q(0.99)],
            }
        )

    return (
        e.groupBy("event_type")
        .applyInPandas(
            digest,
            "event_type string, n long, p50_est double, p90_est double, "
            "p99_est double",
        )
        .orderBy("event_type")
    )


def kmv_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from sketches — the query-optimizer
    primitive behind join reordering: estimate |events ⋈ customer| on
    user_id = c_custkey WITHOUT running the join, then report the
    estimate next to the exact count and the relative error.

    Estimator (uncorrelated-frequency model, the textbook optimizer
    assumption): |A ⋈ B| ≈ |keys(A) ∩ keys(B)| · f̄_A · f̄_B where the
    key-overlap comes from the KMV intersection estimate (kmv_set_ops'
    machinery) and f̄ are mean per-key multiplicities.  The error
    column is the point: it quantifies how far the uncorrelated
    assumption drifts on real (skewed) data.

    Scale: sketches shuffle k·partitions rows; the exact join is
    included here only as ground truth — at 100 TB you'd estimate
    precisely to AVOID running it.  Rows-only (hash sketch) + pytest
    rel-error bound.
    """
    k = KMV_K
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))

    def mins(df: DataFrame) -> DataFrame:
        h = F.shiftrightunsigned(F.xxhash64(F.col("key")), 1).alias("h")
        return df.select("key").distinct().select(h).orderBy("h").limit(k)

    me, mc = mins(e), mins(c)
    merged = me.unionByName(mc).select("h").distinct().orderBy("h").limit(k)
    union_stats = merged.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    union_est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        (F.col("n") - 1) * F.lit(_KMV_M) / F.col("kth")
    )
    shared = merged.join(me, "h").join(mc, "h").agg(F.count(F.lit(1)).alias("n_shared"))
    overlap_est = union_est * F.col("n_shared") / F.lit(k)

    fa = e.agg(
        (F.count(F.lit(1)) / F.countDistinct("key")).alias("mean_fa")
    )
    fb = c.agg(
        (F.count(F.lit(1)) / F.countDistinct("key")).alias("mean_fb")
    )
    exact = (
        e.join(c, "key")
        .agg(F.count(F.lit(1)).alias("exact_join_rows"))
    )
    est = (
        union_stats.crossJoin(F.broadcast(shared))
        .crossJoin(F.broadcast(fa))
        .crossJoin(F.broadcast(fb))
        .select(
            F.round(overlap_est * F.col("mean_fa") * F.col("mean_fb"))
            .cast("long")
            .alias("est_join_rows")
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_rows",
        "exact_join_rows",
        F.round(
            F.abs(F.col("est_join_rows") - F.col("exact_join_rows"))
            / F.col("exact_join_rows"),
            4,
        ).alias("rel_error"),
    )


def tdigest_conformal_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal radius per event_type FROM A MERGEABLE SKETCH:
    the t-digest composed with the conformal recipe — per-type absolute
    residuals (|value − type mean|, the calibration scores of
    relational.conformal_prediction_interval restated over events) are
    compressed into per-(type, partition) centroid partials in one
    Arrow pass, merged per type, and the 0.9-quantile radius is read
    off the merged digest next to the EXACT interpolated percentile of
    the same residuals, plus the resulting distribution-free interval.

    Why it earns its place next to its siblings: tdigest_by_event_type
    stores per-key digests, conformal_prediction_interval computes an
    exact radius — this is the 100 TB deployment shape where the radius
    must come from a PERSISTED sketch (per-shard digests merged nightly;
    recalibrating from raw data would rescan the corpus).  Per-type
    means use exact integer cent sums (no float drift across partials).

    Scale: pass 1 = per-type mean (hash agg, 5 rows, broadcast back);
    pass 2 = per-partition digest partials (mapInPandas, ≤64 centroids
    per (type, partition), no shuffle); the per-type merge moves only
    centroids.  Rows-only in the driver gate (centroid boundaries are
    partitioning-dependent); tests/test_pipeline_operators.py pins each
    type's estimate inside the digest's rank-error band around the
    exact radius.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    means = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("decimal(28,0)")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / 100.0
        ).alias("type_mean"),
    )
    resid = ev.join(F.broadcast(means), "event_type").select(
        "event_type",
        "n",
        "type_mean",
        F.abs(F.col("value") - F.col("type_mean")).alias("r"),
    )

    def partials(batches):
        # self-contained closure (pickled by value; no module refs).
        # Memory is O(cap + arrow-batch), NOT O(rows-per-partition): each
        # Arrow batch is compressed to <=cap centroids as it arrives and
        # folded into a bounded per-type buffer that is merged+
        # recompressed whenever it exceeds 2*cap (ADVICE r6 #2 — the
        # previous version concatenated every batch's residuals before
        # compressing, contradicting the mergeable-sketch scale story).
        import numpy as np
        import pandas as pd

        cap = 64

        def compress(m, w):
            # equal-mass recompression of (mean, weight) centroids
            order = np.argsort(m, kind="mergesort")
            m, w = m[order], w[order]
            target = w.sum() / cap
            out_m, out_w = [], []
            acc_m, acc_w = 0.0, 0.0
            for mi, wi in zip(m, w):
                acc_m += mi * wi
                acc_w += wi
                if acc_w >= target:
                    out_m.append(acc_m / acc_w)
                    out_w.append(acc_w)
                    acc_m, acc_w = 0.0, 0.0
            if acc_w > 0:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
            return np.asarray(out_m), np.asarray(out_w)

        buf: dict = {}
        meta: dict = {}
        for pdf in batches:
            for et, grp in pdf.groupby("event_type"):
                v = grp["r"].to_numpy(dtype="float64")
                v = np.sort(v[~np.isnan(v)])
                if v.size == 0:
                    continue
                chunks = np.array_split(v, min(cap, v.size))
                bm = np.asarray([c.mean() for c in chunks])
                bw = np.asarray([c.size for c in chunks], dtype="float64")
                if et in buf:
                    pm, pw = buf[et]
                    bm, bw = np.concatenate([pm, bm]), np.concatenate([pw, bw])
                if bm.size > 2 * cap:
                    bm, bw = compress(bm, bw)
                buf[et] = (bm, bw)
                meta[et] = (
                    int(grp["n"].iloc[0]),
                    float(grp["type_mean"].iloc[0]),
                )
        rows = []
        for et, (bm, bw) in buf.items():
            if bm.size > cap:
                bm, bw = compress(bm, bw)
            n, tm = meta[et]
            for mi, wi in zip(bm, bw):
                rows.append(
                    {
                        "event_type": et,
                        "n": n,
                        "type_mean": tm,
                        "mean": float(mi),
                        "weight": int(wi),
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=["event_type", "n", "type_mean", "mean", "weight"],
        )

    sketch = resid.mapInPandas(
        partials,
        "event_type string, n long, type_mean double, mean double, weight long",
    )

    def merge(pdf):
        # self-contained closure: merge one type's centroid partials,
        # re-compress to <=64, read q0.9 off the cumulative-weight curve
        import numpy as np
        import pandas as pd

        cap = 64
        et = pdf["event_type"].iloc[0]
        n, tm = int(pdf["n"].iloc[0]), float(pdf["type_mean"].iloc[0])
        pdf = pdf[pdf["weight"] > 0].sort_values("mean")
        m = pdf["mean"].to_numpy(dtype="float64")
        wgt = pdf["weight"].to_numpy(dtype="float64")
        target = wgt.sum() / cap
        out_m, out_w = [], []
        acc_m, acc_w = 0.0, 0.0
        for mi, wi in zip(m, wgt):
            acc_m += mi * wi
            acc_w += wi
            if acc_w >= target:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
                acc_m, acc_w = 0.0, 0.0
        if acc_w > 0:
            out_m.append(acc_m / acc_w)
            out_w.append(acc_w)
        cm = np.cumsum(out_w)
        i = int(np.searchsorted(cm, 0.9 * cm[-1]))
        radius = float(out_m[min(i, len(out_m) - 1)])
        return pd.DataFrame(
            {
                "event_type": [et],
                "n": [n],
                "type_mean": [tm],
                "n_centroids": [len(out_m)],
                "radius_est": [radius],
            }
        )

    est = sketch.groupBy("event_type").applyInPandas(
        merge,
        "event_type string, n long, type_mean double, n_centroids int, "
        "radius_est double",
    )
    exact = resid.groupBy("event_type").agg(
        F.percentile("r", F.lit(0.9)).alias("radius_exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n",
            (F.round("type_mean", 4) + F.lit(0.0)).alias("type_mean"),
            "n_centroids",
            (F.round("radius_est", 4) + F.lit(0.0)).alias("radius_est"),
            (F.round("radius_exact", 4) + F.lit(0.0)).alias("radius_exact"),
            (F.round(F.col("type_mean") - F.col("radius_est"), 4) + F.lit(0.0)).alias(
                "pi_lo"
            ),
            (F.round(F.col("type_mean") + F.col("radius_est"), 4) + F.lit(0.0)).alias(
                "pi_hi"
            ),
        )
        .orderBy("event_type")
    )


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan,
    J. Algorithms 2005) over event users: a depth-4 x width-512 CMS is
    built as a (row, col) -> count TABLE — the relational encoding of
    the sketch — and the exact top-10 users' counts are then estimated
    from it (min over the 4 hashed cells; CMS never under-counts, so
    ``overcount >= 0`` always).

    Scale story: the sketch build is ONE map-side-combinable groupBy of
    at most d*w = 2048 cells regardless of input size — at 100 TB the
    shuffle is 2048 rows, and per-partition partial sketches merge by
    cell-wise addition (the CMS linearity property).  Estimation joins a
    broadcast 40-row probe frame against the tiny sketch.  All hashing
    is exact integer arithmetic reduced mod 2147483647 BEFORE any
    multiply (invariant 7), mirrored verbatim in the DuckDB oracle.

    Parity: sketch semantics follow the reference charter's "sketch
    rollup" extension row (SURVEY.md §2.3); no counterpart exists in
    the 408-line reference itself.
    """
    P = 2147483647
    W = 512
    A = [31, 131, 151, 181]
    B = [7, 11, 13, 17]
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % P).alias("u"), "user_id"
    )
    cells = [
        F.struct(
            F.lit(i).alias("r"),
            (((F.col("u") * A[i] + B[i]) % P) % W).alias("c"),
        )
        for i in range(4)
    ]
    sketch = (
        ev.select(F.explode(F.array(*cells)).alias("rc"))
        .select("rc.r", "rc.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        (
                            ((F.col("user_id") % P) * A[i] + B[i]) % P % W
                        ).alias("c"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("rc"),
    ).select("user_id", "exact_n", "rc.r", "rc.c")
    return (
        sketch.join(F.broadcast(probes), ["r", "c"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("n").cast("long").alias("est_n"))
        .select(
            "user_id",
            F.col("exact_n").cast("long").alias("exact_n"),
            "est_n",
            (F.col("est_n") - F.col("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
    )
