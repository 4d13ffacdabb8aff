"""Scale-stress smoke: run the engine's core relational patterns on
synthetic data ~30× the sf0.1 bench fixture (20M rows, generated
JVM-side by ``spark.range`` — no fixture dependency, no Python in the
row path) and pin both correctness invariants and wall clock.

This is the "would the plan survive a scale-up" check made executable:
the same shapes the fixture queries use (partial-agg groupBy, broadcast
dim join, per-key window top-k) at a size where an accidentally
quadratic plan, a lost map-side combine, or a driver-side collect would
blow past the bound instead of hiding in noise.
"""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N = 20_000_000
N_KEYS = 100_000
WALL_CLOCK_BOUND_SEC = 300.0  # generous: quadratic/driver-side plans land >1000s; box load is bursty


@pytest.mark.perf
def test_core_shapes_at_20m_rows(spark):
    t0 = time.time()
    fact = spark.range(N).select(
        (F.col("id") % N_KEYS).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 5).alias("dim_id"),
    )
    dim = spark.range(5).select(
        F.col("id").alias("dim_id"), F.concat(F.lit("seg_"), F.col("id")).alias("seg")
    )

    # partial-agg groupBy: 20M rows -> 100k groups, map-side combine
    agg = fact.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert agg.count() == N_KEYS

    # broadcast dim join + second-level rollup: 5 output rows
    rolled = (
        fact.join(F.broadcast(dim), "dim_id")
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {r["seg"]: r["n"] for r in rolled.collect()}
    assert len(rows) == 5 and sum(rows.values()) == N

    # per-key window top-1 over the aggregated (not raw) frame: the
    # two-phase shape that keeps window state at |groups|, not |rows|
    w = Window.partitionBy(F.col("k") % 100).orderBy(F.col("s").desc(), F.col("k"))
    top = (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    assert top.count() == 100

    elapsed = time.time() - t0
    assert elapsed < WALL_CLOCK_BOUND_SEC, (
        f"20M-row core shapes took {elapsed:.1f}s (bound "
        f"{WALL_CLOCK_BOUND_SEC}s) — check for a lost map-side combine, "
        "a non-broadcast dim join, or a driver-side loop"
    )


CHUNK_N_DOCS = 2_000_000
CHUNK_UNIQUE = 1_500_000
CHUNK_BOUND_SEC = 300.0  # generous: a quadratic chunk join at 4M rows lands >1000s; box load is bursty


@pytest.mark.perf
def test_chunk_dedup_shape_at_2m_docs(spark):
    """The chunk-dedup pipeline (explode → chunk assembly → global
    first-occurrence window → reassembly) at 2M synthetic docs with 25%
    planted exact duplicates: 4M chunk rows through the chunk_text
    exchange.  Pins the survivor count exactly (planted dups vanish) and
    a wall-clock bound that a quadratic or driver-side plan would blow.
    """
    import time

    t0 = time.time()
    # 20 words per doc; docs with id >= CHUNK_UNIQUE repeat earlier text
    base = spark.range(CHUNK_N_DOCS).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % CHUNK_UNIQUE).alias("id_eff"),
    )
    words = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.concat(
                    F.lit("t"), ((F.col("id_eff") * 7 + i) % 5000).cast("string")
                ),
            )
        ).alias("pos", "word"),
    )
    chunks = (
        words.withColumn("chunk_pos", F.floor(F.col("pos") / 10).cast("int"))
        .groupBy("doc_id", "chunk_pos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("chunk_text")
        )
    )
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_pos")
    kept = chunks.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    n_kept = kept.count()
    # distinct chunk texts: id_eff*7 mod 5000 cycles — count them exactly
    n_distinct = chunks.select("chunk_text").distinct().count()
    assert n_kept == n_distinct
    elapsed = time.time() - t0
    assert elapsed < CHUNK_BOUND_SEC, f"chunk dedup at 2M docs took {elapsed:.1f}s"


@pytest.mark.perf
def test_countmin_sketch_is_constant_size_at_20m_rows(spark):
    """CMS scale contract: a 20M-key stream (200k distinct, zipf-ish via
    modular skew) still reduces to <= depth*width sketch cells, the
    estimate never undercounts, and the whole build+probe stays well
    under the wall-clock bound — the 'sketch = small keyed relation'
    recipe (SCALE.md §6h) made executable at 30x bench scale."""
    import time as _t

    t0 = _t.time()
    P, W = 2147483647, 512
    A, B = [31, 131, 151, 181], [7, 11, 13, 17]
    keys = spark.range(N).select(
        ((F.col("id") * F.col("id")) % 200_000).alias("u")
    )
    cells = [
        F.struct(
            F.lit(i).alias("r"),
            (((F.col("u") % P) * A[i] + B[i]) % P % W).alias("c"),
        )
        for i in range(4)
    ]
    sketch = (
        keys.select(F.explode(F.array(*cells)).alias("rc"))
        .select("rc.r", "rc.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_cells = sketch.count()
    assert n_cells <= 4 * W
    top = (
        keys.groupBy("u")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "u")
        .limit(5)
    )
    probes = top.select(
        "u",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        (((F.col("u") % P) * A[i] + B[i]) % P % W).alias("c"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("rc"),
    ).select("u", "exact_n", "rc.r", "rc.c")
    est = (
        sketch.join(F.broadcast(probes), ["r", "c"])
        .groupBy("u", "exact_n")
        .agg(F.min("n").alias("est_n"))
        .collect()
    )
    assert len(est) == 5
    assert all(r["est_n"] >= r["exact_n"] for r in est)
    assert _t.time() - t0 < WALL_CLOCK_BOUND_SEC


def test_winnowing_hot_fingerprint_is_culled_before_buffering(spark, tmp_path):
    """VERDICT_r11 item 2 receipt: the over-cap fingerprint cull happens
    BEFORE the doc-list aggregation (windowed-count cull riding the same
    exchange), so no aggregation group ever buffers an over-cap doc
    list.  Checks both halves on a synthetic corpus with a boilerplate
    12-token run shared by 3x WINNOW_DF_CAP documents: (a) the physical
    plan has the Window+Filter below the collect_set aggregate, (b) the
    result is bit-identical to the old buffer-then-filter formulation
    (size(docs) <= cap applied AFTER collect_set)."""
    from mini_pandas_spark.operators.text import (
        WINNOW_DF_CAP,
        tokens,
        winnowing_fingerprints,
    )

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rare = "red orange yellow green blue indigo violet umber sepia ochre"
    rows = [
        (i, f"{boiler} filler{i} pad{i} tail{i}", "web")
        for i in range(3 * WINNOW_DF_CAP)
    ]
    rows += [
        (1000, f"{rare} uniqueone extra words here", "web"),
        (1001, f"{rare} uniquetwo other words there", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = df.withColumn("n_chars", F.length("text")).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    sf_dir = str(tmp_path / "hotfp")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = winnowing_fingerprints(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, "cull must be a windowed count, not a post-agg filter"
    got = [(r.doc_a, r.doc_b, r.n_shared) for r in out.collect()]

    # buffer-then-filter twin (the pre-round-12 formulation)
    from mini_pandas_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("ts")).where(
        F.size("ts") >= 6
    )
    grams = toks.withColumn(
        "gh",
        F.transform(
            F.sequence(F.lit(0), F.size("ts") - 3),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(F.col("ts"), i + 1),
                    F.element_at(F.col("ts"), i + 2),
                    F.element_at(F.col("ts"), i + 3),
                )
            ),
        ),
    ).localCheckpoint(eager=False)
    fps = grams.withColumn(
        "fp",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("gh") - 4),
                lambda j: F.array_min(F.slice(F.col("gh"), j + 1, 4)),
            )
        ),
    ).select("doc_id", F.explode("fp").alias("fp"))
    fp_docs = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
        .where(F.size("docs") <= F.lit(WINNOW_DF_CAP))
    )
    pair_structs = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "y -> struct(x as doc_a, y as doc_b))))"
    )
    want = [
        (r.doc_a, r.doc_b, r.n_shared)
        for r in (
            fp_docs.select(F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .orderBy(F.col("n_shared").desc(), "doc_a", "doc_b")
            .limit(20)
        ).collect()
    ]
    assert got == want
