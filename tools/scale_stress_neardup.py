#!/usr/bin/env python
"""Scale-stress the near-dup / pair-mining family beyond sf0.1.

Builds corpora at 1x / 3x / 10x the sf0.1 fixture by unioning the base
documents with deterministically mutated copies:

* per extra copy c, docs with ``doc_id % 10 == (c-1) % 10`` become PLANTED
  near-dups of their base doc (one appended token — shingle Jaccard ~0.97),
* every other doc is salted by interleaving a DOC-SPECIFIC token between
  all words, which rewrites every shingle uniquely (distinct under
  Jaccard).  A copy-wide salt would itself be cross-doc boilerplate:
  every second shingle becomes (salt, w, salt), shared by all salted
  docs containing w — measured 80x candidate blowup on the prefix
  filter at 3x (a genuinely adversarial boilerplate corpus, but not the
  clean scaling measurement this table is for).

Embeddings scale the same way (cap 3x — the fixture's near-uniform sphere
geometry makes tau=0.4 verification quadratic-ish by nature, see the
embedding_near_dup_pairs docstring): planted dups are scaled copies
(cosine-invariant), distinct copies get per-coordinate deterministic sign
flips (decorrelates to cosine ~0).

For each corpus size it measures, per operator: wall-clock, output pairs,
and — for the bucketed schemes — the CANDIDATE pair count the blocking
produces (sum over buckets of C(n,2)) and its ratio to all-pairs C(N,2).
The point of the table: candidate-ratio must FALL as the corpus grows
(buckets stay selective), and wall-clock must grow far below quadratic.

Usage: python tools/scale_stress_neardup.py [--mults 1,3,10] [--out DIR]
Prints one markdown table (paste into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
EMBED_MAX_MULT = 3


def build_documents(spark: SparkSession, out_dir: str, m: int) -> None:
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [base]
    for c in range(1, m):
        near = F.pmod(F.col("doc_id"), F.lit(10)) == (c - 1) % 10
        salt = F.concat(F.lit(f" c{c}d"), F.col("doc_id").cast("string"), F.lit("x "))
        text = F.when(
            near, F.concat(F.col("text"), F.lit(" neardupmarker"))
        ).otherwise(F.regexp_replace(F.col("text"), F.lit(" "), salt))
        parts.append(
            base.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(4 * m, 8)).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def build_embeddings(spark: SparkSession, out_dir: str, m: int) -> None:
    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [base]
    for c in range(1, m):
        near = F.pmod(F.col("vec_id"), F.lit(10)) == (c - 1) % 10
        flipped = F.transform(
            "embedding",
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(c)), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        scaled = F.transform("embedding", lambda x: x * F.lit(1.001))
        cols = [c0 for c0 in base.columns if c0 not in ("vec_id", "embedding")]
        parts.append(
            base.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                F.when(near, scaled).otherwise(flipped).alias("embedding"),
                *cols,
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(2 * m, 4)).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


EMB_DIM = 64
CLUSTER_NOISE = 0.816  # intra-cluster pair cosine ≈ 0.6 (not near-dup)
DUP_NOISE = 0.08  # planted pair cosine ≈ 0.997
CLUSTERS_PER_MULT = 48  # topic count grows with the corpus
CLUSTERED_TAU = 0.9  # the realistic dedup threshold (≤ 26° of angle)


def build_clustered_embeddings(
    spark: SparkSession, out_dir: str, m: int, n_base: int = 2000
) -> int:
    """Clustered-geometry embedding corpus — the round-3 verdict's ask:
    the sf fixtures are near-uniform on the sphere (max pairwise cosine
    0.51), where NO τ=0.4 blocking can prune; real document embeddings
    cluster by topic, and near-dup pairs sit at cosine ≥ 0.9.  This
    fixture plants both: ``CLUSTERS_PER_MULT × m`` random unit centers
    (topic density constant as the corpus grows), each vector = its
    cluster center + uniform noise tuned so intra-cluster PAIR cosine ≈
    0.6 (similar, NOT duplicate), and every vec_id ≡ 9 (mod 10) is a
    near-copy of vec_id−1 at cosine ≈ 0.997 (the planted dup set the
    recall column scores against).  Fully deterministic (xxhash64
    tape), written as plain Spark expressions."""
    n = n_base * m
    nclust = CLUSTERS_PER_MULT * m
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    is_dup = F.pmod(F.col("vec_id"), F.lit(10)) == 9
    base_id = F.when(is_dup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))

    def u(h):  # uniform [-1, 1] from a 64-bit hash
        return (F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0) - 1.0

    k = F.pmod(F.xxhash64(base_id, F.lit("cl")), F.lit(nclust))
    coords = []
    for i in range(EMB_DIM):
        center = u(F.xxhash64(k, F.lit(i), F.lit("c")))
        noise = u(F.xxhash64(base_id, F.lit(i), F.lit("n"))) * CLUSTER_NOISE
        dup_jitter = F.when(
            is_dup,
            u(F.xxhash64(F.col("vec_id"), F.lit(i), F.lit("d"))) * DUP_NOISE,
        ).otherwise(F.lit(0.0))
        coords.append((center + noise + dup_jitter).cast("float"))
    df = ids.select(
        "vec_id",
        F.array(*coords).alias("embedding"),
        k.cast("int").alias("label"),
    )
    df.repartition(max(2 * m, 4)).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    return n


def clustered_embedding_stats(spark: SparkSession, sf_dir: str, n_vec: int) -> dict:
    """Run the near-dup SCALE PATH (τ=0.9, cells ∝ corpus so cell
    population stays bounded, sampled driver-local quantizer, 4 probes)
    on the clustered fixture; report wall, output pairs, planted-pair
    recall, and the blocking's candidate volume."""
    from mini_pandas_spark.operators.similarity import (
        LLOYD_ITERS,
        SAMPLE_MOD,
        _assign_topp_np,
        _near_dup_pairs_impl,
        _trained_quantizer,
        _vectors_with_norm,
    )

    cells = max(16, n_vec // 25)
    probes = 4
    t0 = time.time()
    out = _near_dup_pairs_impl(
        spark, sf_dir, CLUSTERED_TAU, cells, probes, SAMPLE_MOD
    )
    got = {(r["id_a"], r["id_b"]) for r in out.select("id_a", "id_b").collect()}
    wall = time.time() - t0
    planted = {(i - 1, i) for i in range(9, n_vec, 10)}
    recall = len(planted & got) / len(planted)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vec = _vectors_with_norm(spark, sf_dir).repartition(n_part)
    cids, cn = _trained_quantizer(
        vec, sf_dir, cells, LLOYD_ITERS, sample_mod=SAMPLE_MOD
    )
    cand = pairs_in_buckets(_assign_topp_np(vec, cids, cn, probes), "cell")
    return dict(
        wall_sec=round(wall, 2),
        out_pairs=len(got),
        candidates=cand,
        cand_ratio=round(cand / (n_vec * (n_vec - 1) // 2), 6),
        recall=round(recall, 4),
        cells=cells,
    )


def pairs_in_buckets(df: DataFrame, *keys: str) -> int:
    """sum over blocking buckets of C(n, 2) — the candidate-pair volume
    the bucketed join materializes."""
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand"))
        .collect()[0]
    )
    return int(row["cand"] or 0)


def minhash_candidates(spark: SparkSession, sf_dir: str) -> int:
    """Band-bucket candidate volume of minhash_lsh_pairs' blocking (same
    sketch + banding helpers the registered query composes)."""
    from mini_pandas_spark.operators.dedup import (
        _minhash_bands,
        _minhash_sketch_table,
    )

    bands = _minhash_bands(_minhash_sketch_table(spark, sf_dir))
    return pairs_in_buckets(bands, "band", "sig")


def simhash_candidates(spark: SparkSession, sf_dir: str) -> int:
    """4x16-bit chunk pigeonhole candidate volume of simhash_near_pairs."""
    from mini_pandas_spark.operators.dedup import simhash_docs

    sh = simhash_docs(spark, sf_dir).select("doc_id", "simhash")
    chunks = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.expr(f"(simhash >> {16 * i}) & 65535").alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "c.ci", "c.cv")
    return pairs_in_buckets(chunks, "ci", "cv")


def prefix_candidates(spark: SparkSession, sf_dir: str) -> int:
    """Prefix-join candidate volume of prefix_filter_jaccard_pairs
    (replicates its candidate-generation stage; the registered query's
    verify stage consumes exactly this set)."""
    from pyspark.sql.window import Window

    from mini_pandas_spark.operators.dedup import shingles, tokens
    from mini_pandas_spark.sources import load_table

    t = 0.8
    d = load_table(spark, sf_dir, "documents")
    docsets = (
        d.select("doc_id", tokens(F.col("text")).alias("__ts"))
        .select("doc_id", shingles(F.col("__ts")).alias("ss"))
        .withColumn("sz", F.size("ss"))
    )
    exploded = docsets.select(
        "doc_id", "sz", F.explode("ss").alias("shingle")
    ).select("doc_id", "sz", F.xxhash64(F.col("shingle"), F.lit(42)).alias("h"))
    freq = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("h").asc())
    prefix = (
        exploded.join(freq, "h")
        .withColumn("rk", F.row_number().over(wdoc))
        .where(F.col("rk") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1))
        .select("doc_id", "h")
    )
    return (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def ivf_candidates(spark: SparkSession, sf_dir: str) -> int:
    """Cell-mate candidate volume of embedding_near_dup_pairs' IVF
    blocking (multi-probe; counts per-cell C(n,2) — pairs sharing >1
    cell count once per shared cell, a slight overcount vs the query's
    distinct pair set)."""
    from mini_pandas_spark.operators.similarity import (
        DEDUP_CELLS,
        DEDUP_PROBES,
        LLOYD_ITERS,
        _assign_topp_np,
        _trained_quantizer,
        _vectors_with_norm,
    )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vec = _vectors_with_norm(spark, sf_dir).repartition(n_part)
    cids, cn = _trained_quantizer(vec, sf_dir, DEDUP_CELLS, LLOYD_ITERS)
    assigned = _assign_topp_np(vec, cids, cn, DEDUP_PROBES)
    return pairs_in_buckets(assigned, "cell")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,3,10")
    ap.add_argument("--out", default="/tmp/scale_stress_neardup")
    ap.add_argument(
        "--ops",
        default="",
        help="comma-separated op subset (default: all); lets the 30x+ "
        "octaves skip the schemes already measured dispersion-bound",
    )
    args = ap.parse_args()
    mults = [int(x) for x in args.mults.split(",")]
    only = {x for x in args.ops.split(",") if x}

    from mini_pandas_spark.queries import queries
    from mini_pandas_spark.session import get_spark

    spark = get_spark("neardup-scale-stress", cpus=32, shuffle_partitions=32)
    qs = queries()

    doc_ops = [
        ("minhash_lsh_pairs", minhash_candidates),
        ("prefix_filter_jaccard_pairs", prefix_candidates),
        ("simhash_near_pairs", simhash_candidates),
    ]
    results = []
    for m in mults:
        sf_dir = os.path.join(args.out, f"m{m}")
        build_documents(spark, sf_dir, m)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        all_pairs_docs = n_docs * (n_docs - 1) // 2
        for name, cand_fn in doc_ops:
            if only and name not in only:
                continue
            t0 = time.time()
            out_pairs = qs[name](spark, sf_dir).count()
            wall = time.time() - t0
            cand = cand_fn(spark, sf_dir)
            results.append(
                dict(
                    op=name,
                    mult=m,
                    n=n_docs,
                    wall_sec=round(wall, 2),
                    out_pairs=out_pairs,
                    candidates=cand,
                    cand_ratio=round(cand / all_pairs_docs, 6),
                )
            )
            print(f"  {name} m={m}: {wall:.1f}s, out={out_pairs}, "
                  f"cand={cand} ({cand/all_pairs_docs:.2%} of all-pairs)",
                  file=sys.stderr)
        if m <= EMBED_MAX_MULT and (not only or "embedding_near_dup_pairs" in only):
            build_embeddings(spark, sf_dir, m)
            n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
            all_pairs_vec = n_vec * (n_vec - 1) // 2
            t0 = time.time()
            out_pairs = qs["embedding_near_dup_pairs"](spark, sf_dir).count()
            wall = time.time() - t0
            cand = ivf_candidates(spark, sf_dir)
            results.append(
                dict(
                    op="embedding_near_dup_pairs",
                    mult=m,
                    n=n_vec,
                    wall_sec=round(wall, 2),
                    out_pairs=out_pairs,
                    candidates=cand,
                    cand_ratio=round(cand / all_pairs_vec, 6),
                )
            )
            print(f"  embedding_near_dup_pairs m={m}: {wall:.1f}s, "
                  f"out={out_pairs}, cand={cand} "
                  f"({cand/all_pairs_vec:.2%} of all-pairs)", file=sys.stderr)
        if not only or "embedding_near_dup_clustered" in only:
            cl_dir = os.path.join(args.out, f"cl{m}")
            n_vec = build_clustered_embeddings(spark, cl_dir, m)
            stats = clustered_embedding_stats(spark, cl_dir, n_vec)
            results.append(
                dict(op="embedding_near_dup_clustered", mult=m, n=n_vec, **stats)
            )
            print(
                f"  embedding_near_dup_clustered m={m}: "
                f"{stats['wall_sec']}s, out={stats['out_pairs']}, "
                f"cand={stats['candidates']} ({stats['cand_ratio']:.2%}), "
                f"recall={stats['recall']}, cells={stats['cells']}",
                file=sys.stderr,
            )

    print("| op | mult | rows | wall (s) | output pairs | candidates | cand/all-pairs | recall |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['op']} | {r['mult']}x | {r['n']} | {r['wall_sec']} "
            f"| {r['out_pairs']} | {r['candidates']} | {r['cand_ratio']:.4%} "
            f"| {r.get('recall', '')} |"
        )
    print(json.dumps({"results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
