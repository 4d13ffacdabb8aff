"""Source/sink connector tests: write each format, read it back, compare
values; partitioned parquet must prune directories on read."""

import os

import pytest
from pyspark.sql import functions as F

from mini_pandas_spark.sources import (
    load_table,
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", 2.5, False), (3, None, None, True)],
        "id long, name string, score double, flag boolean",
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_parquet(sample, path)
    back = read_parquet(spark, path)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    path = str(tmp_path / "part.parquet")
    write_parquet(df, path, partition_by=["bucket"])
    assert os.path.isdir(os.path.join(path, "bucket=0"))
    pruned = read_parquet(spark, path).filter(F.col("bucket") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(bucket" in plan
    assert pruned.count() == 25


def test_csv_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.csv")
    write_csv(sample, path)
    back = read_csv(spark, path, schema=sample.schema)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_json_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.json")
    write_json(sample, path)
    back = read_json(spark, path, schema=sample.schema)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_load_table_rejects_unknown(spark):
    with pytest.raises(ValueError, match="unknown table"):
        load_table(spark, "/root/testdata/sf0.001", "nope")


def test_events_loader_normalizes_ts(spark):
    """Whatever the fixture's physical ts type (NANOS in round-1 data,
    MICROS since round 2), the loader must hand queries timestamp_ntz —
    and batch and streaming reads must agree on the actual instants."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.count() > 0
    from mini_pandas_spark.streaming.windows import read_events_stream

    # streaming reader's normalization must match the batch loader's
    # (regression: a hardcoded nanos assumption shifted micros fixtures
    # to 1970 silently); compare min/max via a drained AvailableNow pass
    import uuid

    sink = f"ts_check_{uuid.uuid4().hex[:8]}"
    s = read_events_stream(spark, "/root/testdata/sf0.001").select("ts")
    q = (
        s.writeStream.format("memory").queryName(sink)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F

    b_lo, b_hi = ev.agg(F.min("ts"), F.max("ts")).first()
    s_lo, s_hi = spark.table(sink).agg(F.min("ts"), F.max("ts")).first()
    # batch is NTZ, stream is tz-aware under UTC session tz — same instants
    assert str(s_lo) == str(b_lo) and str(s_hi) == str(b_hi)


def test_synthetic_datasource_partition_invariant(spark):
    """The custom Python DataSource must yield the identical relation for
    any split count (offset-addressable generation), and actually plan
    the requested number of input partitions."""
    from mini_pandas_spark.sources.synthetic import read_synthetic_docs

    one = sorted(tuple(r) for r in read_synthetic_docs(spark, 200, 1).collect())
    eight = sorted(tuple(r) for r in read_synthetic_docs(spark, 200, 8).collect())
    assert one == eight
    assert len(one) == 200
    assert read_synthetic_docs(spark, 200, 8).rdd.getNumPartitions() == 8
    # closed-form spot check: doc 0 hashes to h=0
    first = one[0]
    assert first == (0, "src0", 20, 0.0)


def test_synthetic_datasource_filter_pushdown(spark):
    """doc_id range predicates push into the source: pruned ids are never
    generated (split planner narrows to the id interval — a point lookup
    plans ONE input partition) and results stay exact."""
    from pyspark.sql import functions as F

    from mini_pandas_spark.sources.synthetic import read_synthetic_docs

    docs = read_synthetic_docs(spark, 1000, 8)
    ranged = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
    got = sorted(r["doc_id"] for r in ranged.collect())
    assert got == list(range(100, 150))
    point = read_synthetic_docs(spark, 1000, 8).filter(F.col("doc_id") == 123)
    assert point.rdd.getNumPartitions() == 1
    assert [r["doc_id"] for r in point.collect()] == [123]
    # non-doc_id predicates are yielded back and evaluated by Spark
    src = docs.filter(F.col("source") == "src3")
    assert {r["source"] for r in src.collect()} == {"src3"}


def test_orc_roundtrip_and_pushdown(spark, sample, tmp_path):
    from mini_pandas_spark.sources import read_orc, write_orc

    path = str(tmp_path / "t.orc")
    write_orc(sample, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(sample)
    plan = (
        read_orc(spark, path)
        .filter(F.col("id") > 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # predicate must reach the ORC scan, same as parquet
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan


def test_text_roundtrip_and_wholetext(spark, tmp_path):
    from mini_pandas_spark.sources import read_text, write_text

    df = spark.createDataFrame([("line one",), ("line two",), ("line three",)], "value string")
    path = str(tmp_path / "t.txt")
    write_text(df, path)
    back = read_text(spark, path)
    assert sorted(r["value"] for r in back.collect()) == [
        "line one",
        "line three",
        "line two",
    ]
    whole = read_text(spark, path, whole=True).collect()
    # one row per part-file; together they carry all lines
    lines = sorted(
        ln for r in whole for ln in r["value"].splitlines() if ln
    )
    assert lines == ["line one", "line three", "line two"]


def test_binary_files_scan(spark, tmp_path):
    from mini_pandas_spark.sources import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-bb")
    (tmp_path / "skip.txt").write_bytes(b"nope")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == b"\x00\x01payload-a"
    assert rows["b.bin"]["length"] == 10


def test_register_views_enables_sql_frontend(spark, sf_dir):
    from mini_pandas_spark.sources import register_views

    names = register_views(spark, sf_dir, prefix="v_")
    assert "v_lineitem" in names and len(names) == 10
    n = spark.sql("SELECT COUNT(*) AS n FROM v_lineitem").collect()[0]["n"]
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    joined = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM v_nation n JOIN v_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).count()
    assert joined == 5


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: rewriting ONE partition's data must
    leave sibling partitions untouched (static overwrite would drop
    them) — the incremental-backfill write pattern."""
    from mini_pandas_spark.sources import load_table

    out = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)
    before = spark.read.parquet(out).count()
    assert before == e.count()

    patched = (
        e.where(F.col("event_type") == "click")
        .withColumn("value", F.lit(0.0))
    )
    with_conf = spark.conf
    old = with_conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    with_conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched.write.partitionBy("event_type").mode("overwrite").parquet(out)
    finally:
        with_conf.set("spark.sql.sources.partitionOverwriteMode", old)

    back = spark.read.parquet(out)
    assert back.count() == before  # siblings intact
    clicks = back.where(F.col("event_type") == "click")
    assert clicks.where(F.col("value") != 0.0).count() == 0  # patched
    others = back.where(F.col("event_type") != "click")
    assert others.where(F.col("value") == 0.0).count() == 0  # untouched


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """mergeSchema read across files written with evolving schemas: the
    union schema comes back, with nulls where a file lacked a column."""
    out = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        f"{out}/gen=1"
    )
    spark.range(2).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "v1", "v2", "gen"}
    assert merged.count() == 5
    assert merged.where(F.col("v2").isNull()).count() == 3


def test_manifest_sink_writes_shards_and_manifest(spark, tmp_path):
    """Custom Python DataSource WRITER: every partition lands as one
    JSON-lines shard, the committed _MANIFEST.json accounts for every
    row exactly once, and per-shard checksums match a local recompute."""
    import json
    import os
    import zlib

    from mini_pandas_spark.sources import load_table
    from mini_pandas_spark.sources.manifest_sink import write_manifest

    out = str(tmp_path / "sink")
    df = (
        load_table(spark, "/root/testdata/sf0.001", "nation")
        .select("n_nationkey", "n_name")
        .repartition(4)
    )
    write_manifest(df, out)

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 25
    assert sum(s["rows"] for s in manifest["shards"]) == 25
    seen = set()
    for shard in manifest["shards"]:
        crc, n = 0, 0
        with open(os.path.join(out, shard["file"])) as f:
            for line in f:
                rec = json.loads(line)
                seen.add(rec["n_nationkey"])
                crc = zlib.crc32(line.rstrip("\n").encode(), crc)
                n += 1
        assert n == shard["rows"]
        assert (crc & 0x7FFFFFFF) == shard["checksum"], shard
    assert len(seen) == 25


def test_manifest_source_roundtrip_trust_and_checksum(spark, tmp_path):
    """Custom Python DataSource READER (manifest_source): (a) the round
    trip through sink+source preserves every row exactly; (b) an orphan
    shard NOT listed in the committed manifest is invisible
    (manifest-trust, the lakehouse atomic-visibility contract); (c) a
    corrupted shard fails the in-stream crc32/row-count re-verification
    loudly instead of returning silently wrong data."""
    import json
    import os

    from mini_pandas_spark.sources import load_table
    from mini_pandas_spark.sources.manifest_sink import (
        read_manifest,
        write_manifest,
    )

    out = str(tmp_path / "rt")
    df = (
        load_table(spark, "/root/testdata/sf0.001", "nation")
        .select("n_nationkey", "n_name")
        .repartition(4)
    )
    write_manifest(df, out)
    ddl = "n_nationkey bigint, n_name string"

    back = read_manifest(spark, out, ddl)
    assert sorted(r.n_nationkey for r in back.collect()) == list(range(25))
    assert back.schema.simpleString() == (
        "struct<n_nationkey:bigint,n_name:string>"
    )

    # (b) orphan shard (never committed) must be invisible
    with open(os.path.join(out, "shard-99999.jsonl"), "w") as f:
        f.write(json.dumps({"n_nationkey": 999, "n_name": "GHOST"}) + "\n")
    assert read_manifest(spark, out, ddl).count() == 25

    # (c) corrupt one committed shard -> checksum mismatch must raise
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    victim = os.path.join(out, manifest["shards"][0]["file"])
    with open(victim) as f:
        lines = f.readlines()
    rec = json.loads(lines[0])
    rec["n_name"] = "TAMPERED"
    lines[0] = json.dumps(rec, default=str, sort_keys=True) + "\n"
    with open(victim, "w") as f:
        f.writelines(lines)
    import pytest as _pytest

    with _pytest.raises(Exception, match="verification|crc|manifest_source"):
        read_manifest(spark, out, ddl).count()


def test_hidden_file_metadata_column(spark):
    """The parquet source's hidden ``_metadata`` struct (file_path,
    file_name, file_size, file_modification_time, row_index) must be
    selectable alongside data columns and internally consistent: paths
    end in .parquet, sizes are positive and match os.stat, per-file
    row_index is dense 0..n-1, and per-file row counts sum to the
    table count.  At 100 TB this column is how a pipeline attributes
    bad rows back to their source file without a join against any
    manifest."""
    import os

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id",
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_name").alias("fn"),
        F.col("_metadata.file_size").alias("fs"),
        F.col("_metadata.row_index").alias("ri"),
    )
    total = spark.read.parquet(f"{sf}/documents.parquet").count()
    per_file = df.groupBy("fp", "fn", "fs").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ri").alias("ri_min"),
        F.max("ri").alias("ri_max"),
    ).collect()
    assert sum(r.n for r in per_file) == total
    for r in per_file:
        assert r.fn.endswith(".parquet")
        local = r.fp.removeprefix("file://").removeprefix("file:")
        assert os.path.getsize(local) == r.fs > 0
        assert (r.ri_min, r.ri_max) == (0, r.n - 1)  # dense per file
