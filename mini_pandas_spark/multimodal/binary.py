"""Multimodal column support: image/audio/video payloads as opaque
``binary`` columns with typed metadata (mandated extension surface,
SURVEY.md §2.3 row 13).

The container has no image/audio codecs (pillow / soundfile / opencv
re-probed absent every round, rounds 1–11, last 2026-08-16 r11), so the
*decode* step is a clearly-marked stub (deterministic fake derived from
the payload bytes; ``real_decode`` raises NotImplementedError).  Everything Spark-side is
real and tested: the binary column schema, Arrow batch transfer through
``mapInPandas``, the per-batch UDF signature, and the output schema — on
a real cluster you replace ``_fake_decode`` with PIL/ffmpeg and nothing
else changes.

Scale: mapInPandas streams Arrow record batches — payload bytes never
materialize on the driver; decode parallelism equals input partitions, so
repartition to ~core-count × executors before heavy decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import token_count
from ..sources import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, format string"
)


def real_decode(payload: bytes) -> dict:
    """Real image decode — requires an image codec library, which this
    container does not ship.  STUB."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not available in this container); "
        "wire your codec here — the Spark plumbing around it is complete"
    )


def _fake_decode(doc_id: int, payload: bytes) -> dict:
    """Deterministic stand-in for real_decode: metadata derived purely
    from (doc_id, payload length) so results are reproducible and SQL-
    expressible for the oracle check."""
    return {
        "n_bytes": len(payload),
        "width": 64 + (doc_id % 512),
        "height": 64 + ((doc_id * 7) % 512),
        "channels": 3,
        "format": "fake/rgb8",
    }


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a binary payload column (utf-8 bytes of the text —
    the fixtures ship no real media, so text bytes stand in for blobs)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Binary column → typed metadata via Arrow-batched mapInPandas.

    The batch function is deliberately self-contained (no references to
    this module's globals): cloudpickle then ships it by value, so worker
    processes never need ``mini_pandas_spark`` importable on their own
    sys.path — the engine works regardless of the driver's cwd."""

    def decode_batches(batches):
        import pandas as pd

        def fake_decode(doc_id, payload):
            # deterministic stand-in for the real codec (_fake_decode docs)
            return {
                "n_bytes": len(payload),
                "width": 64 + (doc_id % 512),
                "height": 64 + ((doc_id * 7) % 512),
                "channels": 3,
                "format": "fake/rgb8",
            }

        for pdf in batches:
            metas = [
                fake_decode(int(i), bytes(p))
                for i, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(decode_batches, schema=META_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: documents → binary payload → decoded metadata.

    Oracle-checkable because the fake decoder's outputs are pure SQL
    functions of (doc_id, octet_length(text)).
    """
    return decode_image_meta(_with_payload(spark, sf_dir))


THUMB = 16  # aspect-fit resize target (thumbnail side, px)


def resize_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline plumbing: binary payload in → resized binary
    payload out through one Arrow-batched mapInPandas pass.

    The codec is the deterministic fake (real one: NotImplementedError in
    ``real_decode``): source dims come from the fake decoder, the target
    is an aspect-fit THUMB×THUMB box (integer arithmetic, so the oracle
    can recompute it), and the "resized" payload is the input bytes
    cyclically resampled to out_w*out_h*3 — byte count exactly what a
    real RGB8 thumbnail would occupy.  The query projects
    octet_length(payload) so the oracle cross-checks that the UDF really
    produced right-sized binary output, not just the arithmetic.
    """

    def resize_batches(batches: Iterator) -> Iterator:
        # self-contained (see decode_image_meta): pickled by value
        import pandas as pd

        THUMB_ = 16

        def fake_dims(doc_id):
            return 64 + (doc_id % 512), 64 + ((doc_id * 7) % 512)

        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                doc_id, data = int(i), bytes(p)
                w, h = fake_dims(doc_id)
                m = max(w, h)
                out_w, out_h = max(w * THUMB_ // m, 1), max(h * THUMB_ // m, 1)
                n_out = out_w * out_h * 3
                # cyclic byte resample stands in for real interpolation
                resized = bytes(data[k % len(data)] for k in range(n_out))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "out_width": out_w,
                        "out_height": out_h,
                        "payload": resized,
                    }
                )
            yield pd.DataFrame(rows)

    resized = _with_payload(spark, sf_dir).mapInPandas(
        resize_batches,
        schema="doc_id long, out_width int, out_height int, payload binary",
    )
    return resized.select(
        "doc_id",
        "out_width",
        "out_height",
        F.octet_length("payload").alias("out_n_bytes"),
    )


def audio_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing plumbing: the payload as a PCM byte stream cut into
    overlapping analysis frames (window 400 B, hop 160 B — the classic
    25 ms/10 ms split at 16 kHz mono 8-bit), one output row per frame.

    The UDF genuinely slices the byte string (frame_bytes is measured
    from the slice, not computed), so the arithmetic oracle cross-checks
    the byte-level work.  1→N fan-out via mapInPandas; decode of a real
    container format would slot in before the framing loop
    (``real_decode`` marks that stub).
    """

    def frame_batches(batches: Iterator) -> Iterator:
        # self-contained: pickled by value
        import pandas as pd

        WINDOW, HOP = 400, 160
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                doc_id, data = int(i), bytes(p)
                start = 0
                idx = 0
                while start < len(data):
                    frame = data[start : start + WINDOW]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "start_byte": start,
                            "frame_bytes": len(frame),
                        }
                    )
                    idx += 1
                    start += HOP
            yield pd.DataFrame(rows)

    return _with_payload(spark, sf_dir).mapInPandas(
        frame_batches,
        schema="doc_id long, frame_idx int, start_byte int, frame_bytes int",
    )


def extract_patch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/patch sampling plumbing: split each payload into fixed-size
    chunks (as a video is split into frames), one output row per chunk,
    with a per-chunk byte checksum — demonstrates the 1→N mapInPandas
    shape real frame extraction uses."""
    CHUNK = 256

    def explode_chunks(batches):
        # self-contained (see decode_image_meta): pickled by value
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(p)
                for k in range(0, max(len(data), 1), CHUNK):
                    chunk = data[k : k + CHUNK]
                    rows.append(
                        {
                            "doc_id": int(i),
                            "chunk_idx": k // CHUNK,
                            "chunk_bytes": len(chunk),
                            "checksum": sum(chunk) % 65536,
                        }
                    )
            yield pd.DataFrame(rows)

    return _with_payload(spark, sf_dir).mapInPandas(
        explode_chunks,
        schema="doc_id long, chunk_idx int, chunk_bytes int, checksum int",
    )


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video temporal sampling plumbing: treat the payload as a 25 fps
    stream of fixed 64-byte "frames" and keep every 5th frame (stride
    sampling, the standard cheap strategy before a vision encoder), one
    output row per sampled frame with its timestamp and a byte checksum
    measured from the actual slice.

    A real container decode (mp4 → frames) would replace the fixed-size
    split — ``real_decode`` marks that stub; everything Spark-side
    (binary column in, Arrow batches, 1→N fan-out, deterministic
    output) is the production shape.  frame_bytes is measured from the
    actual byte slice so the arithmetic oracle cross-checks the
    byte-level work (per-chunk checksums are pinned by
    extract_patch_features's pytest).

    Scale: narrow mapInPandas, no shuffle; sampled-frame volume is
    payload_bytes/stride — the stride is the knob that keeps a 100 TB
    video corpus's feature pass bounded.
    """
    FRAME = 64  # fake frame size in bytes (stub decode)
    STRIDE = 5  # keep every 5th frame
    MS_PER_FRAME = 40  # 25 fps

    def sample_batches(batches):
        # self-contained (see decode_image_meta): pickled by value
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(p)
                n_frames = (len(data) + FRAME - 1) // FRAME
                for f in range(0, n_frames, STRIDE):
                    chunk = data[f * FRAME : (f + 1) * FRAME]
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": f,
                            "ts_ms": f * MS_PER_FRAME,
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows)

    return _with_payload(spark, sf_dir).mapInPandas(
        sample_batches,
        schema="doc_id long, frame_idx int, ts_ms int, frame_bytes int",
    )


EMB_DIM = 16
EMB_TOP_K = 5


def multimodal_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal retrieval plumbing: binary payloads →
    feature extraction (deterministic byte-histogram "embedding" — a
    clearly-marked stand-in for a real vision encoder, same stub policy
    as the decoders) → brute-force cosine top-5 neighbors for the first
    3 payloads.  Closes the loop from opaque bytes to similarity search
    with real Spark plumbing at every step (Arrow mapInPandas extract,
    JVM-side scoring join).

    Scale: extraction is a narrow Arrow pass; scoring broadcasts the
    3-query side and streams the corpus once — the cosine_topk shape.
    Rows-only in the driver gate (the embedding is engine-internal);
    pytest pins determinism and self-similarity.
    """
    d = _with_payload(spark, sf_dir)

    def embed(batches):
        import numpy as np
        import pandas as pd

        dim = 16
        for pdf in batches:
            out = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float64")
                n = float(np.linalg.norm(hist))
                out.append(
                    (int(i), [float(x) for x in hist], n if n > 0 else 1.0)
                )
            yield pd.DataFrame(out, columns=["doc_id", "emb", "nrm"])

    vecs = d.mapInPandas(embed, "doc_id long, emb array<double>, nrm double")
    queries = vecs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    from ..functions import dot

    scored = (
        vecs.join(F.broadcast(queries))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("emb")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= EMB_TOP_K)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def byte_histogram_simhash(df: DataFrame) -> DataFrame:
    """64-bit perceptual-style sketch of a BINARY payload: the payload's
    rolling 4-byte shingles hash into a 256-bin histogram (a structure-
    sensitive content feature — no codec needed; single-byte histograms
    converge for same-alphabet payloads and cannot discriminate), the
    L1-normalized histogram projects onto 64 fixed pseudo-random
    hyperplanes, and the sign pattern is the sketch.  Payloads sharing
    most of their local byte structure (re-encoded duplicates,
    trivially-edited copies) land within small Hamming distance — the
    binary-modality analogue of perceptual hashing / ssdeep-style fuzzy
    hashing, with the projection matrix standing where a DCT would for
    real images.

    One Arrow-batched pass; the projection matrix is regenerated inside
    the closure from a fixed PCG64 seed (platform-stable), so the
    operator ships no state."""

    def sketch(batches):
        # self-contained closure (pickled by value; no module refs)
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(42)
        proj = rng.standard_normal((256, 64))
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, sims = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) < 4:
                    arr = np.pad(arr, (0, 4 - len(arr)))
                w = (
                    arr[:-3].astype(np.uint64)
                    | (arr[1:-2].astype(np.uint64) << np.uint64(8))
                    | (arr[2:-1].astype(np.uint64) << np.uint64(16))
                    | (arr[3:].astype(np.uint64) << np.uint64(24))
                )
                h = ((w * np.uint64(2654435761)) >> np.uint64(24)) & np.uint64(255)
                hist = np.bincount(h.astype(np.int64), minlength=256).astype(
                    np.float64
                )
                if hist.sum() > 0:
                    hist /= hist.sum()
                signs = (hist @ proj) > 0
                sim = int((signs.astype(np.uint64) << shifts).sum(dtype=np.uint64))
                ids.append(int(doc_id))
                # store as signed int64 (two's complement) for Spark
                sims.append(sim - (1 << 64) if sim >= (1 << 63) else sim)
            yield pd.DataFrame({"doc_id": ids, "bhash": sims})

    return df.select("doc_id", "payload").mapInPandas(
        sketch, schema="doc_id long, bhash long"
    )


def phash_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary payloads by byte-histogram SimHash within
    Hamming distance ≤ 5: candidates come from the 8×8-bit chunk
    pigeonhole (distance ≤ 7 ⇒ at least one of 8 chunks equal — an
    equi-join per chunk, never all-pairs), verified with bit_count(xor)
    — the image-dedup stage of a multimodal training pipeline, running
    on payload bytes without any codec.

    Rows-only (hash primitive not in DuckDB); pytest pins determinism
    and that planted text near-dups surface as payload near-dups.
    Scale: |docs|×8 chunk rows shuffle instead of all-pairs; chunk-key
    skew (constant-histogram payloads) splits under AQE.
    """
    d = _with_payload(spark, sf_dir)
    sk = byte_histogram_simhash(d).localCheckpoint(eager=False)
    chunks = sk.select(
        "doc_id",
        "bhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("bhash"), i * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("cv"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "bhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.bhash").alias("ha"),
            F.col("b.bhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= 5)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def multimodal_token_bill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved image-text sequence budgeting: for every document,
    price its text tokens (whitespace tokenizer) plus the vision-encoder
    tokens its binary payload would occupy — one 16-token patch
    embedding per 256-byte chunk, the same chunk grid
    `extract_patch_features` emits — and roll the bill up per source.
    This is the context-window accounting a multimodal training run does
    before packing interleaved sequences.

    Scale: payload size is `octet_length` (JVM expression — the bytes
    are never shipped to Python), the chunk count is integer arithmetic,
    and the only shuffle is the |sources|-row rollup.
    """
    d = load_table(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.col("text"))
    n_patches = F.floor(
        (F.greatest(n_bytes, F.lit(1)) + 255) / 256
    ).cast("long")
    per_doc = d.select(
        "source",
        token_count(F.col("text")).alias("text_tok"),
        (n_patches * 16).alias("image_tok"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("text_tok").cast("bigint").alias("text_tokens"),
            F.sum("image_tok").cast("bigint").alias("image_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "text_tokens",
            "image_tokens",
            (F.col("text_tokens") + F.col("image_tokens")).alias("total_tokens"),
            (
                F.round(
                    F.col("image_tokens").cast("double")
                    / F.greatest(
                        F.col("text_tokens") + F.col("image_tokens"), F.lit(1)
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("image_share"),
        )
        .orderBy("source")
    )
