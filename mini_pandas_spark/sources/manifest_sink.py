"""Custom Python DataSource WRITER (sink): ``manifest_sink``.

The read side of the custom-DataSource surface lives in synthetic.py
(batch reader with filter pushdown + streaming reader); this module
completes it with the WRITE side of the Spark 4 Python DataSource API:
each task writes its partition as a JSON-lines shard and returns a
commit message (file, rows, checksum); the driver's ``commit`` writes a
``_MANIFEST.json`` recording every shard — the atomic-visibility recipe
of a lakehouse sink (readers trust only files listed in the committed
manifest, so a failed job leaves no visible partial output; ``abort``
removes orphans).

At 100 TB: one shard per task scales with the write parallelism; the
commit is a single driver-side manifest write (bytes proportional to
task count, not data volume) — the same O(files) commit shape as
Iceberg/Delta manifests.

Worker-closure rule: the writer class is defined at module top level but
references only stdlib inside methods; pyspark serializes the
DataSourceWriter instance by value to tasks (no repo imports on the
executor path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_manifest_sink(spark: SparkSession) -> None:
    """Register the ``manifest_sink`` write format on this session
    (idempotent)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class ShardCommit(WriterCommitMessage):
        # simple value object; pickled back to the driver
        def __init__(self, staged_name, file_name, n_rows, checksum):
            self.staged_name = staged_name
            self.file_name = file_name
            self.n_rows = n_rows
            self.checksum = checksum

    class ManifestWriter(DataSourceWriter):
        # self-contained: stdlib-only imports inside methods
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("manifest_sink requires a 'path' option")

        def write(self, iterator):
            import json
            import os
            import zlib

            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId()
            # Attempt-unique staged name: concurrent speculative or
            # retried attempts of the same partition each write their
            # own file (no interleaved/corrupt shard can ever be
            # committed); only the attempt whose commit message the
            # driver accepts gets renamed to the final name.
            attempt = ctx.taskAttemptId()
            os.makedirs(self.path, exist_ok=True)
            staged = f".staged-shard-{pid:05d}-{attempt}.jsonl"
            final = f"shard-{pid:05d}.jsonl"
            crc, n = 0, 0
            with open(os.path.join(self.path, staged), "w") as f:
                for row in iterator:
                    line = json.dumps(row.asDict(), default=str, sort_keys=True)
                    f.write(line + "\n")
                    crc = zlib.crc32(line.encode(), crc)
                    n += 1
            return ShardCommit(staged, final, n, crc & 0x7FFFFFFF)

        def _sweep_staged(self, keep=()):
            """Remove staged files not in ``keep`` — losers of
            speculative races and failed attempts leave no orphans."""
            import os

            keep = set(keep)
            try:
                entries = os.listdir(self.path)
            except OSError:
                return
            for name in entries:
                if name.startswith(".staged-shard-") and name not in keep:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass

        def commit(self, messages):
            import json
            import os

            # publish exactly the winning attempts, then drop the rest
            for m in messages:
                os.replace(
                    os.path.join(self.path, m.staged_name),
                    os.path.join(self.path, m.file_name),
                )
            self._sweep_staged()
            manifest = {
                "shards": sorted(
                    (
                        {
                            "file": m.file_name,
                            "rows": m.n_rows,
                            "checksum": m.checksum,
                        }
                        for m in messages
                    ),
                    key=lambda d: d["file"],
                ),
                "total_rows": sum(m.n_rows for m in messages),
            }
            tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1, sort_keys=True)
            os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

        def abort(self, messages):
            # staged files are never referenced by any manifest; sweep
            # them ALL (including attempts that never reported back)
            self._sweep_staged()

    class ManifestSinkSource(DataSource):
        @classmethod
        def name(cls):
            return "manifest_sink"

        def writer(self, schema, overwrite):
            return ManifestWriter(self.options)

    spark.dataSource.register(ManifestSinkSource)


def write_manifest(df: DataFrame, path: str) -> None:
    """Write ``df`` through the manifest sink (append-style; the manifest
    is rewritten atomically per job)."""
    register_manifest_sink(df.sparkSession)
    df.write.format("manifest_sink").option("path", path).mode("append").save()
