"""Source/sink connectors: parquet (primary), orc, csv, json, text, binaryFile.

The reference engine (/root/reference/data_frame.py) has no I/O at all —
frames are built from dicts (``DataFrame.from_dict``, data_frame.py:391-406).
This package supplies the scan/sink surface a real engine needs, as thin
wrappers over Spark's native readers so pushdown/pruning are preserved.
"""

from .tables import (
    BROADCAST_DIMS,
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
from .io import (
    compact_parquet,
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_text,
)

__all__ = [
    "BROADCAST_DIMS",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_parquet",
    "read_csv",
    "read_json",
    "write_parquet",
    "write_bucketed_table",
    "write_csv",
    "write_json",
    "read_orc",
    "write_orc",
    "compact_parquet",
    "read_text",
    "write_text",
    "read_binary_files",
]
