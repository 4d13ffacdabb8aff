"""mini-pandas-spark: a PySpark-native analytics engine with the query
semantics of LiuTaowen-Tony/mini-pandas, extended with the relational and
LLM-data-pipeline operator surface a 100 TB training-data pipeline needs.

Layers:
- ``frame``       reference-compatible MiniFrame/MiniSeries veneer (lazy)
- ``sources``     scan/sink connectors (parquet/csv/json) + star-schema loaders
- ``operators``   relational + dedup + similarity + text + event operators
- ``streaming``   structured-streaming variants of the event-time operators
- ``multimodal``  binary-column (image/audio) plumbing with stubbed decoders
- ``queries``     the registry the driver exercises (queries + DuckDB oracles)
"""

from .frame import MiniFrame, MiniSeries, infer_dtype
from .session import ensure_runtime_confs, get_spark

__all__ = [
    "MiniFrame",
    "MiniSeries",
    "infer_dtype",
    "get_spark",
    "ensure_runtime_confs",
]

__version__ = "0.1.0"
