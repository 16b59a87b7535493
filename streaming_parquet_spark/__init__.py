"""streaming_parquet_spark — a PySpark-native engine with the query and
data-processing capabilities of sempervent/streaming-parquet ("maw").

The reference (/root/reference, read-only) is a Rust CLI that streams and
concatenates CSV/Parquet files:

    discover(inputs) -> scan* -> infer/unify schema -> align/coerce/project
                     -> UNION ALL -> sink (csv | parquet, compressed, rolling)

This package re-expresses that capability surface idiomatically on Spark
(DataFrame / SQL / Catalyst / Structured Streaming), and extends it with the
relational built-ins Spark gives for free plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Public API:
    RunSpec      — declarative run configuration (≈ reference src/cli.rs:11-150)
    Engine       — batch execution: run/plan/dry_run
    StreamEngine — Structured Streaming execution with checkpoint resume
    get_spark    — tuned local SparkSession factory
"""

from streaming_parquet_spark.session import get_spark
from streaming_parquet_spark.runspec import RunSpec
from streaming_parquet_spark.engine import Engine, RunResult

__all__ = ["get_spark", "RunSpec", "Engine", "RunResult"]
__version__ = "0.1.0"
