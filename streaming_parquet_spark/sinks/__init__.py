"""CSV / Parquet sinks with compression, rolling, and single-file modes."""

from streaming_parquet_spark.sinks.writers import (
    write_csv,
    write_parquet,
    SinkResult,
)

__all__ = ["write_csv", "write_parquet", "SinkResult"]
