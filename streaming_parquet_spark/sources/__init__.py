"""Input discovery and format-specific readers (CSV, Parquet, stdin)."""

from streaming_parquet_spark.sources.discover import (
    InputFile,
    InputFormat,
    DiscoveryConfig,
    discover_inputs,
)

__all__ = ["InputFile", "InputFormat", "DiscoveryConfig", "discover_inputs"]
