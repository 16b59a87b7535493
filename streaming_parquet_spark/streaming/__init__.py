"""Structured Streaming path: resumable file-source -> Parquet-sink runs
(the project north star: 'Structured Streaming + Parquet sink'), plus
streaming operators (watermarked windows, session windows, streaming
dedup) and the deduplicated-ingest loop (streaming.ingest)."""

from streaming_parquet_spark.streaming.ingest import (
    IngestResult,
    dedup_ingest_stream,
    semantic_ingest_stream,
)
from streaming_parquet_spark.streaming.shards import (
    ShardIngestResult,
    shard_ingest_stream,
)
from streaming_parquet_spark.streaming.stream import StreamEngine, StreamResult

__all__ = [
    "StreamEngine",
    "StreamResult",
    "IngestResult",
    "dedup_ingest_stream",
    "semantic_ingest_stream",
    "ShardIngestResult",
    "shard_ingest_stream",
]
