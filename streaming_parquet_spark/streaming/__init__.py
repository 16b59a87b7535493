"""Structured Streaming path: resumable file-source -> Parquet-sink runs
(the project north star: 'Structured Streaming + Parquet sink'), plus
streaming operators (watermarked windows, session windows, streaming
dedup)."""

from streaming_parquet_spark.streaming.stream import StreamEngine, StreamResult

__all__ = ["StreamEngine", "StreamResult"]
