"""Portable (Spark SQL <-> DuckDB SQL) expression builders used by the
dedup / similarity / text operators and their oracle queries."""
