"""Declarative run configuration — the engine's logical-plan input.

``RunSpec`` mirrors the reference CLI contract field-for-field
(/root/reference/src/cli.rs:11-150): it IS the reference's entire logical
plan (SURVEY.md §3.1). The engine turns a RunSpec into a Catalyst plan;
knobs the reference hand-tunes (concurrency, writer buffers, memory
budget; cli.rs:88-99) are recorded but subsumed by Spark's scheduler and
memory manager, which is the point of building on Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from streaming_parquet_spark.sources.readers import DEFAULT_NA_VALUES


@dataclass
class RunSpec:
    # Inputs / output (cli.rs:13-22)
    inputs: list[str] = field(default_factory=list)
    out: str | None = None
    out_format: str | None = None          # "csv" | "parquet" | None => by extension

    # CSV input options (cli.rs:25-43)
    delimiter: str = ","
    quote: str = '"'
    headers: bool = True                   # reference --no-headers inverts
    encoding: str = "utf8"
    na_values: tuple[str, ...] = DEFAULT_NA_VALUES
    multiline: bool = False                # quoted embedded newlines (ext)

    # Schema options (cli.rs:46-68)
    columns: list[str] | None = None       # include whitelist
    exclude: list[str] | None = None       # blacklist
    rename: dict[str, str] = field(default_factory=dict)   # old -> new
    reorder: bool = True                   # unified schema is alphabetical
    stringify_conflicts: bool = False
    infer_rows: int = 1000

    # Rolling output (cli.rs:70-77)
    roll_by_bytes: int | None = None
    roll_by_rows: int | None = None

    # Compression (cli.rs:79-86)
    compression: str = "none"              # none|snappy|gzip|zstd
    zstd_level: int = 3

    # Performance knobs (cli.rs:88-99) — recorded; Spark manages these.
    concurrency: int = 4
    writer_buffer_mb: int = 64
    mem_budget_mb: int = 1024
    # Streaming micro-batch admission. None (default): the engine sizes
    # triggers itself as concurrency * cores, capped at
    # MAX_TRIGGER_FILES — every core is a reader on Spark, so a trigger
    # feeds the whole cluster and the per-batch fixed cost amortizes
    # (divergence from the reference's per-worker --concurrency
    # semantics, documented in SURVEY §2 M7). An explicit value is the
    # LITERAL per-trigger file bound, for operators who need to bound
    # trigger latency / failure-replay granularity exactly.
    trigger_files: int | None = None

    # Discovery (cli.rs:101-107)
    recursive: bool = True                 # --no-recursive inverts
    follow_symlinks: bool = False

    # State / resume / verify (cli.rs:109-120) — streaming checkpoint dir
    state: str | None = None
    resume: bool = False
    verify: bool = False
    # "count" reconciles row counts; "content" additionally reconciles
    # an order-independent CRC32 checksum over a canonical row rendering
    # of the written data vs the re-read output — the checksum-grade
    # integrity check the reference DECLARED but never implemented
    # (cli.rs:118-120 + Cargo.toml crc64fast, unused there).
    verify_mode: str = "count"             # "count" | "content"

    # Output ergonomics
    single_file: bool = True               # reference writes ONE output file
    partition_by: list[str] | None = None  # Hive-style partitioned dir (ext)

    def resolve_out_format(self) -> str:
        """--out-format override, else by extension, default CSV
        (src/pipeline.rs:64-74)."""
        if self.out_format:
            return self.out_format.lower()
        if self.out:
            lower = self.out.lower()
            # Text outputs may name a codec suffix (out.csv.gz) — the
            # sinks compress accordingly; strip it for format dispatch.
            # Only text formats: .parquet.gz would write an uncompressed
            # parquet file under a lying name (columnar formats compress
            # internally), so it must NOT resolve — fail loudly instead.
            if lower.endswith((".gz", ".bz2")):
                stripped = lower[: lower.rfind(".")]
                if stripped.endswith(
                    (".csv", ".tsv", ".json", ".jsonl", ".ndjson",
                     ".txt", ".text")
                ):
                    lower = stripped
                else:
                    raise ValueError(
                        f"unsupported compressed output {self.out!r}: "
                        "only CSV/JSONL outputs take a codec suffix "
                        "(parquet/ORC compress internally via "
                        "--compression)"
                    )
            if lower.endswith(".parquet"):
                return "parquet"
            if lower.endswith(".csv") or lower.endswith(".tsv"):
                return "csv"
            if lower.endswith((".json", ".jsonl", ".ndjson")):
                return "jsonl"
            if lower.endswith(".orc"):
                return "orc"
            if lower.endswith((".txt", ".text")):
                return "text"
        return "csv"
