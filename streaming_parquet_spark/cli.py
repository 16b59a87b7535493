"""CLI front-end: the Spark-native rendering of the reference's command
surface (/root/reference/src/cli.rs:5-150, main.rs:23-80).

    python -m streaming_parquet_spark INPUTS... -o OUT [options]

Every reference flag is accepted; knobs that Spark subsumes (writer
buffers, memory budget) are parsed and recorded on the RunSpec but the
Spark scheduler/memory manager governs the actual behavior — that is the
point of building on Spark. ``--state``/``--resume`` route the run
through the Structured-Streaming engine whose checkpoint directory is
the (stronger, exactly-once) analog of the reference's JSON state file
(src/state.rs:10-168).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from streaming_parquet_spark.runspec import RunSpec

logger = logging.getLogger("streaming_parquet_spark")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="maw-spark",
        description=(
            "Stream and concatenate CSV and Parquet files on Spark "
            "(PySpark-native engine with the reference maw CLI contract)"
        ),
    )
    p.add_argument("inputs", nargs="+", help="files, directories, globs, or - for stdin")
    p.add_argument("-o", "--out", help="output file path")
    p.add_argument(
        "--out-format", choices=["csv", "parquet", "jsonl", "orc", "text"],
        dest="out_format"
    )

    # CSV input options (cli.rs:25-43)
    p.add_argument("--delimiter", default=",")
    p.add_argument("--quote", default='"')
    p.add_argument("--no-headers", action="store_true")
    p.add_argument("--encoding", default="utf8")
    p.add_argument("--na", default="NA,null,\\N", help="comma-separated NA sentinels")
    p.add_argument(
        "--multiline",
        action="store_true",
        help="CSV records may contain quoted newlines (files become "
        "non-splittable: one task per file)",
    )

    # Schema options (cli.rs:46-68)
    p.add_argument("--columns", help="comma-separated include whitelist")
    p.add_argument("--exclude", help="comma-separated blacklist")
    p.add_argument("--rename", action="append", default=[], metavar="OLD=NEW")
    p.add_argument("--reorder", action="store_true")
    p.add_argument("--stringify-conflicts", action="store_true")
    p.add_argument("--infer-rows", type=int, default=1000)

    # Rolling output (cli.rs:70-77)
    p.add_argument("--roll-by-bytes", type=int)
    p.add_argument("--roll-by-rows", type=int)

    # Compression (cli.rs:79-86)
    p.add_argument(
        "--compression", choices=["none", "snappy", "gzip", "zstd"], default="none"
    )
    p.add_argument("--zstd-level", type=int, default=3)

    # Performance (cli.rs:88-99) — recorded; Spark manages the rest.
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--writer-buffer", type=int, default=64)
    p.add_argument("--mem-budget", type=int, default=1024)
    # Spark extension (no reference analog): literal per-trigger file
    # bound for the streaming path; default lets the engine auto-size
    # (concurrency * cores, capped). See SURVEY §2 M7.
    p.add_argument("--trigger-files", type=int, default=None)

    # Discovery (cli.rs:101-107)
    p.add_argument("--no-recursive", action="store_true")
    p.add_argument("--follow-symlinks", action="store_true")

    # State / resume / verify (cli.rs:109-120)
    p.add_argument("--state", help="checkpoint directory for resumable runs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--verify", action="store_true")
    p.add_argument(
        "--verify-mode",
        choices=["count", "content"],
        default="count",
        help="count: reconcile row counts; content: also reconcile an "
        "order-independent CRC32 checksum of a canonical row rendering "
        "(the reference's declared-but-stubbed crc64 integrity check, "
        "made real)",
    )

    # Partitioned output (extension; no reference analog)
    p.add_argument(
        "--partition-by",
        help="comma-separated columns for Hive-style partitioned output",
    )

    # Output/UX (cli.rs:122-149)
    p.add_argument("--progress", action="store_true", default=True)
    p.add_argument("--no-progress", action="store_true")
    p.add_argument("--json-logs", action="store_true")
    p.add_argument("--plan", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("-q", "--quiet", action="store_true")
    return p


def spec_from_args(args: argparse.Namespace) -> RunSpec:
    rename = {}
    for item in args.rename:
        if "=" not in item:
            raise SystemExit(f"--rename expects OLD=NEW, got: {item}")
        old, new = item.split("=", 1)
        rename[old] = new
    return RunSpec(
        inputs=list(args.inputs),
        out=args.out,
        out_format=args.out_format,
        delimiter=args.delimiter,
        quote=args.quote,
        headers=not args.no_headers,
        encoding=args.encoding,
        na_values=tuple(args.na.split(",")) if args.na else (),
        multiline=args.multiline,
        columns=args.columns.split(",") if args.columns else None,
        exclude=args.exclude.split(",") if args.exclude else None,
        rename=rename,
        reorder=True,
        stringify_conflicts=args.stringify_conflicts,
        infer_rows=args.infer_rows,
        roll_by_bytes=args.roll_by_bytes,
        roll_by_rows=args.roll_by_rows,
        compression=args.compression,
        zstd_level=args.zstd_level,
        concurrency=args.concurrency,
        writer_buffer_mb=args.writer_buffer,
        mem_budget_mb=args.mem_budget,
        trigger_files=args.trigger_files,
        recursive=not args.no_recursive,
        follow_symlinks=args.follow_symlinks,
        state=args.state,
        resume=args.resume,
        verify=args.verify,
        verify_mode=args.verify_mode,
        single_file=args.roll_by_rows is None and args.roll_by_bytes is None,
        partition_by=args.partition_by.split(",") if args.partition_by else None,
    )


def _setup_logging(args: argparse.Namespace) -> None:
    level = logging.WARNING
    if args.verbose >= 2:
        level = logging.DEBUG
    elif args.verbose == 1:
        level = logging.INFO
    if args.quiet:
        level = logging.ERROR
    if args.json_logs:
        handler = logging.StreamHandler()

        class _Json(logging.Formatter):
            def format(self, record: logging.LogRecord) -> str:
                return json.dumps(
                    {
                        "level": record.levelname.lower(),
                        "target": record.name,
                        "message": record.getMessage(),
                    }
                )

        handler.setFormatter(_Json())
        logging.basicConfig(level=level, handlers=[handler])
    else:
        logging.basicConfig(level=level)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _setup_logging(args)
    spec = spec_from_args(args)

    # --plan's reference behavior lists raw inputs without building the
    # pipeline (main.rs:65-71); ours also resolves discovery + schema.
    from streaming_parquet_spark.engine import Engine
    from streaming_parquet_spark.session import get_spark

    try:
        spark = get_spark(app_name="maw-spark")
        engine = Engine(spark)
        if args.plan:
            info = engine.plan(spec)
            print(info.describe())
            return 0
        if args.dry_run:
            res = engine.dry_run(spec)
            print(
                f"Dry run OK: {res.rows} rows from {res.input_files} file(s), "
                f"{res.input_bytes} bytes"
            )
            return 0
        if not spec.out:
            print("error: -o/--out is required unless --plan/--dry-run", file=sys.stderr)
            return 1
        if spec.state or spec.resume:
            from streaming_parquet_spark.streaming.stream import StreamEngine

            sres = StreamEngine(spark).run(spec)
            if not args.quiet:
                print(
                    f"Streamed {sres.rows} rows in {sres.batches} batch(es) "
                    f"-> {sres.out_dir} (checkpoint: {sres.checkpoint})"
                    + ("" if sres.verified is None
                       else f", verified={sres.verified}")
                )
            return 0
        from streaming_parquet_spark.progress import ProgressReporter

        show_bar = args.progress and not args.no_progress and not args.quiet
        with ProgressReporter(spark, render=show_bar):
            res = engine.run(spec)
        if not args.quiet:
            print(
                f"Wrote {res.rows} rows from {res.input_files} file(s) "
                f"({res.input_bytes / 1e6:.1f} MB) in {res.seconds:.1f}s "
                f"[{res.mb_per_sec:.1f} MB/s]"
                + ("" if res.verified is None else f", verified={res.verified}")
            )
        return 0
    except Exception as exc:  # CLI contract: error -> exit 1 (main.rs:55-58)
        logger.error("%s", exc)
        print(f"error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
