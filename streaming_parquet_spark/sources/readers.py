"""Format-specific DataFrame readers mirroring the reference's reader
option surfaces (CSV: /root/reference/src/csv_in.rs:45-232; Parquet:
/root/reference/src/parquet_in.rs:13-44).

Each reader returns a lazily-planned DataFrame; Spark handles batching,
vectorized parsing, and per-file-split parallelism natively (the analog
of the reference's 64k-row batched readers on blocking threads).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


# Default NA sentinels (reference src/cli.rs:41-43: "NA,null,\\N").
DEFAULT_NA_VALUES = ("NA", "null", "\\N")

_ENCODINGS = {"utf8": "UTF-8", "utf-8": "UTF-8", "latin1": "ISO-8859-1"}


@dataclass
class CsvOptions:
    """CSV reader options (reference src/cli.rs:25-43,66-68).

    The reference reads latin1 via WINDOWS_1252 decode with BOM strip
    (csv_in.rs:80-84,156-168) — Spark's `encoding` option covers both.
    Ragged rows are padded with nulls (csv_in.rs:136-139) — Spark
    PERMISSIVE mode default. Multiple NA sentinels are applied post-read
    (Spark's `nullValue` takes a single value).
    """

    delimiter: str = ","
    quote: str = '"'
    headers: bool = True                 # --no-headers inverts
    encoding: str = "utf8"
    na_values: tuple[str, ...] = DEFAULT_NA_VALUES
    infer_rows: int = 1000               # --infer-rows schema-inference sample
    infer_schema: bool = True


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    opts: CsvOptions | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read CSV with the reference's option semantics.

    With ``headers=False``, columns are named ``col_1..col_N``
    (csv_in.rs:68-78 synthesizes the same names). Values matching any NA
    sentinel become null before type coercion, mirroring csv_in.rs:129-135
    where sentinel checks precede parsing.
    """
    opts = opts or CsvOptions()
    if isinstance(paths, str):
        paths = [paths]

    reader = (
        spark.read.option("sep", opts.delimiter)
        .option("quote", opts.quote)
        .option("header", str(opts.headers).lower())
        .option("encoding", _ENCODINGS.get(opts.encoding.lower(), opts.encoding))
        .option("mode", "PERMISSIVE")
        .option("samplingRatio", "1.0")
    )
    # Spark accepts one nullValue natively; the rest are mapped post-read.
    primary_na = opts.na_values[0] if opts.na_values else ""
    reader = reader.option("nullValue", primary_na)

    if schema is not None:
        df = reader.schema(schema).csv(paths)
    elif opts.infer_schema:
        # Read as strings first so extra NA sentinels null out *before*
        # type inference (parity with csv_in.rs ordering), then re-infer.
        raw = reader.option("inferSchema", "false").csv(paths)
        raw = _apply_na_sentinels(raw, opts.na_values[1:])
        df = _infer_string_columns(raw, opts.infer_rows)
        if not opts.headers:
            df = df.toDF(*[f"col_{i + 1}" for i in range(len(df.columns))])
        return df
    else:
        df = reader.option("inferSchema", "false").csv(paths)

    if not opts.headers:
        df = df.toDF(*[f"col_{i + 1}" for i in range(len(df.columns))])
    return _apply_na_sentinels(df, opts.na_values[1:])


def _apply_na_sentinels(df: DataFrame, extra_na: tuple[str, ...]) -> DataFrame:
    """Null out remaining NA sentinels on string columns (cli.rs:41-43)."""
    if not extra_na:
        return df
    na_list = list(extra_na)
    exprs = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.StringType):
            c = F.col(f_.name)
            exprs.append(
                F.when(c.isin(na_list), F.lit(None)).otherwise(c).alias(f_.name)
            )
        else:
            exprs.append(F.col(f_.name))
    return df.select(*exprs)


def _infer_string_columns(df: DataFrame, sample_rows: int) -> DataFrame:
    """Per-column type inference over a sample: try i64 -> f64 -> bool,
    else string — the reference's parse-probe order (csv_in.rs:171-232),
    where any unparseable value makes the whole column Utf8.

    Runs one small Spark job over ``sample_rows`` rows (the reference
    samples --infer-rows=1000 by default), then applies lattice casts to
    the full lazy plan.
    """
    sample = df.limit(sample_rows)
    checks = []
    for name in df.columns:
        c = F.col(name)
        nn = c.isNotNull()
        checks.extend(
            [
                F.max(F.when(nn & c.try_cast("long").isNull(), 1).otherwise(0)).alias(
                    f"{name}__not_i64"
                ),
                F.max(
                    F.when(nn & c.try_cast("double").isNull(), 1).otherwise(0)
                ).alias(f"{name}__not_f64"),
                F.max(
                    F.when(
                        nn & ~F.lower(c).isin("true", "false"), 1
                    ).otherwise(0)
                ).alias(f"{name}__not_bool"),
                F.max(F.when(nn, 1).otherwise(0)).alias(f"{name}__any"),
            ]
        )
    row = sample.agg(*checks).collect()[0].asDict()

    exprs = []
    for name in df.columns:
        if not row[f"{name}__any"]:
            target = None  # all-null column stays string (unknown)
        elif not row[f"{name}__not_i64"]:
            target = "long"
        elif not row[f"{name}__not_f64"]:
            target = "double"
        elif not row[f"{name}__not_bool"]:
            target = "boolean"
        else:
            target = None
        c = F.col(name)
        exprs.append(c.try_cast(target).alias(name) if target else c)
    return df.select(*exprs)


def read_parquet(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Parquet scan (parquet_in.rs:13-44): Spark's vectorized reader with
    row-group pruning and predicate pushdown for free."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)
