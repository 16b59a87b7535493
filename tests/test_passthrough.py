"""Columnar passthrough sink (Engine._passthrough_columns +
sinks.writers.transcode_parquet): the transform-free parquet->parquet
fast path must be byte-semantically equivalent to the Catalyst plan,
and every disqualifying condition must fall back to it.

Equivalence standard: read both outputs back through Spark and compare
schema + the full sorted row set (the same bag semantics the engine's
content verify checks)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streaming_parquet_spark.engine import Engine
from streaming_parquet_spark.runspec import RunSpec


@pytest.fixture()
def engine(spark):
    return Engine(spark)


def _rows(spark, paths):
    df = spark.read.parquet(*paths)
    return df.schema, sorted(map(tuple, df.collect()))


def _mk_parquet(path, n=50, offset=0, extra_col=False, tz=None):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    cols = {
        "id": pa.array(range(offset, offset + n), type=pa.int64()),
        "val": pa.array([float(i) * 0.5 for i in range(n)], type=pa.float64()),
        "name": pa.array(
            [f"row-{i}" if i % 7 else None for i in range(n)],
            type=pa.string(),
        ),
        "ts": pa.array(
            [base + dt.timedelta(minutes=i) for i in range(n)],
            type=pa.timestamp("us", tz=tz),
        ),
    }
    if extra_col:
        cols["extra"] = pa.array([i % 3 for i in range(n)], type=pa.int32())
    pq.write_table(pa.table(cols), path)


def _run_both(engine, tmp_path, spec_kwargs, in_dir):
    """Run the spec twice — once as given (fast path eligible) and once
    with content verify forced on (which disqualifies the fast path) —
    and return both results."""
    fast = engine.run(
        RunSpec(inputs=[in_dir], out=str(tmp_path / "fast.parquet"),
                single_file=False, **spec_kwargs)
    )
    slow = engine.run(
        RunSpec(inputs=[in_dir], out=str(tmp_path / "slow.parquet"),
                single_file=False, verify=True, verify_mode="content",
                **spec_kwargs)
    )
    return fast, slow


def test_fast_path_matches_catalyst_plan(engine, spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(4):
        _mk_parquet(str(d / f"f{i}.parquet"), n=40, offset=40 * i)
    fast, slow = _run_both(engine, tmp_path, {"compression": "snappy"}, str(d))
    assert fast.output.via == "columnar-passthrough"
    assert slow.output.via == "spark"
    assert slow.verified is True
    assert fast.rows == slow.rows == 160
    fs, fr = _rows(spark, fast.output.paths)
    ss, sr = _rows(spark, slow.output.paths)
    assert fs == ss
    assert fr == sr


def test_fast_path_rolls_by_rows_with_reference_naming(engine, spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=100)
    out = str(tmp_path / "out.parquet")
    res = engine.run(
        RunSpec(inputs=[str(d)], out=out, single_file=False, roll_by_rows=30)
    )
    assert res.output.via == "columnar-passthrough"
    parts = sorted(glob.glob(str(tmp_path / "out-*.parquet")))
    assert parts == res.output.paths
    counts = [pq.ParquetFile(p).metadata.num_rows for p in parts]
    assert all(c <= 30 for c in counts)
    assert sum(counts) == 100
    # reference rolling naming: <stem>-%04d.parquet (README.md:49-50)
    assert os.path.basename(parts[0]) == "out-0000.parquet"


def test_fast_path_include_exclude_subset(engine, spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=30, extra_col=True)
    fast, slow = _run_both(
        engine, tmp_path, {"exclude": ["extra", "ts"]}, str(d)
    )
    assert fast.output.via == "columnar-passthrough"
    fs, fr = _rows(spark, fast.output.paths)
    ss, sr = _rows(spark, slow.output.paths)
    assert fs == ss and fr == sr
    assert [f.name for f in fs.fields] == ["id", "name", "val"]


def test_fast_path_single_file_matches_coalesced_plan(engine, spark, tmp_path):
    """The CLI DEFAULT (one output file) is passthrough-eligible: one
    writer task streams every input into exactly out_path — same
    serialized semantics as the Spark path's coalesce(1), same values
    (content verify forces the slow twin for comparison)."""
    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        _mk_parquet(str(d / f"f{i}.parquet"), n=20, offset=20 * i)
    out = str(tmp_path / "one.parquet")
    fast = engine.run(RunSpec(inputs=[str(d)], out=out))  # defaults
    assert fast.output.via == "columnar-passthrough"
    assert fast.output.paths == [out]
    assert fast.output.files_written == 1
    assert fast.rows == 60
    slow = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "two.parquet"),
                verify=True, verify_mode="content")
    )
    assert slow.output.via == "spark" and slow.verified is True
    fs, fr = _rows(spark, fast.output.paths)
    ss, sr = _rows(spark, slow.output.paths)
    assert fs == ss and fr == sr
    # single_file + a roll threshold = rolling parts, same as the
    # Spark writer's precedence
    rolled = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "r.parquet"),
                roll_by_rows=25)
    )
    assert rolled.output.via == "columnar-passthrough"
    assert rolled.output.files_written > 1
    assert os.path.basename(rolled.output.paths[0]) == "r-0000.parquet"


def test_fast_path_zstd_codec(engine, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=25)
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False, compression="zstd", zstd_level=5)
    )
    assert res.output.via == "columnar-passthrough"
    meta = pq.ParquetFile(res.output.paths[0]).metadata
    assert meta.row_group(0).column(0).compression == "ZSTD"
    assert meta.num_rows == 25


def test_fast_path_count_verify(engine, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=10)
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False, verify=True)
    )
    assert res.output.via == "columnar-passthrough"
    assert res.verified is True


def test_fast_path_empty_inputs_write_schema_file(engine, spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=0)
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "columnar-passthrough"
    assert res.rows == 0
    schema, rows = _rows(spark, res.output.paths)
    assert rows == []
    assert [f.name for f in schema.fields] == ["id", "name", "ts", "val"]


@pytest.mark.parametrize(
    "kwargs",
    [
        {"rename": {"id": "ident"}},          # rename => alignment
        {"verify": True, "verify_mode": "content"},  # checksum rides write
        {"compression": "lz4crap"},           # unsupported codec -> slow raise
    ],
)
def test_disqualified_specs_take_catalyst_plan(engine, tmp_path, kwargs):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=10)
    spec = RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                   single_file=False, **kwargs)
    if spec.compression == "lz4crap":
        with pytest.raises(ValueError):
            engine.run(spec)
        return
    res = engine.run(spec)
    assert res.output.via == "spark"


def test_widening_schemas_take_catalyst_plan(engine, spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=10)
    # second file: id as int32 -> unified widens to int64 => cast => slow
    pq.write_table(
        pa.table({
            "id": pa.array(range(10), type=pa.int32()),
            "val": pa.array([0.5] * 10),
            "name": pa.array(["x"] * 10),
            "ts": pa.array([None] * 10, type=pa.timestamp("us")),
        }),
        str(d / "b.parquet"),
    )
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "spark"
    assert res.rows == 20


def test_tz_aware_timestamps_take_catalyst_plan(engine, tmp_path):
    """A tz-adjusted parquet timestamp probes as TimestampType, the
    unified DATETIME is NTZ — that is a real timezone conversion, so a
    physical copy would be wrong; the gate must refuse it."""
    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=10, tz="UTC")
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "spark"


def test_csv_inputs_take_catalyst_plan(engine, tmp_path):
    f = tmp_path / "a.csv"
    f.write_text("a,b\n1,2\n3,4\n")
    res = engine.run(
        RunSpec(inputs=[str(f)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "spark"


def test_transcode_api_precedence_and_empty_inputs(engine, spark, tmp_path):
    """Public-API hardening (review r13): transcode_parquet resolves
    single_file vs a roll threshold with the sibling writers'
    precedence (rolling wins — finalizing rolled parts as one file
    would silently truncate), and refuses an empty file list."""
    from streaming_parquet_spark.sinks.writers import transcode_parquet

    d = tmp_path / "in"
    d.mkdir()
    _mk_parquet(str(d / "a.parquet"), n=25)
    files = [(str(d / "a.parquet"), os.path.getsize(str(d / "a.parquet")))]
    sink = transcode_parquet(
        spark, files, str(tmp_path / "o.parquet"),
        ["id", "name", "ts", "val"],
        max_records_per_file=10, single_file=True,
    )
    counts = [pq.ParquetFile(p).metadata.num_rows for p in sink.paths]
    assert sum(counts) == 25 and len(counts) == 3
    with pytest.raises(ValueError, match="no input files"):
        transcode_parquet(spark, [], str(tmp_path / "e.parquet"), ["id"])
