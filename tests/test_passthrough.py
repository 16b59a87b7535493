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
    names = ["id", "name", "ts", "val"]
    src = pq.read_schema(files[0][0])
    schema = pa.schema([src.field(n).with_nullable(True) for n in names])
    sink = transcode_parquet(
        spark, files, str(tmp_path / "o.parquet"), names, schema,
        max_records_per_file=10, single_file=True,
    )
    counts = [pq.ParquetFile(p).metadata.num_rows for p in sink.paths]
    assert sum(counts) == 25 and len(counts) == 3
    with pytest.raises(ValueError, match="no input files"):
        transcode_parquet(
            spark, [], str(tmp_path / "e.parquet"), ["id"],
            pa.schema([pa.field("id", pa.int64())]),
        )

# ---------------------------------------------------------------------------
# Arrow-level gate (Engine._passthrough_arrow_schema, ADVICE r13): types
# the probe and Spark's reader disagree on — or whose transcoded output
# Spark cannot read back — must take the Catalyst plan, and every bin
# must write the ONE driver-computed canonical schema.
# ---------------------------------------------------------------------------


def test_int96_timestamps_take_catalyst_plan(engine, spark, tmp_path):
    """Spark 4's DEFAULT parquet timestamp output is INT96: the Arrow
    probe maps it to timestamp[ns] -> TimestampNTZ while Spark's own
    reader yields TIMESTAMP_LTZ, and a pyarrow transcode would emit
    INT64 TIMESTAMP(NANOS) — unreadable by Spark (PARQUET_TYPE_ILLEGAL).
    The end-to-end repro from ADVICE r13: Spark-written timestamps must
    fall back, and the output must read back equal to the input."""
    import datetime as dt

    d = tmp_path / "in"
    d.mkdir()
    base = dt.datetime(2024, 1, 2, 12, 0, 0)
    pq.write_table(
        pa.table({
            "id": pa.array(range(10), type=pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(hours=i) for i in range(10)],
                type=pa.timestamp("ns"),
            ),
        }),
        str(d / "a.parquet"),
        use_deprecated_int96_timestamps=True,
    )
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False, verify=True)
    )
    assert res.output.via == "spark"
    assert res.verified is True
    # The output is Spark-readable and row-count-complete — the exact
    # failure mode of the pre-fix passthrough was an unreadable sink.
    assert spark.read.parquet(*res.output.paths).count() == 10


def test_int64_nanos_timestamps_take_catalyst_plan(engine, spark, tmp_path):
    """Native INT64 TIMESTAMP(NANOS) input: Spark's scan rejects the
    type outright, so the passthrough must not fire (a verbatim copy
    would emit an output Spark cannot read even when the input itself
    already cannot be read — the gate falls back and lets the Spark
    path surface its own error)."""
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(
        pa.table({
            "id": pa.array(range(5), type=pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000 + i for i in range(5)],
                           type=pa.timestamp("ns")),
        }),
        str(d / "a.parquet"),
        version="2.6", coerce_timestamps=None,
    )
    # gate refuses: Engine._passthrough_arrow_schema sees unit == ns
    files = engine.discover(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"))
    )
    assert engine._passthrough_arrow_schema(files, ["id", "ts"]) is None


def test_mixed_arrow_string_types_take_catalyst_plan(engine, spark, tmp_path):
    """string and large_string both probe as Spark StringType, so the
    Spark-type gate alone would fire and each bin's output schema could
    depend on which file landed first (ADVICE r13, low). The Arrow gate
    requires IDENTICAL Arrow types per column across all files."""
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(
        pa.table({"id": pa.array(range(5), type=pa.int64()),
                  "s": pa.array(["a"] * 5, type=pa.string())}),
        str(d / "a.parquet"),
    )
    pq.write_table(
        pa.table({"id": pa.array(range(5, 10), type=pa.int64()),
                  "s": pa.array(["b"] * 5, type=pa.large_string())}),
        str(d / "b.parquet"),
        store_schema=True,
    )
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    # Only disqualifying when the large_string survives the footer
    # round-trip: pyarrow may normalize it to plain string in the
    # parquet schema, in which case the copy is genuinely uniform.
    probed = pq.read_schema(str(d / "b.parquet")).field("s").type
    expected_via = (
        "spark" if probed == pa.large_string() else "columnar-passthrough"
    )
    assert res.output.via == expected_via
    got = spark.read.parquet(*res.output.paths)
    assert got.count() == 10


def test_unsigned_ints_take_catalyst_plan(engine, spark, tmp_path):
    """Unsigned parquet ints read back under WIDER Spark types (UINT32
    -> LongType); the probe cannot represent them, and a verbatim copy
    would emit physical types the Spark writer itself never produces.
    Conservative: fall back."""
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(
        pa.table({"id": pa.array(range(10), type=pa.uint32())}),
        str(d / "a.parquet"),
    )
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "spark"
    rows = sorted(r[0] for r in spark.read.parquet(*res.output.paths).collect())
    assert rows == list(range(10))


def test_eligible_timestamps_still_pass(engine, spark, tmp_path):
    """Micros NTZ timestamps (pyarrow-written corpora) remain eligible
    and round-trip value-equal to the Catalyst plan — the fix must not
    disqualify the common case."""
    d = tmp_path / "in"
    d.mkdir()
    for i in range(2):
        _mk_parquet(str(d / f"f{i}.parquet"), n=20, offset=20 * i)
    fast, slow = _run_both(engine, tmp_path, {}, str(d))
    assert fast.output.via == "columnar-passthrough"
    assert slow.output.via == "spark"
    fs, fr = _rows(spark, fast.output.paths)
    ss, sr = _rows(spark, slow.output.paths)
    assert fs == ss and fr == sr


def test_all_bins_share_canonical_schema(engine, spark, tmp_path):
    """Every output part of a multi-bin transcode carries the same
    physical Arrow schema — the driver-computed canonical one."""
    d = tmp_path / "in"
    d.mkdir()
    for i in range(8):
        _mk_parquet(str(d / f"f{i}.parquet"), n=30, offset=30 * i)
    res = engine.run(
        RunSpec(inputs=[str(d)], out=str(tmp_path / "o.parquet"),
                single_file=False)
    )
    assert res.output.via == "columnar-passthrough"
    schemas = {pq.read_schema(p).remove_metadata() for p in res.output.paths}
    assert len(schemas) == 1
