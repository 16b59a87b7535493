"""CLI e2e tests shaped like the reference's integration suite
(/root/reference/tests/integration.rs:6-126, tests/basic.rs:6-30):
concat, directory recursion, plan mode, dry-run, and failure cases —
driven through ``cli.main`` in-process to reuse the session fixture.
"""

import os

import pytest

from streaming_parquet_spark.cli import build_parser, main, spec_from_args


def _write(path, content):
    with open(path, "w") as fh:
        fh.write(content)


@pytest.fixture(autouse=True)
def _reuse_session(spark):
    """get_spark() inside main() reuses the test session."""
    yield


def test_concat_two_csvs(tmp_path, capsys):
    # integration.rs:6-40: concat two CSVs -> exact header + all rows
    _write(tmp_path / "a.csv", "a,b,c\n1,2,3\n4,5,6\n")
    _write(tmp_path / "b.csv", "a,b,c\n7,8,9\n")
    out = str(tmp_path / "out.csv")
    rc = main([str(tmp_path / "a.csv"), str(tmp_path / "b.csv"), "-o", out])
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "a,b,c"
    assert sorted(lines[1:]) == ["1,2,3", "4,5,6", "7,8,9"]


def test_directory_recursion(tmp_path):
    # integration.rs:42-71
    sub = tmp_path / "data" / "nested"
    os.makedirs(sub)
    _write(tmp_path / "data" / "f1.csv", "x\n1\n")
    _write(sub / "f2.csv", "x\n2\n")
    out = str(tmp_path / "out.csv")
    rc = main([str(tmp_path / "data"), "-o", out])
    assert rc == 0
    body = open(out).read()
    assert "1" in body and "2" in body


def test_plan_mode(tmp_path, capsys):
    # integration.rs:73-86: --plan prints inputs, writes nothing
    _write(tmp_path / "a.csv", "a\n1\n")
    rc = main([str(tmp_path / "a.csv"), "--plan"])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "Plan" in cap and "a.csv" in cap
    assert not os.path.exists(tmp_path / "out.csv")


def test_dry_run(tmp_path, capsys):
    # integration.rs:88-101
    _write(tmp_path / "a.csv", "a\n1\n2\n")
    rc = main([str(tmp_path / "a.csv"), "--dry-run"])
    assert rc == 0
    assert "2 rows" in capsys.readouterr().out


def test_nonexistent_input_fails(tmp_path):
    # basic.rs:20-30: nonexistent file -> exit 1
    rc = main([str(tmp_path / "missing.csv"), "-o", str(tmp_path / "o.csv")])
    assert rc == 1


def test_missing_out_fails(tmp_path):
    _write(tmp_path / "a.csv", "a\n1\n")
    rc = main([str(tmp_path / "a.csv")])
    assert rc == 1


def test_flag_parity_with_reference_cli():
    """Every reference flag (cli.rs:11-150) parses."""
    args = build_parser().parse_args(
        [
            "in.csv",
            "-o", "out.parquet",
            "--out-format", "parquet",
            "--delimiter", ";",
            "--quote", "'",
            "--no-headers",
            "--encoding", "latin1",
            "--na", "NA,null",
            "--columns", "a,b",
            "--exclude", "c",
            "--rename", "old=new",
            "--reorder",
            "--stringify-conflicts",
            "--infer-rows", "500",
            "--roll-by-bytes", "1000000",
            "--roll-by-rows", "1000",
            "--compression", "zstd",
            "--zstd-level", "9",
            "--concurrency", "8",
            "--writer-buffer", "32",
            "--mem-budget", "512",
            "--no-recursive",
            "--follow-symlinks",
            "--state", "/tmp/state",
            "--resume",
            "--verify",
            "--no-progress",
            "--json-logs",
            "-vv",
            "-q",
        ]
    )
    spec = spec_from_args(args)
    assert spec.delimiter == ";"
    assert spec.headers is False
    assert spec.encoding == "latin1"
    assert spec.rename == {"old": "new"}
    assert spec.compression == "zstd" and spec.zstd_level == 9
    assert spec.state == "/tmp/state" and spec.resume and spec.verify
    assert spec.roll_by_rows == 1000 and not spec.single_file


def test_rename_and_columns(tmp_path):
    _write(tmp_path / "a.csv", "old,keep,drop\n1,2,3\n")
    out = str(tmp_path / "out.csv")
    rc = main(
        [str(tmp_path / "a.csv"), "-o", out, "--rename", "old=new",
         "--exclude", "drop"]
    )
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "keep,new"


def test_streaming_state_resume_via_cli(tmp_path):
    """--state routes through the streaming engine; a rerun with the
    same state dir processes nothing new (resume, state.rs semantics)."""
    src = tmp_path / "src"
    os.makedirs(src)
    _write(src / "a.csv", "x,y\n1,2\n3,4\n")
    out = str(tmp_path / "out_dir")
    state = str(tmp_path / "ckpt")
    rc = main([str(src), "-o", out, "--out-format", "parquet",
               "--state", state])
    assert rc == 0
    # second run: same state -> no new input
    rc2 = main([str(src), "-o", out, "--out-format", "parquet",
                "--state", state])
    assert rc2 == 0
    import glob as g
    parts = g.glob(os.path.join(out, "*.parquet"))
    assert parts, "no parquet output written"


def test_partitioned_output_via_cli(tmp_path):
    _write(tmp_path / "a.csv", "k,grp\n1,x\n2,y\n3,x\n")
    out = str(tmp_path / "part_out")
    rc = main([str(tmp_path / "a.csv"), "-o", out, "--out-format", "parquet",
               "--partition-by", "grp"])
    assert rc == 0
    subdirs = {d for d in os.listdir(out) if d.startswith("grp=")}
    assert subdirs == {"grp=x", "grp=y"}


def test_bench_summary_line_fits_driver_line_cap():
    """The driver's BENCH_r{N}.json capture truncates stdout lines at
    ~2000 chars: rounds 2-7 printed a full multi-KB document and every
    one recorded `parsed: null` (only r1's 1496-char line ever parsed).
    bench.py's stdout line must stay a parseable standalone JSON line
    under the cap for ANY registry size — per-query detail belongs in
    BENCH_DETAIL.json."""
    import json
    import bench

    doc = {
        "metric": "sum_query_seconds",
        "value": 92.28,
        "unit": "sec",
        "sf": 0.1,
        # 400 long-named queries: far past today's 100-gate registry.
        "queries": {f"some_rather_long_query_name_{i:03d}": i * 0.0137
                    for i in range(400)},
        "conversions_mb_per_sec": {
            "csv_to_csv": 180.98, "csv_to_parquet_zstd": 210.32,
            "stream_csv_to_parquet": 160.12, "parquet_to_parquet": 233.43,
        },
        "sf1_vs_sf01_ratio": {"a": 1.5, "b": 11.33, "c": None},
        "conf": {"host_ref_md5_mb_s": 532.1},
    }
    line = bench._summary_line(doc)
    assert len(line) <= bench._SUMMARY_LINE_MAX <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "sum_query_seconds"
    assert parsed["value"] == 92.28
    assert parsed["n_queries"] == 400
    assert parsed["sf1_max_ratio"] == 11.33
    assert parsed["conversions_mb_per_sec"]["csv_to_parquet_zstd"] == 210.32
    # queries shown are the slowest-first prefix that fits
    shown = list(parsed["queries"].values())
    assert shown == sorted(shown, reverse=True)
    assert 0 < len(shown) < 400
    # degenerate inputs still produce a valid line
    empty = json.loads(bench._summary_line(
        {"metric": "m", "value": 0, "unit": "sec", "sf": 0.01}))
    assert empty["n_queries"] == 0 and empty["sf1_max_ratio"] is None
