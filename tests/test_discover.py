"""Discovery semantics tests, mirroring /root/reference/src/discover.rs
tests (discover.rs:168-205) plus glob/dedup/sort behavior."""

import io
import os

from streaming_parquet_spark.sources.discover import (
    DiscoveryConfig,
    InputFormat,
    detect_format,
    discover_inputs,
)


def _touch(path, content="a,b\n1,2\n"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def test_detect_format():
    assert detect_format("x.csv") is InputFormat.CSV
    assert detect_format("x.TSV") is InputFormat.CSV
    assert detect_format("x.parquet") is InputFormat.PARQUET
    assert detect_format("x.txt") is InputFormat.TXT
    assert detect_format("x.txt.gz") is InputFormat.TXT
    assert detect_format("x.dat") is None
    assert detect_format("x.parquet.gz") is None  # columnar: no codec suffix
    assert detect_format("x") is None


def test_files_and_skip_unknown(tmp_path):
    a = tmp_path / "a.csv"
    b = tmp_path / "b.dat"
    _touch(str(a))
    _touch(str(b))
    found = discover_inputs([str(a), str(b)])
    assert [f.path for f in found] == [str(a)]
    assert found[0].format is InputFormat.CSV
    assert found[0].size == os.path.getsize(a)


def test_directory_recursive_and_sorted(tmp_path):
    _touch(str(tmp_path / "sub" / "z.csv"))
    _touch(str(tmp_path / "a.csv"))
    found = discover_inputs([str(tmp_path)])
    assert [os.path.basename(f.path) for f in found] == ["a.csv", "z.csv"]


def test_directory_non_recursive(tmp_path):
    _touch(str(tmp_path / "sub" / "z.csv"))
    _touch(str(tmp_path / "a.csv"))
    found = discover_inputs([str(tmp_path)], DiscoveryConfig(recursive=False))
    assert [os.path.basename(f.path) for f in found] == ["a.csv"]


def test_glob_and_dedup(tmp_path):
    a = tmp_path / "a.csv"
    _touch(str(a))
    # same file via direct path AND glob -> one entry (discover.rs:88-90)
    found = discover_inputs([str(a), str(tmp_path / "*.csv")])
    assert len(found) == 1


def test_stdin_spools_to_csv(tmp_path):
    cfg = DiscoveryConfig(stdin_reader=io.StringIO("x,y\n1,2\n"))
    found = discover_inputs(["-"], cfg)
    assert len(found) == 1
    assert found[0].format is InputFormat.CSV
    with open(found[0].path) as fh:
        assert fh.read() == "x,y\n1,2\n"
    os.remove(found[0].path)


def test_follow_symlinks_flag(tmp_path):
    import os as _os
    real = tmp_path / "real"
    _os.makedirs(real)
    with open(real / "f.csv", "w") as fh:
        fh.write("a\n1\n")
    link_dir = tmp_path / "scan"
    _os.makedirs(link_dir)
    _os.symlink(real, link_dir / "linked")
    from streaming_parquet_spark.sources.discover import (
        DiscoveryConfig,
        discover_inputs,
    )
    without = discover_inputs([str(link_dir)], DiscoveryConfig(follow_symlinks=False))
    with_links = discover_inputs([str(link_dir)], DiscoveryConfig(follow_symlinks=True))
    assert len(without) == 0
    assert len(with_links) == 1 and with_links[0].path.endswith("f.csv")


def test_detect_format_compressed_text():
    from streaming_parquet_spark.sources.discover import (
        InputFormat,
        detect_format,
    )

    assert detect_format("a.csv.gz") == InputFormat.CSV
    assert detect_format("b.TSV.GZ") == InputFormat.CSV
    assert detect_format("c.jsonl.bz2") == InputFormat.JSONL
    assert detect_format("d.ndjson.gz") == InputFormat.JSONL
    # columnar formats compress internally; a .parquet.gz is NOT a
    # readable parquet file -> skipped, not misread
    assert detect_format("e.parquet.gz") is None
    assert detect_format("f.orc.bz2") is None
