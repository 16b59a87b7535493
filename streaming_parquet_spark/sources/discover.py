"""Input discovery: files, directories, globs, stdin.

Reimplements the semantics of ``discover_inputs``
(/root/reference/src/discover.rs:46-159): each input is stdin ``-``
(assumed CSV; discover.rs:53-61), a file (extension-sniffed, 65-76), a
directory (recursive walk unless disabled, 77-80,103-130), or a glob
(81-85,132-159). Results are deduplicated and sorted lexicographically
(discover.rs:88-90). ``.csv``/``.tsv`` -> CSV, ``.parquet`` -> Parquet,
anything else skipped (discover.rs:20-28).

Discovery is driver-side metadata work (same as the reference); the
actual reads are distributed. At 100 TB / millions of files one would
pass directories straight to ``spark.read`` (Hadoop FS listing is
parallelized and supports ``recursiveFileLookup``/``pathGlobFilter``);
this explicit listing exists to honor the reference's contract — mixed
formats per run, deterministic ordering, and per-file schema probing
for unification.
"""

from __future__ import annotations

import enum
import glob as globlib
import os
import sys
import tempfile
from dataclasses import dataclass


class InputFormat(enum.Enum):
    CSV = "csv"
    PARQUET = "parquet"
    # Extension beyond the reference (discover.rs:20-28 skips unknown
    # extensions): newline-delimited JSON, the lingua franca of LLM
    # training corpora. Nested values degrade to Utf8 (JSON text) under
    # the reference's own lattice rule (schema.rs:38).
    JSONL = "jsonl"
    # Extension: ORC — the other columnar lake format Spark reads and
    # writes natively; schema comes from file metadata like Parquet.
    ORC = "orc"
    # Extension: raw line-per-record text (.txt) — training corpora
    # frequently arrive as plain text dumps. Fixed one-column schema
    # (value: Utf8), so it concats with anything under the widening
    # lattice like any other single-Utf8-column source.
    TXT = "txt"


@dataclass(frozen=True)
class InputFile:
    path: str
    format: InputFormat
    size: int


@dataclass
class DiscoveryConfig:
    recursive: bool = True          # reference: --no-recursive inverts
    follow_symlinks: bool = False   # reference: --follow-symlinks
    stdin_reader: object | None = None  # injectable for tests; defaults to sys.stdin


_EXT_FORMAT = {
    ".csv": InputFormat.CSV,
    ".tsv": InputFormat.CSV,
    ".parquet": InputFormat.PARQUET,
    ".json": InputFormat.JSONL,
    ".jsonl": InputFormat.JSONL,
    ".ndjson": InputFormat.JSONL,
    ".orc": InputFormat.ORC,
    ".txt": InputFormat.TXT,
    ".text": InputFormat.TXT,
}


#: transparently-decompressed text codecs (Spark's text sources handle
#: these by extension; parquet/ORC compress internally, so a
#: ``.parquet.gz`` stays unrecognized on purpose)
_CODEC_EXTS = (".gz", ".bz2")
_TEXT_FORMATS = frozenset(
    {InputFormat.CSV, InputFormat.JSONL, InputFormat.TXT}
)


def detect_format(path: str) -> InputFormat | None:
    """Extension sniffing (discover.rs:20-28); None => skip.
    ``.csv.gz`` / ``.jsonl.bz2`` etc. map to their text format —
    Spark decompresses text sources by extension, and the driver-side
    probes decompress the prefix themselves."""
    base = path.lower()
    compressed = base.endswith(_CODEC_EXTS)
    if compressed:
        base = base[: base.rfind(".")]
    fmt = _EXT_FORMAT.get(os.path.splitext(base)[1])
    if compressed and fmt not in _TEXT_FORMATS:
        return None
    return fmt


def _add_file(path: str, out: list[InputFile]) -> None:
    fmt = detect_format(path)
    if fmt is None:
        return
    try:
        size = os.path.getsize(path)
    except OSError:
        return
    out.append(InputFile(os.path.abspath(path), fmt, size))


def _walk_dir(path: str, cfg: DiscoveryConfig, out: list[InputFile]) -> None:
    if not cfg.recursive:
        for entry in os.listdir(path):
            full = os.path.join(path, entry)
            if os.path.isfile(full):
                _add_file(full, out)
        return
    for root, _dirs, files in os.walk(path, followlinks=cfg.follow_symlinks):
        for f in files:
            _add_file(os.path.join(root, f), out)


def _spool_stdin(cfg: DiscoveryConfig) -> str:
    """Materialize stdin to a temp CSV file (driver-side shim; the
    reference wires stdin as a CSV byte stream, discover.rs:53-61)."""
    reader = cfg.stdin_reader if cfg.stdin_reader is not None else sys.stdin
    fd, tmp = tempfile.mkstemp(prefix="maw_stdin_", suffix=".csv")
    with os.fdopen(fd, "w") as fh:
        fh.write(reader.read())
    return tmp


def discover_inputs(
    inputs: list[str], cfg: DiscoveryConfig | None = None
) -> list[InputFile]:
    """Resolve raw CLI-style inputs into a deduped, sorted file list."""
    cfg = cfg or DiscoveryConfig()
    found: list[InputFile] = []
    for raw in inputs:
        if raw == "-":
            _add_file(_spool_stdin(cfg), found)
        elif os.path.isfile(raw):
            _add_file(raw, found)
        elif os.path.isdir(raw):
            _walk_dir(raw, cfg, found)
        else:
            for match in globlib.glob(raw, recursive=True):
                if os.path.isfile(match):
                    _add_file(match, found)
                elif os.path.isdir(match):
                    _walk_dir(match, cfg, found)

    # Dedup by path, lexicographic sort (discover.rs:88-90).
    unique = {f.path: f for f in found}
    return [unique[p] for p in sorted(unique)]
