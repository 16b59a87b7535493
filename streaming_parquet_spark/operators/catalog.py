"""Versioned shard-set catalog: the atomic-promotion layer
``compact_token_shards`` defers to (its docstring: "swap paths
atomically at the catalog/symlink layer above" — this is that layer).

A catalog ROOT holds numbered GENERATIONS, each an ordinary
token-shard set (``operators.pipeline.write_token_shards`` /
``streaming.shards.shard_ingest_stream`` target), plus a ``_catalog/``
directory of single-file commit markers:

    root/
      _catalog/claim-00000001         <- allocation markers (exclusive)
      _catalog/commit-00000001.json   <- publish markers (atomic put)
      gen-00000001/                   <- a token-shard set
      gen-00000001/_retired           <- retire marker (refuses appends)
      gen-00000002/

The swap protocol readers and producers rely on:

* **Allocation is exclusive.** :func:`next_generation` reserves its
  number by exclusively creating ``claim-N`` before returning, so two
  racing promoters compact into DIFFERENT directories — without the
  claim they would both pick max+1 and interleave writes into one
  path, leaving the publish marker to arbitrate over mixed data.

* **Publish is a single-file put, after verification.**
  :func:`publish_generation` refuses unless
  ``verify_token_shards(gen)`` reports every shard ok, then creates
  ``commit-N.json`` EXCLUSIVELY (hardlink-from-temp — fails if the
  marker exists, so two racing publishers cannot both win).  A
  generation with data but no marker is invisible to readers: a
  reader mid-swap resolves either the old marker or the new one,
  never a half-written set — the same data-then-promise ordering as
  the shard sidecar itself.
* **Current = max committed.** :func:`current_generation` lists
  ``_catalog`` and takes the highest marker.  Listing a directory of
  ~small-integer marker files is O(generations) — a handful — never
  O(shards).
* **Retire is a marker, drop is separate.**
  :func:`retire_generation` writes ``_retired`` inside the old
  generation (appends refuse from then on — ``append_token_shards``
  and ``shard_ingest_stream`` probe it); the DATA stays until
  :func:`drop_generation`, so readers that pinned the old generation
  (the way ``shard_snapshot`` pins keys) finish their epoch before
  the files disappear.  Dropping the CURRENT generation refuses.
* **Promotion composes the pieces.** :func:`promote_compaction` =
  compact current -> next, verify, publish, retire old — the
  "compact -> verify -> swap -> retire" sequence the r10 verdict
  asked for, as one call.

At 100 TB: every catalog operation is marker-sized (one JSON file, a
directory listing of a few dozen markers) except the verification
inside publish, which is the same one partition-discovered scan
``verify_token_shards`` always costs — paid once per publish, i.e.
once per compaction or bulk load, never per read.  Marker files are
written via hardlink-from-temp, atomic and exclusive on POSIX
filesystems; on an object store the equivalent is a conditional PUT
(if-none-match), the standard single-writer commit primitive —
the protocol transfers unchanged.

Reference parity note: the reference engine has no catalog (it is a
single-run converter; cli.rs exposes --state for resume only) — this
layer is extension surface for the continuous training-data factory,
mirroring public table-format commit-protocol designs (generation
markers + verify-before-publish).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame

_GEN_RE = re.compile(r"^gen-(\d{8})$")
_COMMIT_RE = re.compile(r"^commit-(\d{8})\.json$")
_CLAIM_RE = re.compile(r"^claim-(\d{8})$")

#: marker filename inside a generation that refuses further appends;
#: probed by append_token_shards and shard_ingest_stream
RETIRED_MARKER = "_retired"


def generation_path(root: str, gen: int) -> str:
    """The directory of generation ``gen`` under ``root``."""
    if int(gen) < 1:
        raise ValueError(f"generation numbers start at 1 (got {gen})")
    return os.path.join(root, f"gen-{int(gen):08d}")


def _catalog_dir(root: str) -> str:
    return os.path.join(root, "_catalog")


def _committed(root: str) -> list[int]:
    cat = _catalog_dir(root)
    if not os.path.isdir(cat):
        return []
    out = []
    for name in os.listdir(cat):
        m = _COMMIT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _existing_dirs(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _GEN_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _claimed(root: str) -> list[int]:
    cat = _catalog_dir(root)
    if not os.path.isdir(cat):
        return []
    out = []
    for name in os.listdir(cat):
        m = _CLAIM_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def next_generation(root: str) -> tuple[int, str]:
    """Allocate the next generation number and RESERVE it: 1 + the
    highest of any committed marker, claim marker, or existing gen-*
    directory, claimed by exclusively creating
    ``_catalog/claim-N`` (``open(..., 'x')`` — the conditional-PUT
    shape on object stores).  Two racing promoters therefore get
    DISTINCT numbers instead of interleaving writes into one
    directory and letting the publish marker arbitrate over mixed
    data.  An abandoned, never-published attempt keeps its claim —
    publish markers are write-once, so numbers must never be reused.
    Returns (gen, path); the caller writes a shard set into ``path``
    and then :func:`publish_generation`\\ s it."""
    os.makedirs(_catalog_dir(root), exist_ok=True)
    taken = (
        set(_committed(root)) | set(_existing_dirs(root))
        | set(_claimed(root))
    )
    while True:
        gen = max(taken, default=0) + 1
        claim = os.path.join(_catalog_dir(root), f"claim-{gen:08d}")
        try:
            with open(claim, "x") as f:
                f.write(json.dumps({"claimed_generation": gen}) + "\n")
        except FileExistsError:
            taken.add(gen)  # a racing allocator won this number
            continue
        return gen, generation_path(root, gen)


def is_retired(path: str) -> bool:
    """Whether a shard-set path carries the catalog's retire marker."""
    return os.path.exists(os.path.join(path, RETIRED_MARKER))


def publish_generation(
    spark,
    root: str,
    gen: int,
    vocab_ids: DataFrame | None = None,
    content_fp: dict | None = None,
) -> dict:
    """Make generation ``gen`` the catalog's newest COMMITTED set:
    verify every shard against its sidecar (one partition-discovered
    scan — a torn or tampered set refuses here, before any reader can
    resolve it), then atomically create the single-file commit marker.
    Returns the marker's contents.

    Refusals: an unverifiable or failing set; a retired generation
    (retire-then-republish would resurrect data producers already
    moved past); an already-published generation (markers are
    write-once — the exclusive create makes two racing publishers
    lose loudly, not last-writer-wins).  Pass ``vocab_ids`` to also
    pin the vocabulary the way :func:`...pipeline.read_token_shards`
    does — a catalog should never promote a set encoded under a
    foreign tokenizer.

    The marker also records the set's identity-free CONTENT
    fingerprint (``shard_set_content_fp`` — invariant under shard
    renumbering), making every committed generation
    content-addressable — an auditor can re-fingerprint any
    generation's data and compare against its marker years later.
    :func:`promote_compaction` proves the successor carries the
    current generation's content (fresh src/dst scans, robust to a
    marker predating this field) before anything is retired.  Pass
    ``content_fp`` to reuse a fingerprint the caller already
    computed; omitted, publish computes it (one extra scan beside
    the verify scan).  A supplied fingerprint's window/token totals
    are cross-checked against the sidecar totals before the marker
    is written (markers are write-once — a stale fp would lie
    forever); the fp hashes themselves are trusted from the caller,
    so only pass a fingerprint computed over THIS generation's
    path (as :func:`promote_compaction` does)."""
    from streaming_parquet_spark.operators.pipeline import (
        _check_vocab,
        _read_shard_contract,
        shard_set_content_fp,
        verify_token_shards,
    )

    gen = int(gen)
    path = generation_path(root, gen)
    if is_retired(path):
        raise ValueError(
            f"publish_generation: gen {gen} at {path!r} is RETIRED — "
            f"republishing a retired generation would resurrect data "
            f"the catalog already moved past; promote a fresh one"
        )
    marker = os.path.join(_catalog_dir(root), f"commit-{gen:08d}.json")
    if os.path.exists(marker):
        raise ValueError(
            f"publish_generation: gen {gen} is already published "
            f"({marker!r}) — commit markers are write-once"
        )
    _, contract = _read_shard_contract(spark, path, "publish_generation")
    if vocab_ids is not None:
        _check_vocab(contract, vocab_ids, path, "publish_generation")
    bad = verify_token_shards(spark, path).filter("NOT ok").count()
    if bad:
        raise ValueError(
            f"publish_generation: gen {gen} at {path!r} has {bad} "
            f"shard(s) failing verification — a generation publishes "
            f"only after every shard matches its sidecar promise"
        )
    totals = (
        spark.read.parquet(os.path.join(path, "_manifest"))
        .groupBy()
        .agg({"n_windows": "sum", "n_tokens": "sum", "shard": "count"})
        .first()
    )
    if content_fp is None:
        content_fp = shard_set_content_fp(spark, path)
    else:
        # The caller-supplied fingerprint goes into a WRITE-ONCE marker
        # that makes the generation content-addressable forever — a
        # stale or foreign fp would make the audit trail permanently
        # lie.  The fp hashes themselves are trusted (recomputing them
        # would erase the reuse saving), but the dict carries the set's
        # window/token totals, and those must agree with the sidecar
        # totals already collected above — the cheap tripwire that
        # catches a fingerprint minted over a different (or since-
        # grown) set before it is immortalized.
        for fp_key, tot_key in (
            ("n_windows", "sum(n_windows)"),
            ("n_tokens", "sum(n_tokens)"),
        ):
            if int(content_fp[fp_key]) != int(totals[tot_key]):
                raise ValueError(
                    f"publish_generation: supplied content_fp claims "
                    f"{fp_key}={content_fp[fp_key]} but gen {gen}'s "
                    f"sidecar totals {totals[tot_key]} — the "
                    f"fingerprint was minted over a different set; "
                    f"omit content_fp to have publish recompute it"
                )
    doc = {
        "generation": gen,
        "n_shards": totals["count(shard)"],
        "n_windows": totals["sum(n_windows)"],
        "n_tokens": totals["sum(n_tokens)"],
        "format": contract["format"],
        "budget": contract["budget"],
        "vocab_size": contract["vocab_size"],
        "vocab_fp_a": contract["vocab_fp_a"],
        "vocab_fp_b": contract["vocab_fp_b"],
        "content_fp_a": content_fp["fp_a"],
        "content_fp_b": content_fp["fp_b"],
    }
    os.makedirs(_catalog_dir(root), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        # hardlink-from-temp: atomic AND exclusive — os.replace would
        # let a racing second publisher silently overwrite the winner
        os.link(tmp, marker)
    except FileExistsError:
        raise ValueError(
            f"publish_generation: gen {gen} was published concurrently "
            f"({marker!r}) — commit markers are write-once"
        ) from None
    finally:
        os.unlink(tmp)
    return doc


def current_generation(root: str) -> tuple[int, str]:
    """The newest COMMITTED generation: (gen, path).  Resolving this
    is the reader's pin — hold the returned path for the whole
    epoch (the data outlives retirement until
    :func:`drop_generation`), exactly how ``shard_snapshot`` pins a
    key set within one generation."""
    gens = _committed(root)
    if not gens:
        raise ValueError(
            f"current_generation: {root!r} has no committed "
            f"generation — publish one first"
        )
    gen = gens[-1]
    return gen, generation_path(root, gen)


def read_current_shards(
    spark, root: str, vocab_ids: DataFrame | None = None
) -> tuple[DataFrame, dict, int]:
    """Resolve the current generation and read it as a token-shard
    set: (windows, contract, generation).  For rank-sliced training
    reads, resolve :func:`current_generation` yourself and hand its
    path to ``read_rank_shards`` — every rank must pin the SAME
    generation (pass the resolved gen around like a snapshot)."""
    from streaming_parquet_spark.operators.pipeline import (
        read_token_shards,
    )

    gen, path = current_generation(root)
    windows, contract = read_token_shards(spark, path, vocab_ids=vocab_ids)
    return windows, contract, gen


def retire_generation(root: str, gen: int) -> str:
    """Mark generation ``gen`` retired: producers refuse to append to
    it from now on (``append_token_shards`` / ``shard_ingest_stream``
    probe the marker), while its DATA stays readable until
    :func:`drop_generation` — the grace window for readers that
    pinned it.  Refuses retiring the CURRENT generation (that would
    leave the catalog pointing at a set no producer may extend and no
    successor replaces — promote first) and an unpublished one
    (nothing ever pointed at it; just delete the directory).
    Idempotent: retiring twice is a no-op."""
    gen = int(gen)
    path = generation_path(root, gen)
    committed = _committed(root)
    if gen not in committed:
        raise ValueError(
            f"retire_generation: gen {gen} was never published — "
            f"an abandoned attempt has no readers to grace; remove "
            f"its directory directly"
        )
    if gen == committed[-1]:
        raise ValueError(
            f"retire_generation: gen {gen} IS the current generation "
            f"— publish its successor first (promote_compaction does "
            f"compact -> verify -> publish -> retire in order)"
        )
    marker = os.path.join(path, RETIRED_MARKER)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(json.dumps({"retired_generation": gen}) + "\n")
    return marker


def drop_generation(root: str, gen: int) -> None:
    """Delete a RETIRED generation's data (the reclaim step after the
    read-grace window).  Refuses the current generation and any
    generation not yet retired — drop is the only destructive verb
    here and it demands both guards already stood.  The ``_retired``
    marker itself survives, so a lost producer replaying into the
    emptied path still refuses, and the write-once commit marker
    keeps the generation number from ever being reused."""
    import shutil

    gen = int(gen)
    path = generation_path(root, gen)
    committed = _committed(root)
    if committed and gen == committed[-1]:
        raise ValueError(
            f"drop_generation: gen {gen} IS the current generation"
        )
    if not is_retired(path):
        raise ValueError(
            f"drop_generation: gen {gen} is not retired — retire it "
            f"first (readers may still be pinned to it)"
        )
    for name in os.listdir(path):
        if name == RETIRED_MARKER:
            continue
        full = os.path.join(path, name)
        if os.path.isdir(full):
            shutil.rmtree(full)
        else:
            os.unlink(full)


def promote_compaction(
    spark,
    root: str,
    n_shards: int | None = None,
    shard_tokens: int | None = None,
    shard_prefix: str = "compact-",
    vocab_ids: DataFrame | None = None,
) -> tuple[int, DataFrame]:
    """The full swap, in the only safe order: compact the CURRENT
    generation into the next one (``compact_token_shards`` — content
    preserved exactly, source pinned at entry), PROVE the
    preservation (the successor's identity-free content fingerprint
    must equal the source's — ``shard_set_content_fp`` is invariant
    under the renumbering compaction performs, so inequality means
    windows were lost, duplicated, or altered), then verify + publish
    the successor (single-file atomic marker) and retire the source.
    The proof runs BEFORE the publish: a content-corrupting
    compaction leaves an unpublished (invisible) directory and the
    source untouched, never a committed wrong generation.  Returns
    (new_generation, written manifest).

    A reader racing this sees exactly one complete generation at
    every instant: before the marker lands it resolves the old
    generation (whose data is untouched — compaction never writes
    into its source); after, the new one.  The old generation's data
    survives until an explicit :func:`drop_generation` after the
    read-grace window.  A crash mid-promotion leaves either a
    data-only next-gen directory (unpublished — invisible to readers;
    the next promotion allocates a fresh number) or a published
    successor with the old generation not yet retired (re-run
    :func:`retire_generation` — idempotent)."""
    old_gen, old_path = current_generation(root)
    new_gen, new_path = next_generation(root)
    from streaming_parquet_spark.operators.pipeline import (
        compact_token_shards,
        shard_set_content_fp,
    )

    # the source's content expectation, pinned BEFORE compaction (a
    # wave landing after this but before compact's own pin makes the
    # two fingerprints disagree — a conservative refusal, same stance
    # as compact's grown-source recheck)
    src_fp = shard_set_content_fp(spark, old_path)
    manifest = compact_token_shards(
        spark, old_path, new_path,
        n_shards=n_shards, shard_tokens=shard_tokens,
        shard_prefix=shard_prefix,
    )
    dst_fp = shard_set_content_fp(spark, new_path)
    if dst_fp != src_fp:
        raise ValueError(
            f"promote_compaction: gen {new_gen} at {new_path!r} does "
            f"NOT carry gen {old_gen}'s content (src {src_fp} vs dst "
            f"{dst_fp}) — refusing to publish; the directory stays "
            f"unpublished (invisible to readers) and gen {old_gen} "
            f"stays current"
        )
    publish_generation(
        spark, root, new_gen, vocab_ids=vocab_ids, content_fp=dst_fp
    )
    retire_generation(root, old_gen)
    return new_gen, manifest
