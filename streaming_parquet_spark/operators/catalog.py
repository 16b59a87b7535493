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
  ``commit-N.json`` EXCLUSIVELY (the store's atomic put-if-absent —
  fails if the marker exists, so two racing publishers cannot both
  win).  A
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
once per compaction or bulk load, never per read.

The marker plane is a pluggable seam (:class:`MarkerStore`): the
swap protocol performs exactly three storage primitives — atomic
put-if-absent, exists, list — and never touches ``os`` directly for
markers; the audit verbs add a fourth, ``read``.  A backend
implements those four and the whole catalog transfers unchanged
(three suffice if a deployment never audits).  :class:`PosixMarkerStore` (the
default) uses hardlink-from-temp, atomic and exclusive on POSIX
filesystems; an object-store backend maps put-if-absent to a
conditional PUT (if-none-match), the standard single-writer commit
primitive.  Swap the backend per call (``store=``) or once for the
process (``DEFAULT_STORE``) — producers' retire probes follow.

Retention is codified, not manual: :func:`list_retired` names the
reclaim candidates and :func:`sweep_generations` drops every retired
generation older than the newest ``keep_last_n`` committed ones —
the read-grace window expressed in promotions — while refusing to
touch the current generation or anything never retired.

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


class MarkerStore:
    """The catalog's MARKER-plane storage seam: the first three
    primitives are all the swap protocol needs; ``read`` is required
    only by the audit verbs — implement all four to port the whole
    catalog to a backend.  The DATA plane (shard parquet + sidecar)
    never goes through this — Spark reads/writes it via its own
    filesystem connectors.

    * ``put_if_absent(path, text) -> bool`` — atomically create the
      marker with ``text`` iff nothing exists at ``path``; True on
      win, False if something was already there.  This is the only
      mutation the protocol performs: allocation claims, commit
      markers, and retire markers are all single write-once puts.
      Object stores: a conditional PUT (``If-None-Match: *`` on S3/
      GCS/ABFS); POSIX: hardlink-from-temp.
    * ``exists(path) -> bool`` — HEAD-shaped probe.
    * ``list(prefix) -> list[str]`` — child names directly under a
      prefix (no recursion); [] when the prefix doesn't exist.
      Listing a catalog directory is O(generations) — a handful of
      small names, never O(shards).
    * ``read(path) -> str`` — GET the marker's text.  The swap
      protocol itself never reads a marker back (markers are
      promises, data carries the contract); the READ side of the
      seam exists for the audit verbs
      (:func:`audit_generation` re-checks data against its
      recorded fingerprint).

    Consistency the protocol assumes: ``put_if_absent`` is atomic and
    exclusive against concurrent puts of the same path, and a
    successful put is visible to subsequent ``list``/``exists`` calls
    (read-after-write — true of POSIX and of every major object store
    since 2020).  Nothing assumes atomic rename of directories, fsync
    ordering across paths, or directory semantics at all."""

    def put_if_absent(self, path: str, text: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        raise NotImplementedError

    def read(self, path: str) -> str:
        raise NotImplementedError


class PosixMarkerStore(MarkerStore):
    """Default backend: local/NFS filesystems.  ``put_if_absent`` is
    hardlink-from-temp — atomic AND exclusive (``os.replace`` would
    let a racing second writer silently overwrite the winner), the
    same primitive the shard sidecar's write-once promise uses."""

    def put_if_absent(self, path: str, text: str) -> bool:
        import uuid

        parent = os.path.dirname(path) or "."
        os.makedirs(parent, exist_ok=True)
        # A per-call unique tmp name keeps the primitive atomic within
        # one process too (a pid-derived name would let two THREADS
        # racing the same marker truncate each other's inode), and
        # os.open with an explicit mode lets the KERNEL apply the
        # umask atomically — markers stay umask-default-readable (the
        # audit verbs, possibly another uid, read them) without the
        # process-global os.umask() probe, which is not thread-safe.
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o666)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
            except FileExistsError:
                return False
            return True
        finally:
            os.unlink(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return os.listdir(prefix)

    def read(self, path: str) -> str:
        with open(path) as f:
            return f.read()


class ObjectMarkerStore(MarkerStore):
    """Object-store backend: maps the four marker primitives onto the
    conditional-PUT flat-key API every major object store ships
    (S3 ``PutObject`` + ``If-None-Match: *``, GCS
    ``x-goog-if-generation-match: 0``, ABFS ``If-None-Match: *``).
    The store owns key normalization and directory emulation (child
    names out of a flat key listing); the injected ``client`` is dumb
    storage with four calls:

    * ``put_if_absent(key, text) -> bool`` — conditional PUT; False
      when the key already exists (the 412 path), never overwrite.
    * ``exists(key) -> bool`` — HEAD.
    * ``list_keys(prefix) -> list[str]`` — every key under ``prefix``
      (flat, any depth). Marker listings are O(generations).
    * ``get(key) -> str`` — GET.

    :class:`S3ObjectClient` adapts a boto3 S3 client to this shape;
    :class:`InMemoryObjectClient` is the in-process implementation the
    contract tests run (genuine conditional-PUT semantics under a
    lock). Paths arriving from the catalog are POSIX-joined strings;
    ``_key`` strips leading slashes so absolute tmp paths become
    legal object keys."""

    def __init__(self, client, prefix: str = ""):
        self.client = client
        self.prefix = prefix.strip("/")

    def _key(self, path: str) -> str:
        key = os.path.normpath(path).replace(os.sep, "/").lstrip("/")
        return f"{self.prefix}/{key}" if self.prefix else key

    def put_if_absent(self, path: str, text: str) -> bool:
        return bool(self.client.put_if_absent(self._key(path), text))

    def exists(self, path: str) -> bool:
        return bool(self.client.exists(self._key(path)))

    def list(self, prefix: str) -> list[str]:
        p = self._key(prefix) + "/"
        return sorted(
            {
                k[len(p):].split("/", 1)[0]
                for k in self.client.list_keys(p)
                if k.startswith(p) and len(k) > len(p)
            }
        )

    def read(self, path: str) -> str:
        return self.client.get(self._key(path))


class S3ObjectClient:
    """Adapt a boto3 S3 client to :class:`ObjectMarkerStore`'s client
    shape. Construction takes the ALREADY-BUILT boto3 client (this
    module never imports boto3 — the dependency stays with the
    deployment): ``ObjectMarkerStore(S3ObjectClient(boto3.client("s3"),
    "my-bucket"))``. ``put_if_absent`` is S3's native conditional PUT
    (``IfNoneMatch="*"`` — GA on S3 since 2024 and on every
    S3-compatible store that matters). The error taxonomy matters:
    412 PreconditionFailed means the key EXISTS (a genuine loss), but
    409 ConditionalRequestConflict means two conditional PUTs collided
    IN FLIGHT and both may have failed — AWS documents it retryable,
    and reading it as a loss could leave NO marker while both racers
    report success (two retirers racing would leave the generation
    append-open forever). 409 retries the put with backoff; if
    retries exhaust, the key's existence decides (exists -> lost;
    still absent -> raise: the race's outcome is unknowable)."""

    def __init__(
        self, boto3_s3_client, bucket: str, put_retries: int = 8
    ):
        self.c = boto3_s3_client
        self.bucket = bucket
        self.put_retries = int(put_retries)

    def put_if_absent(self, key: str, text: str) -> bool:
        import time as _time

        last_exc = None
        for attempt in range(max(1, self.put_retries)):
            try:
                self.c.put_object(
                    Bucket=self.bucket, Key=key, Body=text.encode(),
                    IfNoneMatch="*",
                )
                return True
            except Exception as exc:  # botocore ClientError, not imported
                resp = getattr(exc, "response", None) or {}
                code = (resp.get("Error") or {}).get("Code")
                if code == "PreconditionFailed":
                    return False
                if code == "ConditionalRequestConflict":
                    last_exc = exc
                    _time.sleep(min(0.05 * (2 ** attempt), 1.0))
                    continue
                raise
        if self.exists(key):
            return False
        raise RuntimeError(
            f"S3ObjectClient.put_if_absent({key!r}): conditional PUT "
            f"conflicted {self.put_retries} times and the key is "
            f"still absent — cannot decide the race"
        ) from last_exc

    def exists(self, key: str) -> bool:
        try:
            self.c.head_object(Bucket=self.bucket, Key=key)
            return True
        except Exception as exc:
            resp = getattr(exc, "response", None) or {}
            code = (resp.get("Error") or {}).get("Code")
            if code in ("404", "NoSuchKey", "NotFound"):
                return False
            raise

    def list_keys(self, prefix: str) -> list[str]:
        out = []
        paginator = self.c.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket,
                                       Prefix=prefix):
            out += [o["Key"] for o in page.get("Contents", [])]
        return out

    def get(self, key: str) -> str:
        obj = self.c.get_object(Bucket=self.bucket, Key=key)
        return obj["Body"].read().decode()


class InMemoryObjectClient:
    """The compliant in-process fake the contract tests inject: a flat
    key->text dict with GENUINE conditional-PUT semantics (atomic and
    exclusive under a lock — two racing put_if_absent calls get
    exactly one True), read-after-write visibility, no directories."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.blobs: dict[str, str] = {}

    def put_if_absent(self, key: str, text: str) -> bool:
        with self._lock:
            if key in self.blobs:
                return False
            self.blobs[key] = text
            return True

    def exists(self, key: str) -> bool:
        return key in self.blobs

    def list_keys(self, prefix: str) -> list[str]:
        return [k for k in self.blobs if k.startswith(prefix)]

    def get(self, key: str) -> str:
        return self.blobs[key]


#: module-level default so a deployment swaps the backend ONCE and
#: every probe — including the producers' retire checks — follows
DEFAULT_STORE = PosixMarkerStore()


def _store(store: MarkerStore | None) -> MarkerStore:
    return store if store is not None else DEFAULT_STORE


def generation_path(root: str, gen: int) -> str:
    """The directory of generation ``gen`` under ``root``."""
    if int(gen) < 1:
        raise ValueError(f"generation numbers start at 1 (got {gen})")
    return os.path.join(root, f"gen-{int(gen):08d}")


def _catalog_dir(root: str) -> str:
    return os.path.join(root, "_catalog")


def _committed(root: str, store: MarkerStore | None = None) -> list[int]:
    store = _store(store)
    out = []
    for name in store.list(_catalog_dir(root)):
        m = _COMMIT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _existing_dirs(root: str, store: MarkerStore | None = None) -> list[int]:
    # gen-* prefixes under the root (data plane, but only their NAMES
    # matter here — allocation must not collide with an existing set).
    # On the POSIX backend store.list(root) sees real directories, so
    # even OUT-OF-PROTOCOL data (a hand-made gen-N with no claim) is
    # shielded from re-allocation.  A non-POSIX backend lists only the
    # marker plane: there, every in-protocol generation is covered by
    # its claim marker, but data imported by hand must be brought in
    # through next_generation/publish (or given a claim marker) or
    # allocation cannot see it.  Conservative by construction: a stray
    # REGULAR FILE named gen-NNNNNNNN permanently burns that number
    # (allocation skips it, nothing reclaims it) — name squatting
    # wastes a slot but can never collide two writers (ADVICE r12).
    store = _store(store)
    out = []
    for name in store.list(root):
        m = _GEN_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _claimed(root: str, store: MarkerStore | None = None) -> list[int]:
    store = _store(store)
    out = []
    for name in store.list(_catalog_dir(root)):
        m = _CLAIM_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def next_generation(
    root: str, store: MarkerStore | None = None
) -> tuple[int, str]:
    """Allocate the next generation number and RESERVE it: 1 + the
    highest of any committed marker, claim marker, or existing gen-*
    directory, claimed by an atomic put-if-absent of
    ``_catalog/claim-N`` (the store's conditional-PUT / exclusive-
    create primitive).  Two racing promoters therefore get
    DISTINCT numbers instead of interleaving writes into one
    directory and letting the publish marker arbitrate over mixed
    data.  An abandoned, never-published attempt keeps its claim —
    publish markers are write-once, so numbers must never be reused.
    Returns (gen, path); the caller writes a shard set into ``path``
    and then :func:`publish_generation`\\ s it."""
    store = _store(store)
    taken = (
        set(_committed(root, store)) | set(_existing_dirs(root, store))
        | set(_claimed(root, store))
    )
    while True:
        gen = max(taken, default=0) + 1
        claim = os.path.join(_catalog_dir(root), f"claim-{gen:08d}")
        if not store.put_if_absent(
            claim, json.dumps({"claimed_generation": gen}) + "\n"
        ):
            taken.add(gen)  # a racing allocator won this number
            continue
        return gen, generation_path(root, gen)


def is_retired(path: str, store: MarkerStore | None = None) -> bool:
    """Whether a shard-set path carries the catalog's retire marker.

    Checks the in-prefix ``_retired`` marker first, then — for paths
    in the catalog's ``gen-NNNNNNNN`` layout — the out-of-prefix drop
    tombstone ``_catalog/retired-NNNNNNNN``.  The tombstone exists to
    close drop_generation's crash window: a bulk prefix delete can
    erase the in-prefix marker along with the data, and a crash before
    the re-assert would otherwise re-open the reclaimed generation to
    producer appends (ADVICE r13)."""
    store = _store(store)
    if store.exists(os.path.join(path, RETIRED_MARKER)):
        return True
    m = _GEN_RE.match(os.path.basename(path.rstrip("/")))
    if not m:
        return False
    root = os.path.dirname(path.rstrip("/"))
    return store.exists(
        os.path.join(_catalog_dir(root), f"retired-{int(m.group(1)):08d}")
    )


def _require_rank_pair(rank, world_size, caller: str) -> None:
    # shared by the single-set and mixture catalog readers so the
    # refusal semantics cannot drift between them
    if (rank is None) != (world_size is None):
        raise ValueError(
            f"{caller}: pass rank and world_size together (or neither)"
        )


def _require_committed_pin(
    root: str, gen, store: MarkerStore, caller: str
) -> int:
    gen = int(gen)
    if gen not in _committed(root, store):
        raise ValueError(
            f"{caller}: pin {gen} is not a committed generation of "
            f"{root!r} — a checkpoint from a different catalog (or a "
            f"never-published attempt) does not resume here"
        )
    return gen


def publish_generation(
    spark,
    root: str,
    gen: int,
    vocab_ids: DataFrame | None = None,
    content_fp: dict | None = None,
    store: MarkerStore | None = None,
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

    store = _store(store)
    gen = int(gen)
    path = generation_path(root, gen)
    if is_retired(path, store):
        raise ValueError(
            f"publish_generation: gen {gen} at {path!r} is RETIRED — "
            f"republishing a retired generation would resurrect data "
            f"the catalog already moved past; promote a fresh one"
        )
    marker = os.path.join(_catalog_dir(root), f"commit-{gen:08d}.json")
    if store.exists(marker):
        raise ValueError(
            f"publish_generation: gen {gen} is already published "
            f"({marker!r}) — commit markers are write-once"
        )
    _, contract = _read_shard_contract(spark, path, "publish_generation")
    if vocab_ids is not None:
        _check_vocab(contract, vocab_ids, path, "publish_generation")
    totals = (
        spark.read.parquet(os.path.join(path, "_manifest"))
        .groupBy()
        .agg({"n_windows": "sum", "n_tokens": "sum", "shard": "count"})
        .first()
    )
    if content_fp is not None:
        # The caller-supplied fingerprint goes into a WRITE-ONCE marker
        # that makes the generation content-addressable forever — a
        # stale or foreign fp would make the audit trail permanently
        # lie.  The fp hashes themselves are trusted (recomputing them
        # would erase the reuse saving), but the dict carries the set's
        # window/token totals, and those must agree with the sidecar
        # totals — the cheap, manifest-sized tripwire that catches a
        # fingerprint minted over a different (or since-grown) set,
        # checked BEFORE the full verify scan is paid.
        missing = [
            k for k in ("fp_a", "fp_b", "n_windows", "n_tokens")
            if k not in content_fp
        ]
        if missing:
            raise ValueError(
                f"publish_generation: content_fp is missing "
                f"{missing} — pass the full dict "
                f"shard_set_content_fp returns (fp_a, fp_b, "
                f"n_windows, n_tokens), or omit content_fp to have "
                f"publish recompute it"
            )
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
    bad = verify_token_shards(spark, path).filter("NOT ok").count()
    if bad:
        raise ValueError(
            f"publish_generation: gen {gen} at {path!r} has {bad} "
            f"shard(s) failing verification — a generation publishes "
            f"only after every shard matches its sidecar promise"
        )
    if content_fp is None:
        content_fp = shard_set_content_fp(spark, path)
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
    # ONE atomic-exclusive put — the commit point of the whole swap
    # (conditional-PUT shape; the POSIX backend hardlinks from temp)
    if not store.put_if_absent(
        marker, json.dumps(doc, sort_keys=True) + "\n"
    ):
        raise ValueError(
            f"publish_generation: gen {gen} was published concurrently "
            f"({marker!r}) — commit markers are write-once"
        )
    return doc


def current_generation(
    root: str, store: MarkerStore | None = None
) -> tuple[int, str]:
    """The newest COMMITTED generation: (gen, path).  Resolving this
    is the reader's pin — hold the returned path for the whole
    epoch (the data outlives retirement until
    :func:`drop_generation`), exactly how ``shard_snapshot`` pins a
    key set within one generation."""
    gens = _committed(root, store)
    if not gens:
        raise ValueError(
            f"current_generation: {root!r} has no committed "
            f"generation — publish one first"
        )
    gen = gens[-1]
    return gen, generation_path(root, gen)


def read_current_shards(
    spark,
    root: str,
    vocab_ids: DataFrame | None = None,
    store: MarkerStore | None = None,
    gen: int | None = None,
    rank: int | None = None,
    world_size: int | None = None,
    snapshot=None,
    cursor: int = 0,
    pos_col: str | None = None,
) -> tuple[DataFrame, dict, int]:
    """Resolve the current generation and read it as a token-shard
    set: (windows, contract, generation) — the single-set analogue of
    :func:`read_mixture_current`, with the same pinning discipline:

    * ``gen``: pass a checkpoint's generation to resume instead of
      resolving current — the pin must name a COMMITTED generation
      (foreign/never-published refuses; swept data fails the sidecar
      read, loudly).  The launcher resolves ONCE and hands the same
      gen to every rank, so all ranks read an identical universe
      even while a promotion lands mid-epoch.
    * ``rank``/``world_size``: read one rank's LPT slice
      (``read_rank_shards`` over the pinned generation);
      ``snapshot``/``cursor``/``pos_col`` pass through with their
      caveats (cursor is only valid under the same
      (gen, world_size, snapshot) tuple — checkpoint them together).
    """
    from streaming_parquet_spark.operators.pipeline import (
        read_rank_shards,
        read_token_shards,
    )

    store = _store(store)
    _require_rank_pair(rank, world_size, "read_current_shards")
    if rank is None and (
        snapshot is not None or int(cursor) != 0 or pos_col is not None
    ):
        raise ValueError(
            "read_current_shards: snapshot/cursor/pos_col are "
            "rank-read parameters — pass rank and world_size"
        )
    if gen is None:
        gen, path = current_generation(root, store)
    else:
        gen = _require_committed_pin(
            root, gen, store, "read_current_shards"
        )
        path = generation_path(root, gen)
    if rank is not None:
        windows, contract = read_rank_shards(
            spark, path, rank, world_size, vocab_ids=vocab_ids,
            snapshot=snapshot, cursor=cursor, pos_col=pos_col,
        )
    else:
        windows, contract = read_token_shards(
            spark, path, vocab_ids=vocab_ids
        )
    return windows, contract, gen


def retire_generation(
    root: str, gen: int, store: MarkerStore | None = None
) -> str:
    """Mark generation ``gen`` retired: producers refuse to append to
    it from now on (``append_token_shards`` / ``shard_ingest_stream``
    probe the marker), while its DATA stays readable until
    :func:`drop_generation` — the grace window for readers that
    pinned it.  Refuses retiring the CURRENT generation (that would
    leave the catalog pointing at a set no producer may extend and no
    successor replaces — promote first) and an unpublished one
    (nothing ever pointed at it; just delete the directory).
    Idempotent: retiring twice is a no-op."""
    store = _store(store)
    gen = int(gen)
    path = generation_path(root, gen)
    committed = _committed(root, store)
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
    # put-if-absent and ignore a loss: two racing retirers of the
    # same generation are both right, and the marker's content is
    # identical either way — retire stays idempotent
    store.put_if_absent(
        marker, json.dumps({"retired_generation": gen}) + "\n"
    )
    return marker


def drop_generation(
    root: str, gen: int, store: MarkerStore | None = None,
    delete_prefix=None,
) -> None:
    """Delete a RETIRED generation's data (the reclaim step after the
    read-grace window).  Refuses the current generation and any
    generation not yet retired — drop is the only destructive verb
    here and it demands both guards already stood.  The ``_retired``
    marker itself survives, so a lost producer replaying into the
    emptied path still refuses, and the write-once commit marker
    keeps the generation number from ever being reused.

    The GUARDS run through the marker store; the deletion itself is
    data-plane.  ``delete_prefix`` injects it: a callable taking the
    generation path that reclaims everything under it — the seam for
    an object store's bulk delete (delete-by-prefix / lifecycle
    tooling).  The retire marker is RE-ASSERTED through the store
    after the hook runs: when markers and data share one prefix (an
    ObjectMarkerStore over the same bucket the shards live in), a
    bulk prefix delete would otherwise remove ``_retired`` and
    re-open the reclaimed generation to producer replays — the
    put-if-absent re-assert is idempotent and a no-op when the
    marker survived.  The POSIX default deletes the directory's
    children EXCEPT the in-tree ``_retired`` marker.  Idempotent:
    dropping an already-emptied generation is a no-op."""
    import shutil

    store = _store(store)
    gen = int(gen)
    path = generation_path(root, gen)
    committed = _committed(root, store)
    if committed and gen == committed[-1]:
        raise ValueError(
            f"drop_generation: gen {gen} IS the current generation"
        )
    if not is_retired(path, store):
        raise ValueError(
            f"drop_generation: gen {gen} is not retired — retire it "
            f"first (readers may still be pinned to it)"
        )
    if delete_prefix is not None:
        # Tombstone FIRST, to a key the bulk delete cannot reach: if
        # the process dies between the prefix delete and the in-prefix
        # re-assert below, the generation would otherwise lose both its
        # data and its retire marker, re-opening the reclaimed number
        # to producer appends/replays (ADVICE r13).  is_retired checks
        # this catalog-plane tombstone too, so the refusal stands
        # through the whole window; put-if-absent keeps it idempotent.
        store.put_if_absent(
            os.path.join(_catalog_dir(root), f"retired-{gen:08d}"),
            json.dumps({"retired_generation": gen}) + "\n",
        )
        delete_prefix(path)
        # the hook may have bulk-deleted the in-prefix retire marker
        # along with the data (see docstring) — restore the dropped
        # generation's append-refusal before returning
        store.put_if_absent(
            os.path.join(path, RETIRED_MARKER),
            json.dumps({"retired_generation": gen}) + "\n",
        )
        return
    if not os.path.isdir(path):
        return
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
    store: MarkerStore | None = None,
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
    old_gen, old_path = current_generation(root, store)
    new_gen, new_path = next_generation(root, store)
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
        spark, root, new_gen, vocab_ids=vocab_ids, content_fp=dst_fp,
        store=store,
    )
    retire_generation(root, old_gen, store)
    return new_gen, manifest


def read_mixture_current(
    spark,
    roots: dict,
    weights: dict,
    vocab_ids: DataFrame | None = None,
    snapshots: dict | None = None,
    cursor: int | None = None,
    epoch: int | None = None,
    pins: dict | None = None,
    rank: int | None = None,
    world_size: int | None = None,
    store: MarkerStore | None = None,
    name_col: str = "mix_source",
    key_col: str = "mix_key",
    pos_col: str = "mix_pos",
) -> tuple[DataFrame, dict, dict]:
    """The catalog-aware mixture read: resolve each set's CURRENT
    committed generation ONCE, hand the resolved paths to
    ``read_mixture_shards``, and return the pins alongside —
    (windows, contract, pins) with ``pins`` mapping set name ->
    generation number.  This closes the last manual pinning step in
    the factory: a trainer mixing N catalogued sets checkpoints
    ``pins`` together with its cursor/epoch/weights, and every
    resume re-reads the EXACT generations the epoch started on —
    a promotion landing mid-epoch swaps what NEW readers resolve,
    never what a pinned reader resumes over (the promoted-away
    data survives until :func:`sweep_generations` /
    :func:`drop_generation`, the read-grace window).

    ``pins``: pass a checkpoint's pins to resume instead of
    resolving current — each pin must name a COMMITTED generation of
    its root (a foreign or never-published pin refuses loudly; a pin
    whose data was already swept fails the sidecar read, also
    loudly).  All other parameters (``weights``, ``snapshots``,
    ``cursor``, ``epoch``) pass through to ``read_mixture_shards``
    unchanged, with the same caveat: a cursor is only valid under
    the SAME (pins, weights, snapshots, epoch) tuple it was minted
    with — checkpoint them as one unit.

    Multi-node: pass ``rank``/``world_size`` to read one rank's
    slice (``read_mixture_rank`` over the pinned generations — the
    launcher resolves pins ONCE and hands the same dict to every
    rank, so all ranks slice an identical universe; the rank-local
    cursor caveat from there applies).

    Resolution is marker-sized per root (one listing); everything
    data-side is the mixture read's own cost."""
    from streaming_parquet_spark.operators.pipeline import (
        read_mixture_rank,
        read_mixture_shards,
    )

    _require_rank_pair(rank, world_size, "read_mixture_current")

    store = _store(store)
    names = sorted(roots)
    if not names:
        raise ValueError("read_mixture_current: no roots given")
    if pins is None:
        pins = {n: current_generation(roots[n], store)[0] for n in names}
    else:
        if sorted(pins) != names:
            raise ValueError(
                f"read_mixture_current: pins and roots must carry the "
                f"same names (roots {names}, pins {sorted(pins)})"
            )
        for n in names:
            _require_committed_pin(
                roots[n], pins[n], store,
                f"read_mixture_current (set {n!r})",
            )
    pins = {n: int(pins[n]) for n in names}
    sets = {n: generation_path(roots[n], pins[n]) for n in names}
    if rank is not None:
        windows, contract = read_mixture_rank(
            spark, sets, weights, rank, world_size,
            vocab_ids=vocab_ids, snapshots=snapshots, cursor=cursor,
            epoch=epoch, name_col=name_col, key_col=key_col,
            pos_col=pos_col,
        )
    else:
        windows, contract = read_mixture_shards(
            spark, sets, weights, vocab_ids=vocab_ids,
            snapshots=snapshots, cursor=cursor, epoch=epoch,
            name_col=name_col, key_col=key_col, pos_col=pos_col,
        )
    return windows, contract, pins


def list_retired(
    root: str, store: MarkerStore | None = None
) -> list[int]:
    """Committed generations carrying a retire marker, ascending —
    the reclaim candidates a retention policy sweeps.  Marker-sized:
    one catalog listing plus one exists-probe per committed
    generation (a handful), never a data scan.  Includes generations
    whose data was already dropped (the marker outlives the drop by
    design); :func:`sweep_generations` re-dropping one is a no-op."""
    store = _store(store)
    return [
        g
        for g in _committed(root, store)
        if is_retired(generation_path(root, g), store)
    ]


def sweep_generations(
    root: str,
    keep_last_n: int = 1,
    dry_run: bool = False,
    store: MarkerStore | None = None,
    delete_prefix=None,
) -> dict:
    """Codified retention over retired generations: drop (via the
    double-guarded :func:`drop_generation`) every RETIRED generation
    older than the newest ``keep_last_n`` committed ones.  A
    months-long factory calls this after each promotion instead of
    hand-tracking which old generation is past its read-grace window
    — ``keep_last_n`` IS the grace policy, expressed in promotions:
    a reader that pinned a generation within the last N swaps still
    finds its data.

    Never touches: the CURRENT generation (it is never retired —
    :func:`retire_generation` refuses it — and drop refuses it
    independently); the newest ``keep_last_n`` committed generations
    even when retired (the grace window); and any NEVER-RETIRED
    generation regardless of age (no marker warned producers off and
    readers never got a retirement signal — sweep reports it under
    ``skipped_unretired`` instead of silently escalating to a
    destructive retire-and-drop the caller didn't ask for).

    ``keep_last_n`` must be >= 1: a sweep that protects nothing is a
    typo, not a policy.  ``dry_run=True`` reports the same decision
    without deleting.  ``delete_prefix`` rides through to
    :func:`drop_generation` — the data-plane reclaim hook, so
    retention is ONE call on every backend (object stores pass their
    bulk delete; POSIX keeps the default carve-out).  Returns
    ``{"dropped": [...], "kept_grace": [...], "skipped_unretired":
    [...]}`` (each ascending; already-emptied retired generations
    re-report as dropped — the underlying drop is a no-op)."""
    store = _store(store)
    if int(keep_last_n) < 1:
        raise ValueError(
            f"sweep_generations: keep_last_n must be >= 1 (got "
            f"{keep_last_n}) — the current generation and the grace "
            f"window are never sweepable"
        )
    committed = _committed(root, store)
    if not committed:
        raise ValueError(
            f"sweep_generations: {root!r} has no committed generation "
            f"— nothing to retain a policy over"
        )
    protected = set(committed[-int(keep_last_n):])
    dropped, kept_grace, skipped_unretired = [], [], []
    for g in committed:
        retired = is_retired(generation_path(root, g), store)
        if g in protected:
            if retired:
                kept_grace.append(g)
            continue
        if not retired:
            skipped_unretired.append(g)
            continue
        if not dry_run:
            drop_generation(root, g, store, delete_prefix=delete_prefix)
        dropped.append(g)
    return {
        "dropped": dropped,
        "kept_grace": kept_grace,
        "skipped_unretired": skipped_unretired,
    }


def audit_generation(
    spark, root: str, gen: int, store: MarkerStore | None = None
) -> dict:
    """Re-check a committed generation's DATA against its write-once
    commit marker — the audit the content-addressable design exists
    for: the marker recorded the identity-free content fingerprint
    and the contract at publish time, so years later (or after a
    storage migration, a restore from backup, a suspected bit-flip)
    one scan proves the generation still carries exactly the content
    it committed.

    Returns ``{"generation", "retired", "dropped", "ok", ...}``:

    * ``ok=True`` — every recorded field (window/token totals, the
      content fingerprint when the marker carries one, format/
      budget/vocab contract) matches a FRESH scan; ``fp_checked``
      says whether the fingerprint was actually ATTESTED (False on
      markers predating the fp field — totals+contract fallback —
      and on the grown path below, where the comparison ran but
      proved nothing).
    * ``ok=False`` — ``mismatches`` maps each disagreeing field to
      (recorded, actual): content loss, same-size corruption, or
      contract drift.  A committed-but-unretired generation whose
      data is unreadable also reports False (``problem`` explains) —
      readers may be pinned to data that no longer exists.
    * ``ok=None, grown=True`` — the generation grew past its
      publish-time floor: producers may append until the retire
      marker lands, the marker froze the set AS OF publish, and the
      XOR fingerprint is not subset-checkable (nor can the marker
      date the growth, so this applies to retired generations too).
      The grown set's integrity tool is ``verify_token_shards``
      (per-shard digests); a promotion pins a fresh fingerprint.
    * ``ok=None, dropped=True`` — a retired generation whose data was
      reclaimed; nothing to audit, by design.

    Cost: one manifest collect + one content-fp scan per audited
    generation — the same scan price publish paid, on demand."""
    store = _store(store)
    gen = int(gen)
    marker = os.path.join(_catalog_dir(root), f"commit-{gen:08d}.json")
    if not store.exists(marker):
        raise ValueError(
            f"audit_generation: gen {gen} of {root!r} was never "
            f"published — only committed generations carry a marker "
            f"to audit against"
        )
    doc = json.loads(store.read(marker))
    path = generation_path(root, gen)
    if doc.get("plane") == "payload":
        # payload generations audit against their own marker fields
        # (blob/ref/byte totals + the sharding-invariant fp) — the
        # dispatch keeps audit_catalog working on payload roots
        # unchanged
        return _audit_payload_generation(spark, root, gen, doc, store)
    out: dict = {
        "generation": gen,
        "retired": is_retired(path, store),
        "dropped": False,
    }
    from streaming_parquet_spark.operators.pipeline import (
        _sidecar_snapshot,
        shard_set_content_fp,
    )

    from pyspark.errors import AnalysisException

    try:
        # ONE manifest collect carries shard count + contract
        _sidecar, srows, contract = _sidecar_snapshot(
            spark, path, "audit_generation"
        )
    except (ValueError, AnalysisException) as exc:
        # Distinguish RECLAIMED data (generation dir / sidecar gone —
        # the retention sweep's legal end state) from a PRESENT but
        # unreadable sidecar (truncated write, empty directory, mixed
        # contract rows, a foreign format version — _sidecar_snapshot
        # raises ValueError for all of them). Only absence is a benign
        # drop; a readable directory with a broken sidecar is an
        # integrity incident even on a retired generation —
        # retirement starts a read-grace window in which pinned
        # readers still resolve this data, so "retired" cannot
        # launder corruption into ok=None (ADVICE r12). Absence is
        # classified from _manifest_frame's TYPED error taxonomy
        # (ManifestAbsent = PATH_NOT_FOUND; everything else —
        # present-but-empty, mixed contracts, foreign format — is an
        # incident), which keeps this function free of direct
        # filesystem probes — the marker-plane portability gate
        # covers the audit verbs too.
        from streaming_parquet_spark.operators.pipeline import (
            ManifestAbsent,
        )

        absent = isinstance(exc, ManifestAbsent)
        if out["retired"] and absent:
            out.update({"dropped": True, "ok": None})
            return out
        if absent:
            problem = (
                f"data unreadable for a committed, UNRETIRED "
                f"generation ({exc}) — pinned readers may still "
                f"resolve it"
            )
        else:
            problem = (
                f"manifest sidecar present but unreadable ({exc}) — "
                f"corruption or a truncated write, not a retention "
                f"drop"
            )
        out.update({"ok": False, "problem": problem})
        return out
    try:
        fp = shard_set_content_fp(spark, path, contract=contract)
    except AnalysisException as exc:
        # sidecar readable but the data scan is not (e.g. every data
        # file of a shard gone) — an incident whether retired or not:
        # the sidecar promises content the storage no longer serves
        out.update({
            "ok": False,
            "problem": f"content scan failed ({exc})",
        })
        return out
    actual = {
        "n_shards": len(srows),
        "n_windows": fp["n_windows"],
        "n_tokens": fp["n_tokens"],
        "content_fp_a": fp["fp_a"],
        "content_fp_b": fp["fp_b"],
        "format": contract["format"],
        "budget": contract["budget"],
        "vocab_size": contract["vocab_size"],
        "vocab_fp_a": contract["vocab_fp_a"],
        "vocab_fp_b": contract["vocab_fp_b"],
    }
    mismatches = {
        k: [doc[k], v]
        for k, v in actual.items()
        if k in doc and doc[k] != v
    }
    out["fp_checked"] = "content_fp_a" in doc
    # The marker froze the set AS OF publish, and appending to a
    # published generation is legal until its retire marker lands —
    # so totals at-or-above the recorded floor mean GROWTH, not
    # corruption, and the frozen fp is inconclusive by construction
    # (XOR fps are not subset-checkable).  This holds for RETIRED
    # generations too: the normal factory history is publish early,
    # append waves, promote+retire later, and the marker cannot
    # date-stamp when the growth happened — the per-shard sidecar
    # digests (verify_token_shards) are the integrity tool for
    # anything beyond the published floor.
    total_keys = [
        k for k in ("n_shards", "n_windows", "n_tokens") if k in doc
    ]
    grown = total_keys and all(
        int(actual[k]) >= int(doc[k]) for k in total_keys
    ) and any(int(actual[k]) > int(doc[k]) for k in total_keys)
    contract_drift = any(
        k in mismatches
        for k in ("format", "budget", "vocab_size", "vocab_fp_a",
                  "vocab_fp_b")
    )
    if not mismatches:
        out["ok"] = True
    elif grown and not contract_drift:
        out.update({
            "ok": None,
            "grown": True,
            # the fp comparison RAN but attested nothing (the frozen
            # fp is inconclusive over a grown set) — report it
            # un-checked so monitoring never records this generation
            # as fingerprint-verified
            "fp_checked": False,
            "recorded_totals": {k: doc[k] for k in total_keys},
            "actual_totals": {k: actual[k] for k in total_keys},
            "note": (
                "generation grew past its publish-time floor (legal "
                "until retirement; the marker cannot date the "
                "growth) — the frozen marker cannot attest the grown "
                "content; verify_token_shards checks the set "
                "per-shard, and a promotion pins a fresh fingerprint"
            ),
        })
    else:
        out["ok"] = False
        out["mismatches"] = mismatches
    return out


def _audit_payload_generation(
    spark, root: str, gen: int, doc: dict, store: MarkerStore
) -> dict:
    """:func:`audit_generation`'s payload-plane half (dispatched on
    the marker's ``plane`` stamp): re-digest the store's DATA and
    compare against the write-once marker's blob/ref/byte totals and
    sharding-invariant content fingerprint — the same
    ok=True / ok=False(+mismatches) / ok=None(grown|dropped)
    classification as the token plane, because the same protocol
    facts hold: appending to the CURRENT generation is legal until
    retirement (r15 review: post-publish waves falsify the frozen
    totals/fp, and without this verb every audit would misreport
    legitimate growth as tamper), the XOR fp is not subset-checkable
    over a grown set, and a reclaimed retired generation has nothing
    to attest.  One improvement over the token audit: the data scan
    IS ``verify_payload_store`` (per-(shard, wave) digests against
    the append-only sidecar), so content loss is detected ok=False
    even in a generation that legally grew — growth only relaxes the
    MARKER comparison, never the storage check.  Cost: one data
    re-digest scan — the price publish paid, on demand."""
    from pyspark.errors import AnalysisException

    from streaming_parquet_spark.operators.multimodal import (
        _payload_contract,
        payload_set_content_fp,
        verify_payload_store,
    )
    from streaming_parquet_spark.operators.pipeline import ManifestAbsent

    path = generation_path(root, gen)
    out: dict = {
        "generation": gen,
        "plane": "payload",
        "retired": is_retired(path, store),
        "dropped": False,
    }
    try:
        manifest, contract = _payload_contract(
            spark, path, "audit_payload_generation"
        )
    except (ValueError, AnalysisException) as exc:
        # same taxonomy as the token audit: only ABSENCE of a retired
        # generation's sidecar is a benign drop; present-but-broken is
        # an incident regardless of retirement (pinned readers still
        # resolve retired data through the grace window)
        absent = isinstance(exc, ManifestAbsent)
        if out["retired"] and absent:
            out.update({"dropped": True, "ok": None})
            return out
        out.update({
            "ok": False,
            "problem": (
                f"data unreadable for a committed, UNRETIRED "
                f"generation ({exc}) — pinned readers may still "
                f"resolve it"
                if absent
                else f"manifest sidecar present but unreadable "
                     f"({exc}) — corruption or a truncated write, "
                     f"not a retention drop"
            ),
        })
        return out
    rc, pc = contract["ref_col"], contract["payload_col"]
    n = int(contract["n_shards"])
    try:
        # ONE data re-digest scan, against the per-(shard, wave)
        # sidecar promise — NOT a bare store fold: a totals-only check
        # would classify "grew by 4 blobs, lost 3" as benign growth
        # (actual >= floor), silently masking storage loss in any
        # generation that legally grew (r15 review pass 2).  The
        # append-only sidecar pins every wave's digests, so verify
        # detects loss/corruption even past the publish floor.
        bad = [
            int(r["shard"])
            for r in verify_payload_store(spark, path).collect()
            if not r["ok"]
        ]
    except (ValueError, AnalysisException) as exc:
        out.update({
            "ok": False,
            "problem": f"content scan failed ({exc})",
        })
        return out
    if bad:
        out.update({
            "ok": False,
            "problem": (
                f"shard(s) {sorted(bad)[:5]} fail verification "
                f"against the sidecar (verify_payload_store) — "
                f"content loss or corruption, growth notwithstanding"
            ),
        })
        return out
    # data == sidecar exactly (verify is a full-outer per-shard digest
    # compare incl. stray shards), so the marker comparison can fold
    # the SIDECAR — manifest-sized, no second data scan
    fp = payload_set_content_fp(manifest)
    actual = {
        "format": contract["format"],
        "n_shards": n,
        "ref_col": rc,
        "payload_col": pc,
        "n_payloads": fp["n_payloads"],
        "n_refs": fp["n_refs"],
        "n_bytes": fp["n_bytes"],
        "content_fp_a": fp["fp_a"],
        "content_fp_b": fp["fp_b"],
    }
    mismatches = {
        k: [doc[k], v]
        for k, v in actual.items()
        if k in doc and doc[k] != v
    }
    out["fp_checked"] = "content_fp_a" in doc
    total_keys = [
        k for k in ("n_payloads", "n_refs", "n_bytes") if k in doc
    ]
    grown = total_keys and all(
        int(actual[k]) >= int(doc[k]) for k in total_keys
    ) and any(int(actual[k]) > int(doc[k]) for k in total_keys)
    # the contract (incl. n_shards — blobs land by the pinned shard
    # key) can never legally change after publish; drift is always
    # an incident, growth or not
    contract_drift = any(
        k in mismatches
        for k in ("format", "n_shards", "ref_col", "payload_col")
    )
    if not mismatches:
        out["ok"] = True
    elif grown and not contract_drift:
        out.update({
            "ok": None,
            "grown": True,
            "fp_checked": False,
            "recorded_totals": {k: doc[k] for k in total_keys},
            "actual_totals": {k: actual[k] for k in total_keys},
            "note": (
                "generation grew past its publish-time floor (legal "
                "until retirement; the marker cannot date the "
                "growth) — the frozen marker cannot attest the grown "
                "content; verify_payload_store checks the store "
                "per-(shard, wave), and a promotion pins a fresh "
                "fingerprint"
            ),
        })
    else:
        out["ok"] = False
        out["mismatches"] = mismatches
    return out


def audit_catalog(
    spark, root: str, store: MarkerStore | None = None
) -> list[dict]:
    """:func:`audit_generation` over every committed generation of
    ``root``, oldest first — the periodic integrity sweep a
    months-long factory schedules beside :func:`sweep_generations`.
    Works on token AND payload roots (the per-generation audit
    dispatches on the marker's plane stamp).  Dropped and
    legally-grown generations report ``ok=None`` (see
    audit_generation — nothing the frozen marker can attest); any
    ``ok=False`` row is a storage-integrity incident, not a protocol
    race — the markers are write-once and the data was verified at
    publish."""
    store = _store(store)
    return [
        audit_generation(spark, root, g, store)
        for g in _committed(root, store)
    ]


# --- Payload-plane generations (VERDICT r14 item 1) -------------------
#
# The binary payload store (operators.multimodal) gets the SAME
# generation discipline the token plane has — the marker plane above is
# storage-agnostic and plane-agnostic by construction (allocation,
# commit, retire, tombstoned drop, sweep all operate on markers and
# paths, never on row schemas), so the payload verbs below only supply
# the plane-specific halves: what "verified" means (verify_payload_store
# all-ok) and what "same content" means (payload_set_content_fp, the
# sharding-invariant XOR fold).  Everything else — next_generation,
# current_generation, retire_generation, drop_generation,
# sweep_generations, list_retired — is shared verbatim, which is the
# point: one swap protocol, two data planes, zero drifting copies.
#
# Cross-plane misuse refuses at the contract layer: a payload verb
# pointed at a token generation hits the sidecar's format pin
# (payload-store-v2 vs token-shards-v*) and refuses by name, and
# current_payload_store additionally checks the commit marker's
# ``plane`` stamp so a reader cannot even RESOLVE a token generation as
# a payload store.


def publish_payload_generation(
    spark, root: str, gen: int, store: MarkerStore | None = None
) -> dict:
    """Make payload generation ``gen`` the catalog's newest COMMITTED
    store: verify every shard's blobs against the ``_manifest``
    sidecar (``verify_payload_store`` — the absence/corruption/tamper
    trichotomy runs BEFORE any reader can resolve the store), then
    atomically create the single-file commit marker.  Returns the
    marker's contents.

    Same refusals as the token plane's :func:`publish_generation`:
    a retired generation (republish would resurrect data producers
    already moved past), an already-published one (markers are
    write-once — racing publishers lose loudly), a failing or absent
    store.  The marker records the store's sharding-invariant CONTENT
    fingerprint (``payload_set_content_fp`` — XOR over every blob's
    digest, so an auditor can re-fingerprint the data against the
    marker years later, and :func:`promote_payload_compaction` can
    prove content preservation across a re-shard).

    Bootstrap flow for the FIRST generation: ``gen, path =
    next_generation(root)``; ``write_payload_store(blobs, path,
    n_shards=...)``; ``publish_payload_generation(spark, root, gen)``.
    Cost: one data scan (the verify) + manifest-sized folds — the same
    once-per-publish price the token plane pays."""
    from streaming_parquet_spark.operators.multimodal import (
        _payload_contract,
        payload_set_content_fp,
        verify_payload_store,
    )

    store = _store(store)
    gen = int(gen)
    path = generation_path(root, gen)
    if is_retired(path, store):
        raise ValueError(
            f"publish_payload_generation: gen {gen} at {path!r} is "
            f"RETIRED — republishing a retired generation would "
            f"resurrect data the catalog already moved past; promote "
            f"a fresh one"
        )
    marker = os.path.join(_catalog_dir(root), f"commit-{gen:08d}.json")
    if store.exists(marker):
        raise ValueError(
            f"publish_payload_generation: gen {gen} is already "
            f"published ({marker!r}) — commit markers are write-once"
        )
    manifest, contract = _payload_contract(
        spark, path, "publish_payload_generation"
    )
    bad = verify_payload_store(spark, path).filter("NOT ok").count()
    if bad:
        raise ValueError(
            f"publish_payload_generation: gen {gen} at {path!r} has "
            f"{bad} shard(s) failing verification — a generation "
            f"publishes only after every blob matches its sidecar "
            f"promise"
        )
    fp = payload_set_content_fp(manifest)
    doc = {
        "generation": gen,
        "plane": "payload",
        "format": contract["format"],
        "n_shards": int(contract["n_shards"]),
        "ref_col": contract["ref_col"],
        "payload_col": contract["payload_col"],
        "n_payloads": fp["n_payloads"],
        "n_refs": fp["n_refs"],
        "n_bytes": fp["n_bytes"],
        "content_fp_a": fp["fp_a"],
        "content_fp_b": fp["fp_b"],
    }
    # ONE atomic-exclusive put — the commit point of the whole swap
    if not store.put_if_absent(
        marker, json.dumps(doc, sort_keys=True) + "\n"
    ):
        raise ValueError(
            f"publish_payload_generation: gen {gen} was published "
            f"concurrently ({marker!r}) — commit markers are "
            f"write-once"
        )
    return doc


def current_payload_store(
    spark,
    root: str,
    store: MarkerStore | None = None,
    gen: int | None = None,
) -> tuple[int, str, dict]:
    """Resolve the newest COMMITTED payload generation: (gen, path,
    contract) — the resolver's pin.  Hand ``path`` to
    ``resolve_payload_refs`` / ``read_payload_store`` and HOLD it for
    the whole read (the data outlives retirement until
    :func:`drop_generation` — the same grace discipline as the token
    plane), and stamp it into reader state via
    ``payload_store_identity`` so a resume refuses a since-swapped
    store.  ``gen``: pass a checkpoint's pin to resume instead of
    resolving current (must name a committed generation).

    Refuses a generation whose commit marker is not ``plane:
    "payload"`` — a token generation must never resolve as a blob
    store — and cross-checks the marker's pinned contract against the
    sidecar's (they were written by the same publish; disagreement
    means out-of-protocol surgery).  Marker-sized + one manifest read;
    never a data scan."""
    from streaming_parquet_spark.operators.multimodal import (
        _payload_contract,
    )

    store = _store(store)
    if gen is None:
        gen, path = current_generation(root, store)
    else:
        gen = _require_committed_pin(
            root, gen, store, "current_payload_store"
        )
        path = generation_path(root, gen)
    marker = os.path.join(_catalog_dir(root), f"commit-{gen:08d}.json")
    doc = json.loads(store.read(marker))
    if doc.get("plane") != "payload":
        raise ValueError(
            f"current_payload_store: gen {gen} of {root!r} is not a "
            f"payload generation (marker carries "
            f"format={doc.get('format')!r}) — this root belongs to "
            f"the token plane; payload stores live under their own "
            f"catalog root"
        )
    contract = _payload_contract(spark, path, "current_payload_store")[1]
    if (
        contract["format"] != doc["format"]
        or int(contract["n_shards"]) != int(doc["n_shards"])
        or contract["ref_col"] != doc["ref_col"]
        or contract["payload_col"] != doc["payload_col"]
    ):
        raise ValueError(
            f"current_payload_store: gen {gen}'s sidecar contract "
            f"disagrees with its write-once commit marker — the store "
            f"was modified outside the protocol (marker {doc}, "
            f"sidecar {contract})"
        )
    return gen, path, contract


def promote_payload_compaction(
    spark,
    root: str,
    windows: DataFrame,
    spans_col: str = "spans",
    n_shards: int | None = None,
    store: MarkerStore | None = None,
) -> tuple[int, DataFrame]:
    """The payload plane's full swap, in the only safe order: compact
    the CURRENT generation's REFERENCED blobs into the next one
    (``compact_payload_store`` — orphans swept, kept blobs
    byte-identical), PROVE the preservation, then verify + publish the
    successor and retire the source.  Returns (new_generation, written
    manifest).

    The proof: the kept subset's content fingerprint is pinned from a
    src scan BEFORE the compaction (``_kept_payloads`` is the same
    definition of "kept" the compaction writes, so the two sides can
    never disagree about which blobs count), and the successor's
    sidecar fold must equal it — ``payload_set_content_fp`` is
    invariant under the re-sharding a new ``n_shards`` performs, so
    inequality means blobs were lost, duplicated, or altered (or an
    append landed between the pin and the compaction's own scan — the
    same conservative refusal stance as the token plane's grown-source
    recheck).  The proof runs BEFORE the publish: a content-corrupting
    compaction leaves an unpublished (invisible) directory and the
    source untouched, never a committed wrong store.  The publish then
    re-proves the DATA against that sidecar (``verify_payload_store``
    inside :func:`publish_payload_generation`), closing the chain:
    src kept content == dst sidecar == dst data.

    A resolver racing this sees exactly one complete store at every
    instant: before the marker lands, :func:`current_payload_store`
    resolves the old generation (untouched — compaction never writes
    into its source); after, the new one.  A producer racing this
    cannot LOSE a wave into the swap (the r14 gap: manual
    compact-verify-drop had no fence at all; r15 review pass 2: the
    proof alone left the publish-to-retire window open).  Three
    fences, in order:

    * a wave landing during the compaction flips the preservation
      proof (kept-subset fps disagree) — clean refusal, source stays
      current, wave safe;
    * a wave landing between the proof and the publish trips the
      PRE-PUBLISH wave-set recheck (sidecar-sized) — same clean
      refusal, the successor stays unpublished;
    * a wave landing between the publish and the retirement is
      RESCUED after the retire marker lands: the source's sidecar is
      re-read, waves not in the pinned set are appended into the
      successor from the retired source's own data
      (content-addressed, idempotent), so the wave survives the
      eventual drop.  An append still IN FLIGHT when retirement lands
      fails loudly on its own replay (the retire probe) — never
      silent.  For a zero-rescue guarantee, quiesce producers first.

    A crash mid-promotion leaves either a data-only next-gen
    directory (unpublished — invisible; the next promotion allocates
    a fresh number) or a published successor with the source not yet
    retired (re-run :func:`retire_generation` — idempotent, though
    the rescue fence then does not run: re-promote instead when
    producers were live)."""
    from streaming_parquet_spark.operators.multimodal import (
        _kept_payloads,
        _payload_contract,
        append_payload_store,
        compact_payload_store,
        payload_set_content_fp,
        payload_store_manifest,
    )

    old_gen, old_path = current_generation(root, store)
    new_gen, new_path = next_generation(root, store)

    def src_waves() -> set:
        man, _c = _payload_contract(
            spark, old_path, "promote_payload_compaction"
        )
        return {
            (int(r["shard"]), r["wave"])
            for r in man.select("shard", "wave").collect()
        }

    waves0 = src_waves()  # the wave set the proof is about to pin
    kept, contract = _kept_payloads(spark, old_path, windows, spans_col)
    rc, pc = contract["ref_col"], contract["payload_col"]
    n_dst = int(contract["n_shards"]) if n_shards is None else int(n_shards)
    # the kept set's content expectation, pinned BEFORE compaction
    try:
        src_fp = payload_set_content_fp(
            payload_store_manifest(kept, n_dst, rc, pc)
        )
    except ValueError as exc:
        if "empty manifest" not in str(exc):
            raise
        raise ValueError(
            f"promote_payload_compaction: the windows reference no "
            f"blob in gen {old_gen} at {old_path!r} — refusing to "
            f"promote an empty successor (wrong store/windows pairing, "
            f"or every blob is an orphan; retire + drop instead)"
        ) from None
    manifest = compact_payload_store(
        spark, old_path, new_path, windows, spans_col, n_shards=n_dst
    )
    dst_fp = payload_set_content_fp(manifest)
    if dst_fp != src_fp:
        raise ValueError(
            f"promote_payload_compaction: gen {new_gen} at "
            f"{new_path!r} does NOT carry gen {old_gen}'s referenced "
            f"content (src {src_fp} vs dst {dst_fp}) — refusing to "
            f"publish; the directory stays unpublished (invisible to "
            f"resolvers) and gen {old_gen} stays current.  An ingest "
            f"wave landing mid-promotion causes this too — re-run "
            f"after quiescing producers."
        )
    # pre-publish fence: a wave that landed AFTER the proof's pin
    # would be invisible to the fps above — refuse cleanly while the
    # successor is still unpublished (sidecar-sized recheck)
    if src_waves() != waves0:
        raise ValueError(
            f"promote_payload_compaction: a producer wave landed in "
            f"gen {old_gen} during the compaction — the successor at "
            f"{new_path!r} stays unpublished and gen {old_gen} stays "
            f"current; re-run (the next promotion will carry the "
            f"wave), or quiesce producers first"
        )
    publish_payload_generation(spark, root, new_gen, store=store)
    retire_generation(root, old_gen, store)
    # post-retire fence: a wave that landed between the publish and
    # the retirement passed its own retire probe legitimately but is
    # absent from the successor — rescue it from the retired source's
    # data (content-addressed append: idempotent, duplicates skip).
    # After retirement no further wave can land (producers refuse),
    # so this recheck is final.
    stranded = src_waves() - waves0
    if stranded:
        from pyspark.sql import functions as F

        rc, pc = contract["ref_col"], contract["payload_col"]
        wave_ids = sorted({w for _s, w in stranded})
        blobs = (
            spark.read.parquet(old_path)
            .where(F.col("wave").isin(wave_ids))
            .select(F.col(rc), F.col(pc))
        )
        append_payload_store(blobs, new_path, marker_store=store)
    return new_gen, manifest
