"""Self-validating reader checkpoints (VERDICT r12 item 2): every
resumable reader can mint a state bundle (with_state=True) whose
identity covers (effective shard sets, weights, world, epoch, vocab,
columns); resuming with state= must (a) be bit-identical to the raw
cursor resume when nothing changed, and (b) REFUSE loudly when ANY
identity field differs — the silent-wrong window where a foreign
cursor <= total resumed over wrong rows is closed."""

from __future__ import annotations

import pytest

from streaming_parquet_spark.operators.pipeline import (
    advance_reader_state,
    epoch_order_state,
    pack_token_windows,
    read_mixture_rank,
    read_mixture_shards,
    read_rank_shards,
    resume_epoch_order,
    shard_snapshot,
    with_epoch_order,
    write_token_shards,
)


def _vocab(spark, n=16):
    return spark.createDataFrame(
        [(i, f"p{i}") for i in range(n)], "id int, piece string"
    )


def _make_set(spark, vocab, path, lo, n_docs, key, nparts):
    docs = spark.createDataFrame(
        [(lo + i, f"{key}{i % nparts}",
          [(lo + i + j) % 9 + 2 for j in range(5)])
         for i in range(n_docs)],
        "doc_id bigint, src string, toks array<int>",
    )
    write_token_shards(
        pack_token_windows(
            docs, "toks", 16, order_col="doc_id", part_col="src"
        ),
        path, vocab, budget=16, shard_col="src",
    )


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reader_state")
    vocab = _vocab(spark)
    paths = {"web": str(tmp / "web"), "code": str(tmp / "code")}
    _make_set(spark, vocab, paths["web"], 0, 12, "w", 3)
    _make_set(spark, vocab, paths["code"], 100, 8, "c", 2)
    # a THIRD set under a different vocabulary (same shape otherwise)
    other = str(tmp / "othervocab")
    _make_set(spark, _vocab(spark, 17), other, 0, 12, "w", 3)
    keys = {n: shard_snapshot(spark, paths[n]) for n in paths}
    return vocab, paths, keys, other


@pytest.fixture(scope="module")
def pstores(spark, tmp_path_factory):
    """Two payload stores over the SAME blobs but different sharding —
    the exact swap a resume must refuse (r15: payload_store pins)."""
    from streaming_parquet_spark.operators.multimodal import (
        mint_payload_refs,
        write_payload_store,
    )

    tmp = tmp_path_factory.mktemp("pstores")
    blobs = (
        mint_payload_refs(
            spark.createDataFrame(
                [(bytes(f"img-{i}", "utf8"),) for i in range(12)],
                "payload binary",
            )
        )
        .dropDuplicates(["ref"])
        .select("ref", "payload")
    )
    a, b = str(tmp / "store_a"), str(tmp / "store_b")
    write_payload_store(blobs, a, n_shards=3)
    write_payload_store(blobs, b, n_shards=5)  # the re-shard
    return a, b


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_rank_state_roundtrip_and_refusals(spark, corpus):
    vocab, paths, keys, other = corpus
    path = paths["web"]
    df, _c, state = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        with_state=True,
    )
    total = df.count()
    assert total > 2
    cut = total // 2
    ck = advance_reader_state(state, cut)

    # unmutated: state resume == raw cursor resume, bit-identical
    via_state, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        state=ck,
    )
    via_cursor, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        cursor=cut, pos_col="pos",
    )
    cols = ["src", "win", "pos"]
    assert _rows(via_state, cols) == _rows(via_cursor, cols)
    assert len(_rows(via_state, cols)) == total - cut

    # every identity field refuses when the call differs
    refusals = [
        dict(rank=1, world_size=2, snapshot=keys["web"]),          # rank
        dict(rank=0, world_size=3, snapshot=keys["web"]),          # world
        dict(rank=0, world_size=2, snapshot=keys["web"][:-1]),     # set_fp
        dict(rank=0, world_size=2, snapshot=keys["web"],
             pos_col="elsewhere"),                                 # pos_col
    ]
    for kw in refusals:
        with pytest.raises(ValueError, match="does not resume here"):
            read_rank_shards(spark, path, kw.pop("rank"),
                             kw.pop("world_size"), vocab_ids=vocab,
                             state=ck, **kw)
    # a different SET (and vocabulary) refuses too
    with pytest.raises(ValueError, match="does not resume here"):
        read_rank_shards(spark, other, 0, 2, state=ck)
    # cursor= and state= together refuse
    with pytest.raises(ValueError, match="not both"):
        read_rank_shards(spark, path, 0, 2, state=ck, cursor=3)
    # hand-edited identity refuses at the integrity check
    forged = dict(ck)
    forged["world_size"] = 3
    with pytest.raises(ValueError, match="identity fields were modified"):
        read_rank_shards(spark, path, 0, 3, snapshot=keys["web"],
                         state=forged)
    # foreign version refuses
    stale = dict(state)
    stale["version"] = 0
    import streaming_parquet_spark.operators.pipeline as P

    stale["identity_fp"] = P._state_fp(
        {k: v for k, v in stale.items()
         if k not in ("cursor", "identity_fp")}
    )
    with pytest.raises(ValueError, match="version"):
        read_rank_shards(spark, path, 0, 2, snapshot=keys["web"],
                         state=stale)


def test_mixture_state_roundtrip_and_refusals(spark, corpus):
    vocab, paths, keys, _other = corpus
    weights = {"web": 3, "code": 1}
    df, _c, state = read_mixture_shards(
        spark, paths, weights, vocab_ids=vocab, snapshots=keys,
        epoch=1, with_state=True,
    )
    rows = _rows(df, ["mix_key", "mix_source", "src", "win"])
    cut_key = rows[len(rows) // 2][0]
    ck = advance_reader_state(state, cut_key)

    via_state, _ = read_mixture_shards(
        spark, paths, weights, vocab_ids=vocab, snapshots=keys,
        epoch=1, state=ck,
    )
    via_cursor, _ = read_mixture_shards(
        spark, paths, weights, vocab_ids=vocab, snapshots=keys,
        epoch=1, cursor=cut_key,
    )
    cols = ["mix_key", "mix_source", "src", "win"]
    assert _rows(via_state, cols) == _rows(via_cursor, cols)

    for kw in (
        dict(weights={"web": 2, "code": 1}),                    # weights
        dict(epoch=2),                                          # epoch
        dict(snapshots={"web": keys["web"][:-1],
                        "code": keys["code"]}),                 # set_fps
        dict(key_col="other_key"),                              # cols
    ):
        full = dict(weights=weights, snapshots=keys, epoch=1)
        full.update(kw)
        with pytest.raises(ValueError, match="does not resume here"):
            read_mixture_shards(
                spark, paths, full.pop("weights"), vocab_ids=vocab,
                state=ck, **full,
            )
    # a RANK reader refuses a mixture state (kind mismatch)
    with pytest.raises(ValueError, match="does not resume here"):
        read_rank_shards(spark, paths["web"], 0, 2,
                         snapshot=keys["web"], state=ck)


def test_mixture_rank_state_roundtrip_and_refusals(spark, corpus):
    vocab, paths, keys, _other = corpus
    weights = {"web": 2, "code": 1}
    df, _c, state = read_mixture_rank(
        spark, paths, weights, 1, 3, vocab_ids=vocab, snapshots=keys,
        with_state=True,
    )
    rows = _rows(df, ["mix_key", "mix_source", "src", "win"])
    assert rows, "rank 1 of 3 should hold windows in this corpus"
    cut_key = rows[max(0, len(rows) // 3)][0]
    ck = advance_reader_state(state, cut_key)

    via_state, _ = read_mixture_rank(
        spark, paths, weights, 1, 3, vocab_ids=vocab, snapshots=keys,
        state=ck,
    )
    via_cursor, _ = read_mixture_rank(
        spark, paths, weights, 1, 3, vocab_ids=vocab, snapshots=keys,
        cursor=cut_key,
    )
    cols = ["mix_key", "mix_source", "src", "win"]
    assert _rows(via_state, cols) == _rows(via_cursor, cols)

    # rank / world / weights mutations refuse
    with pytest.raises(ValueError, match="does not resume here"):
        read_mixture_rank(spark, paths, weights, 2, 3,
                          vocab_ids=vocab, snapshots=keys, state=ck)
    with pytest.raises(ValueError, match="does not resume here"):
        read_mixture_rank(spark, paths, weights, 1, 4,
                          vocab_ids=vocab, snapshots=keys, state=ck)
    with pytest.raises(ValueError, match="does not resume here"):
        read_mixture_rank(spark, paths, {"web": 1, "code": 1}, 1, 3,
                          vocab_ids=vocab, snapshots=keys, state=ck)
    # the full-mixture reader refuses a rank state (kind + fields)
    with pytest.raises(ValueError, match="does not resume here"):
        read_mixture_shards(spark, paths, weights, vocab_ids=vocab,
                            snapshots=keys, state=ck)


def test_epoch_order_state_validates_the_stamp(spark, corpus):
    vocab, paths, keys, _other = corpus
    base, _c, rstate = read_rank_shards(
        spark, paths["web"], 0, 1, vocab_ids=vocab,
        snapshot=keys["web"], with_state=True,
    )
    ordered = with_epoch_order(base, epoch=3, shard_col="src")
    rows = sorted(
        (r["epoch_key"], r["src"], r["win"]) for r in ordered.collect()
    )
    triple = rows[len(rows) // 2]
    st = epoch_order_state(3, triple, shard_col="src", base=rstate)

    via_state = resume_epoch_order(ordered, shard_col="src", state=st)
    via_raw = resume_epoch_order(ordered, triple, shard_col="src")
    cols = ["epoch_key", "src", "win"]
    assert _rows(via_state, cols) == _rows(via_raw, cols)
    assert len(_rows(via_state, cols)) == len(rows) - 1 - len(rows) // 2

    # a frame ordered for a DIFFERENT epoch refuses the state
    with pytest.raises(ValueError, match="does not resume here"):
        resume_epoch_order(with_epoch_order(base, epoch=4, shard_col="src"), shard_col="src", state=st)
    # different granularity refuses
    with pytest.raises(ValueError, match="does not resume here"):
        resume_epoch_order(
            with_epoch_order(base, epoch=3, shard_col="src",
                             granularity="window"),
            shard_col="src", state=st,
        )
    # an UNSTAMPED frame (a hand-built key column) refuses
    from pyspark.sql import functions as F

    fake = base.withColumn("epoch_key", F.col("win").cast("bigint"))
    with pytest.raises(ValueError, match="does not resume here"):
        resume_epoch_order(fake, shard_col="src", state=st)
    # exactly one of cursor/state
    with pytest.raises(ValueError, match="exactly one"):
        resume_epoch_order(ordered, shard_col="src")
    with pytest.raises(ValueError, match="exactly one"):
        resume_epoch_order(ordered, triple, shard_col="src", state=st)
    # a no-cursor bundle cannot resume
    with pytest.raises(ValueError, match="no cursor"):
        resume_epoch_order(ordered, shard_col="src",
                           state=epoch_order_state(3, None, shard_col="src"))


def test_elastic_migration_property(spark, corpus):
    """Hypothesis (VERDICT r12 item 5): for ANY (W_old, per-rank cut
    points, W_new), the windows consumed under the old world ⊎ the
    union over new ranks of reads carrying the migrated watermarks =
    the snapshot's full window multiset, exactly once."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from streaming_parquet_spark.operators.pipeline import (
        migrate_rank_cursors,
    )

    vocab, paths, keys, _other = corpus
    path = paths["web"]
    snap = keys["web"]
    # the full snapshot multiset, and each (shard, win)'s position
    full = {}
    for w in range(1, 6):
        for r in range(w):
            df, _ = read_rank_shards(
                spark, path, r, w, snapshot=snap, pos_col="pos"
            )
            full.setdefault(w, {})[r] = _rows(df, ["src", "win", "pos"])
    world_all = sorted(
        (s, w) for r in full[1].values() for (s, w, _p) in r
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        w_old=st.integers(1, 5),
        w_new=st.integers(1, 5),
        cutf=st.tuples(*[st.floats(0.0, 1.0)] * 5),
    )
    def check(w_old, w_new, cutf):
        cursors = {}
        consumed = []
        for r in range(w_old):
            rows = full[w_old][r]
            c = int(cutf[r] * len(rows))
            cursors[r] = c
            consumed += [(s, w) for (s, w, _p) in rows[:c]]
        mig = migrate_rank_cursors(
            spark, path, w_old, cursors, w_new, snapshot=snap
        )
        assert sorted(mig) == list(range(w_new))
        resumed = []
        for r in range(w_new):
            df, _ = read_rank_shards(
                spark, path, r, w_new, snapshot=snap,
                consumed=mig[r],
            )
            resumed += [(s, w) for (s, w, _p) in _rows(
                df, ["src", "win", "pos"]
            )]
        assert sorted(consumed + resumed) == world_all

    check()

    # a cursor past its rank's total under the claimed world refuses
    with pytest.raises(ValueError, match="past its"):
        migrate_rank_cursors(
            spark, path, 2, {0: 10**6}, 3, snapshot=snap
        )

    # refusal parity (review r13): unknown snapshot keys refuse BY
    # NAME through both halves of the migration — migrate used to
    # silently drop keys the watermark half refused
    with pytest.raises(ValueError, match="not in"):
        migrate_rank_cursors(
            spark, path, 2, {0: 0}, 3,
            snapshot=set(snap) | {"no-such-shard"},
        )


def test_payload_store_pin_roundtrip_and_refusals(spark, corpus,
                                                  pstores):
    """The pixel-plane pin (VERDICT r14 Missing 2): a reader minted
    with payload_store= stamps the store's contract identity into the
    bundle, and the resume refuses — field named — when the store was
    re-sharded/swapped, when the pin is dropped on resume, and when a
    pinless bundle is resumed WITH a pin (both directions of the
    union compare)."""
    vocab, paths, keys, _other = corpus
    store_a, store_b = pstores
    path = paths["web"]

    df, _c, state = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        with_state=True, payload_store=store_a,
    )
    assert state["payload_store"][1] == "payload-store-v2"
    assert state["payload_store"][2] == 3  # n_shards rides the pin
    total = df.count()
    ck = advance_reader_state(state, total // 2)

    # unmutated: same pin resumes, bit-identical to the raw cursor
    via_state, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        state=ck, payload_store=store_a,
    )
    via_cursor, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        cursor=total // 2, pos_col="pos",
    )
    cols = ["src", "win", "pos"]
    assert _rows(via_state, cols) == _rows(via_cursor, cols)

    # re-sharded/swapped store refuses by name
    with pytest.raises(ValueError, match="payload_store"):
        read_rank_shards(
            spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
            state=ck, payload_store=store_b,
        )
    # dropping the pin on resume refuses (the stamped half must not
    # silently fall out of the contract)
    with pytest.raises(ValueError, match="payload_store"):
        read_rank_shards(
            spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
            state=ck,
        )
    # a pinless bundle refuses a pinned resume (other direction)
    _df2, _c2, pinless = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        with_state=True,
    )
    with pytest.raises(ValueError, match="payload_store"):
        read_rank_shards(
            spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
            state=advance_reader_state(pinless, 1),
            payload_store=store_a,
        )

    # a plain read would silently ignore the pin — refuse instead
    # (r15 review: the caller believes the store is guarded)
    for reader, args in (
        (read_rank_shards, (spark, path, 0, 2)),
        (read_mixture_shards, (spark, paths, {"web": 1, "code": 1})),
        (read_mixture_rank, (spark, paths, {"web": 1, "code": 1}, 0, 2)),
    ):
        with pytest.raises(ValueError, match="payload_store"):
            reader(*args, payload_store=store_a)

    # the pin survives a JSON checkpoint round trip
    import json as _json

    thawed = _json.loads(_json.dumps(ck))
    via_thawed, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=keys["web"],
        state=thawed, payload_store=store_a,
    )
    assert _rows(via_thawed, cols) == _rows(via_state, cols)

    # mixture + rank-sliced mixture carry the same pin
    mdf, _mc, mstate = read_mixture_shards(
        spark, paths, {"web": 1, "code": 1}, vocab_ids=vocab,
        snapshots=keys, with_state=True, payload_store=store_a,
    )
    mck = advance_reader_state(
        mstate, sorted(r["mix_key"] for r in mdf.collect())[2]
    )
    with pytest.raises(ValueError, match="payload_store"):
        read_mixture_shards(
            spark, paths, {"web": 1, "code": 1}, vocab_ids=vocab,
            snapshots=keys, state=mck, payload_store=store_b,
        )
    rdf, _rc, rstate = read_mixture_rank(
        spark, paths, {"web": 1, "code": 1}, 0, 2, vocab_ids=vocab,
        snapshots=keys, with_state=True, payload_store=store_a,
    )
    assert rstate["payload_store"][0] == store_a
    with pytest.raises(ValueError, match="payload_store"):
        read_mixture_rank(
            spark, paths, {"web": 1, "code": 1}, 0, 2,
            vocab_ids=vocab, snapshots=keys,
            state=advance_reader_state(rstate, 1),
        )


def test_reader_state_survives_json_checkpoint(spark, corpus):
    """The bundle's documented life is a trainer checkpoint: a
    json.dumps/loads round trip (tuples -> lists) must still resume —
    including the elastic-migration 'consumed' identity field
    (review r13)."""
    import json

    from streaming_parquet_spark.operators.pipeline import (
        migrate_rank_cursors,
    )

    vocab, paths, keys, _other = corpus
    path = paths["web"]
    snap = keys["web"]
    mig = migrate_rank_cursors(spark, path, 2, {0: 2, 1: 1}, 2,
                               snapshot=snap)
    df, _c, state = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=snap,
        consumed=mig[0], with_state=True,
    )
    n = df.count()
    ck = json.loads(json.dumps(advance_reader_state(state, 1)))
    via_state, _ = read_rank_shards(
        spark, path, 0, 2, vocab_ids=vocab, snapshot=snap,
        consumed=mig[0], state=ck,
    )
    assert via_state.count() == df.where("pos >= 1").count()
    # and omitting the consumed watermark at resume refuses
    with pytest.raises(ValueError, match="does not resume here"):
        read_rank_shards(spark, path, 0, 2, vocab_ids=vocab,
                         snapshot=snap, state=ck)
    # mixture bundles round-trip too
    df2, _c2, st2 = read_mixture_shards(
        spark, paths, {"web": 2, "code": 1}, vocab_ids=vocab,
        snapshots=keys, with_state=True,
    )
    rows = _rows(df2, ["mix_key"])
    ck2 = json.loads(json.dumps(advance_reader_state(st2, rows[0][0])))
    resumed, _ = read_mixture_shards(
        spark, paths, {"web": 2, "code": 1}, vocab_ids=vocab,
        snapshots=keys, state=ck2,
    )
    assert resumed.count() == len(rows) - 1


def test_reader_state_property(spark, corpus, pstores):
    """Hypothesis: for ANY (world, rank, weights, epoch, cut), the
    state-bundle resume is bit-identical to the raw-cursor resume,
    and a drawn single-field mutation refuses."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    vocab, paths, keys, _other = corpus
    store_a, store_b = pstores

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        world=st.integers(1, 4),
        rank_seed=st.integers(0, 99),
        w1=st.integers(1, 5),
        w2=st.integers(1, 5),
        epoch=st.one_of(st.none(), st.integers(0, 3)),
        cutf=st.floats(0.0, 0.95),
        mutation=st.sampled_from(
            ["rank", "world", "weights", "epoch", "snapshot",
             "payload_store"]
        ),
    )
    def check(world, rank_seed, w1, w2, epoch, cutf, mutation):
        rank = rank_seed % world
        weights = {"web": w1, "code": w2}
        df, _c, state = read_mixture_rank(
            spark, paths, weights, rank, world, vocab_ids=vocab,
            snapshots=keys, epoch=epoch, with_state=True,
            payload_store=store_a,
        )
        rows = _rows(df, ["mix_key", "mix_source", "src", "win"])
        if not rows:
            return  # a dry rank holds no windows; nothing to resume
        cut_key = rows[int(cutf * (len(rows) - 1))][0]
        ck = advance_reader_state(state, cut_key)
        via_state, _ = read_mixture_rank(
            spark, paths, weights, rank, world, vocab_ids=vocab,
            snapshots=keys, epoch=epoch, state=ck,
            payload_store=store_a,
        )
        expect = [r for r in rows if r[0] > cut_key]
        assert _rows(
            via_state, ["mix_key", "mix_source", "src", "win"]
        ) == expect

        m_rank, m_world, m_weights = rank, world, dict(weights)
        m_epoch, m_snaps, m_store = epoch, keys, store_a
        if mutation == "rank":
            if world == 1:
                return
            m_rank = (rank + 1) % world
        elif mutation == "world":
            m_world = world + 1
        elif mutation == "weights":
            m_weights["web"] = w1 + 1
        elif mutation == "epoch":
            m_epoch = 0 if epoch is None else epoch + 1
        elif mutation == "payload_store":
            m_store = store_b  # same blobs, re-sharded — must refuse
        else:
            # The mixture_rank identity is RANK-LOCAL by design:
            # dropping a pinned shard that only OTHER ranks hold
            # leaves this rank's slice (and positional space)
            # bit-identical, and resuming it is legitimately safe.
            # To demand a refusal, drop a shard THIS rank holds —
            # its effective set fingerprint must then change.
            # rows are (mix_key, mix_source, src, win)
            held_name, held_shard = rows[0][1], rows[0][2]
            m_snaps = dict(keys)
            m_snaps[held_name] = [
                k for k in keys[held_name] if k != held_shard
            ]
            if not m_snaps[held_name]:
                return  # can't empty a set's pin; nothing to mutate
        with pytest.raises(ValueError, match="does not resume here"):
            read_mixture_rank(
                spark, paths, m_weights, m_rank, m_world,
                vocab_ids=vocab, snapshots=m_snaps, epoch=m_epoch,
                state=ck, payload_store=m_store,
            )

    check()


def test_mixture_elastic_migration_property(spark, corpus):
    """Hypothesis (VERDICT r13 item 1): for ANY (W_old, per-rank
    consumed mix_key cut points, W_new), the windows the old ranks
    consumed ⊎ the union over new ranks of reads carrying the
    migrated per-set watermarks = the mixture's full window multiset,
    exactly once — the single-set elastic property at the composition
    pretraining actually runs."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from streaming_parquet_spark.operators.pipeline import (
        migrate_mixture_cursors,
    )

    vocab, paths, keys, _other = corpus
    weights = {"web": 3, "code": 1}
    cols = ["mix_source", "src", "win"]
    # full rank streams in consumption (mix_key) order, per world
    full = {}
    for w in range(1, 5):
        for r in range(w):
            df, _ = read_mixture_rank(
                spark, paths, weights, r, w, snapshots=keys
            )
            full.setdefault(w, {})[r] = sorted(
                tuple(row[c] for c in ["mix_key"] + cols)
                for row in df.collect()
            )
    world_all = sorted(t[1:] for t in full[1][0])

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        w_old=st.integers(1, 4),
        w_new=st.integers(1, 4),
        cutf=st.tuples(*[st.floats(0.0, 1.0)] * 4),
    )
    def check(w_old, w_new, cutf):
        cursors, consumed = {}, []
        for r in range(w_old):
            rows = full[w_old][r]
            c = int(cutf[r] * len(rows))
            if c:
                cursors[r] = rows[c - 1][0]  # last consumed mix_key
                consumed += [t[1:] for t in rows[:c]]
            # some ranks checkpoint nothing: leave them out of cursors
        mig = migrate_mixture_cursors(
            spark, paths, weights, w_old, cursors, w_new,
            snapshots=keys,
        )
        assert sorted(mig) == list(range(w_new))
        resumed = []
        for r in range(w_new):
            df, _ = read_mixture_rank(
                spark, paths, weights, r, w_new, snapshots=keys,
                consumed=mig[r],
            )
            resumed += [
                tuple(row[c] for c in cols) for row in df.collect()
            ]
        assert sorted(consumed + resumed) == world_all

    check()


def test_mixture_migration_refusals(spark, corpus):
    from streaming_parquet_spark.operators.pipeline import (
        consumed_mixture_watermarks,
        migrate_mixture_cursors,
    )

    vocab, paths, keys, _other = corpus
    weights = {"web": 3, "code": 1}
    # epoch-permuted prefixes are not watermarks: named refusal
    with pytest.raises(ValueError, match="epoch boundary"):
        migrate_mixture_cursors(
            spark, paths, weights, 2, {0: 100}, 3,
            snapshots=keys, epoch=1,
        )
    # a cursor past the rank's largest key refuses
    with pytest.raises(ValueError, match="past its largest key"):
        consumed_mixture_watermarks(
            spark, paths, weights, 2, {0: 10**9}, snapshots=keys,
        )
    # the reader refuses watermarks naming a foreign set
    with pytest.raises(ValueError, match="not in this mixture"):
        read_mixture_shards(
            spark, paths, weights, snapshots=keys,
            consumed={"books": {"x": 1}},
        )
    # and refuses consumed= combined with epoch=
    with pytest.raises(ValueError, match="cannot combine"):
        read_mixture_shards(
            spark, paths, weights, snapshots=keys, epoch=1,
            consumed={"web": {}},
        )
    # unknown snapshot keys refuse by name through the migration
    with pytest.raises(ValueError, match="not in"):
        migrate_mixture_cursors(
            spark, paths, weights, 2, {0: 5}, 3,
            snapshots={"web": list(keys["web"]) + ["no-such"],
                       "code": keys["code"]},
        )


def test_mixture_consumed_joins_state_identity(spark, corpus):
    """A state minted over a watermark-filtered mixture must not
    resume an unfiltered one (and vice versa) — the consumed field is
    part of the identity, mirroring read_rank_shards."""
    from streaming_parquet_spark.operators.pipeline import (
        migrate_mixture_cursors,
    )

    vocab, paths, keys, _other = corpus
    weights = {"web": 2, "code": 1}
    base, _ = read_mixture_rank(
        spark, paths, weights, 0, 2, snapshots=keys
    )
    rows = sorted(r["mix_key"] for r in base.select("mix_key").collect())
    mig = migrate_mixture_cursors(
        spark, paths, weights, 2, {0: rows[len(rows) // 2]}, 3,
        snapshots=keys,
    )
    df, _c, state = read_mixture_rank(
        spark, paths, weights, 1, 3, snapshots=keys,
        consumed=mig[1], with_state=True,
    )
    got = sorted(r["mix_key"] for r in df.select("mix_key").collect())
    cut = got[len(got) // 2] if got else 0
    ck = advance_reader_state(state, cut)
    # same watermarks: resumes
    again, _ = read_mixture_rank(
        spark, paths, weights, 1, 3, snapshots=keys,
        consumed=mig[1], state=ck,
    )
    assert sorted(
        r["mix_key"] for r in again.select("mix_key").collect()
    ) == [k for k in got if k > cut]
    # dropped watermarks: refuses
    with pytest.raises(ValueError, match="does not resume here"):
        read_mixture_rank(
            spark, paths, weights, 1, 3, snapshots=keys, state=ck,
        )


def test_mixture_migration_refuses_string_snapshots(spark, corpus):
    """The mixture readers take key LISTS per set; a single-set-style
    string cutoff passed to the migration would mint watermarks over a
    shard universe no mixture read uses (review r14) — refuse."""
    from streaming_parquet_spark.operators.pipeline import (
        consumed_mixture_watermarks,
    )

    vocab, paths, keys, _other = corpus
    with pytest.raises(ValueError, match="single string"):
        consumed_mixture_watermarks(
            spark, paths, {"web": 3, "code": 1}, 2, {0: 5},
            snapshots={"web": "zzzz", "code": keys["code"]},
        )


def test_elastic_double_resize_property(spark, corpus):
    """A SECOND mid-epoch resize composes (review r14 pass 2): the
    first migration's world-level watermarks pass as consumed= to the
    second, and stage-1 consumed ⊎ stage-2 consumed ⊎ the final world's
    reads = the epoch exactly once — including ranks that died before
    any stage-2 checkpoint (their holes ride the prior watermarks)."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from streaming_parquet_spark.operators.pipeline import (
        migrate_rank_cursors,
    )

    vocab, paths, keys, _other = corpus
    path, snap = paths["web"], keys["web"]
    full = {}
    for w in range(1, 4):
        for r in range(w):
            df, _ = read_rank_shards(
                spark, path, r, w, snapshot=snap, pos_col="pos"
            )
            full.setdefault(w, {})[r] = _rows(df, ["src", "win", "pos"])
    world_all = sorted((s, w) for r in full[1].values() for (s, w, _p) in r)

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        w1=st.integers(1, 3), w2=st.integers(1, 3), w3=st.integers(1, 3),
        cut1=st.tuples(*[st.floats(0.0, 1.0)] * 3),
        cut2=st.tuples(*[st.floats(0.0, 1.0)] * 3),
    )
    def check(w1, w2, w3, cut1, cut2):
        cursors1, consumed1 = {}, []
        for r in range(w1):
            rows = full[w1][r]
            c = int(cut1[r] * len(rows))
            cursors1[r] = c
            consumed1 += [(s, w) for (s, w, _p) in rows[:c]]
        mig1 = migrate_rank_cursors(
            spark, path, w1, cursors1, w2, snapshot=snap
        )
        world1: dict = {}
        for d in mig1.values():
            world1.update(d)  # rank slices are disjoint
        cursors2, consumed2 = {}, []
        for r in range(w2):
            df, _ = read_rank_shards(
                spark, path, r, w2, snapshot=snap,
                consumed=mig1[r], pos_col="pos",
            )
            rows = _rows(df, ["src", "win", "pos"])
            c = int(cut2[r] * len(rows))
            if c:
                cursors2[r] = rows[c - 1][2] + 1  # last consumed pos+1
                consumed2 += [(s, w) for (s, w, _p) in rows[:c]]
            # c == 0: the rank died before its first checkpoint
        mig2 = migrate_rank_cursors(
            spark, path, w2, cursors2, w3, snapshot=snap,
            consumed=world1,
        )
        final = []
        for r in range(w3):
            df, _ = read_rank_shards(
                spark, path, r, w3, snapshot=snap, consumed=mig2[r]
            )
            final += [(s, w) for (s, w, _p) in _rows(
                df, ["src", "win", "pos"]
            )]
        assert sorted(consumed1 + consumed2 + final) == world_all

    check()

    # prior watermarks naming foreign shards refuse by name
    with pytest.raises(ValueError, match="outside this snapshot"):
        migrate_rank_cursors(
            spark, path, 2, {0: 0}, 2, snapshot=snap,
            consumed={"no-such-shard": 1},
        )


def test_mixture_double_resize_property(spark, corpus):
    """The mixture analogue: two resizes compose exactly-once when the
    second migration carries the first's world-level watermarks."""
    try:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    from streaming_parquet_spark.operators.pipeline import (
        migrate_mixture_cursors,
    )

    vocab, paths, keys, _other = corpus
    weights = {"web": 3, "code": 1}
    cols = ["mix_source", "src", "win"]
    full = {}
    for w in range(1, 4):
        for r in range(w):
            df, _ = read_mixture_rank(
                spark, paths, weights, r, w, snapshots=keys
            )
            full.setdefault(w, {})[r] = sorted(
                tuple(row[c] for c in ["mix_key"] + cols)
                for row in df.collect()
            )
    world_all = sorted(t[1:] for t in full[1][0])

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        w1=st.integers(1, 3), w2=st.integers(1, 3), w3=st.integers(1, 3),
        cut1=st.tuples(*[st.floats(0.0, 1.0)] * 3),
        cut2=st.tuples(*[st.floats(0.0, 1.0)] * 3),
    )
    def check(w1, w2, w3, cut1, cut2):
        cursors1, consumed1 = {}, []
        for r in range(w1):
            rows = full[w1][r]
            c = int(cut1[r] * len(rows))
            if c:
                cursors1[r] = rows[c - 1][0]
                consumed1 += [t[1:] for t in rows[:c]]
        mig1 = migrate_mixture_cursors(
            spark, paths, weights, w1, cursors1, w2, snapshots=keys
        )
        world1: dict = {}
        for d in mig1.values():
            for n, marks in d.items():
                world1.setdefault(n, {}).update(marks)
        cursors2, consumed2 = {}, []
        for r in range(w2):
            df, _ = read_mixture_rank(
                spark, paths, weights, r, w2, snapshots=keys,
                consumed=mig1[r],
            )
            rows = sorted(
                tuple(row[c] for c in ["mix_key"] + cols)
                for row in df.collect()
            )
            c = int(cut2[r] * len(rows))
            if c:
                cursors2[r] = rows[c - 1][0]
                consumed2 += [t[1:] for t in rows[:c]]
        mig2 = migrate_mixture_cursors(
            spark, paths, weights, w2, cursors2, w3, snapshots=keys,
            consumed=world1,
        )
        final = []
        for r in range(w3):
            df, _ = read_mixture_rank(
                spark, paths, weights, r, w3, snapshots=keys,
                consumed=mig2[r],
            )
            final += [
                tuple(row[c] for c in cols) for row in df.collect()
            ]
        assert sorted(consumed1 + consumed2 + final) == world_all

    check()


def test_rank_state_v1_bundles_still_resume(spark, corpus):
    """Only the MIXTURE identities changed layout in v2: a v1 bundle
    for a single-set rank read keeps resuming (review r14 pass 2 —
    a blanket version refusal would cost every fleet its cursors),
    while a v1 mixture bundle refuses with the re-mint message."""
    import streaming_parquet_spark.operators.pipeline as P

    vocab, paths, keys, _other = corpus
    path = paths["web"]
    df, _c, state = read_rank_shards(
        spark, path, 0, 2, snapshot=keys["web"], with_state=True
    )
    ck = advance_reader_state(state, 1)
    v1 = dict(ck)
    v1["version"] = 1
    v1["identity_fp"] = P._state_fp(
        {k: v for k, v in v1.items() if k not in ("cursor", "identity_fp")}
    )
    via_v1, _ = read_rank_shards(
        spark, path, 0, 2, snapshot=keys["web"], state=v1
    )
    via_v2, _ = read_rank_shards(
        spark, path, 0, 2, snapshot=keys["web"], state=ck
    )
    cols = ["src", "win", "pos"]
    assert _rows(via_v1, cols) == _rows(via_v2, cols)

    mdf, _mc, mstate = read_mixture_shards(
        spark, paths, {"web": 1, "code": 1}, snapshots=keys,
        with_state=True,
    )
    m1 = dict(mstate)
    m1["version"] = 1
    m1["identity_fp"] = P._state_fp(
        {k: v for k, v in m1.items() if k not in ("cursor", "identity_fp")}
    )
    with pytest.raises(ValueError, match="accepted range"):
        read_mixture_shards(
            spark, paths, {"web": 1, "code": 1}, snapshots=keys,
            state=m1,
        )
