"""The complete continuous training-data factory, end to end: raw
document waves stream through quality filtering + exactly-once
near-dup-deduplicated ingest into a corpus table, and the corpus
table streams through a pinned tokenizer into a VERIFIED token-shard
set that data-parallel trainer ranks read coordination-free — two
checkpointed loops chained by a directory, which is exactly how the
100 TB deployment composes (each loop scales by trigger sizing, and
either side can restart/replay without duplicating a row or a
window).

  stage A  dedup_ingest_stream: Gopher-style prefilter -> within-
           batch near-dup removal -> LSH-index probe -> survivors
           delta-append into the corpus table (+ monitor rows)
  freeze   fit BPE on the corpus SO FAR; freeze merges, ids, and the
           FIM sentinels; persist both artifacts (the contract every
           later wave encodes under)
  stage B  shard_ingest_stream over the corpus table's directory:
           encode (pinned artifact) -> FIM -> pack -> publish shards
           under the sidecar contract
  resume   new raw waves flow A -> corpus; rerunning B picks up only
           the corpus files A appended (same checkpoints)
  train    assign_shards_to_ranks + read_rank_shards: every rank
           derives the same token-balanced assignment from the
           sidecar and scans only its own shard directories
  retire   the catalog layer (operators/catalog.py): months of wave
           shards compact into a NEW generation, verify, publish
           (single atomic marker), and the old generation retires —
           pinned readers finish their epoch on the old data, new
           producers/readers land on the successor, drop reclaims
           the space after the grace window

Run: python examples/continuous_shard_factory.py [sf_dir] [workdir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_parquet_spark.operators.catalog import (
    current_generation,
    next_generation,
    promote_compaction,
    publish_generation,
    sweep_generations,
)
from streaming_parquet_spark.operators.dedup import write_lsh_index
from streaming_parquet_spark.operators.pipeline import (
    assign_shards_to_ranks,
    read_rank_shards,
    read_token_shards,
    shard_snapshot,
    verify_token_shards,
    with_causal_labels,
    with_epoch_order,
)
from streaming_parquet_spark.operators.text import with_quality
from streaming_parquet_spark.operators.tokenize import (
    apply_bpe,
    apply_bpe_table,
    fit_bpe_merges,
    read_subword_ids,
    subword_vocab,
    write_bpe_merges,
    write_subword_ids,
)
from streaming_parquet_spark.session import get_spark
from streaming_parquet_spark.streaming.ingest import dedup_ingest_stream
from streaming_parquet_spark.streaming.shards import shard_ingest_stream

# reserved at vocabulary freeze: FIM sentinels get ids 2/3/4 and the
# document separator id 5 — ids tokenization can NEVER emit (eos=1
# would collide with <unk>, making post-freeze unknowns look like
# document boundaries)
SPECIALS = ("<fim_prefix>", "<fim_middle>", "<fim_suffix>", "<eos>")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/shard_factory"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="shard-factory", master="local[4]",
                      shuffle_partitions=8)

    corpus = "factory_corpus"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in (corpus, f"{corpus}_lsh_sets", f"{corpus}_lsh_bands",
              f"{corpus}_monitor", "factory_bpe", "factory_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    half = docs.filter("doc_id % 2 = 0")

    # ------------------------------------------------ stage A: corpus
    # seed the LSH index on a sliver so the loop has something to
    # probe from batch 0 (a cold start also works — see the tests)
    seed = half.filter("doc_id % 20 = 0").select("doc_id", "text")
    write_lsh_index(seed, f"{corpus}_lsh", num_hashes=16, bands=8)

    raw = os.path.join(work, "raw")
    half.write.mode("append").parquet(raw)

    def prefilter(batch):
        # the quality gate rides INSIDE the exactly-once loop:
        # rejected docs never cost a probe (swap in classifier_filter
        # or c4_clean_lines here)
        q = with_quality(batch, "text")
        return q.filter("quality_score >= 0.7").select(*batch.columns)

    r = dedup_ingest_stream(
        spark, raw, corpus, os.path.join(work, "ckpt_corpus"),
        filter_fn=prefilter,
        monitor_table=f"{corpus}_monitor",
    )
    print(f"A: {r.rows_in} raw -> {r.rows_kept} kept "
          f"({r.rows_filtered} quality-rejected)")

    # --------------------------------------- freeze tokenizer + vocab
    corpus_df = spark.table(corpus)
    merges = fit_bpe_merges(corpus_df, n_merges=64)
    enc = apply_bpe(corpus_df, merges).persist()
    ids = subword_vocab(enc, "bpe_tokens", extra_specials=SPECIALS)
    enc.unpersist()
    write_bpe_merges(merges, "factory_bpe")
    write_subword_ids(ids, "factory_ids")
    ids, _pad, _unk = read_subword_ids(spark, "factory_ids")

    # ----------------------------------------------- stage B: shards
    # the corpus table's DIRECTORY is stage B's stream source: stage A
    # appends parquet files there, stage B's checkpoint remembers
    # which it has already packed
    corpus_dir = os.path.join(warehouse, corpus)
    # the shard set lives INSIDE a catalog generation from day one:
    # publication, compaction, and retirement all go through the
    # catalog's atomic markers
    root = os.path.join(work, "shardsets")
    gen1, shards = next_generation(root)

    def encode(batch):
        out = apply_bpe_table(batch, "factory_bpe", ids=ids)
        return out.select(
            "doc_id", F.col("bpe_tokens_ids").alias("ids")
        )

    rb = shard_ingest_stream(
        spark, corpus_dir, shards, os.path.join(work, "ckpt_shards"),
        ids, encode, budget=256, eos_id=5,
        fim=dict(pre_id=2, mid_id=3, suf_id=4, rate_pct=50),
    )
    print(f"B: {rb.rows_in} corpus docs -> {rb.windows_written} windows "
          f"in shards {rb.shards_written}")

    # ------------------------------------------------ new raw wave
    other = docs.filter("doc_id % 2 = 1")
    other.write.mode("append").parquet(raw)
    r2 = dedup_ingest_stream(
        spark, raw, corpus, os.path.join(work, "ckpt_corpus"),
        filter_fn=prefilter,
        monitor_table=f"{corpus}_monitor",
    )
    rb2 = shard_ingest_stream(
        spark, corpus_dir, shards, os.path.join(work, "ckpt_shards"),
        ids, encode, budget=256, eos_id=5,
        fim=dict(pre_id=2, mid_id=3, suf_id=4, rate_pct=50),
    )
    print(f"resume: +{r2.rows_kept} corpus docs -> "
          f"+{rb2.windows_written} windows in {rb2.shards_written}")

    # ------------------------------------------------ verify + train
    bad = verify_token_shards(spark, shards).filter("NOT ok").count()
    print(f"verify: {bad} bad shards")
    # publish: the catalog re-verifies and lands ONE atomic marker —
    # readers resolve only committed generations
    publish_generation(spark, root, gen1, vocab_ids=ids)
    print(f"published generation {gen1}")
    sidecar = spark.read.parquet(os.path.join(shards, "_manifest"))
    asg = assign_shards_to_ranks(sidecar, 4)
    loads = (
        asg.groupBy("rank").agg(F.sum("weight").alias("tokens"))
        .orderBy("rank").collect()
    )
    print("rank token loads:", [(r["rank"], r["tokens"]) for r in loads])
    # the launcher pins ONE key set; every rank assigns over it —
    # a producer appending mid-run cannot skew ranks onto different
    # manifests (set equality cannot race, unlike a max-key filter)
    snap = shard_snapshot(spark, shards)
    n = 0
    for rank in range(4):
        part, contract = read_rank_shards(
            spark, shards, rank, 4, ids, snapshot=snap
        )
        n += with_causal_labels(part).count()
    total = spark.read.parquet(shards).count()
    print(f"ranks read {n} windows of {total} (each exactly once)")
    assert bad == 0 and n == total
    # epoch 2 visits the same slice in a DIFFERENT deterministic
    # order — a zero-shuffle projection (shard granularity: shard
    # visit order permutes, reads stay sequential within each shard)
    part0, _ = read_rank_shards(spark, shards, 0, 4, ids, snapshot=snap)
    e2 = with_epoch_order(part0, epoch=2)
    first = [
        r["shard"]
        for r in e2.orderBy("epoch_key", "shard", "win").limit(3).collect()
    ]
    print(f"epoch-2 order for rank 0 starts at shards {first}")

    # ------------------------- checkpoint, preempt, resize, resume
    # (r13) the trainer checkpoints a SELF-VALIDATING state bundle —
    # cursor + a fingerprint over (effective shard set, rank/world,
    # vocabulary) — so a resume under ANY changed identity refuses
    # loudly instead of silently reading the wrong windows; the
    # bundle survives a JSON checkpoint round trip.
    import json as _json

    from streaming_parquet_spark.operators.pipeline import (
        advance_reader_state,
        migrate_rank_cursors,
    )

    r0, _c, state = read_rank_shards(
        spark, shards, 0, 4, ids, snapshot=snap, with_state=True
    )
    consumed_r0 = 3  # pretend rank 0 consumed positions 0..2
    ckpt = _json.loads(
        _json.dumps(advance_reader_state(state, consumed_r0))
    )
    resumed, _ = read_rank_shards(
        spark, shards, 0, 4, ids, snapshot=snap, state=ckpt
    )
    assert resumed.count() == r0.count() - consumed_r0
    try:
        read_rank_shards(spark, shards, 0, 8, ids, snapshot=snap,
                         state=ckpt)
        raise AssertionError("foreign-world cursor resumed silently")
    except ValueError as exc:
        assert "does not resume here" in str(exc)
    # the cluster resizes 4 -> 3 MID-EPOCH: per-rank positions
    # collapse to per-shard watermarks (pure manifest math) and
    # re-express under the new world — the epoch still completes
    # exactly once
    mig = migrate_rank_cursors(
        spark, shards, 4, {0: consumed_r0}, 3, snapshot=snap
    )
    remaining = sum(
        read_rank_shards(spark, shards, r, 3, ids, snapshot=snap,
                         consumed=mig[r])[0].count()
        for r in range(3)
    )
    assert remaining == total - consumed_r0
    print(f"resized 4 -> 3 ranks mid-epoch: {remaining} windows left "
          f"after {consumed_r0} consumed — still exactly once")

    # --------------------------------------- retire the wave shards
    # months of small per-wave shards compact into training-sized
    # units in a NEW generation; the swap is compact -> verify ->
    # publish -> retire, one call.  A reader that pinned gen 1 before
    # the swap keeps reading its untouched data (grace window); the
    # retired generation refuses any further producer wave.
    pinned_gen, pinned_path = current_generation(root)
    gen2, _man = promote_compaction(spark, root, n_shards=2,
                                    vocab_ids=ids)
    cur_gen, cur_path = current_generation(root)
    compacted, _c = read_token_shards(spark, cur_path, vocab_ids=ids)
    assert cur_gen == gen2 and compacted.count() == total
    # the old generation still serves pinned readers...
    assert read_token_shards(spark, pinned_path)[0].count() == total
    # ...but refuses new waves (the streaming producer probes the
    # retire marker per trigger and refuses too)
    try:
        rb3 = shard_ingest_stream(
            spark, corpus_dir, shards, os.path.join(work, "ckpt_shards"),
            ids, encode, budget=256, eos_id=5,
        )
        raise AssertionError("retired generation accepted a wave")
    except Exception as exc:
        assert "RETIRED" in str(exc)
    print(f"promoted gen {pinned_gen} -> {gen2}: "
          f"{compacted.select('shard').distinct().count()} compact "
          f"shards carry all {total} windows; gen {pinned_gen} retired")
    # after the read-grace window, reclaim space by POLICY, not by
    # hand: keep the newest committed generation, drop every retired
    # one older than that (a longer-lived factory would keep_last_n=2+
    # so readers pinned before the last promotion still finish)
    swept = sweep_generations(root, keep_last_n=1)
    assert swept["dropped"] == [pinned_gen]
    print(f"swept retired gens {swept['dropped']}; current is gen "
          f"{current_generation(root)[0]}")

    # ------------------------------------------- multi-set mixture
    # training mixes several PACKED sets by weight at read time under
    # ONE vocabulary: pack a second domain (here: the corpus's
    # doc_id%3 slice standing in for a code/chat set) with the SAME
    # frozen artifact, then interleave 3:1.  The key order is exact
    # integer stride scheduling — deterministic across engines and
    # restarts; a set under a foreign vocabulary refuses.
    from streaming_parquet_spark.operators.pipeline import (
        pack_token_windows,
        read_mixture_shards,
        write_token_shards,
    )

    # one mixture trains under ONE contract — column names included,
    # so the code set uses the same 'shard' partition column as the
    # streamed generation
    code_docs = spark.table(corpus).filter("doc_id % 3 = 0")
    code_win = pack_token_windows(
        encode(code_docs).withColumn(
            "shard", F.lit("code-0")
        ), "ids", budget=256, order_col="doc_id", part_col="shard",
        eos_id=5,
    )
    code_set = os.path.join(work, "code_shards")
    write_token_shards(
        code_win, code_set, ids, budget=256, shard_col="shard",
        eos_id=5,
    )
    mixed, _mc = read_mixture_shards(
        spark,
        {"pretrain": cur_path, "code": code_set},
        {"pretrain": 3, "code": 1},
        vocab_ids=ids,
    )
    head = [
        r["mix_source"]
        for r in mixed.orderBy("mix_key").limit(12).collect()
    ]
    n_mix = mixed.count()
    print(f"mixture: {n_mix} windows, first 12 by key: {head}")
    assert n_mix == compacted.count() + code_win.count()

    # -------------------------- catalog-pinned, rank-sliced mixture
    # the production shape: publish the code set as its own catalog
    # root, resolve BOTH roots' current generations ONCE
    # (read_mixture_current returns the pins for the trainer
    # checkpoint), and let each rank read its LPT slice of every set
    # interleaved rank-locally — union over ranks = the mixture
    # exactly once, and a promotion landing mid-epoch never moves a
    # pinned reader (gen data survives until the sweep).
    from streaming_parquet_spark.operators.catalog import (
        read_mixture_current,
    )

    code_root = os.path.join(work, "code_sets")
    cg, cpath = next_generation(code_root)
    write_token_shards(
        code_win, cpath, ids, budget=256, shard_col="shard", eos_id=5
    )
    publish_generation(spark, code_root, cg, vocab_ids=ids)
    roots = {"pretrain": root, "code": code_root}
    weights = {"pretrain": 3, "code": 1}
    n_ranks = 0
    _m, _c, pins = read_mixture_current(spark, roots, weights,
                                        vocab_ids=ids)
    for rank in range(4):
        part, _c, p = read_mixture_current(
            spark, roots, weights, vocab_ids=ids, pins=pins,
            rank=rank, world_size=4,
        )
        assert p == pins
        n_ranks += part.count()
    assert n_ranks == n_mix
    print(f"pinned mixture {pins}: 4 ranks read {n_ranks} windows "
          f"(each exactly once)")

    # ------------------------------------------------ periodic audit
    # the content-addressable close of the loop: every committed
    # generation re-fingerprints against its write-once marker —
    # ok=True (intact), ok=None (dropped, or legally grown past its
    # publish-time floor), ok=False (a storage-integrity incident)
    from streaming_parquet_spark.operators.catalog import audit_catalog

    for r in audit_catalog(spark, root):
        print(f"audit gen {r['generation']}: ok={r['ok']}"
              + (" (dropped)" if r.get("dropped") else "")
              + (" (grown)" if r.get("grown") else ""))
        assert r["ok"] is not False


if __name__ == "__main__":
    main()
