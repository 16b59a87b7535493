"""End-to-end training-data pipeline example: compose the extension
operators into the corpus-preparation flow a pretraining run needs —

  read documents
    -> quality scoring + filter
    -> near-duplicate removal (MinHash LSH pairs -> connected
       components -> keep the highest-quality member per cluster)
    -> DSIR importance selection toward a target domain
    -> deterministic stratified sampling per language
    -> leakage-safe train/val/test split (hash of the near-dup
       cluster id, so residual near-dups never straddle splits)
    -> stable example ids (distributed zipWithIndex)
    -> Z-ordered parquet write + small-file compaction
    -> profile the shipped table
    -> TRAINABLE tensors: BPE ids under persisted tokenizer + id
       artifacts, fixed-length packed windows with next-token labels
       and document-boundary slots (block-diagonal attention masks)

Everything except the final stats is a Catalyst plan — no collects on
corpus-sized data; the same script scales from the sf0.001 fixture to
a cluster by changing the input path and master.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_parquet_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_corpus"
    spark = get_spark(app_name="training-pipeline", master="local[4]",
                      shuffle_partitions=8)

    from streaming_parquet_spark.operators.cluster import (
        cluster_representatives,
        connected_components,
    )
    from streaming_parquet_spark.operators.dedup import minhash_lsh_pairs
    from streaming_parquet_spark.operators.layout import (
        assign_contiguous_ids,
        zorder_repartition,
    )
    from streaming_parquet_spark.operators.maintenance import compact_files
    from streaming_parquet_spark.operators.pipeline import (
        leakage_safe_split,
        stratified_sample,
    )
    from streaming_parquet_spark.operators.profile import profile_columns
    from streaming_parquet_spark.operators.text import with_quality

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. quality scoring + filter — first the heuristic gate, then a
    #    LEARNED one (the GPT-3/CCNet recipe): fit a fastText-shaped
    #    classifier on a labeled sample (here: the heuristic's own
    #    confident extremes vs synthetic gibberish stand in for human
    #    labels) and keep docs the model scores above the 0.5 boundary.
    #    The fit sees only the sample; scoring is one broadcast pass.
    from streaming_parquet_spark.operators.text import (
        classifier_filter,
        fit_text_classifier,
    )

    scored = with_quality(docs)
    kept = scored.filter(F.col("quality_score") >= 0.7).select(
        "doc_id", "text", "lang", "source", "n_chars", "quality_score"
    )
    pos_sample = kept.orderBy(F.desc("quality_score"), "doc_id").limit(64)
    # negative ids NEGATED into their own range: fit_text_classifier
    # groups hashed features by id, so a neg id colliding with a pos id
    # would merge two documents' features under contradictory labels —
    # -1-doc_id cannot collide with any non-negative real id at any
    # corpus size (a fixed +N offset would re-collide past N docs)
    neg_sample = docs.select(
        (F.lit(-1) - F.col("doc_id")).alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 12),"
            " i -> concat('zx', CAST(pmod(doc_id + i, 17) AS STRING))))"
        ).alias("text"),
    ).limit(64)
    clf = fit_text_classifier(pos_sample, neg_sample, buckets=256)
    kept = classifier_filter(kept, clf, min_logit=0.0, buckets=256)

    # 2. near-dup removal: LSH candidate pairs -> components -> keep
    #    the highest-quality member of every duplicate cluster.
    #    max_bucket_rows is the 100 TB hot-bucket guard: a boilerplate
    #    bucket emits |bucket|^2 candidates however AQE splits the work,
    #    so over-full buckets are excluded from the pairwise stage (the
    #    fixture corpus never hits a 10k bucket; at real scale this cap
    #    is what keeps the candidate volume linear).
    pairs = minhash_lsh_pairs(kept, max_bucket_rows=10_000)
    reps = cluster_representatives(pairs, kept, quality_col="quality_score")
    members = connected_components(pairs)
    drop = (
        members.join(reps, "component")
        .filter(F.col("id") != F.col("rep_id"))
        .select(F.col("id").alias("doc_id"))
    )
    deduped = kept.join(drop, "doc_id", "left_anti")

    # 2b. exact SUBSTRING dedup (Lee 2022 ExactSubstr): document-level
    #     near-dup removal above cannot see a boilerplate paragraph
    #     embedded in otherwise-distinct documents — remove every
    #     duplicated 20-token run, first occurrence wins.
    from streaming_parquet_spark.operators.dedup import (
        exact_substring_dedup,
    )

    scrubbed = exact_substring_dedup(
        deduped, window_tokens=20, id_col="doc_id", text_col="text"
    ).select("doc_id", F.col("text_clean").alias("text"))
    deduped = (
        deduped.drop("text")
        .join(scrubbed, "doc_id")
        # n_chars must describe the text we SHIP (the scrub can shorten
        # it), downstream z-ordering and budgeting read it
        .withColumn("n_chars", F.length("text"))
    )

    # 3. DSIR importance selection (Xie et al. 2023): score every doc
    #    by how target-like its hashed-ngram distribution is (here the
    #    target model is the corpus's own English slice) and DROP the
    #    most off-target tail — phrased as an anti-join against the
    #    drop set, so zero-token docs (which have no weight row at
    #    all) pass through rather than silently vanishing. The cutoff
    #    is PER TOKEN (weight is an un-normalized sum of per-token log
    #    ratios, so a fixed total would punish length, not direction):
    #    drop docs averaging more than 0.5 ln units off-target per
    #    token, in the operator's 2^20 fixed-point units.
    from streaming_parquet_spark.operators.pipeline import dsir_weights

    w = dsir_weights(deduped, deduped.filter(F.col("lang") == "en"))
    off_target = w.filter(
        F.col("dsir_weight") < F.lit(-(1 << 19)) * F.col("n_tokens")
    ).select("doc_id")
    selected = deduped.join(off_target, "doc_id", "left_anti")

    # 3b. REAL token counts AND trainable integer ids: fit a BPE merge
    #     table on the selected corpus (word-frequency table ->
    #     driver-side merge loop, deterministic), freeze the id
    #     vocabulary from the encoded corpus, persist BOTH as pinned
    #     artifacts (any later job applies the identical tokenization
    #     or fails fast), then tokenize straight to array<int> ids —
    #     n_bpe_tokens replaces the chars/4 estimate for everything
    #     downstream that budgets by tokens.
    from streaming_parquet_spark.operators.tokenize import (
        apply_bpe,
        fit_bpe_merges,
        subword_vocab,
        tokens_to_ids,
        write_bpe_merges,
        write_subword_ids,
    )

    merges = fit_bpe_merges(selected, n_merges=256)
    # encode ONCE and persist: the vocab freeze and the id mapping both
    # consume it (re-encoding would run the Arrow pass twice), and the
    # materialization also keeps the UDF out of the vocab's
    # explode+distinct plan (Spark 4 cannot evaluate a pandas UDF that
    # the optimizer collapses into that aggregate over this deep a
    # lineage)
    encoded = apply_bpe(selected, merges).persist()
    # FIM sentinels are FREEZE-TIME contract: declaring them here
    # reserves ids 2/3/4 ahead of every corpus piece (tokenization can
    # never emit them), and write_subword_ids pins the block
    FIM = ("<fim_prefix>", "<fim_middle>", "<fim_suffix>")
    vocab_ids = subword_vocab(encoded, "bpe_tokens", extra_specials=FIM)
    write_bpe_merges(merges, "maw_example_bpe")
    write_subword_ids(vocab_ids, "maw_example_ids")
    tokenized = tokens_to_ids(encoded, vocab_ids, "bpe_tokens").drop(
        "bpe_tokens"
    )

    # 4. deterministic per-language sampling + split + stable ids
    sampled = stratified_sample(
        tokenized,
        rates={"en": 1.0, "de": 0.8, "fr": 0.8},
        strat_col="lang",
        default_rate=0.5,
    )
    # leakage-safe: keep-one dedup above removes each cluster's
    # non-representatives, but pairs suppressed by the hot-bucket cap
    # (and near-dups below the LSH threshold) can leave residual
    # near-duplicates in the corpus — keying the split on the pair
    # graph's components guarantees such survivors still land in the
    # SAME split instead of leaking train text into test.  The
    # component map from step 2 is REUSED (components=) — recomputing
    # it would re-run the CC loop and the LSH pair lineage.
    split = leakage_safe_split(
        sampled, id_col="doc_id", components=members
    )
    final = assign_contiguous_ids(
        split.select("doc_id", "lang", "source", "n_chars",
                     "n_bpe_tokens", "bpe_tokens_ids", "split", "text"),
        ["lang", "doc_id"],
        out_col="example_id",
    )

    # 5. Z-ordered write (prunable in BOTH length and id), compact
    shutil.rmtree(out, ignore_errors=True)
    zorder_repartition(
        final,
        [F.col("n_chars") % 256, F.col("doc_id") % 256],
        num_files=4,
    ).write.parquet(out)
    res = compact_files(spark, out, target_mb=128)

    # 6. profile what we shipped
    prof = profile_columns(
        spark.read.parquet(out), ["lang", "source", "split"]
    )

    print(f"docs in: {n0}  after quality: {kept.count()}  "
          f"after dedup: {deduped.count()}  shipped: {res.rows} rows "
          f"in {res.files_after} file(s)")
    prof.show(truncate=False)

    # 6b. the TRAINABLE tensors: re-cut each split's id stream into
    #     fixed 256-id windows (tail zero-padded) with next-token
    #     labels and the in-window document-boundary slots
    #     block-diagonal attention masks need.  Packing per SPLIT here
    #     (per training SHARD at 100 TB) keeps windows from ever
    #     crossing the partition key.  Pure Catalyst — no UDF.
    from streaming_parquet_spark.operators.pipeline import (
        fim_transform,
        pack_token_windows,
        read_token_shards,
        verify_token_shards,
        with_causal_labels,
        write_token_shards,
    )

    # pack from the parquet just shipped, not the in-memory lineage:
    # `final` would re-run the Arrow id pass, the sampling joins, and
    # the zipWithIndex job — rows already sitting compacted at `out`.
    # FIM first (document-level, between tokenize and pack — the
    # Bavarian 2022 placement): half the docs re-arrange as
    # prefix/suffix/middle with the vocab-reserved sentinel ids, a
    # stateless projection the packing stream absorbs like any ids.
    fimmed = fim_transform(
        spark.read.parquet(out), "bpe_tokens_ids",
        pre_id=2, mid_id=3, suf_id=4,
        id_col="example_id", rate_pct=50,
    )
    windows = pack_token_windows(
        fimmed, "bpe_tokens_ids", budget=256,
        order_col="example_id", part_col="split", pad_id=0,
    )
    # 6c. SHIP the tensors as a verified shard set: the contract
    #     (budget, pad id, and the id table's fingerprint) rides a
    #     _manifest sidecar, so a training run holding the wrong
    #     tokenizer artifact is refused at read time instead of
    #     silently embedding scrambled ids — and every shard's content
    #     fingerprint is re-checkable after any copy/move.
    shutil.rmtree(out + "_windows", ignore_errors=True)
    write_token_shards(
        windows, out + "_windows", vocab_ids, budget=256,
        shard_col="split", pad_id=0,
    )
    shards, contract = read_token_shards(
        spark, out + "_windows", vocab_ids=vocab_ids  # fp must match
    )
    ready = with_causal_labels(shards)  # labels at load time, free
    checks = verify_token_shards(spark, out + "_windows")
    wstats = ready.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("n_tokens").alias("real_tokens"),
        F.sum(F.size("doc_starts")).alias("doc_boundaries"),
    )
    print(f"shard set verified: {checks.filter('ok').count()}/"
          f"{checks.count()} shards ok under contract "
          f"budget={contract['budget']} vocab={contract['vocab_size']}")
    wstats.show()

    # 7. every LATER ingest batch runs incrementally: persist the
    #    shipped corpus's LSH index once, then probe it per batch —
    #    the corpus is never re-shingled and never shuffles, so
    #    per-batch cost scales with the batch. Survivors would get
    #    fresh example ids and append_to_lsh_index folds them in for
    #    the next batch (probe -> survivors -> append loop).
    from streaming_parquet_spark.operators.dedup import (
        incremental_dedup,
        write_lsh_index,
    )

    write_lsh_index(final, "maw_example_corpus_lsh", id_col="example_id")
    batch = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    fresh = incremental_dedup(
        batch, "maw_example_corpus_lsh", max_bucket_rows=10_000
    )
    print(f"incremental batch: {batch.count()} in, {fresh.count()} "
          f"genuinely new after probing the corpus index")
    for t in ("maw_example_corpus_lsh_sets", "maw_example_corpus_lsh_bands",
              "maw_example_bpe", "maw_example_ids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
