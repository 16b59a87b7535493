"""The interleaved image-text training-data path, end to end: raw
multimodal documents (text runs + image blobs) become VERIFIED
trainable windows with both planes under the manifest discipline —
the token plane through the shard contract, the pixel plane through
the content-addressed payload store the windows' spans point into.

  ingest    raw rows -> content-addressed blobs (mint_payload_refs)
            -> write_payload_store (hash-sharded, per-(shard, wave)
            XOR fingerprints); later waves append_payload_store
            (identical content skips, forged keys refuse, crashed
            appends repair by replay)
  segments  documents as ordered segment streams: text id runs +
            atomic n_patches image runs carrying their payload refs
  split     split_multimodal_documents: documents longer than the
            window budget cut ONLY inside text runs (images atomic);
            sub_order is the packer-ready unique key
  pack      pack_multimodal_windows: greedy in-order bucket packing,
            images never split across windows, modality-tagged spans
  labels    multimodal_loss_spans + with_span_labels: text positions
            supervise, image patch positions mask to ignore_index
  persist   write_token_shards: the token plane under the pinned
            shard contract (budget, pad/eos, VOCABULARY fingerprint)
  verify    verify_token_shards (token plane); the pixel plane is
            verified INSIDE publish_payload_generation (publish-after-
            verify) — absence / corruption / tamper all surface
  resolve   resolve_payload_refs: each window's image spans join back
            to their blobs with the shard key recomputed from the ref
            (the store scan prunes); strict mode raises on any ref
            the store cannot honor
  retire    the catalog path (r15): payload generations under the
            same swap protocol as the token plane — publish-after-
            verify, promote_payload_compaction (compact referenced
            blobs -> prove content preservation -> publish -> retire),
            producers probe retirement, resolvers pin a generation
            and keep reading through the drop-grace window

Run: python examples/multimodal_pipeline.py [sf_dir] [workdir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_parquet_spark import get_spark
from streaming_parquet_spark.operators.catalog import (
    current_payload_store,
    next_generation,
    promote_payload_compaction,
    publish_payload_generation,
)
from streaming_parquet_spark.operators.multimodal import (
    append_payload_store,
    mint_payload_refs,
    multimodal_loss_spans,
    orphan_payload_refs,
    pack_multimodal_windows,
    resolve_payload_refs,
    split_multimodal_documents,
    write_payload_store,
)
from streaming_parquet_spark.operators.pipeline import (
    verify_token_shards,
    with_span_labels,
    write_token_shards,
)
from streaming_parquet_spark.operators.tokenize import (
    apply_bpe,
    fit_bpe_merges,
    subword_vocab,
)


def main(sf_dir: str, work: str) -> None:
    spark = get_spark(app_name="multimodal-pipeline")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    proot = os.path.join(work, "payload_catalog")
    shards = os.path.join(work, "shards")

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).limit(400)

    # ---- pixel plane: a payload GENERATION under the catalog --------
    # the fixtures carry no real media; the blobs here are the text
    # bytes — in production these are the raw image bytes off the lake
    blobs = (
        mint_payload_refs(
            docs.select(F.col("text").cast("binary").alias("payload"))
        )
        .dropDuplicates(["ref"])
        .select("ref", "payload")
    )
    gen1, store = next_generation(proot)
    first, rest = blobs.limit(300), blobs.subtract(blobs.limit(300))
    write_payload_store(first, store, n_shards=8)
    wave = append_payload_store(rest, store)  # later ingest wave
    assert append_payload_store(rest, store).count() == 0  # replay no-op
    # publish runs verify_payload_store internally — publish-after-
    # verify IS the contract, so no second scan is needed here
    doc = publish_payload_generation(spark, proot, gen1)
    print(
        f"payload gen {doc['generation']}: +{wave.count()} wave rows, "
        f"{doc['n_payloads']} blobs published (verified at publish)"
    )
    # the resolver's pin: hold this path for the whole epoch
    _g, store, _contract = current_payload_store(spark, proot)

    # ---- token plane: tokenize, then interleave text with images ----
    merges = fit_bpe_merges(docs, n_merges=64)
    enc = apply_bpe(docs, merges).persist()
    ids = subword_vocab(enc, "bpe_tokens")
    encoded = apply_bpe(docs, merges, ids=ids).select(
        "source", "doc_id", "bpe_tokens_ids", "text"
    )
    # every third document carries an image whose ref is the document
    # text's content hash — i.e., a blob the store above really holds
    text_seg = F.struct(
        F.lit("text").alias("modality"),
        F.col("bpe_tokens_ids").cast("array<bigint>").alias("ids"),
        F.lit(None).cast("string").alias("ref"),
        F.lit(None).cast("int").alias("n_patches"),
    )
    img_seg = F.struct(
        F.lit("image").alias("modality"),
        F.lit(None).cast("array<bigint>").alias("ids"),
        F.md5(F.col("text").cast("binary")).alias("ref"),
        (F.lit(4) + F.col("doc_id") % 13).cast("int").alias("n_patches"),
    )
    segged = encoded.select(
        "source", "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.array(text_seg, img_seg))
        .otherwise(F.array(text_seg)).alias("segments"),
    )

    # ---- split -> pack -> labels -------------------------------------
    budget = 128
    sub = split_multimodal_documents(segged, "segments", budget=budget)
    win = pack_multimodal_windows(
        sub, "segments", budget=budget, part_col="source",
        order_col="sub_order", image_token_id=1, eos_id=2,
    )
    labeled = with_span_labels(multimodal_loss_spans(win), "loss_spans")
    n_win = labeled.count()
    n_masked = labeled.select(
        F.sum(F.size(F.filter("labels", lambda x: x == -100)))
    ).first()[0]
    print(f"packed {n_win} windows; {n_masked} masked label positions")

    # ---- persist + verify BOTH planes --------------------------------
    write_token_shards(
        win, shards, ids, budget=budget, shard_col="source"
    )
    tok_bad = verify_token_shards(spark, shards).where("NOT ok").count()
    print(f"token shards verify bad={tok_bad}")

    # ---- resolve the pixel plane back onto the windows ---------------
    resolved = resolve_payload_refs(
        win, store, id_cols=("source", "win")
    )
    print(f"resolved {resolved.count()} image spans to payloads")

    # ---- retention: promote a compacted generation --------------------
    # the catalog runs the whole swap in the only safe order: compact
    # the referenced blobs into the next generation, PROVE the content
    # carried over, verify+publish, retire the source.  A resolver
    # holding the old pin keeps reading (drop-grace window); producers
    # pointed at the retired store now refuse.
    orphans = orphan_payload_refs(win, store)
    n_orphans = orphans.count()
    # promote proves content preservation AND re-verifies the new
    # store's data before the commit marker lands — no extra scan
    gen2, man = promote_payload_compaction(spark, proot, win)
    n_kept = sum(int(r["n_payloads"]) for r in man.collect())
    pinned_ok = resolve_payload_refs(
        win, store, id_cols=("source", "win")
    ).count()  # the OLD pin still resolves — grace window
    try:
        append_payload_store(blobs.limit(1), store)
        raise AssertionError("retired store accepted an append")
    except ValueError:
        pass
    print(
        f"retention: {n_orphans} orphan blobs swept; gen {gen2} "
        f"published with {n_kept} kept blobs (verified at publish); "
        f"pinned resolver still serves {pinned_ok} spans; retired "
        f"store refuses producers"
    )
    assert tok_bad == 0
    print("OK: both planes verified end to end")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/maw_multimodal_example"
    main(sf, wd)
