"""Plan-quality regression tests: every registered query must compile
to a physical plan with no accidental scale hazards.

Asserted invariants (the SURVEY §4 'what Catalyst gives us' contract):
  * no CartesianProduct — every pairwise operator joins on a key
    (band hash, LSH bucket, block columns); BroadcastNestedLoopJoin is
    allowed only where a broadcast query-set is the intended shape
    (cosine top-k / ANN probing).
  * no row-at-a-time Python UDFs (BatchEvalPython) — Python appears only
    Arrow-batched (mapInPandas, ArrowEvalPython) in multimodal plumbing.
  * parquet scans prune columns: no registered query reads every column
    of lineitem (the widest table) unless it projects them.
"""

import pytest

import streaming_parquet_spark.queries_ext  # noqa: F401  (registers extensions)
import streaming_parquet_spark.queries_tpch  # noqa: F401  (registers TPC-H family)
from streaming_parquet_spark.queries import QUERIES

# Queries whose *intended* shape is a broadcast nested-loop (small
# broadcast query/centroid set against the corpus, or a 1-row scalar
# subquery result joined under a non-equi predicate).
_BNLJ_OK = {
    "embed_ann_bucketed",   # LSH bucket probe + IVF centroid broadcast
    "embed_ann_quantized",  # SQ8 broadcast query-set x corpus codes
    "dedup_lsh_recall",    # 1-row x 1-row count crossJoin (n_true, n_hit)
    "embed_ann_recall",    # cosine_topk baseline + IVF centroid broadcast
    "text_vectors",        # 1-row corpus-count (N) broadcast (tfidf + sparse-cos branches)
    "text_class_stats",    # 1-row corpus-count (N) broadcast (chi2 +
                           # drift corpus-norm branches)
    "text_df_assoc",       # 1-row corpus-count (N) broadcast (cooccurrence branch)
    "text_doc_scores",     # 1-row vocabulary-size (V) broadcast (LM branch)
    "embed_exact",         # broadcast query set (cosine top-k branch)
    "pipeline_order_family",  # 1-row domain-count broadcast (interleave branch)
    "pipeline_select",     # 1-row corpus/target token totals (dsir branch)
    "rel_skew_family",     # 1-row totals broadcast (skew_report branch)
    "events_cohort",       # 1-row reference-epoch (max day) broadcast (rfm branch)
    "dedup_semantic",      # IVF centroid assignment (8-row broadcast)
    "q22_idle_customers",  # scalar AVG subquery, c_acctbal > avg (1 row)
    "embed_ann_ivf_quantized",  # IVF centroid assignment (8-row broadcast)
    "events_series_family",  # 1-row query-window broadcast (subseq branch)
    "rel_bloom_semi_join",   # 1-row Bloom-bitmap broadcast (scan-stage filter)
    "embed_iterative",     # IVF centroid assignment (8-row broadcast, kmeans branch)
    # derived-partsupp family: 1-row supplier-count broadcast (the only
    # BNLJ left after the 4-way fanout became a Generate); q11 adds the
    # 1-row HAVING-threshold non-equi broadcast
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_parts_supplier_cnt",
    "q20_promotion_suppliers",
}


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_hazards(name, spark, sf_dir):
    plan = _physical_plan(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unintended broadcast nested-loop join"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )


def test_q19_pushes_brand_filter_to_part_scan(spark, sf_dir):
    """Catalyst must extract the common p_brand conjunct from the OR and
    push it into the part scan (PushedFilters: In(p_brand, ...))."""
    plan = _physical_plan(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "p_brand" in plan.split("PushedFilters", 2)[-1][:4000], (
        "brand predicate not pushed to a scan"
    )


def test_q10_topk_avoids_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject, never a
    full global Sort + Exchange of the aggregate output."""
    plan = _physical_plan(QUERIES["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_q4_semi_join_carries_no_payload(spark, sf_dir):
    """The correlated EXISTS compiles to a LeftSemi join, not an inner
    join + dedup."""
    plan = _physical_plan(QUERIES["q4_late_shipments"](spark, sf_dir))
    assert "LeftSemi" in plan, plan[:2000]


def test_q1_aggregates_partially_before_shuffle(spark, sf_dir):
    """Map-side partial aggregation must appear under the exchange
    (two HashAggregate levels around one Exchange)."""
    plan = _physical_plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_q21_single_data_exchange(spark, sf_dir):
    """Q21's two nested aggregates must BOTH reuse the one explicit
    hash-repartition by l_orderkey (HashPartitioning on a subset of the
    grouping keys satisfies the clustering requirement), so the plan
    carries exactly ONE non-broadcast shuffle of lineitem-derived rows
    plus the tiny final s_name aggregate exchange — the r7 shape that
    replaced spread + two agg exchanges (~70% of the gate's time)."""
    plan = _physical_plan(QUERIES["q21_waiting_suppliers"](spark, sf_dir))
    import re

    data_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange hashpartitioning", ln)
    ]
    non_final = [ln for ln in data_exchanges if "s_name" not in ln]
    assert len(non_final) == 1 and "l_orderkey" in non_final[0], plan[:4000]


def test_skew_join_aqe_split(spark, sf_dir, tmp_path):
    """With broadcast disabled and AQE skew thresholds scaled to fixture
    volume, the deliberately skewed join in rel_skew_join_aqe must be
    split by OptimizeSkewedJoin — the runtime plan marks the join
    skew=true and reads the hot partition in advisory-sized slices.
    This is the AQE counterpart of the manual salted-join escape hatch
    (rel_salted_join_agg): proof the engine's default configs let Spark
    absorb a hot key without hand-tuning.

    Skew slices are cut on MAPPER-output boundaries
    (ShufflePartitionsUtil.createSkewPartitionSpecs), and the sf0.001
    fixture is one parquet file with ONE row group — a single scan task
    produces every row, so the hot partition is one indivisible block
    no matter the thresholds. Re-chunk lineitem into many row groups
    (what any at-scale input looks like) so the scan fans out into
    several mappers, then AQE has boundaries to split on."""
    import os

    import pyarrow.parquet as pq

    skew_dir = tmp_path / "skew_sf"
    skew_dir.mkdir()
    # the merged rel_skew_family gate's salted branch also reads
    # customer + nation; symlink every fixture table so both branches
    # resolve against the rechunked dir
    for name in ("lineitem", "orders", "customer", "nation"):
        src = os.path.join(sf_dir, f"{name}.parquet")
        if name == "lineitem":
            pq.write_table(
                pq.read_table(src), skew_dir / "lineitem.parquet",
                row_group_size=800,
            )
        else:
            os.symlink(src, skew_dir / f"{name}.parquet")

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        # One scan split per row group so several mappers feed the
        # shuffle (splits only produce rows for row groups whose
        # midpoint falls inside them).
        "spark.sql.files.maxPartitionBytes": "24KB",
        "spark.sql.files.openCostInBytes": "0",
        # Coalescing first would merge the tiny non-skewed partitions
        # into units larger than the skew threshold; keep them apart.
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = QUERIES["rel_skew_family"](spark, str(skew_dir))
        df.collect()  # executes the Dataset's own QueryExecution (AQE final plan)
        plan = _physical_plan(df)
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name,table,allowed",
    [
        ("text_chunk_docs", "documents", {"doc_id", "text"}),
        ("dedup_span_family", "documents",
         {"doc_id", "text", "lang", "source"}),
        # r7 family gates: the union of the constituents' columns,
        # still strictly narrower than the full table
        ("pipeline_select", "documents",
         {"doc_id", "lang", "source", "text", "n_chars"}),
        ("embed_iterative", "embeddings", {"vec_id", "embedding"}),
        ("events_cdc", "events",
         {"event_id", "ts", "user_id", "event_type", "value"}),
        # r6 additions: the mix/shuffle/interleave gates carry only ids
        # and their group column to the scan
        ("pipeline_temperature_mix", "documents", {"doc_id", "lang"}),
        ("pipeline_order_family", "documents", {"doc_id", "source"}),
    ],
)
def test_scan_prunes_columns(name, table, allowed, spark, sf_dir):
    """Column pruning must reach the parquet scan: the ReadSchema of the
    named table's scan may only contain the columns the query uses."""
    plan = _physical_plan(QUERIES[name](spark, sf_dir))
    import re

    read = None
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c}
        # identify this scan by its column names being a subset of the
        # table's schema; documents/events/embeddings never share names
        read = cols if cols and not (cols - _TABLE_COLS[table]) else read
    assert read is not None, f"{name}: no {table} scan found\n{plan[:1500]}"
    assert read <= allowed, (
        f"{name}: scan reads {sorted(read - allowed)} beyond {sorted(allowed)}"
    )


_TABLE_COLS = {
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
}


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a Hive-partition column must prune at planning
    time: the scan's PartitionFilters carries the predicate and only
    the matching partition's files are selected."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "part")
    spark.range(1000).select(
        "id", (F.col("id") % 5).alias("bucket")
    ).write.partitionBy("bucket").parquet(path)

    df = spark.read.parquet(path).filter(F.col("bucket") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    # only 1 of 5 partition directories survives pruning
    assert df.count() == 200


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    """A value predicate must reach the parquet reader as
    PushedFilters, not evaluate post-scan only."""
    import os

    import pyspark.sql.functions as F

    df = spark.read.parquet(
        os.path.join(sf_dir, "orders.parquet")
    ).filter(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "LessThan(o_orderkey,100)" in plan


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """write_bucketed + bucketed_equijoin: with both sides bucketed on
    the join key (same bucket count, one sorted file per bucket), the
    SortMergeJoin must read the buckets directly — NO Exchange and NO
    Sort anywhere below the join. This is the ingest-time-amortized
    join layout for 100 TB; the plan assertion is the point."""
    import pyspark.sql.functions as F

    from streaming_parquet_spark.operators.layout import (
        bucketed_equijoin,
        write_bucketed,
    )
    from streaming_parquet_spark.queries import _t

    write_bucketed(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        "maw_bkt_plan_orders", "o_custkey", buckets=8,
    )
    write_bucketed(
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "maw_bkt_plan_customer", "o_custkey", buckets=8,
    )
    joined = bucketed_equijoin(
        spark, "maw_bkt_plan_orders", "maw_bkt_plan_customer", "o_custkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:2000]   # the bucketing win
    assert "Bucketed: true" in plan
    # Spark >= 3.0 re-sorts each bucket locally by default even though
    # the files are written sorted (outputOrdering trust moved behind a
    # legacy flag): that is a LINEAR per-bucket sort with no shuffle —
    # exactly two of them, one per side, and nothing else.
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert join_part.count("- Sort [") == 2, join_part[:2000]
    # result sanity: every order matched exactly once
    n = joined.count()
    expected = _t(spark, sf_dir, "orders").count()
    assert n == expected
