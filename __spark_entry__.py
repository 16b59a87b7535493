"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``streaming_parquet_spark`` (queries registered
in streaming_parquet_spark/queries.py and the extension operator
modules); this file is the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)
# Spark Python workers resolve cloudpickled closures (mapInPandas
# operators) by module name and read PYTHONPATH at worker-daemon spawn.
# Export the repo root now — before any session runs a Python UDF — so
# the contract works regardless of how the harness built its session.
if _ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _ROOT + (os.pathsep + os.environ["PYTHONPATH"]
                 if os.environ.get("PYTHONPATH") else "")
    )

from streaming_parquet_spark.queries import ORACLES, QUERIES  # noqa: E402
import streaming_parquet_spark.queries_ext  # noqa: E402,F401  (registers extensions)
import streaming_parquet_spark.queries_tpch  # noqa: E402,F401  (registers TPC-H family)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary over sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver budget caps CORRECTNESS at ~50 rows/round, so rotate:
# queries with no CORRECTNESS row yet run first, then the queries whose
# newest green row is oldest (r2, i.e. absent from CORRECTNESS_r03.json),
# so no query's newest row ever goes >1 round stale (VERDICT.md round 3,
# item 1).  Names absent from this list keep registration order after it.
_DRIVER_PRIORITY = [
    # round-4 additions (no prior CORRECTNESS row) first
    "events_scd2", "events_ohlc", "events_funnel",
    "rel_bloom_semi_join", "pipeline_zorder", "events_ewma",
    "text_distinct_hll", "text_heavy_hitters_cms", "events_transitions",
    "engine_profile", "events_snapshot_diff", "pipeline_weighted_sample",
    "rel_fuzzy_join", "stream_upsert_sink",
    "rel_pagerank_step", "pipeline_assign_ids", "events_max_concurrency",
    "embed_ann_recall_pq",
    "embed_ann_recall", "dedup_clusters_ls", "pipeline_topn_per_stratum",
    "pipeline_domain_resample", "text_tfidf_topk",
    "dedup_paragraphs", "text_chunk_docs", "pipeline_token_budget",
    "dedup_cluster_reps", "embed_random_projection",
    "stream_interval_join", "stream_session_state",
    "events_hypertable_rollup", "events_upsert_latest",
    "pipeline_rank_filter", "embed_ann_pq", "embed_power_iteration", "pipeline_epoch_upsample", "events_anomaly_zscore", "text_lm_score", "multimodal_audio", "multimodal_features", "multimodal_resize", "pipeline_shard_manifest", "embed_ann_ivf_pq", "events_ts_similarity", "text_sparse_cosine", "stream_windowed_counts", "stream_static_join", "pipeline_end_to_end", "dedup_containment",
    # queries whose newest row is r2 (absent from CORRECTNESS_r03.json)
    "rel_join_agg_segment", "rel_semi_anti_join", "rel_distinct",
    "rel_agg_stats", "rel_window_topk", "rel_window_running",
    "rel_sort_limit", "rel_set_ops", "rel_except", "rel_rollup",
    "rel_exists_subquery", "rel_cube", "rel_pivot",
    "events_tumbling_window", "events_sliding_window",
    "events_json_extract", "events_sessionize", "dedup_exact",
    "text_fingerprint", "dedup_minhash_sig", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_clusters", "embed_cosine_topk", "embed_near_pairs",
    "embed_ann_ivf", "embed_ann_lsh", "text_tokens", "text_quality",
    "part_range_join", "events_asof_join", "pipeline_clean_corpus",
    "text_pii_scrub", "text_ngram_df", "text_langid", "multimodal_bytes",
    "multimodal_frames", "pipeline_hash_sample",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted entries get the
    driver's weaker rows-only check)."""
    return dict(ORACLES)
