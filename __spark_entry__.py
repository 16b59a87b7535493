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


# Round-2 driver budget covered only the first 50 registered queries;
# run the queries that have never had a driver-side CORRECTNESS row
# first so a partial sweep still lands hard signal where it is missing
# (VERDICT.md round 2, item 1).  Names absent from this list keep their
# registration order after it.
_DRIVER_PRIORITY = [
    # round-3 additions (no prior CORRECTNESS row) first
    "rel_skew_join_aqe", "text_gopher_quality", "text_contamination",
    "pipeline_domain_mix", "pipeline_stratified_sample",
    "embed_kmeans_step",
    # round-2 backlog
    "q4_late_shipments", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q12_priority_lines",
    "q13_order_count_dist", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_qty_revenue", "q18_large_orders", "q19_disjunctive_revenue",
    "q22_idle_customers", "rel_percentiles", "rel_grouping_sets",
    "rel_scalar_funcs", "rel_window_funcs", "rel_array_agg",
    "rel_salted_join_agg", "events_gap_fill", "events_asof_forward",
    "events_asof_tolerance", "pipeline_train_split",
    "pipeline_pack_sequences", "dedup_semantic", "embed_ann_sq8",
    "stream_ingest_counts", "q2_min_cost_supplier", "q11_important_stock",
    "q16_parts_supplier_cnt", "q20_promotion_suppliers",
    "q21_waiting_suppliers", "embed_ann_ivf_sq8", "multimodal_decode",
    "stream_late_dedup",
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
