"""Graph analytics steps in exact fixed-point arithmetic, sharing the
design rules of the repo's other iterative operators (kmeans_step,
power_iteration_step, connected components): each iteration is a
narrow shuffle over EDGES, node state lives in a DataFrame (never the
driver), and all arithmetic is integer so any partitioning — and any
engine, which is what the oracle checks — produces identical bits.

PageRank (Brin & Page 1998) here is ONE damped iteration: callers loop
it to convergence exactly like kmeans_step, checkpointing every few
rounds to truncate lineage. At 100 TB of edges, the iteration cost is
one groupBy(dst) over edge contributions plus a broadcast of node
ranks if nodes fit (else a shuffle join on src) — the standard
edge-cut formulation; skewed high-degree vertices are the usual salt/
split-by-src cases.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point scale for ranks (1.0 == SCALE)
SCALE = 1_000_000


def pagerank_step(
    edges: DataFrame,
    ranks: DataFrame,
    n_nodes: int,
    damping_pct: int = 85,
) -> DataFrame:
    """One PageRank iteration over weighted ``edges`` (src, dst, w)
    from integer ``ranks`` (node, rank) at SCALE fixed point:

      contrib(e) = (rank[src] * w) DIV out_w[src]
      rank'(d)   = ((100 - damping_pct) * (SCALE DIV n_nodes)
                    + damping_pct * sum(contrib into d)) DIV 100

    Every step is integer (floor) arithmetic in a fixed expression
    order, so the result is independent of partitioning and exactly
    reproducible by the SQL oracle. Dangling mass is dropped (nodes
    with no out-edges contribute nothing) — the simplest of the
    documented dangling-node conventions; totals therefore shrink
    slightly rather than renormalize.

    Plan: out-weight aggregate over edges (partial-aggregated), then
    contributions joined src->rank and aggregated by dst — two narrow
    shuffles on node keys; ranks broadcast when small."""
    out_w = edges.groupBy("src").agg(F.sum("w").alias("__ow"))
    contrib = (
        edges.join(out_w, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(
            F.col("dst").alias("node"),
            F.expr("(rank * w) DIV __ow").alias("__c"),
        )
        .groupBy("node")
        .agg(F.sum("__c").alias("__in"))
    )
    base = (100 - damping_pct) * (SCALE // n_nodes)
    return (
        ranks.select("node")
        .join(contrib, "node", "left")
        .select(
            "node",
            F.expr(
                f"CAST(({base} + {damping_pct} * coalesce(__in, 0))"
                f" DIV 100 AS BIGINT)"
            ).alias("rank"),
        )
    )


def uniform_ranks(nodes: DataFrame, node_col: str, n_nodes: int) -> DataFrame:
    """Uniform starting ranks at SCALE fixed point."""
    return nodes.select(
        F.col(node_col).alias("node"),
        F.lit(SCALE // n_nodes).cast("long").alias("rank"),
    )
