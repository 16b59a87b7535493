"""Bloom-filter join reduction: pre-filter a fact table against a
compact bitmap of the build side's join keys BEFORE any exchange, then
run the exact join on the survivors — the explicit form of the
runtime-filter / semi-join-reduction technique every warehouse engine
applies to star joins (Spark's own InjectRuntimeFilter does this
opportunistically; here it is a first-class, always-on operator whose
parameters are caller-controlled).

Why it matters at 100 TB: a semi join of a 100 TB fact against a
10 M-key dimension shuffles (or at best scans+broadcast-probes) every
fact row. A 64 KiB bitmap rejects the overwhelming majority of
non-matching rows inside the scan stage itself — the rows never reach
the exchange. False positives are removed by the residual exact join,
so the OUTPUT is identical to the plain semi join (which is exactly
how the oracle checks it); the bloom stage is pure data reduction and
can never change results.

Everything is JVM expressions: xxhash64 for the k probes, bit_or
aggregation for the bitmap words, a broadcast one-row map for the
probe side. No UDF, no driver collect.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed odd seeds for the k hash probes (any constants work; these are
#: small primes so the expression text stays readable in plans)
_SEEDS = (1, 7, 131)


def _positions(key: F.Column, m_bits: int, k: int) -> list[F.Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEEDS[i])), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_bitmap(build: DataFrame, key: str, m_bits: int = 1 << 16,
                 k: int = 3) -> DataFrame:
    """One-row DataFrame holding the build side's Bloom bitmap as a
    map<int, long> of non-zero 64-bit words (sparse: at most
    min(m_bits/64, k*|build|) entries). Built with a word-level bit_or
    aggregation — partial-aggregates map-side, so the exchange carries
    at most one candidate word set per task, never the keys."""
    if k > len(_SEEDS):
        raise ValueError(f"k <= {len(_SEEDS)} supported")
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k)))
    words = (
        build.select(pos.alias("__p"))
        .select(
            F.expr("CAST(__p DIV 64 AS INT)").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))"
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__m)").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__bloom")
    )


def bloom_prefilter(fact: DataFrame, bitmap: DataFrame, key: str,
                    m_bits: int = 1 << 16, k: int = 3) -> DataFrame:
    """Keep only fact rows whose ``key`` MAY be in the build side (all
    k probe bits set). Guaranteed no false negatives; false positives
    survive (remove them with the residual exact join). The bitmap is
    broadcast — the filter runs inside the fact's scan stage, before
    any exchange."""
    probes = _positions(F.col(key), m_bits, k)
    out = fact.crossJoin(F.broadcast(bitmap))
    member = None
    for i, p in enumerate(probes):
        out = out.withColumn(f"__p{i}", p)
        hit = F.expr(
            f"(coalesce(element_at(__bloom, CAST(__p{i} DIV 64 AS INT)),"
            f" CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT)))"
            f" != 0"
        )
        member = hit if member is None else (member & hit)
    return out.filter(member).drop(
        "__bloom", *[f"__p{i}" for i in range(k)]
    )


def bloom_semi_join(fact: DataFrame, build: DataFrame, fact_key: str,
                    build_key: str, m_bits: int = 1 << 16,
                    k: int = 3) -> DataFrame:
    """Exact semi join rendered as bloom-prefilter + residual semi
    join. Output == fact.join(build, fact_key==build_key, 'left_semi')
    row-for-row; the bloom stage only reduces how many fact rows reach
    the residual join's exchange. Size ``m_bits`` ~ 10 bits/key for a
    ~1% false-positive rate at k=3."""
    bitmap = bloom_bitmap(
        build.select(F.col(build_key).alias("__k")), "__k", m_bits, k
    )
    reduced = bloom_prefilter(fact, bitmap, fact_key, m_bits, k)
    return reduced.join(
        build.select(F.col(build_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
