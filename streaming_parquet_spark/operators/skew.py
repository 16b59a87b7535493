"""Skew-mitigation utilities: salted joins.

AQE's skew-join splitting (on by default in session.get_spark) handles
most skew at runtime by splitting oversized partitions. Salting is the
complementary *plan-level* tool for pathological hot keys — a handful of
join keys carrying a double-digit percentage of the rows (the classic
boilerplate-document or null-key case in web-scale corpora):

  big side:   each row gets a deterministic salt in [0, salt)
  small side: exploded x salt (one copy per salt value)
  join key:   (key..., salt) — the hot key's rows now spread over
              ``salt`` reducers instead of one

Deterministic salt (hash of the whole row, not rand()) keeps plans
replayable and testable. Cost: small side inflates x salt — use for
genuinely small/medium dimension sides, or pre-filter to the hot keys
and union a salted hot-path with an unsalted cold-path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on`` with key salting.

    Result is identical to ``big.join(small, on, how)`` for inner/left
    joins; the shuffle distributes each join key over ``salt`` buckets.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got: {how}")
    salt_col = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)
    ).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")
