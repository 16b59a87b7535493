"""Logical-plan helpers: type lattice, schema unification, batch alignment.

These are the only semantically novel pieces of the engine — everything
else is declared through the DataFrame API and optimized by Catalyst.
"""

from streaming_parquet_spark.plans.typesys import TypeKind, widen_types, WidenError
from streaming_parquet_spark.plans.unify import UnifiedSchema, unify_schemas
from streaming_parquet_spark.plans.align import align_dataframe, concat_aligned

__all__ = [
    "TypeKind",
    "widen_types",
    "WidenError",
    "UnifiedSchema",
    "unify_schemas",
    "align_dataframe",
    "concat_aligned",
]
