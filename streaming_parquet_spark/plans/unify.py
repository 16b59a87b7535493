"""Cross-file schema unification.

Reimplements the semantics of ``UnifiedSchema::from_schemas``
(/root/reference/src/schema.rs:76-115): union of all column names across
inputs, per-column type conflicts resolved by the widening lattice
(typesys.widen_types), renames applied before unification, and unified
columns emitted in **alphabetical order**, all nullable (schema.rs:101-107).

This is driver-side metadata work over per-file Spark schemas — Spark's
own ``mergeSchema`` only handles the compatible-Parquet subset and errors
on int/double conflicts the reference widens, and CSV has no mergeSchema
at all, hence the explicit fold here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from streaming_parquet_spark.plans.typesys import TypeKind, widen_types


@dataclass
class UnifiedSchema:
    """Result of unification.

    schema          — unified StructType, columns sorted by name, all nullable
    column_mapping  — original name -> unified name (renames; schema.rs:63)
    type_mapping    — unified name -> TypeKind
    """

    schema: T.StructType
    column_mapping: dict[str, str] = field(default_factory=dict)
    type_mapping: dict[str, TypeKind] = field(default_factory=dict)

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.schema.fields]

    def unified_name(self, original: str) -> str:
        """original -> unified column name (schema.rs:120-125)."""
        return self.column_mapping.get(original, original)


def unify_schemas(
    schemas: list[T.StructType],
    rename: dict[str, str] | None = None,
    stringify_conflicts: bool = False,
) -> UnifiedSchema:
    """Fold per-file schemas into one unified schema.

    ``rename`` maps original -> new name and is applied before the name
    union, mirroring the reference where ``column_mapping`` is consulted
    during alignment (src/coercion.rs:58-59,86-100).

    Raises WidenError when a column has incompatible types across files
    and ``stringify_conflicts`` is False (schema.rs:188-192).
    """
    rename = rename or {}
    merged: dict[str, TypeKind] = {}

    for schema in schemas:
        for f in schema.fields:
            name = rename.get(f.name, f.name)
            kind = TypeKind.from_spark_type(f.dataType)
            if name in merged:
                merged[name] = widen_types(merged[name], kind, stringify_conflicts)
            else:
                merged[name] = kind

    # Alphabetical order, all nullable (schema.rs:101-107).
    fields = [
        T.StructField(name, merged[name].to_spark_type(), True)
        for name in sorted(merged)
    ]
    return UnifiedSchema(
        schema=T.StructType(fields),
        column_mapping=dict(rename),
        type_mapping={name: merged[name] for name in sorted(merged)},
    )
