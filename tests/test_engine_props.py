"""Property-based end-to-end test of the concat engine: for ANY set of
CSV files drawn from a pool of columns/types, the engine must preserve
every row, emit the sorted union of columns, and type each column at
the lattice join of its per-file types (with stringify on, so no
conflict errors)."""

import os

import pytest

try:
    from hypothesis import HealthCheck, given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from streaming_parquet_spark.engine import Engine
from streaming_parquet_spark.runspec import RunSpec

# Column pool: name -> (value renderer, rendered kind)
_POOL = {
    "ci": (lambda i: str(i * 7 - 3), "long"),
    "cf": (lambda i: f"{i * 0.5 + 0.25}", "double"),
    "cb": (lambda i: "true" if i % 2 else "false", "boolean"),
    "cs": (lambda i: f"s{i}x", "string"),
}

_WIDEN = {
    frozenset(["long"]): "bigint",
    frozenset(["double"]): "double",
    frozenset(["boolean"]): "boolean",
    frozenset(["string"]): "string",
    frozenset(["long", "double"]): "double",
    frozenset(["long", "boolean"]): "bigint",
    frozenset(["double", "boolean"]): "double",
}


@st.composite
def file_specs(draw):
    n_files = draw(st.integers(1, 3))
    out = []
    for _ in range(n_files):
        cols = draw(
            st.lists(st.sampled_from(sorted(_POOL)), min_size=1, max_size=4,
                     unique=True)
        )
        rows = draw(st.integers(0, 5))
        out.append((cols, rows))
    return out


@given(specs=file_specs())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_concat_preserves_rows_and_widens(specs, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prop")
    paths = []
    kinds_per_col: dict[str, set] = {}
    total_rows = 0
    for fi, (cols, rows) in enumerate(specs):
        p = str(tmp / f"f{fi}.csv")
        with open(p, "w") as fh:
            fh.write(",".join(cols) + "\n")
            for r in range(rows):
                fh.write(",".join(_POOL[c][0](r) for c in cols) + "\n")
        paths.append(p)
        total_rows += rows
        for c in cols:
            # valueless columns contribute Null (identity), not a kind
            if rows > 0:
                kinds_per_col.setdefault(c, set()).add(_POOL[c][1])

    out = str(tmp / "out.parquet")
    eng = Engine(spark)
    res = eng.run(
        RunSpec(inputs=paths, out=out, stringify_conflicts=True,
                single_file=False, roll_by_rows=10**9)
    )
    assert res.rows == total_rows

    back = spark.read.parquet(*res.output.paths)
    union_cols = sorted({c for cols, _ in specs for c in cols})
    assert back.columns == union_cols
    assert back.count() == total_rows

    types = dict(back.dtypes)
    for c, kinds in kinds_per_col.items():
        expected = _WIDEN.get(frozenset(kinds), "string")
        assert types[c] == expected, (c, kinds, types[c])
