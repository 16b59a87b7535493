"""Registry-wide guard for the BIGINT quadratic-accumulator class
(VERDICT r8 item 1): ``F.sum(a * b)`` over unbounded integer counts
silently wraps int64 under non-ANSI mode at the 100 TB scale the
operators document — the ``skew_report`` defect (fixed r8, commit
9c069aa) found next door in ``domain_similarity``/``batch_drift``.

The rule this gate enforces: any ``F.sum(...)`` whose argument contains
a multiplication must form the product with an operand ALREADY cast to
double/float (``F.col("n").cast("double") * F.col("n")`` — never the
int64 product first, which would wrap before the cast), unless the
site appears in the allowlist below with a documented magnitude bound.

Same style as the HUGEINT oracle-type scan in test_oracle_parity.py:
static, runs on every file, and a new unguarded site fails with the
exact file:line to fix.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "streaming_parquet_spark"

# (path relative to the package, unparsed product expression) -> why the
# accumulator provably cannot overflow / is deliberately integer-exact.
ALLOWED: dict[tuple[str, str], str] = {
    ("operators/timeseries.py", "F.col('__f') * F.col('__f')"): (
        "fixed-point squares bounded per row by scale^2 (~1e8); the "
        "zscore docstring documents the ~1e10-rows-per-group exactness "
        "bound and the shard-and-reaggregate recipe beyond; ts_windows "
        "sums over m (fixed, small) rows per window — integer-exact "
        "moments are the portability contract there"
    ),
    ("operators/pipeline.py", "F.col('cnt') * F.col('lr')"): (
        "per-document accumulator (groupBy id): cnt bounded by document "
        "token count, lr a fixed-point log-ratio bounded by 2^scale_bits "
        "* ln(range); dsir_weights documents the 2^53 bound explicitly"
    ),
    (
        "operators/text.py",
        "F.col('cnt') * F.coalesce(F.col('w'), F.lit(0).cast('bigint'))",
    ): (
        "per-document accumulator (groupBy id): cnt bounded by document "
        "token count, w a fixed-point classifier weight bounded by "
        "2^scale_bits — the exact-integer dot is classifier_score's "
        "bit-stability contract"
    ),
    (
        "operators/profile.py",
        "F.floor(F.col('quality_score') * 100 + F.lit(0.5)).cast('bigint')",
    ): (
        "LINEAR sum of bounded fixed-point scores (<= 1e4 per row): "
        "exact to ~1e15 rows, not a quadratic accumulator"
    ),
    ("operators/similarity.py", "_yf * _yf"): (
        "_yf is y_fixed / scale — a DOUBLE division result, so the "
        "product is already FP; the sum runs over dims rows only"
    ),
    ("queries.py", "F.col('l_extendedprice') * (1 - F.col('l_discount'))"): (
        "l_extendedprice/l_discount are DOUBLE columns (TPC-H prices): "
        "an FP sum, not an integer accumulator"
    ),
    (
        "queries.py",
        "F.col('l_extendedprice') * (1 - F.col('l_discount'))"
        " * (1 + F.col('l_tax'))",
    ): "DOUBLE columns (TPC-H prices): FP sum",
    ("queries.py", "F.col('l_extendedprice') * F.col('l_discount')"): (
        "DOUBLE columns (TPC-H prices): FP sum"
    ),
    (
        "queries_tpch.py",
        "F.col('l_extendedprice') * (1 - F.col('l_discount'))",
    ): "DOUBLE columns (TPC-H prices): FP sum",
    ("queries_ext.py", "F.floor(F.col('o_totalprice') * 100).cast('bigint')"): (
        "LINEAR fixed-point sum bounded per row by max price * 100 "
        "(~1e9): exact to ~1e9 rows per group, and the paired oracle "
        "pins the same arithmetic"
    ),
    ("queries_tpch.py", "F.floor(F.col('c_acctbal') * 100).cast('long')"): (
        "LINEAR fixed-point sum bounded per row by max balance * 100 "
        "(~1e6): exact to ~1e12 rows per group"
    ),
}


def _has_fp_operand(node: ast.AST) -> bool:
    """True if the subtree casts to double/float or is a float literal
    — i.e. the product is formed in FP, not int64."""
    for n in ast.walk(node):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "cast"
            and any(
                isinstance(a, ast.Constant)
                and isinstance(a.value, str)
                and ("double" in a.value or "float" in a.value)
                for a in n.args
            )
        ):
            return True
        if isinstance(n, ast.Constant) and isinstance(n.value, float):
            return True
    return False


def _scan() -> list[tuple[str, int, str]]:
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "sum"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
            ):
                continue
            arg = node.args[0]

            def visit(n, rel=rel, lineno=node.lineno):
                # an allowlisted expression covers everything inside it
                if (rel, ast.unparse(n)) in ALLOWED:
                    return
                if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
                    if not (
                        _has_fp_operand(n.left) or _has_fp_operand(n.right)
                    ):
                        offenders.append((rel, lineno, ast.unparse(n)))
                        return
                for child in ast.iter_child_nodes(n):
                    visit(child)

            visit(arg)
    return offenders


def test_no_unguarded_integer_product_accumulators():
    offenders = _scan()
    assert not offenders, (
        "F.sum over an int64 product without a double-cast operand — "
        "wraps silently at 100 TB scale (the skew_report/domain_"
        "similarity class).  Cast an OPERAND to double (not the "
        "product), or add the site to ALLOWED with a documented "
        f"magnitude bound: {offenders}"
    )


def test_allowlist_entries_still_exist():
    """A refactor that removes or rewrites an allowlisted site must
    drop its entry, or the list rots into blanket permission."""
    live = set()
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.BinOp)
                and isinstance(node.op, ast.Mult)
            ) or isinstance(node, ast.Call):
                live.add((rel, ast.unparse(node)))
    stale = [k for k in ALLOWED if k not in live]
    assert not stale, f"ALLOWED entries no longer present in source: {stale}"
