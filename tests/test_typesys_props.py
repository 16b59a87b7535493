"""Property-based tests for the widening lattice (hypothesis).

The reference declares proptest but never writes property tests
(SURVEY §5); these pin the algebra its unit tests only sample:
widen_types (schema.rs:129-193) must behave as a join on a lattice —
commutative, idempotent, with Null as identity and (on the
stringify-closed domain) associative — or cross-file unification would
depend on file discovery order, which is sorted but should not be
load-bearing.
"""

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from streaming_parquet_spark.plans.typesys import TypeKind, WidenError, widen_types

KINDS = st.sampled_from(list(TypeKind))


def _widen(a, b, stringify=False):
    try:
        return widen_types(a, b, stringify)
    except WidenError:
        return None


@given(a=KINDS, b=KINDS, s=st.booleans())
@settings(max_examples=500)
def test_commutative(a, b, s):
    assert _widen(a, b, s) == _widen(b, a, s)


@given(a=KINDS, s=st.booleans())
@settings(max_examples=100)
def test_idempotent(a, s):
    assert _widen(a, a, s) == a


@given(a=KINDS, s=st.booleans())
@settings(max_examples=100)
def test_null_identity(a, s):
    assert _widen(TypeKind.NULL, a, s) == a
    assert _widen(a, TypeKind.NULL, s) == a


@given(a=KINDS, b=KINDS, c=KINDS, s=st.booleans())
@settings(max_examples=1000)
def test_associative_where_defined(a, b, c, s):
    """widen is a PARTIAL operation (stringify rescues only Utf8/Binary
    conflicts — schema.rs:183-186; cross-category pairs like I64+Date
    error regardless, schema.rs:188-192). Where both groupings are
    defined, the fold over per-file types must be order-independent."""
    ab = _widen(a, b, s)
    bc = _widen(b, c, s)
    left = _widen(ab, c, s) if ab is not None else None
    right = _widen(a, bc, s) if bc is not None else None
    if left is not None and right is not None:
        assert left == right


@given(a=KINDS, b=KINDS, s=st.booleans())
@settings(max_examples=500)
def test_widening_never_narrows(a, b, s):
    """Where defined, the result absorbs both operands: re-widening an
    operand with the result is the result itself."""
    w = _widen(a, b, s)
    if w is not None:
        assert _widen(a, w, s) == w
        assert _widen(b, w, s) == w


@given(a=KINDS, b=KINDS)
@settings(max_examples=500)
def test_stringify_rescues_exactly_string_conflicts(a, b):
    """stringify_conflicts turns a conflict into Utf8 if and only if
    Utf8 or Binary is involved (schema.rs:183-186); other conflicts
    error either way (schema.rs:188-192)."""
    plain = _widen(a, b, False)
    rescued = _widen(a, b, True)
    if plain is None and rescued is not None:
        assert rescued is TypeKind.UTF8
        assert TypeKind.UTF8 in (a, b) or TypeKind.BINARY in (a, b)
    if plain is not None:
        assert rescued == plain
