"""Property-based differential tests for the cross-engine portability
primitives: for ARBITRARY inputs (not just fixture values), the
DuckDB replay of poly_hash must agree bitwise, and the integer-unit
sum convention must be exact against Fraction arithmetic. These are
the axioms every hash-checked key leans on; fixture-based tests prove
them for today's corpus, these prove them for tomorrow's."""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from streamingdemo_spark.registry import POLY_MOD, opoly


def _py_poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % POLY_MOD
    return acc


# printable unicode including astral planes; excludes surrogates
_text = st.text(
    alphabet=st.characters(
        min_codepoint=1,
        max_codepoint=0x10FFFF,
        exclude_categories=("Cs",),
    ),
    max_size=64,
)


@given(st.lists(_text, min_size=1, max_size=32))
@settings(max_examples=50, deadline=None)
def test_poly_hash_oracle_fragment_matches_python_fold(strings):
    """The DuckDB opoly() fragment must equal the per-codepoint Python
    fold for arbitrary unicode — the same fold the Spark expression
    implements (pinned separately by test_poly_hash_matches_duckdb_
    bitwise on a fixed corpus; this randomizes the input space)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strings)))
    got = dict(con.execute(f"SELECT i, {opoly('s')} FROM t").fetchall())
    want = {i: _py_poly(s) for i, s in enumerate(strings)}
    assert got == want


@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_integer_unit_sum_is_exact_and_order_free(cents):
    """The dsum convention: floor(x*100+0.5) on 2-decimal doubles must
    recover the integer cents exactly for every representable amount,
    and the summed result must equal exact Fraction arithmetic
    regardless of order (integer addition is associative)."""
    values = [c / 100.0 for c in cents]
    units = []
    for c, v in zip(cents, values):
        # negative-value convention matches SQL FLOOR (toward -inf)
        import math

        u = math.floor(v * 100 + 0.5)
        assert u == c, (c, v)
        units.append(u)
    total = sum(units)
    exact = sum(Fraction(c, 100) for c in cents)
    assert Fraction(total, 100) == exact
    assert sum(reversed(units)) == total


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_sqrt_micro_quantization_is_engine_free(n):
    """ext_lang_mix_temperature's weights: floor(sqrt(n)*1e6+0.5) must
    agree between Python's libm sqrt and DuckDB's — IEEE sqrt is
    correctly rounded, so any disagreement is a real platform bug."""
    import math

    con = duckdb.connect()
    got = con.execute(
        f"SELECT CAST(FLOOR(sqrt({n}) * 1000000 + 0.5) AS BIGINT)"
    ).fetchone()[0]
    want = math.floor(math.sqrt(n) * 1e6 + 0.5)
    assert got == want, n


def _py_spread16(v: int) -> int:
    v &= 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
@settings(max_examples=200, deadline=None)
def test_morton_interleave_matches_duckdb_and_is_injective(x, y):
    """snk_zorder_write's z-value: the DuckDB operator-syntax ladder
    must equal the independent python bit-twiddle, and the interleave
    must be a true bijection (bits recoverable), so distinct bucket
    pairs can never collide to one z-value."""
    from streamingdemo_spark.plans.storage import _DUCK_SHL, _zorder_sql

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_zorder_sql(str(x), str(y), _DUCK_SHL)}"
    ).fetchone()[0]
    want = _py_spread16(x) | (_py_spread16(y) << 1)
    assert got == want, (x, y)
    # invert: even bits -> x, odd bits -> y
    def unspread(v: int) -> int:
        out = 0
        for i in range(16):
            out |= ((v >> (2 * i)) & 1) << i
        return out

    assert unspread(got) == x and unspread(got >> 1) == y


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=200),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=200, deadline=None)
def test_bottomk_sketch_is_mergeable(values, n_parts):
    """agg_sample_bottomk's scale claim: the bottom-k of a union must
    equal the merge of per-partition bottom-ks, for every way of
    partitioning the data — the property that lets every shard ship
    only k rows."""
    k = 20
    parts = [values[i::n_parts] for i in range(n_parts)]
    merged = sorted(h for p in parts for h in sorted(p)[:k])[:k]
    assert merged == sorted(values)[:k]
