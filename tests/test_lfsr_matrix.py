"""LFSR + Berlekamp-Massey behavioral matrix ported from the reference's
suites (contracts re-asserted independently):

  tests/test_fibonacci_lfsr.py — state/reset/step(0)/fwd-bwd inverses,
      reversed-state output identity, primitive vs reducible polys
  tests/test_galois_lfsr.py   — same for the Galois configuration +
      Fibonacci<->Galois conversion equivalence
  tests/test_berlekamp_massey.py — BM recovers the connection poly of a
      primitive LFSR from 2n outputs, across GF(2), GF(3), GF(2^3), GF(3^3)
"""

import numpy as np
import pytest

import galois_tpu as g
from galois_tpu import FLFSR, GLFSR, Poly, berlekamp_massey

ORDERS = [2, 3, 2**3, 3**3]


def _prim_char_poly(order):
    return g.primitive_poly(order, 4)


@pytest.fixture(params=ORDERS, ids=lambda q: f"GF({q})", scope="module")
def char_poly(request):
    return _prim_char_poly(request.param)


def _seq_ints(lfsr, n):
    return [int(v) for v in np.asarray(lfsr.step(n), dtype=object)]


class TestStateContracts:
    def test_default_initial_state_is_ones(self, char_poly):
        lfsr = FLFSR(char_poly.reverse())
        st = np.asarray(lfsr.initial_state, dtype=object)
        assert st.tolist() == [1, 1, 1, 1]
        assert np.array_equal(np.asarray(lfsr.state, dtype=object), st)

    def test_reset_returns_to_initial(self, char_poly):
        for cls in (FLFSR, GLFSR):
            lfsr = cls(char_poly.reverse(), state=[1, 2 % lfsr_field_order(char_poly), 1, 1])
            init = np.asarray(lfsr.initial_state, dtype=object).copy()
            lfsr.step(10)
            assert not np.array_equal(np.asarray(lfsr.state, dtype=object), init) or lfsr_field_order(char_poly) == 2
            lfsr.reset()
            assert np.array_equal(np.asarray(lfsr.state, dtype=object), init)

    def test_reset_specific_state(self, char_poly):
        lfsr = FLFSR(char_poly.reverse())
        new = [1, 0, 1, 1]
        lfsr.reset(new)
        assert np.asarray(lfsr.state, dtype=object).tolist() == new

    def test_step_zero_returns_empty_and_keeps_state(self, char_poly):
        for cls in (FLFSR, GLFSR):
            lfsr = cls(char_poly.reverse())
            before = np.asarray(lfsr.state, dtype=object).copy()
            y = lfsr.step(0)
            assert y.size == 0
            assert np.array_equal(np.asarray(lfsr.state, dtype=object), before)

    def test_scalar_step_is_0d(self, char_poly):
        lfsr = FLFSR(char_poly.reverse())
        y = lfsr.step()
        assert y.ndim == 0


def lfsr_field_order(char_poly):
    return int(char_poly.field.order)


def _textbook_bm_full(seq, field):
    """Independent Massey-1969 BM over any field (host exact arithmetic).
    Returns (ascending connection coeffs, L) WITHOUT the trailing trim."""
    from galois_tpu.fields._hostfield import get_host_field

    hf = get_host_field(field._meta)
    C, B = [1], [1]
    L, m, b = 0, 1, 1
    for n, s_n in enumerate(seq):
        d = s_n
        for i in range(1, L + 1):
            if i < len(C) and C[i]:
                d = hf.add(d, hf.multiply(C[i], seq[n - i]))
        if d == 0:
            m += 1
            continue
        coef = hf.multiply(d, hf.reciprocal(b))
        if len(B) + m > len(C):
            C = C + [0] * (len(B) + m - len(C))
        newC = list(C)
        for i, Bv in enumerate(B):
            if Bv:
                newC[i + m] = hf.subtract(newC[i + m], hf.multiply(coef, Bv))
        if 2 * L <= n:
            B, b, m, L = C, d, 1, n + 1 - L
        else:
            m += 1
        C = newC
    return C, L


def _textbook_bm(seq, field):
    """Descending connection coeffs with the reference's trailing-zero trim
    applied (so it matches Poly coefficient stripping)."""
    C, L = _textbook_bm_full(seq, field)
    C = C[: L + 1]
    while len(C) > 1 and C[-1] == 0:
        C = C[:-1]
    return C[::-1]


class TestStepInverses:
    def test_forward_then_backward(self, char_poly):
        for cls in (FLFSR, GLFSR):
            lfsr = cls(char_poly.reverse())
            st0 = np.asarray(lfsr.state, dtype=object).copy()
            fwd = _seq_ints(lfsr, 20)
            bwd = _seq_ints(lfsr, -20)
            assert fwd == bwd[::-1]
            assert np.array_equal(np.asarray(lfsr.state, dtype=object), st0)

    def test_backward_then_forward(self, char_poly):
        for cls in (FLFSR, GLFSR):
            lfsr = cls(char_poly.reverse())
            st0 = np.asarray(lfsr.state, dtype=object).copy()
            bwd = _seq_ints(lfsr, -15)
            fwd = _seq_ints(lfsr, 15)
            assert bwd == fwd[::-1]
            assert np.array_equal(np.asarray(lfsr.state, dtype=object), st0)

    def test_reducible_poly_steps(self, char_poly):
        # same contracts hold for non-primitive (even reducible) feedback
        field = char_poly.field
        f = Poly([1, 0, 0, 0, 1], field=field)  # x^4 + 1, reducible
        lfsr = FLFSR(f)
        fwd = _seq_ints(lfsr, 12)
        bwd = _seq_ints(lfsr, -12)
        assert fwd == bwd[::-1]


class TestPeriod:
    def test_primitive_period(self, char_poly):
        """A primitive degree-4 LFSR has period q^4 - 1."""
        q = lfsr_field_order(char_poly)
        period = q**4 - 1
        if period > 3000:
            pytest.skip("period too long for an exhaustive check")
        lfsr = FLFSR(char_poly.reverse())
        seq = _seq_ints(lfsr, 2 * period)
        assert seq[:period] == seq[period:]
        # no shorter period at any proper divisor
        for d in range(1, period):
            if period % d == 0 and seq[:d] * (period // d) == seq[:period]:
                assert d == period


class TestConversions:
    def test_fibonacci_to_galois_same_output(self, char_poly):
        fl = FLFSR(char_poly.reverse())
        gl = fl.to_galois_lfsr()
        assert _seq_ints(fl, 30) == _seq_ints(gl, 30)

    def test_galois_to_fibonacci_same_output(self, char_poly):
        gl = GLFSR(char_poly.reverse())
        fl = gl.to_fibonacci_lfsr()
        assert _seq_ints(gl, 30) == _seq_ints(fl, 30)

    def test_conversion_preserves_polys(self, char_poly):
        fl = FLFSR(char_poly.reverse())
        gl = fl.to_galois_lfsr()
        assert gl.characteristic_poly == fl.characteristic_poly
        assert gl.feedback_poly == fl.feedback_poly


class TestBerlekampMassey:
    def test_recovers_primitive_characteristic(self, char_poly):
        lfsr = FLFSR(char_poly.reverse())
        field = char_poly.field
        y = field([int(v) for v in np.asarray(lfsr.step(8), dtype=object)])
        c = berlekamp_massey(y, output="characteristic")
        assert c == char_poly

    def test_fibonacci_output_regenerates(self, char_poly):
        lfsr = FLFSR(char_poly.reverse(), state=[1, 0, 1, 1])
        field = char_poly.field
        seq = lfsr.step(8)
        y = field([int(v) for v in np.asarray(seq, dtype=object)])
        new = berlekamp_massey(y, output="fibonacci")
        regen = _seq_ints(new, 8)
        assert regen == [int(v) for v in np.asarray(seq, dtype=object)]

    def test_galois_output_regenerates(self, char_poly):
        lfsr = FLFSR(char_poly.reverse(), state=[1, 0, 1, 1])
        field = char_poly.field
        seq = lfsr.step(8)
        y = field([int(v) for v in np.asarray(seq, dtype=object)])
        new = berlekamp_massey(y, output="galois")
        regen = _seq_ints(new, 8)
        assert regen == [int(v) for v in np.asarray(seq, dtype=object)]

    def test_random_sequence_matches_textbook_bm(self, char_poly):
        """BM on arbitrary sequences matches an independent textbook BM,
        with the same trailing-zero trim the reference applies
        (reference: src/galois/_lfsr.py:1685-1693 — note the reference
        trims C(x) to its true degree, so when the minimal complexity L
        exceeds deg C the returned poly intentionally encodes only deg C)."""
        field = char_poly.field
        for seed in (3, 27, 99):
            y = field.Random(24, seed=seed)
            conn = berlekamp_massey(y, output="connection")
            c_ref = _textbook_bm([int(v) for v in np.asarray(y, dtype=object)], field)
            assert np.asarray(conn.coefficients(), dtype=object).tolist() == c_ref

    def test_regenerates_when_L_equals_degree(self, char_poly):
        """When the minimal complexity equals deg C, the fibonacci output
        regenerates the input sequence exactly."""
        field = char_poly.field
        for seed in range(8):
            y = field.Random(24, seed=seed)
            conn = berlekamp_massey(y, output="connection")
            ints = [int(v) for v in np.asarray(y, dtype=object)]
            _, L = _textbook_bm_full(ints, field)
            if conn.degree != L:
                continue  # reference-trim case: regeneration not guaranteed
            new = berlekamp_massey(y, output="fibonacci")
            assert _seq_ints(new, 24) == ints

    def test_exceptions(self, char_poly):
        field = char_poly.field
        with pytest.raises(TypeError):
            berlekamp_massey([1, 0, 1])  # not a FieldArray
        with pytest.raises(ValueError):
            berlekamp_massey(field.Random((2, 2), seed=1))  # not 1-D
        with pytest.raises(ValueError):
            berlekamp_massey(field.Random(8, seed=1), output="bogus")
