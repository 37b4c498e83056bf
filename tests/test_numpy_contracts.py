"""NumPy-function acceptance/rejection matrix + advanced arithmetic,
ported from the reference's contract suites (behavior re-asserted
independently):

  tests/fields/test_numpy_functions.py — which np functions must work
  src/galois/_domains/_function.py:405-427 — the must-raise blocklist
  tests/fields/test_advanced_arithmetic.py — np.convolve semantics
  tests/fields/test_linalg.py — np.linalg routing contracts
"""

import numpy as np
import pytest

import galois_tpu as g

FIELDS = [lambda: g.GF2, lambda: g.GF(7), lambda: g.GF(2**8), lambda: g.GF(3, 5)]


@pytest.fixture(params=range(len(FIELDS)), ids=["GF(2)", "GF(7)", "GF(2^8)", "GF(3^5)"], scope="module")
def field(request):
    return FIELDS[request.param]()


class TestMustRaise:
    """Functions whose meaning needs reals/complexes must raise on
    FieldArrays (reference blocklist, _function.py:405-427)."""

    FUNCS = [
        np.around,
        np.round,
        np.fix,
        np.gradient,
        np.i0,
        np.sinc,
        np.angle,
        np.real,
        np.imag,
        np.conj,
        np.conjugate,
        np.cross,
    ]

    def test_blocklisted_raise(self, field):
        a = field.Random(6, seed=1)
        b = field.Random(6, seed=2)
        for fn in self.FUNCS:
            with pytest.raises((NotImplementedError, TypeError, ValueError)):
                try:
                    fn(a, b)
                except TypeError as e:
                    # binary-only signature mismatch: retry unary
                    if "argument" in str(e).lower() or "positional" in str(e).lower():
                        fn(a)
                    else:
                        raise

    def test_mean_like_raise(self, field):
        a = field.Random(6, seed=3)
        for fn in (np.mean, np.std, np.var, np.median):
            with pytest.raises((NotImplementedError, TypeError, ValueError)):
                fn(a)


class TestMustWork:
    def test_convolve_matches_poly_mul(self, field):
        a = field.Random(9, seed=4)
        b = field.Random(5, seed=5)
        c = np.convolve(a, b)
        assert type(c) is field and c.shape == (13,)
        fa = g.Poly(a)
        fb = g.Poly(b)
        # poly multiplication is coefficient convolution (account for any
        # leading-zero stripping by comparing integer representations)
        prod = fa * fb
        assert prod == g.Poly(c)

    def test_fft_ifft_roundtrip(self, field):
        q = int(field.order)
        n = 4
        if (q - 1) % n != 0:
            pytest.skip("needs n | q-1")
        x = field.Random(n, seed=6)
        X = np.fft.fft(x)
        xi = np.fft.ifft(X)
        assert np.array_equal(np.asarray(xi), np.asarray(x))

    def test_dot_inner_outer(self, field):
        a = field.Random(5, seed=7)
        b = field.Random(5, seed=8)
        d = np.dot(a, b)
        truth = a[0] * b[0]
        for i in range(1, 5):
            truth = truth + a[i] * b[i]
        assert int(d) == int(truth)
        assert int(np.inner(a, b)) == int(truth)
        o = np.outer(a, b)
        assert type(o) is field and o.shape == (5, 5)
        assert int(o[2, 3]) == int(a[2] * b[3])

    def test_linalg_det_inv_solve(self, field):
        A = field([[1, 2 % field.order], [3 % field.order, 4 % field.order]])
        while int(np.linalg.det(A)) == 0:
            A = field.Random((2, 2), seed=9)
        det = np.linalg.det(A)
        ad = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        assert int(det) == int(ad)
        Ainv = np.linalg.inv(A)
        eye = Ainv @ A
        assert np.array_equal(np.asarray(eye), np.asarray(field.Identity(2)))
        b = field.Random(2, seed=10)
        x = np.linalg.solve(A, b)
        assert np.array_equal(np.asarray(A @ x), np.asarray(b))

    def test_matrix_rank_and_row_reduce(self, field):
        A = field.Zeros((3, 3))
        A[0, 0] = 1
        A[1, 1] = 1
        assert np.linalg.matrix_rank(A) == 2
        R = A.row_reduce()
        assert type(R) is field

    def test_copy_like_functions(self, field):
        a = field.Random((2, 3), seed=11)
        for fn in (np.copy, np.flipud, np.fliplr, np.rot90):
            out = fn(a)
            assert out.shape[0] in (2, 3)

    def test_power_operators_match_np_power(self, field):
        a = field.Random(8, seed=12)
        assert np.array_equal(np.asarray(np.power(a, 3)), np.asarray(a**3))
        assert np.array_equal(np.asarray(np.square(a)), np.asarray(a**2))

    def test_sum_prod_reductions(self, field):
        a = field.Random(6, seed=13)
        s = np.add.reduce(a)
        truth = a[0]
        for v in a[1:]:
            truth = truth + v
        assert int(s) == int(truth)


class TestConvolveModes:
    def test_full_is_default(self, field):
        a = field.Random(6, seed=14)
        b = field.Random(3, seed=15)
        c = np.convolve(a, b)
        assert c.shape == (8,)

    def test_direct_sum_check(self, field):
        a = field.Random(4, seed=16)
        b = field.Random(4, seed=17)
        c = np.convolve(a, b)
        # c[k] = sum_{i+j=k} a[i] b[j]
        for k in range(7):
            truth = field(0)
            for i in range(4):
                j = k - i
                if 0 <= j < 4:
                    truth = truth + a[i] * b[j]
            assert int(c[k]) == int(truth)
