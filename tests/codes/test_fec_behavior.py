"""FEC behavioral contracts ported from the reference's suites (behavior
re-asserted independently):

  tests/codes/test_bch.py          — constructor exceptions, repr/str,
      encode/decode shape exceptions, errors= return contract
  tests/codes/test_reed_solomon.py — same for RS + erasure exceptions
"""

import numpy as np
import pytest

import galois_tpu as g


class TestBCHConstruction:
    def test_type_exceptions(self):
        with pytest.raises(TypeError):
            g.BCH(15.0, 7)
        with pytest.raises(TypeError):
            g.BCH(15, 7.0)
        with pytest.raises(TypeError):
            g.BCH(15, 7, c=1.0)
        with pytest.raises(TypeError):
            g.BCH(15, 7, field=2)
        with pytest.raises(TypeError):
            g.BCH(15, 7, extension_field=2**4)
        with pytest.raises(TypeError):
            g.BCH(15, 7, alpha=2.0)
        with pytest.raises(TypeError):
            g.BCH(15, 7, systematic=1)

    def test_value_exceptions(self):
        with pytest.raises(ValueError):
            g.BCH(15, 12)  # no such code
        with pytest.raises(ValueError):
            g.BCH(14, 7)  # n != q^m - 1 shape
        with pytest.raises(ValueError):
            g.BCH(15, 7, field=g.GF(2**2))

    def test_repr_str(self):
        bch = g.BCH(15, 7)
        assert repr(bch) == "<BCH Code: [15, 7, 5] over GF(2)>"
        s = str(bch)
        assert "[n, k, d]: [15, 7, 5]" in s
        assert "field: GF(2)" in s
        assert "extension_field: GF(2^4)" in s
        assert "is_systematic: True" in s

    @pytest.mark.parametrize(
        "n,k,t",
        [(7, 4, 1), (7, 1, 3), (15, 11, 1), (15, 7, 2), (15, 5, 3), (15, 1, 7), (31, 26, 1), (31, 21, 2), (31, 16, 3), (31, 11, 5), (31, 6, 7)],
    )
    def test_valid_binary_codes(self, n, k, t):
        bch = g.BCH(n, k)
        assert (bch.n, bch.k, bch.t) == (n, k, t)

    def test_from_d(self):
        bch = g.BCH(15, d=5)
        assert bch.k == 7 and bch.d >= 5

    def test_nonbinary_bch(self):
        bch = g.BCH(26, 17, field=g.GF(3))
        assert bch.n == 26 and bch.field.order == 3


class TestRSConstruction:
    def test_type_exceptions(self):
        with pytest.raises(TypeError):
            g.ReedSolomon(15.0, 11)
        with pytest.raises(TypeError):
            g.ReedSolomon(15, 11.0)
        with pytest.raises(TypeError):
            g.ReedSolomon(15, 11, c=1.0)
        with pytest.raises(TypeError):
            g.ReedSolomon(15, 11, systematic=1)

    def test_value_exceptions(self):
        with pytest.raises(ValueError):
            g.ReedSolomon(14, 10)  # n != q - 1
        with pytest.raises(ValueError):
            g.ReedSolomon(15, 16)  # k > n

    def test_repr_str(self):
        rs = g.ReedSolomon(15, 11)
        assert repr(rs) == "<Reed-Solomon Code: [15, 11, 5] over GF(2^4)>"
        s = str(rs)
        assert "[n, k, d]: [15, 11, 5]" in s
        assert "field: GF(2^4)" in s

    def test_singleton_bound(self):
        for n, k in [(15, 11), (15, 9), (255, 223), (31, 27)]:
            rs = g.ReedSolomon(n, k)
            assert rs.d == n - k + 1
            assert rs.t == (rs.d - 1) // 2


class TestEncodeDecodeContracts:
    @pytest.fixture(scope="class")
    def rs(self):
        return g.ReedSolomon(15, 11)

    @pytest.fixture(scope="class")
    def bch(self):
        return g.BCH(15, 7)

    def test_encode_wrong_length_raises(self, rs):
        with pytest.raises(ValueError):
            rs.encode(rs.field.Random(12, seed=1))

    def test_decode_wrong_length_raises(self, rs):
        with pytest.raises(ValueError):
            rs.decode(rs.field.Random(16, seed=1))

    def test_decode_errors_return(self, rs):
        m = rs.field.Random((4, 11), seed=2)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        c[0, 3] ^= 5
        c[2, 0] ^= 1
        c[2, 8] ^= 9
        dec, n_errs = rs.decode(rs.field(c), errors=True)
        assert np.array_equal(np.asarray(dec), np.asarray(m))
        assert np.asarray(n_errs).tolist() == [1, 0, 2, 0]

    def test_decode_failure_returns_minus_one(self, rs):
        m = rs.field.Random(11, seed=3)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        # corrupt t+1 = 3 symbols -> decoding failure
        c[0] ^= 1
        c[5] ^= 2
        c[10] ^= 3
        dec, n_errs = rs.decode(rs.field(c), errors=True)
        assert int(np.asarray(n_errs)) == -1

    def test_erasure_decoding(self, rs):
        # erasures is a boolean mask with the codeword's shape
        # (reference: src/galois/_codes/_linear.py:151-153)
        m = rs.field.Random((2, 11), seed=4)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        c[:, 2] = 0
        c[:, 7] = 0
        mask = np.zeros((2, 15), dtype=bool)
        mask[:, 2] = mask[:, 7] = True
        dec = rs.decode(rs.field(c), erasures=mask)
        assert np.array_equal(np.asarray(dec), np.asarray(m))

    def test_erasures_beyond_capacity_fail(self, rs):
        m = rs.field.Random(11, seed=5)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        mask = np.zeros(15, dtype=bool)
        for i in range(5):  # d - 1 = 4 erasures max
            c[i] = 0
            mask[i] = True
        dec, errs = rs.decode(rs.field(c), erasures=mask, errors=True)
        assert int(np.asarray(errs)) == -1

    def test_shortened_encode_decode(self, rs):
        # shortened RS(12, 8): pass k' = 8 < k symbols
        m = rs.field.Random((3, 8), seed=6)
        c = rs.encode(m)
        assert c.shape == (3, 12)
        cc = np.asarray(c, dtype=np.int64)
        cc[:, 1] ^= 7
        dec = rs.decode(rs.field(cc))
        assert np.array_equal(np.asarray(dec), np.asarray(m))

    def test_bch_shortened(self, bch):
        m = bch.field.Random((3, 4), seed=7)
        c = bch.encode(m)
        assert c.shape == (3, 12)
        cc = np.asarray(c, dtype=np.int64)
        cc[:, 2] ^= 1
        dec = bch.decode(bch.field(cc))
        assert np.array_equal(np.asarray(dec), np.asarray(m))

    def test_detect(self, rs):
        m = rs.field.Random(11, seed=8)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        assert not bool(np.asarray(rs.detect(rs.field(c))))
        c[0] ^= 3
        assert bool(np.asarray(rs.detect(rs.field(c))))

    def test_non_systematic_roundtrip(self):
        rs = g.ReedSolomon(15, 11, systematic=False)
        m = rs.field.Random((2, 11), seed=9)
        c = np.asarray(rs.encode(m), dtype=np.int64)
        c[:, 4] ^= 2
        dec = rs.decode(rs.field(c))
        assert np.array_equal(np.asarray(dec), np.asarray(m))

    def test_matrix_converters(self, rs):
        G, H = rs.G, rs.H
        # G @ H.T == 0 (H is the Vandermonde parity check)
        Z = G @ H.T
        assert not np.asarray(Z).any()
        # the converters require systematic form [I | P] / [-P^T | I]
        H2 = g.generator_to_parity_check_matrix(G)
        assert not np.asarray(G @ H2.T).any()
        G2 = g.parity_check_to_generator_matrix(H2)
        assert not np.asarray(G2 @ H2.T).any()
        assert np.array_equal(np.asarray(G2), np.asarray(G))


class TestReferenceParityBounds:
    """Validation bounds match the reference exactly
    (reference: _codes/_reed_solomon.py:175-178 allows d >= 1 and c >= 0)."""

    def test_rs_k_equals_n_is_valid_d1_code(self):
        rs = g.ReedSolomon(15, 15)
        assert (rs.n, rs.k, rs.d) == (15, 15, 1)
        m = rs.field.Random((3, 15), seed=1)
        c = rs.encode(m)
        assert np.array_equal(np.asarray(c), np.asarray(m))  # g(x) = 1
        dec, ne = rs.decode(c, errors=True)
        assert np.array_equal(np.asarray(dec), np.asarray(m))
        assert np.array_equal(ne, np.zeros(3, dtype=np.int64))

    def test_rs_c_zero_decodes(self):
        rs = g.ReedSolomon(15, 11, c=0)
        m = rs.field.Random((4, 11), seed=2)
        cw = np.asarray(rs.encode(m), dtype=np.int64)
        cw[:, 3] ^= 5
        dec, ne = rs.decode(rs.field(cw), errors=True)
        assert np.array_equal(np.asarray(dec), np.asarray(m))
        assert np.array_equal(ne, np.ones(4, dtype=np.int64))

    def test_rs_invalid_bounds_raise(self):
        with pytest.raises(ValueError):
            g.ReedSolomon(15, 16)
        with pytest.raises(ValueError):
            g.ReedSolomon(15, 11, c=-1)
        with pytest.raises(ValueError):
            g.ReedSolomon(15, d=0)
