"""BCH(n, k) -> t tables and errors-and-erasures trials
(reference tests: tests/codes/test_bch.py:172-408)."""

import random

import numpy as np
import pytest

VALID_CODES = {
    7: [(7, 4, 1), (7, 1, 3)],
    15: [(15, 11, 1), (15, 7, 2), (15, 5, 3), (15, 1, 7)],
    31: [(31, 26, 1), (31, 21, 2), (31, 16, 3), (31, 11, 5), (31, 6, 7), (31, 1, 15)],
    63: [
        (63, 57, 1), (63, 51, 2), (63, 45, 3), (63, 39, 4), (63, 36, 5),
        (63, 30, 6), (63, 24, 7), (63, 18, 10), (63, 16, 11), (63, 10, 13),
        (63, 7, 15), (63, 1, 31),
    ],
}


@pytest.mark.parametrize("n", sorted(VALID_CODES))
def test_bch_valid_codes(n):
    import galois_tpu as g

    for (nn, k, t) in VALID_CODES[n]:
        bch = g.BCH(nn, k)
        assert (bch.n, bch.k, bch.t) == (nn, k, t)


def test_bug_483():
    """Reference regression (github.com/mhostetter/galois/issues/483):
    single-codeword decode for small binary BCH codes."""
    import galois_tpu as g

    for n, k in [(15, 11), (7, 4), (31, 26)]:
        bch = g.BCH(n, k)
        GF = bch.field
        m = GF.Random(bch.k, seed=n)
        c = bch.encode(m)
        cn = np.asarray(c, dtype=np.int64)
        r = random.Random(n)
        for idx in r.sample(range(bch.n), bch.t):
            cn[idx] ^= 1
        dec, n_err = bch.decode(cn, errors=True)
        assert np.array_equal(np.asarray(dec), np.asarray(m))
        assert int(n_err) == bch.t


@pytest.mark.parametrize("q_m", [(2, 4), (3, 3)])
def test_errors_and_erasures(q_m):
    """Reference: tests/codes/test_bch.py:377-408."""
    import galois_tpu as g

    q, m = q_m
    bch = g.BCH(q**m - 1, d=7, field=g.GF(q), extension_field=g.GF(q**m))
    message = bch.field.Random(bch.k, seed=13)
    codeword = bch.encode(message)
    r = random.Random(99)

    for n_erasures in range(1, bch.d):
        c = np.asarray(codeword, dtype=np.int64).copy()
        erasure_idxs = r.sample(range(bch.n), n_erasures)
        erasures = np.zeros(c.shape, dtype=bool)
        erasures[erasure_idxs] = True
        c[erasures] = 0

        n_errors = (bch.d - 1 - n_erasures) // 2
        error_idxs = r.sample([i for i in range(bch.n) if not erasures[i]], n_errors)
        for idx in error_idxs:
            delta = r.randrange(1, q)
            c[idx] = (c[idx] + delta) % q

        decoded, n_corrected = bch.decode(c, erasures=erasures, errors=True)
        assert np.array_equal(np.asarray(decoded), np.asarray(message)), (
            f"q={q} m={m} erasures={n_erasures}"
        )
        assert int(n_corrected) == n_errors


@pytest.mark.parametrize("q_m", [(2, 4), (3, 3)])
def test_rs_errors_and_erasures(q_m):
    import galois_tpu as g

    q, m = q_m
    field = g.GF(q**m)
    rs = g.ReedSolomon(q**m - 1, d=7, field=field)
    message = field.Random(rs.k, seed=21)
    codeword = rs.encode(message)
    r = random.Random(7)

    for n_erasures in range(1, rs.d):
        c = np.asarray(codeword, dtype=np.int64).copy()
        erasure_idxs = r.sample(range(rs.n), n_erasures)
        erasures = np.zeros(c.shape, dtype=bool)
        erasures[erasure_idxs] = True
        c[erasures] = 0

        n_errors = (rs.d - 1 - n_erasures) // 2
        error_idxs = r.sample([i for i in range(rs.n) if not erasures[i]], n_errors)
        for idx in error_idxs:
            c[idx] = (c[idx] + r.randrange(1, q**m)) % q**m

        decoded, n_corrected = rs.decode(c, erasures=erasures, errors=True)
        assert np.array_equal(np.asarray(decoded), np.asarray(message))
        assert int(n_corrected) == n_errors


def test_detect():
    import galois_tpu as g

    rs = g.ReedSolomon(15, 11)
    m = rs.field.Random((6, 11), seed=5)
    c = rs.encode(m)
    assert not np.asarray(rs.detect(c)).any()
    cn = np.asarray(c, dtype=np.int64).copy()
    cn[:, 0] ^= 3
    assert np.asarray(rs.detect(cn)).all()
    # single codeword
    assert rs.detect(cn[0]) is True or rs.detect(cn[0]) == True  # noqa: E712
    assert not rs.detect(np.asarray(c, dtype=np.int64)[0])


def test_systematic_vs_nonsystematic_same_code():
    import galois_tpu as g

    for cls, n, k in [(g.BCH, 15, 7), (g.ReedSolomon, 15, 11)]:
        sys_code = cls(n, k, systematic=True)
        non_code = cls(n, k, systematic=False)
        m = sys_code.field.Random(k, seed=9)
        c1 = sys_code.encode(m)
        c2 = non_code.encode(m)
        # same code space: both satisfy the parity checks
        assert not sys_code.detect(c2)
        assert not non_code.detect(c1)
        # decode roundtrips through each
        assert np.array_equal(np.asarray(non_code.decode(c2)), np.asarray(m))
