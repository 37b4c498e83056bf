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

VALID_CODES[127] = [
    (127, 120, 1), (127, 113, 2), (127, 106, 3), (127, 99, 4), (127, 92, 5),
    (127, 85, 6), (127, 78, 7), (127, 71, 9), (127, 64, 10), (127, 57, 11),
    (127, 50, 13), (127, 43, 14), (127, 36, 15), (127, 29, 21), (127, 22, 23),
    (127, 15, 27), (127, 8, 31), (127, 1, 63),
]
VALID_CODES[255] = [
    (255, 247, 1), (255, 239, 2), (255, 231, 3), (255, 223, 4), (255, 215, 5),
    (255, 207, 6), (255, 199, 7), (255, 191, 8), (255, 187, 9), (255, 179, 10),
    (255, 171, 11), (255, 163, 12), (255, 155, 13), (255, 147, 14),
    (255, 139, 15), (255, 131, 18), (255, 123, 19), (255, 115, 21),
    (255, 107, 22), (255, 99, 23), (255, 91, 25), (255, 87, 26), (255, 79, 27),
    (255, 71, 29), (255, 63, 30), (255, 55, 31), (255, 47, 42), (255, 45, 43),
    (255, 37, 45), (255, 29, 47), (255, 21, 55), (255, 13, 59), (255, 9, 63),
    (255, 1, 127),
]


@pytest.mark.parametrize("n", sorted(VALID_CODES))
def test_bch_valid_codes(n):
    import galois_tpu as g

    table = VALID_CODES[n]
    # large n: construction is host-side minimal-poly work; sample the table
    if n >= 127:
        table = random.Random(n).sample(table, 4)
    for (nn, k, t) in table:
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
