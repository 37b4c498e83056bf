"""Randomized algebraic-law consistency across every storage kind.

Golden-vector suites pin down parity with the reference on sampled points;
these pin down the algebra itself — field axioms, Frobenius, and
inverse/power coherence — on fresh random draws, including field sizes the
reference's pickles never touch (Goldilocks, 255-bit primes, GF(2^100)).
"""

import numpy as np
import pytest

FIELDS = [
    2,
    31,
    2**8,
    3**5,
    2**31 - 1,
    2097169,  # generic >2^16 prime: u32 Barrett one-shot multiply
    7**7,  # odd ext, int storage
    2**24,  # binary ext two-u32-word clmul path (m in 17..32)
    2**64 - 2**32 + 1,  # Goldilocks, limb storage
    2**61 - 1,  # Mersenne-61, limb storage (L=4: fused schoolbook product)
    2**100,  # binary ext, limb storage
    2**127 - 1,  # 8-limb prime: anti-diagonal int8-matmul product fold
    (2**255 - 19),  # 255-bit prime, limb storage (L=16 matmul fold)
]


@pytest.fixture(params=FIELDS, ids=lambda q: f"GF({q})")
def field(request):
    import galois_tpu as g

    return g.GF(request.param)


def _rand(field, n, seed):
    return field.Random(n, seed=seed)


def test_ring_axioms(field):
    n = 17
    a, b, c = _rand(field, n, 1), _rand(field, n, 2), _rand(field, n, 3)
    assert np.array_equal(np.asarray(a + b), np.asarray(b + a))
    assert np.array_equal(np.asarray(a * b), np.asarray(b * a))
    assert np.array_equal(np.asarray((a + b) + c), np.asarray(a + (b + c)))
    assert np.array_equal(np.asarray((a * b) * c), np.asarray(a * (b * c)))
    assert np.array_equal(np.asarray(a * (b + c)), np.asarray(a * b + a * c))
    assert np.array_equal(np.asarray(a - a), np.asarray(field.Zeros(n)))
    assert np.array_equal(np.asarray(a + (-a)), np.asarray(field.Zeros(n)))


def test_inverse_and_power_coherence(field):
    n = 17
    a = _rand(field, n, 4)
    nz = field(np.asarray(a, dtype=object)[np.asarray(a, dtype=object) != 0])
    if nz.size == 0:
        pytest.skip("all-zero draw")
    inv = nz**-1
    assert np.all(np.asarray(nz * inv, dtype=object) == 1)
    assert np.array_equal(np.asarray(nz**3), np.asarray(nz * nz * nz))
    # Fermat: a^(q-1) = 1 for a != 0
    assert np.all(np.asarray(nz ** (field.order - 1), dtype=object) == 1)


def test_frobenius_is_additive(field):
    # (a + b)^p == a^p + b^p in characteristic p
    n = 9
    p = field.characteristic
    if p.bit_length() > 40:
        pytest.skip("p too large for a meaningful exponent test")
    a, b = _rand(field, n, 5), _rand(field, n, 6)
    lhs = (a + b) ** p
    rhs = a**p + b**p
    assert np.array_equal(np.asarray(lhs, dtype=object), np.asarray(rhs, dtype=object))


def test_sqrt_of_squares(field):
    n = 9
    a = _rand(field, n, 7)
    sq = a * a
    r = sq.sqrt()
    assert np.array_equal(np.asarray(r * r, dtype=object), np.asarray(sq, dtype=object))


def test_scalar_comparison_broadcast(field):
    """a == scalar / a != 0 must broadcast across every storage layout —
    planar limb storage aligns the LEADING limb axis while element axes
    broadcast trailing-relative (regression: round-3 planar rewrite)."""
    a = _rand(field, 11, 8)
    vals = np.asarray(a, dtype=object)
    nz_mask = np.asarray(a != 0)
    assert nz_mask.shape == (11,)
    assert np.array_equal(nz_mask, vals != 0)
    first = a[0]  # 0-D scalar FieldArray
    assert np.array_equal(np.asarray(a == first), vals == vals[0])
    # boolean-mask indexing rides the same comparison path
    nz = a[a != 0]
    assert nz.size == int((vals != 0).sum())
