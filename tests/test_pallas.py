"""Pallas kernel correctness (interpreter mode on CPU; hardware lowering is
exercised by bench.py on TPU)."""

import numpy as np
import pytest


def test_prime_multiply_pallas_interpret():
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.ops._pallas import prime_multiply_pallas

    p = 2**31 - 1
    rng = np.random.default_rng(0)
    n = 10_000  # exercises padding (not a multiple of the tile)
    a = jnp.asarray(rng.integers(0, p, n, dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, p, n, dtype=np.int64).astype(np.uint32))
    out = prime_multiply_pallas(a, b, p, True)
    expect = (np.asarray(a, dtype=np.uint64) * np.asarray(b, dtype=np.uint64)) % p
    assert np.array_equal(np.asarray(out, dtype=np.uint64), expect)


def test_gf2m_multiply_pallas_interpret():
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.fields._hostfield import get_host_field
    from galois_tpu.ops._pallas import gf2m_multiply_pallas

    GF = g.GF(2**8)
    hf = get_host_field(GF._meta)
    rng = np.random.default_rng(1)
    n = 9_000
    a = rng.integers(0, 256, n, dtype=np.int64)
    b = rng.integers(0, 256, n, dtype=np.int64)
    out = gf2m_multiply_pallas(
        jnp.asarray(a.astype(np.uint8)),
        jnp.asarray(b.astype(np.uint8)),
        8,
        GF._meta.irreducible_poly_int,
        True,
    )
    expect = np.array([hf.multiply(int(x), int(y)) for x, y in zip(a[:256], b[:256])])
    assert np.array_equal(np.asarray(out, dtype=np.int64)[:256], expect)
