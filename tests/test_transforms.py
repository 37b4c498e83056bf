"""NTT/INTT tests (reference: tests/fields/test_ntt.py — sympy-generated LUTs)."""

import numpy as np
import pytest


NTT_LUTS = [
    ([1, 2, 3, 4], 5, [0, 4, 3, 2]),
    ([1, 2, 3, 4], 13, [10, 8, 11, 1]),
    ([1, 2, 3, 4], 17, [10, 6, 15, 7]),
    ([1, 2, 3, 4], 3 * 256 + 1, [10, 643, 767, 122]),
]


@pytest.mark.parametrize(["x", "p", "X"], NTT_LUTS)
def test_ntt(x, p, X):
    import galois_tpu as g

    GF = g.GF(p)
    for form in (tuple(x), list(x), np.array(x), GF(x)):
        X_test = g.ntt(form, modulus=p) if not isinstance(form, GF) else g.ntt(form)
        assert isinstance(X_test, GF)
        assert np.array_equal(np.asarray(X_test, dtype=np.int64), X)


@pytest.mark.parametrize(["x", "p", "X"], NTT_LUTS)
def test_intt(x, p, X):
    import galois_tpu as g

    GF = g.GF(p)
    x_test = g.intt(X, modulus=p)
    assert isinstance(x_test, GF)
    assert np.array_equal(np.asarray(x_test, dtype=np.int64), x)
    # unscaled
    x_un = g.intt(X, modulus=p, scaled=False)
    n_inv = pow(len(x), -1, p)
    assert np.array_equal(
        (np.asarray(x_un, dtype=np.int64) * n_inv) % p, np.asarray(x, dtype=np.int64)
    )


def test_ntt_exceptions():
    import galois_tpu as g

    with pytest.raises(ValueError):
        g.ntt(g.GF(2**8)([1, 2, 3, 4]))
    with pytest.raises(ValueError):
        g.ntt([1, 2, 3, 4], size=3)
    with pytest.raises(ValueError):
        g.ntt([1, 2, 3, 40], modulus=13)
    with pytest.raises(ValueError):
        g.ntt([1, 2, 3, 4], modulus=3 * 256 + 2)


def test_fft_ifft_roundtrip_fields():
    import galois_tpu as g

    for q, N in [(257, 64), (2**8, 15), (7**3, 18), (3 * 2**30 + 1, 4096)]:
        F = g.GF(q)
        x = F.Random(N, seed=q)
        X = np.fft.fft(x)
        assert isinstance(X, F)
        back = np.fft.ifft(X)
        assert np.array_equal(np.asarray(back), np.asarray(x))


def test_convolve_golden():
    """np.convolve parity with reference golden vectors."""
    import pathlib
    import pickle

    import galois_tpu as g

    for folder, order in [("GF(31)", 31), ("GF(2^8)", 2**8), ("GF(7^3)", 7**3)]:
        path = pathlib.Path(f"/root/reference/tests/fields/data/{folder}/convolve.pkl")
        if not path.exists():
            pytest.skip("no convolve vectors")
        with open(path, "rb") as f:
            d = pickle.load(f)
        F = g.GF(order)
        X, Y, Z = d["X"], d["Y"], d["Z"]  # lists of 1-D arrays
        for xi, yi, zi in zip(X, Y, Z):
            out = np.convolve(F(xi), F(yi))
            assert np.array_equal(np.asarray(out, dtype=np.int64), np.asarray(zi))


def test_batched_limb_transform_matches_single():
    """A leading batch axis on a planar-limb transform (after the (w,) limb
    axis) gives the same per-item results as single transforms — the shape
    bench.py's batched Goldilocks/BLS legs rely on."""
    import jax.numpy as jnp
    import numpy as np

    import galois_tpu as g
    from galois_tpu.ops._ntt import _fft_jit, _get_omega, _plan

    F = g.GF(2**64 - 2**32 + 1)
    w = F._meta.storage_width
    N = 4096
    plan = _plan(F._meta, N, _get_omega(F, N), "jit-calculate")
    rng = np.random.default_rng(0)
    xb = rng.integers(0, 2**16, (w, 3, N), dtype=np.int64).astype(np.uint16)
    f = _fft_jit(plan)
    out_b = np.asarray(f(jnp.asarray(xb)))
    for b in range(3):
        out_1 = np.asarray(f(jnp.asarray(xb[:, b])))
        assert np.array_equal(out_b[:, b], out_1), b
