"""LFSR and Berlekamp-Massey tests
(reference: tests/test_fibonacci_lfsr.py, test_galois_lfsr.py,
test_berlekamp_massey.py — property-based)."""

import numpy as np
import pytest


def _char_polys():
    import galois_tpu as g

    return [
        g.primitive_poly(7, 4),
        g.Poly.Str(
            "x^4 + 414029366129716807589746234643x^3 + 713840634647528950143955598853x^2 + "
            "178965232760409569156590479285x + 574717025925479275195710910921",
            field=g.GF(2**100),
        ),
    ]


def test_from_taps():
    import galois_tpu as g

    GF = g.GF(7)
    T = GF([1, 2, 3, 4])
    lfsr = g.FLFSR.Taps(T)
    assert lfsr.characteristic_poly == g.Poly([1, -1, -2, -3, -4], field=GF)
    assert lfsr.feedback_poly == g.Poly([-4, -3, -2, -1, 1], field=GF)


def test_repr_str():
    import galois_tpu as g

    c = g.primitive_poly(7, 4)
    lfsr = g.FLFSR(c.reverse())
    assert repr(lfsr) == "<Fibonacci LFSR: f(x) = 1 + x^2 + 3x^3 + 5x^4 over GF(7)>"


@pytest.mark.parametrize("idx", [0, 1])
def test_step_forwards_backwards(idx):
    import galois_tpu as g

    c = _char_polys()[idx]
    lfsr = g.FLFSR(c.reverse(), state=[1, 2, 3, 4])
    y1 = lfsr.step(10)
    y2 = lfsr.step(-10)
    assert np.array_equal(np.asarray(y1, dtype=object), np.asarray(y2, dtype=object)[::-1])
    assert np.array_equal(
        np.asarray(lfsr.state, dtype=object), np.asarray(lfsr.initial_state, dtype=object)
    )


@pytest.mark.parametrize("idx", [0, 1])
def test_fibonacci_galois_equivalence(idx):
    import galois_tpu as g

    c = _char_polys()[idx]
    fib = g.FLFSR(c.reverse(), state=[1, 2, 3, 4])
    gal = fib.to_galois_lfsr()
    yf = fib.step(24)
    yg = gal.step(24)
    assert np.array_equal(np.asarray(yf, dtype=object), np.asarray(yg, dtype=object))
    back = gal.to_fibonacci_lfsr()
    # both have stepped 24; reset from scratch instead
    fib2 = g.FLFSR(c.reverse(), state=[1, 2, 3, 4])
    gal2 = fib2.to_galois_lfsr()
    fib3 = gal2.to_fibonacci_lfsr()
    assert np.array_equal(
        np.asarray(fib2.step(12), dtype=object), np.asarray(fib3.step(12), dtype=object)
    )


@pytest.mark.parametrize("idx", [0, 1])
def test_berlekamp_massey_roundtrip(idx):
    import galois_tpu as g

    c = _char_polys()[idx]
    lfsr = g.FLFSR(c.reverse(), state=[1, 2, 3, 4])
    y = lfsr.step(16)
    c_found = g.berlekamp_massey(y)
    assert c_found == c
    for output, kind in [("fibonacci", g.FLFSR), ("galois", g.GLFSR)]:
        reg = g.berlekamp_massey(y, output=output)
        assert isinstance(reg, kind)
        z = reg.step(y.size)
        assert np.array_equal(np.asarray(y, dtype=object), np.asarray(z, dtype=object))


def test_exceptions():
    import galois_tpu as g

    c = g.primitive_poly(7, 4)
    with pytest.raises(TypeError):
        g.FLFSR(c.reverse().coeffs)
    with pytest.raises(ValueError):
        coeffs = [int(v) for v in np.asarray(c.reverse().coefficients(), dtype=np.int64)]
        coeffs[-1] = 2
        g.FLFSR(g.Poly(coeffs, field=g.GF(7)))
    with pytest.raises(ValueError):
        g.FLFSR(c.reverse(), state=[1, 2, 3, 4, 5])


def test_berlekamp_massey_device_scan_matches_host():
    """Sequences >= 512 route through the lax.scan BM kernel; it must agree
    with the host discrepancy loop on the same recurrence."""
    import numpy as np

    import galois_tpu as g

    rng = np.random.default_rng(5)
    for q in (2, 2**8, 31):
        GF = g.GF(q)
        deg = 9
        coeffs = [1] + [int(v) for v in rng.integers(0, q, deg - 1)] + [1]
        lf = g.FLFSR(g.Poly(coeffs, field=GF), state=[1] * deg)
        seq = lf.step(600)
        dev = g.berlekamp_massey(seq)            # device path (N=600)
        host = g.berlekamp_massey(seq[:40])      # host path, same recurrence
        assert dev == host
        assert dev == g.berlekamp_massey(seq, output="characteristic")
        conn = g.berlekamp_massey(seq, output="connection")
        assert conn.reverse() == dev


def test_berlekamp_massey_device_high_complexity():
    """Linear complexity can reach the full sequence length (an impulse at
    the end of an all-zero prefix); the device scan must not truncate the
    connection polynomial (review finding: K = n//2 capacity was too small)."""
    import galois_tpu as g

    GF2 = g.GF(2)
    seq = GF2([0] * 511 + [1])
    conn = g.berlekamp_massey(seq, output="connection")
    assert conn.degree == 512
    assert conn == g.Poly.Degrees([512, 0], field=GF2)
