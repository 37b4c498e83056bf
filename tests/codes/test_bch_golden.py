"""BCH parity with the reference's Octave-generated vectors
(reference tests: tests/codes/test_bch.py)."""

import numpy as np
import pytest

from .conftest import random_errors


def test_properties(bch_codes):
    import galois_tpu as g

    code = bch_codes["code"]
    assert code.n == bch_codes["n"]
    assert code.k == bch_codes["k"]
    assert code.d == bch_codes["d"]
    assert int(code.alpha) == bch_codes["alpha"]
    assert code.c == bch_codes["c"]
    assert code.is_primitive == bch_codes["is_primitive"]
    assert code.is_narrow_sense == bch_codes["is_narrow_sense"]
    assert str(code.generator_poly) == bch_codes["generator_poly"].replace("*", "")
    assert str(code.parity_check_poly) == bch_codes["parity_check_poly"].replace("*", "")
    assert np.array_equal(np.asarray(code.G, dtype=np.int64), bch_codes["G"])
    assert np.array_equal(np.asarray(code.H, dtype=np.int64), bch_codes["H"])


def test_encode(bch_codes):
    code = bch_codes["code"]
    enc = bch_codes["encode"]
    if not enc:
        pytest.skip("no encode vectors")
    messages = enc["messages"]
    codewords = enc["codewords"]
    out = code.encode(messages)
    assert np.array_equal(np.asarray(out, dtype=np.int64), codewords)
    # vector form
    out1 = code.encode(messages[0])
    assert np.array_equal(np.asarray(out1, dtype=np.int64), codewords[0])
    if code.is_systematic:
        par = code.encode(messages, output="parity")
        assert np.array_equal(np.asarray(par, dtype=np.int64), codewords[:, code.k :])


def test_encode_shortened(bch_codes):
    code = bch_codes["code"]
    enc = bch_codes["encode"]
    if not enc or code.k <= 1:
        pytest.skip("cannot shorten")
    messages = code.field(enc["messages"])
    s = max(1, code.k // 2)
    full = np.asarray(messages, dtype=np.int64).copy()
    full[:, :s] = 0
    full_cw = code.encode(full)
    short_cw = code.encode(full[:, s:])
    assert np.array_equal(
        np.asarray(full_cw, dtype=np.int64)[:, s:], np.asarray(short_cw, dtype=np.int64)
    )


def test_decode(bch_codes):
    code = bch_codes["code"]
    GF = code.field
    N = 5
    MESSAGES = GF.Random((N, code.k), seed=7)
    ERRORS, N_errors = random_errors(GF, N, code.n, code.t)
    CODEWORDS = code.encode(MESSAGES)
    R = CODEWORDS + ERRORS

    dec = code.decode(R)
    assert np.array_equal(np.asarray(dec), np.asarray(MESSAGES))
    dec, n_corr = code.decode(R, errors=True)
    assert np.array_equal(np.asarray(dec), np.asarray(MESSAGES))
    assert np.array_equal(np.asarray(n_corr), N_errors)
    dec_cw = code.decode(R, output="codeword")
    assert np.array_equal(np.asarray(dec_cw), np.asarray(CODEWORDS))


def test_decode_shortened(bch_codes):
    code = bch_codes["code"]
    if code.k <= 1 or not code.is_systematic:
        pytest.skip("cannot shorten")
    GF = code.field
    N = 5
    s = max(1, code.k // 2)
    MESSAGES = GF.Random((N, code.k - s), seed=11)
    ERRORS, N_errors = random_errors(GF, N, code.n - s, code.t)
    CODEWORDS = code.encode(MESSAGES)
    R = CODEWORDS + ERRORS
    dec, n_corr = code.decode(R, errors=True)
    assert np.array_equal(np.asarray(dec), np.asarray(MESSAGES))
    assert np.array_equal(np.asarray(n_corr), N_errors)
