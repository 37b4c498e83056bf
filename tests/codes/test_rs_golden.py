"""Reed-Solomon parity with the reference's Octave-generated vectors
(reference tests: tests/codes/test_reed_solomon.py)."""

import numpy as np
import pytest

from .conftest import random_errors


def test_properties(reed_solomon_codes):
    import galois_tpu as g

    code = reed_solomon_codes["code"]
    assert code.n == reed_solomon_codes["n"]
    assert code.k == reed_solomon_codes["k"]
    assert code.d == reed_solomon_codes["d"]
    assert int(code.alpha) == reed_solomon_codes["alpha"]
    assert code.c == reed_solomon_codes["c"]
    assert code.is_primitive == reed_solomon_codes["is_primitive"]
    assert code.is_narrow_sense == reed_solomon_codes["is_narrow_sense"]
    assert str(code.generator_poly) == reed_solomon_codes["generator_poly"].replace("*", "")
    assert np.array_equal(np.asarray(code.G, dtype=np.int64), reed_solomon_codes["G"])
    assert np.array_equal(np.asarray(code.H, dtype=np.int64), reed_solomon_codes["H"])


def test_encode(reed_solomon_codes):
    code = reed_solomon_codes["code"]
    enc = reed_solomon_codes["encode"]
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


def test_encode_shortened(reed_solomon_codes):
    code = reed_solomon_codes["code"]
    enc = reed_solomon_codes["encode"]
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


def test_decode(reed_solomon_codes):
    code = reed_solomon_codes["code"]
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


def test_decode_shortened(reed_solomon_codes):
    code = reed_solomon_codes["code"]
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
