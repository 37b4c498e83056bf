"""Bit-exact elementwise-arithmetic parity with the reference's SageMath
golden vectors (reference test analogue: tests/fields/test_arithmetic.py).

Each pickle holds X, Y (1-D operand vectors) and Z, the full outer table
Z[i, j] = X[i] op Y[j] (or a 1-D result for unary ops)."""

import numpy as np
import pytest

from .conftest import construct_field, load_pickle

# Field/mode matrix — mirrors the reference's FIELDS_DIFF_MODES
# (reference: tests/fields/conftest.py:38-72) plus the extra modes our
# limb/digit kernels unlock (e.g. GF(2^100) jit-calculate on device).
FIELDS = [
    "GF(2)-jit-calculate",
    "GF(2)-python-calculate",
    "GF(2^2)-jit-lookup",
    "GF(2^2)-jit-calculate",
    "GF(2^3)-jit-lookup",
    "GF(2^3)-jit-calculate",
    "GF(2^8)-jit-lookup",
    "GF(2^8)-jit-calculate",
    "GF(2^8, 283, 19)-jit-lookup",
    "GF(2^8, 283, 19)-jit-calculate",
    "GF(2^32)-jit-calculate",
    "GF(2^100)-jit-calculate",
    "GF(2^100)-python-calculate",
    "GF(5)-jit-lookup",
    "GF(5)-jit-calculate",
    "GF(5)-python-calculate",
    "GF(7)-jit-lookup",
    "GF(7)-jit-calculate",
    "GF(31)-jit-lookup",
    "GF(31)-jit-calculate",
    "GF(3191)-jit-lookup",
    "GF(3191)-jit-calculate",
    "GF(2147483647)-jit-calculate",
    "GF(36893488147419103183)-jit-calculate",
    "GF(36893488147419103183)-python-calculate",
    "GF(7^3)-jit-lookup",
    "GF(7^3)-jit-calculate",
    "GF(7^3, 643, 244)-jit-lookup",
    "GF(7^3, 643, 244)-jit-calculate",
    "GF(109987^4)-jit-calculate",
    "GF(109987^4)-python-calculate",
]


@pytest.fixture(params=FIELDS, scope="module")
def field(request):
    GF, mode, folder = construct_field(request.param)
    return GF, folder


def _eq(result, expected) -> bool:
    a = np.asarray(result, dtype=object)
    b = np.asarray(expected, dtype=object)
    return a.shape == b.shape and bool(np.all(a == b))


def test_add(field):
    GF, folder = field
    d = load_pickle(folder, "add")
    x = GF(d["X"].reshape(-1, 1))
    y = GF(d["Y"].reshape(1, -1))
    assert _eq(x + y, d["Z"])


def test_subtract(field):
    GF, folder = field
    d = load_pickle(folder, "subtract")
    x = GF(d["X"].reshape(-1, 1))
    y = GF(d["Y"].reshape(1, -1))
    assert _eq(x - y, d["Z"])


def test_multiply(field):
    GF, folder = field
    d = load_pickle(folder, "multiply")
    x = GF(d["X"].reshape(-1, 1))
    y = GF(d["Y"].reshape(1, -1))
    assert _eq(x * y, d["Z"])


def test_divide(field):
    GF, folder = field
    d = load_pickle(folder, "divide")
    x = GF(d["X"].reshape(-1, 1))
    y = GF(d["Y"].reshape(1, -1))
    assert _eq(x / y, d["Z"])


def test_additive_inverse(field):
    GF, folder = field
    d = load_pickle(folder, "additive_inverse")
    assert _eq(-GF(d["X"]), d["Z"])


def test_multiplicative_inverse(field):
    GF, folder = field
    d = load_pickle(folder, "multiplicative_inverse")
    assert _eq(GF(d["X"]).multiplicative_inverse(), d["Z"])


def test_scalar_multiply(field):
    GF, folder = field
    d = load_pickle(folder, "scalar_multiply")
    x = GF(d["X"].reshape(-1, 1))
    y = d["Y"].reshape(1, -1)  # plain integers
    assert _eq(x * y, d["Z"])


def test_power(field):
    GF, folder = field
    d = load_pickle(folder, "power")
    x = GF(d["X"].reshape(-1, 1))
    y = d["Y"].reshape(1, -1)
    assert _eq(x**y, d["Z"])


def test_log(field):
    GF, folder = field
    d = load_pickle(folder, "log")
    out = GF(d["X"]).log()
    assert _eq(out, d["Z"])
