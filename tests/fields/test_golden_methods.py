"""Matrix/Galois-theory method parity with the reference's SageMath vectors
(reference tests: tests/fields/test_linalg.py and friends)."""

import numpy as np
import pytest

from .conftest import construct_field, load_pickle

# One mode per field is enough for method-level tests (arithmetic modes are
# covered exhaustively in test_golden_arithmetic).
FIELDS = [
    "GF(2)",
    "GF(2^2)",
    "GF(2^8)",
    "GF(2^32)",
    "GF(5)",
    "GF(31)",
    "GF(3191)",
    "GF(2147483647)",
    "GF(7^3)",
    "GF(2^100)",
    "GF(36893488147419103183)",
    "GF(109987^4)",
]


@pytest.fixture(params=FIELDS, scope="module")
def field(request):
    GF, mode, folder = construct_field(request.param)
    return GF, folder


def _eq(result, expected) -> bool:
    a = np.asarray(result, dtype=object)
    b = np.asarray(expected, dtype=object)
    return a.shape == b.shape and bool(np.all(a == b))


def test_matrix_multiply(field):
    GF, folder = field
    d = load_pickle(folder, "matrix_multiply")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert _eq(GF(x) @ GF(y), z)


def test_row_reduce(field):
    GF, folder = field
    d = load_pickle(folder, "row_reduce")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(GF(x).row_reduce(), z)


def test_lu_decompose(field):
    GF, folder = field
    d = load_pickle(folder, "lu_decompose")
    for x, l, u in zip(d["X"], d["L"], d["U"]):
        L, U = GF(x).lu_decompose()
        assert _eq(L, l) and _eq(U, u)


def test_plu_decompose(field):
    GF, folder = field
    d = load_pickle(folder, "plu_decompose")
    for x, p, l, u in zip(d["X"], d["P"], d["L"], d["U"]):
        P, L, U = GF(x).plu_decompose()
        assert _eq(P, p) and _eq(L, l) and _eq(U, u)


def test_matrix_inverse(field):
    GF, folder = field
    d = load_pickle(folder, "matrix_inverse")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(np.linalg.inv(GF(x)), z)


def test_matrix_determinant(field):
    GF, folder = field
    d = load_pickle(folder, "matrix_determinant")
    for x, z in zip(d["X"], d["Z"]):
        assert int(np.linalg.det(GF(x))) == int(z)


def test_matrix_solve(field):
    GF, folder = field
    d = load_pickle(folder, "matrix_solve")
    for x, y, z in zip(d["X"], d["Y"], d["Z"]):
        assert _eq(np.linalg.solve(GF(x), GF(y)), z)


def test_row_space(field):
    GF, folder = field
    d = load_pickle(folder, "row_space")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(GF(x).row_space(), z)


def test_column_space(field):
    GF, folder = field
    d = load_pickle(folder, "column_space")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(GF(x).column_space(), z)


def test_left_null_space(field):
    GF, folder = field
    d = load_pickle(folder, "left_null_space")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(GF(x).left_null_space(), z)


def test_null_space(field):
    GF, folder = field
    d = load_pickle(folder, "null_space")
    for x, z in zip(d["X"], d["Z"]):
        assert _eq(GF(x).null_space(), z)


def test_additive_order(field):
    GF, folder = field
    d = load_pickle(folder, "additive_order")
    assert _eq(GF(d["X"]).additive_order(), d["Z"])


def test_multiplicative_order(field):
    GF, folder = field
    d = load_pickle(folder, "multiplicative_order")
    assert _eq(GF(d["X"]).multiplicative_order(), d["Z"])


def test_field_trace(field):
    GF, folder = field
    d = load_pickle(folder, "field_trace")
    assert _eq(GF(d["X"]).field_trace(), d["Z"])


def test_field_norm(field):
    GF, folder = field
    d = load_pickle(folder, "field_norm")
    assert _eq(GF(d["X"]).field_norm(), d["Z"])


def _coeffs(poly):
    return [int(c) for c in np.asarray(poly.coefficients(), dtype=object)]


def test_characteristic_poly_element(field):
    GF, folder = field
    d = load_pickle(folder, "characteristic_poly_element")
    for x, z in zip(d["X"], d["Z"]):
        poly = GF(int(x)).characteristic_poly()
        assert _coeffs(poly) == [int(c) for c in z]


def test_characteristic_poly_matrix(field):
    GF, folder = field
    d = load_pickle(folder, "characteristic_poly_matrix")
    for x, z in zip(d["X"], d["Z"]):
        poly = GF(x).characteristic_poly()
        assert _coeffs(poly) == [int(c) for c in z]


def test_minimal_poly_element(field):
    GF, folder = field
    d = load_pickle(folder, "minimal_poly_element")
    for x, z in zip(d["X"], d["Z"]):
        poly = GF(int(x)).minimal_poly()
        assert _coeffs(poly) == [int(c) for c in z]


def test_field_properties_json(field):
    """Construction parity: characteristic/degree/order/alpha/irreducible poly
    match the reference's properties.json for each golden field."""
    import json
    import pathlib

    GF, folder = field
    path = pathlib.Path(folder) / "properties.json"
    if not path.exists():
        pytest.skip("no properties.json")
    props = json.loads(path.read_text())
    assert GF.characteristic == props["characteristic"]
    assert GF.degree == props["degree"]
    assert GF.order == props["order"]
    assert int(GF.primitive_element) == props["primitive_element"]
    coeffs = [int(c) for c in np.asarray(GF.irreducible_poly.coefficients(), dtype=object)]
    assert coeffs == [int(c) for c in props["irreducible_poly"]]
