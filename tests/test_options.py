"""Print-option tests (reference: tests/test_options.py)."""

import pytest


def test_default_options():
    import galois_tpu as g

    g.set_printoptions()
    assert g.get_printoptions() == {"coeffs": "desc"}


def test_cant_modify_return_value():
    import galois_tpu as g

    options = g.get_printoptions()
    options["new_key"] = 1
    assert "new_key" not in g.get_printoptions()


def test_set_exceptions():
    import galois_tpu as g

    with pytest.raises(ValueError):
        g.set_printoptions(coeffs="invalid")


def test_set_coeffs():
    import galois_tpu as g

    GF = g.GF(3**5, repr="poly")
    a = GF(83)
    f = g.Poly([3, 0, 5, 2], field=g.GF(7))
    try:
        g.set_printoptions()
        assert str(a) == "α^4 + 2"
        assert str(f) == "3x^3 + 5x + 2"
        g.set_printoptions(coeffs="asc")
        assert str(a) == "2 + α^4"
        assert str(f) == "2 + 5x + 3x^3"
    finally:
        g.set_printoptions()
        GF.repr("int")


def test_context_manager():
    import galois_tpu as g

    GF = g.GF(3**5, repr="poly")
    a = GF(83)
    f = g.Poly([3, 0, 5, 2], field=g.GF(7))
    try:
        with g.printoptions(coeffs="asc"):
            assert g.get_printoptions()["coeffs"] == "asc"
            assert str(a) == "2 + α^4"
            assert str(f) == "2 + 5x + 3x^3"
        assert g.get_printoptions()["coeffs"] == "desc"
        assert str(a) == "α^4 + 2"
    finally:
        GF.repr("int")
