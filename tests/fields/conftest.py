"""Fixtures for field tests: construct galois_tpu fields matching the
reference's golden-vector directories (reference: tests/fields/conftest.py)."""

import pathlib
import pickle

import numpy as np
import pytest

DATA = pathlib.Path("/root/reference/tests/fields/data")


def construct_field(spec: str):
    """spec: e.g. 'GF(2^8)-jit-lookup' or 'GF(7^3, 643, 244)-jit-calculate'."""
    import galois_tpu

    if "-" in spec:
        folder, mode = spec.split("-", maxsplit=1)
    else:
        folder, mode = spec, "auto"

    inner = folder[3:-1]  # strip 'GF(' and ')'
    parts = [s.strip() for s in inner.split(",")]
    if "^" in parts[0]:
        p, m = parts[0].split("^")
        order = int(p) ** int(m)
    else:
        order = int(parts[0])
    kwargs = {}
    if len(parts) == 3:
        kwargs["irreducible_poly"] = int(parts[1])
        kwargs["primitive_element"] = int(parts[2])
    GF = galois_tpu.GF(order, compile=mode, **kwargs)
    return GF, mode, DATA / folder


def load_pickle(folder: pathlib.Path, name: str):
    path = folder / f"{name}.pkl"
    if not path.exists():
        pytest.skip(f"golden vector {path} not available")
    with open(path, "rb") as f:
        return pickle.load(f)
