"""Fixtures for FEC tests against the reference's Octave-generated vectors
(reference: tests/codes/conftest.py)."""

import pathlib
import pickle
import random

import numpy as np
import pytest

PATH = pathlib.Path("/root/reference/tests/codes/data")


def get_filenames(sub):
    p = PATH / sub
    if not p.exists():
        return []
    return sorted(f.stem for f in p.iterdir() if f.suffix == ".pkl")


import os

BCH_FILENAMES = get_filenames("bch")
RS_FILENAMES = get_filenames("reed_solomon")

# The full matrix is 260 code constructions; default runs keep a stratified
# subset (every 4th file, which still spans all n/q/sys combinations). Set
# GALOIS_TPU_FULL_TESTS=1 for the full sweep.
if not os.environ.get("GALOIS_TPU_FULL_TESTS"):
    BCH_FILENAMES = BCH_FILENAMES[::4]
    RS_FILENAMES = RS_FILENAMES[::4]


def read_pickle(file):
    with open(file, "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="session", params=BCH_FILENAMES)
def bch_codes(request):
    import galois_tpu as g

    d_ = read_pickle((PATH / "bch" / request.param).with_suffix(".pkl"))
    GF = g.GF(d_["q"])
    code = g.BCH(
        d_["n"], d_["k"], d=d_["d"], field=GF, alpha=d_["alpha"], c=d_["c"],
        systematic=d_["is_systematic"],
    )
    d_["code"] = code
    return d_


@pytest.fixture(scope="session", params=RS_FILENAMES)
def reed_solomon_codes(request):
    import galois_tpu as g

    d_ = read_pickle((PATH / "reed_solomon" / request.param).with_suffix(".pkl"))
    GF = g.GF(d_["q"])
    code = g.ReedSolomon(
        d_["n"], d_["k"], d=d_["d"], field=GF, alpha=d_["alpha"], c=d_["c"],
        systematic=d_["is_systematic"],
    )
    d_["code"] = code
    return d_


def random_errors(GF, N, n, max_errors):
    max_errors = min(n, max_errors)
    rng = np.random.default_rng(12345)
    N_errors = rng.integers(0, max_errors + 1, N)
    N_errors[0] = max_errors
    ERRORS = GF.Zeros((N, n))
    r = random.Random(999)
    for i in range(N):
        idx = r.sample(range(n), int(N_errors[i]))
        if idx:
            ERRORS[np.full(len(idx), i), np.array(idx)] = GF.Random(len(idx), low=1, seed=i + 1)
    return ERRORS, N_errors


# ----------------------------------------------------------------------
# Periodic executable release. Each live compiled program pins ~3-50
# memory mappings; the exhaustive 260-code matrix compiles thousands of
# distinct decoder/kernel programs in one process and exhausts the
# kernel's vm.max_map_count (65530) near the end — LLVM then aborts
# inside backend_compile. jax.clear_caches() unmaps everything (held
# jitted callables transparently recompile), so flushing every 40 tests
# keeps the map count bounded at no correctness cost.
_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _periodic_executable_release():
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 40:
        _TESTS_SINCE_CLEAR[0] = 0
        import jax

        jax.clear_caches()
