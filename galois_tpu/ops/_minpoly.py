"""Device minimal polynomial via vector Krylov dependence (Wiedemann-style).

For a random vector v, the monic generator m_v of the first linear
dependence in [v, Av, A^2 v, ...] divides the minimal polynomial of A;
the caller lcm's over a few vectors and VERIFIES m(A) == 0, falling back
to the deterministic host path (fields/_methods.py) if needed — so the
randomness never compromises correctness.

Replaces O(n) host Gaussian solves over object ints
(reference analogue: src/galois/_fields/_array.py minimal_poly) with one
masked elimination scan on device: O(n^3) with fixed trip counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields._meta import STORAGE_INT, FieldMeta
from ._charpoly import _field_sum
from ._kernels import get_ops

__all__ = ["krylov_minpoly_data", "supports"]


def supports(meta: FieldMeta) -> bool:
    return meta.storage == STORAGE_INT


@functools.partial(jax.jit, static_argnums=(0, 1))
def krylov_minpoly_data(meta: FieldMeta, mode: str, a, v):
    """a: (n, n), v: (n,) int storage.

    Returns (coeffs, d): coeffs (n+2,) ascending with coeffs[d] == 1 and
    sum_i coeffs[i] A^i v == 0, d = degree of the (A, v) minimal poly.
    """
    ops = get_ops(meta, mode)
    n = a.shape[0]
    dt = a.dtype

    def matvec(w):
        return _field_sum(ops, ops.multiply(a, w[None, :]), axis=1)

    def emit(w, _):
        nw = matvec(w)
        return nw, nw

    _, KR = jax.lax.scan(emit, v, None, length=n)
    K = jnp.concatenate([v[None, :], KR], axis=0)  # (n+1, n): v, Av, ...

    m = n + 1
    E0 = jnp.zeros((m, n), dtype=dt)        # echelon basis rows (pivot 1)
    C0 = jnp.zeros((m, m), dtype=dt)        # E[s] = sum_i C[s, i] K[i]
    used0 = jnp.zeros((m,), dtype=bool)
    piv0 = jnp.full((m,), n, dtype=jnp.int32)
    found0 = jnp.zeros((), dtype=bool)
    d0 = jnp.zeros((), dtype=jnp.int32)
    coeffs0 = jnp.zeros((m,), dtype=dt)

    def one_row(state, r):
        E, C, used, piv, found, d, coeffs = state
        row = K[r]
        comb = jnp.zeros((m,), dtype=dt).at[r].set(ops.one_like(row[0]))

        def reduce_slot(s, rc):
            row, comb = rc
            f = jnp.where(used[s], row[jnp.minimum(piv[s], n - 1)], jnp.zeros((), dt))
            row = ops.subtract(row, ops.multiply(E[s], f))
            comb = ops.subtract(comb, ops.multiply(C[s], f))
            return (row, comb)

        row, comb = jax.lax.fori_loop(0, m, reduce_slot, (row, comb))
        nz = jnp.logical_not(ops.is_zero(row))
        any_nz = jnp.any(nz)
        # dependence: this Krylov vector lies in the span of its precursors
        dep = jnp.logical_and(jnp.logical_not(any_nz), jnp.logical_not(found))
        d = jnp.where(dep, r, d)
        coeffs = jnp.where(dep, comb, coeffs)
        found = jnp.logical_or(found, dep)
        # otherwise: normalize on the leading column and store in slot r
        j = jnp.min(jnp.where(nz, jnp.arange(n), n)).astype(jnp.int32)
        lead = row[jnp.minimum(j, n - 1)]
        safe = jnp.where(ops.is_zero(lead), ops.one_like(lead), lead)
        inv = ops.reciprocal(safe)
        E = E.at[r].set(jnp.where(any_nz, ops.multiply(row, inv), E[r]))
        C = C.at[r].set(jnp.where(any_nz, ops.multiply(comb, inv), C[r]))
        used = used.at[r].set(any_nz)
        piv = piv.at[r].set(jnp.where(any_nz, j, n))
        return (E, C, used, piv, found, d, coeffs), None

    state0 = (E0, C0, used0, piv0, found0, d0, coeffs0)
    (E, C, used, piv, found, d, coeffs), _ = jax.lax.scan(
        one_row, state0, jnp.arange(m, dtype=jnp.int32)
    )
    out = jnp.zeros((n + 2,), dtype=dt).at[: m].set(coeffs)
    return out, d
