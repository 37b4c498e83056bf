"""Device characteristic polynomial for int-storage fields.

Two masked-scan stages, both O(n^3) with fixed trip counts (no
data-dependent control flow — jit/vmap-safe):

1. Similarity reduction to upper Hessenberg form (Gaussian similarity
   transforms with first-nonzero pivoting, branch-free masking like
   `_linalg._row_reduce_data`).
2. The leading-principal-minor recurrence for det(xI - H) of a Hessenberg
   matrix: p_k = (x - H[k-1,k-1]) p_{k-1}
                 - sum_i H[i-1,k-1] (prod_{j=i-1}^{k-2} H[j+1,j]) p_{i-1}.

This replaces the host Berkowitz loops (fields/_methods.py) above a size
cutoff — the reference JITs its linear algebra the same way
(src/galois/_domains/_linalg.py:355-475); Berkowitz-on-host at n=512 is
minutes, this is milliseconds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields._meta import STORAGE_INT, FieldMeta
from ._kernels import get_ops

__all__ = ["charpoly_data", "supports"]


def supports(meta: FieldMeta) -> bool:
    return meta.storage == STORAGE_INT


def _field_sum(ops, prod, axis):
    """Tree-halving field reduction (log2 rounds of ops.add)."""
    out = prod
    size = out.shape[axis]
    while size > 1:
        half = size // 2
        a = jax.lax.slice_in_dim(out, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(out, half, 2 * half, axis=axis)
        rem = jax.lax.slice_in_dim(out, 2 * half, size, axis=axis)
        out = jnp.concatenate([ops.add(a, b), rem], axis=axis)
        size = half + (size - 2 * half)
    return jnp.squeeze(out, axis=axis)


@functools.partial(jax.jit, static_argnums=(0, 1))
def charpoly_data(meta: FieldMeta, mode: str, a):
    """a: (n, n) int-storage matrix -> (n+1,) ASCENDING char-poly coeffs."""
    ops = get_ops(meta, mode)
    n = a.shape[0]
    dt = a.dtype
    rows = jnp.arange(n)

    # ---- stage 1: upper Hessenberg via similarity transforms ----
    def one_col(H, j):
        col = H[:, j]
        nz = jnp.logical_not(ops.is_zero(col))
        cand = jnp.where(nz & (rows > j), rows, n)
        i = jnp.min(cand)
        found = i < n
        i_eff = jnp.where(found, i, j + 1)
        # swap rows/cols i_eff <-> j+1 (identity when i_eff == j+1)
        perm = jnp.where(rows == j + 1, i_eff, jnp.where(rows == i_eff, j + 1, rows))
        H = H[perm][:, perm]
        piv = H[j + 1, j]
        safe = jnp.where(ops.is_zero(piv), ops.one_like(piv), piv)
        inv = ops.reciprocal(safe)
        colj = H[:, j]
        f = jnp.where(rows > j + 1, ops.multiply(colj, inv), jnp.zeros((), dt))
        # row ops: H -= outer(f, H[j+1, :])
        H = ops.subtract(H, ops.multiply(f[:, None], H[j + 1][None, :]))
        # similarity column update: H[:, j+1] += H @ f
        mv = _field_sum(ops, ops.multiply(H, f[None, :]), axis=1)
        H = H.at[:, j + 1].set(ops.add(H[:, j + 1], mv))
        return H, None

    if n > 2:
        H, _ = jax.lax.scan(one_col, a, jnp.arange(n - 2))
    else:
        H = a

    # ---- stage 2: minor recurrence on the Hessenberg matrix ----
    # P[r] holds ascending coeffs of p_r (n+1 wide); w[r] = running
    # subdiagonal product prod_{j=r}^{k-2} H[j+1, j] (w[k-1] = 1).
    P0 = jnp.zeros((n + 1, n + 1), dtype=dt).at[0, 0].set(ops.one_like(H[0, 0]))
    w0 = jnp.zeros((n + 1,), dtype=dt).at[0].set(ops.one_like(H[0, 0]))
    r_idx = jnp.arange(n + 1)

    # subdiagonal H[j+1, j], j = 0..n-2
    beta = H[(jnp.arange(n - 1) + 1, jnp.arange(n - 1))] if n > 1 else jnp.zeros((0,), dt)

    def one_k(state, k):
        P, w = state
        # p_{k-1} coeffs and x * p_{k-1}
        pk1 = P[k - 1]
        shifted = jnp.roll(pk1, 1).at[0].set(0)
        diag = H[k - 1, k - 1]
        t1 = ops.subtract(shifted, ops.multiply(pk1, diag))
        # weights over previous rows r = i-1 in [0, k-2]:
        #   v[r] = H[r, k-1] * prod_{j=r}^{k-2} beta_j = H[r, k-1] * w[r]
        hcol = H[:, k - 1]  # entries H[r, k-1]
        hr = jnp.where(r_idx[:-1] <= k - 2, hcol, jnp.zeros((), dt))
        v = ops.multiply(hr, w[:-1])
        v = jnp.where(r_idx[:-1] <= k - 2, v, jnp.zeros((), dt))
        sum_term = _field_sum(ops, ops.multiply(v[:, None], P[:-1]), axis=0)
        pk = ops.subtract(t1, sum_term)
        P = P.at[k].set(pk)
        # advance w for step k+1: w'[r] = w[r] * beta_{k-1}, and w'[k] = 1
        bk = jnp.where(k - 1 < n - 1, beta[jnp.minimum(k - 1, n - 2)], jnp.zeros((), dt)) if n > 1 else jnp.zeros((), dt)
        w = ops.multiply(w, bk)
        w = w.at[k].set(ops.one_like(bk))
        return (P, w), None

    (P, _), _ = jax.lax.scan(one_k, (P0, w0), jnp.arange(1, n + 1))
    return P[n]
