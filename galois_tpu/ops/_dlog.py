"""Discrete logarithms over GF(p^m).

Pohlig-Hellman decomposition runs at the orchestration level: the
factorization of q-1 happens on host (nt.factors), per-subgroup solves use
baby-step/giant-step. Lookup-mode fields (order <= 2^20) read the LOG table
directly on device (reference counterpart: src/galois/_domains/_calculate.py
log_brute_force/log_pollard_rho/log_pohlig_hellman :595-755 — redesigned
branch-free / table-driven here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..nt import factors
from ..fields._hostfield import HostField, get_host_field
from ..fields._meta import FieldMeta

__all__ = ["log", "host_log"]


@functools.lru_cache(maxsize=None)
def _subgroup_data(meta: FieldMeta, base_int: int):
    """Precompute Pohlig-Hellman constants for a given base (host-side)."""
    hf = get_host_field(meta)
    n = meta.order - 1
    primes, exponents = factors(n)
    groups = []
    for pi, ei in zip(primes, exponents):
        ni = pi**ei
        cofactor = n // ni
        gi = hf.power(base_int, cofactor)
        # gamma = gi^(pi^(ei-1)) has order pi; BSGS table for it
        gamma = hf.power(gi, pi ** (ei - 1))
        mstep = int(np.ceil(np.sqrt(pi)))
        baby = {}
        acc = 1
        for j in range(mstep):
            baby.setdefault(acc, j)
            acc = hf.multiply(acc, gamma)
        giant = hf.reciprocal(hf.power(gamma, mstep))
        # CRT coefficient: c_i = (n/ni) * ((n/ni)^-1 mod ni)
        crt = (n // ni) * pow(n // ni, -1, ni) % n
        groups.append(dict(pi=pi, ei=ei, ni=ni, cofactor=cofactor, gi=gi,
                           baby=baby, giant=giant, mstep=mstep, crt=crt))
    return groups, n


def _bsgs_order_p(hf: HostField, group, h: int) -> int:
    """Solve gamma^x = h where gamma has prime order pi, via BSGS."""
    baby, giant, mstep = group["baby"], group["giant"], group["mstep"]
    cur = h
    for i in range(mstep + 1):
        if cur in baby:
            return (i * mstep + baby[cur]) % group["pi"]
        cur = hf.multiply(cur, giant)
    raise ArithmeticError("Discrete log does not exist (element not in subgroup).")


def host_log(meta: FieldMeta, x: int, base: int | None = None) -> int:
    """Exact discrete log of a scalar (host Python ints)."""
    if x == 0:
        raise ArithmeticError("The discrete logarithm of 0 does not exist.")
    hf = get_host_field(meta)
    if base is None:
        base = meta.primitive_element_int
    groups, n = _subgroup_data(meta, base)
    result = 0
    for g in groups:
        # Solve gi^xi = x^cofactor in the order-ni subgroup, digit by digit.
        hi = hf.power(x, g["cofactor"])
        xi = 0
        pi, ei = g["pi"], g["ei"]
        gi_inv = hf.reciprocal(g["gi"])
        for k in range(ei):
            # strip known digits, project into order-pi subgroup
            cur = hf.multiply(hi, hf.power(gi_inv, xi))
            proj = hf.power(cur, pi ** (ei - 1 - k))
            d = _bsgs_order_p(hf, g, proj)
            xi += d * pi**k
        result = (result + xi * g["crt"]) % n
    return result


def log(x, base=None):
    """Elementwise discrete log of a FieldArray. Returns an int64 ndarray
    (or a device int64 array under jit; log(0) is then undefined rather
    than raising, since the zero test needs concrete values)."""
    import jax

    cls = type(x)
    meta = cls._meta
    traced = isinstance(x._data, jax.core.Tracer)
    if not traced:
        xi = np.asarray(x, dtype=object)
        if (np.asarray(xi) == 0).any():
            raise ArithmeticError("The discrete logarithm of 0 does not exist.")

    base_int = None if base is None else int(cls(base))

    if cls._mode == "jit-lookup":
        from ..fields._array import _kernel

        l_dev = _kernel(meta, "jit-lookup", "log_alpha")(x._data)
        n = meta.order - 1
        if base_int is not None and base_int != meta.primitive_element_int:
            lb = host_log(meta, base_int)
            try:
                inv_lb = pow(lb, -1, n)
            except ValueError:
                raise ArithmeticError(
                    f"Base {base_int} does not generate the multiplicative group."
                )
            l_dev = (l_dev.astype(jnp.int64) * inv_lb) % n
        if traced:
            return l_dev.astype(jnp.int64)
        out = np.asarray(l_dev).astype(np.int64)
    elif _device_capable(meta):
        b = meta.primitive_element_int if base_int is None else base_int
        kern = _device_log_kernel(
            meta,
            cls._mode if cls._mode != "python-calculate" else meta.default_ufunc_mode,
            b,
        )
        if traced:
            return kern(x._data).astype(jnp.int64)
        out = np.asarray(kern(x._data)).astype(np.int64)
    elif traced:
        raise NotImplementedError(
            f"log of {meta.name} uses host Pohlig-Hellman and cannot run under jit."
        )
    else:
        flat = xi.reshape(-1) if xi.ndim else xi.reshape(1)
        dtype = np.int64 if meta.order - 2 <= np.iinfo(np.int64).max else object
        vals = np.array(
            [host_log(meta, int(v), base_int) for v in flat], dtype=dtype
        )
        out = vals.reshape(xi.shape)
    if out.ndim:
        return out
    return np.int64(out) if out.dtype != object else int(out)

# ----------------------------------------------------------------------
# Batched device Pohlig-Hellman
# ----------------------------------------------------------------------

_DEVICE_MAX_PRIME = 1 << 20  # BSGS table cap: sqrt(pi) <= 1024


def _device_capable(meta: FieldMeta) -> bool:
    if meta.storage != "int":
        return False
    n = meta.order - 1
    if n >= 2**62:
        return False
    primes, _ = factors(n)
    return max(primes) <= _DEVICE_MAX_PRIME


@functools.lru_cache(maxsize=64)  # bounded: keyed on user-supplied base (see codes/_decoder.py::make_decoder)
def _device_log_kernel(meta: FieldMeta, mode: str, base_int: int):
    """Jitted batched Pohlig-Hellman: all subgroup solves and the CRT combine
    run on device; only the factorization of q-1 and the per-subgroup BSGS
    tables are host-precomputed."""
    import jax
    import jax.numpy as jnp

    from ..ops._kernels import get_ops

    ops = get_ops(meta, mode)
    hf = get_host_field(meta)
    n = meta.order - 1
    primes, exponents = factors(n)
    dt = meta.internal_dtype

    groups = []
    for pi, ei in zip(primes, exponents):
        ni = pi**ei
        cofactor = n // ni
        gi = hf.power(base_int, cofactor)
        gamma = hf.power(gi, pi ** (ei - 1))  # order pi
        mstep = int(np.ceil(np.sqrt(pi)))
        baby_vals = []
        acc = 1
        for j in range(mstep):
            baby_vals.append(acc)
            acc = hf.multiply(acc, gamma)
        order_idx = np.argsort(np.asarray(baby_vals, dtype=np.int64), kind="stable")
        baby_sorted = np.asarray(baby_vals, dtype=np.int64)[order_idx]
        giant = hf.reciprocal(hf.power(gamma, mstep))
        gi_inv = hf.reciprocal(gi)
        crt = (n // ni) * pow(n // ni, -1, ni) % n
        groups.append(dict(pi=pi, ei=ei, cofactor=cofactor, gi_inv=gi_inv,
                           baby_sorted=baby_sorted, baby_perm=order_idx.astype(np.int64),
                           giant=giant, mstep=mstep, crt=crt))

    @jax.jit
    def run(a):
        total = jnp.zeros(a.shape, dtype=jnp.int64)
        for g in groups:
            pi, ei, mstep = g["pi"], g["ei"], g["mstep"]
            hi = ops.power_static(a, g["cofactor"])
            xi = jnp.zeros(a.shape, dtype=jnp.int64)
            baby_sorted = jnp.asarray(g["baby_sorted"])
            baby_perm = jnp.asarray(g["baby_perm"])
            giant_c = ops.from_int_scalar(g["giant"])
            gi_inv_c = ops.from_int_scalar(g["gi_inv"])
            for k in range(ei):
                # strip known digits: cur = hi * gi_inv^xi
                stripped = ops.multiply(hi, ops.power(
                    jnp.broadcast_to(gi_inv_c, a.shape), xi))
                proj = ops.power_static(stripped, pi ** (ei - 1 - k))
                # BSGS in the order-pi subgroup (scan keeps the graph O(1))
                def bsgs_step(carry, i):
                    cur, d, found = carry
                    idx = jnp.searchsorted(baby_sorted, cur.astype(jnp.int64))
                    idx = jnp.clip(idx, 0, mstep - 1)
                    hit = (jnp.take(baby_sorted, idx) == cur.astype(jnp.int64)) & (~found)
                    j = jnp.take(baby_perm, idx)
                    d = jnp.where(hit, (i * mstep + j) % pi, d)
                    found = found | hit
                    cur = ops.multiply(cur, jnp.broadcast_to(giant_c, a.shape))
                    return (cur, d, found), None

                init = (proj, jnp.zeros(a.shape, dtype=jnp.int64),
                        jnp.zeros(a.shape, dtype=bool))
                (_, d, _), _ = jax.lax.scan(
                    bsgs_step, init, jnp.arange(mstep + 1, dtype=jnp.int64)
                )
                xi = xi + d * (pi**k)
            total = (total + xi * (g["crt"] % n)) % n
        return total

    return run
