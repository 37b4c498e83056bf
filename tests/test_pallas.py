"""Pallas kernel correctness (interpreter mode on CPU; hardware lowering is
exercised by bench.py on TPU)."""

import numpy as np
import pytest


def test_prime_multiply_pallas_interpret():
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.ops._pallas import prime_multiply_pallas

    p = 2**31 - 1
    rng = np.random.default_rng(0)
    n = 10_000  # exercises padding (not a multiple of the tile)
    a = jnp.asarray(rng.integers(0, p, n, dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, p, n, dtype=np.int64).astype(np.uint32))
    out = prime_multiply_pallas(a, b, p, True)
    expect = (np.asarray(a, dtype=np.uint64) * np.asarray(b, dtype=np.uint64)) % p
    assert np.array_equal(np.asarray(out, dtype=np.uint64), expect)


@pytest.mark.parametrize("m", [2, 3, 4, 5, 6, 7, 8])
def test_swar_mul_core(m):
    """The packed 4-elements-per-u32 multiply core, validated against the
    host field for every GF(2^m), m <= 8 (packing done with plain numpy —
    no pallas_call, so this runs on any backend)."""
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.fields._hostfield import get_host_field
    from galois_tpu.ops._pallas._elementwise import _swar_mul_core

    GF = g.GF(2**m)
    hf = get_host_field(GF._meta)
    f_int = GF._meta.irreducible_poly_int
    rng = np.random.default_rng(m)
    n = 4096
    a = rng.integers(0, 2**m, n, dtype=np.uint8)
    b = rng.integers(0, 2**m, n, dtype=np.uint8)
    A = jnp.asarray(a.view(np.uint32))
    B = jnp.asarray(b.view(np.uint32))
    C = np.asarray(_swar_mul_core(A, B, m, f_int)).view(np.uint8)
    expect = np.array([hf.multiply(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint8)
    assert np.array_equal(C, expect)


def test_gf2m_multiply_pallas_interpret():
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.fields._hostfield import get_host_field
    from galois_tpu.ops._pallas import gf2m_multiply_pallas

    GF = g.GF(2**8)
    hf = get_host_field(GF._meta)
    rng = np.random.default_rng(1)
    n = 9_000
    a = rng.integers(0, 256, n, dtype=np.int64)
    b = rng.integers(0, 256, n, dtype=np.int64)
    out = gf2m_multiply_pallas(
        jnp.asarray(a.astype(np.uint8)),
        jnp.asarray(b.astype(np.uint8)),
        8,
        GF._meta.irreducible_poly_int,
        True,
    )
    expect = np.array([hf.multiply(int(x), int(y)) for x, y in zip(a[:256], b[:256])])
    assert np.array_equal(np.asarray(out, dtype=np.int64)[:256], expect)


def test_goldilocks_multiply_pallas_interpret():
    """Lane-roll de-interleave Goldilocks multiply (interpret mode) matches
    the XLA limb kernel, including padding tails and corner values."""
    import galois_tpu as g
    from galois_tpu.ops._kernels import get_ops
    from galois_tpu.ops._pallas._elementwise import goldilocks_multiply_pallas

    p = 2**64 - 2**32 + 1
    F = g.GF(p)
    ops = get_ops(F._meta, "jit-calculate")
    rng = np.random.default_rng(0)
    vals = [int(x) % p for x in rng.integers(0, p, 1500, dtype=np.uint64)]
    vals += [0, 1, p - 1, 2**32, 2**32 - 1, p - 2**32]
    A = F(vals)
    B = F(vals[::-1])
    out = goldilocks_multiply_pallas(A._data, B._data, True)
    exp = ops.multiply(A._data, B._data)
    assert np.array_equal(np.asarray(out), np.asarray(exp))


def test_plane_matmul_pallas_interpret():
    """Fused balanced-plane prime matmul (both operand orders) matches the
    XLA pair-dots path bit-for-bit in interpret mode — the NTT's
    GALOIS_TPU_NTT_PALLAS side kernels (ops/_pallas/_plane_matmul.py)."""
    import jax
    import jax.numpy as jnp

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        _BK,
        _BM,
        _BN,
        plane_matmul_data_left,
        plane_matmul_data_right,
        supports,
    )

    p = 3 * 2**30 + 1
    M, K, N = _BM, _BK, _BN  # one grid tile in each dim: 256 x 512 x 512
    assert supports(p, M, K, N)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, p, (M, K), dtype=np.int64).astype(np.uint32))
    W = rng.integers(0, p, (K, N), dtype=np.int64).astype(np.uint32)
    Wpl = jnp.asarray(balanced_planes_np(W, p))
    out = plane_matmul_data_left(x, Wpl, p, True)
    ref = _prime_matmul_planes(x, None, p, K, b_planes=Wpl)
    assert np.array_equal(np.asarray(out), np.asarray(ref).astype(np.uint32))

    y = jnp.asarray(rng.integers(0, p, (K, N), dtype=np.int64).astype(np.uint32))
    A = rng.integers(0, p, (M, K), dtype=np.int64).astype(np.uint32)
    Apl = jnp.asarray(balanced_planes_np(A, p))  # (n, M, K) table planes
    out = plane_matmul_data_right(Apl, y, p, True)
    ref = _prime_matmul_planes(None, y, p, K, a_planes=Apl)
    assert np.array_equal(np.asarray(out), np.asarray(ref).astype(np.uint32))


def test_plane_matmul_pallas_batched_interpret():
    """Leading batch axes fold into the non-contraction grid dim — the
    batched-NTT side path (ops/_ntt.py MatmulFFTPlan.transform)."""
    import jax.numpy as jnp

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        _BK,
        _BM,
        _BN,
        plane_matmul_data_left,
        plane_matmul_data_right,
    )

    p = 3 * 2**30 + 1
    Bt, M, K, N = 3, _BM, _BK, _BN
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, p, (Bt, M, K), dtype=np.int64).astype(np.uint32))
    W = rng.integers(0, p, (K, N), dtype=np.int64).astype(np.uint32)
    Wpl = jnp.asarray(balanced_planes_np(W, p))
    out = plane_matmul_data_left(x, Wpl, p, True)
    assert out.shape == (Bt, M, N)
    for b in range(Bt):
        ref = _prime_matmul_planes(x[b], None, p, K, b_planes=Wpl)
        assert np.array_equal(np.asarray(out[b]), np.asarray(ref).astype(np.uint32))

    y = jnp.asarray(rng.integers(0, p, (Bt, K, N), dtype=np.int64).astype(np.uint32))
    A = rng.integers(0, p, (M, K), dtype=np.int64).astype(np.uint32)
    Apl = jnp.asarray(balanced_planes_np(A, p))
    out = plane_matmul_data_right(Apl, y, p, True)
    assert out.shape == (Bt, M, N)
    for b in range(Bt):
        ref = _prime_matmul_planes(None, y[b], p, K, a_planes=Apl)
        assert np.array_equal(np.asarray(out[b]), np.asarray(ref).astype(np.uint32))


def test_ntt_pallas_sides_full_transform(monkeypatch):
    """The GALOIS_TPU_NTT_PALLAS side path produces the exact same transform
    as the default XLA pair-dots path, end to end through MatmulFFTPlan
    (interpret mode; the hardware flip is validated by bench.py)."""
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.ops._ntt import MatmulFFTPlan, _get_omega

    p = 3 * 2**30 + 1
    GF = g.GF(p)
    N = 512 * 512  # n1 = n2 = 512: every side shape grid-aligned
    omega = _get_omega(GF, N)
    plan = MatmulFFTPlan(GF._meta, N, omega, "jit-calculate", 512)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, p, N, dtype=np.int64).astype(np.uint32))

    monkeypatch.delenv("GALOIS_TPU_NTT_PALLAS", raising=False)
    ref = np.asarray(plan.transform(x))
    monkeypatch.setenv("GALOIS_TPU_NTT_PALLAS", "interpret")
    assert plan._use_pallas_sides()
    out = np.asarray(plan.transform(x))
    assert np.array_equal(out, ref)


def test_plane_matmul_fused_twiddle_and_transpose_interpret():
    """The side-1 fused-twiddle epilogue and side-2 transposed-tile output
    match the unfused reference formulations exactly."""
    import jax.numpy as jnp

    from galois_tpu.ops._linalg import _prime_matmul_planes, balanced_planes_np
    from galois_tpu.ops._pallas._plane_matmul import (
        _BK,
        _BM,
        _BN,
        plane_matmul_data_left,
        plane_matmul_data_right,
    )

    p = 3 * 2**30 + 1
    M, K, N = _BM, _BK, 2 * _BN
    rng = np.random.default_rng(21)
    A = rng.integers(0, p, (M, K), dtype=np.int64).astype(np.uint32)
    Apl = jnp.asarray(balanced_planes_np(A, p))
    y = jnp.asarray(rng.integers(0, p, (2, K, N), dtype=np.int64).astype(np.uint32))
    T = jnp.asarray(rng.integers(0, p, (M, N), dtype=np.int64).astype(np.uint32))
    out = plane_matmul_data_right(Apl, y, p, True, twiddle=T)
    base = _prime_matmul_planes(None, y[0], p, K, a_planes=Apl).astype(np.uint64)
    exp0 = (np.asarray(base) * np.asarray(T, dtype=np.uint64)) % p
    assert np.array_equal(np.asarray(out[0], dtype=np.uint64), exp0)

    x = jnp.asarray(rng.integers(0, p, (2, M, K), dtype=np.int64).astype(np.uint32))
    W = rng.integers(0, p, (K, N), dtype=np.int64).astype(np.uint32)
    Wpl = jnp.asarray(balanced_planes_np(W, p))
    out_t = plane_matmul_data_left(x, Wpl, p, True, transpose_out=True)
    assert out_t.shape == (2, N, M)
    ref = _prime_matmul_planes(x[1], None, p, K, b_planes=Wpl)
    assert np.array_equal(np.asarray(out_t[1]), np.asarray(ref).astype(np.uint32).T)


def test_ntt_table_repr_flag_flip_fallback(monkeypatch):
    """Tables ship exactly ONE plane representation; if the Pallas flag is
    turned off AFTER a plan built Pallas-layout tables, transform falls
    back to the raw-table matmul and stays exact (review-fix regression)."""
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.ops._ntt import MatmulFFTPlan, _get_omega

    p = 3 * 2**30 + 1
    GF = g.GF(p)
    N = 512 * 512
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, p, N, dtype=np.int64).astype(np.uint32))

    monkeypatch.setenv("GALOIS_TPU_NTT_PALLAS", "0")
    plan_ref = MatmulFFTPlan(GF._meta, N, _get_omega(GF, N), "jit-calculate", 512)
    t_ref = plan_ref._host_tables()
    assert "pl" in t_ref[0] and "pls" not in t_ref[0]
    ref = np.asarray(plan_ref.transform(x, t_ref))

    monkeypatch.setenv("GALOIS_TPU_NTT_PALLAS", "interpret")
    plan_p = MatmulFFTPlan(GF._meta, N, _get_omega(GF, N), "jit-calculate", 512)
    t_p = plan_p.transform  # noqa: F841  (plan built; tables below)
    tabs = plan_p._host_tables()
    assert "pls" in tabs[0] and "pl" not in tabs[0]
    out = np.asarray(plan_p.transform(x, tabs))
    assert np.array_equal(out, ref)

    # flag flipped off AFTER the Pallas-layout tables were built: the
    # raw-table fallback must be used and remain exact
    monkeypatch.setenv("GALOIS_TPU_NTT_PALLAS", "0")
    out2 = np.asarray(plan_p.transform(x, tabs))
    assert np.array_equal(out2, ref)


def test_plane_matmul_supports_bounds():
    """The exactness guard uses the true balanced-digit magnitude bound
    (128, not 127): a (p, K) pair right at the 127-bound must be rejected."""
    from galois_tpu.ops._linalg import _PLANE_MAXD, balanced_plane_count
    from galois_tpu.ops._pallas._plane_matmul import _BK, _BM, _BN, supports

    p = 3 * 2**30 + 1
    n_planes = balanced_plane_count(p)
    # smallest K multiple of _BK that violates the 128^2 bound but not 127^2
    k_bad = None
    K = _BK
    while K < 2**22:
        if n_planes * K * 127**2 < min(2**31, p) <= n_planes * K * _PLANE_MAXD**2:
            k_bad = K
            break
        K += _BK
    if k_bad is not None:
        assert not supports(p, _BM, k_bad, _BN)
    # the NTT side shape stays supported
    assert supports(p, 4096, 4096, 4096)


def test_lookup_pallas_kernels_interpret():
    """Chunked VMEM-gather EXP/LOG kernels (jit-lookup on TPU) match the
    XLA lookup path, including zero handling, across table sizes."""
    import jax.numpy as jnp

    import galois_tpu as g
    from galois_tpu.ops._kernels import get_ops
    from galois_tpu.ops._pallas._elementwise import (
        _pad128,
        lookup_divide_pallas,
        lookup_multiply_pallas,
        lookup_reciprocal_pallas,
    )

    for q in (2**8, 3**5, 5**3, 2**10):
        F = g.GF(q)
        lops = get_ops(F._meta, "jit-lookup")
        rng = np.random.default_rng(q)
        a = jnp.asarray(rng.integers(0, q, 2000).astype(F._meta.internal_dtype))
        b = jnp.asarray(rng.integers(0, q, 2000).astype(F._meta.internal_dtype))
        exp_t = jnp.asarray(_pad128(lops.EXP))
        log_t = jnp.asarray(_pad128(lops.LOG))
        out = lookup_multiply_pallas(a, b, exp_t, log_t, q, True)
        assert np.array_equal(np.asarray(out), np.asarray(lops.multiply(a, b))), q
        bnz = jnp.where(b == 0, 1, b)
        out = lookup_divide_pallas(a, bnz, exp_t, log_t, q, True)
        assert np.array_equal(np.asarray(out), np.asarray(lops.divide(a, bnz))), q
        anz = jnp.where(a == 0, 1, a)
        out = lookup_reciprocal_pallas(anz, exp_t, log_t, q, True)
        assert np.array_equal(np.asarray(out), np.asarray(lops.reciprocal(anz))), q
