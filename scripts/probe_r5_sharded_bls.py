"""Round-5 stretch (verdict item 10): BLS12-381 16-limb 2^24 transform
through parallel/_ntt_sharded.py on a D=2 VIRTUAL CPU mesh — validates the
config-5 memory behavior end-to-end at the named scale (the dryrun's BLS
leg runs N=256). Records wall time and a correctness cross-check of a few
output coefficients against the single-plan path at a smaller size.

CPU-only (virtual devices); run:
  nohup timeout 7200 env XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      JAX_PLATFORMS=cpu python -u scripts/probe_r5_sharded_bls.py \
      > /tmp/r5_sharded_bls.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import galois_tpu as gt
from galois_tpu.parallel._ntt_sharded import sharded_fft


def stage(name):
    print(f"--- {name} ({time.strftime('%H:%M:%S')})", flush=True)


def main():
    devs = np.array(jax.devices())
    print("devices:", len(devs), flush=True)
    assert len(devs) >= 2
    mesh = Mesh(devs[:2], ("x",))
    r = 52435875175126190479447740508185965837690552500527637822603658699938581184513
    F = gt.GF(r)
    L = F._meta.storage_width

    stage("correctness at 2^16 (sharded vs single-plan)")
    x_small = F.Random(2**16, seed=7)
    Xs = sharded_fft(F, x_small, mesh, "x")
    from galois_tpu.ops._ntt import fft_data

    Xr = fft_data(F, x_small._data, 2**16)
    ok = np.array_equal(np.asarray(Xs._data), np.asarray(Xr))
    print("2^16 sharded == single-plan:", ok, flush=True)
    assert ok

    stage("D=2 sharded 2^24 transform (wall time)")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2**16, (L, 2**24), dtype=np.int64).astype(np.uint16)
    data[L - 1] &= 0x3FFF
    x = F._view(jnp.asarray(data))
    t0 = time.perf_counter()
    X = sharded_fft(F, x, mesh, "x")
    jax.block_until_ready(X._data)
    t_first = time.perf_counter() - t0
    print(f"first call (tables+compile+run): {t_first:.1f} s", flush=True)
    t0 = time.perf_counter()
    X = sharded_fft(F, x, mesh, "x")
    jax.block_until_ready(X._data)
    t_run = time.perf_counter() - t0
    print(f"steady-state wall: {t_run:.1f} s (CPU virtual mesh: orchestration/"
          f"memory validation only, not a speed number)", flush=True)
    # spot-check X[0] = sum of inputs (host exact)
    from galois_tpu.fields._hostfield import get_host_field

    hf = get_host_field(F._meta)
    acc = 0
    vals = np.asarray(x._data, dtype=np.uint64)
    # reconstruct ints from planar limbs, sum mod r in hostfield (vectorized mod-add)
    total = 0
    limbs = [int(0)] * L
    # sum limb-planes as python ints then reduce: sum_i x_i mod r
    plane_sums = vals.sum(axis=1, dtype=np.uint64)  # < 2^40 each, exact
    for k in range(L):
        total += int(plane_sums[k]) << (16 * k)
    total %= r
    x0 = 0
    X0 = np.asarray(X._data[:, 0], dtype=np.uint64)
    for k in range(L):
        x0 |= int(X0[k]) << (16 * k)
    print("X[0] exact vs host sum:", x0 == total, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
