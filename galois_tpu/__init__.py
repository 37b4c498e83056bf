"""galois_tpu: a TPU-native Galois-field computation framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `galois` library: finite-field arrays GF(p^m), polynomials,
FEC codes (BCH/Reed-Solomon), LFSRs, the NTT, finite-field linear algebra,
and a number-theory toolbox — designed TPU-first (jit/vmap/shard_map over
device meshes; lookup tables in VMEM; multi-limb modular arithmetic in
32-bit lanes; MXU-friendly matmuls).
"""

import jax as _jax

# Exact 64-bit integer arithmetic is load-bearing for large prime fields.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .nt import (  # noqa: E402
    carmichael_lambda,
    crt,
    divisor_sigma,
    divisors,
    egcd,
    euler_phi,
    factors,
    fermat_primality_test,
    gcd,
    ilog,
    iroot,
    is_composite,
    is_cyclic,
    is_perfect_power,
    is_powersmooth,
    is_prime,
    is_prime_power,
    is_primitive_root,
    is_smooth,
    is_square_free,
    isqrt,
    jacobi_symbol,
    kronecker_symbol,
    kth_prime,
    lcm,
    legendre_symbol,
    mersenne_exponents,
    mersenne_primes,
    miller_rabin_primality_test,
    mobius,
    next_prime,
    perfect_power,
    pollard_p1,
    pollard_rho,
    prev_prime,
    primes,
    primitive_root,
    primitive_roots,
    prod,
    random_prime,
    totatives,
    trial_division,
)
