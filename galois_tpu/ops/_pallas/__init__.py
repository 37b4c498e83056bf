"""Pallas TPU kernels for hot elementwise field ops.

Opt-in: set GALOIS_TPU_PALLAS=1 (or call enable()) to route supported
elementwise kernels through Pallas instead of plain XLA fusion. Correctness
is validated in interpreter mode on CPU (tests/test_pallas.py); on-device
lowering is exercised by bench.py when a TPU is present.
"""

from ._elementwise import (
    gf2m_multiply_pallas,
    goldilocks_multiply_pallas,
    gf2m_multiply_swar_pallas,
    pallas_probe,
    prime_multiply_pallas,
    enabled,
    enable,
)

__all__ = [
    "gf2m_multiply_pallas",
    "goldilocks_multiply_pallas",
    "gf2m_multiply_swar_pallas",
    "pallas_probe",
    "prime_multiply_pallas",
    "enabled",
    "enable",
]
