"""BCH codes (reference: src/galois/_codes/_bch.py:27-1252).

General (not just binary/narrow-sense) BCH over prime GF(q) with syndrome
arithmetic in GF(q^m). Construction is host-side (minimal-poly LCMs); encode
is a field matmul; decode is the batched branch-free device pipeline in
codes/_decoder.py.
"""

from __future__ import annotations

from typing import Optional, Type

import numpy as np

from ..fields import GF, GF2
from ..fields._array import FieldArray
from ..nt import ilog
from ..polys._poly import Poly
from ..polys._primitive import matlab_primitive_poly
from ._cyclic import _CyclicCode
from ._decoder import make_decoder

__all__ = ["BCH"]


class BCH(_CyclicCode):
    """A general BCH(n, k) code over GF(q) with syndromes in GF(q^m)."""

    def __init__(
        self,
        n: int,
        k: Optional[int] = None,
        d: Optional[int] = None,
        field: Optional[Type[FieldArray]] = None,
        extension_field: Optional[Type[FieldArray]] = None,
        alpha=None,
        c: int = 1,
        systematic: bool = True,
    ):
        n = int(n)
        if d is not None and d < 1:
            raise ValueError(f"Argument 'd' must be at least 1, not {d}.")
        if c < 0:
            raise ValueError(f"Argument 'c' must be at least 0, not {c}.")

        if field is None:
            field = GF2
        if not field.is_prime_field:
            raise ValueError(
                "BCH codes over GF(q) for prime power q are not supported."
            )
        q = field.order

        if extension_field is None:
            m = ilog(n, q) + 1
            irreducible_poly = matlab_primitive_poly(q, m)
            extension_field = GF(q**m, irreducible_poly=int(irreducible_poly))

        if alpha is None:
            alpha = extension_field.primitive_root_of_unity(n)
        else:
            alpha = extension_field(alpha)

        if d is not None:
            generator_poly, roots = _generator_poly_from_d(d, field, alpha, c)
            kk = n - generator_poly.degree
            if k not in (None, kk):
                raise ValueError(
                    f"The requested [{n}, {k}, {d}] code is not consistent; design "
                    f"distance {d} gives a [{n}, {kk}, {d}] code."
                )
            k = kk
        elif k is not None:
            generator_poly, roots = _generator_poly_from_k(n, k, field, extension_field, alpha, c)
            d = roots.size + 1
        else:
            raise ValueError("Argument 'k' or 'd' must be provided to define the code size.")

        self._extension_field = extension_field
        self._alpha = alpha
        self._c = int(c)
        self._roots = roots
        self._is_primitive = n == extension_field.order - 1
        self._is_narrow_sense = c == 1

        super().__init__(n, k, d, generator_poly, systematic)

    # ------------------------------------------------------------------
    def _decode_codeword(self, codeword, erasures=None):
        import jax.numpy as jnp

        ext = self.extension_field
        ns = codeword.shape[-1]
        if self.d <= 1:
            return codeword, np.zeros(codeword.shape[0], dtype=np.int64)
        decoder = make_decoder(
            ext._meta,
            ext._mode if ext._mode != "python-calculate" else ext._meta.default_ufunc_mode,
            self.field.order,
            ns,
            self._design_n(ns),
            self.d,
            self.c,
            int(self.alpha),
        )
        received = jnp.asarray(np.asarray(codeword, dtype=np.int64)).astype(
            ext._meta.internal_dtype
        )
        if erasures is None:
            era = jnp.zeros(received.shape, dtype=bool)
        else:
            era = jnp.asarray(erasures)
        out, n_errors = decoder(received, era)
        dec = self.field(np.asarray(out, dtype=np.int64) % self.field.order)
        return dec, np.asarray(n_errors)

    def _design_n(self, ns: int) -> int:
        # The Chien search must scan the full multiplicative order of alpha.
        return self.n if ns == self.n else self.n

    # ------------------------------------------------------------------
    @property
    def extension_field(self):
        return self._extension_field

    @property
    def alpha(self):
        return self._alpha

    @property
    def c(self) -> int:
        return self._c

    @property
    def roots(self):
        return self._roots

    @property
    def is_primitive(self) -> bool:
        return self._is_primitive

    @property
    def is_narrow_sense(self) -> bool:
        return self._is_narrow_sense

    def __repr__(self) -> str:
        return f"<BCH Code: [{self.n}, {self.k}, {self.d}] over {self.field.name}>"

    def __str__(self) -> str:
        lines = [
            "BCH Code:",
            f"  [n, k, d]: [{self.n}, {self.k}, {self.d}]",
            f"  field: {self.field.name}",
            f"  extension_field: {self.extension_field.name}",
            f"  generator_poly: {self.generator_poly}",
            f"  is_primitive: {self.is_primitive}",
            f"  is_narrow_sense: {self.is_narrow_sense}",
            f"  is_systematic: {self.is_systematic}",
        ]
        return "\n".join(lines)


def _generator_poly_from_d(d, field, alpha, c):
    """g(x) = LCM of distinct minimal polynomials of alpha^c .. alpha^(c+d-2)
    (reference: src/galois/_codes/_bch.py:1178-1197)."""
    generator_poly = Poly.One(field)
    ext = type(alpha)
    roots = alpha ** (int(c) + np.arange(0, d - 1))
    minimal_polys = []
    for i in range(roots.size if roots.ndim else 1):
        root = roots[i] if roots.ndim else roots
        mi = root.minimal_poly()
        if mi not in minimal_polys:
            generator_poly = generator_poly * Poly(mi.coefficients(), field=field)
            minimal_polys.append(mi)
    return generator_poly, roots


def _generator_poly_from_k(n, k, field, extension_field, alpha, c):
    """Binary search over d plus single-step maximization
    (reference: src/galois/_codes/_bch.py:1200-1252)."""
    m = ilog(extension_field.order, field.order)
    min_d = (n - k) // m + 1
    max_d = (n - k) + 1
    possible_d = list(range(min_d, max_d + 1))

    found = False
    while len(possible_d) > 0:
        idx = len(possible_d) // 2
        d = possible_d[idx]
        generator_poly, roots = _generator_poly_from_d(d, field, alpha, c)
        if generator_poly.degree < n - k:
            possible_d = possible_d[idx + 1 :]
        elif generator_poly.degree == n - k:
            found = True
            break
        else:
            possible_d = possible_d[:idx]
    if not found:
        raise ValueError(
            f"The BCH({n}, {k}) code over {field.name} with alpha={int(alpha)} and c={c} does not exist."
        )

    best_generator_poly, best_roots = generator_poly, roots
    while True:
        d += 1
        generator_poly, roots = _generator_poly_from_d(d, field, alpha, c)
        if generator_poly.degree == n - k:
            best_generator_poly, best_roots = generator_poly, roots
        elif generator_poly.degree > n - k:
            break
    return best_generator_poly, best_roots
