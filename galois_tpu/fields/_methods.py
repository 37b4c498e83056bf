"""Matrix and Galois-theory methods attached to FieldArray.

Mirrors reference FieldArray methods: row_reduce/lu/plu/spaces
(reference: src/galois/_fields/_array.py:1412-1756), field_trace/field_norm
(:1757-1843), characteristic_poly/minimal_poly (:1845-2126), and the
repr/arithmetic tables (:909-1125).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops import _linalg
from ._array import FieldArray
from ._hostfield import get_host_field

__all__ = []


def _attach(name):
    def deco(fn):
        setattr(FieldArray, name, fn)
        return fn

    return deco


# ----------------------------------------------------------------------
# Matrix methods
# ----------------------------------------------------------------------

@_attach("row_reduce")
def row_reduce(self, ncols=None, eye="left"):
    if eye != "left":
        # 'right' reduces into RREF with identity at the right — implement by
        # reversing columns, reducing, reversing back (reference semantics).
        rev = type(self)(np.asarray(self, dtype=object)[::-1, ::-1])
        out = _linalg.row_reduce(rev, ncols=ncols)
        return type(self)(np.asarray(out, dtype=object)[::-1, ::-1])
    return _linalg.row_reduce(self, ncols=ncols)


@_attach("lu_decompose")
def lu_decompose(self):
    return _linalg.lu_decompose(self)


@_attach("plu_decompose")
def plu_decompose(self):
    return _linalg.plu_decompose(self)


@_attach("row_space")
def row_space(self):
    """Basis of the row space, as rows of a matrix
    (reference: src/galois/_fields/_array.py:1487-1547)."""
    A = self
    if A.ndim != 2:
        raise ValueError(f"Argument 'A' must be 2-D, not {A.ndim}-D.")
    R = _linalg.row_reduce(A)
    rank = _nonzero_row_count(R)
    return R[:rank]


@_attach("column_space")
def column_space(self):
    return row_space(self.T)


@_attach("left_null_space")
def left_null_space(self):
    """Basis for {x : xA = 0} (reference: src/galois/_fields/_array.py:1604)."""
    A = self
    if A.ndim != 2:
        raise ValueError(f"Argument 'A' must be 2-D, not {A.ndim}-D.")
    cls = type(A)
    m, n = A.shape
    I = cls.Identity(m)
    # Reduce [A | I] on device; rows whose A-part vanished span the left
    # null space (storage-array concatenate keeps device residency).
    import jax.numpy as jnp

    axis = A._data.ndim - 1 - (0 if cls._storage_first() else cls._storage_ndim())
    AI = cls._view(jnp.concatenate([A._data, I._data], axis=axis), A._dtype)
    R = _linalg.row_reduce(AI, ncols=n)
    rank = _nonzero_row_count(R[:, :n])
    LN = R[rank:, n:] if rank < m else cls.Zeros((0, m))
    # Row-reduce the basis for canonical form
    if LN.shape[0] > 0:
        LN = _linalg.row_reduce(LN)
    return LN


@_attach("null_space")
def null_space(self):
    return left_null_space(self.T)


def _nonzero_row_count(R) -> int:
    Rnp = np.asarray(R, dtype=object)
    nz = [i for i in range(Rnp.shape[0]) if any(v != 0 for v in Rnp[i])]
    return (max(nz) + 1) if nz else 0


# ----------------------------------------------------------------------
# Galois-theory methods
# ----------------------------------------------------------------------

@_attach("field_trace")
def field_trace(self):
    """Tr(x) = sum x^(p^i) in the prime subfield — a LINEAR map, computed as
    one dot product with a host-precomputed trace vector (from Frobenius
    matrices), instead of m exponentiations
    (reference: src/galois/_fields/_array.py:1757-1800). Fully
    device-resident and jit-safe: the basis-digit decomposition happens on
    device per storage kind."""
    import jax.numpy as jnp

    cls = type(self)
    meta = cls._meta
    sub = cls.prime_subfield
    if meta.degree == 1:
        return sub._view(self._data, self._dtype)
    t_vec = _trace_vector(meta)  # (m,) ints, ascending basis order
    p = meta.characteristic
    d = self._data
    if meta.storage == "int":
        if p == 2:
            digs = [(d >> i) & 1 for i in range(meta.degree)]
        else:
            digs = []
            x = d.astype(jnp.uint32)
            for _ in range(meta.degree):
                digs.append(x % p)
                x = x // p
    elif meta.storage == "digits":
        digs = [d[..., i] for i in range(meta.degree)]
    else:  # planar limbs: binary extension bits across base-2^16 limb planes
        digs = [(d[i // 16] >> (i % 16)) & 1 for i in range(meta.degree)]
    acc = None
    for i in range(meta.degree):
        c = int(t_vec[i])
        if c == 0:
            continue
        term = digs[i].astype(jnp.uint64) * c
        acc = term if acc is None else acc + term
    if acc is None:
        tr = jnp.zeros(digs[0].shape, dtype=sub._meta.internal_dtype)
    else:
        tr = (acc % p).astype(sub._meta.internal_dtype)
    return sub._view(tr)


@functools.lru_cache(maxsize=None)
def _trace_vector(meta):
    F = meta.frobenius_matrix  # (m, m)
    m = meta.degree
    acc = np.eye(m, dtype=np.int64)
    total = np.zeros((m, m), dtype=np.int64)
    for _ in range(m):
        total = (total + acc) % meta.characteristic
        acc = (F @ acc) % meta.characteristic
    return total[0]  # constant-coefficient row


@_attach("field_norm")
def field_norm(self):
    """N(x) = x^((q-1)/(p-1)), in the prime subfield
    (reference: src/galois/_fields/_array.py:1802-1843). Device-resident:
    the result lies in the prime subfield, so its storage is digit 0."""
    cls = type(self)
    meta = cls._meta
    sub = cls.prime_subfield
    if meta.degree == 1:
        return sub._view(self._data, self._dtype)
    e = (meta.order - 1) // (meta.characteristic - 1)
    norm = self**e
    d = norm._data
    if meta.storage == "int":
        out = d.astype(sub._meta.internal_dtype)  # value < p already
    elif meta.storage == "digits":
        out = d[..., 0].astype(sub._meta.internal_dtype)
    else:  # planar limbs: binary extension, norm in GF(2) is bit 0 of plane 0
        out = (d[0] & 1).astype(sub._meta.internal_dtype)
    return sub._view(out)


@_attach("characteristic_poly")
def characteristic_poly(self):
    """Of a 0-D element: prod (x - x^(p^i)) over conjugates; of a square
    matrix: det(xI - A) via the division-free Berkowitz algorithm
    (reference: src/galois/_fields/_array.py:1845-1978)."""
    from ..polys._poly import Poly

    if self.ndim == 0:
        return _element_char_poly(self, minimal=False)
    if self.ndim == 2 and self.shape[0] == self.shape[1]:
        return _matrix_char_poly(self)
    raise ValueError(
        f"The array must be 0-D or a square 2-D matrix, not shape {self.shape}."
    )


@_attach("minimal_poly")
def minimal_poly(self):
    from ..polys._poly import Poly

    if self.ndim == 0:
        return _element_char_poly(self, minimal=True)
    if self.ndim == 2 and self.shape[0] == self.shape[1]:
        return _matrix_minimal_poly(self)
    raise ValueError(
        f"The array must be 0-D or a square 2-D matrix, not shape {self.shape}."
    )


def _element_char_poly(x, minimal: bool):
    from ..polys import _hostpoly as hp
    from ..polys._poly import Poly

    cls = type(x)
    meta = cls._meta
    hf = get_host_field(meta)
    a = int(x)
    p, m = meta.characteristic, meta.degree
    conjugates = []
    cur = a
    for _ in range(m):
        if minimal and cur in conjugates:
            break
        conjugates.append(cur)
        cur = hf.power(cur, p)
    poly = [1]
    for c in conjugates:
        poly = hp.mul(hf, poly, [hf.negative(c), 1])
    # Coefficients lie in GF(p): return Poly over the prime subfield.
    sub = cls.prime_subfield
    return Poly(poly[::-1], field=sub)


def _matrix_char_poly(A):
    """Characteristic polynomial of a square matrix.

    Large int-storage matrices run on device (Hessenberg + minor
    recurrence, ops/_charpoly.py); small or exotic-storage matrices use
    the division-free host Berkowitz loop below."""
    from ..polys._poly import Poly

    cls = type(A)
    n_sz = A.shape[0]
    from ..ops import _charpoly

    # n >= 32 routes to device: host Berkowitz is O(n^4) Python ints
    # (6.6 s at n=64) while the compiled kernel runs in ms and its one-time
    # per-shape compile is ~1 s; below that the host loop wins first-call.
    if _charpoly.supports(cls._meta) and n_sz >= 32 and cls._mode != "python-calculate":
        coeffs_asc = _charpoly.charpoly_data(cls._meta, cls._mode, A._data)
        return Poly(cls._view(coeffs_asc[::-1], A._dtype))

    hf = get_host_field(cls._meta)
    M = [[int(v) for v in row] for row in np.asarray(A, dtype=object)]
    n = len(M)

    # Berkowitz: iteratively build the char poly via Toeplitz products.
    # C starts as char poly of the 1x1 leading principal submatrix.
    C = [1, hf.negative(M[0][0])]  # descending coeffs
    for k in range(1, n):
        # R = row (M[k][0..k-1]), Cc = column (M[0..k-1][k]), B = leading kxk
        R = M[k][:k]
        Ccol = [M[i][k] for i in range(k)]
        B = [row[:k] for row in M[:k]]
        # diag entries for the Toeplitz matrix: t_0 = 1, t_1 = -M[k][k],
        # t_j = -(R @ B^(j-2) @ Ccol) for j >= 2
        t = [1, hf.negative(M[k][k])]
        vec = Ccol
        for j in range(2, k + 2):
            dot = 0
            for i in range(k):
                dot = hf.add(dot, hf.multiply(R[i], vec[i]))
            t.append(hf.negative(dot))
            if j < k + 1:
                vec = [
                    functools.reduce(
                        hf.add,
                        (hf.multiply(B[i][l], vec[l]) for l in range(k)),
                        0,
                    )
                    for i in range(k)
                ]
        # Multiply: newC[i] = sum_j t[j] * C[i-j] (Toeplitz-vector product)
        newC = [0] * (k + 2)
        for i, tv in enumerate(t):
            if tv == 0:
                continue
            for j, cv in enumerate(C):
                if i + j < len(newC):
                    newC[i + j] = hf.add(newC[i + j], hf.multiply(tv, cv))
        C = newC
    return Poly(C, field=cls)


def _matrix_minimal_poly(A):
    """Minimal polynomial of a matrix: smallest-degree monic annihilator.

    Large int-storage matrices use the device Krylov-dependence kernel
    (ops/_minpoly.py) with lcm-over-random-vectors and an m(A) == 0
    verification; small/exotic matrices solve for linear dependence of
    I, A, A^2, ... on host."""
    from ..polys._poly import Poly

    cls = type(A)
    n = A.shape[0]

    from ..ops import _minpoly

    if _minpoly.supports(cls._meta) and n * n > 1024 and cls._mode != "python-calculate":
        from .._polymorphic import lcm as poly_lcm

        rng = np.random.default_rng(0x5EED)
        m_poly = None
        for _ in range(4):
            v = cls(rng.integers(0, min(cls.order, 2**62), size=n, dtype=np.int64) % cls.order)
            coeffs, d = _minpoly.krylov_minpoly_data(cls._meta, cls._mode, A._data, v._data)
            d = int(d)
            cand = Poly(cls._view(coeffs[: d + 1][::-1], A._dtype))
            m_poly = cand if m_poly is None else poly_lcm(m_poly, cand)
            if m_poly.degree >= n or np.count_nonzero(np.asarray(m_poly(A, elementwise=False))) == 0:
                return m_poly
        # verification failed (tiny-field degenerate sampling): host path

    hf = get_host_field(cls._meta)
    powers = [cls.Identity(n)]
    for _ in range(n):
        powers.append(_linalg.matmul(powers[-1], A))
    flat = [np.asarray(P, dtype=object).reshape(-1) for P in powers]
    for d in range(1, n + 1):
        # Solve sum_{i<d} c_i A^i = -A^d
        Mat = np.stack(flat[:d], axis=1)  # (n^2, d)
        rhs = np.array([hf.negative(int(v)) for v in flat[d]], dtype=object)
        sol = _solve_overdetermined(cls, Mat, rhs)
        if sol is not None:
            coeffs = [1] + [int(c) for c in sol[::-1]]
            return Poly(coeffs, field=cls)
    raise RuntimeError("unreachable: characteristic polynomial annihilates A")


def _solve_overdetermined(cls, Mat, rhs):
    """Solve Mat @ c = rhs exactly, or return None if inconsistent."""
    hf = get_host_field(cls._meta)
    rows, d = Mat.shape
    aug = [[int(Mat[i, j]) for j in range(d)] + [int(rhs[i])] for i in range(rows)]
    # Gaussian elimination
    piv_cols = []
    r = 0
    for c in range(d):
        piv = next((i for i in range(r, rows) if aug[i][c] != 0), None)
        if piv is None:
            continue
        aug[r], aug[piv] = aug[piv], aug[r]
        inv = hf.reciprocal(aug[r][c])
        aug[r] = [hf.multiply(v, inv) for v in aug[r]]
        for i in range(rows):
            if i != r and aug[i][c] != 0:
                f = aug[i][c]
                aug[i] = [hf.subtract(v, hf.multiply(f, w)) for v, w in zip(aug[i], aug[r])]
        piv_cols.append(c)
        r += 1
        if r == rows:
            break
    # Check consistency
    for i in range(r, rows):
        if aug[i][d] != 0:
            return None
    if len(piv_cols) < d:
        # Underdetermined: fix free vars to 0 (any solution works for minimal
        # poly candidacy), but must verify it actually annihilates.
        pass
    sol = [0] * d
    for i, c in enumerate(piv_cols):
        sol[c] = aug[i][d]
    # Verify
    for i in range(rows):
        acc = 0
        for j in range(d):
            acc = hf.add(acc, hf.multiply(int(Mat[i, j]), sol[j]))
        if acc != int(rhs[i]):
            return None
    return sol


# ----------------------------------------------------------------------
# Roots of unity
# ----------------------------------------------------------------------

def _primitive_root_of_unity(cls, n: int):
    """omega = alpha^((q-1)/n) (reference: src/galois/_fields/_array.py:1126)."""
    n = int(n)
    q = cls.order
    if not 1 <= n < q:
        raise ValueError(f"Argument 'n' must be in [1, {q}), not {n}.")
    if (q - 1) % n != 0:
        raise ValueError(f"There are no primitive {n}-th roots of unity in {cls.name}.")
    hf = get_host_field(cls._meta)
    omega = hf.power(cls._meta.primitive_element_int, (q - 1) // n)
    return cls(omega)


def _primitive_roots_of_unity(cls, n: int):
    n = int(n)
    q = cls.order
    if (q - 1) % n != 0:
        raise ValueError(f"There are no primitive {n}-th roots of unity in {cls.name}.")
    from ..nt import totatives

    hf = get_host_field(cls._meta)
    base = hf.power(cls._meta.primitive_element_int, (q - 1) // n)
    roots = sorted(hf.power(base, k) for k in totatives(n))
    return cls(roots)


from ._array import FieldArrayMeta  # noqa: E402

FieldArrayMeta.primitive_root_of_unity = _primitive_root_of_unity
FieldArrayMeta.primitive_roots_of_unity = _primitive_roots_of_unity


# ----------------------------------------------------------------------
# Display tables (reference: src/galois/_fields/_array.py:909-1125)
# ----------------------------------------------------------------------

def _repr_table(cls, element=None, sort: str = "power") -> str:
    """Table of power/polynomial/vector/integer representations."""
    from ..ops._dlog import host_log
    from ..polys._conversions import integer_to_poly, poly_to_str

    if sort not in ("power", "int"):
        raise ValueError(f"Argument 'sort' must be 'power' or 'int', not {sort!r}.")
    q = cls.order
    hf = get_host_field(cls._meta)
    if element is None:
        alpha = cls._meta.primitive_element_int
    else:
        alpha = int(cls(element))
    rows = [("0", "0", str([0] * cls.degree), "0")]
    elems = []
    if sort == "power":
        cur = 1
        for i in range(q - 1):
            elems.append((i, cur))
            cur = hf.multiply(cur, alpha)
    else:
        for e in range(1, q):
            elems.append((host_log(cls._meta, e, alpha), e))
        elems.sort(key=lambda t: t[1])
    for i, e in elems:
        power = "1" if i == 0 else ("α" if i == 1 else f"α^{i}")
        poly = poly_to_str(integer_to_poly(e, cls.characteristic), poly_var="α")
        vec = str(integer_to_poly(e, cls.characteristic, cls.degree - 1))
        rows.append((power, poly, vec, str(e)))
    headers = ("Power", "Polynomial", "Vector", "Integer")
    widths = [max(len(h), max(len(r[i]) for r in rows)) for i, h in enumerate(headers)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {h:^{w}} " for h, w in zip(headers, widths)) + "|", sep]
    for r in rows:
        out.append("|" + "|".join(f" {v:^{w}} " for v, w in zip(r, widths)) + "|")
        out.append(sep)
    return "\n".join(out)


def _arithmetic_table(cls, operation: str, x=None, y=None) -> str:
    """Table of x op y for all pairs
    (reference: src/galois/_fields/_array.py:1032-1125)."""
    if operation not in ("+", "-", "*", "/"):
        raise ValueError(f"Argument 'operation' must be in ['+', '-', '*', '/'], not {operation!r}.")
    hf = get_host_field(cls._meta)
    opfn = {"+": hf.add, "-": hf.subtract, "*": hf.multiply, "/": hf.divide}[operation]
    xs = [int(v) for v in np.asarray(cls(x), dtype=object)] if x is not None else list(range(cls.order))
    default_y = list(range(1, cls.order)) if operation == "/" else list(range(cls.order))
    ys = [int(v) for v in np.asarray(cls(y), dtype=object)] if y is not None else default_y

    def fmt(v):
        return cls._element_to_str(v)

    rows = []
    header = [f"x {operation} y"] + [fmt(v) for v in ys]
    for xv in xs:
        rows.append([fmt(xv)] + [fmt(opfn(xv, yv)) for yv in ys])
    widths = [max(len(header[j]), max(len(r[j]) for r in rows)) for j in range(len(header))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {h:^{w}} " for h, w in zip(header, widths)) + "|", sep]
    for r in rows:
        out.append("|" + "|".join(f" {v:^{w}} " for v, w in zip(r, widths)) + "|")
        out.append(sep)
    return "\n".join(out)


FieldArrayMeta.repr_table = _repr_table
FieldArrayMeta.arithmetic_table = _arithmetic_table
