"""Regenerate docs/API.md from the package's public exported surface."""

from __future__ import annotations

import inspect
import io
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import galois_tpu as gt  # noqa: E402

HEADER = """# galois_tpu public API

Auto-generated from the package's exported surface
(`python scripts/generate_api_doc.py`); every name below is importable as
`galois_tpu.<name>` and mirrors the reference's export set
(reference: src/galois/__init__.py).

"""

CATS = [
    "Galois fields",
    "Polynomials",
    "FEC codes",
    "Linear sequences & transforms",
    "Number theory",
    "Config & typing",
]


def categorize(n: str) -> str:
    ln = n.lower()
    if (
        n in ("GF", "Field", "FieldArray", "FieldArrayMeta", "Array", "GF2")
        or "element" in ln
    ):
        return "Galois fields"
    if "poly" in ln or n == "Poly":
        return "Polynomials"
    if n in ("BCH", "ReedSolomon") or "generator" in ln or "parity" in ln:
        return "FEC codes"
    if "lfsr" in ln or n in ("FLFSR", "GLFSR", "berlekamp_massey", "ntt", "intt"):
        return "Linear sequences & transforms"
    if any(
        k in ln
        for k in (
            "prime", "factor", "totient", "lambda", "mobius", "carmichael",
            "egcd", "gcd", "lcm", "crt", "isqrt", "iroot", "ilog", "kronecker",
            "jacobi", "legendre", "totatives", "divisor", "is_cyclic",
            "perfect_power", "smooth", "pow", "square_free", "coprime", "prod",
        )
    ):
        return "Number theory"
    return "Config & typing"


def main():
    out = io.StringIO()
    out.write(HEADER)
    cats = {c: [] for c in CATS}
    for n in sorted(n for n in dir(gt) if not n.startswith("_")):
        o = getattr(gt, n)
        if isinstance(o, types.ModuleType):
            if n == "typing":
                cats["Config & typing"].append(
                    (n, "typing aliases module (ArrayLike, PolyLike, ...)")
                )
            continue
        doc = (inspect.getdoc(o) or "").strip().split("\n")[0]
        cats[categorize(n)].append((n, doc))
    # multi-device API (not re-exported at the root: sharding is opt-in)
    import galois_tpu.parallel as par

    for n in par.__all__:
        doc = (inspect.getdoc(getattr(par, n)) or "").strip().split("\n")[0]
        cats["Linear sequences & transforms"].append((f"parallel.{n}", doc))
    for c in CATS:
        if not cats[c]:
            continue
        out.write(f"## {c}\n\n")
        for n, doc in cats[c]:
            out.write(f"- **`{n}`** — {doc}\n")
        out.write("\n")
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")
    with open(path, "w") as f:
        f.write(out.getvalue())
    missing = [n for c in CATS for n, d in cats[c] if not d]
    print(f"wrote docs/API.md; {sum(len(v) for v in cats.values())} names, "
          f"{len(missing)} missing docstrings: {missing}")


if __name__ == "__main__":
    main()
