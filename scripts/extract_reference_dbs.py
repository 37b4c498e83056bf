"""Extract Conway/irreducible polynomial tables into galois_tpu's data format.

The upstream tables are third-party mathematical data (Frank Luebeck's Conway
polynomial tables; Wolfram's minimal-term irreducible polynomials) that the
reference ships as SQLite databases (reference:
src/galois/_databases/_interface.py:77-158). We re-serialize them as one
compressed .npz of flat arrays: index rows (characteristic, degree, offset,
count) plus concatenated nonzero-degree and nonzero-coefficient arrays.

Run once: python scripts/extract_reference_dbs.py
"""

import pathlib
import sqlite3

import numpy as np

SRC = pathlib.Path("/root/reference/src/galois/_databases")
DST = pathlib.Path(__file__).resolve().parent.parent / "galois_tpu" / "_databases"


def extract(name: str) -> None:
    conn = sqlite3.connect(SRC / f"{name}.db")
    rows = conn.execute(
        "SELECT characteristic, degree, nonzero_degrees, nonzero_coeffs FROM polys"
    ).fetchall()
    conn.close()
    index, all_degrees, all_coeffs = [], [], []
    offset = 0
    for p, m, degrees, coeffs in rows:
        d = [int(x) for x in degrees.split(",")]
        c = [int(x) for x in coeffs.split(",")]
        index.append((p, m, offset, len(d)))
        all_degrees.extend(d)
        all_coeffs.extend(c)
        offset += len(d)
    out = DST / f"{name}.npz"
    np.savez_compressed(
        out,
        index=np.array(index, dtype=np.int64),
        degrees=np.array(all_degrees, dtype=np.int64),
        coeffs=np.array(all_coeffs, dtype=np.int64),
    )
    print(f"{name}: {len(index)} polys -> {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    DST.mkdir(exist_ok=True)
    extract("conway_polys")
    extract("irreducible_polys")
