"""Sparse triplet matrix + Matrix Market I/O.

Reproduces the exact on-disk format the reference emits through sprs'
`write_matrix_market` (/root/reference/src/main.rs:381-389; golden files
/root/reference/test/*.mtx):

    %%MatrixMarket matrix coordinate real general
    % written by sprs
    <rows> <cols> <nnz>
    <row> <col> <value>      (1-based indices)

Values are f64 printed with Rust's `Display` semantics: shortest
round-trip representation, integral values without a decimal point,
NaN printed as `NaN`.

Comparisons in tests are CSR-canonical (duplicate triplets summed,
entry order erased), matching the reference's own test semantics
(src/main.rs:1232: `seen.to_csr() == expected.to_csr()`).
"""

from __future__ import annotations

import math
from typing import List, Tuple


class TriMat:
    """Triplet (COO) accumulation matrix, insertion-ordered like sprs TriMat."""

    def __init__(self, shape: Tuple[int, int]):
        self.shape = shape
        self.rows: List[int] = []
        self.cols: List[int] = []
        self.data: List[float] = []

    def add_triplet(self, row: int, col: int, value: float) -> None:
        if not (0 <= row < self.shape[0] and 0 <= col < self.shape[1]):
            raise IndexError(f"triplet ({row},{col}) outside shape {self.shape}")
        self.rows.append(row)
        self.cols.append(col)
        self.data.append(float(value))

    def add_triplets(self, rows, cols, values) -> None:
        """Bulk insertion from array-likes (vectorized bounds check)."""
        import numpy as np

        r = np.asarray(rows, dtype=np.int64)
        c = np.asarray(cols, dtype=np.int64)
        v = np.asarray(values, dtype=np.float64)
        if not (len(r) == len(c) == len(v)):
            raise ValueError(
                f"triplet arrays disagree: {len(r)}/{len(c)}/{len(v)}")
        if len(r) and ((r < 0).any() or (r >= self.shape[0]).any()
                       or (c < 0).any() or (c >= self.shape[1]).any()):
            bad = np.nonzero((r < 0) | (r >= self.shape[0]) | (c < 0)
                             | (c >= self.shape[1]))[0][0]
            raise IndexError(
                f"triplet ({r[bad]},{c[bad]}) outside shape {self.shape}")
        self.rows.extend(r.tolist())
        self.cols.extend(c.tolist())
        self.data.extend(v.tolist())

    def nnz(self) -> int:
        return len(self.data)

    def to_canonical(self):
        """CSR-canonical form: sorted unique (row, col) with duplicates summed."""
        acc = {}
        for r, c, v in zip(self.rows, self.cols, self.data):
            key = (r, c)
            acc[key] = acc.get(key, 0.0) + v
        items = sorted(acc.items())
        return self.shape, items


def format_f64(v: float) -> str:
    """Rust f64 `Display`: shortest round-trip; integral values bare; NaN."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    if v == int(v) and abs(v) < 1e16:
        # Rust prints -0.0 as "-0"
        s = str(int(v))
        if s == "0" and math.copysign(1.0, v) < 0:
            return "-0"
        return s
    # Python's repr is shortest-round-trip like Rust's Display, but Rust
    # never uses exponent notation in Display (it prints all digits).
    s = repr(v)
    if "e" in s or "E" in s:
        s = f"{v:.17g}"
        if "e" in s:
            # expand scientific notation to positional
            s = _expand_exponent(v)
    return s


def _expand_exponent(v: float) -> str:
    from decimal import Decimal

    d = Decimal(repr(v))
    return format(d, "f")


def write_matrix_market(path: str, mat: TriMat) -> None:
    import numpy as np

    lines = [
        "%%MatrixMarket matrix coordinate real general\n",
        "% written by sprs\n",
        f"{mat.shape[0]} {mat.shape[1]} {mat.nnz()}\n",
    ]
    n = mat.nnz()
    if n:
        # vectorized value formatting: the integral/finite common case is
        # C-level; format_f64 (same semantics) only runs on the rest
        d = np.asarray(mat.data, dtype=np.float64)
        int_mask = np.isfinite(d) & (np.abs(d) < 1e16) & (d == np.trunc(d))
        vs = np.empty(n, dtype=object)
        if int_mask.any():
            vs[int_mask] = np.char.mod("%d", d[int_mask].astype(np.int64)) \
                .astype(object)
            negz = int_mask & (d == 0) & np.signbit(d)
            if negz.any():
                vs[negz] = "-0"  # Rust prints -0.0 as "-0"
        rest = np.nonzero(~int_mask)[0]
        for i in rest.tolist():
            vs[i] = format_f64(float(d[i]))
        r1 = (np.asarray(mat.rows, dtype=np.int64) + 1).tolist()
        c1 = (np.asarray(mat.cols, dtype=np.int64) + 1).tolist()
        lines.extend(f"{r} {c} {v}\n" for r, c, v in zip(r1, c1, vs.tolist()))
    with open(path, "wt") as f:
        f.writelines(lines)


def read_matrix_market(path: str) -> TriMat:
    import numpy as np

    with open(path, "rt") as f:
        header = f.readline()
        if "coordinate" not in header:
            raise ValueError(f"unsupported MatrixMarket header: {header!r}")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        rows, cols, nnz = (int(x) for x in line.split())
        mat = TriMat((rows, cols))
        if nnz:
            body = np.loadtxt(f, dtype=np.float64, max_rows=nnz, ndmin=2)
            if body.shape != (nnz, 3):
                raise ValueError(
                    f"{path}: expected {nnz} 'row col value' lines, got "
                    f"shape {body.shape}")
            idx = body[:, :2]
            if (idx != np.trunc(idx)).any() or not np.isfinite(idx).all():
                raise ValueError(f"{path}: non-integer matrix indices")
            mat.add_triplets(body[:, 0].astype(np.int64) - 1,
                             body[:, 1].astype(np.int64) - 1,
                             body[:, 2])
        return mat
