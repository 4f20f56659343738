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

TriMat is array-backed (chunked numpy triplet blocks, consolidated
lazily) so cohort-scale matrices (100M nnz) accumulate and serialize
without per-element Python objects; body formatting/parsing goes
through libgenomio's parallel C++ fast path when available.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


class TriMat:
    """Triplet (COO) accumulation matrix, insertion-ordered like sprs TriMat."""

    def __init__(self, shape: Tuple[int, int]):
        self.shape = shape
        self._chunks: list = []  # consolidated (rows, cols, vals) blocks
        self._pr: list = []      # pending scalar add_triplet calls
        self._pc: list = []
        self._pv: list = []

    def add_triplet(self, row: int, col: int, value: float) -> None:
        if not (0 <= row < self.shape[0] and 0 <= col < self.shape[1]):
            raise IndexError(f"triplet ({row},{col}) outside shape {self.shape}")
        self._pr.append(row)
        self._pc.append(col)
        self._pv.append(float(value))

    def add_triplets(self, rows, cols, values) -> None:
        """Bulk insertion from array-likes (vectorized bounds check)."""
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
        if len(r) == 0:
            return
        self._flush_pending()
        self._chunks.append((r.copy(), c.copy(), v.copy()))

    def _flush_pending(self) -> None:
        if self._pr:
            self._chunks.append((np.asarray(self._pr, dtype=np.int64),
                                 np.asarray(self._pc, dtype=np.int64),
                                 np.asarray(self._pv, dtype=np.float64)))
            self._pr, self._pc, self._pv = [], [], []

    def _arrays(self):
        """(rows, cols, vals) as single consolidated arrays."""
        self._flush_pending()
        if not self._chunks:
            z = np.zeros(0, dtype=np.int64)
            return z, z, np.zeros(0, dtype=np.float64)
        if len(self._chunks) > 1:
            r = np.concatenate([c[0] for c in self._chunks])
            c = np.concatenate([c[1] for c in self._chunks])
            v = np.concatenate([c[2] for c in self._chunks])
            self._chunks = [(r, c, v)]
        return self._chunks[0]

    @property
    def rows(self) -> np.ndarray:
        return self._arrays()[0]

    @property
    def cols(self) -> np.ndarray:
        return self._arrays()[1]

    @property
    def data(self) -> np.ndarray:
        return self._arrays()[2]

    def nnz(self) -> int:
        return (sum(len(c[0]) for c in self._chunks) + len(self._pr))

    def to_canonical(self):
        """CSR-canonical form: sorted unique (row, col) with duplicates summed."""
        if self.nnz() == 0:
            return self.shape, []
        r, c, v = self._arrays()
        order = np.lexsort((c, r))  # stable: duplicates keep insertion order
        r, c, v = r[order], c[order], v[order]
        new = np.empty(len(r), dtype=bool)
        new[0] = True
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.nonzero(new)[0]
        sums = np.add.reduceat(v, starts)
        items = list(zip(zip(r[starts].tolist(), c[starts].tolist()),
                         sums.tolist()))
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
    # never uses exponent notation in Display: expand repr's shortest
    # digits positionally (never %.17g, which would print the value's
    # exact expansion rather than shortest-digits-plus-zeros).
    s = repr(v)
    if "e" in s or "E" in s:
        s = _expand_exponent(v)
    return s


def _expand_exponent(v: float) -> str:
    from decimal import Decimal

    d = Decimal(repr(v))
    return format(d, "f")


def _native_mtx():
    """(format_fn, parse_fn) from libgenomio, or (None, None). The native
    formatter reproduces Rust f64 `Display` (shortest round-trip digits
    expanded positionally) — differentially tested against format_f64."""
    try:
        from .bam_native import mtx_format_native, mtx_parse_native, native_available
        if native_available():
            return mtx_format_native, mtx_parse_native
    except Exception:
        pass
    return None, None


def write_matrix_market(path: str, mat: TriMat) -> None:
    header = ("%%MatrixMarket matrix coordinate real general\n"
              "% written by sprs\n"
              f"{mat.shape[0]} {mat.shape[1]} {mat.nnz()}\n")
    n = mat.nnz()
    if n:
        fmt, _ = _native_mtx()
        if fmt is not None:
            body = fmt(mat.rows + 1, mat.cols + 1, mat.data)
            if body is not None:
                with open(path, "wb") as f:
                    f.write(header.encode())
                    f.write(body)
                return
    lines = [header]
    if n:
        # vectorized value formatting: the integral/finite common case is
        # C-level; format_f64 (same semantics) only runs on the rest
        d = mat.data
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
        r1 = (mat.rows + 1).tolist()
        c1 = (mat.cols + 1).tolist()
        lines.extend(f"{r} {c} {v}\n" for r, c, v in zip(r1, c1, vs.tolist()))
    with open(path, "wt") as f:
        f.writelines(lines)


def read_matrix_market(path: str) -> TriMat:
    with open(path, "rb") as f:
        header = f.readline().decode()
        if "coordinate" not in header:
            raise ValueError(f"unsupported MatrixMarket header: {header!r}")
        line = f.readline()
        while line.startswith(b"%"):
            line = f.readline()
        rows, cols, nnz = (int(x) for x in line.split())
        mat = TriMat((rows, cols))
        if nnz:
            body = f.read()
            _, parse = _native_mtx()
            if parse is not None:
                parsed = parse(body, nnz)
                if parsed is not None:
                    r1, c1, v = parsed
                    mat.add_triplets(r1 - 1, c1 - 1, v)
                    return mat
            import io

            arr = np.loadtxt(io.StringIO(body.decode()), dtype=np.float64,
                             max_rows=nnz, ndmin=2)
            if arr.shape != (nnz, 3):
                raise ValueError(
                    f"{path}: expected {nnz} 'row col value' lines, got "
                    f"shape {arr.shape}")
            idx = arr[:, :2]
            if (idx != np.trunc(idx)).any() or not np.isfinite(idx).all():
                raise ValueError(f"{path}: non-integer matrix indices")
            mat.add_triplets(arr[:, 0].astype(np.int64) - 1,
                             arr[:, 1].astype(np.int64) - 1,
                             arr[:, 2])
        return mat
