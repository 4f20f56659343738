"""NumPy Smith-Waterman oracles.

Two scorers, both affine-gap LOCAL alignment with the reference's scoring
(match=1, mismatch=-5, gap of length L costs GAP_OPEN + L*GAP_EXTEND,
/root/reference/src/main.rs:30-38):

  * sw_scores_batch    — full (unbanded) SW, vectorized over a batch.
                         This is the ground truth the Pallas kernel is
                         tested against, and the CPU fallback backend.
  * banded_sw_score    — reimplementation of the k-mer banded algorithm
                         shape (rust-bio pairwise::banded, k=6, w=20) used
                         for parity analysis only.

Scores compare RAW BYTES (a == b ? 1 : -5), matching src/main.rs:898.
"""

from __future__ import annotations

import numpy as np

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH

NEG = np.int32(-(1 << 28))


def sw_scores_batch(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Batched full local SW scores.

    x: uint8 [B, Lx] reads, padded with PAD byte 0
    y: uint8 [B, Ly] haplotypes, padded with PAD byte 1
    returns int32 [B] best local alignment scores.

    Padding bytes 0/1 never equal any sequence byte or each other, so padded
    cells only ever receive negative increments and cannot alter the max
    (H >= 0 everywhere in local SW).
    """
    x = np.ascontiguousarray(x, dtype=np.uint8)
    y = np.ascontiguousarray(y, dtype=np.uint8)
    B, Lx = x.shape
    Ly = y.shape[1]
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)

    ii = np.arange(Lx, dtype=np.int32)[None, :]  # [1, Lx]
    a_base = np.int32(GAP_OPEN) - GE * ii

    H = np.zeros((B, Lx), dtype=np.int32)
    E = np.full((B, Lx), NEG, dtype=np.int32)
    best = np.zeros(B, dtype=np.int32)

    for j in range(Ly):
        s = np.where(x == y[:, j : j + 1], np.int32(MATCH), np.int32(MISMATCH))
        E = np.maximum(H + GOE, E + GE)
        Hdiag = np.concatenate([np.zeros((B, 1), np.int32), H[:, :-1]], axis=1)
        Htmp = np.maximum(np.maximum(Hdiag + s, E), 0)
        # F[i] = GE*i + max_{k<i}(Htmp[k] + GAP_OPEN - GE*k): exclusive cummax.
        A = Htmp + a_base
        cm = np.maximum.accumulate(A, axis=1)
        F = np.concatenate([np.full((B, 1), NEG, np.int32), cm[:, :-1]], axis=1) + GE * ii
        H = np.maximum(Htmp, F)
        best = np.maximum(best, H.max(axis=1))
    return best


def sw_score_single(x: bytes, y: bytes) -> int:
    """Full local SW score of one pair (reference scalar oracle)."""
    if len(x) == 0 or len(y) == 0:
        return 0
    xa = np.frombuffer(x, dtype=np.uint8)[None, :]
    ya = np.frombuffer(y, dtype=np.uint8)[None, :]
    return int(sw_scores_batch(xa, ya)[0])


def banded_sw_score(x: bytes, y: bytes, k: int = 6, w: int = 20) -> int:
    """Banded local SW in the style of rust-bio's banded aligner: k-mer
    matches between x and y seed a band, widened by w; the DP is evaluated
    only inside the band. Used to quantify banded-vs-full score differences
    on real data (the reference's aligner can only score <= full SW)."""
    Lx, Ly = len(x), len(y)
    if Lx == 0 or Ly == 0:
        return 0
    # collect k-mer match cells
    kmers = {}
    for j in range(Ly - k + 1):
        kmers.setdefault(y[j : j + k], []).append(j)
    in_band = np.zeros((Lx, Ly), dtype=bool)
    seeded = False
    for i in range(Lx - k + 1):
        for j in kmers.get(x[i : i + k], ()):
            seeded = True
            i0, i1 = max(0, i - w), min(Lx, i + k + w)
            j0, j1 = max(0, j - w), min(Ly, j + k + w)
            in_band[i0:i1, j0:j1] = True
    if not seeded:
        return 0
    xa = np.frombuffer(x, dtype=np.uint8)
    ya = np.frombuffer(y, dtype=np.uint8)
    H = np.zeros((Lx + 1, Ly + 1), dtype=np.int64)
    Ew = np.full((Lx + 1, Ly + 1), NEG, dtype=np.int64)
    Fw = np.full((Lx + 1, Ly + 1), NEG, dtype=np.int64)
    best = 0
    for i in range(1, Lx + 1):
        for j in range(1, Ly + 1):
            if not in_band[i - 1, j - 1]:
                continue
            s = MATCH if xa[i - 1] == ya[j - 1] else MISMATCH
            Ew[i, j] = max(H[i, j - 1] + GAP_OPEN + GAP_EXTEND, Ew[i, j - 1] + GAP_EXTEND)
            Fw[i, j] = max(H[i - 1, j] + GAP_OPEN + GAP_EXTEND, Fw[i - 1, j] + GAP_EXTEND)
            H[i, j] = max(0, H[i - 1, j - 1] + s, Ew[i, j], Fw[i, j])
            if H[i, j] > best:
                best = int(H[i, j])
    return best


def sw_traceback(x: bytes, y: bytes):
    """Full local SW with traceback for debug logging.

    Returns (score, xstart, xend, ystart, yend, ops) where ops is a list
    of ('M'|'S'|'I'|'D') per column: match, substitution, insertion
    (x-only base), deletion (y-only base). Used to reproduce the
    reference's debug-level pretty alignment logs (src/main.rs:903-921).
    """
    Lx, Ly = len(x), len(y)
    if Lx == 0 or Ly == 0:
        return 0, 0, 0, 0, 0, []
    NEGV = int(NEG)
    H = np.zeros((Lx + 1, Ly + 1), dtype=np.int64)
    E = np.full((Lx + 1, Ly + 1), NEGV, dtype=np.int64)
    F = np.full((Lx + 1, Ly + 1), NEGV, dtype=np.int64)
    xa = np.frombuffer(x, np.uint8)
    ya = np.frombuffer(y, np.uint8)
    for i in range(1, Lx + 1):
        s = np.where(ya == xa[i - 1], MATCH, MISMATCH).astype(np.int64)
        Hp = H[i - 1]
        E[i, 1:] = 0  # computed left-to-right below
        e = NEGV
        F[i, 1:] = np.maximum(Hp[1:] + GAP_OPEN + GAP_EXTEND,
                              F[i - 1, 1:] + GAP_EXTEND)
        row = H[i]
        for j in range(1, Ly + 1):
            e = max(row[j - 1] + GAP_OPEN + GAP_EXTEND, e + GAP_EXTEND)
            E[i, j] = e
            row[j] = max(0, Hp[j - 1] + s[j - 1], e, F[i, j])
    best_flat = int(np.argmax(H))
    bi, bj = divmod(best_flat, Ly + 1)
    score = int(H[bi, bj])
    ops = []
    i, j = bi, bj
    state = "H"
    while i > 0 and j > 0:
        if state == "H":
            if H[i, j] == 0:
                break
            s = MATCH if xa[i - 1] == ya[j - 1] else MISMATCH
            if H[i, j] == H[i - 1, j - 1] + s:
                ops.append("M" if s == MATCH else "S")
                i -= 1
                j -= 1
            elif H[i, j] == E[i, j]:
                state = "E"
            else:
                state = "F"
        elif state == "E":  # gap consuming y
            ops.append("D")
            if E[i, j] == H[i, j - 1] + GAP_OPEN + GAP_EXTEND:
                state = "H"
            j -= 1
        else:  # F: gap consuming x
            ops.append("I")
            if F[i, j] == H[i - 1, j] + GAP_OPEN + GAP_EXTEND:
                state = "H"
            i -= 1
    ops.reverse()
    return score, i, bi, j, bj, ops


def pretty_alignment(x: bytes, y: bytes) -> str:
    """Three-line local-alignment rendering (x row, operation row, y row)
    in the spirit of rust-bio's Alignment::pretty, for debug logs."""
    score, xs, xe, ys, ye, ops = sw_traceback(x, y)
    xi, yi = xs, ys
    lx, lm, ly_ = [], [], []
    for op in ops:
        if op in ("M", "S"):
            lx.append(chr(x[xi]))
            ly_.append(chr(y[yi]))
            lm.append("|" if op == "M" else "\\")
            xi += 1
            yi += 1
        elif op == "I":
            lx.append(chr(x[xi]))
            ly_.append("-")
            lm.append("+")
            xi += 1
        else:
            lx.append("-")
            ly_.append(chr(y[yi]))
            lm.append("x")
            yi += 1
    return (f"score={score} x[{xs}:{xe}] y[{ys}:{ye}]\n"
            + "".join(lx) + "\n" + "".join(lm) + "\n" + "".join(ly_))
