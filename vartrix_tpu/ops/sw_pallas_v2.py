"""Optimized Pallas SW kernel (v2 wrapper plumbing, v4/v5 recurrences).

Same anti-diagonal wavefront as ops/sw_pallas.py with these optimizations
(each validated by on-chip ablation, docs/KERNEL.md):

  1. SHIFTED-M recurrence (v4, fixed round 3): the kernel carries a
     pre-shifted copy of H (for the match term) and a pre-shifted
     M(d) = max(H(d) + gap_open, F(d)) tile that folds the vertical-gap
     open/extend chains into one carried value, so the exact
     F(i,j) = max(H(i-1,j)+GOE, F(i-1,j)+GE) = shift(M(d-1))[i] + GE
     costs a single add per diagonal (two rolls per diagonal total).
     Round 2 shipped a single-roll variant that carried F UNSHIFTED; it
     admits an illegal mixed gap (skip 1 read base + t haplotype bases
     for one gap-open) and overestimates scores on indel-adjacent
     corners — caught by the adversarial mixed-gap tests, fixed here.
  2. the per-diagonal y window is a dynamic sublane slice from a
     REVERSED, pad-extended y buffer (ybuf[t] = y[c+1-t]) instead of a
     rolling window carried between iterations — removing a loop-carried
     dependency (a roll-carried ys variant measured 12% SLOWER).
  3. eight diagonals per loop iteration: the six state tiles are
     loaded/stored once per group and the running-best merge amortizes
     8x (best-tracking measured ~12% of kernel time at unroll 2).
  4. CHAINED-PAIR kernel (v5): one lane scores one read against
     ref_hap ++ alt_hap chained along y, sharing one wavefront ramp
     (issued diagonals 2(lx+ly-1) -> lx+2ly-1); segment crossing is
     killed only on the lx boundary diagonals (3-phase sweep).
  5. FUSED CALLS: the pair entries can reduce each pair's two scores to
     one int8 call code on device (reference evaluate_scores,
     src/main.rs:1019-1030), shrinking the device->host return 8x.

Exactness matches the NumPy oracle / brute-force affine DP; parity is
enforced by random, adversarial-indel, and mixed-gap tests.
"""

from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH, MIN_SCORE, MISMATCH
from .sw_pallas import LANES, NEG, _on_tpu

# eight diagonals per state round-trip: measured fastest on-chip for the
# single-roll recurrence (unroll sweep in docs/KERNEL.md)
UNROLL_DEFAULT = 8


def _sw_kernel_v4(x_ref, ybuf_ref, out_ref,
                  hm1_ref, hsm1_ref, hsm2_ref, e_ref, ms_ref, best_ref,
                  *, lx: int, ly: int, unroll: int = UNROLL_DEFAULT):
    """x [lx, 128]; ybuf [YB, 128] with ybuf[t] = y[c+1-t] (c = lx+ly-2),
    pad elsewhere; out [1, 128].

    State carried between diagonals:
      h_m1  = H(d-1)                   (unshifted; feeds E)
      hs_m1 = shift_down(H(d-1), 0)    (becomes hs_m2)
      hs_m2 = shift_down(H(d-2), 0)    (feeds the match term)
      ms    = shift_down(M(d-1), NEG)  (feeds F)
    where M(d) = max(H(d) + (GOE-GE), F(d)) folds the vertical-gap open
    and extend chains into ONE carried tile, so the exact F recurrence
    F(i,j) = max(H(i-1,j)+GOE, F(i-1,j)+GE) = shift(M(d-1))[i] + GE costs
    a single add per diagonal. (Round-2's "single-roll" variant carried F
    UNSHIFTED, which admits an illegal mixed gap — skip 1 read base plus
    t haplotype bases for one gap-open — and overestimates scores on
    indel-adjacent corners; caught by the adversarial mixed-gap tests in
    tests/test_sw.py, fixed round 3.)"""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    OMEGA = np.int32(GAP_OPEN)  # GOE - GE

    x = x_ref[:, :]
    zeros = x * np.int32(0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0) == 0

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    ms_ref[:, :] = zeros + NEG
    best_ref[:, :] = zeros

    # window offset for diagonal d is (c1 + pad_top) - d; ybuf carries
    # `pad_top = unroll-1` extra leading pad rows so the over-covered
    # trailing diagonals of the last group still slice at offset >= 0
    # (their windows are all-pad: harmless)
    pad_top = unroll - 1
    c1 = lx + ly - 1 + pad_top
    n_grp = (lx + ly + unroll - 1) // unroll  # covers diagonals 0..lx+ly-2

    def one_diag(d_off_base, k, h_m1, hs_m2, e, ms):
        """Compute diagonal with window offset (d_off_base - k); inputs
        are the previous diagonals' register values."""
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        f_n = ms + GE
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        m_n = jnp.maximum(h_n + OMEGA, f_n)
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        ms_n = jnp.where(row0, NEG, pltpu.roll(m_n, 1, axis=0))
        return h_n, hs_n, e_n, ms_n

    def body(p, _):
        # group of `unroll` diagonals starting at d = unroll*p;
        # state tiles are loaded/stored once per group
        base = c1 - unroll * p
        h_m1 = hm1_ref[:, :]
        hs_m1 = hsm1_ref[:, :]
        hs_m2 = hsm2_ref[:, :]
        e = e_ref[:, :]
        ms = ms_ref[:, :]
        hs = []
        for k in range(unroll):
            h, hsh, e, ms = one_diag(base, k, h_m1, hs_m2, e, ms)
            h_m1 = h
            hs_m2, hs_m1 = hs_m1, hsh
            hs.append(h)
        hm1_ref[:, :] = h_m1
        hsm1_ref[:, :] = hs_m1
        hsm2_ref[:, :] = hs_m2
        e_ref[:, :] = e
        ms_ref[:, :] = ms
        b = hs[0]
        for h in hs[1:]:
            b = jnp.maximum(b, h)
        best_ref[:, :] = jnp.maximum(best_ref[:, :], b)
        return 0

    jax.lax.fori_loop(0, n_grp, body, 0)
    out_ref[:, :] = jnp.max(best_ref[:, :], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pallas_v2(x_t: jax.Array, ybuf_t: jax.Array, *, lx: int, ly: int,
                  interpret: bool, unroll: int = UNROLL_DEFAULT) -> jax.Array:
    B = x_t.shape[1]
    yb = ybuf_t.shape[0]
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel_v4, lx=lx, ly=ly, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32) for _ in range(6)],
        cost_estimate=pl.CostEstimate(
            flops=2 * lx * ly * LANES, bytes_accessed=(lx + yb) * B * 4,
            transcendentals=0),
        interpret=interpret,
    )(x_t, ybuf_t)


def make_ybuf(y: np.ndarray, lx: int, unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Build the reversed window buffer with `unroll-1` extra leading pad
    rows: ybuf[pad_top + t] = y[(lx+ly-1) - t], PAD byte 1 elsewhere."""
    B, ly = y.shape
    pad_top = unroll - 1
    yb = pad_top + 2 * lx + ly
    ybuf = np.full((yb, B), 1, dtype=np.int32)
    ybuf[pad_top + lx : pad_top + lx + ly, :] = y.T[::-1, :]
    return ybuf


# Fixed batch chunk so compiled shapes are workload-independent. 128k
# pairs measured fastest through the axon relay (tools/ab_chunk.py:
# score phase 0.89/1.39s per 500k reads vs 1.51/1.53s at 32k — fewer
# dispatches amortize the per-call relay round-trip; 512k regressed to
# 4.16/1.81s). VARTRIX_CHUNK overrides.
CHUNK = 131072


def _chunk() -> int:
    """Dispatch chunk size (pairs per device call). VARTRIX_CHUNK
    overrides the default: through the axon relay each dispatch pays a
    fixed round-trip, so fewer/larger chunks can dominate the score
    phase (see docs/KERNEL.md chunk A/B); compiled shapes stay
    workload-independent per chunk size."""
    env = os.environ.get("VARTRIX_CHUNK")
    if not env:
        return CHUNK
    # round up to a multiple of 4*LANES: the quad path derives
    # lanes = chunk/4 (2 pairs -> 1 padded read row -> half a lane),
    # and grid = lanes // LANES floor-drops any partial lane block —
    # a chunk that is only 2*LANES-aligned silently returns garbage
    # for the last <=128 reads of every full chunk (advisor r3,
    # high). <= 0 would hang the dispatch loops.
    n = int(env)
    if n <= 0:
        raise ValueError(f"VARTRIX_CHUNK must be positive, got {env}")
    return -(-n // (4 * LANES)) * (4 * LANES)


# ---------------------------------------------------------------------------
# VMEM budget guard (SURVEY §5.7 / VERDICT r4 #3): the wavefront kernels
# hold the whole reversed-y window buffer in VMEM per 128-lane block, so
# a multi-kb --padding (haplotype length ~ 2*padding) would hit a raw
# Mosaic VMEM error. Each dispatcher estimates its per-block footprint
# and degrades gracefully: quad (4ly) -> chained (2ly) -> two-lane pair
# (1ly) -> threaded native CPU full SW (exact same scores by the kernel
# parity tests). ~16 MB VMEM/core; the default budget leaves headroom
# for Mosaic's grid double-buffering of the in/out blocks.
# ---------------------------------------------------------------------------

VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_budget() -> int:
    env = os.environ.get("VARTRIX_VMEM_BUDGET")
    if not env:
        return VMEM_BUDGET
    n = int(env)
    if n <= 0:
        raise ValueError(f"VARTRIX_VMEM_BUDGET must be positive, got {env}")
    return n


def vmem_fit(lx: int, ly: int, variant: str,
             unroll: int = UNROLL_DEFAULT) -> bool:
    """Whether one 128-lane block of the given kernel variant fits the
    VMEM budget. Footprints (rows x 128 lanes x 4B int32): v4 carries
    x(lx) + ybuf(pad+2lx+ly) + out(1) + 6 scratch(lx); v5 chains 2
    segments (ybuf 2ly, 7 scratch, out 2); v6 chains 4 (x 2lx, ybuf
    4ly, 9 scratch, out 4). In/out blocks are counted twice for the
    grid pipeline's double buffering; scratch is allocated once."""
    pad_top = unroll - 1
    if variant == "v4":
        rows_io = lx + (pad_top + 2 * lx + ly) + 1
        rows_scratch = 6 * lx
    elif variant == "v5":
        rows_io = lx + (pad_top + 2 * lx + 2 * ly) + 2
        rows_scratch = 7 * lx
    elif variant == "v6":
        rows_io = 2 * lx + (pad_top + 2 * lx + 4 * ly) + 4
        rows_scratch = 9 * lx
    else:
        raise ValueError(f"unknown kernel variant {variant!r}")
    return (2 * rows_io + rows_scratch) * LANES * 4 <= _vmem_budget()


_vmem_warned = set()


def _warn_vmem_fallback(lx: int, ly: int) -> None:
    import logging

    key = (lx, ly)
    if key not in _vmem_warned:
        _vmem_warned.add(key)
        logging.getLogger("vartrix").warning(
            "haplotype window %d x %d exceeds the TPU VMEM budget "
            "(%d MiB); scoring this shape bucket on the threaded native "
            "CPU aligner instead (identical scores). Large --padding "
            "drives this; VARTRIX_VMEM_BUDGET overrides.",
            lx, ly, _vmem_budget() // (1024 * 1024))


def _materialize_reads(x) -> np.ndarray:
    return np.asarray(x(0, x.shape[0]) if callable(x) else x)


def _cpu_full_sw_flat(seqs, ys) -> np.ndarray:
    """Score parallel lists of (read bytes, hap bytes) with the threaded
    native full SW (NumPy oracle fallback) -> int32 [len(seqs)]."""
    try:
        from .sw_native import full_sw_batch_native, native_available
        if native_available():
            return np.asarray(
                full_sw_batch_native(seqs, ys, os.cpu_count() or 1),
                np.int32)
    except ImportError:
        pass
    from .sw_numpy import sw_score_single
    return np.array([sw_score_single(s, y) for s, y in zip(seqs, ys)],
                    np.int32)


def _cpu_full_sw_pairs(x, hap_mat, idx_ref: np.ndarray,
                       idx_alt: np.ndarray, codes: bool) -> np.ndarray:
    """Host fallback for pair shapes that exceed VMEM: threaded native
    full SW (or the NumPy oracle) on the exact same (read, ref/alt hap)
    pairs; returns the same int8 call codes / [R, 2] scores as the
    device entries."""
    xm = _materialize_reads(x)
    hm = np.asarray(hap_mat)
    xs = [bytes(row[row != 0]) for row in xm]
    haps = [bytes(row[row != 1]) for row in hm]
    seqs, ys = [], []
    for i, (ir, ia) in enumerate(zip(idx_ref, idx_alt)):
        seqs.append(xs[i])
        ys.append(haps[ir])
        seqs.append(xs[i])
        ys.append(haps[ia])
    scores = _cpu_full_sw_flat(seqs, ys).reshape(-1, 2)
    if not codes:
        return scores
    ref, alt = scores[:, 0], scores[:, 1]
    dropped = (ref < MIN_SCORE) & (alt < MIN_SCORE)
    out = np.where(ref > alt, 1, np.where(alt > ref, 2, 3))
    return np.where(dropped, 0, out).astype(np.int8)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_compact(x_u8: jax.Array, hap_mat: jax.Array, hap_idx: jax.Array,
                *, lx: int, ly: int, interpret: bool,
                unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Compact-transfer entry: x [B, lx] uint8, unique haplotypes
    [H, ly] uint8, per-pair hap index [B] int32. The int32 widening, the
    haplotype gather, the reversal and the window-buffer layout all happen
    ON DEVICE, so the host->device transfer is ~1 byte/base instead of
    4 bytes/base of a fully materialized window buffer."""
    B = x_u8.shape[0]
    pad_top = unroll - 1
    x_t = x_u8.astype(jnp.int32).T
    y = hap_mat[hap_idx]                      # [B, ly] uint8
    yrev = jnp.flip(y, axis=1).astype(jnp.int32).T   # [ly, B]
    ybuf = jnp.full((pad_top + 2 * lx + ly, B), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + ly].set(yrev)
    return _sw_pallas_v2(x_t, ybuf, lx=lx, ly=ly, interpret=interpret,
                         unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_compact2(x_mat: jax.Array, x_idx: jax.Array, hap_mat: jax.Array,
                 hap_idx: jax.Array, *, lx: int, ly: int, interpret: bool,
                 unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Fully-deduplicated compact entry: unique reads [R, lx] uint8 +
    per-pair read index, unique haplotypes [H, ly] uint8 + per-pair hap
    index. Both gathers run on device; with every read scored against a
    ref and an alt haplotype, shipping unique reads halves the
    host->device read traffic of _sw_compact."""
    B = x_idx.shape[0]
    pad_top = unroll - 1
    x_t = x_mat[x_idx].astype(jnp.int32).T          # [lx, B]
    y = hap_mat[hap_idx]                            # [B, ly] uint8
    yrev = jnp.flip(y, axis=1).astype(jnp.int32).T  # [ly, B]
    ybuf = jnp.full((pad_top + 2 * lx + ly, B), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + ly].set(yrev)
    return _sw_pallas_v2(x_t, ybuf, lx=lx, ly=ly, interpret=interpret,
                         unroll=unroll)


def sw_scores_compact2_tpu(x_mat: np.ndarray, x_idx: np.ndarray,
                           hap_mat: np.ndarray, hap_idx: np.ndarray,
                           unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """x_mat uint8 [R, Lx] unique reads (pad 0), x_idx int32 [B],
    hap_mat uint8 [H, Ly] (pad 1), hap_idx int32 [B] -> int32 [B].
    x_mat/hap_mat are shipped to the device ONCE; pair chunks only carry
    two int32 index vectors."""
    B = len(x_idx)
    lx = x_mat.shape[1]
    ly = hap_mat.shape[1]
    if not vmem_fit(lx, ly, "v4", unroll):
        _warn_vmem_fallback(lx, ly)
        return _cpu_full_sw_flat(
            [bytes(x_mat[i][x_mat[i] != 0]) for i in x_idx],
            [bytes(hap_mat[i][hap_mat[i] != 1]) for i in hap_idx])
    interpret = not _on_tpu()
    x_dev = jnp.asarray(x_mat)
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty(B, dtype=np.int32)
    results, spans = [], []
    start = 0
    while start < B:
        n = min(_chunk(), B - start)
        bp = _quantized_batch(n)
        xi = np.zeros(bp, dtype=np.int32)
        xi[:n] = x_idx[start : start + n]
        hi = np.zeros(bp, dtype=np.int32)
        hi[:n] = hap_idx[start : start + n]
        results.append(_sw_compact2(x_dev, jnp.asarray(xi), hap_dev,
                                    jnp.asarray(hi), lx=lx, ly=ly,
                                    interpret=interpret, unroll=unroll))
        spans.append((start, n))
        start += n
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[0, :n]
    return out


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_compact_pairs(x_u8: jax.Array, hap_mat: jax.Array, idx2: jax.Array,
                      *, lx: int, ly: int, interpret: bool,
                      unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Read-pair compact entry: each read ships ONCE ([R, lx] uint8) and is
    scored against TWO haplotypes (idx2 [2R] = interleaved ref/alt hap
    rows). The read duplication is a contiguous on-device repeat — halving
    host gather volume and host->device read traffic vs shipping per-pair
    rows, without the slow resident-matrix row gather of _sw_compact2."""
    pad_top = unroll - 1
    x2 = jnp.repeat(x_u8, 2, axis=0)                 # [2R, lx] contiguous
    x_t = x2.astype(jnp.int32).T
    y = hap_mat[idx2]                                # [2R, ly] uint8
    yrev = jnp.flip(y, axis=1).astype(jnp.int32).T
    B = idx2.shape[0]
    ybuf = jnp.full((pad_top + 2 * lx + ly, B), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + ly].set(yrev)
    return _sw_pallas_v2(x_t, ybuf, lx=lx, ly=ly, interpret=interpret,
                         unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_calls(x_u8: jax.Array, hap_mat: jax.Array, idx2: jax.Array,
                   *, lx: int, ly: int, interpret: bool,
                   unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Fused score->call pair entry: runs the wavefront kernel on the
    interleaved (ref, alt) pair batch, then reduces each pair's two int32
    scores to ONE int8 call code ON DEVICE (reference evaluate_scores,
    src/main.rs:1019-1030: both < MIN_SCORE -> dropped(0), ref>alt -> 1,
    alt>ref -> 2, tie -> unknown(3)). The device->host return shrinks from
    8 bytes/read (2x int32) to 1 byte/read — the score phase's return
    transfer is the e2e bottleneck through the relay (VERDICT r2 #1)."""
    s = _sw_compact_pairs(x_u8, hap_mat, idx2, lx=lx, ly=ly,
                          interpret=interpret, unroll=unroll)[0]
    ref, alt = s[0::2], s[1::2]
    dropped = (ref < MIN_SCORE) & (alt < MIN_SCORE)
    code = jnp.where(ref > alt, 1, jnp.where(alt > ref, 2, 3))
    return jnp.where(dropped, 0, code).astype(jnp.int8)


def sw_calls_pair_tpu(x, hap_mat: np.ndarray,
                      idx_ref: np.ndarray, idx_alt: np.ndarray,
                      unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Like sw_scores_pair_tpu but returns int8 call codes [R]
    (0=dropped, 1=REF, 2=ALT, 3=UNKNOWN) computed on device."""
    provider = callable(x)
    R, lx = x.shape
    ly = hap_mat.shape[1]
    if not vmem_fit(lx, ly, "v4", unroll):
        _warn_vmem_fallback(lx, ly)
        return _cpu_full_sw_pairs(x, hap_mat, idx_ref, idx_alt, codes=True)
    interpret = not _on_tpu()
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty(R, dtype=np.int8)
    results, spans = [], []
    half = _chunk() // 2
    start = 0
    while start < R:
        n = min(half, R - start)
        bp = max(_quantized_batch(2 * n) // 2, LANES // 2)
        xc = np.zeros((bp, lx), dtype=np.uint8)
        xc[:n] = x(start, n) if provider else x[start : start + n]
        idx2 = np.zeros(2 * bp, dtype=np.int32)
        idx2[0 : 2 * n : 2] = idx_ref[start : start + n]
        idx2[1 : 2 * n : 2] = idx_alt[start : start + n]
        results.append(_sw_pair_calls(jnp.asarray(xc), hap_dev,
                                      jnp.asarray(idx2), lx=lx, ly=ly,
                                      interpret=interpret, unroll=unroll))
        spans.append((start, n))
        start += n
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[:n]
    return out


def sw_scores_pair_tpu(x, hap_mat: np.ndarray,
                       idx_ref: np.ndarray, idx_alt: np.ndarray,
                       unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """x uint8 [R, Lx] one row per READ (pad 0), hap_mat uint8 [H, Ly]
    (pad 1), idx_ref/idx_alt int32 [R] -> int32 [R, 2] (ref, alt) scores.
    Chunked like the other entries; each chunk ships R read rows and
    scores 2R pairs.

    x may instead be a callable provider `(start, n) -> uint8 [n, Lx]`
    carrying a `.shape == (R, Lx)` attribute: the read rows are then
    gathered chunk-by-chunk inside the dispatch loop, so host gather of
    chunk k+1 overlaps device compute of chunk k (and the full [R, Lx]
    matrix never materializes on the host)."""
    provider = callable(x)
    R, lx = x.shape
    ly = hap_mat.shape[1]
    if not vmem_fit(lx, ly, "v4", unroll):
        _warn_vmem_fallback(lx, ly)
        return _cpu_full_sw_pairs(x, hap_mat, idx_ref, idx_alt, codes=False)
    interpret = not _on_tpu()
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty((R, 2), dtype=np.int32)
    results, spans = [], []
    half = _chunk() // 2
    start = 0
    while start < R:
        n = min(half, R - start)
        bp = max(_quantized_batch(2 * n) // 2, LANES // 2)
        xc = np.zeros((bp, lx), dtype=np.uint8)
        xc[:n] = x(start, n) if provider else x[start : start + n]
        idx2 = np.zeros(2 * bp, dtype=np.int32)
        idx2[0 : 2 * n : 2] = idx_ref[start : start + n]
        idx2[1 : 2 * n : 2] = idx_alt[start : start + n]
        results.append(_sw_compact_pairs(jnp.asarray(xc), hap_dev,
                                         jnp.asarray(idx2), lx=lx, ly=ly,
                                         interpret=interpret, unroll=unroll))
        spans.append((start, n))
        start += n
    for r, (s, n) in zip(results, spans):
        block = np.asarray(r)[0, : 2 * n]
        out[s : s + n, 0] = block[0::2]
        out[s : s + n, 1] = block[1::2]
    return out


def sw_scores_compact_tpu(x, hap_mat: np.ndarray,
                          hap_idx: np.ndarray, unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """x uint8 [B, Lx] (pad 0), hap_mat uint8 [H, Ly] (pad 1),
    hap_idx int32 [B] -> int32 [B]. Chunked like sw_scores_batch_tpu_v2.
    x may be a chunk provider (see sw_scores_pair_tpu)."""
    provider = callable(x)
    B, lx = x.shape
    ly = hap_mat.shape[1]
    if not vmem_fit(lx, ly, "v4", unroll):
        _warn_vmem_fallback(lx, ly)
        xm = _materialize_reads(x)
        hm = np.asarray(hap_mat)
        return _cpu_full_sw_flat(
            [bytes(r[r != 0]) for r in xm],
            [bytes(hm[i][hm[i] != 1]) for i in hap_idx])
    interpret = not _on_tpu()
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty(B, dtype=np.int32)
    results, spans = [], []
    start = 0
    while start < B:
        n = min(_chunk(), B - start)
        bp = _quantized_batch(n)
        xc = np.zeros((bp, lx), dtype=np.uint8)
        xc[:n] = x(start, n) if provider else x[start : start + n]
        ic = np.zeros(bp, dtype=np.int32)
        ic[:n] = hap_idx[start : start + n]
        results.append(_sw_compact(jnp.asarray(xc), hap_dev, jnp.asarray(ic),
                                   lx=lx, ly=ly, interpret=interpret,
                                   unroll=unroll))
        spans.append((start, n))
        start += n
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[0, :n]
    return out


def _quantized_batch(n: int) -> int:
    """Smallest power-of-two >= n (min 1 lane group of 128), capped at CHUNK."""
    b = LANES
    while b < n:
        b <<= 1
    return min(b, _chunk())


def sw_scores_batch_tpu_v2(x: np.ndarray, y: np.ndarray,
                           unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Backend entry point (uint8 [B, Lx] / [B, Ly] -> int32 [B]).

    Batches are processed in fixed-size chunks (pow2-padded tail) so the
    set of compiled kernel shapes is bounded regardless of workload."""
    B, lx = x.shape
    ly = y.shape[1]
    if not vmem_fit(lx, ly, "v4", unroll):
        _warn_vmem_fallback(lx, ly)
        return _cpu_full_sw_flat([bytes(r[r != 0]) for r in x],
                                 [bytes(r[r != 1]) for r in y])
    interpret = not _on_tpu()
    out = np.empty(B, dtype=np.int32)
    start = 0
    results = []
    spans = []
    while start < B:
        n = min(_chunk(), B - start)
        bp = _quantized_batch(n)
        x_t = np.zeros((lx, bp), dtype=np.int32)
        x_t[:, :n] = x[start : start + n].T
        yp = np.ones((bp, ly), dtype=np.uint8)
        yp[:n] = y[start : start + n]
        ybuf = make_ybuf(yp, lx, unroll)
        # async dispatch; materialize after the loop so chunks pipeline
        results.append(_sw_pallas_v2(jnp.asarray(x_t), jnp.asarray(ybuf),
                                     lx=lx, ly=ly, interpret=interpret,
                                     unroll=unroll))
        spans.append((start, n))
        start += n
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[0, :n]
    return out


# advertise the compact protocols to the batching layer
sw_scores_batch_tpu_v2.compact = sw_scores_compact_tpu
sw_scores_batch_tpu_v2.compact2 = sw_scores_compact2_tpu
sw_scores_batch_tpu_v2.pair = sw_scores_pair_tpu
sw_scores_batch_tpu_v2.pair_calls = sw_calls_pair_tpu


def make_mesh_scorer(n_devices: int = 0, unroll: int = UNROLL_DEFAULT):
    """Score-batch function sharded over a 1-D device mesh: each device
    runs the Pallas wavefront kernel on its slice of the pair batch
    (shard_map over the batch axis; no collectives needed — scores are
    per-pair). This is the multi-chip single-host scaling path for the
    CLI (--mesh-devices); exactness is placement-invariant.

    Returns a function with the same contract as sw_scores_batch_tpu_v2,
    including the .compact protocol."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    n = len(devs)
    mesh = Mesh(np.array(devs), ("shard",))
    interpret = not _on_tpu()

    @functools.partial(jax.jit, static_argnames=("lx", "ly"))
    def _sharded(x_u8, hap_mat, hap_idx, *, lx, ly):
        def local(x_c, haps, idx_c):
            return _sw_compact(x_c, haps, idx_c, lx=lx, ly=ly,
                               interpret=interpret, unroll=unroll)

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("shard"), P(), P("shard")),
                       out_specs=P(None, "shard"), check_rep=False)
        return fn(x_u8, hap_mat, hap_idx)

    @functools.partial(jax.jit, static_argnames=("lx", "ly"))
    def _sharded_pair_calls(x_u8, hap_mat, idx2, *, lx, ly):
        def local(x_c, haps, idx2_c):
            return _sw_pair_chained_calls(x_c, haps, idx2_c, lx=lx, ly=ly,
                                          interpret=interpret, unroll=unroll)

        # reads shard on the batch axis; idx2's per-device chunk is
        # 2*(R/n) entries — even, so interleaved (ref, alt) pairs never
        # split across devices
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("shard"), P(), P("shard")),
                       out_specs=P("shard"), check_rep=False)
        return fn(x_u8, hap_mat, idx2)

    @functools.partial(jax.jit, static_argnames=("lx", "ly"))
    def _sharded_pair_calls_quad(x_u8, hap_mat, idx2, *, lx, ly):
        def local(x_c, haps, idx2_c):
            return _sw_pair_quad_calls(x_c, haps, idx2_c, lx=lx, ly=ly,
                                       interpret=interpret, unroll=unroll)

        # quad batches are quantized to per-device multiples of 2*LANES,
        # so each device's read chunk pairs up into whole lanes
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("shard"), P(), P("shard")),
                       out_specs=P("shard"), check_rep=False)
        return fn(x_u8, hap_mat, idx2)

    @functools.partial(jax.jit, static_argnames=("lx", "ly", "quad"))
    def _sharded_pair_calls_packed(xp, xlen, hap_mat, idx2, *, lx, ly,
                                   quad):
        def local(xp_c, xl_c, haps, idx2_c):
            entry = (_sw_pair_quad_calls_packed if quad
                     else _sw_pair_chained_calls_packed)
            return entry(xp_c, xl_c, haps, idx2_c, lx=lx, ly=ly,
                         interpret=interpret, unroll=unroll)

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("shard"), P("shard"), P(), P("shard")),
                       out_specs=P("shard"), check_rep=False)
        return fn(xp, xlen, hap_mat, idx2)

    def scorer(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # plain entry: chunk so the replicated per-chunk hap matrix stays
        # bounded (<= CHUNK x ly per device) and compiled shapes are
        # workload-independent, like the non-mesh path
        B = x.shape[0]
        out = np.empty(B, dtype=np.int32)
        for s in range(0, max(B, 1), _chunk()):
            cn = min(_chunk(), B - s)
            if cn <= 0:
                break
            idx = np.arange(cn, dtype=np.int32)
            out[s : s + cn] = compact(x[s : s + cn], y[s : s + cn], idx)
        return out

    def compact(x, hap_mat: np.ndarray,
                hap_idx: np.ndarray) -> np.ndarray:
        provider = callable(x)
        B, lx = x.shape
        ly = hap_mat.shape[1]
        if not vmem_fit(lx, ly, "v4", unroll):
            _warn_vmem_fallback(lx, ly)
            xm = _materialize_reads(x)
            hm = np.asarray(hap_mat)
            return _cpu_full_sw_flat(
                [bytes(r[r != 0]) for r in xm],
                [bytes(hm[i][hm[i] != 1]) for i in hap_idx])
        hap_dev = jnp.asarray(hap_mat)
        out = np.empty(B, dtype=np.int32)
        results, spans = [], []
        start = 0
        while start < B:
            cn = min(_chunk(), B - start)
            # batch must split evenly into per-device multiples of LANES
            q = n * LANES
            bp = ((max(_quantized_batch(cn), q) + q - 1) // q) * q
            xc = np.zeros((bp, lx), dtype=np.uint8)
            xc[:cn] = x(start, cn) if provider else x[start : start + cn]
            ic = np.zeros(bp, dtype=np.int32)
            ic[:cn] = hap_idx[start : start + cn]
            results.append(_sharded(jnp.asarray(xc), hap_dev,
                                    jnp.asarray(ic), lx=lx, ly=ly))
            spans.append((start, cn))
            start += cn
        for r, (s, cn) in zip(results, spans):
            out[s : s + cn] = np.asarray(r)[0, :cn]
        return out

    def pair_calls(x, hap_mat: np.ndarray, idx_ref: np.ndarray,
                   idx_alt: np.ndarray) -> np.ndarray:
        """Fused chained-pair protocol over the mesh -> int8 codes [R].
        Reads ship 4-bit packed when the provider offers the native
        packed gather (same VARTRIX_PACK4 dispatch as single-chip)."""
        import os as _os
        provider = callable(x)
        packed = _pack4_enabled(x, _sharded_pair_calls_packed)
        R, lx = x.shape
        ly = hap_mat.shape[1]
        if not vmem_fit(lx, ly, "v5", unroll):
            # no sharded two-lane (v4) wrapper exists; oversized windows
            # go straight to the threaded host aligner
            _warn_vmem_fallback(lx, ly)
            return _cpu_full_sw_pairs(x, hap_mat, idx_ref, idx_alt,
                                      codes=True)
        quad = (_os.environ.get("VARTRIX_QUAD", "1") != "0"
                and quad_feasible(lx, ly, unroll)
                and vmem_fit(lx, ly, "v6", unroll))
        entry = _sharded_pair_calls_quad if quad else _sharded_pair_calls
        hap_dev = jnp.asarray(np.asarray(hap_mat))
        out = np.empty(R, dtype=np.int8)
        results, spans = [], []
        half = _chunk() // 2
        start = 0
        while start < R:
            cn = min(half, R - start)
            q = n * (2 * LANES if quad else LANES)
            bp = ((max(_quantized_batch(cn), q) + q - 1) // q) * q
            idx2 = np.zeros(2 * bp, dtype=np.int32)
            idx2[0 : 2 * cn : 2] = idx_ref[start : start + cn]
            idx2[1 : 2 * cn : 2] = idx_alt[start : start + cn]
            got = x.packed(start, cn) if packed else None
            if got is not None:
                xg, lg = got
                xc = np.zeros((bp, lx // 2), dtype=np.uint8)
                xc[:cn] = xg
                xl = np.zeros(bp, dtype=np.int32)
                xl[:cn] = lg
                results.append(_sharded_pair_calls_packed(
                    jnp.asarray(xc), jnp.asarray(xl), hap_dev,
                    jnp.asarray(idx2), lx=lx, ly=ly, quad=quad))
            else:
                packed = False
                xc = np.zeros((bp, lx), dtype=np.uint8)
                xc[:cn] = x(start, cn) if provider else x[start : start + cn]
                results.append(entry(jnp.asarray(xc), hap_dev,
                                     jnp.asarray(idx2), lx=lx, ly=ly))
            spans.append((start, cn))
            start += cn
        for r, (s, cn) in zip(results, spans):
            out[s : s + cn] = np.asarray(r)[:cn]
        return out

    scorer.compact = compact
    scorer.pair_calls_chained = pair_calls
    scorer.mesh = mesh
    return scorer


# ---------------------------------------------------------------------------
# v5: chained-pair kernel (corner packing, VERDICT r2 #2)
#
# Each lane scores ONE read against TWO haplotypes laid back-to-back along
# y (Y = ref_hap ++ alt_hap, each segment padded to ly). The two DP
# problems share one wavefront ramp: issued diagonals drop from
# 2*(lx+ly-1) to lx+2*ly-1 (-21% at 152x208). Crossing between the
# segments is killed only on the lx diagonals where the boundary column
# (j == ly) is inside the tile, so the sweep runs in three phases:
#   phase 1 (d < ly):            vanilla recurrence, best -> ref tile
#   phase 2 (ly <= d <= ly+lx-1): crossing kill at row i == d-ly, per-
#                                 diagonal parity split of best updates
#   phase 3 (d > ly+lx-1):       vanilla recurrence, best -> alt tile
# Out block is [2, LANES]: (ref_best, alt_best) per lane.
# ---------------------------------------------------------------------------


def _sw_kernel_v5(x_ref, ybuf_ref, out_ref,
                  hm1_ref, hsm1_ref, hsm2_ref, e_ref, ms_ref,
                  ba_ref, bb_ref, *, lx: int, ly: int,
                  unroll: int = UNROLL_DEFAULT):
    """x [lx, 128]; ybuf [YB, 128] with ybuf[pad_top + t] = Y[(2*ly-1) - t]
    (Y = ref ++ alt, pad byte 1 elsewhere); out [2, 128]. Same exact
    recurrence as _sw_kernel_v4 (shifted-M vertical-gap state)."""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    OMEGA = np.int32(GAP_OPEN)  # GOE - GE

    x = x_ref[:, :]
    zeros = x * np.int32(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0)
    row0 = iota == 0

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    ms_ref[:, :] = zeros + NEG
    ba_ref[:, :] = zeros
    bb_ref[:, :] = zeros

    pad_top = unroll - 1
    L = 2 * ly
    c1 = lx + L - 1 + pad_top
    n_grp = (lx + L + unroll - 1) // unroll
    # phase edges in group units: phase 2 must cover every diagonal in
    # [ly, ly+lx-1] (the boundary column's diagonals)
    g2 = min((ly + lx - 1) // unroll + 1, n_grp)
    g1 = min(ly // unroll, g2)

    def one_diag(d_off_base, k, h_m1, hs_m2, e, ms, rb=None):
        """rb: boundary row scalar (phase 2 only) — kills the E and
        match transitions entering column j == ly at row i == rb (the
        vertical F chain never crosses columns, so it needs no kill)."""
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        if rb is not None:
            cross = iota == rb
            # a problem-2 local alignment may START at any boundary-
            # column cell: clamp the diagonal predecessor to the virtual
            # H=0 boundary (not NEG) so fresh matches survive, and kill
            # the horizontal gap chain outright (a local alignment never
            # opens with a gap — it would be floored anyway)
            hs_m2 = jnp.where(cross, np.int32(0), hs_m2)
            e_n = jnp.where(cross, NEG, e_n)
        f_n = ms + GE
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        m_n = jnp.maximum(h_n + OMEGA, f_n)
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        ms_n = jnp.where(row0, NEG, pltpu.roll(m_n, 1, axis=0))
        return h_n, hs_n, e_n, ms_n

    def make_body(phase):
        def body(p, _):
            base = c1 - unroll * p
            d0 = unroll * p
            h_m1 = hm1_ref[:, :]
            hs_m1 = hsm1_ref[:, :]
            hs_m2 = hsm2_ref[:, :]
            e = e_ref[:, :]
            ms = ms_ref[:, :]
            hs_a, hs_b = [], []
            for k in range(unroll):
                rb = (d0 + k - ly) if phase == 2 else None
                h, hsh, e, ms = one_diag(base, k, h_m1, hs_m2, e, ms,
                                         rb=rb)
                h_m1 = h
                hs_m2, hs_m1 = hs_m1, hsh
                if phase == 1:
                    hs_a.append(h)
                elif phase == 3:
                    hs_b.append(h)
                else:
                    pmask = iota <= rb
                    hs_a.append(jnp.where(pmask, np.int32(0), h))
                    hs_b.append(jnp.where(pmask, h, np.int32(0)))
            hm1_ref[:, :] = h_m1
            hsm1_ref[:, :] = hs_m1
            hsm2_ref[:, :] = hs_m2
            e_ref[:, :] = e
            ms_ref[:, :] = ms
            for hs, ref in ((hs_a, ba_ref), (hs_b, bb_ref)):
                if not hs:
                    continue
                b = hs[0]
                for h in hs[1:]:
                    b = jnp.maximum(b, h)
                ref[:, :] = jnp.maximum(ref[:, :], b)
            return 0

        return body

    jax.lax.fori_loop(0, g1, make_body(1), 0)
    jax.lax.fori_loop(g1, g2, make_body(2), 0)
    jax.lax.fori_loop(g2, n_grp, make_body(3), 0)
    out_ref[:, :] = jnp.concatenate(
        [jnp.max(ba_ref[:, :], axis=0, keepdims=True),
         jnp.max(bb_ref[:, :], axis=0, keepdims=True)], axis=0)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pallas_v5(x_t: jax.Array, ybuf_t: jax.Array, *, lx: int, ly: int,
                  interpret: bool, unroll: int = UNROLL_DEFAULT) -> jax.Array:
    B = x_t.shape[1]
    yb = ybuf_t.shape[0]
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel_v5, lx=lx, ly=ly, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32) for _ in range(7)],
        cost_estimate=pl.CostEstimate(
            flops=2 * lx * (lx + 2 * ly) * LANES,
            bytes_accessed=(lx + yb) * B * 4, transcendentals=0),
        interpret=interpret,
    )(x_t, ybuf_t)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_chained(x_u8: jax.Array, hap_mat: jax.Array, idx2: jax.Array,
                     *, lx: int, ly: int, interpret: bool,
                     unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Chained-pair entry: x [R, lx] uint8 (one row per read), idx2 [2R]
    interleaved (ref, alt) haplotype rows. Returns [2, R] int32 scores.
    Unlike _sw_compact_pairs there is no on-device read repeat — each
    lane carries the read once against both haplotypes."""
    R = x_u8.shape[0]
    pad_top = unroll - 1
    x_t = x_u8.astype(jnp.int32).T                    # [lx, R]
    ych = hap_mat[idx2].reshape(R, 2 * ly)            # ref ++ alt per read
    yrev = jnp.flip(ych, axis=1).astype(jnp.int32).T  # [2ly, R]
    ybuf = jnp.full((pad_top + 2 * lx + 2 * ly, R), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + 2 * ly].set(yrev)
    return _sw_pallas_v5(x_t, ybuf, lx=lx, ly=ly, interpret=interpret,
                         unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_chained_calls(x_u8: jax.Array, hap_mat: jax.Array,
                           idx2: jax.Array, *, lx: int, ly: int,
                           interpret: bool,
                           unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Chained-pair kernel + fused on-device call reduction -> int8 [R]."""
    s = _sw_pair_chained(x_u8, hap_mat, idx2, lx=lx, ly=ly,
                         interpret=interpret, unroll=unroll)
    ref, alt = s[0], s[1]
    dropped = (ref < MIN_SCORE) & (alt < MIN_SCORE)
    code = jnp.where(ref > alt, 1, jnp.where(alt > ref, 2, 3))
    return jnp.where(dropped, 0, code).astype(jnp.int8)


# BAM SEQ nibble -> ASCII (the exact bytes the unpacked pool holds); the
# packed transfer protocol ships 4-bit codes and rebuilds these bytes on
# device, so scores stay raw-byte identical to the unpacked path.
SEQ_NT16_TBL = np.frombuffer(b"=ACMGRSVTWYHKDBN", np.uint8).copy()

# 2-bit protocol table (gio_gather_padded_packed2: A/C/G/T only,
# low-bits-first within each byte)
PACK2_TBL = np.frombuffer(b"ACGT", np.uint8).copy()


def _unpack2(xp: jax.Array, xlen: jax.Array, lx: int) -> jax.Array:
    """[R, lx//4] 2-bit codes (low bits first) + [R] lengths ->
    [R, lx] uint8 ASCII bytes, positions >= len set to 0 (read pad)."""
    R = xp.shape[0]
    rep = jnp.repeat(xp.astype(jnp.int32), 4, axis=1)        # [R, lx]
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, lx), 1)
    codes = (rep >> ((pos % 4) * 2)) & 3
    x = jnp.asarray(PACK2_TBL)[codes]
    return jnp.where(pos < xlen[:, None], x, jnp.uint8(0))


def _unpack4(xp: jax.Array, xlen: jax.Array, lx: int,
             pad: int = 0) -> jax.Array:
    """[R, lx//2] packed nibbles (high nibble first) + [R] lengths ->
    [R, lx] uint8 SEQ_NT16 bytes, positions >= len set to `pad` (kernel
    read pad 0 / haplotype pad 1). Runs inside the jitted entry so the
    host->device transfer is halved; XLA fuses the unpack."""
    R = xp.shape[0]
    hi = (xp >> 4).astype(jnp.int32)
    lo = (xp & 15).astype(jnp.int32)
    inter = jnp.stack([hi, lo], axis=-1).reshape(R, lx)
    x = jnp.asarray(SEQ_NT16_TBL)[inter]
    mask = jax.lax.broadcasted_iota(jnp.int32, (R, lx), 1) < xlen[:, None]
    return jnp.where(mask, x, jnp.uint8(pad))


class PackedHaps:
    """Haplotype matrix in the 4-bit packed transfer representation:
    `packed` [H, ly//2] uint8 nibbles + `lens` [H] int32, plus the dense
    [H, ly] fallback (pad byte 1) for entries/paths that don't consume
    packed haps. np.asarray()/jnp.asarray() yield the dense matrix, so
    every existing consumer keeps working; the packed-aware dispatchers
    ship `packed`+`lens` instead (halves the per-bucket hap upload —
    dominant at 100k-variant cohort scale where the unique-hap matrix
    is tens of MB per shape bucket)."""

    __slots__ = ("packed", "lens", "dense")

    def __init__(self, packed: np.ndarray, lens: np.ndarray,
                 dense: np.ndarray):
        self.packed = packed
        self.lens = lens
        self.dense = dense

    @property
    def shape(self):
        return self.dense.shape

    def __array__(self, dtype=None, copy=None):
        return self.dense if dtype is None else self.dense.astype(dtype)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_chained_calls_packed(xp: jax.Array, xlen: jax.Array,
                                  hap_mat: jax.Array, idx2: jax.Array,
                                  *, lx: int, ly: int, interpret: bool,
                                  unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Packed-transfer flavor of _sw_pair_chained_calls."""
    x = _unpack4(xp, xlen, lx)
    return _sw_pair_chained_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                                  interpret=interpret, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_chained_calls_packed2(xp: jax.Array, xlen: jax.Array,
                                   hp: jax.Array, hlen: jax.Array,
                                   idx2: jax.Array, *, lx: int, ly: int,
                                   interpret: bool,
                                   unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Reads AND haplotypes packed (hap pad byte 1)."""
    x = _unpack4(xp, xlen, lx)
    hap_mat = _unpack4(hp, hlen, ly, pad=1)
    return _sw_pair_chained_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                                  interpret=interpret, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_chained_calls_p2(xp: jax.Array, xlen: jax.Array,
                              hap_mat: jax.Array, idx2: jax.Array,
                              *, lx: int, ly: int, interpret: bool,
                              unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """2-bit read transfer flavor of _sw_pair_chained_calls."""
    x = _unpack2(xp, xlen, lx)
    return _sw_pair_chained_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                                  interpret=interpret, unroll=unroll)


def _pack4_enabled(x, packed_entry) -> bool:
    return (packed_entry is not None and callable(x)
            and getattr(x, "packed", None) is not None
            and x.shape[1] % 2 == 0
            and os.environ.get("VARTRIX_PACK4", "1") != "0")


@functools.partial(jax.jit, static_argnames=("lx", "pad"))
def _unpack4_jit(xp: jax.Array, xlen: jax.Array, lx: int,
                 pad: int = 0) -> jax.Array:
    """Standalone jitted _unpack4: unpack a 4-bit matrix ON DEVICE once
    and keep the dense result device-resident across chunk dispatches.
    At cohort scale the unique-hap matrix is ~200k rows; unpacking it
    inside every chunk entry (the packed2 path) redoes ~45MB of device
    work per chunk — this pays the transfer once (packed) and the unpack
    once (VARTRIX_HAP_UNPACK_ONCE=0 restores the per-chunk packed2
    behavior)."""
    return _unpack4(xp, xlen, lx, pad)


def _prefetch_depth() -> int:
    """Chunks gathered/packed ahead of the device (VARTRIX_PREFETCH,
    default 2; 0 = the pre-round-5 serial loop)."""
    try:
        return max(0, int(os.environ.get("VARTRIX_PREFETCH", "2")))
    except ValueError:
        return 2


def _inflight() -> int:
    """Concurrent device dispatches (VARTRIX_INFLIGHT, default 2):
    overlaps chunk k+1's host->device transfer with chunk k's kernel.
    The r5 A/B (tools/ab_prefetch.py, 4 interleaved fresh-dataset reps,
    byte-equal outputs): score median serial 1.05s / prefetch-only 0.86s
    / prefetch+2-in-flight 0.83s (min 0.66s) per 500k reads. 1 restores
    single-threaded dispatch."""
    try:
        return max(1, int(os.environ.get("VARTRIX_INFLIGHT", "2")))
    except ValueError:
        return 2


def _chunked_pair_dispatch(x, hap_mat, idx_ref, idx_alt, entry, unroll,
                           packed_entry, packed2_entry, bp_of,
                           p2_entry=None):
    """Shared chunk-dispatch body for the chained-pair and quad entries:
    each chunk ships read rows + interleaved hap indices; `bp_of(n)`
    quantizes the padded row count for the target kernel's lane
    geometry. When the read source offers a packed gather
    (fast_pipeline provider) and a packed entry exists, reads ship as
    4-bit codes + lengths (half the transfer); with a PackedHaps hap
    matrix and a packed2 entry, the per-bucket hap upload is halved
    too. Falls back per-call if the packed gather declines (foreign
    alphabet).

    The loop is PIPELINED: a producer thread gathers+packs chunk k+1..k+D
    (D = VARTRIX_PREFETCH) while chunk k's dispatch round-trips through
    the device/relay, so the native gather and the device execution
    overlap instead of serializing (the round-4 profile put ~60-78% of
    the score phase in transfer/dispatch). VARTRIX_INFLIGHT>1 additionally
    dispatches from a small thread pool so consecutive chunks' transfers
    and kernels overlap inside the backend."""
    provider = callable(x)
    packed_ok = _pack4_enabled(x, packed_entry)
    ph = hap_mat if isinstance(hap_mat, PackedHaps) else None
    R, lx = x.shape
    ly = hap_mat.shape[1]
    interpret = not _on_tpu()
    dense_dev = None
    dense_lock = threading.Lock()

    def hap_dense():
        nonlocal dense_dev
        with dense_lock:
            if dense_dev is None:
                dense_dev = jnp.asarray(np.asarray(hap_mat))
            return dense_dev

    hp_dev = None
    if packed_ok and ph is not None and ly % 2 == 0:
        if (os.environ.get("VARTRIX_HAP_UNPACK_ONCE", "1") != "0"
                and packed_entry is not None):
            # packed transfer, ONE device-side unpack, dense matrix stays
            # device-resident for every chunk (see _unpack4_jit)
            dense_dev = _unpack4_jit(jnp.asarray(ph.packed),
                                     jnp.asarray(ph.lens), lx=ly, pad=1)
        elif packed2_entry is not None:
            hp_dev = (jnp.asarray(ph.packed), jnp.asarray(ph.lens))

    half = _chunk() // 2
    spans = []
    start = 0
    while start < R:
        n = min(half, R - start)
        spans.append((start, n))
        start += n

    # a shared hint so one declined packed gather (foreign alphabet)
    # stops later chunks from re-attempting; races only cost one retry.
    # The 2-bit protocol (A/C/G/T only, quarter transfer) needs the
    # device-resident dense hap path (hp_dev None), a p2 entry, and
    # lx % 4 == 0; it declines per chunk on any non-ACGT read byte.
    state = {"packed": packed_ok,
             "p2": (packed_ok and p2_entry is not None
                    and getattr(x, "packed2", None) is not None
                    and lx % 4 == 0 and hp_dev is None
                    and os.environ.get("VARTRIX_PACK2", "1") != "0")}

    def prep(span):
        start, n = span
        bp = bp_of(n)
        idx2 = np.zeros(2 * bp, dtype=np.int32)
        idx2[0 : 2 * n : 2] = idx_ref[start : start + n]
        idx2[1 : 2 * n : 2] = idx_alt[start : start + n]
        if state["p2"]:
            got2 = x.packed2(start, n)
            if got2 is not None:
                xg, lg = got2
                xc = np.zeros((bp, lx // 4), dtype=np.uint8)
                xc[:n] = xg
                xl = np.zeros(bp, dtype=np.int32)
                xl[:n] = lg
                return ("p2", xc, xl, idx2)
            state["p2"] = False
        got = x.packed(start, n) if state["packed"] else None
        if got is not None:
            xg, lg = got
            xc = np.zeros((bp, lx // 2), dtype=np.uint8)
            xc[:n] = xg
            xl = np.zeros(bp, dtype=np.int32)
            xl[:n] = lg
            return ("p4", xc, xl, idx2)
        state["packed"] = False
        xc = np.zeros((bp, lx), dtype=np.uint8)
        xc[:n] = x(start, n) if provider else x[start : start + n]
        return ("dense", xc, None, idx2)

    def dispatch(prepped):
        mode, xc, xl, idx2 = prepped
        if mode == "p2":
            return p2_entry(
                jnp.asarray(xc), jnp.asarray(xl), hap_dense(),
                jnp.asarray(idx2), lx=lx, ly=ly, interpret=interpret,
                unroll=unroll)
        if mode == "p4":
            if hp_dev is not None:
                return packed2_entry(
                    jnp.asarray(xc), jnp.asarray(xl), hp_dev[0], hp_dev[1],
                    jnp.asarray(idx2), lx=lx, ly=ly, interpret=interpret,
                    unroll=unroll)
            return packed_entry(
                jnp.asarray(xc), jnp.asarray(xl), hap_dense(),
                jnp.asarray(idx2), lx=lx, ly=ly, interpret=interpret,
                unroll=unroll)
        return entry(jnp.asarray(xc), hap_dense(), jnp.asarray(idx2),
                     lx=lx, ly=ly, interpret=interpret, unroll=unroll)

    depth = _prefetch_depth()
    if depth == 0 or len(spans) == 1:
        return [dispatch(prep(s)) for s in spans], spans

    from concurrent.futures import ThreadPoolExecutor

    workers = _inflight()
    results = [None] * len(spans)
    with ThreadPoolExecutor(max_workers=1) as prep_ex:
        preps = {}
        for i in range(min(depth, len(spans))):
            preps[i] = prep_ex.submit(prep, spans[i])

        def run(i):
            results[i] = dispatch(preps.pop(i).result())

        if workers == 1:
            for i in range(len(spans)):
                if (nxt := i + depth) < len(spans):
                    preps[nxt] = prep_ex.submit(prep, spans[nxt])
                run(i)
        else:
            with ThreadPoolExecutor(max_workers=workers) as disp_ex:
                pending = []
                for i in range(len(spans)):
                    if (nxt := i + depth) < len(spans):
                        preps[nxt] = prep_ex.submit(prep, spans[nxt])
                    pending.append(disp_ex.submit(run, i))
                    while len(pending) >= workers:
                        pending.pop(0).result()
                for f in pending:
                    f.result()
    return results, spans


def _pair_chunks(x, hap_mat, idx_ref, idx_alt, entry, unroll,
                 packed_entry=None, packed2_entry=None, p2_entry=None):
    """Chained-pair chunking (one lane per read): rows quantized to
    whole LANES groups."""
    return _chunked_pair_dispatch(
        x, hap_mat, idx_ref, idx_alt, entry, unroll, packed_entry,
        packed2_entry,
        bp_of=lambda n: max(_quantized_batch(2 * n) // 2, LANES),
        p2_entry=p2_entry)


def sw_calls_pair_chained_tpu(x, hap_mat: np.ndarray,
                              idx_ref: np.ndarray, idx_alt: np.ndarray,
                              unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Chained-lane flavor of sw_calls_pair_tpu (VARTRIX_CHAINED=1)."""
    if not vmem_fit(x.shape[1], hap_mat.shape[1], "v5", unroll):
        return sw_calls_pair_tpu(x, hap_mat, idx_ref, idx_alt, unroll)
    out = np.empty(x.shape[0], dtype=np.int8)
    results, spans = _pair_chunks(
        x, hap_mat, idx_ref, idx_alt, _sw_pair_chained_calls, unroll,
        packed_entry=_sw_pair_chained_calls_packed,
        packed2_entry=_sw_pair_chained_calls_packed2,
        p2_entry=_sw_pair_chained_calls_p2)
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[:n]
    return out


def sw_scores_pair_chained_tpu(x, hap_mat: np.ndarray,
                               idx_ref: np.ndarray, idx_alt: np.ndarray,
                               unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Chained-lane flavor of sw_scores_pair_tpu -> int32 [R, 2]."""
    if not vmem_fit(x.shape[1], hap_mat.shape[1], "v5", unroll):
        return sw_scores_pair_tpu(x, hap_mat, idx_ref, idx_alt, unroll)
    out = np.empty((x.shape[0], 2), dtype=np.int32)
    results, spans = _pair_chunks(x, hap_mat, idx_ref, idx_alt,
                                  _sw_pair_chained, unroll)
    for r, (s, n) in zip(results, spans):
        block = np.asarray(r)
        out[s : s + n, 0] = block[0, :n]
        out[s : s + n, 1] = block[1, :n]
    return out


sw_scores_batch_tpu_v2.pair_chained = sw_scores_pair_chained_tpu
sw_scores_batch_tpu_v2.pair_calls_chained = sw_calls_pair_chained_tpu


# ---------------------------------------------------------------------------
# v6: quad-chain kernel (k=4 corner packing — TWO reads per lane).
#
# Each lane scores TWO reads, each against its own (ref, alt) pair, all
# four problems chained along y: Y = r1ref ++ r1alt ++ r2ref ++ r2alt
# (each segment padded to ly). Issued diagonals per two pairs drop from
# 2*(lx+2*ly-1) [two v5 lanes] to lx+4*ly-1 (-13% at 152x208; useful
# fraction 73% -> 85%). The x tile SWITCHES from read 1 to read 2 at the
# j == 2*ly boundary: on those lx diagonals the substitution operand is
# row-selected between the two x tiles (cells at rows i <= d-2ly are in
# segment >= 2). Requires the three boundary windows [m*ly, m*ly+lx-1]
# to be disjoint in unroll-group units (quad_feasible) — true for the
# production shapes (lx quantum 16 <= ly quantum 32); callers fall back
# to v5 otherwise. Out block is [4, LANES].
# ---------------------------------------------------------------------------


def quad_feasible(lx: int, ly: int, unroll: int = UNROLL_DEFAULT) -> bool:
    """The three segment-boundary windows must occupy disjoint unroll
    groups so each group runs exactly one phase body."""
    u = unroll
    c1e = (ly + lx - 1) // u + 1
    c2s = (2 * ly) // u
    c2e = (2 * ly + lx - 1) // u + 1
    c3s = (3 * ly) // u
    # lx % 8: the x2 tile is a static sublane slice at row lx (int32
    # sublane groups are 8 rows); pipeline lx quantum is 16
    return c1e <= c2s and c2e <= c3s and lx % 8 == 0


def _sw_kernel_v6(x_ref, ybuf_ref, out_ref,
                  hm1_ref, hsm1_ref, hsm2_ref, e_ref, ms_ref,
                  b0_ref, b1_ref, b2_ref, b3_ref, *, lx: int, ly: int,
                  unroll: int = UNROLL_DEFAULT):
    """x [2*lx, 128] (rows [0,lx) = read 1, [lx,2lx) = read 2); ybuf
    [YB, 128] with ybuf[pad_top + lx + t] = Y[(4*ly-1) - t] (pad byte 1
    elsewhere); out [4, 128]. Recurrence identical to _sw_kernel_v4."""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    OMEGA = np.int32(GAP_OPEN)

    x1 = x_ref[0:lx, :]
    x2 = x_ref[lx : 2 * lx, :]
    zeros = x1 * np.int32(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0)
    row0 = iota == 0

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    ms_ref[:, :] = zeros + NEG
    b0_ref[:, :] = zeros
    b1_ref[:, :] = zeros
    b2_ref[:, :] = zeros
    b3_ref[:, :] = zeros

    pad_top = unroll - 1
    L = 4 * ly
    c1 = lx + L - 1 + pad_top
    n_grp = (lx + L + unroll - 1) // unroll
    u = unroll
    # phase edges in group units (disjoint by quad_feasible)
    c1s, c1e = ly // u, (ly + lx - 1) // u + 1
    c2s, c2e = (2 * ly) // u, (2 * ly + lx - 1) // u + 1
    c3s, c3e = (3 * ly) // u, (3 * ly + lx - 1) // u + 1

    def one_diag(d_off_base, k, x, h_m1, hs_m2, e, ms, rb=None):
        """rb: boundary row scalar (cross phases only) — same crossing
        kill as _sw_kernel_v5: fresh-start clamp for the diagonal
        predecessor, horizontal gap chain killed outright."""
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        if rb is not None:
            cross = iota == rb
            hs_m2 = jnp.where(cross, np.int32(0), hs_m2)
            e_n = jnp.where(cross, NEG, e_n)
        f_n = ms + GE
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        m_n = jnp.maximum(h_n + OMEGA, f_n)
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        ms_n = jnp.where(row0, NEG, pltpu.roll(m_n, 1, axis=0))
        return h_n, hs_n, e_n, ms_n

    def vanilla_body(x, best_ref):
        def body(p, _):
            base = c1 - u * p
            h_m1 = hm1_ref[:, :]
            hs_m1 = hsm1_ref[:, :]
            hs_m2 = hsm2_ref[:, :]
            e = e_ref[:, :]
            ms = ms_ref[:, :]
            hs = []
            for k in range(u):
                h, hsh, e, ms = one_diag(base, k, x, h_m1, hs_m2, e, ms)
                h_m1 = h
                hs_m2, hs_m1 = hs_m1, hsh
                hs.append(h)
            hm1_ref[:, :] = h_m1
            hsm1_ref[:, :] = hs_m1
            hsm2_ref[:, :] = hs_m2
            e_ref[:, :] = e
            ms_ref[:, :] = ms
            b = hs[0]
            for h in hs[1:]:
                b = jnp.maximum(b, h)
            best_ref[:, :] = jnp.maximum(best_ref[:, :], b)
            return 0

        return body

    def cross_body(j0, xa, xb, blo_ref, bhi_ref, switch):
        """Boundary column j0: rows i <= rb are in the higher segment.
        switch: substitution operand is row-selected xb/xa (the read
        changes at j0 == 2*ly); otherwise xa is used throughout."""
        def body(p, _):
            base = c1 - u * p
            d0 = u * p
            h_m1 = hm1_ref[:, :]
            hs_m1 = hsm1_ref[:, :]
            hs_m2 = hsm2_ref[:, :]
            e = e_ref[:, :]
            ms = ms_ref[:, :]
            hs_lo, hs_hi = [], []
            for k in range(u):
                rb = d0 + k - j0
                x = jnp.where(iota <= rb, xb, xa) if switch else xa
                h, hsh, e, ms = one_diag(base, k, x, h_m1, hs_m2, e, ms,
                                         rb=rb)
                h_m1 = h
                hs_m2, hs_m1 = hs_m1, hsh
                pmask = iota <= rb
                hs_lo.append(jnp.where(pmask, np.int32(0), h))
                hs_hi.append(jnp.where(pmask, h, np.int32(0)))
            hm1_ref[:, :] = h_m1
            hsm1_ref[:, :] = hs_m1
            hsm2_ref[:, :] = hs_m2
            e_ref[:, :] = e
            ms_ref[:, :] = ms
            for hs, ref in ((hs_lo, blo_ref), (hs_hi, bhi_ref)):
                b = hs[0]
                for h in hs[1:]:
                    b = jnp.maximum(b, h)
                ref[:, :] = jnp.maximum(ref[:, :], b)
            return 0

        return body

    jax.lax.fori_loop(0, c1s, vanilla_body(x1, b0_ref), 0)
    jax.lax.fori_loop(c1s, c1e, cross_body(ly, x1, x1, b0_ref, b1_ref,
                                           False), 0)
    jax.lax.fori_loop(c1e, c2s, vanilla_body(x1, b1_ref), 0)
    jax.lax.fori_loop(c2s, c2e, cross_body(2 * ly, x1, x2, b1_ref, b2_ref,
                                           True), 0)
    jax.lax.fori_loop(c2e, c3s, vanilla_body(x2, b2_ref), 0)
    jax.lax.fori_loop(c3s, c3e, cross_body(3 * ly, x2, x2, b2_ref, b3_ref,
                                           False), 0)
    jax.lax.fori_loop(c3e, n_grp, vanilla_body(x2, b3_ref), 0)
    out_ref[:, :] = jnp.concatenate(
        [jnp.max(b0_ref[:, :], axis=0, keepdims=True),
         jnp.max(b1_ref[:, :], axis=0, keepdims=True),
         jnp.max(b2_ref[:, :], axis=0, keepdims=True),
         jnp.max(b3_ref[:, :], axis=0, keepdims=True)], axis=0)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pallas_v6(x_t: jax.Array, ybuf_t: jax.Array, *, lx: int, ly: int,
                  interpret: bool, unroll: int = UNROLL_DEFAULT) -> jax.Array:
    B = x_t.shape[1]
    yb = ybuf_t.shape[0]
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel_v6, lx=lx, ly=ly, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * lx, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32) for _ in range(9)],
        cost_estimate=pl.CostEstimate(
            flops=2 * lx * (lx + 4 * ly) * LANES,
            bytes_accessed=(2 * lx + yb) * B * 4, transcendentals=0),
        interpret=interpret,
    )(x_t, ybuf_t)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_quad(x_u8: jax.Array, hap_mat: jax.Array, idx2: jax.Array,
                  *, lx: int, ly: int, interpret: bool,
                  unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Quad-chain entry: x [R, lx] uint8 with R EVEN (adjacent reads
    share a lane), idx2 [2R] interleaved (ref, alt) haplotype rows.
    Returns [2, R] int32 scores (same layout as _sw_pair_chained)."""
    R = x_u8.shape[0]
    R2 = R // 2
    pad_top = unroll - 1
    # rows [0,lx) = even reads, [lx,2lx) = odd reads, lane l = reads
    # (2l, 2l+1): a [R2, 2*lx] view of x transposed
    x_t = x_u8.astype(jnp.int32).reshape(R2, 2 * lx).T
    ych = hap_mat[idx2].reshape(R2, 4 * ly)  # r1ref++r1alt++r2ref++r2alt
    yrev = jnp.flip(ych, axis=1).astype(jnp.int32).T  # [4ly, R2]
    ybuf = jnp.full((pad_top + 2 * lx + 4 * ly, R2), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + 4 * ly].set(yrev)
    out = _sw_pallas_v6(x_t, ybuf, lx=lx, ly=ly, interpret=interpret,
                        unroll=unroll)  # [4, R2]
    return out.T.reshape(R, 2).T  # [2, R]: (ref, alt) per read


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_quad_calls(x_u8: jax.Array, hap_mat: jax.Array,
                        idx2: jax.Array, *, lx: int, ly: int,
                        interpret: bool,
                        unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Quad-chain kernel + fused on-device call reduction -> int8 [R]."""
    s = _sw_pair_quad(x_u8, hap_mat, idx2, lx=lx, ly=ly,
                      interpret=interpret, unroll=unroll)
    ref, alt = s[0], s[1]
    dropped = (ref < MIN_SCORE) & (alt < MIN_SCORE)
    code = jnp.where(ref > alt, 1, jnp.where(alt > ref, 2, 3))
    return jnp.where(dropped, 0, code).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_quad_calls_packed(xp: jax.Array, xlen: jax.Array,
                               hap_mat: jax.Array, idx2: jax.Array,
                               *, lx: int, ly: int, interpret: bool,
                               unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Packed-transfer flavor of _sw_pair_quad_calls."""
    x = _unpack4(xp, xlen, lx)
    return _sw_pair_quad_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                               interpret=interpret, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_quad_calls_packed2(xp: jax.Array, xlen: jax.Array,
                                hp: jax.Array, hlen: jax.Array,
                                idx2: jax.Array, *, lx: int, ly: int,
                                interpret: bool,
                                unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Reads AND haplotypes packed (hap pad byte 1)."""
    x = _unpack4(xp, xlen, lx)
    hap_mat = _unpack4(hp, hlen, ly, pad=1)
    return _sw_pair_quad_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                               interpret=interpret, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_pair_quad_calls_p2(xp: jax.Array, xlen: jax.Array,
                           hap_mat: jax.Array, idx2: jax.Array,
                           *, lx: int, ly: int, interpret: bool,
                           unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """2-bit read transfer flavor of _sw_pair_quad_calls."""
    x = _unpack2(xp, xlen, lx)
    return _sw_pair_quad_calls(x, hap_mat, idx2, lx=lx, ly=ly,
                               interpret=interpret, unroll=unroll)


def _quad_bp(n: int) -> int:
    """Quad batch quantization: power-of-two padded (>= 2*LANES, so
    lanes pair up) — tail chunks reuse log2-many compiled shapes across
    datasets — then rounded to 2*LANES so lanes = bp/2 stay whole lane
    groups even when _quantized_batch's cap (= a VARTRIX_CHUNK
    override) is not a power of two."""
    bp = max(_quantized_batch(2 * n) // 2, 2 * LANES)
    return -(-bp // (2 * LANES)) * (2 * LANES)


def _pair2_chunks(x, hap_mat, idx_ref, idx_alt, entry, unroll,
                  packed_entry=None, packed2_entry=None, p2_entry=None):
    """Quad-entry chunking (two reads per lane): see _quad_bp."""
    return _chunked_pair_dispatch(
        x, hap_mat, idx_ref, idx_alt, entry, unroll, packed_entry,
        packed2_entry, bp_of=_quad_bp, p2_entry=p2_entry)


def sw_calls_pair_quad_tpu(x, hap_mat: np.ndarray,
                           idx_ref: np.ndarray, idx_alt: np.ndarray,
                           unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Quad-chain flavor of sw_calls_pair_chained_tpu (VARTRIX_QUAD=1);
    falls back to the v5 chained path when the phase windows overlap or
    the 4-segment window buffer would exceed VMEM."""
    if (not quad_feasible(x.shape[1], hap_mat.shape[1], unroll)
            or not vmem_fit(x.shape[1], hap_mat.shape[1], "v6", unroll)):
        return sw_calls_pair_chained_tpu(x, hap_mat, idx_ref, idx_alt,
                                         unroll=unroll)
    out = np.empty(x.shape[0], dtype=np.int8)
    results, spans = _pair2_chunks(
        x, hap_mat, idx_ref, idx_alt, _sw_pair_quad_calls, unroll,
        packed_entry=_sw_pair_quad_calls_packed,
        packed2_entry=_sw_pair_quad_calls_packed2,
        p2_entry=_sw_pair_quad_calls_p2)
    for r, (s, n) in zip(results, spans):
        out[s : s + n] = np.asarray(r)[:n]
    return out


def sw_scores_pair_quad_tpu(x, hap_mat: np.ndarray,
                            idx_ref: np.ndarray, idx_alt: np.ndarray,
                            unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Quad-chain flavor of sw_scores_pair_chained_tpu -> int32 [R, 2]."""
    if (not quad_feasible(x.shape[1], hap_mat.shape[1], unroll)
            or not vmem_fit(x.shape[1], hap_mat.shape[1], "v6", unroll)):
        return sw_scores_pair_chained_tpu(x, hap_mat, idx_ref, idx_alt,
                                          unroll=unroll)
    out = np.empty((x.shape[0], 2), dtype=np.int32)
    results, spans = _pair2_chunks(x, hap_mat, idx_ref, idx_alt,
                                   _sw_pair_quad, unroll)
    for r, (s, n) in zip(results, spans):
        block = np.asarray(r)
        out[s : s + n, 0] = block[0, :n]
        out[s : s + n, 1] = block[1, :n]
    return out


sw_scores_batch_tpu_v2.pair_quad = sw_scores_pair_quad_tpu
sw_scores_batch_tpu_v2.pair_calls_quad = sw_calls_pair_quad_tpu


# ---------------------------------------------------------------------------
# v7: generalized NR-read chain (measurement harness for k beyond 4).
#
# NR reads per lane, 2*NR segments along y. NR=2 reproduces v6's
# schedule; NR=4 chains 8 segments (issued diagonals per 4 pairs:
# lx+8ly-1 vs 2*(lx+4ly-1) for two v6 lanes, -7.7% at 152x208 — the
# remaining bound). Kept out of the production dispatch until it
# measures a win (tools/bench_kernel_v7.py).
# ---------------------------------------------------------------------------


def chainN_feasible(lx: int, ly: int, nr: int,
                    unroll: int = UNROLL_DEFAULT) -> bool:
    """Every pair of consecutive boundary windows [m*ly, m*ly+lx-1],
    m = 1..2*nr-1, must occupy disjoint unroll-group ranges."""
    u = unroll
    if lx % 8 != 0:
        return False
    for m in range(1, 2 * nr - 1):
        if (m * ly + lx - 1) // u + 1 > ((m + 1) * ly) // u:
            return False
    return True


def _sw_kernel_v7(x_ref, ybuf_ref, out_ref, *refs, lx: int, ly: int,
                  nr: int, unroll: int = UNROLL_DEFAULT):
    """x [nr*lx, 128] (read r at rows [r*lx, (r+1)*lx)); ybuf [YB, 128]
    with ybuf[pad_top + lx + t] = Y[(2*nr*ly-1) - t]; out [2*nr, 128].
    refs: 5 state scratch + 2*nr best scratch tiles."""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    OMEGA = np.int32(GAP_OPEN)

    hm1_ref, hsm1_ref, hsm2_ref, e_ref, ms_ref = refs[:5]
    best_refs = refs[5 : 5 + 2 * nr]
    xt = [x_ref[r * lx : (r + 1) * lx, :] for r in range(nr)]
    zeros = xt[0] * np.int32(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0)
    row0 = iota == 0

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    ms_ref[:, :] = zeros + NEG
    for b in best_refs:
        b[:, :] = zeros

    pad_top = unroll - 1
    L = 2 * nr * ly
    c1 = lx + L - 1 + pad_top
    n_grp = (lx + L + unroll - 1) // unroll
    u = unroll

    def one_diag(d_off_base, k, x, h_m1, hs_m2, e, ms, rb=None):
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        if rb is not None:
            cross = iota == rb
            hs_m2 = jnp.where(cross, np.int32(0), hs_m2)
            e_n = jnp.where(cross, NEG, e_n)
        f_n = ms + GE
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        m_n = jnp.maximum(h_n + OMEGA, f_n)
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        ms_n = jnp.where(row0, NEG, pltpu.roll(m_n, 1, axis=0))
        return h_n, hs_n, e_n, ms_n

    def vanilla_body(x, best_ref):
        def body(p, _):
            base = c1 - u * p
            h_m1 = hm1_ref[:, :]
            hs_m1 = hsm1_ref[:, :]
            hs_m2 = hsm2_ref[:, :]
            e = e_ref[:, :]
            ms = ms_ref[:, :]
            hs = []
            for k in range(u):
                h, hsh, e, ms = one_diag(base, k, x, h_m1, hs_m2, e, ms)
                h_m1 = h
                hs_m2, hs_m1 = hs_m1, hsh
                hs.append(h)
            hm1_ref[:, :] = h_m1
            hsm1_ref[:, :] = hs_m1
            hsm2_ref[:, :] = hs_m2
            e_ref[:, :] = e
            ms_ref[:, :] = ms
            b = hs[0]
            for h in hs[1:]:
                b = jnp.maximum(b, h)
            best_ref[:, :] = jnp.maximum(best_ref[:, :], b)
            return 0

        return body

    def cross_body(j0, xa, xb, blo_ref, bhi_ref, switch):
        def body(p, _):
            base = c1 - u * p
            d0 = u * p
            h_m1 = hm1_ref[:, :]
            hs_m1 = hsm1_ref[:, :]
            hs_m2 = hsm2_ref[:, :]
            e = e_ref[:, :]
            ms = ms_ref[:, :]
            hs_lo, hs_hi = [], []
            for k in range(u):
                rb = d0 + k - j0
                x = jnp.where(iota <= rb, xb, xa) if switch else xa
                h, hsh, e, ms = one_diag(base, k, x, h_m1, hs_m2, e, ms,
                                         rb=rb)
                h_m1 = h
                hs_m2, hs_m1 = hs_m1, hsh
                pmask = iota <= rb
                hs_lo.append(jnp.where(pmask, np.int32(0), h))
                hs_hi.append(jnp.where(pmask, h, np.int32(0)))
            hm1_ref[:, :] = h_m1
            hsm1_ref[:, :] = hs_m1
            hsm2_ref[:, :] = hs_m2
            e_ref[:, :] = e
            ms_ref[:, :] = ms
            for hs, ref in ((hs_lo, blo_ref), (hs_hi, bhi_ref)):
                b = hs[0]
                for h in hs[1:]:
                    b = jnp.maximum(b, h)
                ref[:, :] = jnp.maximum(ref[:, :], b)
            return 0

        return body

    # schedule: vanilla segment 0, then (crossing m, vanilla segment m)
    # for m = 1..2*nr-1; window m spans groups [(m*ly)//u, edge(m))
    g = 0
    for m in range(1, 2 * nr):
        cs, ce = (m * ly) // u, (m * ly + lx - 1) // u + 1
        xa = xt[(m - 1) // 2]
        xb = xt[m // 2]
        jax.lax.fori_loop(g, cs, vanilla_body(xa, best_refs[m - 1]), 0)
        jax.lax.fori_loop(cs, ce, cross_body(m * ly, xa, xb,
                                             best_refs[m - 1], best_refs[m],
                                             xa is not xb), 0)
        g = ce
    jax.lax.fori_loop(g, n_grp, vanilla_body(xt[nr - 1],
                                             best_refs[2 * nr - 1]), 0)
    out_ref[:, :] = jnp.concatenate(
        [jnp.max(b[:, :], axis=0, keepdims=True) for b in best_refs],
        axis=0)


@functools.partial(jax.jit,
                   static_argnames=("lx", "ly", "nr", "interpret", "unroll"))
def _sw_pallas_v7(x_t: jax.Array, ybuf_t: jax.Array, *, lx: int, ly: int,
                  nr: int, interpret: bool,
                  unroll: int = UNROLL_DEFAULT) -> jax.Array:
    B = x_t.shape[1]
    yb = ybuf_t.shape[0]
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel_v7, lx=lx, ly=ly, nr=nr,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nr * lx, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * nr, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * nr, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32)
                        for _ in range(5 + 2 * nr)],
        cost_estimate=pl.CostEstimate(
            flops=2 * lx * (lx + 2 * nr * ly) * LANES,
            bytes_accessed=(nr * lx + yb) * B * 4, transcendentals=0),
        interpret=interpret,
    )(x_t, ybuf_t)


@functools.partial(jax.jit,
                   static_argnames=("lx", "ly", "nr", "interpret", "unroll"))
def _sw_pair_chainN(x_u8: jax.Array, hap_mat: jax.Array, idx2: jax.Array,
                    *, lx: int, ly: int, nr: int, interpret: bool,
                    unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Generalized chain entry: x [R, lx] uint8 with R % nr == 0, idx2
    [2R] interleaved (ref, alt) rows. Returns [2, R] int32 scores."""
    R = x_u8.shape[0]
    RL = R // nr
    pad_top = unroll - 1
    x_t = x_u8.astype(jnp.int32).reshape(RL, nr * lx).T
    ych = hap_mat[idx2].reshape(RL, 2 * nr * ly)
    yrev = jnp.flip(ych, axis=1).astype(jnp.int32).T
    ybuf = jnp.full((pad_top + 2 * lx + 2 * nr * ly, RL), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + 2 * nr * ly].set(yrev)
    out = _sw_pallas_v7(x_t, ybuf, lx=lx, ly=ly, nr=nr,
                        interpret=interpret, unroll=unroll)  # [2nr, RL]
    return out.T.reshape(R, 2).T


# ---------------------------------------------------------------------------
# Banded kernel: the chained-band DP on device (VERDICT r2 #4).
#
# The band arrives as per-read-row [jlo, jhi) column intervals computed on
# the host by the SAME construction the CPU banded aligner uses
# (native/swlib.cpp build_chained_band), so banded-on-TPU is exactly
# banded-on-CPU. Out-of-band cells read H=0 / E=NEG / F=NEG — the CPU
# implementation's boundary convention — enforced by masking the three
# carried states each diagonal (cells with band mask false can then never
# contribute to best, since best only merges masked h >= 0 values of
# in-band cells... masked h is 0 there, which is the local floor).
# ---------------------------------------------------------------------------


def _sw_kernel_v4_banded(x_ref, ybuf_ref, jlo_ref, jhi_ref, out_ref,
                         hm1_ref, hsm1_ref, hsm2_ref, e_ref, ms_ref,
                         best_ref, *, lx: int, ly: int,
                         unroll: int = UNROLL_DEFAULT):
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    OMEGA = np.int32(GAP_OPEN)

    x = x_ref[:, :]
    zeros = x * np.int32(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0)
    row0 = iota == 0
    jlo = jlo_ref[:, :]
    jhi = jhi_ref[:, :]

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    ms_ref[:, :] = zeros + NEG
    best_ref[:, :] = zeros

    pad_top = unroll - 1
    c1 = lx + ly - 1 + pad_top
    n_grp = (lx + ly + unroll - 1) // unroll

    def one_diag(d_off_base, d0, k, h_m1, hs_m2, e, ms):
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        jj = (d0 + k) - iota  # column index of each cell on this diagonal
        band = (jj >= jlo) & (jj < jhi)
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        f_n = ms + GE
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        h_n = jnp.where(band, h_n, np.int32(0))
        e_n = jnp.where(band, e_n, NEG)
        m_n = jnp.where(band, jnp.maximum(h_n + OMEGA, f_n), NEG)
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        ms_n = jnp.where(row0, NEG, pltpu.roll(m_n, 1, axis=0))
        return h_n, hs_n, e_n, ms_n

    def body(p, _):
        base = c1 - unroll * p
        d0 = unroll * p
        h_m1 = hm1_ref[:, :]
        hs_m1 = hsm1_ref[:, :]
        hs_m2 = hsm2_ref[:, :]
        e = e_ref[:, :]
        ms = ms_ref[:, :]
        hs = []
        for k in range(unroll):
            h, hsh, e, ms = one_diag(base, d0, k, h_m1, hs_m2, e, ms)
            h_m1 = h
            hs_m2, hs_m1 = hs_m1, hsh
            hs.append(h)
        hm1_ref[:, :] = h_m1
        hsm1_ref[:, :] = hs_m1
        hsm2_ref[:, :] = hs_m2
        e_ref[:, :] = e
        ms_ref[:, :] = ms
        b = hs[0]
        for h in hs[1:]:
            b = jnp.maximum(b, h)
        best_ref[:, :] = jnp.maximum(best_ref[:, :], b)
        return 0

    jax.lax.fori_loop(0, n_grp, body, 0)
    out_ref[:, :] = jnp.max(best_ref[:, :], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret", "unroll"))
def _sw_banded_pairs(x_u8: jax.Array, y_u8: jax.Array, jlo16: jax.Array,
                     jhi16: jax.Array, *, lx: int, ly: int, interpret: bool,
                     unroll: int = UNROLL_DEFAULT) -> jax.Array:
    """Banded entry: per-pair reads [B, lx] u8 (pad 0), haplotypes
    [B, ly] u8 (pad 1), per-row band bounds [B, lx] i16 -> [1, B] i32."""
    B = x_u8.shape[0]
    pad_top = unroll - 1
    x_t = x_u8.astype(jnp.int32).T
    yrev = jnp.flip(y_u8, axis=1).astype(jnp.int32).T
    ybuf = jnp.full((pad_top + 2 * lx + ly, B), 1, jnp.int32)
    ybuf = ybuf.at[pad_top + lx : pad_top + lx + ly].set(yrev)
    jlo_t = jlo16.astype(jnp.int32).T
    jhi_t = jhi16.astype(jnp.int32).T
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel_v4_banded, lx=lx, ly=ly,
                               unroll=unroll)
    yb = ybuf.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((yb, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32) for _ in range(6)],
        cost_estimate=pl.CostEstimate(
            flops=2 * lx * ly * LANES,
            bytes_accessed=(4 * lx + yb) * B * 4, transcendentals=0),
        interpret=interpret,
    )(x_t, ybuf, jlo_t, jhi_t)


def make_banded_tpu_scorer(n_threads: int = 1, k: int = 6, w: int = 20):
    """score_batch_fn(x, y) for --sw-mode banded on the TPU: band bounds
    from the native chained-band construction (host), DP on device.
    Exactly equal to the CPU banded scorer (cross-tested)."""
    from .sw_native import banded_bounds_batch_native

    def scorer(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        y = np.asarray(y)
        B, lx = x.shape
        ly = y.shape[1]
        interpret = not _on_tpu()
        xs = [bytes(row[row != 0]) for row in x]
        ys = [bytes(row[row != 1]) for row in y]
        # VMEM guard: banded blocks add two [lx, 128] bound planes to the
        # v4 footprint; oversized windows run on the native CPU banded
        # aligner (bit-identical — the TPU banded kernel is cross-tested
        # equal to it)
        rows_io = 4 * lx + (UNROLL_DEFAULT - 1 + 2 * lx + ly) + 1
        if (2 * rows_io + 6 * lx) * LANES * 4 > _vmem_budget():
            _warn_vmem_fallback(lx, ly)
            from .sw_native import banded_sw_chained_batch_native
            return np.asarray(
                banded_sw_chained_batch_native(xs, ys, n_threads),
                np.int32)
        out = np.empty(B, dtype=np.int32)
        results, spans = [], []
        start = 0
        while start < B:
            n = min(_chunk(), B - start)
            bp = _quantized_batch(n)
            bounds = banded_bounds_batch_native(
                xs[start : start + n], ys[start : start + n], lx,
                n_threads, k, w)
            if bounds is None:
                raise RuntimeError("libvartrixsw predates "
                                   "banded_bounds_batch; rebuild")
            jlo = np.zeros((bp, lx), np.int16)
            jhi = np.zeros((bp, lx), np.int16)
            jlo[:n], jhi[:n] = bounds
            xc = np.zeros((bp, lx), dtype=np.uint8)
            xc[:n] = x[start : start + n]
            yc = np.ones((bp, ly), dtype=np.uint8)
            yc[:n] = y[start : start + n]
            results.append(_sw_banded_pairs(
                jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(jlo),
                jnp.asarray(jhi), lx=lx, ly=ly, interpret=interpret))
            spans.append((start, n))
            start += n
        for r, (s, n) in zip(results, spans):
            out[s : s + n] = np.asarray(r)[0, :n]
        return out

    return scorer

def _pair_calls_chained_dispatch(x, hap_mat, idx_ref, idx_alt,
                                 unroll: int = UNROLL_DEFAULT):
    import os as _os
    # quad-chain (k=4 corner packing) measured +6% over v5 on-chip
    # (docs/KERNEL.md); falls back to v5 itself when infeasible.
    # The 4-bit packed read transfer (VARTRIX_PACK4) is handled inside
    # the chunk dispatchers when the read provider offers .packed.
    if _os.environ.get("VARTRIX_QUAD", "1") != "0":
        return sw_calls_pair_quad_tpu(x, hap_mat, idx_ref, idx_alt, unroll)
    return sw_calls_pair_chained_tpu(x, hap_mat, idx_ref, idx_alt, unroll)


def _pair_scores_chained_dispatch(x, hap_mat, idx_ref, idx_alt,
                                  unroll: int = UNROLL_DEFAULT):
    import os as _os
    if _os.environ.get("VARTRIX_QUAD", "1") != "0":
        return sw_scores_pair_quad_tpu(x, hap_mat, idx_ref, idx_alt, unroll)
    return sw_scores_pair_chained_tpu(x, hap_mat, idx_ref, idx_alt, unroll)


sw_scores_batch_tpu_v2.pair_calls_chained = _pair_calls_chained_dispatch
sw_scores_batch_tpu_v2.pair_chained = _pair_scores_chained_dispatch
