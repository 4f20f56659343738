"""Optimized Pallas SW kernel (v2 wrapper plumbing, v4 recurrence).

Same anti-diagonal wavefront as ops/sw_pallas.py with these optimizations
(each validated by on-chip ablation, docs/KERNEL.md):

  1. SINGLE-ROLL recurrence (v4): the kernel carries a pre-shifted copy
     of H alongside the unshifted one, so the vertical-gap F needs no
     shift at all — F(d) = max(shift(H(d-1)) + open, F(d-1) + extend) is
     computed directly from the carried shifted state, and the boundary
     value that wraps into row 0 is <= -6, which can never beat the
     local-alignment 0 floor (no row-0 select needed for F). One
     pltpu.roll per diagonal (producing the next shifted H) instead of
     two rolls + two selects.
  2. the per-diagonal y window is a dynamic sublane slice from a
     REVERSED, pad-extended y buffer (ybuf[t] = y[c+1-t]) instead of a
     rolling window carried between iterations — removing a loop-carried
     dependency (a roll-carried ys variant measured 12% SLOWER).
  3. eight diagonals per loop iteration: the six state tiles are
     loaded/stored once per group and the running-best merge amortizes
     8x (best-tracking measured ~12% of kernel time at unroll 2).

Exactness is identical to v1 (same recurrence, same padding argument);
parity is enforced by tests against the NumPy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH
from .sw_pallas import LANES, NEG, _on_tpu

# eight diagonals per state round-trip: measured fastest on-chip for the
# single-roll recurrence (unroll sweep in docs/KERNEL.md)
UNROLL_DEFAULT = 8


def _sw_kernel_v4(x_ref, ybuf_ref, out_ref,
                  hm1_ref, hsm1_ref, hsm2_ref, e_ref, f_ref, best_ref,
                  *, lx: int, ly: int, unroll: int = UNROLL_DEFAULT):
    """x [lx, 128]; ybuf [YB, 128] with ybuf[t] = y[c+1-t] (c = lx+ly-2),
    pad elsewhere; out [1, 128].

    Single-roll recurrence. State carried between diagonals:
      h_m1  = H(d-1)                   (unshifted; feeds E)
      hs_m1 = shift_down(H(d-1), 0)    (feeds F and becomes hs_m2)
      hs_m2 = shift_down(H(d-2), 0)    (feeds the match term)
    F needs no shift: F(d)[i] = max(H(d-1)[i-1]+GOE, F(d-1)[i]+GE), and
    shift_down(H)[0] = 0 makes F[0] <= -6 — never competitive with the
    local-alignment 0 floor, so no boundary select either."""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)

    x = x_ref[:, :]
    zeros = x * np.int32(0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0) == 0

    hm1_ref[:, :] = zeros
    hsm1_ref[:, :] = zeros
    hsm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    f_ref[:, :] = zeros + NEG
    best_ref[:, :] = zeros

    # window offset for diagonal d is (c1 + pad_top) - d; ybuf carries
    # `pad_top = unroll-1` extra leading pad rows so the over-covered
    # trailing diagonals of the last group still slice at offset >= 0
    # (their windows are all-pad: harmless)
    pad_top = unroll - 1
    c1 = lx + ly - 1 + pad_top
    n_grp = (lx + ly + unroll - 1) // unroll  # covers diagonals 0..lx+ly-2

    def one_diag(d_off_base, k, h_m1, hs_m1, hs_m2, e, f):
        """Compute diagonal with window offset (d_off_base - k); inputs
        are the previous diagonals' register values."""
        ys = ybuf_ref[pl.ds(d_off_base - k, lx), :]
        s = jnp.where(x == ys, np.int32(MATCH), np.int32(MISMATCH))
        e_n = jnp.maximum(h_m1 + GOE, e + GE)
        f_n = jnp.maximum(hs_m1 + GOE, f + GE)
        h_n = jnp.maximum(jnp.maximum(hs_m2 + s, e_n),
                          jnp.maximum(f_n, 0))
        hs_n = jnp.where(row0, np.int32(0), pltpu.roll(h_n, 1, axis=0))
        return h_n, hs_n, e_n, f_n

    def body(p, _):
        # group of `unroll` diagonals starting at d = unroll*p;
        # state tiles are loaded/stored once per group
        base = c1 - unroll * p
        h_m1 = hm1_ref[:, :]
        hs_m1 = hsm1_ref[:, :]
        hs_m2 = hsm2_ref[:, :]
        e = e_ref[:, :]
        f = f_ref[:, :]
        hs = []
        for k in range(unroll):
            h, hsh, e, f = one_diag(base, k, h_m1, hs_m1, hs_m2, e, f)
            h_m1 = h
            hs_m2, hs_m1 = hs_m1, hsh
            hs.append(h)
        hm1_ref[:, :] = h_m1
        hsm1_ref[:, :] = hs_m1
        hsm2_ref[:, :] = hs_m2
        e_ref[:, :] = e
        f_ref[:, :] = f
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


CHUNK = 32768  # fixed batch chunk so compiled shapes are workload-independent


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
    interpret = not _on_tpu()
    x_dev = jnp.asarray(x_mat)
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty(B, dtype=np.int32)
    results, spans = [], []
    start = 0
    while start < B:
        n = min(CHUNK, B - start)
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
    interpret = not _on_tpu()
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty((R, 2), dtype=np.int32)
    results, spans = [], []
    half = CHUNK // 2
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
    interpret = not _on_tpu()
    hap_dev = jnp.asarray(hap_mat)
    out = np.empty(B, dtype=np.int32)
    results, spans = [], []
    start = 0
    while start < B:
        n = min(CHUNK, B - start)
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
    return min(b, CHUNK)


def sw_scores_batch_tpu_v2(x: np.ndarray, y: np.ndarray,
                           unroll: int = UNROLL_DEFAULT) -> np.ndarray:
    """Backend entry point (uint8 [B, Lx] / [B, Ly] -> int32 [B]).

    Batches are processed in fixed-size chunks (pow2-padded tail) so the
    set of compiled kernel shapes is bounded regardless of workload."""
    B, lx = x.shape
    ly = y.shape[1]
    interpret = not _on_tpu()
    out = np.empty(B, dtype=np.int32)
    start = 0
    results = []
    spans = []
    while start < B:
        n = min(CHUNK, B - start)
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

    def scorer(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # plain entry: chunk so the replicated per-chunk hap matrix stays
        # bounded (<= CHUNK x ly per device) and compiled shapes are
        # workload-independent, like the non-mesh path
        B = x.shape[0]
        out = np.empty(B, dtype=np.int32)
        for s in range(0, max(B, 1), CHUNK):
            cn = min(CHUNK, B - s)
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
        hap_dev = jnp.asarray(hap_mat)
        out = np.empty(B, dtype=np.int32)
        results, spans = [], []
        start = 0
        while start < B:
            cn = min(CHUNK, B - start)
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

    scorer.compact = compact
    scorer.mesh = mesh
    return scorer
