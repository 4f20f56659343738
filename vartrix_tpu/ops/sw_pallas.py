"""Pallas TPU kernel: batched affine-gap local Smith-Waterman scoring.

The hot computation of the engine — what the reference does per read with
rust-bio's banded aligner (/root/reference/src/main.rs:898-901), redesigned
for the TPU's VPU:

  * The DP is swept along ANTI-DIAGONALS (wavefront): on diagonal d every
    cell (i, j=d-i) depends only on diagonals d-1 and d-2, so there is no
    intra-step dependency — no per-column max-scan is needed.
  * Layout: the BATCH rides the 128-wide lane axis (one alignment pair per
    lane), the read position i rides the sublane axis. All recurrence
    shifts are sublane shifts.
  * State is 5 rolling [Lx, 128] int32 tiles (H on d-1 and d-2, E, F on
    d-1, running best) held in VMEM for the whole sweep; the only memory
    traffic is the input sequences and one [1, 128] output row.
  * Scores are exact (full SW >= banded; verified equal to the reference's
    banded scores on all bundled goldens). Padding uses distinct sentinel
    bytes for reads (0) and haplotypes (1) so padded cells only ever see
    mismatches/negative transitions and cannot affect the max.

Gap convention (rust-bio): a gap of length L costs GAP_OPEN + L*GAP_EXTEND.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH

NEG = np.int32(-(1 << 28))
LANES = 128

# Persistent compilation cache: kernel compiles go through a remote helper
# in some TPU environments and can be slow/flaky — cache them across
# processes.
try:  # pragma: no cover
    import os as _os
    _cache_dir = _os.path.expanduser("~/.cache/jax_pallas")
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _sw_kernel(x_ref, y_ref, out_ref,
               yw_ref, hm1_ref, hm2_ref, e_ref, f_ref, best_ref,
               *, lx: int, ly: int):
    """One batch tile: x [lx, 128] read codes, y [lx+ly, 128] haplotype
    codes (PAD-extended), out [1, 128] best scores.

    DP state lives in six [lx, 128] VMEM scratch tiles mutated in place
    across the diagonal sweep (refs rather than fori_loop carries — scan
    carries trip Mosaic's layout unification on splat inits)."""
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)

    x = x_ref[:, :]
    zeros = x * np.int32(0)
    # mask selecting sublane 0 (the i=0 boundary row after a shift-down)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (lx, LANES), 0) == 0

    def shift_down(v, fill):
        """out[0, :] = fill, out[i, :] = v[i-1, :] (sublane shift).
        Circular roll + boundary-row select; Mosaic lowers the roll to
        native sublane rotates."""
        return jnp.where(row0, fill, pltpu.roll(v, 1, axis=0))

    yw_ref[:, :] = zeros + np.int32(1)  # PAD_Y byte
    hm1_ref[:, :] = zeros
    hm2_ref[:, :] = zeros
    e_ref[:, :] = zeros + NEG
    f_ref[:, :] = zeros + NEG
    best_ref[:, :] = zeros

    n_diag = lx + ly - 1

    def body(d, _):
        # slide the y window: w_d[i] = y[d-i]
        yw = shift_down(yw_ref[:, :], y_ref[pl.ds(d, 1), :])
        yw_ref[:, :] = yw
        s = jnp.where(x == yw, np.int32(MATCH), np.int32(MISMATCH))
        h_m1 = hm1_ref[:, :]
        # diagonal term: H(i-1, j-1) lives on d-2 at sublane i-1;
        # boundary H(-1, .) = 0 (local alignment)
        h_diag = shift_down(hm2_ref[:, :], np.int32(0)) + s
        # E: gap consuming y, from (i, j-1) on d-1 at sublane i
        e = jnp.maximum(h_m1 + GOE, e_ref[:, :] + GE)
        # F: gap consuming x, from (i-1, j) on d-1 at sublane i-1
        f = jnp.maximum(shift_down(h_m1, NEG) + GOE,
                        shift_down(f_ref[:, :], NEG) + GE)
        h = jnp.maximum(jnp.maximum(h_diag, e), jnp.maximum(f, 0))
        hm2_ref[:, :] = h_m1
        hm1_ref[:, :] = h
        e_ref[:, :] = e
        f_ref[:, :] = f
        best_ref[:, :] = jnp.maximum(best_ref[:, :], h)
        return 0

    jax.lax.fori_loop(0, n_diag, body, 0)
    out_ref[:, :] = jnp.max(best_ref[:, :], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("lx", "ly", "interpret"))
def _sw_pallas(x_t: jax.Array, y_t: jax.Array, *, lx: int, ly: int,
               interpret: bool) -> jax.Array:
    """x_t [lx, B] int32, y_t [lx+ly, B] int32, B multiple of 128.
    Returns [1, B] int32 scores."""
    B = x_t.shape[1]
    grid = (B // LANES,)
    kernel = functools.partial(_sw_kernel, lx=lx, ly=ly)
    flops_est = 2 * lx * ly * LANES
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lx, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((lx + ly, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((lx, LANES), jnp.int32) for _ in range(6)],
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=(2 * lx + ly) * B * 4, transcendentals=0
        ),
        interpret=interpret,
    )(x_t, y_t)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def sw_scores_batch_tpu(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Backend entry point matching sw_numpy.sw_scores_batch:
    x uint8 [B, Lx] (pad byte 0), y uint8 [B, Ly] (pad byte 1) -> int32 [B].

    Transposes to lane-major layout, pads the batch to a multiple of 128,
    and pads/extends y to the [Lx+Ly] window buffer the kernel consumes.
    Falls back to interpreter mode off-TPU (used by the CPU test suite).
    """
    B, lx = x.shape
    ly = y.shape[1]
    interpret = not _on_tpu()

    bp = ((B + LANES - 1) // LANES) * LANES
    x_t = np.zeros((lx, bp), dtype=np.int32)  # PAD_X byte 0
    x_t[:, :B] = x.T
    # y buffer: rows [0, ly) hold the haplotype, rows [ly, lx+ly) are PAD;
    # the kernel reads row d for d in [0, lx+ly-1)
    y_t = np.full((lx + ly, bp), 1, dtype=np.int32)  # PAD_Y byte 1
    y_t[:ly, :B] = y.T
    out = _sw_pallas(jnp.asarray(x_t), jnp.asarray(y_t), lx=lx, ly=ly,
                     interpret=interpret)
    return np.asarray(out)[0, :B]
