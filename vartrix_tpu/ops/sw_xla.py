"""Pure-XLA batched Smith-Waterman (no Pallas).

A fully jittable column-scan formulation of the same affine-gap local SW
as ops/sw_pallas.py, usable on any backend (CPU/TPU) and inside
shard_map/vmap compositions. This is the portable device path used by the
multi-chip dry run and as a non-Pallas performance baseline; the Pallas
wavefront kernel is the optimized single-chip path.

The intra-column F dependency is resolved in closed form:
  F[i,j] = GE*i + max_{k<i}(Htmp[k,j] + GAP_OPEN - GE*k)
(an exclusive running max — exact because chaining F through a second
gap-open can never beat extending the first gap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH

NEG = np.int32(-(1 << 28))


def sw_scores_jax(x: jax.Array, y: jax.Array) -> jax.Array:
    """x int32 [B, Lx] (pad 0), y int32 [B, Ly] (pad 1) -> int32 [B]."""
    B, Lx = x.shape
    GOE = np.int32(GAP_OPEN + GAP_EXTEND)
    GE = np.int32(GAP_EXTEND)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, Lx), 1)
    a_base = np.int32(GAP_OPEN) - GE * ii

    def step(carry, ycol):
        H, E, best = carry
        s = jnp.where(x == ycol[:, None], np.int32(MATCH), np.int32(MISMATCH))
        E = jnp.maximum(H + GOE, E + GE)
        Hdiag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        Htmp = jnp.maximum(jnp.maximum(Hdiag + s, E), 0)
        A = Htmp + a_base
        cm = jax.lax.cummax(A, axis=1)
        F = jnp.pad(cm[:, :-1], ((0, 0), (1, 0)), constant_values=NEG) + GE * ii
        H = jnp.maximum(Htmp, F)
        best = jnp.maximum(best, jnp.max(H, axis=1))
        return (H, E, best), None

    init = (
        jnp.zeros((B, Lx), jnp.int32),
        jnp.full((B, Lx), NEG, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    (_, _, best), _ = jax.lax.scan(step, init, y.T)
    return best


def sw_scores_batch_xla(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Backend entry point matching sw_numpy.sw_scores_batch (uint8 in)."""
    out = jax.jit(sw_scores_jax)(
        jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32)
    )
    return np.asarray(out)
