"""Multi-chip SPMD execution: variant/pair sharding over a device mesh.

The reference's only parallelism is a single-host rayon thread pool over
contiguous variant chunks (/root/reference/src/main.rs:250-254,279-291).
The TPU-native equivalent is data parallelism over alignment pairs on a
1-D `jax.sharding.Mesh`:

  * alignment pairs (read x haplotype-pair) are sharded on the batch axis
    across devices ("shard" axis);
  * each device scores its pairs (SW), computes call codes, and
    segment-sums partial (variant, cell) count blocks;
  * count blocks are linear in reads, so the merge is a single psum over
    the mesh — the collective rides ICI, and the result is identical to
    the reference's serial reduce;
  * metrics counters merge by the same psum.

Exactness does not depend on how pairs land on devices (counts are
order-free sums), matching the reference's own CSR-canonical test
semantics (src/main.rs:1232).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import device_agg

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_step_pallas(x_u8, hap_mat, idx_ref, idx_alt, rows, cells, valid,
                       *, n_rows, n_cells, lx, ly, interpret):
    """Per-device shard computation on the PRODUCTION kernel path: the
    QUAD-CHAIN Pallas wavefront with fused on-device call codes (the
    round-3 production dispatch, `.pair_calls_chained` routing quad v6)
    scores the shard's reads, then calls -> partial counts -> psum
    merge. Falls back to the v5 chained-pair kernel + separate call
    reduction exactly like the single-chip dispatcher when the quad
    phase windows overlap (quad_feasible) or VARTRIX_QUAD=0."""
    import os

    from ..ops.sw_pallas_v2 import (_sw_pair_chained, _sw_pair_quad_calls,
                                    quad_feasible)

    R = x_u8.shape[0]
    idx2 = jnp.stack([idx_ref, idx_alt], axis=1).reshape(2 * R)
    use_quad = (quad_feasible(lx, ly)
                and os.environ.get("VARTRIX_QUAD", "1") != "0"
                and R % 256 == 0)  # quad packs 2 reads/lane
    if use_quad:
        calls = _sw_pair_quad_calls(x_u8, hap_mat, idx2, lx=lx, ly=ly,
                                    interpret=interpret).astype(jnp.int32)
    else:
        scores = _sw_pair_chained(x_u8, hap_mat, idx2, lx=lx, ly=ly,
                                  interpret=interpret)
        calls = device_agg.calls_from_scores(scores[0], scores[1])
    counts = device_agg.count_block(calls, rows, cells, valid, n_rows, n_cells)
    counts = jax.lax.psum(counts, AXIS)
    n_reads = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), AXIS)
    return counts, n_reads


def build_sharded_step(mesh: Mesh, n_rows: int, n_cells: int):
    """Returns a jitted SPMD step over the Pallas compact protocol:

      step(x [B, Lx] uint8 (pad 0), hap_mat [H, Ly] uint8 (pad 1),
           idx_ref [B], idx_alt [B], rows [B], cells [B], valid [B])
        -> (counts [n_rows, n_cells, 4], n_reads scalar)

    Pair arrays are sharded on the batch axis; the unique-haplotype matrix
    is replicated; the count block psum-merges over ICI. B must split into
    per-device multiples of 128 lanes. This is the same kernel + transfer
    protocol the CLI --mesh-devices path runs (ops/sw_pallas_v2:make_mesh_scorer),
    composed with the on-device aggregation (core/device_agg)."""
    from jax.experimental.shard_map import shard_map

    from ..ops.sw_pallas import _on_tpu

    interpret = not _on_tpu()

    @functools.partial(jax.jit, static_argnames=("lx", "ly"))
    def jitted(x_u8, hap_mat, idx_ref, idx_alt, rows, cells, valid, *, lx, ly):
        fn = functools.partial(_local_step_pallas, n_rows=n_rows,
                               n_cells=n_cells, lx=lx, ly=ly,
                               interpret=interpret)
        sharded = shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(AXIS), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return sharded(x_u8, hap_mat, idx_ref, idx_alt, rows, cells, valid)

    def step(x_u8, hap_mat, idx_ref, idx_alt, rows, cells, valid):
        lx = int(x_u8.shape[1])
        ly = int(hap_mat.shape[1])
        args = [jnp.asarray(a) for a in
                (x_u8, idx_ref, idx_alt, rows, cells, valid)]
        sh = NamedSharding(mesh, P(AXIS))
        x_d = jax.device_put(args[0], sh)
        rest = [jax.device_put(a, sh) for a in args[1:]]
        hap_d = jax.device_put(jnp.asarray(hap_mat),
                               NamedSharding(mesh, P()))
        return jitted(x_d, hap_d, *rest, lx=lx, ly=ly)

    return step


def pad_to_multiple(arrs, multiple: int, pad_values):
    """Pad each array's leading dim to a common multiple; returns
    (padded arrays, original length)."""
    n = arrs[0].shape[0]
    target = ((n + multiple - 1) // multiple) * multiple if n else multiple
    out = []
    for a, pv in zip(arrs, pad_values):
        pad = target - a.shape[0]
        if pad:
            padding = np.full((pad,) + a.shape[1:], pv, dtype=a.dtype)
            a = np.concatenate([a, padding], axis=0)
        out.append(a)
    return out, n
