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
from ..ops.sw_xla import sw_scores_jax

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_step(x, y_ref, y_alt, rows, cells, valid, *, n_rows, n_cells):
    """Per-device shard computation: SW scores -> calls -> partial counts,
    then a psum merge across the mesh."""
    ref_scores = sw_scores_jax(x, y_ref)
    alt_scores = sw_scores_jax(x, y_alt)
    calls = device_agg.calls_from_scores(ref_scores, alt_scores)
    counts = device_agg.count_block(calls, rows, cells, valid, n_rows, n_cells)
    counts = jax.lax.psum(counts, AXIS)
    n_reads = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), AXIS)
    return counts, n_reads


def build_sharded_step(mesh: Mesh, n_rows: int, n_cells: int):
    """Returns a jitted SPMD step:

      step(x [B, Lx], y_ref [B, Ly], y_alt [B, Ly], rows [B], cells [B],
           valid [B]) -> (counts [n_rows, n_cells, 4], n_reads scalar)

    Inputs are sharded on the batch axis; the output count block is
    replicated (psum-merged). B must be divisible by the mesh size.
    """
    from jax.experimental.shard_map import shard_map

    fn = functools.partial(_local_step, n_rows=n_rows, n_cells=n_cells)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    jitted = jax.jit(sharded)

    def step(x, y_ref, y_alt, rows, cells, valid):
        args = [jnp.asarray(a) for a in (x, y_ref, y_alt, rows, cells, valid)]
        shardings = [NamedSharding(mesh, P(AXIS))] * 6
        args = [jax.device_put(a, s) for a, s in zip(args, shardings)]
        return jitted(*args)

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
