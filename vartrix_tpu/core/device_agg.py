"""Device-side call + aggregation: vectorized JAX versions of the host
logic in core/calls.py, shaped for SPMD execution.

Given per-read (ref_score, alt_score) plus (variant_row, cell_index)
sidecars, computes call codes and reduces them into dense per-(variant,
cell) count blocks with segment-sum — the on-device scatter-add the
north-star design calls for. Partial counts from different pair shards
merge by simple addition (psum across the mesh), because counts are
linear in reads.

UMI consensus runs on device too (`umi_consensus_counts` below):
per-(variant, cell, umi) calls are merged with segment-sums over dense
group keys and the exact integer 4*count >= 3*total threshold. The host
aggregator (core/agg_numpy.py) remains the default on relay-attached
TPUs — see BASELINE.md's --device-agg A/B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MIN_SCORE


def calls_from_scores(ref_scores: jax.Array, alt_scores: jax.Array) -> jax.Array:
    """Vectorized evaluate_scores (reference src/main.rs:1019-1030).
    Returns int32 codes: 0 = dropped, 1 = REF, 2 = ALT, 3 = UNKNOWN.
    (UNKNOWN is remapped from -1 to 3 so codes are one-hot friendly.)"""
    dropped = (ref_scores < MIN_SCORE) & (alt_scores < MIN_SCORE)
    code = jnp.where(
        ref_scores > alt_scores, 1, jnp.where(alt_scores > ref_scores, 2, 3)
    )
    return jnp.where(dropped, 0, code).astype(jnp.int32)


def count_block(
    calls: jax.Array,       # [N] int32 codes 0..3
    rows: jax.Array,        # [N] int32 variant row (block-local)
    cells: jax.Array,       # [N] int32 cell index
    valid: jax.Array,       # [N] bool (padding mask)
    n_rows: int,
    n_cells: int,
) -> jax.Array:
    """Dense [n_rows, n_cells, 4] counts of (seen, ref, alt, unk) per
    (variant, cell). Channel 0 counts every surviving-filter read (even
    MIN_SCORE-dropped ones) — needed to emit the reference's explicit
    zero entries in coverage/alt_frac modes."""
    onehot = jax.nn.one_hot(calls, 4, dtype=jnp.int32)
    seen = jnp.ones_like(calls)[:, None]
    feats = jnp.concatenate([seen, onehot[:, 1:]], axis=1)  # [N, 4]
    feats = jnp.where(valid[:, None], feats, 0)
    seg = rows * n_cells + cells
    flat = jax.ops.segment_sum(feats, seg, num_segments=n_rows * n_cells)
    return flat.reshape(n_rows, n_cells, 4)


def grouped_counts(
    calls: jax.Array,   # [N] int32 codes 0..3 (0 = dropped)
    gid: jax.Array,     # [N] int32 dense (variant, cell) group id
    valid: jax.Array,   # [N] bool
    n_groups: int,
) -> jax.Array:
    """[n_groups, 4] (seen, ref, alt, unk) counts per (variant, cell)
    group — the sparse-group flavor of count_block for the non-UMI path.
    Channel 0 counts every surviving-filter read (explicit-zero
    semantics); merge across shards by addition."""
    onehot = jax.nn.one_hot(calls, 4, dtype=jnp.int32)
    feats = jnp.concatenate([jnp.ones_like(calls)[:, None], onehot[:, 1:]], axis=1)
    feats = jnp.where(valid[:, None], feats, 0)
    return jax.ops.segment_sum(feats, gid, num_segments=n_groups)


def umi_consensus_counts(
    calls: jax.Array,          # [N] int32 codes 0..3 (0 = dropped)
    umi_group: jax.Array,      # [N] int32: dense id of this read's (variant, cell, umi) group
    cell_of_group: jax.Array,  # [G] int32: dense (variant, cell) id per umi group
    valid: jax.Array,          # [N] bool
    n_umi_groups: int,
    n_cell_groups: int,
) -> jax.Array:
    """On-device UMI-consensus aggregation (reference src/main.rs:1041-1088):

      1. segment-sum surviving call one-hots per (variant, cell, umi) group;
      2. call each UMI group REF/ALT when its fraction (unknowns in the
         denominator) >= 0.75, else UNKNOWN; groups with no surviving
         reads produce nothing;
      3. segment-sum the per-UMI calls per (variant, cell) group.

    The dense group ids are pure integer renumberings prepared on the host
    (np.unique); all arithmetic runs on device. Returns [n_cell_groups, 3]
    (ref, alt, unk) counts, mergeable across shards by addition.
    """
    onehot = jax.nn.one_hot(calls, 4, dtype=jnp.int32)[:, 1:]  # drop 'dropped'
    onehot = jnp.where(valid[:, None], onehot, 0)
    per_umi = jax.ops.segment_sum(onehot, umi_group, num_segments=n_umi_groups)
    ref, alt, unk = per_umi[:, 0], per_umi[:, 1], per_umi[:, 2]
    tot = ref + alt + unk
    has_reads = tot > 0
    # frac >= 0.75 as exact integer arithmetic: 4*count >= 3*total
    # (the reference compares f64 fractions, identical for integer counts)
    alt_called = 4 * alt >= 3 * tot
    ref_called = 4 * ref >= 3 * tot
    ucall = jnp.where(alt_called, 1, jnp.where(ref_called, 0, 2))
    # one_hot columns: 0 -> ref, 1 -> alt, 2 -> unk
    uonehot = jax.nn.one_hot(ucall, 3, dtype=jnp.int32)
    uonehot = jnp.where(has_reads[:, None], uonehot, 0)
    return jax.ops.segment_sum(uonehot, cell_of_group,
                               num_segments=n_cell_groups)


def consensus_values(counts: jax.Array) -> jax.Array:
    """[R, C, 4] counts -> [R, C] consensus values (0 = no entry):
    ref&alt -> 3, alt -> 2, ref -> 1 (reference src/main.rs:1111-1129)."""
    ref, alt = counts[..., 1], counts[..., 2]
    return jnp.where(
        (ref > 0) & (alt > 0), 3, jnp.where(alt > 0, 2, jnp.where(ref > 0, 1, 0))
    ).astype(jnp.float32)


def coverage_values(counts: jax.Array):
    """-> (alt_counts [R, C], ref_counts [R, C], has_entry [R, C])."""
    has_entry = counts[..., 0] > 0
    return (counts[..., 2].astype(jnp.float32),
            counts[..., 1].astype(jnp.float32), has_entry)


def alt_frac_values(counts: jax.Array):
    """-> (frac [R, C] with NaN where all reads dropped, has_entry)."""
    ref = counts[..., 1].astype(jnp.float32)
    alt = counts[..., 2].astype(jnp.float32)
    unk = counts[..., 3].astype(jnp.float32)
    denom = ref + alt + unk
    has_entry = counts[..., 0] > 0
    return alt / denom, has_entry  # 0/0 -> NaN, matching Rust f64
