"""Multi-host / multi-process distribution.

The distribution unit is a contiguous range of variant rows — the same
sharding the reference applies across rayon threads
(/root/reference/src/main.rs:250-254), lifted to processes/hosts. Because
shards own disjoint matrix rows, merging is pure concatenation of sparse
triplets; no reduction semantics are needed and the result is
placement-invariant (CSR-canonical equality with a single-process run).

Two operating modes:

  * Explicit sharding (works anywhere, incl. schedulers with no fabric):
    `vartrix --num-shards N --shard-index i` computes rows
    [chunk*i, chunk*(i+1)) and writes a PARTIAL matrix — a valid
    MatrixMarket file with full dimensions but only the shard's entries.
    `vartrix-merge out.mtx part0.mtx part1.mtx ...` concatenates them.

  * jax.distributed (TPU pods): initialize() then shard by process index
    automatically; shard outputs land per-process and process 0 merges.

Within a process, device-level scaling uses parallel/mesh.py (pair
sharding + psum count merge) — the two compose: hosts split rows, the
local mesh splits each row's alignment pairs.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

log = logging.getLogger("vartrix")


def shard_range(num_vars: int, num_shards: int, shard_index: int) -> Tuple[int, int]:
    """Contiguous row range for a shard, using the reference's chunking
    rule (chunk = max(num_vars // num_shards, 1))."""
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard index {shard_index} outside [0, {num_shards})")
    chunk = max(num_vars // num_shards, 1)
    lo = min(chunk * shard_index, num_vars)
    hi = num_vars if shard_index == num_shards - 1 else min(chunk * (shard_index + 1), num_vars)
    return lo, hi


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed (TPU pod); returns (process_id,
    num_processes). With no arguments, relies on the TPU environment's
    auto-detection."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def merge_partials(out_path: str, partial_paths: List[str]) -> None:
    """Concatenate partial MatrixMarket files (full dims, disjoint rows)
    into one. Validates consistent dimensions."""
    from ..io.matrix_market import TriMat, read_matrix_market, write_matrix_market

    mats = [read_matrix_market(p) for p in partial_paths]
    shape = mats[0].shape
    for p, m in zip(partial_paths, mats):
        if m.shape != shape:
            raise ValueError(f"{p}: shape {m.shape} != {shape}")
    out = TriMat(shape)
    for m in mats:
        out.add_triplets(m.rows, m.cols, m.data)
    write_matrix_market(out_path, out)
    log.info("Merged %d partial matrices (%d entries) into %s",
             len(mats), out.nnz(), out_path)


def merge_main(argv: Optional[List[str]] = None) -> None:
    """CLI: vartrix-merge OUT PARTIAL [PARTIAL ...]"""
    import argparse

    p = argparse.ArgumentParser(
        prog="vartrix-merge",
        description="Merge partial matrices from sharded vartrix runs")
    p.add_argument("out", help="Merged output .mtx")
    p.add_argument("partials", nargs="+", help="Partial .mtx files")
    args = p.parse_args(argv)
    merge_partials(args.out, args.partials)


def gather_triplets(matrix, process_index: int, process_count: int):
    """Merge per-process partial TriMats (disjoint rows) into every
    process via process_allgather over padded fixed-size buffers.
    Indices travel as int64 and values as float64 (exact, incl. NaN);
    the merge is bulk array insertion — no per-triplet Python work."""
    import numpy as np
    from jax.experimental import multihost_utils

    from ..io.matrix_market import TriMat

    n_local = matrix.nnz()
    counts = np.asarray(multihost_utils.process_allgather(
        np.array([n_local], dtype=np.int64))).reshape(process_count)
    max_n = int(counts.max()) if counts.size else 0
    idx = np.zeros((2, max_n), dtype=np.int64)
    idx[0, :n_local] = matrix.rows
    idx[1, :n_local] = matrix.cols
    dat = np.zeros(max_n, dtype=np.float64)
    dat[:n_local] = matrix.data
    g_idx = np.asarray(multihost_utils.process_allgather(idx)).reshape(
        process_count, 2, max_n)
    g_dat = np.asarray(multihost_utils.process_allgather(dat)).reshape(
        process_count, max_n)
    merged = TriMat(matrix.shape)
    for p in range(process_count):
        n = int(counts[p])
        merged.add_triplets(g_idx[p, 0, :n], g_idx[p, 1, :n], g_dat[p, :n])
    return merged


def gather_metrics(metrics, process_count: int):
    """Sum Metrics counters across processes (psum-equivalent gather)."""
    import numpy as np
    from jax.experimental import multihost_utils

    from ..utils.metrics import Metrics

    keys = sorted(metrics.as_dict())
    vec = np.array([metrics.as_dict()[k] for k in keys], dtype=np.int64)
    allv = multihost_utils.process_allgather(vec)
    total = np.asarray(allv).reshape(process_count, -1).sum(axis=0)
    merged = Metrics()
    for k, v in zip(keys, total):
        setattr(merged, k, int(v))
    return merged
