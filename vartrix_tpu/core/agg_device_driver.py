"""Driver-level on-device aggregation.

Takes the per-variant (cells, umis, scores) arrays the fast pipeline
produced, flattens them across variants, and runs the call + scatter-add
(+ UMI consensus) phase on the accelerator via core/device_agg.py. The
host contributes only dense integer group renumberings (np.unique) and
the final sparse-triplet emission.

Produces byte-identical matrices to core/agg_numpy.py (tested); this is
the north-star "on-device barcode x variant scatter-add with UMI-group
consensus" path, exposed behind --device-agg.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from . import device_agg
from .agg_numpy import _pack_shift


def aggregate_on_device(
    cells_l: List[np.ndarray],
    umis_l: List[np.ndarray],
    scores_l: List[np.ndarray],
    use_umi: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (rows, cols, ref_count, alt_count, unk_count) over all
    (variant, cell) groups that saw at least one filter-surviving read,
    sorted by (row, col). scores_l entries are [n, 2] int32 scores or
    [n] int8 fused call codes (already 0..3, same convention)."""
    n_reads = sum(len(c) for c in cells_l)
    if n_reads == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z, z
    rows = np.concatenate([np.full(len(c), i, np.int64)
                           for i, c in enumerate(cells_l)])
    cells = np.concatenate(cells_l).astype(np.int64)
    if all(s.ndim == 1 for s in scores_l):
        calls = np.concatenate(scores_l).astype(np.int32)
    else:
        from .agg_numpy import as_codes
        calls = np.concatenate(
            [as_codes(s) for s in scores_l]).astype(np.int32)
    valid = np.ones(n_reads, dtype=bool)

    csh = _pack_shift(cells, rows, 24)
    cell_key = rows << csh | cells
    cg_uniq, cg = np.unique(cell_key, return_inverse=True)
    n_cg = len(cg_uniq)

    if use_umi:
        umis = np.concatenate(umis_l).astype(np.int64)
        # compose from the DENSE cell-group index so the key fits int64
        # even for huge row counts
        ush = _pack_shift(umis, np.array([n_cg - 1], np.int64), 30)
        ug_key = (cg.astype(np.int64) << ush) | umis
        ug_uniq, ug = np.unique(ug_key, return_inverse=True)
        cell_of_group = (ug_uniq >> ush).astype(np.int32)
        counts3 = np.asarray(device_agg.umi_consensus_counts(
            calls, ug.astype(np.int32), cell_of_group,
            valid, len(ug_uniq), n_cg))
        # 'seen' channel comes from reads directly (a cell group exists
        # when any read survived the filters, even if later dropped)
        seen = np.asarray(device_agg.grouped_counts(
            calls, cg.astype(np.int32), valid, n_cg))[:, 0]
        ref_c, alt_c, unk_c = counts3[:, 0], counts3[:, 1], counts3[:, 2]
    else:
        counts4 = np.asarray(device_agg.grouped_counts(
            calls, cg.astype(np.int32), valid, n_cg))
        seen = counts4[:, 0]
        ref_c, alt_c, unk_c = counts4[:, 1], counts4[:, 2], counts4[:, 3]

    keep = seen > 0
    out_rows = (cg_uniq >> csh)[keep]
    out_cols = (cg_uniq & ((1 << csh) - 1))[keep]
    return (out_rows, out_cols, ref_c[keep].astype(np.int64),
            alt_c[keep].astype(np.int64), unk_c[keep].astype(np.int64))
