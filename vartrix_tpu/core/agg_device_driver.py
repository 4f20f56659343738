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


def aggregate_on_device(
    cells_l: List[np.ndarray],
    umis_l: List[np.ndarray],
    scores_l: List[np.ndarray],
    use_umi: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (rows, cols, ref_count, alt_count, unk_count) over all
    (variant, cell) groups that saw at least one filter-surviving read,
    sorted by (row, col)."""
    n_reads = sum(len(c) for c in cells_l)
    if n_reads == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z, z
    rows = np.concatenate([np.full(len(c), i, np.int64)
                           for i, c in enumerate(cells_l)])
    cells = np.concatenate(cells_l).astype(np.int64)
    scores = np.concatenate(scores_l, axis=0)
    ref_s = np.ascontiguousarray(scores[:, 0])
    alt_s = np.ascontiguousarray(scores[:, 1])

    calls = device_agg.calls_from_scores(ref_s, alt_s)
    valid = np.ones(n_reads, dtype=bool)

    cell_key = rows << 24 | cells  # cells < 2^24
    cg_uniq, cg = np.unique(cell_key, return_inverse=True)
    n_cg = len(cg_uniq)

    if use_umi:
        umis = np.concatenate(umis_l).astype(np.int64)
        # compose from the DENSE cell-group index (< 2^32) so the key
        # fits int64 even for huge row counts
        ug_key = (cg.astype(np.int64) << 30) | umis  # per-file umi ids < 2^30
        ug_uniq, ug = np.unique(ug_key, return_inverse=True)
        cell_of_group = (ug_uniq >> 30).astype(np.int32)
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
    out_rows = (cg_uniq >> 24)[keep]
    out_cols = (cg_uniq & ((1 << 24) - 1))[keep]
    return (out_rows, out_cols, ref_c[keep].astype(np.int64),
            alt_c[keep].astype(np.int64), unk_c[keep].astype(np.int64))
