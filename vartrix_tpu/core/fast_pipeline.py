"""Vectorized host pipeline over the native columnar BAM decode.

Same observable semantics as core/pipeline.py (which is the readable
reference implementation validated against the goldens), but all per-read
work is NumPy array operations over libgenomio's structure-of-arrays
buffers:

  * read<->variant join: searchsorted over coordinate-sorted positions
    with a max-span lower bound;
  * the 6-stage filter chain as boolean masks, with metrics counted in
    the reference's order (src/main.rs:829-894);
  * "useful" overlap: single-interval reads (no N in CIGAR) are useful
    iff they pass the htslib fetch overlap (proof: interval = [pos,
    ref_end), and pos < end => pos < end+1), so only multi-interval and
    empty-CIGAR reads need the interval walk;
  * sequence gather for device batches: one fancy-indexing gather from
    the decoded sequence pool into padded [B, Lx] matrices.

Equivalence with the Python path is enforced by tests on both bundled and
synthetic datasets.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..io.bam_native import ColumnarBam
from .pipeline import PipelineArgs, VariantWork

FLAG_SECSUP = 0x900
FLAG_DUP = 0x400


def _multi_interval_useful(cbam: ColumnarBam, idx: np.ndarray, start: int,
                           end: int) -> np.ndarray:
    """Interval-walk fallback for reads whose aligned span is split by N."""
    out = np.zeros(len(idx), dtype=bool)
    hi = end + 1  # inclusive end
    for k, i in enumerate(idx):
        a = cbam.itv_off[i] * 2
        b = cbam.itv_off[i + 1] * 2
        ivs = cbam.itv_pool[a:b]
        for t in range(0, len(ivs), 2):
            if ivs[t] < hi and ivs[t + 1] > start:
                out[k] = True
                break
    return out


def collect_reads_fast(
    cbam: ColumnarBam,
    works: List[VariantWork],
    cell_barcodes: Dict[bytes, int],
    args: PipelineArgs,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Fill per-variant metrics and return per-variant (read_idx, cells,
    umis) arrays for surviving reads."""
    n = cbam.n
    # stable coordinate order (coordinate-sorted files keep their order)
    order = np.lexsort((cbam.pos[:n], cbam.tid[:n])) if n else np.zeros(0, np.int64)
    tid_s = cbam.tid[order]
    pos_s = cbam.pos[order]
    end_s = cbam.ref_end[order]

    cb_idx = cbam.cb_indices(cell_barcodes)
    ub_id = cbam.ub_ids() if args.use_umi else None
    n_itv = np.diff(cbam.itv_off)

    max_span = int((end_s - pos_s).max()) if n else 1

    # per-tid slices in sorted order
    tid_lo = np.searchsorted(tid_s, np.arange(len(cbam.ref_names)), side="left")
    tid_hi = np.searchsorted(tid_s, np.arange(len(cbam.ref_names)), side="right")

    read_idx_out: List[np.ndarray] = []
    cells_out: List[np.ndarray] = []
    umis_out: List[np.ndarray] = []

    for w in works:
        if w.skipped:
            read_idx_out.append(np.zeros(0, np.int64))
            cells_out.append(np.zeros(0, np.int32))
            umis_out.append(np.zeros(0, np.int64))
            continue
        t = cbam.tid_by_name.get(w.locus.chrom)
        if t is None:
            raise KeyError(f"chromosome {w.locus.chrom} not in BAM header")
        s, e = w.locus.start, w.locus.end
        lo0, hi0 = int(tid_lo[t]), int(tid_hi[t])
        lo = lo0 + int(np.searchsorted(pos_s[lo0:hi0], s - max_span, side="left"))
        hi = lo0 + int(np.searchsorted(pos_s[lo0:hi0], e, side="left"))
        cand = order[lo:hi]
        # htslib fetch overlap: pos < e (by construction) and ref_end > s
        cand = cand[cbam.ref_end[cand] > s]
        m = w.metrics
        m.num_reads += len(cand)

        keep = cbam.mapq[cand] >= args.mapq
        m.num_low_mapq += int(len(cand) - keep.sum())
        cand = cand[keep]

        if args.primary:
            keep = (cbam.flag[cand] & FLAG_SECSUP) == 0
            m.num_non_primary += int(len(cand) - keep.sum())
            cand = cand[keep]
        if args.duplicates:
            keep = (cbam.flag[cand] & FLAG_DUP) == 0
            m.num_duplicates += int(len(cand) - keep.sum())
            cand = cand[keep]

        ni = n_itv[cand]
        useful = ni == 1  # single aligned interval == fetch overlap window
        multi = np.nonzero(ni > 1)[0]
        if len(multi):
            useful[multi] = _multi_interval_useful(cbam, cand[multi], s, e)
        m.num_not_useful += int(len(cand) - useful.sum())
        cand = cand[useful]

        cells = cb_idx[cand]
        keep = cells >= 0
        m.num_not_cell_bc += int(len(cand) - keep.sum())
        cand = cand[keep]
        cells = cells[keep]

        if args.use_umi:
            umis = ub_id[cand]
            keep = umis >= 0
            m.num_non_umi += int(len(cand) - keep.sum())
            cand = cand[keep]
            cells = cells[keep]
            umis = umis[keep]
        else:
            umis = np.ones(len(cand), dtype=np.int64)

        read_idx_out.append(cand)
        cells_out.append(cells.astype(np.int32))
        umis_out.append(umis)
    return read_idx_out, cells_out, umis_out


def gather_reads(cbam: ColumnarBam, read_ids: np.ndarray, lx: int) -> np.ndarray:
    """[B, lx] uint8 read matrix (pad byte 0) gathered from the seq pool."""
    starts = cbam.seq_off[read_ids]
    lens = cbam.seq_off[read_ids + 1] - starts
    cols = np.arange(lx, dtype=np.int64)
    idx = np.minimum(starts[:, None] + cols, len(cbam.seq_pool) - 1)
    out = cbam.seq_pool[idx]
    out[cols[None, :] >= lens[:, None]] = 0
    return out


def score_all_fast(
    cbam: ColumnarBam,
    works: List[VariantWork],
    read_idx: List[np.ndarray],
    score_batch_fn,
    lx_quantum: int = 64,
    ly_quantum: int = 64,
) -> List[np.ndarray]:
    """Batched scoring of every (read, ref_hap) and (read, alt_hap) pair,
    bucketed by quantized shapes; returns per-variant [n, 2] int32."""
    def q(v: int, quantum: int) -> int:
        return max(quantum, ((v + quantum - 1) // quantum) * quantum)

    results = [np.zeros((len(r), 2), dtype=np.int32) for r in read_idx]

    # flat task arrays; tasks appended as contiguous (variant, which)
    # blocks so scatter-back is a slice copy
    t_read, t_var, t_which = [], [], []
    blocks = []  # (variant, which, flat_start, count)
    cursor = 0
    for wi, (w, rids) in enumerate(zip(works, read_idx)):
        if len(rids) == 0:
            continue
        for which in (0, 1):
            hap = w.rref if which == 0 else w.alt_hap
            if len(hap) == 0:
                continue  # empty haplotype scores 0
            t_read.append(rids)
            t_var.append(np.full(len(rids), wi, np.int32))
            t_which.append(np.full(len(rids), which, np.int8))
            blocks.append((wi, which, cursor, len(rids)))
            cursor += len(rids)
    if not t_read:
        return results
    t_read = np.concatenate(t_read)
    t_var = np.concatenate(t_var)
    t_which = np.concatenate(t_which)
    n_tasks = len(t_read)

    hap_len_arr = np.array([[len(w.rref), len(w.alt_hap)] for w in works],
                           dtype=np.int64).reshape(len(works), 2)
    seq_lens = (cbam.seq_off[t_read + 1] - cbam.seq_off[t_read]).astype(np.int64)
    hap_lens = hap_len_arr[t_var, t_which.astype(np.int64)]
    qlx = np.maximum(lx_quantum, -(-seq_lens // lx_quantum) * lx_quantum)
    qly = np.maximum(ly_quantum, -(-hap_lens // ly_quantum) * ly_quantum)

    scores_flat = np.zeros(n_tasks, dtype=np.int32)
    keys = qlx * (1 << 32) + qly
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        lx = int(key >> 32)
        ly = int(key & 0xFFFFFFFF)
        x = gather_reads(cbam, t_read[sel], lx)
        # haplotype matrix: unique (variant, which) in this bucket
        hkeys = t_var[sel].astype(np.int64) * 2 + t_which[sel]
        uniq, inv = np.unique(hkeys, return_inverse=True)
        hap_mat = np.ones((len(uniq), ly), dtype=np.uint8)
        for u, hk in enumerate(uniq):
            w = works[int(hk) // 2]
            hap = w.rref if int(hk) % 2 == 0 else w.alt_hap
            hap_mat[u, : len(hap)] = np.frombuffer(hap, np.uint8)
        compact = getattr(score_batch_fn, "compact", None)
        if compact is not None:
            # compact device protocol: ship unique haps + indices, gather
            # and widen on device (minimizes host->device transfer)
            scores_flat[sel] = np.asarray(
                compact(x, hap_mat, inv.astype(np.int32)), dtype=np.int32)
        else:
            y = hap_mat[inv]
            scores_flat[sel] = np.asarray(score_batch_fn(x, y), dtype=np.int32)

    for wi, which, start, count in blocks:
        results[wi][:, which] = scores_flat[start : start + count]
    return results
