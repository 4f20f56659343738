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

import os

import numpy as np

from ..io.bam_native import ColumnarBam
from ..utils.metrics import Metrics
from .pipeline import PipelineArgs, VariantWork

FLAG_SECSUP = 0x900
FLAG_DUP = 0x400


def _multi_interval_useful(cbam: ColumnarBam, idx: np.ndarray,
                           starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Interval test for reads whose aligned span is split by N, vectorized
    across all (candidate, interval) pairs: flatten every candidate's
    aligned-reference intervals, test overlap against the candidate's
    variant window ([start, end] INCLUSIVE, src/main.rs:794), and reduce
    per candidate with a bincount. Real 10x scRNA data is dominated by
    spliced (N-containing) reads, so this path must scale like the rest of
    the filter chain."""
    a = cbam.itv_off[idx].astype(np.int64)
    cnt = (cbam.itv_off[idx + 1] - cbam.itv_off[idx]).astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return np.zeros(len(idx), dtype=bool)
    owner = np.repeat(np.arange(len(idx), dtype=np.int64), cnt)
    cum = np.cumsum(cnt) - cnt
    flat = np.arange(total, dtype=np.int64) - np.repeat(cum, cnt) + np.repeat(a, cnt)
    iv_beg = cbam.itv_pool[flat * 2].astype(np.int64)
    iv_end = cbam.itv_pool[flat * 2 + 1].astype(np.int64)
    hit = (iv_beg <= ends[owner]) & (iv_end > starts[owner])
    return np.bincount(owner[hit], minlength=len(idx)) > 0


def collect_reads_fast(
    cbam: ColumnarBam,
    works: List[VariantWork],
    cell_barcodes: Dict[bytes, int],
    args: PipelineArgs,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Fill per-variant metrics and return per-variant (read_idx, cells,
    umis) arrays for surviving reads.

    Fully vectorized ACROSS variants: candidate ranges come from two
    searchsorted calls over a composite (tid, pos) sort key, the flat
    (variant, read) candidate list is materialized with repeat/cumsum
    indexing, the filter chain runs as boolean masks over that flat list,
    and per-variant metrics are bincounts. Scales to 100k+ variants
    without per-variant Python work."""
    n = cbam.n
    V = len(works)
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int32), np.zeros(0, np.int64))
    act = [i for i, w in enumerate(works) if not w.skipped]
    if n == 0 or not act:
        return ([empty[0]] * V, [empty[1]] * V, [empty[2]] * V)

    # stable coordinate order (coordinate-sorted files keep their order)
    order = np.lexsort((cbam.pos[:n], cbam.tid[:n]))
    tid_s = cbam.tid[order].astype(np.int64)
    pos_s = cbam.pos[order].astype(np.int64)
    key_s = (tid_s << 34) | (pos_s + (1 << 32))  # pos may be small/0

    cb_idx = cbam.cb_indices(cell_barcodes)
    ub_id = cbam.ub_ids() if args.use_umi else None
    n_itv = np.diff(cbam.itv_off)
    max_span = int((cbam.ref_end[:n] - cbam.pos[:n]).max())

    tid_map = cbam.tid_by_name
    v_tid = np.fromiter(
        (tid_map.get(works[i].locus.chrom, -1) for i in act), np.int64,
        count=len(act))
    if (v_tid < 0).any():
        bad = works[act[int(np.argmax(v_tid < 0))]].locus.chrom
        raise KeyError(f"chromosome {bad} not in BAM header")
    v_start = np.fromiter((works[i].locus.start for i in act), np.int64,
                          count=len(act))
    v_end = np.fromiter((works[i].locus.end for i in act), np.int64,
                        count=len(act))

    lo = np.searchsorted(key_s, (v_tid << 34) | (v_start - max_span + (1 << 32)),
                         side="left")
    hi = np.searchsorted(key_s, (v_tid << 34) | (v_end + (1 << 32)), side="left")
    counts = hi - lo
    total = int(counts.sum())
    var_of = np.repeat(np.arange(len(act)), counts)
    cum = np.zeros(len(act) + 1, np.int64)
    np.cumsum(counts, out=cum[1:])
    flat = (np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], counts)
            + np.repeat(lo, counts))
    cand = order[flat]
    starts_f = v_start[var_of]
    ends_f = v_end[var_of]

    def count_per_var(mask):
        return np.bincount(var_of[mask], minlength=len(act)).astype(np.int64)

    # htslib fetch overlap: pos < end (by the hi bound) and ref_end > start
    alive = cbam.ref_end[cand] > starts_f
    num_reads = count_per_var(alive)

    drop = alive & (cbam.mapq[cand] < args.mapq)
    num_low_mapq = count_per_var(drop)
    alive &= ~drop

    num_non_primary = np.zeros(len(act), np.int64)
    if args.primary:
        drop = alive & ((cbam.flag[cand] & FLAG_SECSUP) != 0)
        num_non_primary = count_per_var(drop)
        alive &= ~drop
    num_duplicates = np.zeros(len(act), np.int64)
    if args.duplicates:
        drop = alive & ((cbam.flag[cand] & FLAG_DUP) != 0)
        num_duplicates = count_per_var(drop)
        alive &= ~drop

    ni = n_itv[cand]
    useful = ni == 1  # single aligned interval == fetch overlap window
    multi = np.nonzero(alive & (ni > 1))[0]
    if len(multi):
        useful[multi] = _multi_interval_useful(
            cbam, cand[multi], starts_f[multi], ends_f[multi])
    drop = alive & ~useful
    num_not_useful = count_per_var(drop)
    alive &= useful

    cells_f = cb_idx[cand]
    drop = alive & (cells_f < 0)
    num_not_cell_bc = count_per_var(drop)
    alive &= ~drop

    num_non_umi = np.zeros(len(act), np.int64)
    if args.use_umi:
        umis_f = ub_id[cand]
        drop = alive & (umis_f < 0)
        num_non_umi = count_per_var(drop)
        alive &= ~drop
    else:
        umis_f = np.ones(total, dtype=np.int64)

    # per-variant metrics write-back: .tolist() batches the numpy-scalar
    # conversions and fresh Metrics are constructed directly (the +=
    # attribute walk per variant was ~0.2s at 100k variants); a second
    # collect over the same works (tests do this) still accumulates
    for i, nr, lm, npr, dup, ncb, nu, nn in zip(
            act, num_reads.tolist(), num_low_mapq.tolist(),
            num_non_primary.tolist(), num_duplicates.tolist(),
            num_not_cell_bc.tolist(), num_not_useful.tolist(),
            num_non_umi.tolist()):
        w = works[i]
        m = w._metrics
        if m is None:
            w._metrics = Metrics(num_reads=nr, num_low_mapq=lm,
                                 num_non_primary=npr, num_duplicates=dup,
                                 num_not_cell_bc=ncb, num_not_useful=nu,
                                 num_non_umi=nn)
        else:
            m.num_reads += nr
            m.num_low_mapq += lm
            m.num_non_primary += npr
            m.num_duplicates += dup
            m.num_not_cell_bc += ncb
            m.num_not_useful += nu
            m.num_non_umi += nn

    # split survivors back per variant (flat list is var-major, pos-sorted)
    sel = np.nonzero(alive)[0]
    surv_var = var_of[sel]
    surv_cand = cand[sel]
    surv_cells = cells_f[sel].astype(np.int32)
    surv_umis = umis_f[sel]
    bounds = np.searchsorted(surv_var, np.arange(len(act) + 1)).tolist()

    read_idx_out = [empty[0]] * V
    cells_out = [empty[1]] * V
    umis_out = [empty[2]] * V
    for k, i in enumerate(act):
        a, b = bounds[k], bounds[k + 1]
        read_idx_out[i] = surv_cand[a:b]
        cells_out[i] = surv_cells[a:b]
        umis_out[i] = surv_umis[a:b]
    return read_idx_out, cells_out, umis_out


def _read_provider(cbam: ColumnarBam, rows: np.ndarray, lx: int):
    """Read matrix for a device dispatch: either the materialized [n, lx]
    array, or (default) a chunk-callable with a .shape attribute so the
    dispatcher can gather chunk k+1 on host while chunk k computes on
    device, never materializing the whole bucket."""
    if os.environ.get("VARTRIX_STREAM_GATHER", "1") != "0":
        from ..io.bam_native import gather_padded_packed, native_available

        def x(start, n, rows=rows, lx=lx):
            return gather_reads(cbam, rows[start : start + n], lx)
        x.shape = (len(rows), lx)
        if native_available():
            # packed-transfer protocol: the dispatcher ships 4-bit codes
            # + lengths (half the host->device read bytes) and unpacks
            # on device; None (odd lx / foreign alphabet) falls back
            def xp(start, n, rows=rows, lx=lx):
                return gather_padded_packed(
                    cbam.seq_pool, cbam.seq_off,
                    rows[start : start + n], lx)
            x.packed = xp

            # 2-bit flavor (A/C/G/T only): quarters the read transfer;
            # declines per chunk on any other byte (N, '=', lowercase)
            from ..io.bam_native import gather_padded_packed2

            def xp2(start, n, rows=rows, lx=lx):
                return gather_padded_packed2(
                    cbam.seq_pool, cbam.seq_off,
                    rows[start : start + n], lx)
            x.packed2 = xp2
        return x
    return gather_reads(cbam, rows, lx)


def gather_reads(cbam: ColumnarBam, read_ids: np.ndarray, lx: int) -> np.ndarray:
    """[B, lx] uint8 read matrix (pad byte 0) gathered from the seq pool.

    Native threaded memcpy when available (the numpy fancy-index gather's
    [B, lx] index matrix dominated host time at ~1M pairs); numpy fallback
    keeps indices int32 when the pool allows."""
    from ..io.bam_native import gather_padded, native_available
    if native_available():
        out = gather_padded(cbam.seq_pool, cbam.seq_off, read_ids, lx)
        if out is not None:
            return out
    idt = np.int32 if len(cbam.seq_pool) < 2**31 - 1 else np.int64
    starts = cbam.seq_off[read_ids].astype(idt)
    lens = (cbam.seq_off[read_ids + 1] - cbam.seq_off[read_ids]).astype(idt)
    cols = np.arange(lx, dtype=idt)
    idx = np.minimum(starts[:, None] + cols, idt(len(cbam.seq_pool) - 1))
    out = cbam.seq_pool[idx]
    out[cols[None, :] >= lens[:, None]] = 0
    return out


def _score_all_pairs(
    cbam: ColumnarBam,
    works: List[VariantWork],
    read_idx: List[np.ndarray],
    pair_fn,
    lx_quantum: int = 16,
    ly_quantum: int = 32,
    codes: bool = False,
) -> List[np.ndarray]:
    """Read-pair scoring path: one task per (variant, read) carrying BOTH
    haplotype indices. Each read is gathered ONCE and shipped ONCE (the
    device repeats it against ref and alt), halving host gather volume and
    host->device read traffic vs the per-(read,hap) task layout. Empty
    haplotypes map to an all-pad row, which scores 0 exactly like the
    empty-sequence convention.

    With codes=True, pair_fn is a fused score->call entry returning ONE
    int8 call code per read (0/1/2/3); results are per-variant [n] int8
    arrays and the device return transfer is 8x smaller."""
    if codes:
        results = [np.zeros(len(r), dtype=np.int8) for r in read_idx]
    else:
        results = [np.zeros((len(r), 2), dtype=np.int32) for r in read_idx]
    t_read_l, blocks = [], []   # (variant, flat_start, count)
    cursor = 0
    act = []
    for wi, rids in enumerate(read_idx):
        if len(rids) == 0:
            continue
        t_read_l.append(rids)
        blocks.append((wi, cursor, len(rids)))
        act.append(wi)
        cursor += len(rids)
    if not t_read_l:
        return results
    t_read = np.concatenate(t_read_l)
    t_var = np.repeat(np.array(act, np.int64),
                      [len(read_idx[i]) for i in act])

    def q(v, quantum):
        return np.maximum(quantum, -(-v // quantum) * quantum)

    hap_len = np.array([max(len(w.rref), len(w.alt_hap)) for w in works],
                       dtype=np.int64)
    seq_lens = (cbam.seq_off[t_read + 1] - cbam.seq_off[t_read]).astype(np.int64)
    qlx = q(seq_lens, lx_quantum)
    qly = q(hap_len[t_var], ly_quantum)

    # one flat haplotype pool (row 2v = rref, 2v+1 = alt_hap); per-bucket
    # matrices come from a single padded gather — no per-variant Python in
    # the scoring path
    hap_pool = np.frombuffer(
        b"".join(b for w in works for b in (w.rref, w.alt_hap)), np.uint8)
    hap_off = np.zeros(2 * len(works) + 1, np.int64)
    np.cumsum([len(b) for w in works for b in (w.rref, w.alt_hap)],
              out=hap_off[1:])

    if codes:
        flat = np.zeros(len(t_read), dtype=np.int8)
    else:
        flat = np.zeros((len(t_read), 2), dtype=np.int32)
    keys = qlx * (1 << 32) + qly
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        lx = int(key >> 32)
        ly = int(key & 0xFFFFFFFF)
        uniq_v, v_inv = np.unique(t_var[sel], return_inverse=True)
        hap_ids = np.empty(2 * len(uniq_v), np.int64)
        hap_ids[0::2] = 2 * uniq_v
        hap_ids[1::2] = 2 * uniq_v + 1
        hap_mat = _gather_padded_pool(hap_pool, hap_off, hap_ids, ly,
                                      pad_byte=1)
        hap_mat = _quantize_hap_rows(hap_mat)
        hap_mat = _maybe_pack_haps(hap_pool, hap_off, hap_ids, ly, hap_mat)
        x = _read_provider(cbam, t_read[sel], lx)
        idx_ref = (2 * v_inv).astype(np.int32)
        idx_alt = (2 * v_inv + 1).astype(np.int32)
        flat[sel] = np.asarray(pair_fn(x, hap_mat, idx_ref, idx_alt),
                               dtype=flat.dtype)
    for wi, start, count in blocks:
        results[wi][...] = flat[start : start + count]
    return results


def _maybe_pack_haps(hap_pool, hap_off, hap_ids, ly, hap_mat):
    """Wrap the (already row-quantized) haplotype matrix in a PackedHaps
    when the packed transfer is on and the pool fits the BAM 16-symbol
    alphabet (lowercase ALT alleles decline and stay dense). The packed
    rep halves the per-bucket hap upload — at 100k-variant cohort scale
    the unique-hap matrix is the co-dominant score-phase transfer."""
    if os.environ.get("VARTRIX_PACK4", "1") == "0" or ly % 2:
        return hap_mat
    from ..io.bam_native import gather_padded_packed, native_available
    if not native_available():
        return hap_mat
    got = gather_padded_packed(hap_pool, hap_off, hap_ids, ly)
    if got is None:
        return hap_mat
    from ..ops.sw_pallas_v2 import PackedHaps
    hp, hl = got
    q = hap_mat.shape[0]
    hp2 = np.zeros((q, ly // 2), np.uint8)
    hp2[: len(hap_ids)] = hp
    hl2 = np.zeros(q, np.int32)
    hl2[: len(hap_ids)] = hl
    return PackedHaps(hp2, hl2, hap_mat)


def _quantize_hap_rows(hap_mat: np.ndarray) -> np.ndarray:
    """Pad the haplotype matrix to a power-of-two row count (min 256).
    The row count is workload-dependent (unique haplotypes per bucket),
    and it is an argument SHAPE of the jitted device entries — without
    quantization every new dataset recompiles the kernel (seconds
    through the relay; surfaced by the 100k-variant cohort bench). Pad
    rows are never indexed."""
    n = hap_mat.shape[0]
    q = 256
    while q < n:
        q *= 2
    if q == n:
        return hap_mat
    out = np.ones((q, hap_mat.shape[1]), dtype=np.uint8)
    out[:n] = hap_mat
    return out


def _gather_padded_pool(pool: np.ndarray, off: np.ndarray, ids: np.ndarray,
                        width: int, pad_byte: int) -> np.ndarray:
    """[n, width] uint8 gather from a flat var-length pool; rows truncated
    or padded with pad_byte. Native threaded memcpy when available (pad 0,
    then the pad byte is patched in — sequences never contain byte 0)."""
    from ..io.bam_native import gather_padded, native_available
    if native_available():
        out = gather_padded(pool, off, ids, width)
        if out is not None:
            if pad_byte:
                out[out == 0] = pad_byte
            return out
    lens = (off[ids + 1] - off[ids]).astype(np.int64)
    cols = np.arange(width, dtype=np.int64)
    idx = np.minimum(off[ids][:, None] + cols, max(len(pool) - 1, 0))
    out = pool[idx] if len(pool) else np.zeros((len(ids), width), np.uint8)
    out[cols[None, :] >= lens[:, None]] = pad_byte
    return out


def score_all_fast(
    cbam: ColumnarBam,
    works: List[VariantWork],
    read_idx: List[np.ndarray],
    score_batch_fn,
    lx_quantum: int = 16,
    ly_quantum: int = 32,
) -> List[np.ndarray]:
    """Batched scoring of every (read, ref_hap) and (read, alt_hap) pair,
    bucketed by quantized shapes; returns per-variant [n, 2] int32 score
    arrays — or per-variant [n] int8 CALL CODES when the backend offers a
    fused score->call pair entry (production TPU default; the aggregation
    layer accepts both)."""
    if os.environ.get("VARTRIX_PAIR", "1") != "0":
        # chained-pair kernel (corner packing) measured +12% on-chip over
        # the two-lane pair kernel (docs/KERNEL.md); VARTRIX_CHAINED=0
        # opts back into the two-lane layout
        suffix = ("_chained"
                  if os.environ.get("VARTRIX_CHAINED", "1") != "0" else "")
        calls_fn = getattr(score_batch_fn, "pair_calls" + suffix, None)
        if (calls_fn is not None
                and os.environ.get("VARTRIX_FUSED_CALLS", "1") != "0"):
            return _score_all_pairs(cbam, works, read_idx, calls_fn,
                                    lx_quantum, ly_quantum, codes=True)
        pair_fn = getattr(score_batch_fn, "pair" + suffix,
                          getattr(score_batch_fn, "pair", None))
        if pair_fn is not None:
            return _score_all_pairs(cbam, works, read_idx, pair_fn,
                                    lx_quantum, ly_quantum)
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
    use_compact2 = os.environ.get("VARTRIX_COMPACT2", "0") == "1"
    keys = qlx * (1 << 32) + qly
    for key in np.unique(keys):
        sel = np.nonzero(keys == key)[0]
        lx = int(key >> 32)
        ly = int(key & 0xFFFFFFFF)
        # haplotype matrix: unique (variant, which) in this bucket
        hkeys = t_var[sel].astype(np.int64) * 2 + t_which[sel]
        uniq, inv = np.unique(hkeys, return_inverse=True)
        hap_mat = np.ones((len(uniq), ly), dtype=np.uint8)
        for u, hk in enumerate(uniq):
            w = works[int(hk) // 2]
            hap = w.rref if int(hk) % 2 == 0 else w.alt_hap
            hap_mat[u, : len(hap)] = np.frombuffer(hap, np.uint8)
        hap_mat = _quantize_hap_rows(hap_mat)
        compact2 = getattr(score_batch_fn, "compact2", None)
        if not use_compact2:
            # default off: through the axon TPU relay the chunked per-pair
            # protocol wins (uploads pipeline with compute, and the device
            # row-gather of a large resident read matrix measured slower
            # than re-shipping chunks). On direct-attached TPUs the
            # deduplicated protocol halves read traffic — re-evaluate there.
            compact2 = None
        compact = getattr(score_batch_fn, "compact", None)
        if compact2 is not None:
            # fully-deduplicated device protocol: unique reads AND unique
            # haplotypes ship once; pair chunks carry only index vectors.
            # Every read appears in a ref task and an alt task, so this
            # halves read gather + transfer vs the per-pair protocol.
            uniq_reads, r_inv = np.unique(t_read[sel], return_inverse=True)
            x_mat = gather_reads(cbam, uniq_reads, lx)
            scores_flat[sel] = np.asarray(
                compact2(x_mat, r_inv.astype(np.int32), hap_mat,
                         inv.astype(np.int32)), dtype=np.int32)
        elif compact is not None:
            # compact device protocol: ship unique haps + indices, gather
            # and widen on device (minimizes host->device transfer)
            x = _read_provider(cbam, t_read[sel], lx)
            scores_flat[sel] = np.asarray(
                compact(x, hap_mat, inv.astype(np.int32)), dtype=np.int32)
        else:
            x = gather_reads(cbam, t_read[sel], lx)
            y = hap_mat[inv]
            scores_flat[sel] = np.asarray(score_batch_fn(x, y), dtype=np.int32)

    for wi, which, start, count in blocks:
        results[wi][:, which] = scores_flat[start : start + count]
    return results
