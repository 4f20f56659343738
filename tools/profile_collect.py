"""Profile collect_reads_fast at bench scale (VERDICT r3 #2).

Reproduces the bench's TIMED_CFG workload host-side only (no device),
then times each stage of the collect phase separately:

  decode -> lexsort -> cb_indices -> ub_ids -> join(searchsorted+flat)
  -> filter chain -> useful(multi-interval) -> metrics -> split

Run: VARTRIX_JAX_PLATFORMS=cpu python tools/profile_collect.py [n_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import tempfile

    from vartrix_tpu.core.fast_pipeline import (collect_reads_fast,
                                                _multi_interval_useful)
    from vartrix_tpu.core.pipeline import (PipelineArgs, prepare_variants)
    from vartrix_tpu.io.bam_native import ColumnarBam
    from vartrix_tpu.io.barcodes import load_barcodes
    from vartrix_tpu.io.vcf import read_vcf_records
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    TIMED_CFG = dict(n_chroms=4, chrom_len=200_000, n_variants=1000,
                     n_cells=2000, reads_per_variant=500, spliced_frac=0.5)
    d = tempfile.mkdtemp()
    data = generate_dataset(os.path.join(d, "p"), SynthConfig(
        seed=100, **TIMED_CFG))
    print(f"dataset: {data['n_reads']} reads", flush=True)

    t0 = time.time()
    cbam = ColumnarBam(data["bam"])
    print(f"decode: {time.time()-t0:.3f}s ({cbam.n} records)")

    barcodes = load_barcodes(data["barcodes"])
    recs = read_vcf_records(data["vcf"])
    args = PipelineArgs(use_umi=True)
    from vartrix_tpu.io.fasta import IndexedFasta
    works = prepare_variants(recs, IndexedFasta(data["fasta"]), args)

    for rep in range(reps):
        n = cbam.n
        t = {}

        t0 = time.time()
        order = np.lexsort((cbam.pos[:n], cbam.tid[:n]))
        tid_s = cbam.tid[order].astype(np.int64)
        pos_s = cbam.pos[order].astype(np.int64)
        key_s = (tid_s << 34) | (pos_s + (1 << 32))
        t["lexsort"] = time.time() - t0

        t0 = time.time()
        cb_idx = cbam.cb_indices(barcodes)
        t["cb_indices"] = time.time() - t0
        t0 = time.time()
        ub_id = cbam.ub_ids()
        t["ub_ids"] = time.time() - t0

        t0 = time.time()
        act = [i for i, w in enumerate(works) if not w.skipped]
        n_itv = np.diff(cbam.itv_off)
        max_span = int((cbam.ref_end[:n] - cbam.pos[:n]).max())
        v_tid = np.zeros(len(act), np.int64)
        for k, i in enumerate(act):
            v_tid[k] = cbam.tid_by_name[works[i].locus.chrom]
        v_start = np.array([works[i].locus.start for i in act], np.int64)
        v_end = np.array([works[i].locus.end for i in act], np.int64)
        lo = np.searchsorted(key_s, (v_tid << 34) | (v_start - max_span + (1 << 32)),
                             side="left")
        hi = np.searchsorted(key_s, (v_tid << 34) | (v_end + (1 << 32)),
                             side="left")
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
        t["join"] = time.time() - t0
        amp = total / max(n, 1)

        t0 = time.time()
        alive = cbam.ref_end[cand] > starts_f
        drop = alive & (cbam.mapq[cand] < args.mapq)
        alive &= ~drop
        t["filters_basic"] = time.time() - t0

        t0 = time.time()
        ni = n_itv[cand]
        useful = ni == 1
        multi = np.nonzero(alive & (ni > 1))[0]
        if len(multi):
            useful[multi] = _multi_interval_useful(
                cbam, cand[multi], starts_f[multi], ends_f[multi])
        alive &= useful
        t["useful"] = time.time() - t0

        t0 = time.time()
        cells_f = cb_idx[cand]
        alive &= ~(alive & (cells_f < 0))
        umis_f = ub_id[cand]
        alive &= ~(alive & (umis_f < 0))
        t["tag_gather"] = time.time() - t0

        t0 = time.time()
        sel = np.nonzero(alive)[0]
        surv_var = var_of[sel]
        surv_cand = cand[sel]
        surv_cells = cells_f[sel].astype(np.int32)
        surv_umis = umis_f[sel]
        bounds = np.searchsorted(surv_var, np.arange(len(act) + 1))
        outs = []
        for k in range(len(act)):
            a, b = bounds[k], bounds[k + 1]
            outs.append((surv_cand[a:b], surv_cells[a:b], surv_umis[a:b]))
        t["split"] = time.time() - t0

        tot = sum(t.values())
        print(f"rep{rep}: total {tot:.3f}s  candidates {total} "
              f"(amplification {amp:.1f}x, {len(multi)} multi-interval)")
        for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
            print(f"  {k:15s} {v:.3f}s ({100*v/tot:.0f}%)")

    # cross-check with the real function
    for rep in range(reps):
        t0 = time.time()
        collect_reads_fast(cbam, works, barcodes, args)
        print(f"collect_reads_fast rep{rep}: {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
