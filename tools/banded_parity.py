"""Banded-vs-full Smith-Waterman divergence measurement.

The reference scores reads with rust-bio's k-mer-banded local SW
(/root/reference/src/main.rs:898-901, k=6, w=20); this framework scores
full (unbanded) SW on the TPU. banded <= full always, and a difference on
EITHER haplotype score can flip a read call (ref>alt / alt>ref / tie), so
this tool quantifies, per workload tier:

  * score divergence rate (full != banded, either band construction);
  * call-flip rate: evaluate_scores(full_ref, full_alt) vs
    evaluate_scores(banded_ref, banded_alt) — the observable difference.

Usage: python tools/banded_parity.py [n_pairs_per_tier]
Writes a markdown table to stdout (paste into PARITY.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from vartrix_tpu.constants import MIN_SCORE
from vartrix_tpu.ops.sw_native import (banded_sw_batch_native,
                                       banded_sw_chained_batch_native,
                                       full_sw_batch_native)

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_pairs(tier: str, n: int, seed: int):
    """(reads, ref_haps, alt_haps): read sampled from ref or alt haplotype
    with tier-specific corruption. Hap length 201 (padding 100), reads 150."""
    rng = np.random.default_rng(seed)
    xs, yr, ya = [], [], []
    for i in range(n):
        ref = rng.choice(BASES, 201).astype(np.uint8)
        alt = ref.copy()
        alt[100] = BASES[(int(np.searchsorted(BASES, alt[100])) + 1) % 4]
        src = alt if i % 2 else ref
        s = int(rng.integers(0, 51))
        read = src[s : s + 150].copy()
        if tier == "clean":
            e = rng.random(150) < 0.01
            read[e] = rng.choice(BASES, int(e.sum()))
        elif tier == "indel8":
            d = int(rng.integers(1, 9))
            p = int(rng.integers(20, 120))
            if i % 4 < 2:
                read = np.concatenate([read[:p], read[p + d :], rng.choice(BASES, d)])[:150]
            else:
                read = np.concatenate([read[:p], rng.choice(BASES, d), read[p:]])[:150]
        elif tier == "indel40":
            d = int(rng.integers(21, 41))  # beyond the band half-width w=20
            p = int(rng.integers(30, 100))
            if i % 4 < 2:
                read = np.concatenate([read[:p], read[p + d :], rng.choice(BASES, d)])[:150]
            else:
                read = np.concatenate([read[:p], rng.choice(BASES, d), read[p:]])[:150]
        elif tier == "noisy20":
            e = rng.random(150) < 0.20  # few exact 6-mers survive
            read[e] = rng.choice(BASES, int(e.sum()))
        elif tier == "repeat":
            unit = rng.choice(BASES, int(rng.integers(2, 8)))
            ref = np.tile(unit, 201 // len(unit) + 1)[:201].astype(np.uint8)
            alt = ref.copy()
            alt[100] = BASES[(int(np.searchsorted(BASES, alt[100])) + 1) % 4]
            src = alt if i % 2 else ref
            read = np.tile(unit, 150 // len(unit) + 1)[:150].astype(np.uint8)
            e = rng.random(150) < 0.02
            read[e] = rng.choice(BASES, int(e.sum()))
        elif tier == "chimeric":
            other = rng.choice(BASES, 150).astype(np.uint8)
            cut = int(rng.integers(40, 110))
            read = np.concatenate([read[:cut], other[cut:]])
        elif tier == "random":
            read = rng.choice(BASES, 150).astype(np.uint8)
        xs.append(read.tobytes())
        yr.append(ref.tobytes())
        ya.append(alt.tobytes())
    return xs, yr, ya


def calls(ref_s, alt_s):
    """Vectorized evaluate_scores (src/main.rs:1019-1030): 0=dropped,
    1=ref, 2=alt, 3=unknown."""
    out = np.full(len(ref_s), 3, np.int8)
    out[(ref_s < MIN_SCORE) & (alt_s < MIN_SCORE)] = 0
    out[ref_s > alt_s] = 1
    out[alt_s > ref_s] = 2
    return out


def bundled_pairs():
    """Real (read, hap) pairs from the bundled scRNA dataset."""
    from vartrix_tpu.core.pipeline import (PipelineArgs, collect_reads,
                                           prepare_variants)
    from vartrix_tpu.io.bam import BamReader
    from vartrix_tpu.io.barcodes import load_barcodes
    from vartrix_tpu.io.fasta import IndexedFasta
    from vartrix_tpu.io.vcf import read_vcf_records

    T = "/root/reference/test"
    fasta = IndexedFasta(f"{T}/test.fa")
    works = prepare_variants(read_vcf_records(f"{T}/test.vcf"), fasta,
                             PipelineArgs())
    collect_reads(BamReader(f"{T}/test.bam"), works,
                  load_barcodes(f"{T}/barcodes.tsv"), PipelineArgs())
    xs, yr, ya = [], [], []
    for w in works:
        for seq in w.read_seqs:
            xs.append(seq)
            yr.append(w.rref)
            ya.append(w.alt_hap)
    return xs, yr, ya


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import os
    nt = os.cpu_count() or 1
    tiers = ["clean", "indel8", "indel40", "repeat", "noisy20", "chimeric",
             "random"]
    print(f"| tier | pairs | score div (union) | score div (chain) | "
          f"call flips (chain) | max |Δ| |")
    print("|---|---|---|---|---|---|")
    total_pairs = 0
    t_start = time.time()
    for tier in tiers:
        xs, yr, ya = make_pairs(tier, n, seed=hash(tier) % 2**31)
        rows = []
        for haps in (yr, ya):
            full = full_sw_batch_native(xs, haps, nt)
            union = banded_sw_batch_native(xs, haps, nt)
            chain = banded_sw_chained_batch_native(xs, haps, nt)
            assert (union <= full).all() and (chain <= full).all()
            rows.append((full, union, chain))
        (fr, ur, cr), (fa, ua, ca) = rows
        div_u = ((ur != fr) | (ua != fa)).mean()
        div_c = ((cr != fr) | (ca != fa)).mean()
        flips = (calls(fr, fa) != calls(cr, ca)).mean()
        mx = max((fr - cr).max(), (fa - ca).max())
        print(f"| {tier} | {2*n} | {div_u:.5f} | {div_c:.5f} | "
              f"{flips:.5f} | {mx} |")
        total_pairs += 2 * n
    # bundled real data
    xs, yr, ya = bundled_pairs()
    fr = full_sw_batch_native(xs, yr, nt)
    fa = full_sw_batch_native(xs, ya, nt)
    cr = banded_sw_chained_batch_native(xs, yr, nt)
    ca = banded_sw_chained_batch_native(xs, ya, nt)
    div = ((cr != fr) | (ca != fa)).mean()
    flips = (calls(fr, fa) != calls(cr, ca)).mean()
    print(f"| bundled scRNA | {2*len(xs)} | — | {div:.5f} | {flips:.5f} | "
          f"{max((fr-cr).max(), (fa-ca).max())} |")
    total_pairs += 2 * len(xs)
    print(f"\n{total_pairs} pairs in {time.time()-t_start:.0f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
