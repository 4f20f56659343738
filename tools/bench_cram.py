"""Native vs Python CRAM decode benchmark (VERDICT r2 #3).

Generates a synthetic dataset, writes it as reference-based CRAM (rANS
blocks, htslib-style), and times: (a) native BAM columnar decode
(baseline), (b) native CRAM decode -> columnar, (c) Python CRAM
transcode -> columnar. Target: CRAM within ~2x of BAM decode.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.bam_native import ColumnarBam, cram_decode_native
from vartrix_tpu.io.cram import write_cram
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset


def main(n_variants=2000, reads_per_variant=1000):
    d = tempfile.mkdtemp()
    data = generate_dataset(os.path.join(d, "s"), SynthConfig(
        n_chroms=8, chrom_len=200_000, n_variants=n_variants, n_cells=4000,
        reads_per_variant=reads_per_variant, seed=13, spliced_frac=0.5))
    print(f"reads: {data['n_reads']}, BAM {os.path.getsize(data['bam'])/1e6:.0f} MB")
    b = BamReader(data["bam"])
    cram = os.path.join(d, "s.cram")
    t0 = time.time()
    write_cram(cram, list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=data["fasta"], block_method="rans0")
    print(f"write_cram(rans0): {time.time()-t0:.1f}s, {os.path.getsize(cram)/1e6:.0f} MB")

    t0 = time.time()
    cb = ColumnarBam(data["bam"])
    bam_dt = time.time() - t0
    print(f"native BAM decode: {bam_dt:.2f}s ({cb.n/bam_dt/1e6:.2f} M rec/s)")

    t0 = time.time()
    stream = cram_decode_native(cram, data["fasta"])
    mid = time.time() - t0
    cc = ColumnarBam(cram, bam_bytes=stream)
    cram_dt = time.time() - t0
    print(f"native CRAM decode: {cram_dt:.2f}s (cram->bam {mid:.2f}s; "
          f"{cc.n/cram_dt/1e6:.2f} M rec/s) -> {cram_dt/bam_dt:.2f}x of BAM")
    assert cc.n == cb.n

    if os.environ.get("BENCH_CRAM_PY", "0") == "1":
        from vartrix_tpu.io.cram import transcode_to_bam
        t0 = time.time()
        tmp = os.path.join(d, "py.bam")
        transcode_to_bam(cram, tmp, data["fasta"])
        py_dt = time.time() - t0
        print(f"python transcode: {py_dt:.1f}s ({py_dt/cram_dt:.0f}x slower)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(n, r)
