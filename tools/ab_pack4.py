"""A/B the 4-bit packed read transfer (VARTRIX_PACK4) on the TPU e2e.

With fused int8 call returns, h2d read bytes are the dominant remaining
score-phase transfer; packing ships 2 bases/byte. Protocol mirrors
tools/ab_fused_calls.py: warm-up dataset absorbs compile + relay warm-up
for BOTH arms' kernels, then arms alternate on fresh datasets.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vartrix_tpu.driver import _main
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset


def main():
    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        n_chroms=4, chrom_len=200_000, n_variants=200, n_cells=500,
        reads_per_variant=100, seed=3, spliced_frac=0.5))
    prior = os.environ.get("VARTRIX_PACK4")
    try:
        for tag, flag in (("warm_off", "0"), ("warm_on", "1")):
            os.environ["VARTRIX_PACK4"] = flag
            _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
                   "-c", warm["barcodes"], "-o",
                   os.path.join(d, f"{tag}.mtx"), "--threads", nt,
                   "--backend", "tpu"])
        print("warm-up done", flush=True)
        arms = [("off", "0", 51), ("on", "1", 52), ("off", "0", 53),
                ("on", "1", 54)]
        for tag, flag, seed in arms:
            data = generate_dataset(os.path.join(d, f"t{seed}"), SynthConfig(
                n_chroms=4, chrom_len=200_000, n_variants=1000, n_cells=2000,
                reads_per_variant=500, seed=seed, spliced_frac=0.5))
            os.environ["VARTRIX_PACK4"] = flag
            out = os.path.join(d, f"out_{tag}_{seed}.mtx")
            t0 = time.time()
            _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
                   "-c", data["barcodes"], "-o", out, "--threads", nt,
                   "--backend", "tpu", "--log-level", "info"])
            dt = time.time() - t0
            print(f"pack4={tag} seed={seed}: {data['n_reads']} reads in "
                  f"{dt:.2f}s -> {data['n_reads']/dt:.0f} reads/s", flush=True)
    finally:
        if prior is None:
            os.environ.pop("VARTRIX_PACK4", None)
        else:
            os.environ["VARTRIX_PACK4"] = prior


if __name__ == "__main__":
    main()
