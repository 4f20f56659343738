"""A/B the dispatch chunk size (VARTRIX_CHUNK) on the TPU e2e.

With fused int8 calls + the quad kernel, the score phase measured 95%
transfer/dispatch through the axon relay (bench.py decomposition): ~31
dispatches per 500k reads at the default 32k-pair chunk, each paying a
relay round-trip. Larger chunks amortize that fixed cost. Protocol
mirrors tools/ab_pack4.py: warm-up dataset absorbs compile + relay
warm-up for every arm's shapes, then arms alternate on fresh datasets.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vartrix_tpu.driver import _main
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

ARMS = sys.argv[1:] or ["32768", "131072", "524288"]


def main():
    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        n_chroms=4, chrom_len=200_000, n_variants=1000, n_cells=2000,
        reads_per_variant=500, seed=3, spliced_frac=0.5))
    prior = os.environ.get("VARTRIX_CHUNK")
    try:
        for arm in ARMS:
            os.environ["VARTRIX_CHUNK"] = arm
            _main(["-v", warm["vcf"], "-b", warm["bam"], "-f",
                   warm["fasta"], "-c", warm["barcodes"], "-o",
                   os.path.join(d, f"warm_{arm}.mtx"), "--threads", nt,
                   "--backend", "tpu"])
            print(f"warm-up {arm} done", flush=True)
        seed = 60
        for rep in range(2):
            for arm in ARMS:
                seed += 1
                data = generate_dataset(
                    os.path.join(d, f"t{seed}"), SynthConfig(
                        n_chroms=4, chrom_len=200_000, n_variants=1000,
                        n_cells=2000, reads_per_variant=500, seed=seed,
                        spliced_frac=0.5))
                os.environ["VARTRIX_CHUNK"] = arm
                out = os.path.join(d, f"out_{arm}_{seed}.mtx")
                t0 = time.time()
                _main(["-v", data["vcf"], "-b", data["bam"], "-f",
                       data["fasta"], "-c", data["barcodes"], "-o", out,
                       "--threads", nt, "--backend", "tpu",
                       "--log-level", "info"])
                dt = time.time() - t0
                print(f"chunk={arm} seed={seed}: {data['n_reads']} reads "
                      f"in {dt:.2f}s -> {data['n_reads']/dt:.0f} reads/s",
                      flush=True)
    finally:
        if prior is None:
            os.environ.pop("VARTRIX_CHUNK", None)
        else:
            os.environ["VARTRIX_CHUNK"] = prior


if __name__ == "__main__":
    main()
