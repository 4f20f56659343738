"""A/B the fused score->call return path (VARTRIX_FUSED_CALLS) on TPU e2e.

Protocol mirrors bench.py: one warm-up dataset absorbs compile + relay
warm-up, then each arm is timed on its own FRESH dataset (the relay
caches identical computations). Arms alternate off/on twice to expose
run-to-run noise. Per-phase wall-clock goes to stderr at info level.
"""
import logging
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
        n_variants=100, n_cells=500, reads_per_variant=100, seed=3,
        spliced_frac=0.5))
    for tag, flag, seed in [("warmoff", "0", 0), ("warmon", "1", 0)]:
        os.environ["VARTRIX_FUSED_CALLS"] = flag
        _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
               "-c", warm["barcodes"], "-o", os.path.join(d, f"{tag}.mtx"),
               "--threads", nt, "--backend", "tpu"])
    print("warm-up done", flush=True)

    arms = [("off", "0", 31), ("on", "1", 32), ("off", "0", 33),
            ("on", "1", 34)]
    prior = os.environ.get("VARTRIX_FUSED_CALLS")
    try:
        for tag, flag, seed in arms:
            data = generate_dataset(os.path.join(d, f"t{seed}"), SynthConfig(
                n_chroms=4, chrom_len=200_000, n_variants=1000, n_cells=2000,
                reads_per_variant=500, seed=seed, spliced_frac=0.5))
            os.environ["VARTRIX_FUSED_CALLS"] = flag
            out = os.path.join(d, f"out_{tag}_{seed}.mtx")
            t0 = time.time()
            _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
                   "-c", data["barcodes"], "-o", out, "--threads", nt,
                   "--backend", "tpu", "--log-level", "info"])
            dt = time.time() - t0
            print(f"fused_calls={tag} seed={seed}: {data['n_reads']} reads "
                  f"in {dt:.2f}s -> {data['n_reads']/dt:.0f} reads/s",
                  flush=True)
    finally:
        if prior is None:
            os.environ.pop("VARTRIX_FUSED_CALLS", None)
        else:
            os.environ["VARTRIX_FUSED_CALLS"] = prior


if __name__ == "__main__":
    main()
