"""A/B: --device-agg vs host aggregation through the relay (VERDICT r3 #4).

Runs the bench's 500k-read workload e2e on the TPU backend with and
without device aggregation, interleaved rep-by-rep on the same fresh
dataset (same weather window per pair), >=3 reps. Reports per-rep
aggregate-phase and total times plus medians/mins.

Run: python tools/ab_device_agg.py [reps]
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from vartrix_tpu.driver import _main
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    TIMED_CFG = dict(n_chroms=4, chrom_len=200_000, n_variants=1000,
                     n_cells=2000, reads_per_variant=500, spliced_frac=0.5)
    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    ARMS = {"host-agg": [], "device-agg": ["--device-agg"]}

    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        seed=3, **{**TIMED_CFG, "n_variants": 200, "reads_per_variant": 100}))
    for tag, extra in ARMS.items():
        _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
               "-c", warm["barcodes"], "-o", os.path.join(d, f"w_{tag}.mtx"),
               "--threads", nt, "--umi", "-s", "coverage", "--ref-matrix",
               os.path.join(d, f"wr_{tag}.mtx"), "--backend", "tpu", *extra])

    totals = {t: [] for t in ARMS}
    aggs = {t: [] for t in ARMS}
    for rep in range(reps):
        data = generate_dataset(os.path.join(d, f"t{rep}"),
                                SynthConfig(seed=700 + rep, **TIMED_CFG))
        order = list(ARMS) if rep % 2 == 0 else list(ARMS)[::-1]
        for tag in order:
            mj = os.path.join(d, f"m_{tag}_{rep}.json")
            t0 = time.time()
            _main(["-v", data["vcf"], "-b", data["bam"], "-f",
                   data["fasta"], "-c", data["barcodes"], "-o",
                   os.path.join(d, f"o_{tag}_{rep}.mtx"), "--threads", nt,
                   "--umi", "-s", "coverage", "--ref-matrix",
                   os.path.join(d, f"or_{tag}_{rep}.mtx"),
                   "--metrics-json", mj, "--backend", "tpu",
                   *ARMS[tag]])
            dt = time.time() - t0
            phases = json.load(open(mj)).get("phase_seconds", {})
            totals[tag].append(dt)
            aggs[tag].append(phases.get("aggregate", 0.0))
            print(f"rep{rep} [{tag}]: total {dt:.2f}s "
                  f"(aggregate {phases.get('aggregate', 0):.3f}s, "
                  f"score {phases.get('score', 0):.2f}s)", flush=True)
        # exactness cross-check on rep0: both agg paths, same matrices
        if rep == 0:
            a = open(os.path.join(d, "o_host-agg_0.mtx")).read()
            b = open(os.path.join(d, "o_device-agg_0.mtx")).read()
            assert a == b, "device-agg output differs from host-agg!"
            print("rep0 outputs identical (byte-equal .mtx)")

    for tag in ARMS:
        print(f"{tag}: total median {statistics.median(totals[tag]):.2f}s "
              f"min {min(totals[tag]):.2f}s | aggregate median "
              f"{statistics.median(aggs[tag]):.3f}s min {min(aggs[tag]):.3f}s")


if __name__ == "__main__":
    main()
