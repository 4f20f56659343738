"""A/B the 4-bit packed read transfer (VARTRIX_PACK4) on the TPU e2e.

Round-4 protocol: the pack now happens in C++ DURING the padded gather
(gio_gather_padded_packed) instead of a host numpy LUT pass, so the
host-side cost that made rounds 2-3 a wash is gone. Both arms warm
once, then each rep generates ONE fresh dataset and runs BOTH arms on
it back-to-back (same data + weather window), alternating order.
Score-phase seconds from --metrics-json are the decision signal.

Run: python tools/ab_pack4.py [reps]
"""
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vartrix_tpu.driver import _main
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

TIMED_CFG = dict(n_chroms=4, chrom_len=200_000, n_variants=1000,
                 n_cells=2000, reads_per_variant=500, spliced_frac=0.5)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        seed=3, **{**TIMED_CFG, "n_variants": 200, "reads_per_variant": 100}))
    prior = os.environ.get("VARTRIX_PACK4")
    scores = {"off": [], "on": []}
    totals = {"off": [], "on": []}
    try:
        for tag, flag in (("off", "0"), ("on", "1")):
            os.environ["VARTRIX_PACK4"] = flag
            _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
                   "-c", warm["barcodes"], "-o",
                   os.path.join(d, f"warm_{tag}.mtx"), "--threads", nt,
                   "--backend", "tpu"])
        print("warm-up done", flush=True)
        for rep in range(reps):
            data = generate_dataset(os.path.join(d, f"t{rep}"), SynthConfig(
                seed=800 + rep, **TIMED_CFG))
            order = [("off", "0"), ("on", "1")]
            if rep % 2:
                order.reverse()
            for tag, flag in order:
                os.environ["VARTRIX_PACK4"] = flag
                out = os.path.join(d, f"o_{tag}_{rep}.mtx")
                mj = os.path.join(d, f"m_{tag}_{rep}.json")
                t0 = time.time()
                _main(["-v", data["vcf"], "-b", data["bam"], "-f",
                       data["fasta"], "-c", data["barcodes"], "-o", out,
                       "--threads", nt, "--backend", "tpu",
                       "--metrics-json", mj])
                dt = time.time() - t0
                sc = json.load(open(mj)).get("phase_seconds", {}).get(
                    "score", 0.0)
                totals[tag].append(dt)
                scores[tag].append(sc)
                print(f"rep{rep} pack4={tag}: total {dt:.2f}s "
                      f"score {sc:.2f}s "
                      f"({data['n_reads']/dt:.0f} reads/s)", flush=True)
            a = open(os.path.join(d, f"o_off_{rep}.mtx")).read()
            b = open(os.path.join(d, f"o_on_{rep}.mtx")).read()
            assert a == b, "packed output differs!"
        for tag in ("off", "on"):
            print(f"pack4={tag}: score median "
                  f"{statistics.median(scores[tag]):.2f}s min "
                  f"{min(scores[tag]):.2f}s | total median "
                  f"{statistics.median(totals[tag]):.2f}s min "
                  f"{min(totals[tag]):.2f}s")
    finally:
        if prior is None:
            os.environ.pop("VARTRIX_PACK4", None)
        else:
            os.environ["VARTRIX_PACK4"] = prior


if __name__ == "__main__":
    main()
