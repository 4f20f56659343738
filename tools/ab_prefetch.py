"""A/B the pipelined pair dispatch (VARTRIX_PREFETCH / VARTRIX_INFLIGHT)
on the TPU e2e.

Round-5 change: _chunked_pair_dispatch gathers+packs chunk k+1..k+D on a
producer thread while chunk k round-trips through the relay
(VARTRIX_PREFETCH, default 2), and can optionally dispatch from a small
pool so consecutive chunks overlap inside the backend
(VARTRIX_INFLIGHT). Protocol mirrors ab_pack4: both arms warm once,
each rep generates ONE fresh dataset and runs every arm back-to-back on
it (same data + weather window), rotating order. Score-phase seconds
from --metrics-json are the decision signal; outputs must be byte-equal.

Run: python tools/ab_prefetch.py [reps]
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

ARMS = [
    ("serial", {"VARTRIX_PREFETCH": "0", "VARTRIX_INFLIGHT": "1"}),
    ("pf2", {"VARTRIX_PREFETCH": "2", "VARTRIX_INFLIGHT": "1"}),
    ("pf2x2", {"VARTRIX_PREFETCH": "2", "VARTRIX_INFLIGHT": "2"}),
]


def _set(env):
    for k, v in env.items():
        os.environ[k] = v


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        seed=3, **{**TIMED_CFG, "n_variants": 200, "reads_per_variant": 100}))
    prior = {k: os.environ.get(k)
             for k in ("VARTRIX_PREFETCH", "VARTRIX_INFLIGHT")}
    scores = {tag: [] for tag, _ in ARMS}
    totals = {tag: [] for tag, _ in ARMS}
    try:
        _set(ARMS[1][1])
        _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
               "-c", warm["barcodes"], "-o", os.path.join(d, "warm.mtx"),
               "--threads", nt, "--backend", "tpu"])
        print("warm-up done", flush=True)
        for rep in range(reps):
            data = generate_dataset(os.path.join(d, f"t{rep}"), SynthConfig(
                seed=900 + rep, **TIMED_CFG))
            order = ARMS[rep % len(ARMS):] + ARMS[: rep % len(ARMS)]
            for tag, env in order:
                _set(env)
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
                print(f"rep{rep} {tag}: total {dt:.2f}s score {sc:.2f}s "
                      f"({data['n_reads']/dt:.0f} reads/s)", flush=True)
            base = open(os.path.join(d, f"o_{ARMS[0][0]}_{rep}.mtx")).read()
            for tag, _ in ARMS[1:]:
                got = open(os.path.join(d, f"o_{tag}_{rep}.mtx")).read()
                assert got == base, f"{tag} output differs from serial!"
        for tag, _ in ARMS:
            print(f"{tag}: score median {statistics.median(scores[tag]):.2f}s "
                  f"min {min(scores[tag]):.2f}s | total median "
                  f"{statistics.median(totals[tag]):.2f}s min "
                  f"{min(totals[tag]):.2f}s")
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


if __name__ == "__main__":
    main()
