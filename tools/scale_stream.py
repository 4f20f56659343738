"""Scale probe for --stream (VERDICT r4 #6): a multi-M-read BAM runs in
bounded memory with outputs identical to the whole-file path.

Each arm runs in a SUBPROCESS so peak RSS (ru_maxrss) is measured per
arm. Default workload ~10M reads over a 160Mbp genome (sparse variant
set, the profile where memory matters); pass n_reads_million to scale.

Run: python tools/scale_stream.py [n_reads_million] [stream_window]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vartrix_tpu.utils.synth import SynthConfig, generate_dataset


def run_arm(data, out, extra, tag):
    code = f"""
import resource, sys, json
sys.path.insert(0, {REPO!r})
from vartrix_tpu.driver import _main
_main({json.dumps(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
                   "-c", data["barcodes"], "-o", out, "--backend", "cpu",
                   "--host", "native", "--threads", "2",
                   "-s", "coverage", "--ref-matrix", out + ".ref"]) } + {extra!r})
print("MAXRSS_MB", resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024)
"""
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f"{tag} failed")
    rss = next(int(l.split()[1]) for l in r.stdout.splitlines()
               if l.startswith("MAXRSS_MB"))
    print(f"{tag}: {dt:.1f}s, peak RSS {rss} MB", flush=True)
    return dt, rss


def main():
    mreads = float(sys.argv[1]) if len(sys.argv) > 1 else 10
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    d = tempfile.mkdtemp()
    n_var = 2000
    rpv = int(mreads * 1e6 / n_var)
    print(f"generating ~{mreads}M reads ({n_var} variants x {rpv})...",
          flush=True)
    t0 = time.time()
    data = generate_dataset(os.path.join(d, "s"), SynthConfig(
        n_chroms=16, chrom_len=10_000_000, n_variants=n_var, n_cells=5000,
        reads_per_variant=rpv, seed=31, spliced_frac=0.3))
    print(f"generated {data['n_reads']} reads in {time.time()-t0:.0f}s "
          f"({os.path.getsize(data['bam'])/1e9:.2f} GB BAM)", flush=True)

    wt, wrss = run_arm(data, os.path.join(d, "whole.mtx"),
                       ["--fetch", "whole"], "whole-file")
    st, srss = run_arm(data, os.path.join(d, "stream.mtx"),
                       ["--stream", str(window)], f"stream({window})")
    for suf in ("", ".ref"):
        a = open(os.path.join(d, "whole.mtx" + suf)).read()
        b = open(os.path.join(d, "stream.mtx" + suf)).read()
        assert a == b, f"outputs differ ({suf or 'main'})"
    print(f"outputs identical; RSS {wrss} -> {srss} MB "
          f"({wrss/max(srss,1):.1f}x lower), wall {wt:.0f}s -> {st:.0f}s")


if __name__ == "__main__":
    main()
