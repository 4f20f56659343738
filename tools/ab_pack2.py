"""A/B the 2-bit read transfer (VARTRIX_PACK2) on the TPU e2e.

Protocol mirrors ab_pack4/ab_prefetch: both arms warm once, each rep
generates ONE fresh dataset and runs both arms on it back-to-back,
alternating order; score-phase seconds decide, outputs must be
byte-equal. Run: python tools/ab_pack2.py
"""
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import json, os, statistics, tempfile, time
from vartrix_tpu.driver import _main
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

TIMED_CFG = dict(n_chroms=4, chrom_len=200_000, n_variants=1000,
                 n_cells=2000, reads_per_variant=500, spliced_frac=0.5)
ARMS = [("off", "0"), ("on", "1")]
d = tempfile.mkdtemp()
nt = str(os.cpu_count() or 1)
warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
    seed=3, **{**TIMED_CFG, "reads_per_variant": 20}))
sc = {t: [] for t, _ in ARMS}; tot = {t: [] for t, _ in ARMS}
for tag, v in ARMS:
    os.environ["VARTRIX_PACK2"] = v
    _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
           "-c", warm["barcodes"], "-o", os.path.join(d, f"w_{tag}.mtx"),
           "--threads", nt, "--backend", "tpu"])
print("warm done", flush=True)
for rep in range(4):
    data = generate_dataset(os.path.join(d, f"t{rep}"), SynthConfig(
        seed=990 + rep, **TIMED_CFG))
    order = ARMS if rep % 2 == 0 else ARMS[::-1]
    for tag, v in order:
        os.environ["VARTRIX_PACK2"] = v
        out = os.path.join(d, f"o_{tag}_{rep}.mtx")
        mj = os.path.join(d, f"m_{tag}_{rep}.json")
        t0 = time.time()
        _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
               "-c", data["barcodes"], "-o", out, "--threads", nt,
               "--backend", "tpu", "--metrics-json", mj])
        dt = time.time() - t0
        s = json.load(open(mj)).get("phase_seconds", {}).get("score", 0.0)
        tot[tag].append(dt); sc[tag].append(s)
        print(f"rep{rep} pack2={tag}: total {dt:.2f}s score {s:.2f}s ({data['n_reads']/dt:.0f} r/s)", flush=True)
    a = open(os.path.join(d, f"o_off_{rep}.mtx")).read()
    b = open(os.path.join(d, f"o_on_{rep}.mtx")).read()
    assert a == b, "pack2 output differs!"
for tag, _ in ARMS:
    print(f"pack2={tag}: score median {statistics.median(sc[tag]):.2f} min {min(sc[tag]):.2f} | total median {statistics.median(tot[tag]):.2f} min {min(tot[tag]):.2f}")
