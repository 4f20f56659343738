"""Benchmark harness.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: read-vs-haplotype Smith-Waterman alignments/sec on one TPU
chip (the engine's hot computation, BASELINE.md north star), measured with
the PRODUCTION Pallas kernel — the quad-chain wavefront (v6): one lane
scores TWO reads, each against its ref++alt haplotypes, on realistic
shapes (150bp reads vs 201bp haplotypes, padded to the kernel's 152x208
quantization); falls back to v5 chained-pair when quad is infeasible.

vs_baseline: speedup over the multi-threaded CPU banded aligner
(native/swlib.cpp — same k-mer-banded algorithm family and scoring
parameters as the reference tool's rust-bio aligner, using all host
cores). The reference publishes no numbers (BASELINE.md), so the baseline
is self-measured on this host; per-core normalization is printed so the
number travels across host sizes.

Context metrics on stderr and in the JSON line: the CPU-vs-TPU
end-to-end comparison (5 interleaved fresh-dataset rep pairs, slowest
rep per arm dropped; median-, best-, and paired-ratio views all
reported — see bench_e2e for the weather rationale), per-phase
decomposition from --metrics-json, an estimated device-vs-transfer
split of the score phase, and the 100k-loci cohort variants/s.

Note on timing: the axon TPU relay caches identical computations and its
block_until_ready is unreliable, so every timed step consumes a unique
on-device-generated input and the final scalar is materialized to host,
and every e2e repetition runs on a FRESH dataset.
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_tpu_kernel(lx=152, ly=208, R=32768, n_iter=8):
    import jax
    import jax.numpy as jnp

    os.makedirs(os.path.expanduser("~/.cache/jax_pallas"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_pallas"))

    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import (UNROLL_DEFAULT, _sw_pallas_v5,
                                              _sw_pallas_v6, quad_feasible)

    interpret = not _on_tpu()
    if interpret:
        R, n_iter = 128, 2  # CPU interpreter mode: keep it tiny
    pad_top = UNROLL_DEFAULT - 1
    quad = quad_feasible(lx, ly)

    @jax.jit
    def step(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        if quad:  # production kernel: v6 quad-chain (2 reads/lane)
            x = jax.random.randint(kx, (2 * lx, R // 2), 65, 69, jnp.int32)
            ybuf = jax.random.randint(ky, (pad_top + 2 * lx + 4 * ly, R // 2),
                                      65, 69, jnp.int32)
            return jnp.sum(_sw_pallas_v6(x, ybuf, lx=lx, ly=ly,
                                         interpret=interpret))
        x = jax.random.randint(kx, (lx, R), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (pad_top + 2 * lx + 2 * ly, R),
                                  65, 69, jnp.int32)
        return jnp.sum(_sw_pallas_v5(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    aligns = 2 * R  # each lane scores a (ref, alt) pair
    t0 = time.time()
    _ = int(step(0))  # warm/compile
    log(f"kernel compile+warm: {time.time()-t0:.1f}s (interpret={interpret})")

    best = 0.0
    for window in range(3):  # first window absorbs relay warm-up jitter
        t0 = time.time()
        tot = step(1000 * window + 1)
        for i in range(2, n_iter + 1):
            tot = tot + step(1000 * window + i)
        _ = int(tot)  # materialize => all executions complete
        dt = (time.time() - t0) / n_iter
        aps = aligns / dt
        log(f"TPU kernel window {window}: {dt*1e3:.1f} ms/batch of {aligns} "
            f"pairs -> {aps/1e6:.3f} M alignments/s "
            f"({aligns*lx*ly/dt/1e9:.1f} Gcells/s useful)")
        best = max(best, aps)
    return best


def bench_cpu_baseline(n_pairs=20000):
    from vartrix_tpu.ops.sw_native import banded_sw_batch_native, native_available

    if not native_available():
        log("native CPU baseline unavailable")
        return None
    rng = np.random.default_rng(0)
    xs, ys = [], []
    for _ in range(200):
        hap = rng.choice(np.frombuffer(b"ACGT", np.uint8), 201).astype(np.uint8)
        s = int(rng.integers(0, 51))
        read = hap[s : s + 150].copy()
        errs = rng.random(len(read)) < 0.01
        read[errs] = rng.choice(np.frombuffer(b"ACGT", np.uint8), int(errs.sum()))
        xs.append(read.tobytes())
        ys.append(hap.tobytes())
    xs = [xs[i % 200] for i in range(n_pairs)]
    ys = [ys[i % 200] for i in range(n_pairs)]
    nt = os.cpu_count() or 1
    t0 = time.time()
    banded_sw_batch_native(xs, ys, nt)
    dt = time.time() - t0
    aps = n_pairs / dt
    log(f"CPU banded baseline ({nt} threads): {aps/1e3:.1f} k alignments/s "
        f"({aps/nt/1e3:.1f} k/core)")
    return aps


TIMED_CFG = dict(n_chroms=4, chrom_len=200_000, n_variants=1000,
                 n_cells=2000, reads_per_variant=500, spliced_frac=0.5)

# 100k-loci cohort profile (BASELINE.md "variants/sec" north-star row);
# emitted in the JSON line so the claim is driver-capturable (VERDICT r3
# #5), not prose-only.
COHORT_CFG = dict(n_chroms=16, chrom_len=4_000_000, n_variants=100_000,
                  n_cells=5000, reads_per_variant=6, spliced_frac=0.3)


def bench_e2e(kernel_aps=None, reps=5):
    """North-star e2e comparison (BASELINE.md): the full TPU pipeline vs a
    full CPU pipeline standing in for multi-threaded vartrix — same
    workload, all host cores, reference-style banded scoring (banded is
    FASTER than full SW on CPU, so the ratio is conservative).

    Protocol (weather-robust, VERDICT r3 #1): this guest VM measures
    4-15x wall-clock spread on IDENTICAL native-only work (BASELINE.md
    round-3 table), so sequential same-arm reps confound backend with
    weather. Both arms are warmed once, then each rep generates ONE
    fresh dataset (the relay caches identical computations) and runs
    BOTH arms back-to-back on it — same data, same weather window; arm
    order alternates per rep. Reported: per-arm median and min after
    dropping each arm's slowest rep (stalls only ever ADD time), the
    ratio of medians, the ratio of bests, and the median of per-rep
    paired ratios. Returns a dict of those numbers."""
    import tempfile

    from vartrix_tpu.driver import _main
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    d = tempfile.mkdtemp()
    # warm-up keeps the TIMED variant count: the quantized hap-matrix
    # row count is part of the jitted entry signatures, so a smaller
    # warm dataset would leave the timed shapes cold and rep0 pays the
    # compile through the relay
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        seed=3, **{**TIMED_CFG, "reads_per_variant": 20}))
    nt = str(os.cpu_count() or 1)
    ARMS = {"cpu": ["--sw-mode", "banded", "--backend", "cpu"],
            "tpu": ["--backend", "tpu"]}

    def one_run(data, tag, extra):
        out = os.path.join(d, f"out_{tag}.mtx")
        mj = os.path.join(d, f"metrics_{tag}.json")
        t0 = time.time()
        _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
               "-c", data["barcodes"], "-o", out, "--threads", nt,
               "--metrics-json", mj, *extra])
        dt = time.time() - t0
        phases = {}
        try:
            with open(mj) as f:
                phases = json.load(f).get("phase_seconds", {})
        except Exception:
            pass
        return dt, phases

    for tag, extra in ARMS.items():
        t0 = time.time()
        _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
               "-c", warm["barcodes"], "-o",
               os.path.join(d, f"warm_{tag}.mtx"), "--threads", nt, *extra])
        log(f"e2e warm-up [{tag}]: {time.time()-t0:.1f}s")

    rates = {"cpu": [], "tpu": []}
    tpu_scores = []
    n_reads = 0
    for rep in range(reps):
        data = generate_dataset(os.path.join(d, f"t_{rep}"),
                                SynthConfig(seed=100 + rep, **TIMED_CFG))
        n_reads = data["n_reads"]
        order = ["cpu", "tpu"] if rep % 2 == 0 else ["tpu", "cpu"]
        for tag in order:
            dt, phases = one_run(data, f"{tag}_{rep}", ARMS[tag])
            rates[tag].append(n_reads / dt)
            if tag == "tpu" and "score" in phases:
                tpu_scores.append(phases["score"])
            log(f"e2e [{tag} rep{rep}]: {n_reads} reads in {dt:.1f}s"
                f" -> {n_reads/dt:.0f} reads/s"
                + (f" (phases: " + ", ".join(
                    f"{k} {v:.2f}s" for k, v in sorted(phases.items())) + ")"
                   if phases else ""))

    def trimmed(v):
        # drop the slowest rep (weather stalls only ever add time)
        return sorted(v)[1:] if len(v) >= 3 else sorted(v)

    res = {}
    for tag in ARMS:
        t = trimmed(rates[tag])
        res[f"{tag}_median"] = statistics.median(t)
        res[f"{tag}_best"] = max(t)
        log(f"e2e [{tag}] reps: "
            + ", ".join(f"{r:.0f}" for r in rates[tag])
            + f" reads/s -> trimmed median {res[f'{tag}_median']:.0f}, "
              f"best {res[f'{tag}_best']:.0f}")
    pair_ratios = [t / c for t, c in zip(rates["tpu"], rates["cpu"])]
    res["ratio_median"] = res["tpu_median"] / res["cpu_median"]
    res["ratio_best"] = res["tpu_best"] / res["cpu_best"]
    res["ratio_paired"] = statistics.median(pair_ratios)
    log(f"e2e TPU vs multi-threaded CPU banded pipeline: "
        f"median-ratio {res['ratio_median']:.1f}x, best-ratio "
        f"{res['ratio_best']:.1f}x, paired per-rep ratios "
        + ", ".join(f"{r:.1f}" for r in pair_ratios)
        + f" -> paired median {res['ratio_paired']:.1f}x")
    if tpu_scores and kernel_aps:
        sc = statistics.median(tpu_scores)
        # each surviving read scores ~1 (ref, alt) pair; device time
        # estimated from the kernel benchmark -> remainder is host
        # gather + transfer + dispatch overhead
        dev = n_reads / kernel_aps * 2  # 2 alignments per read-pair task
        log(f"score phase median {sc:.2f}s; est. pure-kernel "
            f"{dev:.2f}s -> ~{max(sc-dev, 0):.2f}s transfer/dispatch "
            f"({100*max(sc-dev,0)/sc:.0f}% of score phase)")
    return res


def bench_cohort(reps=3):
    """100k-loci cohort throughput (variants/s end-to-end on TPU),
    driver-capturable version of BASELINE.md's cohort row. The first
    dataset runs once UNTIMED so the cohort-scale kernel shapes (the
    quantized hap-matrix row count is part of the jit signature)
    compile before any timed rep; timed reps then use fresh datasets
    (the relay caches identical computations).

    Protocol (r5, same rigor as the e2e arm — VERDICT r4 #4): >=3 timed
    fresh-dataset reps, slowest rep dropped (VM stalls only ever add
    time), TRIMMED MEDIAN is the headline; best-of-reps is reported
    alongside. Returns {"median": ..., "best": ...}."""
    import tempfile

    from vartrix_tpu.driver import _main
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    d = tempfile.mkdtemp()
    nt = str(os.cpu_count() or 1)
    rates = []
    for rep in range(reps + 1):
        data = generate_dataset(os.path.join(d, f"c{rep}"), SynthConfig(
            seed=500 + rep, **COHORT_CFG))
        out = os.path.join(d, f"cohort{rep}.mtx")
        t0 = time.time()
        _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
               "-c", data["barcodes"], "-o", out, "--threads", nt,
               "-s", "alt_frac", "--mapq", "20", "--primary-alignments",
               "--backend", "tpu"])
        dt = time.time() - t0
        vps = COHORT_CFG["n_variants"] / dt
        if rep == 0:
            log(f"cohort warm-up (untimed): {dt:.1f}s")
            continue
        log(f"cohort rep{rep - 1}: {COHORT_CFG['n_variants']} variants / "
            f"{data['n_reads']} reads in {dt:.1f}s -> {vps:.0f} variants/s")
        rates.append(vps)
    trimmed = sorted(rates)[1:] if len(rates) >= 3 else sorted(rates)
    res = {"median": statistics.median(trimmed), "best": max(trimmed)}
    log(f"cohort: reps " + ", ".join(f"{r:.0f}" for r in rates)
        + f" variants/s -> trimmed median {res['median']:.0f}, "
          f"best {res['best']:.0f}")
    return res


def main():
    # The axon relay intermittently hangs whole-process (even trivial
    # jnp ops; observed round 3). Run the device benches on a watchdog
    # thread: if the TPU is unreachable, still emit an honest JSON line
    # (value null) instead of hanging the round's bench capture.
    import threading

    result = {}

    def _device_benches():
        result["kernel"] = bench_tpu_kernel()
        try:
            result["e2e"] = bench_e2e(kernel_aps=result["kernel"])
        except Exception as e:  # e2e context metric must not sink the bench
            log(f"e2e bench failed: {e}")
        try:
            result["cohort"] = bench_cohort()
        except Exception as e:
            log(f"cohort bench failed: {e}")
        result["done"] = True

    # CPU baseline FIRST: if the watchdog expires while the device
    # worker is merely slow (not hung), timing the baseline would run
    # it concurrently with the e2e arms and deflate it
    baseline = bench_cpu_baseline()
    worker = threading.Thread(target=_device_benches, daemon=True)
    worker.start()
    worker.join(timeout=3000)
    value = result.get("kernel")
    if value is None:
        log("TPU unreachable (kernel bench timed out); emitting null value "
            "— see BASELINE.md round-3 table for on-chip measurements")
    vs = (value / baseline) if (value and baseline) else None
    line = {
        "metric": "sw_alignments_per_sec_chip",
        "value": round(value, 1) if value else None,
        "unit": "alignments/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    e2e = result.get("e2e")
    if e2e:
        line["e2e_tpu_reads_per_sec"] = round(e2e["tpu_median"])
        line["e2e_cpu_reads_per_sec"] = round(e2e["cpu_median"])
        line["e2e_ratio_median"] = round(e2e["ratio_median"], 2)
        line["e2e_ratio_best"] = round(e2e["ratio_best"], 2)
        line["e2e_ratio_paired"] = round(e2e["ratio_paired"], 2)
    if result.get("cohort"):
        line["variants_per_sec_cohort"] = round(result["cohort"]["median"], 1)
        line["variants_per_sec_cohort_best"] = round(
            result["cohort"]["best"], 1)
    print(json.dumps(line), flush=True)
    if not result.get("done"):
        os._exit(0)  # don't block shutdown on a hung relay call


if __name__ == "__main__":
    main()
