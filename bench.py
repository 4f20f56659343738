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

Context metrics on stderr: CPU-vs-TPU end-to-end pipeline comparison with
>=3 repetitions per arm (median reported), per-phase decomposition from
--metrics-json, and an estimated device-vs-transfer split of the score
phase.

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


def bench_e2e(kernel_aps=None, reps=3):
    """North-star e2e comparison (BASELINE.md): the full TPU pipeline vs a
    full CPU pipeline standing in for multi-threaded vartrix — same
    workload, all host cores, reference-style banded scoring (banded is
    FASTER than full SW on CPU, so the ratio is conservative).

    Protocol: each backend first runs a WARM-UP dataset with the SAME
    generator profile as the timed ones (so kernel shapes compile and the
    relay warms on the shapes that will be timed), then is timed on
    `reps` FRESH datasets (the relay caches identical computations) and
    the MEDIAN is reported. Per-phase times come from --metrics-json.
    Returns (tpu_median_rps, cpu_median_rps)."""
    import tempfile

    from vartrix_tpu.driver import _main
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    d = tempfile.mkdtemp()
    warm = generate_dataset(os.path.join(d, "w"), SynthConfig(
        seed=3, **{**TIMED_CFG, "n_variants": 200, "reads_per_variant": 100}))
    nt = str(os.cpu_count() or 1)

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

    def run_arm(tag, extra):
        _main(["-v", warm["vcf"], "-b", warm["bam"], "-f", warm["fasta"],
               "-c", warm["barcodes"], "-o",
               os.path.join(d, f"warm_{tag}.mtx"), "--threads", nt, *extra])
        rates, scores = [], []
        n_pairs = 0
        for rep in range(reps):
            data = generate_dataset(os.path.join(d, f"t_{tag}_{rep}"),
                                    SynthConfig(seed=100 + rep, **TIMED_CFG))
            dt, phases = one_run(data, f"{tag}_{rep}", extra)
            rates.append(data["n_reads"] / dt)
            if "score" in phases:
                scores.append(phases["score"])
            n_pairs = max(n_pairs, data["n_reads"])
            log(f"e2e [{tag} rep{rep}]: {data['n_reads']} reads in {dt:.1f}s"
                f" -> {data['n_reads']/dt:.0f} reads/s"
                + (f" (phases: " + ", ".join(
                    f"{k} {v:.2f}s" for k, v in sorted(phases.items())) + ")"
                   if phases else ""))
        med = statistics.median(rates)
        log(f"e2e [{tag}] median of {reps}: {med:.0f} reads/s")
        if scores and kernel_aps and tag == "tpu":
            sc = statistics.median(scores)
            # each surviving read scores ~1 (ref, alt) pair; device time
            # estimated from the kernel benchmark -> remainder is host
            # gather + transfer + dispatch overhead
            dev = n_pairs / kernel_aps * 2  # 2 alignments per read-pair task
            log(f"score phase median {sc:.2f}s; est. pure-kernel "
                f"{dev:.2f}s -> ~{max(sc-dev, 0):.2f}s transfer/dispatch "
                f"({100*max(sc-dev,0)/sc:.0f}% of score phase)")
        return med

    cpu = run_arm("cpu-banded", ["--sw-mode", "banded", "--backend", "cpu"])
    tpu = run_arm("tpu", ["--backend", "tpu"])
    if cpu:
        log(f"e2e TPU vs multi-threaded CPU banded pipeline "
            f"(median of {reps}): {tpu/cpu:.1f}x")
    return tpu, cpu


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
            bench_e2e(kernel_aps=result["kernel"])
        except Exception as e:  # e2e context metric must not sink the bench
            log(f"e2e bench failed: {e}")
        result["done"] = True

    # CPU baseline FIRST: if the watchdog expires while the device
    # worker is merely slow (not hung), timing the baseline would run
    # it concurrently with the e2e arms and deflate it
    baseline = bench_cpu_baseline()
    worker = threading.Thread(target=_device_benches, daemon=True)
    worker.start()
    worker.join(timeout=2100)
    value = result.get("kernel")
    if value is None:
        log("TPU unreachable (kernel bench timed out); emitting null value "
            "— see BASELINE.md round-3 table for on-chip measurements")
    vs = (value / baseline) if (value and baseline) else None
    print(json.dumps({
        "metric": "sw_alignments_per_sec_chip",
        "value": round(value, 1) if value else None,
        "unit": "alignments/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }), flush=True)
    if not result.get("done"):
        os._exit(0)  # don't block shutdown on a hung relay call


if __name__ == "__main__":
    main()
