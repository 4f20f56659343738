"""VMEM-budget guard for large haplotype windows (SURVEY §5.7, VERDICT
r4 #3): the wavefront kernels keep the whole reversed-y buffer in VMEM,
so multi-kb --padding must degrade quad -> chained -> two-lane -> native
CPU full SW instead of dying with a raw Mosaic error. These tests pin
the routing thresholds and the exactness of every fallback hop."""

import numpy as np
import pytest

from vartrix_tpu.ops.sw_pallas_v2 import vmem_fit


def test_vmem_fit_thresholds():
    # production quanta fit every variant
    for v in ("v4", "v5", "v6"):
        assert vmem_fit(152, 208, v)
    # --padding 2000 (ly ~ 4k): v4/v5 fit, the 4-segment quad does not
    assert vmem_fit(152, 4032, "v4")
    assert vmem_fit(152, 4032, "v5")
    assert not vmem_fit(152, 4032, "v6")
    # --padding 20000 (ly ~ 40k): nothing fits -> CPU fallback
    for v in ("v4", "v5", "v6"):
        assert not vmem_fit(152, 40032, v)
    with pytest.raises(ValueError):
        vmem_fit(152, 208, "v9")


def test_budget_env_validation(monkeypatch):
    from vartrix_tpu.ops.sw_pallas_v2 import _vmem_budget

    monkeypatch.setenv("VARTRIX_VMEM_BUDGET", "1048576")
    assert _vmem_budget() == 1048576
    assert not vmem_fit(152, 208, "v4")
    monkeypatch.setenv("VARTRIX_VMEM_BUDGET", "0")
    with pytest.raises(ValueError):
        _vmem_budget()
    monkeypatch.delenv("VARTRIX_VMEM_BUDGET")
    assert vmem_fit(152, 208, "v6")


def _pair_problem(seed=7, R=300, H=16, lx=32, ly=48):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    for i in range(R):
        n = int(rng.integers(8, lx + 1))
        x[i, :n] = rng.choice(bases, n)
    haps = rng.choice(bases, size=(H, ly)).astype(np.uint8)
    for i in range(0, R, 3):
        seq = x[i][x[i] != 0][: ly - 4]  # only real bases — a 0 byte
        haps[i % H, 4 : 4 + len(seq)] = seq  # inside a hap matches read pad
    idx_ref = rng.integers(0, H, size=R).astype(np.int32)
    idx_alt = rng.integers(0, H, size=R).astype(np.int32)
    return x, haps, idx_ref, idx_alt


def test_guard_cpu_fallback_exact(monkeypatch):
    # A tiny budget must route the production pair entries to the
    # threaded host aligner with IDENTICAL codes and scores.
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_calls_pair_quad_tpu,
                                              sw_scores_pair_quad_tpu)

    x, haps, idx_ref, idx_alt = _pair_problem()
    monkeypatch.delenv("VARTRIX_VMEM_BUDGET", raising=False)
    exp_calls = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    exp_scores = sw_scores_pair_quad_tpu(x, haps, idx_ref, idx_alt)

    monkeypatch.setenv("VARTRIX_VMEM_BUDGET", "4096")
    got_calls = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    got_scores = sw_scores_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    np.testing.assert_array_equal(got_calls, exp_calls)
    np.testing.assert_array_equal(got_scores, exp_scores)


def test_guard_mid_budget_routes_v5_exact(monkeypatch):
    # A budget that fits v5/v4 but not the quad must still be exact
    # (exercises the quad -> chained hop, not the CPU fallback).
    from vartrix_tpu.ops.sw_pallas_v2 import sw_calls_pair_quad_tpu

    x, haps, idx_ref, idx_alt = _pair_problem(seed=9)
    lx, ly = x.shape[1], haps.shape[1]
    monkeypatch.delenv("VARTRIX_VMEM_BUDGET", raising=False)
    exp = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    # pick a budget between the v5 and v6 footprints at these shapes
    from vartrix_tpu.ops.sw_pallas_v2 import LANES, UNROLL_DEFAULT
    pad = UNROLL_DEFAULT - 1
    v5_bytes = (2 * (lx + pad + 2 * lx + 2 * ly + 2) + 7 * lx) * LANES * 4
    v6_bytes = (2 * (2 * lx + pad + 2 * lx + 4 * ly + 4) + 9 * lx) * LANES * 4
    assert v5_bytes < v6_bytes
    monkeypatch.setenv("VARTRIX_VMEM_BUDGET", str(v5_bytes))
    assert vmem_fit(lx, ly, "v5") and not vmem_fit(lx, ly, "v6")
    got = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    np.testing.assert_array_equal(got, exp)


def test_cli_large_padding_backend_equality(monkeypatch, tmp_path):
    # End-to-end: --padding 2000 with a budget that trips the guard must
    # complete (no Mosaic error) and produce output identical to the
    # pure-CPU backend. On real TPU hardware the same test exercises the
    # actual fallback dispatch through the driver.
    from vartrix_tpu.driver import _main
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    data = generate_dataset(
        str(tmp_path / "d"),
        SynthConfig(n_chroms=1, chrom_len=30_000, n_variants=4, n_cells=20,
                    reads_per_variant=12, seed=11))
    outs = {}
    for tag, backend in (("cpu", "cpu"), ("tpu", "tpu")):
        monkeypatch.setenv("VARTRIX_VMEM_BUDGET", "2097152")
        out = tmp_path / f"o_{tag}.mtx"
        _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
               "-c", data["barcodes"], "-o", str(out),
               "--padding", "2000", "--backend", backend, "--host",
               "native"])
        outs[tag] = out.read_bytes()
    assert outs["cpu"] == outs["tpu"]
