"""--stream N: windowed decode->collect->score must be byte-identical to
the monolithic path (VERDICT r4 #6 — bounded-RSS scale path), across
scoring modes, UMI, and window sizes that split variants mid-chromosome."""

import os

import numpy as np
import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.bam_native import native_available
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native host runtime unavailable")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    return generate_dataset(str(d / "s"), SynthConfig(
        n_chroms=3, chrom_len=80_000, n_variants=150, n_cells=120,
        reads_per_variant=30, seed=23, spliced_frac=0.4))


def _run(data, out, extra):
    _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
           "-c", data["barcodes"], "-o", out, "--backend", "cpu",
           "--host", "native", "--threads", "2", *extra])


@pytest.mark.parametrize("mode_args", [
    [],
    ["--umi", "-s", "coverage"],
    ["-s", "alt_frac", "--mapq", "20"],
])
def test_stream_equals_monolithic(dataset, tmp_path, mode_args):
    extra = (["--ref-matrix", str(tmp_path / "mref.mtx")]
             if "coverage" in mode_args else [])
    sextra = (["--ref-matrix", str(tmp_path / "sref.mtx")]
              if "coverage" in mode_args else [])
    mono = str(tmp_path / "mono.mtx")
    _run(dataset, mono, mode_args + extra)
    for wi, n in enumerate((17, 64)):  # windows that split chroms + a few big
        out = str(tmp_path / f"st{wi}.mtx")
        _run(dataset, out, mode_args + ["--stream", str(n)]
             + ([f"--ref-matrix={tmp_path}/sref{wi}.mtx"]
                if "coverage" in mode_args else []))
        assert open(out).read() == open(mono).read()
    if "coverage" in mode_args:
        base = open(str(tmp_path / "mref.mtx")).read()
        for wi in range(2):
            assert open(f"{tmp_path}/sref{wi}.mtx").read() == base


def test_stream_metrics_match(dataset, tmp_path):
    import json

    m1 = str(tmp_path / "m1.json")
    m2 = str(tmp_path / "m2.json")
    _run(dataset, str(tmp_path / "a.mtx"), ["--metrics-json", m1])
    _run(dataset, str(tmp_path / "b.mtx"),
         ["--stream", "40", "--metrics-json", m2])
    a = json.load(open(m1))
    b = json.load(open(m2))
    for k in ("num_reads", "num_low_mapq", "num_non_primary",
              "num_duplicates", "num_not_cell_bc", "num_not_useful",
              "num_non_umi", "num_invalid_recs", "num_multiallelic_recs"):
        if k in a or k in b:
            assert a.get(k) == b.get(k), k
