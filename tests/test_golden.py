"""Golden regression tests against the reference tool's pre-validated
matrices, mirroring the reference's own test strategy
(/root/reference/src/main.rs:1197-1467): run the full pipeline in-process
and compare CSR-canonicalized matrices.
"""

import os

import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.barcodes import load_barcodes
from vartrix_tpu.io.matrix_market import read_matrix_market

T = "/root/reference/test"
BACKENDS = ["cpu", "tpu"]

DNA_BAM_MISSING = not os.path.exists(f"{T}/test_dna.bam")


def canon(path):
    return read_matrix_market(path).to_canonical()


def base_argv(tmp_path, backend, out="result.mtx"):
    return [
        "-v", f"{T}/test.vcf", "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
        "-c", f"{T}/barcodes.tsv", "-o", str(tmp_path / out),
        "--ref-matrix", str(tmp_path / "ref.mtx"), "--backend", backend,
    ]


@pytest.mark.parametrize("backend", BACKENDS)
def test_consensus_matrix(tmp_path, backend):
    _main(base_argv(tmp_path, backend))
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_consensus.mtx")


@pytest.mark.parametrize("backend", BACKENDS)
def test_frac_matrix(tmp_path, backend):
    _main(base_argv(tmp_path, backend) + ["-s", "alt_frac"])
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_frac.mtx")


@pytest.mark.parametrize("backend", BACKENDS)
def test_coverage_matrices(tmp_path, backend):
    _main(base_argv(tmp_path, backend) + ["-s", "coverage"])
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_coverage.mtx")
    assert canon(tmp_path / "ref.mtx") == canon(f"{T}/test_coverage_ref.mtx")


@pytest.mark.parametrize("backend", BACKENDS)
def test_coverage_matrices_umi(tmp_path, backend):
    _main(base_argv(tmp_path, backend) + ["-s", "coverage", "--umi"])
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_coverage_umi.mtx")
    assert canon(tmp_path / "ref.mtx") == canon(f"{T}/test_coverage_ref_umi.mtx")


def test_coverage_matrices_umi_gzipped_bcs(tmp_path):
    out_bcs = tmp_path / "barcodes.tsv"
    argv = [
        "-v", f"{T}/test.vcf", "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
        "-c", f"{T}/barcodes.tsv.gz", "--umi", "-o", str(tmp_path / "result.mtx"),
        "-s", "coverage", "--ref-matrix", str(tmp_path / "ref.mtx"),
        "--out-barcodes", str(out_bcs), "--backend", "cpu",
    ]
    _main(argv)
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_coverage_umi.mtx")
    assert canon(tmp_path / "ref.mtx") == canon(f"{T}/test_coverage_ref_umi.mtx")
    assert load_barcodes(f"{T}/barcodes.tsv.gz") == load_barcodes(str(out_bcs))


@pytest.mark.skipif(DNA_BAM_MISSING, reason="test_dna.bam absent from reference mount (.MISSING_LARGE_BLOBS)")
@pytest.mark.parametrize("backend", BACKENDS)
def test_coverage_matrices_umi_dna(tmp_path, backend):
    argv = [
        "-v", f"{T}/test_dna.vcf", "-b", f"{T}/test_dna.bam", "-f", f"{T}/test_dna.fa",
        "-c", f"{T}/dna_barcodes.tsv", "--umi", "-o", str(tmp_path / "result.mtx"),
        "-s", "coverage", "--ref-matrix", str(tmp_path / "ref.mtx"),
        "--backend", backend,
    ]
    _main(argv)
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_dna_umi.mtx")
    assert canon(tmp_path / "ref.mtx") == canon(f"{T}/test_dna_ref_umi.mtx")


@pytest.mark.skipif(DNA_BAM_MISSING, reason="test_dna.bam absent from reference mount (.MISSING_LARGE_BLOBS)")
@pytest.mark.parametrize("backend", BACKENDS)
def test_coverage_matrices_dna(tmp_path, backend):
    argv = [
        "-v", f"{T}/test_dna.vcf", "-b", f"{T}/test_dna.bam", "-f", f"{T}/test_dna.fa",
        "-c", f"{T}/dna_barcodes.tsv", "-o", str(tmp_path / "result.mtx"),
        "-s", "coverage", "--ref-matrix", str(tmp_path / "ref.mtx"),
        "--backend", backend,
    ]
    _main(argv)
    assert canon(tmp_path / "result.mtx") == canon(f"{T}/test_dna.mtx")
    assert canon(tmp_path / "ref.mtx") == canon(f"{T}/test_dna_ref.mtx")


def test_out_variants(tmp_path):
    out_vars = tmp_path / "variants.tsv"
    _main(base_argv(tmp_path, "cpu") + ["--out-variants", str(out_vars)])
    lines = out_vars.read_text().splitlines()
    assert lines == ["1_199", "17_199", "2_199", "7_199"]


def test_profile_dir_writes_trace(tmp_path):
    """--profile-dir: a jax.profiler trace must land on disk (SURVEY §5.1)."""
    prof = tmp_path / "trace"
    _main(base_argv(tmp_path, "cpu") + ["--profile-dir", str(prof)])
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs]
    assert files, "no trace files written"
