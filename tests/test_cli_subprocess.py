"""CLI-level tests through real subprocesses: sharded multi-process runs
merged with vartrix-merge, plus launcher behaviors."""

import os
import subprocess
import sys

import pytest

from vartrix_tpu.io.matrix_market import read_matrix_market
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARTRIX = os.path.join(REPO, "bin", "vartrix")
MERGE = os.path.join(REPO, "bin", "vartrix-merge")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run(args):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def canon(p):
    return read_matrix_market(str(p)).to_canonical()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    return generate_dataset(str(d), SynthConfig(
        n_variants=10, n_cells=25, reads_per_variant=25, seed=41))


def base_args(info, out):
    return [VARTRIX, "-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
            "-c", info["barcodes"], "-o", str(out), "--backend", "cpu"]


def test_two_process_shards_merge_equals_single(tmp_path, dataset):
    full = tmp_path / "full.mtx"
    run(base_args(dataset, full))
    parts = []
    for i in range(2):
        p = tmp_path / f"part{i}.mtx"
        run(base_args(dataset, p) + ["--num-shards", "2", "--shard-index", str(i)])
        parts.append(str(p))
    merged = tmp_path / "merged.mtx"
    run([MERGE, str(merged)] + parts)
    assert canon(merged) == canon(full)


def test_version_and_help():
    out = run([VARTRIX, "--version"]).stdout
    assert out.startswith("vartrix ")
    out = run([VARTRIX, "--help"]).stdout
    for flag in ("--vcf", "--bam", "--fasta", "--cell-barcodes", "--padding",
                 "--scoring-method", "--ref-matrix", "--umi", "--bam-tag",
                 "--valid-chars", "--mapq", "--threads"):
        assert flag in out


def test_refuses_existing_output(tmp_path, dataset):
    out = tmp_path / "exists.mtx"
    out.write_text("boo")
    r = subprocess.run([sys.executable] + base_args(dataset, out),
                       capture_output=True, text=True, env=ENV, cwd=REPO)
    assert r.returncode == 1
    assert "already exists" in r.stderr


def test_jax_distributed_two_processes(tmp_path, dataset):
    """Full --distributed run: 2 jax.distributed CPU processes (gloo
    collectives), row-sharded, matrices merged via process_allgather,
    rank 0 writes — must equal a single-process run."""
    import json

    full = tmp_path / "single.mtx"
    run(base_args(dataset, full) + ["-s", "coverage", "--ref-matrix",
                                    str(tmp_path / "single.ref"), "--umi"])
    json.dump({k: dataset[k] for k in ("vcf", "bam", "fasta", "barcodes")},
              open(tmp_path / "info.json", "w"))
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys, os
sys.path.insert(0, {REPO!r})
rank = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
import json
info = json.load(open({str(tmp_path / 'info.json')!r}))
from vartrix_tpu.driver import _main
_main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
       "-c", info["barcodes"], "-o", {str(tmp_path / 'dist.mtx')!r},
       "--backend", "cpu", "-s", "coverage",
       "--ref-matrix", {str(tmp_path / 'dist.ref')!r}, "--umi",
       "--distributed", "localhost:29881,2," + str(rank)])
""")
    procs = [subprocess.Popen([sys.executable, str(worker), str(r)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=ENV) for r in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-1500:]
    assert canon(tmp_path / "dist.mtx") == canon(full)
    assert canon(tmp_path / "dist.ref") == canon(tmp_path / "single.ref")
