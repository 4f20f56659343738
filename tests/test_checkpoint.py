"""--checkpoint-dir: per-variant score spill + manifest-keyed resume
(framework extension; the reference has no checkpointing, SURVEY.md §5.4)."""

import logging

import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.bam_native import native_available
from vartrix_tpu.io.matrix_market import read_matrix_market

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libgenomio unavailable")

T = "/root/reference/test"


def _run(tmp_path, tag, ckpt, extra=()):
    out = tmp_path / f"{tag}.mtx"
    _main(["-v", f"{T}/test.vcf", "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", str(out),
           "--checkpoint-dir", str(ckpt), "--backend", "cpu",
           "--host", "native", "--log-level", "info", *extra])
    return read_matrix_market(str(out)).to_canonical()


def test_checkpoint_resume_and_invalidation(tmp_path, caplog):
    ckpt = tmp_path / "ck"
    golden = read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()

    with caplog.at_level(logging.INFO, logger="vartrix"):
        first = _run(tmp_path, "first", ckpt)
    assert first == golden
    msgs = [r.getMessage() for r in caplog.records
            if "Checkpoint" in r.getMessage()]
    assert msgs and "0 variants loaded, 4 scored" in msgs[0], msgs

    caplog.clear()
    with caplog.at_level(logging.INFO, logger="vartrix"):
        second = _run(tmp_path, "second", ckpt)
    assert second == golden
    msgs = [r.getMessage() for r in caplog.records if "Checkpoint" in r.getMessage()]
    assert msgs and "4 variants loaded, 0 scored" in msgs[0], msgs

    # a changed filter parameter must invalidate the manifest key
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="vartrix"):
        third = _run(tmp_path, "third", ckpt, extra=("--mapq", "30"))
    msgs = [r.getMessage() for r in caplog.records if "Checkpoint" in r.getMessage()]
    assert any("was created for different inputs/flags" in m for m in msgs), msgs
    assert any("0 variants loaded, 4 scored" in m for m in msgs), msgs
