"""Banded-SW parity: invariants of the chained-band oracle and the
--sw-mode banded CLI mode (reference rust-bio banding behavior,
/root/reference/src/main.rs:898-901)."""

import numpy as np
import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.matrix_market import read_matrix_market

T = "/root/reference/test"


def _native():
    from vartrix_tpu.ops.sw_native import native_available
    if not native_available():
        pytest.skip("native CPU aligner unavailable")


class TestChainedBandInvariants:
    def test_banded_never_exceeds_full(self):
        _native()
        from vartrix_tpu.ops.sw_native import (banded_sw_chained_batch_native,
                                               full_sw_batch_native)
        import sys
        sys.path.insert(0, "tools")
        from banded_parity import make_pairs
        for tier in ("clean", "indel8", "indel40", "repeat", "noisy20",
                     "chimeric", "random"):
            xs, yr, ya = make_pairs(tier, 300, seed=1)
            for haps in (yr, ya):
                full = full_sw_batch_native(xs, haps, 2)
                band = banded_sw_chained_batch_native(xs, haps, 2)
                assert (band <= full).all(), tier

    def test_zero_divergence_on_clean_reads(self):
        _native()
        from vartrix_tpu.ops.sw_native import (banded_sw_chained_batch_native,
                                               full_sw_batch_native)
        import sys
        sys.path.insert(0, "tools")
        from banded_parity import make_pairs
        for tier in ("clean", "indel8", "chimeric"):
            xs, yr, ya = make_pairs(tier, 500, seed=2)
            for haps in (yr, ya):
                full = full_sw_batch_native(xs, haps, 2)
                band = banded_sw_chained_batch_native(xs, haps, 2)
                assert (band == full).all(), tier

    def test_no_kmer_match_scores_zero(self):
        _native()
        from vartrix_tpu.ops.sw_native import banded_sw_chained_batch_native
        # x and y share no 6-mer: banded (unseeded) must return 0
        out = banded_sw_chained_batch_native(
            [b"ACACACACACAC"], [b"GTGTGTGTGTGT"], 1)
        assert out[0] == 0

    def test_short_pair_falls_back_to_full(self):
        _native()
        from vartrix_tpu.ops.sw_native import (banded_sw_chained_batch_native,
                                               full_sw_batch_native)
        xs, ys = [b"ACGT"], [b"TTACGTTT"]
        assert banded_sw_chained_batch_native(xs, ys, 1)[0] == \
            full_sw_batch_native(xs, ys, 1)[0]


class TestBandedCliMode:
    @pytest.mark.parametrize("host", ["native", "python"])
    def test_banded_mode_stays_golden(self, tmp_path, host):
        """The bundled goldens have zero banded/full divergence, so
        --sw-mode banded must reproduce them exactly too."""
        _native()
        out = tmp_path / f"b_{host}.mtx"
        _main(["-v", f"{T}/test.vcf", "-b", f"{T}/test.bam",
               "-f", f"{T}/test.fa", "-c", f"{T}/barcodes.tsv",
               "-o", str(out), "--host", host, "--sw-mode", "banded"])
        assert read_matrix_market(str(out)).to_canonical() == \
            read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()


def test_banded_tpu_scorer_equals_cpu():
    # device-side banded DP (band-masked Pallas kernel over host-built
    # chained-band bounds) must EXACTLY equal the native CPU banded
    # aligner — same band construction, same boundary semantics
    import numpy as np

    from vartrix_tpu.ops.sw_native import (banded_sw_chained_batch_native,
                                           native_available)
    from vartrix_tpu.ops.sw_pallas_v2 import make_banded_tpu_scorer

    if not native_available():
        import pytest
        pytest.skip("native swlib unavailable")
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", np.uint8)
    B, lx, ly = 256, 48, 64
    x = np.zeros((B, lx), np.uint8)
    y = np.ones((B, ly), np.uint8)
    for i in range(B):
        yl = int(rng.integers(8, ly + 1))
        hap = rng.choice(bases, yl)
        xl = int(rng.integers(4, lx + 1))
        if rng.random() < 0.6 and yl > xl:
            s = int(rng.integers(0, yl - xl))
            read = hap[s : s + xl].copy()
            mut = rng.random(xl) < 0.08
            read[mut] = rng.choice(bases, int(mut.sum()))
            # occasional indel so bands bend
            if rng.random() < 0.3 and xl > 10:
                p = int(rng.integers(2, xl - 2))
                read = np.delete(read, p)
                xl -= 1
        else:
            read = rng.choice(bases, xl)
        x[i, :xl] = read
        y[i, :yl] = hap
    scorer = make_banded_tpu_scorer(2)
    got = scorer(x, y)
    xs = [bytes(r[r != 0]) for r in x]
    ys = [bytes(r[r != 1]) for r in y]
    exp = banded_sw_chained_batch_native(xs, ys, 2)
    np.testing.assert_array_equal(got, exp)


def test_banded_tpu_golden_cli(tmp_path):
    # --sw-mode banded --backend tpu stays golden-equal (interpret here)
    from vartrix_tpu.driver import _main
    from vartrix_tpu.io.matrix_market import read_matrix_market

    T = "/root/reference/test"
    out = str(tmp_path / "banded_tpu.mtx")
    _main(["-v", f"{T}/test.vcf", "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", out,
           "--sw-mode", "banded", "--backend", "tpu", "--host", "native"])
    a = read_matrix_market(out).to_canonical()
    g = read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()
    assert a == g
