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
