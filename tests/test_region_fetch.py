"""Indexed region-fetch path: equality with whole-file decode, bounded
decode volume, and chunk-plan mechanics.

The reference's production read path is bam.fetch(chrom, start, end) via
BAI per variant (/root/reference/src/main.rs:822-826); here the equivalent
is one merged chunk plan over all variant windows, consumed by the native
columnar loader (gio_bam_load_regions) and the Python RegionStream.
"""

import numpy as np
import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.bai import merge_chunk_lists, plan_region_fetch
from vartrix_tpu.io.matrix_market import read_matrix_market
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def sparse_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("sparse")
    info = generate_dataset(str(d), SynthConfig(
        n_chroms=2, chrom_len=2_000_000, n_variants=12, n_cells=60,
        reads_per_variant=40, background_reads=20_000, seed=9))
    return d, info


def _run(info, out, extra):
    _main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
           "-c", info["barcodes"], "-o", str(out), "--backend", "cpu",
           "-s", "coverage", "--ref-matrix", str(out) + ".ref", "--umi",
           *extra])
    return (read_matrix_market(str(out)).to_canonical(),
            read_matrix_market(str(out) + ".ref").to_canonical())


class TestRegionFetchEquality:
    @pytest.mark.parametrize("host", ["native", "python"])
    def test_regions_equals_whole(self, sparse_ds, tmp_path, host):
        d, info = sparse_ds
        whole = _run(info, tmp_path / f"w_{host}.mtx",
                     ["--host", host, "--fetch", "whole"])
        regions = _run(info, tmp_path / f"r_{host}.mtx",
                       ["--host", host, "--fetch", "regions"])
        assert whole == regions
        assert whole[0][1]  # nonempty

    def test_auto_picks_regions_for_sparse(self, sparse_ds, caplog):
        import logging
        d, info = sparse_ds
        loci = [(f"chr{c + 1}", p, p + len(r))
                for c, p, r, a in info["variants"]]
        from vartrix_tpu.io.bam import BamReader
        bam = BamReader(info["bam"], header_only=True)
        plan, frac = plan_region_fetch(info["bam"], loci, bam.tid_by_name)
        assert plan and frac < 0.5  # sparse dataset must qualify for auto


class TestRegionDecodeBounded:
    def test_decodes_fraction_of_records(self, sparse_ds):
        """The region loader must decode far fewer records than the file
        holds (memory/time bound of the whole-genome scenario)."""
        from vartrix_tpu.io.bam import BamReader
        from vartrix_tpu.io.bam_native import ColumnarBam, native_available
        if not native_available():
            pytest.skip("libgenomio unavailable")
        d, info = sparse_ds
        loci = [(f"chr{c + 1}", p, p + len(r))
                for c, p, r, a in info["variants"]]
        bam = BamReader(info["bam"], header_only=True)
        plan, frac = plan_region_fetch(info["bam"], loci, bam.tid_by_name)
        assert plan is not None
        cb = ColumnarBam(info["bam"], b"CB", chunks=np.asarray(plan))
        # every variant-local read must be present; most background reads not
        assert cb.n >= 12 * 40
        assert cb.n < info["n_reads"] * 0.5
        # decoded records must include every read overlapping a variant
        full = ColumnarBam(info["bam"], b"CB")
        for chrom, s, e in loci:
            tid = full.tid_by_name[chrom]
            want = ((full.tid == tid) & (full.pos < e) & (full.ref_end > s)).sum()
            got = ((cb.tid == tid) & (cb.pos < e) & (cb.ref_end > s)).sum()
            assert got == want


class TestStreamingDecode:
    def test_stream_equals_whole_load(self, sparse_ds, monkeypatch):
        """The bounded-memory streaming loader must produce byte-identical
        columns to the monolithic whole-file loader."""
        from vartrix_tpu.io.bam_native import ColumnarBam, native_available
        if not native_available():
            pytest.skip("libgenomio unavailable")
        d, info = sparse_ds
        monkeypatch.setenv("VARTRIX_STREAM_DECODE", "0")
        a = ColumnarBam(info["bam"], b"CB")
        monkeypatch.setenv("VARTRIX_STREAM_DECODE", "1")
        b = ColumnarBam(info["bam"], b"CB")
        assert a.n == b.n and a.ref_names == b.ref_names
        for attr in ("tid", "pos", "ref_end", "mapq", "flag", "seq_off",
                     "seq_pool", "itv_off", "itv_pool", "cb_off", "cb_pool",
                     "ub_off", "ub_pool"):
            assert np.array_equal(getattr(a, attr), getattr(b, attr)), attr


class TestChunkPlan:
    def test_merge_overlap_and_gap_bridge(self):
        a = [(0 << 16 | 0, 5 << 16 | 100)]
        b = [(3 << 16 | 0, 9 << 16 | 5)]          # overlaps a
        c = [((9 + 16384) << 16, (9 + 16385) << 16)]  # 16KB gap: bridged
        d = [((9 + 400000) << 16, (9 + 400001) << 16)]  # far: separate
        merged = merge_chunk_lists([a, b, c, d])
        assert merged == [
            (0, (9 + 16385) << 16),
            ((9 + 400000) << 16, (9 + 400001) << 16),
        ]

    def test_contained_chunk(self):
        merged = merge_chunk_lists([[(10, 1000)], [(20, 30)]])
        assert merged == [(10, 1000)]

    def test_empty(self):
        assert merge_chunk_lists([]) == []
        assert merge_chunk_lists([[], []]) == []
