"""Tests for the BCF binary format and BAI indexed region queries."""

import numpy as np
import pytest

from vartrix_tpu.io.bai import BaiIndex, IndexedBamReader, reg2bins
from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.bcf import read_bcf_records, write_bcf
from vartrix_tpu.io.vcf import VcfRecord, read_vcf_records

T = "/root/reference/test"


class TestBcf:
    def test_roundtrip_dna_vcf(self, tmp_path):
        recs = read_vcf_records(f"{T}/test_dna.vcf")
        chroms = sorted({r.chrom for r in recs})
        p = tmp_path / "t.bcf"
        write_bcf(str(p), [(c, 240000) for c in chroms], recs)
        back = read_vcf_records(str(p))  # auto-detected as BCF
        assert len(back) == len(recs)
        for a, b in zip(recs, back):
            assert (a.chrom, a.pos, a.ref, a.alts) == (b.chrom, b.pos, b.ref, b.alts)

    def test_empty_alt_and_multiallelic(self, tmp_path):
        special = [VcfRecord("c1", 10, b"AT", []),
                   VcfRecord("c1", 50, b"A", [b"C", b"G"]),
                   VcfRecord("c1", 99, b"G", [b"G" + b"A" * 20])]  # long allele
        p = tmp_path / "s.bcf"
        write_bcf(str(p), [("c1", 1000)], special)
        back = read_vcf_records(str(p))
        assert [(r.pos, r.ref, r.alts) for r in back] == \
               [(r.pos, r.ref, r.alts) for r in special]

    def test_pipeline_accepts_bcf(self, tmp_path):
        from vartrix_tpu.driver import _main
        from vartrix_tpu.io.matrix_market import read_matrix_market

        recs = read_vcf_records(f"{T}/test.vcf")
        p = tmp_path / "v.bcf"
        write_bcf(str(p), [(c, 400) for c in ["1", "17", "2", "7"]], recs)
        out = tmp_path / "o.mtx"
        _main(["-v", str(p), "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
               "-c", f"{T}/barcodes.tsv", "-o", str(out), "--backend", "cpu"])
        assert read_matrix_market(str(out)).to_canonical() == \
               read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()


class TestBai:
    def test_reg2bins_level0(self):
        assert 0 in reg2bins(0, 1)
        assert 4681 in reg2bins(0, 1)  # 16kb leaf of position 0

    def test_parse_reference_index(self):
        idx = BaiIndex(f"{T}/test.bam.bai")
        assert len(idx.bins) == 4

    @pytest.mark.parametrize("chrom,s,e", [
        ("1", 195, 206), ("1", 0, 400), ("17", 150, 250),
        ("2", 199, 200), ("7", 300, 400), ("7", 0, 50)])
    def test_indexed_fetch_matches_linear(self, chrom, s, e):
        lin = BamReader(f"{T}/test.bam")
        idx = IndexedBamReader(f"{T}/test.bam")
        a = [(r.pos, r.qname) for r in lin.fetch(chrom, s, e)]
        b = [(r.pos, r.qname) for r in idx.fetch(chrom, s, e)]
        assert a == b

    def test_indexed_fetch_on_written_bam(self, tmp_path):
        # write_bam emits a REAL .bai (bins + linear index): indexed fetch
        # must find the record, and miss regions must stay empty
        from vartrix_tpu.io.bam_writer import encode_record, write_bam
        p = tmp_path / "w.bam"
        write_bam(str(p), [("c1", 1000)],
                  [encode_record(b"r", 0, 0, 10, 60, [(0, 5)], b"ACGTA")])
        idx = IndexedBamReader(str(p))
        recs = list(idx.fetch("c1", 0, 1000))
        assert len(recs) == 1 and recs[0].pos == 10 and recs[0].qname == b"r"
        assert list(idx.fetch("c1", 500, 1000)) == []
        assert list(idx.fetch("c1", 0, 10)) == []  # ends before rec start

    def test_build_bai_matches_htslib_index(self, tmp_path):
        """build_bai (the `samtools index` capability) on the reference
        BAM: fetches via our built index == via the bundled htslib .bai
        == linear scan."""
        import shutil
        from vartrix_tpu.io.bai import build_bai
        bam = tmp_path / "t.bam"
        shutil.copy(f"{T}/test.bam", bam)
        build_bai(str(bam))
        ours = IndexedBamReader(str(bam))
        theirs = IndexedBamReader(f"{T}/test.bam")
        lin = BamReader(f"{T}/test.bam")
        for chrom, s, e in [("1", 150, 250), ("17", 0, 400),
                            ("2", 199, 200), ("7", 390, 400), ("1", 0, 1)]:
            a = [(r.qname, r.pos) for r in ours.fetch(chrom, s, e)]
            b = [(r.qname, r.pos) for r in theirs.fetch(chrom, s, e)]
            c = [(r.qname, r.pos) for r in lin.fetch(chrom, s, e)]
            assert a == b == c, (chrom, s, e)

    def test_written_index_matches_linear_scan(self, tmp_path):
        """Round-trip: synth dataset -> real .bai -> indexed fetch equals
        the whole-file linear scan on every variant window."""
        from vartrix_tpu.utils.synth import SynthConfig, generate_dataset
        info = generate_dataset(str(tmp_path), SynthConfig(
            n_variants=20, n_cells=30, reads_per_variant=25,
            background_reads=400, seed=11))
        lin = BamReader(info["bam"])
        idx = IndexedBamReader(info["bam"])
        chroms = info["chroms"]
        for ci, pos, ref, alt in info["variants"]:
            a = [(r.pos, r.qname) for r in lin.fetch(chroms[ci], pos, pos + len(ref))]
            b = [(r.pos, r.qname) for r in idx.fetch(chroms[ci], pos, pos + len(ref))]
            assert a == b and len(a) > 0


class TestCsi:
    def _bai_to_csi_bytes(self, bai):
        """Synthesize a CSI (min_shift=14, depth=5 — identical binning to
        BAI) from parsed BAI data, for format round-trip testing."""
        import struct
        out = b"CSI\x01" + struct.pack("<iii", 14, 5, 0)
        out += struct.pack("<i", len(bai.bins))
        for bd in bai.bins:
            out += struct.pack("<i", len(bd))
            for bin_id, chunks in bd.items():
                out += struct.pack("<IQi", bin_id, 0, len(chunks))
                for cb, ce in chunks:
                    out += struct.pack("<QQ", cb, ce)
        return out

    def test_csi_fetch_matches_bai(self, tmp_path):
        from vartrix_tpu.io.bam_writer import bgzf_compress

        bai = BaiIndex(f"{T}/test.bam.bai")
        csi_path = tmp_path / "test.bam.csi"
        csi_path.write_bytes(bgzf_compress(self._bai_to_csi_bytes(bai)))
        via_bai = IndexedBamReader(f"{T}/test.bam")
        via_csi = IndexedBamReader(f"{T}/test.bam", str(csi_path))
        for chrom, s, e in [("1", 195, 206), ("17", 150, 250), ("7", 0, 400)]:
            a = [(r.pos, r.qname) for r in via_bai.fetch(chrom, s, e)]
            b = [(r.pos, r.qname) for r in via_csi.fetch(chrom, s, e)]
            assert a == b and len(a) >= 0
