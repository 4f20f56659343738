"""Unit tests for the genomics IO layer (the layers the reference gets from
htslib/rust-bio, built from scratch here)."""

import gzip

import numpy as np
import pytest

from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.barcodes import load_barcodes
from vartrix_tpu.io.fasta import IndexedFasta
from vartrix_tpu.io.matrix_market import TriMat, format_f64, read_matrix_market, write_matrix_market
from vartrix_tpu.io.vcf import read_vcf_records

T = "/root/reference/test"


class TestFasta:
    def test_lengths(self):
        fa = IndexedFasta(f"{T}/test.fa")
        assert [e.name for e in fa.index.sequences()] == ["1", "17", "2", "7"]
        assert fa.chrom_len("1") == 400

    def test_fetch_matches_whole_file_parse(self):
        fa = IndexedFasta(f"{T}/test.fa")
        # parse the fasta by hand
        seqs = {}
        name = None
        for line in open(f"{T}/test.fa"):
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs[name] = ""
            else:
                seqs[name] += line
        for name, seq in seqs.items():
            assert fa.fetch(name, 0, 400) == seq.encode()
            assert fa.fetch(name, 13, 57) == seq[13:57].encode()
            # clamping
            assert fa.fetch(name, 390, 500) == seq[390:].encode()

    def test_multiline_fasta(self, tmp_path):
        seq = "ACGTACGTGGTTAACCACGT" * 5
        p = tmp_path / "m.fa"
        lines = [seq[i : i + 13] for i in range(0, len(seq), 13)]
        p.write_text(">c1 desc\n" + "\n".join(lines) + "\n")
        offset = len(">c1 desc\n")
        (tmp_path / "m.fa.fai").write_text(f"c1\t{len(seq)}\t{offset}\t13\t14\n")
        fa = IndexedFasta(str(p))
        assert fa.fetch("c1", 0, len(seq)) == seq.encode()
        assert fa.fetch("c1", 12, 40) == seq[12:40].encode()
        assert fa.fetch("c1", 13, 26) == seq[13:26].encode()


class TestVcf:
    def test_records(self):
        recs = read_vcf_records(f"{T}/test.vcf")
        assert len(recs) == 4
        assert recs[0].chrom == "1" and recs[0].pos == 199
        assert recs[0].ref == b"C" and recs[0].alts == [b"G"]

    def test_dna_vcf_indels(self):
        recs = read_vcf_records(f"{T}/test_dna.vcf")
        assert len(recs) == 46
        assert any(len(r.ref) > 1 for r in recs)       # deletions
        assert any(len(r.alts[0]) > 1 for r in recs)   # insertions

    def test_multiallelic_and_empty_alt(self, tmp_path):
        p = tmp_path / "t.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "1\t100\t.\tA\tC,G\t.\t.\t.\n"
            "1\t200\t.\tAT\t.\t.\t.\t.\n"
        )
        recs = read_vcf_records(str(p))
        assert len(recs[0].alleles) == 3
        assert len(recs[1].alleles) == 1 and recs[1].alts == []


class TestBarcodes:
    def test_dedupe_first_seen(self, tmp_path):
        p = tmp_path / "bc.tsv"
        p.write_text("AAA\nBBB\nAAA\nCCC\n")
        bcs = load_barcodes(str(p))
        assert bcs == {b"AAA": 0, b"BBB": 1, b"CCC": 2}

    def test_gz_matches_plain(self):
        assert load_barcodes(f"{T}/barcodes.tsv") == load_barcodes(f"{T}/barcodes.tsv.gz")

    def test_crlf(self, tmp_path):
        p = tmp_path / "bc.tsv"
        p.write_bytes(b"AAA\r\nBBB\r\n")
        assert load_barcodes(str(p)) == {b"AAA": 0, b"BBB": 1}


class TestBam:
    def test_record_count_and_refs(self):
        b = BamReader(f"{T}/test.bam")
        assert b.ref_names == ["1", "17", "2", "7"]
        assert b.ref_lens == [400, 400, 400, 400]
        assert sum(1 for _ in b.records()) == 1769

    def test_aux_tags(self):
        b = BamReader(f"{T}/test.bam")
        rec = next(b.records())
        cb = rec.aux_string(b"CB")
        ub = rec.aux_string(b"UB")
        assert cb is not None and cb.endswith(b"-1") or cb.endswith(b"-2")
        assert ub is not None and len(ub) == 10
        assert rec.aux_string(b"zz") is None

    def test_seq_decode(self):
        b = BamReader(f"{T}/test.bam")
        rec = next(b.records())
        seq = rec.seq_bytes()
        assert len(seq) == rec.l_seq
        assert set(seq) <= set(b"ACGTN=MRSVWYHKDB")

    def test_fetch_overlap_semantics(self):
        b = BamReader(f"{T}/test.bam")
        # count mapped reads overlapping each SNV locus [199, 200)
        for chrom in ["1", "17", "2", "7"]:
            n = sum(1 for _ in b.fetch(chrom, 199, 200))
            assert n > 0

    def test_unmapped_endpos(self):
        b = BamReader(f"{T}/test.bam")
        for rec in b.records():
            if rec.is_unmapped() and not rec.cigar:
                assert rec.endpos() == rec.pos + 1
                break


class TestMatrixMarket:
    def test_format_f64(self):
        assert format_f64(3.0) == "3"
        assert format_f64(0.0) == "0"
        assert format_f64(0.5) == "0.5"
        assert format_f64(1 / 3) == "0.3333333333333333"
        assert format_f64(float("nan")) == "NaN"
        assert format_f64(2 / 3) == "0.6666666666666666"

    def test_roundtrip(self, tmp_path):
        m = TriMat((5, 7))
        m.add_triplet(0, 0, 1.0)
        m.add_triplet(4, 6, 0.25)
        m.add_triplet(2, 3, 0.0)
        p = tmp_path / "m.mtx"
        write_matrix_market(str(p), m)
        lines = p.read_text().splitlines()
        assert lines[0] == "%%MatrixMarket matrix coordinate real general"
        assert lines[1] == "% written by sprs"
        assert lines[2] == "5 7 3"
        assert lines[3] == "1 1 1"
        m2 = read_matrix_market(str(p))
        assert m2.to_canonical() == m.to_canonical()

    def test_reads_reference_goldens(self):
        m = read_matrix_market(f"{T}/test_consensus.mtx")
        assert m.shape == (4, 20) and m.nnz() == 4
        m = read_matrix_market(f"{T}/test_dna.mtx")
        assert m.shape == (46, 1331) and m.nnz() == 1103

    def test_canonical_sums_duplicates(self):
        m = TriMat((2, 2))
        m.add_triplet(0, 1, 1.0)
        m.add_triplet(0, 1, 2.0)
        assert m.to_canonical()[1] == [((0, 1), 3.0)]

    def test_native_format_matches_format_f64(self):
        """The C++ body formatter must agree byte-for-byte with the Python
        Rust-Display reimplementation on edge values and fuzz."""
        from vartrix_tpu.io.bam_native import mtx_format_native, native_available
        if not native_available() or mtx_format_native(
                np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0)) is None:
            pytest.skip("libgenomio mtx symbols unavailable")
        rng = np.random.default_rng(7)
        vals = np.concatenate([
            np.array([0.0, -0.0, 3.0, -17.0, 0.47, 1 / 3, 0.1, 1e-8, 1e20,
                      1e16, 1e15 + 0.5, np.nan, np.inf, -np.inf, 2 / 3, 0.75,
                      123456.789, 5e-324, 1.7976931348623157e308, -1e-300,
                      5.917902291714478e16]),
            rng.random(2000),
            rng.random(2000) * np.exp(rng.normal(0, 60, 2000)),
            rng.integers(-10, 10, 500).astype(float),
        ])
        body = mtx_format_native(np.arange(1, len(vals) + 1),
                                 np.ones(len(vals), np.int64), vals)
        strs = [l.split(" ", 2)[2] for l in body.decode().splitlines()]
        for v, s in zip(vals.tolist(), strs):
            assert format_f64(v) == s, (repr(v), format_f64(v), s)

    def test_native_parse_roundtrip_and_errors(self):
        from vartrix_tpu.io.bam_native import (mtx_format_native,
                                               mtx_parse_native,
                                               native_available)
        if not native_available() or mtx_format_native(
                np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0)) is None:
            pytest.skip("libgenomio mtx symbols unavailable")
        rng = np.random.default_rng(3)
        r = rng.integers(1, 1000, 5000)
        c = rng.integers(1, 50, 5000)
        v = np.concatenate([rng.random(4999), [np.nan]])
        body = mtx_format_native(r, c, v)
        r2, c2, v2 = mtx_parse_native(body, 5000)
        assert (r2 == r).all() and (c2 == c).all()
        assert ((v2 == v) | (np.isnan(v2) & np.isnan(v))).all()
        with pytest.raises(ValueError):
            mtx_parse_native(b"1.5 2 3\n", 1)  # non-integer index
        with pytest.raises(ValueError):
            mtx_parse_native(b"1 2 3\n", 2)  # truncated body

    def test_bulk_and_scalar_adds_interleave(self, tmp_path):
        m = TriMat((10, 10))
        m.add_triplet(0, 0, 1.0)
        m.add_triplets([1, 2], [3, 4], [0.5, np.nan])
        m.add_triplet(9, 9, -2.0)
        assert m.nnz() == 4
        assert m.rows.tolist() == [0, 1, 2, 9]
        assert m.data[1] == 0.5 and np.isnan(m.data[2])
        p = tmp_path / "i.mtx"
        write_matrix_market(str(p), m)
        m2 = read_matrix_market(str(p))
        assert m2.rows.tolist() == m.rows.tolist()
        assert m2.cols.tolist() == m.cols.tolist()
        body = p.read_text().splitlines()[3:]
        assert body == ["1 1 1", "2 4 0.5", "3 5 NaN", "10 10 -2"]
