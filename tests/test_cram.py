"""CRAM 3.0 format tests: varints, round-trips (verbatim and
reference-based profiles), and end-to-end pipeline equality."""

import os

import numpy as np
import pytest

from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.cram import (CramReader, read_itf8, read_ltf8, write_cram,
                                 write_itf8, write_ltf8)

T = "/root/reference/test"

FAKE_CRAI = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff\x03\x00\x00\x00\x00\x00"


class TestVarints:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 0x3FFF, 0x4000, 0x3FFFFF,
                                   0x400000, 0x0FFFFFFF, 0x10000000,
                                   0x7FFFFFFF, -1, -2])
    def test_itf8_roundtrip(self, v):
        buf = write_itf8(v)
        got, off = read_itf8(buf, 0)
        assert got == v and off == len(buf)

    @pytest.mark.parametrize("v", [0, 1, 127, 128, 1 << 14, 1 << 20, 1 << 31,
                                   (1 << 48) + 12345, (1 << 55) - 1, 1 << 55,
                                   (1 << 62), -1])
    def test_ltf8_roundtrip(self, v):
        buf = write_ltf8(v)
        got, off = read_ltf8(buf, 0)
        assert got == v and off == len(buf)


def _records_equal(r1, r2) -> bool:
    return (r1.tid == r2.tid and r1.pos == r2.pos and r1.mapq == r2.mapq
            and r1.flag == r2.flag and r1.cigar == r2.cigar
            and r1.seq_bytes() == r2.seq_bytes() and r1.qname == r2.qname
            and r1.aux_string(b"CB") == r2.aux_string(b"CB")
            and r1.aux_string(b"UB") == r2.aux_string(b"UB"))


@pytest.mark.parametrize("ref_based", [False, True])
def test_roundtrip_reference_bam(tmp_path, ref_based):
    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "t.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=f"{T}/test.fa" if ref_based else None)
    cr = CramReader(str(p), f"{T}/test.fa")
    assert cr.ref_names == b.ref_names and cr.ref_lens == b.ref_lens
    n = 0
    for r1, r2 in zip(b.records(), cr.records()):
        assert _records_equal(r1, r2), (n, r1.qname)
        n += 1
    assert n == 1769


def test_roundtrip_synthetic_cigar_diversity(tmp_path):
    """Soft clips, N-splits, deletions, duplicates — through CRAM."""
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    info = generate_dataset(str(tmp_path / "d"), SynthConfig(
        n_variants=8, n_cells=20, reads_per_variant=40, indel_frac=0.3, seed=77))
    b = BamReader(info["bam"])
    p = tmp_path / "s.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=info["fasta"])
    cr = CramReader(str(p), info["fasta"])
    n = 0
    for r1, r2 in zip(b.records(), cr.records()):
        assert _records_equal(r1, r2), (n, r1.qname, r1.cigar, r2.cigar)
        n += 1
    assert n == info["n_reads"]


def test_multi_container(tmp_path):
    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "m.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               records_per_container=500)
    cr = CramReader(str(p), f"{T}/test.fa")
    assert sum(1 for _ in cr.records()) == 1769


@pytest.mark.parametrize("host", ["python", "native"])
def test_cram_pipeline_matches_golden(tmp_path, host):
    from vartrix_tpu.driver import _main
    from vartrix_tpu.io.matrix_market import read_matrix_market

    b = BamReader(f"{T}/test.bam")
    cram = tmp_path / "test.cram"
    write_cram(str(cram), list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=f"{T}/test.fa")
    (tmp_path / "test.cram.crai").write_bytes(FAKE_CRAI)
    out = tmp_path / "o.mtx"
    _main(["-v", f"{T}/test.vcf", "-b", str(cram), "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", str(out), "--backend", "cpu",
           "--host", host])
    assert read_matrix_market(str(out)).to_canonical() == \
        read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()


def test_rans_order0_roundtrip_via_handcrafted_stream():
    """Decode a hand-built rANS order-0 stream (uniform single symbol)."""
    import struct

    from vartrix_tpu.io.cram import rans_decode_4x8

    # encode "AAAA..." with freq[65]=4096: encoder states never need
    # renorm bytes for the all-probability-1 symbol
    n = 16
    freq_table = bytes([65]) + b"\x90\x00" + bytes([0])  # sym 65, f=4096 (ITF8 2-byte), end
    states = struct.pack("<4I", *( [1 << 23] * 4 ))
    payload = bytes([0]) + struct.pack("<I", 0) + struct.pack("<I", n) \
        + freq_table + states
    out = rans_decode_4x8(payload, n)
    assert out == b"A" * n


def test_crai_indexed_fetch_matches_linear(tmp_path):
    """write_crai + indexed fetch == linear-scan fetch on every region,
    decoding only the containers the index selects."""
    from vartrix_tpu.io.cram import read_crai, write_crai

    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "idx.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               records_per_container=300, fasta_path=f"{T}/test.fa")
    write_crai(str(p), fasta_path=f"{T}/test.fa")
    entries = read_crai(str(p) + ".crai")
    assert entries, "index should be non-empty"

    plain = CramReader(str(p), f"{T}/test.fa")
    plain._crai = None  # force the linear-scan path
    indexed = CramReader(str(p), f"{T}/test.fa")
    regions = [("1", 150, 250), ("17", 0, 400), ("2", 199, 200),
               ("7", 390, 400)]
    for chrom, s, e in regions:
        a = [(r.qname, r.pos, r.flag) for r in plain.fetch(chrom, s, e)]
        c = [(r.qname, r.pos, r.flag) for r in indexed.fetch(chrom, s, e)]
        assert a == c, (chrom, s, e)
    assert indexed._crai not in (None,), "indexed reader must have used .crai"
    # the index restricted decoding: not every container was touched
    assert len(indexed._cont_cache) < len(indexed.container_offsets())


def test_crai_invalid_index_falls_back(tmp_path):
    """An unparseable/fake .crai (reference only checks existence) must not
    break fetch — it degrades to the linear scan."""
    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "f.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=f"{T}/test.fa")
    (tmp_path / "f.cram.crai").write_bytes(FAKE_CRAI)
    cr = CramReader(str(p), f"{T}/test.fa")
    got = sum(1 for _ in cr.fetch("1", 0, 400))
    assert got == sum(1 for r in BamReader(f"{T}/test.bam").fetch("1", 0, 400))


def test_crai_per_slice_entries(tmp_path):
    """write_crai emits one htslib-layout line per (slice, ref): slice
    offsets/sizes must tile each container's block region exactly."""
    from vartrix_tpu.io.cram import (_cont_geometry, read_crai, write_crai)

    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "s.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               records_per_container=400, fasta_path=f"{T}/test.fa")
    write_crai(str(p), fasta_path=f"{T}/test.fa")
    entries = read_crai(str(p) + ".crai")
    cr = CramReader(str(p), f"{T}/test.fa")
    by_cont = {}
    for seq, start0, span, coff, soff, ssize in entries:
        by_cont.setdefault(coff, []).append((soff, ssize))
    assert set(by_cont) == set(cr.container_offsets())
    for coff, slices in by_cont.items():
        landmarks, _boff, length = _cont_geometry(cr._raw, coff)
        # our writer: one slice per container; slice spans header->end
        starts = sorted({s for s, _ in slices})
        assert starts == landmarks
        for soff, ssize in slices:
            i = landmarks.index(soff)
            end = landmarks[i + 1] if i + 1 < len(landmarks) else length
            assert soff + ssize == end


def test_cram_region_transcode_and_stream(tmp_path):
    """containers_for_loci + region transcode: fewer records than the
    file, and every read overlapping a locus present."""
    from vartrix_tpu.io.cram import transcode_to_bam, write_crai

    b = BamReader(f"{T}/test.bam")
    p = tmp_path / "r.cram"
    write_cram(str(p), list(zip(b.ref_names, b.ref_lens)), b.records(),
               records_per_container=200, fasta_path=f"{T}/test.fa")
    write_crai(str(p), fasta_path=f"{T}/test.fa")
    cr = CramReader(str(p), f"{T}/test.fa")
    loci = [("1", 195, 206)]
    offs = cr.containers_for_loci(loci)
    assert offs is not None and 0 < len(offs) < len(cr.container_offsets())
    got = {(r.qname, r.pos) for r in cr.records_for_containers(offs)}
    want = {(r.qname, r.pos) for r in b.fetch("1", 195, 206)}
    assert want <= got  # superset stream; join filters by position
    out = tmp_path / "sub.bam"
    n = transcode_to_bam(str(p), str(out), f"{T}/test.fa", loci=loci)
    assert n == len(got)
    sub = {(r.qname, r.pos) for r in BamReader(str(out)).records()}
    assert sub == got


@pytest.mark.parametrize("host", ["native", "python"])
def test_cram_region_pipeline_stays_golden(tmp_path, host):
    """Full pipeline over CRAM with --fetch regions (index-selected
    container decode) must stay golden-equal."""
    from vartrix_tpu.driver import _main
    from vartrix_tpu.io.cram import write_crai
    from vartrix_tpu.io.matrix_market import read_matrix_market

    b = BamReader(f"{T}/test.bam")
    cram = tmp_path / "g.cram"
    write_cram(str(cram), list(zip(b.ref_names, b.ref_lens)), b.records(),
               records_per_container=250, fasta_path=f"{T}/test.fa")
    write_crai(str(cram), fasta_path=f"{T}/test.fa")
    out = tmp_path / f"o_{host}.mtx"
    _main(["-v", f"{T}/test.vcf", "-b", str(cram), "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", str(out), "--backend", "cpu",
           "--host", host, "--fetch", "regions"])
    assert read_matrix_market(str(out)).to_canonical() == \
        read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()


def test_cram_pipeline_with_real_crai_matches_golden(tmp_path):
    """End-to-end through the python host path with a genuine .crai: the
    per-variant fetch takes the indexed route and output stays golden."""
    from vartrix_tpu.driver import _main
    from vartrix_tpu.io.cram import write_crai
    from vartrix_tpu.io.matrix_market import read_matrix_market

    b = BamReader(f"{T}/test.bam")
    cram = tmp_path / "test.cram"
    write_cram(str(cram), list(zip(b.ref_names, b.ref_lens)), b.records(),
               fasta_path=f"{T}/test.fa")
    write_crai(str(cram), fasta_path=f"{T}/test.fa")
    out = tmp_path / "o.mtx"
    _main(["-v", f"{T}/test.vcf", "-b", str(cram), "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", str(out), "--backend", "cpu",
           "--host", "python"])
    assert read_matrix_market(str(out)).to_canonical() == \
        read_matrix_market(f"{T}/test_consensus.mtx").to_canonical()


def test_exotic_int_codecs_roundtrip():
    """GAMMA / SUBEXP / GOLOMB bit codecs: encoder (BitWriter helpers)
    and decoder (Encoding.read_int) must round-trip across value ranges
    including 0, powers of two, and truncated-binary boundaries."""
    from vartrix_tpu.io.cram import (BitReader, BitWriter, Encoding,
                                     enc_gamma, enc_golomb, enc_subexp,
                                     gamma_write, golomb_write, read_itf8,
                                     subexp_write)

    def parse_enc(blob):
        codec, off = read_itf8(blob, 0)
        plen, off = read_itf8(blob, off)
        return Encoding(codec, blob[off : off + plen])

    vals = (list(range(0, 33)) + [63, 64, 65, 127, 128, 255, 256, 1000,
                                  4095, 4096, 65535, 65536, 1 << 20])
    for offset in (1, 5):
        bw = BitWriter()
        for v in vals:
            gamma_write(bw, v, offset)
        br = BitReader(bw.getvalue())
        e = parse_enc(enc_gamma(offset))
        assert [e.read_int(br, {}) for _ in vals] == vals
    for k in (0, 1, 2, 5, 8):
        bw = BitWriter()
        for v in vals:
            subexp_write(bw, v, 0, k)
        br = BitReader(bw.getvalue())
        e = parse_enc(enc_subexp(0, k))
        assert [e.read_int(br, {}) for _ in vals] == vals
    small = [v for v in vals if v < 5000]
    for m in (1, 2, 3, 5, 8, 16, 100):
        bw = BitWriter()
        for v in small:
            golomb_write(bw, v, 0, m)
        br = BitReader(bw.getvalue())
        e = parse_enc(enc_golomb(0, m))
        assert [e.read_int(br, {}) for _ in small] == small


def test_rans_nx16_roundtrip_all_flags():
    """CRAM 3.1 rANS Nx16: every encoder flag combination (order 0/1,
    4/32-way, PACK, RLE, STRIPE) must round-trip byte-exactly on
    DNA-like, run-heavy, uniform, low-cardinality, tiny, constant and
    empty inputs."""
    import numpy as np

    from vartrix_tpu.io.cram import rans_decode_nx16, rans_encode_nx16

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    cases = {
        "dna": bytes(rng.choice(bases, 5000, p=[.4, .3, .2, .1])),
        "runs": b"".join(bytes([b]) * int(r) for b, r in zip(
            rng.integers(60, 70, 400), rng.integers(1, 30, 400))),
        "uniform": bytes(rng.integers(0, 256, 3000).astype(np.uint8)),
        "binary": bytes(rng.choice(np.frombuffer(b"01", np.uint8), 4000)),
        "tiny": b"ACG",
        "const": b"A" * 1000,
        "empty": b"",
    }
    n_enc = 0
    for raw in cases.values():
        for order in (0, 1):
            for x32 in (False, True):
                for pack in (False, True):
                    for rle in (False, True):
                        for stripe in (False, True):
                            enc = rans_encode_nx16(
                                raw, order=order, x32=x32, pack=pack,
                                rle=rle, stripe=stripe)
                            if enc is None:
                                continue
                            n_enc += 1
                            assert rans_decode_nx16(enc) == raw
    assert n_enc > 100  # the matrix mostly encodes


def test_cram31_codec_errors_and_version_gate(tmp_path):
    """Unsupported 3.1 codecs raise NAMED errors; CRAM 2.x and 4.x are
    rejected up front with actionable version messages (not a mid-decode
    codec error) by BOTH decoders."""
    import struct

    import pytest

    from vartrix_tpu.io.bam_native import cram_decode_native, get_cram_lib
    from vartrix_tpu.io.cram import (Block, CramReader, CT_EXTERNAL,
                                     read_block, write_itf8)
    import zlib

    # handcrafted block with method 7 (fqzcomp)
    blk = bytes([7, CT_EXTERNAL]) + write_itf8(1) + write_itf8(4) \
        + write_itf8(4) + b"ABCD"
    blk += struct.pack("<I", zlib.crc32(blk))
    with pytest.raises(NotImplementedError, match="fqzcomp"):
        read_block(blk, 0)

    for major, minor, frag in ((2, 1, "legacy"), (4, 0, "not")):
        p = tmp_path / f"v{major}{minor}.cram"
        p.write_bytes(b"CRAM" + bytes([major, minor]) + b"\x00" * 40)
        with pytest.raises(NotImplementedError, match=frag):
            CramReader(str(p))
        if get_cram_lib() is not None:
            with pytest.raises(RuntimeError,
                               match="legacy|version" if major == 2
                               else "version"):
                cram_decode_native(str(p), None)
