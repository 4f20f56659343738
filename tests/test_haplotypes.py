"""Unit tests for haplotype construction boundary semantics
(/root/reference/src/main.rs:936-994): padding clamped to [0, chrom_len),
reference bases uppercased, ALT bytes kept raw, empty-ALT deletions."""

import pytest

from vartrix_tpu.core.haplotypes import Locus, construct_haplotypes
from vartrix_tpu.io.fasta import IndexedFasta

SEQ = b"acgtACGTttggccaaTGCAtgcaGGTTAACCggttaacc"  # 40bp, mixed case


@pytest.fixture()
def fa(tmp_path):
    p = tmp_path / "c.fa"
    p.write_bytes(b">c\n" + SEQ + b"\n")
    (tmp_path / "c.fa.fai").write_text(f"c\t{len(SEQ)}\t3\t{len(SEQ)}\t{len(SEQ)+1}\n")
    return IndexedFasta(str(p))


U = SEQ.upper()


def test_snv_middle_lowercase_alt_kept_raw(fa):
    # reference pad uppercased (src/main.rs:951-952), ALT raw (:979)
    loc = Locus("c", 20, 21)
    rref, alt = construct_haplotypes(fa, loc, b"g", padding=5)
    assert rref == U[15:26]
    assert alt == U[15:20] + b"g" + U[21:26]


def test_variant_at_position_zero_clamps_left(fa):
    # saturating_sub clamp (src/main.rs:978): no bases left of 0
    loc = Locus("c", 0, 1)
    rref, alt = construct_haplotypes(fa, loc, b"T", padding=10)
    assert rref == U[0:11]
    assert alt == b"T" + U[1:11]


def test_variant_at_chrom_end_clamps_right(fa):
    # chrom-end clamp (src/main.rs:980)
    loc = Locus("c", 39, 40)
    rref, alt = construct_haplotypes(fa, loc, b"A", padding=10)
    assert rref == U[29:40]
    assert alt == U[29:39] + b"A"


def test_padding_exceeding_chrom_covers_whole_contig(fa):
    loc = Locus("c", 20, 21)
    rref, alt = construct_haplotypes(fa, loc, b"C", padding=100)
    assert rref == U
    assert alt == U[:20] + b"C" + U[21:]


def test_empty_alt_deletion(fa):
    # empty-ALT deletion -> alt = [] (src/main.rs:656-659): alt hap is
    # just the two pads joined
    loc = Locus("c", 10, 13)
    rref, alt = construct_haplotypes(fa, loc, b"", padding=4)
    assert rref == U[6:17]
    assert alt == U[6:10] + U[13:17]


def test_insertion_lengthens_alt_hap(fa):
    loc = Locus("c", 10, 11)
    rref, alt = construct_haplotypes(fa, loc, b"TTTTT", padding=4)
    assert rref == U[6:15]
    assert alt == U[6:10] + b"TTTTT" + U[11:15]
    assert len(alt) == len(rref) + 4


def _prep(tmp_path, seq, records, valid_chars=b"ATGCatgc", padding=5):
    from vartrix_tpu.core.pipeline import PipelineArgs, prepare_variants
    from vartrix_tpu.io.vcf import VcfRecord

    p = tmp_path / "v.fa"
    p.write_bytes(b">c\n" + seq + b"\n")
    (tmp_path / "v.fa.fai").write_text(
        f"c\t{len(seq)}\t3\t{len(seq)}\t{len(seq)+1}\n")
    fa = IndexedFasta(str(p))
    recs = [VcfRecord(chrom="c", pos=pos, ref=ref, alts=[alt] if alt else [])
            for pos, ref, alt in records]
    args = PipelineArgs(valid_chars=valid_chars, padding=padding)
    return prepare_variants(recs, fa, args)


def test_invalid_chars_semantics(tmp_path):
    """The valid-chars check covers the FULL alt haplotype — uppercase
    padding AND raw ALT (src/main.rs:675-684). Pins the round-4
    decomposition (translate + per-chrom bad-position index)."""
    #        0123456789012345678901234
    seq = b"ACGTACGTACNTACGTACGTACGTA"  # N at position 10
    ws = _prep(tmp_path, seq, [
        (2, b"G", b"T"),    # padding [0,2)+[3,8) clean -> kept... N at 10
        (20, b"C", b"A"),   # padding [15,20)+[21,25) clean -> kept
        (12, b"A", b"C"),   # left padding [7,12) contains N(10) -> skipped
        (20, b"C", b"x"),   # invalid ALT byte -> skipped
        (20, b"C", b"a"),   # lowercase alt IS valid by default -> kept
        (20, b"C", b""),    # empty-ALT deletion: padding still checked
    ])
    # variant 0: padding [0,2) + [3,8) has no N -> kept
    assert not ws[0].skipped
    assert not ws[1].skipped
    assert ws[2].skipped and ws[2].metrics.num_invalid_recs == 1
    assert ws[3].skipped and ws[3].metrics.num_invalid_recs == 1
    assert not ws[4].skipped
    assert not ws[5].skipped  # deletion with clean padding
    # deletion whose padding hits the N is still skipped
    ws2 = _prep(tmp_path, seq, [(12, b"A", b"")])
    assert ws2[0].skipped and ws2[0].metrics.num_invalid_recs == 1


def test_invalid_chars_custom_valid_set(tmp_path):
    # widening --valid-chars to include N keeps the N-padding record
    seq = b"ACGTACGTACNTACGTACGTACGTA"
    ws = _prep(tmp_path, seq, [(12, b"A", b"C")], valid_chars=b"ATGCNatgcn")
    assert not ws[0].skipped


def test_prepare_variants_unsorted_vcf_row_order(tmp_path):
    """Chrom-interleaved (unsorted) VCFs: prepare_variants processes
    grouped by chromosome (one cache fill per chrom) but must return
    works in ROW order with haplotypes identical to the per-record
    constructor."""
    from vartrix_tpu.core.pipeline import PipelineArgs, prepare_variants
    from vartrix_tpu.io.vcf import VcfRecord

    seqs = {"a": b"acgtACGTttggccaaTGCA" * 3, "b": b"GGTTAACCggttaacc" * 4}
    fa_p = tmp_path / "u.fa"
    body, fai, off = b"", "", 0
    for name, s in seqs.items():
        hdr = f">{name}\n".encode()
        body += hdr + s + b"\n"
        off += len(hdr)
        fai += f"{name}\t{len(s)}\t{off}\t{len(s)}\t{len(s)+1}\n"
        off += len(s) + 1
    fa_p.write_bytes(body)
    (tmp_path / "u.fa.fai").write_text(fai)
    fa = IndexedFasta(str(fa_p))

    recs = [VcfRecord(chrom=c, pos=p, ref=b"A", alts=[b"T"])
            for c, p in [("a", 5), ("b", 3), ("a", 30), ("b", 40),
                         ("a", 50), ("b", 10)]]
    args = PipelineArgs(padding=7)
    works = prepare_variants(recs, fa, args)
    assert [w.row for w in works] == list(range(6))
    for w, rec in zip(works, recs):
        fa2 = IndexedFasta(str(fa_p))
        rref, alt_hap = construct_haplotypes(
            fa2, Locus(rec.chrom, rec.pos, rec.pos + 1), b"T", 7)
        assert w.rref == rref and w.alt_hap == alt_hap
