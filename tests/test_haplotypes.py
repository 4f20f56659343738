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
