"""Differential fuzzing: the native vectorized host pipeline and the
pure-Python reference pipeline must produce identical matrices on
randomized synthetic datasets across modes, filters, and CIGAR/flag
diversity (duplicates, secondary, soft clips, N-splits, deletions)."""

import os

import pytest

from vartrix_tpu.driver import _main
from vartrix_tpu.io.bam_native import native_available
from vartrix_tpu.io.matrix_market import read_matrix_market
from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libgenomio unavailable")


def canon(p):
    return read_matrix_market(str(p)).to_canonical()


@pytest.mark.parametrize("seed,extra", [
    (21, []),
    (22, ["-s", "alt_frac"]),
    (23, ["-s", "coverage"]),
    (24, ["-s", "coverage", "--umi"]),
    (25, ["--umi", "--mapq", "30"]),
    (26, ["--no-duplicates", "--primary-alignments", "-s", "coverage"]),
    (27, ["--fetch", "regions", "-s", "coverage", "--umi"]),
    (28, ["--sw-mode", "banded", "-s", "coverage", "--umi", "--mapq", "20"]),
])
def test_native_matches_python(tmp_path, seed, extra):
    # spliced-heavy for the region/banded combos: real scRNA is N-split
    # dominated and those paths must agree across hosts there too
    spliced = 0.5 if seed >= 27 else 0.04
    cfg = SynthConfig(n_variants=16, n_cells=40, reads_per_variant=40,
                      indel_frac=0.3, seed=seed, spliced_frac=spliced)
    info = generate_dataset(str(tmp_path / "data"), cfg)
    outs = {}
    metrics = {}
    for host in ("python", "native"):
        out = tmp_path / f"o_{host}.mtx"
        ref = tmp_path / f"r_{host}.mtx"
        _main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
               "-c", info["barcodes"], "-o", str(out), "--ref-matrix",
               str(ref), "--backend", "cpu", "--host", host] + extra)
        outs[host] = (canon(out), canon(ref) if "coverage" in extra else None)
    assert outs["python"] == outs["native"]


def test_metrics_match_between_hosts(tmp_path, capsys):
    """Filter-chain metrics must agree between the two host pipelines."""
    import logging

    from vartrix_tpu.core.pipeline import (PipelineArgs, collect_reads,
                                           prepare_variants)
    from vartrix_tpu.core.fast_pipeline import collect_reads_fast
    from vartrix_tpu.io.bam import BamReader
    from vartrix_tpu.io.bam_native import ColumnarBam
    from vartrix_tpu.io.barcodes import load_barcodes
    from vartrix_tpu.io.fasta import IndexedFasta
    from vartrix_tpu.io.vcf import read_vcf_records
    from vartrix_tpu.utils.metrics import Metrics

    cfg = SynthConfig(n_variants=12, n_cells=30, reads_per_variant=50,
                      indel_frac=0.3, seed=31)
    info = generate_dataset(str(tmp_path / "data"), cfg)
    barcodes = load_barcodes(info["barcodes"])
    records = read_vcf_records(info["vcf"])
    fasta = IndexedFasta(info["fasta"])
    args = PipelineArgs(mapq=20, primary=True, duplicates=True, use_umi=True)

    works_p = prepare_variants(records, fasta, args)
    collect_reads(BamReader(info["bam"]), works_p, barcodes, args)
    m_p = Metrics()
    for w in works_p:
        m_p.add(w.metrics)

    works_n = prepare_variants(records, fasta, args)
    cbam = ColumnarBam(info["bam"])
    collect_reads_fast(cbam, works_n, barcodes, args)
    m_n = Metrics()
    for w in works_n:
        m_n.add(w.metrics)

    assert m_p.as_dict() == m_n.as_dict()
    assert m_p.num_reads > 0


@pytest.mark.parametrize("extra", [
    [], ["--umi"], ["-s", "alt_frac"], ["-s", "alt_frac", "--umi"],
    ["-s", "coverage"], ["-s", "coverage", "--umi"],
])
def test_device_agg_matches_host_agg(tmp_path, extra):
    """--device-agg (on-accelerator scatter-add + UMI consensus) must be
    byte-identical to the host aggregation in every mode."""
    cfg = SynthConfig(n_variants=14, n_cells=35, reads_per_variant=35,
                      indel_frac=0.25, seed=61)
    info = generate_dataset(str(tmp_path / "d"), cfg)
    outs = {}
    for da in (False, True):
        o = tmp_path / f"o{da}.mtx"
        r = tmp_path / f"r{da}.mtx"
        _main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
               "-c", info["barcodes"], "-o", str(o), "--ref-matrix", str(r),
               "--backend", "cpu", "--host", "native"]
              + (["--device-agg"] if da else []) + extra)
        outs[da] = (canon(o), canon(r) if "coverage" in extra else None)
    assert outs[False] == outs[True]


def test_mixed_read_lengths(tmp_path):
    """Reads of different lengths land in different kernel shape buckets;
    both hosts and both paddings must agree."""
    import numpy as np

    from vartrix_tpu.io.bam import BamReader
    from vartrix_tpu.io.bam_writer import encode_record, write_bam
    from vartrix_tpu.io.fasta import IndexedFasta

    cfg = SynthConfig(n_variants=6, n_cells=10, reads_per_variant=5, seed=91)
    info = generate_dataset(str(tmp_path / "base"), cfg)
    # rewrite the BAM with varied read lengths (30..250bp windows re-cut
    # from each read's own sequence)
    rng = np.random.default_rng(0)
    fa = IndexedFasta(info["fasta"])
    src = BamReader(info["bam"])
    out_records = []
    for i, rec in enumerate(src.records()):
        L = int(rng.choice([40, 80, 150, 250]))
        chrom = src.ref_names[rec.tid]
        seq = fa.fetch(chrom, rec.pos, rec.pos + L)
        if len(seq) < 20:
            continue
        tags = [(t, rec.aux_string(t)) for t in (b"CB", b"UB")
                if rec.aux_string(t) is not None]
        out_records.append(encode_record(
            qname=f"m{i}".encode(), flag=rec.flag & ~0x900, tid=rec.tid,
            pos=rec.pos, mapq=60, cigar=[(0, len(seq))], seq=seq, tags=tags))
    mixed = tmp_path / "mixed.bam"
    write_bam(str(mixed), list(zip(src.ref_names, src.ref_lens)), out_records)

    outs = {}
    for host in ("python", "native"):
        o = tmp_path / f"o_{host}.mtx"
        _main(["-v", info["vcf"], "-b", str(mixed), "-f", info["fasta"],
               "-c", info["barcodes"], "-o", str(o), "--backend", "cpu",
               "--host", host, "-s", "coverage",
               "--ref-matrix", str(tmp_path / f"r_{host}.mtx")])
        outs[host] = (canon(o), canon(tmp_path / f"r_{host}.mtx"))
    assert outs["python"] == outs["native"]
    assert outs["python"][0][0] == (cfg.n_variants, cfg.n_cells)


def test_edge_variants_native_matches_python(tmp_path):
    """Variants at chromosome start/end: clamped haplotype padding
    (src/main.rs:978-980) through the FULL pipeline, both hosts."""
    import numpy as np

    from vartrix_tpu.io.bam_writer import encode_record, write_bam

    rng = np.random.default_rng(5)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 400).tobytes())
    fa = tmp_path / "g.fa"
    fa.write_bytes(b">c\n" + seq + b"\n")
    (tmp_path / "g.fa.fai").write_text(f"c\t400\t3\t400\t401\n")
    # variants at pos 2 (left clamp), 200 (interior), 397 (right clamp)
    vcf = tmp_path / "v.vcf"
    alt0 = b"T" if seq[2:3] != b"T" else b"A"
    alt1 = b"G" if seq[200:201] != b"G" else b"C"
    alt2 = b"A" if seq[397:398] != b"A" else b"G"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"c\t3\t.\t{seq[2:3].decode()}\t{alt0.decode()}\t.\t.\t.\n"
        f"c\t201\t.\t{seq[200:201].decode()}\t{alt1.decode()}\t.\t.\t.\n"
        f"c\t398\t.\t{seq[397:398].decode()}\t{alt2.decode()}\t.\t.\t.\n")
    bcs = [b"AAAC-1", b"GGGT-1"]
    (tmp_path / "bc.tsv").write_bytes(b"\n".join(bcs) + b"\n")
    recs = []
    for i, (vpos, alt) in enumerate([(2, alt0), (200, alt1), (397, alt2)]):
        lo = max(0, min(vpos - 40, 400 - 80))
        for k in range(6):
            start = max(0, lo + 5 * k)
            r = bytearray(seq[start : start + 80])
            carries_alt = k % 2 == 0
            if carries_alt and start <= vpos < start + 80:
                r[vpos - start] = alt[0]
            recs.append(encode_record(
                qname=f"r{i}_{k}".encode(), flag=0, tid=0, pos=start,
                mapq=60, cigar=[(0, len(r))], seq=bytes(r),
                tags=[(b"CB", bcs[k % 2]), (b"UB", f"U{i}{k}".encode())]))
    recs.sort(key=lambda b: int.from_bytes(b[8:12], "little"))
    bam = tmp_path / "e.bam"
    write_bam(str(bam), [("c", 400)], recs)
    outs = {}
    for host in ("python", "native"):
        out = tmp_path / f"edge_{host}.mtx"
        _main(["-v", str(vcf), "-b", str(bam), "-f", str(fa),
               "-c", str(tmp_path / "bc.tsv"), "-o", str(out),
               "-s", "coverage", "--ref-matrix",
               str(tmp_path / f"edge_r_{host}.mtx"),
               "--backend", "cpu", "--host", host])
        outs[host] = (canon(out), canon(tmp_path / f"edge_r_{host}.mtx"))
    assert outs["python"] == outs["native"]
    # the matrix must be non-trivial (edge variants actually genotyped)
    shape, entries = outs["python"][0]
    assert shape == (3, 2) and len(entries) > 0


def test_custom_bam_tag_matches_cb(tmp_path):
    """--bam-tag: cell barcodes read from a non-default tag (reference
    src/main.rs:97-101,737-750) must produce the same matrix as the CB run,
    on both hosts."""
    from vartrix_tpu.io.bam import BamReader
    from vartrix_tpu.io.bam_writer import encode_record, write_bam

    cfg = SynthConfig(n_variants=12, n_cells=30, reads_per_variant=40, seed=31)
    info = generate_dataset(str(tmp_path / "d"), cfg)
    # rewrite the BAM with CB renamed to XC
    src = BamReader(info["bam"])
    recs = []
    for r in src.records():
        tags = []
        cb = r.aux_string(b"CB")
        ub = r.aux_string(b"UB")
        if cb is not None:
            tags.append((b"XC", cb))
        if ub is not None:
            tags.append((b"UB", ub))
        recs.append(encode_record(
            qname=r.qname, flag=r.flag, tid=r.tid, pos=r.pos, mapq=r.mapq,
            cigar=r.cigar, seq=r.seq_bytes(), tags=tags))
    xc_bam = tmp_path / "xc.bam"
    write_bam(str(xc_bam), list(zip(src.ref_names, src.ref_lens)), recs)

    outs = {}
    for host in ("python", "native"):
        base = tmp_path / f"cb_{host}.mtx"
        _main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
               "-c", info["barcodes"], "-o", str(base), "--umi",
               "--backend", "cpu", "--host", host])
        alt = tmp_path / f"xc_{host}.mtx"
        _main(["-v", info["vcf"], "-b", str(xc_bam), "-f", info["fasta"],
               "-c", info["barcodes"], "-o", str(alt), "--umi",
               "--bam-tag", "XC", "--backend", "cpu", "--host", host])
        outs[host] = (canon(base), canon(alt))
        assert outs[host][0] == outs[host][1], host
    assert outs["python"] == outs["native"]


def test_record_skip_semantics_full_pipeline(tmp_path, caplog):
    """Multi-allelic, symbolic/invalid-char ALTs: rows stay in the matrix
    dims but get no entries; metrics count them; hosts agree
    (src/main.rs:646-653,675-684)."""
    import numpy as np

    from vartrix_tpu.io.bam_writer import encode_record, write_bam

    rng = np.random.default_rng(77)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes())
    (tmp_path / "g.fa").write_bytes(b">c\n" + seq + b"\n")
    (tmp_path / "g.fa.fai").write_text("c\t600\t3\t600\t601\n")
    ref_at = lambda p: seq[p:p+1].decode()
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"c\t101\t.\t{ref_at(100)}\tT\t.\t.\t.\n"          # normal (or tie)
        f"c\t201\t.\t{ref_at(200)}\tA,G\t.\t.\t.\n"        # multi-allelic -> skip
        f"c\t301\t.\t{ref_at(300)}\t<DEL>\t.\t.\t.\n"      # symbolic -> invalid chars
        f"c\t401\t.\t{ref_at(400)}\tg\t.\t.\t.\n"          # lowercase alt: allowed
        f"c\t501\t.\t{ref_at(500)}\tN\t.\t.\t.\n")         # N -> invalid chars
    (tmp_path / "bc.tsv").write_bytes(b"AAAC-1\n")
    recs = []
    for i, vpos in enumerate([100, 200, 300, 400, 500]):
        for k in range(4):
            start = vpos - 40 + 3 * k
            r = bytearray(seq[start:start + 80])
            if k % 2 == 0:
                r[vpos - start] = b"T"[0] if i == 0 else b"G"[0]
            recs.append(encode_record(
                qname=f"q{i}_{k}".encode(), flag=0, tid=0, pos=start, mapq=60,
                cigar=[(0, 80)], seq=bytes(r),
                tags=[(b"CB", b"AAAC-1"), (b"UB", f"U{i}{k}".encode())]))
    bam = tmp_path / "s.bam"
    write_bam(str(bam), [("c", 600)], recs)

    outs = {}
    for host in ("python", "native"):
        o = tmp_path / f"sk_{host}.mtx"
        _main(["-v", str(vcf), "-b", str(bam), "-f", str(tmp_path / "g.fa"),
               "-c", str(tmp_path / "bc.tsv"), "-o", str(o),
               "-s", "coverage", "--ref-matrix",
               str(tmp_path / f"skr_{host}.mtx"),
               "--backend", "cpu", "--host", host])
        outs[host] = (canon(o), canon(tmp_path / f"skr_{host}.mtx"))
    assert outs["python"] == outs["native"]
    shape, entries = outs["python"][0]
    assert shape == (5, 1)  # skipped rows still count in dims
    rows_with_entries = {r for (r, c), v in entries}
    assert rows_with_entries <= {0, 3}   # only the valid records genotyped
    assert 1 not in rows_with_entries    # multi-allelic left empty
    assert 2 not in rows_with_entries    # symbolic ALT left empty
    assert 4 not in rows_with_entries    # N ALT left empty


def test_zero_variant_vcf_writes_empty_matrix(tmp_path):
    """A header-only VCF still produces a valid (0 x n_cells) matrix
    (src/main.rs:190-192 equivalent warning path)."""
    T = "/root/reference/test"
    vcf = tmp_path / "empty.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    o = tmp_path / "z.mtx"
    _main(["-v", str(vcf), "-b", f"{T}/test.bam", "-f", f"{T}/test.fa",
           "-c", f"{T}/barcodes.tsv", "-o", str(o),
           "--backend", "cpu", "--host", "native"])
    shape, entries = canon(o)
    assert shape == (0, 20) and entries == []


def test_scdna_variant_set_differential(tmp_path):
    """The bundled scDNA VCF (46 GIAB-style records: SNVs, indels to 15bp,
    the adjacent del/ins pair at 49514/49515) against its real FASTA, with
    a synthesized BAM (the reference's test_dna.bam is absent from this
    mount): both hosts and both scoring paths must agree, and indel rows
    must be genotyped."""
    import numpy as np

    from vartrix_tpu.io.bam_writer import encode_record, write_bam
    from vartrix_tpu.io.fasta import IndexedFasta
    from vartrix_tpu.io.vcf import read_vcf_records

    T = "/root/reference/test"
    recs = read_vcf_records(f"{T}/test_dna.vcf")
    assert len(recs) == 46
    fa = IndexedFasta(f"{T}/test_dna.fa")
    rng = np.random.default_rng(101)
    bcs = [l.strip() for l in open(f"{T}/dna_barcodes.tsv", "rb")][:50]
    reads = []
    for vi, rec in enumerate(recs):
        pos0 = rec.pos  # 0-based in our parser? (reference uses rec.pos())
        ref_len = len(rec.ref)
        alt = rec.alts[0] if rec.alts else b""
        for k in range(8):
            start = max(0, pos0 - 100 + 12 * k)
            hap = bytearray(fa.fetch("1", start, start + 170).upper())
            off = pos0 - start
            carries_alt = k % 2 == 0
            if carries_alt and 0 <= off and off + ref_len <= len(hap):
                hap[off : off + ref_len] = alt.upper()
            seq = bytes(hap[:150])
            if len(seq) < 50 or seq.count(b"N") > 10:
                continue
            reads.append(encode_record(
                qname=f"d{vi}_{k}".encode(), flag=0, tid=0, pos=start,
                mapq=60, cigar=[(0, len(seq))], seq=seq,
                tags=[(b"CB", bcs[(vi * 8 + k) % len(bcs)]),
                      (b"UB", f"U{vi}_{k}".encode())]))
    reads.sort(key=lambda b: int.from_bytes(b[8:12], "little"))
    bam = tmp_path / "dna.bam"
    write_bam(str(bam), [("1", fa.chrom_len("1"))], reads)
    (tmp_path / "bc.tsv").write_bytes(b"\n".join(bcs) + b"\n")

    outs = {}
    for host in ("python", "native"):
        o = tmp_path / f"dna_{host}.mtx"
        r = tmp_path / f"dnar_{host}.mtx"
        _main(["-v", f"{T}/test_dna.vcf", "-b", str(bam),
               "-f", f"{T}/test_dna.fa", "-c", str(tmp_path / "bc.tsv"),
               "-o", str(o), "-s", "coverage", "--ref-matrix", str(r),
               "--umi", "--backend", "cpu", "--host", host])
        outs[host] = (canon(o), canon(r))
    assert outs["python"] == outs["native"]
    shape, entries = outs["python"][0]
    assert shape == (46, 50)
    rows_hit = {rc[0] for rc, v in entries}
    indel_rows = {i for i, rec in enumerate(recs)
                  if rec.alts and len(rec.ref) != len(rec.alts[0])}
    assert rows_hit & indel_rows, "no indel row genotyped"
    assert len(rows_hit) > 30
