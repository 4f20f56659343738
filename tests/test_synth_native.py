"""Tests for the BAM writer round-trip, the synthetic generator, and the
native C++ SW library."""

import numpy as np
import pytest

from vartrix_tpu.io.bam import BamReader
from vartrix_tpu.io.bam_writer import encode_record, write_bam
from vartrix_tpu.ops.sw_numpy import sw_score_single


def test_bam_writer_roundtrip(tmp_path):
    recs = [
        encode_record(b"r1", 0, 0, 100, 60, [(0, 10)], b"ACGTACGTAC",
                      tags=[(b"CB", b"AAAA-1"), (b"UB", b"TTTT")]),
        encode_record(b"r2", 16, 0, 150, 30, [(4, 5), (0, 8), (2, 3), (0, 4)],
                      b"GGGGGCCCCCCCAAAA"[:17], tags=[(b"CB", b"CCCC-1")]),
        encode_record(b"r3", 4, 1, 50, 0, [], b"ACGT"),
    ]
    p = tmp_path / "t.bam"
    write_bam(str(p), [("c1", 1000), ("c2", 500)], recs)
    r = BamReader(str(p))
    assert r.ref_names == ["c1", "c2"]
    out = list(r.records())
    assert len(out) == 3
    assert out[0].qname == b"r1" and out[0].pos == 100 and out[0].mapq == 60
    assert out[0].seq_bytes() == b"ACGTACGTAC"
    assert out[0].aux_string(b"CB") == b"AAAA-1"
    assert out[0].aux_string(b"UB") == b"TTTT"
    assert out[1].cigar == [(4, 5), (0, 8), (2, 3), (0, 4)]
    assert out[1].ref_len() == 15
    assert out[2].is_unmapped() and out[2].endpos() == 51


def test_synth_dataset_pipeline_agreement(tmp_path):
    """Generated reads carry the genotype signal: consensus calls should
    largely agree with the planted genotypes."""
    from vartrix_tpu.driver import _main
    from vartrix_tpu.io.matrix_market import read_matrix_market
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    cfg = SynthConfig(n_variants=12, n_cells=30, reads_per_variant=60,
                      error_rate=0.0, indel_frac=0.2, seed=3)
    info = generate_dataset(str(tmp_path), cfg)
    out = tmp_path / "out.mtx"
    _main(["-v", info["vcf"], "-b", info["bam"], "-f", info["fasta"],
           "-c", info["barcodes"], "-o", str(out), "--backend", "cpu"])
    m = read_matrix_market(str(out))
    gt = info["genotypes"]
    n = ok = 0
    for (r, c), v in m.to_canonical()[1]:
        expected = {0: 1.0, 1: 3.0, 2: 2.0}[int(gt[r, c])]
        # het cells can legitimately show ref-only/alt-only with few reads
        if expected == 3.0:
            ok += v in (1.0, 2.0, 3.0)
        else:
            ok += v == expected
        n += 1
    assert n > 0 and ok / n > 0.95


def test_native_full_sw_matches_oracle():
    from vartrix_tpu.ops.sw_native import full_sw_batch_native, native_available

    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    xs, ys = [], []
    for i in range(100):
        lx = int(rng.integers(1, 120))
        ly = int(rng.integers(1, 180))
        x = bytes(rng.choice(list(b"ACGT"), lx).astype(np.uint8))
        y = bytearray(rng.choice(list(b"ACGT"), ly).astype(np.uint8))
        if i % 2 and ly > 12:
            s = int(rng.integers(0, ly - 8))
            m_ = min(lx, ly - s)
            y[s : s + m_] = x[:m_]
        xs.append(x)
        ys.append(bytes(y))
    got = full_sw_batch_native(xs, ys, 2)
    exp = np.array([sw_score_single(x, y) for x, y in zip(xs, ys)], np.int32)
    np.testing.assert_array_equal(got, exp)


def test_native_banded_bounded_by_full():
    from vartrix_tpu.ops.sw_native import (banded_sw_batch_native,
                                           full_sw_batch_native,
                                           native_available)

    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(6)
    xs, ys = [], []
    for _ in range(100):
        hap = rng.choice(np.frombuffer(b"ACGT", np.uint8), 201).astype(np.uint8)
        s = int(rng.integers(0, 51))
        read = hap[s : s + 150].copy()
        read[10] = read[10] ^ 6  # mutate one base (A<->G / C<->T flips)
        xs.append(read.tobytes())
        ys.append(hap.tobytes())
    full = full_sw_batch_native(xs, ys, 2)
    banded = banded_sw_batch_native(xs, ys, 2)
    assert np.all(banded <= full)
    # realistic embedded reads: band covers the optimal path
    assert (banded == full).mean() == 1.0


def test_native_gather_padded_matches_numpy():
    """gather_padded (threaded C++ memcpy) == the numpy oracle, including
    truncation (len > lx), zero-length reads and zero padding."""
    from vartrix_tpu.io.bam_native import gather_padded, native_available

    if not native_available():
        pytest.skip("libgenomio unavailable")
    rng = np.random.default_rng(42)
    lens = rng.integers(0, 200, 1000)
    off = np.zeros(1001, np.int64)
    off[1:] = np.cumsum(lens)
    pool = rng.integers(1, 255, int(off[-1])).astype(np.uint8)
    ids = rng.integers(0, 1000, 5000).astype(np.int64)
    for lx in (64, 152, 256):
        out = gather_padded(pool, off, ids, lx)
        if out is None:
            pytest.skip("stale libgenomio without gio_gather_padded")
        exp = np.zeros((len(ids), lx), np.uint8)
        for i, r in enumerate(ids):
            s = int(off[r])
            n = min(int(off[r + 1]) - s, lx)
            exp[i, :n] = pool[s:s + n]
        assert np.array_equal(out, exp)
    assert gather_padded(pool, off, np.zeros(0, np.int64), 64).shape == (0, 64)


def test_pair_and_compact_provider_match_array(monkeypatch):
    """The streaming chunk-gather protocol (x passed as a provider
    callable) must score identically to the upfront-array protocol,
    across chunk boundaries."""
    from vartrix_tpu.ops import sw_pallas_v2 as v2

    monkeypatch.setattr(v2, "CHUNK", 256)  # force multiple chunks
    rng = np.random.default_rng(7)
    R, lx, ly = 300, 48, 64
    x = rng.integers(65, 91, (R, lx)).astype(np.uint8)
    lens = rng.integers(16, lx + 1, R)
    x[np.arange(lx)[None, :] >= lens[:, None]] = 0
    hap = rng.integers(65, 91, (40, ly)).astype(np.uint8)
    idx_r = rng.integers(0, 40, R).astype(np.int32)
    idx_a = rng.integers(0, 40, R).astype(np.int32)

    base = v2.sw_scores_pair_tpu(x, hap, idx_r, idx_a)

    def prov(start, n):
        return x[start : start + n]

    prov.shape = x.shape
    assert np.array_equal(v2.sw_scores_pair_tpu(prov, hap, idx_r, idx_a),
                          base)
    cbase = v2.sw_scores_compact_tpu(x, hap, idx_r)
    assert np.array_equal(v2.sw_scores_compact_tpu(prov, hap, idx_r), cbase)
    assert np.array_equal(cbase, base[:, 0])


def test_native_tag_maps_match_python(tmp_path):
    # gio_tag_lookup / gio_tag_ids vs the Python _unique_map fallback:
    # exact equality for CB (absent -1 / unlisted -2 / listed index),
    # equality-preserving bijection for UB ids. Includes absent tags,
    # unlisted barcodes, mixed tag lengths, and repeated values.
    from vartrix_tpu.io.bam_native import ColumnarBam, native_available
    from vartrix_tpu.io.bam_writer import encode_record, write_bam

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    cbs = [b"AAAA-1", b"CCCC-1", b"GGGG-1", b"TTTTTTTT-1", b"NOPE"]
    ubs = [b"AC", b"ACGT", b"ACGTACGT", b"TTTT", b"TTTA"]
    recs = []
    for i in range(500):
        tags = []
        if i % 7 != 3:  # absent CB every 7th-ish record
            tags.append((b"CB", cbs[int(rng.integers(0, len(cbs)))]))
        if i % 5 != 2:
            tags.append((b"UB", ubs[int(rng.integers(0, len(ubs)))]))
        recs.append(encode_record(b"r%d" % i, 0, 0, 100 + i, 60,
                                  [(0, 10)], b"ACGTACGTAC", tags=tags))
    p = tmp_path / "tags.bam"
    write_bam(str(p), [("c1", 100000)], recs)
    cbam = ColumnarBam(str(p))
    barcodes = {b"AAAA-1": 0, b"CCCC-1": 1, b"GGGG-1": 2, b"TTTTTTTT-1": 3}

    got_cb = cbam.cb_indices(barcodes)
    exp_cb = cbam._unique_map(
        cbam.cb_off, cbam.cb_pool, lambda s: barcodes.get(s, -2)
    ).astype(np.int32)
    np.testing.assert_array_equal(got_cb, exp_cb)
    assert (got_cb == -2).any() and (got_cb == -1).any()  # both paths hit

    got_ub = cbam.ub_ids()

    class _NoNative:
        pass

    lib = cbam._lib
    cbam._lib = _NoNative()  # force the Python fallback
    try:
        exp_ub = cbam.ub_ids()
    finally:
        cbam._lib = lib
    assert (got_ub < 0).tolist() == (exp_ub < 0).tolist()
    for a, b in ((got_ub, exp_ub), (exp_ub, got_ub)):
        m = {}
        for x, y in zip(a.tolist(), b.tolist()):
            if x < 0:
                continue
            assert m.setdefault(x, y) == y  # bijective grouping


def test_packed_transfer_matches_unpacked(tmp_path, monkeypatch):
    """4-bit packed read transfer (gio_gather_padded_packed + device
    _unpack4): call codes through the production dispatchers must be
    IDENTICAL with and without packing, via the fast-pipeline provider."""
    from vartrix_tpu.core.fast_pipeline import _read_provider, gather_reads
    from vartrix_tpu.io.bam_native import (ColumnarBam, gather_padded_packed,
                                           native_available)
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_calls_pair_chained_tpu,
                                              sw_calls_pair_quad_tpu)
    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    if not native_available():
        pytest.skip("native library unavailable")
    data = generate_dataset(str(tmp_path / "p"), SynthConfig(
        seed=43, n_variants=10, n_cells=40, reads_per_variant=30,
        spliced_frac=0.4))
    cbam = ColumnarBam(data["bam"])
    rng = np.random.default_rng(1)
    rows = rng.integers(0, cbam.n, 300).astype(np.int64)
    lx, ly = 32, 48  # quad-feasible; reads truncate to 32 bases
    if gather_padded_packed(cbam.seq_pool, cbam.seq_off, rows[:4], lx) is None:
        pytest.skip("packed gather unavailable")
    bases = np.frombuffer(b"ACGT", np.uint8)
    haps = rng.choice(bases, size=(16, ly)).astype(np.uint8)
    xu = gather_reads(cbam, rows, lx)
    for i in range(0, len(rows), 2):  # embed >= MIN_SCORE bases
        haps[i % 16, 2 : 2 + lx - 4] = xu[i, : lx - 4]
    idx_ref = rng.integers(0, 16, len(rows)).astype(np.int32)
    idx_alt = rng.integers(0, 16, len(rows)).astype(np.int32)

    prov = _read_provider(cbam, rows, lx)
    assert callable(prov) and getattr(prov, "packed", None) is not None

    from vartrix_tpu.ops.sw_pallas_v2 import PackedHaps

    hap_off = np.arange(len(haps) + 1, dtype=np.int64) * ly
    hg = gather_padded_packed(haps.reshape(-1), hap_off,
                              np.arange(len(haps), dtype=np.int64), ly)
    assert hg is not None
    ph = PackedHaps(hg[0], hg[1], haps)

    for fn in (sw_calls_pair_quad_tpu, sw_calls_pair_chained_tpu):
        monkeypatch.setenv("VARTRIX_PACK4", "0")
        exp = fn(prov, haps, idx_ref, idx_alt)
        assert set(np.unique(exp)) - {0} != set()  # non-trivial codes
        monkeypatch.setenv("VARTRIX_PACK4", "1")
        got = fn(prov, haps, idx_ref, idx_alt)
        np.testing.assert_array_equal(got, exp)
        # haps packed too (PackedHaps wrapper, packed2 entries)
        got2 = fn(prov, ph, idx_ref, idx_alt)
        np.testing.assert_array_equal(got2, exp)
        # and PackedHaps degrades to dense when reads are unpacked
        monkeypatch.setenv("VARTRIX_PACK4", "0")
        got3 = fn(prov, ph, idx_ref, idx_alt)
        np.testing.assert_array_equal(got3, exp)
        # 2-bit read protocol (A/C/G/T synth reads qualify): identical
        # codes with it forced off vs on
        monkeypatch.setenv("VARTRIX_PACK4", "1")
        monkeypatch.setenv("VARTRIX_PACK2", "0")
        got4 = fn(prov, haps, idx_ref, idx_alt)
        np.testing.assert_array_equal(got4, exp)
        monkeypatch.setenv("VARTRIX_PACK2", "1")
        got5 = fn(prov, haps, idx_ref, idx_alt)
        np.testing.assert_array_equal(got5, exp)
        # per-chunk decline: a provider whose packed2 refuses must land
        # on the 4-bit path with identical results
        prov_no2 = _read_provider(cbam, rows, lx)
        prov_no2.packed2 = lambda s, n: None
        got6 = fn(prov_no2, haps, idx_ref, idx_alt)
        np.testing.assert_array_equal(got6, exp)
        monkeypatch.delenv("VARTRIX_PACK2")


@pytest.mark.parametrize("env", [
    {},                                     # production: fused + packed
    {"VARTRIX_FUSED_CALLS": "0"},           # scores path + PackedHaps
    {"VARTRIX_QUAD": "0"},                  # v5 chained + packed
    {"VARTRIX_PACK4": "0"},                 # dense transfer
    {"VARTRIX_PACK2": "0"},                 # 4-bit (no 2-bit reads)
    {"VARTRIX_PAIR": "0"},                  # compact protocol
])
def test_fast_pipeline_env_matrix(tmp_path, monkeypatch, env):
    """Every dispatch-protocol combination must produce identical
    matrices through the full fast pipeline (interpret-mode kernels on
    CPU; the same dispatchers run compiled on TPU)."""
    from vartrix_tpu.driver import _main

    from vartrix_tpu.utils.synth import SynthConfig, generate_dataset

    data = generate_dataset(str(tmp_path / "d"), SynthConfig(
        n_variants=8, n_cells=25, reads_per_variant=25, seed=77,
        spliced_frac=0.3, indel_frac=0.2))
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    out = str(tmp_path / "o.mtx")
    _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
           "-c", data["barcodes"], "-o", out, "--umi", "-s", "coverage",
           "--ref-matrix", str(tmp_path / "r.mtx"),
           "--host", "native", "--backend", "tpu"])
    for k in env:
        monkeypatch.delenv(k)
    ref = str(tmp_path / "o_ref.mtx")
    _main(["-v", data["vcf"], "-b", data["bam"], "-f", data["fasta"],
           "-c", data["barcodes"], "-o", ref, "--umi", "-s", "coverage",
           "--ref-matrix", str(tmp_path / "rr.mtx"),
           "--host", "native", "--backend", "cpu"])
    assert open(out).read() == open(ref).read()
    assert (open(str(tmp_path / "r.mtx")).read()
            == open(str(tmp_path / "rr.mtx")).read())
