"""Smith-Waterman kernel parity tests: Pallas kernel vs NumPy oracle vs a
brute-force scalar DP, plus banded-oracle properties."""

import numpy as np
import pytest

from vartrix_tpu.constants import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH
from vartrix_tpu.ops.sw_numpy import banded_sw_score, sw_score_single, sw_scores_batch


def brute_force_sw(x: bytes, y: bytes) -> int:
    NEGV = -(10**9)
    Lx, Ly = len(x), len(y)
    H = [[0] * (Ly + 1) for _ in range(Lx + 1)]
    E = [[NEGV] * (Ly + 1) for _ in range(Lx + 1)]
    F = [[NEGV] * (Ly + 1) for _ in range(Lx + 1)]
    best = 0
    for i in range(1, Lx + 1):
        for j in range(1, Ly + 1):
            s = MATCH if x[i - 1] == y[j - 1] else MISMATCH
            E[i][j] = max(H[i][j - 1] + GAP_OPEN + GAP_EXTEND, E[i][j - 1] + GAP_EXTEND)
            F[i][j] = max(H[i - 1][j] + GAP_OPEN + GAP_EXTEND, F[i - 1][j] + GAP_EXTEND)
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
            best = max(best, H[i][j])
    return best


def random_pairs(rng, n, lx_max, ly_max, embed_frac=0.3):
    pairs = []
    for i in range(n):
        lx = int(rng.integers(1, lx_max + 1))
        ly = int(rng.integers(1, ly_max + 1))
        x = bytes(rng.choice(list(b"ACGT"), lx).astype(np.uint8))
        y = bytearray(rng.choice(list(b"ACGT"), ly).astype(np.uint8))
        if rng.random() < embed_frac and ly > 10:
            s = int(rng.integers(0, ly - 5))
            m = min(lx, ly - s)
            y[s : s + m] = x[:m]
        pairs.append((x, bytes(y)))
    return pairs


def pack(pairs, lx_pad, ly_pad):
    B = len(pairs)
    xs = np.zeros((B, lx_pad), np.uint8)
    ys = np.ones((B, ly_pad), np.uint8)
    for b, (x, y) in enumerate(pairs):
        xs[b, : len(x)] = np.frombuffer(x, np.uint8)
        ys[b, : len(y)] = np.frombuffer(y, np.uint8)
    return xs, ys


def test_numpy_oracle_vs_brute_force():
    rng = np.random.default_rng(0)
    for x, y in random_pairs(rng, 60, 30, 50):
        assert sw_score_single(x, y) == brute_force_sw(x, y)


def test_gap_cost_convention():
    # a single 1-base deletion in the read costs GAP_OPEN + GAP_EXTEND = -6
    x = b"AAAACCCC"
    y = b"AAAAGCCCC"
    # best: match 8 with one 1-gap: 8*1 - 6 = 2 ... or mismatch path 4+4-5=3?
    # brute force is ground truth; just check oracle agreement and that the
    # score reflects affine costs (open charged once).
    assert sw_score_single(x, y) == brute_force_sw(x, y)
    x2 = b"AAAACCCC"
    y2 = b"AAAAGGGCCCC"  # 3-gap: 8 - (5 + 3) = 0 -> best is 4 (AAAA)
    assert sw_score_single(x2, y2) == brute_force_sw(x2, y2)


def test_pallas_kernel_matches_oracle_random():
    from vartrix_tpu.ops.sw_pallas import sw_scores_batch_tpu

    rng = np.random.default_rng(1)
    pairs = random_pairs(rng, 32, 40, 64)
    xs, ys = pack(pairs, 40, 64)
    expected = sw_scores_batch(xs, ys)
    got = sw_scores_batch_tpu(xs, ys)
    np.testing.assert_array_equal(got, expected)


def test_pallas_kernel_edge_cases():
    from vartrix_tpu.ops.sw_pallas import sw_scores_batch_tpu

    # all-pad (empty) entries, exact match, all-mismatch
    xs = np.zeros((3, 16), np.uint8)
    ys = np.ones((3, 24), np.uint8)
    xs[1, :8] = np.frombuffer(b"ACGTACGT", np.uint8)
    ys[1, 4:12] = np.frombuffer(b"ACGTACGT", np.uint8)
    xs[2, :4] = np.frombuffer(b"AAAA", np.uint8)
    ys[2, :4] = np.frombuffer(b"GGGG", np.uint8)
    got = sw_scores_batch_tpu(xs, ys)
    np.testing.assert_array_equal(got, [0, 8, 0])


def test_banded_oracle_never_exceeds_full():
    rng = np.random.default_rng(2)
    for x, y in random_pairs(rng, 15, 40, 60):
        assert banded_sw_score(x, y) <= sw_score_single(x, y)


def test_banded_equals_full_on_similar_sequences():
    # when the read is embedded in the haplotype (the common case for real
    # reads), the k-mer band covers the optimal path and the scores agree —
    # the empirical justification for using full SW on TPU.
    rng = np.random.default_rng(3)
    for _ in range(10):
        hap = bytes(rng.choice(list(b"ACGT"), 120).astype(np.uint8))
        s = int(rng.integers(0, 60))
        read = bytearray(hap[s : s + 50])
        read[10] = b"A"[0] if read[10] != b"A"[0] else b"C"[0]  # one SNV
        assert banded_sw_score(bytes(read), hap) == sw_score_single(bytes(read), hap)


def test_pallas_v2_matches_oracle_random():
    from vartrix_tpu.ops.sw_pallas_v2 import sw_scores_batch_tpu_v2

    rng = np.random.default_rng(7)
    pairs = random_pairs(rng, 48, 48, 72)
    xs, ys = pack(pairs, 48, 72)
    expected = sw_scores_batch(xs, ys)
    for unroll in (2, 4):
        got = sw_scores_batch_tpu_v2(xs, ys, unroll=unroll)
        np.testing.assert_array_equal(got, expected)


def test_pallas_v2_long_read_shapes():
    """Long-read bucket geometry (ONT/PacBio-scale: 512bp reads vs 768bp
    haplotypes) scores exactly — VMEM state at these shapes is ~5MB and
    must stay within budget."""
    from vartrix_tpu.ops.sw_pallas_v2 import sw_scores_batch_tpu_v2

    rng = np.random.default_rng(17)
    pairs = random_pairs(rng, 6, 512, 768)
    xs, ys = pack(pairs, 512, 768)
    expected = sw_scores_batch(xs, ys)
    got = sw_scores_batch_tpu_v2(xs, ys)
    np.testing.assert_array_equal(got, expected)


def test_compact2_protocol_matches_plain():
    """The fully-deduplicated device protocol (unique reads + unique haps +
    index vectors) must equal the plain batch scorer."""
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_scores_batch_tpu_v2,
                                              sw_scores_compact2_tpu)

    rng = np.random.default_rng(23)
    R, H, B, lx, ly = 20, 7, 300, 64, 96
    x_mat = np.zeros((R, lx), np.uint8)
    hap_mat = np.ones((H, ly), np.uint8)
    for i in range(R):
        L = int(rng.integers(30, lx + 1))
        x_mat[i, :L] = rng.choice(list(b"ACGT"), L)
    for j in range(H):
        L = int(rng.integers(50, ly + 1))
        hap_mat[j, :L] = rng.choice(list(b"ACGT"), L)
    x_idx = rng.integers(0, R, B).astype(np.int32)
    hap_idx = rng.integers(0, H, B).astype(np.int32)
    got = sw_scores_compact2_tpu(x_mat, x_idx, hap_mat, hap_idx)
    expected = sw_scores_batch_tpu_v2(x_mat[x_idx], hap_mat[hap_idx])
    np.testing.assert_array_equal(got, expected)


def test_fused_pair_calls_match_scores():
    # the fused score->call pair entry must return exactly
    # codes_from_scores(pair scores) — incl. MIN_SCORE drops and ties
    from vartrix_tpu.core.agg_numpy import codes_from_scores
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_calls_pair_tpu,
                                              sw_scores_pair_tpu)

    rng = np.random.default_rng(7)
    R, H = 300, 40
    lx, ly = 48, 64
    x = rng.integers(65, 91, size=(R, lx), dtype=np.uint8)
    # short reads (below MIN_SCORE reach) in a slice to exercise drops
    x[:50, 8:] = 0
    haps = rng.integers(65, 91, size=(H, ly), dtype=np.uint8)
    # make some haplotypes contain reads exactly (high scores)
    for i in range(0, 40, 3):
        haps[i % H, 4 : 4 + lx - 8] = x[i, : lx - 8]
    idx_ref = rng.integers(0, H, size=R).astype(np.int32)
    idx_alt = rng.integers(0, H, size=R).astype(np.int32)
    scores = sw_scores_pair_tpu(x, haps, idx_ref, idx_alt)
    codes = sw_calls_pair_tpu(x, haps, idx_ref, idx_alt)
    assert codes.dtype == np.int8
    np.testing.assert_array_equal(codes, codes_from_scores(scores))
    assert set(np.unique(codes)) <= {0, 1, 2, 3}


def test_chained_pair_kernel_matches_oracle():
    # v5 chained-pair kernel: one lane scores one read against ref++alt
    # chained along y; per-problem maxima must equal independent SW
    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import _sw_pair_chained

    rng = np.random.default_rng(11)
    R = 128
    lx, ly = 32, 48
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    haps = np.ones((2 * R, ly), np.uint8)
    exp = np.zeros((2, R), np.int32)
    for i in range(R):
        xl = int(rng.integers(1, lx + 1))
        x[i, :xl] = rng.choice(bases, xl)
        for w in range(2):
            if i == 5 and w == 1:
                continue  # empty alt haplotype -> score 0
            yl = int(rng.integers(1, ly + 1))
            hap = rng.choice(bases, yl)
            if rng.random() < 0.4 and yl > xl:
                # embed the read (possibly mutated) for high scores that
                # would leak across the boundary if crossing weren't killed
                s = int(rng.integers(0, yl - xl + 1))
                hap[s : s + xl] = x[i, :xl]
            haps[2 * i + w, :yl] = hap
            exp[w, i] = sw_score_single(
                bytes(x[i, :xl]), bytes(hap.tobytes()))
    idx2 = np.arange(2 * R, dtype=np.int32)
    got = np.asarray(_sw_pair_chained(
        x, haps, idx2, lx=lx, ly=ly, interpret=not _on_tpu()))
    np.testing.assert_array_equal(got, exp)


def test_mixed_gap_adversarial_exactness():
    # Round-2's kernel carried the vertical-gap F state UNSHIFTED, which
    # admits an illegal "mixed gap" (skip 1 read base + t haplotype bases
    # for a single gap-open) and overestimated this family by +2.
    # Fixed round 3 (shifted-M state); keep all kernels honest here.
    from vartrix_tpu.ops.sw_pallas_v2 import (_sw_pair_chained,
                                              sw_scores_batch_tpu_v2)
    from vartrix_tpu.ops.sw_pallas import _on_tpu

    cases = []
    for flank in (6, 10, 14):
        for ins in (1, 2, 3):
            x = b"A" * flank + b"C" + b"G" * flank
            y = b"A" * flank + b"T" * (ins + 1) + b"G" * flank
            cases.append((x, y))
            cases.append((y, x))  # transposed flavor
    exp = np.array([brute_force_sw(x, y) for x, y in cases], np.int32)
    lxp = max(len(x) for x, _ in cases)
    lyp = max(len(y) for _, y in cases)
    xs, ys = pack(cases, lxp, lyp)
    np.testing.assert_array_equal(sw_scores_batch_tpu_v2(xs, ys), exp)

    # same cases through the chained-pair entry (each case as both the
    # ref and the alt segment of a chained lane); pad the batch to one
    # full lane group (the raw entry has no tail padding of its own)
    R = len(cases)
    xs_p = np.zeros((128, lxp), np.uint8)
    xs_p[:R] = xs
    haps = np.ones((2 * 128, lyp), np.uint8)
    for i, (_, y) in enumerate(cases):
        haps[2 * i, : len(y)] = np.frombuffer(y, np.uint8)
        haps[2 * i + 1, : len(y)] = np.frombuffer(y, np.uint8)
    got = np.asarray(_sw_pair_chained(
        xs_p, haps, np.arange(2 * 128, dtype=np.int32),
        lx=lxp, ly=lyp, interpret=not _on_tpu()))
    np.testing.assert_array_equal(got[0, :R], exp)
    np.testing.assert_array_equal(got[1, :R], exp)


def test_chained_pair_kernel_random_indel_heavy():
    # indel-heavy random stress for the chained kernel: reads embedded
    # with insertions/deletions near segment boundaries
    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import _sw_pair_chained

    rng = np.random.default_rng(23)
    R = 128
    lx, ly = 40, 56
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    haps = np.ones((2 * R, ly), np.uint8)
    exp = np.zeros((2, R), np.int32)
    for i in range(R):
        xl = int(rng.integers(8, lx + 1))
        x[i, :xl] = rng.choice(bases, xl)
        for w in range(2):
            # mutate the read into the hap with an indel
            seq = list(x[i, :xl])
            p = int(rng.integers(1, xl))
            if rng.random() < 0.5:
                seq[p : p + int(rng.integers(1, 4))] = []  # deletion
            else:
                seq[p:p] = list(rng.choice(bases, int(rng.integers(1, 4))))
            hap = np.array(seq[: ly], np.uint8)
            haps[2 * i + w, : len(hap)] = hap
            exp[w, i] = sw_score_single(bytes(x[i, :xl]), hap.tobytes())
    got = np.asarray(_sw_pair_chained(
        x, haps, np.arange(2 * R, dtype=np.int32),
        lx=lx, ly=ly, interpret=not _on_tpu()))
    np.testing.assert_array_equal(got, exp)


def test_packed_pair_calls_match_unpacked(monkeypatch):
    # 4-bit packed read transfer (round-4 protocol: pack-in-gather +
    # length sidecar + device _unpack4) must be BYTE-EXACT for the full
    # NT16 alphabet — including '=', which unpacks back to '=' rather
    # than sharing the pad code — matching the unpacked entries on both
    # the v5 chained and the quad dispatchers.
    from vartrix_tpu.ops.sw_pallas_v2 import (SEQ_NT16_TBL,
                                              sw_calls_pair_chained_tpu,
                                              sw_calls_pair_quad_tpu)

    rng = np.random.default_rng(29)
    R, H, lx, ly = 256, 24, 32, 48
    alphabet = np.frombuffer(b"ACGTN=MRSVWYHKDB", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    lens = np.zeros(R, np.int32)
    for i in range(R):
        n = int(rng.integers(1, lx + 1))
        x[i, :n] = rng.choice(alphabet, n)
        lens[i] = n
    haps = rng.integers(65, 91, size=(H, ly), dtype=np.uint8)
    for i in range(0, R, 5):
        emb = x[i, : lx - 4].copy()
        emb[emb == 0] = ord("A")
        haps[i % H, 2 : 2 + lx - 4] = emb
    idx_ref = rng.integers(0, H, size=R).astype(np.int32)
    idx_alt = rng.integers(0, H, size=R).astype(np.int32)

    byte_to_code = np.full(256, 255, np.uint8)
    for c, b in enumerate(SEQ_NT16_TBL):
        byte_to_code[b] = c

    def provider(start, n):
        return x[start : start + n]

    def packed(start, n):
        rows = x[start : start + n]
        codes = byte_to_code[rows]
        codes[np.arange(lx)[None, :] >= lens[start : start + n, None]] = 0
        return ((codes[:, 0::2] << 4) | codes[:, 1::2],
                lens[start : start + n])

    provider.shape = x.shape
    provider.packed = packed

    for fn in (sw_calls_pair_chained_tpu, sw_calls_pair_quad_tpu):
        monkeypatch.setenv("VARTRIX_PACK4", "0")
        exp = fn(x, haps, idx_ref, idx_alt)
        monkeypatch.setenv("VARTRIX_PACK4", "1")
        got = fn(provider, haps, idx_ref, idx_alt)
        np.testing.assert_array_equal(got, exp)


def test_quad_chain_kernel_matches_oracle():
    # v6 quad-chain kernel: two reads per lane, four segments along y
    # with an x-tile switch at j == 2*ly; per-problem maxima must equal
    # independent SW, incl. boundary-embedded high scorers
    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import _sw_pair_quad, quad_feasible

    lx, ly = 32, 48
    assert quad_feasible(lx, ly)
    rng = np.random.default_rng(31)
    R = 256  # 128 lanes
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    haps = np.ones((2 * R, ly), np.uint8)
    exp = np.zeros((2, R), np.int32)
    for i in range(R):
        xl = int(rng.integers(1, lx + 1))
        x[i, :xl] = rng.choice(bases, xl)
        for w in range(2):
            if i == 7 and w == 1:
                continue  # empty alt haplotype -> score 0
            yl = int(rng.integers(1, ly + 1))
            hap = rng.choice(bases, yl)
            if rng.random() < 0.5 and yl > xl:
                s = int(rng.integers(0, yl - xl + 1))
                hap[s : s + xl] = x[i, :xl]
            haps[2 * i + w, :yl] = hap
            exp[w, i] = sw_score_single(
                bytes(x[i, :xl]), bytes(hap.tobytes()))
    got = np.asarray(_sw_pair_quad(
        x, haps, np.arange(2 * R, dtype=np.int32),
        lx=lx, ly=ly, interpret=not _on_tpu()))
    np.testing.assert_array_equal(got, exp)


def test_quad_read_switch_no_leak():
    # adversarial for the v6 read switch: read 2 embedded in read 1's
    # alt haplotype (and vice versa) must NOT leak across the 2*ly
    # boundary — each read only scores against its own segments
    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import _sw_pair_quad

    lx, ly = 32, 48
    r1 = (b"ACGT" * 8)[:lx]
    r2 = (b"TTGGCCAA" * 4)[:lx]
    # r1alt ends with a prefix of r2; r2ref starts with a suffix of r1:
    # a leaky kernel would chain these into a big cross-boundary match
    r1alt = (b"G" * 16 + r2[:lx])[:ly]
    r2ref = (r1[16:] + b"C" * 32)[:ly]
    x = np.zeros((256, lx), np.uint8)
    haps = np.ones((512, ly), np.uint8)
    x[0] = np.frombuffer(r1, np.uint8)
    x[1] = np.frombuffer(r2, np.uint8)
    cases = [b"A" * ly, r1alt, r2ref, b"C" * ly]
    for w, h in enumerate(cases):
        haps[w, : len(h)] = np.frombuffer(h[:ly], np.uint8)
    exp0 = [sw_score_single(r1, cases[0]), sw_score_single(r1, cases[1])]
    exp1 = [sw_score_single(r2, cases[2]), sw_score_single(r2, cases[3])]
    idx2 = np.zeros(512, np.int32)
    idx2[:4] = [0, 1, 2, 3]
    got = np.asarray(_sw_pair_quad(
        x, haps, idx2, lx=lx, ly=ly, interpret=not _on_tpu()))
    assert got[:, 0].tolist() == exp0
    assert got[:, 1].tolist() == exp1


def test_quad_calls_match_chained_calls():
    # the quad fused-calls entry must agree with the v5 chained entry
    # (same codes) on a mixed batch, odd batch size exercises lane pad
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_calls_pair_chained_tpu,
                                              sw_calls_pair_quad_tpu)

    rng = np.random.default_rng(37)
    R, H, lx, ly = 301, 24, 32, 48
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    for i in range(R):
        n = int(rng.integers(8, lx + 1))
        x[i, :n] = rng.choice(bases, n)
    haps = rng.choice(bases, size=(H, ly)).astype(np.uint8)
    for i in range(0, R, 3):
        haps[i % H, 4 : 4 + lx - 8] = x[i, : lx - 8]
    idx_ref = rng.integers(0, H, size=R).astype(np.int32)
    idx_alt = rng.integers(0, H, size=R).astype(np.int32)
    got = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    exp = sw_calls_pair_chained_tpu(x, haps, idx_ref, idx_alt)
    np.testing.assert_array_equal(got, exp)


def test_chainN_kernel_matches_oracle():
    # v7 generalized chain (nr=4: eight segments per lane) must equal
    # independent SW per problem, incl. embedded high scorers
    from vartrix_tpu.ops.sw_pallas import _on_tpu
    from vartrix_tpu.ops.sw_pallas_v2 import (_sw_pair_chainN,
                                              chainN_feasible)

    lx, ly, nr = 16, 48, 4
    assert chainN_feasible(lx, ly, nr)
    rng = np.random.default_rng(41)
    R = 512  # 128 lanes at nr=4
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    haps = np.ones((2 * R, ly), np.uint8)
    exp = np.zeros((2, R), np.int32)
    for i in range(R):
        xl = int(rng.integers(1, lx + 1))
        x[i, :xl] = rng.choice(bases, xl)
        for w in range(2):
            yl = int(rng.integers(1, ly + 1))
            hap = rng.choice(bases, yl)
            if rng.random() < 0.5 and yl > xl:
                s = int(rng.integers(0, yl - xl + 1))
                hap[s : s + xl] = x[i, :xl]
            haps[2 * i + w, :yl] = hap
            exp[w, i] = sw_score_single(
                bytes(x[i, :xl]), bytes(hap.tobytes()))
    got = np.asarray(_sw_pair_chainN(
        x, haps, np.arange(2 * R, dtype=np.int32),
        lx=lx, ly=ly, nr=nr, interpret=not _on_tpu()))
    np.testing.assert_array_equal(got, exp)


def test_chunk_env_validation(monkeypatch):
    # VARTRIX_CHUNK must be rounded to a multiple of 4*LANES (512): the
    # quad path derives lanes = chunk/4 and its grid floor-drops any
    # partial lane block, so a merely 256-aligned chunk silently
    # returns garbage for the last <=128 reads of every full chunk
    # (advisor r3 high finding). Also reject <= 0.
    from vartrix_tpu.ops import sw_pallas_v2 as v2

    monkeypatch.setenv("VARTRIX_CHUNK", "100000")
    assert v2._chunk() % 512 == 0 and v2._chunk() >= 100000
    monkeypatch.setenv("VARTRIX_CHUNK", "0")
    with pytest.raises(ValueError):
        v2._chunk()
    monkeypatch.delenv("VARTRIX_CHUNK")
    assert v2._chunk() == v2.CHUNK


def test_chunk_nonpow2_quad_end_to_end(monkeypatch):
    # End-to-end pin for the advisor finding: run the production quad
    # entry with a NON-power-of-two chunk cap that binds (every full
    # chunk hits the cap) and compare against a single-dispatch run.
    # Before the 4*LANES rounding fix, VARTRIX_CHUNK=1300 -> chunk 1408
    # -> bp 704 -> 352 lanes (2.75 lane groups): the grid dropped the
    # last 96 lanes and the tail reads of each full chunk came back 0.
    from vartrix_tpu.ops.sw_pallas_v2 import (sw_calls_pair_quad_tpu,
                                              sw_scores_pair_quad_tpu,
                                              quad_feasible)

    rng = np.random.default_rng(53)
    R, H, lx, ly = 1000, 24, 32, 48
    assert quad_feasible(lx, ly)
    bases = np.frombuffer(b"ACGT", np.uint8)
    x = np.zeros((R, lx), np.uint8)
    for i in range(R):
        n = int(rng.integers(8, lx + 1))
        x[i, :n] = rng.choice(bases, n)
    haps = rng.choice(bases, size=(H, ly)).astype(np.uint8)
    for i in range(0, R, 3):
        haps[i % H, 4 : 4 + lx - 8] = x[i, : lx - 8]
    idx_ref = rng.integers(0, H, size=R).astype(np.int32)
    idx_alt = rng.integers(0, H, size=R).astype(np.int32)

    monkeypatch.delenv("VARTRIX_CHUNK", raising=False)
    exp_calls = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    exp_scores = sw_scores_pair_quad_tpu(x, haps, idx_ref, idx_alt)

    monkeypatch.setenv("VARTRIX_CHUNK", "1300")  # -> 1536, cap binds
    got_calls = sw_calls_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    got_scores = sw_scores_pair_quad_tpu(x, haps, idx_ref, idx_alt)
    np.testing.assert_array_equal(got_calls, exp_calls)
    np.testing.assert_array_equal(got_scores, exp_scores)
