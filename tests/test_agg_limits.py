"""Boundary tests for aggregation key packing (VERDICT r2 weak #4).

The flat/UMI aggregation packs (row, cell) and (group, umi) into int64
keys.  Inputs past the default bit budgets (2^24 barcodes, 2^30 UMI ids)
must WIDEN (correct output), and inputs that cannot fit 63 bits must
RAISE — never silently corrupt.  Reference semantics: any scale is legal
(/root/reference/src/main.rs:1041-1109 uses HashMaps).
"""
import numpy as np
import pytest

from vartrix_tpu.core.agg_numpy import (_cell_counts, _pack_shift,
                                        aggregate_flat)

HI = 60  # comfortably above MIN_SCORE


def test_flat_cells_beyond_2pow24_widen():
    # two cells that collide under a fixed 24-bit pack: (row 1, cell 0)
    # vs (row 0, cell 2^24) -> both keys == 2^24 if not widened
    cells_l = [np.array([1 << 24], np.int64), np.array([0], np.int64)]
    umis_l = [np.array([1], np.int64), np.array([1], np.int64)]
    scores_l = [np.array([[HI, 0]], np.int32), np.array([[0, HI]], np.int32)]
    rows, cols, ref_c, alt_c, unk_c = aggregate_flat(
        cells_l, umis_l, scores_l, use_umi=False)
    order = np.lexsort((cols, rows))
    assert rows[order].tolist() == [0, 1]
    assert cols[order].tolist() == [1 << 24, 0]
    assert ref_c[order].tolist() == [1, 0]
    assert alt_c[order].tolist() == [0, 1]


def test_flat_umis_beyond_2pow30_widen():
    # one cell group with two UMIs that collide under a fixed 30-bit pack
    # (umi 0 in group 1 vs umi 2^30 in group 0 collide only if groups
    # differ; here force same group, distinct UMIs >= 2^30 apart)
    cells_l = [np.array([5, 5], np.int64)]
    umis_l = [np.array([0, 1 << 30], np.int64)]
    scores_l = [np.array([[HI, 0], [0, HI]], np.int32)]
    rows, cols, ref_c, alt_c, unk_c = aggregate_flat(
        cells_l, umis_l, scores_l, use_umi=True)
    # two distinct UMIs -> one ref call + one alt call in the same cell
    assert rows.tolist() == [0] and cols.tolist() == [5]
    assert (ref_c.tolist(), alt_c.tolist()) == ([1], [1])


def test_pack_shift_overflow_raises():
    lo = np.array([1 << 40], np.int64)   # needs 41 bits
    hi = np.array([1 << 23], np.int64)   # needs 24 bits -> 65 > 63
    with pytest.raises(ValueError, match="overflow"):
        _pack_shift(lo, hi, 24)
    # and the same magnitudes fit when hi is small (widening, no raise)
    assert _pack_shift(lo, np.array([3], np.int64), 24) == 41


def test_cell_counts_umi_beyond_2pow40_widen():
    cells = np.array([7, 7], np.int64)
    umis = np.array([0, 1 << 40], np.int64)
    scores = np.array([[HI, 0], [0, HI]], np.int32)
    seen, refc, altc, unkc = _cell_counts(cells, umis, scores, use_umi=True)
    assert seen.tolist() == [7]
    assert (refc.tolist(), altc.tolist()) == ([1], [1])


def test_negative_key_raises():
    cells = np.array([-1], np.int64)
    umis = np.array([1], np.int64)
    scores = np.array([[HI, 0]], np.int32)
    with pytest.raises(ValueError):
        _cell_counts(cells, umis, scores, use_umi=True)


def test_widen_path_scale_matches_oracle():
    """VERDICT r3 #7: near-boundary WIDEN path at scale — sparse cell
    indices spanning [0, 2^25) and UMI ids spanning [0, 2^31) across
    many variants; aggregate_flat's widened packing must produce exactly
    the groups a dict-based oracle produces (not merely avoid raising)."""
    rng = np.random.default_rng(19)
    V, N = 20, 50_000
    cells_l, umis_l, scores_l = [], [], []
    for v in range(V):
        n = int(rng.integers(1000, N // V))
        # sparse occupancy over a 2^25 barcode space (forces csh = 25)
        cells = rng.integers(0, 1 << 25, n).astype(np.int64)
        umis = rng.integers(0, 1 << 31, n).astype(np.int64)  # ush >= 31
        scores = np.zeros((n, 2), np.int32)
        kind = rng.integers(0, 4, n)
        scores[kind == 0] = [HI, 0]        # REF
        scores[kind == 1] = [0, HI]        # ALT
        scores[kind == 2] = [HI, HI]       # tie -> UNKNOWN
        scores[kind == 3] = [0, 0]         # dropped
        cells_l.append(cells)
        umis_l.append(umis)
        scores_l.append(scores)

    for use_umi in (False, True):
        rows, cols, ref_c, alt_c, unk_c = aggregate_flat(
            cells_l, umis_l, scores_l, use_umi=use_umi)
        # dict oracle
        groups = {}
        for v in range(V):
            for c, u, (r, a) in zip(cells_l[v], umis_l[v], scores_l[v]):
                groups.setdefault((v, int(c)), []).append((int(u), int(r), int(a)))
        exp = {}
        for (v, c), reads in groups.items():
            if use_umi:
                per_umi = {}
                for u, r, a in reads:
                    if r < 25 and a < 25:
                        continue
                    per_umi.setdefault(u, []).append(
                        1 if r > a else (2 if a > r else 3))
                counts = [0, 0, 0]
                for calls in per_umi.values():
                    rc = calls.count(1); ac = calls.count(2)
                    tot = len(calls)
                    if 4 * ac >= 3 * tot:
                        counts[1] += 1
                    elif 4 * rc >= 3 * tot:
                        counts[0] += 1
                    else:
                        counts[2] += 1
            else:
                counts = [0, 0, 0]
                for u, r, a in reads:
                    if r < 25 and a < 25:
                        continue
                    if r > a:
                        counts[0] += 1
                    elif a > r:
                        counts[1] += 1
                    else:
                        counts[2] += 1
            exp[(v, c)] = tuple(counts)
        got = {(int(rw), int(cl)): (int(r), int(a), int(u))
               for rw, cl, r, a, u in zip(rows, cols, ref_c, alt_c, unk_c)}
        assert got == exp
