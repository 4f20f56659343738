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
