"""Unit tests for the call / aggregation logic (the layer the reference
implements at src/main.rs:1019-1164), including the semantic traps noted in
SURVEY.md §7."""

import math

from vartrix_tpu.core.calls import (
    Scores,
    alt_frac,
    consensus_scoring,
    convert_to_counts,
    coverage,
    evaluate_scores,
    parse_scores,
)


def S(cell, ref, alt, umi=b"\x01"):
    return Scores(cell_index=cell, umi=umi, ref_score=ref, alt_score=alt)


class TestEvaluateScores:
    def test_min_score_drop(self):
        assert evaluate_scores(24, 24) is None
        assert evaluate_scores(24, 0) is None

    def test_one_above_min_is_kept(self):
        # only ONE score needs to clear MIN_SCORE
        assert evaluate_scores(25, 0) == 1
        assert evaluate_scores(0, 25) == 2

    def test_calls(self):
        assert evaluate_scores(50, 40) == 1
        assert evaluate_scores(40, 50) == 2
        assert evaluate_scores(50, 50) == -1  # tie -> unknown


class TestParseScores:
    def test_non_umi_keeps_all_calls(self):
        scores = [S(3, 50, 10), S(3, 10, 50), S(5, 50, 50)]
        out = parse_scores(scores, umi=False)
        assert out == [(3, [1, 2]), (5, [-1])]

    def test_cell_with_only_dropped_reads_still_grouped(self):
        # a cell whose reads all fail MIN_SCORE still produces a (cell, [])
        # group -> explicit zero entries in coverage mode
        out = parse_scores([S(7, 10, 10)], umi=False)
        assert out == [(7, [])]

    def test_umi_consensus_threshold(self):
        # 3 ref + 1 alt in one UMI: ref_frac = 0.75 >= 0.75 -> REF
        scores = [S(1, 50, 10, b"U1")] * 3 + [S(1, 10, 50, b"U1")]
        out = parse_scores(scores, umi=True)
        assert out == [(1, [1])]
        # 2 ref + 2 alt -> both fracs 0.5 -> UNKNOWN
        scores = [S(1, 50, 10, b"U1")] * 2 + [S(1, 10, 50, b"U1")] * 2
        assert parse_scores(scores, umi=True) == [(1, [-1])]

    def test_umi_unknowns_in_denominator(self):
        # 3 ref + 1 unknown: ref_frac = 3/4 = 0.75 -> REF
        scores = [S(1, 50, 10, b"U1")] * 3 + [S(1, 50, 50, b"U1")]
        assert parse_scores(scores, umi=True) == [(1, [1])]
        # 2 ref + 1 unknown: ref_frac = 2/3 < 0.75 -> UNKNOWN
        scores = [S(1, 50, 10, b"U1")] * 2 + [S(1, 50, 50, b"U1")]
        assert parse_scores(scores, umi=True) == [(1, [-1])]

    def test_umi_groups_are_independent(self):
        scores = [S(1, 50, 10, b"U1"), S(1, 10, 50, b"U2")]
        out = parse_scores(scores, umi=True)
        assert out[0][0] == 1 and sorted(out[0][1]) == [1, 2]


class TestScoringModes:
    def test_consensus_values(self):
        both = [S(1, 50, 10), S(1, 10, 50)]
        assert consensus_scoring(both, 0, False) == [(1, 3.0)]
        assert consensus_scoring([S(1, 50, 10)], 0, False) == [(1, 1.0)]
        assert consensus_scoring([S(1, 10, 50)], 0, False) == [(1, 2.0)]
        # only unknowns -> NO entry
        assert consensus_scoring([S(1, 50, 50)], 0, False) == []

    def test_alt_frac_unknown_in_denominator(self):
        scores = [S(1, 10, 50), S(1, 50, 50)]  # one alt, one unk
        assert alt_frac(scores, 0, False) == [(1, 0.5)]

    def test_alt_frac_nan_for_all_dropped(self):
        res = alt_frac([S(1, 5, 5)], 0, False)
        assert len(res) == 1 and math.isnan(res[0][1])

    def test_coverage_explicit_zeros(self):
        # all reads unknown -> explicit (0, 0) entries in both matrices
        a, r = coverage([S(1, 50, 50)], 0, False)
        assert a == [(1, 0.0)] and r == [(1, 0.0)]

    def test_coverage_counts(self):
        scores = [S(1, 50, 10), S(1, 50, 10), S(1, 10, 50)]
        a, r = coverage(scores, 0, False)
        assert a == [(1, 1.0)] and r == [(1, 2.0)]


def test_convert_to_counts():
    c = convert_to_counts([1, 1, 2, -1, 1])
    assert (c.ref_count, c.alt_count, c.unk_count) == (3, 1, 1)
