"""The bench harness's declining-profile (warm-up) rule — pure protocol
logic, no Spark. The rule exists so sub-2s queries whose first repeat
carries JVM/codegen warm-up never need a hand adjudication again: the
median is taken over the tail whenever the first repeat is out of family
with every later one (r12 verdict item 3)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import WARMUP_DROP_RATIO, robust_median  # noqa: E402


def test_declining_profile_drops_first_repeat():
    # the exact shape of the three r12 hand-adjudications: first repeat
    # several-x the steady state, tail flat
    med, dropped = robust_median([13.3, 4.56, 4.61])
    assert dropped
    assert abs(med - 4.585) < 1e-9


def test_flat_profile_keeps_all_repeats():
    med, dropped = robust_median([0.5, 0.52, 0.49])
    assert not dropped
    assert med == 0.5


def test_flat_elevated_profile_is_not_masked():
    # a genuinely regressed query (all repeats elevated) must NOT be
    # rescued by the rule — the gate should still see the regression
    med, dropped = robust_median([6.9, 6.32, 6.38])
    assert not dropped
    assert med == 6.38


def test_boundary_is_strict():
    runs = [1.5 * 1.0, 1.0, 1.0]
    med, dropped = robust_median(runs)
    assert not dropped  # exactly at the ratio: first repeat kept
    med, dropped = robust_median([1.5 * 1.0 + 0.01, 1.0, 1.0])
    assert dropped


def test_single_run_and_two_run_shapes():
    assert robust_median([0.9]) == (0.9, False)
    # fast-cutoff queries measure twice; a declining pair uses the second
    med, dropped = robust_median([0.6, 0.35])
    assert dropped and med == 0.35


def test_ratio_constant_matches_doc():
    assert WARMUP_DROP_RATIO == 1.5
