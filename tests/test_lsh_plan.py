"""LSH banding planner: parity with a pure-Python midpoint integrator,
S-curve sanity (more rows -> sharper curve), ranking, validation."""

import pytest

from hds_functions_spark.operators.lsh_plan import (
    band_factorisations,
    lsh_band_plan,
)


def _py_plan(num_hashes, t, n):
    rows = []
    for b, r in band_factorisations(num_hashes):
        def p(s):
            return 1.0 - (1.0 - s**r) ** b

        fp = fn = 0.0
        for i in range(n):
            s = (i + 0.5) / n
            if s < t:
                fp += p(s)
            else:
                fn += 1.0 - p(s)
        rows.append(
            (
                b, r,
                round((1 - 0.5 ** (1.0 / b)) ** (1.0 / r), 6),
                round(p(t), 6),
                round(fp / n, 6),
                round(fn / n, 6),
            )
        )
    return rows


def test_factorisations():
    assert band_factorisations(12) == [
        (1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1),
    ]
    with pytest.raises(ValueError, match="num_hashes"):
        band_factorisations(0)


def test_matches_python_integrator(spark):
    got = {
        (r["bands"], r["rows_per_band"]): (
            r["s50"], r["p_at_threshold"], r["fp_area"], r["fn_area"]
        )
        for r in lsh_band_plan(
            spark, num_hashes=16, threshold=0.5, n_steps=200
        ).collect()
    }
    for b, r, s50, pt, fp, fn in _py_plan(16, 0.5, 200):
        gs50, gpt, gfp, gfn = got[(b, r)]
        assert gs50 == pytest.approx(s50, abs=2e-6)
        assert gpt == pytest.approx(pt, abs=2e-6)
        assert gfp == pytest.approx(fp, abs=2e-6)
        assert gfn == pytest.approx(fn, abs=2e-6)


def test_extremes_and_ranking(spark):
    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_band_plan(
            spark, num_hashes=16, threshold=0.5, n_steps=200
        ).collect()
    }
    # b=16, r=1: ANY matching hash -> collision; hugely permissive
    # (fp-heavy); b=1, r=16: ALL must match; hugely strict (fn-heavy)
    assert out[(16, 1)]["fp_area"] > out[(1, 16)]["fp_area"]
    assert out[(1, 16)]["fn_area"] > out[(16, 1)]["fn_area"]
    ranks = sorted(
        (r["plan_rank"], r["total_error"]) for r in out.values()
    )
    assert [k for k, _ in ranks] == list(range(1, len(out) + 1))
    errs = [e for _, e in ranks]
    assert errs == sorted(errs)
    best = next(r for r in out.values() if r["plan_rank"] == 1)
    # the balanced factorisation wins at t=0.5, never an extreme
    assert best["bands"] not in (1, 16)


def test_validation(spark):
    with pytest.raises(ValueError, match="threshold"):
        lsh_band_plan(spark, threshold=0.0)
    with pytest.raises(ValueError, match="n_steps"):
        lsh_band_plan(spark, n_steps=0)
