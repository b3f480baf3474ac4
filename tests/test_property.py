"""Property-based tests (hypothesis) for the pure-Python kernels.

These cover the driver-side logic where randomized inputs are cheap (no
Spark job per example): column-name cleaning, the date-instruction
compiler, and disclosure-control arithmetic invariants.
"""

import re
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hds_functions_spark.functions.dates import (
    convert_date_units_to_days,
    parse_date_instruction,
    validate_date_string,
)
from hds_functions_spark.operators.wrangling import _clean_name

# --- clean_column_names kernel -------------------------------------------

name_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " @#!.-_$%^&*()",
    min_size=1,
    max_size=40,
)


@given(name_strategy)
def test_clean_name_shape(name):
    cleaned = _clean_name(name)
    # only [a-z0-9_], never starts with a digit
    assert re.fullmatch(r"[a-z0-9_]+", cleaned), cleaned
    assert not cleaned[0].isdigit()


@given(name_strategy)
def test_clean_name_idempotent(name):
    once = _clean_name(name)
    assert _clean_name(once) == once


# --- date instruction compiler --------------------------------------------

@given(st.integers(min_value=0, max_value=10_000))
def test_days_unit_is_identity(n):
    out = convert_date_units_to_days(f"index_date + {n} days")
    assert out == f"index_date + cast(round({n}*1) as int)"


@given(
    st.integers(min_value=0, max_value=500),
    st.sampled_from(["week", "month", "year"]),
)
def test_unit_factors(n, unit):
    factor = {"week": 7, "month": 30, "year": 365.25}[unit]
    out = convert_date_units_to_days(f"d + {n} {unit}s")
    assert out == f"d + cast(round({n}*{factor}) as int)"


@given(st.dates())
def test_valid_dates_accepted(d):
    s = d.isoformat()
    # strptime %Y requires 4-digit years; hypothesis can generate year<1000
    assert validate_date_string(s) == (len(s) == 10)


@given(st.dates())
def test_full_date_compiles_to_literal(d):
    s = d.isoformat()
    if len(s) == 10:
        assert parse_date_instruction(s) == f"date('{s}')"


def test_none_compiles_to_null_cast():
    assert parse_date_instruction(None) == "cast(NULL as date)"


@given(st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=20))
def test_passthrough_expressions(expr):
    # no unit words, no date prefix -> verbatim passthrough
    if not re.match(r"\d{4}-\d{2}-\d{2}", expr) and not re.search(
        r"\b(day|week|month|year)s?\b", expr
    ):
        assert parse_date_instruction(expr) == expr


# --- disclosure control arithmetic ----------------------------------------

@given(st.integers(min_value=0, max_value=10**12), st.integers(min_value=1, max_value=1000))
def test_round_to_multiple_invariants(count, multiple):
    """The Spark expression is round(count/multiple)*multiple with HALF_UP;
    model it exactly and check the two safety invariants."""
    import decimal

    q = decimal.Decimal(count) / decimal.Decimal(multiple)
    rounded = int(q.quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
    result = rounded * multiple
    assert result % multiple == 0
    assert abs(result - count) <= multiple / 2


# --- mixture-construction cutoff solve ------------------------------------

@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
    ),
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.01, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
    ),
)
def test_mixture_cutoff_invariants(counts, weights):
    from hds_functions_spark.operators.sampling import (
        BUCKETS,
        solve_mixture_cutoffs,
    )

    present = {s: counts[s] for s in counts if s in weights}
    if not present:
        return
    cutoffs = solve_mixture_cutoffs(present, weights)
    assert set(cutoffs) == set(present)
    for s, cut in cutoffs.items():
        assert 0 <= cut <= BUCKETS
    # the binding source is kept (almost) whole
    assert max(cutoffs.values()) >= BUCKETS - 1
    # expected kept counts sit at the target ratios (up to bucket
    # quantisation: one bucket is n_s/BUCKETS rows)
    total_w = sum(w for s, w in weights.items() if s in present)
    expect = {
        s: weights[s] / total_w for s in present
    }
    kept = {s: present[s] * cutoffs[s] / BUCKETS for s in present}
    total_kept = sum(kept.values())
    if total_kept > 0:
        # cutoff truncation loses up to one bucket (n_s/BUCKETS rows) per
        # source, and each source's loss also shifts total_kept
        slack = sum(present.values()) / BUCKETS
        for s in present:
            tol = present[s] / BUCKETS + slack + 1e-9 * total_kept
            assert abs(kept[s] - expect[s] * total_kept) <= tol


# --- chunk-boundary arithmetic --------------------------------------------

@given(
    st.integers(min_value=1, max_value=10**6),   # n tokens
    st.integers(min_value=1, max_value=4096),    # chunk size
    st.integers(min_value=0, max_value=4095),    # overlap
)
def test_chunk_count_formula(n, chunk, overlap):
    """Model of chunk_documents' sequence arithmetic: full coverage with
    the minimal chunk count."""
    if overlap >= chunk:
        return
    import math

    stride = chunk - overlap
    k = max(math.ceil((n - overlap) / stride), 1)
    # full coverage: the last chunk reaches the end
    assert (k - 1) * stride + chunk >= n
    # minimality: one fewer chunk would leave a gap (when k > 1)
    if k > 1:
        assert (k - 2) * stride + chunk < n
