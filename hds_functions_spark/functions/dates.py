"""Date-instruction mini-compiler: English-ish relative-date strings -> Spark SQL.

Pure Python (no Spark imports). Compiles instruction strings like
``'index_date + 3 months'`` into Spark-SQL expression strings consumed by
``F.expr``. Parity target: ``/root/reference`` ``date_functions.py:17-159``.

Semantics that are deliberate (and preserved):

- months/years are FIXED-LENGTH approximations (30 / 365.25 days); the
  compiled output relies on Spark's ``date + int`` = ``date_add`` arithmetic,
  NOT calendar ``add_months`` (reference ``date_functions.py:108-117`` and its
  end-to-end tests: ``2020-01-01 + 3 months -> 2020-03-31``).
- the ``round`` happens in SQL (Spark HALF_UP), not in Python
  (banker's rounding): ``7.5 weeks -> cast(round(7.5*7) as int) = 53``.
- ``None`` compiles to a typed null: ``cast(NULL as date)``.
- a string starting with ``YYYY-MM-DD`` must be a *valid* date for the whole
  string (``'2020-01-01 extra'`` raises; ``'2020-02-30'`` raises).
- anything containing no date-unit word passes through verbatim (column
  references, ``current_date() + ...`` pre-compiled expressions, ...).
"""

from __future__ import annotations

import re
from datetime import datetime

__all__ = [
    "parse_date_instruction",
    "convert_date_units_to_days",
    "validate_date_string",
]

# Fixed-length day equivalents (reference date_functions.py:108-117).
_UNIT_DAYS = {
    "day": "1",
    "days": "1",
    "week": "7",
    "weeks": "7",
    "month": "30",
    "months": "30",
    "year": "365.25",
    "years": "365.25",
}

_UNIT_WORDS = tuple(_UNIT_DAYS)

_DATE_PREFIX_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
# "<number> <unit-word>" pairs, e.g. "3 months", "7.5weeks".
_QUANTITY_RE = re.compile(r"\b(\d+(?:\.\d+)?)\s*(\w+)\b")


def validate_date_string(date_string: str) -> bool:
    """True iff ``date_string`` is a real calendar date in ``YYYY-MM-DD``.

    Leap-year aware (``datetime.strptime``). Parity: reference
    ``date_functions.py:135-159``.
    """
    try:
        datetime.strptime(date_string, "%Y-%m-%d")
        return True
    except ValueError:
        return False


def convert_date_units_to_days(date_expression: str) -> str:
    """Rewrite every ``<n> <unit>`` term into ``cast(round(n*factor) as int)``.

    The multiplication and rounding are emitted into SQL so that Spark's
    HALF_UP ``round`` applies (NOT Python's banker's rounding); e.g.
    ``'x - 2 years'`` -> ``'x - cast(round(2*365.25) as int)'`` which Spark
    evaluates to 731 days. Unknown units raise ValueError. Parity: reference
    ``date_functions.py:84-132``.
    """
    for number, unit in _QUANTITY_RE.findall(date_expression):
        if unit not in _UNIT_DAYS:
            raise ValueError(
                f"Invalid unit: {unit}. Use 'day', 'week', 'month', or 'year'."
            )
        replacement = f"cast(round({number}*{_UNIT_DAYS[unit]}) as int)"
        date_expression = re.sub(
            rf"\b{re.escape(number)}\s*{unit}\b", replacement, date_expression
        )
    return date_expression


def parse_date_instruction(date_string: str | None) -> str:
    """Compile a date instruction string to a Spark SQL expression string.

    Cases (in order; parity: reference ``date_functions.py:17-81``):

    1. ``None``                      -> ``"cast(NULL as date)"``
    2. starts with ``YYYY-MM-DD``    -> ``"date('YYYY-MM-DD')"`` if the whole
       string is a valid date, else ``ValueError``
    3. contains a unit word          -> :func:`convert_date_units_to_days`
    4. otherwise                     -> returned verbatim (column name or
       arbitrary pre-compiled SQL)
    """
    if date_string is None:
        return "cast(NULL as date)"
    if _DATE_PREFIX_RE.match(date_string):
        if validate_date_string(date_string):
            return f"date('{date_string}')"
        raise ValueError(f"Invalid date: {date_string}")
    # Substring (not word-boundary) detection, matching the reference: a
    # string like 'today' routes through the converter and passes unchanged.
    if any(unit in date_string for unit in _UNIT_WORDS):
        return convert_date_units_to_days(date_string)
    return date_string
