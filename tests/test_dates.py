"""Date-instruction compiler tests.

Golden cases ported from the reference's semantics
(``tests/test_date_functions.py`` in /root/reference): leap years, fixed
30/365.25-day units, HALF_UP SQL rounding, end-to-end evaluation on Spark.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.functions.dates import (
    convert_date_units_to_days,
    parse_date_instruction,
    validate_date_string,
)


@pytest.mark.parametrize(
    ("date_string", "valid"),
    [
        ("2020-01-01", True),
        ("2020-02-29", True),  # leap year
        ("2021-02-29", False),  # not a leap year
        ("2020-02-30", False),
        ("2020-13-01", False),
        ("2020-1-1", True),  # strptime accepts non-zero-padded
        ("20200101", False),
        ("not-a-date", False),
        ("2020-01-01 extra", False),
    ],
)
def test_validate_date_string(date_string, valid):
    assert validate_date_string(date_string) is valid


@pytest.mark.parametrize(
    ("instruction", "expected"),
    [
        (None, "cast(NULL as date)"),
        ("2020-01-01", "date('2020-01-01')"),
        ("index_date", "index_date"),
        ("current_date()", "current_date()"),
        ("index_date + 5 days", "index_date + cast(round(5*1) as int)"),
        ("x - 6 weeks", "x - cast(round(6*7) as int)"),
        ("index_date + 3 months", "index_date + cast(round(3*30) as int)"),
        ("index_date - 2 years", "index_date - cast(round(2*365.25) as int)"),
        ("7.5 weeks", "cast(round(7.5*7) as int)"),
    ],
)
def test_parse_date_instruction(instruction, expected):
    assert parse_date_instruction(instruction) == expected


def test_parse_invalid_date_raises():
    with pytest.raises(ValueError, match="Invalid date"):
        parse_date_instruction("2020-02-30")
    with pytest.raises(ValueError, match="Invalid date"):
        parse_date_instruction("2020-01-01 extra")  # prefix-match + bad whole


def test_convert_multiple_terms():
    out = convert_date_units_to_days("index_date - 2 years, x - 7.5 weeks")
    assert out == (
        "index_date - cast(round(2*365.25) as int), "
        "x - cast(round(7.5*7) as int)"
    )


def test_convert_unknown_unit_raises():
    with pytest.raises(ValueError, match="Invalid unit"):
        convert_date_units_to_days("index_date + 3 fortnights")


def test_no_unit_word_passthrough():
    assert parse_date_instruction("today_col") == "today_col"  # 'day' substring, no match
    assert parse_date_instruction("some_expr + 1") == "some_expr + 1"


@pytest.mark.parametrize(
    ("instruction", "expected_date"),
    [
        ("index_date + 5 days", datetime.date(2020, 1, 6)),
        ("index_date - 6 weeks", datetime.date(2019, 11, 20)),
        # fixed 30-day months: +90 days, NOT calendar add_months
        ("index_date + 3 months", datetime.date(2020, 3, 31)),
        # 365.25*2 = 730.5 -> SQL HALF_UP round -> 731 days
        ("index_date - 2 years", datetime.date(2017, 12, 31)),
        ("2020-06-15", datetime.date(2020, 6, 15)),
        (None, None),
    ],
)
def test_end_to_end_on_spark(spark, instruction, expected_date):
    df = spark.createDataFrame(
        [(datetime.date(2020, 1, 1),)], ["index_date"]
    )
    out = df.select(
        F.expr(parse_date_instruction(instruction)).alias("result")
    ).collect()[0]["result"]
    assert out == expected_date
