"""Property-fuzz of the top-N, privacy and date-compiler surfaces
(VERDICT round-3 item 6; ``test_property_cohort.py`` is the model).

Each surface gets 100+ random cases cross-checked against an
independently-generated oracle:

- ``select_top_rows``: random method / n / partition / order specs (ties,
  nulls, ``partition_by=None``) vs a DuckDB window-function oracle with
  explicit NULLS FIRST/LAST (Spark's ascending default is nulls-FIRST,
  DuckDB's is nulls-LAST — the oracle states placement explicitly so the
  comparison pins Spark's documented behaviour).
- ``round_counts_to_multiple`` + ``redact_low_counts``: random counts
  (incl. nulls, negatives, exact boundary values) vs a DuckDB arithmetic
  oracle — both engines round doubles HALF-away-from-zero, verified by a
  probe query before use.
- ``parse_date_instruction``: random multi-term unit expressions evaluated
  by Spark vs a pure-Python Decimal HALF_UP oracle of the documented
  fixed-length-unit semantics (30 / 365.25-day months/years, per-term
  rounding). Quantities are restricted to quarters (k/4) so every
  ``q * factor`` product is binary-exact and the HALF_UP boundary is
  decided identically in double and Decimal arithmetic.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from hds_functions_spark.functions.dates import parse_date_instruction
from hds_functions_spark.operators.privacy import (
    redact_low_counts,
    round_counts_to_multiple,
)
from hds_functions_spark.operators.topk import select_top_rows

N_CASES = 100


# --- select_top_rows ------------------------------------------------------

@pytest.fixture(scope="module")
def topk_data(spark, tmp_path_factory):
    """Groups with heavy ties and nulls in both order columns."""
    rng = random.Random(11)
    rows = [
        (
            i,
            rng.choice(["g1", "g2", "g3", "g4"]),
            rng.choice([1, 2, 2, 3, 3, 3, None]),
            rng.choice([0.5, 1.5, 1.5, None, 9.25]),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "row_id: long, grp: string, a: int, b: double"
    )
    path = str(tmp_path_factory.mktemp("topk_fuzz") / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return spark.read.parquet(path), con


def _order_spec(rng, total_order: bool):
    """Random order spec as (spark Columns, duckdb ORDER BY sql)."""
    cols = rng.sample(["a", "b"], rng.randint(1, 2))
    if total_order:
        cols.append("row_id")  # unique tie-break => deterministic row_number
    spark_cols, sql_parts = [], []
    for c in cols:
        desc = rng.random() < 0.5
        nulls_last = rng.random() < 0.5
        col = F.col(c)
        col = (
            (col.desc_nulls_last() if nulls_last else col.desc_nulls_first())
            if desc
            else (col.asc_nulls_last() if nulls_last else col.asc_nulls_first())
        )
        spark_cols.append(col)
        sql_parts.append(
            f"{c} {'DESC' if desc else 'ASC'} "
            f"NULLS {'LAST' if nulls_last else 'FIRST'}"
        )
    return spark_cols, ", ".join(sql_parts)


def test_select_top_rows_fuzz_vs_duckdb(topk_data):
    df, con = topk_data
    rng = random.Random(2027)
    for case in range(N_CASES):
        method = rng.choice(["row_number", "rank", "dense_rank"])
        n = rng.randint(1, 6)
        partitioned = rng.random() < 0.7
        # row_number on ties is nondeterministic unless the order is total
        spark_cols, order_sql = _order_spec(
            rng, total_order=(method == "row_number")
        )
        part_sql = "PARTITION BY grp" if partitioned else ""
        fn = {"row_number": "row_number()", "rank": "rank()",
              "dense_rank": "dense_rank()"}[method]
        expected = sorted(
            r[0]
            for r in con.execute(
                f"SELECT row_id FROM (SELECT row_id, {fn} OVER "
                f"({part_sql} ORDER BY {order_sql}) AS rk FROM t) "
                f"WHERE rk <= {n}"
            ).fetchall()
        )
        out = select_top_rows(
            df,
            method=method,
            n=n,
            partition_by=["grp"] if partitioned else None,
            order_by=spark_cols,
        )
        got = sorted(r["row_id"] for r in out.select("row_id").collect())
        ctx = f"case {case}: {method} n={n} part={partitioned} ORDER BY {order_sql}"
        assert got == expected, ctx
        assert out.columns == df.columns, ctx


def test_select_top_rows_unordered_raises(topk_data):
    """order_by=None builds an unordered window, which Spark's ranking
    functions reject at analysis time — the reference passes the same
    unordered spec, so propagating the AnalysisException IS parity."""
    from pyspark.errors import AnalysisException

    df, _ = topk_data
    for method in ("row_number", "rank", "dense_rank"):
        with pytest.raises(AnalysisException, match="[Oo]rder"):
            select_top_rows(df, method, n=3, partition_by=["grp"]).collect()


# --- privacy: rounding + redaction ---------------------------------------

@pytest.fixture(scope="module")
def privacy_data(spark, tmp_path_factory):
    """Counts hitting multiples, boundaries, halves, negatives and nulls."""
    rng = random.Random(13)
    vals = (
        [None, 0, 1, 2, 3, 5, 7, 10, 12, 15, 17, 22, -3, -7]
        + [rng.randint(-50, 500) for _ in range(120)]
        + [m * k for m in (2, 3, 5, 7, 10) for k in (1, 2, 3)]  # exact multiples
        + [m * k + m // 2 for m in (2, 4, 6, 10) for k in (1, 3)]  # exact halves
    )
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "row_id: long, cnt: long")
    path = str(tmp_path_factory.mktemp("privacy_fuzz") / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    # both engines must round doubles HALF-away-from-zero or the oracle
    # is meaningless — probe before trusting
    assert con.execute(
        "SELECT round(CAST(1.5 AS DOUBLE)), round(CAST(2.5 AS DOUBLE)), "
        "round(CAST(-1.5 AS DOUBLE))"
    ).fetchone() == (2.0, 3.0, -2.0)
    return spark.read.parquet(path), con


def test_round_counts_fuzz_vs_duckdb(privacy_data):
    df, con = privacy_data
    for multiple in range(1, 13):
        expected = dict(
            con.execute(
                f"SELECT row_id, CAST(round(cnt / {multiple}.0) * {multiple} "
                "AS BIGINT) FROM t"
            ).fetchall()
        )
        got = {
            r["row_id"]: r["cnt"]
            for r in round_counts_to_multiple(df, ["cnt"], multiple).collect()
        }
        assert got == expected, f"multiple={multiple}"


def test_redact_low_counts_fuzz_vs_duckdb(privacy_data):
    df, con = privacy_data
    rng = random.Random(2028)
    for case in range(N_CASES):
        threshold = rng.randint(1, 30)
        redaction = rng.choice([None, 0, -1, "<10", "*"])
        if isinstance(redaction, str):
            # string redaction promotes the whole column to string
            lit = f"'{redaction}'"
            keep = "CAST(cnt AS VARCHAR)"
        else:
            lit = "NULL" if redaction is None else str(redaction)
            keep = "cnt"
        expected = dict(
            con.execute(
                f"SELECT row_id, CASE WHEN cnt >= {threshold} THEN {keep} "
                f"ELSE {lit} END FROM t"
            ).fetchall()
        )
        got = {
            r["row_id"]: r["cnt"]
            for r in redact_low_counts(
                df, ["cnt"], threshold, redaction_value=redaction
            ).collect()
        }
        assert got == expected, f"case {case}: t={threshold} r={redaction!r}"


# --- date compiler --------------------------------------------------------

_FACTORS = {
    "day": Decimal(1), "days": Decimal(1),
    "week": Decimal(7), "weeks": Decimal(7),
    "month": Decimal(30), "months": Decimal(30),
    "year": Decimal("365.25"), "years": Decimal("365.25"),
}


def _random_instruction(rng):
    """(instruction string, expected total day shift) — quantities are
    k/4 so q*factor is binary-exact (365.25 = 1461/4: denominators stay
    powers of two) and Spark's double HALF_UP agrees with Decimal's."""
    n_terms = rng.randint(1, 4)
    expr, total = "base_date", 0
    for i in range(n_terms):
        q = Decimal(rng.randint(0, 160)) / 4  # 0, 0.25, ..., 40.0
        unit = rng.choice(list(_FACTORS))
        sign = rng.choice(["+", "-"])
        q_str = str(q if q % 1 else int(q))
        days = int(
            (q * _FACTORS[unit]).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        total += days if sign == "+" else -days
        expr += f" {sign} {q_str} {unit}"
    return expr, total


def test_date_compiler_fuzz_vs_decimal_oracle(spark, tmp_path):
    rng = random.Random(2029)
    base = spark.createDataFrame(
        [("2000-06-15",), ("1997-01-31",), ("2020-02-29",)], "d: string"
    ).select(F.col("d").cast("date").alias("base_date"))
    cases = [_random_instruction(rng) for _ in range(N_CASES + 20)]
    # one pass: evaluate every compiled expression as a column
    out = base.select(
        "base_date",
        *[
            F.expr(parse_date_instruction(instr)).alias(f"c{i}")
            for i, (instr, _) in enumerate(cases)
        ],
    ).collect()
    for row in out:
        for i, (instr, total) in enumerate(cases):
            got = (row[f"c{i}"] - row["base_date"]).days
            assert got == total, (
                f"case {i}: {instr!r} expected shift {total}, got {got}"
            )


def test_date_compiler_rejects_unknown_units():
    # a unit word routes the string through the converter, where any
    # OTHER quantity with an unknown unit raises...
    with pytest.raises(ValueError, match="Invalid unit"):
        parse_date_instruction("base_date + 1 month + 3 fortnights")
    # ...but with no unit word present the string passes through verbatim
    # (reference parity: substring, not word, detection)
    assert (
        parse_date_instruction("base_date + 3 fortnights")
        == "base_date + 3 fortnights"
    )
    with pytest.raises(ValueError, match="Invalid date"):
        parse_date_instruction("2020-02-30")
