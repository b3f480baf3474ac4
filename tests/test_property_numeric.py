"""Property-fuzz of the round-5 numeric surfaces against generated DuckDB
oracles (same strategy as test_property_surfaces.py):

- ``winsorize_columns``: random grouped/global specs with nulls and
  null group keys vs a DuckDB quantile_cont CASE oracle (both engines
  compute type-7 interpolated percentiles).
- ``mad_outlier_flags``: random grouped data incl. degenerate (MAD=0)
  groups vs a DuckDB two-pass median oracle.
- ``quantize_embeddings``: random vectors (incl. zero vectors) vs a pure
  Python oracle of the documented scale/round rules.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.wrangling import (
    mad_outlier_flags,
    winsorize_columns,
)

N_ROWS = 300


def _rows(seed):
    rng = random.Random(seed)
    rows = []
    for i in range(N_ROWS):
        g = rng.choice(["a", "b", "c", None])
        # quarters keep interpolation arithmetic binary-exact in both engines
        v = rng.choice([None, 0.0, 0.25 * rng.randint(-40, 400)])
        rows.append((i, g, v))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("grouped", [True, False])
def test_winsorize_matches_duckdb(spark, seed, grouped):
    rows = _rows(seed)
    df = spark.createDataFrame(rows, "i: long, g: string, v: double")
    got = {
        r["i"]: r["v"]
        for r in winsorize_columns(
            df, ["v"], 0.1, 0.9, group_by=["g"] if grouped else None
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    if grouped:
        sql = """
        WITH b AS (SELECT g, quantile_cont(v, 0.1) lo, quantile_cont(v, 0.9) hi
                   FROM t WHERE g IS NOT NULL GROUP BY 1)
        SELECT i, CASE WHEN t.g IS NULL THEN v
                       WHEN v < lo THEN round(lo, 6)
                       WHEN v > hi THEN round(hi, 6)
                       ELSE v END
        FROM t LEFT JOIN b USING (g)
        """
    else:
        sql = """
        WITH b AS (SELECT quantile_cont(v, 0.1) lo, quantile_cont(v, 0.9) hi FROM t)
        SELECT i, CASE WHEN v < lo THEN round(lo, 6)
                       WHEN v > hi THEN round(hi, 6)
                       ELSE v END
        FROM t, b
        """
    want = dict(con.execute(sql).fetchall())
    assert set(got) == set(want)
    for k in got:
        if want[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k], want[k])


@pytest.mark.parametrize("seed", [5, 6])
def test_mad_outliers_match_duckdb(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(N_ROWS):
        g = rng.choice(["a", "b", "const"])
        v = 2.0 if g == "const" else 0.25 * rng.randint(-100, 100)
        if rng.random() < 0.2 and g != "const":
            v = v * 100  # plant outliers
        rows.append((i, g, float(v)))
    df = spark.createDataFrame(rows, "i: long, g: string, v: double")
    got = {
        r["i"]: (r["v_robust_z"], r["v_is_outlier"])
        for r in mad_outlier_flags(df, "v", group_by=["g"]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(
        con.execute(
            """
    WITH med AS (SELECT g, quantile_cont(v, 0.5) m FROM t GROUP BY 1),
    r AS (SELECT t.*, m FROM t JOIN med USING (g)),
    mad AS (SELECT g, quantile_cont(abs(v - m), 0.5) d FROM r GROUP BY 1)
    SELECT i, [CASE WHEN d > 0 THEN round(0.6745 * (v - m) / d, 6) END,
               coalesce(abs(CASE WHEN d > 0
                            THEN round(0.6745 * (v - m) / d, 6) END) > 3.5,
                        false)::DOUBLE]
    FROM r JOIN mad USING (g)
    """
        ).fetchall()
    )
    assert set(got) == set(want)
    for k, (z, flag) in got.items():
        wz, wf = want[k]
        assert (z is None) == (wz is None)
        if z is not None:
            assert z == pytest.approx(wz, abs=1e-9)
        assert float(flag) == wf


def test_quantize_matches_python_oracle(spark):
    rng = random.Random(77)
    rows = []
    for i in range(120):
        if i % 17 == 0:
            vec = [0.0] * 8
        else:
            vec = [rng.uniform(-5, 5) for _ in range(8)]
        rows.append((i, vec))
    from hds_functions_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {r["vec_id"]: (r["scale"], r["qvec"])
           for r in quantize_embeddings(df).collect()}

    def round_half_away(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    for i, vec in rows:
        ma = max(abs(x) for x in vec)
        scale, qvec = got[i]
        assert scale == pytest.approx(ma / 127.0, abs=0)
        if ma == 0:
            assert qvec == [0] * 8
        else:
            want = [round_half_away(x * 127.0 / ma) for x in vec]
            assert qvec == want, (i, qvec, want)
