"""Disclosure-control tests: HALF_UP rounding goldens, redaction semantics."""

import pytest

from hds_functions_spark import redact_low_counts, round_counts_to_multiple


def test_round_counts_golden(spark):
    # Authoritative goldens (reference tests override its docstring): with
    # multiple=5 -> 7->5, 17->15, 22->20.
    df = spark.createDataFrame([(1, 7), (2, 17), (3, 22)], ["id", "count1"])
    out = round_counts_to_multiple(df, ["count1"], multiple=5)
    got = {r["id"]: r["count1"] for r in out.collect()}
    assert got == {1: 5, 2: 15, 3: 20}


def test_round_counts_half_up(spark):
    # Exact halves round HALF_UP: 13/5 = 2.6 -> 15... the .5 case: 12.5/5=2.5 -> 3 -> 15
    df = spark.createDataFrame([(1, 13), (2, 15), (3, 0)], ["id", "c"])
    out = round_counts_to_multiple(df, ["c"], multiple=5)
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: 15, 2: 15, 3: 0}
    df2 = spark.createDataFrame([(1, 5)], ["id", "c"])
    out2 = round_counts_to_multiple(df2, ["c"], multiple=2)  # 5/2=2.5 -> 3 -> 6
    assert out2.collect()[0]["c"] == 6


def test_round_counts_nulls_and_type(spark):
    df = spark.createDataFrame([(1, None), (2, 7)], "id: long, c: long")
    out = round_counts_to_multiple(df, ["c"])
    assert dict(out.dtypes)["c"] == "bigint"
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: None, 2: 5}


def test_round_counts_multi_column(spark):
    df = spark.createDataFrame([(1, 7, 17)], ["id", "a", "b"])
    out = round_counts_to_multiple(df, ["a", "b"], multiple=5).collect()[0]
    assert (out["a"], out["b"]) == (5, 15)


def test_round_counts_errors(spark):
    df = spark.createDataFrame([(1, 7)], ["id", "c"])
    with pytest.raises(TypeError, match="Spark DataFrame"):
        round_counts_to_multiple([(1,)], ["c"])
    with pytest.raises(TypeError, match="list of strings"):
        round_counts_to_multiple(df, "c")
    with pytest.raises(ValueError, match="positive integer"):
        round_counts_to_multiple(df, ["c"], multiple=0)
    with pytest.raises(ValueError, match="does not exist"):
        round_counts_to_multiple(df, ["missing"])


def test_redact_boundary_kept(spark):
    df = spark.createDataFrame([(1, 9), (2, 10), (3, 11)], ["id", "c"])
    out = redact_low_counts(df, ["c"], threshold=10)
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: None, 2: 10, 3: 11}  # >= threshold kept


def test_redact_nulls_redacted(spark):
    df = spark.createDataFrame([(1, None), (2, 50)], "id: long, c: long")
    out = redact_low_counts(df, ["c"], threshold=10, redaction_value=-1)
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: -1, 2: 50}


def test_redact_string_value_coerces_column(spark):
    df = spark.createDataFrame([(1, 7), (2, 17)], ["id", "c"])
    out = redact_low_counts(df, ["c"], threshold=10, redaction_value="[:REDACTED:]")
    assert dict(out.dtypes)["c"] == "string"
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: "[:REDACTED:]", 2: "17"}


def test_redact_errors(spark):
    df = spark.createDataFrame([(1, 7)], ["id", "c"])
    with pytest.raises(ValueError, match="positive integer"):
        redact_low_counts(df, ["c"], threshold=0)
    with pytest.raises(TypeError, match="list of strings"):
        redact_low_counts(df, "c", threshold=5)
    with pytest.raises(ValueError, match="does not exist"):
        redact_low_counts(df, ["missing"], threshold=5)


def test_round_then_redact_pipeline(spark):
    df = spark.createDataFrame([(1, 7), (2, 17), (3, 3)], ["id", "c"])
    out = df.transform(round_counts_to_multiple, ["c"], 5).transform(
        redact_low_counts, ["c"], 10
    )
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got == {1: None, 2: 15, 3: None}


def test_suppress_small_groups(spark):
    from hds_functions_spark.operators.privacy import suppress_small_groups

    df = spark.createDataFrame(
        [("a", 12), ("b", 10), ("c", 9), ("d", None)], "g: string, n: int"
    )
    out = suppress_small_groups(df, "n", 10)
    assert sorted(r["g"] for r in out.collect()) == ["a", "b"]  # boundary kept, null dropped
    with pytest.raises(ValueError, match="positive integer"):
        suppress_small_groups(df, "n", 0)
    with pytest.raises(ValueError, match="not found"):
        suppress_small_groups(df, "missing", 5)


def test_k_anonymity_violations(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.privacy import k_anonymity_violations

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1 + [(None, None)] * 2,
        "seg: string, nat: int",
    )
    out = {
        (r["seg"], r["nat"]): r["n_rows"]
        for r in k_anonymity_violations(df, ["seg", "nat"], k=5).collect()
    }
    # (a,1) has 5 rows >= k: safe. The rare combos — including the all-null
    # one — are flagged with their sizes.
    assert out == {("a", 2): 2, ("b", 1): 1, (None, None): 2}

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_violations(df, ["seg"], k=1)
    with pytest.raises(ValueError, match="not in DataFrame"):
        k_anonymity_violations(df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_violations(df, [])


def test_generalize_columns(spark):
    import datetime

    from hds_functions_spark.operators.privacy import (
        generalize_columns,
        k_anonymity_violations,
    )

    df = spark.createDataFrame(
        [
            (23, datetime.date(2021, 3, 15), "SW1A 1AA"),
            (27, datetime.date(2021, 7, 2), "SW1B 2BB"),
            (-5, datetime.date(2020, 1, 1), "EC2"),
            (None, None, None),
        ],
        "age: int, reg: date, postcode: string",
    )
    out = generalize_columns(
        df,
        {"age": ("bin", 10), "reg": ("date_trunc", "year"),
         "postcode": ("prefix", 3)},
    )
    rows = out.collect()
    got = {(r["age"], str(r["reg"]), r["postcode"]) for r in rows}
    assert ("[20, 30)", "2021-01-01", "SW1") in got
    assert ("[-10, 0)", "2020-01-01", "EC2") in got  # floor bins negatives
    assert (None, "None", None) in got               # nulls pass through
    # generalisation merges the two 2021 rows into one quasi-combo of 2
    viol = k_anonymity_violations(out, ["age", "reg", "postcode"], k=2)
    flagged = {(r["age"], str(r["reg"])) for r in viol.collect()}
    assert ("[20, 30)", "2021-01-01") not in flagged

    import pytest

    with pytest.raises(ValueError, match="not in DataFrame"):
        generalize_columns(df, {"nope": ("bin", 10)})
    with pytest.raises(ValueError, match="unknown rule"):
        generalize_columns(df, {"age": ("hash", 1)})
    with pytest.raises(ValueError, match="positive"):
        generalize_columns(df, {"age": ("bin", 0)})
    with pytest.raises(ValueError, match="at least one"):
        generalize_columns(df, {})


# --- t-closeness ---------------------------------------------------------

def _tc(spark, rows, t=0.2, quasi=("g",)):
    from hds_functions_spark.operators.privacy import t_closeness_violations

    df = spark.createDataFrame(rows, "g: string, s: long")
    return {
        r["g"]: (r["n_rows"], r["t_distance"])
        for r in t_closeness_violations(df, list(quasi), "s", t=t).collect()
    }


def _ref_emd(rows, group):
    """Reference ordered-EMD: sum |cumP - cumQ| / (m - 1)."""
    vals = sorted({s for _, s in rows})
    n = len(rows)
    grp = [s for g, s in rows if g == group]
    cumq = cump = 0.0
    total = 0.0
    for v in vals:
        cumq += sum(1 for _, s in rows if s == v) / n
        cump += sum(1 for s in grp if s == v) / len(grp)
        total += abs(cump - cumq)
    return round(total / (len(vals) - 1), 6)


def test_t_closeness_identical_distributions_pass(spark):
    # both groups mirror the global distribution exactly -> EMD 0
    rows = [("a", v) for v in (1, 2, 3)] * 4 + [("b", v) for v in (1, 2, 3)] * 4
    assert _tc(spark, rows, t=0.0) == {}


def test_t_closeness_skewed_group_flagged(spark):
    # group 'b' concentrates on the top value -> large EMD
    rows = [("a", v) for v in (1, 2, 3)] * 10 + [("b", 3)] * 10
    out = _tc(spark, rows, t=0.2)
    assert list(out) == ["b"]
    n, d = out["b"]
    assert n == 10 and d == _ref_emd(rows, "b")


def test_t_closeness_matches_reference_random(spark):
    import random

    rng = random.Random(3)
    rows = [
        (rng.choice("abc"), rng.randrange(5)) for _ in range(300)
    ]
    out = _tc(spark, rows, t=1e-12)  # tiny t: flag every skewed group
    for g in "abc":
        expect = _ref_emd(rows, g)
        if expect > 1e-12:
            assert out[g][1] == expect, g


def test_t_closeness_validation(spark):
    import pytest
    from hds_functions_spark.operators.privacy import t_closeness_violations

    df = spark.createDataFrame([("a", 1)], "g: string, s: long")
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_violations(df, [], "s")
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_violations(df, ["g"], "s", t=1.5)


def test_t_closeness_single_distinct_sensitive_value(spark):
    """m = 1 distinct sensitive value: every group's distribution IS the
    global one, so EMD = 0 and no group violates — and the (m-1)
    normaliser must not divide by zero (errors under ANSI)."""
    from hds_functions_spark.operators.privacy import t_closeness_violations

    df = spark.createDataFrame(
        [("a", "only"), ("a", "only"), ("b", "only")], "g: string, s: string"
    )
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert t_closeness_violations(df, ["g"], "s", t=0.0).count() == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


# --- dp_noisy_counts ----------------------------------------------------------


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    import math

    from hds_functions_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], ["id", "g"]
    )
    a = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt="s").collect()}
    b = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt="s").collect()}
    assert a == b  # same salt -> identical release (re-run leak closed)
    c = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt="t").collect()}
    assert a != c  # new salt -> new draw
    # Laplace(1) at resolution 1e6: |noise| <= ln(1e6) ~ 13.8
    for g, v in a.items():
        assert abs(v - 100) <= math.log(1_000_000) + 1e-6


def test_dp_noisy_counts_matches_python_inverse_cdf(spark):
    import hashlib
    import math

    from hds_functions_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["id", "g"])
    eps, salt = 0.5, "z"
    got = {r["g"]: r["noisy_count"]
           for r in dp_noisy_counts(df, ["g"], epsilon=eps, salt=salt).collect()}
    truth = {"x": 2, "y": 1}
    for g, n in truth.items():
        h = int(hashlib.md5(f"{g}\x1f{salt}".encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000
        noise = -(1 / eps) * math.copysign(1, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        assert got[g] == pytest.approx(round(n + noise, 4), abs=1e-6)


def test_dp_epsilon_validation(spark):
    from hds_functions_spark.operators.privacy import dp_noisy_counts

    with pytest.raises(ValueError):
        dp_noisy_counts(None, ["g"], epsilon=0.0, salt="s")


def test_dp_empty_salt_rejected(spark):
    """The salt is the secret PRF key of the deterministic-noise
    mechanism: with an empty (or public) salt, anyone can recompute the
    noise from the released group keys and recover exact counts — so
    salt='' must raise, not silently release."""
    from hds_functions_spark.operators.privacy import dp_noisy_counts

    # salt is keyword-only REQUIRED: a missing salt is a TypeError at
    # call-authoring time, not a runtime ValueError (the signature no
    # longer advertises a default that can never succeed)
    with pytest.raises(TypeError):
        dp_noisy_counts(None, ["g"], epsilon=1.0)
    with pytest.raises(ValueError, match="salt"):
        dp_noisy_counts(None, ["g"], epsilon=1.0, salt="")


def test_dp_null_group_key_sentinel(spark):
    """NULL group values key the noise hash as the chr(0)+'null'
    sentinel — distinct from the empty string (concat_ws would
    silently skip NULLs, colliding the two), and replayable by an
    oracle whose || operator propagates NULL."""
    import hashlib
    import math

    from hds_functions_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "")], "id long, g string"
    )
    got = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt="k").collect()
    }
    assert set(got) == {None, ""}

    def noise_for(key):
        h = int(
            hashlib.md5(f"{key}\x1fk".encode()).hexdigest()[:15], 16
        )
        u = (h % 1_000_000 + 0.5) / 1_000_000
        return -math.copysign(1, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))

    assert got[None] == pytest.approx(round(2 + noise_for("\x00null"), 4))
    assert got[""] == pytest.approx(round(1 + noise_for(""), 4))
    assert noise_for("\x00null") != noise_for("")  # keys must not collide


def test_dp_noisy_sums_clip_and_determinism(spark):
    """Clipping bounds each row's contribution to [0, clip]; the draw
    is deterministic per (group, salt) and domain-separated from the
    count release's draw over the same groups."""
    import hashlib
    import math

    from hds_functions_spark.operators.privacy import (
        dp_noisy_counts,
        dp_noisy_sums,
    )

    df = spark.createDataFrame(
        [(1, "g", 50.0), (2, "g", 500.0), (3, "g", -10.0), (4, "h", 20.0)],
        "id long, g string, x double",
    )
    clip, eps, salt = 100.0, 2.0, "k"
    got = {
        r["g"]: r["noisy_sum"]
        for r in dp_noisy_sums(
            df, "x", ["g"], clip=clip, epsilon=eps, salt=salt
        ).collect()
    }

    def noise(key, scale):
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000
        return -scale * math.copysign(1, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )

    # g: 50 + clip(500->100) + clip(-10->0) = 150; h: 20
    assert got["g"] == pytest.approx(
        round(150.0 + noise("g\x1fk\x02", clip / eps), 4)
    )
    assert got["h"] == pytest.approx(
        round(20.0 + noise("h\x1fk\x02", clip / eps), 4)
    )
    # domain separation: the sum's draw differs from the count's
    counts = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=eps, salt=salt).collect()
    }
    assert noise("g\x1fk\x02", 1 / eps) != noise("g\x1fk", 1 / eps)
    assert counts["g"] != got["g"]

    with pytest.raises(ValueError, match="clip"):
        dp_noisy_sums(df, "x", ["g"], clip=0.0, salt="k")
    # missing salt = TypeError at call-authoring time (keyword-only
    # required); empty salt = runtime ValueError
    with pytest.raises(TypeError):
        dp_noisy_sums(df, "x", ["g"], clip=1.0)
    with pytest.raises(ValueError, match="salt"):
        dp_noisy_sums(df, "x", ["g"], clip=1.0, salt="")


# --- epsilon-DP quantile (exponential mechanism) ---------------------------


def _py_dp_quantile(rows, lo, hi, q, eps, salt):
    """Pure-Python replay of the deterministic exponential mechanism."""
    import hashlib
    import math
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    out = {}
    m = int(hi - lo) + 1
    for g, vs in groups.items():
        n = len(vs)
        best = None
        for i in range(m):
            t = float(lo + i)
            cum = sum(1 for v in vs if v <= t)
            u_key = f"{g}\x1f{t}\x1f{salt}\x03".encode()
            h = int(hashlib.md5(u_key).hexdigest()[:15], 16)
            u = (h % 1_000_000 + 0.5) / 1_000_000
            score = round(
                eps / 2.0 * -abs(cum - q * n) + -math.log(-math.log(u)), 6
            )
            if best is None or score > best[0] or (
                score == best[0] and t < best[1]
            ):
                best = (score, t)
        out[g] = best[1]
    return out


def test_dp_quantile_matches_python_replay(spark):
    from hds_functions_spark.operators.privacy import dp_quantile

    rows = [("a", float(v)) for v in [1, 2, 2, 3, 9, 9, 9, 10]] + [
        ("b", float(v)) for v in [5, 5, 6, 7]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["dp_quantile"]
        for r in dp_quantile(
            df, "v", ["g"], domain_lo=1, domain_hi=10,
            q=0.5, epsilon=1.0, salt="t",
        ).collect()
    }
    want = _py_dp_quantile(rows, 1, 10, 0.5, 1.0, "t")
    assert got == want


def test_dp_quantile_tracks_median_at_high_epsilon(spark):
    """At large epsilon the mechanism concentrates on the true median's
    rank-utility plateau: |#(v<=t) - n/2| of the winner must be 0."""
    from hds_functions_spark.operators.privacy import dp_quantile

    vals = [float(v) for v in [1, 2, 3, 4, 5, 5, 5, 6, 7, 8, 9, 9]]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    got = dp_quantile(
        df, "v", ["g"], domain_lo=1, domain_hi=10,
        q=0.5, epsilon=200.0, salt="t",
    ).collect()[0]["dp_quantile"]
    # rank counts: cum(4)=4, cum(5)=7 -> no zero-utility point exists;
    # the unique minimal-|cum - 6| grid point is t=5 (|7-6|=1), and at
    # eps=200 the 100-point utility gap dwarfs the Gumbel range (~16),
    # so the mechanism MUST pick it
    assert got == 5.0


def test_dp_quantile_deterministic_and_salt_sensitive(spark):
    from hds_functions_spark.operators.privacy import dp_quantile

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 30)], "g string, v double"
    )

    def run(salt):
        return dp_quantile(
            df, "v", ["g"], domain_lo=1, domain_hi=30,
            q=0.5, epsilon=0.05, salt=salt,
        ).collect()[0]["dp_quantile"]

    assert run("s1") == run("s1")  # replayable release
    # at tiny epsilon the draw dominates; different salts should move it
    diffs = {run(f"salt{i}") for i in range(6)}
    assert len(diffs) > 1


def test_dp_quantile_validation(spark):
    from hds_functions_spark.operators.privacy import dp_quantile

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="epsilon"):
        dp_quantile(df, "v", ["g"], 0, 10, epsilon=0, salt="s")
    with pytest.raises(ValueError, match="salt"):
        dp_quantile(df, "v", ["g"], 0, 10, salt="")
    with pytest.raises(ValueError, match="q must"):
        dp_quantile(df, "v", ["g"], 0, 10, q=1.5, salt="s")
    with pytest.raises(ValueError, match="domain_step"):
        dp_quantile(df, "v", ["g"], 0, 10, domain_step=0, salt="s")
    with pytest.raises(ValueError, match="domain_hi"):
        dp_quantile(df, "v", ["g"], 10, 0, salt="s")
    out = dp_quantile(df, "v", ["g"], 0, 10, salt="s")
    assert out.columns == ["g", "dp_quantile"]  # no true-value leakage
